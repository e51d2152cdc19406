"""Driver-side constraint-spec front-end (pure Python, no Spark dependency).

Mirrors the reference's query front-end semantics (SURVEY.md §2.2, §3 entry
point 1): parse → resolve ids/$refs → compile to an executable check tree.
"""
