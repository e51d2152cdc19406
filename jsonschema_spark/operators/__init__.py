"""Table-level validation operators (stats, uniqueness, referential, drift)
and training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing)."""
