"""jsonschema_spark — a PySpark-native schema + constraint validation engine.

Built from scratch with the constraint vocabulary of JSON Schema Draft 4
(reference semantics: tdakkota/jsonschema, see SURVEY.md), re-expressed
Spark-first:

- ``spec``      — declarative ConstraintSpec parsing, $ref/id resolution,
                  draft-4 metaschema (driver-side, no Spark dependency).
- ``compiler``  — lowers a spec to (a) native Spark ``Column`` boolean
                  predicates per typed column, (b) vectorized Arrow/pandas
                  UDF kernels for free-form JSON columns.
- ``operators`` — table-level checks: column stats profiles, salted
                  uniqueness, broadcast referential integrity, distribution
                  drift (chi-square / PSI), plus training-data pipeline ops
                  (dedup, similarity search, text analysis, multimodal).
- ``plans``     — CompiledPlan + ValidationJob: one partition-parallel pass
                  emitting per-partition verdicts, violation rows, lineage,
                  checkpoint/resume.
- ``sources``   — deterministic synthetic corpus generator + parquet/iceberg
                  table loaders.
- ``streaming`` — Structured Streaming validation path.
"""

from jsonschema_spark.spec.compile import (
    SpecError,
    compile_spec,
    file_map_resolver,
    http_resolver,
    regex_dialect_risks,
)
from jsonschema_spark.spec.evaluate import Violation, validate_json, validate_value

__all__ = [
    "SpecError",
    "compile_spec",
    "file_map_resolver",
    "http_resolver",
    "regex_dialect_risks",
    "Violation",
    "validate_json",
    "validate_value",
]

__version__ = "0.1.0"
