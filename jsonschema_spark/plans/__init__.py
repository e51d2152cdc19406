"""CompiledPlan + ValidationJob: table specs lowered to one partition-parallel
validation pass with verdicts, violation rows, lineage and resume."""

from jsonschema_spark.plans.plan import CompiledPlan, TableSpec, compile_table_spec
from jsonschema_spark.plans.job import ValidationJob

__all__ = ["CompiledPlan", "TableSpec", "compile_table_spec", "ValidationJob"]
