"""Spark backends for CompiledSchema: native Column lowering (hot path) and
Arrow-batched pandas-UDF kernels (free-form JSON columns)."""

from jsonschema_spark.compiler.columns import LoweringError, lower_predicate
from jsonschema_spark.compiler.kernel import json_validation_kernel

__all__ = ["LoweringError", "lower_predicate", "json_validation_kernel"]
