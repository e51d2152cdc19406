"""Spec inference round-trip: a spec inferred from a healthy snapshot must
validate that snapshot clean, and must flag perturbed rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonschema_spark.plans.infer import infer_table_spec
from jsonschema_spark.plans.job import ValidationJob
from jsonschema_spark.plans.plan import TableSpec, compile_table_spec

SF_DIR = "/root/testdata/sf0.001"


def test_inferred_spec_validates_own_corpus_clean(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    spec = infer_table_spec(df)
    # evidence the profile found real structure
    assert spec["columns"]["lang"]["enum"] == ["de", "en", "es", "fr", "zh"]
    assert "doc_id" in spec["unique"] and set(spec["required"]) == set(df.columns)

    plan = compile_table_spec(TableSpec.from_dict(spec), df.schema)
    job = ValidationJob(plan, id_column="doc_id")
    assert job.violations(job.annotate(df)).count() == 0


def test_inferred_spec_flags_perturbed_rows(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    spec = infer_table_spec(df)
    plan = compile_table_spec(TableSpec.from_dict(spec), df.schema)
    job = ValidationJob(plan, id_column="doc_id")

    bad = spark.createDataFrame(
        [
            (9_000, "x", "xx", "src0", 1),        # text below minLength, lang off-enum
            (9_001, "y" * 600, "en", "srcXX", 600),  # text above maxLength, source off-enum
            (9_002, None, "en", "src0", 100),     # required text missing
        ],
        df.schema,
    )
    v = job.violations(job.annotate(df.unionByName(bad)))
    by_id = {
        r["id"]: {row["check"] for row in v.filter(F.col("id") == r["id"]).collect()}
        for r in v.select("id").distinct().collect()
    }
    assert set(by_id) == {9_000, 9_001, 9_002}
    assert any("lang" in c for c in by_id[9_000])
    assert any("source" in c for c in by_id[9_001])
    assert any("text" in c for c in by_id[9_002])


def test_inference_on_token_arrays(spark):
    """Array columns get minItems/maxItems plus element bounds without an
    explode (the tokens-table shape from the north rule)."""
    rows = [(1, [3, 5, 9]), (2, [1, 2, 3, 4]), (3, [7])]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    spec = infer_table_spec(df)
    t = spec["columns"]["tokens"]
    assert (t["minItems"], t["maxItems"]) == (1, 4)
    assert t["items"] == {"type": "integer", "minimum": 1, "maximum": 9}


def test_spec_diff_directions(spark):
    """Drift classification: widened bounds/enums when candidate data
    escapes the golden contract, narrowed the other way, required flips."""
    from jsonschema_spark.plans.infer import spec_diff

    golden = {
        "columns": {
            "a": {"type": "integer", "minimum": 10, "maximum": 20},
            "s": {"type": "string", "minLength": 2, "maxLength": 4,
                  "enum": ["x", "y"]},
        },
        "required": ["a", "s"],
        "unique": [],
    }
    candidate = {
        "columns": {
            "a": {"type": "integer", "minimum": 5, "maximum": 18},
            "s": {"type": "string", "minLength": 2, "maxLength": 6,
                  "enum": ["x", "y", "z"]},
        },
        "required": ["s"],
        "unique": [],
    }
    rows = {(r[0], r[1]): r for r in spec_diff(golden, candidate)}
    assert rows[("a", "minimum")][4] == "widened"      # 10 -> 5
    assert rows[("a", "maximum")][4] == "narrowed"     # 20 -> 18
    assert rows[("s", "maxLength")][4] == "widened"    # 4 -> 6
    assert rows[("s", "enum")][4] == "widened"         # +z
    assert rows[("s", "enum")][2:4] == ("x,y", "x,y,z")
    assert rows[("a", "required")][4] == "relaxed"
    assert ("s", "minLength") not in rows              # unchanged -> no row


def test_spec_diff_enum_presence(spark):
    from jsonschema_spark.plans.infer import spec_diff

    golden = {"columns": {"s": {"type": "string", "enum": ["x"]}},
              "required": [], "unique": []}
    candidate = {"columns": {"s": {"type": "string"}}, "required": [],
                 "unique": []}
    rows = spec_diff(golden, candidate)
    # losing the enum constraint admits any value -> widened, not narrowed
    assert rows == [("s", "enum", "x", "null", "widened")]
    back = spec_diff(candidate, golden)
    assert back == [("s", "enum", "null", "x", "narrowed")]


def test_spec_diff_end_to_end(spark):
    """Golden = filtered snapshot; candidate = full table: the filter's
    effects surface as widened constraints."""
    from jsonschema_spark.plans.infer import spec_diff

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    golden = infer_table_spec(
        df.filter((F.col("doc_id") >= 10) & (F.col("lang") != "de"))
    )
    candidate = infer_table_spec(df)
    rows = {(r[0], r[1]): r for r in spec_diff(golden, candidate, df.columns)}
    assert rows[("doc_id", "minimum")][2:] == ("10", "0", "widened")
    assert rows[("lang", "enum")][4] == "widened"
    assert "de" in rows[("lang", "enum")][3].split(",")
    assert all(r[4] in {"widened", "narrowed"} for r in rows.values())
