"""CLI (spark-submit entry) contract: package zip, validate job with
results tree + resume, throughput probe."""

from __future__ import annotations

import json
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_package_zip(tmp_path):
    out = tmp_path / "dist" / "engine.zip"
    res = subprocess.run(
        [sys.executable, "-m", "jsonschema_spark", "package", "--out", str(out)],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr[-500:]
    path = json.loads(res.stdout.strip().splitlines()[-1])["py_files"]
    names = zipfile.ZipFile(path).namelist()
    assert "jsonschema_spark/cli.py" in names
    assert "jsonschema_spark/operators/dedup.py" in names
    assert not any(n.endswith(".pyc") for n in names if "__pycache__" not in n)


def test_validate_cli_and_resume(tmp_path, spark):
    spec = {
        "columns": {
            "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$"},
            "n_tok": {"type": "integer", "minimum": 1, "maximum": 2048},
        },
        "required": ["doc_id", "tokens", "n_tok", "source"],
        "row_checks": {"len_consistent": "n_tok = size(tokens)"},
        "unique": ["doc_id"],
        "references": {"source": {"dim": "dim_source", "key": "source_id"}},
    }
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(spec))
    results = tmp_path / "results"

    from jsonschema_spark.cli import main

    # use the in-process session (conftest) — get_spark getOrCreate reuses it
    rc = main([
        "validate", "--input", "synthetic", "--rows", "5000",
        "--spec", str(spec_file), "--results", str(results), "--cores", "8",
    ])
    assert rc == 0
    summary = json.loads((results / "summary.json").read_text())
    assert summary["n_rows"] == 5000
    assert summary["duplicates"]["doc_id"] == 5000 // 499
    assert (results / "lineage").is_dir() and (results / "violations").is_dir()

    rc = main([
        "validate", "--input", "synthetic", "--rows", "5000",
        "--spec", str(spec_file), "--results", str(results),
        "--resume", "--cores", "8",
    ])
    assert rc == 0
    summary2 = json.loads((results / "summary.json").read_text())
    assert summary2["resumed_units_skipped"] > 0
    assert summary2["n_rows"] == 5000


def test_repair_cli(tmp_path):
    out = tmp_path / "repaired.parquet"
    res = subprocess.run(
        [
            sys.executable, "-m", "jsonschema_spark", "repair",
            "--out", str(out), "--rows", "500", "--cores", "4",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-800:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["n_rows"] == 500
    # the raw synthetic corpus has no BOS/EOS framing: every row repairs,
    # and the repaired output validates clean (exit code asserts it too)
    assert summary["n_changed"] == 500
    assert summary["violations_after"] == 0
    assert summary["violations_before"] == 500


def test_repair_cli_refreshes_n_tok(tmp_path, spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.sources.corpus import token_neardup_corpus

    src = tmp_path / "in.parquet"
    token_neardup_corpus(spark, 200, seed=5).withColumn(
        "n_tok", F.size("tokens")
    ).write.parquet(str(src))
    out = tmp_path / "out.parquet"
    res = subprocess.run(
        [
            sys.executable, "-m", "jsonschema_spark", "repair",
            "--input", str(src), "--out", str(out), "--cores", "4",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-800:]
    import duckdb

    stale = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*.parquet')"
        " WHERE n_tok <> len(tokens)"
    ).fetchone()[0]
    assert stale == 0


def test_validate_cli_diagnostics(tmp_path, spark):
    spec = {
        "columns": {
            "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$"},
            "n_tok": {"type": "integer", "minimum": 1, "maximum": 2048},
        },
        "required": ["doc_id", "tokens", "n_tok", "source"],
        "row_checks": {"len_consistent": "n_tok = size(tokens)"},
    }
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(spec))
    results = tmp_path / "results"

    from jsonschema_spark.cli import main

    rc = main([
        "validate", "--input", "synthetic", "--rows", "5000",
        "--spec", str(spec_file), "--results", str(results), "--cores", "8",
        "--diagnostics",
    ])
    assert rc == 0
    act = {
        r["check"]: r
        for r in spark.read.parquet(str(results / "activation")).collect()
    }
    # the synthetic corpus injects violations, so the length check fires
    assert act["row_len_consistent"]["status"] == "active"
    assert all(r["n"] == 5000 for r in act.values())
    ex = spark.read.parquet(str(results / "examples")).collect()
    assert all(1 <= r["n_examples"] <= 5 for r in ex)
    assert (results / "cooccurrence").is_dir()


def test_validate_cli_preflight_and_quarantine(tmp_path, spark):
    """--preflight-k gates before the full pass; --quarantine writes the
    accepted/quarantined split whose row counts partition the corpus.
    A hopeless budget makes the gate exit 3 without writing results."""
    import json as _json

    spec = {
        "columns": {
            "n_tok": {"type": "integer", "minimum": 1, "maximum": 2048},
        },
        "required": ["doc_id", "tokens", "n_tok", "source"],
        "row_checks": {"len_consistent": "n_tok = size(tokens)"},
        "references": {"source": {"dim": "dim_source", "key": "source_id"}},
    }
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(_json.dumps(spec))
    results = tmp_path / "results"
    quar = tmp_path / "routed"

    from jsonschema_spark.cli import main

    rc = main([
        "validate", "--input", "synthetic", "--rows", "5000",
        "--spec", str(spec_file), "--results", str(results),
        "--cores", "8", "--preflight-k", "400",
        "--preflight-budget", "0.25", "--quarantine", str(quar),
    ])
    assert rc == 0
    acc = spark.read.parquet(str(quar / "accepted"))
    q = spark.read.parquet(str(quar / "quarantined"))
    assert acc.count() + q.count() == 5000
    assert "failed_checks" in q.columns and "_valid" not in acc.columns

    # impossible budget -> gate refuses before the full pass
    results2 = tmp_path / "results2"
    rc = main([
        "validate", "--input", "synthetic", "--rows", "5000",
        "--spec", str(spec_file), "--results", str(results2),
        "--cores", "8", "--preflight-k", "400",
        "--preflight-budget", "0.000001",
    ])
    assert rc == 3
    assert not (results2 / "summary.json").exists()
