"""Command-line entry point for cluster runs (``spark-submit --py-files``).

Usage (the north rule's launch contract)::

    # package the engine for executors
    python -m jsonschema_spark package --out dist/jsonschema_spark.zip

    # run a validation job
    spark-submit --master local[32] --py-files dist/jsonschema_spark.zip \
        -c spark.sql.shuffle.partitions=32 \
        $(python -c 'import jsonschema_spark.cli as c; print(c.__file__)') \
        validate --input /data/corpus --spec spec.json --results /data/results

On a real cluster, replace ``--master`` with the cluster manager and the
same job runs unchanged at N or 4N executors — the engine has no
driver-side row loops, so parallelism is purely an executor-count knob.

When invoked under spark-submit, the active SparkSession is the one
spark-submit built (we call ``getOrCreate`` and respect its master);
standalone invocation builds a local session from --cores.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path


def _build_session(args):
    from jsonschema_spark.sources.session import get_spark

    return get_spark(app_name="jsonschema_spark-cli", cores=args.cores)


def cmd_package(args) -> int:
    """Zip the package for --py-files shipping."""
    import jsonschema_spark

    pkg_dir = Path(jsonschema_spark.__file__).parent
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = shutil.make_archive(str(out.with_suffix("")), "zip",
                              root_dir=pkg_dir.parent, base_dir=pkg_dir.name)
    print(json.dumps({"py_files": tmp}))
    return 0


def cmd_validate(args) -> int:
    """Full validation pass over a parquet/corpus input; writes the results
    tree (lineage/violations/duplicates/orphans/profile/summary.json) and
    prints one JSON summary line."""
    spark = _build_session(args)
    from pyspark.sql import functions as F

    from jsonschema_spark.plans.job import ValidationJob
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec

    if args.input == "synthetic":
        from jsonschema_spark.sources.corpus import corpus

        df = corpus(spark, args.rows, seed=args.seed)
    else:
        df = spark.read.parquet(args.input)

    spec = TableSpec.from_json(Path(args.spec).read_text())
    plan = compile_table_spec(spec, df.schema)
    dims = {}
    for pair in args.dim or []:
        name, path = pair.split("=", 1)
        dims[name] = spark.read.parquet(path)
    if "dim_source" in {r["dim"] for r in plan.references.values()} and (
        "dim_source" not in dims
    ):
        from jsonschema_spark.sources.corpus import dim_source

        dims["dim_source"] = dim_source(spark)

    job = ValidationJob(plan, dims=dims)
    t0 = time.time()

    if args.preflight_k:
        # constant-size sampled gate BEFORE the full pass: if the Wilson
        # upper bound on the violation rate exceeds the budget, exit
        # nonzero without scanning the corpus (the 10^12-row-scale
        # "don't run the expensive job on a broken snapshot" guard)
        from jsonschema_spark.operators.checks import sampled_validation_gate

        gate = sampled_validation_gate(
            df,
            args.id_col,
            job.annotate,
            sample_k=args.preflight_k,
            budget=args.preflight_budget,
        ).collect()[0]
        print(json.dumps({"preflight": gate.asDict()}))
        if not gate["within_budget"]:
            # no spark.stop(): the CLI convention leaves the session to
            # the process exit (and an in-process caller — tests, a
            # notebook — may own a live session via getOrCreate; stopping
            # it here killed every later in-process Spark user)
            return 3

    summary = job.run(df, args.results, resume=args.resume)
    if args.quarantine:
        # verdict routing next to the results tree: accepted rows with a
        # clean payload schema, quarantined rows with failed-check labels
        ann = job.annotate(df)
        accepted, quarantined = job.quarantine(ann)
        base = Path(args.quarantine)
        accepted.write.mode("overwrite").parquet(str(base / "accepted"))
        quarantined.write.mode("overwrite").parquet(
            str(base / "quarantined")
        )
        summary["quarantine_dir"] = str(base)
    if args.diagnostics:
        # one extra pass over the corpus, shared by all three diagnostic
        # artifacts via persist (they are check-keyed and metadata-sized
        # on the way out; the scan is the only corpus-sized cost)
        from jsonschema_spark.plans.rollout import (
            check_activation_profile,
            violation_cooccurrence,
            violation_examples,
        )

        ann = plan.annotate(df).persist()
        try:
            base = Path(args.results)
            check_activation_profile(ann).write.mode("overwrite").parquet(
                str(base / "activation")
            )
            violation_cooccurrence(ann).write.mode("overwrite").parquet(
                str(base / "cooccurrence")
            )
            violation_examples(ann, id_col=args.id_col).write.mode(
                "overwrite"
            ).parquet(str(base / "examples"))
        finally:
            ann.unpersist()
        summary["diagnostics"] = ["activation", "cooccurrence", "examples"]
    summary["wall_sec_total"] = round(time.time() - t0, 3)
    n_tokens = None
    if "tokens" in df.columns:
        n_tokens = df.agg(F.sum(F.size("tokens"))).collect()[0][0]
        summary["n_tokens"] = int(n_tokens or 0)
    print(json.dumps(summary, default=str))
    return 0


def cmd_repair(args) -> int:
    """Fix-mode pass: canonicalize every sequence (strip misplaced
    BOS/EOS/PAD markers, remap out-of-vocab ids to unk, re-frame) and
    write the repaired corpus; prints one JSON line with before/after
    structure-verdict counts and total repair work. The repaired output
    passes sequence_structure by construction."""
    spark = _build_session(args)
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.checks import (
        repair_sequences,
        sequence_structure,
    )

    if args.input == "synthetic":
        from jsonschema_spark.sources.corpus import token_neardup_corpus

        df = token_neardup_corpus(spark, args.rows, seed=args.seed)
    else:
        df = spark.read.parquet(args.input)

    ids = dict(
        vocab_size=args.vocab_size, bos_id=args.bos, eos_id=args.eos,
        pad_id=args.pad,
    )
    before = (
        sequence_structure(df, **ids)
        .agg(F.sum((~F.col("structure_ok")).cast("long")))
        .collect()[0][0]
    )
    t0 = time.time()
    repaired = repair_sequences(df, unk_id=args.unk, **ids)
    other_cols = [c for c in df.columns if c != "tokens"]
    out = df.select(other_cols).join(
        repaired.select("doc_id", "tokens", "n_stripped", "n_remapped",
                        "changed"),
        on="doc_id",
    )
    if "n_tok" in out.columns:
        # repair changes sequence lengths; a stale n_tok would violate the
        # length-consistency check the validate job runs on this output
        out = out.withColumn("n_tok", F.size("tokens"))
    out.write.mode("overwrite").parquet(args.out)
    back = spark.read.parquet(args.out)
    summary = back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("changed").cast("long")).alias("n_changed"),
        F.sum("n_stripped").alias("n_stripped_total"),
        F.sum("n_remapped").alias("n_remapped_total"),
    ).collect()[0]
    after = (
        sequence_structure(back, **ids)
        .agg(F.sum((~F.col("structure_ok")).cast("long")))
        .collect()[0][0]
    )
    print(json.dumps({
        "n_rows": summary["n_rows"],
        "n_changed": int(summary["n_changed"] or 0),
        "n_stripped_total": int(summary["n_stripped_total"] or 0),
        "n_remapped_total": int(summary["n_remapped_total"] or 0),
        "violations_before": int(before or 0),
        "violations_after": int(after or 0),
        "wall_sec": round(time.time() - t0, 3),
    }))
    return 0 if (after or 0) == 0 else 1


def cmd_throughput(args) -> int:
    """One timed validation pass (no sinks) — the scaling-protocol probe.
    Prints {rows, tokens, wall_sec, sequences_per_sec, tokens_per_sec}.
    ``--layout packed`` runs the same checks over the packed-binary token
    layout (sources/packed.py) instead of array<int>."""
    spark = _build_session(args)
    from jsonschema_spark.benchlib import corpus_validation_pass, materialize_corpus

    path = args.input
    if path == "synthetic":
        path = materialize_corpus(spark, args.rows, args.cache_dir, seed=args.seed)
    one_pass = corpus_validation_pass
    layout = getattr(args, "layout", "array")
    if layout in ("packed", "packed_stats"):
        from jsonschema_spark.sources.packed import (
            pack_corpus,
            packed_stats_validation_pass,
            packed_validation_pass,
        )

        path = pack_corpus(spark, path, path.rstrip("/") + "_packed")
        one_pass = (
            packed_stats_validation_pass
            if layout == "packed_stats"
            else packed_validation_pass
        )
    # warm-up then best-of-N
    one_pass(spark, path)
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        n_rows, n_valid, n_tokens, n_dups = one_pass(spark, path)
        best = min(best, time.time() - t0)
    print(
        json.dumps(
            {
                "rows": n_rows,
                "tokens": int(n_tokens),
                "invalid": int(n_rows - n_valid),
                "duplicates": int(n_dups),
                "wall_sec": round(best, 3),
                "sequences_per_sec": round(n_rows / best, 1),
                "tokens_per_sec": round(n_tokens / best, 1),
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jsonschema_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("package")
    pp.add_argument("--out", default="dist/jsonschema_spark.zip")
    pp.set_defaults(fn=cmd_package)

    pv = sub.add_parser("validate")
    pv.add_argument("--input", required=True, help="parquet dir or 'synthetic'")
    pv.add_argument("--spec", required=True, help="TableSpec JSON file")
    pv.add_argument("--results", required=True)
    pv.add_argument("--resume", action="store_true")
    pv.add_argument("--rows", type=int, default=100_000)
    pv.add_argument("--seed", type=int, default=42)
    pv.add_argument("--cores", type=int, default=None)
    pv.add_argument("--dim", action="append", help="name=parquet_path")
    pv.add_argument(
        "--diagnostics",
        action="store_true",
        help="also write activation/cooccurrence/examples to the results"
        " tree (one extra corpus pass)",
    )
    pv.add_argument("--id-col", default="doc_id")
    pv.add_argument(
        "--preflight-k", type=int, default=0,
        help="run the constant-size sampled gate first (k docs); exit 3 "
        "when the Wilson bound exceeds --preflight-budget",
    )
    pv.add_argument("--preflight-budget", type=float, default=0.05)
    pv.add_argument(
        "--quarantine", default=None,
        help="also write accepted/ + quarantined/ parquet under this dir",
    )
    pv.set_defaults(fn=cmd_validate)

    pr = sub.add_parser("repair")
    pr.add_argument("--input", default="synthetic")
    pr.add_argument("--out", required=True)
    pr.add_argument("--rows", type=int, default=10_000)
    pr.add_argument("--seed", type=int, default=5)
    pr.add_argument("--cores", type=int, default=None)
    pr.add_argument("--vocab-size", type=int, default=32_000)
    pr.add_argument("--bos", type=int, default=1)
    pr.add_argument("--eos", type=int, default=2)
    pr.add_argument("--pad", type=int, default=0)
    pr.add_argument("--unk", type=int, default=3)
    pr.set_defaults(fn=cmd_repair)

    pt = sub.add_parser("throughput")
    pt.add_argument("--input", default="synthetic")
    pt.add_argument("--rows", type=int, default=1_000_000)
    pt.add_argument("--seed", type=int, default=42)
    pt.add_argument("--repeat", type=int, default=2)
    pt.add_argument("--cores", type=int, default=None)
    pt.add_argument("--cache-dir", default="/tmp/jsonschema_spark_bench")
    pt.add_argument(
        "--layout", choices=["array", "packed", "packed_stats"], default="array"
    )
    pt.set_defaults(fn=cmd_throughput)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
