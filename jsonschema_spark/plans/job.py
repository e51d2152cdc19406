"""ValidationJob — one partition-parallel pass over the input table producing:

- per-row verdict columns + violation rows (the reference's per-document
  accept/reject contract, /root/reference/validate.go:15-21, reshaped to
  verdict rows per its own collect-errors TODO at validate.go:18),
- per-partition pass/fail lineage + metrics (persisted — resumable),
- table-level check results: uniqueness, referential, stats profile, drift.

Scale shape (design target 10^12 rows; see SURVEY.md §4):

- The row pass is ONE projection + ONE aggregation: verdict columns are
  whole-stage-codegen boolean expressions; the lineage aggregation groups by
  a *unit id* (input file when reading files, else spark partition id) with
  map-side combine, so shuffle volume is O(#units × #checks), independent of
  row count.
- Violations are filtered *before* leaving the scan stage (only failing rows
  are materialized) and written partition-parallel.
- Uniqueness/referential/drift are separate small-output jobs (salted agg /
  broadcast anti-join / histogram agg) — they re-read the scan rather than
  caching 10^12 rows; Parquet column pruning makes each re-read touch only
  the columns it needs.
- Checkpoint/resume: lineage rows are written per unit; a resumed run
  anti-joins completed units and processes only the remainder (the sink
  abstraction is a parquet directory in-sandbox, an Iceberg table on a real
  cluster — same logic either way).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_spark.operators import drift as drift_ops
from jsonschema_spark.operators import stats as stats_ops
from jsonschema_spark.operators.referential import domain_flag, orphan_key_counts
from jsonschema_spark.operators.uniqueness import duplicate_keys
from jsonschema_spark.plans.plan import CompiledPlan


def drop_completed_units(annotated: DataFrame, done_units: DataFrame) -> DataFrame:
    """Left-anti join the corpus against the completed-unit table (one
    ``unit`` column). Broadcast: O(#files) rows vs the corpus — a shuffled
    anti-join would re-shuffle every input row on ``_unit``, and an isin
    literal list would inline potentially millions of path strings into
    the plan (tests/test_corpus_pipeline.py pins the join shape)."""
    return (
        annotated.withColumn(
            "_unit",
            F.coalesce(
                F.nullif(F.input_file_name(), F.lit("")),
                F.concat(
                    F.lit("partition:"), F.spark_partition_id().cast("string")
                ),
            ),
        )
        .join(
            F.broadcast(done_units.select("unit")),
            F.col("_unit") == F.col("unit"),
            "left_anti",
        )
        .drop("_unit")
    )


class ValidationJob:
    def __init__(
        self,
        plan: CompiledPlan,
        dims: Optional[dict] = None,       # dim name -> DataFrame
        baselines: Optional[dict] = None,  # drift key -> baseline histogram DF
        id_column: str = "doc_id",
    ):
        self.plan = plan
        self.dims = dims or {}
        self.baselines = baselines or {}
        self.id_column = id_column

    # ---- row pass -----------------------------------------------------------

    def annotate(self, df: DataFrame) -> DataFrame:
        """Input + one boolean column per check + `_valid`. Referential checks
        join the row pass as domain-membership predicates: small dimensions
        compile to an isin set inside the verdict codegen stage; large ones
        fall back to a (broadcast-eligible) join so the domain never has to
        fit on the driver (see referential.domain_flag)."""
        out = self.plan.annotate(df)
        for col_name, ref in self.plan.references.items():
            dim = self.dims.get(ref["dim"])
            if dim is None:
                raise ValueError(f"missing dimension table {ref['dim']!r}")
            out = domain_flag(out, col_name, dim, ref["key"], f"chk_ref_{col_name}")
            out = out.withColumn("_valid", F.col("_valid") & F.col(f"chk_ref_{col_name}"))
        return out

    def check_columns(self, annotated: DataFrame) -> list:
        return [c for c in annotated.columns if c.startswith("chk_")]

    def violations(
        self, annotated: DataFrame, sample_fraction: float | None = None
    ) -> DataFrame:
        """(id, check, path) rows for every failed check — melted via an
        array of named structs filtered in-stage, so passing rows never
        leave the scan. For struct columns the plan carries per-field
        predicates (CompiledPlan.detail), so ``path`` pinpoints the failing
        field ('/addr/zip'), matching the reference's path-wrapped errors
        (validate.go:74,346,500); scalar checks report path ''.

        ``sample_fraction``: at 10^12 rows a 1% violation rate is 10^10
        rows — often too many to materialize. A deterministic hash sample
        on the id (NOT rand(): reproducible across retries/resume) keeps
        the per-check *counts* exact in lineage while bounding the itemized
        rows written."""
        checks = self.check_columns(annotated)
        if sample_fraction is not None and sample_fraction < 1.0:
            threshold = int(sample_fraction * 1_000_000)
            annotated = annotated.filter(
                F.pmod(F.xxhash64(F.col(self.id_column), F.lit(7)), F.lit(1_000_000))
                < threshold
            )
        detail = getattr(self.plan, "detail", None) or {}
        detail_specs = getattr(self.plan, "detail_specs", None) or {}
        items = []

        def entry(name: str, path: str) -> Column:
            # `detail` = the violated spec fragment, a compile-time constant
            # (the reference's keyword-bearing error text, README.md:41-42)
            frag = detail_specs.get(name, {}).get(path)
            return F.struct(
                F.lit(name).alias("check"),
                F.lit(path).alias("path"),
                (F.lit(frag) if frag is not None else F.lit(None).cast("string")).alias(
                    "detail"
                ),
            )

        kernel_verdicts = getattr(self.plan, "kernel_verdicts", None) or {}
        for c in checks:
            name = c.removeprefix("chk_")
            named = detail.get(name)
            if named:
                # one candidate entry per path; the per-path predicate is
                # evaluated in the same stage (input columns are still
                # present in the annotated frame), never a second pass
                for path, pred in named.items():
                    items.append(
                        F.when(~F.coalesce(pred, F.lit(False)), entry(name, path))
                    )
            elif name in kernel_verdicts and f"_verdict_{name}" in annotated.columns:
                # kernel checks carry the evaluator's own error location:
                # path/keyword/message from the materialized verdict struct
                v = F.col(f"_verdict_{name}")
                items.append(
                    F.when(
                        ~F.col(c),
                        F.struct(
                            F.lit(name).alias("check"),
                            F.coalesce(v.getField("first_path"), F.lit("")).alias(
                                "path"
                            ),
                            F.concat_ws(
                                ": ",
                                v.getField("first_keyword"),
                                v.getField("first_message"),
                            ).alias("detail"),
                        ),
                    )
                )
            else:
                items.append(F.when(~F.col(c), entry(name, "")))
        entries = F.filter(F.array(*items), lambda x: x.isNotNull())
        # dynamic map keys (patternProperties/additionalProperties over
        # arbitrary keys): the plan carries a runtime array of failing
        # '/<key>' paths per row — same scan stage, concatenated in
        def _tag(check_name: str):
            # NOTE: must be unary — F.transform inspects lambda arity, and a
            # second (defaulted) parameter would receive the element INDEX
            return lambda x: F.struct(
                F.lit(check_name).alias("check"),
                x.getField("path").alias("path"),
                x.getField("detail").alias("detail"),
            )

        for name, arr in (getattr(self.plan, "detail_dynamic", None) or {}).items():
            entries = F.concat(entries, F.transform(arr, _tag(name)))
        return (
            annotated.select(F.col(self.id_column).alias("id"), entries.alias("failed"))
            .filter(F.size("failed") > 0)
            .select("id", F.explode("failed").alias("f"))
            .select(
                "id",
                F.col("f.check").alias("check"),
                F.col("f.path").alias("path"),
                F.col("f.detail").alias("detail"),
            )
        )

    def quarantine(
        self, annotated: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """Route rows by verdict: ``(accepted, quarantined)`` — the
        serving split a validation stage hands downstream (accepted rows
        flow on with the check/_valid columns dropped; quarantined rows
        carry ``n_failed`` and the sorted comma-joined ``failed_checks``
        label next to their original payload, the triage artifact an
        ingest-repair queue consumes). The reference's fail-fast
        accept/reject (validate.go:15) lifted to a table-scale router.

        Scale shape: both halves are filters over the SAME annotated
        scan-stage projection — no shuffle, no second pass; the
        failed-check array is the in-stage filter(array(when...)) idiom
        violations() uses, bounded by |checks|."""
        checks = self.check_columns(annotated)
        drop = checks + ["_valid"] + [
            c for c in annotated.columns if c.startswith("_verdict_")
        ]
        accepted = annotated.filter(F.col("_valid")).drop(*drop)
        failed = F.filter(
            F.array(
                *[
                    F.when(
                        ~F.coalesce(F.col(c), F.lit(False)),
                        F.lit(c.removeprefix("chk_")),
                    )
                    for c in checks
                ]
            ),
            lambda x: x.isNotNull(),
        )
        payload = [c for c in annotated.columns if c not in set(drop)]
        quarantined = (
            annotated.filter(~F.col("_valid"))
            .select(
                *payload,
                F.size(failed).alias("n_failed"),
                F.array_join(F.array_sort(failed), ",").alias(
                    "failed_checks"
                ),
            )
        )
        return accepted, quarantined

    def partition_lineage(self, annotated: DataFrame, unit: str = "auto") -> DataFrame:
        """Per-unit pass/fail + per-check fail counts. Unit = input file name
        when present (stable across reruns → resumable), else partition id."""
        checks = self.check_columns(annotated)
        if unit == "auto":
            unit_col = F.coalesce(
                F.nullif(F.input_file_name(), F.lit("")),
                F.concat(F.lit("partition:"), F.spark_partition_id().cast("string")),
            )
        else:
            unit_col = F.col(unit)
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_valid").cast("long")).alias("n_valid"),
        ]
        for c in checks:
            aggs.append(F.sum((~F.col(c)).cast("long")).alias(f"fail_{c.removeprefix('chk_')}"))
        return annotated.groupBy(unit_col.alias("unit")).agg(*aggs)

    # ---- table-level checks --------------------------------------------------

    def uniqueness(self, df: DataFrame) -> dict:
        return {
            key: duplicate_keys(df, key) for key in self.plan.unique
        }

    def referential(self, df: DataFrame) -> dict:
        out = {}
        for col_name, ref in self.plan.references.items():
            dim = self.dims.get(ref["dim"])
            out[col_name] = orphan_key_counts(df, col_name, dim, ref["key"])
        return out

    def drift(self, df: DataFrame) -> dict:
        out = {}
        for key, conf in self.plan.drift.items():
            if key == "token_freq":
                if not conf:
                    continue
                current = stats_ops.token_frequencies(df)
                baseline = self.baselines.get("token_freq")
                if baseline is None:
                    continue
                out["token_freq"] = drift_ops.drift_report(
                    current, baseline, key="token", cnt="cnt"
                )
            else:
                baseline = self.baselines.get(key)
                if baseline is None:
                    continue
                current = stats_ops.histogram(
                    df, key, conf["bins"], conf["lo"], conf["hi"]
                )
                out[key] = drift_ops.drift_report(current, baseline, key="bucket")
        return out

    # ---- orchestrated run with checkpoint/resume ------------------------------

    def run(
        self,
        df: DataFrame,
        results_dir: str,
        resume: bool = False,
        profile_columns: Optional[list] = None,
    ) -> dict:
        """Full validation pass. Writes under results_dir:
        ``lineage/`` (per-unit verdicts, the checkpoint), ``violations/``,
        ``duplicates_<key>/``, ``orphans_<col>/``, ``profile/``,
        ``summary.json``. Returns the summary dict."""
        spark = df.sparkSession
        t0 = time.time()

        annotated = self.annotate(df)

        resumed_units_skipped = 0
        lineage_path = os.path.join(results_dir, "lineage")
        if resume and os.path.isdir(lineage_path):
            # Anti-join resume (the contract in the module docstring): at
            # design scale units are input files — potentially millions of
            # path strings — so the completed set must never ride the plan
            # as an isin literal list or a driver-side collect. Eagerly
            # localCheckpoint the tiny distinct-units table first: the
            # lineage dir is appended to below, and a lazy read of the same
            # path inside the anti-join would race its own writer.
            done_units = (
                spark.read.parquet(lineage_path)
                .select("unit")
                .distinct()
                .localCheckpoint(eager=True)
            )
            resumed_units_skipped = done_units.count()
            if resumed_units_skipped:
                annotated = drop_completed_units(annotated, done_units)

        lineage = self.partition_lineage(annotated)
        lineage.write.mode("append" if resume else "overwrite").parquet(lineage_path)

        self.violations(annotated).write.mode(
            "append" if resume else "overwrite"
        ).parquet(os.path.join(results_dir, "violations"))

        dup_counts = {}
        for key, dups in self.uniqueness(df).items():
            dups.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"duplicates_{key}")
            )
            dup_counts[key] = spark.read.parquet(
                os.path.join(results_dir, f"duplicates_{key}")
            ).count()

        orphan_counts = {}
        for col_name, orphans in self.referential(df).items():
            orphans.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"orphans_{col_name}")
            )
            orphan_counts[col_name] = (
                spark.read.parquet(os.path.join(results_dir, f"orphans_{col_name}"))
                .agg(F.sum("n_rows")).collect()[0][0] or 0
            )

        stats_ops.column_profile(df, profile_columns).write.mode("overwrite").parquet(
            os.path.join(results_dir, "profile")
        )

        drift_reports = self.drift(df)

        final_lineage = spark.read.parquet(lineage_path)
        totals = final_lineage.agg(
            F.sum("n_rows").alias("n"), F.sum("n_valid").alias("v")
        ).collect()[0]
        summary = {
            "n_rows": totals.n or 0,
            "n_valid": totals.v or 0,
            "n_invalid": (totals.n or 0) - (totals.v or 0),
            "checks": self.plan.check_names
            + [f"ref_{c}" for c in self.plan.references],
            "duplicates": dup_counts,
            "orphans": orphan_counts,
            "drift": drift_reports,
            "resumed_units_skipped": resumed_units_skipped,
            "wall_sec": time.time() - t0,
        }
        with open(os.path.join(results_dir, "summary.json"), "w") as fh:
            json.dump(summary, fh, indent=2, default=str)
        return summary
