"""Data-quality profiling and constraint-discovery operators.

The reference engine (/root/reference — a per-document Go draft-4
validator, see SURVEY.md §1) validates AGAINST a spec; this module is
the table-level discovery layer a validation engine runs BEFORE a spec
exists and BETWEEN runs: profile every column in one pass, discover
candidate functional dependencies, quantify column associations, test
numeric columns against the significant-digit law, and watch the metric
history a resumable job persists for regressions.

Public-knowledge basis (all cited techniques are published):

- Schelter et al., "Automating Large-Scale Data Quality Verification",
  VLDB 2018 (the Deequ paper): per-column completeness / distinctness /
  uniqueness / entropy profiles, the shareable-scan "stacked" profiling
  pass, and metrics-repository anomaly detection over run history.
- Huhtala et al., "TANE: An Efficient Algorithm for Discovering
  Functional and Approximate Dependencies", Comput. J. 1999: the g3
  error measure (min rows to delete for an FD to hold exactly).
- Hill, "A Statistical Derivation of the Significant-Digit Law",
  Statistical Science 1995: the Benford first-digit distribution used
  as a forensic plausibility check on numeric columns.
- Cover & Thomas, "Elements of Information Theory": entropy / mutual
  information identities (H = ln N - (1/N)·Σ c·ln c) that reduce every
  information measure here to ONE scalar aggregate per distribution.

Scale shapes (each operator's docstring details its own):
- one corpus pass each; everything downstream aggregates value-histogram
  or group-count tables (rows = distinct values / groups, not corpus rows);
- no forced broadcasts — the only crossJoins are 1-row scalar aggregates
  (the pattern plans/audit.py proves bounded);
- no Python on any path: every expression is a native Column, so the
  whole family stays inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _entropy_from(sum_clnc: Column, n: Column) -> Column:
    """Shannon entropy (nats) from Σ c·ln c and N: H = ln N - Σc·ln c / N.

    The identity turns entropy into a single map-side-combinable SUM —
    no second pass to normalize counts into probabilities. Guarded to
    NULL when the distribution is empty."""
    nd = n.cast("double")
    return F.when(n > 0, F.log(nd) - sum_clnc / nd)


def column_profile(
    df: DataFrame,
    cols: Sequence[str],
    decimals: int = 6,
) -> DataFrame:
    """One row per profiled column: ``(column, n_rows, n_null,
    n_distinct, n_unique, distinctness, uniqueness, entropy, mode_value,
    mode_count)`` — the Deequ-style single-pass profile (completeness,
    distinctness = |V|/N, uniqueness = |{v: count(v)=1}|/N over non-null
    rows, Shannon entropy in nats, and the modal value with a
    deterministic count-desc/value-desc tie-break).

    Scale shape: values are stacked as (column, value) pairs with ONE
    generate over the corpus (k columns → k·rows narrow rows, no
    shuffle), then ONE map-side-combined groupBy(column, value), then
    ONE groupBy(column) computing every statistic INCLUDING the mode
    (max over (count, value) structs — ties break to the larger value,
    deterministically) — exactly two exchanges, one corpus scan, no
    joins, no windows.  A per-column window here would sort a
    high-cardinality column's whole histogram in one task (measured
    0.49 scaling efficiency before this shape); branching the histogram
    into mode/stat subplans re-scans the corpus per branch (Spark does
    not reuse exchanges across aggregate branches).  For columns whose
    cardinality approaches corpus size (ids) the histogram IS the cost —
    identical to any exact distinct count; that is the profile's
    contract (swap in HLL sketches upstream if an approximate profile
    suffices)."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("_cv")
    ).select("_cv.column", "_cv.value")
    counts = stacked.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("_c")
    )
    nn = (F.col("n_rows") - F.col("n_null")).cast("long")
    nnd = nn.cast("double")
    agg = counts.groupBy("column").agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("_c"))), F.lit(0)
        )
        .cast("long")
        .alias("n_null"),
        F.count(F.when(F.col("value").isNotNull(), 1))
        .cast("long")
        .alias("n_distinct"),
        F.count(F.when(F.col("value").isNotNull() & (F.col("_c") == 1), 1))
        .cast("long")
        .alias("n_unique"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("value").isNotNull(),
                    F.col("_c").cast("double")
                    * F.log(F.col("_c").cast("double")),
                )
            ),
            F.lit(0.0),
        ).alias("_clnc"),
        F.max(
            F.when(
                F.col("value").isNotNull(),
                F.struct(F.col("_c").alias("c"), F.col("value").alias("v")),
            )
        ).alias("_mode"),
    )
    return agg.select(
        "column",
        "n_rows",
        "n_null",
        "n_distinct",
        "n_unique",
        F.round(F.when(nn > 0, F.col("n_distinct") / nnd), decimals).alias(
            "distinctness"
        ),
        F.round(F.when(nn > 0, F.col("n_unique") / nnd), decimals).alias(
            "uniqueness"
        ),
        F.round(_entropy_from(F.col("_clnc"), nn), decimals).alias("entropy"),
        F.col("_mode.v").alias("mode_value"),
        F.col("_mode.c").cast("long").alias("mode_count"),
    )


def numeric_profile(
    df: DataFrame,
    cols: Sequence[str],
    decimals: int = 6,
) -> DataFrame:
    """One row per numeric column: ``(column, n_rows, n_null, min, max,
    mean, std, p25, p50, p75, p95)`` — the numeric sibling of
    ``column_profile`` (Deequ's min/max/mean/stddev/approxQuantile
    metric set), all columns profiled in ONE pass.  ``std`` is the
    sample standard deviation; quantiles are exact linear-interpolated
    percentiles (swap ``F.percentile`` for ``approx_percentile`` past
    memory-comfortable per-column cardinalities — same plan shape, the
    contract every exact-percentile operator in this repo documents).

    Scale shape: values are stacked as (column, value-as-double) pairs
    with one generate (no shuffle), then ONE groupBy(column) computes
    every statistic including the percentile set — a single exchange
    whose reduce side holds k groups.  The percentile buffer is the only
    corpus-proportional state (exactness requires it); everything else
    is constant-size per group."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_cv")
    ).select("_cv.column", "_cv.v")
    pct = F.percentile(
        F.col("v"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95))
    )
    out = stacked.groupBy("column").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
        F.round(F.min("v"), decimals).alias("min"),
        F.round(F.max("v"), decimals).alias("max"),
        F.round(F.avg("v"), decimals).alias("mean"),
        F.round(F.stddev_samp("v"), decimals).alias("std"),
        pct.alias("_p"),
    )
    return out.select(
        "column",
        "n_rows",
        "n_null",
        "min",
        "max",
        "mean",
        "std",
        F.round(F.element_at("_p", 1), decimals).alias("p25"),
        F.round(F.element_at("_p", 2), decimals).alias("p50"),
        F.round(F.element_at("_p", 3), decimals).alias("p75"),
        F.round(F.element_at("_p", 4), decimals).alias("p95"),
    )


def fd_audit(
    df: DataFrame,
    lhs_col: str,
    rhs_col: str,
    decimals: int = 6,
) -> DataFrame:
    """One row ``(n_groups, n_violating_groups, n_rows,
    n_violating_rows, g3_rows, fd_strength)``: does ``lhs_col``
    functionally determine ``rhs_col``?  A group (one lhs value)
    violates when it maps to >1 distinct rhs value; ``g3_rows`` is
    TANE's g3 error — the minimum number of rows to delete for the FD
    to hold exactly (Σ over groups of rows − max-agreeing-rows) — and
    ``fd_strength = 1 − g3/n_rows`` is the approximate-FD confidence a
    constraint-suggestion pass thresholds on before emitting a
    dependency into an inferred spec.  Null lhs/rhs rows are excluded
    (an FD says nothing about missing determinants).

    Scale shape: ONE map-side-combined groupBy(lhs, rhs) over the
    corpus; the per-group rollup and the final summary aggregate the
    (lhs, rhs)-count table — rows = distinct pairs, not corpus rows.
    Skewed determinants are just heavy reduce keys (AQE splits them);
    nothing is collected."""
    base = df.select(
        F.col(lhs_col).alias("_l"), F.col(rhs_col).alias("_r")
    ).filter(F.col("_l").isNotNull() & F.col("_r").isNotNull())
    pairs = base.groupBy("_l", "_r").agg(F.count(F.lit(1)).alias("_c"))
    per = pairs.groupBy("_l").agg(
        F.sum("_c").alias("_rows"),
        F.max("_c").alias("_maxc"),
        F.count(F.lit(1)).alias("_nr"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("_nr") > 1).cast("long")).alias("n_violating_groups"),
        F.sum("_rows").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("_nr") > 1, F.col("_rows"))), F.lit(0)
        )
        .cast("long")
        .alias("n_violating_rows"),
        F.sum(F.col("_rows") - F.col("_maxc")).cast("long").alias("g3_rows"),
        F.round(
            F.lit(1.0)
            - F.sum(F.col("_rows") - F.col("_maxc")).cast("double")
            / F.sum("_rows").cast("double"),
            decimals,
        ).alias("fd_strength"),
    )


def fd_audit_by(
    df: DataFrame,
    cond_col: str,
    lhs_col: str,
    rhs_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per condition value: the ``fd_audit`` summary — conditional
    functional dependencies (Bohannon et al., "Conditional Functional
    Dependencies for Data Cleaning", ICDE 2007): an FD that fails
    globally often HOLDS within slices (per source, per format
    version), and the slice where strength collapses is the one whose
    ingest broke.  Output: ``(cond, n_groups, n_violating_groups,
    n_rows, n_violating_rows, g3_rows, fd_strength)``, one row per
    distinct value of ``cond_col``.  Null condition/lhs/rhs rows are
    excluded, as in ``fd_audit``.

    Scale shape: identical to ``fd_audit`` with the condition prepended
    to every grouping key — one map-side-combined groupBy(cond, lhs,
    rhs) over the corpus, then rollups over the pair-count table; the
    output is condition-cardinality-sized."""
    base = df.select(
        F.col(cond_col).alias("_cond"),
        F.col(lhs_col).alias("_l"),
        F.col(rhs_col).alias("_r"),
    ).filter(
        F.col("_cond").isNotNull()
        & F.col("_l").isNotNull()
        & F.col("_r").isNotNull()
    )
    pairs = base.groupBy("_cond", "_l", "_r").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per = pairs.groupBy("_cond", "_l").agg(
        F.sum("_c").alias("_rows"),
        F.max("_c").alias("_maxc"),
        F.count(F.lit(1)).alias("_nr"),
    )
    return per.groupBy(F.col("_cond").alias("cond")).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("_nr") > 1).cast("long")).alias("n_violating_groups"),
        F.sum("_rows").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("_nr") > 1, F.col("_rows"))), F.lit(0)
        )
        .cast("long")
        .alias("n_violating_rows"),
        F.sum(F.col("_rows") - F.col("_maxc")).cast("long").alias("g3_rows"),
        F.round(
            F.lit(1.0)
            - F.sum(F.col("_rows") - F.col("_maxc")).cast("double")
            / F.sum("_rows").cast("double"),
            decimals,
        ).alias("fd_strength"),
    )


def categorical_mi(
    df: DataFrame,
    col_a: str,
    col_b: str,
    decimals: int = 6,
) -> DataFrame:
    """One row ``(n_rows, n_a, n_b, n_cells, h_a, h_b, h_ab, mi, nmi)``:
    Shannon entropies (nats) of two categorical columns, their joint
    entropy, mutual information MI = H(A)+H(B)−H(AB), and the
    geometric-mean-normalized NMI = MI/√(H(A)·H(B)) — the
    association-strength profile behind "is `source` informative about
    `lang`?" checks and redundant-column detection.  Rows where either
    side is null are excluded.

    Scale shape: ONE map-side-combined groupBy(a, b) over the corpus;
    both marginals derive from the joint-cell table (rows = distinct
    pairs).  Via H = ln N − Σc·ln c / N each entropy is a single scalar
    SUM, so the three distributions reduce to three keyless aggregates
    combined with 1-row broadcast crossJoins (the bounded pattern
    plans/audit.py proves) — corpus rows shuffle exactly once."""
    base = df.select(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    cells = base.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_c"))
    clnc = F.col("_c").cast("double") * F.log(F.col("_c").cast("double"))
    s_ab = cells.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("_n"),
        F.coalesce(F.sum(clnc), F.lit(0.0)).alias("_sab"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    ma = cells.groupBy("_a").agg(F.sum("_c").alias("_ca"))
    s_a = ma.agg(
        F.coalesce(
            F.sum(F.col("_ca").cast("double") * F.log(F.col("_ca").cast("double"))),
            F.lit(0.0),
        ).alias("_sa"),
        F.count(F.lit(1)).cast("long").alias("n_a"),
    )
    mb = cells.groupBy("_b").agg(F.sum("_c").alias("_cb"))
    s_b = mb.agg(
        F.coalesce(
            F.sum(F.col("_cb").cast("double") * F.log(F.col("_cb").cast("double"))),
            F.lit(0.0),
        ).alias("_sb"),
        F.count(F.lit(1)).cast("long").alias("n_b"),
    )
    one = s_ab.crossJoin(F.broadcast(s_a)).crossJoin(F.broadcast(s_b))
    h_a = _entropy_from(F.col("_sa"), F.col("_n"))
    h_b = _entropy_from(F.col("_sb"), F.col("_n"))
    h_ab = _entropy_from(F.col("_sab"), F.col("_n"))
    mi = h_a + h_b - h_ab
    return one.select(
        F.col("_n").alias("n_rows"),
        "n_a",
        "n_b",
        "n_cells",
        F.round(h_a, decimals).alias("h_a"),
        F.round(h_b, decimals).alias("h_b"),
        F.round(h_ab, decimals).alias("h_ab"),
        F.round(mi, decimals).alias("mi"),
        F.round(
            F.when((h_a > 0) & (h_b > 0), mi / F.sqrt(h_a * h_b)),
            decimals,
        ).alias("nmi"),
    )


def benford_first_digit(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
    decimals: int = 6,
) -> DataFrame:
    """Nine rows ``(digit, n, rate, expected, chi2_term)``: observed
    first-significant-digit distribution of a positive numeric column
    vs Benford's law (P(d) = log10(1 + 1/d)), with the per-digit χ²
    contribution — the forensic plausibility test for price/amount-like
    columns (fabricated or clipped data bends the leading-digit curve).

    ``scale`` shifts fixed-point values into integers first (100 =
    cents) so digit extraction is exact integer string math, not
    float-format-dependent: floor(value·scale) is the same IEEE double
    op in any engine — PRECONDITION: ``value_col`` must be a DOUBLE (a
    DECIMAL column would hit decimal-literal math that differs across
    engines; CAST first).  The leading digit of the resulting integer's
    decimal rendering is engine-independent.  Non-positive values are
    excluded (Benford is defined on positive magnitudes).

    All nine rows are ALWAYS emitted (counts left-join a literal 1..9
    digit spine, absent digits coalesce to n=0): a summed χ² must
    include the (N·P(d))²/(N·P(d)) = N·P(d) contribution of a digit
    with zero observations — exactly the most-skewed case the test
    exists to flag (ADVICE r4).

    Scale shape: one corpus pass → map-side-combined groupBy on a
    9-value key; the spine join and the 1-row total broadcast touch
    only the 9-row histogram, never corpus rows."""
    units = F.floor(F.col(value_col) * F.lit(float(scale))).cast("long")
    digits = df.select(units.alias("_u")).filter(F.col("_u") > 0).select(
        F.substring(F.col("_u").cast("string"), 1, 1).cast("int").alias("digit")
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = spine.join(
        digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n")),
        "digit",
        "left",
    ).select("digit", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    tot = counts.agg(F.sum("n").cast("double").alias("_N"))
    expected = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")) / F.log(
        F.lit(10.0)
    )
    exp_n = F.col("_N") * expected
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("_N"), decimals).alias("rate"),
            F.round(expected, decimals).alias("expected"),
            F.round(
                (F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n, decimals
            ).alias("chi2_term"),
        )
    )


def evaluate_expectations(
    df: DataFrame,
    expectations: Sequence[dict],
    decimals: int = 6,
) -> DataFrame:
    """One verdict row per declared expectation: ``(name, metric,
    column, value, op, threshold, passed)`` — the Deequ
    VerificationSuite analog (Schelter et al. VLDB 2018): a batch of
    TABLE-level metric constraints (the per-row keyword compiler's
    sibling — specs constrain rows, expectations constrain aggregates)
    evaluated against the corpus in ONE keyless aggregate pass.

    Each expectation is ``{"name": ..., "metric": ..., "column": ...,
    "op": "<=" | ">=", "threshold": float}`` with metrics ``n_rows``
    (column ignored), ``null_rate``, ``n_distinct``, ``min``, ``max``,
    ``mean``.  ``passed`` compares the ROUNDED value (so a verdict is
    reproducible across engines and reruns — an expectation that hinges
    on digits beyond ``decimals`` is underspecified).

    Scale shape: every referenced metric lowers into one combined
    keyless aggregate over a single corpus scan (count-distincts expand
    map-side; everything else is constant-state); the verdict rows are
    a literal explode over the 1-row aggregate — expectations-count
    rows, no second pass, no joins."""
    metric_cols: dict = {}

    def _metric_expr(metric: str, column: str):
        c = F.col(column) if column else None
        if metric == "n_rows":
            return F.count(F.lit(1)).cast("double")
        if metric == "null_rate":
            return F.avg(c.isNull().cast("double"))
        if metric == "n_distinct":
            return F.countDistinct(c).cast("double")
        if metric == "min":
            return F.min(c).cast("double")
        if metric == "max":
            return F.max(c).cast("double")
        if metric == "mean":
            return F.avg(c.cast("double"))
        raise ValueError(f"unknown expectation metric: {metric}")

    for e in expectations:
        if e["op"] not in ("<=", ">="):
            # mirror the unknown-metric ValueError: a malformed op must
            # fail loudly, not silently evaluate as '>=' (ADVICE r4)
            raise ValueError(f"unknown expectation op: {e['op']!r}")
        key = f"{e['metric']}::{e.get('column') or ''}"
        if key not in metric_cols:
            metric_cols[key] = _metric_expr(e["metric"], e.get("column"))
    agg = df.agg(
        *[expr.alias(f"_m{i}") for i, (k, expr) in enumerate(metric_cols.items())]
    )
    slot = {k: f"_m{i}" for i, k in enumerate(metric_cols)}
    rows = []
    for e in expectations:
        v = F.round(
            F.col(slot[f"{e['metric']}::{e.get('column') or ''}"]), decimals
        )
        thr = F.lit(float(e["threshold"]))
        passed = v <= thr if e["op"] == "<=" else v >= thr
        rows.append(
            F.struct(
                F.lit(e["name"]).alias("name"),
                F.lit(e["metric"]).alias("metric"),
                F.lit(e.get("column") or "").alias("column"),
                v.alias("value"),
                F.lit(e["op"]).alias("op"),
                thr.alias("threshold"),
                F.coalesce(passed, F.lit(False)).alias("passed"),
            )
        )
    return agg.select(F.explode(F.array(*rows)).alias("_e")).select("_e.*")


def suggest_constraints(
    df: DataFrame,
    cols: Sequence[str],
    numeric_cols: Sequence[str] = (),
    enum_max: int = 16,
    decimals: int = 6,
) -> DataFrame:
    """One row per candidate constraint: ``(column, kind, metric, op,
    threshold, observed, suggested)`` — Deequ-style constraint
    SUGGESTION (Schelter et al. VLDB 2018): profile the columns once
    and nominate the expectations the data currently satisfies, in
    exactly the metric/op/threshold vocabulary ``evaluate_expectations``
    consumes, so the discovery→verification loop closes mechanically:

    - ``required``  — null_rate <= 0, suggested when no nulls observed
    - ``unique``    — n_distinct >= observed, suggested when every
      non-null value is distinct (key candidate)
    - ``enum_bounded`` — n_distinct <= observed, suggested when the
      domain is small (≤ ``enum_max``)
    - ``min_bound``/``max_bound`` (numeric columns) — observed bounds

    Every candidate is emitted with its observed value; ``suggested``
    says whether the data supports it.  Thresholds are the ROUNDED
    observed values — a suggestion must re-verify green by construction.

    Scale shape: identical to ``evaluate_expectations`` — every
    referenced statistic lowers into ONE combined keyless aggregate
    over a single corpus scan (count-distincts expand map-side), and
    the candidate rows are a literal explode over the 1-row aggregate."""
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.count(col).cast("double").alias(f"_nn{i}"),
            F.avg(col.isNull().cast("double")).alias(f"_nr{i}"),
            F.countDistinct(col).cast("double").alias(f"_nd{i}"),
        ]
    for j, c in enumerate(numeric_cols):
        aggs += [
            F.min(F.col(c)).cast("double").alias(f"_mn{j}"),
            F.max(F.col(c)).cast("double").alias(f"_mx{j}"),
        ]
    one = df.agg(*aggs)

    def _row(column, kind, metric, op, threshold, observed, suggested):
        return F.struct(
            F.lit(column).alias("column"),
            F.lit(kind).alias("kind"),
            F.lit(metric).alias("metric"),
            F.lit(op).alias("op"),
            threshold.alias("threshold"),
            observed.alias("observed"),
            F.coalesce(suggested, F.lit(False)).alias("suggested"),
        )

    rows = []
    for i, c in enumerate(cols):
        nn, nr, nd = F.col(f"_nn{i}"), F.col(f"_nr{i}"), F.col(f"_nd{i}")
        rows.append(
            _row(c, "required", "null_rate", "<=", F.lit(0.0),
                 F.round(nr, decimals), nr == 0)
        )
        rows.append(
            _row(c, "unique", "n_distinct", ">=", F.round(nd, decimals),
                 F.round(nd, decimals), (nd == nn) & (nn > 0))
        )
        rows.append(
            _row(c, "enum_bounded", "n_distinct", "<=",
                 F.round(nd, decimals), F.round(nd, decimals),
                 (nd <= enum_max) & (nn > 0))
        )
    for j, c in enumerate(numeric_cols):
        mn, mx = F.col(f"_mn{j}"), F.col(f"_mx{j}")
        rows.append(
            _row(c, "min_bound", "min", ">=", F.round(mn, decimals),
                 F.round(mn, decimals), mn.isNotNull())
        )
        rows.append(
            _row(c, "max_bound", "max", "<=", F.round(mx, decimals),
                 F.round(mx, decimals), mx.isNotNull())
        )
    return one.select(F.explode(F.array(*rows)).alias("_s")).select("_s.*")


def join_cardinality_profile(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    decimals: int = 6,
) -> DataFrame:
    """One row profiling the relationship two tables would have if joined
    on a key — the pre-flight audit that catches an accidental N:M
    explosion BEFORE a 100-TB join runs: ``(n_left_rows, n_right_rows,
    n_left_keys, n_right_keys, n_matched_keys, n_left_only_keys,
    n_right_only_keys, max_left_per_key, max_right_per_key, max_fanout,
    join_rows, left_match_rate, relationship)``.  ``join_rows`` is the
    EXACT inner-join output size (Σ over matched keys of cl·cr) computed
    from per-key counts without running the join; ``relationship``
    classifies as 1:1 / 1:N / N:1 / N:M from the per-side max
    multiplicities; ``left_match_rate`` is the fraction of left rows
    that find a partner (the referential-integrity companion to
    orphan_rows).  Null keys are excluded on both sides.

    Scale shape: each side collapses to its key-count table with one
    map-side-combined groupBy; the two key tables full-outer join on the
    uniform key (1:1 by construction — no fan-out, AQE picks the
    strategy); the summary is a single keyless aggregate.  Corpus rows
    are never joined — only key histograms are."""
    lc = (
        left.select(F.col(left_key).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_cl"))
    )
    rc = (
        right.select(F.col(right_key).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_cr"))
    )
    j = lc.join(rc, "_k", "full_outer")
    matched = F.col("_cl").isNotNull() & F.col("_cr").isNotNull()
    max_l = F.max(F.coalesce(F.col("_cl"), F.lit(0)))
    max_r = F.max(F.coalesce(F.col("_cr"), F.lit(0)))
    summary = j.agg(
        F.coalesce(F.sum("_cl"), F.lit(0)).cast("long").alias("n_left_rows"),
        F.coalesce(F.sum("_cr"), F.lit(0)).cast("long").alias("n_right_rows"),
        F.count("_cl").cast("long").alias("n_left_keys"),
        F.count("_cr").cast("long").alias("n_right_keys"),
        F.sum(matched.cast("long")).alias("n_matched_keys"),
        F.sum((F.col("_cr").isNull()).cast("long")).alias("n_left_only_keys"),
        F.sum((F.col("_cl").isNull()).cast("long")).alias("n_right_only_keys"),
        max_l.cast("long").alias("max_left_per_key"),
        max_r.cast("long").alias("max_right_per_key"),
        F.coalesce(
            F.max(F.when(matched, F.col("_cl") * F.col("_cr"))), F.lit(0)
        )
        .cast("long")
        .alias("max_fanout"),
        F.coalesce(F.sum(F.when(matched, F.col("_cl") * F.col("_cr"))), F.lit(0))
        .cast("long")
        .alias("join_rows"),
        F.coalesce(F.sum(F.when(matched, F.col("_cl"))), F.lit(0)).alias("_ml"),
        F.max(F.when(matched, F.col("_cl"))).alias("_mml"),
        F.max(F.when(matched, F.col("_cr"))).alias("_mmr"),
    )
    rel = (
        F.when(F.col("n_matched_keys") == 0, F.lit("disjoint"))
        .when((F.col("_mml") <= 1) & (F.col("_mmr") <= 1), F.lit("1:1"))
        .when(F.col("_mml") <= 1, F.lit("1:N"))
        .when(F.col("_mmr") <= 1, F.lit("N:1"))
        .otherwise(F.lit("N:M"))
    )
    return summary.select(
        "n_left_rows",
        "n_right_rows",
        "n_left_keys",
        "n_right_keys",
        "n_matched_keys",
        "n_left_only_keys",
        "n_right_only_keys",
        "max_left_per_key",
        "max_right_per_key",
        "max_fanout",
        "join_rows",
        F.round(
            F.when(
                F.col("n_left_rows") > 0,
                F.col("_ml") / F.col("n_left_rows").cast("double"),
            ),
            decimals,
        ).alias("left_match_rate"),
        rel.alias("relationship"),
    )


def inclusion_audit(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    decimals: int = 6,
) -> DataFrame:
    """One row ``(n_child_values, n_parent_values, n_missing_values,
    containment)``: what fraction of the child column's distinct values
    appear in the parent column — the inclusion-dependency measure
    behind foreign-key DISCOVERY (containment 1.0 ⇒ child ⊆ parent, an
    FK candidate worth promoting to a referential check; the discovery
    companion to referential.orphan_rows, which ENFORCES a known FK and
    counts rows, not values).  Null values are excluded on both sides.

    Scale shape: each side collapses to its distinct-value set with one
    map-side-combined aggregate; the left-anti join runs value-set vs
    value-set on the uniform key (AQE picks the strategy — neither side
    is force-broadcast since an id-like column's value set is
    corpus-sized); the summary combines three keyless aggregates via
    1-row broadcast crossJoins.  Corpus rows are never joined."""
    cv = (
        child.select(F.col(child_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .distinct()
    )
    pv = (
        parent.select(F.col(parent_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .distinct()
    )
    n_c = cv.agg(F.count(F.lit(1)).cast("long").alias("n_child_values"))
    n_p = pv.agg(F.count(F.lit(1)).cast("long").alias("n_parent_values"))
    n_m = cv.join(pv, "_v", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_missing_values")
    )
    return (
        n_c.crossJoin(F.broadcast(n_p))
        .crossJoin(F.broadcast(n_m))
        .select(
            "n_child_values",
            "n_parent_values",
            "n_missing_values",
            F.round(
                F.when(
                    F.col("n_child_values") > 0,
                    F.lit(1.0)
                    - F.col("n_missing_values")
                    / F.col("n_child_values").cast("double"),
                ),
                decimals,
            ).alias("containment"),
        )
    )


def freshness_audit(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per group: ``(group, n_events, first_ts, last_ts, staleness_us,
    span_us, events_per_day)`` — data-freshness profile of an event/
    ingest table (Deequ's freshness metric generalized per source): how
    stale is each group relative to the table's global high-water mark,
    and at what sustained rate does it arrive.  A source whose
    ``staleness_us`` suddenly grows is a stalled feed — the
    metric-history twin (``metric_anomaly`` over per-run staleness)
    turns this into an alert.

    Scale shape: one map-side-combined groupBy(group) over the corpus
    — the ONLY corpus pass; the global high-water mark is derived from
    the already-built group table (max of per-group last_ts == global
    max, ADVICE r4 closed the second scan) and broadcast back as a
    1-row crossJoin onto the group-count table (rows = groups, not
    corpus rows).  All time math is exact integer microseconds."""
    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )
    hw = per.agg(F.max("last_ts").alias("_hw"))
    # exact integer µs; the cast accepts TIMESTAMP_NTZ columns too (the
    # session is pinned to UTC, so NTZ reinterprets losslessly)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    span = us(F.col("last_ts")) - us(F.col("first_ts"))
    return per.crossJoin(F.broadcast(hw)).select(
        "group",
        "n_events",
        "first_ts",
        "last_ts",
        (us(F.col("_hw")) - us(F.col("last_ts"))).alias("staleness_us"),
        span.alias("span_us"),
        F.round(
            F.when(
                span > 0,
                F.col("n_events")
                / (span.cast("double") / F.lit(86_400_000_000.0)),
            ),
            decimals,
        ).alias("events_per_day"),
    )


def metric_anomaly(
    history: DataFrame,
    metric_col: str = "metric",
    ds_col: str = "ds",
    value_col: str = "value",
    window: int = 6,
    min_periods: int = 3,
    z_thresh: float = 3.0,
    decimals: int = 6,
) -> DataFrame:
    """Per history point: ``(metric, ds, value, prior_n, prior_mean,
    prior_std, z, is_anomaly)`` — Deequ-style metrics-repository anomaly
    detection.  ``history`` is the (metric, ds, value) table a resumable
    validation job persists alongside its lineage (BASELINE.json north
    rule: "metrics persisted to a results table"); each point is scored
    against the trailing ``window`` PRIOR points of the same metric
    (z-score vs their mean/sample-std).  A point is anomalous when it
    has ≥ ``min_periods`` priors and either |z| > ``z_thresh`` or the
    priors were constant (std = 0) and the value moved at all — the
    "flat metric suddenly changed" case a pure z-test divides by zero
    on.  Early points (fewer priors) are never flagged: a new metric
    needs history before it can regress.

    Scale shape: the metric history is runs × metrics — metadata-sized
    by construction (thousands of rows per year of daily runs), so the
    per-metric ordered window is cheap by design; the operator still
    partitions by metric, so even a pathological million-metric
    repository stays parallel with no single-partition sort."""
    w = (
        Window.partitionBy(metric_col)
        .orderBy(ds_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    prior_n = F.count(v).over(w)
    prior_mean = F.avg(v).over(w)
    prior_std = F.stddev_samp(v).over(w)
    scored = history.select(
        F.col(metric_col).alias("metric"),
        F.col(ds_col).alias("ds"),
        v.alias("_v"),
        prior_n.alias("_pn"),
        prior_mean.alias("_pm"),
        prior_std.alias("_ps"),
    )
    z = F.when(
        (F.col("_pn") >= min_periods) & (F.col("_ps") > 0),
        (F.col("_v") - F.col("_pm")) / F.col("_ps"),
    )
    flat_jump = (
        (F.col("_pn") >= min_periods)
        & (F.col("_ps") == 0)
        & (F.col("_v") != F.col("_pm"))
    )
    return scored.select(
        "metric",
        "ds",
        F.round(F.col("_v"), decimals).alias("value"),
        F.col("_pn").cast("long").alias("prior_n"),
        F.round(F.col("_pm"), decimals).alias("prior_mean"),
        F.round(F.col("_ps"), decimals).alias("prior_std"),
        F.round(z, decimals).alias("z"),
        (F.coalesce(F.abs(z) > F.lit(float(z_thresh)), F.lit(False)) | flat_jump).alias(
            "is_anomaly"
        ),
    )
