"""Per-query bench delta between two rounds, calibration-normalized.

Usage: python scripts/bench_delta.py [OLD_JSON] [NEW_JSON]

OLD defaults to BENCH_r03.json (the driver's tail-capture artifact — its
`tail` truncates the JSON head, so per-query numbers are RECOVERED from
the trailing `"key": value` pairs; queries cut off by the truncation are
simply absent).  NEW defaults to BENCH/bench_full_latest.json (the
self-contained artifact bench.py writes since round 4, closing VERDICT r3
"What's missing" #4).

Normalization (CLAUDE.md rule 12): host drift is workload-class-specific,
so the table carries BOTH normalized ratios — `xCG` divides the raw
new/old wall ratio by the codegen-calibration ratio (right for
expression-only queries) and `xSCAN` divides by the parquet-scan
calibration ratio (right for scan-heavy queries).  A query is only a real
regression if it regresses under ITS class's column.
"""

from __future__ import annotations

import json
import re
import sys

NON_QUERY_KEYS = {
    "sf", "corpus_rows", "corpus_tokens", "corpus_invalid",
    "corpus_duplicates", "sequences_per_sec", "tokens_per_sec", "cores",
    "calibration_sec", "calibration_scan_sec", "calibration_hof_sec",
    "value", "queries_elided",
}


def load_full(path: str):
    d = json.load(open(path))
    return (
        {k: float(v) for k, v in d["queries"].items()},
        float(d["calibration_sec"]),
        float(d["calibration_scan_sec"]),
        float(d["calibration_hof_sec"]) if "calibration_hof_sec" in d else None,
    )


def load_tail_recovered(path: str):
    d = json.load(open(path))
    if "queries" in d:  # already a full artifact
        return load_full(path)
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9][0-9.]*)', d["tail"])
    vals = {k: float(v) for k, v in pairs}
    cal = vals.pop("calibration_sec")
    cal_scan = vals.pop("calibration_scan_sec")
    cal_hof = vals.pop("calibration_hof_sec", None)
    return (
        {k: v for k, v in vals.items() if k not in NON_QUERY_KEYS},
        cal,
        cal_scan,
        cal_hof,
    )


def main() -> None:
    old_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r03.json"
    new_path = (
        sys.argv[2] if len(sys.argv) > 2 else "BENCH/bench_full_latest.json"
    )
    old_q, old_cal, old_scan, old_hof = load_tail_recovered(old_path)
    new_q, new_cal, new_scan, new_hof = load_full(new_path)
    cg_ratio = new_cal / old_cal
    scan_ratio = new_scan / old_scan
    # the interpreted-HOF class (CLAUDE.md rule 12) — present only when
    # both artifacts carry the third calibration row (bench.py >= r4)
    hof_ratio = (
        new_hof / old_hof if old_hof is not None and new_hof is not None
        else None
    )

    shared = sorted(set(old_q) & set(new_q))
    print(
        f"calibration: codegen {old_cal:.3f}->{new_cal:.3f}"
        f" (x{cg_ratio:.2f}), scan {old_scan:.3f}->{new_scan:.3f}"
        f" (x{scan_ratio:.2f})"
        + (
            f", hof {old_hof:.3f}->{new_hof:.3f} (x{hof_ratio:.2f})"
            if hof_ratio is not None
            else ""
        )
        + f"; {len(shared)} shared queries"
        f" ({len(old_q)} recovered old, {len(new_q)} new)"
    )
    print()
    hof_col = " xHOF |" if hof_ratio is not None else ""
    print(f"| query | old s | new s | raw x | xCG | xSCAN |{hof_col}")
    print("|---|---|---|---|---|---|" + ("---|" if hof_ratio else ""))
    rows = []
    for k in shared:
        raw = new_q[k] / old_q[k] if old_q[k] else float("inf")
        rows.append((raw, k))
    for raw, k in sorted(rows, reverse=True):
        print(
            f"| {k} | {old_q[k]:.3f} | {new_q[k]:.3f} | {raw:.2f}"
            f" | {raw / cg_ratio:.2f} | {raw / scan_ratio:.2f} |"
            + (f" {raw / hof_ratio:.2f} |" if hof_ratio is not None else "")
        )
    ratios = [cg_ratio, scan_ratio] + (
        [hof_ratio] if hof_ratio is not None else []
    )
    worst = [
        k for raw, k in rows if all(raw / r > 1.5 for r in ratios)
    ]
    print()
    print(
        "regressions >1.5x under ALL calibration normalizations: "
        + (", ".join(sorted(worst)) if worst else "none")
    )


if __name__ == "__main__":
    main()
