"""Size-guarded broadcast: the safe form of ``F.broadcast(small_side)``
for tables whose size is CORPUS-DEPENDENT rather than bounded by
construction.

A forced broadcast hint overrides every size check Spark has — the plan
ships the table to the driver and every executor regardless of how big it
turned out to be. That is right for tables bounded by construction (a
source registry, a vocab, k centroids) and wrong for tables proportional
to corpus properties we don't control: near-dup LOSERS are routinely
30-80%% of a real web crawl, i.e. billions of ids at 10^12 rows, and a
forced broadcast there OOMs the driver instead of degrading to a shuffle
join.

``guarded_broadcast`` materializes the table once (localCheckpoint —
released by the ContextCleaner when the result goes out of scope, unlike
``persist`` which pins session cache), counts it, and attaches the hint
only under a row ceiling; above it the table is returned unhinted so AQE
picks the join strategy from the REAL runtime size (shuffle anti-join
with skew splitting, or runtime broadcast if it still fits). The count is
O(partitions) on the checkpointed table, and the checkpoint itself is
usually a win — every caller here joins the guarded table at least once,
and several traverse it twice.

Same decision shape as ``referential.py::domain_flag`` (limit-probe →
isin fast path vs join), applied at the broadcast/shuffle boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2M ids × ~40 bytes ≈ 80 MB broadcast — comfortably inside executor
# memory, well past the point where a broadcast anti-join beats shuffling
# a 10^12-row corpus. Above it, shuffling the corpus once is cheaper than
# OOMing every executor.
BROADCAST_MAX_ROWS = 2_000_000


def guarded_broadcast(
    small: DataFrame,
    max_rows: int = BROADCAST_MAX_ROWS,
    stats: dict | None = None,
) -> DataFrame:
    """Materialize ``small``, count it, and return it broadcast-hinted only
    if it has at most ``max_rows`` rows; otherwise return it unhinted (AQE
    chooses the strategy from runtime size). Pass ``stats`` to receive
    ``{"rows": n, "broadcast": bool}`` for audit/testing."""
    small = small.localCheckpoint(eager=True)
    n = small.count()
    if stats is not None:
        stats["rows"] = n
        stats["broadcast"] = n <= max_rows
    return F.broadcast(small) if n <= max_rows else small
