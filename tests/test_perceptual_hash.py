"""Perceptual-hash near-dup operators (multimodal.ahash_bmp /
fingerprint_wav / phash_near_dup / phash_dup_groups).

The hashes are exact-integer contracts: a pure-Python closed-form
re-derivation from doc_id (mirroring the DuckDB oracle in
__spark_entry__) must match the numpy kernels that parse the actual
bytes, and the pigeonhole-blocked pair set must equal the exhaustive
Hamming-thresholded pair set (blocking is a plan optimization, never a
semantics change).
"""

import itertools

import pytest

from jsonschema_spark.operators.multimodal import (
    ahash_bmp,
    attach_synth_blob,
    fingerprint_wav,
    make_bmp,
    make_wav,
    perceptual_hashes,
    phash_dup_groups,
    phash_near_dup,
)


def ref_ahash(d: int, grid_rows: int = 4, grid_cols: int = 8) -> int:
    """Closed-form aHash from make_bmp's contract (the oracle's math)."""
    h = 4 + d % 5
    w = 4 + d % 7
    n = h * w
    gray = [
        ((d * 31 + 3 * j) % 256)
        + ((d * 31 + 3 * j + 1) % 256)
        + ((d * 31 + 3 * j + 2) % 256)
        for j in range(n)
    ]
    tot = sum(gray)
    sums = [0] * (grid_rows * grid_cols)
    counts = [0] * (grid_rows * grid_cols)
    for j in range(n):
        y, x = divmod(j, w)
        k = (y * grid_rows // h) * grid_cols + (x * grid_cols // w)
        sums[k] += gray[j]
        counts[k] += 1
    return sum(
        1 << k
        for k in range(grid_rows * grid_cols)
        if sums[k] * n > tot * counts[k]
    )


def ref_fingerprint(d: int, n_bits: int = 32) -> int:
    """Closed-form delta-sign fingerprint from make_wav's contract."""
    n = 32 + d % 17
    s = [(d * 131 + i * 7919) % 4096 - 2048 for i in range(n)]
    return sum(1 << i for i in range(min(n - 1, n_bits)) if s[i + 1] > s[i])


def test_ahash_matches_closed_form():
    for d in range(200):
        assert ahash_bmp(make_bmp(d)) == ref_ahash(d), d


def test_fingerprint_matches_closed_form():
    for d in range(200):
        assert fingerprint_wav(make_wav(d)) == ref_fingerprint(d), d


def test_ahash_rejects_non_bmp():
    with pytest.raises(ValueError):
        ahash_bmp(b"nope")


def test_fingerprint_short_payload_is_zero():
    # a WAV whose data chunk holds <2 samples has no deltas
    wav = (
        b"RIFF" + (38).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + (2).to_bytes(4, "little") + (7).to_bytes(2, "little")
    )
    assert fingerprint_wav(wav) == 0


def _hashes(spark, n_docs=300):
    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    return perceptual_hashes(
        attach_synth_blob(df, "doc_id", make_bmp), "doc_id", "blob"
    )


def test_phash_near_dup_equals_brute_force(spark):
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in phash_near_dup(_hashes(spark), max_hamming=1).collect()
    }
    hs = {d: ref_ahash(d) for d in range(300)}
    want = set()
    for a, b in itertools.combinations(range(300), 2):
        ham = bin(hs[a] ^ hs[b]).count("1")
        if ham <= 1:
            want.add((a, b, ham))
    assert got == want


def test_phash_dup_groups_keep_first(spark):
    rows = {
        r.phash: (r.n_docs, r.keep_id)
        for r in phash_dup_groups(_hashes(spark)).collect()
    }
    hs = {d: ref_ahash(d) for d in range(300)}
    want = {}
    for d in range(300):
        n, keep = want.get(hs[d], (0, d))
        want[hs[d]] = (n + 1, min(keep, d))
    want = {h: v for h, v in want.items() if v[0] > 1}
    assert rows == want


def test_phash_near_dup_plan_is_bucket_equijoin(spark):
    plan = (
        phash_near_dup(_hashes(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
