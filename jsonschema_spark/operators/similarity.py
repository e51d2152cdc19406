"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, a random-hyperplane LSH bucketed
variant as the scale path, and embedding near-duplicate pairs.

Scale shapes:

- **Brute force** is one scan + TakeOrderedAndProject (per-partition top-k,
  driver merges k per partition — no full sort, no shuffle of the data).
  Exact, and the right choice whenever the query batch is small.
- **Vectorized kernel** (`cosine_scores_kernel`) moves the dot product into
  an Arrow-batched pandas UDF: one numpy (batch x dim) @ (dim,) matmul per
  batch. Same plan shape, ~10x the arithmetic throughput of the interpreted
  higher-order function on wide vectors; this is the documented
  "Python only as vectorized kernels" path.
- **LSH ANN**: H seeded hyperplanes -> H sign bits -> bucket int. Buckets
  partition the corpus; a query probes its own bucket plus all buckets at
  Hamming distance 1 (multi-probe), then exact-reranks. Bucketing is a
  native expression (no shuffle to build), and the probe is a bucket-set
  filter that prunes ~(1 - (H+1)/2^H) of the corpus before the exact
  rerank. Approximate: recall is tested, not assumed.

Hyperplanes are generated on the driver from a fixed seed (numpy
RandomState) and folded into the expressions as literals — deterministic
across cluster sizes, nothing shipped to executors but the plan.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def dot(vec: Column, q: Sequence[float]) -> Column:
    """Native dot product against a literal query vector via zip_with +
    aggregate (JVM-side, per-row, zero shuffle)."""
    qcol = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec, qcol, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine(vec: Column, q: Sequence[float]) -> Column:
    qn = float(np.linalg.norm(np.asarray(q, dtype="float64")))
    denom = norm(vec) * F.lit(qn)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(vec, q) / denom)


def cosine_topk(
    df: DataFrame, vec_col: str, query: Sequence[float], k: int,
    id_col: str = "vec_id", decimals: int = 6,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity. orderBy+limit compiles
    to TakeOrderedAndProject: per-partition heaps, merge-k on the driver."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), query), decimals).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def make_cosine_kernel(query: Sequence[float]):
    """Arrow-batched cosine kernel: numpy matmul per batch."""
    q = np.asarray(query, dtype="float64")
    qn = np.linalg.norm(q)

    @pandas_udf(T.DoubleType())
    def _cos(vecs: pd.Series) -> pd.Series:
        # float64 throughout: float32 inputs widen exactly, so the kernel
        # agrees with the native double-accumulating expression to ~1 ulp
        mat = np.stack(vecs.values).astype("float64")
        norms = np.linalg.norm(mat, axis=1) * qn
        norms[norms == 0] = 1.0
        return pd.Series((mat @ q) / norms)

    return _cos


def cosine_topk_kernel(
    df: DataFrame, vec_col: str, query: Sequence[float], k: int,
    id_col: str = "vec_id", decimals: int = 6,
) -> DataFrame:
    """Same result as cosine_topk via the vectorized Arrow kernel (requires
    fixed-length vectors within each batch)."""
    kernel = make_cosine_kernel(query)
    return (
        df.select(F.col(id_col), F.round(kernel(F.col(vec_col)), decimals).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# LSH ANN
# --------------------------------------------------------------------------


def hyperplanes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id: bit i = 1 iff vec . plane_i >= 0."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        bit = F.when(dot(vec, plane.tolist()) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def _probe_buckets(query: Sequence[float], planes: np.ndarray) -> list[int]:
    """Query's bucket plus all Hamming-distance-1 neighbors (multi-probe)."""
    signs = (np.asarray(planes) @ np.asarray(query, dtype="float64") >= 0).astype(int)
    base = int(sum(b << i for i, b in enumerate(signs)))
    return [base] + [base ^ (1 << i) for i in range(len(planes))]


def ann_topk(
    df: DataFrame, vec_col: str, query: Sequence[float], k: int,
    id_col: str = "vec_id", n_planes: int = 8, seed: int = 13, decimals: int = 6,
) -> DataFrame:
    """Approximate top-k: restrict to the multi-probe bucket set, then exact
    rerank. The bucket predicate is a native isin filter evaluated in the
    scan stage — at 10^12 rows it prunes ~1 - 9/256 ≈ 96% of the corpus
    before any arithmetic (and the bucket column can be precomputed and
    partition-pruned for repeated query workloads)."""
    dim = len(list(query))
    planes = hyperplanes(dim, n_planes, seed)
    probes = _probe_buckets(query, planes)
    return (
        df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
        .filter(F.col("_bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), query), decimals).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN
# --------------------------------------------------------------------------


def _make_assign_kernel(centroids: np.ndarray):
    """Arrow kernel: nearest-centroid id per vector via one (batch x dim) @
    (dim x k) matmul (cosine == dot on L2-normalized operands)."""
    c = centroids.astype("float64")
    c_norm = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    @pandas_udf(T.IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.values).astype("float64")
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ c_norm.T).argmax(axis=1).astype("int32"))

    return _assign


def ivf_train(
    df: DataFrame, vec_col: str, n_lists: int = 16, iters: int = 3,
    id_col: str = "vec_id", seed: int = 29,
) -> np.ndarray:
    """Spherical k-means (Lloyd) trained with DataFrame aggregations:
    assignment is an Arrow-kernel matmul; the centroid update is
    posexplode -> groupBy(cluster, dim) -> avg — one shuffle of
    (k x dim) grouped cells per iteration regardless of corpus size.
    Deterministic init: the n_lists rows with the smallest portable 60-bit
    md5 hash of "<id>#<seed>" (id tiebreak) — chosen over xxhash64 so the
    DuckDB oracle can replay the whole training run independently.
    Returns the (n_lists x dim) centroid matrix (driver-side, tiny)."""
    from jsonschema_spark.functions.text import portable_hash60

    init_rows = (
        df.select(
            F.col(vec_col).alias("v"),
            portable_hash60(
                F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))
            ).alias("h"),
            F.col(id_col).alias("tie"),
        )
        .orderBy("h", "tie")
        .limit(n_lists)
        .collect()
    )
    centroids = np.array([r.v for r in init_rows], dtype="float64")
    for _ in range(iters):
        assign = _make_assign_kernel(centroids)
        assigned = df.select(
            assign(F.col(vec_col)).alias("c"), F.col(vec_col).alias("v")
        )
        cells = (
            assigned.select("c", F.posexplode("v").alias("d", "x"))
            .groupBy("c", "d")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        new = centroids.copy()
        by_cluster: dict = {}
        for r in cells:
            by_cluster.setdefault(r.c, {})[r.d] = r.mu
        for cid, dims in by_cluster.items():
            for d, mu in dims.items():
                new[cid, d] = mu
        centroids = new
    return centroids


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """df + `_list` column (the inverted-list id). At scale this column is
    written once and the table is partitioned/bucketed by it, so probes
    become partition pruning instead of a full scan."""
    assign = _make_assign_kernel(centroids)
    return df.withColumn("_list", assign(F.col(vec_col)))


def ivf_topk(
    df: DataFrame, vec_col: str, query: Sequence[float], k: int,
    centroids: np.ndarray, n_probe: int = 4,
    id_col: str = "vec_id", decimals: int = 6,
) -> DataFrame:
    """IVF search: rank centroids by cosine to the query, scan only the
    n_probe nearest inverted lists, exact-rerank within them."""
    q = np.asarray(query, dtype="float64")
    qn = q / max(np.linalg.norm(q), 1e-12)
    c = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    probes = [int(i) for i in (c @ qn).argsort()[::-1][:n_probe]]
    return (
        ivf_assign(df, vec_col, centroids)
        .filter(F.col("_list").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), query), decimals).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame, vec_col: str, threshold: float = 0.99,
    id_col: str = "vec_id", n_planes: int = 12, seed: int = 13, decimals: int = 6,
) -> DataFrame:
    """Near-duplicate embedding pairs via LSH blocking: pairs sharing a
    sign-bucket, verified with exact cosine >= threshold. At threshold≈1 the
    pair's vectors agree on every hyperplane sign with high probability, so
    same-bucket blocking keeps recall high while cutting the O(n²) pair
    space by ~2^planes."""
    planes = hyperplanes(_dim_of(df, vec_col), n_planes, seed)
    with_b = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("b"),
    )
    a, b = with_b.alias("a"), with_b.alias("b")
    pair_cos = _pair_cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.round(pair_cos, decimals).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def _make_pair_cosine_kernel():
    """Arrow kernel twin of :func:`_pair_cosine` for pair-dense plans
    (SemDeDup's within-cluster join): one einsum row-wise dot per batch
    instead of an interpreted 64-step HOF fold per pair (~10x). No
    expansion matrices — the only (batch x dim) arrays are the stacked
    input vectors themselves (CLAUDE.md rule #8)."""

    @pandas_udf(T.DoubleType())
    def _pc(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.stack(va.values).astype("float64")
        b = np.stack(vb.values).astype("float64")
        num = np.einsum("ij,ij->i", a, b)
        denom = np.sqrt(np.einsum("ij,ij->i", a, a)) * np.sqrt(
            np.einsum("ij,ij->i", b, b)
        )
        out = np.divide(
            num, denom, out=np.zeros_like(num), where=denom != 0
        )
        return pd.Series(out)

    return _pc


def embedding_bucket_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 13,
) -> DataFrame:
    """The persistable sign-LSH bucket index ``(id, b)`` — the embedding
    twin of ``dedup.lsh_band_index``: a 100-TB deployment writes it once
    (bucketed by ``b``) and hands it to ``incremental_embedding_matches``
    as ``snapshot_buckets`` so each ingestion batch joins the index instead
    of re-hashing the seen corpus. The same ``(n_planes, seed)`` MUST be
    used for index and batches (different planes = disjoint bucket spaces,
    silently zero candidates)."""
    planes = hyperplanes(_dim_of(df, vec_col), n_planes, seed)
    return df.select(
        F.col(id_col).alias("id"), lsh_bucket(F.col(vec_col), planes).alias("b")
    )


def incremental_embedding_matches(
    batch: DataFrame,
    snapshot: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_planes: int = 12,
    seed: int = 13,
    decimals: int = 6,
    snapshot_buckets: DataFrame | None = None,
) -> DataFrame:
    """Continuous-ingestion embedding near-dup detection (the embedding
    twin of ``dedup.incremental_minhash_matches``): LSH-blocked candidate
    pairs of an incoming ``batch`` against the ``snapshot`` bucket index,
    verified with exact cosine — ``(id_new, id_seen, score)`` rows at
    ``score >= threshold``. Blocking recall follows the sign-LSH collision
    curve ``(1 - theta/pi)^n_planes`` (deterministic given the seed, so a
    SQL oracle can replay it exactly); precision is exact.

    Scale shape: batch buckets are a scan-stage expression (no Python);
    the candidate join is an equi-join on the single bucket int (one row
    per doc — no multi-band fan-out, no distinct needed); exact verify
    broadcast-semi-joins both corpora down to candidate ids before any
    vectors move, and the pairwise cosine runs in the Arrow einsum kernel
    (no interpreted per-pair HOF fold). No driver state."""
    planes = hyperplanes(_dim_of(batch, vec_col), n_planes, seed)
    bb = batch.select(
        F.col(id_col).alias("id_new"),
        lsh_bucket(F.col(vec_col), planes).alias("b"),
    )
    if snapshot_buckets is None:
        snapshot_buckets = embedding_bucket_index(
            snapshot, vec_col, id_col, n_planes, seed
        )
    # traversed three times below (two id projections + the pair spine)
    cands = (
        bb.join(snapshot_buckets.withColumnRenamed("id", "id_seen"), "b")
        .select("id_new", "id_seen")
        .localCheckpoint(eager=False)
    )
    new_ids = cands.select(F.col("id_new").alias("_i")).distinct()
    seen_ids = cands.select(F.col("id_seen").alias("_i")).distinct()
    # unhinted candidate semi-joins: AQE runtime-broadcasts small sets,
    # and corpus-proportional ones (high-dup crawls) degrade to a shuffle
    # semi-join instead of a forced-broadcast OOM
    newv = (
        batch.join(new_ids, batch[id_col] == new_ids["_i"], "left_semi")
        .select(F.col(id_col).alias("id_new"), F.col(vec_col).alias("v_new"))
    )
    seenv = (
        snapshot.join(seen_ids, snapshot[id_col] == seen_ids["_i"], "left_semi")
        .select(F.col(id_col).alias("id_seen"), F.col(vec_col).alias("v_seen"))
    )
    kernel = _make_pair_cosine_kernel()
    return (
        cands.join(newv, "id_new")
        .join(seenv, "id_seen")
        .select(
            "id_new",
            "id_seen",
            F.round(kernel(F.col("v_new"), F.col("v_seen")), decimals).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def incremental_embedding_new_docs(
    batch: DataFrame,
    snapshot: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_planes: int = 12,
    seed: int = 13,
    snapshot_buckets: DataFrame | None = None,
) -> DataFrame:
    """Surviving ``batch`` rows (no blocked-and-verified snapshot match at
    ``score >= threshold``); append their ``embedding_bucket_index`` rows
    to the snapshot index — same checkpoint contract as the MinHash twin."""
    matches = incremental_embedding_matches(
        batch,
        snapshot,
        vec_col,
        id_col,
        threshold,
        n_planes,
        seed,
        snapshot_buckets=snapshot_buckets,
    )
    dup_ids = matches.select(F.col("id_new").alias(id_col)).distinct()
    return batch.join(dup_ids, on=id_col, how="left_anti")


def _pair_cosine(va: Column, vb: Column) -> Column:
    d = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    denom = norm(va) * norm(vb)
    return F.when(denom == 0, F.lit(0.0)).otherwise(d / denom)


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).first()
    return int(row.d)


def diverse_sample(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 2,
    n_planes: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Embedding-space diversity sample: at most ``m`` vectors per
    hyperplane-LSH bucket, so a sample spreads across semantic space
    instead of following the corpus's cluster mass (the "pick varied
    examples" primitive for eval-set construction and data curation).
    Returns ``(id, bucket)``. Deterministic: within a bucket, survivors
    are the ``m`` smallest portable md5 hashes of the id (content
    addressed — identical across partitionings, re-runs, and engines, so
    the DuckDB oracle reproduces the exact membership).

    Scale shape: the bucket int is a pure per-row expression evaluated in
    the scan stage (sign bits of ``n_planes`` seeded dot products —
    literals shipped with the plan, nothing trained); the per-bucket cap
    is the canonical top-k-per-group window, one shuffle on the bucket
    key, never ranking past ``m`` per reducer after AQE skew split."""
    from jsonschema_spark.functions.text import portable_hash60
    from jsonschema_spark.operators.sampling import cap_per_group

    planes = hyperplanes(_dim_of(df, vec_col), n_planes, seed)
    bucketed = df.select(
        F.col(id_col),
        lsh_bucket(F.col(vec_col), planes).cast("long").alias("bucket"),
        portable_hash60(F.col(id_col).cast("string")).alias("_h"),
    )
    return cap_per_group(bucketed, "bucket", m, order_col="_h").drop("_h")


# --------------------------------------------------------------------------
# semantic decontamination
# --------------------------------------------------------------------------


def make_max_cosine_kernel(bench_ids: "np.ndarray", bench_mat: "np.ndarray"):
    """Arrow-batched max-cosine kernel against a fixed benchmark matrix:
    per batch one (batch x dim) @ (dim x m) matmul, then row max + argmax.
    ``bench_mat`` rows must be sorted by ``bench_ids`` so argmax ties
    resolve to the smallest benchmark id (matches the SQL twin's
    ``ORDER BY cos DESC, bench_id``).

    Allocation-aware (CLAUDE.md rule 8): the (batch x m) similarity matrix
    is written into a closure-held buffer reused across batches via
    ``np.matmul(..., out=...)`` — fresh multi-MB temporaries per batch hit
    the kernel page-fault slow path on some hosts (~100x; measured in
    operators/dedup.py::_simhash_fold)."""
    norms = np.linalg.norm(bench_mat, axis=1)
    norms[norms == 0] = 1.0
    bt = np.ascontiguousarray((bench_mat / norms[:, None]).T)  # (dim, m)
    m = bt.shape[1]
    buf: dict[str, np.ndarray] = {}

    @pandas_udf(
        T.StructType(
            [
                T.StructField("best_id", T.LongType()),
                T.StructField("best_cos", T.DoubleType()),
            ]
        )
    )
    def _maxcos(vecs: pd.Series) -> pd.DataFrame:
        mat = np.stack(vecs.values).astype("float64")
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        mat /= vn[:, None]
        n = len(mat)
        sims = buf.get("sims")
        if sims is None or sims.shape[0] < n:
            sims = np.zeros((max(n, 1 << 13), m), dtype="float64")
            buf["sims"] = sims
        out = sims[:n]
        np.matmul(mat, bt, out=out)
        best = out.argmax(axis=1)
        return pd.DataFrame(
            {
                "best_id": bench_ids[best],
                "best_cos": out[np.arange(n), best],
            }
        )

    return _maxcos


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_id_col: str = "vec_id",
    threshold: float = 0.8,
) -> DataFrame:
    """(id, best_bench_id, best_cos, contaminated): for every corpus
    vector, its nearest benchmark vector by cosine and whether it exceeds
    ``threshold`` — embedding-space benchmark decontamination, the
    semantic complement to the n-gram overlap check
    (operators/dedup.py::contaminated_docs). Emits a verdict per row
    rather than filtering, same policy stance as gopher_quality.

    Scale shape (10^12-doc corpus x 10^4-vector benchmark): the benchmark
    side is collected ONCE to a k x dim driver matrix (benchmark suites
    are bounded by construction — this is the same driver-state contract
    as IVF's centroid matrix) and shipped in the kernel closure; the
    corpus pays one scan-stage mapInPandas-equivalent projection, no
    shuffle, no join. If the benchmark ever outgrew a broadcast, the
    fallback is LSH-bucketing both sides (ann machinery above)."""
    rows = (
        bench.select(F.col(bench_id_col), F.col(vec_col))
        .orderBy(F.col(bench_id_col))
        .collect()
    )
    bench_ids = np.asarray([r[0] for r in rows], dtype="int64")
    bench_mat = np.asarray([list(r[1]) for r in rows], dtype="float64")
    kernel = make_max_cosine_kernel(bench_ids, bench_mat)
    return corpus.select(
        F.col(id_col).alias("id"), kernel(F.col(vec_col)).alias("b")
    ).select(
        "id",
        F.col("b.best_id").alias("best_bench_id"),
        F.round(F.col("b.best_cos"), 6).alias("best_cos"),
        (F.col("b.best_cos") >= threshold).alias("contaminated"),
    )


def embedding_norm_qa(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    expected_dim: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-vector QA ``(id, dim, norm, n_nan, n_null, dim_ok, usable)`` —
    the embedding column's analogue of sequence_structure: a similarity /
    ANN / dedup pass silently corrupts on NaN elements (cosine → NaN,
    which every comparison drops), zero vectors (cosine undefined), null
    elements, and ragged dimensions (kernel matmuls crash or misalign).
    ``usable`` = finite, non-zero, dimension as expected.

    Scale shape: pure scan-stage array expressions (size/filter/
    aggregate), zero shuffle, zero Python — QA rides the same scan as the
    operator it gates. Null vectors yield dim null / usable false.
    """
    v = F.col(vec_col)
    n_nan = F.size(F.filter(v, lambda x: F.isnan(x)))
    n_null = F.size(F.filter(v, lambda x: x.isNull()))
    nrm = F.sqrt(
        F.aggregate(
            F.filter(v, lambda x: ~F.isnan(x) & x.isNotNull()),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    dim_ok = (
        F.lit(True) if expected_dim is None else (F.size(v) == expected_dim)
    )
    usable = (
        v.isNotNull()
        & dim_ok
        & (n_nan == 0)
        & (n_null == 0)
        & (nrm > 0)
    )
    return df.select(
        F.col(id_col),
        F.size(v).alias("dim"),
        F.round(nrm, decimals).alias("norm"),
        n_nan.alias("n_nan"),
        n_null.alias("n_null"),
        dim_ok.alias("dim_ok"),
        F.coalesce(usable, F.lit(False)).alias("usable"),
    )


def semdedup(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): k-means-cluster the
    embedding space, then mark as semantic duplicates the members whose
    cosine to another member of the SAME cluster exceeds ``threshold``.
    Clustering bounds the pair space — O(sum c_i^2) instead of O(n^2) —
    which is the entire reason the method works at web scale; the paper
    prunes LAION/C4 with exactly this shape.

    Keep-first policy: a vector is reported (= would be dropped) iff some
    SMALLER-id member of its cluster is within ``threshold``; the smallest
    id of every semantic group therefore survives, matching the keep-first
    convention of the exact/minhash dedup operators here. Returns
    ``(vec_id, cid, n_dups, score)``: the cluster id, how many smaller-id
    neighbors exceeded the threshold, and the best such cosine (rounded;
    the threshold is applied to the ROUNDED score so any engine draws the
    same boundary).

    Scale shape: assignment is the IVF Arrow matmul kernel
    (:func:`ivf_assign`); then ONE shuffle routes each vector ONCE to its
    cluster's task, and a blocked per-cluster matmul inside
    ``applyInPandas`` emits only the duplicate rows — no (pair, vec_a,
    vec_b) materialization, so shuffle volume is O(n·dim), not
    O(Σc_i²·dim) like a within-cluster self-join would move. Per-group
    memory is bounded by one reused (block x c_i) score buffer (CLAUDE.md
    rule #8 — no fresh per-pair temporaries). groupBy-apply cannot be
    AQE-skew-split, so cluster size is the operator's own knob: pick
    ``n_lists ~ n / target_cluster_size`` (the paper runs ~100k clusters
    on LAION) and salt-shard any residual hot cluster upstream, the same
    policy as dedup.py's band joins.
    """
    assigned = ivf_assign(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "v",
        centroids,
    )
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("cid", T.LongType()),
            T.StructField("n_dups", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    block = 1024

    def _cluster_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort")
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {id_col: [], "cid": [], "n_dups": [], "score": []}
            ).astype({"cid": "int64", "n_dups": "int64", "score": "float64"})
        cid = int(pdf["_list"].iloc[0])
        mat = np.stack(pdf["v"].values).astype("float64")
        nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        np.maximum(nrm, 1e-300, out=nrm)
        mat /= nrm[:, None]
        # full-width rows so the reused out= slice stays C-contiguous (a
        # column-sliced view is rejected by BLAS once a cluster exceeds
        # the block); the j >= i half is masked out block-at-a-time — no
        # per-row Python, and both scratch buffers are reused across
        # blocks (rule #8).
        bcap = min(block, n)
        buf = np.empty((bcap, n))
        mask = np.empty((bcap, n), dtype=bool)
        tri = np.empty((bcap, n), dtype=bool)
        col = np.arange(n)
        ids, dups, scores = [], [], []
        id_vals = pdf["id"].to_numpy()
        for s in range(1, n, block):
            e = min(s + block, n)
            bs = e - s
            blk = np.dot(mat[s:e], mat.T, out=buf[:bs])
            np.round(blk, decimals, out=blk)
            m = mask[:bs]
            np.greater_equal(blk, threshold, out=m)
            # keep only the strict lower triangle: column j < row index i
            t = tri[:bs]
            np.less(col[None, :], np.arange(s, e)[:, None], out=t)
            np.logical_and(m, t, out=m)
            k = m.sum(axis=1)
            hit = k > 0
            if hit.any():
                np.copyto(blk, -2.0, where=~m)  # cosine >= threshold > -2
                ids.append(id_vals[s:e][hit])
                dups.append(k[hit])
                scores.append(blk.max(axis=1)[hit])
        if not ids:
            return pd.DataFrame(
                {id_col: [], "cid": [], "n_dups": [], "score": []}
            ).astype({"cid": "int64", "n_dups": "int64", "score": "float64"})
        out_ids = np.concatenate(ids)
        return pd.DataFrame(
            {
                id_col: out_ids,
                "cid": np.full(len(out_ids), cid, dtype="int64"),
                "n_dups": np.concatenate(dups).astype("int64"),
                "score": np.concatenate(scores).astype("float64"),
            }
        )

    return assigned.groupBy("_list").applyInPandas(_cluster_dups, out_schema)


def embedding_quant_qa(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    bits: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """Per-dimension linear-quantization QA for embedding compression
    (the int8 storage path every vector index takes at 10^12 vectors):
    calibrate a min/max affine quantizer per dimension, then report the
    reconstruction error a round-trip through the quantized code costs.
    Returns one row per dimension ``(d, lo, hi, scale, max_abs_err,
    mean_abs_err)`` (1-based d, floats rounded) — the table a corpus
    owner reads to decide whether int8 (or int4) is safe for their
    recall target.

    Scale shape: two scans of the vector column, each an Arrow kernel
    emitting ONE dim-wide partial row per batch (min/max, then
    max-err/sum-err/count), combined by a posexplode + groupBy(dim) agg —
    map-side combine by construction, shuffle volume = batches x dim
    cells. The first formulation was 2·dim native element_at agg
    expressions: correct, but every fresh plan paid ~3.3 s of whole-stage
    codegen compilation for the 128-expression aggregate (dwarfing the
    0.25 s compute; the kernel form runs ~1.0 s per fresh plan at the
    same inputs once session Python workers exist). Calibration collects
    dim rows (bounded)
    and enters pass 2 as numpy constants; reconstruction uses
    floor(q + 0.5) — HALF_UP on the non-negative codes, bit-identical
    to Spark/DuckDB round(). Quantization here is measurement, not
    mutation — writing the codes is the sink's job.
    """
    dim = dim or _dim_of(df, vec_col)
    levels = (1 << bits) - 1
    spark = df.sparkSession

    mm_schema = T.StructType(
        [
            T.StructField("lo", T.ArrayType(T.DoubleType())),
            T.StructField("hi", T.ArrayType(T.DoubleType())),
        ]
    )

    def _minmax(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].values).astype("float64")
            yield pd.DataFrame(
                {
                    "lo": [mat.min(axis=0).tolist()],
                    "hi": [mat.max(axis=0).tolist()],
                }
            )

    cal_rows = (
        df.select(vec_col)
        .mapInPandas(_minmax, mm_schema)
        .select(F.posexplode(F.arrays_zip("lo", "hi")).alias("p", "z"))
        .groupBy("p")
        .agg(F.min("z.lo").alias("lo"), F.max("z.hi").alias("hi"))
        .collect()
    )
    lo = np.empty(dim)
    hi = np.empty(dim)
    for r in cal_rows:
        lo[r.p] = r.lo
        hi[r.p] = r.hi
    scale = (hi - lo) / float(levels)
    live = scale != 0.0
    safe = np.where(live, scale, 1.0)

    err_schema = T.StructType(
        [
            T.StructField("mx", T.ArrayType(T.DoubleType())),
            T.StructField("sm", T.ArrayType(T.DoubleType())),
            T.StructField("n", T.LongType()),
        ]
    )

    def _err(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].values).astype("float64")
            q = np.floor((mat - lo) / safe + 0.5)  # HALF_UP, codes >= 0
            err = np.abs(mat - (lo + q * scale))
            err[:, ~live] = 0.0
            yield pd.DataFrame(
                {
                    "mx": [err.max(axis=0).tolist()],
                    "sm": [err.sum(axis=0).tolist()],
                    "n": [len(pdf)],
                }
            )

    cal_df = spark.createDataFrame(
        [
            (d + 1, float(lo[d]), float(hi[d]), float(scale[d]))
            for d in range(dim)
        ],
        "d: long, lo: double, hi: double, scale: double",
    )
    return (
        df.select(vec_col)
        .mapInPandas(_err, err_schema)
        .select(
            F.posexplode(F.arrays_zip("mx", "sm")).alias("p", "z"), F.col("n")
        )
        .groupBy("p")
        .agg(
            F.max("z.mx").alias("mx"),
            (F.sum("z.sm") / F.sum("n")).alias("mn"),
        )
        .select((F.col("p") + 1).alias("d"), "mx", "mn")
        .join(F.broadcast(cal_df), "d")
        .select(
            "d",
            F.round("lo", decimals).alias("lo"),
            F.round("hi", decimals).alias("hi"),
            F.round("scale", decimals).alias("scale"),
            F.round("mx", decimals).alias("max_abs_err"),
            F.round("mn", decimals).alias("mean_abs_err"),
        )
    )
