"""Structured Streaming validation: file-source stream of corpus batches ->
annotate -> windowed verdicts / violations / streaming dedup, drained with
availableNow into memory or parquet sinks; results must match the batch
engine on the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.sources.corpus import MAX_TOKENS, VOCAB_SIZE, corpus
from jsonschema_spark.plans.plan import TableSpec, compile_table_spec

N = 5_000

SPEC = TableSpec.from_dict(
    {
        "columns": {
            "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$"},
            "n_tok": {"type": "integer", "minimum": 1, "maximum": MAX_TOKENS},
        },
        "required": ["doc_id", "tokens", "n_tok", "source"],
        "row_checks": {"len_consistent": "n_tok = size(tokens)"},
    }
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Corpus with an event-time column, written as two parquet 'micro
    batches' into a watched directory."""
    d = tmp_path_factory.mktemp("stream") / "in"
    df = corpus(spark, N, seed=42).withColumn(
        "event_time",
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + (F.xxhash64("doc_id") % 300 + 300) % 300  # 0..299s spread
        ),
    )
    df.filter(F.crc32(F.col("doc_id")) % 2 == 0).write.parquet(str(d / "batch1"))
    df.filter(F.crc32(F.col("doc_id")) % 2 == 1).write.parquet(str(d / "batch2"))
    return str(d)


def _read_stream(spark, stream_dir):
    schema = (
        "doc_id string, tokens array<int>, n_tok int, source string,"
        " event_time timestamp"
    )
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )


def test_windowed_verdicts_match_batch(spark, stream_dir, tmp_path):
    from jsonschema_spark.streaming.validate import annotate_stream, windowed_verdicts

    plan = compile_table_spec(SPEC, _read_stream(spark, stream_dir).schema)
    stream = annotate_stream(_read_stream(spark, stream_dir), plan)
    windows = windowed_verdicts(stream, "event_time", "1 minute", "2 minutes")
    q = (
        windows.writeStream.format("memory")
        .queryName("verdict_windows")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT sum(n_rows) AS n, sum(n_valid) AS v,"
        " sum(fail_row_len_consistent) AS f FROM verdict_windows"
    ).first()
    # batch truth on the same rows
    batch = spark.read.option("recursiveFileLookup", "true").parquet(stream_dir)
    from jsonschema_spark.plans.job import ValidationJob

    ann = ValidationJob(compile_table_spec(SPEC, batch.schema)).annotate(batch)
    want = ann.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_valid").cast("long")).alias("v"),
        F.sum((~F.col("chk_row_len_consistent")).cast("long")).alias("f"),
    ).first()
    assert (got.n, got.v, got.f) == (want.n, want.v, want.f)
    assert got.n == N
    # 300s spread starting 20s into a minute -> 6 tumbling 1-min windows
    assert spark.sql("SELECT count(*) AS c FROM verdict_windows").first().c == 6


def test_stream_violations_and_resume(spark, stream_dir, tmp_path):
    from jsonschema_spark.streaming.validate import annotate_stream, stream_violations

    plan = compile_table_spec(SPEC, _read_stream(spark, stream_dir).schema)
    out = str(tmp_path / "viol_out")
    ck = str(tmp_path / "ck2")

    def run():
        v = stream_violations(annotate_stream(_read_stream(spark, stream_dir), plan))
        q = (
            v.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = spark.read.parquet(out).count()
    # resume with same checkpoint: no new input -> no duplicate output
    run()
    assert spark.read.parquet(out).count() == first
    from jsonschema_spark.sources.corpus import NTOK_MOD, LEN_MOD

    exp_bad_ntok = len([i for i in range(N) if i % NTOK_MOD == NTOK_MOD - 1])
    got_ntok = (
        spark.read.parquet(out).filter(F.col("check") == "col_n_tok").count()
    )
    assert got_ntok == exp_bad_ntok


def test_streaming_dedup(spark, stream_dir, tmp_path):
    from jsonschema_spark.streaming.validate import streaming_dedup

    deduped = streaming_dedup(
        _read_stream(spark, stream_dir), "doc_id", "event_time", "10 minutes"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = spark.sql("SELECT count(*) c FROM dedup_stream").first().c
    distinct_keys = spark.sql(
        "SELECT count(DISTINCT doc_id) c FROM dedup_stream"
    ).first().c
    assert total == distinct_keys
    from jsonschema_spark.sources.corpus import DUP_MOD

    n_dup = len([i for i in range(N) if i % DUP_MOD == DUP_MOD - 1])
    assert total == N - n_dup


def test_stateful_running_counters(spark, stream_dir, tmp_path):
    """applyInPandasWithState: running per-source counters persist across
    micro-batches; final state equals the batch ground truth."""
    from pyspark.sql import functions as F

    from jsonschema_spark.streaming.stateful import running_source_counters
    from jsonschema_spark.streaming.validate import annotate_stream

    plan = compile_table_spec(SPEC, _read_stream(spark, stream_dir).schema)
    counters = running_source_counters(
        annotate_stream(_read_stream(spark, stream_dir), plan)
    )
    q = (
        counters.writeStream.format("memory")
        .queryName("source_counters")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per source = final running state
    got = {
        r.source: (r.n_rows, r.n_invalid)
        for r in spark.sql(
            "SELECT source, n_rows, n_invalid FROM ("
            " SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_rows DESC) rn"
            " FROM source_counters) WHERE rn = 1"
        ).collect()
    }
    batch = spark.read.option("recursiveFileLookup", "true").parquet(stream_dir)
    from jsonschema_spark.plans.job import ValidationJob

    ann = ValidationJob(compile_table_spec(SPEC, batch.schema)).annotate(batch)
    want = {
        r.source: (r.n, r.i)
        for r in ann.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((~F.col("_valid")).cast("long")).alias("i"),
        )
        .collect()
    }
    assert got == want
    assert len(got) >= 20  # every registered source plus the injected bad one


def test_streaming_drift_monitor(spark, stream_dir, tmp_path):
    """foreachBatch drift: in-distribution batches are not flagged; a
    shifted batch is."""
    from jsonschema_spark.operators import stats as stats_ops
    from jsonschema_spark.streaming.drift import run_drift_monitor

    clean = corpus(spark, N, seed=9, inject_violations=False)
    baseline = stats_ops.histogram(clean, "n_tok", 64, 0, 2560)

    reports = []
    run_drift_monitor(
        _read_stream(spark, stream_dir), "n_tok", baseline, 64, 0, 2560,
        str(tmp_path / "ck_drift"), reports,
    )
    assert len(reports) >= 1
    assert sum(r["n_rows"] for r in reports) == N
    assert all(not r["drifted"] for r in reports)

    # shifted stream: quarter the lengths -> major PSI shift
    d2 = tmp_path / "in2"
    corpus(spark, 2000, seed=3).withColumn(
        "n_tok", (F.col("n_tok") / 4 + 1).cast("int")
    ).withColumn(
        "event_time", F.timestamp_seconds(F.lit(1_700_000_000))
    ).write.parquet(str(d2 / "b1"))
    shifted_stream = (
        spark.readStream.schema(
            "doc_id string, tokens array<int>, n_tok int, source string,"
            " event_time timestamp"
        )
        .option("recursiveFileLookup", "true")
        .parquet(str(d2))
    )
    reports2 = []
    run_drift_monitor(
        shifted_stream, "n_tok", baseline, 64, 0, 2560,
        str(tmp_path / "ck_drift2"), reports2,
    )
    assert len(reports2) == 1
    assert reports2[0]["drifted"] and reports2[0]["psi"] > 0.25


def test_streaming_sequence_structure_matches_batch(spark, tmp_path):
    """The token-structure validator is a stateless projection, so it must
    run unchanged on a stream and agree row-for-row with the batch engine
    (pins that no streaming-incompatible construct sneaks into it)."""
    from jsonschema_spark.operators.checks import sequence_structure
    from jsonschema_spark.sources.corpus import token_neardup_corpus

    d = tmp_path / "tok_in"
    df = token_neardup_corpus(spark, 2_000, seed=5)
    df.filter(F.pmod("doc_id", F.lit(2)) == 0).write.mode("append").parquet(str(d))
    df.filter(F.pmod("doc_id", F.lit(2)) == 1).write.mode("append").parquet(str(d))

    # vocab 499 over uniform ids 0..499: only id 499 is OOV, so both
    # verdict classes are populated (~85% of docs lack it entirely)
    kwargs = dict(vocab_size=499, bos_id=None, eos_id=None, pad_id=None)
    stream = spark.readStream.schema("doc_id long, tokens array<int>").parquet(
        str(d)
    )
    q = (
        sequence_structure(stream, **kwargs)
        .writeStream.format("memory")
        .queryName("seq_struct_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["structure_ok"], r["n_oob"])
        for r in spark.sql("SELECT * FROM seq_struct_stream").collect()
    }
    want = {
        r["doc_id"]: (r["structure_ok"], r["n_oob"])
        for r in sequence_structure(df, **kwargs).collect()
    }
    assert got == want and len(got) == 2_000
    assert any(ok for ok, _ in got.values()) and any(
        not ok for ok, _ in got.values()
    )


def test_streaming_neardup_ingest_greedy_invariants(spark, tmp_path):
    """History near-dedup ingestion over 3 interleaved micro-batches
    (doc_id % 3 chunks, so every injected dup's source lands in a DIFFERENT
    batch than the dup). Output must satisfy the greedy-sequential
    invariants regardless of which file the source processes first:
    (A) every dropped doc near-dups (token-3-gram jaccard >= 0.8) something
    accepted in a strictly earlier batch; (B) nothing accepted near-dups
    anything accepted strictly earlier. Then resume: a replay adds nothing,
    and a 4th file appended to the source dedups against the full history."""
    from jsonschema_spark.sources.corpus import token_neardup_corpus
    from jsonschema_spark.streaming.neardup import run_neardup_ingest

    n_docs = 600
    df = token_neardup_corpus(spark, n_docs, seed=5)
    src = tmp_path / "in"
    for k in range(3):
        df.filter(F.pmod("doc_id", F.lit(3)) == k).coalesce(1).write.parquet(
            str(src / f"chunk{k}")
        )

    def stream():
        return (
            spark.readStream.schema("doc_id long, tokens array<int>")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )

    corpus_dir = str(tmp_path / "accepted")
    index_dir = str(tmp_path / "bands")
    ck = str(tmp_path / "ck")
    stats = []
    run_neardup_ingest(
        stream(), corpus_dir, index_dir, ck, "doc_id", "tokens", stats,
        threshold=0.8, elements=F.col("tokens"), shingle_sep=",",
    )
    assert len(stats) == 3 and sum(s["n_in"] for s in stats) == n_docs
    assert sum(s["n_dropped"] for s in stats) > 0  # non-vacuous

    rows = {r.doc_id: list(r.tokens) for r in df.collect()}

    def grams(toks):
        return {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}

    g = {i: grams(t) for i, t in rows.items()}

    def near(a, b):
        u = len(g[a] | g[b])
        return u > 0 and round(len(g[a] & g[b]) / u, 6) >= 0.8

    acc = spark.read.parquet(corpus_dir).select("doc_id", "batch_id").collect()
    batch_of = {r.doc_id: r.batch_id for r in acc}
    # each micro-batch is one doc_id%3 chunk -> recover every doc's batch
    chunk_batch = {r.doc_id % 3: r.batch_id for r in acc}
    assert len(chunk_batch) == 3
    accepted = set(batch_of)
    for d in rows:
        b = chunk_batch[d % 3]
        earlier = [a for a in accepted if batch_of[a] < b]
        if d in accepted:  # (B) nothing accepted matches earlier history
            assert not any(near(d, a) for a in earlier), d
        else:  # (A) every drop is justified by earlier history
            assert any(near(d, a) for a in earlier), d

    # resume with the same checkpoint: all offsets committed, no new batch
    stats2 = []
    run_neardup_ingest(
        stream(), corpus_dir, index_dir, ck, "doc_id", "tokens", stats2,
        threshold=0.8, elements=F.col("tokens"), shingle_sep=",",
    )
    assert stats2 == []
    assert spark.read.parquet(corpus_dir).count() == len(accepted)

    # continuation: a 4th file with one copy of accepted history (dropped)
    # and one fresh doc (accepted)
    some_accepted = min(accepted)
    fresh = list(range(1000, 1080))  # ids 500+ never occur in the corpus
    spark.createDataFrame(
        [(9001, rows[some_accepted]), (9002, fresh)],
        "doc_id long, tokens array<int>",
    ).coalesce(1).write.parquet(str(src / "chunk3"))
    stats3 = []
    run_neardup_ingest(
        stream(), corpus_dir, index_dir, ck, "doc_id", "tokens", stats3,
        threshold=0.8, elements=F.col("tokens"), shingle_sep=",",
    )
    assert [(s["n_in"], s["n_new"], s["n_dropped"]) for s in stats3] == [(2, 1, 1)]
    final = {r.doc_id for r in spark.read.parquet(corpus_dir).select("doc_id").collect()}
    assert 9002 in final and 9001 not in final


def test_streaming_manifest_matches_batch(spark, tmp_path):
    """Per-micro-batch shard manifests (maxFilesPerTrigger=1, so one file
    per batch) accumulate to exactly the batch shard_manifest of the same
    directory — same file names, counts, id ranges, checksums — and the
    state table carries one batch_id per input file."""
    from jsonschema_spark.operators.checks import shard_manifest
    from jsonschema_spark.streaming.manifest import run_manifest_stream

    d = tmp_path / "m_in"
    base = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        base.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(str(d))

    out = str(tmp_path / "m_out")
    stream = (
        spark.readStream.schema("doc_id long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = run_manifest_stream(
        stream, "doc_id", out, str(tmp_path / "m_ck")
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    batch = shard_manifest(spark.read.parquet(str(d)), "doc_id")
    key = lambda r: r.file_name
    g = {key(r): (r.n_rows, r.min_id, r.max_id, r.checksum) for r in got.collect()}
    b = {key(r): (r.n_rows, r.min_id, r.max_id, r.checksum) for r in batch.collect()}
    assert g == b and len(g) == 3
    assert got.select("batch_id").distinct().count() == 3


def test_streaming_neardup_replayed_batch_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (crash after the partition writes but before
    the streaming checkpoint commit) must reproduce its partitions exactly:
    the batch must dedup against STRICTLY EARLIER history only, never its
    own previous attempt's partition — or every replayed doc self-matches
    at jaccard 1.0 and the partition is rewritten empty (data loss), while
    the lazy survivors plan races the overwrite deleting the files it
    reads. Simulated by invoking the foreachBatch function twice with the
    same batch_id."""
    from jsonschema_spark.sources.corpus import token_neardup_corpus
    from jsonschema_spark.streaming.neardup import neardup_ingest

    df = token_neardup_corpus(spark, 200, seed=7)
    b0 = df.filter(F.pmod("doc_id", F.lit(2)) == 0)
    b1 = df.filter(F.pmod("doc_id", F.lit(2)) == 1)
    corpus_dir = str(tmp_path / "acc")
    index_dir = str(tmp_path / "idx")
    stats = []
    fb = neardup_ingest(
        corpus_dir, index_dir, "doc_id", "tokens",
        threshold=0.8, elements=F.col("tokens"), shingle_sep=",",
        on_batch=lambda bid, s: stats.append(s),
    )
    fb(b0, 0)
    fb(b1, 1)
    assert stats[1]["n_new"] > 0 and stats[1]["n_dropped"] > 0  # non-vacuous
    first = {
        (r.doc_id, r.batch_id)
        for r in spark.read.parquet(corpus_dir).select("doc_id", "batch_id").collect()
    }
    index_first = spark.read.parquet(index_dir).count()

    # replay batch 1: same survivors, same index, stats reproduced
    fb(b1, 1)
    assert stats[2] == stats[1]
    replay = {
        (r.doc_id, r.batch_id)
        for r in spark.read.parquet(corpus_dir).select("doc_id", "batch_id").collect()
    }
    assert replay == first
    assert spark.read.parquet(index_dir).count() == index_first

    # replay the FIRST batch too (batch_id=0 must see empty history, not
    # batch 1's partition — strictly-earlier means <, not !=)
    fb(b0, 0)
    assert stats[3] == stats[0]
    assert {
        (r.doc_id, r.batch_id)
        for r in spark.read.parquet(corpus_dir).select("doc_id", "batch_id").collect()
    } == first


def test_streaming_neardup_compaction_mid_stream(spark, tmp_path):
    """Mid-stream band-index compaction: after batches 0-1 commit, fold
    their index partitions into the bucketed table; batch 2 must still
    dedup against the FULL history (now table + nothing residual), produce
    exactly the same survivors as an uncompacted twin run, and stay
    idempotent under replay. Also pins the maintenance win: the folded
    partition dirs are gone from index_dir."""
    import os as _os

    from jsonschema_spark.sources.corpus import token_neardup_corpus
    from jsonschema_spark.streaming.neardup import compact_band_index, neardup_ingest

    df = token_neardup_corpus(spark, 300, seed=11)
    chunks = [df.filter(F.pmod("doc_id", F.lit(3)) == k) for k in range(3)]
    table = "t_compact_band_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    def run(root, index_table=None, compact_after=None):
        corpus_dir, index_dir = str(root / "acc"), str(root / "idx")
        stats = []
        fb = neardup_ingest(
            corpus_dir, index_dir, "doc_id", "tokens",
            threshold=0.8, elements=F.col("tokens"), shingle_sep=",",
            on_batch=lambda bid, s: stats.append(s), index_table=index_table,
        )
        for bid, chunk in enumerate(chunks):
            if compact_after is not None and bid == compact_after + 1:
                folded = compact_band_index(
                    spark, index_dir, index_table, upto_batch_id=compact_after
                )
                assert folded["folded_batches"] == compact_after + 1
                assert folded["folded_rows"] > 0
                left = [
                    d for d in _os.listdir(index_dir) if d.startswith("batch_id=")
                ]
                assert left == []  # all accumulated partitions folded
            fb(chunk, bid)
        return corpus_dir, index_dir, stats

    try:
        c_dir, i_dir, stats_c = run(
            tmp_path / "with", index_table=table, compact_after=1
        )
        _, _, stats_plain = run(tmp_path / "plain")
        assert stats_c == stats_plain  # identical accept/drop decisions
        assert stats_c[2]["n_dropped"] > 0  # batch 2 really used history
        kept_c = {
            r.doc_id for r in spark.read.parquet(c_dir).select("doc_id").collect()
        }
        kept_plain = {
            r.doc_id
            for r in spark.read.parquet(str(tmp_path / "plain" / "acc"))
            .select("doc_id").collect()
        }
        assert kept_c == kept_plain

        # replay batch 2 after compaction: same partition, same decisions
        fb = neardup_ingest(
            c_dir, i_dir, "doc_id", "tokens",
            threshold=0.8, elements=F.col("tokens"), shingle_sep=",",
            on_batch=lambda bid, s: stats_c.append(s), index_table=table,
        )
        fb(chunks[2], 2)
        assert stats_c[3] == stats_c[2]
        assert {
            r.doc_id for r in spark.read.parquet(c_dir).select("doc_id").collect()
        } == kept_c
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Native session_window streaming sessions == batch sessionize on the
    same rows (membership, start, value sums; native end = last + gap),
    with append mode emitting every real session once the sentinel
    batches push the watermark past it."""
    import datetime as dt

    from jsonschema_spark.operators.temporal import sessionize
    from jsonschema_spark.streaming.sessions import streaming_sessions

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 6 users x 4 sessions x 3 events: 10-min strides inside a session,
    # 3h gaps between sessions (gap=2h; no exact-boundary deltas)
    for u in range(6):
        t = base + dt.timedelta(minutes=7 * u)
        for s in range(4):
            for e in range(3):
                rows.append((u, t, float(u + s + e)))
                t += dt.timedelta(minutes=10)
            t += dt.timedelta(hours=3)
    in_dir = tmp_path / "in"
    schema = "user_id long, ts timestamp, value double"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(in_dir / "b1")
    )
    # two future sentinels: the first advances the max event time, the
    # second triggers the eviction pass that emits the closed sessions
    for i, days in enumerate((400, 800)):
        spark.createDataFrame(
            [(999, base + dt.timedelta(days=days), 0.0)], schema
        ).coalesce(1).write.parquet(str(in_dir / f"sent{i}"))

    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        streaming_sessions(
            stream, "user_id", "ts", gap_seconds=7200,
            watermark="1 minute", agg_value=F.col("value"),
        )
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["start_us"]): r
        for r in spark.sql("SELECT * FROM sessions_out").collect()
        if r["user_id"] != 999
    }
    batch = spark.createDataFrame(rows, schema)
    want = {
        (r["user_id"], r["start_us"]): r
        for r in sessionize(
            batch, "user_id", "ts", gap_seconds=7200,
            agg_value=F.col("value"),
        ).collect()
    }
    assert set(got) == set(want) and len(got) == 24
    gap_us = 7200 * 1_000_000
    for k, g in got.items():
        w = want[k]
        assert g["n_events"] == w["n_events"] == 3
        assert g["value_sum"] == w["value_sum"]
        # native close time = last event + gap
        assert g["end_us"] - gap_us == w["end_us"]


def test_streaming_metric_repository_monitor(spark, tmp_path):
    """Metrics-repository anomaly gate over 8 sequential micro-batches:
    batches 0-6 carry stable (n_rows, avg n_tok) metrics, batch 7 spikes
    avg n_tok 5x. The spike batch must be flagged on avg_ntok (and only
    it), warm-up batches (< min_periods priors) never flag, and a
    manually replayed final batch reaches the identical verdict with the
    repository unchanged (strictly-earlier history visibility)."""
    import os as _os

    from jsonschema_spark.streaming.metrics import (
        metric_repository_monitor,
        run_metric_monitor,
    )

    src = tmp_path / "in"
    t = 1_700_000_000
    for b in range(8):
        ntok = 500 if b == 7 else 100 + (b % 3)  # stable then 5x spike
        rows = [(b * 100 + i, ntok + (i % 5)) for i in range(50)]
        path = str(src / f"b{b}")
        spark.createDataFrame(rows, "id long, n_tok long").coalesce(
            1
        ).write.parquet(path)
        # pin pickup order: the file source processes in mtime order
        for root, _dirs, files in _os.walk(path):
            for f in files:
                _os.utime(_os.path.join(root, f), (t + b, t + b))

    def stream():
        return (
            spark.readStream.schema("id long, n_tok long")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )

    exprs = {"n_rows": F.count(F.lit(1)), "avg_ntok": F.avg("n_tok")}
    repo = str(tmp_path / "repo")
    reports: list = []
    run_metric_monitor(
        stream(), exprs, repo, str(tmp_path / "ck"), reports, window=6
    )
    assert len(reports) == 8
    by_batch = dict(reports)
    flagged = {
        (bid, r["metric"])
        for bid, rep in reports
        for r in rep
        if r["is_anomaly"]
    }
    assert (7, "avg_ntok") in flagged
    assert all(bid == 7 for bid, _m in flagged)
    for bid in (0, 1, 2):  # < min_periods priors: never anomalous
        assert all(not r["is_anomaly"] for r in by_batch[bid])
    spike = [r for r in by_batch[7] if r["metric"] == "avg_ntok"][0]
    assert spike["value"] == pytest.approx(502.0)
    assert spike["prior_n"] == 6

    # replay the final batch: same verdict, repository row count unchanged
    n_repo = spark.read.parquet(repo).count()
    batch7 = spark.read.parquet(str(src / "b7"))
    replays: list = []
    fb = metric_repository_monitor(
        exprs, repo, window=6, on_report=lambda bid, rep: replays.append(rep)
    )
    fb(batch7, 7)
    assert spark.read.parquet(repo).count() == n_repo
    rep7 = {r["metric"]: r for r in replays[0]}
    assert rep7["avg_ntok"]["is_anomaly"]
    assert rep7["avg_ntok"]["z"] == spike["z"]
