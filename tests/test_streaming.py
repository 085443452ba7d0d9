"""Streaming operator tests: availableNow triggers over file sources, with
the batch queries as oracles where semantics coincide."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from frontier_engine import streaming, synth
from frontier_engine.schema import PAGES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ev"))
    spark.read.parquet(os.path.join(SF, "events.parquet")).write.mode("overwrite").parquet(d)
    return d


def test_stream_pages_extract(spark, tmp_path):
    pages_dir, ckpt, out_dir = str(tmp_path / "pages"), str(tmp_path / "ck"), str(tmp_path / "out")
    rows = synth.gen_pages(80)
    spark.createDataFrame(rows, schema=PAGES).write.parquet(pages_dir)
    sdf = streaming.stream_pages_extract(spark, pages_dir)
    assert sdf.isStreaming
    streaming.run_to_parquet(sdf, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    got = [(r.url, r.extracted_text) for r in out.select("url", "extracted_text").collect()]
    # byte-identical invariant holds on the streaming path too (a url may
    # have several captures in the corpus — compare against the capture set)
    want: dict[str, set] = {}
    for r in rows:
        want.setdefault(r["url"], set()).add(r["text"])
    assert len(got) == len(rows)
    for url, text in got:
        assert text in want[url]

    # incremental resume: drop a second file, availableNow again with the
    # SAME checkpoint → exactly-once, only the delta is appended
    more = synth.gen_pages(40, seed=99)
    spark.createDataFrame(more, schema=PAGES).write.mode("append").parquet(pages_dir)
    streaming.run_to_parquet(streaming.stream_pages_extract(spark, pages_dir), out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == len(rows) + len(more)


def test_stream_hourly_counts_matches_batch(spark, events_dir, tmp_path):
    ev_schema = spark.read.parquet(events_dir).schema
    sdf = streaming.stream_hourly_counts(spark, events_dir, ev_schema)
    streaming.run_to_memory(sdf, "hourly_s", str(tmp_path / "ck"), output_mode="append")
    got = {
        (r.hour, r.event_type): r.n
        for r in spark.table("hourly_s").collect()
    }
    want = {
        (r.hour, r.event_type): r.n
        for r in spark.read.parquet(events_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # append mode emits only windows the watermark has closed; every emitted
    # window must match the batch result exactly
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_stream_sessionize(spark, events_dir, tmp_path):
    ev_schema = spark.read.parquet(events_dir).schema
    sdf = streaming.stream_sessionize(spark, events_dir, ev_schema)
    streaming.run_to_memory(sdf, "sess_s", str(tmp_path / "ck"))
    out = spark.table("sess_s")
    # closed sessions only; compare against the batch sessionizer's totals:
    # every emitted (user, session) must have >=1 event and session starts
    # must be a subset of the user's event times
    rows = out.collect()
    assert rows, "no sessions emitted"
    ev = spark.read.parquet(events_dir)
    by_user = {
        r.user_id: {x.ts for x in ev.filter(F.col("user_id") == r.user_id).select("ts").collect()}
        for r in rows[:5]
    }
    for r in rows[:5]:
        assert r.n_events >= 1
        assert r.session_start in by_user[r.user_id]


def test_stream_dedup_exact(spark, tmp_path):
    """Watermark-bounded streaming dedup: only the first occurrence of each
    content hash survives, including across triggers (checkpoint resume)."""
    docs_dir, ckpt, out_dir = str(tmp_path / "docs"), str(tmp_path / "dk"), str(tmp_path / "dout")
    batch1 = [(i, f"text {i % 5}", f"2024-01-01 00:{i:02d}:00") for i in range(10)]
    spark.createDataFrame(batch1, "doc_id long, text string, ts string").write.parquet(docs_dir)
    schema = "doc_id long, text string, ts string"
    sdf = streaming.stream_dedup_exact(spark, docs_dir, schema, watermark="1 hour")
    assert sdf.isStreaming
    streaming.run_to_parquet(sdf, out_dir, ckpt)
    first = spark.read.parquet(out_dir)
    assert first.count() == 5  # 5 distinct texts
    assert first.select("text_hash").distinct().count() == 5

    # second trigger: same texts again within the watermark → all dropped,
    # one genuinely-new text → emitted (state survived via the checkpoint)
    batch2 = [(100 + i, f"text {i % 5}", f"2024-01-01 00:3{i}:00") for i in range(5)]
    batch2.append((999, "brand new text", "2024-01-01 00:40:00"))
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(docs_dir)
    streaming.run_to_parquet(streaming.stream_dedup_exact(spark, docs_dir, schema, watermark="1 hour"), out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    assert out.count() == 6
    assert out.filter(F.col("doc_id") == 999).count() == 1


def test_stream_text_signals_matches_batch(spark, tmp_path):
    """Stateless textops projections must produce the SAME rows under
    Structured Streaming as in batch — the map-only streaming-safety
    contract for the text pipeline."""
    import pyspark.sql.functions as F

    from frontier_engine import streaming as st
    from frontier_engine import textops

    docs_dir = str(tmp_path / "docs")
    rows = [
        (0, "reach me at a@b.io or +1-555-0100 the quick brown fox"),
        (1, "plain text with no pii and the and the and the"),
        (2, "server 10.0.0.7 is down again call someone"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(docs_dir)

    sdf = st.stream_text_signals(spark, docs_dir, df.schema)
    assert sdf.isStreaming
    st.run_to_memory(sdf, "text_signals", str(tmp_path / "ck"))
    got = spark.table("text_signals")
    batch = df.select("doc_id", *textops.quality_columns(), *textops.pii_columns())
    assert sorted(got.collect(), key=lambda r: r["doc_id"]) == sorted(
        batch.collect(), key=lambda r: r["doc_id"]
    )
    # spot-check the signals are real, not vacuous
    by_id = {r["doc_id"]: r for r in got.collect()}
    assert by_id[0]["n_emails"] == 1 and by_id[0]["n_phones"] == 1
    assert by_id[2]["n_ipv4s"] == 1
    assert by_id[1]["n_tokens"] == 11


def test_stream_span_dedup_matches_batch_set_and_resumes(spark, tmp_path):
    """Streaming span dedup (VERDICT r4 #6): the surviving span SET must
    equal the batch op's keep-first winners (one instance per distinct
    span either way), and state must survive a checkpoint resume — a
    second trigger re-delivering known spans within the watermark emits
    nothing, a genuinely new span is emitted."""
    from frontier_engine import streaming, textops

    docs_dir, ckpt, out_dir = str(tmp_path / "docs"), str(tmp_path / "sk"), str(tmp_path / "sout")
    boiler = "home about contact"
    batch1 = [
        (i, f"{boiler} unique{i} words now", f"2024-01-01 00:{i:02d}:00") for i in range(8)
    ]
    schema = "doc_id long, text string, ts string"
    spark.createDataFrame(batch1, schema).write.parquet(docs_dir)
    sdf = streaming.stream_span_dedup(spark, docs_dir, schema, span_tokens=3, watermark="1 hour")
    assert sdf.isStreaming
    streaming.run_to_parquet(sdf, out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    # batch twin over the same rows: span sets identical, count = sum(n_kept)
    docs = spark.createDataFrame([(i, t) for i, t, _ in batch1], "doc_id long, text string")
    batch = textops.span_dedup(docs, span_tokens=3)
    n_kept_total = batch.agg(F.sum("n_kept")).collect()[0][0]
    assert got.count() == n_kept_total == 9  # 1 shared boiler span + 8 unique tails
    assert got.select("span_hash").distinct().count() == 9

    # resume: re-deliver the boilerplate inside the watermark + one new span
    batch2 = [(100, f"{boiler} fresh span text", "2024-01-01 00:30:00")]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(docs_dir)
    streaming.run_to_parquet(
        streaming.stream_span_dedup(spark, docs_dir, schema, span_tokens=3, watermark="1 hour"),
        out_dir, ckpt,
    )
    out = spark.read.parquet(out_dir)
    assert out.count() == n_kept_total + 1  # only "fresh span text" is new
    assert out.filter(F.col("doc_id") == 100).count() == 1


def test_stream_contamination_matches_batch(spark, tmp_path):
    """Stream-static contamination scoring at ingest must find the same
    (train, eval) pairs with the same shared-shingle counts as the batch
    op over the accumulated table."""
    from frontier_engine import streaming, textops

    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train_rows = [
        (0, leak + " training tail words one two", "2024-01-01 00:05:00"),
        (2, "completely unrelated training content with other words entirely", "2024-01-01 00:10:00"),
        (4, leak + " second leaky training document here", "2024-01-01 00:15:00"),
    ]
    eval_rows = [(1, leak), (3, "nothing shared with training text at all truly")]
    docs_dir = str(tmp_path / "docs")
    schema = "doc_id long, text string, ts string"
    spark.createDataFrame(train_rows, schema).write.parquet(docs_dir)
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")

    sdf = streaming.stream_contamination(spark, docs_dir, schema, ev, min_overlap=2)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory").queryName("contam_s")
        .outputMode("complete").option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["train_doc_id"], r["eval_doc_id"]): r["n_common"]
        for r in spark.sql("SELECT * FROM contam_s").collect()
    }
    batch = {
        (r["train_doc_id"], r["eval_doc_id"]): r["n_common"]
        for r in textops.contamination_pairs(
            spark.createDataFrame([(i, t) for i, t, _ in train_rows], "doc_id long, text string"),
            ev, min_overlap=2,
        ).collect()
    }
    assert got == batch and (0, 1) in got and (4, 1) in got
    assert all(e != 3 for (_, e) in got)


def test_stream_cardinality_matches_exact_within_bound(spark, events_dir, tmp_path):
    """Streaming HLL distinct per (hour, event_type): every window the
    watermark closed must estimate the batch-exact countDistinct within
    the lg_k=12 bound (these windows are far below 2^12 distinct, where
    the sketch sits in coupon mode — expect exact agreement, assert 3%)."""
    ev_schema = spark.read.parquet(events_dir).schema
    sdf = streaming.stream_cardinality(spark, events_dir, ev_schema)
    streaming.run_to_memory(sdf, "card_s", str(tmp_path / "ck"), output_mode="append")
    got = {
        (r.window_start, r.event_type): r.approx_distinct
        for r in spark.table("card_s").collect()
    }
    want = {
        (r.hour, r.event_type): r.n
        for r in spark.read.parquet(events_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got
    for k, approx in got.items():
        exact = want[k]
        assert abs(approx - exact) <= max(1, int(0.03 * exact)), (k, approx, exact)


def _host_quality_batch(docs):
    """The batch side of the stream==batch identity: same window, same
    integer expressions as textops.host_quality_stats, per event-hour."""
    from frontier_engine import textops

    return (
        docs.select("ts", "source", *textops.quality_columns())
        .groupBy(F.window("ts", "1 hour").alias("w"), "source")
        .agg(
            F.count(F.lit(1)).alias("host_docs"),
            F.sum("quality_permille").alias("host_quality_sum"),
            F.floor(F.sum("quality_permille") / F.count(F.lit(1)))
            .cast("long")
            .alias("host_mean_quality"),
        )
    )


def _hq_rows(rows):
    return {
        (r["window_start"], r["source"]): (
            r["host_docs"],
            r["host_quality_sum"],
            r["host_mean_quality"],
        )
        for r in rows
    }


def test_stream_host_quality_matches_batch(spark, tmp_path):
    """Windowed per-host quality rollup (streaming twin of
    host_quality_stats): exact longs end to end, so stream==batch is BIT
    identity across EVERY (window, host) cell — complete mode surfaces
    open windows too."""
    docs_dir = str(tmp_path / "docs")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).withColumn(
        "ts",
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, (doc_id % 7) * 1800)"),
    )
    docs.write.parquet(docs_dir)
    sdf = streaming.stream_host_quality(spark, docs_dir, spark.read.parquet(docs_dir).schema)
    assert sdf.isStreaming
    streaming.run_to_memory(sdf, "hq_s", str(tmp_path / "ck"), output_mode="complete")
    got = _hq_rows(spark.table("hq_s").collect())
    want = _hq_rows(
        _host_quality_batch(docs)
        .select(
            F.col("w.start").alias("window_start"),
            "source",
            "host_docs",
            "host_quality_sum",
            "host_mean_quality",
        )
        .collect()
    )
    assert got and got == want


def test_stream_host_quality_append_resume(spark, tmp_path):
    """Append mode + checkpoint resume: a first availableNow run lands
    hour-0 docs (window still open → nothing emitted), a second run lands
    hour-5 docs whose watermark closes hour 0 — the emitted rows must be
    the batch-exact hour-0 cells, exactly once."""
    docs_dir = str(tmp_path / "docs")
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    base = spark.read.parquet(os.path.join(SF, "documents.parquet")).limit(60)
    chunk1 = base.withColumn(
        "ts",
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, doc_id % 1800)"),
    )
    chunk1.write.parquet(docs_dir)
    schema = spark.read.parquet(docs_dir).schema
    streaming.run_to_parquet(streaming.stream_host_quality(spark, docs_dir, schema), out_dir, ck)

    chunk2 = base.withColumn("doc_id", F.col("doc_id") + 1000000).withColumn(
        "ts", F.expr("timestamp'2024-01-01 05:00:00' + make_interval(0,0,0,0,0,0, doc_id % 60)")
    )
    chunk2.write.mode("append").parquet(docs_dir)
    streaming.run_to_parquet(streaming.stream_host_quality(spark, docs_dir, schema), out_dir, ck)

    got = _hq_rows(spark.read.parquet(out_dir).collect())
    want = _hq_rows(
        _host_quality_batch(chunk1)
        .select(
            F.col("w.start").alias("window_start"),
            "source",
            "host_docs",
            "host_quality_sum",
            "host_mean_quality",
        )
        .collect()
    )
    assert got and got == want


def test_stream_quality_classifier_matches_batch(spark, tmp_path):
    """quality_classifier is a map-only projection, so it must run
    UNCHANGED on a streaming DataFrame with bit-identical output — the
    stream_text_signals contract extended to the model-based gate (score
    every document at ingest, not in a second batch pass)."""
    from frontier_engine import textops

    docs_dir = str(tmp_path / "docs")
    df = spark.read.parquet(os.path.join(SF, "documents.parquet")).select("doc_id", "text")
    df.write.parquet(docs_dir)
    sdf = textops.quality_classifier(
        spark.readStream.schema(df.schema).parquet(docs_dir)
    )
    assert sdf.isStreaming
    streaming.run_to_memory(sdf, "qc_s", str(tmp_path / "ck"))
    got = sorted(map(tuple, spark.table("qc_s").collect()))
    want = sorted(map(tuple, textops.quality_classifier(df).collect()))
    assert got == want and len(got) == 500
