"""Checkpoint/resume tests (north_rule: resumable with lineage + metrics)."""

import json
import os

import pytest

from frontier_engine import synth
from frontier_engine.frontier import CrawlConfig, run_crawl
from frontier_engine.storage import SnapshotStore


@pytest.fixture(scope="module")
def seeds():
    return synth.parse_seed_lines(synth.gen_seed_lines(300, 60))


def _key_set(df):
    return {r.url_key for r in df.select("url_key").collect()}


def test_resume_equals_uninterrupted(spark, corpus, seeds, tmp_path_factory):
    cfg = dict(round_seconds=9.0)  # small quota → many rounds
    full = run_crawl(spark, corpus, seeds, CrawlConfig(**cfg, max_rounds=100))

    root = str(tmp_path_factory.mktemp("ckpt"))
    store = SnapshotStore(spark, root)
    # phase 1: stop after 2 rounds ("crash" mid-crawl)
    part = run_crawl(spark, corpus, seeds, CrawlConfig(**cfg, max_rounds=2, checkpoint_dir=root))
    assert part.rounds == 2
    assert store.latest_round() == 1
    # phase 2: resume from the snapshot and finish
    resumed = run_crawl(spark, corpus, seeds, CrawlConfig(**cfg, max_rounds=100, checkpoint_dir=root))

    assert _key_set(resumed.seen) == _key_set(full.seen)
    a = sorted((r.host, r.host_rank, r.round, r.url) for r in full.pages.collect())
    b = sorted((r.host, r.host_rank, r.round, r.url) for r in resumed.pages.collect())
    assert [x[3] for x in a] == [x[3] for x in b]  # same url multiset/order keys
    assert full.pages.count() == resumed.pages.count()


def test_manifest_lineage(spark, corpus, seeds, tmp_path):
    root = str(tmp_path)
    run_crawl(spark, corpus, seeds, CrawlConfig(round_seconds=30.0, max_rounds=1, checkpoint_dir=root))
    store = SnapshotStore(spark, root)
    last = store.latest_round()
    m = store.manifest(last)
    assert {"round", "snapshot_id", "row_counts", "partition_files", "virtual_now"} <= set(m)
    assert m["row_counts"]["pages"] > 0
    assert m["partition_files"]["pages"] >= 1
    # metrics carry per-partition lineage rows
    metrics = store.read(last, "metrics")
    cols = set(metrics.columns)
    assert {"round", "partition_id", "host", "fetched", "failed", "bytes"} <= cols


def test_resume_v1_cumulative_metrics_not_double_counted(spark, corpus, seeds, tmp_path):
    """ADVICE r2: a pre-delta-format checkpoint (manifest WITHOUT
    'metrics_format') stored CUMULATIVE metrics — resume must read only the
    last such table, not union every round (which double-counts).  New
    rounds written after the resume are deltas and do union."""
    root = str(tmp_path)
    # write 2 real rounds, then rewrite their manifests as v1 (key removed)
    # and their metrics tables as CUMULATIVE (round 1 = rounds 0+1)
    run_crawl(spark, corpus, seeds, CrawlConfig(round_seconds=9.0, max_rounds=2, checkpoint_dir=root))
    store = SnapshotStore(spark, root)
    assert store.latest_round() == 1
    m0 = store.read(0, "metrics")
    cum1 = m0.unionByName(store.read(1, "metrics"))
    total_fetched = sum(r.fetched for r in cum1.collect())
    cum1_path = os.path.join(root, "rounds", "round_00001", "metrics")
    cum1.localCheckpoint(eager=True).write.mode("overwrite").parquet(cum1_path)
    for r in (0, 1):
        mf = store.manifest(r)
        assert mf.pop("metrics_format") == "delta"
        with open(os.path.join(root, "rounds", f"round_{r:05d}", "manifest.json"), "w") as fh:
            json.dump(mf, fh)
    # resume for 1 more round: metrics_view must be cum@1 + delta@2 only
    res = run_crawl(spark, corpus, seeds, CrawlConfig(round_seconds=9.0, max_rounds=3, checkpoint_dir=root))
    per_round = {
        r["round"]: r["fetched"]
        for r in res.metrics.groupBy("round").agg(__import__("pyspark.sql.functions", fromlist=["sum"]).sum("fetched").alias("fetched")).collect()
    }
    # rounds 0+1 appear exactly once (from the cumulative table): their sum
    # equals what the v1 writer recorded, with no double count
    assert per_round.get(0, 0) + per_round.get(1, 0) == total_fetched
    assert store.manifest(2).get("metrics_format") == "delta"


def test_crashed_round_invisible(spark, corpus, seeds, tmp_path):
    """A round directory without a published manifest must be ignored."""
    root = str(tmp_path)
    run_crawl(spark, corpus, seeds, CrawlConfig(round_seconds=30.0, max_rounds=1, checkpoint_dir=root))
    store = SnapshotStore(spark, root)
    crashed = os.path.join(root, "rounds", "round_00099")
    os.makedirs(os.path.join(crashed, "frontier"), exist_ok=True)  # no manifest
    assert store.latest_round() == 0
    with open(os.path.join(crashed, "manifest.json"), "w") as fh:
        json.dump({"round": 99}, fh)
    assert store.latest_round() == 99
