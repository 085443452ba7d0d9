"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through the noop sink (full materialization, no
driver-side collect cost).  The crawl benchmark synthesizes its own corpus
(BASELINE.json input_hint shape) and reports URLs fetched+deduped per sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from frontier_engine import synth
from frontier_engine.frontier import CrawlConfig, run_crawl
from frontier_engine.schema import PAGES
from frontier_engine.session import get_spark

HEADLINE = [
    "pricing_summary",
    "broadcast_join_rollup",
    "topk_per_group",
    "sessionize",
    "hourly_counts",
    "dedup_exact",
    "minhash_signatures",
    "lsh_pairs",
    "simhash",
    "ngram_jaccard",
    "ann_cosine_topk",
    "ann_cosine_lsh",
    "ann_cosine_ivf",
    "dedup_embedding",
    "data_url_source",
    "pipeline_ops",
    "lang_id",
    "quality_score",
    "token_counts",
    "doc_fingerprint",
]

CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "20000"))
CRAWL_SEEDS = int(os.environ.get("BENCH_CRAWL_SEEDS", "10000"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        f"local[{cpus}]",
        app_name="frontier-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()

    for name in HEADLINE:
        t0 = time.perf_counter()
        force(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # ANN contract metric: recall@k of the bucketed LSH path vs the exact
    # bruteforce baseline (tiny result sets — the collect is driver-cheap)
    truth = {(r[0], r[1]) for r in qs["ann_cosine_topk"](spark, sf_dir).select("query_id", "cand_id").collect()}
    got = {(r[0], r[1]) for r in qs["ann_cosine_lsh"](spark, sf_dir).select("query_id", "cand_id").collect()}
    ann_recall = round(len(truth & got) / max(len(truth), 1), 3)

    # crawl pipeline benchmark: synth corpus at input_hint shape (parquet-
    # backed, as in production — never a driver-local plan), bloom on,
    # depth-1 expansion, big politeness budget (throughput-bound, not
    # politeness-bound) — metric is URLs fetched+deduped per second
    import tempfile

    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_{CRAWL_PAGES}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        rows = synth.gen_pages(CRAWL_PAGES, with_text=False)
        spark.createDataFrame(rows, schema=PAGES).write.mode("overwrite").parquet(corpus_dir)
        del rows
    corpus = spark.read.parquet(corpus_dir)
    seeds = synth.parse_seed_lines(synth.gen_seed_lines(CRAWL_PAGES, CRAWL_SEEDS))
    cfg = CrawlConfig(
        round_seconds=1e9,  # quota >> frontier: one fetch round per depth
        max_rounds=4,
        max_depth=1,
        use_bloom=True,
        n_partitions=int(cpus) * 2,
    )
    # warm-up: JIT, python workers, parquet footer cache
    run_crawl(spark, corpus, seeds[:200], CrawlConfig(round_seconds=1e9, max_rounds=1))
    t0 = time.perf_counter()
    res = run_crawl(spark, corpus, seeds, cfg)
    n_pages = res.pages.count()
    n_seen = res.seen.count()
    crawl_sec = round(time.perf_counter() - t0, 3)
    timings["crawl_pipeline"] = crawl_sec

    total = round(time.perf_counter() - t_total0, 3)
    print(
        json.dumps(
            {
                "metric": "urls_fetched_deduped_per_sec",
                "value": round(n_seen / crawl_sec, 2),
                "unit": "urls/sec",
                "total_sec": total,
                "ann_lsh_recall_at_10": ann_recall,
                "queries": timings,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "crawl": {
                    "corpus_pages": CRAWL_PAGES,
                    "seeds": len(seeds),
                    "pages_fetched": n_pages,
                    "urls_seen": n_seen,
                    "sec": crawl_sec,
                },
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
