"""384M crossover, bloom+prune leg with a PERSISTED filter (round 6).

Replays BENCH/run_crawl_bloom.py's protocol (same fixture, same warm-up
exact run, same quota-15 drain) but with the merged bitmaps pre-persisted
as the round-0 aux artifact, so run_crawl's resume path LOADS the filter
instead of rebuilding it — the production regime where every resume
inherits the previous crawl's filter.  Compares against the round-6
measured pair (exact 1044.5 s, bloom+prune-with-rebuild 541.5 s).

Usage: CBX_SHARDS=1024 CBX_BITS=$((1<<24)) CBX_QUOTA=15 SPARK_GRAFT_CPUS=16 \
       python BENCH/run_crawl_bloom_persisted.py [n_seen] [n_cand]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from run_crawl_bloom import BITS_PER_SHARD, N_SHARDS, build_fixture, timed_run  # noqa: E402

from frontier_engine import seen as seenmod  # noqa: E402
from frontier_engine.session import get_spark  # noqa: E402
from frontier_engine.storage import SnapshotStore  # noqa: E402


def main():
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 384_000_000
    n_cand = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(f"local[{cpus}]", app_name="crawl-bloom-persisted",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    tmpl, corpus = build_fixture(spark, n_seen, n_cand)
    store = SnapshotStore(spark, tmpl)
    meta = {"n_shards": N_SHARDS, "m_bits": BITS_PER_SHARD}
    if store.read_aux(0, "bloom", expect_meta=meta) is None:
        t0 = time.perf_counter()
        built = seenmod.build_bloom_shards(
            store.read(0, "seen"), n_shards=N_SHARDS, m_bits=BITS_PER_SHARD
        ).localCheckpoint(eager=True)
        store.write_aux(0, "bloom", built, meta=meta)
        print(json.dumps({"aux_build_and_persist_sec": round(time.perf_counter() - t0, 2)}), flush=True)

    # same warm-up as the original protocol: one full exact-mode run
    timed_run(spark, tmpl, corpus, use_bloom=False, prune=False)
    r = timed_run(spark, tmpl, corpus, use_bloom=True, prune=True)
    r.update({"seen_keys": n_seen, "candidates": n_cand, "filter": "persisted_aux"})
    print(json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
