"""Measure what bloom persistence buys at resume (round 6).

The 384M crossover (SCALE.md) showed the bloom+prune advantage plateaus at
1.93x because the measured window pays a full O(M) filter BUILD; run_crawl
now persists the merged bitmaps as a snapshot aux table and resume loads
them instead.  This harness times the two resume paths against the same
fabricated seen store the crossover used:

  build  — seen parquet -> build_bloom_shards -> localCheckpoint (old path)
  load   — aux parquet  -> read_aux           -> localCheckpoint (new path)

Usage: python BENCH/run_bloom_resume.py [seen_parquet_dir] [n_shards] [m_bits]
Defaults target the 384M fixture (1024 shards x 16M bits ~= 45 bits/key).
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from frontier_engine import seen as seenmod  # noqa: E402
from frontier_engine.session import get_spark  # noqa: E402
from frontier_engine.storage import SnapshotStore  # noqa: E402


def main():
    seen_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cbx_ckpt_384000000_200000/rounds/round_00000/seen"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    m_bits = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 24
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(f"local[{cpus}]", app_name="bloom-resume-bench",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    seen = spark.read.parquet(seen_dir)
    n_keys = seen.count()

    # old path: full O(M) build at resume
    t0 = time.perf_counter()
    built = seenmod.build_bloom_shards(seen, n_shards=n_shards, m_bits=m_bits).localCheckpoint(eager=True)
    build_sec = round(time.perf_counter() - t0, 2)
    assert built.count() == n_shards

    # persist once (the per-round aux write the crawl pays), then new path
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="bloom_resume_"))
    t0 = time.perf_counter()
    store.write_aux(0, "bloom", built, meta={"n_shards": n_shards, "m_bits": m_bits})
    persist_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    loaded = store.read_aux(0, "bloom", expect_meta={"n_shards": n_shards, "m_bits": m_bits})
    loaded = loaded.localCheckpoint(eager=True)
    assert loaded.count() == n_shards
    load_sec = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "seen_keys": n_keys, "n_shards": n_shards, "m_bits_per_shard": m_bits,
        "filter_bytes_total": n_shards * m_bits // 8,
        "build_sec": build_sec, "persist_sec": persist_sec, "load_sec": load_sec,
        "resume_speedup_load_over_build": round(build_sec / load_sec, 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
