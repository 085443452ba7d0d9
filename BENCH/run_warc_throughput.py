"""WARC ingest throughput (round 6): pack a synthetic pages corpus into
gzipped segments, then measure the full ingest path — binaryFile read →
record parse (mapInPandas) → records_to_pages (E1 extraction) — as MB/s
and pages/s.  One JSON line per phase; results land in SCALE.md.

Usage: SPARK_GRAFT_CPUS=16 python BENCH/run_warc_throughput.py [n_pages] [n_files]
"""

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from frontier_engine import synth, warc  # noqa: E402
from frontier_engine.schema import PAGES  # noqa: E402
from frontier_engine.session import get_spark  # noqa: E402


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(f"local[{cpus}]", app_name="warc-throughput",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    pages_dir = os.path.join(tempfile.gettempdir(), f"warc_tp_pages_{n_pages}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        mode = "overwrite"
        for chunk in synth.iter_pages_chunks(n_pages):
            spark.createDataFrame(chunk, schema=PAGES).repartition(16).write.mode(mode).parquet(pages_dir)
            mode = "append"
    pages = spark.read.parquet(pages_dir)

    seg_dir = tempfile.mkdtemp(prefix="warc_tp_seg_")
    t0 = time.perf_counter()
    blobs = warc.pack_pages(pages, n_files=n_files)

    def write_part(rows):
        for r in rows:
            with open(os.path.join(seg_dir, r.warc_file), "wb") as fh:
                fh.write(bytes(r.warc_bytes))

    blobs.foreachPartition(write_part)
    pack_sec = time.perf_counter() - t0
    seg_bytes = sum(os.path.getsize(os.path.join(seg_dir, f)) for f in os.listdir(seg_dir))

    # warm-up then measured: records-only parse (no extraction)
    warc.read_warc(spark, seg_dir).count()
    t0 = time.perf_counter()
    n_rec = warc.read_warc(spark, seg_dir).count()
    parse_sec = time.perf_counter() - t0

    # full ingest: parse + pages bridge incl. E1 extraction
    t0 = time.perf_counter()
    n_out = warc.records_to_pages(warc.read_warc(spark, seg_dir)).count()
    ingest_sec = time.perf_counter() - t0

    print(json.dumps({
        "n_pages": n_pages, "n_files": n_files, "cores": int(cpus),
        "segment_gz_mb": round(seg_bytes / 1e6, 1),
        "pack_sec": round(pack_sec, 2),
        "parse_sec": round(parse_sec, 2),
        "parse_records_per_sec": round(n_rec / parse_sec),
        "ingest_sec": round(ingest_sec, 2),
        "ingest_pages_per_sec": round(n_out / ingest_sec),
        "ingest_gz_mb_per_sec": round(seg_bytes / 1e6 / ingest_sec, 1),
    }), flush=True)
    shutil.rmtree(seg_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
