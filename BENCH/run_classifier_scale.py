"""Scale measurement for textops.quality_classifier (round 7).

The classifier is the corpus-wide gate of a training-data pipeline — at
100 TB it runs over EVERY document, so its per-core token throughput is
the transferable number (the WARC-ingest measurement's sibling).  Two
questions to evidence:
  1. Absolute throughput: tokens/s and text-MB/s per core for the
     map-only hashed unigram+bigram scorer (3 md5 families per token).
  2. Cores scaling (north-rule evidence pattern: same job at N and 4N
     worker threads, fresh JVM each, within physical cores — local[2]
     vs local[8] on this 16-physical-core SMT host).

Corpus: 2,000,000 docs × ~120 tokens generated NATIVELY with spark.range
+ expressions (never a driver-local relation —
memory/spark-sandbox-performance) and written to parquet first.

Usage:
  python BENCH/run_classifier_scale.py           # orchestrate children
  python BENCH/run_classifier_scale.py child <cores> <docs_dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 2_000_000
TOKENS_PER_DOC = 120  # ~typical web-doc body after boilerplate strip
VOCAB = 50_000


def _spark(cores: int):
    from frontier_engine.session import get_spark

    return get_spark(f"local[{cores}]", extra_conf={"spark.ui.showConsoleProgress": "false"})


def gen_docs(docs_dir: str) -> None:
    spark = _spark(8)
    # Zipf-ish word ids: squaring a uniform hash fraction skews mass
    # toward low ids, giving realistic repeated-token/bigram structure
    d = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, "
        f"{TOKENS_PER_DOC - 20} + CAST(abs(xxhash64(id)) % 41 AS INT)), "
        f"i -> concat('w', CAST(pow(abs(xxhash64(id, i)) % 1000000 / 1000000.0, 2) * {VOCAB} AS INT)))) AS text",
    )
    d.repartition(32).write.mode("overwrite").parquet(docs_dir)
    spark.stop()


def child(cores: int, docs_dir: str) -> None:
    from pyspark.sql import functions as F

    from frontier_engine import textops

    spark = _spark(cores)
    docs = spark.read.parquet(docs_dir)
    # warm-up absorbs codegen/JIT
    textops.quality_classifier(docs.limit(5000)).write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(2):
        t0 = time.time()
        textops.quality_classifier(docs).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    n_tokens = docs.select(F.sum(F.size(F.split("text", " "))).alias("n")).first()["n"]
    n_bytes = docs.select(F.sum(F.length("text")).alias("n")).first()["n"]
    print(json.dumps({"cores": cores, "sec": round(best, 2), "n_tokens": int(n_tokens), "n_bytes": int(n_bytes)}))
    spark.stop()


def main() -> None:
    docs_dir = os.path.join(REPO, "BENCH", "_classifier_docs")
    if not os.path.exists(os.path.join(docs_dir, "_SUCCESS")):
        gen_docs(docs_dir)
    results = {}
    for cores in (8, 2):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", str(cores), docs_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print("CHILD FAILED", cores, p.stderr[-2000:], flush=True)
            return
        results[cores] = json.loads(lines[-1])
        print("DONE", results[cores], flush=True)
    s8, s2 = results[8]["sec"], results[2]["sec"]
    toks = results[8]["n_tokens"]
    mb = results[8]["n_bytes"] / 1e6
    print(json.dumps({
        "n_docs": N_DOCS,
        "n_tokens": toks,
        "text_mb": round(mb, 1),
        "sec_8c": s8,
        "sec_2c": s2,
        "scaling_efficiency_2_to_8": round((s2 / s8) / 4.0, 3),
        "tokens_per_sec_8c": round(toks / s8),
        "tokens_per_sec_per_core_8c": round(toks / s8 / 8),
        "text_mb_per_sec_per_core_8c": round(mb / s8 / 8, 2),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        main()
