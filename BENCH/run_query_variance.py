"""Interleaved variance measurement for the r4->r5 query-side bench drift
(VERDICT r5 #2).

Context: BENCH_r05 read 15-40% slower than BENCH_r04 on shuffle-heavy
queries (minhash_signatures 2.38->3.02, lsh_pairs 1.53->2.03, token_budget
0.90->1.16, pricing_summary 0.90->1.10) while map-only queries improved
(lang_id 0.56->0.46, token_counts 0.32->0.28).  git diff df8a3e9..958615c
shows the code paths of every drifted query are IDENTICAL between rounds
(only contamination/span_dedup changed + new functions appended), the
session config is identical, and the drifted queries run BEFORE any of the
r5-added bench entries — so there is no code-side A/B to alternate.  What
CAN be measured is the within-JVM run-to-run variance band of the exact
bench protocol: if both the r4 and r5 recorded values sit inside one JVM's
own rep-to-rep band, the drift is host noise, not a regression.

Protocol: one JVM, the bench session config, same warm-up as bench.py,
then ROUND-ROBIN interleaved reps (not blocks — a slow-host episode hits
all queries of a rep equally instead of biasing one query) of the three
drifted queries plus two controls (repetition_signals: shuffle-shaped but
stable r4->r5; token_counts: map-only).  Emits one JSON line per rep and
a summary with min/median/max per query.

Run with nothing else on the host (the scaling-gate lesson).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "minhash_signatures",
    "lsh_pairs",
    "token_budget",
    "pricing_summary",
    "repetition_signals",  # control: shuffle-shaped, stable r4->r5
    "token_counts",        # control: map-only, improved r4->r5
]
REPS = int(os.environ.get("VARIANCE_REPS", "6"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import __spark_entry__ as entrymod
    from frontier_engine.session import get_spark

    spark = get_spark()  # master from SPARK_GRAFT_MASTER/SPARK_GRAFT_CPUS (default local[32])
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # same warm-up as bench.py
    force(qs["dedup_exact"](spark, SF_DIR))
    force(qs["hourly_counts"](spark, SF_DIR))

    times = {q: [] for q in QUERIES}
    for rep in range(REPS):
        for q in QUERIES:
            t0 = time.perf_counter()
            force(qs[q](spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            times[q].append(dt)
        print(json.dumps({"rep": rep, **{q: times[q][-1] for q in QUERIES}}), flush=True)

    summary = {}
    for q in QUERIES:
        xs = sorted(times[q])
        summary[q] = {
            "min": xs[0],
            "median": xs[len(xs) // 2] if len(xs) % 2 else round((xs[len(xs) // 2 - 1] + xs[len(xs) // 2]) / 2, 3),
            "max": xs[-1],
            "all": times[q],
        }
    print(json.dumps({"summary": summary, "reps": REPS, "sf_dir": SF_DIR}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
