"""Same-window interleaved crawl A/B vs a past commit (round 7).

The decisive adjudicator for crawl-line drift (BASELINE.md 'Round-7
crawl line'): when the headline moves and the canary disagrees — or
agrees — the only evidence that separates code from host is running the
IDENTICAL crawl cell on the old commit and on HEAD, interleaved, in one
window, with a fresh JVM per cell.

Usage:
  python BENCH/run_crawl_ab.py <ref> [reps]     # e.g. <ref>=315d17e
  python BENCH/run_crawl_ab.py cell <repo_dir>  # internal: one JVM cell

The bench corpus (20k pages at the input_hint shape) is reused from the
shared /tmp cache bench.py maintains, or synthesized if absent.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PAGES = 20000
N_SEEDS = 10000


def cell(repo_dir: str) -> None:
    sys.path.insert(0, repo_dir)
    os.chdir(repo_dir)
    from frontier_engine import synth
    from frontier_engine.frontier import CrawlConfig, run_crawl
    from frontier_engine.schema import PAGES
    from frontier_engine.session import get_spark

    spark = get_spark("local[32]", extra_conf={"spark.ui.showConsoleProgress": "false"})
    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_{N_PAGES}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        rows = synth.gen_pages(N_PAGES, with_text=False)
        spark.createDataFrame(rows, schema=PAGES).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    seeds = synth.parse_seed_lines(synth.gen_seed_lines(N_PAGES, N_SEEDS))
    cfg = CrawlConfig(
        round_seconds=1e9, max_rounds=4, max_depth=1, use_bloom=True,
        n_partitions=32, bloom_shards=32,
    )
    run_crawl(spark, corpus, seeds[:200], CrawlConfig(round_seconds=1e9, max_rounds=1))
    trials = []
    for _ in range(2):
        t0 = time.perf_counter()
        run_crawl(spark, corpus, seeds, cfg).pages.count()
        trials.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({"repo": repo_dir, "trials": trials, "best": min(trials)}))
    spark.stop()


def main() -> None:
    ref = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    tree = tempfile.mkdtemp(prefix="crawl_ab_")
    subprocess.run(["git", "worktree", "add", "--force", tree, ref], cwd=REPO, check=True,
                   capture_output=True)
    results: dict[str, list[float]] = {"ref": [], "head": []}
    try:
        for _ in range(reps):
            for label, repo_dir in (("ref", tree), ("head", REPO)):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "cell", repo_dir],
                    capture_output=True, text=True,
                )
                lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
                if not lines:
                    print("CELL FAILED", label, p.stderr[-2000:], flush=True)
                    return
                r = json.loads(lines[-1])
                results[label].append(r["best"])
                print("DONE", label, r, flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", tree], cwd=REPO,
                       capture_output=True)
    print(json.dumps({
        "ref": ref,
        "ref_bests": results["ref"],
        "head_bests": results["head"],
        "verdict": "HEAD regression" if min(results["head"]) > 1.15 * min(results["ref"])
        else "no regression (within band)",
    }))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    if sys.argv[1] == "cell":
        cell(sys.argv[2])
    else:
        main()
