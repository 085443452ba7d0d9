"""Scale measurement for textops.pagerank_fixed (round 6).

Two questions the docstring claims but r6 should evidence:
  1. The production path (parity_fold=False, partial-aggregatable F.sum)
     beats the oracle-parity path (ordered collect_list fold) once the
     graph is large — the fold materializes an in-degree-sized list per
     node, the sum combines map-side.
  2. The op scales with cores (north-rule evidence pattern: same job at
     N and 4N worker threads, fresh JVM each, within physical cores —
     local[2] vs local[8] on this 16-physical-core SMT host).

Graph: 2,000,000 nodes, 3 deterministic out-edges each (xxhash64-derived
targets, the same shape as the registered q_pagerank query), generated
with spark.range + expressions and WRITTEN TO PARQUET first (driver-local
relations re-serialize per action — memory/spark-sandbox-performance).

Usage:
  python BENCH/run_pagerank_scale.py            # orchestrate all children
  python BENCH/run_pagerank_scale.py child <cores> <fold01> <graph_dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_NODES = 8_000_000
OUT_EDGES = 3
ITERS = 5


def _spark(cores: int):
    from frontier_engine.session import get_spark

    return get_spark(f"local[{cores}]")


def gen_graph(graph_dir: str) -> None:
    spark = _spark(8)
    n = spark.range(N_NODES).selectExpr("id AS node")
    n.write.mode("overwrite").parquet(os.path.join(graph_dir, "nodes"))
    e = spark.range(N_NODES).selectExpr(
        "id AS src",
        f"explode(array({', '.join(f'abs(xxhash64(id, {k})) % {N_NODES}' for k in range(OUT_EDGES))})) AS dst",
    )
    e.write.mode("overwrite").parquet(os.path.join(graph_dir, "edges"))
    # hub-skewed twin: 20% of all edges redirected to node 0 (a "front
    # page" every site links to) — the fold path must collect one
    # in-degree-sized list for the hub, the sum path combines map-side
    es = spark.range(N_NODES).selectExpr(
        "id AS src",
        f"explode(array({', '.join(f'CASE WHEN abs(xxhash64(id, {k}, 7)) % 5 = 0 THEN 0 ELSE abs(xxhash64(id, {k})) % {N_NODES} END' for k in range(OUT_EDGES))})) AS dst",
    )
    es.write.mode("overwrite").parquet(os.path.join(graph_dir, "edges_skew"))
    spark.stop()


def child(cores: int, fold: bool, graph_dir: str, edge_set: str = "edges") -> None:
    from frontier_engine import textops

    spark = _spark(cores)
    nodes = spark.read.parquet(os.path.join(graph_dir, "nodes"))
    edges = spark.read.parquet(os.path.join(graph_dir, edge_set))
    # warm-up: tiny same-shape run absorbs codegen/JIT
    wn = nodes.limit(1000)
    we = edges.limit(3000)
    textops.pagerank_fixed(wn, we, iters=2, parity_fold=fold).count()
    best = None
    for _ in range(2):
        t0 = time.time()
        out = textops.pagerank_fixed(nodes, edges, iters=ITERS, parity_fold=fold)
        rows = out.count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"cores": cores, "fold": fold, "edge_set": edge_set, "sec": round(best, 2), "rows": rows}))
    spark.stop()


def main() -> None:
    graph_dir = os.path.join(REPO, "BENCH", "_pagerank_graph")
    if not os.path.exists(os.path.join(graph_dir, "edges_skew")):
        gen_graph(graph_dir)
    results = []
    for cores, fold, edge_set in (
        (8, True, "edges"), (8, False, "edges"), (2, False, "edges"),
        (8, True, "edges_skew"), (8, False, "edges_skew"),
    ):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", str(cores), str(int(fold)), graph_dir, edge_set],
            capture_output=True, text=True, cwd=REPO,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print("CHILD FAILED", cores, fold, edge_set, p.stderr[-2000:], flush=True)
            continue
        r = json.loads(lines[-1])
        results.append(r)
        print("DONE", r, flush=True)
    by = {(r["cores"], r["fold"], r["edge_set"]): r["sec"] for r in results}
    eff = (by[(2, False, "edges")] / by[(8, False, "edges")]) / 4.0
    print(json.dumps({
        "n_nodes": N_NODES, "n_edges": N_NODES * OUT_EDGES, "iters": ITERS,
        "uniform": {"fold_sec_8c": by[(8, True, "edges")], "sum_sec_8c": by[(8, False, "edges")],
                    "fold_over_sum": round(by[(8, True, "edges")] / by[(8, False, "edges")], 2),
                    "sum_sec_2c": by[(2, False, "edges")],
                    "scaling_efficiency_2_to_8": round(eff, 3)},
        "hub_skew_20pct": {"fold_sec_8c": by.get((8, True, "edges_skew")),
                           "sum_sec_8c": by.get((8, False, "edges_skew")),
                           "fold_over_sum": round(by[(8, True, "edges_skew")] / by[(8, False, "edges_skew")], 2)
                           if (8, True, "edges_skew") in by and (8, False, "edges_skew") in by else None},
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]), bool(int(sys.argv[3])), sys.argv[4], sys.argv[5] if len(sys.argv) > 5 else "edges")
    else:
        main()
