"""Scaling-efficiency evidence for the north rule.

Runs the identical bench suite at two parallelism levels (local[8] and
local[32] — the sandbox stand-in for N vs 4N executors; a real cluster
swaps the master URL via spark-submit) in separate JVMs, computes
per-query and overall throughput scaling efficiency, and writes
``BENCH/BASELINE.md``.

Efficiency definition: with 4× the cores, ideal wall-time is t/4, so
``eff = t_8 / (4 · t_32)``; ≥ 0.8 satisfies the rule. Results are also
compared for equality across the two levels (determinism invariant) by
``tools/check_determinism.py``.

Usage: ``python BENCH/scaling.py [sf_dir]``
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (8, 32)


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # fixed superstep count so both levels do identical work
    env["SPARK_GRAFT_PR_ITERS"] = env.get("SPARK_GRAFT_PR_ITERS", "10")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    results = {c: run_level(c, sf_dir) for c in LEVELS}
    lo, hi = LEVELS
    ratio = hi / lo
    rows = []
    for q in results[lo]["queries"]:
        t_lo, t_hi = results[lo]["queries"][q], results[hi]["queries"][q]
        speedup = t_lo / t_hi if t_hi else float("inf")
        eff = speedup / ratio
        rows.append((q, t_lo, t_hi, speedup, eff))
    total_lo = results[lo]["value"]
    total_hi = results[hi]["value"]
    total_speedup = total_lo / total_hi
    total_eff = total_speedup / ratio

    # throughput-based headline: PageRank edges-scanned/sec at each level
    thr_lo = results[lo]["pagerank_edges_scanned_per_sec"]
    thr_hi = results[hi]["pagerank_edges_scanned_per_sec"]
    pr_eff = (thr_hi / thr_lo) / ratio

    md = [
        "# BENCH/BASELINE — measured throughput and scaling efficiency",
        "",
        f"Input: `{sf_dir}` — {results[lo]['n_vertices']} vertices, "
        f"{results[lo]['n_edges']} edges, {results[lo]['n_triangles']} triangles.",
        "",
        f"Same jobs, same input, two parallelism levels: `local[{lo}]` vs "
        f"`local[{hi}]` (sandbox stand-in for N vs 4N executors; cluster "
        "runs swap the master via spark-submit). PageRank fixed at "
        f"{results[lo].get('pagerank_iterations', '?')} supersteps at both "
        "levels so the work is identical.",
        "",
        "| query | local[8] s | local[32] s | speedup | scaling eff (ideal 1.0) |",
        "|---|---:|---:|---:|---:|",
    ]
    for q, t_lo, t_hi, sp, eff in rows:
        md.append(f"| {q} | {t_lo:.2f} | {t_hi:.2f} | {sp:.2f}× | {eff:.2f} |")
    md += [
        f"| **total** | {total_lo:.2f} | {total_hi:.2f} | {total_speedup:.2f}× | {total_eff:.2f} |",
        "",
        "## North-rule metrics",
        "",
        f"- PageRank throughput: {thr_lo:,.0f} edges-scanned/sec at local[{lo}], "
        f"{thr_hi:,.0f} at local[{hi}] → **scaling efficiency {pr_eff:.2f}**",
        f"- PageRank iterations/hour: {results[lo]['pagerank_iters_per_hour']:,.0f} "
        f"(local[{lo}]) / {results[hi]['pagerank_iters_per_hour']:,.0f} (local[{hi}])",
        f"- Raw JSON: `BENCH/scaling_local{lo}.json`, `BENCH/scaling_local{hi}.json`",
        "",
        "Determinism across levels (bitwise CC/LP/TC, 1e-6 PR) is asserted "
        "separately by `tools/check_determinism.py`.",
    ]
    bench_dir = os.path.join(REPO, "BENCH")
    for c in LEVELS:
        with open(os.path.join(bench_dir, f"scaling_local{c}.json"), "w") as f:
            json.dump(results[c], f, indent=2)
    with open(os.path.join(bench_dir, "BASELINE.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
