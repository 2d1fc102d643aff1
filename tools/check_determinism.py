"""Parallelism-invariance check (FIXTURES.md §5 / north rule).

Runs CC, LP, per-edge TC, PageRank, h-index coreness, sampled TC and
the ANF sketch curve
at two parallelism levels in
separate JVMs and asserts: bitwise-identical integer results (CC/LP/TC)
and allclose(1e-6) PageRank. Prints one JSON line per level plus a
final verdict. Usage: ``python tools/check_determinism.py [sf_dir]``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
from graphminer_spark.session import get_spark
from graphminer_spark.graph.tpch_edges import tpch_edges
from graphminer_spark.graph.build import build_dag, degrees, symmetrize
from graphminer_spark.algorithms.triangles import per_edge_triangles
from graphminer_spark.algorithms.components import connected_components
from graphminer_spark.algorithms.labelprop import label_propagation
from graphminer_spark.algorithms.pagerank import pagerank
from graphminer_spark.algorithms.kcore import core_numbers_hindex
from graphminer_spark.algorithms.triangles import triangle_count_sampled
from graphminer_spark.algorithms.anf import neighborhood_function

spark = get_spark("determinism", cores=%(cores)d, shuffle_partitions=%(cores)d)
sf = %(sf_dir)r
edges = tpch_edges(spark, sf).persist()
sym = symmetrize(edges, dedup=False)
verts = degrees(sym).select("id")

out = {}
out["tc"] = sorted(
    (r["src"], r["dst"], r["tri_cnt"])
    for r in per_edge_triangles(edges, build_dag(edges)).collect()
)
out["cc"] = sorted(
    (r["id"], r["component"]) for r in connected_components(edges, verts).collect()
)
out["lp"] = sorted(
    (r["id"], r["label"])
    for r in label_propagation(sym, verts, n_iter=3).labels.collect()
)
out["pr"] = sorted(
    (r["id"], r["rank"]) for r in pagerank(edges, verts, tol=1e-8).ranks.collect()
)
out["coreness"] = sorted(
    (r["id"], r["core"]) for r in core_numbers_hindex(sym).collect()
)
out["tc_approx"] = sorted(
    tuple(r) for r in triangle_count_sampled(edges).collect()
)
out["anf"] = sorted(
    (r["h"], r["sum_pow"]) for r in neighborhood_function(sym, 3).collect()
)
print(json.dumps(out))
"""


def run(cores: int, sf_dir: str) -> dict:
    code = WORKER % {"repo": REPO, "cores": cores, "sf_dir": sf_dir}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    a, b = run(8, sf_dir), run(32, sf_dir)
    ok = True
    for key in ("tc", "cc", "lp", "coreness", "tc_approx", "anf"):
        same = a[key] == b[key]
        ok &= same
        print(f"{key}: bitwise identical across local[8]/local[32]: {same}")
    pra = {i: r for i, r in a["pr"]}
    prb = {i: r for i, r in b["pr"]}
    max_diff = max(abs(pra[i] - prb[i]) for i in pra)
    pr_ok = max_diff < 1e-6
    ok &= pr_ok
    print(f"pr: max |Δrank| across levels = {max_diff:.2e} (<1e-6: {pr_ok})")
    print("DETERMINISM:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
