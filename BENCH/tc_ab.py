"""TC strategy head-to-head at two executor counts (round-5 ask #4).

Three physical strategies for the SAME exact triangle count, measured
under the repetition protocol of ``scaling_reps.py`` (best-of-R inside
one session per executor level, warm JIT from rep 2):

* ``wedge``      — the production plan: global DAG wedge join
  (``triangles.triangle_count``), AQE on.
* ``wedge_skew`` — same plan with AQE's skew-join split FORCED
  (``forceOptimizeSkewedJoin`` + factor 1 / 16 KB threshold), the
  "what if the optimizer split every hot partition" variant.
* ``block2d``    — Suri-Vassilvitskii cluster-triple blocks
  (``partition2d.triangle_count_2d``) with the auto-picked nc.

Usage: ``python BENCH/tc_ab.py`` (~15-25 min). Writes
``BENCH/tc_ab.json``; the findings live in BENCH/BASELINE.md's
"TC strategy head-to-head" section.

Env: SPARK_GRAFT_SCALE_EXECUTORS=lo,hi (default 1,4),
SPARK_GRAFT_SCALE_REPS (default 3), SPARK_GRAFT_TC_EDGES (default
8,000,000 canonical edges — the suite protocol graph; ~48M wedges).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXEC_JVM = "-XX:+AlwaysPreTouch -XX:+UseParallelGC"

WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from graphminer_spark.session import get_spark
from graphminer_spark.graph.synthetic import synthetic_edges
from graphminer_spark.graph.build import build_dag
from graphminer_spark.graph.partition2d import auto_nc, triangle_count_2d
from graphminer_spark.algorithms.triangles import triangle_count

n_exec = %(n_exec)d
spark = get_spark(
    "tc-ab",
    master=f"local-cluster[{n_exec},2,9216]",
    shuffle_partitions=n_exec * 4,
    extra_conf={
        "spark.executor.memory": "8g",
        "spark.executor.extraJavaOptions": %(jvm)r,
        "spark.executorEnv.PYTHONPATH": %(repo)r,
    },
)
REPS = %(reps)d
out = {"executors": n_exec, "reps": {}}

edges = synthetic_edges(spark, %(tc_edges)d, %(tc_verts)d,
                        partitions=n_exec * 8).persist()
m = edges.count()
dag = build_dag(edges).persist(); dag.count()
nc = auto_nc(m, n_exec * 2)
out["n_edges"] = m
out["nc"] = nc

def rep(name, fn):
    ts = []
    for _ in range(REPS):
        t0 = time.monotonic(); fn(); ts.append(round(time.monotonic() - t0, 2))
    out["reps"][name] = ts

def tc_skew():
    for k, v in (
        ("spark.sql.adaptive.forceOptimizeSkewedJoin", "true"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
         "16KB"),
    ):
        spark.conf.set(k, v)
    try:
        triangle_count(dag).collect()
    finally:
        for k in (
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        ):
            spark.conf.unset(k)

counts = {}
counts["wedge"] = triangle_count(dag).collect()[0][0]  # warm + correctness
counts["block2d"] = triangle_count_2d(dag, nc=nc).collect()[0][0]
assert counts["wedge"] == counts["block2d"], counts
out["n_triangles"] = counts["wedge"]

rep("wedge", lambda: triangle_count(dag).collect())
rep("wedge_skew", tc_skew)
rep("block2d", lambda: triangle_count_2d(dag, nc=nc).collect())
print("AB_JSON:" + json.dumps(out))
spark.stop()
"""


def run_level(n_exec: int, reps: int, cfg: dict) -> dict:
    code = WORKER % {
        "repo": REPO, "n_exec": n_exec, "jvm": EXEC_JVM, "reps": reps, **cfg
    }
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="8g")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_JSON:"):
            return json.loads(line[len("AB_JSON:"):])
    raise RuntimeError(f"no result line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    lo, hi = (
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_EXECUTORS", "1,4").split(",")
    )
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    cfg = {
        "tc_edges": int(os.environ.get("SPARK_GRAFT_TC_EDGES", 8_000_000)),
        "tc_verts": 200_000,
    }
    ratio = hi / lo
    results = {c: run_level(c, reps, cfg) for c in (lo, hi)}
    effs = {}
    for name in results[lo]["reps"]:
        b_lo = min(results[lo]["reps"][name])
        b_hi = min(results[hi]["reps"][name])
        effs[name] = round((b_lo / b_hi) / ratio, 2)
    payload = {"levels": results, "efficiency": effs, "reps_per_level": reps}
    with open(os.path.join(REPO, "BENCH", "tc_ab.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
