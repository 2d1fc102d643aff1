"""Cluster job entry point: pages table → link-graph analytics.

Run locally::

    python jobs/linkgraph_job.py --pages /path/pages.parquet --out /tmp/out

On a cluster (the north rule's deployment shape)::

    spark-submit --py-files graphminer_spark.zip jobs/linkgraph_job.py \
        --pages s3://bucket/pages --out s3://bucket/linkgraph \
        --algorithms pagerank,cc,lp,tc --resume

``--synthesize N`` generates a deterministic N-page corpus instead of
reading one (smoke/bench). All state checkpoints under ``--out``; a
killed job rerun with ``--resume`` continues from the last durable
superstep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# python *workers* import the package too (UDF closures pickle by
# reference); on a cluster --py-files handles this, locally PYTHONPATH
# must be set before the JVM (and its worker daemons) launch
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from graphminer_spark.algorithms.components import connected_components  # noqa: E402
from graphminer_spark.algorithms.labelprop import label_propagation  # noqa: E402
from graphminer_spark.algorithms.pagerank import pagerank  # noqa: E402
from graphminer_spark.algorithms.triangles import (  # noqa: E402
    per_edge_triangles,
    triangle_count,
)
from graphminer_spark.checkpoint import CheckpointManager  # noqa: E402
from graphminer_spark.graph.build import build_dag, symmetrize  # noqa: E402
from graphminer_spark.sources.extract import (  # noqa: E402
    audit_id_collisions,
    build_link_graph,
)
from graphminer_spark.sinks import write_snapshot  # noqa: E402
from graphminer_spark.sources.pages import generate_pages  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthesize", type=int, default=0, help="generate N pages instead")
    ap.add_argument("--out", required=True, help="output/checkpoint root")
    ap.add_argument("--algorithms", default="pagerank,cc,lp,tc")
    ap.add_argument("--pr-tol", type=float, default=1e-6)
    ap.add_argument("--pr-max-iter", type=int, default=100)
    ap.add_argument("--lp-iter", type=int, default=10)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--checkpoint-every", type=int, default=5)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("graphminer-linkgraph").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    algos = set(args.algorithms.split(","))
    metrics: dict[str, object] = {"started": time.time()}

    if args.synthesize:
        pages = generate_pages(spark, args.synthesize, seed=42)
    else:
        if not args.pages:
            ap.error("--pages or --synthesize required")
        pages = spark.read.parquet(args.pages)

    vertices, edges = build_link_graph(pages)
    edges = edges.persist()
    collisions = audit_id_collisions(vertices)
    if collisions:
        raise RuntimeError(f"xxhash64 id collisions: {collisions}")
    # full corpus vertex set (crawled pages with no kept links included):
    # PR dangling mass, CC singleton components and LP self-labels must
    # cover every page, not just pages that happen to touch an edge
    verts = vertices.select("id").persist()
    # directed link edges → canonical undirected (src < dst, dedup):
    # xxhash64 ids put ~half the rows src > dst, and reciprocal links
    # (A→B and B→A) must collapse to one undirected edge before the
    # degree-ordered DAG / per-edge TC join
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .persist()
    )
    sym = symmetrize(canon, dedup=False).persist()
    metrics["n_vertices"] = verts.count()
    metrics["n_edges"] = edges.count()
    metrics["n_undirected_edges"] = canon.count()

    edges.write.mode("overwrite").parquet(f"{args.out}/edges")
    vertices.write.mode("overwrite").parquet(f"{args.out}/vertices")

    if "tc" in algos:
        dag = build_dag(canon)
        metrics["n_triangles"] = triangle_count(dag).collect()[0][0]
        per_edge_triangles(canon, dag).write.mode("overwrite").parquet(
            f"{args.out}/tc_per_edge"
        )
    if "pagerank" in algos:
        ck = CheckpointManager(f"{args.out}/ckpt_pagerank", every=args.checkpoint_every)
        res = pagerank(
            edges, verts, tol=args.pr_tol, max_iter=args.pr_max_iter,
            checkpointer=ck, resume=args.resume,
        )
        metrics["pagerank_iterations"] = res.iterations
        metrics["pagerank_converged"] = res.converged
        metrics["pagerank_final_delta"] = res.deltas[-1] if res.deltas else None
        # results land as an immutable snapshot (manifest + per-file
        # stats + convergence metrics); re-runs append to the lineage
        # chain instead of clobbering the previous table
        metrics["pagerank_snapshot"] = write_snapshot(
            res.ranks,
            f"{args.out}/pagerank",
            key_col="id",
            metrics={
                "iterations": res.iterations,
                "converged": res.converged,
                "final_delta": res.deltas[-1] if res.deltas else None,
            },
        )
    if "cc" in algos:
        ck = CheckpointManager(f"{args.out}/ckpt_cc", every=args.checkpoint_every)
        cc = connected_components(edges, verts, checkpointer=ck)
        cc.write.mode("overwrite").parquet(f"{args.out}/components")
    if "lp" in algos:
        ck = CheckpointManager(f"{args.out}/ckpt_lp", every=args.checkpoint_every)
        # production path keeps the per-superstep changed-count metric
        # and stops early on stability; fixed-iteration benchmarking
        # (until_stable=False) skips that extra shuffle per superstep
        lp = label_propagation(
            sym, verts, n_iter=args.lp_iter, checkpointer=ck, until_stable=True
        )
        lp.labels.write.mode("overwrite").parquet(f"{args.out}/labels")
        metrics["lp_changed_history"] = lp.changed

    metrics["finished"] = time.time()
    with open(os.path.join(args.out, "job_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    print(json.dumps(metrics, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
