"""Cluster job entry point: documents table → training-data pipeline.

The companion of ``linkgraph_job.py`` for the corpus side: one pass
computes quality/language/token stats, exact + MinHash-LSH near-dup
removal, SimHash fingerprints, and (optionally) embedding ANN
neighbors — the stages a pretraining-data build runs over every shard.

Run locally::

    python jobs/textpipe_job.py --docs /root/testdata/sf0.01/documents.parquet \
        --out /tmp/textpipe

On a cluster::

    spark-submit --py-files graphminer_spark.zip jobs/textpipe_job.py \
        --docs s3://bucket/documents --embeddings s3://bucket/embeddings \
        --out s3://bucket/corpus_v2 --stages quality,dedup,simhash,ann

Output layout under ``--out``: ``doc_stats/`` (per-doc quality +
language + token counts), ``dup_pairs/`` (verified near-dup pairs),
``keep_docs/`` (survivor doc ids after dedup), ``simhash/``,
``ann_neighbors/`` and ``job_metrics.json``.

Scale notes: every stage is a bucketed/bounded plan — no all-pairs
joins (LSH banding for candidates, pair-wise verification), no
collects of non-scalar data; survivor selection is a min-per-duplicate-
group aggregate, so the job runs shard-parallel at any corpus size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from graphminer_spark.similarity import lsh_ann  # noqa: E402
from graphminer_spark.textops.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_dedup,
    simhash64,
)
from graphminer_spark.textops.quality import (  # noqa: E402
    fingerprint,
    language_id,
    quality_score,
    token_count,
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--embeddings", help="embeddings parquet (vec_id, embedding)")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--stages", default="quality,dedup,simhash")
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument("--ann-k", type=int, default=5)
    ap.add_argument("--emb-dim", type=int, default=64)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("graphminer-textpipe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    stages = set(args.stages.split(","))
    metrics: dict[str, object] = {"started": time.time()}

    docs = spark.read.parquet(args.docs).persist()
    metrics["n_docs"] = docs.count()

    if "quality" in stages:
        stats = (
            token_count(docs)
            .join(quality_score(docs).drop("n_tokens"), "doc_id")
            .join(language_id(docs), "doc_id")
            .join(fingerprint(docs), "doc_id")
        )
        stats.write.mode("overwrite").parquet(f"{args.out}/doc_stats")
        metrics["n_doc_stats"] = stats.count()

    if "dedup" in stages:
        exact = exact_dedup(docs)
        metrics["n_exact_groups"] = exact.count()
        near = minhash_lsh_dedup(docs, threshold=args.jaccard_threshold).persist()
        near.write.mode("overwrite").parquet(f"{args.out}/dup_pairs")
        metrics["n_near_dup_pairs"] = near.count()
        # survivors: drop the larger id of every verified near-dup pair
        # (union-find-free policy: a doc survives unless it is the `b`
        # of some pair — deterministic, one anti-join, no iteration)
        drops = near.select(F.col("b").alias("doc_id")).distinct()
        keep = docs.select("doc_id").join(drops, "doc_id", "left_anti")
        keep.write.mode("overwrite").parquet(f"{args.out}/keep_docs")
        metrics["n_keep_docs"] = keep.count()

    if "simhash" in stages:
        sh = simhash64(docs)
        sh.write.mode("overwrite").parquet(f"{args.out}/simhash")
        metrics["n_simhash"] = sh.count()

    if "ann" in stages and args.embeddings:
        embs = spark.read.parquet(args.embeddings)
        nn = lsh_ann(embs, dim=args.emb_dim, k=args.ann_k, n_planes=4)
        nn.write.mode("overwrite").parquet(f"{args.out}/ann_neighbors")
        metrics["n_ann_rows"] = nn.count()

    metrics["finished"] = time.time()
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "job_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    print(json.dumps(metrics, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
