"""Corpus-trained n-gram coverage scoring (the CCNet-style "train a
language model on the corpus, score every document against it"
quality-filter shape, kept exact-integer so the DuckDB oracle replays
it bit-for-bit).

Model = the ``top_k`` most frequent character trigrams of the corpus
(ties broken by the gram string — deterministic). Score = the basis-
point fraction of a document's trigrams that are in-model: fluent
in-distribution text scores high, noise/out-of-distribution text low.
Real deployments swap the count table for KenLM log-probs; the train /
broadcast / score dataflow — the part Spark owns — is identical.

Scale shape: training is one explode + groupBy (shuffles vocabulary-
sized data, not corpus-sized, after partial aggregation); the rank
window runs on the VOCABULARY (≤ a few million rows — a single-task
sort, documented bound); scoring is a broadcast hash join of each
document's grams against the ``top_k``-row model — map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TRIGRAMS = (
    "CASE WHEN length(text) >= 3 THEN "
    "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)) "
    "ELSE array() END"
)


def train_trigram_model(docs: DataFrame, top_k: int = 256) -> DataFrame:
    """``documents(text)`` → ``(gram, cnt, rank)``: the ``top_k`` most
    frequent character trigrams (rank 1 = most frequent; ties →
    lexicographically smaller gram first)."""
    counts = (
        docs.select(F.explode(F.expr(_TRIGRAMS)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def lm_coverage_score(docs: DataFrame, model: DataFrame) -> DataFrame:
    """Score every document against a trained trigram model →
    ``(doc_id, n_grams, n_hits, cov_bp)`` where ``cov_bp`` is the
    floor basis-point fraction of the document's trigrams present in
    the model (documents shorter than 3 chars score 0 of 0)."""
    grams = docs.select(
        "doc_id", F.explode_outer(F.expr(_TRIGRAMS)).alias("gram")
    )
    hit = F.when(F.col("rank").isNotNull(), 1).otherwise(0)
    scored = (
        grams.join(F.broadcast(model.select("gram", "rank")), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("gram").isNotNull(), 1).otherwise(0)).alias(
                "n_grams"
            ),
            F.sum(hit).alias("n_hits"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hits").cast("long").alias("n_hits"),
        # integer `div`, not double division: exact at any scale
        F.when(
            F.col("n_grams") > 0,
            F.expr("(n_hits * 10000) div n_grams"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cov_bp"),
    )
