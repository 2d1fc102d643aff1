"""Deterministic document samplers for training-data pipelines:
stratified Bernoulli sampling (per-language mixture control — the
"data recipe" knob of an LLM corpus build) and fixed-size hash-ordered
per-stratum selection.

Determinism: every choice is an md5-derived integer (the same
convention as ``graph/sampling.py`` and the DOULION filter), so

* retried stages / different parallelism produce the same sample,
* the DuckDB oracle reproduces it exactly with
  ``('0x' || substr(md5(k), 1, 8))::BIGINT``.

Scale shape:

* :func:`stratified_sample` is a pure map-side filter (no shuffle at
  all) — the 100 TB path: rates are a broadcast literal CASE, the
  hash is per-row.
* :func:`per_stratum_sample` is a per-stratum top-n window; Spark's
  rank-limit pushdown (``WindowGroupLimit``, 3.5+) turns it into a
  partial per-partition top-n before the single shuffle by stratum,
  so executor memory holds n rows per stratum, not the stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h(key: Column) -> Column:
    # md5 first 8 hex chars as non-negative long (see module docstring)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def stratified_sample(
    docs: DataFrame,
    rates_bp: dict[str, int],
    default_bp: int = 0,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum Bernoulli sample → the input rows whose stratum won
    the hash draw, plus the stratum's ``rate_bp``.

    ``rates_bp`` maps stratum value → keep probability in basis points
    (10000 = keep all); unlisted strata fall back to ``default_bp``.
    A row is kept when ``md5(key ':' stratum) % 10000 < rate_bp`` —
    exact integer arithmetic, no RNG state, map-side only.
    """
    rate = F.lit(default_bp)
    for s, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(bp)).otherwise(rate)
    draw = _h(
        F.concat_ws(":", F.col(key_col).cast("string"), F.col(strata_col))
    ) % 10000
    return (
        docs.withColumn("rate_bp", rate.cast("int"))
        .filter(draw < F.col("rate_bp"))
    )


def per_stratum_sample(
    docs: DataFrame,
    n: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size deterministic sample: the ``n`` rows of each stratum
    with the smallest ``(md5-hash, key)`` — a hash-ordered reservoir
    whose membership is stable under data re-partitioning and under
    appends that don't change the winning hashes.

    Returns the input rows plus ``sample_rank`` (1-based within the
    stratum).
    """
    h = _h(F.concat_ws(":", F.col(key_col).cast("string"), F.lit("psr")))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def quality_mixture(
    docs: DataFrame,
    scores: DataFrame,
    n_buckets: int = 4,
    n_per_bucket: int = 25,
) -> DataFrame:
    """Quality-bucketed training mixture (the DoReMi/CCNet "head /
    middle / tail" recipe): rank every document by a quality score,
    cut the corpus into ``n_buckets`` equal-size tiers, and draw a
    fixed-size deterministic sample from each tier →
    ``(doc_id, bucket, score, sample_rank)``.

    ``scores`` is any per-doc table ``(doc_id, score)`` — e.g.
    ``lm_coverage_score(...)`` coverage basis points. Bucketing uses
    ``ntile`` over (score, doc_id) for an exact cross-engine oracle;
    at 10^12 docs the same tiers come from ``approxQuantile``
    thresholds + a map-side filter instead of a global window — the
    per-tier reservoir (:func:`per_stratum_sample` shape,
    ``WindowGroupLimit`` partial top-n) is unchanged.
    """
    w = Window.orderBy(F.col("score"), F.col("doc_id"))
    bucketed = scores.select(
        "doc_id", "score", F.ntile(n_buckets).over(w).alias("bucket")
    )
    sampled = per_stratum_sample(
        bucketed, n=n_per_bucket, strata_col="bucket", key_col="doc_id"
    )
    return sampled.select("doc_id", "bucket", "score", "sample_rank")
