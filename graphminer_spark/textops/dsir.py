"""DSIR — data selection with importance resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169).

The pretraining-data selection method: fit two hashed-n-gram bag
models — one on a small TARGET corpus (the distribution you want,
e.g. high-quality English), one on the RAW pool — and weight every
raw document by its log importance ratio

    log w(d) = Σ_features c_d(f) · [ log p_target(f) − log p_raw(f) ]

then sample the pool ∝ w. Features are word unigrams hashed into
``n_buckets`` (the paper uses hashed uni+bigrams into 10k buckets;
bucket count is a constructor knob), with Laplace smoothing so unseen
buckets stay finite.

Scale shape (100 TB pool): the two bucket models are ONE groupBy each
(the target model over the small target corpus, the raw model a
partial-aggregatable count over the pool — same scan that computes
any corpus stat); the per-bucket log-ratio table has ``n_buckets``
rows — broadcast-sized — so scoring the pool is a map-side explode +
broadcast join + per-doc sum: no pool-sized shuffle beyond the final
per-doc aggregate.

Engine-exactness: the only transcendental is ``ln`` over the
``n_buckets`` smoothed ratios. ``ln`` is not required to be correctly
rounded by IEEE 754, so cross-engine agreement is quarantined to the
bucket table: each per-bucket log-ratio is floored to integer basis
points (``lam_bp``) ONCE, and every downstream quantity — the per-doc
``logw_bp`` the gate compares — is an exact integer Σ c_d(b)·λ_b. A
1-ulp ``ln`` divergence flips a λ only if the true value sits within
~1e-12 of an integer basis point (and the pytest cross-checks every λ
against numpy at 1e-9). The final Gumbel resampling draw needs
``exp``/``ln`` on md5 uniforms, so :func:`dsir_resample` is
pytest-verified (the driver contract's non-SQL carve-out); the
weights themselves are the oracle-checked face (``docs_dsir_weights``).

Reference analogue: GraphMiner has no text kernels; this extends the
LLM-pipeline family (``SURVEY.md §2.6``) with the quality-targeted
selection step between filtering and mixture sampling
([[docs_quality_mixture]] composes downstream of these weights).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 256


def _bucket(word: Column, n_buckets: int) -> Column:
    """md5-hashed feature bucket — replayable in DuckDB as
    ``('0x' || substr(md5(word), 1, 8))::BIGINT % n``."""
    return (
        F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def hashed_feature_counts(
    docs: DataFrame, n_buckets: int = N_BUCKETS, text_col: str = "text"
) -> DataFrame:
    """``(bucket, cnt)`` — hashed word-unigram counts over a corpus.
    One explode + one partial-aggregatable groupBy."""
    word = F.explode(F.split(F.col(text_col), " ")).alias("word")
    return (
        docs.select(word)
        .filter(F.col("word") != "")
        .select(_bucket(F.col("word"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def dsir_log_ratios(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """``(bucket, lam_bp)`` for every bucket 0..n_buckets−1:
    ``floor(1e4 · (ln p̂_t(b) − ln p̂_r(b)))`` with Laplace-smoothed
    ``p̂(b) = (cnt_b + 1) / (total + n_buckets)``. Dimension-sized."""
    spark = target_counts.sparkSession
    t_total = target_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    r_total = raw_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    frame = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = (
        frame.join(
            target_counts.withColumnRenamed("cnt", "ct"), "bucket", "left"
        )
        .join(raw_counts.withColumnRenamed("cnt", "cr"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    lam = (
        F.log(F.col("ct") + 1.0)
        - F.log(F.lit(float(t_total + n_buckets)))
        - F.log(F.col("cr") + 1.0)
        + F.log(F.lit(float(r_total + n_buckets)))
    )
    return joined.select(
        "bucket", F.floor(F.lit(10000.0) * lam).cast("long").alias("lam_bp")
    )


def dsir_weights(
    docs: DataFrame,
    log_ratios: DataFrame,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, n_feats, logw_bp)`` — exact integer importance
    weights: Σ over the doc's features of the bucket's ``lam_bp``.
    Map-side explode + broadcast join + one per-doc aggregate."""
    feats = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .select(id_col, _bucket(F.col("word"), n_buckets).alias("bucket"))
    )
    return (
        feats.join(F.broadcast(log_ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("lam_bp").cast("long").alias("logw_bp"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    weights: DataFrame,
    n: int,
    salt: str = "dsir",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k resampling: keep ``n`` docs with probability ∝
    exp(logw) WITHOUT replacement, deterministically — the Gumbel keys
    come from md5 uniforms, so the draw replays at any parallelism.

    key(d) = logw(d) + Gumbel(d) where Gumbel = −ln(−ln(u)) and
    u = (md5(salt:doc_id) first 8 hex + 1) / 2^32 ∈ (0, 1]. Top-n by
    (key, doc_id) — a partial top-n (TakeOrderedAndProject), no global
    sort materialization. exp/ln make this float-keyed, hence
    pytest-verified rather than oracle-compared (see module doc)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(float(2**32))
    gumbel = -F.log(-F.log(u))
    keyed = weights.select(
        id_col,
        "logw_bp",
        (F.col("logw_bp").cast("double") / 10000.0 + gumbel).alias("key"),
    )
    return (
        keyed.orderBy(F.col("key").desc(), F.col(id_col))
        .limit(n)
        .join(docs, id_col)
        .drop("key")
    )


def dsir_weights_sql(
    target_pred: str, n_buckets: int = N_BUCKETS, text_col: str = "text"
) -> str:
    """DuckDB statement mirroring target-model training + raw-model
    training + :func:`dsir_weights` over the ``documents`` view.
    ``target_pred`` is the SQL predicate selecting the target corpus
    (e.g. ``lang = 'en'``)."""
    return f"""
WITH feats AS (
  SELECT doc_id, lang,
         (('0x' || substr(md5(word), 1, 8))::BIGINT % {n_buckets}) AS bucket
  FROM (SELECT doc_id, lang, unnest(string_split({text_col}, ' ')) AS word
        FROM documents)
  WHERE word <> ''
),
tc AS (SELECT bucket, count(*)::BIGINT AS ct FROM feats
       WHERE {target_pred} GROUP BY bucket),
rc AS (SELECT bucket, count(*)::BIGINT AS cr FROM feats GROUP BY bucket),
tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tc) AS tt,
               (SELECT coalesce(sum(cr), 0) FROM rc) AS tr),
lam AS (
  SELECT b.bucket,
         floor(10000.0 * (ln(coalesce(tc.ct, 0) + 1.0)
                          - ln((SELECT tt FROM tot) + {n_buckets}.0)
                          - ln(coalesce(rc.cr, 0) + 1.0)
                          + ln((SELECT tr FROM tot) + {n_buckets}.0)
                         ))::BIGINT AS lam_bp
  FROM (SELECT unnest(range(0, {n_buckets})) AS bucket) b
  LEFT JOIN tc ON tc.bucket = b.bucket
  LEFT JOIN rc ON rc.bucket = b.bucket
)
SELECT f.doc_id, count(*)::BIGINT AS n_feats,
       sum(l.lam_bp)::BIGINT AS logw_bp
FROM feats f JOIN lam l ON l.bucket = f.bucket
GROUP BY f.doc_id
""".strip()
