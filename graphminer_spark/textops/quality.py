"""Text analysis operators: token counting, quality scoring,
language id, document fingerprinting.

All JVM-side expressions (split/regexp/aggregate) — no Python in the
hot path — and each has an exact DuckDB oracle (md5 + integer/string
ops only, plus float ratios rendered via printf where compared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# tiny per-language marker lexicons for the n-gram/lexicon language-ID
# heuristic (deterministic; real deployments would swap in fastText —
# out-of-container, so the heuristic is the real, tested plumbing)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "es", "los"],
}


def _count_word(toks, w: str):
    """Occurrences of exact word ``w`` in a token array column.

    NB: the filter lambda must take exactly one parameter — a second
    parameter makes PySpark pass the element *index* into it.
    """
    return F.coalesce(
        F.size(F.filter(toks, lambda t: t == F.lit(w))), F.lit(0)
    )


def token_count(docs: DataFrame) -> DataFrame:
    """``(doc_id, n_tokens, n_alpha_tokens)`` — whitespace tokens and
    BPE-ish word-piece tokens (letter runs / digit runs / punct)."""
    toks = F.split(F.col("text"), " ")
    pieces = F.regexp_count(F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        pieces.cast("long").alias("n_pieces"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features per doc → ``(doc_id, n_tokens,
    mean_token_len_bp, stopword_ratio_bp, alpha_ratio_bp)``.

    Ratios are reported in basis points via *integer* arithmetic
    (``10000·p // q``) — exact in any engine, immune to float-format
    rounding-mode differences.
    """
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("long")
    text_len = F.length("text").cast("long")
    stop = sum(_count_word(toks, w) for w in STOPWORDS).cast("long")
    alpha = F.regexp_count(F.col("text"), F.lit("[a-zA-Z]")).cast("long")

    def bp(p, q):
        return (F.lit(10000) * p / q).cast("long")

    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        bp(text_len - (n - 1), n).alias("mean_token_len_bp"),
        bp(stop, n).alias("stopword_ratio_bp"),
        bp(alpha, text_len).alias("alpha_ratio_bp"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Lexicon-hit language ID → ``(doc_id, pred_lang, n_hits)``.

    Argmax of marker-word hits per language; ties and zero hits →
    'und'. Deterministic (language keys checked in sorted order).
    """
    toks = F.split(F.col("text"), " ")
    hit_cols = {
        lang: sum(_count_word(toks, w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }
    scored = docs.select(
        "doc_id",
        *[c.alias(f"hits_{lang}") for lang, c in hit_cols.items()],
    )
    langs = sorted(LANG_MARKERS)
    best_hits = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # first (sorted) language achieving the max, if max > 0 and unique-max
    n_at_max = sum(
        F.when(F.col(f"hits_{lang}") == best_hits, 1).otherwise(0)
        for lang in langs
    )
    for lang in reversed(langs):
        pred = F.when(F.col(f"hits_{lang}") == best_hits, F.lit(lang)).otherwise(pred)
    pred = F.when((best_hits > 0) & (n_at_max == 1), pred).otherwise(F.lit("und"))
    return scored.select(
        "doc_id", pred.alias("pred_lang"), best_hits.cast("long").alias("n_hits")
    )


def fingerprint(docs: DataFrame, k: int = 4) -> DataFrame:
    """Document fingerprint → ``(doc_id, content_md5, sketch)``.

    content_md5 = md5 of the normalized text (lowercase, alnum+space);
    sketch = the k lexicographically-smallest shingle md5s joined with
    ',' — a winnowing-style k-min sketch whose equality ⇒ near-dup.
    """
    from graphminer_spark.textops.dedup import with_shingles

    norm = F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", ""))
    base = docs.select(
        "doc_id", F.md5(norm.cast("binary")).alias("content_md5")
    )
    sk = (
        with_shingles(docs)
        .select("doc_id", F.md5(F.col("shingle").cast("binary")).alias("h"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.slice(F.array_sort(F.collect_list("h")), 1, k), ","
            ).alias("sketch")
        )
    )
    return base.join(sk, "doc_id", "left").select(
        "doc_id", "content_md5", F.coalesce("sketch", F.lit("")).alias("sketch")
    )


def text_stats(docs: DataFrame) -> DataFrame:
    """Combined per-document text-analysis row — quality features +
    word-piece count + language ID + fingerprint in one result
    ``(doc_id, n_tokens, mean_token_len_bp, stopword_ratio_bp,
    alpha_ratio_bp, n_pieces, pred_lang, n_hits, content_md5, sketch)``.

    The per-doc expressions all fuse into scans of the documents table;
    the joins are on the unique doc_id key (Catalyst collapses the
    quality/token/langid branches into shared scans where possible).
    One row per document — the single-pass profile a training-data
    pipeline computes before filtering."""
    q = quality_score(docs)
    t = token_count(docs).select("doc_id", "n_pieces")
    lang = language_id(docs)
    fp = fingerprint(docs)
    return q.join(t, "doc_id").join(lang, "doc_id").join(fp, "doc_id")


def top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document characteristic terms: rank words by (tf desc,
    corpus-df asc, word asc) and keep the top ``k`` →
    ``(doc_id, word, tf, rank)``.

    The TF-IDF idea with an integer-only ranking (document frequency
    replaces the idf logarithm): floating-point log differs at the ulp
    between engines, while (tf, df, word) ordering is exact — and at
    100 TB it is also one shuffle cheaper (no per-term float math,
    same two aggregations)."""
    from pyspark.sql import Window

    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("word").asc()
    )
    return (
        tf.join(df_, "word")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "word", "tf", F.col("rank").cast("int").alias("rank"))
    )


def gopher_repetition(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al.
    2021, table A1), token-based: the signals that catch boilerplate /
    TV-schedule / keyword-stuffed pages before LM training.

    Output per document (integer basis points — hash-stable)::

        (doc_id, n_tokens,
         top2_bp,   # tokens covered by the single most frequent 2-gram
         top3_bp,   # ... most frequent 3-gram
         rep5_bp)   # tokens covered by ANY 5-gram repeated >=2 times
                    # within the doc (overlaps collapse)

    ``topN_bp = 10000 * N * max_count // n_tokens`` — the Gopher
    "fraction of characters in most common n-gram" re-based on tokens.
    ``rep5_bp`` is the "fraction in duplicated n-grams" analogue.

    Scale: one flatMap explode per n, gram counts partial-aggregate on
    (doc_id, md5-gram), rollups shuffle on doc_id only — per-document
    work is bounded by document length; nothing is corpus-quadratic.
    All JVM built-ins.
    """
    w = F.split(F.col("text"), " ")

    def positioned(n: int):
        idx = F.when(
            F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        gram = F.transform(
            idx,
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(
                    F.concat_ws(
                        " ", *[F.element_at(w, i + j) for j in range(n)]
                    ).cast("binary")
                ).alias("g"),
            ),
        )
        return docs.select(
            "doc_id", F.explode(gram).alias("pg")
        ).select("doc_id", F.col("pg.pos"), F.col("pg.g"))

    def top_cnt(n: int, out: str):
        # max within-doc multiplicity of any n-gram
        return (
            positioned(n)
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("cnt"))
            .groupBy("doc_id")
            .agg(F.max("cnt").alias(out))
        )

    g5 = positioned(5)
    rep5_keys = (
        g5.groupBy("doc_id", "g")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("doc_id", "g")
    )
    rep5 = (
        g5.join(rep5_keys, ["doc_id", "g"])
        .groupBy("doc_id")
        .agg(
            F.size(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(F.sequence(F.col("pos"), F.col("pos") + 4))
                    )
                )
            ).alias("rep5_tokens")
        )
    )

    base = docs.select("doc_id", F.size(w).alias("n_tokens"))
    out = (
        base.join(top_cnt(2, "top2_cnt"), "doc_id", "left")
        .join(top_cnt(3, "top3_cnt"), "doc_id", "left")
        .join(rep5, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (10000 * 2 * F.coalesce(F.col("top2_cnt"), F.lit(0)) / F.col("n_tokens"))
        .cast("long")
        .alias("top2_bp"),
        (10000 * 3 * F.coalesce(F.col("top3_cnt"), F.lit(0)) / F.col("n_tokens"))
        .cast("long")
        .alias("top3_bp"),
        (10000 * F.coalesce(F.col("rep5_tokens"), F.lit(0)) / F.col("n_tokens"))
        .cast("long")
        .alias("rep5_bp"),
    )
