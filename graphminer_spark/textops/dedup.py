"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

All hashing is MD5-based (standard algorithm, bit-identical in Spark
and DuckDB) so every operator has an exact SQL oracle; MinHash
"values" are MD5 hex strings compared lexicographically — a uniform
order-preserving stand-in for integer hashes that needs no custom UDF.

Scale notes
-----------
* Shingling/explode is a flatMap (no shuffle); the per-(doc, seed)
  minhash is one partial-aggregatable groupBy.
* LSH banding turns the O(N²) all-pairs problem into a self-join on
  (band, bucket) — the candidate join's cost follows bucket sizes, not
  N², which is the only strategy that survives 10^12 documents.
* Exact-Jaccard verification runs only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NGRAM = 3


def with_shingles(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """``(doc_id, shingle)`` — distinct word n-grams per document.

    Tokenization = split on single space (documents are normalized
    word streams); shingles built JVM-side with ``transform`` over an
    index ``sequence`` — no Python.
    """
    w = F.split(F.col("text"), " ")
    # guard short docs: sequence(1, 0) would auto-step DESCENDING in
    # Spark ([1,0]), and element_at(w, 0) throws under ANSI mode — a
    # <n-token document must simply produce no shingles (matching the
    # oracle's empty generate_series(1, 0))
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(n)]
        ),
    )
    return (
        docs.select("doc_id", F.explode(shingle).alias("shingle"))
        .distinct()
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: keep the min doc_id per distinct
    text → ``(keep_id, n_copies)``."""
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 16, n: int = NGRAM
) -> DataFrame:
    """``(doc_id, seed, mh)`` MinHash signature rows.

    mh(doc, s) = min over shingles of md5('s:' || shingle); the min of
    a uniform hash per seed — the classic permutation-free MinHash.
    """
    sh = with_shingles(docs, n)
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"),
        "shingle",
    )
    return (
        seeded.select(
            "doc_id",
            "seed",
            F.md5(
                F.concat_ws(":", F.col("seed").cast("string"), F.col("shingle"))
                .cast("binary")
            ).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )


def lsh_buckets(
    signatures: DataFrame, rows_per_band: int = 4
) -> DataFrame:
    """``(doc_id, band, bucket)`` — hash each band of the signature."""
    banded = signatures.withColumn(
        "band", (F.col("seed") / rows_per_band).cast("int")
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
        lambda x: x["mh"],
    )
    return (
        banded.groupBy("doc_id", "band")
        .agg(F.md5(F.array_join(ordered, ",").cast("binary")).alias("bucket"))
    )


def lsh_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any (band, bucket)."""
    l = buckets.select("band", "bucket", F.col("doc_id").alias("a"))
    r = buckets.select("band", "bucket", F.col("doc_id").alias("b"))
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = NGRAM,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold →
    ``(a, b, jaccard)``. With ``candidates`` given, verifies only those
    pairs (the LSH scale path); otherwise all-pairs via shingle
    self-join (small corpora only).

    Scale note: the candidate path intersects per PAIR — candidates ⋈
    a-side shingles, then an equi-join keyed on (b, shingle) — so a
    high-document-frequency shingle never becomes a quadratic hot join
    key (the inverted-index self-join below would square it); cost is
    Σ_candidates |shingles(a)|.
    """
    sh = with_shingles(docs, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    if candidates is not None:
        inter = (
            candidates.join(
                sh.select(F.col("doc_id").alias("a"), "shingle"), "a"
            )
            .join(
                sh.select(F.col("doc_id").alias("b"), "shingle"),
                ["b", "shingle"],
            )
        )
    else:
        inter = (
            sh.select(F.col("doc_id").alias("a"), "shingle")
            .join(sh.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
            .filter(F.col("a") < F.col("b"))
        )
    inter = inter.groupBy("a", "b").agg(F.count("*").alias("inter"))
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("inter")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # near-dup pair output is bounded by actual near-dups: materialize
    # eagerly so the shingle table releases NOW instead of relying on
    # ContextCleaner GC (same lifecycle as subgraph.count_matches)
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Near-dup pairs via MinHash→LSH→exact-Jaccard verify →
    ``(a, b, jaccard)``."""
    sig = minhash_signatures(docs, num_hashes)
    cand = lsh_candidate_pairs(lsh_buckets(sig, rows_per_band))
    return jaccard_pairs(docs, threshold, candidates=cand)


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per document → ``(doc_id, simhash)``.

    Per-token md5 → first 16 hex chars → 64-bit int; per-bit majority
    vote over tokens, weighted by term frequency. Pure JVM expressions
    (conv + bit ops over an exploded token stream).
    """
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    hashed = tokens.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),  # 60 bits to stay clear of sign issues
    )
    bit_cols = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(60)
    ]
    votes = hashed.groupBy("doc_id").agg(*bit_cols)
    sim = None
    for b in range(60):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 8, n_blocks: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``,
    candidates blocked on ``n_blocks`` disjoint sub-keys of the 60-bit
    hash, then verified with ``bit_count``.

    RECALL BOUND (pigeonhole): a pair is guaranteed to share ≥1 exact
    block only when its Hamming distance < ``n_blocks``; beyond that
    the blocking is a heuristic candidate generator and recall is
    deliberately incomplete (the standard SimHash-dedup trade-off —
    raise ``n_blocks`` for a stronger guarantee at higher join cost:
    guaranteed radius = n_blocks − 1). The semantics of this operator
    are therefore "blocked near-dup detection", and its oracle
    replicates the same blocking by design.
    """
    width = 60 // n_blocks
    sh = simhash64(docs).persist()
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), width * i)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.blk"), F.col("bk.key"))
    l = blocks.select("blk", "key", F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    r = blocks.select("blk", "key", F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    cand = (
        l.join(r, ["blk", "key"]).filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    out = (
        cand.select(
            "a",
            "b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        # bounded near-dup output: eager-materialize, release simhash
        # table now (same lifecycle as subgraph.count_matches)
        .localCheckpoint(eager=True)
    )
    sh.unpersist()
    return out


def dup_ngram_spans(docs: DataFrame, n: int = 8) -> DataFrame:
    """Per-document duplicated-span statistics over word ``n``-grams —
    the substring-level dedup signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), re-expressed as three
    relational passes (the reference's pattern-support counting style,
    cf. ``/root/reference/src/fsm/omp_base.cc`` support domains, applied
    to token spans instead of embeddings).

    A positioned n-gram (every start offset kept — multiplicity and
    position matter here, unlike :func:`with_shingles`) is *duplicated*
    when its gram text occurs in >= 2 **distinct** documents.  Output,
    one row per input document::

        (doc_id, n_grams, dup_grams, dup_tokens)

    * ``n_grams``   — total n-gram start positions (0 for <n-token docs)
    * ``dup_grams`` — positions whose gram is cross-document duplicated
    * ``dup_tokens``— distinct token positions covered by >= 1
      duplicated gram (the "fraction of corpus in duplicated spans"
      numerator; span overlaps collapse)

    Scale: tokenize + positioned explode is a flatMap; gram
    document-frequency is one partial-aggregatable groupBy on a
    fixed-width md5 key (never the raw gram string — shuffle rows stay
    48 bytes at any n); the dup-mark is an equi-join on that key; the
    per-document rollup shuffles on doc_id.  Coverage is computed
    per-document from the array of duplicated starts (``flatten`` +
    ``array_distinct`` over bounded doc length) — no per-token rows
    ever shuffle.  All JVM built-ins; no Python in the plan.
    """
    w = F.split(F.col("text"), " ")
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
    grams = docs.select(
        "doc_id", F.explode(gram).alias("pg")
    ).select("doc_id", F.col("pg.pos"), F.col("pg.g"))

    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    marked = grams.join(dup.withColumn("is_dup", F.lit(True)), "g", "left")

    agg = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("dup_grams"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.when(
                            F.col("is_dup"),
                            F.sequence(
                                F.col("pos"), F.col("pos") + (n - 1)
                            ),
                        )
                    )
                )
            )
        ).alias("dup_tokens"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("dup_grams"), F.lit(0)).alias("dup_grams"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
        )
    )


def contamination(
    docs: DataFrame, eval_docs: DataFrame, n: int = NGRAM
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appx. C / PaLM style): for
    every training document, count its distinct word ``n``-grams that
    also occur anywhere in the evaluation set → ``(doc_id, n_grams,
    hit_grams)``; ``hit_grams > 0`` marks a doc for removal.

    Scale: the eval side is benchmark-sized (thousands of docs), so
    its distinct-gram table is **broadcast** — the 100 TB train side
    never shuffles; each scan partition probes the in-memory gram set
    map-side and pre-aggregates per doc. Grams travel as md5 keys
    (fixed width) exactly like :func:`dup_ngram_spans`.
    """
    train = with_shingles(docs, n).select(
        "doc_id", F.md5(F.col("shingle").cast("binary")).alias("g")
    )
    eval_g = (
        with_shingles(eval_docs, n)
        .select(F.md5(F.col("shingle").cast("binary")).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = train.join(F.broadcast(eval_g), "g", "left").groupBy(
        "doc_id"
    ).agg(
        F.count("*").alias("n_grams"),
        F.coalesce(F.sum("hit"), F.lit(0)).alias("hit_grams"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("hit_grams"), F.lit(0)).alias("hit_grams"),
        )
    )
