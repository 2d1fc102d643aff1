"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

The trainer a pretraining pipeline runs over its corpus before
tokenizing it: collapse the corpus to a word-frequency table, then
repeatedly (a) count adjacent symbol pairs weighted by word frequency,
(b) merge the most frequent pair. Everything data-sized stays
distributed; only the single winning pair per merge reaches the driver
(a 1-row collect, the same scalar-action shape as the FSM minsup
resolution).

Scale shape (100 TB corpus):

* word-frequency table: one ``split``+``explode``+``groupBy(word)`` —
  the heavy shuffle, done ONCE; its size is the *vocabulary*, orders
  of magnitude smaller than the corpus (Heaps' law), so every merge
  iteration runs over the small table.
* per-merge pair counts: explode each distinct word's adjacent symbol
  pairs weighted by ``freq`` — one map + one partial-aggregatable
  groupBy per merge; no re-scan of the corpus, ever.
* applying a merge: a JVM-side ``aggregate`` fold over the word's
  symbol array (leftmost non-overlapping, exactly the sequential BPE
  semantics) — no Python, no shuffle (map-only on the word table).

Determinism: ties on pair count break lexicographically on
``(a, b)``, so the merge sequence is a pure function of the corpus at
any parallelism.

Oracle split: level-0 pair statistics (``bpe_pair_counts`` before any
merge) are plain SQL — the ``docs_bpe_pairs`` gate row replays them in
DuckDB via ``unnest(range(...))`` substring pairs. The merge LOOP's
array-fold state is not reasonably SQL-expressible (the driver
contract's carve-out); ``tests/`` verifies ``train_bpe`` against an
independent pure-Python reference trainer instead.

Reference analogue: GraphMiner has no text kernels; this extends the
LLM-pipeline family (``SURVEY.md §2.6``) with the trainer that sits
between dedup/quality filtering and sequence packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# end-of-word marker so merges never cross word boundaries once words
# are re-joined; single char keeps substring arithmetic simple
EOW = "▁"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` over whitespace-split words (empty tokens
    dropped). The one corpus-sized shuffle of the trainer."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _init_syms(word_col):
    """Split a word into 1-char symbols + the end-of-word marker."""
    chars = F.expr(
        f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1))"
    )
    return F.concat(chars, F.array(F.lit(EOW)))


def pair_counts(seg: DataFrame) -> DataFrame:
    """``(a, b, cnt)`` — adjacent symbol pairs over a segmented word
    table ``(word, freq, syms)``, weighted by word frequency."""
    pairs = F.expr(
        "transform(sequence(0, size(syms) - 2), "
        "i -> struct(syms[i] AS a, syms[i + 1] AS b))"
    )
    return (
        seg.select(F.col("freq"), F.explode(pairs).alias("pr"))
        .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(syms_col, a: str, b: str):
    """Fold replacing leftmost non-overlapping (a, b) with a+b —
    the exact sequential BPE merge semantics, pure JVM expressions."""
    merged = a + b
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges → ``(merges, segmented_words)``.

    ``merges`` is the ordered list of ``(a, b)`` pairs;
    ``segmented_words`` is the final ``(word, freq, syms)`` table
    (the tokenizer's application side: joining it back onto the corpus
    by word tokenizes every document with zero re-computation).

    Stops early when no pair occurs more than once (merging singleton
    pairs buys nothing and the tie-cascade is noise). Each iteration
    persists the segmented table, counts pairs, collects ONE row, and
    rewrites the segment arrays map-only.
    """
    seg = (
        word_freqs(docs, text_col)
        .select("word", "freq", _init_syms("word").alias("syms"))
        .persist()
    )
    seg.count()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(seg)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        new_seg = seg.select(
            "word", "freq", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).persist()
        new_seg.count()
        seg.unpersist()
        seg = new_seg
    return merges, seg


def bpe_token_stats(seg: DataFrame) -> DataFrame:
    """``(vocab_size, corpus_tokens)`` after training — the two
    numbers a tokenizer budget decision reads."""
    return seg.select(
        F.explode("syms").alias("tok"), F.col("freq")
    ).agg(
        F.countDistinct("tok").cast("long").alias("vocab_size"),
        F.sum("freq").cast("long").alias("corpus_tokens"),
    )


def bpe_pairs_topn(docs: DataFrame, n: int = 30, text_col: str = "text") -> DataFrame:
    """Level-0 pair statistics (before any merge): the top-``n``
    adjacent character pairs weighted by word frequency, ordered by
    ``(cnt DESC, a, b)`` — a total order, so the top-n is
    deterministic. This is merge iteration 1's input, the
    SQL-expressible face of the trainer (gate row
    ``docs_bpe_pairs``)."""
    seg = word_freqs(docs, text_col).select(
        "word", "freq", _init_syms("word").alias("syms")
    )
    return (
        pair_counts(seg)
        .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
        .limit(n)
    )


def bpe_pairs_sql(n: int = 30) -> str:
    """DuckDB statement mirroring :func:`bpe_pairs_topn` over the
    ``documents`` view: adjacent symbol pairs via
    ``unnest(range(1, len+1))`` substrings over words + the
    end-of-word marker."""
    return f"""
WITH words AS (
  SELECT word, count(*)::BIGINT AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
  GROUP BY word
),
marked AS (SELECT word || '{EOW}' AS w, freq FROM words),
pos AS (
  SELECT w, freq, unnest(range(1, length(w))) AS i FROM marked
),
pairs AS (
  SELECT substr(w, i::INT, 1) AS a, substr(w, (i + 1)::INT, 1) AS b, freq
  FROM pos
)
SELECT a, b, sum(freq)::BIGINT AS cnt FROM pairs GROUP BY a, b
ORDER BY cnt DESC, a, b LIMIT {n}
""".strip()


def bpe_encode(
    docs: DataFrame,
    seg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a trained segmentation →
    ``(doc_id, tokens array<string>, n_tokens)``.

    The application side of :func:`train_bpe`: explode each doc's
    words WITH POSITION, hash-join the vocabulary-sized ``seg`` table
    (broadcast-sized at any realistic vocabulary — Heaps' law), and
    re-assemble the per-word symbol arrays in word order with a
    flatten over ``sort_array`` structs. No merge is ever re-applied
    per document — the corpus pays one join, not O(n_merges) passes.
    Out-of-vocabulary words (tokenizing a corpus the trainer never
    saw) fall back to character symbols + the end-of-word marker,
    exactly the untrained segmentation.
    """
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    joined = words.join(
        F.broadcast(seg.select("word", "syms")), "word", "left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("syms"), _init_syms("word")).alias("syms"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "syms"))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
        .select(
            id_col,
            "tokens",
            F.size("tokens").cast("long").alias("n_tokens"),
        )
    )
