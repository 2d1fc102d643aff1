"""Dedup / similarity / text-analysis operators vs pure-python oracles."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphminer_spark.similarity import knn_bruteforce
from graphminer_spark.textops.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_dedup,
    simhash64,
    with_shingles,
)
from graphminer_spark.textops.quality import (
    language_id,
    quality_score,
    token_count,
)

VOCAB = "alpha beta gamma delta epsilon zeta eta theta".split()


def _mk_docs(spark, n=40, seed=4, dup_every=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % dup_every == dup_every - 1 and rows:
            base = rows[rng.randrange(len(rows))][1]
            # near-dup: mutate one word
            words = base.split(" ")
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
            rows.append((i, " ".join(words)))
        else:
            rows.append(
                (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(8, 20))))
            )
    # one exact duplicate
    rows.append((n, rows[0][1]))
    return spark.createDataFrame(rows, "doc_id long, text string"), dict(rows)


def _shingles(text, n=3):
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_exact_dedup(spark):
    docs, raw = _mk_docs(spark)
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    # doc 0 text duplicated by the appended row
    assert out[0] == 2
    assert sum(out.values()) == len(raw)


def test_shingles_match_python(spark):
    docs, raw = _mk_docs(spark, n=15)
    got = {}
    for r in with_shingles(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for d, t in raw.items():
        assert got.get(d, set()) == _shingles(t), d


def test_jaccard_pairs_vs_bruteforce(spark):
    docs, raw = _mk_docs(spark)
    thr = 0.4
    expect = {}
    for a in raw:
        for b in raw:
            if a < b:
                sa, sb = _shingles(raw[a]), _shingles(raw[b])
                inter = len(sa & sb)
                if inter:
                    j = inter / (len(sa) + len(sb) - inter)
                    if j >= thr:
                        expect[(a, b)] = j
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(docs, thr).collect()
    }
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-12


def test_minhash_lsh_finds_exact_dups(spark):
    docs, raw = _mk_docs(spark)
    pairs = {
        (r["a"], r["b"]) for r in minhash_lsh_dedup(docs, threshold=0.9).collect()
    }
    assert (0, len(raw) - 1) in pairs  # the planted exact duplicate


def test_simhash_properties(spark):
    docs, raw = _mk_docs(spark)
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    n = len(raw) - 1
    assert sh[0] == sh[n]  # identical text → identical simhash
    assert all(0 <= v < (1 << 60) for v in sh.values())
    # deterministic across recomputation
    sh2 = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sh == sh2


def test_token_count_and_quality(spark):
    docs, raw = _mk_docs(spark, n=10)
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    for d, t in raw.items():
        assert tc[d] == len(t.split(" "))
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    for d, t in raw.items():
        toks = t.split(" ")
        assert q[d]["mean_token_len_bp"] == 10000 * (
            len(t) - (len(toks) - 1)
        ) // len(toks)
        assert q[d]["alpha_ratio_bp"] == 10000 * sum(
            c.isalpha() for c in t
        ) // len(t)


def test_language_id(spark):
    rows = [
        (1, "the cat and the dog is a pet"),
        (2, "der hund und die katze ist das tier"),
        (3, "le chat et la vache est les animaux"),
        (4, "xyzzy plugh quux"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_knn_vs_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {}
    for r in knn_bruteforce(df, q, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    v64 = vecs.astype(np.float64)
    sims = (v64 @ v64.T) / (
        np.linalg.norm(v64, axis=1)[:, None] * np.linalg.norm(v64, axis=1)[None, :]
    )
    for qi in range(5):
        order = sorted(
            ((round(sims[qi, j], 6), -j) for j in range(30) if j != qi),
            reverse=True,
        )[:3]
        expect = [(-negj) for _, negj in order]
        assert [n for _, n in sorted(got[qi])] == expect, qi


def test_shingles_short_docs_no_crash(spark):
    """Docs with < n tokens must yield zero shingles, not an ANSI
    INVALID_ARRAY_INDEX crash from a descending sequence(1, 0)."""
    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "one"),
            (2, "one two"),
            (3, "one two three"),
            (4, "one two three four"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["shingle"]) for r in with_shingles(docs).collect()
    }
    assert got == {
        (3, "one two three"),
        (4, "one two three"),
        (4, "two three four"),
    }
    # every shingle consumer must survive a short-doc corpus
    assert exact_dedup(docs).count() == 5
    assert jaccard_pairs(docs, threshold=0.1).count() == 1  # docs 3,4
    assert minhash_lsh_dedup(docs, threshold=0.1).count() <= 1


def test_top_terms_ranking(spark):
    from graphminer_spark.textops.quality import top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana cherry"),
            (2, "banana banana cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["word"], r["tf"])
        for r in top_terms(docs, k=2).collect()
    }
    # doc 1: apple tf=2; then banana vs cherry tf=1 each — banana and
    # cherry both df=2, tie broken by word asc → banana
    assert got[(1, 1)] == ("apple", 2)
    assert got[(1, 2)] == ("banana", 1)
    # doc 2: banana/cherry tf=2 (both df=2) → banana first by word
    assert got[(2, 1)] == ("banana", 2)
    assert got[(2, 2)] == ("cherry", 2)


def test_dup_ngram_spans_hand_computed(spark):
    from graphminer_spark.textops.dedup import dup_ngram_spans

    # n=3 grams. docs 1 and 2 share "a b c" and "b c d" (overlapping
    # starts 1,2 in both); doc 3 repeats "x y z" twice WITHIN itself
    # only (cross-doc df=1 → never duplicated); doc 4 is too short.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "q a b c d"),
            (3, "x y z x y z"),
            (4, "a b"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"], r["dup_tokens"])
        for r in dup_ngram_spans(docs, n=3).collect()
    }
    # doc 1: grams (a b c)(b c d)(c d e); first two dup; coverage =
    # tokens 1..4 of 5
    assert got[1] == (3, 2, 4)
    # doc 2: grams (q a b)(a b c)(b c d); dup at starts 2,3 → tokens 2..5
    assert got[2] == (3, 2, 4)
    # doc 3: 4 grams, within-doc repetition only → no cross-doc dup
    assert got[3] == (4, 0, 0)
    # doc 4: shorter than n → zero row still present
    assert got[4] == (0, 0, 0)


def test_gopher_repetition_hand_computed(spark):
    from graphminer_spark.textops.quality import gopher_repetition

    docs = spark.createDataFrame(
        [
            # 10 tokens; "a b" occurs 3x (top2), "a b c" 2x (top3),
            # 5-gram "a b c a b" occurs at starts 1 and 4 → repeated,
            # coverage tokens 1..8 = 8
            (1, "a b c a b c a b x y"),
            # no repetition at all: every n-gram unique (8 tokens)
            (2, "p q r s t u v w"),
            # shorter than 5 → rep5=0; top2 "m n" 1x of 3 tokens
            (3, "m n o"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["top2_bp"], r["top3_bp"], r["rep5_bp"])
        for r in gopher_repetition(docs).collect()
    }
    # doc 1: top2 = 10000*2*3//10 = 6000; top3: "a b c" 2x → 10000*3*2//10
    # = 6000; rep5: "a b c a b"@1,4 and "b c a b c"@2,5 and "c a b c a"@3
    # unique... wait "c a b c a" occurs once (start 3); starts 1..6:
    #   1:"a b c a b" 4:"a b c a b" dup; 2:"b c a b c" 5:"b c a b x" no;
    #   3:"c a b c a" 6:"c a b x y" no → dup starts {1,4} cover 1..8 = 8
    assert got[1] == (10, 6000, 6000, 8000)
    assert got[2] == (8, 2500, 3750, 0)
    assert got[3] == (3, 6666, 10000, 0)


def test_contamination_hand_computed_and_broadcast(spark):
    from graphminer_spark.textops.dedup import contamination

    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, "z z z z"), (3, "a b")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, "x a b c y")], "doc_id long, text string")
    out = contamination(train, ev, n=3)
    got = {r["doc_id"]: (r["n_grams"], r["hit_grams"]) for r in out.collect()}
    # train doc 1 grams: (a b c)(b c d)(c d e); eval has (x a b)(a b c)
    # (b c y) → one hit. doc 2: (z z z) ×2 distinct→1 gram, 0 hits.
    # doc 3: too short → zero row kept.
    assert got == {1: (3, 1), 2: (1, 0), 3: (0, 0)}
    # eval side must broadcast — the train side never shuffles on gram
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_hand_computed(spark):
    from graphminer_spark.textops.pii import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.ex.org or 555-0199 from 192.168.0.12 end"),
            (2, "no pii here at all"),
            (3, "two mails x@y.com z@w.net and ip 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ips"])
        for r in pii_scrub(docs).collect()
    }
    assert got == {1: (1, 1, 1), 2: (0, 0, 0), 3: (2, 0, 1)}
    # scrubbed text itself
    from graphminer_spark.textops.pii import scrub_expr
    from pyspark.sql import functions as F

    out = docs.filter("doc_id = 1").select(
        scrub_expr(F.col("text")).alias("t")
    ).collect()[0]["t"]
    assert out == "mail <EMAIL> or <PHONE> from <IP> end"
