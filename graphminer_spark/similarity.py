"""Similarity search over embedding columns (``array<float>``).

* ``knn_bruteforce`` — exact top-k cosine neighbors via a replicated
  (broadcast) query side against the corpus: the baseline. Dot/norm
  are sequential left-folds (``F.aggregate`` over ``zip_with``) in
  float64 — bit-compatible with DuckDB's ``list_dot_product`` for the
  oracle.
* ``lsh_ann`` — the scale path: random-hyperplane LSH with
  deterministic integer-arithmetic planes (no RNG state), bucket join,
  exact re-rank inside buckets. At 10^12 rows brute force is O(N·Q);
  LSH buckets cut the candidate set per query to its bucket.
* ``embedding_neardup`` — near-duplicate pairs by cosine ≥ τ over LSH
  buckets (the embedding-cosine dedup operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 12


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors → ``(query_id, neighbor_id, rank,
    sim_s)``.

    ``queries(query_id, qvec)`` is broadcast (small side); ranking key
    is (cosine rounded to 6dp DESC, neighbor_id ASC) so ordering is
    engine-exact. Self-matches excluded.
    """
    joined = embeddings.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(cosine(F.col("qvec"), F.col("embedding")), 6)
    scored = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.format_string("%.6f", F.col("sim")).alias("sim_s"),
        )
    )


def _plane(p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from integer mixing —
    reproducible anywhere, including in SQL oracles."""
    return [
        ((((p + 1) * 1315423911) ^ ((j + 1) * 2654435761)) % 2001) / 1000.0 - 1.0
        for j in range(dim)
    ]


def lsh_sign_buckets(
    embeddings: DataFrame, dim: int, n_planes: int = N_PLANES
) -> DataFrame:
    """``(vec_id, bucket)`` — bucket = integer of sign bits of the
    vector's dot products with ``n_planes`` fixed hyperplanes."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(p, dim)])
        bit = F.when(_dot(F.col("embedding"), plane) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit
    return embeddings.select("vec_id", bucket.cast("long").alias("bucket"))


def lsh_ann(
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k neighbors *within each LSH bucket* →
    ``(query_id, neighbor_id, rank, sim_s)``. Recall < 1 by design;
    the exact re-rank inside buckets keeps precision exact."""
    b = lsh_sign_buckets(embeddings, dim, n_planes)
    tagged = embeddings.join(b, "vec_id")
    l = tagged.select(
        "bucket", F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    r = tagged.select(
        "bucket", F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    pairs = l.join(r, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(cosine(F.col("qvec"), F.col("embedding")), 6)
    scored = pairs.select("query_id", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.format_string("%.6f", F.col("sim")).alias("sim_s"),
        )
    )


IVF_SCALE = 10_000  # fixed-point quantization for exact k-means


def _quantize(col: Column, scale: int = IVF_SCALE) -> Column:
    """float embedding → fixed-point ``array<long>`` (HALF_UP round —
    DuckDB's ``round`` matches Spark's)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * scale).cast("long")
    )


def _l2sq_int(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance between quantized vectors —
    order-independent arithmetic, so Spark and DuckDB agree bitwise
    (every partial sum < 2^53; the oracle computes the same value as
    ``dot(a,a) - 2 dot(a,b) + dot(b,b)`` in doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    scale: int = IVF_SCALE,
) -> DataFrame:
    """Lloyd's k-means over FIXED-POINT vectors → ``(cid, cv)`` integer
    centroid table.

    Deterministic and engine-exact by construction: init = the first
    ``n_centroids`` quantized vectors; assignment = integer squared-L2
    argmin (ties → smaller cid); update = ``floor(sum/count)`` per
    dimension (empty cell keeps its previous centroid). Every step is
    exact integer / IEEE-double arithmetic with no order dependence,
    so the DuckDB oracle unrolls the same iterations bit-for-bit. Each
    round is the PR superstep shape: one broadcast join (assignment) +
    one groupBy (update) over a posexploded frame — at 10^12 vectors
    the assignment is a map-side pass and the update shuffles only
    (n_centroids × dim) partial sums per partition."""
    q = embeddings.select(
        "vec_id", _quantize(F.col("embedding"), scale).alias("qv")
    ).persist()
    cents = q.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("qv").alias("cv")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        assign = (
            q.crossJoin(F.broadcast(cents))
            .select(
                "vec_id", "qv", "cid",
                _l2sq_int(F.col("qv"), F.col("cv")).alias("d"),
            )
            .withColumn(
                "r",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy("d", "cid")
                ),
            )
            .filter(F.col("r") == 1)
        )
        sums = (
            assign.select("cid", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .withColumn("m", F.floor(F.col("s") / F.col("c")))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cid", F.transform("pm", lambda x: x["m"]).alias("nv")
            )
        )
        cents = (
            cents.join(sums, "cid", "left")
            .select("cid", F.coalesce("nv", "cv").alias("cv"))
            .localCheckpoint(eager=True)  # n_centroids rows
        )
    q.unpersist()
    return cents


def ivf_ann(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k neighbors →
    ``(query_id, neighbor_id, rank, sim_s)``.

    The second ANN strategy next to ``lsh_ann`` (the reference-style
    ≥2-kernels-per-workload discipline): an inverted-file index —
    every vector is assigned to its nearest coarse cell, queries probe
    their ``n_probe`` nearest cells and re-rank exactly within them.
    Unlike sign-LSH, cell fan-out is explicit (``n_probe``) and the
    inverted lists shard naturally across executors, which is the
    10^12-vector layout (one shuffle by cell id, cells ≈ balanced).

    The coarse quantizer is a TRAINED deterministic k-means
    (:func:`train_ivf_centroids`; ``train_iters=0`` falls back to the
    first-``n_centroids`` init) over fixed-point vectors, so the
    DuckDB oracle replicates cells exactly while recall reflects real
    Lloyd's iterations, not an arbitrary slice of the corpus."""
    q = embeddings.select(
        "vec_id", _quantize(F.col("embedding")).alias("qv")
    )
    cents = train_ivf_centroids(
        embeddings, n_centroids=n_centroids, iters=train_iters
    )
    ranked = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "cid", _l2sq_int(F.col("qv"), F.col("cv")).alias("d")
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("d", "cid")
            ),
        )
    )
    assign = ranked.filter(F.col("r") == 1).select("vec_id", "cid")
    probes = ranked.filter(F.col("r") <= n_probe).select(
        F.col("vec_id").alias("query_id"), "cid"
    )
    # each vector lives in exactly one cell → no dedup needed
    cand = probes.join(
        assign.select(F.col("vec_id").alias("neighbor_id"), "cid"), "cid"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    q = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    n = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nvec")
    )
    scored = (
        cand.join(q, "query_id")
        .join(n, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.format_string("%.6f", F.col("sim")).alias("sim_s"),
        )
    )


def embedding_neardup(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) via LSH buckets
    → ``(a, b, sim_s)``."""
    b = lsh_sign_buckets(embeddings, dim, n_planes)
    tagged = embeddings.join(b, "vec_id")
    l = tagged.select("bucket", F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    r = tagged.select("bucket", F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    sim = F.round(cosine(F.col("ea"), F.col("eb")), 6)
    return (
        l.join(r, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("a", "b", F.format_string("%.6f", F.col("sim")).alias("sim_s"))
        .distinct()
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    tau: float = 0.95,
    train_iters: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540) → one row per vector ``(vec_id, cid, keep)``.

    Pipeline: (1) cluster with the deterministic fixed-point Lloyd's
    k-means (:func:`train_ivf_centroids` — the SQL oracle replays it
    bit-for-bit); (2) within each cluster, rank members by distance to
    their centroid (closest first, ties by id) — the NeMo-Curator
    greedy order; (3) a member is DROPPED (``keep=0``) when its cosine
    similarity to any earlier-ranked member of the same cluster is
    ≥ ``tau``, so exactly one representative of every near-duplicate
    chain survives and it is the most central one.

    Scale shape: the only quadratic step is the within-cluster pair
    join, O(Σ n_c²); at 10^12 vectors ``n_clusters`` is chosen so
    clusters stay bounded (SemDeDup's premise — near-dups co-cluster,
    so the threshold never needs cross-cluster pairs). The pair join
    shuffles by ``cid`` only; everything else is the broadcast-join +
    groupBy k-means superstep machinery shared with :func:`ivf_ann`.
    """
    cents = train_ivf_centroids(
        embeddings, n_centroids=n_clusters, iters=train_iters
    )
    q = embeddings.select(
        "vec_id", _quantize(F.col("embedding")).alias("qv")
    )
    assign = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "cid", _l2sq_int(F.col("qv"), F.col("cv")).alias("d")
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("d", "cid")
            ),
        )
        .filter(F.col("r") == 1)
        .select("vec_id", "cid", "d")
    )
    ordr = assign.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("cid").orderBy("d", "vec_id")),
    )
    e = embeddings.select("vec_id", "embedding")
    a = (
        ordr.join(e, "vec_id")
        .select(
            "cid",
            F.col("rnk").alias("rnk_a"),
            F.col("embedding").alias("ea"),
        )
    )
    b = (
        ordr.join(e, "vec_id")
        .select(
            "cid",
            F.col("vec_id").alias("vb"),
            F.col("rnk").alias("rnk_b"),
            F.col("embedding").alias("eb"),
        )
    )
    msim = (
        a.join(b, "cid")
        .filter(F.col("rnk_a") < F.col("rnk_b"))
        .select(
            F.col("vb").alias("vec_id"),
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("sim"),
        )
        .groupBy("vec_id")
        .agg(F.max("sim").alias("msim"))
    )
    return (
        ordr.join(msim, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cid").cast("int").alias("cid"),
            F.when(F.col("msim") >= tau, F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("keep"),
        )
    )
