"""Motif and named-pattern counting via formula-based rewrites.

The reference counts small patterns two ways: enumeration kernels
(``src/sgl/cpu_kernels/*.h``, ``src/motif/cpu_kernels/automine_base.h``)
and the *formula* variant (``src/motif/omp_formula.cc:8-51``) that
enumerates only triangles and derives the rest algebraically from
degrees and per-edge triangle counts. The formula path is the right
one for Spark — cheap global aggregates instead of quartic joins —
so it's the default here; the 4-cycle still needs the wedge-endpoint
join (no degree-local formula exists).

Semantics: **edge-induced** (subgraph containment) counts, matching
the SgL/count golden tables (``src/sgl/README.md:51-63``; the
induced-vs-non-induced distinction is called out in SURVEY §2.5);
``motif3_counts`` additionally returns the vertex-induced wedge count
used by the motif suite (``src/motif/README.md``).

All outputs are single-row DataFrames with named long columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphminer_spark.algorithms.triangles import (
    enumerate_triangles,
    per_edge_triangles,
    triangle_count,
)
from graphminer_spark.graph.build import build_dag, degrees, symmetrize


def _c2(col):
    """C(n,2) exact on longs: n(n-1) is even, so a right-shift divides
    exactly — no double arithmetic (exact past 2^53, safe to n ≈ 3e9)."""
    return F.shiftright(col * (col - 1), 1)


def _c3(col):
    """C(n,3) exact via decimal(38,0): the three-way product overflows
    long at n ≈ 2.6e6 (real web-hub degrees), so multiply in decimal
    and divide by 6 (always exact — the product is divisible by 6)."""
    d = col.cast("decimal(38,0)")
    return ((d * (col - 1) * (col - 2)) / 6).cast("decimal(38,0)")


def wedge_count(deg: DataFrame) -> DataFrame:
    """Paths of length 2 (edge-induced) = Σ_v C(deg(v), 2)."""
    return deg.select(_c2(F.col("deg")).alias("w")).agg(
        F.sum("w").alias("n_wedges")
    )


def motif3_counts(canonical_edges: DataFrame, dag: DataFrame) -> DataFrame:
    """3-vertex motifs → ``(n_triangles, n_wedges, n_wedges_induced)``.

    Vertex-induced wedges = wedges − 3·triangles (each triangle
    contains 3 non-induced wedges) — the formula correction of
    ``omp_formula.cc:39-48`` in miniature.
    """
    deg = degrees(symmetrize(canonical_edges, dedup=False))
    tri = triangle_count(dag).collect()[0]["n_triangles"]
    return (
        wedge_count(deg)
        .select(
            F.lit(int(tri)).alias("n_triangles"),
            F.col("n_wedges"),
            (F.col("n_wedges") - 3 * int(tri)).alias("n_wedges_induced"),
        )
    )


def star3_count(deg: DataFrame) -> DataFrame:
    """3-stars (claws, edge-induced) = Σ_v C(deg(v), 3).

    Per-vertex terms and the sum run in decimal(38,0) (golden counts
    reach 2.4e18, ``src/count/README.md:51``); the output column is
    cast to long for the test-scale contract."""
    return deg.agg(
        F.sum(_c3(F.col("deg"))).cast("long").alias("n_3stars")
    )


def diamond_count(
    canonical_edges: DataFrame,
    dag: DataFrame,
    pe: DataFrame | None = None,
) -> DataFrame:
    """Diamonds (K4 minus an edge, edge-induced) = Σ_e C(tri(e), 2):
    pairs of triangles sharing edge e (e = the diamond's central edge)."""
    if pe is None:
        pe = per_edge_triangles(canonical_edges, dag, include_zero=False)
    return pe.agg(
        F.coalesce(F.sum(_c2(F.col("tri_cnt"))), F.lit(0).cast("long")).alias(
            "n_diamonds"
        )
    )


def tailed_triangle_count(
    canonical_edges: DataFrame,
    dag: DataFrame,
    pe: DataFrame | None = None,
) -> DataFrame:
    """Tailed triangles (edge-induced) = Σ_T Σ_{v∈T} (deg(v) − 2).

    Computed from per-edge triangle counts without re-enumerating
    triangles: t_v = ½ Σ_{e∋v} t_e (each triangle at v has two edges
    at v), so the total is ½ Σ_e t_e·(deg(u) + deg(v) − 4) — exactly
    even, shift-divided. Passing ``pe`` (from ``per_edge_triangles(...,
    include_zero=False)``) lets ``pattern_counts``/``motif4_counts``
    share ONE triangle enumeration across diamond + tailed counts.
    """
    deg = degrees(symmetrize(canonical_edges, dedup=False))
    if pe is None:
        pe = per_edge_triangles(canonical_edges, dag, include_zero=False)
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv"))
    term = F.col("tri_cnt") * (F.col("du") + F.col("dv") - 4)
    return (
        pe.join(du, "src")
        .join(dv, "dst")
        .agg(
            F.coalesce(
                F.shiftright(F.sum(term), 1), F.lit(0).cast("long")
            ).alias("n_tailed_triangles")
        )
    )


def path4_count(
    canonical_edges: DataFrame,
    dag: DataFrame,
    pe: DataFrame | None = None,
) -> DataFrame:
    """4-paths P4 (edge-induced) = Σ_{(u,v)∈E} (deg(u)−1)(deg(v)−1)
    − 3·triangles. With ``pe`` given, the triangle total comes from
    Σ t_e / 3 instead of a fresh enumeration."""
    deg = degrees(symmetrize(canonical_edges, dedup=False))
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv"))
    if pe is not None:
        tri = pe.agg(F.coalesce(F.sum("tri_cnt"), F.lit(0))).collect()[0][0] // 3
    else:
        tri = triangle_count(dag).collect()[0]["n_triangles"]
    return (
        canonical_edges.join(du, "src")
        .join(dv, "dst")
        .agg(
            (
                F.sum((F.col("du") - 1) * (F.col("dv") - 1)) - 3 * int(tri)
            ).alias("n_4paths")
        )
    )


def pattern_counts(canonical_edges: DataFrame, dag: DataFrame) -> DataFrame:
    """All named-pattern counts in one row — the engine's answer to the
    reference's per-pattern golden tables."""
    deg = degrees(symmetrize(canonical_edges, dedup=False))
    # ONE triangle enumeration feeds the total, diamond and tailed
    # counts (t_e table persisted across the three aggregates)
    pe = per_edge_triangles(canonical_edges, dag, include_zero=False).persist()
    out = (
        wedge_count(deg)
        .crossJoin(star3_count(deg))
        .crossJoin(
            pe.agg(F.coalesce(F.sum("tri_cnt"), F.lit(0)).alias("_t3"))
            .select(F.expr("_t3 div 3").alias("n_triangles"))  # Σ t_e = 3T
        )
        .crossJoin(diamond_count(canonical_edges, dag, pe))
        .crossJoin(tailed_triangle_count(canonical_edges, dag, pe))
        .crossJoin(path4_count(canonical_edges, dag, pe))
        .crossJoin(rectangle_count(canonical_edges, dag))
    )
    out = out.select(
        "n_wedges",
        "n_3stars",
        "n_triangles",
        "n_diamonds",
        "n_tailed_triangles",
        "n_4paths",
        "n_rectangles",
    )
    # single-row result: materialize it eagerly so the shared triangle
    # table can be released NOW — a session running many queries must
    # not accumulate persisted RDDs
    out = out.localCheckpoint(eager=True)
    pe.unpersist()
    return out


def motif4_counts(canonical_edges: DataFrame, dag: DataFrame) -> DataFrame:
    """Vertex-induced 4-motif counts (all 6 connected 4-vertex
    patterns) via the formula strategy: cheap edge-induced aggregates
    plus inclusion–exclusion corrections — the Spark translation of
    ``src/motif/omp_formula.cc:39-48`` (enumerate only what's
    unavoidable, derive the rest algebraically).

    Corrections (H-subgraphs inside each denser induced class):
      iDiamond = D − 6·K4              (a K4 holds 6 diamonds)
      iC4      = C4 − iD − 3·K4        (diamond holds 1 C4; K4 holds 3)
      iTT      = TT − 4·iD − 12·K4
      iP4      = P4 − 2·iTT − 4·iC4 − 6·iD − 12·K4
      iS3      = S3 − iTT − 2·iD − 4·K4
    Verified against the citeseer vertex-induced goldens
    (``src/motif/README.md:50-60``: 111,153 / 222,630 / 3,094 /
    22,900 / 2,200 / 255) and the generic induced matcher in pytest.
    """
    from graphminer_spark.algorithms.triangles import (
        clique4_count,
        enumerate_triangles,
    )

    deg = degrees(symmetrize(canonical_edges, dedup=False))
    # ONE triangle enumeration shared by per-edge counts (diamond,
    # tailed, P4 correction) and the K4 extension join
    tri = enumerate_triangles(dag).persist()
    pe = per_edge_triangles(
        canonical_edges, dag, include_zero=False, tri=tri
    ).persist()
    base = (
        star3_count(deg)
        .crossJoin(diamond_count(canonical_edges, dag, pe))
        .crossJoin(tailed_triangle_count(canonical_edges, dag, pe))
        .crossJoin(path4_count(canonical_edges, dag, pe))
        .crossJoin(rectangle_count(canonical_edges, dag))
        .crossJoin(clique4_count(dag, tri))
    )
    k4 = F.col("n_4cliques")
    i_d = (F.col("n_diamonds") - 6 * k4).alias("n_diamonds_ind")
    out = base.select("*", i_d)
    i_c4 = (F.col("n_rectangles") - F.col("n_diamonds_ind") - 3 * k4).alias(
        "n_4cycles_ind"
    )
    out = out.select("*", i_c4)
    i_tt = (
        F.col("n_tailed_triangles") - 4 * F.col("n_diamonds_ind") - 12 * k4
    ).alias("n_tailed_triangles_ind")
    out = out.select("*", i_tt)
    i_p4 = (
        F.col("n_4paths")
        - 2 * F.col("n_tailed_triangles_ind")
        - 4 * F.col("n_4cycles_ind")
        - 6 * F.col("n_diamonds_ind")
        - 12 * k4
    ).alias("n_4paths_ind")
    i_s3 = (
        F.col("n_3stars")
        - F.col("n_tailed_triangles_ind")
        - 2 * F.col("n_diamonds_ind")
        - 4 * k4
    ).alias("n_3stars_ind")
    out = out.select(
        i_p4,
        i_s3,
        "n_4cycles_ind",
        "n_tailed_triangles_ind",
        "n_diamonds_ind",
        "n_4cliques",
    )
    # eager single-row materialization → release the shared enumerations
    out = out.localCheckpoint(eager=True)
    tri.unpersist()
    pe.unpersist()
    return out


def rectangle_count(
    canonical_edges: DataFrame, dag: DataFrame | None = None
) -> DataFrame:
    """4-cycles C4 via rank-bounded wedges (Chiba–Nishizeki style).

    Every 4-cycle a–m1–b–m2 is counted exactly once at the diagonal
    pair {x, y} containing the cycle's (deg,id)-maximum vertex x:
    ``C4 = Σ_{pairs (x,y)} C(c_xy, 2)`` where ``c_xy`` counts common
    neighbors m with rank(m) < rank(x) and rank(y) < rank(x).

    The wedge stream is ``dag(m→x) ⋈ sym(m→y)``: the DAG side bounds a
    midpoint's fan-out by its *out*-degree (O(√m) after degree
    ordering), so a 10^6-degree hub as midpoint contributes
    outdeg·deg ≪ deg² rows — total work O(m^1.5) instead of the
    Σ deg(mid)² of the naive sym⋈sym join (the reference's analogous
    degree-threshold switch: ``src/matrix/triangle/omp_mm.cpp:137-155``).
    Same result as the rectangle kernel ``src/sgl/cpu_kernels/
    rectangle.h`` (citeseer golden 6,059, pinned in pytest).
    """
    sym = symmetrize(canonical_edges, dedup=False)
    deg = degrees(sym)
    if dag is None:
        dag = build_dag(canonical_edges, deg)
    # rank(v) = (deg(v), v) lexicographic — the DAG's total order
    dag_x = (
        dag.select(F.col("src").alias("mid"), F.col("dst").alias("x"))
        .join(deg.select(F.col("id").alias("x"), F.col("deg").alias("dx")), "x")
    )
    sym_y = (
        sym.select(F.col("src").alias("mid"), F.col("dst").alias("y"))
        .join(deg.select(F.col("id").alias("y"), F.col("deg").alias("dy")), "y")
    )
    wedges = dag_x.join(sym_y, "mid").filter(
        (F.col("dy") < F.col("dx"))
        | ((F.col("dy") == F.col("dx")) & (F.col("y") < F.col("x")))
    )
    codeg = wedges.groupBy("x", "y").agg(F.count("*").alias("c"))
    return codeg.agg(F.sum(_c2(F.col("c"))).alias("n_rectangles"))
