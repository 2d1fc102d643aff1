"""Generalized clique counting, labeled subgraph matching, and FSM
edge-pattern support.

* ``clique_count(dag, k)`` — the reference's k-clique kernels
  (``src/clique/cpu_kernels/clique_base.h``, k=3..5 ad-hoc; GPU k≤8)
  generalized: level i adds one vertex that is a DAG-out-neighbor of
  every current member — k−2 chained joins, each a bounded
  intersection in relational form.
* ``labeled_triangle_count`` — a miniature of the Query workload
  (``src/query/omp_base.cc``): label-filtered candidates (the CFL/NLF
  filter stage as semi-joins) then the enumeration join.
* ``fsm_edge_support`` — FSM's single-edge seeding phase
  (``src/fsm/omp_base.cc:19-148``): per edge-label-pattern MNI domain
  support = min over pattern positions of distinct mapped vertices
  (``src/fsm/domain_support.h``), frequent iff ≥ minsup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _labeled_sym(sym_edges: DataFrame, labeled_vertices: DataFrame) -> DataFrame:
    """Symmetric edges with endpoint labels → input columns + ``(ls,
    ld)``. The single shared subplan every FSM kernel builds on (plain
    equi-joins — AQE broadcasts the label table when small, never
    forced)."""
    lv = labeled_vertices.select("id", "vlabel")
    return sym_edges.join(
        lv.select(F.col("id").alias("src"), F.col("vlabel").alias("ls")),
        "src",
    ).join(
        lv.select(F.col("id").alias("dst"), F.col("vlabel").alias("ld")),
        "dst",
    )


def clique_count(dag: DataFrame, k: int) -> DataFrame:
    """Count k-cliques (k ≥ 3) over the degree-ordered DAG → single row
    ``(n_kcliques: long)``. Each level's join keys are the full current
    member set, so Catalyst plans hash joins keyed on (member, cand)."""
    assert k >= 3
    clq = dag.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    for i in range(3, k + 1):
        new = f"v{i}"
        cand = clq.join(
            dag.select(F.col("src").alias(f"v{i - 1}"), F.col("dst").alias(new)),
            f"v{i - 1}",
        )
        for j in range(1, i - 1):
            ej = dag.select(F.col("src").alias(f"v{j}"), F.col("dst").alias(new))
            cand = cand.join(ej, [f"v{j}", new])
        clq = cand
    return clq.agg(F.count("*").alias(f"n_{k}cliques"))


def labeled_triangle_count(
    dag: DataFrame, labeled_vertices: DataFrame, labels: tuple[int, int, int]
) -> DataFrame:
    """Triangles whose (deg,id)-ordered corners carry ``labels`` →
    ``(n_matches: long)``.

    Pipeline mirrors the reference's filter→enumerate: per-position
    candidate sets are label-filtered first (semi-joins), so the joins
    only see surviving vertices.
    """
    la, lb, lc = labels
    # candidate sets are |V|/n_classes rows — label-filtered but still
    # O(|V|); no forced broadcast (AQE broadcasts when actually small)
    cand = {
        lab: labeled_vertices.filter(F.col("vlabel") == lab).select("id")
        for lab in set(labels)
    }
    e1 = dag.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = dag.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = dag.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = (
        e1.join(cand[la].withColumnRenamed("id", "u"), "u", "left_semi")
        .join(cand[lb].withColumnRenamed("id", "v"), "v", "left_semi")
        .join(e2, "v")
        .join(cand[lc].withColumnRenamed("id", "w"), "w", "left_semi")
        .join(e3, ["u", "w"])
    )
    return tri.agg(F.count("*").alias("n_matches"))


def fsm_2edge_support(
    sym_edges: DataFrame,
    labeled_vertices: DataFrame,
    minsup: int,
) -> DataFrame:
    """Frequent 2-edge patterns (labeled wedges) with MNI domain
    support — the first gSpan extension level (``src/fsm/omp_base.cc:
    150-239`` ``dfs_extend``; published configs use k=2 edges,
    ``OSDI-experiments-guide.md:107-122``).

    Pattern = path a−b−c with vertex labels (la, lb, lc), canonical
    form la ≤ lc (the dfscode/is_min dedup for this pattern shape,
    ``src/fsm/canonical.h``); when la = lc both wedge orientations
    survive the filter, so the symmetric positions' domains are the
    union — exactly MNI (``src/fsm/domain_support.h``).
    support = min(|dom a|, |dom b|, |dom c|) ≥ minsup.

    Anti-monotone pruning: wedge candidates are built only from
    single-edge patterns that are themselves frequent (semi-join
    against the level-1 result) — a pure optimization; final supports
    are unchanged by anti-monotonicity.
    """
    lab = _labeled_sym(sym_edges, labeled_vertices).persist()
    freq1 = (
        fsm_edge_support(sym_edges, labeled_vertices, minsup)
        .select(F.col("la").alias("_fa"), F.col("lb").alias("_fb"))
    )
    pruned = lab.join(
        freq1,
        (F.least("ls", "ld") == F.col("_fa"))
        & (F.greatest("ls", "ld") == F.col("_fb")),
        "left_semi",
    )
    e1 = pruned.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("ls").alias("la"), F.col("ld").alias("lb"),
    )
    e2 = pruned.select(
        F.col("src").alias("b"), F.col("dst").alias("c"),
        F.col("ld").alias("lc"),
    )
    wedges = (
        e1.join(e2, "b")
        .filter(F.col("a") != F.col("c"))
        .filter(F.col("la") <= F.col("lc"))
    )
    support = (
        wedges.groupBy("la", "lb", "lc")
        .agg(
            F.countDistinct("a").alias("d1"),
            F.countDistinct("b").alias("d2"),
            F.countDistinct("c").alias("d3"),
        )
        .select(
            "la", "lb", "lc",
            F.least("d1", "d2", "d3").alias("support"),
        )
    )
    # ≤ n_classes³ pattern rows: materialize eagerly, release `lab`
    out = support.filter(F.col("support") >= minsup).localCheckpoint(eager=True)
    lab.unpersist()
    return out


def fsm_3edge_support(
    sym_edges: DataFrame,
    labeled_vertices: DataFrame,
    minsup: int,
) -> DataFrame:
    """Frequent 3-edge patterns with MNI domain support — the complete
    gSpan level after wedges (``src/fsm/omp_base.cc:150-239``): every
    connected 3-edge shape is a labeled triangle, 3-star, or 4-path.

    Canonical-form dedup per shape (``src/fsm/canonical.h`` role):
    triangle → labels sorted (Aut = S3); star → leaf labels sorted;
    path → label tuple ≤ its reverse. Palindromic/equal-label patterns
    keep both orientations, merging the symmetric positions' domains —
    MNI semantics (``src/fsm/domain_support.h``).

    Output: ``(shape, p1, p2, p3, p4, support)`` with p4 = -1 for the
    triangle (3 labeled positions); support = min over position
    domains, ≥ minsup. Star positions: (center, leaf₁..₃); path
    positions: the 4 path vertices in order.
    """
    e = (
        _labeled_sym(sym_edges, labeled_vertices)
        .select("src", "dst", "ls", "ld")
        .persist()
    )

    def mni(df: DataFrame, shape: str, positions: list[str], labels: list):
        pads = labels + [F.lit(-1)] * (4 - len(labels))
        keyed = df.select(
            *positions,
            *[p.alias(f"p{i + 1}") for i, p in enumerate(pads)],
        )
        aggs = [
            F.countDistinct(p).alias(f"d{i}") for i, p in enumerate(positions)
        ]
        sup = keyed.groupBy("p1", "p2", "p3", "p4").agg(*aggs)
        return sup.select(
            F.lit(shape).alias("shape"),
            "p1", "p2", "p3", "p4",
            F.least(*[f"d{i}" for i in range(len(positions))]).alias("support"),
        )

    # triangle: ordered (u,v,w), all adjacent, labels ascending
    t1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                  F.col("ls").alias("lu"), F.col("ld").alias("lv"))
    t2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"),
                  F.col("ld").alias("lw"))
    t3 = sym_edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = (
        t1.join(t2, "v").join(t3, ["u", "w"])
        .filter((F.col("lu") <= F.col("lv")) & (F.col("lv") <= F.col("lw")))
    )
    tri_sup = mni(tri, "triangle", ["u", "v", "w"],
                  [F.col("lu"), F.col("lv"), F.col("lw")])

    # 3-star: center b with ordered-label leaves (pairwise distinct)
    leaf = lambda n: e.select(  # noqa: E731
        F.col("src").alias("b"), F.col("dst").alias(n),
        F.col("ls").alias("lb"), F.col("ld").alias(f"l{n}"),
    )
    star = (
        leaf("x")
        .join(leaf("y").drop("lb"), "b")
        .join(leaf("z").drop("lb"), "b")
        .filter(
            (F.col("x") != F.col("y")) & (F.col("y") != F.col("z"))
            & (F.col("x") != F.col("z"))
        )
        .filter((F.col("lx") <= F.col("ly")) & (F.col("ly") <= F.col("lz")))
    )
    star_sup = mni(star, "star", ["b", "x", "y", "z"],
                   [F.col("lb"), F.col("lx"), F.col("ly"), F.col("lz")])

    # 4-path a-b-c-d: label tuple ≤ its reverse
    p1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                  F.col("ls").alias("la"), F.col("ld").alias("lb"))
    p2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"),
                  F.col("ld").alias("lc"))
    p3 = e.select(F.col("src").alias("c"), F.col("dst").alias("d"),
                  F.col("ld").alias("ld2"))
    path = (
        p1.join(p2, "b").join(p3, "c")
        .filter(
            (F.col("a") != F.col("c")) & (F.col("b") != F.col("d"))
            & (F.col("a") != F.col("d"))
        )
        .filter(
            (F.col("la") < F.col("ld2"))
            | ((F.col("la") == F.col("ld2")) & (F.col("lb") <= F.col("lc")))
        )
    )
    path_sup = mni(path, "path", ["a", "b", "c", "d"],
                   [F.col("la"), F.col("lb"), F.col("lc"), F.col("ld2")])

    out = tri_sup.unionByName(star_sup).unionByName(path_sup)
    # bounded pattern-table result: materialize eagerly, release `e`
    out = out.filter(F.col("support") >= minsup).localCheckpoint(eager=True)
    e.unpersist()
    return out


def fsm_edge_support(
    sym_edges: DataFrame,
    labeled_vertices: DataFrame,
    minsup: int,
    _approx_rsd: float | None = None,
) -> DataFrame:
    """Frequent single-edge patterns by MNI domain support →
    ``(la, lb, support)`` with la ≤ lb, support ≥ minsup.

    MNI support of pattern (la)-(lb) = min(|distinct u mapped to
    position la|, |distinct v mapped to position lb|) over all edge
    embeddings — the anti-monotone support the reference uses
    (``src/fsm/domain_support.h``). ``_approx_rsd`` switches the
    domain counts to HyperLogLog (see :func:`fsm_edge_support_approx`).
    """
    if _approx_rsd is None:
        d1 = F.countDistinct("src").alias("d1")
        d2 = F.countDistinct("dst").alias("d2")
    else:
        d1 = F.approx_count_distinct("src", _approx_rsd).alias("d1")
        d2 = F.approx_count_distinct("dst", _approx_rsd).alias("d2")
    lab = (
        _labeled_sym(sym_edges, labeled_vertices)
        .select("src", "dst", F.col("ls").alias("la"), F.col("ld").alias("lb"))
        .filter(F.col("la") <= F.col("lb"))
    )
    support = (
        lab.groupBy("la", "lb")
        .agg(d1, d2)
        .select(
            "la",
            "lb",
            F.least("d1", "d2").alias("support"),
        )
    )
    return support.filter(F.col("support") >= minsup)


def fsm_edge_support_approx(
    sym_edges: DataFrame,
    labeled_vertices: DataFrame,
    minsup: int,
    rsd: float = 0.02,
) -> DataFrame:
    """Approximate single-edge MNI support via HyperLogLog++
    (``approx_count_distinct``) — the scale analogue of the reference's
    early-saturating domain sets (``src/fsm/domain_support.h`` stops
    inserting once a domain reaches minsup; HLL keeps the per-group
    state O(1) the same way, where an exact countDistinct shuffles
    every distinct vertex id per pattern).

    At 10^9+ vertices per frequent pattern the exact distinct count is
    the FSM bottleneck; this path trades ~rsd relative error for
    constant-size aggregation state. Support values are approximate —
    use for the frequent-pattern FRONTIER decision (anti-monotone
    pruning tolerates slack) and confirm the final level exactly, which
    is what the reference's saturation trick also implies.

    Delegates to :func:`fsm_edge_support` — one body, two aggregators.
    """
    return fsm_edge_support(
        sym_edges, labeled_vertices, minsup, _approx_rsd=rsd
    )


def fsm_elabel_support(
    sym_eledges: DataFrame,
    labeled_vertices: DataFrame,
    minsup: int,
) -> DataFrame:
    """Frequent EDGE-labeled single-edge patterns ``(la)-[el]-(lb)`` by
    MNI domain support → ``(la, el, lb, support)`` with la ≤ lb
    canonical, support ≥ minsup.

    The reference's FSM operates on edge-labeled DFS codes — each code
    element is a ``(vlabel, elabel, vlabel)`` tuple (``src/fsm/
    omp_base.cc:19-148``; per-edge ``elabel_t``, ``include/graph.h:38``).
    Input ``sym_eledges(src, dst, elabel)`` carries the same elabel in
    both directions (``labels.with_synthetic_elabels``), so when
    la = lb both orientations survive the canonical filter and the
    symmetric positions' domains union — MNI semantics
    (``src/fsm/domain_support.h``). One shuffle (the groupBy); the
    vertex-label joins are plain equi-joins AQE may broadcast.
    """
    lab = (
        _labeled_sym(sym_eledges, labeled_vertices)
        .select(
            "src", "dst", "elabel",
            F.col("ls").alias("la"), F.col("ld").alias("lb"),
        )
        .filter(F.col("la") <= F.col("lb"))
    )
    support = (
        lab.groupBy("la", "elabel", "lb")
        .agg(
            F.countDistinct("src").alias("d1"),
            F.countDistinct("dst").alias("d2"),
        )
        .select(
            "la",
            F.col("elabel").alias("el"),
            "lb",
            F.least("d1", "d2").alias("support"),
        )
    )
    return support.filter(F.col("support") >= minsup)


def fsm_elabel_2edge_support(
    sym_eledges: DataFrame,
    labeled_vertices: DataFrame,
    minsup: int,
) -> DataFrame:
    """Frequent edge-labeled wedges ``(la)-[e1]-(lb)-[e2]-(lc)`` with
    MNI domain support → ``(la, e1, lb, e2, lc, support)``.

    The 2-edge gSpan level over edge-labeled DFS codes (``src/fsm/
    omp_base.cc:150-239`` ``dfs_extend`` with ``elabel_t`` tuples).
    Canonical form: ``(la, e1) ≤ (lc, e2)`` lexicographically — the
    wedge's only automorphism swaps the two arms; on palindromic
    patterns both orientations survive and the arm positions' domains
    union, exactly MNI (``src/fsm/domain_support.h``).
    """
    lab = _labeled_sym(sym_eledges, labeled_vertices)
    arm1 = lab.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("ls").alias("la"), F.col("elabel").alias("e1"),
        F.col("ld").alias("lb"),
    )
    arm2 = lab.select(
        F.col("src").alias("b"), F.col("dst").alias("c"),
        F.col("elabel").alias("e2"), F.col("ld").alias("lc"),
    )
    wedges = (
        arm1.join(arm2, "b")
        .filter(F.col("a") != F.col("c"))
        .filter(
            (F.col("la") < F.col("lc"))
            | ((F.col("la") == F.col("lc")) & (F.col("e1") <= F.col("e2")))
        )
    )
    support = (
        wedges.groupBy("la", "e1", "lb", "e2", "lc")
        .agg(
            F.countDistinct("a").alias("d1"),
            F.countDistinct("b").alias("d2"),
            F.countDistinct("c").alias("d3"),
        )
        .select(
            "la", "e1", "lb", "e2", "lc",
            F.least("d1", "d2", "d3").alias("support"),
        )
    )
    return support.filter(F.col("support") >= minsup)
