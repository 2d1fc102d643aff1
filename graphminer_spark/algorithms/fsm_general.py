"""General-k FSM: the gSpan frontier loop over an embeddings-per-level
DataFrame.

The reference mines patterns to arbitrary edge count k with
rightmost-path extension and is_min canonical dedup
(``src/fsm/omp_base.cc:150-239`` ``dfs_extend``, ``src/fsm/dfscode.h``,
``src/fsm/canonical.h``). This module is the Spark-first
re-expression — instead of DFS codes on a recursion stack, the frontier
is a DataFrame of *edge-set embeddings*:

* a level-k embedding is one row ``(es, vlist)`` — ``es`` the SORTED
  set of k graph edges of one connected edge-subgraph occurrence and
  ``vlist`` the sorted ``(vertex, label)`` structs, carried
  incrementally so no level ever re-joins the label table;
* extension = one join against the labeled symmetric edge table
  (pre-pruned after level 1 to edges whose label pair is frequent —
  gSpan's anti-monotone 1-edge fact), then a CANONICAL-PARENT filter
  (the Spark analogue of the reference's is_min rejection,
  ``src/fsm/omp_base.cc:150-239``): candidate S = E' + ne survives
  only when ne is the lexicographically MAXIMUM edge of S whose
  removal keeps S connected, and (for backward edges, both endpoints
  already in E') only via the smaller anchor. Every connected
  (k+1)-edge subgraph has at least one removable edge and its parent
  S − e* is a connected k-edge subgraph whose pattern is a subpattern
  of S's (MNI is anti-monotone, Bringmann & Nijssen), so the frontier
  stays complete for frequent patterns while each S is generated
  EXACTLY ONCE — no per-level ``dropDuplicates`` array-key shuffle.
  Removability is a property of the index-space STRUCTURE: ``vs`` is
  sorted, so concrete-edge lex order equals index-edge lex order and
  the max removable edge is computed once per structure on the
  driver, broadcast, and checked as a pure expression;
* pattern identity = two-phase canonicalization (the quick-pattern →
  canonical-pattern aggregation of ``miner.h``), split so ALL per-row
  work stays JVM-side: the driver canonicalizes only the ≤ a few
  hundred distinct index-space STRUCTURES (min over n! encodings,
  n = k+1 ≤ 6 — the is_min check, memoized), and broadcasts each
  structure's min-achieving assignments; rows then derive their
  canonical label tuple as ``array_min`` over those assignments' label
  permutations — a pure expression;
* MNI support (``src/fsm/domain_support.h``): per embedding, EVERY
  min-achieving assignment contributes its position → vertex pairs, so
  ``countDistinct`` per position is automatically the union over all
  isomorphic assignments — symmetric positions merge their domains
  with no explicit orbit bookkeeping;
* anti-monotone pruning between levels: embeddings of infrequent
  patterns leave the frontier (gSpan's support prune).

Scale note: unlike the fixed-shape kernels in ``patterns.py`` (whose
MNI domains commute into NLF counts — hub-safe), the general-k loop is
embedding-bound by nature: level cost = O(#occurrences), the same
asymptotics as the reference's DFS enumeration. Use it for depth
(k ≥ 4); the closed-form kernels remain the scale path for k ≤ 3.
Measured vs the r04 dropDuplicates miner on the sf0.1 scramble graph
(alternating-order best-of protocol, BENCH/BASELINE.md round-5 notes):
1.08× at k=4, 1.56× at k=5 (103 s for the full k=5 mine over a 7.9M-
embedding top level) — the gap grows with k because the old dedup
shuffle moved ~(k+1)× the surviving rows.
"""

from __future__ import annotations

from functools import lru_cache
from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------- driver-side canonical


@lru_cache(maxsize=None)
def _structure_canon(qedges: tuple, n: int):
    """Unlabeled canonicalization of an index-space edge set, memoized —
    the quick-code space is huge (every vertex-id ordering of every
    occurrence) but collapses onto ≤ a few hundred distinct STRUCTURES,
    so the O(n!) search runs once per structure. Returns
    ``(canon_edges, min_assigns)``: the canonical edge set and every
    assignment (pos → quick index) achieving it — min-achieving
    assignments differ exactly by Aut(canonical structure)."""
    best = None
    mins: list[tuple] = []
    for assign in permutations(range(n)):  # assign[pos] = quick index
        pos_of = [0] * n
        for p, q in enumerate(assign):
            pos_of[q] = p
        edges_p = tuple(
            sorted(tuple(sorted((pos_of[a], pos_of[b]))) for a, b in qedges)
        )
        if best is None or edges_p < best:
            best, mins = edges_p, [assign]
        elif edges_p == best:
            mins.append(assign)
    return best, tuple(mins)


def _successor_structures(structs: set[tuple]) -> set[tuple]:
    """All index-space structures one extension can produce from the
    given level's structures — computed on the DRIVER, before the
    extension join runs, so the canonical-parent filter and structure
    map fuse into the extension pass (no pre-filter materialization or
    collect over raw candidates). Backward edges add (a, b) in place;
    forward edges insert the new vertex at every sorted position p
    (shifting indices ≥ p), attached to every existing vertex. The
    result is a superset of the structures the data can realize —
    unused entries are dead broadcast rows, never wrong."""
    out: set[tuple] = set()
    for qedges in structs:
        n = max(max(e) for e in qedges) + 1
        es = set(qedges)
        for a in range(n):
            for b in range(a + 1, n):
                if (a, b) not in es:
                    out.add(tuple(sorted(es | {(a, b)})))
        for p in range(n + 1):
            shifted = {
                tuple(
                    sorted(
                        (a + 1 if a >= p else a, b + 1 if b >= p else b)
                    )
                )
                for a, b in es
            }
            for a in range(n):
                ap = a + 1 if a >= p else a
                out.add(tuple(sorted(shifted | {tuple(sorted((ap, p)))})))
    return out


@lru_cache(maxsize=None)
def _max_removable(qedges: tuple, n: int):
    """Max index-space edge of the structure whose removal keeps the
    remaining edges connected (over their own endpoint set) — the
    canonical-parent edge. Always exists for k ≥ 2 (any spanning-tree
    leaf edge is removable). Because embeddings carry ``vs`` sorted,
    the max removable CONCRETE edge of every occurrence of this
    structure sits at exactly these index positions."""
    best = None
    for e in qedges:
        rest = [x for x in qedges if x != e]
        if not rest:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        verts = set()
        for a, b in rest:
            verts.add(a)
            verts.add(b)
            ra, rb = find(a), find(b)
            parent[ra] = rb
        if len({find(v) for v in verts}) == 1 and (best is None or e > best):
            best = e
    return best


def _decode_4edge(canon_edges, canon_labels):
    """Canonical 4-edge pattern → ``(shape, q1..q5)`` semantic key (the
    named-shape layout the oracle SQL reproduces; q5 = -1 for 4-vertex
    shapes). Shapes: path5 / star4 / chair / cycle4 / paw."""
    n = len(canon_labels)
    adj = {i: set() for i in range(n)}
    for a, b in canon_edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {i: len(adj[i]) for i in range(n)}
    degs = sorted(deg.values())
    lab = canon_labels
    if n == 5 and degs == [1, 1, 1, 1, 4]:
        center = next(i for i in range(n) if deg[i] == 4)
        leaves = sorted(lab[i] for i in range(n) if i != center)
        return ("star4", lab[center], *leaves)
    if n == 5 and degs == [1, 1, 1, 2, 3]:
        c = next(i for i in range(n) if deg[i] == 3)
        x = next(i for i in adj[c] if deg[i] == 2)
        y = next(i for i in adj[x] if i != c)
        l1, l2 = sorted(lab[i] for i in adj[c] if deg[i] == 1)
        return ("chair", lab[y], lab[x], lab[c], l1, l2)
    if n == 5:  # path5: degrees [1, 1, 2, 2, 2]
        end = next(i for i in range(n) if deg[i] == 1)
        order = [end]
        while len(order) < n:
            order.append(next(j for j in adj[order[-1]] if j not in order))
        t = tuple(lab[i] for i in order)
        return ("path5", *min(t, t[::-1]))
    if degs == [2, 2, 2, 2]:  # cycle4
        order = [0]
        while len(order) < 4:
            order.append(next(j for j in adj[order[-1]] if j not in order))
        t = tuple(lab[i] for i in order)
        variants = []
        for d in (t, t[::-1]):
            for r in range(4):
                variants.append(d[r:] + d[:r])
        return ("cycle4", *min(variants), -1)
    # paw: triangle (t1, t2, u) + pendant p on u
    u = next(i for i in range(n) if deg[i] == 3)
    p = next(i for i in range(n) if deg[i] == 1)
    t1, t2 = sorted(lab[i] for i in range(n) if deg[i] == 2)
    return ("paw", lab[p], lab[u], t1, t2, -1)


# ------------------------------------------------------- frontier loop


def _qkey_str(qedges: tuple) -> str:
    """Driver-side rendering of an index-space structure, chosen to
    match the ``_with_quick`` expression byte-for-byte (both sides emit
    ``a:b,a:b,...`` over the sorted edge list)."""
    return ",".join(f"{a}:{b}" for a, b in sorted(qedges))


def _with_quick(emb: DataFrame) -> DataFrame:
    """Quick-pattern columns from the carried state — pure expressions:
    ``vs`` = sorted vertex ids, ``labels`` aligned to it, ``qkey`` =
    the index-space edge structure rendered ``a:b,a:b,...`` (the
    structure-map join key, same rendering as :func:`_qkey_str`)."""
    out = (
        emb.withColumn("vs", F.transform("vlist", lambda x: x["v"]))
        .withColumn("labels", F.transform("vlist", lambda x: x["l"]))
    )
    qedges = F.array_sort(
        F.transform(
            "es",
            lambda e: F.struct(
                (
                    F.least(
                        F.array_position(F.col("vs"), e["u"]),
                        F.array_position(F.col("vs"), e["v"]),
                    )
                    - 1
                )
                .cast("int")
                .alias("a"),
                (
                    F.greatest(
                        F.array_position(F.col("vs"), e["u"]),
                        F.array_position(F.col("vs"), e["v"]),
                    )
                    - 1
                )
                .cast("int")
                .alias("b"),
            ),
        )
    )
    return out.withColumn(
        "qkey",
        F.array_join(
            F.transform(
                qedges,
                lambda e: F.concat_ws(
                    ":", e["a"].cast("string"), e["b"].cast("string")
                ),
            ),
            ",",
        ),
    )


def _extend(emb: DataFrame, lab_sym: DataFrame) -> DataFrame:
    """One frontier level: every embedding grows by one incident edge
    (forward or backward). Backward edges (both endpoints already in
    the vertex set) are generated only via their SMALLER endpoint as
    anchor, so within one parent each candidate appears once; the
    cross-parent dedup is the canonical-parent filter downstream —
    together they make each (k+1)-edge subgraph appear exactly once
    with NO dropDuplicates shuffle. The labeled edge table carries the
    new endpoint's label, so ``vlist`` extends without a label join.
    Output carries ``ne`` (the added edge) for the parent check."""
    ext = (
        emb.select(
            "es", "vlist",
            F.explode(F.transform("vlist", lambda x: x["v"])).alias("anchor"),
        )
        .join(
            lab_sym.select(
                F.col("src").alias("anchor"),
                F.col("dst").alias("w"),
                F.col("ld").alias("lw"),
            ),
            "anchor",
        )
        .withColumn(
            "ne",
            F.struct(
                F.least("anchor", "w").alias("u"),
                F.greatest("anchor", "w").alias("v"),
            ),
        )
        .filter(~F.array_contains("es", F.col("ne")))
    )
    known = F.exists("vlist", lambda x: x["v"] == F.col("w"))
    return (
        ext.filter(~known | (F.col("anchor") < F.col("w")))
        .select(
            F.array_sort(F.concat("es", F.array("ne"))).alias("es"),
            F.when(known, F.col("vlist"))
            .otherwise(
                F.array_sort(
                    F.concat(
                        "vlist",
                        F.array(
                            F.struct(
                                F.col("w").alias("v"),
                                F.col("lw").cast("int").alias("l"),
                            )
                        ),
                    )
                )
            )
            .alias("vlist"),
            "ne",
        )
    )


def _canonical_rows(
    ann: DataFrame, smap: DataFrame, check_parent: bool = False
) -> DataFrame:
    """Attach canonical code + min-achieving assignments, all JVM-side:
    ``clabels`` = lexicographic min over the structure's assignments of
    the permuted label tuple; ``code`` identifies the pattern. With
    ``check_parent``, keep only rows whose added edge ``ne`` sits at
    the structure's max-removable index positions — the canonical-
    parent test that replaces cross-parent ``dropDuplicates``."""
    joined = ann.join(F.broadcast(smap), "qkey")
    if check_parent:
        joined = joined.filter(
            (
                (F.array_position(F.col("vs"), F.col("ne")["u"]) - 1).cast(
                    "int"
                )
                == F.col("ra")
            )
            & (
                (F.array_position(F.col("vs"), F.col("ne")["v"]) - 1).cast(
                    "int"
                )
                == F.col("rb")
            )
        )
    labeling = lambda a: F.transform(  # noqa: E731
        a, lambda i: F.element_at(F.col("labels"), i + 1)
    )
    clabels = F.array_min(
        F.transform("assigns", lambda a: labeling(a))
    )
    return joined.withColumn("clabels", clabels).withColumn(
        "code",
        F.concat(F.col("sid"), F.lit("|"), F.col("clabels").cast("string")),
    )


def _level_supports(canon: DataFrame) -> DataFrame:
    """MNI supports: every min-achieving assignment contributes its
    position → vertex pairs, so per-position distinct counts union over
    isomorphic assignments (symmetric positions merge automatically) →
    ``(code, support)``."""
    surviving = F.filter(
        "assigns",
        lambda a: F.transform(
            a, lambda i: F.element_at(F.col("labels"), i + 1)
        )
        == F.col("clabels"),
    )
    assigned = (
        canon.select(
            "code", "vs", "labels", "clabels",
            F.explode(surviving).alias("assign"),
        )
        .select(
            "code",
            F.posexplode(
                F.transform(
                    "assign", lambda i: F.element_at(F.col("vs"), i + 1)
                )
            ).alias("pos", "vtx"),
        )
    )
    return (
        assigned.groupBy("code", "pos")
        .agg(F.countDistinct("vtx").alias("d"))
        .groupBy("code")
        .agg(F.min("d").alias("support"))
    )


def _mine(sym_edges, labeled_vertices, k, minsup=None, minsup_fn=None,
          stats=None):
    """Shared frontier loop → (supports DF, sid → canon_edges map).

    ``minsup_fn`` folds adaptive support into the mine: it receives the
    SYMMETRIC edge count (already an action the loop needs for AQE
    gating) so callers don't pay a second scan of the input. ``stats``
    (a dict, opt-in — adds one count action per level) collects
    per-level candidate/frontier row counts for bench reporting."""
    from graphminer_spark.checkpoint import superstep_planning

    spark = sym_edges.sparkSession
    lv = labeled_vertices.select("id", "vlabel")
    lab_sym = (
        sym_edges.select("src", "dst")
        .join(
            lv.select(F.col("id").alias("dst"), F.col("vlabel").alias("ld")),
            "dst",
        )
        .join(
            lv.select(F.col("id").alias("src"), F.col("vlabel").alias("ls")),
            "src",
        )
        .persist()
    )
    m_edges = lab_sym.count()
    if minsup is None:
        minsup = minsup_fn(m_edges)
    # dedup on the (src, dst) long pair BEFORE building the array
    # payload: hash-aggregatable long keys instead of the array-key
    # SortAggregate (sort + first()) the old dropDuplicates(["es"])
    # compiled to — identical row set (labels are functionally
    # determined by the endpoint ids via the label join)
    emb = (
        lab_sym.filter(F.col("src") < F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .select(
            F.array(
                F.struct(F.col("src").alias("u"), F.col("dst").alias("v"))
            ).alias("es"),
            F.array_sort(
                F.array(
                    F.struct(
                        F.col("src").alias("v"),
                        F.col("ls").cast("int").alias("l"),
                    ),
                    F.struct(
                        F.col("dst").alias("v"),
                        F.col("ld").cast("int").alias("l"),
                    ),
                )
            ).alias("vlist"),
        )
    )
    sid_edges: dict[str, tuple] = {}
    prev = None
    sup = None
    structs: set[tuple] = {((0, 1),)}

    def build_smap(structset):
        """Driver-built structure map (canonical assignments + max
        removable edge per structure), broadcast into the extension
        pass — no data scan needed to discover structures."""
        srows, qmap = [], {}
        for qedges in sorted(structset):
            n = max(max(e) for e in qedges) + 1
            cedges, assigns = _structure_canon(qedges, n)
            sid = repr(cedges)
            sid_edges[sid] = cedges
            rem = _max_removable(qedges, n)
            ra, rb = rem if rem is not None else (-1, -1)
            qk = _qkey_str(qedges)
            qmap[qk] = qedges
            srows.append((qk, sid, [list(a) for a in assigns], ra, rb))
        return (
            spark.createDataFrame(
                srows,
                "qkey string, sid string, assigns array<array<int>>, "
                "ra int, rb int",
            ),
            qmap,
        )

    with superstep_planning(spark, m_edges):
        for level in range(1, k + 1):
            smap, qmap = build_smap(structs)
            if level > 1:
                emb = _extend(emb, lab_sym)
            ann = _with_quick(emb)
            # ONE pass: extension join → qkey → broadcast structure map
            # → canonical-parent filter → materialize only the
            # exactly-once embeddings (assigns re-derivable via the
            # broadcast, so not persisted per row)
            canon = (
                _canonical_rows(ann, smap, check_parent=level > 1)
                .select(
                    "es", "vlist", "vs", "labels", "qkey", "code", "clabels"
                )
                .localCheckpoint(eager=True)
            )
            if prev is not None:
                prev.unpersist()
            prev = canon
            # ONE scan of the checkpointed level serves both the
            # realized-structure set (tightens next level's successor
            # enumeration) and the per-level row count (bench stats) —
            # the old shape paid a separate full count() job per level.
            # At the last level the structures feed nothing, so the
            # scan runs only when stats were requested.
            realized: set[tuple] = set()
            if level < k or stats is not None:
                qrows = canon.groupBy("qkey").agg(
                    F.count("*").alias("n")
                ).collect()
                realized = {qmap[r["qkey"]] for r in qrows}
                if stats is not None:
                    stats[f"level{level}_embeddings"] = sum(
                        int(r["n"]) for r in qrows
                    )
            sup = (
                _level_supports(canon.join(F.broadcast(smap), "qkey"))
                .filter(F.col("support") >= minsup)
                .localCheckpoint(eager=True)  # ≤ pattern-space rows
            )
            if stats is not None:
                stats[f"level{level}_frequent"] = sup.count()
            if level < k:
                structs = _successor_structures(realized)
                # anti-monotone prune: only embeddings of frequent patterns
                # stay on the frontier
                emb = (
                    canon.join(sup.select("code"), "code", "left_semi")
                    .select("es", "vlist")
                )
                if level == 1:
                    # gSpan's 1-edge fact: an extension edge whose label
                    # pair is infrequent cannot appear in any frequent
                    # pattern — shrink the extension table once, for every
                    # later level (affects only infrequent-pattern
                    # candidate counts, which the support filter drops
                    # anyway)
                    pairs = set()
                    for r in sup.select("code").collect():
                        lpart = r["code"].split("|", 1)[1]
                        la, lb = (
                            int(x)
                            for x in lpart.strip("[]").split(",")
                            if x.strip()
                        )
                        pairs.add((la, lb))
                    pair_df = spark.createDataFrame(
                        sorted(pairs), "pl int, ph int"
                    )
                    pruned = lab_sym.join(
                        F.broadcast(pair_df),
                        (
                            F.least(F.col("ls"), F.col("ld")).cast("int")
                            == F.col("pl")
                        )
                        & (
                            F.greatest(F.col("ls"), F.col("ld")).cast("int")
                            == F.col("ph")
                        ),
                        "left_semi",
                    ).persist()
                    lab_sym.unpersist()
                    lab_sym = pruned
    out = sup
    if prev is not None:
        prev.unpersist()
    lab_sym.unpersist()
    return out, sid_edges


def fsm_kedge_support(
    sym_edges: DataFrame,
    labeled_vertices: DataFrame,
    k: int,
    minsup: int,
    stats: dict | None = None,
) -> DataFrame:
    """Frequent k-edge patterns with MNI support → ``(code, support)``,
    support ≥ minsup; ``code`` is the canonical structure + minimal
    label tuple of the pattern. Driver loop = gSpan's level-wise
    frontier with anti-monotone support pruning between levels and
    canonical-parent extension (each candidate generated once)."""
    assert k >= 1
    sup, _ = _mine(sym_edges, labeled_vertices, k, minsup, stats=stats)
    return sup


def fsm_4edge_support(
    sym_edges: DataFrame,
    labeled_vertices: DataFrame,
    minsup: int | None = None,
    minsup_fn=None,
    stats: dict | None = None,
) -> DataFrame:
    """Frequent 4-edge patterns with MNI support in the named-shape
    layout → ``(shape, q1, q2, q3, q4, q5, support)``; q5 = -1 for the
    4-vertex shapes (cycle4 / paw). The gate-facing face of
    :func:`fsm_kedge_support` — same frontier loop, plus a driver-side
    decode of each frequent canonical pattern into the shape-semantic
    key the DuckDB oracle reproduces. ``minsup_fn`` (symmetric edge
    count → minsup) resolves adaptive support inside the mine's
    existing count action — no extra input scan."""
    sup, sid_edges = _mine(
        sym_edges, labeled_vertices, 4, minsup, minsup_fn, stats=stats
    )
    spark = sym_edges.sparkSession
    # decode the FREQUENT patterns only (≤ pattern-space, small)
    pats = sup.collect()
    rows = []
    for r in pats:
        sid, lpart = r["code"].split("|", 1)
        clabels = tuple(
            int(x) for x in lpart.strip("[]").split(",") if x.strip()
        )
        rows.append(
            (*_decode_4edge(sid_edges[sid], clabels), r["support"])
        )
    return spark.createDataFrame(
        rows,
        "shape string, q1 int, q2 int, q3 int, q4 int, q5 int, support long",
    )
