"""Color-coding approximate pattern counting (FASCIA / Motivo family).

Reference analogue: the approximate-mining workload family the
reference collects under ``/root/reference/src/approx/README.md``
(FASCIA, ICPP'13; Motivo, VLDB'19; both build on Alon–Yuster–Zwick
color coding). DOULION edge sampling already covers approximate
*triangle* counting (``triangles.triangle_count_sampled``); color
coding covers the larger acyclic patterns — here simple k-vertex
paths — where edge sampling's p^|E(pattern)| variance blows up.

Estimator: assign each vertex one of ``k`` colors; count only
*colorful* embeddings (all k vertices distinctly colored); scale by
``k^k / k!`` — the inverse probability that a fixed simple k-path is
colorful under a uniform coloring. Colorfulness buys two things at
100 TB scale:

* the O(k²) pairwise ``!=`` vertex-distinctness filters vanish — a
  colorful walk cannot revisit a vertex, and the color inequality is
  a one-int compare pushed below each join instead of a k-column one;
* each join level is pre-pruned by the color constraint (only
  ~(k-i)/k of extensions survive level i), so the intermediate
  embedding stream shrinks geometrically vs exact enumeration.

The color is a deterministic md5-derived expression on the vertex id
— NOT an RNG — for the same two reasons the DOULION sampler is
hash-based (``triangles.py:48-65``): stage retries on a resumable
100 TB run must re-derive identical colors, and the exact same
estimator must be expressible in ANSI SQL for the DuckDB cross-engine
oracle. (A production run wanting tighter error just unions R
re-colorings with a salt in the hash and averages — same plan, R×
the work, 1/R the variance.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphminer_spark.algorithms.subgraph import _id_col

# ``k^k / k!`` scale factors (numerator, denominator) per color count
_SCALE = {3: (27, 6), 4: (256, 24), 5: (3125, 120)}


def vertex_color(id_col: Column, n_colors: int) -> Column:
    """Deterministic pseudo-random color in ``[0, n_colors)`` from the
    first 8 hex digits (32 bits) of ``md5(id)`` — wide enough that the
    modulo bias is ≤ k/2³² for any small ``n_colors``."""
    if n_colors < 2:
        raise ValueError(f"n_colors must be >= 2, got {n_colors}")
    word = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return (word.cast("bigint") % n_colors).alias("color")


def colorful_path_count(sym_edges: DataFrame, k: int = 4) -> DataFrame:
    """Approximate count of simple k-vertex paths (each unordered path
    once) by color coding. Output: one row
    ``(colorful_paths: long, est_paths: long)`` where ``est_paths =
    colorful_paths * k^k // k!``.

    The plan is the same chained-equi-join level growth as the exact
    pattern kernels (``subgraph.match_embeddings``), with the pairwise
    color-``!=`` predicates applied as soon as both endpoints are
    bound — Catalyst evaluates them inside the join stage, before the
    next shuffle, so each level's output stream is pruned ~(k-i)/k
    before it moves.
    """
    if k not in _SCALE:
        raise ValueError(f"k must be one of {sorted(_SCALE)}, got {k}")
    sym = sym_edges.select(
        F.col("src").alias(_id_col(0)), F.col("dst").alias(_id_col(1))
    )
    emb = sym
    for lv in range(2, k):
        ext = sym_edges.select(
            F.col("src").alias(_id_col(lv - 1)), F.col("dst").alias(_id_col(lv))
        )
        emb = emb.join(ext, _id_col(lv - 1))
        for prev in range(lv):
            emb = emb.filter(
                vertex_color(F.col(_id_col(prev)), k)
                != vertex_color(F.col(_id_col(lv)), k)
            )
    # seed-edge color constraint + one-row-per-unordered-path
    emb = emb.filter(
        vertex_color(F.col(_id_col(0)), k) != vertex_color(F.col(_id_col(1)), k)
    ).filter(F.col(_id_col(0)) < F.col(_id_col(k - 1)))
    num, den = _SCALE[k]
    return emb.agg(
        F.count(F.lit(1)).alias("colorful_paths"),
        F.expr(f"count(1) * {num} div {den}").alias("est_paths"),
    )


def colorful_path_count_dp(
    sym_edges: DataFrame,
    k: int = 4,
    n_colorings: int = 1,
    per_coloring: bool = False,
) -> DataFrame:
    """Same quantity as :func:`colorful_path_count` — the colorful
    simple-k-path count and its k^k/k! estimate — via FASCIA's
    color-set dynamic program instead of walk enumeration.

    State: ``W_i(v, S)`` = number of i-vertex walks ending at ``v``
    whose colors are exactly the set ``S`` (a k-bit mask). Distinct
    colors force distinct vertices, so these walks ARE simple paths,
    and the recurrence needs no vertex history:

        ``W_i(v, S∪{c(v)}) += Σ_{u~v, c(v)∉S} W_{i-1}(u, S)``

    The i=2 level seeds directly from the edge table (one groupBy
    over differently-colored edges); each of the k-2 remaining rounds
    is one equi-join with the edge table plus one ``groupBy(id, S)``
    re-aggregation — the state never exceeds
    ``|V|·2^k`` rows, vs the enumeration's Σ-walks intermediate
    stream. That makes this the SCALE path: at sf0.1 on the dense
    divisor-6 graph the enumeration takes ~90 s (28.4M colorful
    paths materialized); the DP aggregates the same total without
    materializing them. Every unordered path is counted once from
    each end, so the total halves (endpoints are distinct — colorful
    — so the division is exact).

    ``n_colorings`` > 1 averages R independent salted colorings in ONE
    plan — the state gains a salt key ``(r, v, S)``, so work and state
    grow R× while variance drops 1/R (still deterministic: salt r's
    colors come from ``md5(r || ':' || id)``). ``colorful_paths`` is
    then the TOTAL across colorings; ``est_paths`` the averaged
    estimate.

    Pure integer/bitmask arithmetic end to end → the identical DP is
    expressible in the DuckDB oracle (``colorful_path_dp_sql``).
    """
    if k not in _SCALE:
        raise ValueError(f"k must be one of {sorted(_SCALE)}, got {k}")
    if n_colorings < 1:
        raise ValueError(f"n_colorings must be >= 1, got {n_colorings}")

    # shiftleft needs a SQL expression — the python API only takes a
    # literal shift amount. Salt 0 hashes the bare id so R=1 matches
    # the un-salted estimator (and the enumeration) bit for bit.
    def bit_expr(col: str) -> Column:
        key = (
            f"cast({col} as string)"
            if n_colorings == 1
            else f"concat(cast(r as string), ':', cast({col} as string))"
        )
        return F.expr(
            "shiftleft(1, cast("
            f"cast(conv(substring(md5({key}), 1, 8), 16, 10)"
            f" as bigint) % {k} as int))"
        )

    edges = sym_edges.select("src", "dst")
    salt_keys: list = []
    if n_colorings > 1:
        spark = sym_edges.sparkSession
        salts = spark.range(n_colorings).select(F.col("id").alias("r"))
        edges = edges.crossJoin(F.broadcast(salts))
        salt_keys = [F.col("r")]
    # seed at i=2 straight from the edge table — W_2(v, {c(u),c(v)})
    # is one groupBy over differently-colored edges, folding what
    # would otherwise be a distinct-vertices shuffle plus a first
    # join round into a single aggregation
    sb, db = bit_expr("src"), bit_expr("dst")
    state = (
        edges.filter(sb != db)
        .groupBy(
            *salt_keys, F.col("dst").alias("id"), sb.bitwiseOR(db).alias("s")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ext = sym_edges.select(F.col("src").alias("id"), "dst")
    for _ in range(k - 2):
        state = (
            state.join(ext, "id")
            .withColumn("vb", bit_expr("dst"))
            .filter(F.col("s").bitwiseAND(F.col("vb")) == 0)
            .groupBy(
                *salt_keys,
                F.col("dst").alias("id"),
                F.col("s").bitwiseOR(F.col("vb")).alias("s"),
            )
            .agg(F.sum("cnt").alias("cnt"))
        )
    num, den = _SCALE[k]
    if per_coloring:
        # one exact-integer row per salted coloring — the gate-facing
        # face of the R-replicated estimator (variance evidence rows);
        # stderr/CI derive from these via estimate_ci()
        if n_colorings < 2:
            raise ValueError("per_coloring needs n_colorings >= 2")
        return state.groupBy("r").agg(
            F.expr("sum(cnt) div 2").alias("colorful_paths"),
            F.expr(f"sum(cnt) div 2 * {num} div {den}").alias("est_paths"),
        )
    return state.agg(
        F.expr("sum(cnt) div 2").alias("colorful_paths"),
        F.expr(
            f"sum(cnt) div 2 * {num} div {den * n_colorings}"
        ).alias("est_paths"),
    )


def colorful_path_dp_sql(
    k: int = 4, n_colorings: int = 1, per_coloring: bool = False
) -> str:
    """DuckDB body (over the shared ``sym`` CTE) computing exactly
    :func:`colorful_path_count_dp` — the same unrolled color-set DP
    in integer/bitmask arithmetic, with the same salted-coloring
    replication when ``n_colorings > 1``."""
    num, den = _SCALE[k]
    salted = n_colorings > 1

    def color(v: str) -> str:
        key = f"w.r::VARCHAR || ':' || {v}::VARCHAR" if salted else f"{v}::VARCHAR"
        return f"(('0x' || substr(md5({key}), 1, 8))::BIGINT % {k})"

    rkey = "w.r, " if salted else ""
    seed_from = (
        "(SELECT DISTINCT src FROM sym) w"
        if not salted
        else f"(SELECT w0.src, t.r FROM (SELECT DISTINCT src FROM sym) w0,"
        f" range({n_colorings}) t(r)) w"
    )
    rounds = [
        f"w1 AS (SELECT {rkey}w.src AS id, "
        f"(1 << {color('w.src')})::BIGINT AS s, 1::BIGINT AS cnt "
        f"FROM {seed_from})"
    ]
    for i in range(2, k + 1):
        prev = f"w{i - 1}"
        rounds.append(
            f"w{i} AS (SELECT {rkey}e.dst AS id, "
            f"(w.s | (1 << {color('e.dst')}))::BIGINT AS s, "
            f"sum(w.cnt)::BIGINT AS cnt "
            f"FROM {prev} w JOIN sym e ON e.src = w.id "
            f"WHERE (w.s & (1 << {color('e.dst')})) = 0 "
            f"GROUP BY ALL)"
        )
    # WITH scoped inside a subquery so the body composes with the
    # shared graph CTE prefix (graph_query wraps it in the outer WITH)
    # final casts: DuckDB's sum() yields HUGEINT, which stringifies
    # differently from Spark's BIGINT in the value-hash harness
    if per_coloring:
        return (
            f"SELECT r, (sum(cnt) // 2)::BIGINT AS colorful_paths, "
            f"(sum(cnt) // 2 * {num} // {den})::BIGINT AS est_paths FROM "
            f"(WITH {', '.join(rounds)} SELECT r, cnt FROM w{k}) t "
            f"GROUP BY r"
        )
    return (
        f"SELECT (sum(cnt) // 2)::BIGINT AS colorful_paths, "
        f"(sum(cnt) // 2 * {num} // {den * n_colorings})::BIGINT "
        f"AS est_paths FROM "
        f"(WITH {', '.join(rounds)} SELECT cnt FROM w{k}) t"
    )


def estimate_ci(per_coloring_rows: list) -> tuple[int, float]:
    """(mean estimate, standard error) from per-coloring exact-integer
    estimates — driver-side math over R rows (R is tiny by design).
    stderr = sample-stddev / sqrt(R), the variance-reduction evidence
    for the R-replicated estimator."""
    xs = [int(r["est_paths"]) for r in per_coloring_rows]
    n = len(xs)
    mean = sum(xs) // n
    if n < 2:
        return mean, 0.0
    var = sum((x - sum(xs) / n) ** 2 for x in xs) / (n - 1)
    return mean, (var / n) ** 0.5


def _rooted_tree(tree_edges: tuple) -> tuple[int, dict[int, list[int]]]:
    """Root the tree at vertex 0; return (k, children-map) in BFS
    order. Raises if the edge set is not a tree on 0..k-1."""
    nodes = sorted({v for e in tree_edges for v in e})
    key = len(nodes)
    if nodes != list(range(key)) or len(tree_edges) != key - 1:
        raise ValueError(f"not a tree on 0..k-1: {tree_edges}")
    adj: dict[int, list[int]] = {v: [] for v in nodes}
    for a, b in tree_edges:
        adj[a].append(b)
        adj[b].append(a)
    children: dict[int, list[int]] = {v: [] for v in nodes}
    seen, order = {0}, [0]
    for v in order:
        for u in adj[v]:
            if u not in seen:
                seen.add(u)
                children[v].append(u)
                order.append(u)
    if len(seen) != key:
        raise ValueError(f"tree not connected: {tree_edges}")
    return key, children


def tree_automorphisms(tree_edges: tuple) -> int:
    """|Aut(T)| by brute force over vertex permutations (k ≤ 7)."""
    import itertools

    nodes = sorted({v for e in tree_edges for v in e})
    es = {frozenset(e) for e in tree_edges}
    return sum(
        1
        for p in itertools.permutations(nodes)
        if all(frozenset((p[a], p[b])) in es for a, b in tree_edges)
    )


def colorful_tree_count(sym_edges: DataFrame, tree_edges: tuple) -> DataFrame:
    """Approximate count of embeddings of an arbitrary k-vertex TREE
    pattern (each unordered copy once) by FASCIA's rooted-subtree
    color-set DP — the general form of :func:`colorful_path_count_dp`.
    Output: one row ``(colorful_trees, est_trees)``.

    Bottom-up over the tree rooted at 0: node t's state
    ``D_t(v, S)`` counts colorful maps of t's subtree with t ↦ v
    using exactly color set ``S``. A child's state lifts to the
    parent through one edge join; siblings combine by SUBSET
    CONVOLUTION (join on the vertex, color sets disjoint) — the
    categorical k≤5 state keeps every intermediate ≤ |V|·2^k rows.
    The root total counts tree→graph maps; dividing by |Aut(T)|
    (exact — colorful copies each produce |Aut| maps) yields copies,
    scaled k^k/k! like every color-coding estimate.
    """
    k, children = _rooted_tree(tree_edges)
    if k not in _SCALE:
        raise ValueError(f"tree must have 3..5 vertices, got {k}")

    def bit_expr(col: str) -> Column:
        return F.expr(
            "shiftleft(1, cast("
            f"cast(conv(substring(md5(cast({col} as string)), 1, 8), 16, 10)"
            f" as bigint) % {k} as int))"
        )

    verts = (
        sym_edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", bit_expr("id").alias("s"), F.lit(1).cast("long").alias("cnt"))
        .persist()
    )
    edges = sym_edges.select("src", "dst")

    def node_state(t: int) -> DataFrame:
        acc = verts  # t's own color bit, count 1
        for ch in children[t]:
            # lift the child's subtree through the (child → t) edge
            lifted = (
                node_state(ch)
                .join(edges.withColumnRenamed("src", "id"), "id")
                .groupBy(F.col("dst").alias("id"), "s")
                .agg(F.sum("cnt").alias("cnt"))
                .withColumnRenamed("s", "cs")
                .withColumnRenamed("cnt", "ccnt")
            )
            # subset convolution: disjoint color sets at the same vertex
            acc = (
                acc.join(lifted, "id")
                .filter(F.col("s").bitwiseAND(F.col("cs")) == 0)
                .groupBy("id", F.col("s").bitwiseOR(F.col("cs")).alias("s"))
                .agg(F.sum(F.col("cnt") * F.col("ccnt")).alias("cnt"))
            )
        return acc

    num, den = _SCALE[k]
    aut = tree_automorphisms(tree_edges)
    out = node_state(0).agg(
        F.expr(f"sum(cnt) div {aut}").alias("colorful_trees"),
        F.expr(f"sum(cnt) div {aut} * {num} div {den}").alias("est_trees"),
    )
    out = out.localCheckpoint(eager=True)
    verts.unpersist()
    return out


def colorful_tree_sql(tree_edges: tuple) -> str:
    """DuckDB body (over the shared ``sym`` CTE) computing exactly
    :func:`colorful_tree_count` — the same rooted-subtree DP unrolled
    into one nested integer/bitmask SQL expression per node."""
    k, children = _rooted_tree(tree_edges)
    num, den = _SCALE[k]
    aut = tree_automorphisms(tree_edges)

    def color_bit(v: str) -> str:
        return (
            f"(1 << (('0x' || substr(md5({v}::VARCHAR), 1, 8))::BIGINT"
            f" % {k}))::BIGINT"
        )

    verts_sql = (
        "SELECT id, "
        f"{color_bit('id')} AS s, 1::BIGINT AS cnt "
        "FROM (SELECT DISTINCT src AS id FROM sym)"
    )

    def node_sql(t: int) -> str:
        acc = verts_sql
        for ch in children[t]:
            lifted = (
                "SELECT e.dst AS id, d.s AS cs, sum(d.cnt)::BIGINT AS ccnt "
                f"FROM ({node_sql(ch)}) d JOIN sym e ON e.src = d.id "
                "GROUP BY 1, 2"
            )
            acc = (
                "SELECT a.id, (a.s | l.cs)::BIGINT AS s, "
                "sum(a.cnt * l.ccnt)::BIGINT AS cnt "
                f"FROM ({acc}) a JOIN ({lifted}) l ON l.id = a.id "
                "WHERE (a.s & l.cs) = 0 GROUP BY 1, 2"
            )
        return acc

    return (
        f"SELECT (sum(cnt) // {aut})::BIGINT AS colorful_trees, "
        f"(sum(cnt) // {aut} * {num} // {den})::BIGINT AS est_trees "
        f"FROM ({node_sql(0)}) root"
    )


def colorful_path_sql(k: int = 4) -> str:
    """DuckDB body (over the shared ``sym`` CTE) computing exactly
    :func:`colorful_path_count` — same md5 colors, same integer
    scale arithmetic."""
    num, den = _SCALE[k]

    def color(v: str) -> str:
        return f"(('0x' || substr(md5({v}::VARCHAR), 1, 8))::BIGINT % {k})"

    joins, preds = [], []
    for lv in range(2, k):
        joins.append(f"JOIN sym e{lv} ON e{lv}.src = e{lv - 1}.dst")
    cols = {0: "e1.src", 1: "e1.dst"}
    for lv in range(2, k):
        cols[lv] = f"e{lv}.dst"
    for i in range(k):
        for j in range(i + 1, k):
            preds.append(f"{color(cols[i])} != {color(cols[j])}")
    preds.append(f"e1.src < {cols[k - 1]}")
    return (
        f"SELECT count(*) AS colorful_paths, "
        f"count(*) * {num} // {den} AS est_paths "
        f"FROM sym e1 {' '.join(joins)} WHERE {' AND '.join(preds)}"
    )
