"""Graph-sampling sources (the KDD'06 "Sampling from Large Graphs"
family the reference lists in ``src/approx/README.md``): deterministic
random-walk and forest-fire samplers, usable as reusable sources for
any downstream workload.

Determinism: every "random" choice is an md5-derived integer (the
DOULION trick, same as ``triangles.approx_triangle_count``), so runs
are reproducible across parallelism levels AND the random-walk sampler
is SQL-expressible — the DuckDB oracle unrolls the same hash-indexed
neighbor steps (``random_walk_sql``).

Scale: each walk step is one equi-join of the frontier against the
ranked adjacency (no driver loop state beyond the step counter, no
collect); forest-fire rounds are frontier semi-joins — both are the
BFS superstep shape that survives a 1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h(key: Column) -> Column:
    """Deterministic non-negative integer from a string key (md5 first
    8 hex chars), reproducible in DuckDB as
    ``('0x' || substr(md5(k), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def ranked_adjacency(sym_edges: DataFrame) -> DataFrame:
    """``(src, dst, nbr_rank, deg)`` — neighbors ranked 1..deg in dst
    order; the indexable adjacency both samplers draw from."""
    w = Window.partitionBy("src").orderBy("dst")
    return (
        sym_edges.select("src", "dst")
        .withColumn("nbr_rank", F.row_number().over(w))
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
    )


def random_walk_sample(
    sym_edges: DataFrame, walk_len: int = 3, seed_mod: int = 20
) -> DataFrame:
    """Deterministic random-walk trajectories → ``(walk_id, step, v)``.

    Seeds are vertices with ``md5(id) % seed_mod == 0`` (one walk per
    seed, ``walk_id`` = seed vertex). At step t the walk at vertex v
    moves to the neighbor whose rank is ``md5(walk_id:t:v) % deg(v)``
    — a pure function of (walk, step, position), so the trajectory is
    reproducible anywhere, including in the SQL oracle. Sampled-edge /
    induced-subgraph views derive from the trajectory with one
    ``distinct``. Each step is one broadcast-or-shuffle equi-join of
    the O(#seeds) frontier against the ranked adjacency — frontier
    never grows, so walk_len bounds total work linearly."""
    adj = ranked_adjacency(sym_edges)
    verts = sym_edges.select(F.col("src").alias("v")).distinct()
    frontier = verts.filter(_h(F.col("v").cast("string")) % seed_mod == 0)
    frontier = frontier.select(
        F.col("v").alias("walk_id"), F.lit(0).alias("step"), "v"
    )
    out = [frontier]
    for t in range(1, walk_len + 1):
        key = F.concat_ws(
            ":",
            F.col("walk_id").cast("string"),
            F.lit(str(t)),
            F.col("v").cast("string"),
        )
        frontier = (
            frontier.join(adj, frontier["v"] == adj["src"])
            .filter(F.col("nbr_rank") == (_h(key) % F.col("deg")) + 1)
            .select(
                "walk_id", F.lit(t).alias("step"), F.col("dst").alias("v")
            )
        )
        out.append(frontier)
    res = out[0]
    for f in out[1:]:
        res = res.unionAll(f)
    return res


def random_walk_sql(walk_len: int = 3, seed_mod: int = 20) -> str:
    """DuckDB body (over the shared ``sym`` CTE) mirroring
    :func:`random_walk_sample` exactly — same ranked adjacency, same
    md5 step choices, unrolled ``walk_len`` times."""

    def h(key: str) -> str:
        return f"(('0x' || substr(md5({key}), 1, 8))::BIGINT)"

    steps = [
        "adj AS MATERIALIZED (SELECT src, dst, "
        "row_number() OVER (PARTITION BY src ORDER BY dst) AS nbr_rank, "
        "count(*) OVER (PARTITION BY src) AS deg FROM sym)",
        f"f0 AS (SELECT v AS walk_id, 0 AS step, v FROM "
        f"(SELECT DISTINCT src AS v FROM sym) "
        f"WHERE {h('v::VARCHAR')} % {seed_mod} = 0)",
    ]
    for t in range(1, walk_len + 1):
        key = f"f.walk_id::VARCHAR || ':' || '{t}' || ':' || f.v::VARCHAR"
        steps.append(
            f"f{t} AS (SELECT f.walk_id, {t} AS step, adj.dst AS v "
            f"FROM f{t - 1} f JOIN adj ON adj.src = f.v "
            f"AND adj.nbr_rank = ({h(key)} % adj.deg) + 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM f{t}" for t in range(walk_len + 1)
    )
    return (
        f"SELECT walk_id, step::INT AS step, v FROM "
        f"(WITH {', '.join(steps)} {union}) t"
    )


def forest_fire_sample(
    sym_edges: DataFrame,
    n_rounds: int = 3,
    burn_bp: int = 4000,
    seed_mod: int = 50,
) -> DataFrame:
    """Deterministic forest-fire sample → burned vertices ``(v,
    burn_round)`` (round 0 = seeds, ``md5(id) % seed_mod == 0``).

    Each round, fire spreads across an edge (u burned → w) iff
    ``md5(u:w:round) % 10000 < burn_bp`` (the burn probability in
    basis points) and w is not yet burned — an anti-join against the
    burned set, the standard frontier-BFS shape. Biased toward dense
    regions like the KDD'06 sampler; bounded by ``n_rounds``
    supersteps."""
    verts = sym_edges.select(F.col("src").alias("v")).distinct()
    burned = verts.filter(_h(F.col("v").cast("string")) % seed_mod == 0)
    burned = burned.select("v", F.lit(0).alias("burn_round"))
    burned = burned.localCheckpoint(eager=True)
    frontier = burned.select("v")
    edges = sym_edges.select("src", "dst")
    for r in range(1, n_rounds + 1):
        key = F.concat_ws(
            ":",
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.lit(str(r)),
        )
        spread = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .filter(_h(key) % 10_000 < burn_bp)
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(burned.select("v"), "v", "left_anti")
            .select("v", F.lit(r).alias("burn_round"))
        )
        burned = burned.unionAll(spread).localCheckpoint(eager=True)
        frontier = spread.select("v")
    return burned


def forest_fire_sql(
    n_rounds: int = 3, burn_bp: int = 4000, seed_mod: int = 50
) -> str:
    """DuckDB body (over the shared ``sym`` CTE) mirroring
    :func:`forest_fire_sample` exactly — seeds, then ``n_rounds``
    unrolled spread/anti-join/accumulate steps."""

    def h(key: str) -> str:
        return f"(('0x' || substr(md5({key}), 1, 8))::BIGINT)"

    ctes = [
        f"b0 AS (SELECT v, 0 AS burn_round FROM "
        f"(SELECT DISTINCT src AS v FROM sym) "
        f"WHERE {h('v::VARCHAR')} % {seed_mod} = 0)",
        "f0 AS (SELECT v FROM b0)",
    ]
    for r in range(1, n_rounds + 1):
        key = (
            f"e.src::VARCHAR || ':' || e.dst::VARCHAR || ':' || '{r}'"
        )
        ctes.append(
            f"s{r} AS (SELECT DISTINCT e.dst AS v FROM f{r - 1} f "
            f"JOIN sym e ON e.src = f.v "
            f"WHERE {h(key)} % 10000 < {burn_bp})"
        )
        ctes.append(
            f"n{r} AS (SELECT s.v, {r} AS burn_round FROM s{r} s "
            f"WHERE s.v NOT IN (SELECT v FROM b{r - 1}))"
        )
        ctes.append(
            f"b{r} AS (SELECT * FROM b{r - 1} UNION ALL SELECT * FROM n{r})"
        )
        ctes.append(f"f{r} AS (SELECT v FROM n{r})")
    return (
        f"SELECT v, burn_round::INT AS burn_round FROM "
        f"(WITH {', '.join(ctes)} SELECT * FROM b{n_rounds}) t"
    )
