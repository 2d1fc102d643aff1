"""Named filter strategies (``src/query/filter.h:10-22`` —
GQL/CFL/DPiso/NLF/TSO/CECI). All schemes are *filters*: they may never
change the answer, only the plan — asserted by agreement across every
strategy on a labeled fixture. The CECI property (candidate-edge
index: extension edges pre-filtered by both endpoint candidate sets)
is asserted on the optimized plan: Catalyst pushes the candidate
semi-joins below the extension join onto the edge scan itself."""

from __future__ import annotations

import random

import pytest

from graphminer_spark.algorithms.subgraph import (
    FILTER_STRATEGIES,
    PatternSpec,
    count_matches,
    match_embeddings,
)
from graphminer_spark.graph.build import symmetrize
from tests.conftest import edges_df

LTRI = PatternSpec(name="ltri", n=3, edges=((0, 1), (1, 2), (0, 2)), vlabels=(0, 1, 2))
LPATH4 = PatternSpec(
    name="lpath4", n=4, edges=((0, 1), (1, 2), (2, 3)), vlabels=(0, 1, 1, 0)
)


def _fixture(spark, n=150, m=700, seed=11, n_labels=4):
    rng = random.Random(seed)
    raw = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    e = edges_df(spark, raw)
    # skewed labels so the cost gate would also engage the stage
    verts = spark.createDataFrame(
        [(i, 0 if i % 7 else rng.randrange(n_labels)) for i in range(n)],
        "id long, vlabel int",
    )
    return symmetrize(e, dedup=False), verts


@pytest.mark.parametrize("spec", [LTRI, LPATH4], ids=lambda s: s.name)
def test_all_strategies_agree(spark, spec):
    sym, verts = _fixture(spark)
    counts = {
        name: count_matches(sym, spec, verts, strategy=name).collect()[0][0]
        for name in sorted(FILTER_STRATEGIES)
    }
    baseline = count_matches(sym, spec, verts, prune=False).collect()[0][0]
    assert all(c == baseline for c in counts.values()), counts


def test_unknown_strategy_rejected(spark):
    sym, verts = _fixture(spark)
    with pytest.raises(ValueError):
        match_embeddings(sym, LTRI, verts, strategy="bogus")


def test_ceci_candidate_edge_pushdown(spark):
    """The candidate semi-joins must sit BELOW the extension inner
    joins in the optimized plan — i.e. every edge scan that feeds an
    extension is pre-filtered by its endpoint candidate sets (the
    CECI candidate-edge index, obtained from the optimizer rather
    than a hand-built index). Guard it: a Spark upgrade or a plan
    change that breaks the pushdown silently turns the filter stage
    into post-join work."""
    sym, verts = _fixture(spark)
    emb = match_embeddings(sym, LTRI, verts, strategy="ceci")
    plan = emb._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    first_inner = min(
        i for i, l in enumerate(lines) if "Join Inner" in l
    )
    semis_below = [
        i for i, l in enumerate(lines) if "Join LeftSemi" in l and i > first_inner
    ]
    # deeper tree lines = larger indices; the semi filters must appear
    # in the subtrees UNDER the inner joins (scan side), and none may
    # sit above the first inner join
    semis_above = [
        i for i, l in enumerate(lines) if "Join LeftSemi" in l and i < first_inner
    ]
    assert semis_below and not semis_above, plan[:2000]
