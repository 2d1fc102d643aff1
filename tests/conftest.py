from __future__ import annotations

import pytest

from graphminer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("graphminer-tests", cores=8, shuffle_partitions=8)
    yield s


def edges_df(spark, edges):
    """Canonical (src<dst) edge DataFrame from a python edge list."""
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    return spark.createDataFrame(canon, "src long, dst long")
