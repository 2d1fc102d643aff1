from graphminer_spark.graph.build import (  # noqa: F401
    build_dag,
    degrees,
    symmetrize,
)
from graphminer_spark.graph.tpch_edges import tpch_edges  # noqa: F401
