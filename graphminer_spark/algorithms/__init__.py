from graphminer_spark.algorithms.triangles import (  # noqa: F401
    enumerate_triangles,
    per_edge_triangles,
    triangle_count,
)
