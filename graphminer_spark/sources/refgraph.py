"""Loader for the reference's on-disk CSR graph format.

Format (documented at ``/root/reference/README.md:84-101``, reader at
``src/common/graph.cc:21-35``): ``graph.meta.txt`` text header (nv, ne,
then vid/eid/vlabel/elabel byte widths on one line, max_degree,
feat_len, #vertex classes, #edge classes), ``graph.vertex.bin`` =
int64 row pointers (nv+1), ``graph.edge.bin`` = int32 column indices
(ne), optional ``graph.vlabel.bin`` = uint8 labels.

Used as a format-compat fixture: round-trips the bundled citeseer
graph into our edge DataFrame and checks the published golden counts
(``src/triangle/README.md:53`` etc.).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def read_meta(prefix: str) -> dict:
    with open(os.path.join(prefix, "graph.meta.txt")) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    nv, ne = int(lines[0]), int(lines[1])
    widths = [int(x) for x in lines[2].split()]
    return {
        "nv": nv,
        "ne": ne,
        "vid_size": widths[0],
        "eid_size": widths[1],
        "vlabel_size": widths[2] if len(widths) > 2 else 0,
        "elabel_size": widths[3] if len(widths) > 3 else 0,
        "max_degree": int(lines[3]),
    }


def load_ref_graph(
    spark: SparkSession, prefix: str, with_vlabels: bool = False
) -> tuple[DataFrame, DataFrame]:
    """→ ``(vertices(id[, vlabel]), edges(src, dst))`` — directed edges
    exactly as stored (citeseer stores both directions of each
    undirected edge)."""
    meta = read_meta(prefix)
    assert meta["vid_size"] == 4 and meta["eid_size"] == 8, meta
    rowptr = np.fromfile(
        os.path.join(prefix, "graph.vertex.bin"), dtype=np.int64
    )
    col = np.fromfile(os.path.join(prefix, "graph.edge.bin"), dtype=np.int32)
    assert len(rowptr) == meta["nv"] + 1 and len(col) == meta["ne"]
    src = np.repeat(
        np.arange(meta["nv"], dtype=np.int64), np.diff(rowptr)
    )
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": col.astype(np.int64)})
    )
    vdata = {"id": np.arange(meta["nv"], dtype=np.int64)}
    if with_vlabels and os.path.exists(os.path.join(prefix, "graph.vlabel.bin")):
        vdata["vlabel"] = np.fromfile(
            os.path.join(prefix, "graph.vlabel.bin"), dtype=np.uint8
        ).astype(np.int32)
    vertices = spark.createDataFrame(pd.DataFrame(vdata))
    return vertices, edges
