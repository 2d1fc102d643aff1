"""Snapshot-versioned parquet table sink — the Iceberg-style results
layer the north rule asks for ("checkpointed … with per-partition
lineage and convergence metrics for resumable runs"), reduced to its
load-bearing core with zero non-baked dependencies:

* every write is an immutable snapshot: a new data directory plus a
  JSON manifest recording the parent snapshot, the schema, and one
  entry PER DATA FILE (rows, bytes, min/max of a nominated key column
  from the parquet footers — the file-pruning statistics an engine
  needs to skip files on key predicates);
* a ``current`` pointer makes the latest snapshot the default read;
* time travel = read any older snapshot id; lineage = walk the
  parent chain.

The LAYOUT ports to object storage unchanged (manifests are tiny
driver-side JSON, data files are whatever the executors wrote, commit
is one atomic pointer swap — the Iceberg commit model); the driver-side
file I/O here (``os`` + local pyarrow footers) is the local-FS
implementation and would swap to the Hadoop FileSystem API on s3/gs,
where the "atomic rename" becomes a conditional put.
``CheckpointManager`` covers the *iteration state* side; this module
covers the *results table* side.

Reference: results/metrics sinks in the runner scripts
(``/root/reference/scripts/run_*.py`` write flat result files); the
snapshot chain is the scale-path upgrade.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "snapshots")


def _data_dir(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(table_dir, "data", f"snap-{snapshot_id:06d}")


def _current_path(table_dir: str) -> str:
    return os.path.join(table_dir, "current.json")


def _file_stats(data_dir: str, key_col: str | None) -> list[dict]:
    import pyarrow.parquet as pq

    entries = []
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(data_dir, name)
        md = pq.ParquetFile(path).metadata
        entry: dict = {
            "file": name,
            "rows": md.num_rows,
            "bytes": os.path.getsize(path),
        }
        if key_col is not None and md.num_row_groups > 0:
            lo = hi = None
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    if col.path_in_schema == key_col and col.statistics:
                        s = col.statistics
                        if s.has_min_max:
                            lo = s.min if lo is None else min(lo, s.min)
                            hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                entry["key_min"], entry["key_max"] = lo, hi
        entries.append(entry)
    return entries


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    key_col: str | None = None,
    metrics: dict | None = None,
) -> int:
    """Write ``df`` as the table's next immutable snapshot; returns the
    new snapshot id. Single-writer semantics (the commit is the final
    ``current.json`` swap — readers before it see the old snapshot)."""
    cur = current_snapshot_id(table_dir)
    snap_id = (cur or 0) + 1
    data_dir = _data_dir(table_dir, snap_id)
    # a crashed previous attempt leaves data files with no manifest and
    # no pointer swap — uncommitted by definition, safe to reclaim
    # (single-writer semantics); never touches committed snapshots
    if os.path.isdir(data_dir) and not os.path.exists(
        os.path.join(_manifest_dir(table_dir), f"{snap_id:06d}.json")
    ):
        import shutil

        shutil.rmtree(data_dir)
    df.write.mode("error").parquet(data_dir)
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": cur,
        "schema": df.schema.simpleString(),
        "files": _file_stats(data_dir, key_col),
        "key_col": key_col,
        "metrics": metrics or {},
    }
    manifest["row_count"] = sum(f["rows"] for f in manifest["files"])
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    mpath = os.path.join(_manifest_dir(table_dir), f"{snap_id:06d}.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1)
    tmp = _current_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": snap_id}, f)
    os.replace(tmp, _current_path(table_dir))  # atomic commit
    return snap_id


def current_snapshot_id(table_dir: str) -> int | None:
    try:
        with open(_current_path(table_dir)) as f:
            return int(json.load(f)["snapshot_id"])
    except FileNotFoundError:
        return None


def read_manifest(table_dir: str, snapshot_id: int) -> dict:
    with open(
        os.path.join(_manifest_dir(table_dir), f"{snapshot_id:06d}.json")
    ) as f:
        return json.load(f)


def read_snapshot(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read the current snapshot, or time-travel to ``snapshot_id``."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no snapshot committed under {table_dir}")
    return spark.read.parquet(_data_dir(table_dir, sid))


def snapshot_lineage(table_dir: str) -> list[dict]:
    """Manifests from current back to the root (newest first)."""
    out: list[dict] = []
    sid = current_snapshot_id(table_dir)
    while sid is not None:
        m = read_manifest(table_dir, sid)
        out.append(m)
        sid = m["parent_id"]
    return out


def prune_files(table_dir: str, lo, hi, snapshot_id: int | None = None) -> list[str]:
    """File-level pruning from manifest statistics: data files of the
    snapshot whose ``[key_min, key_max]`` range intersects ``[lo, hi]``
    — what a scan planner would read for a key-range predicate."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    m = read_manifest(table_dir, sid)
    keep = []
    for f in m["files"]:
        if "key_min" not in f or (f["key_min"] <= hi and f["key_max"] >= lo):
            keep.append(f["file"])
    return keep
