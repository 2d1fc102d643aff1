"""Superstep checkpointing with per-partition lineage and metrics.

Iterative DataFrame programs grow their lineage (logical plan) every
superstep; without truncation the plan explodes and the driver OOMs —
a failure mode the reference never faces (it mutates in-place arrays,
``src/common/graph.cc``). Every iterative algorithm here routes its
state through a :class:`CheckpointManager`:

* ``save(state, iteration, metrics)`` writes the state DataFrame to
  ``{dir}/iter=NNNNNN`` as parquet, appends a JSON line to
  ``metrics.jsonl`` carrying the convergence metric *and* per-partition
  lineage (partition → row count), then returns a fresh DataFrame read
  back from disk (lineage truncated to one scan).
* ``latest()`` finds the newest checkpoint so a killed run resumes at
  iteration k+1 instead of restarting — the north rule's
  checkpoint/resume requirement.

In local mode this is plain parquet; on a cluster the same layout
lands on HDFS/S3/Iceberg (path-addressed, atomic via directory commit).
For cheap intra-job truncation without durability,
``truncate="local"`` uses ``localCheckpoint`` instead of parquet.
"""

from __future__ import annotations

import json
import os
import threading
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Below this edge count, AQE's per-action re-planning latency dominates
# a superstep (measured: PageRank at 600k edges runs ~25% faster with
# AQE off — 9.6 s vs 12.7 s best-of-3 at sf0.1); above it, runtime
# coalescing/skew handling pays for the planning cost many times over.
SUPERSTEP_AQE_MIN_EDGES = 50_000_000

# serializes AQE-gated superstep loops within one driver process so
# overlapping loops cannot restore each other's stale conf value
_AQE_GATE_LOCK = threading.Lock()


@contextmanager
def superstep_planning(spark: SparkSession, n_edges: int):
    """Cost-based AQE gating for iterative superstep loops: on small
    graphs the fixed driver-side re-plan per action outweighs any
    runtime optimization of sub-second stages, so AQE is disabled for
    the loop and restored after; at web scale (≥ 50M edges) supersteps
    are seconds-to-minutes and AQE stays on — the same
    measure-then-gate treatment as the query pipeline's
    ``prune="auto"``.

    NOTE: mutates session-level SQL conf for the duration (restored in
    a finally). Gated loops are SERIALIZED per process by a module
    lock (ADVICE r04): two overlapping loops on one session could
    otherwise restore each other's stale value, and a concurrent
    non-loop query would silently lose AQE mid-flight. The lock covers
    the in-repo threat (threaded drivers, streaming queries kicked off
    between supersteps of two algorithms); cross-process sessions are
    independent Spark confs and need nothing."""
    if n_edges >= SUPERSTEP_AQE_MIN_EDGES:
        yield
        return
    with _AQE_GATE_LOCK:
        old = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)


def materialize_with_agg(state: DataFrame, *aggs):
    """Lazy-localCheckpoint ``state`` then run ONE aggregate job that
    both materializes the checkpoint (truncating lineage) and returns
    the scalar ``Row`` — one driver action where an eager save followed
    by a collect would cost two. The building block for fused
    supersteps (convergence delta / dangling mass / normalization sums
    computed in the same barrier that commits the new state)."""
    out = state.localCheckpoint(eager=False)
    row = out.agg(*aggs).collect()[0]
    return out, row


class CheckpointManager:
    def __init__(
        self,
        base_dir: str | None,
        every: int = 5,
        truncate: str = "parquet",
        release_chain: bool = False,
    ):
        """``base_dir=None`` disables durable checkpoints (pure
        localCheckpoint truncation). ``every`` = checkpoint cadence in
        supersteps; intermediate supersteps still truncate lineage
        locally.

        ``release_chain=True`` unpersists each localCheckpoint state
        once it is TWO saves old: a linear superstep chain (state_t
        built from state_{t-1} only) provably never reads a state two
        generations back, so its blocks can be freed the moment
        state_{t+2} is materialized. Without it a long bench session
        accumulates every superseded superstep state in the block
        manager until the Python GC and the ContextCleaner catch up —
        measured as a 30-50% slowdown of late-suite queries. Opt-in
        and enabled ONLY by algorithms whose state chains are audited
        linear (unpersisting a localCheckpoint is irreversible — its
        lineage is truncated, so a late reader would fail, not
        recompute). Callers keeping multiple live states must leave it
        off or call :meth:`detach_chain` at the point the chain's tail
        escapes."""
        self.base_dir = base_dir
        self.every = max(1, every)
        self.truncate = truncate
        self.release_chain = release_chain
        self._chain: list[DataFrame] = []
        if base_dir:
            os.makedirs(base_dir, exist_ok=True)

    def _note(self, out: DataFrame) -> None:
        """Track a freshly-materialized localCheckpoint state; release
        the state two generations back (dead in a linear chain)."""
        if not self.release_chain:
            return
        self._chain.append(out)
        if len(self._chain) > 2:
            old = self._chain.pop(0)
            try:
                old._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:
                pass  # never let bookkeeping break the algorithm

    def detach_chain(self) -> None:
        """Forget (without releasing) the tracked states — call when a
        still-needed state would otherwise age out of the chain (e.g.
        a fixpoint result consumed after a later loop starts)."""
        self._chain = []

    # ------------------------------------------------------------ paths
    def _iter_dir(self, iteration: int) -> str:
        assert self.base_dir is not None
        return os.path.join(self.base_dir, f"iter={iteration:06d}")

    def _metrics_path(self) -> str:
        assert self.base_dir is not None
        return os.path.join(self.base_dir, "metrics.jsonl")

    # ------------------------------------------------------------- save
    def _durable(self, iteration: int, force: bool) -> bool:
        """Single source of truth for the durable-checkpoint cadence
        (shared by save and save_and_agg so they can never drift)."""
        return (
            self.base_dir is not None
            and self.truncate == "parquet"
            and (force or iteration % self.every == 0)
        )

    def save(
        self,
        state: DataFrame,
        iteration: int,
        metrics: dict[str, float | int | str],
        force: bool = False,
    ) -> DataFrame:
        """Persist state if due, log metrics, return lineage-truncated
        state DataFrame."""
        if self._durable(iteration, force):
            path = self._iter_dir(iteration)
            state.write.mode("overwrite").parquet(path)
            out = state.sparkSession.read.parquet(path)
            lineage = [
                {"partition": int(r["p"]), "rows": int(r["rows"])}
                for r in out.groupBy(F.spark_partition_id().alias("p"))
                .agg(F.count("*").alias("rows"))
                .collect()
            ]
            record = {
                "iteration": iteration,
                "ts": time.time(),
                "checkpoint": path,
                # column layout of the saved state (ADVICE r04): a
                # consumer resuming a directory written by an older
                # code era detects schema drift from the meta instead
                # of misreading positional columns (e.g. hits' r03
                # (id, hub, auth) -> r04 (id, auth, h_raw) change)
                "layout": list(state.columns),
                "partitions": lineage,
                **metrics,
            }
            with open(self._metrics_path(), "a") as f:
                f.write(json.dumps(record) + "\n")
            return out
        # truncate lineage every superstep — plans re-analyze whole
        # iteration chains otherwise (measured 5-18× slower with cache-
        # only truncation every 5 steps)
        out = state.localCheckpoint(eager=True)
        self._note(out)
        if self.base_dir is not None:
            record = {"iteration": iteration, "ts": time.time(), **metrics}
            with open(self._metrics_path(), "a") as f:
                f.write(json.dumps(record) + "\n")
        return out

    def save_and_agg(
        self,
        state: DataFrame,
        iteration: int,
        metrics: dict[str, float | int | str],
        aggs: list,
        force: bool = False,
    ):
        """Materialize ``state`` AND compute aggregate scalars in ONE
        driver action: ``(state', Row)``.

        Non-durable supersteps mark the state with a *lazy*
        ``localCheckpoint`` and run the aggregate on it — the aggregate
        job materializes the checkpoint blocks as a side effect, so the
        superstep costs one barrier instead of save-then-collect's two.
        Durable supersteps fall back to ``save`` (the parquet write is
        itself the materializing action) plus a cheap scan of the
        freshly written files for the aggregate.
        """
        if self._durable(iteration, force):
            out = self.save(state, iteration, metrics, force=force)
            return out, out.agg(*aggs).collect()[0]
        out, row = materialize_with_agg(state, *aggs)
        self._note(out)
        if self.base_dir is not None:
            record = {"iteration": iteration, "ts": time.time(), **metrics}
            with open(self._metrics_path(), "a") as f:
                f.write(json.dumps(record) + "\n")
        return out, row

    def log(self, iteration: int, metrics: dict[str, float | int | str]) -> None:
        """Append a metrics-only record (no state write)."""
        if self.base_dir is None:
            return
        record = {"iteration": iteration, "ts": time.time(), **metrics}
        with open(self._metrics_path(), "a") as f:
            f.write(json.dumps(record) + "\n")

    # ----------------------------------------------------------- resume
    def latest(self, spark: SparkSession) -> tuple[int, DataFrame] | None:
        """Newest durable checkpoint as ``(iteration, state)`` or None."""
        if self.base_dir is None or not os.path.isdir(self.base_dir):
            return None
        iters = sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.base_dir)
            if d.startswith("iter=")
            and os.path.exists(os.path.join(self.base_dir, d, "_SUCCESS"))
        )
        if not iters:
            return None
        k = iters[-1]
        return k, spark.read.parquet(self._iter_dir(k))

    def metrics(self) -> list[dict]:
        if self.base_dir is None:
            return []
        path = self._metrics_path()
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
