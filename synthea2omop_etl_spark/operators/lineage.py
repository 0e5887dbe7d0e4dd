"""Lineage truncation — the engine's ONE place for the checkpoint
contract (r13, VERDICT r12 item 10).

Why lineage is cut at all: iterative operators (connected components,
BFS, PageRank, k-means, BPE/unigram training, k-center, coverage,
transitive closure) grow their plan by one join+aggregate per round —
without truncation round N re-executes rounds 1..N-1 and Catalyst
re-optimizes an O(N)-deep tree per round. Funnel operators (dense-id
assignment's ``materialize_input``, source_overlap's reduced layer) cut
lineage so a multiply-consumed subtree executes once.

The default mechanism is ``localCheckpoint``: RDD blocks stored on
EXECUTORS (memory, spilling to executor disk), no distributed
filesystem round-trip. Two caveats that hold at 100 TB and are accepted
deliberately:

- **Executor loss.** localCheckpoint TRUNCATES lineage, so a lost
  executor makes its blocks unrecoverable — the QUERY fails and must be
  rerun (Spark cannot recompute a truncated branch). On local mode
  (bench, tests) executor == driver, so this cannot happen; on a real
  cluster it trades one-query retry risk for never paying HDFS writes
  per round. Long multi-hour jobs on preemptible nodes should set
  ``SPARK_GRAFT_CHECKPOINT_DIR`` (below) instead.
- **Storage.** A cut stores a full copy of the checkpointed frame
  (per-round label tables are small; ``assign_dense_ids(
  materialize_input=True)`` stores one copy of the fact table per write
  — measured cheaper than the double source execution it replaces,
  r12).

Escape hatch: set ``SPARK_GRAFT_CHECKPOINT_DIR=<fault-tolerant path>``
and every ``cut_lineage`` call becomes a RELIABLE ``checkpoint()`` into
that directory — recomputable after executor loss, at the cost of a
write+read per cut. The knob is read per call, so a long-running
session can switch modes between queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage (see module docstring for the contract).

    ``eager=False`` defers materialization to the first downstream
    action (the r12 one-job-per-round pattern: the convergence probe or
    winner take(1) materializes the round's state); note that BOTH
    checkpoint flavors still pay optimizer + physical planning at call
    time even when lazy — keep cuts off per-row paths and out of
    per-round inner loops where a cheaper mechanism (broadcast of the
    small side) works.
    """
    ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckdir:
        sc = df.sparkSession.sparkContext
        if not sc.getCheckpointDir():
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
