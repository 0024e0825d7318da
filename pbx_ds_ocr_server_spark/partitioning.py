"""Input-parallelism guard for compute-heavy operators over narrow frames.

A single-row-group parquet file (or a filter that collapses to few splits)
scans as ONE partition no matter how many cores the cluster has — and every
operator consuming it then runs its per-row compute (regex tokenization,
shingle explode, Arrow-batched kernels) on one core. ``files.
maxPartitionBytes`` can't split below row-group granularity, so the honest
fix is an explicit round-robin repartition of the NARROW input (ids + text —
never raw payload blobs, whose shuffle costs ~3× end-to-end, SURVEY.md §4).

A second, subtler win: the repartition exchange materializes shuffle files
that every downstream consumer re-reads (ReusedExchange), so an operator
that references its input subplan N times (e.g. the Jaccard shingle
relation feeding the DF-cap aggregate, the sizes aggregate and both
self-join sides) computes the expensive projection ONCE instead of N times.

At real scale the input has thousands of splits and the guard is a no-op
(`getNumPartitions() >= target` short-circuits without a job).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Logical-plan node names that imply a shuffle (or an explicit partitioning
# the caller chose). Anchored to the start-of-line tree prefix (spaces and
# the :- / +- connectors) so identifiers like ``Sorted#3`` inside a node's
# expression list cannot match.
_SHUFFLE_NODE_RE = re.compile(
    r"(?m)^[ :+\-]*(?:"
    r"Join|Aggregate|Window|Sort|Repartition(?:ByExpression)?|"
    r"RebalancePartitions|Deduplicate|Intersect|Except"
    r")\b"
)


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's shuffle
    parallelism when the plan would otherwise produce fewer partitions.
    Explicit-N repartitions are respected by AQE (never coalesced back).
    Use ONLY on narrow frames (small rows); payload rebalancing belongs to
    the storage layer (sources/writer.py bucketed staging)."""
    if target is None:
        target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # eleventh-review fix: probing df.rdd under AQE finalizes the adaptive
    # plan, which EXECUTES every upstream shuffle stage — and the real
    # action then re-runs them (no exchange reuse across executions). A
    # plan that already contains a shuffle-producing node emerges at
    # shuffle parallelism anyway, so only probe pure scan/project/filter
    # plans, where df.rdd is free. (Tradeoff: a broadcast join over a
    # single-split scan keeps its one partition — fan the SCAN out before
    # joining in that composition.)
    # Node names are matched at tree positions (line start + the :/+/-
    # tree-drawing prefix), not as bare substrings: attribute names are
    # printed inside the same string, so a column called ``Sorted`` or
    # ``joinId`` must NOT suppress the fan-out (it appears mid-line inside
    # the node's bracketed expression list, never at the node position).
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if _SHUFFLE_NODE_RE.search(plan):
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
