"""Graph traversal over the way node graph: BFS hop distances.

The road-network half of an OSM engine: ways induce an undirected node
graph (consecutive member nodes are edges); reachability and hop
distance from a seed set answer "which elements are connected to this
network component, and how far" — the substrate of routing, component
QA (detached islands), and service-area queries.

Spark-first shape (the dedup_components / knn-round discipline):

- Frontier BFS: the next frontier is (frontier ⋈ edges) minus settled
  nodes; its count is carried in Python like knn's certification
  aggregate.
- EVERY new frontier is localCheckpoint(eager=True)-truncated. This is
  load-bearing, not hygiene: each hop's plan references the previous
  hop's, so without per-hop truncation the LOGICAL plan doubles every
  hop and Catalyst's re-analysis goes exponential long before the data
  does (measured: a 30-node path at 6 hops took 111 s with persist()
  only, ~1 s/hop truncated — persist caches data, not plans). The
  settled set is then a union of FLAT checkpointed legs (linear plan
  growth), re-flattened every 4 hops.
- The edge list is used as-is (duplicate edges are harmless: the
  frontier join deduplicates targets with a distinct on the NEW
  frontier only — bounded by the frontier, never the edge count).

Scale: each hop shuffles (frontier × mean-degree) narrow rows for the
join plus the anti-join against settled; hub nodes fan out to distinct
targets (no hot reducer). max_hops bounds the loop; the function
reports whether it converged (empty frontier) so callers can tell a
cut traversal from a finished one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hop_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 10,
    src: str = "a",
    dst: str = "b",
    node_col: str = "node_id",
) -> DataFrame:
    """(node_id, hops) for every node reachable from ``sources`` within
    ``max_hops`` over the UNDIRECTED edge list ``edges(a, b)`` —
    classic BFS layers: hops = minimum edge count from any source.
    Sources themselves are hops = 0. Unreached nodes are absent.

    ``edges`` may contain duplicates and self-loops (both harmless);
    direction is symmetrized internally."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    und = edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b")).unionByName(
        edges.select(F.col(dst).alias("_a"), F.col(src).alias("_b"))
    ).persist()
    settled = (
        sources.select(F.col(node_col).alias("node_id"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = settled.select("node_id")
    n_frontier = frontier.count()
    for h in range(1, max_hops + 1):
        if n_frontier == 0:
            break
        # eager checkpoint = the hop's one job; truncates the plan so
        # the next hop's analysis cost stays flat (see module docstring)
        nxt = (
            frontier.join(und, frontier["node_id"] == und["_a"], "inner")
            .select(F.col("_b").alias("node_id"))
            .distinct()
            .join(settled, "node_id", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        n_frontier = nxt.count()  # cheap: scans the checkpointed blocks
        settled = settled.unionByName(nxt)
        if h % 4 == 0:
            # re-flatten the (already flat-legged) union chain
            settled = settled.localCheckpoint(eager=True)
        frontier = nxt.select("node_id")
    out = settled.localCheckpoint(eager=True)
    und.unpersist()
    return out
