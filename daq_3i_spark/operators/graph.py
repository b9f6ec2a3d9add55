"""Distributed connected components: alternating large-star / small-star.

The two-phase star-contraction algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public paper): each round
rewires every node's neighborhood toward its minimum neighbor, and the
alternation converges in O(log^2 n) rounds REGARDLESS of graph diameter —
the property plain min-label propagation lacks (a depth-d duplicate chain
costs d propagation rounds but only ~log d star rounds).

Both phases are pure DataFrame ops shuffled on the node id:

* large-star: for each node u, connect every strictly-larger neighbor
  v > u to m(u) = min(neighborhood(u) + {u});
* small-star: orient each edge toward its smaller endpoint, then for each
  node u connect its smaller neighbors (and u itself) to their minimum.

Every emitted edge (a, b) keeps a < b, so the edge set stays canonical and
convergence is a set-equality check.  At 100 TB each round is two
shuffle-on-key aggregates over the (shrinking) edge list; lineage is cut
per round with localCheckpoint (reliable checkpoint / Delta on a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAX_ROUNDS = 25  # >> log^2 of any plausible component count; safety stop


def _large_star(e: DataFrame) -> DataFrame:
    # directed neighborhoods: u -> every neighbor v
    nbrs = e.select("u", "v").unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = nbrs.groupBy("u").agg(F.min("v").alias("__mv"))
    m = m.select("u", F.least("__mv", "u").alias("__m"))
    return (
        nbrs.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("__m").alias("u"), F.col("v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient toward the smaller endpoint: edges (u, v) with v < u
    down = e.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u > v
    m = down.groupBy("u").agg(F.min("v").alias("__m"))
    rewired = (
        down.join(m, "u")
        .select(F.col("__m").alias("u"), F.col("v").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    self_edge = m.select(F.col("__m").alias("u"), F.col("u").alias("v")).filter(
        F.col("u") != F.col("v")
    )
    return rewired.unionByName(self_edge).distinct()


def star_components(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) edge pairs -> (doc_id, component) with component = the
    minimum doc_id reachable in the undirected graph.

    Isolated nodes never appear in ``pairs`` and so never appear in the
    result — same contract as min-label propagation over the pair graph.
    """
    e = (
        pairs.select(
            F.least("doc_a", "doc_b").alias("u"),
            F.greatest("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(_MAX_ROUNDS):
        new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # canonical edge sets -> set equality == symmetric difference empty;
        # both sides are tiny star lists by the time this matters
        if new.exceptAll(e).unionByName(e.exceptAll(new)).isEmpty():
            e = new
            converged = True
            break
        e = new
    if not converged:
        # a partially-contracted edge list yields WRONG component labels
        # (members of one component split across non-minimal labels) with
        # no other symptom — fail loudly instead (the codec-registry /
        # IVF-guard convention).  O(log^2 n) rounds bounds any real corpus
        # far under _MAX_ROUNDS; hitting this means the input or the
        # contraction is broken, not that the graph is merely large.
        raise RuntimeError(
            f"star_components did not converge in {_MAX_ROUNDS} rounds — "
            "refusing to emit a partially-contracted (wrong) labeling"
        )
    # converged: every edge is (component-min, node)
    members = e.select(F.col("v").alias("doc_id"), F.col("u").alias("component"))
    centers = (
        e.select(F.col("u").alias("doc_id")).distinct()
        .withColumn("component", F.col("doc_id"))
    )
    return members.unionByName(centers).distinct()
