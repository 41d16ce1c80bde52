"""Network analysis over vector layers — the GNM tier.

Re-expresses ``/root/reference/gnm/gnmgraph.cpp``: DijkstraShortestPath
(:185) and ConnectedComponents (:375) over a network built from vector
features. The reference runs in-memory Dijkstra on one machine; the
Spark-first shape is iterative edge relaxation (distributed
Bellman-Ford / Pregel): the frontier DataFrame joins the edge table on
the node key each round, min-reduces, and localCheckpoints to keep the
plan flat — the same lineage-truncation move the polygonize label
propagation uses. Work per round is one shuffle on the skinny
(node, dist) pairs; rounds are bounded by the graph diameter, and
convergence is detected from the relaxation count, so a 100 TB road
network with diameter ~1e3 runs ~1e3 bounded shuffles regardless of
edge count.

Connected components are already first-class elsewhere in the repo
(dedup.near_dup_groups, polygonize union-find); this module adds the
weighted-path tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shortest_paths(edges: DataFrame, source, max_rounds: int = 64,
                   directed: bool = True) -> DataFrame:
    """Single-source shortest paths by iterative relaxation.

    edges: (src LONG, dst LONG, w DOUBLE/LONG) — non-negative weights.
    Returns (node, dist) for every node reachable from ``source``.
    Stops early when a round relaxes nothing.
    """
    spark = edges.sparkSession
    if not directed:
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst"), "w")
        )
    edges = edges.select("src", "dst", "w").localCheckpoint()

    dist = spark.createDataFrame([(int(source), 0)], "node LONG, dist LONG") \
        .withColumn("dist", F.col("dist").cast("double"))

    for _ in range(max_rounds):
        relaxed = (
            dist.join(edges, dist["node"] == edges["src"])
            .select(F.col("dst").alias("node"),
                    (F.col("dist") + F.col("w")).alias("dist"))
        )
        new = (
            dist.unionByName(relaxed)
            .groupBy("node").agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
        # converged when no node improved and none was added: compare
        # the (count, sum) fingerprint — dist only ever shrinks
        a = dist.agg(F.count("*"), F.sum("dist")).first()
        b = new.agg(F.count("*"), F.sum("dist")).first()
        dist = new
        if (a[0], a[1]) == (b[0], b[1]):
            break
    return dist
