"""Distributed graph operators: iterative-frontier BFS / bounded transitive
closure.

This is the Spark-native form of the reference's genuinely recursive
operators (qa/ask.py:211-223 `downstream_closure`, :325-340
`bfs_downstream_scripts`): Spark has no recursive CTE, so the closure is a
driver loop of frontier joins with early termination. The same helper powers
the lineage-engine column/script closures in `..lineage.graphqa`.

Scale notes: each hop is one shuffle join keyed on the edge source; the
frontier is deduplicated per hop so work is proportional to newly reached
nodes. For deep graphs, `localCheckpoint` every few hops truncates the
lineage chain (plan growth is the classic iterative-Spark failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register


def bfs_closure(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-depth min-depth closure.

    edges: (src, dst). seeds: (seed,) — seed node ids.
    Returns (seed, node, depth) with the minimum depth ≤ max_depth at which
    `node` is reachable from `seed` (depth ≥ 1; seeds themselves excluded,
    mirroring qa/ask.py:211-223 which yields only downstream nodes).

    Iteration discipline (the classic iterative-Spark failure modes, both
    handled here):
    * the edge list is localCheckpoint-ed ONCE up front — otherwise every hop
      re-executes the full upstream plan that produced it (for lineage
      closures that plan includes the AST-extraction UDF; for event chains a
      window over the whole table);
    * each frontier is localCheckpoint-ed — the emptiness probe and the next
      hop's join then read materialized partitions instead of recursively
      recomputing join(join(join(...))), which otherwise grows the lineage
      (and runtime) exponentially with depth.
    """
    edges = edges.select(
        F.col(src).alias("__bfs_src"), F.col(dst).alias("__bfs_dst")
    ).localCheckpoint(eager=True)
    frontier = seeds.select(
        F.col("seed"), F.col("seed").alias("node"), F.lit(0).alias("depth")
    ).localCheckpoint(eager=True)
    reached = frontier
    for depth in range(1, max_depth + 1):
        f, e = frontier.alias("f"), edges.alias("e")
        nxt = (
            f.join(e, F.col("f.node") == F.col("e.__bfs_src"))
            .select(
                F.col("f.seed").alias("seed"),
                F.col("e.__bfs_dst").alias("node"),
                F.lit(depth).alias("depth"),
            )
            .distinct()
        )
        # keep only newly discovered (seed, node) pairs -> min-depth semantics
        nxt = nxt.join(
            reached.select("seed", "node"), ["seed", "node"], "left_anti"
        ).localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt)
        frontier = nxt
    return reached.filter(F.col("depth") > 0)


@register(
    "event_chain_closure",
    bench=True,
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT event_id AS src,
             LEAD(event_id) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC) AS dst
      FROM events
    ),
    e AS (SELECT src, dst FROM edges WHERE dst IS NOT NULL),
    seeds AS (SELECT event_id AS seed FROM events WHERE event_id % 97 = 0),
    closure AS (
      SELECT s.seed, s.seed AS node, 0 AS depth FROM seeds s
      UNION ALL
      SELECT c.seed, e.dst AS node, c.depth + 1 AS depth
      FROM closure c JOIN e ON c.node = e.src
      WHERE c.depth < 6
    )
    SELECT seed, node, depth FROM closure WHERE depth > 0
    """,
)
def event_chain_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closure over the per-user successive-event chain from sampled seeds.

    The event chain is a path graph (unique successor), so min-depth BFS and
    the recursive-CTE oracle enumerate the identical (seed, node, depth) set.
    """
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us").asc(), F.col("event_id").asc())
    edges = (
        events.select("event_id", F.lead("event_id").over(w).alias("dst"))
        .filter(F.col("dst").isNotNull())
        .select(F.col("event_id").alias("src"), "dst")
    )
    seeds = events.filter(F.col("event_id") % 97 == 0).select(F.col("event_id").alias("seed"))
    return bfs_closure(edges, seeds, max_depth=6)
