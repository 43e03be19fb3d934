"""Graph query surface: connected components over relationally
derived edge sets, verified against recursive-CTE oracles.

The edge derivation deliberately builds *chains* (window lag over
sorted members of a group) rather than all-pairs cliques: a chain
has identical connected components to the clique at O(k) instead of
O(k²) edges — the same scale decision as the clique star expansion
(SURVEY.md §7.3).  The DuckDB oracle computes components by
transitive closure + min; our engine runs the alternating-star
kernel — two independent algorithms agreeing is the differential
test the reference ran against GraphX (CCGraphXDriver.scala:31-33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connected_component_spark.graph.cc import (
    component_rosters,
    connected_components,
)
from connected_component_spark.sources.tables import load_table

__all__ = ["QUERIES", "ORACLES", "copresence_edges", "copresence_edges_from_events"]


def copresence_edges_from_events(ev: DataFrame) -> DataFrame:
    """Chain edges over users co-present in the same
    (event_type, hour) bucket of the given events DataFrame."""
    grouped = ev.select(
        "user_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
    ).distinct()
    w = Window.partitionBy("event_type", "hr").orderBy("user_id")
    return (
        grouped.select(
            F.col("user_id").alias("src"),
            F.lag("user_id").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )


def copresence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users co-present in the same (event_type, hour) bucket,
    linked as a sorted chain per bucket."""
    return copresence_edges_from_events(load_table(spark, sf_dir, "events"))


def cc_user_copresence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, component) for the behavioral copresence graph;
    isolated users form singletons via self-loops."""
    ev = load_table(spark, sf_dir, "events")
    edges = copresence_edges(spark, sf_dir).union(
        ev.select(F.col("user_id").alias("src"), F.col("user_id").alias("dst")).distinct()
    )
    result = connected_components(edges)
    return result.assignments.select(
        F.col("node").alias("user_id"), F.col("component")
    )


_COPRESENCE_EDGES_SQL = """
ev AS (
  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr FROM events
),
lagged AS (
  SELECT user_id AS src,
         lag(user_id) OVER (PARTITION BY event_type, hr ORDER BY user_id) AS dst
  FROM ev
),
edges AS (SELECT src, dst FROM lagged WHERE dst IS NOT NULL),
sym AS (
  SELECT src, dst FROM edges
  UNION
  SELECT dst, src FROM edges
)
"""

CC_USER_COPRESENCE_SQL = f"""
WITH RECURSIVE {_COPRESENCE_EDGES_SQL},
walk(node, comp) AS (
  SELECT DISTINCT user_id, user_id FROM events
  UNION
  SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node
)
SELECT node AS user_id, min(comp) AS component
FROM walk GROUP BY node
"""


def cc_copresence_rosters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-style component rosters (CCDriver.scala:58-74) over
    the copresence graph, with members as a portable sorted string."""
    assignments = cc_user_copresence(spark, sf_dir).select(
        F.col("user_id").alias("node"), "component"
    )
    rosters = component_rosters(assignments)
    return rosters.select(
        "component",
        "size",
        F.concat_ws(
            " ", F.transform("members", lambda x: x.cast("string"))
        ).alias("members_str"),
    )


CC_COPRESENCE_ROSTERS_SQL = f"""
WITH RECURSIVE {_COPRESENCE_EDGES_SQL},
walk(node, comp) AS (
  SELECT DISTINCT user_id, user_id FROM events
  UNION
  SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node
),
assign AS (
  SELECT node, min(comp) AS component FROM walk GROUP BY node
)
SELECT component,
       count(*) AS size,
       array_to_string(list_sort(list(node)), ' ') AS members_str
FROM assign GROUP BY component
"""


QUERIES = {
    "cc_user_copresence": cc_user_copresence,
    "cc_copresence_rosters": cc_copresence_rosters,
}

ORACLES = {
    "cc_user_copresence": CC_USER_COPRESENCE_SQL,
    "cc_copresence_rosters": CC_COPRESENCE_ROSTERS_SQL,
}
