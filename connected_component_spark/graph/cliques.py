"""Clique ingestion: text wire format and clique→edge expansion.

Reference input unit is a clique — one whitespace-separated list of
node ids per text line (reference README.md:12-24,
CCDriver.scala:34-38,48-52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_cliques_text",
    "cliques_to_edges",
    "cliques_to_edges_pairwise",
    "format_rosters_text",
]


def read_cliques_text(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference wire format into (clique_id, nodes).

    Port of the driver's parse (reference CCDriver.scala:48-52):
    whitespace-split longs, one clique per line.  ``clique_id`` is a
    synthetic dense id (the reference has none; it is needed only by
    the pairwise expansion path).
    """
    lines = spark.read.text(path)
    # drop empty tokens BEFORE the long cast: blank/whitespace lines
    # produce [''] from split, and ANSI cast('' as long) throws
    tokens = F.filter(
        F.split(F.trim(F.col("value")), r"\s+"), lambda x: x != F.lit("")
    )
    return lines.select(
        F.monotonically_increasing_id().alias("clique_id"),
        F.transform(tokens, lambda x: x.cast("long")).alias("nodes"),
    ).where(F.size("nodes") > 0)


def cliques_to_edges(cliques: DataFrame, nodes_col: str = "nodes") -> DataFrame:
    """Clique → edges by *star expansion*: every node links to the
    clique minimum.

    The reference materializes all k(k-1)/2 pairs per clique
    (reference ConnectedComponent.scala:187-217) — an O(k²) blowup
    that is fatal at 100 TB.  Linking each member to the clique min
    is O(k) and yields identical connected components (the clique
    stays one component; cross-clique connectivity only needs *some*
    path).  Singleton cliques produce the same self-loop the
    reference special-cases (ConnectedComponent.scala:193-197).
    """
    return cliques.select(
        F.explode(nodes_col).alias("src"),
        F.array_min(nodes_col).alias("dst"),
    )


def cliques_to_edges_pairwise(cliques: DataFrame, nodes_col: str = "nodes") -> DataFrame:
    """Compat path: the reference's full pairwise expansion with its
    canonical (larger, smaller) orientation and singleton self-loops
    (reference ConnectedComponent.scala:187-217, buildPairs).

    Kept as an option and as a test cross-check; components are
    identical to :func:`cliques_to_edges`.
    """
    pos = cliques.select(
        "clique_id", F.posexplode(nodes_col).alias("pos", "node")
    )
    a, b = pos.alias("a"), pos.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.clique_id") == F.col("b.clique_id"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .select(
            F.greatest("a.node", "b.node").alias("src"),
            F.least("a.node", "b.node").alias("dst"),
        )
    )
    singletons = cliques.where(F.size(nodes_col) == 1).select(
        F.element_at(nodes_col, 1).alias("src"),
        F.element_at(nodes_col, 1).alias("dst"),
    )
    return pairs.union(singletons)


def format_rosters_text(rosters: DataFrame) -> DataFrame:
    """Rosters → reference output lines ``"<size> <min> <members…>"``
    (reference CCDriver.scala:74).  Single ``value`` string column,
    ready for ``df.write.text``.
    """
    return rosters.select(
        F.concat_ws(
            " ",
            F.col("size").cast("string"),
            F.col("component").cast("string"),
            F.concat_ws(" ", F.transform("members", lambda x: x.cast("string"))),
        ).alias("value")
    )
