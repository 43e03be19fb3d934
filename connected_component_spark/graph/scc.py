"""Strongly connected components of a DIRECTED graph.

GraphX-library parity (GraphX ships StronglyConnectedComponents next
to ConnectedComponents/PageRank/TriangleCount/LabelPropagation; the
reference's CCGraphXDriver.scala:84-85 binds the undirected one) —
this module is the directed sibling of the repo's star kernel, built
from the same discipline: driver-side fixpoint loops over
checkpointed DataFrame rounds, exactly one action per round, all
joins key-partitioned.

Algorithm: the parallel trim + forward-backward coloring scheme
(Orzan's coloring; Slota/Rajamanickam/Madduri's Multistep combines
the same phases) rather than Tarjan — a sequential DFS does not
distribute.  Each phase:

1. **Trim** (fixpoint): nodes with no in-edges or no out-edges within
   the remaining graph cannot sit on a cycle — they are singleton
   SCCs, emitted and removed.  A DAG region evaporates entirely here.
2. **Forward color** (fixpoint): ``color(v) = min({v} ∪ {color(u) :
   u→v})`` propagated to convergence — every node is colored by the
   smallest node id that reaches it.
3. **Backward reach within color**: from each color ROOT (``color(r)
   = r``; the root reaches its whole color class by construction),
   walk edges BACKWARD restricted to the root's color class.  The
   reached set is exactly SCC(r): mutual reachability = forward
   (color) ∩ backward (this walk).  All roots walk in parallel —
   their color classes are disjoint.
4. Emit those SCCs, drop their nodes, repeat on the remainder.

Self-loops are irrelevant to SCC membership and dropped on entry
(nodes still register via their other edges or as isolated singleton
input nodes — matching the CC kernel's self-loop registration, an
isolated node IS its own SCC).

Scale shape: every step is an equi-join or key aggregation on node
ids (no adjacency collection, no DFS); per-round state is one
(node, color/flag) table checkpointed like the CC kernel's pair set.
Phase count is bounded by the condensation's root-removal depth,
with trim collapsing all acyclic structure in diameter-of-DAG
rounds — the published behavior on real graphs is a handful of
phases.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SCCResult", "strongly_connected_components"]


@dataclass
class SCCResult:
    """``assignments`` (node, scc) covers every input node; ``scc`` is
    the smallest node id in the component (the CC kernel's min-label
    convention).  ``converged`` is False only if a phase/round cap
    stopped the loop early (assignments are then incomplete and the
    caller must not trust them — raise or retry with higher caps)."""

    assignments: DataFrame
    converged: bool
    phases: int


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def strongly_connected_components(
    edges: DataFrame,
    max_phases: int = 25,
    max_rounds: int = 50,
) -> SCCResult:
    """Compute SCCs of a directed edge list (2 columns, castable to
    long; direction matters; duplicates/self-loops tolerated).

    ``max_phases`` caps the outer trim+color+walk phases;
    ``max_rounds`` caps each inner fixpoint.  On a cap hit the result
    returns ``converged=False`` with the nodes assigned so far —
    callers that need a guarantee should raise on it (the declared
    query row does)."""
    src, dst = edges.columns[0], edges.columns[1]
    e = _ckpt(
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = _ckpt(
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # self-loops don't affect membership; drop for the kernel
    e = _ckpt(e.where(F.col("src") != F.col("dst")))

    spark = edges.sparkSession
    done: DataFrame | None = None
    converged = False
    phases = 0

    def emit(assign: DataFrame) -> None:
        nonlocal done
        done = assign if done is None else done.unionByName(assign)

    from connected_component_spark.plans.tuning import shrunk_shuffle

    n0 = nodes.count()
    with shrunk_shuffle(spark, max(n0, 1)):
        active_n, active_e = nodes, e
        for phases in range(1, max_phases + 1):
            # ---- 1. trim: peel acyclic fringe (singleton SCCs) ----
            for _ in range(max_rounds):
                has_in = active_e.select(F.col("dst").alias("node")).distinct()
                has_out = active_e.select(F.col("src").alias("node")).distinct()
                on_cycle_candidate = has_in.join(has_out, "node")
                trivial = _ckpt(
                    active_n.join(on_cycle_candidate, "node", "left_anti")
                )
                if trivial.isEmpty():
                    break
                emit(trivial.select("node", F.col("node").alias("scc")))
                active_n = _ckpt(active_n.join(trivial, "node", "left_anti"))
                active_e = _ckpt(
                    active_e.join(
                        trivial.select(F.col("node").alias("src")),
                        "src",
                        "left_anti",
                    ).join(
                        trivial.select(F.col("node").alias("dst")),
                        "dst",
                        "left_anti",
                    )
                )
            if active_n.isEmpty():
                converged = True
                break
            # ---- 2. forward color: min reaching id, to fixpoint ----
            colors = _ckpt(
                active_n.select("node", F.col("node").alias("color"))
            )
            stable = False
            for _ in range(max_rounds):
                incoming = (
                    active_e.join(
                        colors.select(
                            F.col("node").alias("src"),
                            F.col("color").alias("c_in"),
                        ),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.min("c_in").alias("c_min"))
                )
                # the change flag rides INSIDE the checkpointed round
                # (computed where both old and new color are in scope),
                # so convergence is one cheap aggregate over the
                # materialized leaf instead of a second join job
                new_colors = _ckpt(
                    colors.join(incoming, "node", "left").select(
                        "node",
                        F.least(
                            "color", F.coalesce("c_min", "color")
                        ).alias("color"),
                        (
                            F.coalesce("c_min", "color") < F.col("color")
                        ).cast("int").alias("_chg"),
                    )
                )
                changed = new_colors.agg(F.sum("_chg")).first()[0]
                colors = new_colors.drop("_chg")
                if not changed:
                    stable = True
                    break
            if not stable:
                break  # round cap hit: incomplete, converged stays False
            # ---- 3. backward walk within color from the roots ----
            reached = _ckpt(
                colors.where(F.col("color") == F.col("node"))
            )  # (node, color): the roots
            frontier = reached
            walk_stable = False
            for _ in range(max_rounds):
                # predecessors of the frontier, same color class
                preds = (
                    active_e.join(
                        frontier.select(
                            F.col("node").alias("dst"), "color"
                        ),
                        "dst",
                    )
                    .select(F.col("src").alias("node"), "color")
                    .distinct()
                    .join(
                        colors.withColumnRenamed("color", "c2"), "node"
                    )
                    .where(F.col("color") == F.col("c2"))
                    .select("node", "color")
                )
                frontier = _ckpt(
                    preds.join(
                        reached.select("node"), "node", "left_anti"
                    )
                )
                if frontier.isEmpty():
                    walk_stable = True
                    break
                reached = _ckpt(reached.unionByName(frontier))
            if not walk_stable:
                # round cap hit mid-walk: the reached set is a PARTIAL
                # SCC — emitting it would silently split a component
                # (review r12; the coloring loop already had this
                # guard, the walk did not).  converged stays False.
                break
            emit(reached.select("node", F.col("color").alias("scc")))
            active_n = _ckpt(
                active_n.join(reached.select("node"), "node", "left_anti")
            )
            active_e = _ckpt(
                active_e.join(
                    reached.select(F.col("node").alias("src")),
                    "src",
                    "left_anti",
                ).join(
                    reached.select(F.col("node").alias("dst")),
                    "dst",
                    "left_anti",
                )
            )
            if active_n.isEmpty():
                converged = True
                break

    if done is None:
        done = nodes.select("node", F.col("node").alias("scc")).limit(0)
    return SCCResult(
        assignments=done.select("node", "scc"),
        converged=converged,
        phases=phases,
    )
