"""Deterministic clique-chain generator with built-in ground truth.

Port of the reference's generator-as-oracle pattern
(reference CliquesGenerator.scala:47-113): components are built as
*chains* of cliques sharing one connecting element (:64-70), so the
expected component rosters are known by construction and emitted
alongside the input (:71-72).  Unlike the reference — whose
``Random.shuffle`` used the unseeded global RNG (:66,69), making its
outputs only structurally reproducible — this generator is fully
seeded and bit-stable.

Node ids are allocated in disjoint ranges per chain
(reference CliquesGenerator.scala:61), so component membership never
collides across chains.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "generate_clique_chains",
    "generated_cliques_df",
    "generated_truth_df",
    "distributed_clique_chains",
    "skewed_hub_graph",
]

#: reference seed (CliquesGenerator.scala:56,95)
DEFAULT_SEED = 19345

#: id range reserved per chain (reference CliquesGenerator.scala:61)
_RANGE_PER_CHAIN = 1000


def generate_clique_chains(
    cliques_count: int,
    max_nodes_per_component: int = 100,
    cliques_per_chain: int = 10,
    seed: int = DEFAULT_SEED,
) -> tuple[list[list[int]], list[tuple[int, list[int]]]]:
    """Generate ``(cliques, expected_components)`` driver-side.

    Mirrors the sequential variant (reference
    CliquesGenerator.scala:90-113).  Each chain of
    ``cliques_per_chain`` cliques shares a connecting element between
    consecutive cliques, forming exactly one known component.
    ``expected_components`` is ``[(min_node, sorted_members), ...]``.
    """
    if max_nodes_per_component >= _RANGE_PER_CHAIN:
        # reference guard (CliquesGenerator.scala:50,92)
        raise ValueError("max_nodes_per_component must be < 1000")
    rng = random.Random(seed)
    cliques: list[list[int]] = []
    truth: list[tuple[int, list[int]]] = []
    n_chains = max(1, cliques_count // cliques_per_chain)
    max_clique_nodes = max(2, max_nodes_per_component // cliques_per_chain)
    for chain in range(n_chains):
        base = chain * _RANGE_PER_CHAIN
        members: set[int] = set()
        connecting = base
        for _ in range(cliques_per_chain):
            k = rng.randint(1, max_clique_nodes)
            fresh = rng.sample(range(base, base + _RANGE_PER_CHAIN), k)
            clique = sorted(set(fresh) | {connecting})
            rng.shuffle(clique)
            cliques.append(clique)
            members.update(clique)
            connecting = rng.choice(clique)
        truth.append((min(members), sorted(members)))
    rng.shuffle(cliques)
    return cliques, truth


def generated_cliques_df(spark: SparkSession, cliques: list[list[int]]) -> DataFrame:
    """(clique_id, nodes) DataFrame from generated cliques."""
    return spark.createDataFrame(
        [(i, [int(n) for n in c]) for i, c in enumerate(cliques)],
        "clique_id long, nodes array<long>",
    )


def generated_truth_df(
    spark: SparkSession, truth: list[tuple[int, list[int]]]
) -> DataFrame:
    """(component, size, members) expected-roster DataFrame (mirrors
    the reference's ``_cc`` ground-truth file,
    CliquesGenerator.scala:135-138)."""
    return spark.createDataFrame(
        [(int(m), len(mem), [int(x) for x in mem]) for m, mem in truth],
        "component long, size long, members array<long>",
    )


def expected_assignments(truth: list[tuple[int, list[int]]]) -> list[tuple[int, int]]:
    """Flat (node, component) twin of the roster ground truth."""
    return [(n, comp) for comp, members in truth for n in members]


def distributed_clique_chains(
    spark: SparkSession,
    cliques_count: int,
    max_nodes_per_component: int = 100,
    cliques_per_chain: int = 10,
    seed: int = DEFAULT_SEED,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Cluster-side generator: ``(cliques_df, truth_df)`` with the
    graph built on executors, never materialized on the driver.

    Engine equivalent of the reference's parallel generator
    (reference CliquesGenerator.scala:47-81: ``parallelize`` over
    partition indices, per-partition RNG, cliques emitted from
    ``mapPartitionsWithIndex``), with two deliberate differences:
    each *chain* gets its own seeded RNG stream (the reference seeds
    per partition and also mixes in the unseeded global
    ``Random.shuffle``, so its output depends on the partition count
    and is not reproducible); and the ground truth comes back as a
    DataFrame derived engine-side from the emitted cliques, so
    roster verification at any scale is a join, not a driver loop.

    The driver-side work is O(1): a ``spark.range`` over chain ids.
    Each Arrow batch generates its chains inside ``mapInPandas`` —
    at 100 TB scale the generator is embarrassingly parallel with no
    shuffle until the (optional) truth aggregation.

    Returns ``cliques_df (chain_id, clique_id, nodes array<long>)``
    and ``truth_df (component, size, members)`` — the same truth
    schema as :func:`generated_truth_df`.
    """
    import pandas as pd

    if max_nodes_per_component >= _RANGE_PER_CHAIN:
        # reference guard (CliquesGenerator.scala:50,92)
        raise ValueError("max_nodes_per_component must be < 1000")
    n_chains = max(1, cliques_count // cliques_per_chain)
    max_clique_nodes = max(2, max_nodes_per_component // cliques_per_chain)
    per_chain = cliques_per_chain

    def gen(batches):
        for pdf in batches:
            chain_ids: list[int] = []
            clique_ids: list[int] = []
            nodes: list[list[int]] = []
            for chain in pdf["id"]:
                chain = int(chain)
                # independent, partition-layout-free stream per chain
                rng = random.Random(seed * 1_000_003 + chain)
                base = chain * _RANGE_PER_CHAIN
                connecting = base
                for ci in range(per_chain):
                    k = rng.randint(1, max_clique_nodes)
                    fresh = rng.sample(range(base, base + _RANGE_PER_CHAIN), k)
                    clique = sorted(set(fresh) | {connecting})
                    rng.shuffle(clique)
                    chain_ids.append(chain)
                    clique_ids.append(chain * per_chain + ci)
                    nodes.append(clique)
                    connecting = rng.choice(clique)
            yield pd.DataFrame(
                {"chain_id": chain_ids, "clique_id": clique_ids, "nodes": nodes}
            )

    rng_df = (
        spark.range(n_chains, numPartitions=num_partitions)
        if num_partitions
        else spark.range(n_chains)
    )
    cliques = rng_df.mapInPandas(
        gen, schema="chain_id long, clique_id long, nodes array<long>"
    )
    rosters = (
        cliques.select("chain_id", F.explode("nodes").alias("node"))
        .groupBy("chain_id")
        .agg(F.array_sort(F.collect_set("node")).alias("members"))
    )
    truth = rosters.select(
        F.element_at("members", 1).alias("component"),
        F.size("members").cast("long").alias("size"),
        "members",
    )
    return cliques, truth


def skewed_hub_graph(
    spark: SparkSession,
    n_nodes: int,
    giant_frac: float = 0.8,
    small_size: int = 5,
    seed: int = DEFAULT_SEED,
) -> tuple[DataFrame, DataFrame]:
    """``(edges_df, truth_df)`` for the converged-hub stress topology
    the reference's at-scale comments warn about
    (reference ConnectedComponent.scala:62-63,135-136): one GIANT
    component holding ``giant_frac`` of all nodes, whose min node
    ends up on the receiving end of every large-star emission as the
    rounds converge — the reducer-skew worst case for the alternating
    algorithm — plus small ``small_size``-node star components
    filling the remainder (so the run still exercises the mixed
    regime, not a single-component special case).

    The giant component is a random recursive tree: node ``i`` (for
    ``0 < i < G``) attaches to a hash-uniform earlier node, giving
    O(log n) diameter — realistically shallow, so convergence
    overhead measures skew handling, not pathological depth.  Every
    edge is a pure JVM expression of (seed, node id) over one
    ``spark.range`` projection: no shuffle, no Python, any slice
    regenerates independently at 100 TB scale.

    ``truth_df (node, component)`` is CLOSED-FORM (giant nodes → 0,
    small nodes → their group leader), so roster verification at any
    size is one join — no reference CC run needed.
    """
    if not (0.0 < giant_frac <= 1.0):
        raise ValueError(f"giant_frac must be in (0, 1], got {giant_frac}")
    if small_size < 1:
        raise ValueError(f"small_size must be >= 1, got {small_size}")
    if n_nodes < 2:
        raise ValueError(f"n_nodes must be >= 2, got {n_nodes}")
    g = max(2, int(n_nodes * giant_frac))
    ids = spark.range(n_nodes)
    node = F.col("id")
    parent = F.when(node == 0, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.lit(seed), node), node)
    )
    leader = node - F.pmod(node - F.lit(g), F.lit(small_size))
    edges = ids.select(
        node.alias("src"),
        F.when(node < g, parent).otherwise(leader).alias("dst"),
    )
    truth = ids.select(
        node.alias("node"),
        F.when(node < g, F.lit(0)).otherwise(leader).alias("component"),
    )
    return edges, truth
