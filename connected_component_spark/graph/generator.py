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

__all__ = ["generate_clique_chains", "generated_cliques_df", "generated_truth_df"]

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
