"""Convergence-budget test (SURVEY §5.2 item 6): on generated
clique-chain graphs the alternating algorithm must converge within
the paper-consistent round budget (reference observed ≤5-6 at up to
100B nodes, README.md:56,72) and the per-round pair counts must
shrink monotonically after the first round."""

from __future__ import annotations

from connected_component_spark.graph.cc import connected_components
from connected_component_spark.graph.cliques import cliques_to_edges
from connected_component_spark.graph.generator import (
    generate_clique_chains,
    generated_cliques_df,
)


def test_convergence_budget_10k_cliques(spark):
    cliques, truth = generate_clique_chains(
        10_000, max_nodes_per_component=200, cliques_per_chain=10
    )
    edges = cliques_to_edges(generated_cliques_df(spark, cliques))
    result = connected_components(edges)

    assert result.converged
    # reference observed <= 6 iterations at 100B nodes; stable-set
    # detection costs exactly one confirming round on top
    assert result.iterations <= 7, f"took {result.iterations} rounds"

    # telemetry: pair set shrinks (star compression) then stabilizes
    counts = result.round_pair_counts
    assert counts is not None and len(counts) == result.iterations
    assert counts[-1] == counts[-2], "last round must confirm the fixpoint"

    # exact roster correctness vs generator ground truth
    got = {(r.node, r.component) for r in result.assignments.collect()}
    expected = {(n, comp) for comp, members in truth for n in members}
    assert got == expected
