"""Property-based + differential tests for the CC kernel (SURVEY §5.2
items 3-4): random edge lists vs an independent union-find oracle
(replacing the reference's GraphX differential,
CCGraphXDriver.scala:31-33), plus cross-mode agreement between the
two convergence detectors."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from connected_component_spark.graph.cc import connected_components


def union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Independent oracle: (node -> min node of its component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


edge_lists = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 60)),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_cc_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    result = connected_components(df)
    assert result.converged
    got = {(r.node, r.component) for r in result.assignments.collect()}
    expected = set(union_find(edges).items())
    assert got == expected


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_convergence_modes_agree(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    a = connected_components(df, convergence="stable-set")
    b = connected_components(df, convergence="reference-counts")
    assert a.converged and b.converged
    assert {(r.node, r.component) for r in a.assignments.collect()} == {
        (r.node, r.component) for r in b.assignments.collect()
    }


def test_generator_chains_vs_union_find(spark):
    from connected_component_spark.graph.cliques import cliques_to_edges
    from connected_component_spark.graph.generator import (
        generate_clique_chains,
        generated_cliques_df,
    )

    cliques, truth = generate_clique_chains(60, max_nodes_per_component=60)
    edges_df = cliques_to_edges(generated_cliques_df(spark, cliques))
    result = connected_components(edges_df)
    got = {(r.node, r.component) for r in result.assignments.collect()}

    flat_edges = []
    for c in cliques:
        flat_edges += [(c[0], x) for x in c]
    expected = set(union_find(flat_edges).items())
    assert got == expected
    # and the generator's built-in truth agrees too
    truth_pairs = {(n, comp) for comp, members in truth for n in members}
    assert got == truth_pairs


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_adjacency_implementation_matches_union_find(spark, edges):
    """The second distributed CC implementation (collect_set stars,
    graph/cc_adjacency.py) against the union-find oracle on random
    edge lists — the same property the join-based kernel satisfies,
    so the two implementations are pinned to each other through an
    independent third."""
    from connected_component_spark.graph.cc_adjacency import (
        connected_components_adjacency,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    result = connected_components_adjacency(df)
    assert result.converged
    got = {(r.node, r.component) for r in result.assignments.collect()}
    assert got == set(union_find(edges).items())
