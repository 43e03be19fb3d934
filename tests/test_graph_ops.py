"""Unit tests for the non-CC graph operators (triangle census,
PageRank) on hand-checkable graphs, plus a numpy differential for
the PageRank iteration."""

from __future__ import annotations

import pytest

from connected_component_spark.graph.pagerank import pagerank
from connected_component_spark.graph.triangles import (
    oriented_edges,
    triangle_stats,
    undirected_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_census_known_graph(spark):
    # triangle {1,2,3} plus a pendant edge 3-4:
    # degrees 2,2,3,1 -> wedges 1+1+3+0 = 5; one triangle;
    # clustering 3*1/5 = 0.6
    df = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    row = triangle_stats(df).collect()[0]
    assert (
        row.n_nodes,
        row.n_edges,
        row.n_wedges,
        row.n_triangles,
        row.clustering,
    ) == (4, 4, 5, 1, 0.6)


def test_triangle_census_dedups_and_ignores_direction(spark):
    # same triangle asserted three times with mixed orientation and
    # self-loops: the census must see 3 nodes / 3 edges / 1 triangle
    df = _edges(
        spark,
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (1, 1), (2, 2)],
    )
    row = triangle_stats(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)
    assert row.clustering == 1.0


def test_triangle_census_triangle_free(spark):
    # path graph: wedges but no triangle, clustering 0
    df = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    row = triangle_stats(df).collect()[0]
    assert row.n_triangles == 0
    assert row.clustering == 0.0


def test_orientation_counts_each_triangle_once(spark):
    # K4 has exactly 4 triangles; the oriented wedge join must not
    # double-count any of them
    nodes = [1, 2, 3, 4]
    df = _edges(
        spark, [(a, b) for a in nodes for b in nodes if a < b]
    )
    row = triangle_stats(df).collect()[0]
    assert row.n_triangles == 4
    # every oriented edge goes from lower to higher (degree, id);
    # K4 is regular so orientation falls back to id order
    ori = oriented_edges(undirected_edges(df)).collect()
    assert all(r.lo < r.hi for r in ori)


def test_pagerank_star_graph(spark):
    # symmetric star: center 0, leaves 1..4.  Ranks sum to 1 and the
    # center dominates; leaves are symmetric so their ranks tie.
    df = _edges(spark, [(0, i) for i in range(1, 5)])
    rows = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    leaf_ranks = {rows[i] for i in range(1, 5)}
    assert len(leaf_ranks) == 1
    assert rows[0] > max(leaf_ranks)


def test_pagerank_matches_numpy_iteration(spark):
    np = pytest.importorskip("numpy")
    # small asymmetric graph; symmetrized internally
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)]
    iters, d = 5, 0.85
    df = _edges(spark, pairs)
    got = {r.node: r.rank for r in pagerank(df, iterations=iters).collect()}
    # numpy reference on the symmetrized graph
    und = set()
    for a, b in pairs:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({a for a, _ in und})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in und:
        outdeg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for a, b in und:
            nxt[idx[b]] += d * r[idx[a]] / outdeg[idx[a]]
        r = nxt
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], abs=1e-9)


def test_pagerank_empty_and_selfloop_only(spark):
    df = _edges(spark, [(7, 7)])
    assert pagerank(df, iterations=3).count() == 0


def test_pagerank_rejects_negative_iterations(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [(1, 2)]), iterations=-1)


def test_triangles_differential_on_generated_graph(spark):
    """Distributed census vs an independent local counter on a
    cluster-generated clique-chain graph — the same differential
    pattern the reference ran against GraphX
    (CCGraphXDriver.scala:31-33).  Clique overlaps inside a chain
    make the triangle structure non-trivial (no closed form)."""
    from connected_component_spark.graph.cliques import (
        cliques_to_edges_pairwise,
    )
    from connected_component_spark.graph.generator import (
        distributed_clique_chains,
    )

    cliques, _ = distributed_clique_chains(
        spark, cliques_count=600, max_nodes_per_component=80
    )
    edges = cliques_to_edges_pairwise(cliques)
    row = triangle_stats(edges).collect()[0]

    # local independent count: adjacency sets + same degree ordering
    pairs = {
        (r.src, r.dst) if r.src < r.dst else (r.dst, r.src)
        for r in edges.collect()
        if r.src != r.dst
    }
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = 0
    order = {v: (len(nb), v) for v, nb in adj.items()}
    for a, b in pairs:
        lo, hi = (a, b) if order[a] < order[b] else (b, a)
        n_tri += sum(
            1 for c in adj[lo] if order[c] > order[hi] and c in adj[hi]
        )
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    assert row.n_nodes == len(adj)
    assert row.n_edges == len(pairs)
    assert row.n_wedges == wedges
    assert row.n_triangles == n_tri
    assert n_tri > 0


def test_pagerank_mass_conservation_generated_graph(spark):
    """Rank mass stays 1 after every synchronous round on a graph
    with tens of thousands of nodes (no dangling leaks)."""
    from connected_component_spark.graph.cliques import cliques_to_edges
    from connected_component_spark.graph.generator import (
        distributed_clique_chains,
    )
    from pyspark.sql import functions as F

    cliques, _ = distributed_clique_chains(
        spark, cliques_count=2000, max_nodes_per_component=100
    )
    pr = pagerank(cliques_to_edges(cliques), iterations=3)
    total = pr.agg(F.sum("rank").alias("s")).collect()[0].s
    assert total == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# personalized_pagerank (graph/pagerank.py)
# ---------------------------------------------------------------------------

def _sources(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "source long")


def test_personalized_pagerank_matches_pure_python(spark):
    """Personalized ranks after the same fixed round count equal an
    independent pure-Python power iteration of the restart
    formulation, per reached node; the sparse frame omits exactly the
    unreached (zero-mass) nodes."""
    from connected_component_spark.graph.pagerank import (
        personalized_pagerank,
    )

    iters = 80  # deep enough to cross several eager-consolidations
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 6)]
    got = {
        (r.source, r.node): r.rank
        for r in personalized_pagerank(
            _edges(spark, pairs), _sources(spark, [0, 5]), iterations=iters
        ).collect()
    }
    und = set()
    for a, b in pairs:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({a for a, _ in und})
    outdeg = {n: sum(1 for a, _ in und if a == n) for n in nodes}
    for s in (0, 5):
        r = {n: (1.0 if n == s else 0.0) for n in nodes}
        for _ in range(iters):
            nxt = {n: (0.15 if n == s else 0.0) for n in nodes}
            for a, b in und:
                nxt[b] += 0.85 * r[a] / outdeg[a]
            r = nxt
        reached = {n for (src, n) in got if src == s}
        for n in nodes:
            if n in reached:
                assert got[(s, n)] == pytest.approx(r[n], abs=1e-9), (s, n)
            else:  # different component: exactly zero mass
                assert r[n] == 0.0
    # sparsity: source 5's walk never leaves the {5, 6} component
    assert {n for (src, n) in got if src == 5} == {5, 6}


def test_personalized_pagerank_matches_networkx(spark):
    """Converged personalized ranks equal networkx's personalization
    fixpoint (independent library implementation); env-gated like the
    Pillow/GraphFrames differentials — nx 3.x pagerank needs scipy."""
    from connected_component_spark.graph.pagerank import (
        personalized_pagerank,
    )

    nx = pytest.importorskip("networkx")
    pytest.importorskip("scipy")
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 6)]
    got = {
        (r.source, r.node): r.rank
        for r in personalized_pagerank(
            _edges(spark, pairs), _sources(spark, [0, 5]), iterations=80
        ).collect()
    }
    g = nx.Graph()
    g.add_edges_from(pairs)
    for s in (0, 5):
        want = nx.pagerank(
            g, alpha=0.85, personalization={s: 1.0}, max_iter=500,
            tol=1e-13,
        )
        reached = {n for (src, n) in got if src == s}
        for n, w in want.items():
            if n in reached:
                assert got[(s, n)] == pytest.approx(w, abs=1e-8), (s, n)
            else:  # different component: exactly zero mass
                assert w == pytest.approx(0.0, abs=1e-12)
    # sparsity: source 5's walk never leaves the {5, 6} component
    assert {n for (src, n) in got if src == 5} == {5, 6}


def test_personalized_pagerank_semantics(spark):
    """Fixed-round semantics by hand: round 0 is all mass at the
    source; each round is reset + damped in-flow; per-source mass
    converges toward 1; a source absent from the graph keeps its
    reset row."""
    from connected_component_spark.graph.pagerank import (
        personalized_pagerank,
    )
    from pyspark.sql import functions as F

    edges = _edges(spark, [(1, 2), (2, 3)])
    r0 = personalized_pagerank(edges, _sources(spark, [1]), iterations=0)
    assert [(r.source, r.node, r.rank) for r in r0.collect()] == [(1, 1, 1.0)]
    r1 = {
        r.node: r.rank
        for r in personalized_pagerank(
            edges, _sources(spark, [1]), iterations=1
        ).collect()
    }
    # r1: source keeps reset 0.15 (no in-flow: node 2 had rank 0);
    # node 2 takes 0.85 * (1.0 / outdeg(1)=1)
    assert r1 == {1: pytest.approx(0.15), 2: pytest.approx(0.85)}
    deep = personalized_pagerank(edges, _sources(spark, [1]), iterations=60)
    total = deep.agg(F.sum("rank").alias("s")).collect()[0].s
    assert total == pytest.approx(1.0, abs=1e-9)
    # a source id with no edges still emits its reset-mass row
    lone = personalized_pagerank(edges, _sources(spark, [99]), iterations=3)
    assert [(r.source, r.node, r.rank) for r in lone.collect()] == [
        (99, 99, pytest.approx(0.15))
    ]


def test_personalized_pagerank_rejects_negative_iterations(spark):
    from connected_component_spark.graph.pagerank import (
        personalized_pagerank,
    )

    with pytest.raises(ValueError):
        personalized_pagerank(
            _edges(spark, [(1, 2)]), _sources(spark, [1]), iterations=-1
        )


# ---------------------------------------------------------------------------
# shortest_paths (graph/bfs.py)
# ---------------------------------------------------------------------------

def _lm(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_bfs_path_graph_distances(spark):
    from connected_component_spark.graph.bfs import shortest_paths

    # path 1-2-3-4-5, landmark 1: distances are the hop counts
    df = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {
        (r.node, r.landmark): r.distance
        for r in shortest_paths(df, _lm(spark, [1])).collect()
    }
    assert got == {(1, 1): 0, (2, 1): 1, (3, 1): 2, (4, 1): 3, (5, 1): 4}


def test_bfs_multi_landmark_and_unreachable(spark):
    from connected_component_spark.graph.bfs import shortest_paths

    # two components {1,2,3} and {10,11}; landmarks 1 and 10 only
    # reach their own component; BFS takes the shorter of two routes
    df = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    got = {
        (r.node, r.landmark): r.distance
        for r in shortest_paths(df, _lm(spark, [1, 10])).collect()
    }
    assert got == {
        (1, 1): 0, (2, 1): 1, (3, 1): 1,
        (10, 10): 0, (11, 10): 1,
    }


def test_bfs_max_depth_truncates(spark):
    from connected_component_spark.graph.bfs import shortest_paths

    df = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        r.node: r.distance
        for r in shortest_paths(df, _lm(spark, [1]), max_depth=2).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}  # node 4 is 3 hops away: excluded


def test_bfs_isolated_landmark(spark):
    from connected_component_spark.graph.bfs import shortest_paths

    df = _edges(spark, [(1, 2)])
    rows = shortest_paths(df, _lm(spark, [99])).collect()
    assert [(r.node, r.landmark, r.distance) for r in rows] == [(99, 99, 0)]


# ---------------------------------------------------------------------------
# k_core (graph/kcore.py)
# ---------------------------------------------------------------------------

def test_kcore_triangle_with_pendant(spark):
    from connected_component_spark.graph.kcore import k_core

    # triangle {1,2,3} + pendant 3-4: the 2-core is the triangle,
    # each member with in-core degree 2
    df = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    got = {r.node: r.degree for r in k_core(df, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel(spark):
    from connected_component_spark.graph.kcore import k_core

    # path 1-2-3-4-5: peeling the endpoints cascades until nothing
    # satisfies degree >= 2 — empty core, several rounds deep
    df = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert k_core(df, k=2).count() == 0


def test_kcore_k1_keeps_every_edge_endpoint(spark):
    from connected_component_spark.graph.kcore import k_core

    df = _edges(spark, [(1, 2), (3, 4), (5, 5)])  # self-loop dropped
    got = {r.node: r.degree for r in k_core(df, k=1).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_kcore_rejects_bad_k(spark):
    from connected_component_spark.graph.kcore import k_core

    with pytest.raises(ValueError):
        k_core(_edges(spark, [(1, 2)]), k=0)


def test_bfs_differential_random_graph(spark):
    """Seeded random-graph differential: shortest_paths vs a plain
    Python BFS over the same edge set (the CC-style independent-
    algorithm check applied to distances)."""
    import collections
    import random

    from connected_component_spark.graph.bfs import shortest_paths

    rng = random.Random(1234)
    n, m = 120, 260
    pairs = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    adj = collections.defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    landmarks = [0, 1, 2]

    def py_bfs(src):
        dist = {src: 0}
        q = collections.deque([src])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    want = {
        (node, lm): d
        for lm in landmarks
        for node, d in py_bfs(lm).items()
    }
    got = {
        (r.node, r.landmark): r.distance
        for r in shortest_paths(
            _edges(spark, pairs), _lm(spark, landmarks), max_depth=50
        ).collect()
    }
    assert got == want


def test_kcore_differential_random_graph(spark):
    """Seeded random-graph differential: k_core vs Python peeling."""
    import random

    from connected_component_spark.graph.kcore import k_core

    rng = random.Random(987)
    n, m = 100, 240
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]

    def py_core(k):
        a = {}
        for s, d in pairs:
            if s != d:
                a.setdefault(s, set()).add(d)
                a.setdefault(d, set()).add(s)
        while True:
            drop = [u for u, vs in a.items() if len(vs) < k]
            if not drop:
                return {u: len(vs) for u, vs in a.items()}
            for u in drop:
                for v in a[u]:
                    a[v].discard(u)
                del a[u]

    for k in (2, 3, 4):
        got = {
            r.node: r.degree
            for r in k_core(_edges(spark, pairs), k=k, max_rounds=200).collect()
        }
        assert got == py_core(k), f"k={k}"


def test_lpa_matches_python_simulator(spark):
    import random

    from connected_component_spark.graph.lpa import label_propagation

    rng = random.Random(7)
    nodes = list(range(1, 25))
    pairs = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(40)
        }
    )

    def py_lpa(edge_pairs, rounds):
        nbrs = {}
        for s, d in edge_pairs:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
        labels = {u: u for u in nbrs}
        for _ in range(rounds):
            new = {}
            for u, vs in nbrs.items():
                freq = {}
                for v in vs:
                    freq[labels[v]] = freq.get(labels[v], 0) + 1
                best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
                new[u] = best[0]
            labels = new
        return labels

    for rounds in (0, 1, 3):
        got = {
            r.node: r.label
            for r in label_propagation(
                _edges(spark, pairs), iterations=rounds
            ).collect()
        }
        assert got == py_lpa(pairs, rounds), f"rounds={rounds}"


def test_lpa_two_cliques_bridge_forms_two_communities(spark):
    from connected_component_spark.graph.lpa import label_propagation

    a = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    b = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    bridge = [(4, 10)]
    got = {
        r.node: r.label
        for r in label_propagation(
            _edges(spark, a + b + bridge), iterations=3
        ).collect()
    }
    assert len(set(got[n] for n in (1, 2, 3, 4))) == 1
    assert len(set(got[n] for n in (10, 11, 12, 13))) == 1
    assert got[1] != got[10]


def test_common_neighbor_candidates_known_graph(spark):
    """Hand graph: 1-2, 1-3, 4-2, 4-3, 2-3 → non-adjacent pair (1,4)
    shares neighbors {2,3}; adjacent pairs are excluded."""
    from connected_component_spark.graph.linkpred import (
        common_neighbor_candidates,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3), (2, 3)], "src long, dst long"
    )
    rows = common_neighbor_candidates(edges, top_k=10).collect()
    got = {(r["node_a"], r["node_b"]): r["common_neighbors"] for r in rows}
    assert got == {(1, 4): 2}


def test_common_neighbor_degree_cap_excludes_hub(spark):
    """A center above the degree cap contributes no wedges: with
    cap=2 the degree-3 hub 9 is excluded and nothing is predicted."""
    from connected_component_spark.graph.linkpred import (
        common_neighbor_candidates,
    )

    edges = spark.createDataFrame(
        [(9, 1), (9, 2), (9, 3)], "src long, dst long"
    )
    assert common_neighbor_candidates(edges, max_center_degree=2).count() == 0
    high = {
        (r["node_a"], r["node_b"])
        for r in common_neighbor_candidates(edges, max_center_degree=3).collect()
    }
    assert high == {(1, 2), (1, 3), (2, 3)}


def test_khop_sql_agrees_with_frontier_bfs(spark, sf_dir):
    """The recursive-CTE 2-hop closure must agree with the iterative
    frontier BFS (graph/bfs.py) truncated to distance <= 2 from the
    same seeds — the SQL front door and the scale path pinned to each
    other where their contracts overlap."""
    from pyspark.sql import functions as F

    from connected_component_spark.graph.bfs import shortest_paths
    from connected_component_spark.queries.graph import (
        copresence_edges,
        graph_khop_sql,
    )
    from connected_component_spark.sources.tables import load_table

    via_sql = {
        (r["user_id"], r["hops"])
        for r in graph_khop_sql(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    seeds = ev.select("user_id").where(F.col("user_id") % 100 == 0).distinct()
    bfs = shortest_paths(copresence_edges(spark, sf_dir), seeds, max_depth=2)
    via_bfs = {
        (r["user_id"], r["hops"])
        for r in bfs.groupBy(F.col("node").alias("user_id"))
        .agg(F.min("distance").cast("long").alias("hops"))
        .where(F.col("hops") <= 2)
        .collect()
    }
    assert via_sql == via_bfs


def test_scc_matches_networkx_on_random_digraphs(spark):
    """r12: the distributed trim+FW-BW-coloring SCC kernel must match
    networkx's Tarjan-based SCC (min-member labeling) on hand graphs
    and seeded random digraphs — cycles, bridged cycles, DAG fringes,
    self-loops, isolated-by-self-loop nodes."""
    import random

    import networkx as nx

    from connected_component_spark.graph.scc import (
        strongly_connected_components,
    )

    def check(edges_py):
        df = spark.createDataFrame(edges_py, "src long, dst long")
        res = strongly_connected_components(df)
        assert res.converged
        got = {}
        for r in res.assignments.collect():
            got.setdefault(r["scc"], set()).add(r["node"])
        want = {
            min(c): set(c)
            for c in nx.strongly_connected_components(nx.DiGraph(edges_py))
        }
        assert got == want, (edges_py[:10], got, want)

    check([(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)])
    check([(1, 2), (2, 3), (1, 3), (3, 4)])  # pure DAG
    check([(7, 7), (1, 2), (2, 1)])  # self-loop singleton + 2-cycle
    rng = random.Random(17)
    for _ in range(3):
        n = 50
        check(list({(rng.randrange(n), rng.randrange(n)) for _ in range(130)}))


def test_scc_unconverged_cap_is_loud(spark):
    """A phase/round cap hit must surface as converged=False (and the
    declared query row raises on it) — never a silently-partial
    assignment presented as complete."""
    from connected_component_spark.graph.scc import (
        strongly_connected_components,
    )

    # a 6-cycle needs ~6 color rounds; max_rounds=2 cannot converge
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = strongly_connected_components(df, max_rounds=2)
    assert not res.converged

    # review r12: the BACKWARD WALK cap must also surface — this graph
    # (star 0->i plus chain 1->...->12->0) is ONE 13-node SCC whose
    # coloring converges in ~2 rounds but whose backward walk needs 12;
    # max_rounds=5 used to emit a truncated SCC with converged=True
    star_chain = [(0, i) for i in range(1, 13)] + [
        (i, i + 1) for i in range(1, 12)
    ] + [(12, 0)]
    df2 = spark.createDataFrame(star_chain, "src long, dst long")
    res2 = strongly_connected_components(df2, max_rounds=5)
    assert not res2.converged
    # and with sufficient rounds it is exactly one component
    res3 = strongly_connected_components(df2)
    assert res3.converged
    got = {r["scc"] for r in res3.assignments.collect()}
    assert got == {0} and res3.assignments.count() == 13


def test_scc_long_path_converges_in_log_rounds(spark):
    """verdict r12 #2: the r12 kernel propagated labels one hop per
    round (O(diameter) rounds — a long temporal chain is exactly the
    declared query's shape class).  The r13 pointer-doubled
    propagation must resolve a 400-node directed PATH in O(log n)
    total inner rounds and ONE refine phase (every (fmin, bmin) pair
    is unique on a DAG path -> all singleton SCCs immediately)."""
    from pyspark.sql import functions as F

    from connected_component_spark.graph.scc import (
        strongly_connected_components,
    )

    n = 400
    path = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    res = strongly_connected_components(path)
    assert res.converged
    assert res.assignments.count() == n
    assert (
        res.assignments.where(F.col("node") != F.col("scc")).count() == 0
    )
    # 2 propagations/phase; doubling covers distance 2^r; generous 2x
    # headroom over 2 * (log2(400) ~ 9 + detection) -- the r12 kernel
    # needed ~400 rounds here
    assert res.phases <= 2
    assert res.rounds <= 44, res.rounds


def test_scc_matches_networkx_on_sparse_dag_heavy_digraphs(spark):
    """r13: the partition-refinement rewrite resolves DAG regions as
    singleton (fmin,bmin) classes instead of the removed trim loop —
    differential vs networkx on sparse forward-biased digraphs (mostly
    acyclic, a few back edges creating scattered small SCCs)."""
    import random

    import networkx as nx

    from connected_component_spark.graph.scc import (
        strongly_connected_components,
    )

    for seed in (5, 23):
        rng = random.Random(seed)
        n = 60
        edges = set()
        for _ in range(70):
            a, b = rng.randrange(n), rng.randrange(n)
            if a == b:
                continue
            if a > b and rng.random() < 0.8:
                a, b = b, a  # forward bias -> mostly a DAG
            edges.add((a, b))
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        res = strongly_connected_components(df)
        assert res.converged
        got = {}
        for r in res.assignments.collect():
            got.setdefault(r["scc"], set()).add(r["node"])
        want = {
            min(c): set(c)
            for c in nx.strongly_connected_components(
                nx.DiGraph(sorted(edges))
            )
        }
        assert got == want, (seed, res.phases, res.rounds)
        # DAG-heavy: must resolve in few phases, not O(#SCCs)
        assert res.phases <= 6, (seed, res.phases)
