"""PageRank vs a dense numpy power iteration with the same rules."""

from __future__ import annotations

import numpy as np

from geomesa_spark.operators.graph import pagerank


def _brute(edges, iters=3, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1.0 - d) / n)
        dangling = pr[deg == 0].sum()
        add = np.zeros(n)
        for s, t in edges:
            add[idx[t]] += pr[idx[s]] / deg[idx[s]]
        new += d * (add + dangling / n)
        pr = new
    return {v: pr[idx[v]] for v in nodes}


def test_pagerank_matches_brute_force(spark):
    rng = np.random.default_rng(41)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 20, 60), rng.integers(0, 20, 60))})
    df = spark.createDataFrame(edges, "src long, dst long")
    for det in (False, True):
        got = {r["node"]: r["pr"]
               for r in pagerank(df, iters=3, deterministic=det).collect()}
        exp = _brute(edges)
        assert set(got) == set(exp)
        for v in exp:
            assert abs(got[v] - exp[v]) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_dangling_and_hub(spark):
    # star: 1,2,3 -> 0; 0 has no out-links (dangling)
    edges = [(1, 0), (2, 0), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=5).collect()}
    assert got[0] > got[1] == got[2] == got[3]
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_hits_matches_numpy_reference(spark):
    """hubs/authorities vs a dense numpy replay of the same L1-normalized
    mutual iteration, on a small random multigraph."""
    import random

    import numpy as np

    from geomesa_spark.operators.graph import hits

    rng = random.Random(7)
    edges = [(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth)
           for r in hits(df, iters=3, deterministic=True).collect()}

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v in edges:
        A[idx[u], idx[v]] += 1.0
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(3):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v][0] - h[idx[v]]) < 1e-12, v
        assert abs(got[v][1] - a[idx[v]]) < 1e-12, v
    # plain-sum path agrees to fp tolerance
    got2 = {r.node: (r.hub, r.auth) for r in hits(df, iters=3).collect()}
    for v in nodes:
        assert abs(got2[v][0] - got[v][0]) < 1e-9
        assert abs(got2[v][1] - got[v][1]) < 1e-9


def test_hits_empty(spark):
    from geomesa_spark.operators.graph import hits

    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df).count() == 0


def test_triangle_counts_brute_force(spark):
    import itertools
    import random

    from geomesa_spark.operators.graph import triangle_counts

    rng = random.Random(19)
    edges = [(rng.randint(0, 24), rng.randint(0, 24)) for _ in range(140)]
    edges += [(1, 1), (2, 2)]          # self-loops dropped
    edges += [(3, 4), (4, 3), (3, 4)]  # direction/multiplicity collapsed
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    want = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in und and (b, c) in und and (a, c) in und):
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want and want  # fixture really contains triangles


def test_triangle_counts_single_triangle(spark):
    from geomesa_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (3, 4)],
                               "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_bfs_distances_known_answer(spark):
    import pytest as _pt

    from geomesa_spark.operators.graph import bfs_distances

    # 0->1->2->3->4 chain plus shortcut 0->3, cycle 4->0, island 9->10
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (4, 0), (9, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.hops for r in bfs_distances(df, [0]).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}
    # multi-source: min over seeds; undirected reaches the island back
    got2 = {r.node: r.hops for r in bfs_distances(df, [0, 10]).collect()}
    assert got2[10] == 0 and got2[3] == 1
    und = {r.node: r.hops
           for r in bfs_distances(df, [10], directed=False).collect()}
    assert und == {10: 0, 9: 1}
    # max_hops truncation
    lim = {r.node: r.hops for r in bfs_distances(df, [0], max_hops=1).collect()}
    assert lim == {0: 0, 1: 1, 3: 1}
    with _pt.raises(ValueError):
        bfs_distances(df, [])


def test_label_propagation_two_communities(spark):
    """Two triangles + one bridge: synchronous rounds hand-traced.
    l1=[1,0,0,2,3,3], l2=[0,0,0,3,2,2], l3=[0,0,0,2,2,2] — the two
    triangle communities separate by round 3."""
    from geomesa_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
        "src long, dst long")
    got = {r.node: r.label
           for r in label_propagation(edges, iters=3).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 2, 4: 2, 5: 2}
    one = {r.node: r.label
           for r in label_propagation(edges, iters=1).collect()}
    assert one == {0: 1, 1: 0, 2: 0, 3: 2, 4: 3, 5: 3}


def test_label_propagation_directed_and_validation(spark):
    import pytest

    from geomesa_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(0, 1), (0, 2)], "src long, dst long")
    got = {r.node: r.label
           for r in label_propagation(edges, iters=1,
                                      directed=True).collect()}
    # labels flow src->dst only; node 0 receives nothing, keeps its own
    assert got == {0: 0, 1: 0, 2: 0}
    with pytest.raises(ValueError, match="iters"):
        label_propagation(edges, iters=0)


def test_resolve_redirects_chains_cycle_ambiguous(spark):
    """Chains i -> i-1 (i % 8 != 0) resolve to the preceding multiple
    of 8 with exact hop counts after log2 doubling rounds; a 3-cycle
    parks unresolved at exactly 2**max_rounds hops; an ambiguous source
    (two targets for one URL) deterministically takes the smaller."""
    import pytest
    from pyspark.sql import functions as F

    from geomesa_spark.operators.graph import resolve_redirects

    chains = spark.range(0, 32).filter("id % 8 != 0").select(
        F.col("id").alias("src"), (F.col("id") - 1).alias("dst"))
    cyc = spark.createDataFrame(
        [(100, 101), (101, 102), (102, 100)], "src long, dst long")
    out = {r.src: (r.final, r.hops, r.resolved)
           for r in resolve_redirects(chains.union(cyc),
                                      max_rounds=3).collect()}
    assert len(out) == 31
    for s in range(32):
        if s % 8 == 0:
            assert s not in out  # terminals are not sources
        else:
            assert out[s] == (s - s % 8, s % 8, True)
    # 8 steps around a 3-cycle: 8 % 3 == 2 hops forward, unresolved
    assert out[100] == (102, 8, False)
    assert out[101] == (100, 8, False)
    assert out[102] == (101, 8, False)

    # ambiguous source: 5 -> {9, 7}; min target wins, then 7 -> 6
    amb = spark.createDataFrame(
        [(5, 9), (5, 7), (7, 6)], "src long, dst long")
    got = {r.src: (r.final, r.hops, r.resolved)
           for r in resolve_redirects(amb, max_rounds=2).collect()}
    assert got == {5: (6, 2, True), 7: (6, 1, True)}

    with pytest.raises(ValueError, match="max_rounds"):
        resolve_redirects(chains, max_rounds=0)


def test_co_citation_counts_cap_validation(spark):
    """Hand-traced pair counts, duplicate-edge dedup, hub degree cap,
    and parameter validation."""
    import pytest

    from geomesa_spark.operators.graph import co_citation

    edges = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20),          # dup edge collapses
         (2, 10), (2, 20), (2, 30),
         (3, 20), (3, 30)], "src long, dst long")
    got = {(r.a, r.b): r.n_common
           for r in co_citation(edges, min_common=2).collect()}
    assert got == {(10, 20): 2, (20, 30): 2}
    # full pair table at min_common=1
    all_p = {(r.a, r.b): r.n_common
             for r in co_citation(edges, min_common=1).collect()}
    assert all_p == {(10, 20): 2, (10, 30): 1, (20, 30): 2}
    # degree cap drops source 2 (out-degree 3) whole
    capped = {(r.a, r.b): r.n_common
              for r in co_citation(edges, min_common=1,
                                   max_out_degree=2).collect()}
    assert capped == {(10, 20): 1, (20, 30): 1}
    with pytest.raises(ValueError, match="min_common"):
        co_citation(edges, min_common=0)
    with pytest.raises(ValueError, match="max_out_degree"):
        co_citation(edges, max_out_degree=1)


def test_pagerank_personalized_brute_force(spark):
    """Personalized teleport vs a numpy reference: teleport + dangling
    mass land on the seeds, iteration starts from w; off-seed nodes get
    w=0; mass stays conserved. Plus weight validation."""
    import pytest

    rng = np.random.default_rng(43)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 15, 40), rng.integers(0, 15, 40))})
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = {0: 2, 3: 1, 7: 3}
    sdf = spark.createDataFrame(list(seeds.items()), "node long, weight long")

    def brute(iters=3, d=0.85):
        nodes = sorted({u for e in edges for u in e})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        deg = np.zeros(n)
        for s, _ in edges:
            deg[idx[s]] += 1
        tw = sum(seeds.values())
        w = np.zeros(n)
        for v, wt in seeds.items():
            w[idx[v]] = wt / tw
        pr = w.copy()
        for _ in range(iters):
            dangling = pr[deg == 0].sum()
            add = np.zeros(n)
            for s, t in edges:
                add[idx[t]] += pr[idx[s]] / deg[idx[s]]
            pr = (1.0 - d) * w + d * (add + dangling * w)
        return {v: pr[idx[v]] for v in nodes}

    for det in (False, True):
        got = {r["node"]: r["pr"]
               for r in pagerank(df, iters=3, deterministic=det,
                                 personalization=sdf).collect()}
        exp = brute()
        assert set(got) == set(exp)
        for v in exp:
            assert abs(got[v] - exp[v]) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-9

    bad = spark.createDataFrame([(0, 0)], "node long, weight long")
    with pytest.raises(ValueError, match="sum to > 0"):
        pagerank(df, personalization=bad)


def test_degree_distribution_directions(spark):
    """Hand-traced histograms: multigraph out-degrees, zero-degree
    inclusion, undirected dedup + self-loop drop, validation."""
    import pytest

    from geomesa_spark.operators.graph import degree_distribution

    # 0->1 twice (parallel), 0->2, 1->2, 2->2 (self loop)
    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 2), (2, 2)], "src long, dst long")

    def hist(direction):
        return {r.degree: r.n_nodes for r in
                degree_distribution(edges, direction=direction).collect()}

    # out: node0=3, node1=1, node2=1  -> {3:1, 1:2}
    assert hist("out") == {3: 1, 1: 2}
    # in: node1=2, node2=3, node0=0 -> {2:1, 3:1, 0:1}
    assert hist("in") == {2: 1, 3: 1, 0: 1}
    # both: dedup {0-1, 0-2, 1-2}; self loop dropped -> all degree 2
    assert hist("both") == {2: 3}
    with pytest.raises(ValueError, match="direction"):
        degree_distribution(edges, direction="sideways")


def test_k_core_brute_force_and_known(spark):
    """Triangle + pendant at k=2 keeps exactly the triangle; random
    graph k-cores match python fixpoint peeling; validation."""
    import pytest

    from geomesa_spark.operators.graph import k_core

    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long")
    got = {r.node: r.degree for r in k_core(tri, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}

    rng = np.random.default_rng(44)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 25, 80), rng.integers(0, 25, 80))
                    if a != b})
    df = spark.createDataFrame(edges, "src long, dst long")

    def brute(k):
        adj = {}
        for s, t in edges:
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
        kept = set(adj)
        while True:
            drop = {v for v in kept
                    if len(adj[v] & kept) < k}
            if not drop:
                break
            kept -= drop
        return {v: len(adj[v] & kept) for v in kept}

    for k in (2, 3, 4):
        got = {r.node: r.degree
               for r in k_core(df, k=k, max_rounds=30).collect()}
        assert got == brute(k), k
    with pytest.raises(ValueError, match="k must"):
        k_core(df, k=0)
