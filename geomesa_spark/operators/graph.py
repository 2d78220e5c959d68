"""Link-graph analytics: PageRank for web-corpus importance scoring.

Common-Crawl-scale pipelines rank URLs/hosts by link centrality to
gate crawl priority and quality weighting; PageRank is the canonical
statistic. The reference engine has no graph operator — this is part
of the training-data-pipeline surface, like dedup/ANN.

Spark-first power iteration: ranks live in a (node, pr) frame; each
round is one join edges->ranks (contributions), one combining groupBy
on the destination, and one union with the teleport term — shuffles
keyed by node id only, rank state never collected to the driver.
Dangling mass (nodes with no out-links) is redistributed uniformly,
so total rank is conserved at every round.

Two summation modes (the `interpolate.idw_grid` convention):
``deterministic=False`` uses plain partial-agg sums (the scale path);
``deterministic=True`` folds each node's in-contributions sorted by
source id and the dangling mass sorted by node id — fixed addition
order, bit-reproducible across engines (the DuckDB oracle unrolls the
same iterations with ordered list_reduce folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "hits", "triangle_counts", "bfs_distances",
           "label_propagation", "resolve_redirects", "co_citation",
           "degree_distribution", "k_core", "shortest_paths"]


def _fold_sum(sorted_arr) -> F.Column:
    return F.aggregate(sorted_arr, F.lit(0.0), lambda acc, v: acc + v)


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 3, damping: float = 0.85,
             deterministic: bool = False,
             personalization: DataFrame | None = None,
             pers_node: str = "node",
             pers_weight: str = "weight") -> DataFrame:
    """Power-iteration PageRank; returns (node, pr) after ``iters``
    rounds.

        pr'(v) = (1-d)*w_v + d * (sum_{u->v} pr(u)/deg(u) + dangling*w_v)

    Uniform mode (``personalization=None``): w_v = 1/N and the start
    vector is uniform — classic PageRank. Personalized mode (Haveliwala
    2002 topic-sensitive / the crawl-frontier host-bias variant):
    ``personalization`` is a (node, weight) seed frame; w_v =
    weight_v / sum(weights) (0 off the seed set), teleport AND dangling
    mass land on the seeds, and iteration starts from w. Integer-valued
    weights keep the normalizing sum exact (order-free), which the
    bit-reproducible ``deterministic=True`` mode relies on. The seed
    frame is aggregated driver-side to one scalar (seed sets are tiny
    next to the graph) and joined once onto the node base.

    Nodes are every distinct src or dst; parallel edges each carry a
    contribution (multigraph semantics — dedup upstream if unwanted).
    """
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("t"))
    nodes = (e.select(F.col("s").alias("node"))
              .union(e.select(F.col("t").alias("node")))
              .distinct())
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    # degree joined once; dangling nodes keep deg NULL
    base = nodes.join(deg, nodes["node"] == deg["s"], "left").drop("s")
    if personalization is not None:
        p = personalization.select(
            F.col(pers_node).cast("long").alias("node"),
            F.col(pers_weight).cast("double").alias("__w__"))
        tw = p.agg(F.sum("__w__")).collect()[0][0]
        if not tw or tw <= 0:
            raise ValueError("personalization weights must sum to > 0")
        base = (base.join(p, "node", "left")
                    .withColumn("w", F.coalesce(F.col("__w__"), F.lit(0.0))
                                / F.lit(float(tw)))
                    .drop("__w__"))
    cached = base.persist()   # handle for unpersist: `base` may derive
    base = cached
    n_nodes = base.count()  # action AFTER persist so the cache is populated
    if n_nodes == 0:
        cached.unpersist()
        return edges.sparkSession.createDataFrame([], "node long, pr double")
    inv_n = 1.0 / float(n_nodes)
    d = float(damping)
    if personalization is None:
        base = base.withColumn("w", F.lit(inv_n))
    pr = base.select("node", F.col("w").alias("pr"))
    for _ in range(iters):
        state = base.join(pr, "node")
        contrib = (e.join(state.select("node", "deg", "pr"),
                          e["s"] == F.col("node"))
                    .select(F.col("t").alias("node"), F.col("s"),
                            (F.col("pr") / F.col("deg").cast("double"))
                            .alias("c")))
        if deterministic:
            summed = (contrib.groupBy("node")
                      .agg(_fold_sum(F.array_sort(F.collect_list(
                          F.struct(F.col("s"), F.col("c"))))
                          .getField("c")).alias("insum")))
            dang = (state.filter(F.col("deg").isNull())
                    .agg(_fold_sum(F.array_sort(F.collect_list(
                        F.struct(F.col("node"), F.col("pr"))))
                        .getField("pr")).alias("dm")))
        else:
            summed = contrib.groupBy("node").agg(F.sum("c").alias("insum"))
            dang = (state.filter(F.col("deg").isNull())
                    .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm")))
        pr = (base.select("node", "w")
              .join(summed, "node", "left")
              .crossJoin(F.broadcast(dang))
              .select("node",
                      (F.lit(1.0 - d) * F.col("w")
                       + F.lit(d) * (F.coalesce(F.col("insum"), F.lit(0.0))
                                     + F.col("dm") * F.col("w")))
                      .alias("pr"))
              # eager checkpoint per round (the dedup_clusters pattern):
              # both `summed` and `dang` reference the prior pr, so an
              # unpinned lineage doubles each round and the whole chain
              # re-executes at every downstream action
              .localCheckpoint(eager=True))
    out = pr
    cached.unpersist()  # final pr is checkpoint-truncated; no recompute
    return out


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iters: int = 2, deterministic: bool = False) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, the link-analysis
    complement of PageRank: a good hub links to good authorities and
    vice versa); returns (node, hub, auth) after ``iters`` mutual
    rounds from the uniform hub start 1/N, L1-normalized each half-step
    so scores stay a probability-like distribution (the classical L2
    norm would put an engine-dependent sqrt in the chain; L1 keeps
    every op a sum/divide that both engines can replay bit-for-bit).

        a'(v) = sum_{u->v} h(u)  (normalized);  h'(u) = sum_{u->v} a'(v)

    Same scale shape as :func:`pagerank`: per-round join + combining
    groupBy keyed by node id, two single-row global sums broadcast
    back, rank state never collected; each half-step is eagerly
    checkpointed (the dedup_clusters pattern) so lineage stays O(1).
    ``deterministic=True`` uses ordered folds (neighbor contributions
    by the far endpoint, global sums by node id) for bit-reproducible
    cross-engine parity. Parallel edges each contribute (multigraph
    semantics, as pagerank).
    """
    if iters < 1:
        raise ValueError(f"hits needs iters >= 1, got {iters}")
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("t"))
    nodes = (e.select(F.col("s").alias("node"))
              .union(e.select(F.col("t").alias("node")))
              .distinct())
    base = nodes.persist()
    n_nodes = base.count()
    if n_nodes == 0:
        base.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node long, hub double, auth double")
    h = base.select("node", F.lit(1.0 / float(n_nodes)).alias("x"))
    a = base.select("node", F.lit(0.0).alias("x"))

    def _half(state: DataFrame, fwd: bool) -> DataFrame:
        """One half-step: scores flow src->dst (fwd, authorities) or
        dst->src (hubs); L1-normalize over all nodes."""
        here, there = ("s", "t") if fwd else ("t", "s")
        contrib = (e.join(state.withColumnRenamed("node", here), on=here)
                    .select(F.col(there).alias("node"),
                            F.col(here).alias("far"), F.col("x").alias("c")))
        if deterministic:
            raw = (contrib.groupBy("node")
                   .agg(_fold_sum(F.array_sort(F.collect_list(
                       F.struct(F.col("far"), F.col("c"))))
                       .getField("c")).alias("r")))
        else:
            raw = contrib.groupBy("node").agg(F.sum("c").alias("r"))
        s = base.join(raw, "node", "left").select(
            "node", F.coalesce("r", F.lit(0.0)).alias("x"))
        if deterministic:
            tot = s.agg(_fold_sum(F.array_sort(F.collect_list(
                F.struct(F.col("node"), F.col("x"))))
                .getField("x")).alias("tot"))
        else:
            tot = s.agg(F.sum("x").alias("tot"))
        # >= 1 edge guarantees tot > 0 (every edge's src holds hub mass)
        return (s.crossJoin(F.broadcast(tot))
                 .select("node", (F.col("x") / F.col("tot")).alias("x"))
                 .localCheckpoint(eager=True))

    for _ in range(iters):
        a = _half(h, fwd=True)
        h = _half(a, fwd=False)
    out = (h.select("node", F.col("x").alias("hub"))
            .join(a.select("node", F.col("x").alias("auth")), "node"))
    base.unpersist()
    return out


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle counts of the UNDIRECTED simple graph under
    ``edges`` (direction/multiplicity/self-loops dropped) — the local
    clustering signal of link analysis (spam farms and boilerplate
    link rings are triangle-dense; organic link graphs are sparse).

    The degree-ordered wedge algorithm (Cohen 2009 / Suri-Vassilvitskii
    MapReduce form): orient every edge from its (degree, id)-smaller
    endpoint to the larger, so each triangle is counted exactly once at
    its smallest corner and — the scale property — every node's
    out-degree in the oriented graph is O(sqrt(m)) on any graph
    (arboricity bound), which caps the wedge join's fan-out even on
    power-law link graphs where a hub's raw degree is millions.

    Plan: dedupe to canonical undirected edges, one degree agg joined
    back, wedge self-join on the oriented source, close wedges with a
    semi-ish inner join against the oriented edge set, explode each
    found triangle to its 3 corners, one combining count. All keys are
    node ids; every count is an exact integer. Returns (node,
    n_triangles) for nodes in >= 1 triangle.
    """
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
              .filter(F.col("u") != F.col("v"))
              .select(F.least("u", "v").alias("a"),
                      F.greatest("u", "v").alias("b"))
              .distinct())
    deg = (e.select(F.col("a").alias("n")).unionAll(
               e.select(F.col("b").alias("n")))
            .groupBy("n").agg(F.count("*").alias("d")))
    ed = (e.join(deg.withColumnRenamed("n", "a")
                    .withColumnRenamed("d", "da"), on="a")
           .join(deg.withColumnRenamed("n", "b")
                    .withColumnRenamed("d", "db"), on="b"))
    # orient (degree, id)-ascending: lo -> hi
    a_first = (F.col("da") < F.col("db")) | \
              ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = ed.select(F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
                  F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"))
    # wedges centered at the oriented source; w1 < w2 by (deg, id) is
    # NOT guaranteed, so order the far endpoints by id for a canonical
    # wedge — the closing edge is looked up in canonical (a < b) form
    w = (o.select(F.col("lo").alias("c"), F.col("hi").alias("x"))
          .join(o.select(F.col("lo").alias("c"), F.col("hi").alias("y")),
                on="c")
          .filter(F.col("x") < F.col("y")))
    tri = w.join(e.select(F.col("a").alias("x"), F.col("b").alias("y")),
                 on=["x", "y"], how="inner")
    corners = (tri.select(F.explode(F.array("c", "x", "y")).alias("node")))
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def bfs_distances(edges: DataFrame, sources: list,
                  src: str = "src", dst: str = "dst",
                  max_hops: int = 10, directed: bool = True) -> DataFrame:
    """Multi-source BFS hop distances: for every node reachable from
    the ``sources`` set within ``max_hops``, the MINIMUM hop count —
    crawl-depth / seed-distance labeling ("how many clicks from a
    trusted seed"), the standard trust-propagation feature.

    Level-synchronous frontier expansion (the Pregel BFS): each round
    is one join frontier->edges + distinct + anti-join against the
    settled set — shuffles keyed by node id only, each node enters the
    frontier at most once, so total work is O(E) across all rounds
    regardless of max_hops. Per-round frames are eagerly checkpointed
    (the dedup_clusters pattern) so lineage stays O(1). Returns
    (node, hops); unreached nodes are absent.
    """
    if not sources:
        raise ValueError("bfs_distances needs at least one source")
    spark = edges.sparkSession
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("t"))
    if not directed:
        e = e.unionAll(e.select(F.col("t").alias("s"),
                                F.col("s").alias("t")))
    # dedupe once: a hot duplicate edge would otherwise multiply every
    # round's frontier join output before the per-round distinct
    e = e.distinct().persist()
    frontier = spark.createDataFrame(
        [(int(v), 0) for v in sorted(set(sources))],
        "node long, hops int").localCheckpoint(eager=True)
    # settled = the list of per-round frontier frames (each already
    # checkpointed); re-checkpointing their growing union every round
    # would rewrite all prior levels each time — O(V * rounds) I/O
    settled = [frontier]
    seen = frontier.select("node")
    for h in range(1, int(max_hops) + 1):
        nxt = (e.join(frontier.withColumnRenamed("node", "s")
                              .select("s"), on="s")
                .select(F.col("t").alias("node")).distinct()
                .join(seen, on="node", how="left_anti")
                .withColumn("hops", F.lit(h))
                .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        settled.append(nxt)
        # the anti-join target stays a lazy union of CHECKPOINTED
        # frames — O(1) lineage depth, nothing re-materialized
        seen = seen.unionAll(nxt.select("node"))
        frontier = nxt
    e.unpersist()
    out = settled[0]
    for f in settled[1:]:
        out = out.unionAll(f)
    return out


def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      iters: int = 3, directed: bool = False) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) — community
    detection for host/link graphs (mirror clusters, link farms, site
    families). Returns ``(node, label)`` after ``iters`` rounds from the
    start where every node is its own label.

    SYNCHRONOUS variant (GraphX's LabelPropagation makes the same
    choice): every node adopts the most frequent label among its
    neighbors' PREVIOUS-round labels, ties broken by the smallest
    label, isolated nodes keep theirs — the result is a pure function
    of the graph, unlike the order-dependent async formulation, so a
    SQL oracle can replay it round by round. Parallel edges weight
    their neighbor (multigraph semantics); self-loops count the node's
    own label.

    Per round: ONE edges->labels join (shuffle keyed by node id), ONE
    combining (node, label) count, and the per-node argmax as a single
    ``max(struct(cnt, -label))`` aggregate — no window, map-side
    partials all the way; ``localCheckpoint`` pins lineage per round
    like pagerank/bfs.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("t"))
    if not directed:
        e = e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
    e = e.persist()
    nodes = (e.select(F.col("s").alias("node"))
              .union(e.select(F.col("t").alias("node")))
              .distinct().persist())
    labels = nodes.select("node", F.col("node").alias("label")) \
                  .localCheckpoint()
    for _ in range(iters):
        msgs = (e.join(labels.withColumnRenamed("node", "s"), "s")
                 .select(F.col("t").alias("node"), "label"))
        cnt = msgs.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        new = (cnt.groupBy("node")
                  .agg(F.max(F.struct(F.col("cnt"),
                                      (-F.col("label")).alias("nl")))
                        .alias("m"))
                  .select("node", (-F.col("m.nl")).alias("new_label")))
        labels = (labels.join(new, "node", "left")
                        .select("node",
                                F.coalesce("new_label", "label")
                                 .alias("label"))
                        .localCheckpoint())
    e.unpersist()
    nodes.unpersist()
    return labels


def resolve_redirects(edges: DataFrame, src: str = "src", dst: str = "dst",
                      max_rounds: int = 5) -> DataFrame:
    """Resolve HTTP-redirect chains to their terminal URL by pointer
    doubling: crawl stores record one hop per fetch (301/302/meta
    refresh), but dedup, canonicalization and link analysis all need
    the CHAIN's endpoint. Complements corpus.canonical_capture (the
    page-declared canonical) with the protocol-level one.

    Pointer doubling: after round k every pointer has advanced
    min(2**k, hops-to-terminal) steps, so a chain of length L resolves
    in ceil(log2 L) self-joins of the (node, nxt, hops) map — O(log L)
    shuffle rounds keyed by node id, vs the O(L) of one-hop-per-round
    iteration. The map is |redirect sources| rows of three scalars,
    orders of magnitude smaller than the page payloads it serves;
    per-round frames are eagerly checkpointed (the dedup_clusters
    pattern) so lineage stays O(1). Terminals need no explicit flag: a
    pointer parked on a non-source finds no match in the left join and
    simply stops advancing.

    Returns (src, final, hops, resolved) for every redirect source:
    the terminal target and exact hop count, or — for chains still
    open after 2**max_rounds hops (cycles, over-long chains) —
    resolved=false with the pointer parked at exactly 2**max_rounds
    hops. Ambiguous sources (two targets for one URL — malformed in a
    real crawl store) deterministically resolve to the smallest
    target rather than raising, so the op stays action-free.
    """
    if max_rounds < 1:
        raise ValueError(f"resolve_redirects needs max_rounds >= 1, "
                         f"got {max_rounds}")
    e = (edges.select(F.col(src).cast("long").alias("node"),
                      F.col(dst).cast("long").alias("nxt"))
              .groupBy("node").agg(F.min("nxt").alias("nxt")))
    m = e.withColumn("hops", F.lit(1)).localCheckpoint(eager=True)
    for _ in range(int(max_rounds)):
        m2 = m.select(F.col("node").alias("__jn__"),
                      F.col("nxt").alias("__jnxt__"),
                      F.col("hops").alias("__jh__"))
        m = (m.join(m2, m["nxt"] == m2["__jn__"], "left")
              .select("node",
                      F.coalesce("__jnxt__", "nxt").alias("nxt"),
                      (F.col("hops") + F.coalesce("__jh__", F.lit(0)))
                      .alias("hops"))
              .localCheckpoint(eager=True))
    srcs = e.select(F.col("node").alias("__t__")).distinct()
    return (m.join(srcs, m["nxt"] == srcs["__t__"], "left")
             .select(F.col("node").alias("src"),
                     F.col("nxt").alias("final"),
                     F.col("hops").cast("int").alias("hops"),
                     F.col("__t__").isNull().alias("resolved")))


def co_citation(edges: DataFrame, src: str = "src", dst: str = "dst",
                min_common: int = 1,
                max_out_degree: int = 10_000) -> DataFrame:
    """Co-citation related-pages join (Small 1973; the classic
    link-structure "related:" signal): two pages are related when many
    sources link to BOTH. Returns (a, b, n_common) with a < b for every
    unordered target pair sharing at least ``min_common`` distinct
    citing sources.

    Plan: dedup edges, cap per-source out-degree at ``max_out_degree``
    (a mega-hub contributes O(deg^2) pairs and near-zero signal — the
    same hot-key cap the MinHash-LSH bucket join uses; dropped sources
    are dropped whole, so the count semantics stay exact over the kept
    set), then a self-join keyed by source with d1 < d2 and one
    combining pair count. Work is sum(deg^2) over kept sources —
    bounded by cap * |edges| — and every shuffle row is two longs.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_out_degree < 2:
        raise ValueError(f"max_out_degree must be >= 2, "
                         f"got {max_out_degree}")
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("d"))
              .distinct())
    deg = e.groupBy("s").agg(F.count("*").alias("__deg__"))
    kept = (e.join(deg.filter(F.col("__deg__") <= max_out_degree), "s")
             .select("s", "d"))
    a = kept.select("s", F.col("d").alias("a"))
    b = kept.select(F.col("s").alias("__s2__"), F.col("d").alias("b"))
    return (a.join(b, (a["s"] == b["__s2__"]) & (a["a"] < b["b"]))
             .groupBy("a", "b").agg(F.count("*").alias("n_common"))
             .filter(F.col("n_common") >= min_common))


def degree_distribution(edges: DataFrame, src: str = "src",
                        dst: str = "dst",
                        direction: str = "out") -> DataFrame:
    """Degree histogram — (degree, n_nodes) for the chosen direction
    ('out', 'in', or 'both' = undirected-with-dedup). THE first-look
    diagnostic of a crawl graph (power-law exponent, mega-hub mass,
    dangling fraction); nodes with zero degree in the chosen direction
    are reported under degree 0 so the histogram covers every node.

    Two combining aggregations (node -> degree, degree -> count) plus
    one left join onto the node set — every shuffle row is two longs;
    the second agg's key space is the distinct degrees (tiny under any
    power law).
    """
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction}")
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("t"))
    nodes = (e.select(F.col("s").alias("node"))
              .union(e.select(F.col("t").alias("node")))
              .distinct())
    if direction == "out":
        keyed = e.select(F.col("s").alias("node"))
    elif direction == "in":
        keyed = e.select(F.col("t").alias("node"))
    else:
        und = e.select("s", "t").union(
            e.select(F.col("t").alias("s"), F.col("s").alias("t")))
        keyed = (und.filter(F.col("s") != F.col("t")).distinct()
                    .select(F.col("s").alias("node")))
    deg = keyed.groupBy("node").agg(F.count("*").alias("degree"))
    full = (nodes.join(deg, "node", "left")
                 .select(F.coalesce("degree", F.lit(0)).alias("degree")))
    return (full.groupBy("degree")
                .agg(F.count("*").alias("n_nodes")))


def k_core(edges: DataFrame, k: int, src: str = "src", dst: str = "dst",
           max_rounds: int = 10) -> DataFrame:
    """k-core of the undirected simple graph (Seidman 1983): the
    maximal subgraph where every node keeps degree >= k — the
    link-spam / template-farm detector (dense cores) and its
    complement the fringe filter. Iterative peeling: drop nodes under
    degree k, recompute degrees in the induced subgraph, repeat to the
    fixpoint (early-stopped when a round removes nothing, bounded by
    ``max_rounds``; peeling is monotone, so extra rounds after the
    fixpoint are no-ops — which lets fixed-round oracles mirror the
    early-stopping run exactly). Returns (node, degree) inside the
    core.

    Scale shape: each round is one semi-join of the undirected edge
    list against the kept set per endpoint + one combining degree
    count — all shuffles carry two longs keyed by node; kept sets are
    eagerly checkpointed (the dedup_clusters pattern) so lineage stays
    O(1); the convergence probe is one count per round.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("t"))
    und = (e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
            .filter(F.col("s") != F.col("t"))
            .distinct()
            .persist())
    cur = und
    deg = cur.groupBy("s").agg(F.count("*").alias("degree"))
    kept = (deg.filter(F.col("degree") >= int(k))
               .localCheckpoint(eager=True))
    n_prev = kept.count()
    for _ in range(int(max_rounds)):
        kn = kept.select("s")
        cur = (und.join(kn, "s", "left_semi")
                  .join(kn.select(F.col("s").alias("t")), "t", "left_semi"))
        deg = cur.groupBy("s").agg(F.count("*").alias("degree"))
        kept = (deg.filter(F.col("degree") >= int(k))
                   .localCheckpoint(eager=True))
        n = kept.count()
        if n == n_prev:
            break
        n_prev = n
    und.unpersist()
    return kept.select(F.col("s").alias("node"), "degree")


def shortest_paths(edges: DataFrame, sources: list,
                   src: str = "src", dst: str = "dst", weight: str = "w",
                   max_rounds: int = 10, directed: bool = True) -> DataFrame:
    """Multi-source WEIGHTED shortest paths — distributed Bellman-Ford
    (label-correcting relaxation), the weighted companion of
    :func:`bfs_distances`: link-cost crawl distance, weighted trust
    propagation, road-network reach. After round k every reachable node
    holds the minimum total weight over paths of <= k edges from the
    seed set; with non-negative weights the iteration is monotone
    non-increasing and stops early at the fixpoint (extra rounds are
    exact no-ops — the k_core convention that lets a fixed-unroll
    oracle equal the early-stopping run).

    Weights are cast to long — exact integer sums in any engine; for
    float costs pre-scale to integer units (ppm) upstream.

    Per round: ONE frontier->edges join (shuffle keyed by node id), a
    combining min per relaxed node, an improvement check against the
    standing distances (only IMPROVED nodes re-enter the frontier, so
    quiescent regions cost nothing), and a combining min merge; every
    per-round frame is eagerly checkpointed so lineage stays O(1).
    Returns (node, dist); unreached nodes are absent.
    """
    if not sources:
        raise ValueError("shortest_paths needs at least one source")
    if max_rounds < 1:
        raise ValueError(f"shortest_paths needs max_rounds >= 1, "
                         f"got {max_rounds}")
    spark = edges.sparkSession
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("t"),
                     F.col(weight).cast("long").alias("w"))
    if not directed:
        e = e.unionAll(e.select(F.col("t").alias("s"),
                                F.col("s").alias("t"), "w"))
    # parallel edges: keep only the cheapest — min() would absorb the
    # rest anyway, this just shrinks every round's join fan-out
    e = e.groupBy("s", "t").agg(F.min("w").alias("w")).persist()
    dist = spark.createDataFrame(
        [(int(v), 0) for v in sorted(set(sources))],
        "node long, dist long").localCheckpoint(eager=True)
    frontier = dist
    for _ in range(int(max_rounds)):
        cand = (e.join(frontier.withColumnRenamed("node", "s"), on="s")
                 .select(F.col("t").alias("node"),
                         (F.col("dist") + F.col("w")).alias("dist"))
                 .groupBy("node").agg(F.min("dist").alias("dist")))
        improved = (cand.join(dist.withColumnRenamed("dist", "__d0__"),
                              "node", "left")
                        .filter(F.col("__d0__").isNull()
                                | (F.col("dist") < F.col("__d0__")))
                        .select("node", "dist")
                        .localCheckpoint(eager=True))
        if improved.isEmpty():
            break
        dist = (dist.unionAll(improved)
                    .groupBy("node").agg(F.min("dist").alias("dist"))
                    .localCheckpoint(eager=True))
        frontier = improved
    e.unpersist()
    return dist
