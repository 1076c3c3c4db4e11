"""Graph operators: weighted PageRank over an edge DataFrame.

The reference repo has no graph surface; this extends the engine the
same way ``dedup.connected_components`` does — iterative algorithms
restated as per-round join + aggregate plans, so every round is an
ordinary distributed shuffle and nothing is ever collected.

PageRank here is the *weighted* formulation: a node's rank flows to its
out-neighbors proportionally to edge weight, and every node receives
the ``(1 - damping) / N`` teleport mass each round.  Dangling mass
(nodes with no out-edges) is NOT redistributed — ranks then sum to less
than 1, which is the convention that keeps every round a single
join + groupBy (redistribution needs an extra global aggregate per
round); callers who need a true probability vector can renormalize the
output in one more map-side pass.

Scale posture: each iteration is ``edges ⋈ ranks`` on ``src`` followed
by a groupBy on ``dst`` — the same shuffle pair a 1000-executor PageRank
does at any graph size.  The rank frame is ``localCheckpoint``-ed per
round to cut the O(iterations) lineage, exactly like
``connected_components`` (dedup.py) does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Ranks after ``iterations`` rounds of weighted PageRank.

    ``edges`` is a (src, dst[, weight]) frame; parallel edges are
    allowed (their weights add).  Returns (node, rank) for every node
    appearing as src or dst, rank unrounded (callers round for oracle
    comparison).

    The iteration count is a FIXED parameter, not a convergence test:
    a deterministic, oracle-replayable result needs an exact round
    count (the DuckDB oracle unrolls the same rounds as CTE layers).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w")
    )
    # Collapse parallel edges once, up front: every iteration reuses
    # this frame, so the groupBy here is paid once and the per-round
    # join build side is minimal.
    e = e.groupBy("_s", "_d").agg(F.sum("_w").alias("_w")).persist()
    # Out-strength per source; edges pre-divided so each round's join
    # multiplies rank * share instead of re-dividing per row.
    out = e.groupBy("_s").agg(F.sum("_w").alias("_out"))
    share = (
        e.join(out, "_s")
        .select("_s", "_d", (F.col("_w") / F.col("_out")).alias("_share"))
        .persist()
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # one scalar; also materializes the persists
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge set (no nodes)")
    teleport = (1.0 - damping) / n_nodes

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contrib = (
            share.join(ranks, share["_s"] == ranks["node"])
            .select(
                F.col("_d").alias("node"),
                (F.col("rank") * F.col("_share")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # Left join from the node list: sources with no in-edges keep
        # exactly the teleport mass.
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def degree_profile(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Per-node degree / strength summary: out_deg, in_deg, out_w, in_w.

    One aggregation per direction, full-outer-joined on node — two
    map-side-combinable shuffles regardless of graph size.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    o = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_deg"), F.sum(w).alias("out_w")
    )
    i = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count("*").alias("in_deg"), F.sum(w).alias("in_w")
    )
    return (
        o.join(i, "node", "full")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            # O(Σ)-magnitude strength sums round at 2dp: at ~1e9 the
            # sum-order ulp (~2e-7) sits ON the 6dp rounding grid
            F.round(F.coalesce("out_w", F.lit(0.0)), 2).alias("out_w"),
            F.round(F.coalesce("in_w", F.lit(0.0)), 2).alias("in_w"),
        )
    )


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row triangle census of an undirected graph: n_nodes, n_edges,
    n_wedges (open two-paths, ``Σ C(deg, 2)``), n_triangles, and the
    global clustering coefficient ``3·triangles / wedges``.

    Scale posture — the whole point of this operator: the naive
    wedge join explodes as ``Σ deg²`` (hub-quadratic), so edges are
    ORIENTED from the lower to the higher endpoint in the (degree,
    node) total order first. Oriented out-degree is bounded by
    ``O(√m)`` on any graph, which caps the wedge join at ``O(m^1.5)``
    — the standard distributed triangle-counting bound (the MapReduce
    formulation of node-iterator++). Each triangle then has exactly one
    source in the orientation DAG and is counted once by the closing
    edge join, with no post-hoc division by 3/6.

    Self-loops are dropped; parallel/bidirectional duplicates collapse
    via the canonical (least, greatest) form. All joins are equality
    joins on node keys; counts ride as 1-row crossJoined aggregates so
    the operator returns a DataFrame without driver-side actions.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    # |V|-bounded and read by FOUR consumers (both join decorations,
    # n_nodes, n_wedges) — Catalyst shares no subtrees, so without a
    # persist each consumer re-runs the union + degree shuffle
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("_db"))
    with_deg = e.join(da, "a").join(db, "b")
    # orient: lower (deg, node) -> higher; ties impossible on node
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    o = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).persist()
    x = o.select(F.col("u"), F.col("v").alias("_x"))
    y = o.select(F.col("u"), F.col("v").alias("_y"))
    # both (x,y) and (y,x) wedges exist, but only ONE of them matches
    # the oriented closing edge -> each triangle counted exactly once
    wedges = x.join(y, "u").filter(F.col("_x") != F.col("_y"))
    closing = o.select(F.col("u").alias("_x"), F.col("v").alias("_y"))
    tri = wedges.join(closing, ["_x", "_y"]).agg(
        F.count("*").alias("n_triangles")
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    # coalesce: on an empty edge set sum() is NULL; the census should
    # read all-zero, not NULL (and try_divide below keeps the
    # clustering coefficient NULL-safe either way)
    n_wedges = deg.agg(
        F.coalesce(F.sum(F.col("deg") * (F.col("deg") - 1) / 2), F.lit(0.0))
        .cast("long")
        .alias("n_wedges")
    )
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(n_wedges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.try_divide(
                    F.lit(3.0) * F.col("n_triangles"), F.col("n_wedges")
                ),
                6,
            ).alias("clustering_coeff"),
        )
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 1000,
    round_dp: int = 6,
) -> DataFrame:
    """Adamic-Adar link prediction: for every NON-adjacent node pair
    (u, v) with at least one common neighbor, the score
    ``Σ_{z ∈ N(u)∩N(v)} 1 / ln(deg(z))`` — common neighbors weighted
    by how selective they are (a shared niche contact is strong
    evidence; a shared hub is nearly none).

    Plan: canonicalize to an undirected, deduplicated edge set; one
    degree aggregation; a wedge self-join of the (node, neighbor,
    deg(neighbor)) adjacency on the shared neighbor ``z``; one
    groupBy(u, v) summing the per-wedge weights; and a left-anti join
    against the edge set to keep only *predicted* (absent) links.

    Scale posture: the wedge join through ``z`` is O(deg(z)²), so hubs
    above ``max_degree`` are excluded from the middle position — the
    standard cut for distributed Adamic-Adar, and principled here
    because a hub's weight ``1/ln(deg)`` is the least informative
    signal in the sum. With the cap, per-``z`` work is bounded by a
    constant and the whole plan is three hash shuffles on node keys.
    A common neighbor has deg ≥ 2 by construction, so ``ln(deg)`` is
    never 0.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("z")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("z"))
    )
    deg = adj.groupBy("z").agg(F.count("*").alias("_dz"))
    mid = adj.join(deg, "z").filter(F.col("_dz") <= F.lit(max_degree))
    left = mid.select("z", F.col("u").alias("node_a"), "_dz")
    right = mid.select("z", F.col("u").alias("node_b"))
    scored = (
        left.join(right, "z")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("_dz"))), round_dp).alias(
                "aa_score"
            ),
        )
    )
    existing = e.select(
        F.col("a").alias("node_a"), F.col("b").alias("node_b")
    )
    return scored.join(existing, ["node_a", "node_b"], "left_anti")


def k_core(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    max_rounds: int = 8,
) -> DataFrame:
    """Nodes of the k-core — the maximal subgraph in which every node
    has degree >= k — with their in-core degree.

    Iterative peeling (Seidman 1983): each round drops every node whose
    CURRENT degree is < k, then drops edges that lost an endpoint;
    converged when an edge-count round changes nothing. Every round is
    one degree aggregation plus two semi joins — plain shuffles that
    scale out at any graph size — and the surviving edge set is
    localCheckpoint-ed per round to cut the lineage, like
    ``dedup.connected_components``.

    Raises on non-convergence rather than returning a half-peeled
    graph; within the budget the result equals replaying EXACTLY
    ``max_rounds`` peels (peeling is idempotent once stable), which is
    what the SQL oracle does.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    # Keyed repartition before the checkpoint: the upstream edge frame
    # often inherits a fan_out/persist-pinned partition count (the
    # checkpoint would pin 2x that via the union), making every peel
    # round run wide stages over kilobytes. A keyed exchange is
    # AQE-coalescible — right-sized at bench AND at scale (guide §2.4).
    # lazy checkpoint + count fused into ONE driver action (the
    # unrestricted count computes every partition, materializing the
    # checkpoint as a side effect); the count must precede the round's
    # multi-consumer reads so they hit the cache, and it does.
    cur = sym.repartition("a").localCheckpoint(eager=False)
    n_edges = cur.count()
    for _ in range(max_rounds):
        keep = (
            cur.groupBy("a")
            .agg(F.count("*").alias("_d"))
            .filter(F.col("_d") >= k)
            .select("a")
        )
        nxt = cur.join(keep, "a", "semi").join(
            keep.withColumnRenamed("a", "b"), "b", "semi"
        )
        nxt = nxt.localCheckpoint(eager=False)  # fused with the count below
        n_next = nxt.count()
        if n_next == n_edges:
            return (
                cur.groupBy(F.col("a").alias("node"))
                .agg(F.count("*").alias("core_degree"))
            )
        cur, n_edges = nxt, n_next
    raise RuntimeError(
        f"k_core: no convergence after {max_rounds} peel rounds; raise "
        f"max_rounds (the oracle replays the same fixed round count)"
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    round_dp: int = 6,
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all (directed-both-ways)
    edges. Positive = hubs attach to hubs; negative = hub-and-spoke.

    One degree aggregation, two equi joins to decorate each edge end
    (AQE broadcasts the node-cardinality degree frame), then Pearson
    in moment form — all sums are INTEGER-exact until the final
    division, so the statistic is bit-identical across engines.
    """
    # sym feeds the degree aggregate AND the decorated join's edge
    # side; deg decorates both ends — persist both (2|E| and |V|
    # bounded) so the edge scan and degree shuffle run once each
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).persist()
    deg = sym.groupBy("a").agg(F.count("*").alias("_d")).persist()
    decorated = (
        sym.join(deg.withColumnsRenamed({"a": "a", "_d": "_da"}), "a")
        .join(
            deg.withColumnsRenamed({"a": "b", "_d": "_db"}), "b"
        )
    )
    agg = decorated.agg(
        F.count("*").alias("n_edge_ends"),
        F.sum("_da").alias("_sx"),
        F.sum("_db").alias("_sy"),
        F.sum(F.col("_da") * F.col("_db")).alias("_sxy"),
        F.sum(F.col("_da") * F.col("_da")).alias("_sxx"),
        F.sum(F.col("_db") * F.col("_db")).alias("_syy"),
    )
    n = F.col("n_edge_ends").cast("double")
    cov = F.col("_sxy") - F.col("_sx") * F.col("_sy") / n
    vx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / n
    vy = F.col("_syy") - F.col("_sy") * F.col("_sy") / n
    r = F.coalesce(
        F.try_divide(cov, F.sqrt(F.greatest(F.lit(0.0), vx * vy))),
        F.lit(0.0),
    )
    return agg.select(
        "n_edge_ends", F.round(r, round_dp).alias("assortativity")
    )


def harmonic_centrality_2hop(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """Harmonic centrality truncated at radius 2:
    ``C(v) = |N1(v)| + |N2(v)| / 2`` where N2 is the set of nodes at
    distance exactly 2 — the standard scalable stand-in for full
    closeness (which needs all-pairs BFS) on large graphs.

    Two equi joins: the symmetric edge list composed with itself gives
    2-hop candidates; distance-2 membership is ``distinct minus self
    minus direct neighbors`` — an anti join, still equality-keyed.
    The 2-hop expansion is Σ deg(intermediate)² pairs, so paths are
    only routed THROUGH intermediates with degree <= ``max_degree``
    (the same hub cap as :func:`link_prediction`): a mega-hub stops
    amplifying candidate pairs quadratically, at the documented cost
    of under-counting N2 for pairs whose ONLY connection is that hub.
    Output: (node, n_1hop, n_2hop, harmonic_c2).

    The symmetric edge frame is consumed FOUR times (degree count,
    routed side, expansion side, anti-join side) and Catalyst shares
    no subtrees — persisting it stops the upstream edge generator
    re-running per consumer (measured min-of-2: 3.8s -> 1.7s at
    sf0.1, 5.1s -> 3.2s at 10x, on the co-purchase graph).
    """
    from streaming_demos_spark.catalog import bounded_persist

    sym = bounded_persist(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        ).distinct()
    )
    n1 = sym.groupBy("a").agg(F.count("*").alias("n_1hop"))
    mid_ok = n1.filter(F.col("n_1hop") <= F.lit(max_degree)).select(
        F.col("a").alias("_mid")
    )
    routed = sym.join(mid_ok, sym["b"] == mid_ok["_mid"], "semi")
    hop2 = (
        routed.alias("e1")
        .join(sym.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("a"), F.col("e2.b").alias("c"))
        .filter(F.col("a") != F.col("c"))
        .distinct()
        .join(
            sym.select(F.col("a"), F.col("b").alias("c")),
            ["a", "c"],
            "left_anti",
        )
        .groupBy("a")
        .agg(F.count("*").alias("n_2hop"))
    )
    return (
        n1.join(hop2, "a", "left")
        .select(
            F.col("a").alias("node"),
            "n_1hop",
            F.coalesce("n_2hop", F.lit(0)).alias("n_2hop"),
            F.round(
                F.col("n_1hop")
                + F.coalesce("n_2hop", F.lit(0)) / F.lit(2.0),
                round_dp,
            ).alias("harmonic_c2"),
        )
    )


def co_occurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    keep_support: bool = False,
) -> DataFrame:
    """Support-filtered co-occurrence edges (item pairs sharing a
    basket) — the shared edge generator for the co-purchase graph
    family (triangles, k-core, link prediction, assortativity,
    centrality).

    One shuffle: items are collected per basket (basket sizes are
    bounded — an order has a handful of lines), pairs are generated
    JVM-side from the sorted array (``transform`` + ``slice`` +
    ``explode``), then hash-aggregated by pair. This replaces the
    basket self-JOIN formulation (two shuffles of the fact table) and
    measures ~1.45x faster at sf0.1 with an identical pair multiset —
    equal items inside one basket are excluded either way.
    Output: (p1, p2) with p1 < p2 and support >= ``min_support``.
    """
    baskets = df.groupBy(basket_col).agg(
        F.sort_array(F.collect_list(item_col)).alias("_ps")
    )
    ps = F.col("_ps")
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ps,
                    lambda x, i: F.transform(
                        F.slice(ps, i + 2, F.size(ps)),
                        lambda y: F.struct(
                            x.alias("p1"), y.alias("p2")
                        ),
                    ),
                )
            )
        ).alias("_e")
    ).select("_e.p1", "_e.p2").filter(F.col("p1") < F.col("p2"))
    out = (
        pairs.groupBy("p1", "p2")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return out if keep_support else out.select("p1", "p2")


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), made fully deterministic: every node starts with its
    own id as label; each round EVERY node simultaneously adopts the
    most frequent label among its neighbors, ties broken by the
    smallest label. A FIXED round count (no convergence test) keeps the
    result an exact function of the edge set — the SQL oracle replays
    the identical rounds as chained CTE layers.

    Each round is one join (neighbor labels) + one (node, label) count
    + one argmax aggregation — plain key shuffles that scale out with
    the edge count; the label frame is localCheckpoint-ed per round to
    cut lineage like ``pagerank``/``k_core``. Output: (node, community)
    where community is the final label.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        # keyed (AQE-coalescible) repartition: don't let the checkpoint
        # pin the upstream's inherited partition count (see k_core)
        .repartition("b")
        # sym stays EAGER: rounds 1..3 each read it through their own
        # shuffle-map stage, and those stages have no inter-round
        # dependency — with a lazy sym the scheduler would launch all
        # three concurrently and race-recompute the upstream edge
        # pipeline. One materialization action, then cached-block reads.
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        nbr = sym.join(
            labels.select(F.col("node").alias("b"), "lbl"), "b"
        ).select(F.col("a"), "lbl")
        cnt = nbr.groupBy("a", "lbl").agg(F.count("*").alias("_c"))
        # argmax label by (count DESC, label ASC): maximize the
        # (count, -label) struct — deterministic under any layout
        labels = (
            cnt.groupBy(F.col("a").alias("node"))
            .agg(
                F.max_by(
                    F.col("lbl"), F.struct(F.col("_c"), -F.col("lbl"))
                ).alias("lbl")
            )
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("lbl").alias("community"))
