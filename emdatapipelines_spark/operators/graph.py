"""Iterative graph analytics: weighted PageRank, triangle counting.

The second iterative-algorithm pattern in the engine (the first is
connected components, `llmdata/dedup.py:connected_components`): a
fixed-iteration loop whose body is one join + one aggregate, expressed so
every pass is a single hash shuffle keyed by the destination node.

Use cases in a data-curation pipeline: centrality over a similarity or
citation graph ranks documents for sampling priority (the link-graph quality
signal web-corpus pipelines use); over an entity graph (the fixture query
ranks nations by trade flow) it is the standard influence score the
reference's analytics marts approximate with hand-built aggregates
(`dbt_projects/emergency_data/models/marts/disaster_analytics.sql` severity
rollups).

Determinism convention (FIXTURES.md): per-edge contributions are rounded to
``scale`` dp and summed in exact DECIMAL, so ranks are bit-identical across
partitionings and engines; the fixed iteration count (no convergence test)
keeps the oracle SQL expressible as ``iterations`` unrolled CTEs.

Scale notes: each iteration shuffles |edges| contribution rows to |nodes|
groups with map-side combine — the textbook Pregel superstep as a DataFrame
plan. Degrees are computed once. For many iterations add per-round
``localCheckpoint`` (see connected_components) to cap plan growth; at k ≤ 5
the plan stays small without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_weighted(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 8,
) -> DataFrame:
    """Weighted PageRank over a directed edge list with positive integer
    weights. Returns ``(id, rank)`` for every node appearing as src or dst;
    nodes without in-edges hold the teleport base. Ranks are rounded to
    ``scale`` dp each iteration (see module docstring)."""
    outw = edges.groupBy(src).agg(F.sum(weight).alias("wtot"))
    # materialize the degree-annotated edge list and node spine ONCE: every
    # superstep joins against them, and without truncation Spark re-evaluates
    # the (possibly expensive) edge-derivation subtree per iteration while
    # the plan doubles in size (same device as connected_components)
    e = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
            F.col(weight).alias("e_w"), "wtot",
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # bounded driver scalar: node count
    if n == 0:
        # empty graph: no nodes to rank (and 1/n below would divide by zero)
        return nodes.select("id", F.lit(None).cast("double").alias("rank"))
    base = (1.0 - damping) / n
    r = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = e.join(r, e["e_src"] == r["id"]).select(
            F.col("e_dst").alias("cid"),
            F.round(F.col("r") * F.col("e_w") / F.col("wtot"), scale).alias("contrib"),
        )
        mass = contrib.groupBy("cid").agg(
            F.sum(F.col("contrib").cast(f"decimal(28,{scale})")).cast("double").alias("m")
        )
        r = nodes.join(mass, nodes["id"] == mass["cid"], "left").select(
            nodes["id"],
            F.round(
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0)), scale
            ).alias("r"),
        )
    return r.select("id", F.col("r").alias("rank"))


def hits_weighted(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 2,
    scale: int = 8,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a weighted directed
    edge list, ``iterations`` full (authority, hub) update rounds from
    uniform hub scores, L1-normalized each half-step:

        a(i) ← Σ_{j→i} w(j,i)·h(j)   then  a ← a / Σa
        h(j) ← Σ_{j→i} w(j,i)·a(i)   then  h ← h / Σh

    Same determinism ladder as :func:`pagerank_weighted`: per-edge products
    round to ``scale`` dp, exact DECIMAL sums, and the normalizer is a
    1-row aggregate CROSS-JOINED back (broadcast — no collect), so scores
    are bit-identical across partitionings and the oracle unrolls the same
    CTE half-steps. Each half-step is one |edges| shuffle with map-side
    combine; node scores are |nodes|-sized. Returns (id, hub, authority)."""
    if iterations < 1:
        raise ValueError(f"hits_weighted requires iterations >= 1, got {iterations}")
    dec = f"decimal(28,{scale})"
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), F.col(weight).alias("e_w")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("e_src").alias("id"))
        .union(e.select(F.col("e_dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = nodes.withColumn("h", F.lit(1.0))
    a = None
    for _ in range(iterations):
        a_raw = (
            e.join(h, e["e_src"] == h["id"])
            .select(
                F.col("e_dst").alias("nid"),
                F.round(F.col("h") * F.col("e_w"), scale).alias("c"),
            )
            .groupBy("nid")
            .agg(F.sum(F.col("c").cast(dec)).cast("double").alias("raw"))
        )
        suma = a_raw.agg(
            F.sum(F.col("raw").cast(dec)).cast("double").alias("tot")
        )
        # r14: checkpoint each half-step score frame. ``a`` is consumed by
        # BOTH the next half-step and the final join (and ``h`` by the next
        # iteration and the final join), so without truncation the plan
        # roughly doubles per half-step — measured at 4,480 formatted-plan
        # lines / 360 Exchange nodes for iterations=2, with Catalyst
        # re-optimizing the whole tree every run. The score frames are
        # |nodes|-sized, so the eager checkpoint is a tiny job; the
        # arithmetic (and therefore every output bit) is unchanged.
        from ..cachectl import tracked_local_checkpoint

        a = tracked_local_checkpoint(
            nodes.join(a_raw, nodes["id"] == a_raw["nid"], "left")
            .crossJoin(F.broadcast(suma))
            .select(
                nodes["id"],
                F.round(F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("tot"), scale).alias("a"),
            )
        )
        h_raw = (
            e.join(a, e["e_dst"] == a["id"])
            .select(
                F.col("e_src").alias("nid"),
                F.round(F.col("a") * F.col("e_w"), scale).alias("c"),
            )
            .groupBy("nid")
            .agg(F.sum(F.col("c").cast(dec)).cast("double").alias("raw"))
        )
        sumh = h_raw.agg(
            F.sum(F.col("raw").cast(dec)).cast("double").alias("tot")
        )
        h = tracked_local_checkpoint(
            nodes.join(h_raw, nodes["id"] == h_raw["nid"], "left")
            .crossJoin(F.broadcast(sumh))
            .select(
                nodes["id"],
                F.round(F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("tot"), scale).alias("h"),
            )
        )
    return (
        nodes.join(h.select(F.col("id").alias("hid"), "h"), nodes["id"] == F.col("hid"))
        .join(a.select(F.col("id").alias("aid"), "a"), nodes["id"] == F.col("aid"))
        .select("id", F.col("h").alias("hub"), F.col("a").alias("authority"))
    )


def cooccurrence_edges(
    facts: DataFrame,
    group_col: str,
    node_col: str,
    min_shared: int = 5,
) -> DataFrame:
    """Thresholded co-occurrence edge list: an undirected edge ``(src <
    dst)`` joins two nodes appearing in at least ``min_shared`` distinct
    groups together (suppliers sharing orders, terms sharing documents…).

    The threshold is load-bearing at scale, exactly like ``max_shingle_df``
    in the jaccard join: the UNthresholded co-occurrence graph of a random
    mix converges to a complete graph (measured: half of all supplier pairs
    qualify at sf1 → 2.5e9 wedges, 127s), while recurring-relationship
    edges stay sparse. The self-join is per-group bounded (group size²),
    the standard bipartite-projection shape.

    This is THE shared derivation of the gr_* family (triangles,
    clustering, power-law fit all start here) — register it once as the
    ``graph_edges`` materialized model (`plans/graph_marts.py`) and serve
    the family from the cache instead of re-running the self-join per
    query (VERDICT r9 #3)."""
    a, b = facts.alias("a"), facts.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
            & (F.col(f"a.{node_col}") < F.col(f"b.{node_col}")),
        )
        .groupBy(
            F.col(f"a.{node_col}").alias("src"), F.col(f"b.{node_col}").alias("dst")
        )
        .agg(F.countDistinct(F.col(f"a.{group_col}")).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
        .select("src", "dst")
    )


def endpoint_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected degrees ``(id, d)`` from an edge list — one explode pass
    over both endpoints (a union of two selects would re-plan the edge
    subtree twice, the r9 multi-consumer lesson)."""
    return (
        edges.select(F.explode(F.array(F.col(src), F.col(dst))).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Exact global triangle count over an UNDIRECTED graph given as an edge
    list (either orientation, duplicates/self-loops tolerated). Returns a
    single row ``(n_triangles bigint)``.

    Algorithm: degree-ordered orientation (the classic O(m^1.5) bound —
    Schank & Wagner 2005; the same trick GraphX's TriangleCount and every
    production system use). Each undirected edge is oriented from its
    lower-(degree, id) endpoint to its higher one, so every node's
    out-degree is O(sqrt(m)); wedges are then a self-join of the oriented
    list on the source node, and a triangle is a wedge whose far pair is
    itself an oriented edge. Without orientation the wedge count is
    sum(deg^2) — a hub with degree 10^6 alone generates 10^12 wedges; with
    it, the wedge join is bounded by m^1.5 no matter how skewed the degree
    distribution. Three shuffles total (degree agg, wedge self-join,
    closing equi-join); the count is orientation-invariant, so a plain
    ``u < v`` SQL twin is an exact oracle.

    ``materialize=True`` (r15, guide §3.3 "materialise to truncate")
    checkpoints the ORIENTED edge list once: it has three consumers (both
    wedge sides + the closing join), so without it the whole
    und→deg→orient subtree is planned three times (the r14 plans were
    610/666 lines) and only runtime exchange reuse deduped the execution.
    A `tracked_local_checkpoint` of the (m-row, 3-long-column) frame
    truncates all three consumers to a materialized leaf. This supersedes
    the r8 finding that PERSISTING ``und``+``oriented`` lost at sf1
    (14.4s vs 8.6s warm): that A/B paid two cache writes and still
    re-planned the subtrees; the single checkpoint pays one small write
    and collapses the plan (r15 A/B in OPTIMIZATION_r15.md)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # explode both endpoints in ONE pass — a union of two selects would
    # re-evaluate the und subtree twice (the r9 multi-consumer lesson)
    deg = (
        und.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id) total order; carry the head's rank key so the
    # wedge join below can order the two far endpoints without re-joining deg
    du, dv = deg.alias("du"), deg.alias("dv")
    ranked = (
        und.join(du, F.col("u") == F.col("du.id"))
        .join(dv, F.col("v") == F.col("dv.id"))
        .select(
            "u", "v",
            F.col("du.d").alias("d_u"), F.col("dv.d").alias("d_v"),
        )
    )
    u_first = (F.col("d_u") < F.col("d_v")) | (
        (F.col("d_u") == F.col("d_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("d_v")).otherwise(F.col("d_u")).alias("d_b"),
    )
    if materialize:
        from ..cachectl import tracked_local_checkpoint

        oriented = tracked_local_checkpoint(oriented)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # wedge (a; b1, b2) with b1 before b2 in the same (degree, id) order —
    # counts each wedge once; the closing edge must then be b1 -> b2
    wedge = e1.join(e2, F.col("e1.a") == F.col("e2.a")).filter(
        (F.col("e1.d_b") < F.col("e2.d_b"))
        | ((F.col("e1.d_b") == F.col("e2.d_b")) & (F.col("e1.b") < F.col("e2.b")))
    ).select(F.col("e1.b").alias("x"), F.col("e2.b").alias("y"))
    closed = wedge.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"]
    )
    return closed.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def khop_min_hops(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
) -> DataFrame:
    """Minimum-hop reachability within ``k`` hops over a directed edge
    list: returns ``(src, dst, min_hops)`` for every ordered pair
    connected by a path of length ≤ k — the bounded-depth BFS that a
    recursive-CTE engine expresses with ``WITH RECURSIVE`` and Spark
    expresses as k unrolled frontier-expansion joins.

    Each round is ONE shuffle: the previous frontier joins the edge list
    on its endpoint (hash-partitioned by node), then de-duplicates —
    per-round `distinct` keeps the frontier a SET, so the intermediate
    never exceeds |reachable pairs| regardless of how many parallel paths
    exist (the recursive CTE's UNION ALL enumerates paths; the final MIN
    collapses them — same result, but the set-per-round form is the one
    that survives high-fan-out graphs). min_hops falls out for free: a
    pair first appears in round h ⇔ its shortest path is h, so the final
    group-min over rounds equals BFS depth. For large k add per-round
    localCheckpoint (see pagerank_weighted); at k ≤ 4 the plan stays
    small.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    rounds = [e.withColumn("h", F.lit(1))]
    frontier = e
    for i in range(2, k + 1):
        frontier = (
            frontier.alias("f")
            .join(e.alias("g"), F.col("f.d") == F.col("g.s"))
            .select(F.col("f.s").alias("s"), F.col("g.d").alias("d"))
            .distinct()
        )
        rounds.append(frontier.withColumn("h", F.lit(i)))
    allr = rounds[0]
    for r in rounds[1:]:
        allr = allr.unionByName(r)
    return (
        allr.groupBy(F.col("s").alias(src), F.col("d").alias(dst))
        .agg(F.min("h").cast("int").alias("min_hops"))
        .orderBy(src, dst)
    )


def label_propagation_min(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous min-label propagation for ``iterations`` rounds over an
    UNDIRECTED view of the edge list: every node starts labeled with its
    own id, and each round takes ``min(own label, neighbors' labels)``.
    Returns ``(node, community)`` — after k rounds two nodes share a
    community iff they are within the same k-hop-bounded component, the
    deterministic (min-tiebreak) variant of Raghavan-style label
    propagation that a SQL engine writes as k unrolled CTEs.

    Each round is ONE hash shuffle: the node-label frame joins the
    symmetrized adjacency on the neighbor endpoint and group-mins by
    node (map-side combined), then a left join folds isolated nodes back
    with their own label. The adjacency is built once; labels are the
    only frame that iterates, so every superstep moves |edges| rows into
    |nodes| groups — the same Pregel shape as :func:`pagerank_weighted`.
    For large k add per-round ``localCheckpoint``; at k ≤ 4 the unrolled
    plan stays small.
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    # materialize the (possibly expensive) edge derivation ONCE — adj, nodes,
    # and every propagation round all consume it, and without truncation
    # Spark re-evaluates the whole upstream subtree per consumer while the
    # plan snowballs (the pagerank / connected-components device). One
    # checkpoint of the symmetrized list, both views derived from it cheaply.
    sym = fwd.unionByName(rev).localCheckpoint(eager=True)
    adj = sym.filter(F.col("u") != F.col("v")).distinct()
    nodes = sym.select(F.col("u").alias("node")).distinct()
    lbl = nodes.withColumn("lbl", F.col("node"))
    for _ in range(iterations):
        nb_min = (
            adj.join(lbl.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        lbl = (
            lbl.join(nb_min, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nb_lbl"), F.col("lbl"))).alias("lbl"),
            )
        )
    return lbl.select("node", F.col("lbl").alias("community"))


def kcore_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    rounds: int = 3,
) -> DataFrame:
    """Bounded k-core peeling over an UNDIRECTED view of the edge list:
    ``rounds`` synchronous passes, each dropping every node whose degree
    in the SURVIVING subgraph is < k (Matula-Beck peeling, fixed-round
    form — the semantics a SQL engine states as ``rounds`` unrolled
    CTEs; on graphs whose peel sequence stabilizes within ``rounds``
    this IS the k-core). Returns ``(node, degree)`` for survivors, with
    degree measured in the surviving subgraph.

    Each round = one degree hash-agg over the surviving adjacency + two
    semi-joins pruning the edge list — node-keyed shuffles of frames
    that only ever SHRINK. For peel-to-fixpoint at scale, loop rounds
    with a localCheckpoint every few passes (the connected-components
    pattern); the fixed-round form keeps plans bounded and the oracle
    expressible.
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    # one eager materialization of the symmetrized edge list: each peel round
    # consumes adj three times (degree agg + two semi-joins), so an
    # untruncated lineage would re-derive the upstream join pyramid 3x/round
    adj = (
        fwd.unionByName(rev)
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("__d"))
        keep = deg.filter(F.col("__d") >= k).select("u")
        adj = (
            adj.join(keep, "u", "semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "semi")
            .select("u", "v")
        )
    return (
        adj.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("int").alias("degree"))
        .orderBy("node")
    )
