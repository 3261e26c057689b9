"""Distributed graph centrality — fixed-iteration PageRank (Page et al.
1999) in exact scaled-integer arithmetic.

The canonical distributed PageRank (the shape every Pregel/GraphX/
Spark-summit example uses): ranks live keyed by node, each iteration
joins ranks to the edge list on src, divides a node's rank among its
out-edges, and sums contributions per dst. The iteration count is fixed
and the loop is UNROLLED into one declarative plan — no driver-side
collect, no RDD lineage growth; Catalyst sees a single DAG of
iterations deep joins and AQE right-sizes every exchange.

Arithmetic is scaled int64, not float: rank is carried as
``r = round(rank * SCALE)`` (SCALE = 1e12) and all updates use integer
division, so results are bit-identical regardless of aggregation order
— float PageRank sums contributions in partition order and value-hash
parity against another engine would be luck. The rounding this
introduces is ≤ outdeg ulps per node per iteration at 1e-12 resolution,
invisible at 6-digit output precision. Bounds: SCALE * damping_num
= 8.5e13 < 2^63, and per-node contribution sums are bounded by total
mass SCALE, so no intermediate overflows.

Mass conservation caveat: a node with no out-edges (dangling) leaks its
damped mass instead of redistributing it — the simplification most
fixed-iteration implementations ship. Callers that need conservation
feed a symmetrized edge list (both directions), which has no dangling
nodes by construction; the bipartite customer↔supplier query does
exactly that.

Scale shape (100 TB): the per-iteration work is one edges⋈ranks shuffle
join on src plus one groupBy(dst) — both edge-count-bound; ranks and
outdeg are node-count-bound side tables. On a real cluster the edge
list is the reused relation: bucket it by src (catalog.write_bucketed)
so every iteration's join co-locates without re-shuffling, and persist
it when iterating more than twice — the iteration structure itself
never shuffles anything larger than (node, contribution) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """PageRank over an edge list (columns ``src``, ``dst``), fixed
    ``iterations``, damping d = damping_num/damping_den. Returns
    (node, rank_scaled) with rank_scaled = round(rank * 1e12), exact.
    """
    src_nodes = edges.select(F.col("src").alias("node"))
    dst_nodes = edges.select(F.col("dst").alias("node"))
    nodes = src_nodes.union(dst_nodes).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    if iterations > 1:
        # every iteration re-reads nodes (rank rebuild) and deg (contribution
        # division); without a persist the unrolled plan recomputes the
        # node-distinct and degree shuffles once PER ITERATION from the raw
        # edge list — the iterative-algorithm caching GraphX applies, made
        # explicit (node/edge-count bounded state, never larger than the
        # relations the iterations already shuffle)
        nodes = nodes.persist()
        deg = deg.persist()
    # node count collected once at build (bounded 1-value driver state —
    # the existing graph-family collect discipline) and inlined: the
    # n_row broadcast otherwise rebuilds per reference, one broadcast
    # job for the init plus one per iteration's rank rebuild. Python //
    # == SQL div for these non-negative integers; the max(n, 1) guard
    # only touches the empty-graph case, where no row exists to scale.
    n = max(nodes.count(), 1)
    ranks = nodes.select(
        "node", F.lit(SCALE // n).cast("bigint").alias("r")
    )
    tele = (SCALE * (damping_den - damping_num)) // (damping_den * n)
    for _ in range(iterations):
        contribs = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("r div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.expr(
                    f"cast({tele} as bigint) + (coalesce(s, cast(0 as bigint))"
                    f" * {damping_num}) div {damping_den}"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def pagerank_oracle_ctes(
    edges_cte: str,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """DuckDB replay: CTE chain ending in ``pr(node, rank_scaled)``.
    ``edges_cte`` must expose (src, dst). Same unrolled iterations,
    same integer division (DuckDB ``//`` == Spark ``div``)."""
    tele = (
        f"(CAST({SCALE} AS BIGINT) * {damping_den - damping_num})"
        f" // ({damping_den} * n)"
    )
    parts = [
        (
            "pr_nodes AS (SELECT DISTINCT node FROM ("
            f"SELECT src AS node FROM {edges_cte} "
            f"UNION ALL SELECT dst FROM {edges_cte}))"
        ),
        "pr_n AS (SELECT COUNT(*) AS n FROM pr_nodes)",
        (
            f"pr_outdeg AS (SELECT src, COUNT(*) AS outdeg FROM {edges_cte}"
            " GROUP BY src)"
        ),
        (
            f"pr_r0 AS (SELECT node, CAST({SCALE} AS BIGINT) // n AS r"
            " FROM pr_nodes CROSS JOIN pr_n)"
        ),
    ]
    prev = "pr_r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"pr_c{i} AS (SELECT e.dst AS node, SUM(r.r // d.outdeg) AS s"
            f" FROM {edges_cte} e JOIN {prev} r ON e.src = r.node"
            f" JOIN pr_outdeg d ON e.src = d.src GROUP BY e.dst)"
        )
        parts.append(
            f"pr_r{i} AS (SELECT p.node, {tele}"
            f" + (COALESCE(c.s, 0) * {damping_num}) // {damping_den} AS r"
            f" FROM pr_nodes p CROSS JOIN pr_n"
            f" LEFT JOIN pr_c{i} c ON p.node = c.node)"
        )
        prev = f"pr_r{i}"
    # DuckDB SUM(BIGINT) widens to HUGEINT — cast back for dtype parity
    parts.append(
        f"pr AS (SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM {prev})"
    )
    return ",\n".join(parts)


def triangle_counts(edges: DataFrame, node_a: str = "i", node_b: str = "j") -> DataFrame:
    """Per-node triangle participation over an UNDIRECTED edge list —
    the clustering/community-density primitive (cohesion of an item
    graph, link-farm detection in the reference's SEO domain).

    Input: one row per undirected edge with ``node_a < node_b`` (the
    orientation IS the algorithm: ordering nodes by id makes every
    triangle {a<b<c} countable exactly once as wedge (a-b, b-c) closed
    by edge (a-c) — the standard distributed formulation that avoids
    the 6x duplicate work and the degree^2 blowup on high-degree hubs,
    cf. Suri & Vassilvitskii 2011 "Counting Triangles and the Curse of
    the Last Reducer"; production systems orient by (degree, id) — id
    here since the co-occurrence graph's degrees are catalog-bounded).

    Output: (item, triangles) for every node in >=1 triangle. Scale
    shape: two self-joins on single node keys (edge-count-bound
    shuffles), then an explode + count on node ids. No driver state.
    """
    e = edges.select(F.col(node_a).alias("a"), F.col(node_b).alias("b"))
    ab = e.alias("ab")
    bc = e.alias("bc")
    ac = e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.b") == F.col("bc.a"))
        .join(
            ac,
            (F.col("ac.a") == F.col("ab.a")) & (F.col("ac.b") == F.col("bc.b")),
        )
        .select(
            F.col("ab.a").alias("x"), F.col("ab.b").alias("y"), F.col("bc.b").alias("z")
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
        .orderBy(F.desc("triangles"), "item")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Personalized PageRank (the topic-sensitive variant of Haveliwala
    2002): identical fixed-iteration integer machinery to ``pagerank``,
    except rank mass initializes on — and teleports back to — a SEED set
    (column ``node``) instead of uniformly. The result ranks nodes by
    proximity to the seeds, the primitive behind related-item discovery
    and seed-expanded audience building.

    Same exact scaled-int64 arithmetic (bit-identical under any
    partitioning — DuckDB-replayable), same per-iteration plan shape:
    one edges⋈ranks shuffle join + one groupBy(dst); the seed relation
    is node-count-bounded and broadcast into the rank rebuild.
    """
    src_nodes = edges.select(F.col("src").alias("node"))
    dst_nodes = edges.select(F.col("dst").alias("node"))
    nodes = src_nodes.union(dst_nodes).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    seeds = seeds.select(F.col("node"), F.lit(1).alias("is_seed")).distinct()
    if iterations > 1:
        nodes = nodes.persist()
        deg = deg.persist()
    # seed count collected once at build (bounded 1-value driver state)
    # and inlined; the seed-marked node relation persists because the
    # init + every iteration's rank rebuild re-reads it (each re-read
    # was one more broadcast build of seeds + ns per pass). max(ns, 1)
    # only touches the empty-seed case, where no is_seed=1 row exists
    # for the guarded branch to scale.
    ns = max(seeds.count(), 1)
    marked = nodes.join(F.broadcast(seeds), "node", "left")
    if iterations > 1:
        marked = marked.persist()
    ranks = marked.select(
        "node",
        F.expr(
            f"case when is_seed = 1 then cast({SCALE} as bigint) div {ns} "
            "else cast(0 as bigint) end"
        ).alias("r"),
    )
    tele_seed = (SCALE * (damping_den - damping_num)) // (damping_den * ns)
    teleport = (
        f"case when is_seed = 1 then cast({tele_seed} as bigint) "
        "else cast(0 as bigint) end"
    )
    for _ in range(iterations):
        contribs = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("r div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            marked.join(contribs, "node", "left")
            .select(
                "node",
                F.expr(
                    f"{teleport} + (coalesce(s, cast(0 as bigint))"
                    f" * {damping_num}) div {damping_den}"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def ppr_oracle_ctes(
    edges_cte: str,
    seeds_cte: str,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """DuckDB replay of ``personalized_pagerank``: CTE chain ending in
    ``ppr(node, rank_scaled)``. ``seeds_cte`` must expose (node)."""
    tele = (
        f"CASE WHEN s.node IS NOT NULL THEN (CAST({SCALE} AS BIGINT) * "
        f"{damping_den - damping_num}) // ({damping_den} * ns) ELSE 0 END"
    )
    parts = [
        (
            "pp_nodes AS (SELECT DISTINCT node FROM ("
            f"SELECT src AS node FROM {edges_cte} "
            f"UNION ALL SELECT dst FROM {edges_cte}))"
        ),
        f"pp_seeds AS (SELECT DISTINCT node FROM {seeds_cte})",
        "pp_ns AS (SELECT COUNT(*) AS ns FROM pp_seeds)",
        (
            f"pp_outdeg AS (SELECT src, COUNT(*) AS outdeg FROM {edges_cte}"
            " GROUP BY src)"
        ),
        (
            "pp_r0 AS (SELECT p.node, CASE WHEN s.node IS NOT NULL THEN "
            f"CAST({SCALE} AS BIGINT) // ns ELSE 0 END AS r"
            " FROM pp_nodes p CROSS JOIN pp_ns"
            " LEFT JOIN pp_seeds s ON p.node = s.node)"
        ),
    ]
    prev = "pp_r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"pp_c{i} AS (SELECT e.dst AS node, SUM(r.r // d.outdeg) AS s"
            f" FROM {edges_cte} e JOIN {prev} r ON e.src = r.node"
            f" JOIN pp_outdeg d ON e.src = d.src GROUP BY e.dst)"
        )
        parts.append(
            f"pp_r{i} AS (SELECT p.node, {tele}"
            f" + (COALESCE(c.s, 0) * {damping_num}) // {damping_den} AS r"
            f" FROM pp_nodes p CROSS JOIN pp_ns"
            f" LEFT JOIN pp_seeds s ON p.node = s.node"
            f" LEFT JOIN pp_c{i} c ON p.node = c.node)"
        )
        prev = f"pp_r{i}"
    parts.append(
        f"ppr AS (SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM {prev})"
    )
    return ",\n".join(parts)


HITS_SCALE = 10**6


def hits(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) in exact scaled integers:
    authority(n) = sum of hub scores over in-edges, hub(n) = sum of
    authority scores over out-edges. The textbook L2 normalization is
    float; the exact-replay substitute is MAX-rescaling — after each
    half-step, scores rescale to [0, HITS_SCALE] by integer division
    ``x * HITS_SCALE div max(x)``. Ranking (the thing HITS is for) is
    invariant to the normalization choice; values are bit-identical in
    any partitioning, so DuckDB replays the whole trajectory.

    Overflow bounds: raw score <= edges * HITS_SCALE; the rescale
    multiply needs edges * HITS_SCALE^2 < 2^63, i.e. < ~9e6 edges with
    SCALE = 1e6. Callers at larger edge counts lower HITS_SCALE one
    decade per decade of edges (the rescale keeps precision relative).

    Returns (node, hub_scaled, auth_scaled) for every node.
    ``iterations`` must be >= 1 (the authority scores only exist after
    the first half-step; there is no meaningful 0-iteration output).
    """
    if iterations < 1:
        raise ValueError(f"hits() requires iterations >= 1, got {iterations}")
    hubs = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(HITS_SCALE).cast("bigint").alias("h")
    )
    for _ in range(iterations):
        # each half-step's raw scores are read TWICE (the global max and
        # the rescale) — without a persist the unrolled plan re-evaluates
        # the entire prefix per reference, doubling work every half-step
        # (2^(2*iterations) subtree evaluations; measured 13 s -> ~2 s at
        # sf0.1). The persisted state is node-count-bounded, the same
        # budget as pagerank's nodes/deg persists.
        a_raw = (
            edges.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
            .persist()
        )
        # the rescale maxima are single exact integers over the persisted
        # half-step — collect them at build (bounded driver state, the
        # pagerank-n discipline) and inline: each crossJoin(broadcast)
        # rebuilt a 1-row broadcast per reference per pass. max(None)
        # only happens on an empty graph, where no row exists to rescale.
        am = a_raw.agg(F.max("a")).collect()[0][0] or 1
        auths = a_raw.select(
            "node", F.expr(f"(a * {HITS_SCALE}) div {int(am)}").alias("a")
        )
        h_raw = (
            edges.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
            .persist()
        )
        hm = h_raw.agg(F.max("h")).collect()[0][0] or 1
        hubs = h_raw.select(
            "node", F.expr(f"(h * {HITS_SCALE}) div {int(hm)}").alias("h")
        )
    return (
        hubs.join(auths, "node", "full")
        .select(
            "node",
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub_scaled"),
            F.coalesce("a", F.lit(0)).cast("bigint").alias("auth_scaled"),
        )
    )


def hits_oracle_ctes(edges_cte: str, iterations: int = 2) -> str:
    """DuckDB replay of ``hits``: CTE chain ending in
    ``hits_out(node, hub_scaled, auth_scaled)``."""
    parts = [
        (
            f"ht_h0 AS (SELECT DISTINCT src AS node, CAST({HITS_SCALE} AS BIGINT) AS h"
            f" FROM {edges_cte})"
        )
    ]
    prev_h = "ht_h0"
    for i in range(1, iterations + 1):
        parts.append(
            f"ht_ar{i} AS (SELECT e.dst AS node, CAST(SUM(h.h) AS BIGINT) AS a"
            f" FROM {edges_cte} e JOIN {prev_h} h ON e.src = h.node GROUP BY e.dst)"
        )
        parts.append(f"ht_am{i} AS (SELECT MAX(a) AS am FROM ht_ar{i})")
        parts.append(
            f"ht_a{i} AS (SELECT node, (a * {HITS_SCALE}) // am AS a"
            f" FROM ht_ar{i} CROSS JOIN ht_am{i})"
        )
        parts.append(
            f"ht_hr{i} AS (SELECT e.src AS node, CAST(SUM(a.a) AS BIGINT) AS h"
            f" FROM {edges_cte} e JOIN ht_a{i} a ON e.dst = a.node GROUP BY e.src)"
        )
        parts.append(f"ht_hm{i} AS (SELECT MAX(h) AS hm FROM ht_hr{i})")
        parts.append(
            f"ht_h{i} AS (SELECT node, (h * {HITS_SCALE}) // hm AS h"
            f" FROM ht_hr{i} CROSS JOIN ht_hm{i})"
        )
        prev_h = f"ht_h{i}"
    parts.append(
        "ht_out AS (SELECT COALESCE(h.node, a.node) AS node,"
        " CAST(COALESCE(h.h, 0) AS BIGINT) AS hub_scaled,"
        " CAST(COALESCE(a.a, 0) AS BIGINT) AS auth_scaled"
        f" FROM {prev_h} h FULL JOIN ht_a{iterations} a ON h.node = a.node)"
    )
    return ",\n".join(parts)


def kcore_peel(edges: DataFrame, k: int, iterations: int = 4) -> DataFrame:
    """Iterative k-core peeling (Seidman 1983; the distributed peel is
    the standard Pregel formulation): repeatedly delete nodes with
    degree < k from an UNDIRECTED edge list (both directions present),
    ``iterations`` rounds. At fixpoint the survivors are exactly the
    k-core — the densest-cohesion backbone used for community seeding,
    spam/link-farm isolation, and influence-maximization preprocessing.
    A fixed round count keeps the whole computation one declarative
    plan (no driver-side convergence loop); callers size ``iterations``
    to the graph's peel depth (bipartite trade graphs collapse in 2-3).

    Returns (node, degree) for every survivor, residual degree after
    the last peel. All-integer: bit-identical under any partitioning.

    Scale shape per round: one groupBy(src) degree count plus two
    hash-semi-joins of edges against the (node-count-bounded, persisted)
    survivor set — edge-count-bound, no driver state, no quadratic step.
    """
    live = edges
    for _ in range(iterations):
        deg = live.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        # survivors referenced by BOTH endpoint filters — persist to stop
        # the unrolled plan re-deriving the full prefix per reference
        # (the HITS lesson, same node-count-bounded budget)
        keep = deg.filter(F.col("d") >= k).select("src").persist()
        live = live.join(keep, "src", "left_semi").join(
            keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
        )
    return (
        live.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )


def kcore_oracle_ctes(edges_cte: str, k: int, iterations: int = 4) -> str:
    """DuckDB replay of ``kcore_peel``: CTE chain ending in
    ``kcore(node, degree)``."""
    parts = []
    prev = edges_cte
    for i in range(1, iterations + 1):
        parts.append(
            f"kc_keep{i} AS (SELECT src FROM {prev} GROUP BY src"
            f" HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"kc_live{i} AS (SELECT e.src, e.dst FROM {prev} e"
            f" WHERE e.src IN (SELECT src FROM kc_keep{i})"
            f" AND e.dst IN (SELECT src FROM kc_keep{i}))"
        )
        prev = f"kc_live{i}"
    parts.append(
        f"kcore AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree"
        f" FROM {prev} GROUP BY src)"
    )
    return ",\n".join(parts)


def bfs_hops(edges: DataFrame, seeds: DataFrame, max_hops: int = 3) -> DataFrame:
    """Multi-source BFS over an UNDIRECTED edge list: minimum hop count
    from the seed set (column ``node``) to every node reachable within
    ``max_hops`` — the reachability/radius primitive behind influence
    spheres, crawl-depth audits, and related-entity expansion when rank
    mass (personalized_pagerank) is more machinery than the question
    needs.

    Returns (node, hops), hops in [0, max_hops]. All-integer min-agg —
    bit-identical under any partitioning.

    Scale shape per hop: one frontier⋈edges shuffle join plus one
    min-groupBy — frontier-degree-bound, monotonically shrinking state
    (visited is node-count-bounded and persisted per level, the
    iterative-algorithm budget pagerank/kcore already pay).
    """
    dist = seeds.select("node", F.lit(0).cast("int").alias("hops")).distinct()
    frontier = dist
    for h in range(1, max_hops + 1):
        dist = dist.persist()
        reached = (
            edges.join(
                frontier.withColumnRenamed("node", "src").drop("hops"), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        # persist the frontier too (r15): it feeds BOTH the next hop's
        # edge join and the dist union — the persisted dist materializes
        # a COPY of these rows but the next ``reached`` reads the
        # frontier's own lineage, so without this the frontier's
        # join+distinct+anti-join ran twice per hop. Node-count-bounded.
        frontier = (
            reached.join(dist, "node", "left_anti")
            .select("node", F.lit(h).cast("int").alias("hops"))
            .persist()
        )
        dist = dist.unionAll(frontier)
    return dist


def bfs_oracle_ctes(edges_cte: str, seeds_cte: str, max_hops: int = 3) -> str:
    """DuckDB replay of ``bfs_hops``: CTE chain ending in
    ``bfs(node, hops)``."""
    parts = [
        (
            f"bf_d0 AS (SELECT DISTINCT node, CAST(0 AS INT) AS hops"
            f" FROM {seeds_cte})"
        )
    ]
    prev_dist, prev_front = "bf_d0", "bf_d0"
    for h in range(1, max_hops + 1):
        parts.append(
            f"bf_f{h} AS (SELECT DISTINCT e.dst AS node, CAST({h} AS INT) AS hops"
            f" FROM {edges_cte} e JOIN {prev_front} f ON e.src = f.node"
            f" WHERE e.dst NOT IN (SELECT node FROM {prev_dist}))"
        )
        parts.append(
            f"bf_d{h} AS (SELECT node, hops FROM {prev_dist}"
            f" UNION ALL SELECT node, hops FROM bf_f{h})"
        )
        prev_dist, prev_front = f"bf_d{h}", f"bf_f{h}"
    parts.append(f"bfs AS (SELECT node, hops FROM {prev_dist})")
    return ",\n".join(parts)


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Community detection by label propagation (Raghavan et al. 2007):
    labels initialize to the node's own id; each round every node
    adopts the most frequent label among its in-neighbors, ties broken
    by SMALLEST label — the deterministic variant (classic LPA breaks
    ties randomly; the min-label rule makes every round exactly
    replayable, the same determinism-over-folklore trade the repo's
    k-means/minhash training makes).

    Returns (node, label) after ``iterations`` rounds; connected dense
    regions converge onto one label (the community id = the minimum
    node id that won the neighborhood votes).

    Scale shape per round: one edges⋈labels shuffle join, one
    (node, label) count aggregate, one argmax window over the
    count relation (node-x-distinct-label-bounded, far below edges),
    and a node-count-bounded persisted label rebuild — the Pregel LPA
    shape as unrolled DataFrame ops, no driver loop.
    """
    from pyspark.sql import Window

    src_nodes = edges.select(F.col("src").alias("node"))
    dst_nodes = edges.select(F.col("dst").alias("node"))
    nodes = src_nodes.union(dst_nodes).distinct().persist()
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iterations):
        # labels feeds BOTH the message join and the keep-old fallback —
        # persist the node-count-bounded state (the HITS lesson)
        labels = labels.persist()
        counts = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
        winners = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(winners, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
        )
    return labels


def label_propagation_oracle_ctes(edges_cte: str, iterations: int = 3) -> str:
    """DuckDB replay of ``label_propagation``: CTE chain ending in
    ``lpa(node, label)``."""
    parts = [
        (
            "lp_nodes AS (SELECT DISTINCT node FROM ("
            f"SELECT src AS node FROM {edges_cte} "
            f"UNION ALL SELECT dst FROM {edges_cte}))"
        ),
        "lp_l0 AS (SELECT node, node AS label FROM lp_nodes)",
    ]
    prev = "lp_l0"
    for i in range(1, iterations + 1):
        parts.append(
            f"lp_c{i} AS (SELECT e.dst AS node, l.label, COUNT(*) AS c"
            f" FROM {edges_cte} e JOIN {prev} l ON e.src = l.node"
            f" GROUP BY e.dst, l.label)"
        )
        parts.append(
            f"lp_w{i} AS (SELECT node, label AS new_label FROM ("
            f"SELECT node, label, row_number() OVER (PARTITION BY node"
            f" ORDER BY c DESC, label) AS rn FROM lp_c{i}) WHERE rn = 1)"
        )
        parts.append(
            f"lp_l{i} AS (SELECT p.node, COALESCE(w.new_label, p.label) AS label"
            f" FROM {prev} p LEFT JOIN lp_w{i} w ON p.node = w.node)"
        )
        prev = f"lp_l{i}"
    parts.append(f"lpa AS (SELECT node, label FROM {prev})")
    return ",\n".join(parts)


def bellman_ford(
    edges: DataFrame, seeds: DataFrame, iterations: int = 3
) -> DataFrame:
    """Multi-source Bellman-Ford: minimum path WEIGHT from the seed set
    (column ``node``) within ``iterations`` relaxation rounds, over an
    edge list (src, dst, w) with non-negative integer weights — the
    weighted companion to ``bfs_hops`` (hop counts) for cost-aware
    reachability (cheapest routing hops, fastest fulfillment chains).
    After k rounds the distance equals the true shortest path using at
    most k edges — the standard bounded-horizon semantics of the
    distributed relaxation (Pregel SSSP).

    Returns (node, dist). All-integer min-agg: bit-identical under any
    partitioning, every round DuckDB-replayable.

    Scale shape per round: one dist⋈edges shuffle join + one
    min-groupBy over (node) — edge-count-bound; the distance relation
    is node-count-bounded and persisted (read by the relax join AND
    the min-union rebuild)."""
    dist = seeds.select(
        "node", F.lit(0).cast("bigint").alias("dist")
    ).distinct()
    for _ in range(iterations):
        dist = dist.persist()
        relax = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionAll(relax)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
    return dist


def bellman_ford_oracle_ctes(
    edges_cte: str, seeds_cte: str, iterations: int = 3
) -> str:
    """DuckDB replay of ``bellman_ford``: CTE chain ending in
    ``bf(node, dist)``. ``edges_cte`` exposes (src, dst, w)."""
    parts = [
        (
            f"bfw_d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist"
            f" FROM {seeds_cte})"
        )
    ]
    prev = "bfw_d0"
    for i in range(1, iterations + 1):
        parts.append(
            f"bfw_d{i} AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM ("
            f"SELECT node, dist FROM {prev}"
            f" UNION ALL"
            f" SELECT e.dst AS node, d.dist + e.w AS dist"
            f" FROM {edges_cte} e JOIN {prev} d ON e.src = d.node"
            f") GROUP BY node)"
        )
        prev = f"bfw_d{i}"
    parts.append(f"bf AS (SELECT node, dist FROM {prev})")
    return ",\n".join(parts)
