"""Distributed graph operators (engine extension; the reference has no
graph surface). Currently: exact triangle census via degree-ordered
edge orientation — the MapReduce-era discipline that bounds wedge-join
work at O(E^1.5) under power-law degree skew, because every triangle is
emitted by exactly one node (its orientation-smallest), never by a hub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.materialize import pinned

# pagerank's node count per pool name — a scalar of the pooled degree
# frame (same in-session lifecycle as the pool itself; invalidated on
# rebuild). Saves one count job per pool_reuse call.
_PR_N: dict[str, int] = {}


def symmetric_adjacency(
    e: DataFrame, pool: str | None = None
) -> DataFrame:
    """Symmetric adjacency (node, other) of an undirected (u, v) edge
    list, HASH-PARTITIONED on ``node`` and optionally pooled (r11b).

    The per-round Pregel operators (k-core, BFS) probe this frame every
    round through broadcast semi-joins and then aggregate by ``node`` —
    rebuilding the two-scan union per round re-evaluated the edge pool
    twice per round (the r11b event log showed one 64-task ~0.65 s
    stage per peel round that was exactly this), and the groupBy paid
    its exchange each time. A pinned copy partitioned on the aggregate
    key is scanned from cache and satisfies the groupBy's required
    distribution outright (guide §2.4 — operations keyed the same way
    share one exchange; broadcast semi-joins preserve the layout).
    ``pool=None`` keeps the old inline shape for one-shot callers.

    POOL-KEY CONTRACT: ``pool`` must uniquely key the EDGE SOURCE — a
    pooled generation is served verbatim with no check that it was
    built from an equivalent edge frame, so two callers passing
    different edge lists under one pool name would silently compute
    over the wrong graph. Current call sites key by sf_dir (the
    per-corpus co-purchase graph); any new caller must do the same
    (ADVICE r11)."""
    from ..plans.materialize import pinned, pool_get

    spark = e.sparkSession
    if pool is not None:
        cached = pool_get(pool, spark)
        if cached is not None:
            return cached
    sym = e.select(F.col("u").alias("node"), F.col("v").alias("other")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("other"))
    )
    if pool is None:
        return sym
    sym = sym.repartition(spark.sparkContext.defaultParallelism, "node")
    return pinned(sym, pool)


def triangle_census(
    e: DataFrame, pool: str = "tri_edges", pre_pinned: bool = False
) -> DataFrame:
    """Exact triangle census of an undirected simple graph.

    ``e`` must hold one row per undirected edge as (u, v) with u < v,
    no duplicates, no self-loops. Returns one row: n_nodes, n_edges,
    n_wedges (sum over nodes of C(deg, 2)), n_triangles, and the global
    transitivity 3T/W (rounded 6dp).

    Plan: degree table → orient each edge from its (degree, id)-smaller
    endpoint → self-join oriented edges on src with an orientation-order
    guard (counts each out-out wedge once) → closure check against the
    undirected edge set. The edge frame is pinned (pooled persist)
    because degree, orientation, and closure all consume it.

    The degree table is O(V) rows — NOT broadcast-hinted: at graph scale
    a node-cardinality broadcast would overwhelm driver and executors,
    so the degree joins are left to AQE (which broadcasts them only when
    the measured size is actually under the threshold).

    ``pre_pinned``: the caller already persisted ``e`` (e.g. the pooled
    per-corpus co-purchase edge list shared by the whole graph family,
    r11) — skip the internal pin so the shared generation isn't
    re-registered (and later unpersisted) under this operator's pool."""
    if not pre_pinned:
        e = pinned(e, pool)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    ed = e.join(du, F.col("u") == F.col("du.node")).join(
        dv, F.col("v") == F.col("dv.node")
    )
    u_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv.d")).otherwise(F.col("du.d")).alias("ddst"),
    )
    o1, o2 = o.alias("o1"), o.alias("o2")
    lt = (F.col("o1.ddst") < F.col("o2.ddst")) | (
        (F.col("o1.ddst") == F.col("o2.ddst"))
        & (F.col("o1.dst") < F.col("o2.dst"))
    )
    cand = o1.join(o2, (F.col("o1.src") == F.col("o2.src")) & lt).select(
        F.least(F.col("o1.dst"), F.col("o2.dst")).alias("u"),
        F.greatest(F.col("o1.dst"), F.col("o2.dst")).alias("v"),
    )
    tri = cand.join(e, ["u", "v"]).agg(F.count(F.lit(1)).alias("n_triangles"))
    aggd = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    )
    ecnt = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        aggd.crossJoin(F.broadcast(ecnt))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("transitivity"),
        )
    )


def pagerank(
    e: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    pool: str = "pagerank",
    pool_reuse: bool = False,
) -> DataFrame:
    """PageRank by synchronous power iteration over an undirected simple
    graph ((u, v) rows, u < v; treated as one directed edge each way, so
    every node has out- and in-degree ≥ 1 — no dangling-mass handling
    needed). rank_{t+1}(v) = (1−d)/N + d·Σ_{u→v} rank_t(u)/outdeg(u),
    from the uniform vector, for a FIXED iteration count — fixed-count
    iteration (not a convergence test) is what makes the computation
    deterministic and oracle-replayable; 10 iterations reach ~1e-3
    relative stability on graphs with spectral gap typical of
    co-occurrence data.

    Pregel shape, one shuffle pair per iteration: contributions =
    edge ⋈ rank on src (both sides hash-partitioned on the join key),
    new ranks = groupBy(dst) sum. The degree-annotated edge list is
    pinned once (reused every iteration); each iteration's rank frame
    is ``localCheckpoint``-ed — the ONE place the engine prefers it to
    the pooled persist: persist keeps the full logical plan, so by
    iteration 10 Catalyst re-analyzes a 10-join-deep tree per step
    (measured 7.5x slower end-to-end than truncating); the checkpointed
    frames are O(nodes)·2-column and are freed by the JVM when the loop's
    references drop, so the block-accumulation concern that motivated
    ``pinned`` (large repeated index builds) doesn't apply. At true
    scale use ``checkpoint`` (reliable storage) for the same truncation
    with executor-failure tolerance.

    r12 — the loop's DRIVER overhead was half its wall (event log: 35
    jobs, 2.7 s of job time inside a 4.8 s warm run). Two changes, both
    bit-identical (probe: identical top-20 rows across all variants):

    - ``localCheckpoint(eager=False)``: the per-iteration eager
      materialization job is dropped; each checkpoint materializes (and
      truncates lineage) inside the first job that reads it, so the
      whole fixed-count loop drains in ONE action instead of 10+1.
    - AQE is disabled AROUND the loop (restored after): every
      iteration is the same fixed-shape join+aggregate over a pinned,
      size-known input — per-iteration runtime re-optimization and its
      stage-barrier jobs are pure driver latency here, at any scale
      (the shuffle width stays the session's configured partitions,
      the same scale knob every static exchange uses). Probe at sf0.1:
      eager/AQE-on 7.4-62 s (unstable under contention), lazy/AQE-off
      6.2-7.3 s stable.
    """
    from ..plans.materialize import pinned, pool_get

    spark = e.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    # Pin the degree-annotated edge list HASH-PARTITIONED ON src: every
    # iteration's contributions join keys on src, so the cached layout
    # already matches and the per-iteration plan never re-exchanges the
    # E-sized side (guide §2.4 — two operations keyed the same way share
    # one exchange). Locally the rank side broadcasts and this is
    # neutral; at cluster scale (ranks too big to broadcast) it removes
    # 10 full edge shuffles. One extra exchange at build time, amortized
    # over the fixed iteration count.
    # ``pool_reuse`` (r11): callers whose edge list is itself pooled and
    # immutable (the per-corpus co-purchase graph) pass a corpus-keyed
    # pool name and reuse the built generation — rebuilding the
    # degree-annotated table every call was ~4 jobs of pure recompute.
    # r12: the node-grain degree table and its count ride the same pool
    # (the count job and the degree groupBy re-ran per warm call).
    edeg = pool_get(pool + "_edeg", spark) if pool_reuse else None
    degp = pool_get(pool + "_deg", spark) if pool_reuse else None
    if edeg is None or degp is None:
        edges = e.select(
            F.col("u").alias("src"), F.col("v").alias("dst")
        ).unionAll(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        degp = pinned(deg, pool + "_deg")
        edeg = pinned(
            edges.join(degp, "src").repartition(n_parts, "src"), pool + "_edeg"
        )
        _PR_N.pop(pool, None)
    n = _PR_N.get(pool) if pool_reuse else None
    if n is None:
        n = degp.count()
        _PR_N[pool] = n
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        ranks = degp.select(
            F.col("src").alias("node"), F.lit(1.0 / n).alias("rank")
        )
        base = (1.0 - damping) / n
        for _ in range(iterations):
            contrib = (
                edeg.join(ranks, edeg["src"] == ranks["node"])
                .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            ranks = contrib.select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.lit(damping) * F.col("s")).alias("rank"),
            ).localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return ranks


def kcore_peel_trace(
    e: DataFrame,
    k: int,
    rounds: int,
    pool: str = "kcore",
    pre_pinned: bool = False,
    sym_pool: str | None = None,
) -> list[tuple[int, int, int]]:
    """Synchronous k-core peeling over an undirected simple graph
    ((u, v) rows, u < v): each round removes every node whose degree
    among still-alive nodes is < k; returns the per-round trace
    [(round, n_alive_nodes, n_alive_edges)] for rounds 0..rounds.

    FIXED round count (not a convergence test) keeps the computation
    deterministic and oracle-replayable (the trace is the check, like
    ``pagerank``'s unrolled iterations); once the peel converges the
    remaining rounds are no-ops that re-emit the same counts.

    Pregel shape, ONE degree aggregate (two semi-joins + groupBy) per
    round — r11: the alive-edge count is read off the NEXT round's
    degree table (sum(deg)/2 ≡ the edges-with-both-endpoints-alive
    count, exactly: each surviving edge contributes one row per
    direction to the symmetric adjacency), which the peel needs anyway,
    instead of a second E-sized semi-join pass per round. The degree
    frame is ``localCheckpoint``-ed per round (O(nodes), 2 columns —
    same lineage-truncation rationale as pagerank; at cluster scale use
    ``checkpoint``).

    r11b: the per-round driver actions are fused into ONE scalar
    aggregate over the checkpointed degree frame — (row count,
    Σdeg, #(deg ≥ k)):

    - ``n_alive(r) = #(deg_{r-1} ≥ k)``, exactly: a node absent from
      ``deg_{r-1}`` has zero alive neighbors, and 0 < k (asserted), so
      the filter and the count agree row-for-row — the separate
      ``alive.count()`` job per round is removed;
    - ``alive`` itself is a one-op filter over the checkpointed degree
      frame, so its own ``localCheckpoint`` (one eager job per round)
      is dropped too — the two semi-join consumers re-evaluate a cheap
      cached-scan filter instead;
    - round 0's node/edge counts come from the same fused census over
      ``deg_0`` (every node of ``sym`` has ≥1 neighbor alive at round
      0, so ``count(deg_0) = n_nodes``, and ``Σdeg_0/2 = |E|``).

    Driver actions per round: 2 (checkpoint + census) instead of 4.

    r12: ONE driver action per round — the degree checkpoint is LAZY
    (``eager=False``), so the census aggregate is the job that both
    materializes the checkpoint blocks and folds the three scalars
    (the separate eager-checkpoint job per round is gone), and AQE is
    disabled around the loop (restored after): every round is the same
    fixed-shape semi-join+aggregate over the pinned adjacency, so
    per-round runtime re-optimization is pure driver latency. Probe at
    sf0.1 (6 rounds): 2.9 s eager/AQE-on → 1.7 s lazy/AQE-off, traces
    bit-identical.
    """
    from ..plans.materialize import pinned

    if k < 1:
        raise ValueError("kcore_peel_trace requires k >= 1")
    edges = e.select("u", "v")
    if not pre_pinned:
        edges = pinned(edges, pool + "_edges")
    spark = e.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sym = symmetric_adjacency(edges, sym_pool)
        alive = sym.select("node").distinct().localCheckpoint()

        def alive_degrees(alive_df: DataFrame) -> DataFrame:
            return (
                sym.join(alive_df, "node", "leftsemi")
                .join(
                    alive_df.select(F.col("node").alias("other")),
                    "other",
                    "leftsemi",
                )
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("deg"))
                .localCheckpoint(eager=False)
            )

        def census(deg_df: DataFrame) -> tuple[int, int, int]:
            row = deg_df.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("deg"), F.lit(0)).cast("long").alias("s"),
                F.coalesce(
                    F.sum((F.col("deg") >= k).cast("long")), F.lit(0)
                ).cast("long").alias("ge"),
            ).collect()[0]
            return int(row["n"]), int(row["s"]) // 2, int(row["ge"])

        deg = alive_degrees(alive)  # degrees feeding the round-1 peel
        n0, e0, ge = census(deg)
        trace = [(0, n0, e0)]
        for r in range(1, rounds + 1):
            alive = deg.filter(F.col("deg") >= k).select("node")
            # next round's degrees double as this round's edge census:
            # sum over alive nodes of alive-neighbor counts = 2*|e_alive|
            deg = alive_degrees(alive)
            n_alive = ge  # #(deg_{r-1} >= k), carried from the last census
            _, n_edges, ge = census(deg)
            trace.append((r, n_alive, n_edges))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return trace


def bfs_hop_counts(
    e: DataFrame, seeds: DataFrame, hops: int, sym_pool: str | None = None
) -> list[tuple[int, int]]:
    """Multi-source BFS over an undirected simple graph ((u, v) rows,
    u < v) from a ``seeds`` frame of (node) rows: returns the per-hop
    trace [(hop, n_newly_reached)] for hops 0..hops (hop 0 = the seeds
    themselves; seeds not present in the graph still count at hop 0 —
    they simply have no neighbors).

    FIXED hop count keeps the trace deterministic and oracle-replayable
    (like ``kcore_peel_trace``); once the reachable set is exhausted the
    remaining hops emit 0. Per hop: one leftsemi join to expand the
    frontier through the symmetric edge list, a distinct, and one
    left_anti against the visited set — all hash-partitioned on the node
    key. Frontier and visited frames are ``localCheckpoint``-truncated
    (O(nodes), 1 column); per-hop driver traffic is one scalar count.

    r12: ONE driver action per hop — frontier/visited checkpoints are
    LAZY (the per-hop ``frontier.count()`` materializes the frontier;
    the visited union materializes inside the next hop's anti-join) and
    AQE is disabled around the fixed-shape loop (restored after) — the
    same per-round driver-latency fix as ``kcore_peel_trace``.
    """
    edges = e.select("u", "v")
    spark = e.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sym = symmetric_adjacency(edges, sym_pool)
        frontier = seeds.select("node").distinct().localCheckpoint()
        visited = frontier
        trace = [(0, frontier.count())]
        for h in range(1, hops + 1):
            frontier = (
                sym.join(frontier, "node", "leftsemi")
                .select(F.col("other").alias("node"))
                .distinct()
                .join(visited, "node", "left_anti")
                .localCheckpoint(eager=False)
            )
            visited = visited.unionAll(frontier).localCheckpoint(eager=False)
            trace.append((h, frontier.count()))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return trace
