"""Connected components via iterative min-label propagation — the dedup
CLUSTERING step: candidate near-dup pairs form a graph; each component is
one duplicate group, and the canonical survivor is the minimum id.

This is the engine's iterative-algorithm pattern: a driver-side loop where
every iteration is a fully distributed join+aggregate, with localCheckpoint
to truncate the growing lineage (the classic failure mode of iterative
DataFrame algorithms — plan depth growing linearly with iterations).

Convergence: min-label propagation converges in O(component diameter)
iterations; near-dup clusters are small and dense (diameter 1-3), so 3-5
iterations settle real corpora. The iteration cap guards adversarial chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id in its component.

    ``nodes``: one column ``node_col`` (all vertices, incl. singletons).
    ``edges``: undirected pairs (``src_col``, ``dst_col``).
    Returns (node_col, component) — component = min reachable id.
    """
    # symmetrize once; propagation then only needs one direction per step.
    # (r14 probe: an explode-of-2-structs symmetrize — one scan of the edge
    # subtree instead of union's two branches — measured +12% (1.89->2.13 s
    # on q_dedup_clusters, 7-run medians): ReuseExchange already dedupes the
    # two identical union branches, so the single-scan form saved nothing
    # and paid a Generate. Kept the union deliberately.)
    fwd = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    sym = fwd.union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = nodes.select(F.col(node_col).alias("u"), F.col(node_col).alias("label"))

    from pyspark.sql.types import NumericType

    numeric_ids = isinstance(
        labels.schema["label"].dataType, NumericType
    )

    prev_sum: int | None = None
    for _ in range(max_iterations):
        # each node pulls the smallest label among itself and its neighbors
        neighbor_labels = (
            # shuffle_hash (r14): hash the |V|-row label state instead of
            # sorting the symmetrized edges every round (no-stats SMJ
            # fallback on checkpointed RDD scans)
            sym.join(labels.withColumnRenamed("u", "v").hint("shuffle_hash"), "v")
            .select("u", "label")
        )
        prev_labels = labels
        # (r14 probe: a LAZY checkpoint here — letting the convergence probe
        # materialize it, one job per iteration instead of two — measured
        # noisier and no faster (clusters 1.89 eager vs 2.1-3.3 lazy,
        # 7-run medians, wide bimodal spread). Kept eager deliberately.)
        labels = (
            labels.union(neighbor_labels)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)  # truncate lineage every iteration
        )
        if numeric_ids:
            # labels are monotonically non-increasing, so the fixpoint is
            # reached exactly when the label sum stops decreasing — one
            # scalar aggregate per iteration instead of a change-detection
            # join. Summed as decimal(38,0): a long sum can overflow on
            # billions of 2^62-range ids, silently stalling the loop.
            cur_sum = labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            # string/other ids (entity resolution on names): the decimal
            # cast would THROW under ANSI — probe for any changed label
            # with an exact null-safe join instead (same |V|-row cost
            # class; isEmpty stops at the first changed row).
            changed = (
                labels.join(
                    prev_labels.withColumnRenamed("label", "__prev"), "u"
                )
                .filter(~F.col("label").eqNullSafe(F.col("__prev")))
            )
            if changed.isEmpty():
                break

    return labels.select(F.col("u").alias(node_col), F.col("label").alias("component"))


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    handle_dangling: bool = True,
) -> DataFrame:
    """PageRank by power iteration — the engine's second iterative-algorithm
    pattern beside :func:`connected_components`: a driver-side loop of
    fully distributed join+aggregate steps with ``localCheckpoint``
    truncating the lineage each round.

    ``edges`` are DIRECTED (pass both directions for an undirected graph).
    Uniform 1/N init; ``r' = (1-d)/N + d · (Σ_in r/outdeg + S/N)`` per
    iteration, where ``S`` is the total rank sitting on DANGLING nodes
    (out-degree 0 — sinks that would otherwise leak their mass out of the
    distribution every round; VERDICT r6 #5). ``S`` costs one 1-row
    aggregate per iteration, broadcast INTO the rank projection (r14: an
    in-plan broadcast stat, not a driver ``.first()`` probe) — over a
    STATIC dangling flag folded into the rank state once, so no
    per-iteration join. With ``handle_dangling`` the rank vector sums to
    exactly 1 every
    iteration (mass conservation, the property a real web/citation graph
    user relies on); on a symmetrized graph every vertex has out-degree
    ≥ 1, S ≡ 0.0 and results are bit-identical to the flag being off —
    which is why the q_graph_pagerank oracle needs no change. N comes from
    one O(1)-result count job (the same driver-scalar shape GraphX uses).

    Scale shape per iteration: while |V| is under the broadcast bound the
    rank state broadcasts into the edge join and the destination aggregate
    reuses the edge table's dst hash-partitioning (r15 — ZERO shuffles per
    iteration; the one |E| shuffle moved into the edge checkpoint). Past
    the bound the joins fall back to the planner's shuffled strategies:
    one shuffle joining ranks to the edge table on the source plus the
    destination aggregate exchange. Rank state is |V| rows; the edge table
    (with its static out-degrees folded in) is checkpointed ONCE and
    re-read, never recomputed.
    """
    # r14: checkpoint the deduped edge list FIRST — it feeds both the
    # degree-annotated edge build and the node/dangling-flag build, which
    # previously each re-ran the upstream scan + distinct shuffle.
    raw = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sess = raw.sparkSession
    # |E| from the already-materialized checkpoint RDD — a metadata-cheap
    # count that lets the edge build pick its join side without waiting for
    # the node build (|distinct src| ≤ |E|, so |E| under the bound is a
    # conservative-safe broadcast condition for the degree table)
    m = raw.count()
    bound = int(sess.conf.get("pontem.graph.broadcastRanksNodes", "2000000"))

    # static dangling flag (node never appears as a src) folded into the
    # node table once — each iteration reads it for free from the rank state.
    # r15: built in a SINGLE pass — explode each edge row into two
    # (node, voted-has-out) votes and OR them with one max() aggregate —
    # instead of the former two-distinct + left-join shape (3 scans of raw,
    # 2 aggregate shuffles and a join for the same 1-shuffle-of-2|E|-votes
    # result; the votes partial-aggregate map-side to ≤|V| rows per task
    # exactly like distinct did; micro-A/B 0.45 → 0.31 s at sf0.1). When
    # the caller does not ask for dangling handling the flag is DEAD —
    # every iteration would just copy it — so the node set is built
    # without it and the rank state stays two columns.
    def _build_nodes() -> DataFrame:
        if handle_dangling:
            return (
                raw.select(
                    F.explode(
                        F.array(
                            F.struct(
                                F.col("src").alias("node"),
                                F.lit(True).alias("__has_out"),
                            ),
                            F.struct(
                                F.col("dst").alias("node"),
                                F.lit(False).alias("__has_out"),
                            ),
                        )
                    ).alias("__nv")
                )
                .select(
                    F.col("__nv.node").alias("node"),
                    F.col("__nv.__has_out").alias("__has_out"),
                )
                .groupBy("node")
                .agg(F.max("__has_out").alias("__has_out"))
                .localCheckpoint(eager=True)
            )
        return (
            raw.select(F.col("src").alias("node"))
            .union(raw.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )

    # the out-degree is static — fold it into the edge table before the ONE
    # |E|-sized checkpoint; each iteration
    # is then a single ranks join + one destination aggregate.
    # r15 (guide §2.4 — remove shuffles outright): the contribution
    # aggregate groups by node == dst EVERY iteration, so hash-partition
    # the static edge table by dst ONCE before its checkpoint; each
    # iteration's aggregate then finds its required distribution already
    # satisfied and elides its Exchange (one |E| shuffle paid at build,
    # not one per iteration). localCheckpoint records the physical output
    # partitioning on the LogicalRDD only while AQE is OFF (under AQE it
    # degrades to UnknownPartitioning — probed, Spark 4.1), so AQE is
    # scoped off around the two build jobs below; every consumer keeps
    # AQE. The deg join keeps explicit side control under the |E| bound
    # (with AQE off a no-stats checkpointed scan would otherwise fall to
    # sort-merge even for a tiny degree table).
    def _build_e() -> DataFrame:
        deg = raw.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg"))
        return (
            raw.join(F.broadcast(deg) if m <= bound else deg, "src")
            .repartition("dst")
            .localCheckpoint(eager=True)
        )

    # overlap the two independent build jobs (guide §2.6 — actions are only
    # sequential because the driver calls them sequentially; the second
    # job's tasks back-fill executor slots freed by the first one's tail)
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    prev_aqe = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_nodes = pool.submit(inheritable_thread_target(_build_nodes))
            f_e = pool.submit(inheritable_thread_target(_build_e))
            nodes, e = f_nodes.result(), f_e.result()
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    n = nodes.count()
    if n == 0:
        # empty graph: an empty (node, rank) frame, not a ZeroDivisionError
        # from the 1/N literal below
        return nodes.select("node", F.lit(0.0).alias("rank"))
    bcast_state = n <= bound
    state_cols = ["node", "__has_out"] if handle_dangling else ["node"]
    ranks = nodes.select(*state_cols, F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        if handle_dangling:
            # Σ rank over sinks — r14: folded INTO the plan as a 1-row
            # aggregate broadcast into the next rank projection (the
            # engine's standard broadcast-stat idiom) instead of a
            # per-iteration driver .first() probe: one job per iteration,
            # not two. Arithmetic is term-for-term the old python-literal
            # base: (1-d)/n + (d*S)/n, IEEE-identical evaluation order.
            dm = ranks.filter(~F.col("__has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
            base = F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("__dm") / F.lit(
                float(n)
            )
        else:
            # python (1-d)/n + d*0.0/n == (1-d)/n exactly (t + +0.0 == t)
            base = F.lit((1.0 - damping) / n)
        # r14: |V| is known driver-side (the count above) — while the rank
        # state is bounded (`pontem.graph.broadcastRanksNodes`, default 2M
        # rows ≈ tens of MB; bcast_state computed once above), broadcast it
        # into the edge join and broadcast
        # the contribution sums into the node join: the |E| edge table is
        # never shuffled per iteration and the contribution aggregate
        # partial-aggregates map-side. Past the bound both joins fall back
        # to the planner's shuffled strategies (scale-adaptive, same
        # degradation AQE would pick with real stats).
        rank_side = ranks.withColumnRenamed("node", "src")
        if bcast_state:
            rank_side = F.broadcast(rank_side)
        contribs = (
            e.join(rank_side, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        new_ranks = nodes.join(
            F.broadcast(contribs) if bcast_state else contribs, "node", "left"
        )
        if handle_dangling:
            new_ranks = new_ranks.crossJoin(F.broadcast(dm))
        ranks = new_ranks.select(
            *state_cols,
            (base + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))).alias(
                "rank"
            ),
        )
        # Checkpoint policy (r14): with dangling handling, ranks_{i-1} is
        # referenced TWICE per iteration (the mass aggregate + the contrib
        # join) — an un-checkpointed diamond doubles work per level, so
        # materialize every iteration (one job each). Without it the loop
        # is a straight chain (each ranks referenced once): let the whole
        # power iteration compile into ONE job, checkpointing only every
        # 4th round so caller-supplied large iteration counts cannot grow
        # an unbounded plan.
        if handle_dangling or ((i + 1) % 4 == 0 and i + 1 < iterations):
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    with_edge_count: bool = False,
):
    """Total triangle count of an undirected graph via the
    compact-forward (degree-orientation) algorithm.

    Naive triangle counting self-joins the edge list twice with no bound
    on the intermediate (a hub of degree d contributes d² wedge rows).
    Orienting every edge from the LOWER-degree endpoint to the higher
    (ties by id) first makes the oriented out-degree O(√|E|) for any
    graph, so the per-edge work is bounded — the standard trick that makes
    triangle counting feasible at scale.

    Cost: one degree aggregate (shuffle ~|V|), one orientation pass, one
    out-adjacency aggregate, then one equi-join of the oriented edges
    (each carrying its source's out-list) against the out-adjacency on the
    TARGET — the Σdeg⁺² intersection work runs inside ``array_intersect``
    per edge row instead of materializing each wedge as a shuffled row
    (guide §2.3: shuffle packed arrays, not exploded rows). Returns a
    1-row DataFrame ``(triangles bigint)``; each triangle is counted
    exactly once (the unique apex with both out-edges inside it).

    Input may list each undirected edge in either or both directions;
    self-loops and duplicates are dropped.
    """
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    # undirected canonical form + dedup. Checkpoint: the edge set is
    # referenced by the degree aggregate (twice), both degree joins, and
    # the optional edge count — Catalyst re-derives an un-checkpointed
    # subtree once PER REFERENCE, so an expensive upstream edge
    # derivation (e.g. a co-occurrence self-join) would run ~5 times
    # (measured 16.6 s -> ~7 s warm at sf0.1 on the co-purchase graph
    # under the pre-r14 wedge-join formulation).
    und = (
        e.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # degrees over the undirected edge set
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du")
    dv = deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv")
    # orient from lower-degree endpoint (ties: lower id) to higher
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        # single reference below (the adj⁺ aggregate) — no checkpoint
    )
    # Adjacency-intersect (edge-iterator) counting: each triangle has
    # exactly ONE apex x with both out-edges x→y1, x→y2 inside it, closed
    # by one oriented edge between y1 and y2 — so
    #   triangles = Σ over oriented edges (s, t) of |N+(s) ∩ N+(t)|
    # (the common out-neighbor is the third vertex; counted once, on the
    # closing edge). r14 rewrite: the former wedge-join formulation
    # materialized and SHUFFLED every wedge as its own row (~70M narrow
    # rows at sf0.1 on the co-purchase graph) into a semi-join probe; here
    # the same Σdeg⁺² work stays INSIDE array_intersect on |E| rows that
    # carry out-neighbor lists — orders of magnitude fewer shuffled rows,
    # and the per-row lists are bounded by the O(√|E|) oriented out-degree,
    # so no row can blow up on a hub. adj⁺ is checkpointed: it is
    # referenced by both join sides and is small (|V| keys, Σ=|E| cells).
    adjp = (
        oriented.groupBy("s")
        .agg(F.collect_list("t").alias("ns"))
        .localCheckpoint(eager=True)
    )
    # The Σdeg⁺² intersection work EXPLODES downstream of byte-tiny inputs,
    # so AQE's size-based coalescing would happily hand the whole thing to
    # one task (the pre-r14 wedge stage ran effectively single-core at
    # sf0.1 for exactly this reason). An explicit cores-based repartition
    # of the narrow exploded rows — which AQE respects — spreads the
    # per-edge intersections; scale-adaptive, not a tuned constant.
    # (Repartition the COMPACT adjacency — |V| rows, Σ=|E| cells — before
    # exploding, so the replicated per-edge array copies never cross a
    # wire here; the explode and the intersections stay map-side when the
    # build side is the compact adjacency.)
    #
    # Join-side control must be EXPLICIT: checkpointed RDD scans carry no
    # size statistics, and left to itself the planner here broadcast the
    # EXPLODED side (Σdeg⁺² array cells — the one thing that must never be
    # collected) and streamed the compact one. The known |E| (a count on
    # the checkpointed edge set) decides: broadcast the compact adjacency
    # while its payload is bounded (≤ `pontem.graph.broadcastAdjEdges`
    # cells ≈ tens of MB — the per-executor cost every broadcast join
    # pays), else a shuffled-hash join with the compact side as the build
    # (hash, no sort — the exploded side is shuffled exactly once either
    # way at scale, and never sorted).
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    n_edges_known = und.count()
    exploded = adjp.repartition(par).select("ns", F.explode("ns").alias("t"))
    lookup = adjp.select(F.col("s").alias("t"), F.col("ns").alias("nt"))
    max_bcast = int(spark.conf.get("pontem.graph.broadcastAdjEdges", "8000000"))
    if n_edges_known <= max_bcast:
        joined = exploded.join(F.broadcast(lookup), "t")
    else:
        joined = exploded.join(lookup.hint("shuffle_hash"), "t")
    tri = joined.select(F.size(F.array_intersect("ns", "nt")).alias("__c"))
    out = tri.agg(F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("triangles"))
    if with_edge_count:
        # |E| is already known driver-side (the join-side decision above
        # counted the checkpointed canonical edge set) — attach it as a
        # literal instead of an extra aggregate branch + cross join.
        return out.select(
            F.lit(n_edges_known).cast("bigint").alias("n_edges"), "triangles"
        )
    return out


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 6,
) -> DataFrame:
    """Vertices of the k-core (maximal subgraph with min degree ≥ k) by
    iterative peeling, bounded at ``max_iterations`` rounds.

    Each round: one degree aggregate over the surviving undirected edge
    set (shuffle ~|V| count rows), then two semi-joins filtering edges to
    kept endpoints — peeling is MONOTONE and IDEMPOTENT at the fixpoint,
    so running extra rounds past convergence is a no-op. That idempotence
    is what makes a fixed-round unrolled-CTE oracle exact: both engines do
    ``max_iterations`` rounds; as long as the data converges within the
    bound they agree bit-for-bit. Real graphs peel in a handful of rounds
    (degeneracy ordering); adversarial long chains need the cap raised.

    Convergence is CHECKED, not assumed (r7 verdict #2): after the last
    round one cheap degree aggregate over the surviving (checkpointed)
    edge set asks whether another round would still peel — any surviving
    vertex with degree < k means the cap was hit mid-peel, and returning
    silently would hand back a SUPERSET of the k-core. That case raises
    ValueError naming the needed fix (raise ``max_iterations``) instead.

    lineage is truncated per round (localCheckpoint) — the same growing-
    plan guard as connected_components/pagerank above. Returns
    ``(node, degree)`` for surviving vertices with their in-core degree.
    """
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    und = (
        e.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        deg = (
            und.select(F.col("u").alias("n"))
            .unionAll(und.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # r14: no eager checkpoint on `keep` — its two references (the u-
        # and v-side semi joins) canonicalize to the SAME exchange over the
        # checkpointed previous edge set, so ReuseExchange computes the
        # degree filter once; one job per peeling round instead of two.
        # (r14 probe: dropping this eager checkpoint in favor of exchange
        # reuse, and hinting the semi joins shuffle_hash, BOTH measured ~2x
        # slower — the two keep references did not dedupe and AQE's runtime
        # small-side broadcast beat the forced SHJ. Kept as-is, measured.)
        keep = deg.filter(F.col("d") >= k).select("n").localCheckpoint(eager=True)
        und = (
            und.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    # convergence guard: `und` is checkpointed, so this is one ~|V| agg +
    # limit-1 probe, not a plan replay. A surviving sub-k vertex means
    # round `max_iterations` still changed the edge set — the fixpoint was
    # NOT reached and the filter below would return a superset of the core.
    if deg.filter(F.col("degree") < k).limit(1).count() > 0:
        raise ValueError(
            f"k_core did not converge within max_iterations={max_iterations}: "
            f"the last peeling round still removed edges (a surviving vertex "
            f"has degree < {k}). Raise max_iterations — peeling is monotone, "
            f"extra rounds past the fixpoint are no-ops."
        )
    return deg.filter(F.col("degree") >= k)


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Community detection by synchronous label propagation, fixed rounds.

    Each round every vertex adopts the most frequent label among its
    neighbors (ties: the LARGEST label, giving a total order both engines
    compute identically — max count, then max label, via one struct-max
    aggregate). Synchronous fixed-round LPA is deterministic even where
    the algorithm would oscillate, so an unrolled-CTE oracle replays it
    exactly — no convergence argument needed (unlike k_core, whose oracle
    leans on idempotence).

    Per round: one |E| join (labels onto edge targets) + two hash
    aggregates ((node, label) counts, then per-node struct-max) — all
    map-side combinable. The rounds form a straight chain (no diamond),
    so the fixed-round loop runs as ONE job; lineage is truncated every
    4th round to bound plan depth (r14). Rank state is |V| rows.
    Returns (node, community).
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    sym = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for i in range(iterations):
        nbr = sym.join(
            # shuffle_hash (r14): hash the |V|-row label state, don't sort
            # the symmetrized edge list every round (no-stats SMJ fallback)
            labels.select(F.col("node").alias("v"), "label").hint("shuffle_hash"),
            "v",
        ).select("u", "label")
        counts = nbr.groupBy("u", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            counts.groupBy("u")
            .agg(F.max(F.struct(F.col("c"), F.col("label"))).alias("m"))
            .select(F.col("u").alias("node"), F.col("m.label").alias("label"))
        )
        # r14: each labels frame is referenced exactly ONCE by the next
        # round (a straight chain, no diamond), so the fixed-round loop
        # compiles into a single job; checkpoint only every 4th round to
        # bound plan depth for large caller-supplied iteration counts.
        if (i + 1) % 4 == 0 and i + 1 < iterations:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))
