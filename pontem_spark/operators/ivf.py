"""IVF (inverted-file) approximate nearest neighbor search.

Classic two-stage ANN: (1) build — partition the corpus into K cells around
centroids; (2) probe — a query scores only vectors in its ``n_probe``
nearest cells. Probe cost drops from |corpus| to ~|corpus| * n_probe / K.

Centroids here are the per-label mean vectors (the fixture's labels act as
the coarse quantizer; a production build would run k-means — the
assign/probe machinery is identical). Every arithmetic step is rounded with
the portable floor form, so the whole index — centroids, cell assignment,
probe ranking — is deterministic and oracle-checkable in ANSI SQL, which is
rare for an ANN implementation.

Scale shape: centroids are tiny (K x dim) → broadcast; cell assignment is a
map-side argmin per row; the probe is an equi-join on cell id. No
cross-product ever materializes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Row, Window, functions as F

from pontem_spark.functions import vector as V
from pontem_spark.functions.compat import rnd


def label_centroids(corpus: DataFrame, id_col: str, vec_col: str, label_col: str, dim: int, round_digits: int = 6) -> DataFrame:
    """Per-label mean vectors, componentwise-rounded so both engines derive
    bit-identical centroids.

    posexplode → avg per (label, pos) → re-assemble ordered array. The
    N x dim explosion never hits the wire: ``groupBy(label, pos)`` partial-
    aggregates within the scan stage, so each task emits at most K x dim
    (sum, count) partials regardless of corpus size. (A dim-wide column-per-
    component aggregate shuffles the same partials but pays ~5x more plan/
    codegen time for the 64-column hash aggregate — measured, not guessed.)
    """
    exploded = corpus.select(
        label_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
    )
    means = exploded.groupBy(label_col, "pos").agg(rnd(F.avg("x"), round_digits).alias("m"))
    return (
        means.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col(label_col).alias("centroid_id"),
            F.expr("transform(pm, s -> s.m)").alias("centroid"),
        )
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame | list[Row],
    id_col: str,
    vec_col: str,
    dim: int,
    n_probe: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Attach the ``n_probe`` nearest centroid ids to every vector —
    a TRUE map-side argmin: zero shuffles, zero joins.

    The K centroids are materialized driver-side (the index "build" step —
    K x dim doubles, trivially small) and embedded in ONE parsed SQL
    expression: per row, an array of (negated rounded cosine, centroid_id)
    structs is sorted and sliced to the top ``n_probe``, then exploded.
    The whole thing is scan → project → generate — no Exchange before the
    probe equi-join, so cell assignment costs one corpus pass at any scale.

    The per-centroid expression chain (expanded dot product, norm product,
    floor-form rounding, desc-sim/asc-id tie-break) reproduces exactly the
    arithmetic of the former crossJoin+window formulation, so results are
    bit-identical and the DuckDB oracle is unchanged.

    For very large K (>~512) one flat expression gets unwieldy; the
    production shape is hierarchical: a coarse sqrt(K)-way quantizer chooses
    a centroid *group* map-side, then the same argmin runs within the group.
    """
    rows = centroids.collect() if isinstance(centroids, DataFrame) else list(centroids)
    rows = sorted(rows, key=lambda r: r["centroid_id"])
    if not rows:  # empty corpus → no cells, typed empty result
        return (
            corpus
            .select(F.col(id_col), F.col(vec_col), F.lit(None).cast("int").alias("centroid_id"))
            .filter(F.lit(False))
        )
    scale = float(10**round_digits)
    structs = []
    for r in rows:
        cid = int(r["centroid_id"])
        cvec = [float(x) for x in r["centroid"]]
        # same fold as norm_fixed: 0.0-seeded left-chained sum of squares
        acc = 0.0
        for x in cvec:
            acc = acc + x * x
        cnorm = math.sqrt(acc)
        dotp = V.dot_sql(vec_col, vec_col, dim, coeffs=cvec)
        denom = f"(__vnorm * CAST({cnorm!r} AS DOUBLE))"
        sim = f"floor((({dotp}) / {denom}) * {scale!r} + 0.5) / {scale!r}"
        neg = (
            f"CASE WHEN {denom} > 0.0 THEN -({sim}) "
            f"ELSE CAST('Infinity' AS DOUBLE) END"
        )
        structs.append(f"struct({neg} AS ns, {cid} AS cid)")
    cells = (
        f"transform(slice(array_sort(array({', '.join(structs)})), 1, {n_probe}), "
        "s -> s.cid)"
    )
    return (
        corpus
        .withColumn("__vnorm", V.norm_fixed(vec_col, dim))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(F.expr(cells)).alias("centroid_id"),
        )
    )


def _portable_round_py(x: float, round_digits: int) -> float:
    """Python mirror of functions/compat.rnd's floor(x*s + 0.5)/s form."""
    s = 10.0**round_digits
    return math.floor(x * s + 0.5) / s


def build_centroid_groups(
    rows: "list[Row]", round_digits: int = 6
) -> "list[tuple[int, list[float], float, list[Row]]]":
    """Driver-side coarse-quantizer build: chunk K centroids into
    ceil(sqrt(K)) contiguous groups ordered by (first component, id) —
    deterministic and mirrorable in ANSI SQL (ROW_NUMBER over the same
    order) — and give each group the componentwise mean of its members as
    the group centroid (floor-rounded like every other centroid component).

    Returns [(group_id, group_centroid, group_norm, member_rows)].
    K x dim doubles of driver math — trivial even at K = 100k.
    """
    if not rows:
        return []
    ordered = sorted(rows, key=lambda r: (float(r["centroid"][0]), int(r["centroid_id"])))
    k = len(ordered)
    n_groups = math.ceil(math.sqrt(k))
    gs = math.ceil(k / n_groups)
    out = []
    dim = len(ordered[0]["centroid"])
    for g in range(n_groups):
        members = ordered[g * gs : (g + 1) * gs]
        if not members:
            break
        means = []
        for i in range(dim):
            acc = 0.0
            for r in members:
                acc = acc + float(r["centroid"][i])
            means.append(_portable_round_py(acc / len(members), round_digits))
        acc = 0.0
        for x in means:
            acc = acc + x * x
        out.append((g, means, math.sqrt(acc), members))
    return out


def hierarchical_assign_cells(
    corpus: DataFrame,
    centroids: DataFrame | "list[Row]",
    id_col: str,
    vec_col: str,
    dim: int,
    n_probe: int = 1,
    round_digits: int = 6,
    n_probe_groups: int = 1,
) -> DataFrame:
    """Two-stage map-side cell assignment for LARGE K — the production IVF
    shape :func:`assign_cells` documents: a coarse ceil(sqrt(K))-way
    quantizer picks a centroid GROUP, then the argmin runs only within that
    group. Per-row compute drops from O(K·dim) to O(sqrt(K)·dim); still
    scan → project → generate with ZERO Exchange before the probe equi-join.

    Unlike the flat form (which expands one SQL term per centroid component
    and caps out near K≈512), both stages here fold with higher-order
    functions over the centroid set riding as DATA in a broadcast 1-row
    frame (r14; previously an array literal whose K x dim CAST nodes made
    parse/analysis cost scale with K) — the expression tree is O(dim), the
    centroids are data, so K is bounded by
    broadcast size (K x dim doubles), not plan size. Same arithmetic
    contract as assign_cells: 0.0-seeded left-chained dot fold, floor-form
    rounding, (-sim, id) tie-break, zero-norm rows excluded via +Infinity.

    ``n_probe_groups`` > 1 is the boundary-recall mitigation: the row's
    ``n_probe_groups`` nearest GROUPS are selected, their member cells are
    concatenated, and the ``n_probe`` nearest cells of that UNION are
    probed — so a query sitting on a group boundary also sees the adjacent
    group's cells. Per-row cost grows to O(sqrt(K)·dim·g); still zero
    Exchange, still one deterministic expression the oracle can mirror.
    """
    rows = centroids.collect() if isinstance(centroids, DataFrame) else list(centroids)
    if not rows:
        return (
            corpus
            .select(F.col(id_col), F.col(vec_col), F.lit(None).cast("int").alias("centroid_id"))
            .filter(F.lit(False))
        )
    groups = build_centroid_groups(rows, round_digits)
    scale = float(10**round_digits)

    # r14: the centroid set rides as DATA — a broadcast 1-row LocalRelation
    # crossJoined in (the engine's broadcast-stat idiom) — instead of
    # K x dim CAST literal nodes baked into the expression tree. Parse +
    # analysis cost is now O(dim), independent of K (the pre-r14 string for
    # the 160-cell hier index was ~10k expression nodes, parsed twice per
    # query); the per-row fold arithmetic and the (ns, cid) tie-break are
    # character-identical, so assignments are bit-identical.
    gdata = [(int(gid), list(gvec), float(gnorm)) for gid, gvec, gnorm, _ in groups]

    def member_rows(members: "list[Row]") -> "list[tuple]":
        out = []
        for r in members:
            cvec = [float(x) for x in r["centroid"]]
            acc = 0.0
            for x in cvec:
                acc = acc + x * x
            out.append((int(r["centroid_id"]), cvec, math.sqrt(acc)))
        return out

    mdata = [member_rows(m) for _, _, _, m in groups]
    consts = corpus.sparkSession.createDataFrame(
        [(gdata, mdata)],
        "__groups array<struct<gid:int,gvec:array<double>,gnorm:double>>, "
        "__members array<array<struct<cid:int,cvec:array<double>,cnorm:double>>>",
    )

    # 0.0-seeded left-chained dot fold — same result as the expanded
    # t1 + t2 + ... chain (IEEE: 0.0 + t1 == t1)
    dot = (
        f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), {{c}}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    def neg_sim(cvec_ref: str, norm_ref: str) -> str:
        denom = f"(__vnorm * {norm_ref})"
        sim = f"floor((({dot.format(c=cvec_ref)}) / {denom}) * {scale!r} + 0.5) / {scale!r}"
        return f"CASE WHEN {denom} > 0.0 THEN -({sim}) ELSE CAST('Infinity' AS DOUBLE) END"

    gids_expr = (
        "transform(slice(array_sort(transform("
        f"__groups, g -> struct({neg_sim('g.gvec', 'g.gnorm')} AS ns, g.gid AS gid)"
        f")), 1, {n_probe_groups}), s -> s.gid)"
    )
    # candidate cells = union of the selected groups' members; the argmin
    # ranks the union, so cross-group ties break on (ns, cid) exactly like
    # the single-group form
    cells_expr = (
        "transform(slice(array_sort(transform("
        "flatten(transform(__gids, gi -> element_at(__members, gi + 1))), "
        f"c -> struct({neg_sim('c.cvec', 'c.cnorm')} AS ns, c.cid AS cid)"
        f")), 1, {n_probe}), s -> s.cid)"
    )
    return (
        corpus
        .crossJoin(F.broadcast(consts))
        .withColumn("__vnorm", V.norm_fixed(vec_col, dim))
        .withColumn("__gids", F.expr(gids_expr))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(F.expr(cells_expr)).alias("centroid_id"),
        )
    )


def _attach_argmin_cell(
    df: DataFrame,
    rows: "list[Row]",
    vec_col: str,
    out_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """``withColumn(out_col, <id of the single nearest centroid>)`` —
    exact argmin over all K candidates: rounded cosine desc, centroid_id
    asc tie-break, zero-norm denominators excluded via +Infinity.

    r14: the candidate set rides as DATA in a broadcast 1-row frame
    instead of a K x dim literal array baked into the expression string,
    so parse/analysis cost is O(dim) regardless of K; the fold arithmetic
    is character-identical, so assignments are bit-identical. Requires a
    ``__vnorm`` column (see norm_fixed)."""
    scale = float(10**round_digits)
    items = []
    for r in sorted(rows, key=lambda r: int(r["centroid_id"])):
        cvec = [float(x) for x in r["centroid"]]
        acc = 0.0
        for x in cvec:
            acc = acc + x * x
        items.append((int(r["centroid_id"]), cvec, math.sqrt(acc)))
    consts = df.sparkSession.createDataFrame(
        [(items,)], "__cands array<struct<cid:int,cvec:array<double>,cnorm:double>>"
    )
    dot = (
        f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), c.cvec, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    denom = "(__vnorm * c.cnorm)"
    sim = f"floor((({dot}) / {denom}) * {scale!r} + 0.5) / {scale!r}"
    neg = f"CASE WHEN {denom} > 0.0 THEN -({sim}) ELSE CAST('Infinity' AS DOUBLE) END"
    expr = (
        "element_at(transform(slice(array_sort(transform("
        f"__cands, c -> struct({neg} AS ns, c.cid AS cid)"
        ")), 1, 1), s -> s.cid), 1)"
    )
    return (
        df.crossJoin(F.broadcast(consts))
        .withColumn(out_col, F.expr(expr))
        .drop("__cands")
    )


def train_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    sample_pct: int = 30,
    iters: int = 2,
    round_digits: int = 6,
) -> "list[Row]":
    """Sampled Lloyd k-means expressed as DataFrame aggregations — the
    production centroid build the label-derived fixtures stand in for.

    - **Sample**: deterministic md5-bucket filter (``hash_bucket(id) <
      sample_pct`` — the same engine-independent idiom as
      operators/sampling.py), so every engine trains on identical rows; at
      100 TB the sample is a narrow scan-side filter, never a full pass.
    - **Init**: the ``k`` sampled vectors with the smallest ids
      (deterministic and oracle-mirrorable; k-means++ is inherently
      sequential-RNG and would break cross-engine reproducibility).
    - **Iterate**: nearest-centroid assignment is a map-side fold over the
      centroid array literal (zero shuffles), new centroids are the
      posexplode → per-(cell, pos) AVG partial-agg from
      :func:`label_centroids`, floor-rounded componentwise; a cell that
      loses every member keeps its previous centroid. Each iteration is one
      job over the SAMPLE; only K x dim doubles ever reach the driver.

    Returns ``[Row(centroid_id, centroid)]`` ready for
    :func:`hierarchical_assign_cells` / :func:`ivf_topk_hier`.
    """
    from pontem_spark.operators.sampling import hash_bucket

    sample = corpus.filter(hash_bucket(id_col, 100) < sample_pct).select(
        id_col, vec_col
    )
    # Pin the training sample once while it is provably small (r14): every
    # Lloyd job below otherwise re-analyzes and re-executes the scan+filter
    # subtree — measured ~-6-9% sentinel-normalized on trained-IVF, neutral
    # on semantic-dedup. Bounded by `pontem.ivf.pinSampleBytes` (default
    # 1 GiB of ESTIMATED sample bytes = input size x sample_pct, metadata
    # only): at 100 TB a 30% sample must NOT be spooled to executor
    # storage — recomputing the narrow column-pruned scan per job is
    # cheaper there, so past the bound the original lazy shape is kept.
    try:
        est_bytes = sum(
            __import__("os").path.getsize(f[7:] if f.startswith("file://") else f)
            for f in corpus.inputFiles()
        ) * sample_pct / 100.0
    except Exception:  # non-file sources: unknown size, stay lazy
        est_bytes = float("inf")
    pin_bound = int(
        corpus.sparkSession.conf.get("pontem.ivf.pinSampleBytes", str(1 << 30))
    )
    if est_bytes <= pin_bound:
        sample = sample.localCheckpoint(eager=True)
    init = sample.orderBy(id_col).limit(k).collect()
    cents = [
        Row(
            centroid_id=i,
            centroid=[_portable_round_py(float(x), round_digits) for x in r[vec_col]],
        )
        for i, r in enumerate(init)
    ]
    # (r14 probe: chaining the Lloyd iterations as ONE lazy plan — the next
    # round's candidate row derived in-plan from label_centroids, broadcast
    # back, keep-previous rule as a left join, bit-identical centroids
    # oracle-proven both SFs — measured +47%/+56% (semantic 2.55->3.75,
    # trained_topk 3.38->5.28, 5-run medians, stable sentinel): each layer
    # embeds the previous round's full subtree, so analysis cost grows
    # superlinearly and swamps the one saved job per iteration. Kept the
    # driver-side collect-per-iteration loop deliberately.)
    for _ in range(iters):
        assigned = _attach_argmin_cell(
            sample.withColumn("__vnorm", V.norm_fixed(vec_col, dim)),
            cents,
            vec_col,
            "cid",
            round_digits,
        )
        new_rows = label_centroids(
            assigned, id_col, vec_col, "cid", dim, round_digits
        ).collect()
        new = {int(r["centroid_id"]): [float(x) for x in r["centroid"]] for r in new_rows}
        cents = [
            Row(
                centroid_id=int(c["centroid_id"]),
                centroid=new.get(int(c["centroid_id"]), list(c["centroid"])),
            )
            for c in cents
        ]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    dim: int = 64,
    n_probe: int = 3,
    round_digits: int = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF ANN: corpus vectors live in their 1 nearest cell; queries probe
    their ``n_probe`` nearest cells; ranking happens only among cell-mates.
    Returns (query_id, neighbor_id, cos_sim, rank).

    The query set is broadcast by default (ANN query batches are small
    relative to the corpus), so the probe is a broadcast hash join — the
    corpus is scored in place, never shuffled; the only exchange is the
    per-query top-k window over candidate rows. Pass
    ``broadcast_queries=False`` for corpus-sized query sets.
    """
    # K x dim rows — one collect at build time; the list feeds both
    # assignment expressions with zero further Spark jobs
    cents = label_centroids(corpus, id_col, vec_col, label_col, dim, round_digits).collect()
    corpus_cells = assign_cells(corpus, cents, id_col, vec_col, dim, n_probe=1, round_digits=round_digits)
    query_cells = assign_cells(queries, cents, id_col, vec_col, dim, n_probe=n_probe, round_digits=round_digits)

    c = corpus_cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        V.norm_fixed(vec_col, dim).alias("__cnorm"),
        "centroid_id",
    )
    q = query_cells.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        V.norm_fixed(vec_col, dim).alias("__qnorm"),
        "centroid_id",
    )
    sim = rnd(
        V.cosine_with_norms("__qvec", "__cvec", F.col("__qnorm"), F.col("__cnorm"), dim),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    # No dedup needed: corpus vectors live in exactly ONE cell (n_probe=1
    # on the corpus side), so a (query, neighbor) pair joins on at most one
    # shared centroid even when the query probes several cells.
    return (
        c.join(F.broadcast(q) if broadcast_queries else q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_hier(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_key_col: str = "cell_key",
    k: int = 5,
    dim: int = 64,
    n_probe: int = 3,
    round_digits: int = 6,
    broadcast_queries: bool = True,
    n_probe_groups: int = 1,
    centroids: "list[Row] | None" = None,
) -> DataFrame:
    """IVF top-k with the LARGE-K build: ``cell_key_col`` (any integer
    column — e.g. a fine-grained composite label, or a k-means cell id from
    a previous iteration) defines the K cells, the coarse sqrt(K) quantizer
    from :func:`build_centroid_groups` routes each vector to its group
    map-side, and the within-group argmin picks the cell.

    Queries probe their ``n_probe`` nearest cells drawn from their
    ``n_probe_groups`` nearest groups (default 1 — the classic hierarchical
    recall trade: a query near a group boundary may miss a neighbor routed
    to the adjacent group; raising ``n_probe_groups`` to 2 is the standard
    production mitigation, and the oracle mirrors the exact rule either
    way). Corpus vectors always live in exactly ONE cell of their single
    nearest group, so no candidate-pair dedup is ever needed.
    Probe is the same broadcast equi-join as :func:`ivf_topk`.

    ``centroids``: pre-built centroid rows (e.g. from
    :func:`train_centroids`); defaults to per-``cell_key_col`` means.
    """
    if centroids is None:
        centroids = label_centroids(
            corpus, id_col, vec_col, cell_key_col, dim, round_digits
        ).collect()
    cents = centroids
    corpus_cells = hierarchical_assign_cells(
        corpus, cents, id_col, vec_col, dim, n_probe=1, round_digits=round_digits
    )
    query_cells = hierarchical_assign_cells(
        queries, cents, id_col, vec_col, dim, n_probe=n_probe,
        round_digits=round_digits, n_probe_groups=n_probe_groups,
    )

    c = corpus_cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        V.norm_fixed(vec_col, dim).alias("__cnorm"),
        "centroid_id",
    )
    q = query_cells.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        V.norm_fixed(vec_col, dim).alias("__qnorm"),
        "centroid_id",
    )
    sim = rnd(
        V.cosine_with_norms("__qvec", "__cvec", F.col("__qnorm"), F.col("__cnorm"), dim),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(q) if broadcast_queries else q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
