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

from pyspark.sql import DataFrame, Window, functions as F

from pontem_spark.functions import vector as V
from pontem_spark.functions.compat import rnd
from pontem_spark.operators.util import ensure_parallelism


def label_centroids(corpus: DataFrame, id_col: str, vec_col: str, label_col: str, dim: int, round_digits: int = 6) -> DataFrame:
    """Per-label mean vectors, componentwise-rounded so both engines derive
    bit-identical centroids. posexplode → avg per (label, pos) → re-assemble
    ordered array: one shuffle, fully codegen."""
    exploded = ensure_parallelism(corpus).select(
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
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_probe: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Attach the ``n_probe`` nearest centroid ids to every vector.

    Broadcast the centroid table, score every (vector, centroid) pair —
    K is small, so this is K scored rows per vector, not a blow-up — and
    keep the top n_probe by (rounded cosine desc, centroid_id).
    """
    scored = (
        ensure_parallelism(corpus)
        .crossJoin(F.broadcast(centroids))
        .select(
            F.col(id_col),
            F.col(vec_col),
            "centroid_id",
            rnd(V.cosine_with_norms(
                vec_col, "centroid",
                V.norm_fixed(vec_col, dim), V.norm_fixed("centroid", dim), dim
            ), round_digits).alias("c_sim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("c_sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_probe)
        .select(id_col, vec_col, "centroid_id")
    )


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
) -> DataFrame:
    """IVF ANN: corpus vectors live in their 1 nearest cell; queries probe
    their ``n_probe`` nearest cells; ranking happens only among cell-mates.
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    # K x dim rows — cache so the centroid aggregation runs once, not once
    # per consumer (corpus assignment, query assignment)
    cents = label_centroids(corpus, id_col, vec_col, label_col, dim, round_digits).cache()
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
    return (
        c.join(q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])  # multi-probe can hit a neighbor once per cell
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
