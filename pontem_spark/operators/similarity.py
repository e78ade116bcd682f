"""Similarity search over embedding columns (``array<float>``).

Two paths:

- :func:`brute_force_topk` — exact cosine top-k. The query set is broadcast
  (it is small by definition); each executor scans its slice of the corpus
  once and keeps k rows per query via window-rank. Linear in corpus size,
  perfectly parallel — the right baseline at any scale where `|queries| *
  |corpus|` work is acceptable per scan.

- :func:`lsh_bucket_topk` — approximate: random-hyperplane signs bucket the
  corpus; a query only scans its own bucket (and optionally neighbors').
  Turns the scan-per-query into an equi-join on bucket — sub-linear probe
  cost, tunable recall via ``n_planes``. The hyperplanes derive from md5 of
  (plane, dim) so the operator is fully deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.functions import vector as V
from pontem_spark.operators.util import ensure_parallelism


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, cos_sim, rank). Self-matches excluded.
    Similarity is rounded before ranking and ties break on neighbor id, so
    the result is engine-independent and hash-stable.
    """
    if dim:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            V.norm_fixed(vec_col, dim).alias("__qnorm"),
        )
        c = ensure_parallelism(corpus).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cvec"),
            V.norm_fixed(vec_col, dim).alias("__cnorm"),
        )
        cos = V.cosine_with_norms("__qvec", "__cvec", F.col("__qnorm"), F.col("__cnorm"), dim)
    else:
        q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
        c = ensure_parallelism(corpus).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        )
        cos = V.cosine(F.col("__qvec"), F.col("__cvec"))
    sim = rnd(cos, round_digits)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs_blocked(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_digits: int = 4,
) -> DataFrame:
    """All-pairs cosine similarity above ``threshold`` via blocked matrix
    multiply: the corpus matrix is broadcast (exactly like a broadcast-join
    build side), and each Arrow batch of the streamed side computes
    ``block @ M.T`` in BLAS. Per-pair Column expressions evaluate at
    ~20ns/FLOP interpreted; BLAS does the same work 100x faster — this is
    the documented exception where mapInPandas beats built-in expressions.

    Returns (id_a, id_b, cos_sim) with id_a < id_b. Rounding uses the same
    floor(x*10^d+0.5)/10^d form as functions/compat.rnd. At 100 TB, replace
    the single broadcast with LSH-bucketed or block-tiled candidates; the
    batch kernel is unchanged.
    """
    import numpy as np

    from pontem_spark.operators.util import ensure_parallelism

    spark = corpus.sparkSession
    out_schema = "id_a bigint, id_b bigint, cos_sim double"
    build_pdf = corpus.select(id_col, vec_col).toPandas()
    if len(build_pdf) == 0:
        return spark.createDataFrame([], out_schema)
    ids = build_pdf[id_col].to_numpy()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in build_pdf[vec_col]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))
    scale = float(10**round_digits)

    def batches(it):
        import pandas as pd

        b_ids, b_mat, b_norms = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy()
            a_mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
            sims = np.floor(sims * scale + 0.5) / scale
            ai, bi = np.nonzero((sims >= threshold) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": b_ids[bi], "cos_sim": sims[ai, bi]}
            )

    probe = ensure_parallelism(corpus.select(id_col, vec_col))
    return probe.mapInPandas(batches, out_schema)


def _plane_coeffs(p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component (p, d) is +1.0 when
    the first hex char of md5('plane{p}d{d}') has even ascii code, else -1.0.
    Computed driver-side with hashlib (same md5 any engine computes), so the
    plan carries plain literals — no 64-deep expression trees to fold."""
    import hashlib

    return [
        1.0 if ord(hashlib.md5(f"plane{p}d{d}".encode()).hexdigest()[0]) % 2 == 0 else -1.0
        for d in range(dim)
    ]


def bucket_signature(vec_col: str, n_planes: int, dim: int):
    """Sign-bit signature string, e.g. '1011', from random hyperplanes.
    x * ±1.0 is exact in IEEE, so this matches an oracle that derives the
    sign via md5 in SQL (see queries/similarity.py::_lsh_oracle)."""
    bits = []
    for p in range(n_planes):
        d = F.expr(V.dot_sql(vec_col, vec_col, dim, coeffs=_plane_coeffs(p, dim)))
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's hyperplane bucket
    are scored. Probe cost ~ corpus/2^n_planes per query instead of corpus.

    Returns (query_id, neighbor_id, cos_sim, rank) — rank within retrieved
    candidates. Recall < 1 by design; raise recall with fewer planes or
    multi-probe (flip one bit) at the cost of bigger buckets.
    """
    sig = bucket_signature(vec_col, n_planes, dim)
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        V.norm_fixed(vec_col, dim).alias("__cnorm"),
        sig.alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        V.norm_fixed(vec_col, dim).alias("__qnorm"),
        sig.alias("bucket"),
    )
    sim = rnd(V.cosine_with_norms("__qvec", "__cvec", F.col("__qnorm"), F.col("__cnorm"), dim), round_digits)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
