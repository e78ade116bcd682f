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
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cvec"),
            V.norm_fixed(vec_col, dim).alias("__cnorm"),
        )
        cos = V.cosine_with_norms("__qvec", "__cvec", F.col("__qnorm"), F.col("__cnorm"), dim)
    else:
        q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
        c = corpus.select(
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
    floor(x*10^d+0.5)/10^d form as functions/compat.rnd.

    The build side is collected to the driver (a broadcast-join build side),
    so this kernel is for CANDIDATE-scale inputs — a loud guard refuses
    corpora above ``max_build_rows`` instead of silently OOMing the driver.
    For full-corpus work use :func:`cosine_pairs_tiled` (exact, distributed)
    or :func:`cosine_pairs_bucketed` (approximate, linear shuffle).
    """
    import numpy as np

    from pontem_spark.operators.util import ensure_parallelism

    spark = corpus.sparkSession
    out_schema = "id_a bigint, id_b bigint, cos_sim double"
    max_build_rows = 2_000_000
    n = corpus.count()
    if n > max_build_rows:
        raise ValueError(
            f"cosine_pairs_blocked: corpus has {n} rows > max_build_rows="
            f"{max_build_rows}; the build side is driver-collected. Use "
            "cosine_pairs_tiled (exact) or cosine_pairs_bucketed (approx)."
        )
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


def _pair_kernel(threshold: float, scale: float, id_col: str, vec_col: str):
    """Shared BLAS batch kernel: given a pandas group, emit (id_a, id_b,
    cos_sim) for pairs with rounded cosine >= threshold and id_a < id_b.
    ``block_col``-aware variant lives in cosine_pairs_tiled."""
    import numpy as np
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        ids = pdf[id_col].to_numpy()
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.sqrt((mat * mat).sum(axis=1))
        sims = (mat @ mat.T) / np.outer(norms, norms)
        sims = np.floor(sims * scale + 0.5) / scale
        ai, bi = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi], "cos_sim": sims[ai, bi]})

    return kernel


def cosine_pairs_bucketed(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    dim: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Near-dup pairs above ``threshold``, restricted to LSH-bucket
    candidates: hyperplane-sign signature buckets the corpus (a narrow
    map-side projection), then the BLAS pair kernel runs per bucket via
    ``applyInPandas`` — ONE hash shuffle on the bucket key, no driver
    collect, no cross product.

    This is the 100 TB shape for embedding near-dup dedup: shuffle volume is
    linear in the corpus, per-task memory is a bucket (~corpus / 2^n_planes
    — raise ``n_planes`` until buckets fit), and the expensive O(|bucket|^2)
    math runs vectorized in Arrow batches. Recall < 1 by design (only
    same-bucket pairs are compared) — the deterministic md5 hyperplanes make
    even the approximation oracle-checkable.

    Returns (id_a, id_b, cos_sim) with id_a < id_b.
    """
    sig = bucket_signature(vec_col, n_planes, dim)
    bucketed = ensure_parallelism(corpus).select(
        F.col(id_col), F.col(vec_col), sig.alias("__bucket")
    )
    kernel = _pair_kernel(threshold, float(10**round_digits), id_col, vec_col)
    return bucketed.groupBy("__bucket").applyInPandas(
        lambda pdf: kernel(pdf), "id_a bigint, id_b bigint, cos_sim double"
    )


def cosine_pairs_tiled(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_blocks: int = 8,
    round_digits: int = 4,
) -> DataFrame:
    """EXACT all-pairs cosine above ``threshold``, fully distributed — the
    no-driver-ceiling replacement for broadcasting the corpus.

    Block-tiled self-join: each vector hashes to one of ``n_blocks`` blocks;
    a pair (x, y) meets in exactly one tile (min(bx,by), max(bx,by)), so
    every vector is replicated to its ``n_blocks`` tiles and the BLAS kernel
    runs per tile via ``applyInPandas``. Shuffle volume is n_blocks * corpus
    — the inherent cost of exact all-pairs; per-task memory is two blocks.
    Size ``n_blocks`` ~ corpus_bytes / target_tile_bytes at scale.

    Blocking is by xxhash64 of the id — it affects WHERE a pair is computed,
    never WHETHER, so results are bit-identical to the broadcast kernel and
    the all-pairs oracle is unchanged.

    Returns (id_a, id_b, cos_sim) with id_a < id_b.
    """
    import numpy as np
    import pandas as pd

    scale = float(10**round_digits)
    rows = ensure_parallelism(corpus).select(
        F.col(id_col),
        F.col(vec_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("__b"),
    )
    tiles = F.expr(
        f"array_distinct(transform(sequence(0, {n_blocks - 1}), "
        "o -> struct(least(__b, CAST(o AS BIGINT)) AS t1, "
        "greatest(__b, CAST(o AS BIGINT)) AS t2)))"
    )
    exploded = rows.select(id_col, vec_col, "__b", F.explode(tiles).alias("__t")).select(
        id_col, vec_col, "__b", F.col("__t.t1").alias("__t1"), F.col("__t.t2").alias("__t2")
    )

    def per_tile(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        if len(pdf) < 2:
            return empty
        t1, t2 = pdf["__t1"].iloc[0], pdf["__t2"].iloc[0]
        if t1 == t2:  # diagonal tile: pairs within one block
            return _pair_kernel(threshold, scale, id_col, vec_col)(pdf)
        a = pdf[pdf["__b"] == t1]
        b = pdf[pdf["__b"] == t2]
        if len(a) == 0 or len(b) == 0:
            return empty
        a_ids, b_ids = a[id_col].to_numpy(), b[id_col].to_numpy()
        a_mat = np.asarray([np.asarray(v, dtype=np.float64) for v in a[vec_col]])
        b_mat = np.asarray([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        a_n = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_n = np.sqrt((b_mat * b_mat).sum(axis=1))
        sims = (a_mat @ b_mat.T) / np.outer(a_n, b_n)
        sims = np.floor(sims * scale + 0.5) / scale
        ai, bi = np.nonzero(sims >= threshold)
        id_a = np.minimum(a_ids[ai], b_ids[bi])
        id_b = np.maximum(a_ids[ai], b_ids[bi])
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos_sim": sims[ai, bi]})

    return exploded.groupBy("__t1", "__t2").applyInPandas(
        per_tile, "id_a bigint, id_b bigint, cos_sim double"
    )


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
    c = corpus.select(
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


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_candidates: int = 20,
    k: int = 5,
    lam: float = 0.7,
    lam_comp: float = 0.3,
    dim: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: exact top-``n_candidates``
    per query (distributed, :func:`brute_force_topk`), then the greedy MMR
    selection ``argmax lam*rel(c) - lam_comp*max_{s in S} sim(c, s)`` down
    to ``k`` diverse results.

    Scale shape: candidate generation is the linear corpus scan; the
    inherently-sequential greedy step runs per QUERY GROUP inside ONE
    Arrow-batched ``applyInPandas`` — each group is n_candidates rows, so
    the sequential part is O(k · n_candidates²) on a bounded set, and
    queries parallelize freely. This is the production re-rank shape:
    never driver-side, never corpus-quadratic.

    Determinism: relevance comes in pre-rounded from brute_force_topk; pair
    similarities use an explicit left-fold dot product (NOT numpy BLAS —
    its pairwise summation order differs from the engines' fold) rounded to
    ``round_digits``; ties break on the lower id. ``lam``/``lam_comp`` are
    both explicit so no side computes ``1 - lam`` in floating point. An
    oracle can therefore replay the greedy unrolled.
    """
    import math

    import pandas as pd

    from pontem_spark.operators.ivf import _portable_round_py

    cands = brute_force_topk(
        corpus, queries, id_col, vec_col, k=n_candidates,
        round_digits=round_digits, dim=dim,
    ).join(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__vec")),
        on="neighbor_id",
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = {
            int(nid): [float(x) for x in v]
            for nid, v in zip(pdf["neighbor_id"], pdf["__vec"])
        }
        rel = {
            int(nid): float(c) for nid, c in zip(pdf["neighbor_id"], pdf["cos_sim"])
        }
        norms = {}
        for cid, v in vecs.items():
            acc = 0.0
            for x in v:
                acc = acc + x * x
            norms[cid] = math.sqrt(acc)

        def pairsim(a: int, b: int) -> float:
            va, vb = vecs[a], vecs[b]
            acc = 0.0
            for x, y in zip(va, vb):
                acc = acc + x * y
            den = norms[a] * norms[b]
            return _portable_round_py(acc / den, round_digits) if den > 0 else 0.0

        remaining = sorted(vecs)
        selected: list[tuple[int, float]] = []
        while remaining and len(selected) < k:
            best = None
            for c in remaining:
                if selected:
                    ms = max(pairsim(c, s) for s, _ in selected)
                    score = lam * rel[c] - lam_comp * ms
                else:
                    score = rel[c]
                if best is None or (-score, c) < best[:2]:
                    best = (-score, c, score)
            selected.append((best[1], best[2]))
            remaining.remove(best[1])
        qid = int(pdf["query_id"].iloc[0])
        return pd.DataFrame(
            {
                "query_id": [qid] * len(selected),
                "neighbor_id": [s for s, _ in selected],
                "mmr_rank": list(range(1, len(selected) + 1)),
                "score": [_portable_round_py(sc, round_digits) for _, sc in selected],
            }
        )

    return cands.groupBy("query_id").applyInPandas(
        greedy, "query_id long, neighbor_id long, mmr_rank int, score double"
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion of N candidate rankings: score(d) =
    Σ_lists 1/(k0 + rank_d) over the lists that retrieved d.

    THE hybrid-retrieval combiner (Cormack et al.; the standard way RAG
    stacks merge a lexical BM25 list with an embedding-cosine list): rank
    positions, not raw scores, so the lists need no score calibration.
    Each input must carry (id_col, rank_col) with rank 1-based.

    Scale shape: a unionAll of the candidate lists (already top-n sized,
    tiny relative to the corpus) + one hash aggregate on the id + one
    TakeOrderedAndProject — the fusion never touches the corpus, only the
    retrieved candidates. Deterministic: the reciprocal contributions are
    exact rationals in double space; the fused score is rounded before
    ranking and ties break on id.
    """
    from functools import reduce

    contribs = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                "__rrf"
            ),
        )
        for r in rankings
    ]
    u = reduce(DataFrame.unionAll, contribs)
    return (
        u.groupBy(id_col)
        .agg(
            rnd(F.sum("__rrf"), round_digits).alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
