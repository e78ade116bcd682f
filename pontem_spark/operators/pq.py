"""Product quantization (PQ): compressed vector codes + ADC search.

The standard at-scale vector-compression technique (Jégou et al.,
"Product quantization for nearest neighbor search", TPAMI 2011,
public): split each D-dim vector into ``m`` subvectors, k-means each
subspace independently (codebooks of ``k`` centroids each), and store
every vector as ``m`` small codes — 64 floats become 4 bytes at
m=4, k=16. Search uses asymmetric distance computation (ADC): the
query's distance to every codebook centroid is a tiny per-query lookup
table; a database vector's estimated distance is the sum of ``m`` table
entries — no float vector is ever touched at scan time.

Scale shape: training runs on a deterministic md5-bucket sample (the
train_centroids discipline from operators/ivf.py, L2 metric instead of
cosine); code assignment is a MAP-SIDE fold over codebook literals
(zero shuffles, like assign_cells); ADC search is a map-side
lookup-table fold + one TakeOrderedAndProject. At 100 TB the scan reads
m bytes per vector instead of 8D — the whole point.

Cross-engine determinism: codebooks are floor-rounded componentwise
after every Lloyd step (so both engines iterate from identical
doubles), argmin compares the ROUNDED squared L2 with centroid-id
tie-breaks, and the ADC estimate is rounded before the top-k order.

Reference parity: extension surface (SURVEY.md §2.G vector search); the
reference engine has no vector operator at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.operators.ivf import _portable_round_py, _vec_sql_literal, label_centroids


def _argmin_l2_expr(rows: "list[Row]", vec_expr: str, round_digits: int = 6) -> str:
    """SQL expression: centroid id minimizing the ROUNDED squared L2
    distance to ``vec_expr`` (an array<double> expression), id asc on
    ties. Codebook rides as an array literal; the fold is O(sub_dim) per
    centroid."""
    scale = float(10**round_digits)
    parts = []
    for r in sorted(rows, key=lambda r: int(r["centroid_id"])):
        cvec = [float(x) for x in r["centroid"]]
        parts.append(f"struct({int(r['centroid_id'])} AS cid, {_vec_sql_literal(cvec)} AS cvec)")
    items = "array(" + ", ".join(parts) + ")"
    d2 = (
        f"aggregate(zip_with({vec_expr}, c.cvec, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    rd2 = f"floor(({d2}) * {scale!r} + 0.5) / {scale!r}"
    return (
        "element_at(transform(slice(array_sort(transform("
        f"{items}, c -> struct({rd2} AS d, c.cid AS cid)"
        ")), 1, 1), s -> s.cid), 1)"
    )


def _slice_expr(vec_col: str, j: int, sub: int) -> str:
    return f"slice(CAST({vec_col} AS ARRAY<DOUBLE>), {j * sub + 1}, {sub})"


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 16,
    sample_pct: int = 30,
    iters: int = 2,
    round_digits: int = 6,
) -> "list[list[Row]]":
    """Per-subspace sampled Lloyd k-means under L2. Same determinism
    contract as ivf.train_centroids: md5-bucket sample, smallest-id
    init, floor-rounded centroids each step, empty cells keep their
    previous centroid. Returns ``m`` codebooks of ``k`` Rows each."""
    if dim % m:
        raise ValueError(f"train_pq_codebooks: dim {dim} not divisible by m {m}")
    from pontem_spark.operators.sampling import hash_bucket

    sub = dim // m
    sample_full = corpus.filter(hash_bucket(id_col, 100) < sample_pct)
    books: "list[list[Row]]" = []
    for j in range(m):
        sample = sample_full.select(
            F.col(id_col), F.expr(_slice_expr(vec_col, j, sub)).alias("__sv")
        )
        init = sample.orderBy(id_col).limit(k).collect()
        cents = [
            Row(
                centroid_id=i,
                centroid=[_portable_round_py(float(x), round_digits) for x in r["__sv"]],
            )
            for i, r in enumerate(init)
        ]
        for _ in range(iters):
            assigned = sample.withColumn(
                "cid", F.expr(_argmin_l2_expr(cents, "__sv", round_digits))
            )
            new_rows = label_centroids(
                assigned, id_col, "__sv", "cid", sub, round_digits
            ).collect()
            new = {
                int(r["centroid_id"]): [float(x) for x in r["centroid"]] for r in new_rows
            }
            cents = [
                Row(
                    centroid_id=int(c["centroid_id"]),
                    centroid=new.get(int(c["centroid_id"]), list(c["centroid"])),
                )
                for c in cents
            ]
        books.append(cents)
    return books


def pq_assign_codes(
    corpus: DataFrame,
    books: "list[list[Row]]",
    id_col: str,
    vec_col: str,
    dim: int,
    round_digits: int = 6,
) -> DataFrame:
    """(id, codes array<int>) — one map-side projection, zero shuffles."""
    m = len(books)
    sub = dim // m
    codes = [
        F.expr(_argmin_l2_expr(books[j], _slice_expr(vec_col, j, sub), round_digits))
        for j in range(m)
    ]
    return corpus.select(F.col(id_col), F.array(*codes).alias("codes"))


def pq_topk(
    corpus: DataFrame,
    books: "list[list[Row]]",
    query_vec: "list[float]",
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """ADC top-k: per-subspace lookup tables of rounded squared L2
    between the query slice and each codebook centroid (computed
    driver-side — m x k doubles), estimated distance = the sum of ``m``
    ``element_at`` lookups on the assigned codes, rounded, then one
    TakeOrderedAndProject on (distance asc, id asc)."""
    m = len(books)
    sub = dim // m
    with_codes = pq_assign_codes(corpus, books, id_col, vec_col, dim, round_digits)
    luts = []
    for j in range(m):
        q = [float(x) for x in query_vec[j * sub : (j + 1) * sub]]
        lut = []
        for r in sorted(books[j], key=lambda r: int(r["centroid_id"])):
            acc = 0.0
            for x, y in zip(q, [float(v) for v in r["centroid"]]):
                acc = acc + (x - y) * (x - y)
            lut.append(_portable_round_py(acc, round_digits))
        luts.append(lut)
    est = None
    for j in range(m):
        term = F.element_at(F.lit(luts[j]), F.col("codes")[j] + 1)
        est = term if est is None else est + term
    return (
        with_codes.select(
            F.col(id_col), rnd(est, round_digits).alias("est_d2")
        )
        .orderBy(F.asc("est_d2"), F.asc(id_col))
        .limit(k)
    )
