"""PCA / ZCA whitening for embedding columns.

Standard retrieval post-processing (dominant-direction removal and
covariance equalization measurably improve cosine ANN recall). The fit is
the classic treeAggregate shape: each partition computes its (n, Σx, XᵀX)
sufficient statistics with one numpy GEMM over an Arrow batch, the driver
combines the O(partitions) tiny partials and eigendecomposes the d×d
covariance — data never shuffles, nothing row-scaled ever reaches the
driver. Applying the learned transform is one Arrow ``mapInPandas``
matmul, so at 100 TB both passes scale with executor count alone.

No cross-engine oracle is possible (no eigensolver in SQL); the pending
query follows the sketch-family pattern — in-plan derived booleans
(whitened covariance ≈ identity) that the oracle asserts as literals, so a
broken transform flips the hash. Direct tests assert the identity-
covariance property and partition-count invariance.

Reference scope: no counterpart in the reference engine — training-data
extension surface (SURVEY.md §2.G).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

_MOMENTS_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("ss", ArrayType(DoubleType())),
    ]
)


def embedding_moments(df: DataFrame, vec_col: str):
    """(n, mean, covariance·n) from ONE pass: per-partition numpy partials
    (d + d² doubles each) combined on the driver. Returns
    ``(n, mean ndarray[d], second-moment matrix ndarray[d, d])`` where the
    second moment is Σ xxᵀ (uncentered)."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(partials, _MOMENTS_SCHEMA).collect()
    if not rows:
        raise ValueError("embedding_moments: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in rows], axis=0)
    return n, s / n, ss


def fit_whitening(
    df: DataFrame,
    vec_col: str,
    eps: float = 1e-6,
    ddof: int = 1,
    zca: bool = True,
):
    """Learn a whitening transform from the embedding column.

    Returns ``(mean, W)`` with ``W`` the d×d matrix mapping centered
    vectors to whitened ones: PCA form ``diag(1/√(λ+eps)) Uᵀ`` rotates into
    the eigenbasis; ZCA form ``U diag(1/√(λ+eps)) Uᵀ`` (default) stays
    closest to the original axes — the usual choice when downstream cosine
    similarity should remain interpretable."""
    import numpy as np

    n, mean, ss = embedding_moments(df, vec_col)
    if n <= ddof:
        raise ValueError(f"need more than ddof={ddof} rows, got {n}")
    cov = (ss - n * np.outer(mean, mean)) / (n - ddof)
    lam, U = np.linalg.eigh(cov)
    scale = 1.0 / np.sqrt(np.maximum(lam, 0.0) + eps)
    W = (U * scale) @ U.T if zca else (U * scale).T
    return mean, W


def apply_whitening(
    df: DataFrame,
    vec_col: str,
    mean,
    W,
    out_col: str = "whitened",
) -> DataFrame:
    """Project every embedding through the learned transform: one Arrow
    ``mapInPandas`` batch matmul ``(X - mean) Wᵀ`` — map-side only, the
    (d² + d)-double transform ships inside the task closure."""
    import numpy as np
    import pandas as pd

    mean = np.asarray(mean, dtype=np.float64)
    W = np.asarray(W, dtype=np.float64)
    out_fields = [f for f in df.schema.fields if f.name != out_col]
    schema = StructType(out_fields + [StructField(out_col, ArrayType(DoubleType()))])
    names = [f.name for f in out_fields]

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = (X - mean) @ W.T
            out = pdf[names].copy()
            out[out_col] = list(Y)
            yield out

    return df.mapInPandas(project, schema)
