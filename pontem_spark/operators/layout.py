"""Data-layout clustering: Z-order (Morton) keys for multi-column skipping.

Sorting a table by ONE column makes that column's min/max file stats
selective and every other column's useless. Interleaving the bit patterns
of two columns (the Morton curve) gives a single sort key whose locality is
shared by BOTH dimensions — each output file covers a narrow range of a
AND of b, so scans filtering on either column skip most files. This is the
core of Delta/Iceberg ``OPTIMIZE ZORDER BY``, reproduced here as plain
Column algebra + ``repartitionByRange`` (no table format required).

Scale shape: one tiny min/max aggregate (broadcast as literals), a map-side
key expression, then the range repartition that any large sort already
pays. The interleave is pure integer bit arithmetic — whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Normalize a numeric column to an integer rank in [0, 2**bits)."""
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = float(2**bits - 1)
    return F.floor(frac * top + 0.5).cast("bigint")


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave ``bits`` bits of two pre-scaled integer columns:
    a₀b₀a₁b₁… with a in the even positions. Pure shift/and/or terms."""
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def zorder_frame(
    df: DataFrame, col_a: str, col_b: str, n_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` on the Z-order curve of two numeric columns: each
    output partition (→ parquet file) covers a narrow range of BOTH
    columns. Column bounds come from one broadcast min/max aggregate."""
    bounds = df.agg(
        F.min(col_a).alias("__la"), F.max(col_a).alias("__ha"),
        F.min(col_b).alias("__lb"), F.max(col_b).alias("__hb"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__zkey",
        morton_key(
            _scale_to_bits(F.col(col_a), F.col("__la"), F.col("__ha"), bits),
            _scale_to_bits(F.col(col_b), F.col("__lb"), F.col("__hb"), bits),
            bits,
        ),
    ).drop("__la", "__ha", "__lb", "__hb")
    return (
        keyed.repartitionByRange(n_partitions, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
