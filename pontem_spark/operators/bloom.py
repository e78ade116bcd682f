"""Bloom-filter semi-join pre-filter — the runtime-filter pattern, built
from first principles because this Spark build does not register
``bloom_filter_agg`` in the public function registry.

The 100 TB problem: ``big SEMI JOIN small`` shuffles every big-side row
whose key MIGHT match — i.e. all of them — even when only 1% survive. A
Bloom filter built from the small side and broadcast to the scan turns
the join into (1) a map-side probe that drops ~99% of rows before any
exchange, then (2) an exact semi-join over the survivors to remove the
filter's false positives. No false negatives ever: the composed result
is bit-identical to the plain semi-join (differential-tested, and the
pending driver query's oracle IS the plain semi-join).

Shapes:
- build: explode ``num_hashes`` bit positions per key → groupBy(word)
  bit_or(mask). Map-side partial bit_or bounds the shuffle at
  ~``num_bits/64`` words per partition regardless of row count.
- state: ``num_bits/64`` longs — 16 KiB at the 2^17-bit default, bounded
  by a loud guard, collected once and embedded as a literal array (the
  same broadcast-literal shape as the IVF centroid fold, ivf.py).
- probe: pure map-side ``forall`` over the k positions; zero shuffle,
  survives in whole-stage codegen next to the scan's pushed filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 64 words = 4096 bits minimum keeps the literal tiny in tests; the cap
# bounds the driver collect + plan literal at 2 MiB of longs.
_MAX_WORDS = 1 << 18


def _positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for a key — seeded xxhash64,
    pmod (never %: Java % is negative for negative hashes)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 17, num_hashes: int = 4
) -> "list[int]":
    """Dense word array (``num_bits/64`` longs) with every key's k bits
    set. One explode + one bit_or aggregation; the collect is bounded at
    ``num_bits/64`` rows (the aggregated words), never the key count."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    n_words = num_bits // 64
    if n_words > _MAX_WORDS:
        raise ValueError(
            f"bloom_build: {num_bits} bits = {n_words} words exceeds the "
            f"{_MAX_WORDS}-word broadcast cap — a filter this large should "
            "be a bucketed/sorted join, not a broadcast literal"
        )
    rows = (
        df.select(F.explode(_positions(F.col(col), num_bits, num_hashes)).alias("__p"))
        .select(
            (F.col("__p") / 64).cast("int").alias("__w"),
            # F.shiftleft only takes a literal shift — call_function
            # reaches the SQL form that shifts by a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__p") % 64).cast("int")
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["__w"]] = r["__bits"]
    return words


def bloom_might_contain(
    words: "list[int]", col: Column, num_hashes: int = 4
) -> Column:
    """Map-side membership probe against a built word array: TRUE iff all
    k bits are set (maybe-present), FALSE is definite absence."""
    num_bits = len(words) * 64
    # ONE Py4J call for the whole word array: building it as
    # F.array(*[F.lit(w) for w in words]) costs two JVM round-trips PER
    # WORD — ~4000 for a 2^17-bit filter, ~5 s of pure plan-construction
    # time before a single task runs (measured; execution itself is
    # ~0.5 s). A list literal is a single Literal of array<long>.
    lit_words = F.lit([int(w) for w in words])
    pos = _positions(col, num_bits, num_hashes)
    return F.forall(
        pos,
        lambda p: (
            F.element_at(lit_words, (p / 64).cast("int") + 1)
            .bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        ),
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 4,
) -> DataFrame:
    """``big SEMI JOIN small`` with a Bloom pre-filter: exact result
    (false positives removed by the verify join), but the shuffle/broadcast
    sees only the pre-filter survivors instead of every big-side row."""
    words = bloom_build(small, small_key, num_bits, num_hashes)
    prefiltered = big.filter(
        bloom_might_contain(words, F.col(big_key), num_hashes)
    )
    return prefiltered.join(
        F.broadcast(small.select(small_key).distinct()),
        on=prefiltered[big_key] == F.col(small_key),
        how="left_semi",
    )
