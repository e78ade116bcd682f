"""Event-sequence operators: Markov transition matrices (and friends).

User-behavior modeling over clickstreams: P(next state | current state)
estimated from per-user event sequences. The input fact table never
shuffles more than once — the lag window partitions by the sequence key
(the same partitioning a sessionize pass already uses), and everything
after the transition-pair projection aggregates S² rows at most, where S
is the (small) state-alphabet size.

Scale: at 100 TB the single window shuffle on the user key is the whole
cost; the transition-count aggregate is partial-agg combinable and its
output is |states|² rows regardless of input size. Row-normalization
joins the per-source totals back as a broadcast (the totals frame is at
most |states| rows) — no second pass over facts, no window over facts.

Reference parity: extension surface (SURVEY.md §2.G sequence analytics);
the reference engine has no sequence operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from pontem_spark.functions.compat import rnd


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    state_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition estimates from event sequences.

    ``order_cols`` must be a deterministic total order within each key
    (include a unique tiebreaker, e.g. the event id, so ties on the
    timestamp cannot flip transitions between runs or engines).

    Returns (prev_state, state, n_transitions, p) where ``p`` is the
    row-normalized probability P(state | prev_state), rounded half-up.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.select(
            F.lag(F.col(state_col)).over(w).alias("prev_state"),
            F.col(state_col).alias("state"),
        )
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("prev_state").agg(
        F.sum("n_transitions").alias("__row_total")
    )
    return (
        pairs.join(broadcast(totals), "prev_state")
        .select(
            "prev_state",
            "state",
            "n_transitions",
            rnd(
                F.col("n_transitions") / F.col("__row_total").cast("double"),
                round_digits,
            ).alias("p"),
        )
    )
