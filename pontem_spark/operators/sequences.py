"""Event-sequence operators: Markov transition matrices (and friends).

User-behavior modeling over clickstreams: P(next state | current state)
estimated from per-user event sequences. The input fact table never
shuffles more than once — the lag window partitions by the sequence key
(the same partitioning a sessionize pass already uses), and everything
after the transition-pair projection aggregates S² rows at most, where S
is the (small) state-alphabet size.

Scale: at 100 TB the single window shuffle on the user key is the whole
cost; the transition-count aggregate is partial-agg combinable and its
output is |states|² rows regardless of input size. Row-normalization is
a window over that S²-row aggregate — one tree, so the facts are
scanned and shuffled exactly once (an agg+join diamond would re-derive
the whole fact pipeline per branch).

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
    # Row totals as a window OVER THE S^2-ROW AGGREGATE, not a second
    # aggregate joined back: an agg+join diamond makes Catalyst re-derive
    # the whole fact pipeline (scan + lag window) once per branch — the
    # window form keeps one tree, so facts are scanned and shuffled
    # exactly once (caught by test_plan_quality).
    w_row = Window.partitionBy("prev_state").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return pairs.select(
        "prev_state",
        "state",
        "n_transitions",
        rnd(
            F.col("n_transitions")
            / F.sum("n_transitions").over(w_row).cast("double"),
            round_digits,
        ).alias("p"),
    )


def attribution_credits(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    touch_type_col: str,
    value_col: str,
    lookback_hours: int = 24,
    round_digits: int = 4,
) -> DataFrame:
    """Multi-touch attribution: split each conversion's value across the
    touch events that preceded it within a lookback window, under the
    three standard models at once — last-touch, first-touch, linear.

    Plan shape: ONE range join (equi on the user key + a bounded time
    band — the same shape as the as-of family, never a cross join), then
    one window over candidates partitioned by conversion id that ranks
    first/last and counts touches in a single shuffle. Candidate volume
    is conversions x touches-per-lookback, bounded by the window — the
    knob that keeps this linear at 100 TB. Heavy-user skew lands on the
    user-key join; AQE skew-join or salting applies as with any as-of.

    Ties on the touch timestamp are broken by ``id_col`` so first/last
    are total orders on every engine.

    Returns one row per touch type: (touch_type, n_touches,
    credit_first, credit_last, credit_linear), credits rounded half-up.
    """
    t = touches.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__t_ts"),
        F.col(id_col).alias("__t_id"),
        F.col(touch_type_col).alias("touch_type"),
    )
    c = conversions.select(
        F.col(user_col).alias("__cu"),
        F.col(ts_col).alias("__c_ts"),
        F.col(id_col).alias("__c_id"),
        F.col(value_col).cast("double").alias("__val"),
    )
    cand = c.join(
        t,
        (F.col("__cu") == F.col("__u"))
        & (F.col("__t_ts") <= F.col("__c_ts"))
        & (F.col("__t_ts") > F.col("__c_ts") - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")),
    )
    base = Window.partitionBy("__c_id")
    w_last = base.orderBy(F.desc("__t_ts"), F.desc("__t_id"))
    w_first = base.orderBy(F.asc("__t_ts"), F.asc("__t_id"))
    cand = (
        cand.withColumn("__rn_last", F.row_number().over(w_last))
        .withColumn("__rn_first", F.row_number().over(w_first))
        .withColumn("__n", F.count(F.lit(1)).over(base))
    )
    return cand.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        rnd(
            F.sum(F.when(F.col("__rn_first") == 1, F.col("__val")).otherwise(F.lit(0.0))),
            round_digits,
        ).alias("credit_first"),
        rnd(
            F.sum(F.when(F.col("__rn_last") == 1, F.col("__val")).otherwise(F.lit(0.0))),
            round_digits,
        ).alias("credit_last"),
        rnd(F.sum(F.col("__val") / F.col("__n")), round_digits).alias("credit_linear"),
    )


def scd2_intervals(
    changes: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    attr_cols: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a change stream into
    validity intervals — one row per (key, attribute version) with
    ``effective_from`` / ``effective_to`` / ``is_current``.

    The warehouse companion to latest_by_key (operators/dedup.py): that
    keeps only the newest version, this keeps the full history as
    non-overlapping intervals for as-of joins against any past date.

    Two steps, ONE shuffle: (1) version-compression — a lag window over
    (key, order) drops rows whose attributes null-safe-equal the
    previous row's (ten identical CDC snapshots become one version);
    (2) interval stitching — a lead window over the SURVIVORS assigns
    each version's end. The filter between the windows preserves the
    hash partitioning on the key, so Catalyst plans a single Exchange
    for both windows (plan-asserted).

    ``order_cols`` must totally order each key's changes (include a
    unique id last); attribute comparison is null-safe so NULL → NULL is
    "unchanged".
    """
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    cur = F.struct(*[F.col(c) for c in attr_cols])
    changed = F.lag(cur).over(w).isNull() | ~cur.eqNullSafe(F.lag(cur).over(w))
    survivors = changes.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    eff_from = F.col(order_cols[0])
    eff_to = F.lead(F.col(order_cols[0])).over(w)
    return survivors.select(
        key_col,
        *attr_cols,
        eff_from.alias("effective_from"),
        eff_to.alias("effective_to"),
        eff_to.isNull().alias("is_current"),
    )
