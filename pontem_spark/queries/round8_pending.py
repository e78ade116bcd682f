"""Second batch of round-8 query candidates, written and locally
oracle-proven in round 7 (continuation session).

Same discipline as ``round7_pending``: NOT registered, because the r7
driver window is budgeted exactly (see that module's docstring); round 8
flips these on via ``registry.register``. Every entry here is exercised
against DuckDB by tests/test_pending_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pontem_spark.sources.tables import load_table

# (name, fn, oracle) triples for round-8 registration.
PENDING: "list[tuple[str, object, str]]" = []


def _pending(name: str, oracle: str):
    def deco(fn):
        from pontem_spark.functions.compat import portable_round_sql

        PENDING.append((name, fn, portable_round_sql(oracle)))
        return fn

    return deco


@_pending(
    "q_basket_association_rules",
    oracle="""
    WITH bi AS (
        SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ), ic AS (
        SELECT item, COUNT(*) AS n_item FROM bi GROUP BY item
    ), nb AS (
        SELECT COUNT(DISTINCT basket) AS n FROM bi
    ), pc AS (
        SELECT x.item AS a, y.item AS b, COUNT(*) AS pair_n
        FROM bi x JOIN bi y ON x.basket = y.basket AND x.item < y.item
        GROUP BY 1, 2
    ), freq AS (
        SELECT a, b, pair_n FROM pc, nb
        WHERE CAST(pair_n AS DOUBLE) >= n / 64.0
    ), dir AS (
        SELECT a AS antecedent, b AS consequent, pair_n FROM freq
        UNION ALL
        SELECT b AS antecedent, a AS consequent, pair_n FROM freq
    )
    SELECT d.antecedent, d.consequent, CAST(d.pair_n AS BIGINT) AS pair_n,
           ROUND(d.pair_n / CAST(nb.n AS DOUBLE), 6) AS support,
           ROUND(d.pair_n / CAST(ia.n_item AS DOUBLE), 6) AS confidence,
           ROUND((d.pair_n * CAST(nb.n AS DOUBLE))
                 / (ia.n_item * CAST(ib.n_item AS DOUBLE)), 6) AS lift
    FROM dir d
    CROSS JOIN nb
    JOIN ic ia ON ia.item = d.antecedent
    JOIN ic ib ON ib.item = d.consequent
    """,
)
def q_basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-level market-basket rules over order baskets: which part
    brands co-occur in the same order beyond chance. Apriori broadcast
    prefilter → ONE basket shuffle → map-side array pair expansion (no
    fact self-join; the oracle's quadratic self-join is the semantics
    being proven, not the plan). min_support = 1/64 exactly (binary-
    representable, so the threshold compare is engine-identical).
    The 64-item basket cap never binds here (≤ 25 brands exist), so the
    capless oracle is equivalent at every SF (operators/basket.py).
    """
    from pontem_spark.operators.basket import association_rules

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    facts = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    return association_rules(facts, "basket", "item", min_support=1.0 / 64.0)


@_pending(
    "q_events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events
    ), pairs AS (
        SELECT prev_state, event_type AS state,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE prev_state IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_state, state, n_transitions,
           ROUND(n_transitions / CAST(SUM(n_transitions)
                 OVER (PARTITION BY prev_state) AS DOUBLE), 6) AS p
    FROM pairs
    """,
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    ONE window shuffle on user_id (ordered by ts with event_id as the
    deterministic tiebreaker), then an S x S count aggregate and a
    broadcast row-total join for normalization — facts never shuffle
    twice (operators/sequences.py::transition_matrix)."""
    from pontem_spark.operators.sequences import transition_matrix

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return transition_matrix(ev, "user_id", ["ts", "event_id"], "event_type")
