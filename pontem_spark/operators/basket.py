"""Market-basket association rules (support / confidence / lift).

The co-occurrence analytics family: which items appear in the same
basket more often than chance. The classic retail query, and the same
shape powers "documents sharing rare shingles" and co-citation analysis.

Scale shape (the apriori argument): the naive form self-joins the fact
table on basket — O(k²) pair rows per basket with NO pruning. Here the
pair explosion happens only AFTER two prunes:

1. **Frequent-item prefilter (apriori)**: a pair can reach ``min_count``
   only if BOTH items individually do (item support ≥ pair support is an
   identity, not a heuristic — so the prune is lossless). Item counts
   are one partial-agg groupBy; the surviving item set is broadcast, so
   infrequent items never enter the basket shuffle.
2. **Basket-size cap**: ``max_basket_items`` bounds the per-basket pair
   expansion (quadratic in basket size). Oversized baskets are dropped
   loudly via the returned plan (a filter on ``size(items)``), the same
   policy as the dedup family's hot-shingle cap.

After the prunes: ONE shuffle of the surviving facts builds per-basket
sorted item arrays, pair expansion is a map-side array transform
(no self-join, no second fact shuffle), and only (item, item) pair
counts — bounded by |frequent items|² regardless of corpus size — hit
the final aggregate. Basket count and item counts re-enter as broadcast
1-row / |items|-row frames.

Reference parity: the reference engine ships no basket operator; this is
extension surface (SURVEY.md §2.G co-occurrence analytics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from pontem_spark.functions.compat import rnd


def association_rules(
    facts: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 1.0 / 64.0,
    max_basket_items: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Directional association rules over (basket, item) facts.

    ``min_support`` is the minimum fraction of baskets a PAIR must
    co-occur in (applied relationally against the basket count — no
    driver-side action). The default 1/64 is exactly representable in
    binary, so ``pair_n >= min_support * n_baskets`` evaluates
    identically on every IEEE-754 engine.

    Returns one row per ordered (antecedent, consequent) pair with
    ``pair_n``, ``support``, ``confidence`` (= P(cons | ant)) and
    ``lift`` (= confidence / P(cons)), rounded half-up.
    """
    bi = facts.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    )

    # Item supports (distinct baskets per item) AND the global basket
    # count in ONE grouping-sets pass over the facts (r14: these were two
    # separate count-distinct jobs, i.e. a third full fact scan for one
    # extra number — guide §2.4, share the pass). GROUPING SETS ((item),
    # ()) expands each fact row twice before the distinct aggregate; the
    # grouping flag separates the per-item rows from the total row even
    # when items are legitimately NULL.
    # localCheckpoint: this (|items|+1)-row frame is referenced four times
    # (apriori prune + both metric denominators + the threshold count) and
    # each un-checkpointed reference would RE-RUN the fact aggregation
    # (Catalyst does not dedupe diamond subtrees — measured ~6 fact
    # derivations without the checkpoint here).
    supports = (
        bi.cube("item")
        .agg(
            F.count_distinct("basket").alias("n"),
            F.grouping("item").alias("__g"),
        )
        .localCheckpoint(eager=True)
    )
    item_counts = supports.filter(F.col("__g") == 0).select(
        "item", F.col("n").alias("n_item")
    )
    n_b = supports.filter(F.col("__g") == 1).select(F.col("n").alias("n_baskets"))

    # Apriori prune: items that cannot participate in a frequent pair
    # never enter the basket shuffle. Lossless (see module docstring).
    frequent = (
        item_counts.crossJoin(broadcast(n_b))
        .filter(F.col("n_item") >= F.lit(min_support) * F.col("n_baskets"))
        .select("item")
    )
    pruned = bi.join(broadcast(frequent), "item")

    # ONE shuffle of the pruned facts → sorted distinct item arrays.
    sets = pruned.groupBy("basket").agg(
        F.array_sort(F.collect_set("item")).alias("items")
    )
    sets = sets.filter(F.size("items") <= max_basket_items).filter(
        F.size("items") >= 2
    )

    # Map-side pair expansion over the sorted array: every (a, b) with
    # a < b, no self-join. slice() is 1-based; element i (0-based) pairs
    # with positions i+2 .. end.
    pair_expr = (
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), y -> struct(x AS a, y AS b))))"
    )
    pairs = (
        sets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .crossJoin(broadcast(n_b))
        .filter(F.col("pair_n") >= F.lit(min_support) * F.col("n_baskets"))
    )

    # Directional expansion (pairs are tiny post-threshold) + metric
    # denominators via broadcast item counts.
    directed = pairs.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        "pair_n",
        "n_baskets",
    ).unionByName(
        pairs.select(
            F.col("b").alias("antecedent"),
            F.col("a").alias("consequent"),
            "pair_n",
            "n_baskets",
        )
    )
    ant = broadcast(item_counts.withColumnsRenamed({"item": "antecedent", "n_item": "n_ant"}))
    con = broadcast(item_counts.withColumnsRenamed({"item": "consequent", "n_item": "n_cons"}))
    out = directed.join(ant, "antecedent").join(con, "consequent")
    return out.select(
        "antecedent",
        "consequent",
        "pair_n",
        rnd(F.col("pair_n") / F.col("n_baskets").cast("double"), round_digits).alias(
            "support"
        ),
        rnd(F.col("pair_n") / F.col("n_ant").cast("double"), round_digits).alias(
            "confidence"
        ),
        rnd(
            (F.col("pair_n") * F.col("n_baskets").cast("double"))
            / (F.col("n_ant") * F.col("n_cons").cast("double")),
            round_digits,
        ).alias("lift"),
    )
