"""Grouped-aggregate pandas UDF (UDAF surface). Deliberately no
``from __future__ import annotations`` — PySpark resolves the type hints at
decoration time (same constraint as core/_udf.py)."""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted average price — Arrow-batched grouped aggregation.
    The vectorized numpy path: one (sum(x*w), sum(w)) per group per batch."""
    denom = float(qty.sum())
    return float((price * qty).sum() / denom) if denom else float("nan")
