"""pandas_udf factory. Deliberately NO ``from __future__ import annotations``:
PySpark resolves pandas_udf type hints at decoration time and postponed
(string) annotations break that resolution."""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_scalar_udf(func, return_type):
    """Arrow-vectorized elementwise UDF applying ``func`` per value."""

    @pandas_udf(return_type)
    def u(s: pd.Series) -> pd.Series:
        return s.map(func)

    return u
