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


def make_row_udf(func, return_type):
    """Arrow-vectorized ROW-wise UDF: the struct column arrives as a
    pandas DataFrame batch; ``func`` sees each row as a pandas Series
    (the df.apply(axis=1) contract)."""

    @pandas_udf(return_type)
    def u(pdf: pd.DataFrame) -> pd.Series:
        return pdf.apply(func, axis=1)

    return u
