"""Rolling windows over a Series (pandas ``s.rolling(n).sum()`` etc.) via
Spark Window rowsBetween frames ordered by the index."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pontem_spark.core.internal import INDEX_COL, InternalFrame


class Rolling:
    def __init__(self, s, window: int):
        self._s = s
        self._n = window

    def _apply(self, aggfn):
        from pontem_spark.core.series import Series

        s = self._s
        sdf = s._materialized()
        w = Window.orderBy(INDEX_COL).rowsBetween(-(self._n - 1), Window.currentRow)
        cnt = F.count(sdf["__value__"]).over(w)
        val = aggfn(sdf["__value__"]).over(w)
        # pandas yields NaN until the window has `window` observations
        col = F.when(cnt >= self._n, val)
        return Series._from_internal(
            InternalFrame(sdf, INDEX_COL, s._internal.index_name), col, s._name
        )

    def sum(self): return self._apply(F.sum)
    def mean(self): return self._apply(F.mean)
    def min(self): return self._apply(F.min)
    def max(self): return self._apply(F.max)
    def std(self): return self._apply(F.stddev_samp)
    def count(self):
        from pontem_spark.core.series import Series

        s = self._s
        sdf = s._materialized()
        w = Window.orderBy(INDEX_COL).rowsBetween(-(self._n - 1), Window.currentRow)
        return Series._from_internal(
            InternalFrame(sdf, INDEX_COL, s._internal.index_name),
            F.count(sdf["__value__"]).over(w),
            s._name,
        )


class GroupedRolling:
    """``df.groupby(k)[col].rolling(n)`` — rolling windows WITHIN each group.

    Unlike the Series-level :class:`Rolling` (which orders globally — a
    single-partition window, fine for driver-scale series, wrong for big
    frames), this partitions by the group keys, so at scale it is one
    ordinary hash-partitioned window pass. Result keeps the parent anchor
    (no join-back), like ``groupby().transform``."""

    def __init__(self, df, keys: list[str], col: str, window: int):
        self._df = df
        self._keys = keys
        self._col = col
        self._n = window

    def _apply(self, aggfn):
        from pontem_spark.core.series import Series

        df = self._df
        expr = df._columns[self._col]
        w = (
            Window.partitionBy(*[df._columns[k] for k in self._keys])
            .orderBy(df._internal.index_col)
            .rowsBetween(-(self._n - 1), Window.currentRow)
        )
        cnt = F.count(expr).over(w)
        # pandas yields NaN until the window has `window` observations
        col = F.when(cnt >= self._n, aggfn(expr).over(w))
        return Series._from_internal(df._internal, col, self._col)

    def sum(self): return self._apply(F.sum)
    def mean(self): return self._apply(F.mean)
    def min(self): return self._apply(F.min)
    def max(self): return self._apply(F.max)
    def std(self): return self._apply(F.stddev_samp)
    def count(self): return self._apply(F.count)
