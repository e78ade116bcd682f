"""groupby().agg() — absent in the reference (SURVEY §2.G: 'group-by
aggregation: ∅'); one Spark groupBy/agg pass per call, partial aggregation
and AQE coalescing come free from Catalyst."""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import functions as F

from pontem_spark.core.internal import INDEX_COL, InternalFrame

_AGGS: dict[str, Callable] = {
    "sum": F.sum,
    "mean": F.mean,
    "avg": F.mean,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "first": F.first,
    "last": F.last,
    "nunique": F.count_distinct,
    "median": lambda c: F.percentile(c, F.lit(0.5)),
}


def _valid(df, col: str):
    """Column with pandas-missing (NULL or float NaN) blanked to NULL —
    grouped twin of Series/DataFrame._valid_col: Spark aggregates and
    window functions skip NULL but PROPAGATE NaN (a NaN-bearing group's
    mean/sum/max is NaN, count counts it), the opposite of pandas
    skipna (r7 probe: grouped transform('mean') returned all-NaN)."""
    schema = {f.name: f.dataType.simpleString() for f in df._materialized().schema.fields}
    v = df._columns[col]
    if schema.get(col) in ("double", "float"):
        return F.when(F.isnan(v), F.lit(None)).otherwise(v)
    return v


class GroupBy:
    def __init__(self, df, keys: list[str], as_index: bool = True):
        self._df = df
        self._keys = keys
        self._as_index = as_index

    def agg(self, spec: Mapping[str, str | list[str]]) -> "DataFrame":
        """{'col': 'sum'} or {'col': ['sum', 'mean']} → one aggregation pass."""
        from pontem_spark.core.frame import DataFrame

        exprs = []
        out_names = []
        for col, how in spec.items():
            hows = [how] if isinstance(how, str) else list(how)
            for h in hows:
                fn = _AGGS.get(h)
                if fn is None:
                    raise ValueError(f"unsupported aggregation: {h!r}")
                out = col if isinstance(how, str) else f"{col}_{h}"
                exprs.append(fn(_valid(self._df, col)).alias(out))
                out_names.append(out)

        base = self._df._internal.sdf.groupBy(
            *[self._df._columns[k].alias(k) for k in self._keys]
        ).agg(*exprs)

        if self._as_index and len(self._keys) == 1:
            internal = InternalFrame(base, self._keys[0], self._keys[0])
            return DataFrame._from_internal(internal, {c: base[c] for c in out_names})
        if self._as_index:
            # multi-key → struct-backed MultiIndex, the same representation
            # set_index(list) builds (frame.py): struct ordering is
            # lexicographic by field = MultiIndex sort order, and
            # to_pandas/reset_index already translate it back
            sdf = base.withColumn("__midx__", F.struct(*[F.col(k) for k in self._keys]))
            internal = InternalFrame(sdf, "__midx__", tuple(self._keys))
            return DataFrame._from_internal(internal, {c: sdf[c] for c in out_names})
        sdf = base.withColumn(INDEX_COL, F.monotonically_increasing_id())
        internal = InternalFrame(sdf, INDEX_COL, None)
        return DataFrame._from_internal(
            internal, {c: sdf[c] for c in self._keys + out_names}
        )

    def _all_numeric(self, how: str) -> "DataFrame":
        import numpy as np

        schema = {f.name: f.dataType.simpleString() for f in self._df._materialized().schema.fields}
        numeric = {
            c
            for c in self._df.columns
            if schema[c] in ("tinyint", "smallint", "int", "bigint", "float", "double")
        }
        cols = [c for c in self._df.columns if c not in self._keys and (how == "count" or c in numeric)]
        return self.agg({c: how for c in cols})

    def sum(self): return self._all_numeric("sum")
    def mean(self): return self._all_numeric("mean")
    def min(self): return self._all_numeric("min")
    def max(self): return self._all_numeric("max")
    def count(self): return self._all_numeric("count")
    def std(self): return self._all_numeric("std")

    def size(self):
        """Group sizes as a Series (counts rows incl. nulls, like pandas);
        multiple keys yield a MultiIndexed Series."""
        from pontem_spark.core.series import Series

        base = self._df._internal.sdf.groupBy(
            *[self._df._columns[k].alias(k) for k in self._keys]
        ).agg(F.count(F.lit(1)).alias("__value__"))
        if len(self._keys) == 1:
            internal = InternalFrame(base, self._keys[0], self._keys[0])
            return Series._from_internal(internal, base["__value__"], None)
        sdf = base.withColumn("__midx__", F.struct(*[F.col(k) for k in self._keys]))
        internal = InternalFrame(sdf, "__midx__", tuple(self._keys))
        return Series._from_internal(internal, sdf["__value__"], None)

    def __getitem__(self, col: str) -> "SeriesGroupBy":
        if col not in self._df._columns:
            raise KeyError(col)
        return SeriesGroupBy(self._df, self._keys, col)

    def transform(self, spec: Mapping[str, str]) -> "DataFrame":
        """pandas groupby().transform: per-group statistics broadcast back to
        EVERY row, index preserved. One unordered window per distinct key
        set — a single shuffle on the group key, no join-back; the result
        shares this frame's anchor, so assigning it to a column stays one
        growing Catalyst plan (zero extra jobs)."""
        from pyspark.sql import Window

        from pontem_spark.core.frame import DataFrame

        w = Window.partitionBy(*[self._df._columns[k] for k in self._keys])
        cols = dict(self._df._columns)
        for col, how in spec.items():
            fn = _AGGS.get(how)
            if fn is None:
                raise ValueError(f"unsupported aggregation: {how!r}")
            cols[col] = fn(_valid(self._df, col)).over(w)
        return DataFrame._from_internal(self._df._internal, cols)

    def apply_in_pandas(self, func, schema):
        """Escape hatch for genuinely custom grouped logic: Arrow-batched
        applyInPandas (grouped-map pandas UDF). Use only when built-in
        aggregates can't express the semantics."""
        from pontem_spark.core.frame import DataFrame

        grouped = self._df._materialized().groupBy(*self._keys)
        sdf = grouped.applyInPandas(func, schema)
        out = sdf.withColumn(INDEX_COL, F.monotonically_increasing_id())
        internal = InternalFrame(out, INDEX_COL, None)
        return DataFrame._from_internal(
            internal, {c: out[c] for c in sdf.columns}
        )


class SeriesGroupBy:
    """``df.groupby(k)['col']`` — single-column grouped view.

    ``transform`` keeps the parent anchor (window expression, no join);
    ``agg``/named reductions delegate to the frame-level GroupBy."""

    def __init__(self, df, keys: list[str], col: str):
        self._df = df
        self._keys = keys
        self._col = col

    def transform(self, how: str):
        from pyspark.sql import Window

        from pontem_spark.core.series import Series

        fn = _AGGS.get(how)
        if fn is None:
            raise ValueError(f"unsupported aggregation: {how!r}")
        w = Window.partitionBy(*[self._df._columns[k] for k in self._keys])
        return Series._from_internal(
            self._df._internal, fn(_valid(self._df, self._col)).over(w), self._col
        )

    def agg(self, how: str):
        """Single reduction per group → a Series keyed by the group index
        (pandas shape for df.groupby(k)[col].mean()); a list of hows stays
        at the frame level via GroupBy.agg."""
        frame = GroupBy(self._df, self._keys).agg({self._col: how})
        return frame[self._col]

    def rolling(self, window: int):
        from pontem_spark.core.window import GroupedRolling

        return GroupedRolling(self._df, self._keys, self._col, window)

    def ewm(self, **kwargs):
        from pontem_spark.core.window import GroupedEwm

        return GroupedEwm(self._df, self._keys, self._col, kwargs)

    def sum(self): return self.agg("sum")
    def mean(self): return self.agg("mean")
    def min(self): return self.agg("min")
    def max(self): return self.agg("max")
    def count(self): return self.agg("count")
    def nunique(self): return self.agg("nunique")
    def std(self): return self.agg("std")
    def var(self): return self.agg("var")
    def median(self): return self.agg("median")
    def first(self): return self.agg("first")
    def last(self): return self.agg("last")
