"""Rolling windows over a Series (pandas ``s.rolling(n).sum()`` etc.) via
Spark Window rowsBetween frames ordered by the index."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pontem_spark.core.internal import INDEX_COL, InternalFrame


class Rolling:
    def __init__(self, s, window: int, min_periods: "int | None" = None):
        self._s = s
        self._n = window
        # pandas default: a full window is required
        self._minp = window if min_periods is None else min_periods

    def _ctx(self):
        """(sdf, internal, window, valid_value, mat_source).

        Window-free source columns build the rolling window DIRECTLY on
        the source anchor (same-anchor result: s - s.rolling(n).mean()
        composes column-wise, zero joins — the r13 positional-op rule);
        windowed sources materialize first, carry the row lineage through,
        and tag the source for _mat_pair. ``valid_value`` blanks pandas-
        missing (NULL or float NaN) to NULL so window counts see NaN as
        missing — pandas' rule, the opposite of Spark's count() (r7
        probe: min_periods over a NaN-bearing series diverged)."""
        from pontem_spark.core.series import _window_free

        s = self._s
        if _window_free(s._col):
            sdf, col, internal, src = s._internal.sdf, s._col, s._internal, None
        else:
            sdf = s._materialized()
            col = sdf["__value__"]
            internal = InternalFrame(
                sdf,
                INDEX_COL,
                s._internal.index_name,
                s._internal.order_spec,
                row_tokens=s._internal.row_tokens,
            )
            src = s
        # the fast path orders on the RAW anchor, where the index keeps
        # its original column name; only the materialized fallback
        # renames it to INDEX_COL (r13: from_spark(index_col=...) anchors
        # crashed UNRESOLVED_COLUMN on the fast path)
        wdefault = s._internal.index_spark_col if src is None else INDEX_COL
        w = Window.orderBy(*s._internal.order_columns(wdefault)).rowsBetween(
            -(self._n - 1), Window.currentRow
        )
        valid = F.when(~s._missing_mask(col, sdf), col)
        return sdf, internal, w, valid, src

    def _wrap(self, internal, col, src):
        from pontem_spark.core.series import Series

        res = Series._from_internal(internal, col, self._s._name)
        if src is not None:
            res._mat_source = src  # _mat_pair: source value is _VALUE here
        return res

    def _apply(self, aggfn):
        sdf, internal, w, valid, src = self._ctx()
        cnt = F.count(valid).over(w)
        val = aggfn(valid).over(w)
        # NaN until the window holds min_periods observations (default:
        # the full window)
        return self._wrap(internal, F.when(cnt >= self._minp, val), src)

    def sum(self): return self._apply(F.sum)
    def mean(self): return self._apply(F.mean)
    def min(self): return self._apply(F.min)
    def max(self): return self._apply(F.max)
    def std(self): return self._apply(F.stddev_samp)
    def var(self): return self._apply(F.var_samp)

    def median(self):
        """Exact rolling median. Spark forbids median()/percentile() with
        a window FRAME, so: collect_list over the frame (bounded by the
        window size — never the series), sort, midpoint. collect_list
        drops NULLs, which is exactly pandas' skipna."""
        sdf, internal, w, valid, src = self._ctx()
        arr = F.sort_array(F.collect_list(valid).over(w))
        cnt = F.size(arr)
        mid = (cnt / 2).cast("int")
        med = F.when(
            cnt % 2 == 1, F.try_element_at(arr, mid + 1).cast("double")
        ).otherwise(
            (
                F.try_element_at(arr, mid).cast("double")
                + F.try_element_at(arr, mid + 1).cast("double")
            )
            / 2.0
        )
        col = F.when(cnt >= self._minp, med)
        return self._wrap(internal, col, src)

    def count(self):
        """Unlike every other rolling agg, pandas gates count on the ROW
        count in the window reaching min_periods, not the non-missing
        count (a 3-row window with 2 NaNs still counts 1) — r7 probe."""
        sdf, internal, w, valid, src = self._ctx()
        rows = F.count(F.lit(1)).over(w)
        val = F.count(valid).over(w)
        return self._wrap(internal, F.when(rows >= self._minp, val), src)


class GroupedRolling:
    """``df.groupby(k)[col].rolling(n)`` — rolling windows WITHIN each group.

    Unlike the Series-level :class:`Rolling` (which orders globally — a
    single-partition window, fine for driver-scale series, wrong for big
    frames), this partitions by the group keys, so at scale it is one
    ordinary hash-partitioned window pass; NaN-key groups are omitted
    from the result entirely (pandas dropna), so the output index is the
    surviving subset of the parent's."""

    def __init__(self, df, keys: list[str], col: str, window: int):
        self._df = df
        self._keys = keys
        self._col = col
        self._n = window

    def _base(self):
        """Materialized frame with NaN-or-NULL-key rows DROPPED — pandas
        groupby().rolling()/expanding() omit NaN-key groups from the
        result entirely (unlike transform, which keeps the rows as NaN)."""
        from pontem_spark.core.groupby import _keys_valid_sdf

        base = self._df._materialized()
        return base.filter(_keys_valid_sdf(base, self._keys))

    def _valid_value(self, sdf):
        v = sdf[self._col]
        if dict(sdf.dtypes).get(self._col) in ("double", "float"):
            return F.when(~F.isnan(v), v)
        return v

    def _win(self, sdf, lo):
        # _materialized() travels the index under INDEX_COL; within-group
        # row order = the frame's VISIBLE order (r10 composition probe)
        spec = self._df._internal.order_spec or ((INDEX_COL, True),)
        return (
            Window.partitionBy(*self._keys)
            .orderBy(*[F.col(n).asc() if asc else F.col(n).desc() for n, asc in spec])
            .rowsBetween(lo, Window.currentRow)
        )

    def _apply(self, aggfn):
        from pontem_spark.core.series import Series

        sdf = self._base()
        v = self._valid_value(sdf)
        w = self._win(sdf, -(self._n - 1))
        cnt = F.count(v).over(w)
        # pandas yields NaN until the window holds `window` observations
        col = F.when(cnt >= self._n, aggfn(v).over(w))
        internal = InternalFrame(sdf, INDEX_COL, self._df._internal.index_name)
        return Series._from_internal(internal, col, self._col)

    def sum(self): return self._apply(F.sum)
    def mean(self): return self._apply(F.mean)
    def min(self): return self._apply(F.min)
    def max(self): return self._apply(F.max)
    def std(self): return self._apply(F.stddev_samp)
    def var(self): return self._apply(F.var_samp)

    def median(self):
        """Exact grouped rolling median — the collect_list midpoint form
        (see Rolling.median), partitioned by the group keys."""
        from pontem_spark.core.series import Series

        sdf = self._base()
        w = self._win(sdf, -(self._n - 1))
        arr = F.sort_array(F.collect_list(self._valid_value(sdf)).over(w))
        cnt = F.size(arr)
        mid = (cnt / 2).cast("int")
        med = F.when(
            cnt % 2 == 1, F.try_element_at(arr, mid + 1).cast("double")
        ).otherwise(
            (
                F.try_element_at(arr, mid).cast("double")
                + F.try_element_at(arr, mid + 1).cast("double")
            )
            / 2.0
        )
        col = F.when(cnt >= self._n, med)
        internal = InternalFrame(sdf, INDEX_COL, self._df._internal.index_name)
        return Series._from_internal(internal, col, self._col)

    def count(self):
        """Gates on the ROW count reaching the window size, not the
        non-missing count — the Rolling.count asymmetry, grouped."""
        from pontem_spark.core.series import Series

        sdf = self._base()
        v = self._valid_value(sdf)
        w = self._win(sdf, -(self._n - 1))
        rows = F.count(F.lit(1)).over(w)
        col = F.when(rows >= self._n, F.count(v).over(w))
        internal = InternalFrame(sdf, INDEX_COL, self._df._internal.index_name)
        return Series._from_internal(internal, col, self._col)


class Ewm:
    """Exponentially-weighted windows (``s.ewm(alpha=...).mean()`` etc.).

    EWM is inherently SEQUENTIAL — y_t depends on every prior value with
    exponentially decaying weight, and the ``adjust=True`` normalizer has
    no overflow-safe prefix-sum form (w^-p explodes past ~1e308 within a
    few thousand rows). So, like the engine's other inherently-sequential
    ops (MMR greedy, custom streaming state), it runs as ONE Arrow batch
    group via applyInPandas, delegating the recurrence to pandas itself —
    exact parity with every parameter combination by construction. A
    Series is driver-scale by semantics (its windows are already
    single-partition); the 100 TB shape is per-KEY ewm over a grouped
    frame, where each group is bounded — same UDF, partitioned groups.
    """

    _OPS = ("mean", "sum", "std", "var")

    def __init__(self, s, com, span, halflife, alpha, adjust, ignore_na, min_periods):
        self._s = s
        self._params = dict(
            com=com, span=span, halflife=halflife, alpha=alpha,
            adjust=adjust, ignore_na=ignore_na, min_periods=min_periods,
        )

    def _apply(self, op: str):
        import pandas as pd

        from pontem_spark.core.limits import MAX_SINGLE_GROUP_ROWS
        from pontem_spark.core.series import Series

        s = self._s
        sdf = s._materialized()
        # loud scale guard (r7 verdict #6, same pattern as Series.unique):
        # the recurrence below funnels EVERY row through one Arrow group —
        # fail before a billion-row series materializes in one python
        # worker, and point at the per-key parallel shape.
        n = sdf.limit(MAX_SINGLE_GROUP_ROWS + 1).count()
        if n > MAX_SINGLE_GROUP_ROWS:
            raise ValueError(
                f"Series.ewm(): series has more than {MAX_SINGLE_GROUP_ROWS} "
                "rows; Series-level ewm is inherently sequential and runs as "
                "ONE Arrow group. Use df.groupby(key)[col].ewm(...) "
                "(GroupedEwm) — per-key groups run in parallel — or "
                "pre-aggregate to a bounded series."
            )
        idx_type = sdf.schema[INDEX_COL].dataType.simpleString()
        params = self._params
        # the recurrence runs in the VISIBLE order (order_spec), not raw
        # index order — ewm after sort_values must accumulate in sorted
        # order like pandas (r10 composition probe class)
        spec = s._internal.order_spec or ((INDEX_COL, True),)
        ord_names = [n for n, _ in spec]
        ord_asc = [a for _, a in spec]
        extras = [
            n for n in dict.fromkeys(ord_names)
            if n not in (INDEX_COL, "__value__") and n in sdf.columns
        ]

        def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(ord_names, ascending=ord_asc)
            vals = pd.to_numeric(pdf["__value__"], errors="coerce").astype("float64")
            out = getattr(vals.ewm(**params), op)()
            cols = {INDEX_COL: pdf[INDEX_COL], "__value__": out}
            for n in extras:
                cols[n] = pdf[n]
            return pd.DataFrame(cols)

        extra_schema = "".join(
            f", {n} {sdf.schema[n].dataType.simpleString()}" for n in extras
        )
        res = (
            sdf.select(
                INDEX_COL,
                F.col("__value__").cast("double").alias("__value__"),
                *[F.col(n) for n in extras],
            )
            .groupBy(F.lit(0).alias("__g"))
            .applyInPandas(
                fn, schema=f"{INDEX_COL} {idx_type}, __value__ double{extra_schema}"
            )
        )
        return Series._from_internal(
            # the extras pass through the Arrow fn so the display order
            # (spec) can carry to the result
            InternalFrame(
                res, INDEX_COL, s._internal.index_name, s._internal.order_spec
            ),
            res["__value__"],
            s._name,
        )

    def mean(self): return self._apply("mean")
    def sum(self): return self._apply("sum")
    def std(self): return self._apply("std")
    def var(self): return self._apply("var")


class GroupedEwm:
    """``df.groupby(k)[col].ewm(...)`` — per-KEY exponentially-weighted
    windows: the 100 TB shape of :class:`Ewm` (whose single Arrow group is
    Series/driver-scale by design). Each group is one Arrow batch via
    applyInPandas — groups run in parallel across executors, the recurrence
    inside a group is inherently sequential; pandas computes it, so every
    parameter combination is exact. Result rows are (index, value) per
    original row, ordered by index within each group."""

    def __init__(self, df, keys: list[str], col: str, params: dict):
        self._df = df
        self._keys = keys
        self._col = col
        self._params = dict(params)

    def _apply(self, op: str):
        import pandas as pd

        from pontem_spark.core.series import Series

        df = self._df
        key_aliases = [f"__k{i}" for i in range(len(self._keys))]
        # within-group row order = the frame's VISIBLE order (r10
        # composition probe); spec helper columns ride through the
        # projection so the Arrow fn can sort by them
        spec = df._internal.order_spec or ((INDEX_COL, True),)
        extras = [
            n for n in dict.fromkeys(n for n, _ in spec)
            if n != INDEX_COL and n in df._internal.sdf.columns
        ]
        # filter (name, asc) PAIRS together — filtering names and flags
        # separately shifted each surviving column onto the PRECEDING
        # column's direction whenever a spec column was dropped, reversing
        # the ewm recurrence order (ADVICE r10)
        pairs = [(n, a) for n, a in spec if n == INDEX_COL or n in extras]
        sort_names = [n for n, _ in pairs]
        sort_asc = [a for _, a in pairs]
        sdf = df._internal.sdf.select(
            df._internal.index_col.alias(INDEX_COL),
            *[df._columns[k].alias(a) for k, a in zip(self._keys, key_aliases)],
            df._columns[self._col].cast("double").alias("__v"),
            *[F.col(n) for n in extras],
        )
        from pontem_spark.core.groupby import _keys_valid_sdf

        # pandas omits NaN-key groups from the result entirely
        sdf = sdf.filter(_keys_valid_sdf(sdf, key_aliases))
        idx_type = sdf.schema[INDEX_COL].dataType.simpleString()
        if idx_type.startswith("struct"):
            raise ValueError(
                "GroupedEwm over a MultiIndex frame: reset_index() first"
            )
        params = self._params

        def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(sort_names or [INDEX_COL],
                                  ascending=sort_asc or True)
            out = getattr(pdf["__v"].ewm(**params), op)()
            return pd.DataFrame({INDEX_COL: pdf[INDEX_COL], "__value__": out})

        res = sdf.groupBy(*key_aliases).applyInPandas(
            fn, schema=f"{INDEX_COL} {idx_type}, __value__ double"
        )
        return Series._from_internal(
            InternalFrame(res, INDEX_COL, df._internal.index_name),
            res["__value__"],
            self._col,
        )

    def mean(self): return self._apply("mean")
    def sum(self): return self._apply("sum")
    def std(self): return self._apply("std")
    def var(self): return self._apply("var")


class GroupedExpanding:
    """``df.groupby(k)[col].expanding()`` — running windows WITHIN each
    group: one hash-partitioned window pass (unboundedPreceding →
    currentRow); NaN-key groups are omitted like GroupedRolling, and NaN
    is blanked to NULL first so window counts follow pandas' missing
    rule."""

    def __init__(self, df, keys: list[str], col: str, min_periods: int = 1):
        self._df = df
        self._keys = keys
        self._col = col
        self._minp = min_periods

    def _apply(self, aggfn):
        from pontem_spark.core.groupby import _keys_valid_sdf
        from pontem_spark.core.series import Series

        df = self._df
        base = df._materialized()
        # pandas omits NaN-key groups from the result entirely
        sdf = base.filter(_keys_valid_sdf(base, self._keys))
        expr = sdf[self._col]
        if dict(sdf.dtypes).get(self._col) in ("double", "float"):
            expr = F.when(~F.isnan(expr), expr)
        spec = df._internal.order_spec or ((INDEX_COL, True),)
        w = (
            Window.partitionBy(*self._keys)
            .orderBy(*[F.col(n).asc() if asc else F.col(n).desc() for n, asc in spec])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cnt = F.count(expr).over(w)
        col = F.when(cnt >= self._minp, aggfn(expr).over(w))
        internal = InternalFrame(
            sdf, INDEX_COL, df._internal.index_name, df._internal.order_spec
        )
        return Series._from_internal(internal, col, self._col)

    def sum(self): return self._apply(F.sum)
    def mean(self): return self._apply(F.mean)
    def min(self): return self._apply(F.min)
    def max(self): return self._apply(F.max)
    def std(self): return self._apply(F.stddev_samp)
    def var(self): return self._apply(F.var_samp)
    def count(self): return self._apply(F.count)


class FrameRolling:
    """Rolling windows over every numeric column of a DataFrame — ONE
    shared Window spec for all columns (Catalyst plans a single sort),
    each column blanked to pandas-missing like the Series form."""

    def __init__(self, df, window: int, min_periods: "int | None" = None, expanding: bool = False):
        self._df = df
        self._n = window
        self._minp = (
            (window if min_periods is None else min_periods)
            if not expanding
            else (1 if min_periods is None else min_periods)
        )
        self._expanding = expanding

    def _apply(self, aggfn, count_gate_rows: bool = False):
        from pontem_spark.core.frame import DataFrame

        df = self._df
        numeric = set(df._numeric_cols())
        bad = [c for c in df._columns if c not in numeric]
        if bad:
            raise TypeError(f"rolling: non-numeric columns {bad}")
        sdf = df._materialized()
        schema = dict(sdf.dtypes)
        lo = Window.unboundedPreceding if self._expanding else -(self._n - 1)
        w = (
            Window.orderBy(*df._internal.order_columns(INDEX_COL))
            .rowsBetween(lo, Window.currentRow)
        )
        cols = {}
        for c in df._columns:
            v = sdf[c]
            valid = (
                F.when(~F.isnan(v), v)
                if schema.get(c) in ("double", "float")
                else v
            )
            gate = (
                F.count(F.lit(1)).over(w) if count_gate_rows else F.count(valid).over(w)
            )
            cols[c] = F.when(gate >= self._minp, aggfn(valid).over(w))
        internal = InternalFrame(
            sdf, INDEX_COL, df._internal.index_name, df._internal.order_spec
        )
        return DataFrame._from_internal(internal, cols)

    def sum(self): return self._apply(F.sum)
    def mean(self): return self._apply(F.mean)
    def min(self): return self._apply(F.min)
    def max(self): return self._apply(F.max)
    def std(self): return self._apply(F.stddev_samp)
    def var(self): return self._apply(F.var_samp)

    def count(self):
        # pandas gates count on ROW count, not non-missing count (the
        # Series Rolling.count lesson)
        return self._apply(F.count, count_gate_rows=True)


class FrameEwm:
    """Frame-wide EWM: ONE Arrow applyInPandas group runs the recurrence
    for EVERY column in a single pass (the Series Ewm shape, vectorized
    across columns — a per-column loop would launch N separate groups)."""

    def __init__(self, df, com, span, halflife, alpha, adjust, ignore_na, min_periods):
        self._df = df
        self._params = dict(
            com=com, span=span, halflife=halflife, alpha=alpha,
            adjust=adjust, ignore_na=ignore_na, min_periods=min_periods,
        )

    def _apply(self, op: str):
        import pandas as pd

        from pontem_spark.core.frame import DataFrame

        df = self._df
        numeric = set(df._numeric_cols())
        bad = [c for c in df._columns if c not in numeric]
        if bad:
            raise TypeError(f"ewm: non-numeric columns {bad}")
        cols = list(df._columns)
        sdf = df._materialized()
        idx_type = sdf.schema[INDEX_COL].dataType.simpleString()
        params = self._params
        # the recurrence runs in the frame's VISIBLE order (r10
        # composition probe); _materialized() already carries the spec
        # helper columns
        spec = df._internal.order_spec or ((INDEX_COL, True),)
        ord_names = [n for n, _ in spec if n in sdf.columns]
        ord_asc = [a for n, a in spec if n in sdf.columns]

        def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(ord_names or [INDEX_COL], ascending=ord_asc or True)
            out = {INDEX_COL: pdf[INDEX_COL]}
            for c in cols:
                vals = pd.to_numeric(pdf[c], errors="coerce").astype("float64")
                out[c] = getattr(vals.ewm(**params), op)()
            for n in ord_names:
                if n != INDEX_COL and n not in cols:
                    out[n] = pdf[n]
            return pd.DataFrame(out)

        extras = [n for n in dict.fromkeys(ord_names) if n != INDEX_COL and n not in cols]
        extra_schema = "".join(
            f", {n} {sdf.schema[n].dataType.simpleString()}" for n in extras
        )
        schema = ", ".join(
            [f"{INDEX_COL} {idx_type}"] + [f"{c} double" for c in cols]
        ) + extra_schema
        res = (
            sdf.select(
                INDEX_COL,
                *[sdf[c].cast("double").alias(c) for c in cols],
                *[F.col(n) for n in extras],
            )
            .groupBy(F.lit(0).alias("__g"))
            .applyInPandas(fn, schema=schema)
        )
        internal = InternalFrame(
            res, INDEX_COL, df._internal.index_name, df._internal.order_spec
        )
        return DataFrame._from_internal(internal, {c: res[c] for c in cols})

    def mean(self): return self._apply("mean")
    def sum(self): return self._apply("sum")
    def std(self): return self._apply("std")
    def var(self): return self._apply("var")
