    # -- scalar elementwise arithmetic / comparisons ----------------------
    #
    # pandas 2.x rules, MEASURED this round (pandas 2.2.2 REPL, r14 probe
    # — reference shape: /root/reference/pontem/tests/test_series.py:75-114
    # generalized to frames):
    #   * the NAMED ops (add/sub/.../pow and eq/ne/lt/le/gt/ge) ALIGN both
    #     axes exactly like arithmetic — only the DUNDER comparisons
    #     require identically-labeled operands (both index and columns,
    #     order included), raising pandas' ValueError otherwise
    #   * bool ⊕ bool: + is OR, * is AND, - raises numpy's TypeError,
    #     % int-upcasts, and / // ** raise NotImplementedError
    #     ("operator 'X' not implemented for bool dtypes")
    #   * str ⊕ str: + concatenates with NaN propagation; other arithmetic
    #     raises TypeError (pandas' printf-style str % str is deliberately
    #     NOT reproduced — ledgered deviation, absurd at scale)
    #   * comparisons across dtype classes (str vs numeric): eq is False,
    #     ne is True, ordering comparisons raise TypeError
    #   * a Series operand with fill_value raises NotImplementedError
    #     ("fill_value X not supported.") on every axis

    _NUMERIC_SIMPLE = frozenset(
        {"tinyint", "smallint", "int", "bigint", "float", "double"}
    )
    _BOOL_RAISE_OPS = frozenset({"truediv", "floordiv", "pow"})
    _ORDER_CMP_OPS = frozenset({"lt", "le", "gt", "ge"})
    _STR_OP_ERRS = {
        "sub": "unsupported operand type(s) for -: 'str' and 'str'",
        "mul": "can't multiply sequence by non-int of type 'str'",
        "truediv": "unsupported operand type(s) for /: 'str' and 'str'",
        "floordiv": "unsupported operand type(s) for //: 'str' and 'str'",
        "mod": "printf-style str % str formatting is not supported "
               "(documented deviation from pandas)",
        "pow": "unsupported operand type(s) for ** or pow(): 'str' and 'str'",
    }
    _CMP_FRAME_MSG = (
        "Can only compare identically-labeled (both index and columns) "
        "DataFrame objects"
    )

    @staticmethod
    def _op_column_fn(opname: str):
        """Column-level implementation per op name. Arithmetic routes
        through the Series' pandas-corrected helpers (true-floor floordiv,
        divisor-sign mod, 1**NaN==1 pow, /0 without the ANSI throw) — the
        r14 probe caught the frame dunders using raw Spark % (dividend
        sign) and floor(l/r) (floor(NaN) is 0), and ANSI DIVIDE_BY_ZERO
        on df / 0."""
        import operator

        from pontem_spark.core.series import Series as _S

        return {
            "add": operator.add, "sub": operator.sub, "mul": operator.mul,
            "truediv": _S._truediv_cols, "floordiv": _S._floordiv_cols,
            "mod": _S._mod_cols, "pow": _S._pow_cols,
            "eq": operator.eq, "ne": operator.ne, "lt": operator.lt,
            "le": operator.le, "gt": operator.gt, "ge": operator.ge,
        }[opname]

    @staticmethod
    def _dtype_class(dt: "str | None") -> str:
        if dt is None:
            return "num"  # absent-side NULL-double literal
        if dt == "string":
            return "str"
        if dt == "boolean":
            return "bool"
        if dt in DataFrame._NUMERIC_SIMPLE or dt.startswith("decimal"):
            return "num"
        return "other"

    @staticmethod
    def _missing_dt(col: Column, dt: "str | None") -> Column:
        """pandas-missing (NULL or float NaN) from a KNOWN dtype string —
        never resolved by select() against a joined alias (ADVICE r14:
        the cross-anchor path probed dtypes with F.col('l.x') against the
        unaliased frames, always raising, so NaN cells counted as present
        and boolean frames crashed)."""
        if dt in ("double", "float"):
            return col.isNull() | F.isnan(col)
        return col.isNull()

    def _missing_mask(self, name: str, schema) -> Column:
        v = self._columns[name]
        return self._missing_dt(v, schema.get(name))

    def _combine_cells(
        self, opname: str, lcol: Column, rcol: Column,
        ldt: "str | None", rdt: "str | None", *, comparison: bool,
        missing_result: bool, reflected: bool, fill_value,
        guard: "Column | None" = None, guard_msg: str = "",
    ) -> Column:
        """One output cell from left/right operand columns with KNOWN
        dtypes (resolved from the pre-join schemas by plain name).
        ``guard`` — strict dunder comparisons — raises lazily when the
        1-row label-mismatch stat fired."""
        if reflected:
            lcol, rcol, ldt, rdt = rcol, lcol, rdt, ldt
        lc, rc = self._dtype_class(ldt), self._dtype_class(rdt)
        if comparison:
            compat = lc == rc or {lc, rc} == {"bool", "num"}
            if not compat:
                if opname in self._ORDER_CMP_OPS:
                    raise TypeError(
                        f"'{opname}' not supported between mismatched "
                        f"dtypes ({ldt} vs {rdt})"
                    )
                res = F.lit(opname == "ne")
            else:
                if lc == "bool" and rc == "num":
                    lcol, ldt = lcol.cast("int"), "int"
                elif rc == "bool" and lc == "num":
                    rcol, rdt = rcol.cast("int"), "int"
                lm = self._missing_dt(lcol, ldt)
                rm = self._missing_dt(rcol, rdt)
                raw = self._op_column_fn(opname)(lcol, rcol)
                res = (raw | lm | rm) if missing_result else (raw & ~lm & ~rm)
            if guard is not None:
                res = F.when(guard, F.raise_error(F.lit(guard_msg))).otherwise(res)
            return res
        if lc == "other" or rc == "other":
            raise TypeError(
                f"unsupported operand type(s) for {opname}: {ldt} and {rdt}"
            )
        if lc == "str" or rc == "str":
            if lc != rc:
                bad = rdt if lc == "str" else ldt
                raise TypeError(f'can only concatenate str (not "{bad}") to str')
            if opname != "add":
                raise TypeError(self._STR_OP_ERRS[opname])
            if fill_value is not None:
                if not isinstance(fill_value, str):
                    raise TypeError(
                        'can only concatenate str (not '
                        f'"{type(fill_value).__name__}") to str'
                    )
                lm, rm = lcol.isNull(), rcol.isNull()
                lcol = F.when(lm & ~rm, F.lit(fill_value)).otherwise(lcol)
                rcol = F.when(rm & ~lm, F.lit(fill_value)).otherwise(rcol)
            return F.concat(lcol, rcol)  # NULL propagates: "a" + NaN = NaN
        if lc == "bool" and rc == "bool":
            if opname == "add":
                return lcol | rcol
            if opname == "mul":
                return lcol & rcol
            if opname == "sub":
                raise TypeError(
                    "numpy boolean subtract, the `-` operator, is not "
                    "supported, use the bitwise_xor, the `^` operator, or "
                    "the logical_xor function instead."
                )
            if opname in self._BOOL_RAISE_OPS:
                raise NotImplementedError(
                    f"operator '{opname}' not implemented for bool dtypes"
                )
            lcol, ldt = lcol.cast("int"), "int"
            rcol, rdt = rcol.cast("int"), "int"
        elif lc == "bool":
            lcol, ldt = lcol.cast("int"), "int"
        elif rc == "bool":
            rcol, rdt = rcol.cast("int"), "int"
        if fill_value is not None:
            # pandas fill_value: a cell missing on exactly ONE side takes
            # the fill before the op; both-missing stays missing
            lm = self._missing_dt(lcol, ldt)
            rm = self._missing_dt(rcol, rdt)
            lcol = F.when(lm & ~rm, F.lit(fill_value)).otherwise(lcol)
            rcol = F.when(rm & ~lm, F.lit(fill_value)).otherwise(rcol)
        return self._op_column_fn(opname)(lcol, rcol)

    def _elementwise_scalar(
        self, opname: str, other, comparison: bool = False,
        missing_result: bool = False, reflected: bool = False,
        fill_value=None, strict: bool = False,
    ) -> "DataFrame":
        """Frame ⊕ scalar per column — a pure projection on the same
        anchor (zero jobs). Frame and Series operands dispatch to the
        aligned forms. ``strict`` marks DUNDER comparisons."""
        import numpy as np

        if isinstance(other, np.generic):
            other = other.item()
        if isinstance(other, DataFrame):
            return self._elementwise_frame(
                opname, other, comparison, missing_result, reflected,
                fill_value=fill_value, strict=strict,
            )
        from pontem_spark.core.series import Series as _PSeries

        if isinstance(other, _PSeries):
            if fill_value is not None:
                raise NotImplementedError(f"fill_value {fill_value} not supported.")
            return self._elementwise_series_columns(
                opname, other, comparison, missing_result, reflected,
                strict=strict,
            )
        if isinstance(other, str):
            rdt = "string"
        elif isinstance(other, bool):
            rdt = "boolean"
        elif isinstance(other, int):
            rdt = "bigint"
        elif isinstance(other, float):
            rdt = "double"
        else:
            raise TypeError(
                "frame elementwise op needs a scalar, DataFrame or "
                f"Series, got {type(other).__name__}"
            )
        schema = {
            f.name: f.dataType.simpleString()
            for f in self._materialized().schema.fields
        }
        rcol = F.lit(other)
        out = {
            k: self._combine_cells(
                opname, v, rcol, schema.get(k), rdt,
                comparison=comparison, missing_result=missing_result,
                reflected=reflected, fill_value=fill_value,
            )
            for k, v in self._columns.items()
        }
        return DataFrame._from_internal(self._internal, out)

    def _elementwise_frame(
        self, opname: str, other, comparison: bool,
        missing_result: bool, reflected: bool, fill_value=None,
        strict: bool = False,
    ) -> "DataFrame":
        """Frame ⊕ frame — and frame ⊕ Series broadcast down the INDEX
        axis (``df.sub(s, axis=0)``), where the one series value column
        combines with EVERY frame column. pandas aligns BOTH axes:
        columns by name (sorted union when the sets differ; one-sided
        columns become NaN, or the missing result under the aligning
        named comparisons) and rows by index.

        Plan shape: same-anchor operands compose column-wise — zero
        joins. Cross-anchor operands take ONE full-outer label join when
        either side is in index order (spec None — the big-data path).
        Only when BOTH sides carry a custom visible order does the
        Series aligner's cart/pos machinery engage: a lazy 1-row
        Index.equals stat (row_number over each side's visible order,
        joined on position) picks positional pairing (identical
        sequences — pandas' short-circuit, correct under duplicate
        labels) or the per-label cartesian (differing sequences —
        pandas' arithmetic alignment), built as two branch plans each
        filtered by the broadcast flag so exactly one is non-empty at
        runtime.

        ``strict`` (dunder comparisons) raises pandas' identically-
        labeled ValueError — column labels eagerly, row labels lazily
        through the same stat feeding F.raise_error."""
        from pontem_spark.core.series import Series as _PSeries

        is_series = isinstance(other, _PSeries)
        cols_l = dict(self._columns)
        if is_series:
            cols_r = None
            union = list(cols_l)
        else:
            cols_r = dict(other._columns)
            if strict and list(cols_l) != list(cols_r):
                raise ValueError(self._CMP_FRAME_MSG)
            if set(cols_l) != set(cols_r):
                union = sorted({*cols_l, *cols_r}, key=str)
            else:
                union = list(cols_l)

        _absent = F.lit(None).cast("double")

        # ---- same-anchor fast path: pure projection, zero jobs ----------
        if other._internal is self._internal:
            sdf = self._internal.sdf

            def _dt(col):
                try:
                    return sdf.select(col).schema[0].dataType.simpleString()
                except Exception:  # noqa: BLE001 — unresolvable: null-only
                    return None

            out: dict[str, Column] = {}
            for c in union:
                lcol = cols_l.get(c)
                rcol = other._col if is_series else cols_r.get(c)
                if lcol is not None and rcol is not None:
                    out[c] = self._combine_cells(
                        opname, lcol, rcol, _dt(lcol), _dt(rcol),
                        comparison=comparison, missing_result=missing_result,
                        reflected=reflected, fill_value=fill_value,
                    )
                elif comparison:
                    out[c] = F.lit(missing_result)
                elif fill_value is not None:
                    out[c] = self._combine_cells(
                        opname,
                        lcol if lcol is not None else _absent,
                        rcol if rcol is not None else _absent,
                        _dt(lcol) if lcol is not None else None,
                        _dt(rcol) if rcol is not None else None,
                        comparison=False, missing_result=False,
                        reflected=reflected, fill_value=fill_value,
                    )
                else:
                    out[c] = F.lit(None).cast("double")
            return DataFrame._from_internal(self._internal, out)

        # ---- cross-anchor ----------------------------------------------
        a = self._materialized()
        b = other._materialized("__frv__") if is_series else other._materialized()
        ldts = {c: a.schema[c].dataType.simpleString() for c in cols_l}
        lname = {c: f"__flv{i}__" for i, c in enumerate(union) if c in cols_l}
        if is_series:
            rdts = {c: b.schema["__frv__"].dataType.simpleString() for c in union}
            rout = {c: "__frv__" for c in union}
        else:
            rdts = {c: b.schema[c].dataType.simpleString() for c in cols_r}
            rout = {c: f"__frv{i}__" for i, c in enumerate(union) if c in cols_r}

        spec = self._internal.order_spec
        rspec = other._internal.order_spec

        # row-aligned derivation fast keys (equal specs + shared lineage):
        # the spec's helper columns pair rows positionally so duplicate
        # labels don't fan the label join out k² per label (the Series
        # aligner's _rowalign_keys rule, ported)
        rkeys: list[str] = []
        if (
            spec
            and rspec == spec
            and (self._internal.row_tokens & other._internal.row_tokens)
        ):
            rkeys = [
                n
                for n, _ in spec
                if n != INDEX_COL and n in a.columns and n in b.columns
            ]
        pairstat = None
        pair_msg = ""
        if rkeys and "__ctor__" not in rkeys:
            gkeys = [INDEX_COL, *rkeys]
            _gs = F.struct(*[F.col(k) for k in gkeys])
            pairstat = (
                a.agg((F.count(F.lit(1)) > F.count_distinct(_gs)).alias("__fdupl__"))
                .crossJoin(
                    b.agg(
                        (F.count(F.lit(1)) > F.count_distinct(_gs)).alias("__fdupr__")
                    )
                )
                .select((F.col("__fdupl__") | F.col("__fdupr__")).alias("__fdup_pair__"))
            )
            pair_msg = (
                "cannot pair rows positionally: duplicate index labels tie "
                "on every order-spec column; sort by a unique key or "
                "reset_index first"
            )

        # left spec keys that are ALSO value columns must ride as the RAW
        # LEFT value under a helper name — the visible output column
        # becomes the COMBINED value, which would silently re-order the
        # result (pandas keeps the LEFT frame's visible order, driven by
        # the left frame's own values)
        extras: list[tuple[str, str]] = []
        if spec is not None:
            seen: set = set()
            for i, (n, _asc) in enumerate(spec):
                if n == INDEX_COL or n not in a.columns or n in seen:
                    continue
                seen.add(n)
                clash = n in cols_l or (cols_r is not None and n in cols_r) or n == "__frv__"
                extras.append((n, f"__flspec{i}__" if clash else n))
        ext_map = dict(extras)
        spec_rewritten = (
            tuple(
                (ext_map.get(n, n), asc)
                for n, asc in spec
                if n == INDEX_COL or n in a.columns
            )
            if spec is not None
            else None
        )

        def lsel(q: str):
            return [F.col(f"{q}.{c}").alias(lname[c]) for c in union if c in lname]

        def rsel(q: str):
            if is_series:
                return [F.col(f"{q}.__frv__").alias("__frv__")]
            return [F.col(f"{q}.{c}").alias(rout[c]) for c in union if c in rout]

        jcond = F.col(f"l.{INDEX_COL}") == F.col(f"r.{INDEX_COL}")
        for n in rkeys:
            jcond = jcond & F.col(f"l.{n}").eqNullSafe(F.col(f"r.{n}"))
        joined = a.alias("l").join(b.alias("r"), jcond, "full_outer")

        both_ordered = spec is not None and rspec is not None
        if not (strict or both_ordered):
            # label-only join; result order is the sorted union index
            # (the Series aligner's spec-None rule) — ONE shuffle, the
            # 100 TB path
            sdf = joined.select(
                F.coalesce(F.col(f"l.{INDEX_COL}"), F.col(f"r.{INDEX_COL}")).alias(INDEX_COL),
                *lsel("l"),
                *rsel("r"),
            )
            new_spec = None
            guard_col = None
        else:
            from pyspark.sql.window import Window

            lw = Window.orderBy(
                *[
                    F.col(n).asc() if asc else F.col(n).desc()
                    for n, asc in (spec or ())
                    if n in a.columns
                ],
                F.col(INDEX_COL).asc(),
            )
            rw = Window.orderBy(
                *[
                    F.col(n).asc() if asc else F.col(n).desc()
                    for n, asc in (rspec or ())
                    if n in b.columns
                ],
                F.col(INDEX_COL).asc(),
            )
            a_pos = a.withColumn("__flp__", F.row_number().over(lw))
            b_pos = b.withColumn("__frp__", F.row_number().over(rw))
            # joined ON POSITION, compared BY LABEL — pandas Index.equals
            # exactly; duplicate labels can't fan this stat out
            mism = (
                a_pos.select(F.col(INDEX_COL).alias("__fli__"), "__flp__")
                .join(
                    b_pos.select(F.col(INDEX_COL).alias("__fri__"), "__frp__"),
                    F.col("__flp__") == F.col("__frp__"),
                    "full_outer",
                )
                .agg(
                    F.max(
                        F.col("__flp__").isNull()
                        | F.col("__frp__").isNull()
                        | ~F.col("__fli__").eqNullSafe(F.col("__fri__"))
                    ).alias("__fmism__")
                )
            )
            taken = (
                {n for n, _ in (spec or ())}
                | set(lname.values())
                | set(rout.values())
                | {dst for _, dst in extras}
            )
            k = 0
            while f"__falunion{k}__" in taken:
                k += 1
            alunion = f"__falunion{k}__"
            cart = (
                joined.crossJoin(F.broadcast(mism))
                .filter(F.col("__fmism__"))
                .select(
                    F.coalesce(F.col(f"l.{INDEX_COL}"), F.col(f"r.{INDEX_COL}")).alias(INDEX_COL),
                    *lsel("l"),
                    *rsel("r"),
                    *[F.col(f"l.{src}").alias(dst) for src, dst in extras],
                    F.coalesce(F.col(f"l.{INDEX_COL}"), F.col(f"r.{INDEX_COL}")).alias(alunion),
                    F.lit(True).alias("__fguard__"),
                )
            )
            idx_t = a.schema[INDEX_COL].dataType
            pos = (
                a_pos.alias("l")
                .join(
                    b_pos.alias("r"),
                    F.col("l.__flp__") == F.col("r.__frp__"),
                    "inner",
                )
                .crossJoin(F.broadcast(mism))
                .filter(~F.col("__fmism__"))
                .select(
                    F.col(f"l.{INDEX_COL}").alias(INDEX_COL),
                    *lsel("l"),
                    *rsel("r"),
                    *[F.col(f"l.{src}").alias(dst) for src, dst in extras],
                    F.lit(None).cast(idx_t).alias(alunion),
                    F.lit(False).alias("__fguard__"),
                )
            )
            sdf = cart.unionByName(pos)
            # strict comparisons keep the LEFT order (identical labels
            # required — the cart branch raises); aligning ops order by
            # the union helper first, falling back to the left order
            # while the sequences were identical
            new_spec = (
                spec_rewritten
                if strict
                else ((alunion, True),) + (spec_rewritten or ())
            )
            guard_col = sdf["__fguard__"] if strict else None

        index_name = (
            self._internal.index_name
            if self._internal.index_name == other._internal.index_name
            else None
        )
        if pairstat is not None:
            sdf = sdf.crossJoin(F.broadcast(pairstat))
        internal = InternalFrame(sdf, INDEX_COL, index_name, new_spec)
        out: dict[str, Column] = {}
        for c in union:
            has_l, has_r = c in lname, c in rout
            lcol = sdf[lname[c]] if has_l else _absent
            rcol = sdf[rout[c]] if has_r else _absent
            if (has_l and has_r) or (fill_value is not None and not comparison):
                col = self._combine_cells(
                    opname, lcol, rcol,
                    ldts.get(c) if has_l else None,
                    rdts.get(c) if has_r else None,
                    comparison=comparison, missing_result=missing_result,
                    reflected=reflected, fill_value=fill_value,
                    guard=guard_col, guard_msg=self._CMP_FRAME_MSG,
                )
            elif comparison:
                col = F.lit(missing_result)
            else:
                col = F.lit(None).cast("double")
            if pairstat is not None:
                col = F.when(
                    F.col("__fdup_pair__"), F.raise_error(F.lit(pair_msg))
                ).otherwise(col)
            out[c] = col
        return DataFrame._from_internal(internal, out)

    def _elementwise_series_columns(
        self, opname: str, s, comparison: bool, missing_result: bool,
        reflected: bool, strict: bool = False,
    ) -> "DataFrame":
        """Frame ⊕ Series broadcast along axis='columns' (the pandas
        default): the series' labels align to the frame's COLUMN names —
        the metadata axis, driver-scale by semantics, so collecting the
        (typically #columns-sized) series is not a distributed-data pull.
        Labels on one side only become NaN columns (False/True under the
        aligning named comparisons); DUNDER comparisons require matching
        label sets and raise pandas' 'Operands are not aligned' (r14
        probe: the NAMED comparisons align — only dunders raise)."""
        import pandas as pd

        svals = s.to_pandas()
        if svals.index.has_duplicates:
            raise ValueError("cannot reindex on an axis with duplicate labels")
        mapping = dict(svals.items())
        cols_l = dict(self._columns)
        if set(cols_l) != set(mapping):
            if comparison and strict:
                raise ValueError(
                    "Operands are not aligned. Do `left, right = left.align("
                    "right, axis=1, copy=False)` before operating."
                )
            union = sorted({*cols_l, *mapping}, key=str)
        else:
            union = list(cols_l)
        schema = {
            f.name: f.dataType.simpleString()
            for f in self._materialized().schema.fields
        }

        def _sdt(v):
            if isinstance(v, str):
                return "string"
            if isinstance(v, bool):
                return "boolean"
            return "double" if isinstance(v, float) else "bigint"

        out: dict[str, Column] = {}
        for c in union:
            if c in cols_l and c in mapping and not pd.isna(mapping[c]):
                v = mapping[c]
                out[c] = self._combine_cells(
                    opname, cols_l[c], F.lit(v), schema.get(c), _sdt(v),
                    comparison=comparison, missing_result=missing_result,
                    reflected=reflected, fill_value=None,
                )
            elif comparison:
                out[c] = F.lit(missing_result)
            else:
                out[c] = F.lit(None).cast("double")
        return DataFrame._from_internal(self._internal, out)

    # -- operator surface -------------------------------------------------

    def __add__(self, o): return self._elementwise_scalar("add", o)
    def __radd__(self, o): return self._elementwise_scalar("add", o, reflected=True)
    def __sub__(self, o): return self._elementwise_scalar("sub", o)
    def __rsub__(self, o): return self._elementwise_scalar("sub", o, reflected=True)
    def __mul__(self, o): return self._elementwise_scalar("mul", o)
    def __rmul__(self, o): return self._elementwise_scalar("mul", o, reflected=True)
    def __truediv__(self, o): return self._elementwise_scalar("truediv", o)
    def __rtruediv__(self, o): return self._elementwise_scalar("truediv", o, reflected=True)
    def __floordiv__(self, o): return self._elementwise_scalar("floordiv", o)
    def __rfloordiv__(self, o): return self._elementwise_scalar("floordiv", o, reflected=True)
    def __mod__(self, o): return self._elementwise_scalar("mod", o)
    def __rmod__(self, o): return self._elementwise_scalar("mod", o, reflected=True)
    def __pow__(self, o): return self._elementwise_scalar("pow", o)
    def __rpow__(self, o): return self._elementwise_scalar("pow", o, reflected=True)

    def _named_op(self, opname, other, fill_value=None, reflected=False,
                  axis="columns", level=None):
        """Shared core of the flexible named arithmetic methods — the
        full 7-op table with axis and fill_value (r14: previously a 4-op
        table without either)."""
        if level is not None:
            raise NotImplementedError("level is not supported")
        if axis not in (None, 0, 1, "index", "columns"):
            raise ValueError(f"No axis named {axis} for object type DataFrame")
        from pontem_spark.core.series import Series as _PSeries

        if isinstance(other, _PSeries):
            if fill_value is not None:
                raise NotImplementedError(f"fill_value {fill_value} not supported.")
            if axis in (0, "index"):
                return self._elementwise_frame(
                    opname, other, False, False, reflected
                )
        return self._elementwise_scalar(
            opname, other, reflected=reflected, fill_value=fill_value
        )

    def add(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("add", other, fill_value, axis=axis, level=level)
    def radd(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("add", other, fill_value, reflected=True, axis=axis, level=level)
    def sub(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("sub", other, fill_value, axis=axis, level=level)
    def rsub(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("sub", other, fill_value, reflected=True, axis=axis, level=level)
    def mul(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("mul", other, fill_value, axis=axis, level=level)
    def rmul(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("mul", other, fill_value, reflected=True, axis=axis, level=level)
    def div(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("truediv", other, fill_value, axis=axis, level=level)
    def rdiv(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("truediv", other, fill_value, reflected=True, axis=axis, level=level)
    def floordiv(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("floordiv", other, fill_value, axis=axis, level=level)
    def rfloordiv(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("floordiv", other, fill_value, reflected=True, axis=axis, level=level)
    def mod(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("mod", other, fill_value, axis=axis, level=level)
    def rmod(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("mod", other, fill_value, reflected=True, axis=axis, level=level)
    def pow(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("pow", other, fill_value, axis=axis, level=level)
    def rpow(self, other, axis="columns", level=None, fill_value=None):
        return self._named_op("pow", other, fill_value, reflected=True, axis=axis, level=level)
    truediv = div
    rtruediv = rdiv
    multiply = mul
    subtract = sub

    # dunder comparisons: STRICT — pandas requires identically-labeled
    # operands (both index and columns, order included)
    def __gt__(self, o): return self._elementwise_scalar("gt", o, comparison=True, strict=True)
    def __ge__(self, o): return self._elementwise_scalar("ge", o, comparison=True, strict=True)
    def __lt__(self, o): return self._elementwise_scalar("lt", o, comparison=True, strict=True)
    def __le__(self, o): return self._elementwise_scalar("le", o, comparison=True, strict=True)
    def __eq__(self, o): return self._elementwise_scalar("eq", o, comparison=True, strict=True)  # type: ignore[override]
    def __ne__(self, o): return self._elementwise_scalar("ne", o, comparison=True, missing_result=True, strict=True)  # type: ignore[override]
    __hash__ = None  # pandas DataFrames are unhashable too

    def _cmp_named(self, opname, other, axis="columns", level=None,
                   missing_result=False):
        """Flexible named comparisons ALIGN both axes like arithmetic
        (r14 probe: only the dunders raise on label mismatch)."""
        if level is not None:
            raise NotImplementedError("level is not supported")
        if axis not in (None, 0, 1, "index", "columns"):
            raise ValueError(f"No axis named {axis} for object type DataFrame")
        from pontem_spark.core.series import Series as _PSeries

        if isinstance(other, _PSeries) and axis in (0, "index"):
            return self._elementwise_frame(
                opname, other, True, missing_result, False
            )
        return self._elementwise_scalar(
            opname, other, comparison=True, missing_result=missing_result
        )

    def eq(self, other, axis="columns", level=None):
        return self._cmp_named("eq", other, axis, level)
    def ne(self, other, axis="columns", level=None):
        return self._cmp_named("ne", other, axis, level, missing_result=True)
    def lt(self, other, axis="columns", level=None):
        return self._cmp_named("lt", other, axis, level)
    def le(self, other, axis="columns", level=None):
        return self._cmp_named("le", other, axis, level)
    def gt(self, other, axis="columns", level=None):
        return self._cmp_named("gt", other, axis, level)
    def ge(self, other, axis="columns", level=None):
        return self._cmp_named("ge", other, axis, level)
