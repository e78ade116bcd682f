"""InternalFrame: the single representation shared by Series and DataFrame.

An InternalFrame is an immutable wrapper around one Spark DataFrame (the
*anchor*) plus metadata naming the index column. Series/DataFrame objects
hold (internal, Column-expression(s)) pairs; deriving a new Series from the
same anchor is pure expression composition — zero Spark jobs, one growing
Catalyst plan (vs the reference's per-op RDD re-ingestion + zipWithIndex,
``pontem/series/series.py:96-100,226``).

Index policy (SURVEY §1.4): the index is an ordinary column, materialized at
construction for driver-local data (it IS data there). For big wrapped Spark
DataFrames, ``from_spark(..., index=None)`` attaches a distributed sequence
id only when explicitly requested — never silently materialize 0..n-1 over
100 TB.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column, DataFrame as SparkDataFrame, SparkSession, functions as F

INDEX_COL = "__index__"

# pandas dtype name → Spark SQL type name (astype table; the reference only
# implemented 'int', `pontem/series/series.py:183-188`)
DTYPE_TO_SPARK: dict[str, str] = {
    "int": "bigint",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "double",
    "float32": "float",
    "float64": "double",
    "str": "string",
    "string": "string",
    "object": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "datetime64[ns]": "timestamp",
    "datetime64[us]": "timestamp",
    "date": "date",
}


def to_spark_type(dtype: Any) -> str:
    """Accept python types, numpy dtypes, pandas dtype strings."""
    if dtype is int:
        return "bigint"
    if dtype is float:
        return "double"
    if dtype is str:
        return "string"
    if dtype is bool:
        return "boolean"
    name = getattr(dtype, "name", None) or str(dtype)
    lowered = name.lower()
    if lowered in DTYPE_TO_SPARK:
        return DTYPE_TO_SPARK[lowered]
    # Spark SQL type strings pass through verbatim: decimal(p,s), nested
    # array<>/map<>/struct<> — validated by Spark's own parser at cast time
    if lowered.startswith(("decimal", "array<", "map<", "struct<")):
        return lowered
    raise TypeError(f"unsupported dtype for astype: {dtype!r}")


def empty_upload_schema(pdf) -> str:
    """Explicit DDL schema for a ZERO-ROW pandas upload — Spark refuses
    to infer from an empty dataset (r14 probe R8: ``DataFrame({"x": []})``
    crashed with CANNOT_INFER_EMPTY_SCHEMA). pandas dtypes map through;
    object (the dtype of an empty python list / empty index) degrades to
    string for the index and double for value columns, matching pandas'
    float64 default for empty columns."""
    parts = []
    for c in pdf.columns:
        s = str(pdf[c].dtype).lower()
        if s.startswith("float"):
            t = "double"
        elif s.startswith(("int", "uint")):
            t = "bigint"
        elif s == "bool":
            t = "boolean"
        elif s.startswith("datetime"):
            t = "timestamp"
        elif c == INDEX_COL:
            t = "string"
        else:
            t = "double"
        parts.append(f"`{c}` {t}")
    return ", ".join(parts)


def devoid(sdf: SparkDataFrame) -> SparkDataFrame:
    """Cast NullType ('void') columns to double. An all-missing column in
    a driver-local ctor arrives as Spark NullType, which no arithmetic,
    comparison, or writer accepts — pandas treats such a column as float
    NaN in any numeric context (r13 frame-chain probe, seed 104)."""
    voids = [
        f.name for f in sdf.schema.fields if f.dataType.simpleString() == "void"
    ]
    for n in voids:
        sdf = sdf.withColumn(n, F.col(n).cast("double"))
    return sdf


def guard_unique_labels(
    source: SparkDataFrame, label_col: str, out: SparkDataFrame, out_label_col: str
) -> SparkDataFrame:
    """pandas parity for reindex/reindex_like: duplicate labels in the
    SOURCE index would fan out the left join and silently multiply rows;
    pandas raises 'cannot reindex on an axis with duplicate labels'. The
    check is a LAZY in-plan raise_error over a broadcast 1-row stat (the
    resample grid-guard idiom) — no eager probe job. count_distinct over a
    struct so duplicated NULL labels also trip the guard."""
    stat = source.agg(
        (
            F.count(F.lit(1)) > F.count_distinct(F.struct(F.col(label_col)))
        ).alias("__dup__")
    )
    guarded = out.crossJoin(F.broadcast(stat))
    return guarded.withColumn(
        out_label_col,
        F.when(
            F.col("__dup__"),
            F.raise_error(
                F.lit("cannot reindex on an axis with duplicate labels")
            ),
        ).otherwise(F.col(out_label_col)),
    ).drop("__dup__")


def rowalign_left_join(
    left: SparkDataFrame,
    right: SparkDataFrame,
    helper_keys: "list[str]",
    payload: "str | list[str]",
) -> SparkDataFrame:
    """LEFT join ``right``'s single ``payload`` column onto ``left`` by
    index label plus the shared order-spec helper columns. Helper keys
    compare NULL-SAFE: an alignment helper can legitimately hold NULL
    in every row (e.g. the aligned-binop ``__alunion__`` marker when
    fully matched), and a name-list join's plain equality would then
    silently drop every match (r12 probe batch 4). The index label
    itself keeps plain equality — the pre-existing missing-label rule."""
    payloads = [payload] if isinstance(payload, str) else list(payload)
    l, r = left.alias("l"), right.alias("r")
    cond = F.col(f"l.{INDEX_COL}") == F.col(f"r.{INDEX_COL}")
    for n in helper_keys:
        cond = cond & F.col(f"l.{n}").eqNullSafe(F.col(f"r.{n}"))
    if "__ctor__" in helper_keys:
        # arange helper — unique per row by construction, so the join key
        # is provably total: skip the duplicate-key guard below
        return l.join(r, cond, "left").select(
            *[F.col(f"l.{c}").alias(c) for c in left.columns],
            *[F.col(f"r.{p}").alias(p) for p in payloads],
        )
    # the payload contract is ≤1 right row per left row; a RIGHT side whose
    # join key repeats would silently fan the left out k per repeated key
    # instead — pandas raises. Lazy 1-row broadcast stat (guard_unique_labels
    # idiom): key-column-pruned agg, no eager job, raises at first
    # materialization of any payload column. Lineage-shared helper keys are
    # unique per row, so the guard stays silent on every rowalign path.
    stat = right.agg(
        (
            F.count(F.lit(1))
            > F.count_distinct(
                F.struct(F.col(INDEX_COL), *[F.col(n) for n in helper_keys])
            )
        ).alias("__dup_rjk__")
    )
    return (
        l.join(r, cond, "left")
        .crossJoin(F.broadcast(stat))
        .select(
            *[F.col(f"l.{c}").alias(c) for c in left.columns],
            *[
                F.when(
                    F.col("__dup_rjk__"),
                    F.raise_error(
                        F.lit("cannot reindex on an axis with duplicate labels")
                    ),
                )
                .otherwise(F.col(f"r.{p}"))
                .alias(p)
                for p in payloads
            ],
        )
    )


def next_epos_name(order_spec) -> str:
    """A position-helper column name not already used by ``order_spec``.

    Chained explode/repeat each append a posexplode position to the spec;
    reusing one fixed name would both carry the OLD helper as a spec extra
    and alias the NEW posexplode to it — a duplicate column that fails
    materialization with AMBIGUOUS_REFERENCE (ADVICE r10)."""
    names = {n for n, _ in (order_spec or ())}
    if "__epos__" not in names:
        return "__epos__"
    k = 2
    while f"__epos{k}__" in names:
        k += 1
    return f"__epos{k}__"


def default_session() -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from pontem_spark.session import get_spark

    return get_spark()


class InternalFrame:
    """Anchor Spark DataFrame + index metadata. Immutable.

    ``order_spec`` records the frame's pandas-visible row order as
    (materialized-column-name, ascending) pairs; None means index order.
    pandas is order-preserving and Spark is not, so materialization points
    (head/to_pandas/repr) sort by this spec — and ONLY there (SURVEY §4:
    'ordering guarantees ... sort at materialization points only')."""

    __slots__ = ("sdf", "index_spark_col", "index_name", "order_spec", "row_tokens")

    def __init__(
        self,
        sdf: SparkDataFrame,
        index_spark_col: str,
        index_name: Any = None,
        order_spec: tuple[tuple[str, bool], ...] | None = None,
        row_tokens: "frozenset | None" = None,
    ):
        self.sdf = sdf
        self.index_spark_col = index_spark_col
        self.index_name = index_name
        self.order_spec = order_spec
        # row-identity lineage: a row-preserving derivation (shift/cumsum/
        # where/... — 1 row in, 1 row out, helper columns copied through)
        # passes its source's tokens, so aligners can recognize "these two
        # operands are the SAME rows" and join on the order-spec helper
        # columns under duplicate index labels (r12 probe batch 4). Equal
        # spec NAMES alone are not a lineage proof: two independent
        # sort_values results share helper names but not values.
        self.row_tokens = row_tokens if row_tokens is not None else frozenset((object(),))

    @property
    def index_col(self) -> Column:
        return self.sdf[self.index_spark_col]

    def order_columns(self, default_col: str) -> list[Column]:
        spec = self.order_spec or ((default_col, True),)
        return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in spec]

    # ------------------------------------------------------------------
    @staticmethod
    def from_local(
        data: Iterable,
        index: Iterable | None,
        spark: SparkSession | None,
        data_name: str = "__value__",
    ) -> tuple["InternalFrame", str]:
        """Build an anchor from driver-local data with an explicit schema via
        pandas/Arrow — one createDataFrame call, no RDD round trip, no
        inference jobs (the reference ran take(1)/zipWithIndex jobs during
        construction, ``data_prep.py:50-95``)."""
        import numpy as np
        import pandas as pd

        spark = spark or default_session()

        from collections.abc import Mapping as _Mapping

        if isinstance(data, _Mapping):
            # pandas: dict keys become the index; an explicit index
            # REINDEXES by label (missing labels -> NaN), it does not
            # relabel positionally (r14 probe: the dict ctor previously
            # took the keys as the VALUES)
            data = pd.Series(data)
            if index is not None:
                data = data.reindex(list(index))
                index = None
        if isinstance(data, pd.Series):
            if index is None:
                index = data.index.to_numpy()
            data = data.to_numpy()
        if isinstance(data, np.ndarray):
            data = data.tolist()
        elif isinstance(data, range):
            data = list(data)
        elif not isinstance(data, (list, tuple)):
            data = list(data)

        if index is None:
            index_values = np.arange(len(data))
        else:
            if isinstance(index, pd.Index):
                index = index.to_numpy()
            index_values = np.asarray(list(index) if not isinstance(index, np.ndarray) else index)
            if len(index_values) != len(data):
                raise ValueError(
                    f"index length {len(index_values)} != data length {len(data)}"
                )

        pdf = pd.DataFrame({INDEX_COL: index_values, data_name: data})
        # pandas preserves CONSTRUCTION order; a non-monotonic explicit
        # index would otherwise display index-sorted AND feed positional
        # ops the wrong row order (r11 probe 5 — see DataFrame.__init__).
        # Monotonic-with-duplicates also needs the helper: Spark's sort
        # is unstable within equal labels (ADVICE r11).
        try:
            idx = pd.Index(index_values)
            mono = bool(idx.is_monotonic_increasing and idx.is_unique)
        except TypeError:
            mono = False
        spec = None
        if not mono:
            pdf["__ctor__"] = np.arange(len(pdf), dtype="int64")
            spec = (("__ctor__", True),)
        if len(pdf) == 0:
            sdf = devoid(
                spark.createDataFrame(pdf, schema=empty_upload_schema(pdf))
            )
        else:
            sdf = devoid(spark.createDataFrame(pdf))
        return InternalFrame(sdf, INDEX_COL, order_spec=spec), data_name
