"""Index view onto a Series/DataFrame's index column.

The reference's RangeIndex (``pontem/indexes/range_index.py:7-31``) held a
back-pointer + column name and ran two full jobs (min/max of the VALUES —
a bug) per ``__repr__``. This Index is a zero-job metadata view; statistics
are explicit methods.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pontem_spark.core.internal import INDEX_COL, InternalFrame


class Index:
    def __init__(self, owner):
        self._owner = owner

    @property
    def name(self):
        return self._owner._internal.index_name

    @name.setter
    def name(self, value) -> None:
        # metadata-only rename: zero jobs, zero plan changes
        self._owner._internal = InternalFrame(
            self._owner._internal.sdf, self._owner._internal.index_spark_col, value
        )

    def to_series(self):
        from pontem_spark.core.series import Series

        internal = self._owner._internal
        return Series._from_internal(internal, internal.index_col, self.name)

    def min(self):
        internal = self._owner._internal
        return internal.sdf.select(F.min(internal.index_col)).first()[0]

    def max(self):
        internal = self._owner._internal
        return internal.sdf.select(F.max(internal.index_col)).first()[0]

    def __repr__(self) -> str:  # metadata only — no jobs
        return f"Index(name={self.name!r}, column={self._owner._internal.index_spark_col!r}, lazy)"
