"""``.str`` and ``.dt`` accessors — pandas' scalar-function namespaces mapped
1:1 to built-in Spark functions (SURVEY §2.G 'string/date/math scalar fns').
Everything stays in WholeStageCodegen; no UDFs."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Python str.isspace()'s exact character set as a Java regex class. Spark's
# trim/ltrim/rtrim strip ONLY U+0020 and Java \s is ASCII-only, but pandas
# .str.strip() (= Python str.strip) also removes \t \n \v \f \r, the file/
# group/record/unit separators 1C-1F, NEL (85), NBSP (A0) and the Unicode
# Zs spaces - enumerated here so both engines agree character-for-character.
_PY_SPACE = (
    "[\\s\u001c-\u001f\u0085\u00a0\u1680"
    "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"
)
# Cased letters (Lu/Ll/Lt): Python str.title() starts a new word after any
# NON-cased character (digits, punctuation, uncased letters), not just
# whitespace like Spark's initcap.
_CASED = "[\\p{Lu}\\p{Ll}\\p{Lt}]"


class StringAccessor:
    def __init__(self, s):
        self._s = s

    def _wrap(self, col: Column):
        from pontem_spark.core.series import Series

        return Series._from_internal(self._s._internal, col, self._s._name)

    def upper(self): return self._wrap(F.upper(self._s._col))
    def lower(self): return self._wrap(F.lower(self._s._col))
    def len(self): return self._wrap(F.length(self._s._col))
    # strip family via _PY_SPACE, not trim: Spark trim removes U+0020 only,
    # pandas removes every Python-isspace character
    def strip(self):
        return self._wrap(
            F.regexp_replace(self._s._col, f"^{_PY_SPACE}+|{_PY_SPACE}+$", "")
        )

    def lstrip(self):
        return self._wrap(F.regexp_replace(self._s._col, f"^{_PY_SPACE}+", ""))

    def rstrip(self):
        return self._wrap(F.regexp_replace(self._s._col, f"{_PY_SPACE}+$", ""))

    def title(self):
        """Python/pandas title semantics: a cased letter is uppercased when
        the PREVIOUS character is not cased (start, digit, punctuation, any
        whitespace), lowercased otherwise — ``'foo-bar'`` → ``'Foo-Bar'``,
        ``'3rd'`` → ``'3Rd'``. Spark's initcap only breaks on whitespace and
        leaves mid-word capitals, so it is wrong for both. Per-character
        transform (interpreted, not codegen) — an API accessor, not a
        hot-path operator. Known divergence: characters whose Python
        TITLECASE mapping differs from their uppercase mapping (ß → 'Ss' in
        Python, 'SS' here; the Lt digraphs ǅ ǈ ǋ ǲ)."""
        col = self._s._col
        chars = F.split(col, "")
        out = F.concat_ws(
            "",
            F.transform(
                chars,
                lambda ch, i: F.when(~ch.rlike(_CASED), ch)
                .when(
                    (i == F.lit(0)) | ~F.get(chars, i - 1).rlike(_CASED),
                    F.upper(ch),
                )
                .otherwise(F.lower(ch)),
            ),
        )
        # concat_ws maps a NULL array to '' — keep pandas' NaN-in NaN-out
        return self._wrap(F.when(col.isNull(), F.lit(None)).otherwise(out))

    def contains(self, pat: str, regex: bool = True):
        col = self._s._col.rlike(pat) if regex else self._s._col.contains(pat)
        return self._wrap(col)

    def startswith(self, pat: str): return self._wrap(self._s._col.startswith(pat))
    def endswith(self, pat: str): return self._wrap(self._s._col.endswith(pat))

    def replace(self, pat: str, repl: str, regex: bool = True):
        if regex:
            return self._wrap(F.regexp_replace(self._s._col, pat, repl))
        return self._wrap(F.replace(self._s._col, F.lit(pat), F.lit(repl)))

    def slice(self, start: int = 0, stop: int | None = None):
        # full Python slice semantics incl. NEGATIVE bounds (pandas
        # str.slice); the old positive-only form returned '' for any
        # negative stop. Bounds are clamped per-row against the length.
        col = self._s._col
        n = F.length(col)
        s_eff = (
            F.least(F.lit(start), n)
            if start >= 0
            else F.greatest(n + F.lit(start), F.lit(0))
        )
        if stop is None:
            e_eff = n
        elif stop >= 0:
            e_eff = F.least(F.lit(stop), n)
        else:
            e_eff = F.greatest(n + F.lit(stop), F.lit(0))
        ln = F.greatest(e_eff - s_eff, F.lit(0))
        return self._wrap(F.substring(col, s_eff + 1, ln))

    def split(self, pat: str | None = None):
        """No-arg form is Python ``str.split()``: split on runs of ANY
        Python-isspace character with no empty tokens — leading/trailing
        whitespace is dropped and an empty/whitespace-only string yields []
        (Spark's regex split instead keeps '' edge tokens). With an explicit
        ``pat`` the pattern is a Java regex, like pandas' regex=True."""
        col = self._s._col
        if pat is None:
            stripped = F.regexp_replace(col, f"^{_PY_SPACE}+|{_PY_SPACE}+$", "")
            out = F.when(
                stripped == "", F.array().cast("array<string>")
            ).otherwise(F.split(stripped, f"{_PY_SPACE}+"))
            return self._wrap(out)
        return self._wrap(F.split(col, pat))

    def cat(self, others=None, sep: str = ""):
        """With ``others``: elementwise concat (Series result). Without:
        pandas collapses the whole Series to ONE string in index order —
        returned as a Python str (an index-ordered aggregate via sorted
        collect_list; inherently a driver-sized result)."""
        if others is None:
            from pontem_spark.core.internal import INDEX_COL

            row = (
                self._s._materialized()
                .select(F.struct(F.col(INDEX_COL), F.col("__value__")).alias("p"))
                .agg(F.array_sort(F.collect_list("p")).alias("ps"))
                .select(
                    F.array_join(F.expr("transform(ps, s -> s.__value__)"), sep).alias("out")
                )
                .first()
            )
            return row["out"]
        return self._wrap(F.concat_ws(sep, self._s._col, others._col))

    def _pad_no_truncate(self, width: int, fillchar: str):
        # pandas pads but NEVER truncates; Spark's lpad cuts strings longer
        # than the width down to it
        col = self._s._col
        return F.when(F.length(col) >= width, col).otherwise(
            F.lpad(col, width, fillchar)
        )

    def capitalize(self):
        # Python semantics: first char upper, REST lower ('hELLO' → 'Hello').
        # Divergence: Python TITLEcases the first char ('ß' → 'Ss'); Spark
        # SQL has no titlecase function, so the JVM uppercase is used
        # ('ß' → 'SS') — differs only on the handful of chars whose title
        # and upper forms differ (ß, ǆ-family digraphs)
        col = self._s._col
        return self._wrap(
            F.concat(
                F.upper(F.substring(col, 1, 1)),
                F.lower(F.substring(col, 2, 2147483646)),
            )
        )

    def count(self, pat: str):
        """Occurrences of regex ``pat`` per string (pandas counts
        non-overlapping regex matches)."""
        return self._wrap(F.regexp_count(self._s._col, F.lit(pat)))

    def find(self, sub: str):
        """Lowest 0-based index of ``sub``, -1 when absent (instr is
        1-based with 0-absent, so the -1 shift gives both for free)."""
        return self._wrap(F.instr(self._s._col, sub) - 1)

    def get(self, i: int):
        """i-th character (negative from the end); out-of-bounds → missing,
        like pandas."""
        col = self._s._col
        if i >= 0:
            return self._wrap(
                F.when(F.length(col) > i, F.substring(col, i + 1, 1))
            )
        return self._wrap(
            F.when(
                F.length(col) >= -i,
                col.substr(F.length(col) + i + 1, F.lit(1)),
            )
        )

    def repeat(self, n: int):
        return self._wrap(F.repeat(self._s._col, n))

    def swapcase(self):
        # no JVM builtin: per-char fold — uppercase letters (char equals its
        # upper form but not its lower form) go lower, cased lowers go
        # upper, uncased chars pass through
        def flip(c):
            return (
                F.when((c == F.upper(c)) & (c != F.lower(c)), F.lower(c))
                .when((c == F.lower(c)) & (c != F.upper(c)), F.upper(c))
                .otherwise(c)
            )

        return self._wrap(
            F.array_join(F.transform(F.split(self._s._col, ""), flip), "")
        )

    def removeprefix(self, prefix: str):
        col = self._s._col
        return self._wrap(
            F.when(
                col.startswith(prefix), F.substring(col, len(prefix) + 1, 2147483646)
            ).otherwise(col)
        )

    def removesuffix(self, suffix: str):
        col = self._s._col
        return self._wrap(
            F.when(
                col.endswith(suffix) & (F.length(col) >= len(suffix)),
                F.substring(col, 1, F.length(col) - len(suffix)),
            ).otherwise(col)
        )

    def extract(self, pat: str, expand: bool = False):
        """Regex group extraction. One group → Series (NULL on no-match,
        where Spark's regexp_extract would give ''); several groups → a
        DataFrame with one column per group (named groups keep their
        names, else '0','1',...), all from the SAME anchor — pure
        projections, zero jobs."""
        import re

        compiled = re.compile(pat)
        col = self._s._col
        matched = col.rlike(pat)

        def grp(i: int):
            return F.when(matched, F.regexp_extract(col, pat, i))

        if compiled.groups <= 1 and not expand:
            return self._wrap(grp(1 if compiled.groups else 0))
        from pontem_spark.core.frame import DataFrame

        by_pos = {v: k for k, v in compiled.groupindex.items()}
        names = [by_pos.get(i + 1, str(i)) for i in range(compiled.groups)]
        return DataFrame._from_internal(
            self._s._internal, {n: grp(i + 1) for i, n in enumerate(names)}
        )

    def findall(self, pat: str):
        """All matches per row as an array (python re.findall: with one
        group, the group's text; several groups are tuples, which have no
        columnar shape — raise)."""
        import re

        groups = re.compile(pat).groups
        if groups > 1:
            raise ValueError(
                "findall with multiple groups returns tuples — use extract"
            )
        return self._wrap(
            F.regexp_extract_all(self._s._col, F.lit(pat), F.lit(1 if groups else 0))
        )

    def casefold(self):
        """Aggressive lowercase for caseless matching. JVM exposes no true
        casefold table, so this is lower() — identical on every cased
        script, divergent only on the handful of expanding foldings
        (ß→ss, ﬁ→fi)."""
        return self._wrap(F.lower(self._s._col))

    def partition(self, sep: str = " "):
        """3-column DataFrame (before, sep, after) split at the FIRST
        occurrence; no occurrence → (whole, '', ''). Columns named
        '0','1','2' (pandas uses int labels); same anchor, zero jobs."""
        from pontem_spark.core.frame import DataFrame

        col = self._s._col
        pos = F.instr(col, sep)
        hit = pos > 0
        present = col.isNotNull()
        cols = {
            "0": F.when(present, F.when(hit, col.substr(F.lit(1), pos - 1)).otherwise(col)),
            "1": F.when(present, F.when(hit, F.lit(sep)).otherwise(F.lit(""))),
            "2": F.when(
                present,
                F.when(
                    hit, col.substr(pos + len(sep), F.length(col))
                ).otherwise(F.lit("")),
            ),
        }
        return DataFrame._from_internal(self._s._internal, cols)

    def ljust(self, width: int, fillchar: str = " "):
        col = self._s._col
        return self._wrap(
            F.when(F.length(col) >= width, col).otherwise(F.rpad(col, width, fillchar))
        )

    def rjust(self, width: int, fillchar: str = " "):
        return self._wrap(self._pad_no_truncate(width, fillchar))

    def center(self, width: int, fillchar: str = " "):
        # CPython str.center's exact (and surprising) split: left =
        # marg//2 + (marg & width & 1) — the odd spare char goes LEFT when
        # the target width is odd, RIGHT when even (probe-verified against
        # pandas). lpad/rpad need int widths, so the variable-length pads
        # are substrings of a width-long fill literal via Column.substr.
        col = self._s._col
        pad = F.lit(fillchar * max(width, 1))
        marg = F.lit(width) - F.length(col)
        left_n = (F.floor(marg / 2) + (marg % 2) * (width % 2)).cast("int")
        right_n = (marg - left_n).cast("int")
        return self._wrap(
            F.when(F.length(col) >= width, col).otherwise(
                F.concat(
                    pad.substr(F.lit(1), left_n), col, pad.substr(F.lit(1), right_n)
                )
            )
        )

    def isdigit(self):
        return self._wrap(
            F.when(self._s._col.isNotNull(), self._s._col.rlike(r"^\p{Nd}+$"))
        )

    def isalpha(self):
        return self._wrap(
            F.when(self._s._col.isNotNull(), self._s._col.rlike(r"^\p{L}+$"))
        )

    def isalnum(self):
        return self._wrap(
            F.when(self._s._col.isNotNull(), self._s._col.rlike(r"^[\p{L}\p{Nd}]+$"))
        )

    def isspace(self):
        return self._wrap(
            F.when(self._s._col.isNotNull(), self._s._col.rlike(r"^\s+$"))
        )

    def islower(self):
        # Python: ≥1 cased char and every cased char lowercase
        col = self._s._col
        return self._wrap(
            F.when(col.isNotNull(), (col == F.lower(col)) & (col != F.upper(col)))
        )

    def isupper(self):
        col = self._s._col
        return self._wrap(
            F.when(col.isNotNull(), (col == F.upper(col)) & (col != F.lower(col)))
        )

    def zfill(self, width: int):
        # pandas zfill is sign-aware: '-1'.zfill(4) == '-001', '+2' → '+002'
        # — the sign char stays first and zeros pad the remainder to
        # width-1. A plain lpad would give '00-1'. Still never truncates.
        col = self._s._col
        signed = F.when(F.length(col) >= width, col).otherwise(
            F.concat(
                F.substring(col, 1, 1),
                F.lpad(F.substring(col, 2, 2147483646), width - 1, "0"),
            )
        )
        return self._wrap(
            F.when(col.rlike(r"^[+-]"), signed).otherwise(
                self._pad_no_truncate(width, "0")
            )
        )

    def pad(self, width: int, fillchar: str = " "):
        return self._wrap(self._pad_no_truncate(width, fillchar))


class DatetimeAccessor:
    def __init__(self, s):
        self._s = s

    def _wrap(self, col: Column):
        from pontem_spark.core.series import Series

        return Series._from_internal(self._s._internal, col, self._s._name)

    @property
    def year(self): return self._wrap(F.year(self._s._col))
    @property
    def month(self): return self._wrap(F.month(self._s._col))
    @property
    def day(self): return self._wrap(F.dayofmonth(self._s._col))
    @property
    def hour(self): return self._wrap(F.hour(self._s._col))
    @property
    def minute(self): return self._wrap(F.minute(self._s._col))
    @property
    def second(self): return self._wrap(F.second(self._s._col))
    @property
    def dayofweek(self):  # pandas: Monday=0
        return self._wrap((F.dayofweek(self._s._col) + 5) % 7)
    @property
    def dayofyear(self): return self._wrap(F.dayofyear(self._s._col))
    @property
    def quarter(self): return self._wrap(F.quarter(self._s._col))
    @property
    def date(self): return self._wrap(F.to_date(self._s._col))

    @property
    def weekday(self):  # pandas alias of dayofweek, Monday=0
        return self.dayofweek

    @property
    def week(self):  # ISO week number, pandas .dt.isocalendar().week twin
        return self._wrap(F.weekofyear(self._s._col))

    @property
    def days_in_month(self):
        return self._wrap(F.dayofmonth(F.last_day(self._s._col)))

    def _pred(self, col: Column):
        # pandas dt.is_* predicates are FALSE on NaT, not missing (r8
        # probe) — the one dt family where missing does not propagate
        return self._wrap(F.coalesce(col, F.lit(False)))

    @property
    def is_month_start(self):
        return self._pred(F.dayofmonth(self._s._col) == 1)

    @property
    def is_month_end(self):
        return self._pred(F.to_date(self._s._col) == F.last_day(self._s._col))

    @property
    def is_year_start(self):
        return self._pred(F.dayofyear(self._s._col) == 1)

    @property
    def is_year_end(self):
        return self._pred((F.month(self._s._col) == 12) & (F.dayofmonth(self._s._col) == 31))

    @property
    def is_quarter_start(self):
        return self._pred(
            (F.dayofmonth(self._s._col) == 1) & (F.month(self._s._col) % 3 == 1)
        )

    @property
    def is_quarter_end(self):
        return self._pred(
            (F.to_date(self._s._col) == F.last_day(self._s._col))
            & (F.month(self._s._col) % 3 == 0)
        )

    @property
    def is_leap_year(self):
        y = F.year(self._s._col)
        return self._pred(
            ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
        )

    def day_name(self):
        # Java 'EEEE' pattern — English locale, matching pandas' default
        return self._wrap(F.date_format(self._s._col, "EEEE"))

    def month_name(self):
        return self._wrap(F.date_format(self._s._col, "MMMM"))

    _FREQ_SECONDS = {"d": 86400, "h": 3600, "t": 60, "min": 60, "s": 1}

    def _freq_seconds(self, freq: str) -> int:
        u = self._FREQ_SECONDS.get(freq.lower())
        if u is None:
            raise ValueError(f"dt: unsupported freq {freq!r}")
        return u

    def ceil(self, freq: str):
        """Round UP to the unit boundary (whole-second units)."""
        u = self._freq_seconds(freq)
        secs = F.unix_timestamp(self._s._col)
        return self._wrap(F.timestamp_seconds(F.ceil(secs / u).cast("long") * u))

    def round(self, freq: str):
        """Round to the nearest unit boundary — pandas rounds HALF-EVEN
        (banker's) at exact midpoints, which bround reproduces."""
        u = self._freq_seconds(freq)
        secs = F.unix_timestamp(self._s._col)
        return self._wrap(F.timestamp_seconds(F.bround(secs / u, 0).cast("long") * u))

    def floor(self, freq: str):
        # pandas 2.x freq aliases are lowercase ('h', 'min', 's'; 'H'/'T'
        # deprecated but still seen) — map BOTH cases onto date_trunc units;
        # an unknown freq must raise, not silently date_trunc to NULL (the
        # r7 probe found floor('h') returning all-NaT)
        unit = {
            "d": "day", "day": "day",
            "h": "hour", "hour": "hour",
            "t": "minute", "min": "minute", "minute": "minute",
            "s": "second", "second": "second",
            "w": "week", "week": "week",
        }.get(freq.lower())
        if unit is None:
            raise ValueError(f"dt.floor: unsupported freq {freq!r}")
        return self._wrap(F.date_trunc(unit, self._s._col))

    def normalize(self):
        """Midnight of each timestamp's day (pandas dt.normalize) — keeps
        the timestamp type, unlike ``date``."""
        return self._wrap(F.date_trunc("day", self._s._col))

    @property
    def days(self):
        """Whole-day component of a timedelta Series (timestamp
        subtraction yields Spark's day-time interval): floored like
        pandas' Timedelta.days, so -1 second → -1 days."""
        secs = self._s._col.cast("long")  # day-time interval → total seconds
        return self._wrap(F.floor(secs / F.lit(86400.0)).cast("long"))

    def strftime(self, fmt: str):
        # translate the common strftime directives to Spark's pattern letters
        spark_fmt = (
            fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
            .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
        )
        return self._wrap(F.date_format(self._s._col, spark_fmt))
