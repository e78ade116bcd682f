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

_FOLD_TABLE: tuple[tuple[str, str], list[tuple[str, str]]] | None = None

_TITLE_MAP: str | None = None


def _java_named_groups(pat: str) -> str:
    """Rewrite Python regex named-group syntax to Java's: ``(?P<name>`` →
    ``(?<name>`` and the backreference ``(?P=name)`` → ``\\k<name>``.
    pandas users write the Python spelling; Spark's JVM regex engine
    rejects it with INVALID_PARAMETER_VALUE.PATTERN (r11 probe).

    Not a blind text replace (ADVICE r11): the scanner skips escaped
    characters and the inside of character classes, so a pattern whose
    LITERAL text happens to contain ``(?P<`` (e.g. ``[(?P<]`` or
    ``\\(\\?P<``) keeps its meaning."""
    out: list[str] = []
    i, n = 0, len(pat)
    in_class = False
    while i < n:
        c = pat[i]
        if c == "\\" and i + 1 < n:  # escaped char: copy verbatim
            out.append(pat[i : i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            continue
        if pat.startswith("(?P<", i):
            out.append("(?<")
            i += 4
            continue
        if pat.startswith("(?P=", i):
            j = pat.find(")", i + 4)
            name = pat[i + 4 : j] if j != -1 else ""
            if name and all(ch.isalnum() or ch == "_" for ch in name):
                out.append(f"\\k<{name}>")
                i = j + 1
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _title_map() -> str:
    """str_to_map literal ('ß:Ss,ǆ:ǅ,…') of every BMP char whose Python
    TITLECASE mapping differs from its uppercase mapping (ß→Ss, the Lt
    digraphs ǅǈǋǲ, Georgian — which titles to itself, not Mtavruli).
    Derived from CPython at first use, like ``_fold_table``. ',' and ':'
    are case-invariant so the separators are safe."""
    global _TITLE_MAP
    if _TITLE_MAP is None:
        pairs = []
        for cp in range(0x10000):
            ch = chr(cp)
            t = ch.title()
            if t != ch.upper():
                pairs.append(f"{ch}:{t}")
        _TITLE_MAP = ",".join(pairs)
    return _TITLE_MAP


def _fold_table() -> tuple[tuple[str, str], list[tuple[str, str]]]:
    """Unicode full case folding as (translate-from, translate-to) for the
    1:1 mappings plus an (src, folded) list for the ~100 EXPANDING folds
    (ß→ss, ﬁ→fi, Greek ypogegrammeni combos). Derived from CPython's own
    str.casefold at first use — no hand-maintained table, and it tracks
    whatever Unicode version the running interpreter (= the pandas oracle)
    ships. BMP only: no astral codepoint folds differently from lower()."""
    global _FOLD_TABLE
    if _FOLD_TABLE is None:
        src_1 = []
        dst_1 = []
        expanding = []
        # entries are keyed on the LOWERCASED character: the engine lowers
        # first (JVM), then fixes up, because Unicode guarantees
        # fold(x) == fold(lower(x)). Keying on lowercase also catches the
        # inverted scripts (Cherokee folds lowercase → UPPERCASE, so the
        # fold output must not itself pass through lower()).
        for cp in range(0x10000):
            ch = chr(cp)
            if ch != ch.lower():
                continue
            cf = ch.casefold()
            if cf == ch:
                continue
            if len(cf) == 1:
                src_1.append(ch)
                dst_1.append(cf)
            else:
                expanding.append((ch, cf))
        _FOLD_TABLE = (("".join(src_1), "".join(dst_1)), expanding)
    return _FOLD_TABLE


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
        hot-path operator. Word starts consult the TITLECASE divergence
        map first (r9 probe: ß → 'Ss' like Python, not JVM upper's 'SS';
        the Lt digraphs ǅ ǈ ǋ ǲ; Georgian stays lowercase) — one
        constant-folded str_to_map literal, try_element_at because ANSI
        element_at throws on a missing map key."""
        col = self._s._col
        chars = F.split(col, "")
        tmap = F.str_to_map(F.lit(_title_map()), F.lit(","), F.lit(":"))
        out = F.concat_ws(
            "",
            F.transform(
                chars,
                lambda ch, i: F.when(~ch.rlike(_CASED), ch)
                .when(
                    (i == F.lit(0)) | ~F.get(chars, i - 1).rlike(_CASED),
                    F.coalesce(F.try_element_at(tmap, ch), F.upper(ch)),
                )
                .otherwise(F.lower(ch)),
            ),
        )
        # concat_ws maps a NULL array to '' — keep pandas' NaN-in NaN-out
        return self._wrap(F.when(col.isNull(), F.lit(None)).otherwise(out))

    def contains(self, pat: str, regex: bool = True):
        col = (
            self._s._col.rlike(_java_named_groups(pat))
            if regex
            else self._s._col.contains(pat)
        )
        return self._wrap(col)

    def startswith(self, pat: str): return self._wrap(self._s._col.startswith(pat))
    def endswith(self, pat: str): return self._wrap(self._s._col.endswith(pat))

    def replace(self, pat: str, repl: str, regex: bool = True):
        if regex:
            return self._wrap(
                F.regexp_replace(self._s._col, _java_named_groups(pat), repl)
            )
        return self._wrap(F.replace(self._s._col, F.lit(pat), F.lit(repl)))

    def slice(self, start: "int | None" = 0, stop: int | None = None):
        # full Python slice semantics incl. NEGATIVE bounds (pandas
        # str.slice); the old positive-only form returned '' for any
        # negative stop. Bounds are clamped per-row against the length.
        # start=None means 0, like pandas (r10 probe).
        start = 0 if start is None else start
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
        return self._wrap(F.split(col, _java_named_groups(pat)))

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
        # Python semantics: first char TITLEcased ('ß' → 'Ss', not JVM
        # upper's 'SS' — r9 probe), REST lower ('hELLO' → 'Hello'). The
        # titlecase divergence map is the same str_to_map literal title()
        # uses; try_element_at because ANSI element_at throws on missing
        # map keys.
        col = self._s._col
        head = F.substring(col, 1, 1)
        tmap = F.str_to_map(F.lit(_title_map()), F.lit(","), F.lit(":"))
        return self._wrap(
            F.concat(
                F.coalesce(F.try_element_at(tmap, head), F.upper(head)),
                F.lower(F.substring(col, 2, 2147483646)),
            )
        )

    def count(self, pat: str):
        """Occurrences of regex ``pat`` per string (pandas counts
        non-overlapping regex matches)."""
        return self._wrap(
            F.regexp_count(self._s._col, F.lit(_java_named_groups(pat)))
        )

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
        projections, zero jobs. Python named-group syntax ``(?P<name>``
        is rewritten to Java's ``(?<name>`` before reaching the JVM
        (r11 probe: pandas patterns use the Python spelling and Spark's
        rlike rejects it outright)."""
        import re

        compiled = re.compile(pat)
        jpat = _java_named_groups(pat)
        col = self._s._col
        matched = col.rlike(jpat)

        def grp(i: int):
            return F.when(matched, F.regexp_extract(col, jpat, i))

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
            F.regexp_extract_all(
                self._s._col,
                F.lit(_java_named_groups(pat)),
                F.lit(1 if groups else 0),
            )
        )

    def casefold(self):
        """Python str.casefold parity: full Unicode case folding, not just
        lower(). The JVM exposes no fold function, so: JVM lower() first
        (every ordinary cased letter), then the divergence set — chars
        whose casefold differs from their lowercase form, derived from
        CPython at first use (see ``_fold_table``) — as one ``translate``
        pass for the ~190 1:1 remaps (ς→σ, ſ→s, µ→μ, Cherokee's inverted
        fold) plus a replace chain for the ~100 expanding folds (ß→ss, ŉ,
        Greek iota subscripts). Single projection, still
        WholeStageCodegen — no UDF."""
        # (measured, sf0.1 documents: warm 0.64s vs 0.16s for plain
        # lower() — acceptable for an accessor. A per-row rlike guard that
        # skips the chain on fold-free rows was tried and REVERTED: the
        # bigger CaseWhen expression regressed the same run to 5.4s,
        # consistent with falling out of codegen.)
        (src_1, dst_1), expanding = _fold_table()
        col = F.lower(self._s._col)
        for ch, folded in expanding:
            col = F.replace(col, F.lit(ch), F.lit(folded))
        return self._wrap(F.translate(col, src_1, dst_1))

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

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        """pandas signature: side selects the existing rjust/ljust/center
        forms (r10 probe: the side param was missing)."""
        if side == "left":
            return self._wrap(self._pad_no_truncate(width, fillchar))
        if side == "right":
            return self.ljust(width, fillchar)
        if side == "both":
            return self.center(width, fillchar)
        raise ValueError(f"pad: side must be 'left', 'right' or 'both', got {side!r}")


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
    def microsecond(self):
        # pmod, not %: unix_micros of pre-epoch stamps is negative (r10)
        return self._wrap(
            F.pmod(F.unix_micros(self._s._col), F.lit(1_000_000)).cast("int")
        )
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

    def isocalendar(self):
        """(ISO year, ISO week, ISO day) as a 3-column DataFrame like
        pandas. ISO year = calendar year of this ISO week's Thursday (the
        strftime %G segment — Spark rejects the 'YYYY' pattern letter);
        week = weekofyear; day = Monday-1..Sunday-7 (r10 probe)."""
        from pontem_spark.core.frame import DataFrame

        col = self._s._col
        iso_dow = (F.dayofweek(col) + 5) % 7 + 1
        thursday = F.date_add(F.to_date(col), 4 - iso_dow)
        return DataFrame._from_internal(
            self._s._internal,
            {
                "year": F.year(thursday),
                "week": F.weekofyear(col),
                "day": iso_dow,
            },
        )

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

    _FREQ_SECONDS = {
        "d": 86400, "day": 86400,
        "h": 3600, "hour": 3600,
        "t": 60, "min": 60, "minute": 60,
        "s": 1, "second": 1,
    }

    def _freq_micros(self, freq: str) -> int:
        """Parse a pandas fixed-freq alias, MULTIPLES included ('15min',
        '2h' — r9 probe: pandas accepts them, the engine raised), into
        whole microseconds. Non-fixed freqs ('W', 'M') raise like pandas.
        Micros, not seconds: unix_timestamp truncates sub-second parts,
        which made ceil('s') of 12:00:00.3 stick at :00 instead of :01."""
        import re as _re

        m = _re.fullmatch(r"(\d*)\s*([a-zA-Z]+)", freq.strip())
        u = self._FREQ_SECONDS.get(m.group(2).lower()) if m else None
        if u is None:
            raise ValueError(f"dt: unsupported freq {freq!r}")
        n = int(m.group(1)) if m.group(1) else 1
        if n <= 0:
            raise ValueError(f"dt: unsupported freq {freq!r}")
        return n * u * 1_000_000

    def ceil(self, freq: str):
        """Round UP to the freq boundary (epoch-anchored, like pandas).
        Pure integer math — pmod is floor-mod, so pre-epoch timestamps
        are handled; no double division (micros exceed 2^53 past ~2255)."""
        u = self._freq_micros(freq)
        us = F.unix_micros(self._s._col)
        return self._wrap(F.timestamp_micros(us + F.pmod(-us, F.lit(u))))

    def round(self, freq: str):
        """Round to the nearest freq boundary — pandas rounds HALF-EVEN
        (banker's) at exact midpoints: at r == u/2 the EVEN multiple of
        the freq wins, detected exactly as pmod(base, 2u) == 0."""
        u = self._freq_micros(freq)
        us = F.unix_micros(self._s._col)
        r = F.pmod(us, F.lit(u))
        base = us - r
        up = base + F.lit(u)
        even = F.pmod(base, F.lit(2 * u)) == 0
        out = (
            F.when(r * 2 < u, base)
            .when(r * 2 > u, up)
            .otherwise(F.when(even, base).otherwise(up))
        )
        return self._wrap(F.timestamp_micros(out))

    def floor(self, freq: str):
        """Round DOWN to the freq boundary. 'w'/'week' keeps the
        date_trunc Monday-start path (an extension — pandas floor rejects
        non-fixed freqs); everything else is epoch-anchored integer math
        so multiples ('15min') land on the same grid as pandas."""
        if freq.strip().lower() in ("w", "week"):
            return self._wrap(F.date_trunc("week", self._s._col))
        u = self._freq_micros(freq)
        us = F.unix_micros(self._s._col)
        return self._wrap(F.timestamp_micros(us - F.pmod(us, F.lit(u))))

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

    _STRFTIME = {
        "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd",
        "H": "HH", "I": "hh", "M": "mm", "S": "ss",
        "f": "SSSSSS", "j": "DDD",
        "a": "EEE", "A": "EEEE", "b": "MMM", "B": "MMMM",
        "p": "a",
    }

    def strftime(self, fmt: str):
        """strftime → Spark, by TOKENIZING (r9 probe): plain find-replace
        crashed on untranslated directives (%j) and, worse, literal text
        containing Java pattern letters ('Day: %d' — D, a, y are all
        pattern letters) silently rendered as date fields. Literal runs
        are single-quoted, %% becomes a literal percent, an unmappable
        directive raises instead of leaking to Spark. %V/%G (ISO week /
        ISO year) have NO Spark pattern letter (Spark 3+ rejects
        'ww'/'YYYY'), so they become computed segments — weekofyear() and
        year-of-the-ISO-Thursday — concatenated between date_format
        pieces; a NULL input stays NULL even for literal-only formats."""
        col = self._s._col
        segs: list[Column] = []
        pat: list[str] = []
        lit: list[str] = []

        def flush_lit():
            if lit:
                seg = "".join(lit).replace("'", "''")
                pat.append(f"'{seg}'")
                lit.clear()

        def flush_pat():
            flush_lit()
            if pat:
                segs.append(F.date_format(col, "".join(pat)))
                pat.clear()

        i = 0
        while i < len(fmt):
            ch = fmt[i]
            if ch == "%" and i + 1 < len(fmt):
                d = fmt[i + 1]
                if d == "%":
                    lit.append("%")
                elif d in self._STRFTIME:
                    flush_lit()
                    pat.append(self._STRFTIME[d])
                elif d == "V":
                    flush_pat()
                    segs.append(
                        F.lpad(F.weekofyear(col).cast("string"), 2, "0")
                    )
                elif d == "G":
                    flush_pat()
                    # ISO year = calendar year of this ISO week's Thursday.
                    # format_string, not lpad: Spark's lpad TRUNCATES
                    # strings longer than the target, so a >4-digit or
                    # negative year would render corrupted (r10 ADVICE).
                    iso_dow = (F.dayofweek(col) + 5) % 7 + 1  # Mon=1..Sun=7
                    thursday = F.date_add(F.to_date(col), 4 - iso_dow)
                    segs.append(
                        F.format_string("%04d", F.year(thursday))
                    )
                else:
                    raise ValueError(
                        f"strftime: unsupported directive %{d} (supported: "
                        f"%{' %'.join(sorted(self._STRFTIME))} %G %V and %%)"
                    )
                i += 2
            else:
                lit.append(ch)
                i += 1
        flush_pat()
        if not segs:
            out = F.lit("")
        elif len(segs) == 1:
            out = segs[0]
        else:
            out = F.concat(*segs)
        return self._wrap(F.when(col.isNotNull(), out))
