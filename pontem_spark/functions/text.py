"""Text-analysis column expressions for large-scale corpus processing.

Everything here is a pure ``pyspark.sql.Column`` expression — no Python UDFs —
so the whole pipeline stays inside WholeStageCodegen and scales linearly with
executors. (The reference's only text handling was none at all; its scalar
path was row-at-a-time Python UDFs, ``pontem/series/series.py:219-224`` — the
exact anti-pattern this module exists to avoid.)

Used by queries/text.py and queries/dedup.py; each expression has a direct
ANSI-SQL twin so DuckDB can oracle-check it.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Marker stopwords per language for the n-gram/stopword language-ID heuristic.
# Deliberately tiny + disjoint so the heuristic is deterministic and cheap.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "los", "las", "una", "es"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "les", "des", "une", "est"),
}

EN_STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokenization (trim first so no empty edge tokens)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def n_tokens(text_col: str = "text") -> Column:
    return F.size(tokens(text_col))


def n_alpha_chars(text_col: str = "text") -> Column:
    """Characters excluding whitespace."""
    return F.length(F.regexp_replace(F.col(text_col), r"\s", ""))


def shingles(tokens_col: str, n: int = 3) -> Column:
    """Word n-gram shingles as strings, [] for docs shorter than n tokens.

    1-based ``element_at`` mirrors SQL/DuckDB list indexing exactly so the
    oracle produces identical shingles. Guarded so ``sequence`` never sees a
    descending range.
    """
    parts = ", ".join(f"element_at({tokens_col}, i + {k})" for k in range(n))
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} "
        f"THEN transform(sequence(1, size({tokens_col}) - {n - 1}), i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )


def stopword_count(tokens_col: str, words: tuple[str, ...] = EN_STOPWORDS) -> Column:
    in_list = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({tokens_col}, x -> x in ({in_list})))")


def fingerprint(text_col: str = "text", bits: int = 64) -> Column:
    """Deterministic document fingerprint: first bits/4 hex chars of md5.

    md5 (not xxhash64) because it is byte-identical across Spark, DuckDB,
    and every other engine — the cross-engine dedup contract.
    """
    return F.substring(F.md5(F.col(text_col)), 1, bits // 4)


def lang_counts(tokens_col: str) -> Column:
    """All per-language marker counts in ONE traversal of the token array.

    Lambda higher-order functions run interpreted (outside codegen), so the
    naive form — a CASE whose branches each re-filter the array — costs
    O(languages²) interpreted passes per row (~16 for 4 languages; measured
    8.4 s for the sf0.1 corpus vs ~0.6 s for this form). The marker sets are
    disjoint by construction, so a single ``aggregate`` pass with a per-token
    CASE accumulates every language's count at once. Returns array<int> in
    LANG_MARKERS order."""
    langs = list(LANG_MARKERS)
    zero = "array(" + ", ".join("0" for _ in langs) + ")"
    branches = []
    for idx, lang in enumerate(langs):
        in_list = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        bumped = ", ".join(
            f"acc[{j}] + 1" if j == idx else f"acc[{j}]" for j in range(len(langs))
        )
        branches.append(f"WHEN x IN ({in_list}) THEN array({bumped})")
    return F.expr(
        f"aggregate({tokens_col}, {zero}, (acc, x) -> CASE {' '.join(branches)} ELSE acc END)"
    )


def lang_from_counts(counts_col: str) -> Column:
    """Argmax over a precomputed :func:`lang_counts` array → language code,
    'und' (undetermined) when nothing matches. Ties resolve in LANG_MARKERS
    insertion order (a sequential CASE: each language only needs >= against
    the languages after it) — the oracle SQL encodes the identical CASE.

    Takes the *column name* of a materialized counts array so the expensive
    single-pass count runs once in its own Project; only cheap int
    comparisons repeat inside the CASE."""
    langs = list(LANG_MARKERS)
    counts = {lang: F.element_at(F.col(counts_col), i + 1) for i, lang in enumerate(langs)}
    expr: Column = F.lit("und")
    for idx in range(len(langs) - 1, -1, -1):
        lang = langs[idx]
        cond = counts[lang] > 0
        for later in langs[idx + 1 :]:
            cond = cond & (counts[lang] >= counts[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id(tokens_col: str) -> Column:
    """Heuristic language ID as a single Column (argmax of marker hits).

    Convenience form for one-off use; the hot path (q_text_lang_id)
    materializes :func:`lang_counts` in a separate Project first so the
    array traversal happens once, then applies :func:`lang_from_counts`."""
    langs = list(LANG_MARKERS)
    counts = {lang: stopword_count(tokens_col, words) for lang, words in LANG_MARKERS.items()}
    expr: Column = F.lit("und")
    for idx in range(len(langs) - 1, -1, -1):
        lang = langs[idx]
        cond = counts[lang] > 0
        for later in langs[idx + 1 :]:
            cond = cond & (counts[lang] >= counts[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_oracle_sql(tokens_sql: str) -> str:
    """The DuckDB twin of :func:`lang_id` over a SQL list expression."""

    def cnt(words: tuple[str, ...]) -> str:
        in_list = ", ".join(f"'{w}'" for w in words)
        return f"len(list_filter({tokens_sql}, x -> x in ({in_list})))"

    langs = list(LANG_MARKERS)
    branches = []
    for idx, lang in enumerate(langs):
        conds = [f"{cnt(LANG_MARKERS[lang])} > 0"]
        for later in langs[idx + 1 :]:
            conds.append(f"{cnt(LANG_MARKERS[lang])} >= {cnt(LANG_MARKERS[later])}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"
