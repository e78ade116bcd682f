"""Round-6 (continued): corpus curation, mergeable sketches, and pandas tails.

Everything here is a north-star LLM-pipeline extension — the reference has
none of this surface (SURVEY §2.G); each query pairs a Spark-first
implementation with a DuckDB oracle that replays the same rule exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pontem_spark.queries.registry import register
from pontem_spark.sources.tables import load_table

# the window-list expression both engines share for boilerplate removal:
# non-overlapping 5-word chunks, last chunk may be short
_WIN_LIST = (
    "[array_to_string(string_split(text,' ')[(i-1)*5+1:i*5],' ') "
    "for i in generate_series(1, CAST(ceil(len(string_split(text,' '))/5.0) AS BIGINT))]"
)


@register(
    "q_curation_boilerplate_removal",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, unnest({_WIN_LIST}) AS chunk FROM documents
    ),
    bl AS (
      SELECT coalesce(list(chunk ORDER BY chunk), []) AS b FROM (
        SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 3
      )
    )
    SELECT d.doc_id,
      -- a fully-boilerplate doc becomes '' (Spark's array_join([]) = '';
      -- DuckDB's array_to_string([]) is NULL — align on '')
      coalesce(
        array_to_string(list_filter({_WIN_LIST}, c -> NOT list_contains(bl.b, c)), ' '),
        '') AS clean_text,
      CAST(coalesce(len(list_filter({_WIN_LIST}, c -> list_contains(bl.b, c))), 0)
        AS INTEGER) AS n_removed
    FROM documents d, bl
    """,
    tags=("curation", "dedup", "text", "boilerplate"),
)
def q_curation_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-chunk boilerplate removal (the RefinedWeb/CCNet line filter):
    5-word spans occurring in >3 distinct documents are stripped from every
    document, which is reassembled in place. One shuffle total (the
    chunk document-frequency aggregate — chunks travel, documents don't);
    the frequent set rides a single broadcast array row into a pure
    map-side rebuild (operators/curation.py:remove_boilerplate). The hash
    check proves both engines rebuild every cleaned document byte-equal."""
    from pontem_spark.operators.curation import remove_boilerplate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_boilerplate(docs, id_col="doc_id", text_col="text", window=5, max_doc_freq=3)
