"""Python UDTF surface (Spark 4): one input row → many output rows with
arbitrary Python logic. Demonstrated with a text-span splitter — the
UDTF-shaped piece of a document-chunking pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql.functions import udtf, lit, col


@udtf(returnType="chunk_idx int, chunk string, n_chars int")
class ChunkText:
    """Split a document into fixed-size character chunks."""

    def eval(self, doc_id: int, text: str, size: int):
        if text is None:
            return
        for i in range(0, len(text), size):
            chunk = text[i : i + size]
            yield (i // size, chunk, len(chunk))


def test_udtf_chunking(spark, sf_dir):
    from pontem_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    # lateral-join style invocation over a table
    docs.createOrReplaceTempView("docs_sample")
    spark.udtf.register("chunk_text", ChunkText)
    result = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_chars "
        "FROM docs_sample d, LATERAL chunk_text(d.doc_id, d.text, 100) c"
    ).toPandas()
    assert len(result) >= 20
    assert (result["n_chars"] <= 100).all()
    # chunks reassemble: total chunk chars == total text chars
    total_chunks = int(result["n_chars"].sum())
    total_text = int(
        load_table(spark, sf_dir, "documents").limit(20).selectExpr("sum(length(text))").first()[0]
    )
    assert total_chunks == total_text
