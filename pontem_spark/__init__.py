"""pontem-spark: a PySpark-native analytics engine with a pandas-like surface.

A ground-up rebuild of the capability surface of milesgranger/pontem
(a pandas-like Series wrapper over PySpark DataFrames — see SURVEY.md),
re-expressed Catalyst-first, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal columns) the reference
never had.

Layout:
    core/       pandas-like Series / DataFrame / Index over one InternalFrame
    operators/  dedup (exact/minhash/simhash/jaccard/cosine), ANN, as-of join
    sources/    parquet/csv/json readers+writers, test-table loaders
    functions/  Column-expression libraries (text, vector) — no UDFs
    queries/    oracle-checked query registry (the driver contract)
    streaming/  Structured Streaming twins of the batch event queries
    plans/      plan inspection / optimization assertions
"""

from pontem_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
