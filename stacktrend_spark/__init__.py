"""stacktrend_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-implementation of the query and
data-processing capabilities of the reference ETL/analytics platform
(sanchitvj/stacktrend): medallion bronze→silver→gold pipelines, keyed
upsert semantics, gold-layer analytic queries, plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session     — tuned SparkSession builders (local + cluster profiles)
    sources     — table loaders, JSON/REST ingestion adapters
    operators   — merge/upsert, dedup, similarity, text, multimodal
    functions   — reusable column-expression families (scores, cleaning)
    plans       — the registered query inventory (Spark fn + SQL oracle)
    pipelines   — the domain bronze→silver→gold pipeline
    streaming   — Structured Streaming variants of the event operators
"""

__version__ = "0.1.0"
