"""lakeflow — a PySpark-native lakehouse analytics engine.

Re-implements, Spark-first, the capabilities of the reference lakehouse
platform `autoarq-paulo/lakehouse-unimed` (bronze CSV ingestion, silver
cleaning/enrichment, gold analytic views, declarative data-quality
checks, pipeline orchestration) and extends it with the operators a
large-scale LLM-training-data pipeline needs (dedup, similarity search,
text analysis, multimodal column plumbing).

Everything is lazy DataFrames; Catalyst plans and optimizes. No RDDs,
no custom Catalyst rules — the operator surface is plan builders over
`pyspark.sql`.
"""

__version__ = "0.1.0"
