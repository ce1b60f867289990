"""PySpark-native analytics engine with the query/data-processing
capabilities of NIH-NLM/cell-kn-mvp-etl-results, re-expressed Spark-first.

The reference (at /root/reference) is an ETL + graph-query system:
CSV/JSON/OWL ingestion -> semantic tuples -> property graph -> k-hop
typed-path queries (SURVEY.md). This package re-implements every operator
in the reference's inventory (SURVEY.md section 2) as declarative
DataFrame/SQL plans that Catalyst can optimize, plus the
large-scale-training-data operators (dedup, similarity search,
multimodal plumbing, text analysis) the reference lacks.

Layout:
  session     SparkSession factory tuned for the target scale
  sources     parquet/CSV/JSON readers for the star schema + tuples IR
  functions   scalar expression library (column-in/column-out, JVM-side)
  operators   reusable relational/graph/dedup/similarity/text operators
  plans       the query registry: name -> (Spark builder, DuckDB oracle)
  streaming   Structured Streaming surfaces (incremental/windowed)
"""

__version__ = "0.1.0"
