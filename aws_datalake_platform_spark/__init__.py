"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference data-lake platform
(AhmadElAmine123/aws-datalake-platform), re-expressed Spark-first.

Layout:
  session     - tuned SparkSession factory (local + cluster-ready configs)
  catalog     - authoritative StructType schemas + table registration
  validation  - Great-Expectations-style validator (single fused agg pass)
  functions/  - scalar/column expression helpers (JVM-side, codegen-friendly)
  sources/    - readers + seeded synthetic generators + HTTP source adapter
  operators/  - dedup, similarity search, text analysis, as-of/range joins,
                multimodal column plumbing, lake maintenance (compaction,
                merge upsert, partition retention, Z-order)
  pipelines/  - reference-parity raw->curated transforms (weather, IoT)
  streaming/  - Structured Streaming ingest + windowed aggregations
  observability - per-job metrics capture + alarm predicates
  orchestration - rate/cron batch + stream trigger runner
"""

__version__ = "0.1.0"
