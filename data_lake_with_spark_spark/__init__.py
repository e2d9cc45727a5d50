"""data_lake_with_spark_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the capabilities of the reference
repo ``rameshlakshman/Data-lake-with-spark`` (a PySpark star-schema data
lake ETL, see ``/root/reference/etl.py``), extended with the relational
query layer and LLM-data-pipeline operators mandated by BASELINE.json:

- ``session``   — SparkSession factory tuned for oracle parity + scale.
- ``catalog``   — testdata table loader (TPC-H-ish star schema + events
                  + documents + embeddings).
- ``etl``       — the reference's ETL surface rebuilt with intended
                  semantics (schema-armed reads, left-anti upsert,
                  builtin time functions instead of Python UDFs).
- ``functions`` — scalar/vector/text helper expressions (JVM-side).
- ``operators`` — dedup (exact/minhash/simhash/ngram/embedding),
                  similarity search, multimodal column plumbing.
- ``plans``     — the named query registry: every query ships both a
                  DataFrame implementation and a DuckDB oracle SQL.
- ``streaming`` — Structured Streaming jobs + batch-window equivalents.
- ``sources``   — readers/writers (explicit schemas, partitioned sinks).

Everything here is public-API PySpark; no custom Catalyst extensions are
required (SURVEY.md §4.2).
"""

__version__ = "0.1.0"
