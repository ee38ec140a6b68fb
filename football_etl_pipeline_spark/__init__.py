"""PySpark-native analytics engine with the query and data-processing
capabilities of GrigoryMelnikov/Football-ETL-Pipeline, rebuilt Spark-first.

Subpackages
-----------
- ``session``   : SparkSession factory tuned for local[N] testing but
                  configured the way a large cluster job would be (AQE,
                  adaptive skew join, Arrow, UTC).
- ``sources``   : readers/writers — testdata catalog, raw-JSON landing
                  zone with partition discovery, dead-letter sink.
- ``functions`` : reusable column expressions (season derivation, text
                  statistics, deterministic hashes, vector math).
- ``operators`` : DataFrame-in/DataFrame-out query operators — the
                  relational surface (scans, joins, aggs, windows, set
                  ops) plus LLM-data-pipeline operators (dedup,
                  similarity search, text analysis, multimodal).
- ``plans``     : composed ETL plans — the reference-parity
                  ingest → normalize → join → validate → load pipeline
                  with a dead-letter channel.
- ``streaming`` : Structured Streaming variants (windowed event
                  aggregation with watermarks, streaming dead-letter).
"""

__version__ = "0.1.0"
