"""wiki_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
ingestion pipeline (``cuiliang16/wiki_data_pipeline``) as idiomatic
Spark DataFrame / SQL operators, extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
    session.py      SparkSession builder tuned for the test harness
    io.py           table readers / writers
    functions/      scalar & array expression helpers (JVM-side first)
    operators/      relational operators (normalize, filters, joins,
                    aggregates, dedup, similarity, windows, multimodal)
    streaming/      incremental semantics (watermark resume, dead-letter,
                    structured streaming jobs, adaptive rate limiter)
    sinks/          one-file-per-record JSON sink (reference K1)
    plans/          query registry: name -> (spark callable, oracle SQL)
"""

__version__ = "0.1.0"
