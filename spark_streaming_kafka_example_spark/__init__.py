"""PySpark-native analytics engine with the capability surface of
``lightbitbird/spark-streaming-kafka-example`` (see SURVEY.md).

The reference is nine Scala Structured-Streaming main()s (Kafka JSON
ingestion -> schema-on-read parse -> flatten -> stream-static join ->
watermarked window aggregation -> filtered alerting -> sinks). This package
re-expresses that surface as a small composable library on the PySpark
DataFrame/SQL/Structured-Streaming API, extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
  engine        SparkSession factory (AQE, UTC, Arrow, shuffle discipline)
  schemas       declared StructTypes (schema-on-read, no inference)
  sources       batch + streaming readers (parquet/csv/json/kafka/socket)
  transforms    parse/flatten/timestamp derivations (SURVEY P1-P13)
  analytics     joins, aggregations, event-time windows (J*, A*, W*, F*)
  functions     UDF surface + text/vector column expressions
  operators     dedup, similarity, as-of, sessionize, multimodal
  plans         named query registry -> __spark_entry__ queries()/oracle_sql()
  streaming     streaming pipelines, sinks, stateful ops (SURVEY S*, K*, T*)
"""

__version__ = "0.1.0"
