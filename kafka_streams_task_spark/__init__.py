"""kafka_streams_task_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Kafka Streams application (``idavkaev/kafka-streams-task``),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for the streaming surface, and Pandas-UDF-backed
operators only where built-ins genuinely can't express the semantics.

Layout:
    schemas        — StructType constants for every entity (reference domain
                     + driver test tables)
    functions/     — scalar/vector functions (geohash, text analysis,
                     similarity math)
    operators/     — relational + pipeline operators (weather pipeline,
                     dedup, similarity search, multimodal)
    sources/       — batch/stream source & sink wrappers (parquet, kafka)
    plans/         — session factory and tuning profiles
    streaming/     — Structured Streaming topologies (changelog tables,
                     stateful aggregation)
"""

__version__ = "0.1.0"
