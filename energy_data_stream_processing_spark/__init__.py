"""energy_data_stream_processing_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference pipeline ``sejalv/energy-data-stream-processing`` (file->Kafka
producer, Kafka->Postgres consumer with an in-memory hourly aggregator, SQL
views, and Grafana dashboard SQL), re-expressed Spark-first:

- ingestion/validation as declarative DataFrame transforms (reference:
  producer/producer.py:41-67, consumer/consumer.py:102-123);
- the streaming hourly aggregator as ``groupBy(window(...))`` /
  ``date_trunc('hour')`` aggregations (reference: consumer/consumer.py:240-293);
- every SQL view / dashboard query shape as a catalog of named queries
  (reference: database/schema.sql:64-147,
  monitoring/grafana/dashboards/business-metrics.json);
- plus large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) that the 100 TB design target needs.

Nothing here is a port of the reference's imperative execution machinery:
plans are declared via the DataFrame/SQL API and Catalyst picks the physical
strategy. Python UDFs are kept off the hot path (the whole reference surface
is expressible in built-in functions — see SURVEY.md §2.6).
"""

__version__ = "0.1.0"
