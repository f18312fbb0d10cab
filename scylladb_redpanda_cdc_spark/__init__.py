"""PySpark-native analytics engine with the query / data-processing
capabilities of the ``kovid-r/scylladb-redpanda-cdc`` CDC pipeline
(reference: a ScyllaDB -> Kafka Connect -> Redpanda change-data-capture
tutorial), re-expressed Spark-first.

The reference is a declarative CDC pipeline: a mutable keyed table whose
changes flow as Debezium-style JSON envelopes over a Kafka topic and are
re-materialized by consumers (reference README.md:17-24, 215). This package
rebuilds that semantic contract — plus the batch-relational, windowed,
streaming and LLM-data-pipeline surface cataloged in SURVEY.md §2 — on the
Spark DataFrame / SQL / Structured Streaming stack.

Entry point: ``Engine`` (engine.py) — tables, ANSI SQL, registry queries,
and CDC materialization on one session.

Layout
------
- ``engine``     user-facing facade: ``Engine.connect(sf_dir).sql(...)``
- ``session``    SparkSession factory (AQE on, UTC, tuned shuffle partitions)
- ``schemas``    explicit StructTypes: CDC envelope + star schema (no inference)
- ``sources``    parquet table loaders, CDC golden fixture, change-log synthesis
- ``operators``  CDC / relational / LLM operator implementations
- ``functions``  scalar-function helpers (vector math, text analysis)
- ``streaming``  Structured Streaming restatement of the pipeline (S1-S11)
- ``plans``      the declarative query registry: every SURVEY.md §2 ID maps to
                 a (Spark builder, DuckDB oracle SQL) pair consumed by
                 ``__spark_entry__.py``
"""

__version__ = "0.1.0"
