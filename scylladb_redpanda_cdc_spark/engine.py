"""User-facing engine facade.

A user of the reference pipeline interacts with three surfaces: CQL-ish SQL
over named tables (reference README.md:96-114), a consumed change stream
(README.md:215), and the materialized current state. :class:`Engine` binds
all three to one SparkSession:

    eng = Engine.connect(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT count(*) FROM orders").show()     # ANSI SQL over tables
    eng.query("flagship_cdc_materialize").show()      # any registry operator
    state = eng.materialize(eng.changelog())          # CDC -> current state

Every method returns plain DataFrames — compose freely with the DataFrame
API. ``streaming=True`` sessions enable the RocksDB state store, the
disk-backed provider that keeps large streaming state (S5/S7/S9/S11) off
the executor heap at production volumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from scylladb_redpanda_cdc_spark.operators.cdc import materialize_latest
from scylladb_redpanda_cdc_spark.schemas import TABLE_NAMES
from scylladb_redpanda_cdc_spark.session import get_session
from scylladb_redpanda_cdc_spark.sources.changelog import synth_changelog
from scylladb_redpanda_cdc_spark.sources.tables import load_table


class Engine:
    """One session + one dataset directory, all engine surfaces attached."""

    #: Temp views are SESSION-global while engines are per-dataset: the
    #: session object carries a ``_sg_views_sf_dir`` attribute recording
    #: which engine's sf_dir its views currently point at, so a second
    #: engine on the same session cannot silently serve the first engine's
    #: ``sql()`` from the wrong dataset. Tagging the session OBJECT (not a
    #: class dict keyed by id(), not applicationId) gets all three
    #: properties at once: ``spark.newSession()`` siblings share an
    #: applicationId but have their own empty temp-view catalog (so
    #: app-level state is wrong), CPython reuses ids after GC (so an
    #: id-keyed dict can false-hit a new session), and an attribute dies
    #: with its session (no unbounded growth).
    _VIEWS_ATTR = "_sg_views_sf_dir"

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    @classmethod
    def connect(
        cls,
        sf_dir: str,
        app_name: str = "scylladb-redpanda-cdc-spark",
        streaming: bool = False,
    ) -> "Engine":
        spark = get_session(app_name)
        if streaming:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        return cls(spark, sf_dir)

    # -- tables & SQL -------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        """Expose every dataset table as a temp view for ``sql()``."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)
        setattr(self.spark, Engine._VIEWS_ATTR, self.sf_dir)

    def sql(self, query: str) -> DataFrame:
        if getattr(self.spark, Engine._VIEWS_ATTR, None) != self.sf_dir:
            self.register_views()
        return self.spark.sql(query)

    # -- registry ----------------------------------------------------------
    def query(self, qid: str) -> DataFrame:
        """Run any SURVEY.md §2 operator by ID."""
        from scylladb_redpanda_cdc_spark.plans import registry

        return registry()[qid].build(self.spark, self.sf_dir)

    def query_ids(self) -> list[str]:
        from scylladb_redpanda_cdc_spark.plans import registry

        return sorted(registry())

    # -- CDC ---------------------------------------------------------------
    def changelog(self) -> DataFrame:
        """The SF-scalable synthesized CDC log over ``orders``."""
        return synth_changelog(self.spark, self.sf_dir)

    def materialize(
        self, changes: DataFrame, key_cols: list[str] | None = None
    ) -> DataFrame:
        """Change log -> current state (offset-authoritative, tombstones
        dropped) — the engine's core semantic (SURVEY.md A6/A10/A11)."""
        return materialize_latest(
            changes, key_cols or ["customer_id", "order_id"]
        )

    # -- migration ---------------------------------------------------------
    @staticmethod
    def schema_from_cql(ddl: str):
        """CQL ``CREATE TABLE`` -> (ParsedTable, Spark StructType): the
        migration entry point for a reference user bringing CQL DDL
        (A26, sources/cql_ddl.py). Unsupported constructs raise rather
        than mis-parse."""
        from scylladb_redpanda_cdc_spark.sources.cql_ddl import parse_create_table

        pt = parse_create_table(ddl)
        return pt, pt.spark_schema()
