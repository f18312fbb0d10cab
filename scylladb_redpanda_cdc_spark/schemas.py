"""Explicit schemas — the engine never infers on the hot path.

The reference declares schemas twice: statically in CQL DDL
(reference README.md:96-100) and dynamically embedded in every message
(connect-standalone.properties:2-3; the ``schema`` half of every record in
rpk_topic_consume.json). We mirror that discipline with StructType constants:
``from_json(value, ENVELOPE_SCHEMA)`` fails loudly on drift, exactly as Kafka
Connect would (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# CDC envelope (reference rpk_topic_consume.json:3-4)
# ---------------------------------------------------------------------------

#: Kafka record key: the primary-key columns of the source table
#: (reference rpk_topic_consume.json:3; connector.properties:3).
KEY_SCHEMA = StructType(
    [
        StructField("customer_id", IntegerType()),
        StructField("order_id", IntegerType()),
    ]
)

#: The Cell wrapper: non-key columns arrive as ``struct{value}`` so that
#: "column untouched by this change" (cell itself NULL) is distinguishable
#: from "column explicitly set to NULL" (cell present, cell.value NULL) —
#: the three-state null semantics of rpk_topic_consume.json:4
#: (``...orders.product.Cell``). Preserved by schema design (SURVEY.md §4.3).
CELL_SCHEMA = StructType([StructField("value", StringType())])

#: Row image inside before/after (``...orders.Before`` / ``...orders.After``).
ROW_IMAGE_SCHEMA = StructType(
    [
        StructField("customer_id", IntegerType()),
        StructField("order_id", IntegerType()),
        StructField("product", CELL_SCHEMA),
    ]
)

#: Provenance block carried on every event (rpk_topic_consume.json:4).
SOURCE_SCHEMA = StructType(
    [
        StructField("version", StringType()),
        StructField("connector", StringType()),
        StructField("name", StringType()),
        StructField("ts_ms", LongType()),
        StructField("snapshot", StringType()),  # Debezium enum: true|last|false
        StructField("db", StringType()),
        StructField("keyspace_name", StringType()),
        StructField("table_name", StringType()),
        StructField("ts_us", LongType()),
    ]
)

#: Debezium change-event envelope (``...orders.Envelope``,
#: rpk_topic_consume.json:4). ``op``: "c"=insert, "u"=update, "d"=delete
#: (rpk_topic_consume.json:4,52; README.md:166).
ENVELOPE_SCHEMA = StructType(
    [
        StructField("source", SOURCE_SCHEMA),
        StructField("before", ROW_IMAGE_SCHEMA),
        StructField("after", ROW_IMAGE_SCHEMA),
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
        StructField(
            "transaction",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("total_order", LongType()),
                    StructField("data_collection_order", LongType()),
                ]
            ),
        ),
    ]
)

#: The Kafka/Redpanda record frame: exactly the six fields every consumed
#: record carries (rpk_topic_consume.json:2-7) = Spark's Kafka source schema
#: modulo key/value being JSON strings here (JsonConverter,
#: connector.properties:3-4).
RECORD_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("timestamp", LongType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver synthetic star schema (FIXTURES.md §2; parquet footers are ground
# truth — these constants document and validate, loaders still read parquet).
# ---------------------------------------------------------------------------

REGION_SCHEMA = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION_SCHEMA = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER_SCHEMA = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART_SCHEMA = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM_SCHEMA = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

#: All driver tables; DuckDB pre-registers the same names as views.
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
