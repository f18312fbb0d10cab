"""Group F — scalar function families (SURVEY.md §2.F).

One declared query per family, exercising several functions each. All
expressions are JVM-side builtins (whole-stage codegen; no Python in the
path). Cross-engine float discipline: raw parquet doubles pass through
untouched (bit-identical), folds that must match run left-to-right with a
double accumulator on both engines, and lossy formatting/rounding is applied
only to aggregated or row-bounded outputs (see plans/batch_queries.py
preamble).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.plans import QuerySpec
from scylladb_redpanda_cdc_spark.sources.tables import load_table as _T


def f1_fn_string(spark, sf_dir):
    p = _T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("u_name"),
        F.lower("p_brand").alias("l_brand"),
        F.length("p_name").alias("name_len"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "").alias("devoweled"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
    )


def f2_fn_date(spark, sf_dir):
    """Date/time family incl. the epoch-ms -> timestamp path the envelope
    uses (reference rpk_topic_consume.json:4 ts_ms)."""
    o = _T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    ts = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),  # 1=Sunday..7
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_format(F.date_trunc("month", ts), "yyyy-MM-dd").alias("month_start"),
        F.unix_millis(ts).alias("epoch_ms"),
        F.date_format(F.timestamp_millis(F.unix_millis(ts)), "yyyy-MM-dd HH:mm:ss").alias(
            "roundtrip"
        ),
    )


def f3_fn_math(spark, sf_dir):
    """Math family. Output bounded to customer (150 rows/SF-step) and every
    irrational rounded at 4 — the cross-engine ROUND knife-edge risk scales
    with row count."""
    c = _T(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal - 5000.0).alias("abs_dev"),
        F.ceil(bal).alias("ceil_bal"),
        F.floor(bal).alias("floor_bal"),
        F.round(F.sqrt(F.abs(bal)), 4).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1.0), 4).alias("log_bal"),
        F.pmod(F.col("c_custkey"), F.lit(7)).alias("key_mod7"),
        F.signum(bal - 5000.0).alias("sign_dev"),
        (F.col("c_custkey") * F.col("c_custkey")).alias("key_sq"),
    )


def f4_fn_conditional_cast(spark, sf_dir):
    o = _T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(o.o_totalprice > 300000, "big")
        .when(o.o_totalprice > 100000, "mid")
        .otherwise("small")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        (F.col("o_totalprice").cast("decimal(12,2)") * F.lit(2).cast("decimal(2,0)"))
        .cast("string")
        .alias("price_x2_dec"),
    )


def f5_fn_array(spark, sf_dir):
    """Array family over the embedding vectors. Folds use a DOUBLE
    accumulator left-to-right so Spark and DuckDB produce bit-identical
    sums (float32 -> double promotion is exact)."""
    e = _T(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    acc = lambda a, x: a + x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("n_dims"),
        F.aggregate(emb, F.lit(0.0), acc).alias("emb_sum"),
        F.aggregate(F.zip_with(emb, emb, lambda x, y: x * y), F.lit(0.0), acc).alias(
            "emb_sqsum"
        ),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.size(F.array_distinct(emb)).alias("n_distinct"),
        F.element_at(F.sort_array(emb, asc=False), 1).cast("double").alias("max_dim"),
        F.element_at(F.slice(emb, 1, 3), 2).cast("double").alias("dim2"),
        F.array_contains(F.transform(emb, lambda x: x > 0.5), True).alias("has_big"),
    )


def f6_fn_map(spark, sf_dir):
    """Map family: JSON props -> MapType, exploded to (key, value) rows."""
    ev = _T(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select("event_id", F.explode(m).alias("prop_key", "prop_value"))
        .withColumn("prop_value_int", F.col("prop_value").cast("long"))
    )


def f7_fn_json(spark, sf_dir):
    ev = _T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_absent"),
        F.from_json("props", "map<string,string>").getItem("k").alias("k_map"),
    )


def f8_fn_binary(spark, sf_dir):
    """Binary/codec family: utf-8 encode, base64, hex, md5, bit/octet
    lengths, and a base64 round-trip proof — the wire-format helpers a
    CDC pipeline leans on (the reference's payloads are base64-adjacent
    JSON frames). All map-only expression work; hex is lower()-normalized
    because Spark emits uppercase digits and DuckDB lowercase."""
    p = _T(spark, sf_dir, "part").select("p_partkey", "p_name")
    b = F.encode("p_name", "utf-8")
    return p.select(
        "p_partkey",
        F.base64(b).alias("b64"),
        F.lower(
            F.hex(F.encode(F.substring("p_name", 1, 4), "utf-8"))
        ).alias("hex4"),
        F.md5(b).alias("md5_hex"),
        F.bit_length("p_name").cast("int").alias("n_bits"),
        F.octet_length("p_name").cast("int").alias("n_bytes"),
        (F.decode(F.unbase64(F.base64(b)), "utf-8") == F.col("p_name")).alias(
            "b64_roundtrip_ok"
        ),
    )


_F8_SQL = """SELECT p_partkey,
  base64(encode(p_name)) AS b64,
  lower(hex(encode(substring(p_name, 1, 4)))) AS hex4,
  md5(p_name) AS md5_hex,
  CAST(bit_length(p_name) AS INT) AS n_bits,
  CAST(octet_length(encode(p_name)) AS INT) AS n_bytes,
  decode(from_base64(base64(encode(p_name)))) = p_name AS b64_roundtrip_ok
FROM part"""


def f9_fn_url(spark, sf_dir):
    """URL family: a deterministic URL is CONSTRUCTED from document fields
    (the corpus has no URL column), then Spark's ``parse_url`` must invert
    the construction — host, path, query, and a single query parameter all
    recovered exactly. The oracle doesn't need a URL parser: it rebuilds
    each part from the same fields, so equality proves Spark's parser
    inverts the builder (the web-corpus provenance-normalization step
    every crawl pipeline runs). Map-only expression algebra."""
    d = _T(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("lang"),
        F.lit("&id="),
        F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).cast("long").alias(
            "id_param"
        ),
    )


_F9_SQL = """SELECT doc_id,
  source || '.example.com' AS host,
  '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
  'ref=' || lang || '&id=' || CAST(doc_id AS VARCHAR) AS query,
  lang AS ref_param,
  doc_id AS id_param
FROM documents"""


def f10_fn_bitwise(spark, sf_dir):
    """Bitwise family: the BIT_AND / BIT_OR / BIT_XOR aggregates (the
    bitmap/flag-set algebra behind permission masks and feature flags)
    per brand, plus scalar shifts and negation on the row side. All pure
    int64 algebra — exact everywhere; aggregates are map-side combinable
    (AND/OR/XOR are associative+commutative), so they shuffle one value
    per group like any partial agg."""
    p = _T(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.bit_and("p_size").alias("size_and"),
        F.bit_or("p_size").alias("size_or"),
        F.bit_xor("p_size").alias("size_xor"),
        F.count("*").alias("n"),
        F.sum(F.shiftleft(F.col("p_size"), 2).cast("long")).alias(
            "shl2_sum"
        ),
        F.sum(F.shiftright(F.col("p_size"), 1).cast("long")).alias(
            "shr1_sum"
        ),
    )


_F10_SQL = """SELECT p_brand,
  CAST(BIT_AND(p_size) AS INTEGER) AS size_and,
  CAST(BIT_OR(p_size) AS INTEGER) AS size_or,
  CAST(BIT_XOR(p_size) AS INTEGER) AS size_xor,
  COUNT(*) AS n,
  CAST(SUM(p_size * 4) AS BIGINT) AS shl2_sum,
  CAST(SUM(p_size // 2) AS BIGINT) AS shr1_sum
FROM part GROUP BY p_brand"""


def f11_fn_collation(spark, sf_dir):
    """Spark 4 collation family: grouping and equality under the
    ``UTF8_LCASE`` collation — the engine-level case-insensitivity that
    replaces scattering ``lower()`` into every predicate (and, unlike
    lower(), is locale-correct for non-ASCII in the full collation set).
    A mixed-case column is synthesized deterministically from
    ``c_mktsegment`` (initcap on odd keys, lower on key%3==0), grouped on
    its collated form; per group the output carries a deterministic
    lowercase representative, the count of distinct raw casings folded
    together, and the count of rows matching a collated equality literal.
    The fixture is ASCII, so DuckDB's twin is exact via lower() — the
    documented mapping; the Spark side genuinely exercises the collation
    expression (``collate`` in the grouping key and the comparison).

    Scale: one partial-agg shuffle on the collated key, identical to any
    groupBy — collation changes the comparator, not the shape."""
    c = _T(spark, sf_dir, "customer")
    mixed = (
        F.when(F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment"))
        .when(F.col("c_custkey") % 2 == 1, F.initcap(F.lower("c_mktsegment")))
        .otherwise(F.col("c_mktsegment"))
    )
    t = c.select(mixed.alias("seg"))
    coll = F.collate(F.col("seg"), "UTF8_LCASE")
    return (
        t.groupBy(coll.alias("k"))
        .agg(
            F.lower(F.min("seg")).alias("segment"),
            F.countDistinct("seg").alias("n_casings"),
            F.count("*").alias("n_rows"),
            F.sum(
                (coll == F.lit("building")).cast("long")
            ).alias("n_eq_building"),
        )
        .drop("k")
    )


_F11_SQL = """WITH t AS (
  SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
              WHEN c_custkey % 2 = 1 THEN
                upper(substr(lower(c_mktsegment), 1, 1))
                  || substr(lower(c_mktsegment), 2)
              ELSE c_mktsegment END AS seg
  FROM customer)
SELECT lower(MIN(seg)) AS segment,
  COUNT(DISTINCT seg) AS n_casings,
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN lower(seg) = 'building' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_eq_building
FROM t GROUP BY lower(seg)"""


def f12_fn_try_safe(spark, sf_dir):
    """ANSI-safe ``try_*`` family (Spark 4's error-free arithmetic/cast
    surface — the functions that make ANSI mode deployable: instead of a
    task-killing exception, malformed input yields NULL a downstream
    filter can audit): try_divide (zero divisor), try_multiply (int32
    overflow), try_cast (non-numeric string), try_element_at
    (out-of-range index). Every function is exercised with BOTH a
    failing and a succeeding case, and the NULL/value split is
    data-derived, not constant-folded.

    Scale: map-only row expressions — zero shuffles. The FAILING strata
    are deliberately bounded (the ``l_linenumber = 4 AND l_orderkey %
    64 = 0`` slice for the exception-backed functions): Spark's try_*
    SUCCESS path is whole-stage-codegen'd and vectorized-cheap, but the
    overflow/bad-cast FAILURE path constructs a full SparkException per
    failing row (~15 µs measured — a majority-failing column cost 5.2 s
    at sf0.1 where the same column with a bounded failing stratum costs
    ~0.2 s). That asymmetry is exactly why try_* pipelines are designed
    for rare failures; a validation query expecting malformed-input
    rates near 100% belongs on a pre-filter, not on the exception path.
    try_divide (double /0 → NULL via a branch, no throw) and
    try_element_at (bounds check, no throw) stay full-volume — their
    failure path is as cheap as success."""
    li = _T(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 4)
    fail = (F.col("l_linenumber") == 4) & (F.col("l_orderkey") % 64 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), (F.col("l_linenumber") - 1).cast("double")
        ).alias("safe_div"),
        F.try_multiply(
            F.when(fail, F.lit(2_000_000_000))
            .otherwise(F.lit(100_000))
            .cast("int"),
            F.col("l_linenumber").cast("int"),
        ).alias("safe_mul"),
        F.expr(
            "try_cast(IF(l_linenumber = 4 AND l_orderkey % 64 = 0,"
            " l_returnflag, CAST(l_linenumber AS STRING)) AS int)"
        ).alias("cast_bad"),
        F.expr("try_cast(cast(l_linenumber AS string) AS int)").alias("cast_ok"),
        F.try_element_at(
            F.array(F.col("l_orderkey")), F.col("l_linenumber").cast("int")
        ).alias("elem"),
    )


_F12_SQL = """SELECT l_orderkey, l_linenumber,
  CASE WHEN l_linenumber = 1 THEN NULL
       ELSE l_extendedprice / CAST(l_linenumber - 1 AS DOUBLE) END AS safe_div,
  CASE WHEN l_linenumber = 4 AND l_orderkey % 64 = 0 THEN NULL
       ELSE CAST(100000 * l_linenumber AS INTEGER) END AS safe_mul,
  CASE WHEN l_linenumber = 4 AND l_orderkey % 64 = 0 THEN NULL
       ELSE CAST(l_linenumber AS INTEGER) END AS cast_bad,
  TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS cast_ok,
  CASE WHEN l_linenumber = 1 THEN l_orderkey ELSE NULL END AS elem
FROM lineitem WHERE l_linenumber <= 4"""


def f13_fn_variant(spark, sf_dir):
    """Spark 4 VARIANT type: semi-structured data carried as a typed
    binary variant instead of a string — ``parse_json`` into VARIANT,
    ``variant_get`` typed path extraction (present and absent paths),
    ``schema_of_variant`` introspection, and ``try_parse_json`` absorbing
    planted corruption (every 5th event's props mangled) as NULL instead
    of a task failure. The engine-level replacement for
    string-JSON + get_json_object hot paths (parse once, extract many).

    Scale: map-only; variant parse happens once per row and every
    extraction reads the binary form — no re-parsing per path."""
    e = _T(spark, sf_dir, "events").select("event_id", "props")
    corrupted = F.when(
        F.col("event_id") % 5 == 0, F.concat(F.lit("[["), F.col("props"))
    ).otherwise(F.col("props"))
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k"),
        F.variant_get(v, "$.missing", "long").alias("k_missing"),
        F.schema_of_variant(v).alias("vtype"),
        F.try_parse_json(corrupted).isNotNull().alias("parse_ok"),
    )


_F13_SQL = """SELECT event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
  CAST(NULL AS BIGINT) AS k_missing,
  'OBJECT<k: BIGINT>' AS vtype,
  event_id % 5 <> 0 AS parse_ok
FROM events"""


def f14_fn_interval(spark, sf_dir):
    """Calendar/interval arithmetic family — the month-aware algebra F2's
    day-offset family can't express: ``quarter``/``dayofyear``/ISO
    ``weekofyear`` extraction, ``last_day`` (month-end snap),
    ``add_months`` (end-of-month CLAMPING — Jan 31 + 1 month = Feb 28,
    the semantics plain day addition gets wrong), ``next_day`` (next
    Monday strictly after, the scheduling primitive), ``make_date``
    (fiscal normalization to month start), and timestamp + INTERVAL
    (``timestampadd``). Every output is an exact date/integer — no
    float, no timezone dependence (NTZ source, formatted as text).

    Scale: map-only expression algebra riding the scan, zero shuffles —
    wide date logic stays inside whole-stage codegen."""
    o = _T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    ts = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.quarter(d).cast("long").alias("qtr"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_1mo"),
        F.date_format(F.next_day(d, "Mon"), "yyyy-MM-dd").alias("next_monday"),
        F.date_format(
            F.make_date(F.year(d), F.month(d), F.lit(1)), "yyyy-MM-dd"
        ).alias("month_start"),
        F.date_format(
            F.timestamp_add("HOUR", F.lit(6), ts), "yyyy-MM-dd HH:mm:ss"
        ).alias("plus_6h"),
    )


_F14_SQL = """SELECT o_orderkey,
  quarter(o_orderdate) AS qtr,
  dayofyear(o_orderdate) AS doy,
  week(o_orderdate) AS iso_week,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  strftime(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE), '%Y-%m-%d')
    AS plus_1mo,
  strftime(CAST(o_orderdate AS DATE)
           + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                       ELSE (8 - isodow(o_orderdate)) % 7 END AS INTEGER),
           '%Y-%m-%d') AS next_monday,
  strftime(make_date(CAST(year(o_orderdate) AS BIGINT),
                     CAST(month(o_orderdate) AS BIGINT), 1),
           '%Y-%m-%d') AS month_start,
  strftime(o_orderdate + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S') AS plus_6h
FROM orders"""


def f15_fn_xml(spark, sf_dir):
    """XML family (Spark 4 native XML, SPARK-44265): an XML fragment
    CONSTRUCTED from event fields must be inverted by ``from_xml``
    (typed struct extraction, absent element → NULL), probed by the
    Hive ``xpath_long`` path form, and introspected by
    ``schema_of_xml`` — f9's URL-inversion oracle trick applied to XML,
    so no DuckDB XML parser is needed: the oracle rebuilds every output
    from the same source fields, and equality proves the parse inverts
    the construction. Fields are integers/enum strings (no XML-escaping
    edge cases), so construction is injective.

    Scale: map-only; one parse per row serving all typed extractions.
    The slice is %3-bounded: XML row parsing measured ~50 us/row (StAX,
    no codegen — 5 s for the full 100k-row fixture), which is the cost
    profile this family exists to demonstrate; parse-once-into-VARIANT
    (f13) is the hot-path form."""
    ev = _T(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    xml = F.concat(
        F.lit("<e><id>"),
        F.col("event_id").cast("string"),
        F.lit("</id><ty>"),
        F.col("event_type"),
        F.lit("</ty><u>"),
        F.col("user_id").cast("string"),
        F.lit("</u></e>"),
    )
    p = F.from_xml(xml, "id BIGINT, ty STRING, u BIGINT, zz STRING")
    return ev.select(
        "event_id",
        p.getField("id").alias("rt_id"),
        p.getField("ty").alias("rt_ty"),
        p.getField("u").alias("rt_u"),
        p.getField("zz").isNull().alias("absent_null"),
        F.xpath_long(xml, F.lit("/e/u")).alias("xp_u"),
        F.schema_of_xml(
            F.lit("<e><id>5</id><ty>click</ty><u>77</u></e>")
        ).alias("xsch"),
    )


_F15_SQL = """SELECT event_id,
  event_id AS rt_id,
  event_type AS rt_ty,
  user_id AS rt_u,
  TRUE AS absent_null,
  user_id AS xp_u,
  'STRUCT<id: BIGINT, ty: STRING, u: BIGINT>' AS xsch
FROM events WHERE event_id % 3 = 0"""


def f16_fn_regexp(spark, sf_dir):
    """Regexp extraction family beyond F1's extract/replace:
    ``regexp_extract_all`` (every match, joined to CSV so the compare is
    order-stable), ``regexp_count``, ``regexp_instr`` (first-match
    position), ``regexp_substr`` (first match), and ``str_to_map``
    inverted by element lookup (the map is CONSTRUCTED from fields, one
    key extracted back and compared to the source field — f9's
    inversion trick). Vowel-run patterns are ASCII-only and
    lookaround-free, so Java regex and RE2 agree exactly.

    Scale: map-only expression algebra riding the scan, zero
    shuffles."""
    p = _T(spark, sf_dir, "part")
    vowels = F.lit("[aeiou]+")
    m = F.concat(
        F.lit("brand:"), F.col("p_brand"), F.lit(",size:"),
        F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.array_join(
            F.regexp_extract_all("p_name", vowels, 0), ","
        ).alias("vowel_runs"),
        F.regexp_count("p_name", vowels).alias("n_runs"),
        F.regexp_instr("p_name", vowels).alias("first_pos"),
        F.regexp_substr("p_name", vowels).alias("first_run"),
        F.element_at(F.str_to_map(m, F.lit(","), F.lit(":")), "size")
        .cast("int")
        .alias("size_back"),
    )


#: DuckDB regexp_instr does not exist; the first regex match of a vowel-run
#: pattern starts at the first vowel, so POSITION of that vowel is the
#: match position (any earlier occurrence of the matched string would
#: itself contain a vowel and contradict first-match-ness).
_F16_SQL = """SELECT p_partkey,
  array_to_string(regexp_extract_all(p_name, '[aeiou]+', 0), ',')
    AS vowel_runs,
  CAST(len(regexp_extract_all(p_name, '[aeiou]+', 0)) AS INTEGER)
    AS n_runs,
  CASE WHEN regexp_extract(p_name, '[aeiou]+') = ''
       THEN 0
       ELSE POSITION(regexp_extract(p_name, '[aeiou]+') IN p_name) END
    AS first_pos,
  regexp_extract(p_name, '[aeiou]+') AS first_run,
  p_size AS size_back
FROM part"""


def f17_fn_edit_distance(spark, sf_dir):
    """Edit-distance family — the fuzzy-matching scalar the dedup stack
    leans on at the record level: ``levenshtein`` (exact DP distance),
    the Spark 3.5 THRESHOLD variant (bails out and returns -1 once the
    distance exceeds the bound — the banded-DP optimization that makes
    corpus-scale fuzzy joins affordable, emulated by the oracle with a
    CASE over the full distance), and a normalized similarity in [0,1]
    computed as ONE fixed double expression over the exact integer
    distance and lengths (bit-stable across engines). Operands are the
    first/last word of ``p_name`` — same-row derived strings, so no
    join is implied.

    Scale: map-only expression algebra riding the scan, zero shuffles;
    the threshold form is the one to use in candidate-pair verification
    (cost O(threshold x len), not O(len²))."""
    p = _T(spark, sf_dir, "part")
    w1 = F.split("p_name", " ").getItem(0)
    w2 = F.regexp_extract("p_name", r"([a-z]+)$", 1)
    lev = F.levenshtein(w1, w2)
    return p.select(
        "p_partkey",
        w1.alias("w1"),
        w2.alias("w2"),
        lev.alias("lev"),
        F.levenshtein(w1, w2, 3).alias("lev_t3"),
        (
            F.lit(1.0)
            - lev.cast("double")
            / F.greatest(F.length(w1), F.length(w2), F.lit(1)).cast("double")
        ).alias("sim_norm"),
    )


_F17_SQL = """SELECT p_partkey, w1, w2,
  CAST(levenshtein(w1, w2) AS INTEGER) AS lev,
  CAST(CASE WHEN levenshtein(w1, w2) > 3 THEN -1
            ELSE levenshtein(w1, w2) END AS INTEGER) AS lev_t3,
  1.0 - CAST(levenshtein(w1, w2) AS DOUBLE)
      / CAST(GREATEST(len(w1), len(w2), 1) AS DOUBLE) AS sim_norm
FROM (SELECT p_partkey,
        string_split(p_name, ' ')[1] AS w1,
        regexp_extract(p_name, '([a-z]+)$', 1) AS w2
      FROM part)"""


def f18_fn_position(spark, sf_dir):
    """String position/splice family beyond F1's slice/concat surface:
    ``instr`` (first occurrence), ``locate`` with a START OFFSET (the
    resume-scan form), ``substring_index`` with positive and NEGATIVE
    counts (head-k / tail-k of a delimited string — the path-prefix
    idiom), and ``overlay`` (splice replacement at a position). DuckDB
    lacks locate-from-offset / substring_index / overlay, so the oracle
    rebuilds each from primitives (substr arithmetic, split-list slices,
    concat) — exact string algebra, no approximation.

    Scale: map-only expression algebra riding the scan, zero shuffles."""
    p = _T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.instr("p_name", "a").alias("pos_a"),
        F.locate("a", "p_name", 5).alias("pos_a_from5"),
        F.substring_index("p_type", " ", 2).alias("type_head2"),
        F.substring_index("p_type", " ", -1).alias("type_tail"),
        F.overlay("p_brand", F.lit("XX"), 7).alias("brand_patched"),
    )


_F18_SQL = """SELECT p_partkey,
  CAST(instr(p_name, 'a') AS INTEGER) AS pos_a,
  CAST(CASE WHEN instr(substr(p_name, 5), 'a') = 0 THEN 0
            ELSE instr(substr(p_name, 5), 'a') + 4 END AS INTEGER)
    AS pos_a_from5,
  array_to_string(string_split(p_type, ' ')[1:2], ' ') AS type_head2,
  string_split(p_type, ' ')[-1] AS type_tail,
  substr(p_brand, 1, 6) || 'XX' || substr(p_brand, 9) AS brand_patched
FROM part"""


def f19_fn_number_format(spark, sf_dir):
    """Numeric formatting family (Spark 3.4 ``to_char`` / ``to_number``,
    SPARK-28516; plus ``format_number``): zero-padded fixed width,
    space-padded digit-grouped, locale-style grouped, and the
    ``to_number`` inverse proving the round trip is lossless
    (to_char -> to_number == the original decimal). DuckDB has no
    Oracle-style format masks, so the oracle rebuilds each rendering
    from primitives — printf zero-pad for the fixed form, integer
    ``format('{:,}')`` + exact-cent lpad for the grouped forms (its
    thousand separators only exist for integers). Prices are
    2-decimal-exact, so double/decimal conversions round identically.

    Scale: map-only expression algebra riding the scan, zero
    shuffles."""
    o = _T(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    zp = F.to_char(dec, F.lit("000000000.00"))
    return o.select(
        "o_orderkey",
        zp.alias("zero_padded"),
        F.to_char(dec, F.lit("9,999,990.00")).alias("grouped_padded"),
        F.format_number("o_totalprice", 2).alias("grouped"),
        F.to_number(zp, F.lit("000000000.00"))
        .cast("string")
        .alias("roundtrip"),
    )


_F19_SQL = """SELECT o_orderkey,
  printf('%012.2f', o_totalprice) AS zero_padded,
  lpad(format('{:,}', CAST(FLOOR(o_totalprice) AS BIGINT)) || '.' ||
       lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100
                 AS VARCHAR), 2, '0'), 12, ' ') AS grouped_padded,
  format('{:,}', CAST(FLOOR(o_totalprice) AS BIGINT)) || '.' ||
    lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100
              AS VARCHAR), 2, '0') AS grouped,
  CAST(CAST(o_totalprice AS DECIMAL(11,2)) AS VARCHAR) AS roundtrip
FROM orders"""


def f20_fn_xml_write(spark, sf_dir):
    """The XML surfaces F15 does NOT cover — ATTRIBUTES and the WRITE
    path: ``from_xml`` with an attribute schema (``_id`` — the default
    ``attributePrefix`` mapping for ``<order id=...>``), the string
    xpath form on an ``@attribute`` path and an element path
    (``xpath_string`` — f15 probes only ``xpath_long``), and ``to_xml``
    (Spark 4, the RENDER half) proved by REPARSING its own output
    (the rendered string is formatting-dependent; the reparse is the
    engine-portable claim). F15 pins element extraction / typed
    inversion / schema_of_xml; together the two specs cover the full
    native-XML read+write surface. DuckDB has no XML type, so the
    oracle derives every output from the source columns the XML was
    built from — the parse-inverts-construction contract.

    Scale: map-only, zero shuffles — but XML parse is the declared
    EXPENSIVE scalar family (each ``from_xml``/``xpath_*`` re-parses
    its input), so the family runs on a deterministic 1-in-20 keyslice,
    f15's %3 discipline. At 100 TB you parse ONCE into a struct column
    and project from it (f13's parse-once VARIANT is the hot-path
    form)."""
    o = _T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    xml = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey"),
        F.lit('"><status>'),
        F.col("o_orderstatus"),
        F.lit("</status></order>"),
    )
    parsed = F.from_xml(xml, "_id bigint, status string")
    reparsed = F.from_xml(
        F.to_xml(
            F.struct(
                F.col("o_orderstatus").alias("status"), cents.alias("cents")
            )
        ),
        "status string, cents bigint",
    )
    return o.select(
        "o_orderkey",
        parsed["_id"].alias("attr_id"),
        F.xpath_string(xml, F.lit("/order/@id")).alias("xp_attr_id"),
        F.xpath_string(xml, F.lit("/order/status")).alias("xp_status"),
        (
            (reparsed["status"] == F.col("o_orderstatus"))
            & (reparsed["cents"] == cents)
        ).alias("render_roundtrip_ok"),
    )


_F20_SQL = """SELECT o_orderkey,
  o_orderkey AS attr_id,
  CAST(o_orderkey AS VARCHAR) AS xp_attr_id,
  o_orderstatus AS xp_status,
  TRUE AS render_roundtrip_ok
FROM orders WHERE o_orderkey % 20 = 0"""


SPECS = [
    QuerySpec(
        "f1_fn_string",
        "F",
        "string function family",
        f1_fn_string,
        "SELECT p_partkey, upper(p_name) AS u_name, lower(p_brand) AS l_brand,\n"
        "  length(p_name) AS name_len, trim('  pad  ') AS trimmed,\n"
        "  substring(p_name, 1, 5) AS name_pre,\n"
        "  concat_ws('|', p_brand, p_type) AS brand_type,\n"
        "  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,\n"
        "  split_part(p_name, ' ', 1) AS first_word,\n"
        "  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,\n"
        "  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,\n"
        "  translate(p_brand, '#', '-') AS brand_dash\n"
        "FROM part",
    ),
    QuerySpec(
        "f2_fn_date",
        "F",
        "date/time function family (incl. epoch-ms roundtrip)",
        f2_fn_date,
        "SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,\n"
        "  dayofweek(o_orderdate) + 1 AS dow,\n"
        "  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,\n"
        "  datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')"
        " AS days_to_y2k,\n"
        "  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,\n"
        "  epoch_ms(o_orderdate) AS epoch_ms,\n"
        "  strftime(make_timestamp(epoch_ms(o_orderdate) * 1000),"
        " '%Y-%m-%d %H:%M:%S') AS roundtrip\n"
        "FROM orders",
    ),
    QuerySpec(
        "f3_fn_math",
        "F",
        "math function family",
        f3_fn_math,
        "SELECT c_custkey, abs(c_acctbal - 5000.0) AS abs_dev,\n"
        "  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,\n"
        "  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,\n"
        "  round(sqrt(abs(c_acctbal)), 4) AS sqrt_bal,\n"
        "  round(ln(abs(c_acctbal) + 1.0), 4) AS log_bal,\n"
        "  c_custkey % 7 AS key_mod7,\n"
        "  CASE WHEN c_acctbal > 5000.0 THEN 1.0 WHEN c_acctbal < 5000.0 THEN -1.0"
        " ELSE 0.0 END AS sign_dev,\n"
        "  c_custkey * c_custkey AS key_sq\n"
        "FROM customer",
    ),
    QuerySpec(
        "f4_fn_conditional_cast",
        "F",
        "conditional + cast family (incl. decimal arithmetic)",
        f4_fn_conditional_cast,
        "SELECT o_orderkey,\n"
        "  CASE WHEN o_totalprice > 300000 THEN 'big'\n"
        "       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS price_band,\n"
        "  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,\n"
        "  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,\n"
        "  CAST(o_orderkey AS VARCHAR) AS key_str,\n"
        "  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(2 AS DECIMAL(2,0))"
        " AS VARCHAR) AS price_x2_dec\n"
        "FROM orders",
    ),
    QuerySpec(
        "f5_fn_array",
        "F",
        "array function family over embeddings",
        f5_fn_array,
        "SELECT vec_id, len(embedding) AS n_dims,\n"
        "  list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')"
        " AS emb_sum,\n"
        "  list_aggregate(list_transform(embedding, x -> CAST(x * x AS DOUBLE)),"
        " 'sum') AS emb_sqsum,\n"
        "  len(list_filter(embedding, x -> x > 0)) AS n_pos,\n"
        "  len(list_distinct(embedding)) AS n_distinct,\n"
        "  CAST(list_sort(embedding, 'DESC')[1] AS DOUBLE) AS max_dim,\n"
        "  CAST(embedding[2] AS DOUBLE) AS dim2,\n"
        "  list_contains(list_transform(embedding, x -> x > 0.5), true) AS has_big\n"
        "FROM embeddings",
    ),
    QuerySpec(
        "f6_fn_map",
        "F",
        "map family: JSON -> map -> explode",
        f6_fn_map,
        "SELECT event_id, k AS prop_key,\n"
        "  json_extract_string(props, '$.' || k) AS prop_value,\n"
        "  CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS prop_value_int\n"
        "FROM events, unnest(json_keys(props)) AS t(k)",
    ),
    QuerySpec(
        "f7_fn_json",
        "F",
        "JSON access family",
        f7_fn_json,
        "SELECT event_id, json_extract_string(props, '$.k') AS k_str,\n"
        "  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,\n"
        "  json_extract_string(props, '$.missing') IS NULL AS missing_absent,\n"
        "  json_extract_string(props, '$.k') AS k_map\n"
        "FROM events",
    ),
    QuerySpec(
        "f8_fn_binary",
        "F",
        "binary/codec family: encode/base64/hex/md5/lengths + round-trip",
        f8_fn_binary,
        _F8_SQL,
    ),
    QuerySpec(
        "f9_fn_url",
        "F",
        "URL family: parse_url inverts a field-built URL (host/path/query)",
        f9_fn_url,
        _F9_SQL,
    ),
    QuerySpec(
        "f10_fn_bitwise",
        "F",
        "BIT_AND/OR/XOR aggregates + scalar shifts (bitmap algebra)",
        f10_fn_bitwise,
        _F10_SQL,
    ),
    QuerySpec(
        "f11_fn_collation",
        "F",
        "Spark 4 UTF8_LCASE collation: collated groupBy + equality",
        f11_fn_collation,
        _F11_SQL,
    ),
    QuerySpec(
        "f12_fn_try_safe",
        "F",
        "try_divide/multiply/cast/element_at: ANSI-safe NULL error family",
        f12_fn_try_safe,
        _F12_SQL,
    ),
    QuerySpec(
        "f13_fn_variant",
        "F",
        "VARIANT: parse_json/variant_get/schema_of_variant/try_parse_json",
        f13_fn_variant,
        _F13_SQL,
    ),
    QuerySpec(
        "f14_fn_interval",
        "F",
        "calendar/interval arithmetic: add_months clamp, last_day, next_day",
        f14_fn_interval,
        _F14_SQL,
    ),
    QuerySpec(
        "f15_fn_xml",
        "F",
        "XML family: from_xml inversion, xpath probe, schema_of_xml",
        f15_fn_xml,
        _F15_SQL,
    ),
    QuerySpec(
        "f16_fn_regexp",
        "F",
        "regexp_extract_all/count/instr/substr + str_to_map inversion",
        f16_fn_regexp,
        _F16_SQL,
    ),
    QuerySpec(
        "f17_fn_edit_distance",
        "F",
        "levenshtein + 3.5 threshold variant + normalized similarity",
        f17_fn_edit_distance,
        _F17_SQL,
    ),
    QuerySpec(
        "f18_fn_position",
        "F",
        "instr/locate-from-offset/substring_index/overlay splice family",
        f18_fn_position,
        _F18_SQL,
    ),
    QuerySpec(
        "f19_fn_number_format",
        "F",
        "to_char/to_number/format_number: masks + lossless roundtrip",
        f19_fn_number_format,
        _F19_SQL,
    ),
    QuerySpec(
        "f20_fn_xml_write",
        "F",
        "XML attributes + to_xml write path (f15's read-side complement)",
        f20_fn_xml_write,
        _F20_SQL,
    ),
]


def f21_fn_generator_outer(spark, sf_dir):
    """F21: OUTER generator family — ``posexplode_outer`` + struct
    expansion (the ``inline``-equivalent read-out). The non-outer
    generators (f5/x-group explodes) DROP rows whose array is empty;
    the *_outer forms preserve them as a single all-NULL fan row — the
    semantics a left-join-shaped enrichment needs (a part with no
    attributes must still appear in the attribute ledger). Each part
    fans out its attribute structs when p_size >= 25 and stays as one
    NULL row otherwise.

    Scale shape: a generator is narrow map-side work — the scan absorbs
    it; no shuffle anywhere. Strict oracle: DuckDB mirrors the OUTER
    semantics by substituting a one-NULL-element list before unnest
    (the documented rewrite), with identical pos/tag/value arithmetic."""
    p = _T(spark, sf_dir, "part")
    arr = F.when(
        F.col("p_size") >= 25,
        F.array(
            F.struct(
                F.lit("size").alias("tag"),
                F.col("p_size").cast("long").alias("v"),
            ),
            F.struct(
                F.lit("type_len").alias("tag"),
                F.length("p_type").cast("long").alias("v"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<tag:string,v:bigint>>"))
    return (
        p.select("p_partkey", arr.alias("arr"))
        .select("p_partkey", F.posexplode_outer("arr").alias("pos", "s"))
        .select(
            "p_partkey",
            F.col("pos").cast("long").alias("pos"),
            F.col("s.tag").alias("tag"),
            F.col("s.v").alias("v"),
        )
    )


_F21_SQL = """WITH base AS (SELECT p_partkey,
  CASE WHEN p_size >= 25 THEN
    [{'tag': 'size', 'v': CAST(p_size AS BIGINT)},
     {'tag': 'type_len', 'v': CAST(length(p_type) AS BIGINT)}]
  ELSE [] END AS arr FROM part),
fan AS (SELECT p_partkey,
  CASE WHEN len(arr) = 0 THEN
    [{'pos': CAST(NULL AS BIGINT),
      's': CAST(NULL AS STRUCT(tag VARCHAR, v BIGINT))}]
  ELSE list_transform(range(1, len(arr) + 1),
         i -> {'pos': CAST(i - 1 AS BIGINT), 's': arr[i]}) END AS fans
  FROM base),
un AS (SELECT p_partkey, unnest(fans) AS u FROM fan)
SELECT p_partkey, u.pos AS pos, u.s.tag AS tag, u.s.v AS v FROM un"""

SPECS.append(
    QuerySpec(
        "f21_fn_generator_outer",
        "F",
        "posexplode_outer + struct expand: empty arrays keep their row",
        f21_fn_generator_outer,
        _F21_SQL,
    )
)


def f22_fn_timezone(spark, sf_dir):
    """F22: the timezone-conversion family — the one datetime surface f2
    leaves untouched, and the one a CDC consumer hits first (the envelope's
    ts_ms is a UTC instant, rpk_topic_consume.json:4; every downstream
    report renders it in a business zone). ``convert_timezone`` from the
    UTC instant into a DST-observing zone (America/New_York — the
    1992-1998 order dates straddle EST/EDT, so the offset itself is data)
    and a fixed-offset zone (Asia/Kolkata, +05:30), each as a rendered
    wall-clock string; plus the NY UTC-offset in MINUTES (the wall-vs-
    instant difference: -300 standard, -240 daylight — the column that
    proves the conversion consulted the IANA rules, not a constant).

    Exactness note: both engines resolve named zones through IANA tzdata;
    the fixture's 1992-1998 range predates the 2007 US DST rule change and
    is stable across tzdata versions. Offsets are exact integer minutes
    (epoch-ms subtraction DIV 60000); wall clocks compare as strings.

    Scale: map-only expression algebra — zero shuffles, rides any scan."""
    o = _T(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    ny = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), ts)
    kol = F.convert_timezone(F.lit("UTC"), F.lit("Asia/Kolkata"), ts)
    return o.select(
        "o_orderkey",
        F.date_format(ny, "yyyy-MM-dd HH:mm:ss").alias("ny_wall"),
        F.date_format(kol, "yyyy-MM-dd HH:mm:ss").alias("kolkata_wall"),
        # NTZ wall cast back to instant in the UTC session ("wall as
        # instant"); minus the true instant = the zone's UTC offset.
        (
            (F.unix_millis(ny.cast("timestamp")) - F.unix_millis(ts))
            / F.lit(60000)
        )
        .cast("long")
        .alias("ny_offset_min"),
        F.hour(ny).cast("long").alias("ny_hour"),
    )


_F22_SQL = """WITH base AS (
  SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders),
conv AS (SELECT o_orderkey, ts,
    timezone('America/New_York', timezone('UTC', ts)) AS ny,
    timezone('Asia/Kolkata', timezone('UTC', ts)) AS kol
  FROM base)
SELECT o_orderkey,
  strftime(ny, '%Y-%m-%d %H:%M:%S') AS ny_wall,
  strftime(kol, '%Y-%m-%d %H:%M:%S') AS kolkata_wall,
  CAST((epoch_ms(ny) - epoch_ms(ts)) // 60000 AS BIGINT) AS ny_offset_min,
  CAST(hour(ny) AS BIGINT) AS ny_hour
FROM conv"""

SPECS.append(
    QuerySpec(
        "f22_fn_timezone",
        "F",
        "convert_timezone UTC -> DST zone + fixed offset; offset minutes",
        f22_fn_timezone,
        _F22_SQL,
    )
)
