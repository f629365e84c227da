"""Scalar function families (SURVEY.md §2b: fn_*).

One registered query per family, each exercising the family's breadth on a
fixture table. All are built-in `pyspark.sql.functions` — JVM-side,
whole-stage-codegen'd, never Python. The date-parse entries reproduce the
reference's R7/R8 semantics (/root/reference/main.py:18-37): fractional
seconds stripped, unparseable → NULL.

Oracle dialect notes (Spark vs DuckDB differences handled here):
- substring/instr are 1-based in both; split-part is 1-based in both.
- Spark `dayofweek` is 1=Sunday; DuckDB `dayofweek` is 0=Sunday → oracle
  uses `dayofweek(x) + 1`.
- Spark `pmod` ≥ 0; DuckDB `%` keeps sign → oracle spells out
  `((a % b) + b) % b`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                                   AS name_upper,
           LOWER(c_mktsegment)                             AS seg_lower,
           LENGTH(c_name)                                  AS name_len,
           SUBSTRING(c_name, 1, 8)                         AS name_prefix,
           concat_ws(':', c_name, c_mktsegment)            AS name_seg,
           TRIM(CONCAT(' ', c_name, ' '))                  AS name_trim,
           REPLACE(c_name, '#', '-')                       AS name_repl,
           (c_name LIKE '%1%')                             AS has_one,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1)           AS name_digits,
           SPLIT_PART(c_name, '#', 1)                      AS name_head,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0')        AS key_padded
    FROM customer
    """,
    tags=("function", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat, trim, replace,
    LIKE, regexp_extract, split, pad."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_repl"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                        AS od,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS od_month,
           EXTRACT(year FROM o_orderdate)                   AS y,
           EXTRACT(month FROM o_orderdate)                  AS m,
           DAYOFWEEK(o_orderdate) + 1                       AS dow,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_ts,
           STRFTIME(o_orderdate, '%Y-%m-%d')                AS od_str
    FROM orders
    """,
    tags=("function", "date"),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family incl. the reference's to_date semantics (R8)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.date_trunc("month", "o_orderdate").alias("od_month"),
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_ts"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od_str"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                        AS price_r1,
           FLOOR(l_extendedprice)                           AS price_floor,
           CEIL(l_extendedprice)                            AS price_ceil,
           ABS(l_discount - 0.05)                           AS disc_dev,
           ROUND(POW(l_quantity, 2), 4)                     AS qty_sq,
           ROUND(SQRT(l_quantity), 6)                       AS qty_sqrt,
           ROUND(LN(l_extendedprice), 6)                    AS price_ln,
           ROUND(LOG10(l_extendedprice), 6)                 AS price_log10,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7       AS key_pmod7,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE)          AS disc_sign,
           GREATEST(l_tax, l_discount)                      AS max_rate,
           LEAST(l_tax, l_discount)                         AS min_rate
    FROM lineitem
    """,
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: rounding, roots, logs, pmod, sign, greatest/least."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_pmod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END                               AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open')      AS status_alias,
           CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent,
           IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'none') AS always_none
    FROM orders
    """,
    tags=("function", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif — the reference's null-defaulting
    semantics (R6, main.py:87,93,95) generalized."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300_000, "high")
        .when(F.col("o_totalprice") >= 100_000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_alias"
        ),
        F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0).cast("long").alias("is_urgent"),
        F.ifnull(F.nullif("o_orderpriority", "o_orderpriority"), F.lit("none")).alias(
            "always_none"
        ),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT)  AS k_num,
           json_extract_string(props, '$.k')           AS k_str,
           (json_extract(props, '$.missing') IS NULL)  AS missing_is_null
    FROM events
    """,
    tags=("function", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (schema-on-read)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                          AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)                  AS first_val,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum'), 4)                         AS vec_sum,
           ROUND(list_aggregate(list_transform(embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                'sum'), 4)                         AS sq_norm,
           len(list_filter(embedding, x -> x > 0))                 AS n_positive
    FROM embeddings
    """,
    tags=("function", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding vector column.

    `aggregate`/`transform`/`filter` run as Catalyst lambda expressions —
    JVM-side, no UDF — which is the scale path for vector math on
    array<float> columns.
    """
    e = table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 4).alias("vec_sum"),
        F.round(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           1                                        AS n_keys,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
    tags=("function", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType: parse props JSON into map<string,long>, probe keys/values."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text)                                       AS h_md5,
           sha256(text)                                    AS h_sha256,
           CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h_md5_64
    FROM documents
    """,
    tags=("function", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-function family (ClickHouse's MD5/SHA/cityHash64 analog):
    md5, sha2-256, and a 60-bit integer digest derived from md5 — the
    engine-portable integer hash the LSH/dedup ops build on. All JVM-side;
    for pure-speed partitioning keys prefer xxhash64 (not reproducible in
    DuckDB, hence not oracled here)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long").alias("h_md5_64"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           user_id & 255                AS b_and,
           user_id | 4096               AS b_or,
           xor(user_id, 1365)           AS b_xor,
           user_id << 3                 AS b_shl,
           user_id >> 2                 AS b_shr,
           CAST(bit_count(user_id) AS INT) AS b_popcnt
    FROM events
    """,
    tags=("function", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount on integer columns."""
    ev = table(spark, sf_dir, "events")
    u = F.col("user_id")
    return ev.select(
        "event_id",
        u.bitwiseAND(F.lit(255)).alias("b_and"),
        u.bitwiseOR(F.lit(4096)).alias("b_or"),
        u.bitwiseXOR(F.lit(1365)).alias("b_xor"),
        F.shiftleft(u, 3).alias("b_shl"),
        F.shiftright(u, 2).alias("b_shr"),
        F.bit_count(u).alias("b_popcnt"),
    )


# Morton (Z-order) bit-interleaving: the magic-mask spread/compact ladder.
# Each step is (v | v << s) & m (spread) or (v | v >> s) & m (compact); the
# SAME ladder is emitted as a Spark Column tree and as DuckDB SQL text, so
# the two engines execute identical 64-bit integer arithmetic.
_MORTON_SPREAD = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread_col(v):
    v = v.bitwiseAND(F.lit(0xFFFF))
    for s, m in _MORTON_SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, s))).bitwiseAND(F.lit(m))
    return v


def _compact_col(v):
    v = v.bitwiseAND(F.lit(0x55555555))
    for s, m in [(1, 0x33333333), (2, 0x0F0F0F0F), (4, 0x00FF00FF), (8, 0x0000FFFF)]:
        v = (v.bitwiseOR(F.shiftright(v, s))).bitwiseAND(F.lit(m))
    return v


def _spread_sql(v: str) -> str:
    e = f"({v} & 65535)"
    for s, m in _MORTON_SPREAD:
        e = f"(({e} | ({e} << {s})) & {m})"
    return e


def _compact_sql(v: str) -> str:
    e = f"({v} & {0x55555555})"
    for s, m in [(1, 0x33333333), (2, 0x0F0F0F0F), (4, 0x00FF00FF), (8, 0x0000FFFF)]:
        e = f"(({e} | ({e} >> {s})) & {m})"
    return e


_MORTON_CODE_SQL = (
    f"({_spread_sql('user_id')} | ({_spread_sql('event_id')} << 1))"
)


@register(
    "fn_morton",
    oracle=f"""
    SELECT event_id,
           user_id & 65535                          AS x,
           event_id & 65535                         AS y,
           {_MORTON_CODE_SQL}                       AS morton,
           {_compact_sql(_MORTON_CODE_SQL)}         AS dec_x,
           {_compact_sql(f'({_MORTON_CODE_SQL} >> 1)')} AS dec_y
    FROM events
    """,
    tags=("function", "bitwise"),
)
def fn_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton / Z-order encode + decode of a 2-D integer key (ClickHouse's
    ``mortonEncode`` / ``mortonDecode``): interleave the low 16 bits of
    (user_id, event_id) into one 32-bit code and split it back.

    Why it's an engine op and not a curiosity: sorting (or range-
    partitioning) a 100 TB fact table by the Morton code of its two
    hottest filter columns gives min/max-zone data skipping on BOTH
    columns from ONE sort order — the Z-order layout trick behind
    ClickHouse/Delta/Iceberg data skipping. The encode itself is the
    classic magic-mask spread ladder — four shift+mask steps per
    dimension, pure whole-stage-codegen integer ops, no UDF — and the
    oracle executes the literally identical ladder (both sides are
    emitted from one table of (shift, mask) steps).

    The decode columns double as an in-band roundtrip proof: dec_x/dec_y
    must equal x/y on every row, and the differential gate checks all
    six columns against DuckDB.
    """
    ev = table(spark, sf_dir, "events")
    code = _spread_col(F.col("user_id")).bitwiseOR(
        F.shiftleft(_spread_col(F.col("event_id")), 1)
    )
    return ev.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("x"),
        F.col("event_id").bitwiseAND(F.lit(65535)).alias("y"),
        code.alias("morton"),
        _compact_col(code).alias("dec_x"),
        _compact_col(F.shiftright(code, 1)).alias("dec_y"),
    )


@register(
    "fn_url",
    oracle="""
    SELECT doc_id,
           CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                ELSE source || '.example.com' END            AS host,
           CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                ELSE '/docs/' || CAST(doc_id AS VARCHAR) END AS path,
           CASE WHEN source IS NULL THEN NULL ELSE lang END  AS q_lang,
           CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                ELSE 'https' END                             AS proto
    FROM documents
    """,
    tags=("function",),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family (ClickHouse domain()/path()/extractURLParameter
    analogs): build a deterministic URL per document, then take it apart
    with parse_url — HOST, PATH, a named QUERY parameter, PROTOCOL. The
    oracle constructs the same fields directly, so the assertion is that
    Spark's parser inverts the construction exactly. parse_url is a JVM
    intrinsic: no UDF, stays inside codegen."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
    )


@register(
    "fn_time_bucket",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) // 900 * 900 * 1000000)
               AS bucket_ts,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY bucket_ts
    """,
    tags=("function", "events"),
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aligned 15-minute bucketing (ClickHouse toStartOfInterval /
    DuckDB time_bucket analog) via integer epoch math — the grid is
    engine-independent, unlike format-string truncation. Bucket ids are
    computed in the projection, so the aggregate shuffles only the ~200
    bucket keys."""
    ev = table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(F.expr("unix_timestamp(ts) div 900 * 900"))
    return (
        ev.filter(F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
        .select(bucket.alias("bucket_ts"), "value")
        .groupBy("bucket_ts")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "fn_editdistance",
    oracle=r"""
    SELECT a.doc_id,
           levenshtein(regexp_replace(a.text, '[^\x00-\x7F]', '', 'g'),
                       regexp_replace(b.text, '[^\x00-\x7F]', '', 'g'))
                                       AS edit_dist,
           abs(a.n_chars - b.n_chars)  AS len_delta
    FROM documents a
    JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
    tags=("function", "text"),
)
def fn_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance (ClickHouse editDistance) between consecutive
    documents — a cheap near-dup signal on short texts. The id+1 self-join
    broadcasts at this scale; at 100 TB the same pairing comes free from a
    lag() window over doc_id instead of a join.

    The distance runs over an ASCII projection of both texts (the usual
    transliteration-normalization step before fuzzy matching) — which is
    also what keeps the gate engine-exact: Spark's levenshtein counts
    CODEPOINT edits while DuckDB's counts BYTE edits, so the two only
    agree on single-byte text. A no-op on an ASCII corpus."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    ascii_only = lambda c: F.regexp_replace(c, r"[^\x00-\x7F]", "")  # noqa: E731
    a, b = d.alias("a"), d.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_id"),
        F.levenshtein(
            ascii_only(F.col("a.text")), ascii_only(F.col("b.text"))
        ).alias("edit_dist"),
        F.abs(F.col("a.n_chars") - F.col("b.n_chars")).alias("len_delta"),
    )


@register(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           printf('%08d:%.2f', o_orderkey, o_totalprice) AS order_tag,
           lpad(o_orderpriority, 15, '.')                AS padded,
           reverse(o_orderstatus)                        AS rev_status,
           repeat(o_orderstatus, 3)                      AS status3
    FROM orders
    """,
    tags=("function",),
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting + pad/reverse/repeat (ClickHouse format()/
    leftPad family). format_string is the JVM printf — the %.2f path is
    locale-independent, so both engines render identical strings."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(
            F.col("o_totalprice").isNotNull(),
            F.format_string("%08d:%.2f", F.col("o_orderkey"), F.col("o_totalprice")),
        ).alias("order_tag"),
        F.lpad("o_orderpriority", 15, ".").alias("padded"),
        F.reverse("o_orderstatus").alias("rev_status"),
        F.repeat("o_orderstatus", 3).alias("status3"),
    )


@register(
    "fn_date_extra",
    oracle="""
    SELECT o_orderkey,
           last_day(CAST(o_orderdate AS DATE))            AS month_end,
           quarter(CAST(o_orderdate AS DATE))             AS qtr,
           dayofyear(CAST(o_orderdate AS DATE))           AS doy,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m
    FROM orders
    """,
    tags=("function",),
)
def fn_date_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic beyond fn_date: month-end, quarter, day-of-year,
    and month addition with end-of-month clamping (both engines clamp
    Jan 31 + 1 month to Feb 29) — the ClickHouse toLastDayOfMonth /
    toQuarter / addMonths family."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.add_months(d, 3).alias("plus_3m"),
    )


@register(
    "fn_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           '{"k":' || json_extract_string(props, '$.k') || '}' AS rebuilt
    FROM events
    """,
    tags=("function",),
)
def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON round trip: parse props into a typed struct (from_json
    with a declared schema — the scalable path: one parse, columnar after),
    access the field, serialize back with to_json. The declared-schema
    parse is to JSON what declared schemas are to CSV: no inference pass."""
    ev = table(spark, sf_dir, "events")
    s = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        s["k"].alias("k_val"),
        F.to_json(F.struct(s["k"].alias("k"))).alias("rebuilt"),
    )


@register(
    "fn_math_advanced",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6)          AS q_sqrt,
           round(exp(l_quantity / 50.0), 6)    AS q_exp,
           round(ln(l_extendedprice), 6)       AS p_ln,
           round(sin(l_discount), 6)           AS d_sin,
           round(atan2(l_quantity, l_tax + 1), 6) AS qt_atan2
    FROM lineitem
    """,
    tags=("function",),
)
def fn_math_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental/math family (sqrt/exp/ln/sin/atan2 — the ClickHouse
    math function surface). All JVM intrinsics inside codegen; rounded to
    6 decimals because libm implementations may differ in the last ulp."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("q_sqrt"),
        F.round(F.exp(F.col("l_quantity") / 50.0), 6).alias("q_exp"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("p_ln"),
        F.round(F.sin("l_discount"), 6).alias("d_sin"),
        F.round(F.atan2(F.col("l_quantity"), F.col("l_tax") + 1), 6).alias("qt_atan2"),
    )


@register(
    "fn_regex",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(text, '(\w+) (\w+)', '\2 \1', 'g') AS swapped_head,
           len(regexp_extract_all(text, '[a-z]{5,}'))   AS n_long_words,
           regexp_matches(text, 'dup|spark')            AS mentions_engine
    FROM documents
    """,
    tags=("function",),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family beyond extract: group-backreference replace (Java $n
    vs RE2 \\n spelled per dialect, same semantics), match counting, and
    boolean match — all JVM-side, no UDF."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"(\w+) (\w+)", r"$2 $1").alias("swapped_head"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]{5,}"), F.lit(0))).alias(
            "n_long_words"
        ),
        F.col("text").rlike("dup|spark").alias("mentions_engine"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT n_nationkey,
           to_json(struct_pack(name := n_name, region := n_regionkey))
               AS nation_json,
           struct_pack(name := n_name, region := n_regionkey).name
               AS via_field,
           to_json(struct_pack(
               key := n_nationkey,
               dims := struct_pack(r := n_regionkey, tag := 'v1'),
               ks := [n_nationkey, n_regionkey]))       AS nested_json
    FROM nation
    """,
    tags=("function",),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, dot-field access, nesting (struct in struct,
    array in struct), and JSON serialization — the typed-record surface
    (ClickHouse Tuple/Nested, DuckDB STRUCT). Structs are shredded into
    per-field parquet columns on write, so field access after a round
    trip prunes to one column; to_json output is byte-compared across
    engines (ints/strings only — float JSON formatting differs)."""
    n = table(spark, sf_dir, "nation")
    rec = F.struct(
        F.col("n_name").alias("name"), F.col("n_regionkey").alias("region")
    )
    nested = F.struct(
        F.col("n_nationkey").alias("key"),
        F.struct(F.col("n_regionkey").alias("r"), F.lit("v1").alias("tag")).alias(
            "dims"
        ),
        F.array(F.col("n_nationkey"), F.col("n_regionkey")).alias("ks"),
    )
    return n.select(
        "n_nationkey",
        F.to_json(rec).alias("nation_json"),
        rec.getField("name").alias("via_field"),
        F.to_json(nested).alias("nested_json"),
    )


@register(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_quantity / nullif(l_linenumber - 1, 0) * 10000) / 10000
               AS qty_per_prev_line,
           TRY_CAST(l_returnflag AS INTEGER)      AS flag_as_int,
           TRY_CAST(l_quantity AS INTEGER)        AS qty_int
    FROM lineitem
    """,
    tags=("function",),
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic and casts: try_divide NULLs on
    divide-by-zero instead of failing the job (ANSI mode makes plain `/`
    throw — one bad row must not kill a 100 TB pass), and try_cast NULLs
    unparseable values (reference main.py:18-37 swallows bad
    datetime/date parses the same way). DuckDB's `/` already yields NULL
    on zero via nullif; both sides floor-quantize the quotient."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(
                F.try_divide(
                    F.col("l_quantity"), F.nullif(F.col("l_linenumber") - 1, F.lit(0))
                )
                * 10000
            )
            / 10000
        ).alias("qty_per_prev_line"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_quantity").try_cast("int").alias("qty_int"),
    )


@register(
    "fn_variant",
    oracle="""
    WITH j AS (
        SELECT event_id,
               '{"user":{"id":' || CAST(user_id AS VARCHAR)
                   || ',"type":"' || event_type || '"},"m":['
                   || CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR) || ','
                   || CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)
                   || ']}' AS doc
        FROM events
    )
    SELECT event_id,
           CAST(json_extract(doc, '$.user.id') AS BIGINT)   AS uid,
           json_extract_string(doc, '$.user.type')          AS utype,
           CAST(json_extract(doc, '$.m[1]') AS BIGINT)      AS m1,
           (json_extract(doc, '$.user.email') IS NULL)      AS email_is_null
    FROM j
    """,
    tags=("function", "json", "variant"),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType: semi-structured JSON parsed ONCE into the
    binary variant encoding, then extracted many times with typed paths —
    the engine analog of ClickHouse's JSON/Dynamic column. Contrast with
    fn_json's get_json_object, which re-parses the string per extraction:
    at 100 TB with k extracted fields, parse_json + variant_get does one
    parse + k O(log n) binary probes per row instead of k full parses.
    The fixture's props is a one-key object, so the query synthesizes a
    nested document (object + array) from row values — built CHAR-FOR-CHAR
    identically in the oracle, which extracts with DuckDB's JSON pointers
    from the same string."""
    ev = table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"user":{"id":'),
        F.col("user_id").cast("string"),
        F.lit(',"type":"'),
        F.col("event_type"),
        F.lit('"},"m":['),
        F.floor("value").cast("long").cast("string"),
        F.lit(","),
        F.get_json_object("props", "$.k").cast("long").cast("string"),
        F.lit("]}"),
    )
    v = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.user.id", "bigint").alias("uid"),
        F.variant_get(v, "$.user.type", "string").alias("utype"),
        F.variant_get(v, "$.m[1]", "bigint").alias("m1"),
        F.try_variant_get(v, "$.user.email", "string").isNull().alias("email_is_null"),
    )


@register(
    "fn_timezone",
    oracle="""
    SELECT o_orderkey,
           CAST(timezone('America/New_York',
                         timezone('UTC', o_orderdate)) AS TIMESTAMP)
               AS ts_ny,
           CAST(timezone('Asia/Tokyo',
                         timezone('UTC', o_orderdate)) AS TIMESTAMP)
               AS ts_tokyo,
           CAST(timezone('UTC',
                timezone('Asia/Tokyo',
                         CAST(timezone('Asia/Tokyo',
                                       timezone('UTC', o_orderdate))
                              AS TIMESTAMP))) AS TIMESTAMP) AS roundtrip
    FROM orders
    """,
    tags=("function", "date"),
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion battery (ClickHouse toTimeZone analog): UTC
    order timestamps rendered as New York / Tokyo wall-clock (DST-aware —
    the fixture's date range crosses both EST and EDT), plus a Tokyo
    round-trip (to zone and back) that must be the identity. The
    round-trip deliberately uses a DST-free zone: on a fall-back day a
    wall-clock hour is AMBIGUOUS and engines legitimately disagree on
    which offset to pick (Spark takes the earlier, DuckDB the later —
    observed on Europe/Paris 1999-10-31), so only unambiguous zones
    round-trip portably.

    from_utc_timestamp/to_utc_timestamp are pure codegen'd expressions
    over the same IANA tzdata both engines ship — no shuffle, no UDF.
    The session timezone is pinned UTC on both sides, so naive
    timestamps agree by construction."""
    o = table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    tokyo = F.from_utc_timestamp(ts, "Asia/Tokyo")
    return o.select(
        "o_orderkey",
        F.from_utc_timestamp(ts, "America/New_York").alias("ts_ny"),
        F.from_utc_timestamp(ts, "Asia/Tokyo").alias("ts_tokyo"),
        F.to_utc_timestamp(tokyo, "Asia/Tokyo").alias("roundtrip"),
    )


@register(
    "fn_ip",
    oracle="""
    WITH ips AS (
        SELECT o_orderkey,
               ((o_orderkey            % 223) + 1) AS o1,
               ((o_orderkey // 256)    % 256)      AS o2,
               ((o_orderkey // 65536)  % 256)      AS o3,
               (o_orderkey             % 256)      AS o4
        FROM orders
    )
    SELECT o_orderkey,
           o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip_str,
           CAST(o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS BIGINT)
               AS ip_num,
           CAST((o1 * 16777216 + o2 * 65536 + o3 * 256 + o4)
                // 65536 * 65536 AS BIGINT) AS subnet16,
           o1 || '.' || o2 || '.0.0/16' AS subnet16_cidr,
           (o1 = 10 OR (o1 = 192 AND o2 = 168)) AS is_private
    FROM ips
    """,
    tags=("function", "clickhouse"),
)
def fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 function battery (ClickHouse IPv4StringToNum /
    IPv4NumToString / range analogs): render a synthetic-but-deterministic
    IPv4 per order, convert dotted-quad ↔ numeric, mask to the /16
    subnet in both representations, and classify RFC-1918 private space —
    the log-analytics staple. All integer/string expressions, codegen'd
    end to end; the synthesis is mirrored digit-for-digit in the oracle
    so the conversion logic (not the fake data) is what's differential."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    o1 = (k % 223 + 1).cast("long")
    o2 = F.floor(k / 256).cast("long") % 256
    o3 = F.floor(k / 65536).cast("long") % 256
    o4 = (k % 256).cast("long")
    ip_num = o1 * 16777216 + o2 * 65536 + o3 * 256 + o4
    dq = F.concat_ws(
        ".",
        o1.cast("string"),
        o2.cast("string"),
        o3.cast("string"),
        o4.cast("string"),
    )
    return o.select(
        "o_orderkey",
        dq.alias("ip_str"),
        ip_num.cast("long").alias("ip_num"),
        (F.floor(ip_num / 65536) * 65536).cast("long").alias("subnet16"),
        F.concat_ws(
            ".", o1.cast("string"), o2.cast("string"), F.lit("0.0/16")
        ).alias("subnet16_cidr"),
        ((o1 == 10) | ((o1 == 192) & (o2 == 168))).alias("is_private"),
    )


@register(
    "fn_encoding",
    oracle="""
    SELECT doc_id,
           base64(encode(substr(text, 1, 24)))            AS b64,
           decode(from_base64(base64(encode(text))))      AS b64_roundtrip,
           lower(hex(encode(substr(text, 1, 12))))        AS hex_prefix,
           md5(text)                                      AS digest_md5,
           lower(hex(sha256(text)))                       AS digest_sha256
    FROM documents
    """,
    tags=("function", "clickhouse"),
)
def fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding battery (ClickHouse base64Encode/hex/MD5/SHA256
    analogs): base64 of a prefix, a full encode→decode round-trip that
    must be the identity, lowercase hex, and the two digest functions —
    the content-addressing toolkit every artifact store and dedup layer
    leans on. Spark's base64/unbase64/hex/sha2 are JVM codegen; DuckDB
    spells sha256 as a hex string natively and Spark as binary, so both
    sides normalize to lowercase hex."""
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.base64(F.encode(F.substring(t, 1, 24), "utf-8")).alias("b64"),
        F.decode(F.unbase64(F.base64(F.encode(t, "utf-8"))), "utf-8").alias(
            "b64_roundtrip"
        ),
        F.lower(F.hex(F.encode(F.substring(t, 1, 12), "utf-8"))).alias(
            "hex_prefix"
        ),
        F.md5(t).alias("digest_md5"),
        F.lower(F.hex(F.sha2(t, 256))).alias("digest_sha256"),
    )


_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_oracle() -> str:
    lon_q = "CAST(FLOOR((lon + 180.0) / 360.0 * 32768.0) AS BIGINT)"
    lat_q = "CAST(FLOOR((lat + 90.0) / 180.0 * 32768.0) AS BIGINT)"
    code = f"({_spread_sql(lat_q)} | ({_spread_sql(lon_q)} << 1))"
    chars = " || ".join(
        f"substring('{_GEOHASH_ALPHABET}', "
        f"CAST((({code} >> {25 - 5 * g}) & 31) + 1 AS INT), 1)"
        for g in range(6)
    )
    return f"""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 17000) / 100.0 - 85.0  AS lat,
               (c_custkey % 35000) / 100.0 - 175.0 AS lon
        FROM customer
    )
    SELECT c_custkey,
           round(lat, 2)  AS lat,
           round(lon, 2)  AS lon,
           {code}         AS cell30,
           {chars}        AS geohash6
    FROM pts
    """


@register("fn_geohash", oracle=_geohash_oracle(), tags=("function", "geo", "clickhouse"))
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``geohashEncode`` analog: 6-character geohash (30 bits)
    of the key-derived synthetic coordinates from fn_geo.

    A geohash is exactly a Morton code over quantized (lon, lat) plus a
    base32 rendering — so the encode REUSES fn_morton's spread ladder
    (identical (shift, mask) steps emitted as both the Column tree and
    the oracle SQL): quantize each axis to 15 bits with the closed-form
    floor (no iterative bisection), interleave with lon on the odd/MSB
    bits per the geohash spec, then map the six 5-bit groups through the
    standard alphabet. Everything is integer arithmetic and
    whole-stage-codegen string ops; the raw 30-bit cell id is emitted
    alongside (`cell30`) because it is the actual JOIN/GROUP key a
    spatial pipeline uses at 100 TB — prefix-range scans and cell
    aggregations on a BIGINT, with the string form only for humans."""
    c = table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 17000) / 100.0 - 85.0
    lon = (F.col("c_custkey") % 35000) / 100.0 - 175.0
    lon_q = F.floor((lon + 180.0) / 360.0 * 32768.0).cast("long")
    lat_q = F.floor((lat + 90.0) / 180.0 * 32768.0).cast("long")
    code = _spread_col(lat_q).bitwiseOR(F.shiftleft(_spread_col(lon_q), 1))
    bound = c.select(
        "c_custkey",
        F.round(lat, 2).alias("lat"),
        F.round(lon, 2).alias("lon"),
        code.alias("cell30"),
    )
    alpha = F.lit(_GEOHASH_ALPHABET)
    geohash = F.concat(
        *[
            F.substring(
                alpha,
                (
                    F.shiftright(F.col("cell30"), 25 - 5 * g).bitwiseAND(F.lit(31))
                    + 1
                ).cast("int"),
                1,
            )
            for g in range(6)
        ]
    )
    return bound.select("c_custkey", "lat", "lon", "cell30", geohash.alias("geohash6"))


@register(
    "fn_geo",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 17000) / 100.0 - 85.0  AS lat,
               (c_custkey % 35000) / 100.0 - 175.0 AS lon
        FROM customer
    )
    SELECT c_custkey,
           round(lat, 2) AS lat,
           round(lon, 2) AS lon,
           round(2 * 6371.0088 * asin(sqrt(
               pow(sin(radians(lat) / 2), 2)
               + cos(radians(lat)) * cos(radians(0.0))
                 * pow(sin(radians(lon) / 2), 2)
           )), 3) AS dist_km,
           (lat BETWEEN 35.0 AND 60.0 AND lon BETWEEN -10.0 AND 30.0)
               AS in_europe_box,
           CASE WHEN lat >= 0 THEN 'N' ELSE 'S' END
               || CASE WHEN lon >= 0 THEN 'E' ELSE 'W' END AS quadrant
    FROM pts
    """,
    tags=("function", "geo", "clickhouse"),
)
def fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo function battery — the ClickHouse ``greatCircleDistance`` /
    ``pointInPolygon``-lite analogs: haversine distance to the origin,
    bounding-box membership, and hemisphere quadrant over synthetic
    per-customer coordinates (key-derived, so deterministic across
    engines with no geo columns in the fixtures).

    All trig runs JVM-side in whole-stage codegen (``radians/sin/cos/
    asin/sqrt`` are Catalyst expressions); distance rounded to 3 dp —
    libm vs JVM trig agree far beyond that, and the round pins the gate.
    Coordinates come from exact integer arithmetic, so lat/lon are
    bit-identical inputs on both sides."""
    c = table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 17000) / 100.0 - 85.0
    lon = (F.col("c_custkey") % 35000) / 100.0 - 175.0
    half = lambda x: F.pow(F.sin(F.radians(x) / 2), 2)  # noqa: E731
    dist = (
        2
        * 6371.0088
        * F.asin(
            F.sqrt(
                half(lat)
                + F.cos(F.radians(lat)) * F.cos(F.radians(F.lit(0.0))) * half(lon)
            )
        )
    )
    return c.select(
        "c_custkey",
        F.round(lat, 2).alias("lat"),
        F.round(lon, 2).alias("lon"),
        F.round(dist, 3).alias("dist_km"),
        ((lat >= 35.0) & (lat <= 60.0) & (lon >= -10.0) & (lon <= 30.0)).alias(
            "in_europe_box"
        ),
        F.concat(
            F.when(lat >= 0, "N").otherwise("S"),
            F.when(lon >= 0, "E").otherwise("W"),
        ).alias("quadrant"),
    )


@register(
    "fn_dict_lookup",
    oracle="""
    SELECT c.c_custkey,
           n.n_name                       AS nation_name,
           COALESCE(r.r_name, 'UNKNOWN')  AS region_name
    FROM customer c
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    """,
    tags=("function", "join"),
)
def fn_dict_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGet`` analog: dimension enrichment through an
    in-plan literal MAP instead of a join.  ClickHouse serves this from a
    pre-loaded external dictionary; Spark's equivalent is collecting the
    (small-by-contract) dimension once and baking it into the plan as a
    ``create_map`` literal probed with ``element_at`` — the fact scan
    then enriches in pure projection codegen with NO join operator and
    NO broadcast exchange at all, which beats even a broadcast join when
    the same dictionary is probed by many queries (one collect, reused
    plans).  The two-level probe (nation → region) mirrors a dictionary
    hierarchy; a missing key falls back to the dictGetOrDefault value.
    The oracle states the equivalent LEFT JOIN chain.

    Scale contract: dictionaries are bounded (thousands of entries), the
    same assumption ClickHouse's dictionary engine and every broadcast
    dim make — asserted here so a fact-sized table can never be
    collected into a plan literal."""
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n_rows = nation.collect()
    r_rows = region.collect()
    assert len(n_rows) + len(r_rows) < 100_000, "dictionary must stay bounded"
    name_map = F.create_map(
        *[F.lit(x) for row in n_rows for x in (row.n_nationkey, row.n_name)]
    )
    region_key_map = F.create_map(
        *[F.lit(x) for row in n_rows for x in (row.n_nationkey, row.n_regionkey)]
    )
    region_map = F.create_map(
        *[F.lit(x) for row in r_rows for x in (row.r_regionkey, row.r_name)]
    )
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.element_at(name_map, F.col("c_nationkey")).alias("nation_name"),
        F.coalesce(
            F.element_at(
                region_map, F.element_at(region_key_map, F.col("c_nationkey"))
            ),
            F.lit("UNKNOWN"),
        ).alias("region_name"),
    )


_HIER_MAX_DEPTH = 7  # keys < 10^7 in every fixture scale; asserted in-plan

_DICT_HIER_ORACLE = f"""
    WITH h AS (
        SELECT p_partkey,
               list_filter(
                   list_transform(range(1, {_HIER_MAX_DEPTH + 1}),
                                  i -> p_partkey // CAST(pow(10, i) AS BIGINT)),
                   x -> x > 0) AS ancestors
        FROM part
    )
    SELECT p_partkey,
           CAST(p_partkey AS VARCHAR)
             || CASE WHEN len(ancestors) > 0
                     THEN '>' || array_to_string(ancestors, '>')
                     ELSE '' END AS path,
           CAST(len(ancestors) AS BIGINT) AS depth,
           coalesce(ancestors[-1], p_partkey) AS root_key,
           (p_partkey = 7 OR list_contains(ancestors, 7)) AS under_7
    FROM h
"""


@register("fn_dict_hierarchy", oracle=_DICT_HIER_ORACLE, tags=("function", "clickhouse"))
def fn_dict_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGetHierarchy`` / ``dictIsIn`` analog: every key's
    full ancestor chain, depth, root, and an is-under-ancestor predicate,
    over the synthetic decimal-prefix hierarchy parent(k) = k div 10 (a
    deterministic 10-ary tree over p_partkey — org charts, BOMs,
    category trees all reduce to this shape).

    This hierarchy's parents are CLOSED-FORM (the ancestor at level i is
    k div 10^i), so the whole chain materializes as one codegen'd
    transform over a literal level sequence — zero joins, zero
    iterations, embarrassingly parallel. The docstring contract for the
    general case: an arbitrary parent POINTER column needs the iterative
    min-label/join loop (see connected_components) or a recursive CTE —
    this op pins the semantics (path encoding, depth, root election,
    membership predicate) that such a loop must reproduce. Depth is
    bounded by the key domain (10^{_HIER_MAX_DEPTH}); keys beyond it
    would silently truncate, so production sizes the level sequence to
    the dictionary's declared depth."""
    p = table(spark, sf_dir, "part").select("p_partkey")
    # pow(10, i) is exact in double for i <= 7, so cast-to-long is the
    # true power; the long/long division runs in double and the cast
    # back truncates toward zero == integer division for the
    # non-negative sub-2^53 keys the fixture guarantees.
    anc = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.lit(_HIER_MAX_DEPTH)),
            lambda i: (
                F.col("p_partkey")
                / F.pow(F.lit(10.0), i.cast("double")).cast("long")
            ).cast("long"),
        ),
        lambda x: x > 0,
    )
    h = p.select("p_partkey", anc.alias("ancestors"))
    return h.select(
        "p_partkey",
        F.concat(
            F.col("p_partkey").cast("string"),
            F.when(
                F.size("ancestors") > 0,
                F.concat(F.lit(">"), F.array_join("ancestors", ">")),
            ).otherwise(F.lit("")),
        ).alias("path"),
        F.size("ancestors").cast("long").alias("depth"),
        # try_element_at: ANSI element_at(-1) THROWS on a root's empty
        # ancestor array; DuckDB's list[-1] yields NULL — match that.
        F.coalesce(F.try_element_at("ancestors", F.lit(-1)), F.col("p_partkey")).alias(
            "root_key"
        ),
        (
            (F.col("p_partkey") == 7) | F.array_contains("ancestors", F.lit(7))
        ).alias("under_7"),
    )
