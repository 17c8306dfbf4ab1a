"""Scalar function surface (SURVEY §2.3 H): string / date / math / case.

Functions chosen so Spark and DuckDB semantics align exactly; where
dialects differ (dayofweek origin, datediff arg order) the oracle SQL
compensates, documented inline.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

# ------------------------------------------------------- strings


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_us"),
        F.regexp_extract("p_name", "^(\\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.reverse("p_brand").alias("brand_rev"),
        F.levenshtein("p_brand", "p_type").alias("lev_bt"),
    )


Q_STRING_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS up_name,
       LOWER(p_brand) AS lo_brand,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name5,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       REGEXP_REPLACE(p_type, ' ', '_', 'g') AS type_us,
       REGEXP_EXTRACT(p_name, '^(\\w+)', 1) AS first_word,
       LEN(STRING_SPLIT(p_name, ' ')) AS n_words,
       LPAD(p_brand, 12, '*') AS brand_pad,
       TRIM('  x  ') AS trimmed,
       REVERSE(p_brand) AS brand_rev,
       LEVENSHTEIN(p_brand, p_type) AS lev_bt
FROM part
"""

# ------------------------------------------------------- dates


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofweek("o_orderdate").cast("long").alias("dow1"),  # 1=Sunday
        F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias("month_start_epoch"),
        F.last_day("o_orderdate").cast("string").alias("eom"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus3mo"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


# DuckDB dayofweek() is 0=Sunday → +1 aligns with Spark's 1=Sunday.
Q_DATE_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       quarter(o_orderdate) AS qtr,
       dayofweek(o_orderdate) + 1 AS dow1,
       CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
       CAST(CAST(last_day(o_orderdate) AS DATE) AS VARCHAR) AS eom,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3mo,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
"""


def q_datediff_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    dd = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.min(dd).cast("long").alias("min_days"),
            F.max(dd).cast("long").alias("max_days"),
            (F.sum(dd.cast("long")).cast("double") / F.count(F.lit(1))).alias("avg_days"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


Q_DATEDIFF_SQL = """
SELECT o_orderpriority,
       MIN(datediff('day', o_orderdate, l_shipdate)) AS min_days,
       MAX(datediff('day', o_orderdate, l_shipdate)) AS max_days,
       CAST(SUM(datediff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*) AS avg_days,
       COUNT(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

# ------------------------------------------------------- math
# min/max only (order-independent); avoids libm last-ulp drift that
# sum-based aggregates would amplify.


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.min(F.sqrt("p_retailprice")).alias("min_sqrt_price"),
            F.max(F.sqrt("p_retailprice")).alias("max_sqrt_price"),
            F.max(F.abs(F.col("p_size") - 25)).cast("long").alias("max_abs_off"),
            F.min(F.floor("p_retailprice")).cast("long").alias("min_floor"),
            F.max(F.ceil("p_retailprice")).cast("long").alias("max_ceil"),
            F.max(F.col("p_size") * F.col("p_size")).cast("long").alias("max_size_sq"),
            F.max(F.round("p_retailprice", 1)).alias("max_round1"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("p_brand")
    )


Q_MATH_SQL = """
SELECT p_brand,
       MIN(sqrt(p_retailprice)) AS min_sqrt_price,
       MAX(sqrt(p_retailprice)) AS max_sqrt_price,
       MAX(abs(p_size - 25)) AS max_abs_off,
       MIN(CAST(floor(p_retailprice) AS BIGINT)) AS min_floor,
       MAX(CAST(ceil(p_retailprice) AS BIGINT)) AS max_ceil,
       MAX(CAST(p_size AS BIGINT) * p_size) AS max_size_sq,
       MAX(round(p_retailprice, 1)) AS max_round1,
       COUNT(*) AS n
FROM part
GROUP BY p_brand
"""

# ------------------------------------------------------- case / null


def q_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    label = (
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
    )
    urgent = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    nn = F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("(low)"))
    return (
        orders.select(label.alias("status_label"), urgent.alias("is_urgent"), nn.alias("prio_nn"))
        .groupBy("status_label", "prio_nn")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("is_urgent").cast("long").alias("n_urgent"))
        .orderBy("status_label", "prio_nn")
    )


Q_CASE_SQL = """
SELECT CASE WHEN o_orderstatus = 'F' THEN 'finished'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'other' END AS status_label,
       COALESCE(NULLIF(o_orderpriority, '5-LOW'), '(low)') AS prio_nn,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS n_urgent
FROM orders
GROUP BY 1, 2
"""

# ------------------------------------------------------- like / regex filters


def q_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.where(
            F.col("p_name").like("%red%")
            | F.col("p_name").rlike("^(small|large)\\s")
            | F.col("p_type").isin("ECONOMY", "PROMO")
        )
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("p_type")
    )


Q_LIKE_SQL = """
SELECT p_type, COUNT(*) AS n
FROM part
WHERE p_name LIKE '%red%'
   OR regexp_matches(p_name, '^(small|large)\\s')
   OR p_type IN ('ECONOMY','PROMO')
GROUP BY p_type
"""

# ------------------------------------------------------- arrays / higher-order


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order transform/filter/aggregate.

    Every array-typed intermediate is serialized to a CSV string in the
    final projection — the harness canonicalizer hashes scalar cells only,
    so arrays must never reach the output schema.
    """
    nat = load_table(spark, sf_dir, "nation")
    arr = F.sequence(F.lit(1), (F.col("n_nationkey") % 5) + 1)

    def csv(col):
        return F.array_join(col.cast("array<string>"), ",")

    return nat.select(
        "n_nationkey",
        csv(arr).alias("seq"),
        F.size(arr).cast("long").alias("seq_len"),
        F.aggregate(arr, F.lit(0), lambda a, x: a + x).cast("long").alias("seq_sum"),
        csv(F.transform(arr, lambda x: x * x)).alias("seq_sq"),
        csv(F.filter(arr, lambda x: x % 2 == 0)).alias("seq_even"),
        F.array_contains(arr, 3).alias("has3"),
        csv(F.slice(arr, 1, 2)).alias("first2"),
        csv(F.sort_array(F.reverse(arr))).alias("resorted"),
    )


Q_ARRAY_SQL = """
SELECT n_nationkey,
       array_to_string(generate_series(1, (n_nationkey % 5) + 1), ',') AS seq,
       len(generate_series(1, (n_nationkey % 5) + 1)) AS seq_len,
       list_reduce(list_prepend(0, generate_series(1, (n_nationkey % 5) + 1)),
                   (a, x) -> a + x) AS seq_sum,
       array_to_string(list_transform(generate_series(1, (n_nationkey % 5) + 1), x -> x * x), ',') AS seq_sq,
       COALESCE(array_to_string(list_filter(generate_series(1, (n_nationkey % 5) + 1), x -> x % 2 = 0), ','), '') AS seq_even,
       list_contains(generate_series(1, (n_nationkey % 5) + 1), 3) AS has3,
       array_to_string(list_slice(generate_series(1, (n_nationkey % 5) + 1), 1, 2), ',') AS first2,
       array_to_string(list_sort(list_reverse(generate_series(1, (n_nationkey % 5) + 1))), ',') AS resorted
FROM nation
"""


# ------------------------------------------------------- strings, part 2


def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.substring("p_name", 1, 3).alias("left3"),
        F.substring("p_name", -3, 3).alias("right3"),
        F.instr("p_name", "e").cast("long").alias("pos_e"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("ECO").alias("eco"),
        F.col("p_name").endswith("bolt").alias("is_bolt"),
        F.format_string("%s#%03d", "p_brand", "p_size").alias("brand_size"),
        F.ascii("p_brand").cast("long").alias("first_code"),
        F.chr(F.lit(65) + (F.col("p_size") % 26)).alias("size_letter"),
    )


Q_STRING2_SQL = """
SELECT p_partkey,
       translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
       repeat('ab', 3) AS rep,
       left(p_name, 3) AS left3,
       right(p_name, 3) AS right3,
       strpos(p_name, 'e') AS pos_e,
       contains(p_name, 'red') AS has_red,
       starts_with(p_type, 'ECO') AS eco,
       ends_with(p_name, 'bolt') AS is_bolt,
       printf('%s#%03d', p_brand, p_size) AS brand_size,
       ascii(p_brand) AS first_code,
       chr(65 + (p_size % 26)) AS size_letter
FROM part
"""

# ------------------------------------------------------- agg extras


def q_agg_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (with a unique ordering value so the argmax is
    well-defined), bool_and/bool_or."""
    orders = load_table(spark, sf_dir, "orders")
    # cents*1e7 + orderkey: integer-exact in double, unique per row
    ordval = F.round(F.col("o_totalprice") * 100).cast("long") * 10000000 + F.col("o_orderkey")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", ordval).alias("priciest_order"),
            F.min_by("o_orderkey", ordval).alias("cheapest_order"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


Q_AGG_EXTRAS_SQL = """
SELECT o_orderstatus,
       arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
           AS priciest_order,
       arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
           AS cheapest_order,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
"""


def q_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML function surface: serialize each order to an XML fragment,
    then recover every field through the XML readers — attribute and
    text() extraction via xpath_string/xpath_int, full-fragment
    parsing via from_xml with an explicit schema. The oracle computes
    the same values straight from the base columns (DuckDB has no XML
    reader), so a hash match proves the Spark XML round-trip is
    lossless."""
    orders = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey"),
        F.lit('"><status>'),
        F.col("o_orderstatus"),
        F.lit("</status><priority>"),
        F.col("o_orderpriority"),
        F.lit("</priority><total>"),
        F.format_string("%.2f", "o_totalprice"),
        F.lit("</total></order>"),
    )
    return (
        orders.select("o_orderkey", xml.alias("_xml"))
        .select(
            "o_orderkey",
            F.xpath_int("_xml", F.lit("/order/@id")).cast("long").alias("xml_id"),
            F.xpath_string("_xml", F.lit("/order/status/text()")).alias("xml_status"),
            F.from_xml("_xml", "status string, priority string, total double").alias("_p"),
        )
        .select(
            "o_orderkey",
            "xml_id",
            "xml_status",
            F.col("_p.priority").alias("xml_priority"),
            F.col("_p.total").alias("xml_total"),
        )
        .orderBy("o_orderkey")
    )


Q_XML_SQL = """
SELECT o_orderkey,
       o_orderkey AS xml_id,
       o_orderstatus AS xml_status,
       o_orderpriority AS xml_priority,
       CAST(printf('%.2f', o_totalprice) AS DOUBLE) AS xml_total
FROM orders
ORDER BY o_orderkey
"""


QUERIES = {
    "q_xml_funcs": QuerySpec(q_xml_funcs, Q_XML_SQL, "XML round-trip (xpath + from_xml)"),
    "q_string_funcs2": QuerySpec(q_string_funcs2, Q_STRING2_SQL, "string surface, part 2"),
    "q_agg_extras": QuerySpec(q_agg_extras, Q_AGG_EXTRAS_SQL, "max_by/min_by/bool aggs"),
    "q_string_funcs": QuerySpec(q_string_funcs, Q_STRING_SQL, "string function surface"),
    "q_date_funcs": QuerySpec(q_date_funcs, Q_DATE_SQL, "date function surface"),
    "q_datediff_fulfillment": QuerySpec(q_datediff_fulfillment, Q_DATEDIFF_SQL, "datediff+agg"),
    "q_math_funcs": QuerySpec(q_math_funcs, Q_MATH_SQL, "math function surface"),
    "q_case_null": QuerySpec(q_case_null, Q_CASE_SQL, "case/coalesce/nullif"),
    "q_like_filters": QuerySpec(q_like_filters, Q_LIKE_SQL, "like/rlike/isin"),
    "q_array_funcs": QuerySpec(q_array_funcs, Q_ARRAY_SQL, "arrays + higher-order fns"),
}
