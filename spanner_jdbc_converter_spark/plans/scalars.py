"""Scalar, conditional, array, and map function surface (SURVEY.md §2.7).

The reference computes no scalar functions over data (its only string
work is SQL templating, REF/data/UploadWorker.java:53-57); this module
is the capability-parity surface a query engine must ship.  Everything
is a built-in JVM expression inside whole-stage codegen — no Python in
any hot path.

Cross-engine notes: every function here is restricted to the subset
where Spark and DuckDB agree exactly — 1-based string/list indexing,
binary (codepoint) string ordering on the pure-ASCII fixtures, and the
proven-safe regex character classes (see operators/text.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.catalog import load_table
from spanner_jdbc_converter_spark.plans.registry import register


@register(
    "string_functions_extended",
    oracle="""
    SELECT p_partkey,
           LPAD(p_name, 20, '*') AS padded_l,
           RPAD(p_name, 20, '.') AS padded_r,
           TRIM(CONCAT(' ', p_name, ' ')) AS trimmed,
           TRANSLATE(p_name, 'aeiou', '01234') AS translated,
           REPEAT(p_brand, 2) AS brand_twice,
           REVERSE(p_name) AS reversed,
           SPLIT_PART(p_name, ' ', 1) AS first_word,
           CAST(STRPOS(p_name, 'i') AS BIGINT) AS pos_i,
           LEFT(p_name, 3) AS l3,
           RIGHT(p_name, 3) AS r3,
           REPLACE(p_name, ' ', '_') AS snake,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS no_vowels
    FROM part
    WHERE p_partkey <= 500
    """,
)
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface: pad/trim/translate/repeat/reverse/
    split_part/position/left/right/replace/regexp_replace in one
    projection.  Spark instr ≡ DuckDB strpos (1-based, 0 when absent);
    Spark regexp_replace is global by default ≡ DuckDB with the 'g'
    flag; the character-class-only pattern sits in the Java∩RE2 safe
    subset."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.lpad(name, 20, "*").alias("padded_l"),
        F.rpad(name, 20, ".").alias("padded_r"),
        F.trim(F.concat(F.lit(" "), name, F.lit(" "))).alias("trimmed"),
        F.translate(name, "aeiou", "01234").alias("translated"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.reverse(name).alias("reversed"),
        F.expr("split_part(p_name, ' ', 1)").alias("first_word"),
        F.instr(name, "i").cast("long").alias("pos_i"),
        F.expr("left(p_name, 3)").alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.expr("replace(p_name, ' ', '_')").alias("snake"),
        F.regexp_replace(name, "[aeiou]", "").alias("no_vowels"),
    )


@register(
    "conditional_null_surface",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           CAST(NULLIF(c_nationkey, 0) AS BIGINT) AS nation_or_null,
           COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS seg_coalesced,
           GREATEST(c_acctbal, 0.0) AS bal_floor0,
           LEAST(c_acctbal, 0.0) AS bal_cap0
    FROM customer
    """,
)
def conditional_null_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-handling surface: CASE bands, NULLIF (null
    injection), COALESCE (null repair), GREATEST/LEAST clamps — pure
    ANSI semantics identical on both engines, all codegen'd.  No float
    math: greatest/least select one of the original doubles."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("bal_band"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).cast("long").alias("nation_or_null"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "seg_coalesced"
        ),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(0.0)).alias("bal_cap0"),
    )


@register(
    "array_functions_surface",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           list_sort(string_split(text, ' '))[1] AS first_sorted,
           list_sort(string_split(text, ' '))[-1] AS last_sorted,
           array_to_string(list_sort(string_split(text, ' '))[1:3], '-') AS head3,
           list_contains(string_split(text, ' '), 'the') AS has_the
    FROM documents
    """,
)
def array_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over tokenized text: size, distinct-size, sorted
    first/last element, slice+join, membership.  Spark split ≡ DuckDB
    string_split on a single-space delimiter; 1-based element_at and
    inclusive slice bounds line up; sort order is binary-codepoint on
    the ASCII corpus.

    Scale: arrays live inside one projection — no explode/shuffle; for
    the token-level aggregations that DO need distribution see
    operators/text.py (posexplode + window pattern)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sorted_toks = F.array_sort(toks)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.element_at(sorted_toks, 1).alias("first_sorted"),
        F.element_at(sorted_toks, -1).alias("last_sorted"),
        F.array_join(F.slice(sorted_toks, 1, 3), "-").alias("head3"),
        F.array_contains(toks, "the").alias("has_the"),
    )


@register(
    "map_functions_surface",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE event_id <= 2000
    """,
)
def map_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed surface: JSON props parsed into map<string,long>, then
    map_keys (sorted for determinism — map iteration order is engine-
    internal), key count, and element_at lookup.  Complements
    events_json_props (which extracts without materializing a map)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    m = F.from_json(F.col("props"), "map<string,long>")
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").cast("long").alias("k_value"),
    )


@register(
    "text_top_tokens",
    oracle="""
    SELECT token,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 20
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/UDTF shape: explode the token array into rows, then
    corpus-wide term statistics with a deterministic top-20 (count
    DESC, token tiebreak) — the inverted-index build step of the text
    pipeline as a corpus entry.

    Scale: explode is pipelined inside the scan stage (no shuffle until
    the groupBy); partial aggregation collapses each partition to its
    distinct tokens before the exchange, and the final top-20 is a
    TakeOrderedAndProject, never a full sort."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(20)
    )


@register(
    "notin_null_semantics",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_kept
    FROM customer
    WHERE NULLIF(c_nationkey, 7) NOT IN
          (SELECT s_nationkey FROM supplier WHERE s_acctbal < -800)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def notin_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI NOT IN with a nullable probe: customers whose (NULLified)
    nation key is not among poor suppliers' nations.  A NULL probe makes
    the predicate UNKNOWN — nation-7 customers are excluded even though
    they match nothing, which a naive anti join would get wrong; Spark
    plans the null-aware anti join form.  Kept in SQL so the plan shows
    the true NOT IN translation rather than a hand-decorrelated shape."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_nin")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_nin")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_kept
        FROM customer_nin
        WHERE NULLIF(c_nationkey, 7) NOT IN
              (SELECT s_nationkey FROM supplier_nin WHERE s_acctbal < -800)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@register(
    "date_functions_surface",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT)
             AS days_to_epoch_end,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_quarter,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(EXTRACT(DOW FROM o_orderdate) AS BIGINT) AS dow,
           CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS doy,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def date_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval surface: day and month interval arithmetic,
    day-difference, last_day, and the dow/doy/quarter extraction family.
    Cross-engine notes: Spark date_add/add_months on a DATE ≡ DuckDB
    ``+ INTERVAL``; Spark datediff(end, start) ≡ DuckDB
    date_diff('day', start, end) (argument order flips); Spark
    dayofweek is 1=Sunday..7 while DuckDB DOW is 0=Sunday..6 — aligned
    via the explicit ``-1``.  DATE outputs are emitted as ISO strings:
    the drivers' pandas bridges disagree on the Python type of a DATE
    (datetime.date vs Timestamp), which would fail the value compare
    even when the dates are equal."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.cast("string").alias("order_date"),
        F.date_add(d, 30).cast("string").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long").alias(
            "days_to_epoch_end"
        ),
        F.add_months(d, 3).cast("string").alias("plus_quarter"),
        F.last_day(d).cast("string").alias("month_end"),
        (F.dayofweek(d) - 1).cast("long").alias("dow"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.quarter(d).cast("long").alias("qtr"),
    )
