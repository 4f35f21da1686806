"""Scalar-function coverage (SURVEY.md §2.2 row 'Scalar functions' — the
reference only has per-type string→value parses; this is the full
string/date/math/array/json surface).

Everything stays JVM-side in whole-stage codegen — no Python UDFs here.
Cross-engine notes are inline where Spark and DuckDB disagree on names or
conventions (dayofweek origin, strpos vs instr, list indexing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2db_spark.registry import query
from csv2db_spark.sources import load_table


@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           lower(p_type) AS type_lc,
           cast(length(p_name) as bigint) AS name_len,
           substr(p_name, 1, 5) AS name_pfx,
           p_brand || '/' || p_type AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           lpad(cast(p_size as varchar), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           cast(strpos(p_name, 'e') as bigint) AS first_e,
           split_part(p_name, ' ', 1) AS first_word,
           (p_name LIKE '%al%') AS has_al
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "e").cast("long").alias("first_e"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.col("p_name").like("%al%").alias("has_al"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           cast(year(o_orderdate) as bigint) AS yr,
           cast(month(o_orderdate) as bigint) AS mth,
           cast(day(o_orderdate) as bigint) AS dom,
           cast(dayofweek(o_orderdate) + 1 as bigint) AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           cast(last_day(cast(o_orderdate as date)) as timestamp) AS eom,
           cast(datediff('day', cast(o_orderdate as date), DATE '2000-01-01') as bigint)
               AS days_to_y2k
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dayofweek origin differs: Spark 1=Sunday, DuckDB 0=Sunday — the
    # oracle adds 1 to line up.
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DATE outputs are avoided engine-wide: pandas renders Spark DATE as
        # datetime.date but DuckDB DATE as datetime64 — cast to timestamp.
        F.last_day(F.col("o_orderdate").cast("date"))
        .cast("timestamp_ntz")
        .alias("eom"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0) AS abs_dev,
           sqrt(l_extendedprice) AS sqrt_price,
           floor(l_extendedprice) AS floor_price,
           ceil(l_extendedprice) AS ceil_price,
           l_quantity * l_quantity AS qty_sq,
           cast(l_orderkey % 7 as bigint) AS key_mod7,
           round(ln(l_extendedprice), 6) AS ln_price,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           cast(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sqrt/abs/floor/ceil/% are IEEE-exact → bit-identical; ln differs by
    # <=1 ulp across libm implementations → round(...,6) (values are
    # transcendental, never at a rounding boundary). pow is written as
    # x*x (one exact IEEE multiply) for the same reason.
    li = load_table(spark, sf_dir, "lineitem")
    # DuckDB floor/ceil on double return double; Spark returns... double too
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_dev"),
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        F.floor("l_extendedprice").cast("double").alias("floor_price"),
        F.ceil("l_extendedprice").cast("double").alias("ceil_price"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           cast(len(embedding) as bigint) AS n_dims,
           cast(embedding[1] as double) AS first_dim,
           cast(embedding[64] as double) AS last_dim,
           list_sum(list_transform(embedding[1:4], x -> cast(x as double)))
               AS head_sum
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # element_at / DuckDB list indexing are both 1-based. head_sum folds
    # elements left-to-right in both engines after a per-element cast to
    # double — identical IEEE sequence.
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.element_at("embedding", 64).cast("double").alias("last_dim"),
        F.aggregate(
            F.slice("embedding", 1, 4),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        ).alias("head_sum"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') as bigint) AS k_val,
           (cast(json_extract_string(props, '$.k') as bigint) >= 50) AS k_high
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k >= 50).alias("k_high"),
    )


@query(
    "q_fn_casewhen",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS priority_class,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def q_fn_casewhen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cls = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
    )
    return o.groupBy(cls.alias("priority_class")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "q_fn_levenshtein",
    oracle="""
    WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    b AS (
      SELECT doc_id,
             array_to_string(
               (string_split(text, ' '))[1:len(string_split(text, ' ')) - 5],
               ' ') AS text
      FROM documents WHERE doc_id < 20
    )
    SELECT a.doc_id,
           levenshtein(a.text, b.text) AS edit_dist,
           1.0 - levenshtein(a.text, b.text)
                 / greatest(length(a.text), length(b.text)) AS sim_ratio
    FROM a JOIN b USING (doc_id)
    """,
)
def q_fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between each doc and its 5-tokens-truncated variant —
    the fuzzy-matching primitive for near-dup adjudication. Quadratic in
    string length: at scale apply only to candidate pairs (LSH output),
    never corpus-wide."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    toks = F.split("text", " ")
    trunc = F.array_join(F.slice(toks, 1, F.size(toks) - 5), " ")
    pair = docs.select("doc_id", "text", trunc.alias("text_b"))
    lev = F.levenshtein("text", "text_b")
    return pair.select(
        "doc_id",
        lev.alias("edit_dist"),
        (
            F.lit(1.0)
            - lev / F.greatest(F.length("text"), F.length("text_b"))
        ).alias("sim_ratio"),
    )


@query(
    "q_udtf_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id,
           CAST(i - 1 AS INT) AS pos,
           t[i] || ' ' || t[i + 1] AS gram
    FROM toks, unnest(generate_series(1, len(t) - 1)) u(i)
    """,
)
def q_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, Spark 4 surface): one
    input row -> many output rows with its own schema, applied via
    LATERAL join in SQL. The row-multiplying escape hatch when explode
    over a built-in expression can't express the transform. (This bigram
    case IS expressible relationally — the oracle proves the UDTF matches
    the relational semantics exactly.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, gram string")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("c2s_bigrams", Bigrams)
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 10
    ).createOrReplaceTempView("c2s_docs_sub")
    return spark.sql(
        "SELECT doc_id, pos, gram FROM c2s_docs_sub, LATERAL c2s_bigrams(text)"
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS views,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-user map<event_type, count> built with
    map_from_entries(collect_list(struct)), consumed via element_at and
    map_keys. The oracle states the same facts as conditional counts —
    proving the map construction/extraction path preserves them."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("m", "view"), F.lit(0)).alias("views"),
        F.size(F.map_keys("m")).cast("long").alias("n_types"),
    )


@query(
    "q_fn_struct",
    oracle="""
    WITH s AS (
      SELECT c_custkey,
             {'nation': c_nationkey, 'balance_cents':
               CAST(round(c_acctbal * 100) AS BIGINT)} AS acct
      FROM customer
    )
    SELECT c_custkey,
           acct.nation AS nation,
           acct.balance_cents AS balance_cents,
           acct.balance_cents > 500000 AS high_balance
    FROM s
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested StructType build + dotted field access — the nested-record
    shape every log/JSON pipeline carries (the reference's type system
    has no nesting at all, SURVEY.md §1.3)."""
    c = load_table(spark, sf_dir, "customer")
    acct = F.struct(
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("balance_cents"),
    )
    return c.select("c_custkey", acct.alias("acct")).select(
        "c_custkey",
        F.col("acct.nation").alias("nation"),
        F.col("acct.balance_cents").alias("balance_cents"),
        (F.col("acct.balance_cents") > 500000).alias("high_balance"),
    )
