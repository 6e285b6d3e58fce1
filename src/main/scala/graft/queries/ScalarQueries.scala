package graft.queries

import graft.{QueryDef, QueryModule}
import graft.QueryDef._
import org.apache.spark.sql.functions._

/** Scalar-function surface: string/date/math/conditional/array/map/json.
  * All built-in `functions._` (whole-stage codegen; no UDFs anywhere).
  * Cross-engine typing: DuckDB returns BIGINT where Spark returns INT for
  * several functions (length, rank, datediff…) — each side is cast
  * explicitly so the compared schema is identical.
  */
object ScalarQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_str_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up_name"),
            lower(col("p_brand")).as("lo_brand"),
            substring(col("p_name"), 1, 8).as("name8"),
            length(col("p_name")).cast("long").as("name_len"),
            concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
            // translate, not regexp_replace: single-char literal
            // substitution needs no regex machinery per row
            translate(col("p_type"), " ", "_").as("type_u"),
            lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
            trim(col("p_name")).as("name_trim"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_name) AS up_name, LOWER(p_brand) AS lo_brand,
             |SUBSTRING(p_name, 1, 8) AS name8, LENGTH(p_name) AS name_len,
             |p_brand || '-' || p_type AS brand_type,
             |REPLACE(p_type, ' ', '_') AS type_u,
             |LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
             |TRIM(p_name) AS name_trim
             |FROM part ORDER BY p_partkey""".stripMargin)),

    QueryDef(
      "q_date_funcs",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dy"),
            date_trunc("month", col("o_orderdate")).as("mon_start"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |CAST(year(o_orderdate) AS INT) AS yr,
             |CAST(month(o_orderdate) AS INT) AS mo,
             |CAST(day(o_orderdate) AS INT) AS dy,
             |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
             |o_orderdate + INTERVAL 30 DAY AS plus30,
             |CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QueryDef(
      "q_math_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            abs(col("p_size") - 25).as("abs_sz"),
            toDbl(dec(col("p_retailprice"))).as("rp_dec"),
            floor(col("p_retailprice")).cast("long").as("fl"),
            ceil(col("p_retailprice")).cast("long").as("ce"),
            pmod(col("p_partkey"), lit(7)).as("md"),
            pow(col("p_size"), 2).as("pw"),
            sqrt(col("p_size")).as("sq"),
            toDbl(round(dec(col("p_retailprice")) * 3, 1).cast(Dec38)).as("rd"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, ABS(p_size - 25) AS abs_sz,
             |CAST(CAST(p_retailprice AS DECIMAL(38,6)) AS DOUBLE) AS rp_dec,
             |CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
             |CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
             |((p_partkey % 7) + 7) % 7 AS md,
             |POWER(p_size, 2) AS pw, SQRT(p_size) AS sq,
             |CAST(CAST(ROUND(CAST(p_retailprice AS DECIMAL(38,6)) * 3, 1) AS DECIMAL(38,6)) AS DOUBLE) AS rd
             |FROM part ORDER BY p_partkey""".stripMargin)),

    QueryDef(
      "q_case_null",
      (s, dir) =>
        t(s, dir, "customer")
          .select(
            col("c_custkey"),
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 5000, "mid")
              .otherwise("high").as("bal_band"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<none>")).as("seg"),
            (col("c_nationkey") <=> 3).as("is_n3"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
             |COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<none>') AS seg,
             |c_nationkey IS NOT DISTINCT FROM 3 AS is_n3
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_array_funcs",
      // ArrayType surface over the embedding column: size, element access,
      // higher-order filter. Float cells compare bit-exactly (no float
      // arithmetic in compared columns; the lambda compares as double on
      // both engines).
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("emb_len"),
            element_at(col("embedding"), 1).as("emb_first"),
            size(filter(col("embedding"), x => x.cast("double") > 0.5))
              .cast("long").as("n_big"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id, LEN(embedding) AS emb_len, embedding[1] AS emb_first,
             |LEN(LIST_FILTER(embedding, x -> CAST(x AS DOUBLE) > 0.5)) AS n_big
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    QueryDef(
      "q_map_funcs",
      (s, dir) => {
        val m = map(lit("type"), col("event_type"), lit("id"), col("event_id").cast("string"))
        t(s, dir, "events")
          .select(
            col("event_id"),
            array_join(map_keys(m), ",").as("mkeys"),
            element_at(m, "type").as("tval"),
            size(map_values(m)).cast("long").as("nvals"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |ARRAY_TO_STRING(MAP_KEYS(m), ',') AS mkeys,
             |m['type'][1] AS tval,
             |LEN(MAP_VALUES(m)) AS nvals
             |FROM (SELECT event_id,
             |  MAP(['type','id'], [event_type, CAST(event_id AS VARCHAR)]) AS m
             |  FROM events) sub
             |ORDER BY event_id""".stripMargin)),

    QueryDef(
      "q_json_funcs",
      (s, dir) =>
        // two projections so the JSON parse happens ONCE per row (jki
        // derives from the materialized jk attribute) — a second
        // get_json_object would re-tokenize the whole props string
        t(s, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("jk"))
          .select(col("event_id"), col("jk"), col("jk").cast("int").as("jki"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |json_extract_string(props, '$.k') AS jk,
             |CAST(json_extract_string(props, '$.k') AS INT) AS jki
             |FROM events ORDER BY event_id""".stripMargin)),
  )
}
