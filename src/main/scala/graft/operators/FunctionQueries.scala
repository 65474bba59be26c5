package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Parity._

/** Scalar-function inventory (SURVEY.md §2.2): string, date/time, math,
  * array (+ generator/explode), and JSON/map functions.
  *
  * All expressions are Spark built-ins — fully codegen'd inside a single
  * WholeStageCodegen project over the scan; no UDFs, no shuffle except the
  * terminal sort. Computed integral outputs are cast to BIGINT because
  * DuckDB's scalar functions (length, year, date_diff, …) return BIGINT
  * while Spark's return INT — the driver compares values after a
  * column-name sort, so types must line up.
  */
object FunctionQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q_str_funcs" -> ((s, d) =>
      part(s, d)
        .filter(col("p_name").like("%e%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("brand_low"),
          substring(col("p_type"), 1, 4).as("type_pre"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("tag"),
          regexp_replace(col("p_name"), " ", "_").as("underscored"),
          regexp_extract(col("p_brand"), "[0-9]+$", 0).as("brand_num"))
        .orderBy("p_partkey")),

    "q_date_funcs" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          trunc(col("o_orderdate"), "month").as("mon_start"),
          datediff(lit("1995-01-01").cast("date"), to_date(col("o_orderdate")))
            .cast("long").as("days_to_ref"))
        .orderBy("o_orderkey")),

    "q_math_funcs" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // floor2, not round: cross-engine bit-exact on money (Parity).
          floor2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
                   * (lit(1.0) + col("l_tax"))).as("charge"),
          abs(col("l_quantity") - 25).as("qdev"),
          floor(col("l_quantity")).as("qfloor"),
          ceil(col("l_quantity")).as("qceil"),
          (col("l_orderkey") % 7).as("okmod"),
          // raw sqrt: both engines evaluate the same IEEE op → identical bits
          sqrt(col("l_quantity")).as("qsqrt"))
        // lineitem has no unique key: order by every output column (§7.6).
        .orderBy("l_orderkey", "l_linenumber", "charge", "qdev", "qfloor",
                 "qceil", "okmod", "qsqrt")),

    "q_array_funcs" -> ((s, d) =>
      // split → array scalars + explode (Catalyst Generator) back to rows.
      documents(s, d)
        .withColumn("tokens", split(col("text"), " "))
        .select(
          col("doc_id"),
          explode(slice(col("tokens"), 1, 3)).as("token"),
          size(col("tokens")).cast("long").as("n_tokens"),
          array_contains(col("tokens"), "data").as("has_data"))
        .orderBy("doc_id", "token")),

    "q_json_map_funcs" -> ((s, d) =>
      events(s, d)
        .select(
          col("event_id"), col("user_id"),
          // TRY_CAST on BOTH sides: a non-integral k would throw under
          // the engine's ANSI cast and ERROR the DuckDB oracle's plain
          // CAST — one bad JSON value must read as one NULL, not kill
          // the query (r18 self-review)
          expr("TRY_CAST(get_json_object(props, '$.k') AS BIGINT)")
            .as("k_val"),
          // build a map and read it back: MapType surface, fully codegen'd
          element_at(map(lit("v"), col("value")), "v").as("v_roundtrip"),
          length(col("props")).cast("long").as("props_len"))
        .orderBy("event_id"))
  )

  def oracles: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS brand_low,
        |       substr(p_type, 1, 4) AS type_pre,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       concat_ws('|', p_brand, p_type) AS tag,
        |       replace(p_name, ' ', '_') AS underscored,
        |       regexp_extract(p_brand, '[0-9]+$') AS brand_num
        |FROM part WHERE p_name LIKE '%e%' ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
        |       date_diff('day', CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_to_ref
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) / 100 AS charge,
        |       abs(l_quantity - 25) AS qdev,
        |       CAST(floor(l_quantity) AS BIGINT) AS qfloor,
        |       CAST(ceil(l_quantity) AS BIGINT) AS qceil,
        |       l_orderkey % 7 AS okmod,
        |       sqrt(l_quantity) AS qsqrt
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, charge, qdev, qfloor, qceil, okmod, qsqrt""".stripMargin,

    "q_array_funcs" ->
      """SELECT doc_id,
        |       unnest(list_slice(string_split(text, ' '), 1, 3)) AS token,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       list_contains(string_split(text, ' '), 'data') AS has_data
        |FROM documents ORDER BY doc_id, token""".stripMargin,

    "q_json_map_funcs" ->
      """SELECT event_id, user_id,
        |       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |       value AS v_roundtrip,
        |       CAST(length(props) AS BIGINT) AS props_len
        |FROM events ORDER BY event_id""".stripMargin
  )
}
