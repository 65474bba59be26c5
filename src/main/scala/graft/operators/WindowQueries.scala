package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Window-function inventory (SURVEY.md §2.2): top-k per group, ranking,
  * analytic lag/lead, and frame specs.
  *
  * Scale notes: each query shuffles once on its partition key and sorts
  * within partitions — the optimal distributed plan for window evaluation.
  * Rank ties are deterministic because rank/dense_rank depend only on the
  * sort key; row_number carries an explicit unique tiebreak (§7.6).
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q_win_dist" -> ((s, d) => {
      // Distribution functions over a UNIQUE total order (acctbal ties
      // broken by custkey): with no peer groups, percent_rank collapses
      // to (rn-1)/(n-1) and cume_dist to rn/n — identical binary division
      // in both engines, floor9-scaled. ntile follows the SQL-standard
      // front-loaded bucket fill.
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      customer(s, d).select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).cast("long").as("quartile"),
        floor(percent_rank().over(w) * 1e9).cast("long").as("pr_e9"),
        floor(cume_dist().over(w) * 1e9).cast("long").as("cd_e9"))
        .orderBy("c_custkey")
    }),

    "q_topk_group" -> ((s, d) => {
      // Top-3 orders by price per status: the canonical distributed top-k —
      // one shuffle on the group key, per-partition sort, early filter.
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "rn")
    }),

    "q_win_ntile" -> ((s, d) => {
      // NTILE quartile assignment per market segment — the remaining
      // standard window function in the surface (both engines follow the
      // SQL-standard bucket fill: the first n%k buckets take one extra
      // row, so a fully tie-broken ORDER BY makes assignment exact).
      // Window-family caveat: a partition serializes in one task — the
      // partition key here is a bounded enum; a high-cardinality cut is
      // the WindowGroupLimit / histogram path instead.
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
                ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("c_mktsegment", "quartile", "c_custkey")
    }),

    "q_win_rank" -> ((s, d) => {
      // rank/dense_rank ordered by acctbal alone are tie-deterministic;
      // row_number needs the unique s_suppkey tiebreak.
      val byBal = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc)
      val byBalKey = Window.partitionBy("s_nationkey")
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
      supplier(s, d)
        .select(
          col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
          rank().over(byBal).cast("long").as("rnk"),
          dense_rank().over(byBal).cast("long").as("drnk"),
          row_number().over(byBalKey).cast("long").as("rn"))
        .orderBy("s_nationkey", "rn")
    }),

    "q_win_analytic" -> ((s, d) => {
      // lag/lead per user ordered by event time. Event ts is ns-precision in
      // the fixture: compare at ms + unique event_id tiebreak so Spark (µs)
      // and the DuckDB oracle (ns) order identically (SURVEY.md §7.5).
      val e = events(s, d).withColumn("ems", expr("ts div 1000000"))
      val w = Window.partitionBy("user_id").orderBy("ems", "event_id")
      e.select(
          col("event_id"), col("user_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          (col("ems") - lag("ems", 1).over(w)).as("gap_ms"))
        .orderBy("event_id")
    }),

    "q_win_first_last" -> ((s, d) => {
      // Navigation over the full partition: each order sees the customer's
      // first, last, and second order key in (date, key) order — one
      // shuffle on o_custkey, the explicit unbounded frame making
      // last/nth well-defined (the default frame stops at CURRENT ROW).
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d)
        .select(
          col("o_orderkey"), col("o_custkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy("o_orderkey")
    }),

    "q_win_frame" -> ((s, d) => {
      // Running sum (unbounded preceding) + moving avg (2 preceding..current)
      // per customer: one shuffle on o_custkey serves both frames. Sums run
      // in DECIMAL (exact, frame-order-independent) and surface as double;
      // the moving avg is exact-sum / frame-count (Parity, §7.6).
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val dec = col("o_totalprice").cast(graft.functions.Parity.Money)
      val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
      val wMov = w.rowsBetween(-2, 0)
      orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          sum(dec).over(wRun).cast("double").as("running_sum"),
          (sum(dec).over(wMov).cast("double") / count(lit(1)).over(wMov))
            .as("mov_avg"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_win_dist" ->
      """SELECT c_custkey, c_mktsegment,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       CAST(floor(percent_rank() OVER w * 1e9) AS BIGINT) AS pr_e9,
        |       CAST(floor(cume_dist() OVER w * 1e9) AS BIGINT) AS cd_e9
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,
    "q_topk_group" ->
      """SELECT o_orderstatus, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
        |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderstatus
        |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders) WHERE rn <= 3
        |ORDER BY o_orderstatus, rn""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal ASC, c_custkey ASC)
        |            AS BIGINT) AS quartile
        |FROM customer
        |ORDER BY c_mktsegment, quartile, c_custkey""".stripMargin,

    "q_win_rank" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        |       CAST(rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS BIGINT) AS drnk,
        |       CAST(row_number() OVER (PARTITION BY s_nationkey
        |                               ORDER BY s_acctbal DESC, s_suppkey ASC) AS BIGINT) AS rn
        |FROM supplier ORDER BY s_nationkey, rn""".stripMargin,

    "q_win_analytic" ->
      """WITH e AS (SELECT event_id, user_id, value, epoch_ms(ts) AS ems FROM events)
        |SELECT event_id, user_id, value,
        |       lag(value, 1) OVER w AS prev_value,
        |       lead(value, 1) OVER w AS next_value,
        |       ems - lag(ems, 1) OVER w AS gap_ms
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ems, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_win_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |       first_value(o_orderkey) OVER w AS first_key,
        |       last_value(o_orderkey) OVER w AS last_key,
        |       nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |       / count(*) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
