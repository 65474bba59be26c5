package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Range joins, RANGE window frames, and pivot/unpivot — the remaining
  * relational operator categories (inventory extension).
  *
  * Scale notes: the naive interval join is a quadratic nested-loop on hot
  * keys. q_join_range uses the bucketed pattern instead: quantize time
  * into windows the size of the interval, explode the probe side into the
  * 3 covering buckets, equi-join on (key, bucket), then apply the exact
  * interval predicate residually — candidate pairs are bounded by bucket
  * co-residency, and the join is a plain shuffle hash join at any scale.
  * The DuckDB oracle states the same semantics as a plain inequality
  * join — plans differ, results must not.
  */
object RangePivotQueries {

  type Q = (SparkSession, String) => DataFrame

  private val HalfWindowMs = 1800000L // ±30 min

  private def ems(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("ems", expr("ts div 1000000"))

  def queries: Map[String, Q] = Map(
    "q_join_range" -> ((s, d) => {
      // clicks within ±30 min of each purchase, per user (bucketed join)
      val e = ems(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ems").as("p_ms"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ems").as("c_ms"),
                expr(s"ems div $HalfWindowMs").as("cb"))
      val pExp = p.withColumn("pb", expr(s"p_ms div $HalfWindowMs"))
        .withColumn("probe", explode(array(col("pb") - 1, col("pb"), col("pb") + 1)))
      val counts = pExp
        .join(c, col("user_id") === col("c_user") && col("probe") === col("cb"))
        .filter(abs(col("c_ms") - col("p_ms")) <= HalfWindowMs)
        .groupBy("event_id").agg(count(lit(1)).as("n_clicks"))
      p.join(counts, Seq("event_id"), "left_outer")
        .select(col("event_id"), col("user_id"), col("p_ms"),
                coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .orderBy("event_id")
    }),

    "q_win_range" -> ((s, d) => {
      // RANGE frame (value-based, not row-based): events in the trailing
      // 10 minutes per user — frames defined by the ms value include ties
      // identically in both engines.
      val w = Window.partitionBy("user_id").orderBy("ems")
        .rangeBetween(-600000L, 0L)
      ems(s, d)
        .select(col("event_id"), col("user_id"), col("ems"),
                count(lit(1)).over(w).as("n_trailing_10m"))
        .orderBy("event_id")
    }),

    "q_pivot" -> ((s, d) =>
      // pivot: order counts + exact money totals per priority × status
      orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
                coalesce(col("F"), lit(0L)).as("n_f"),
                coalesce(col("O"), lit(0L)).as("n_o"),
                coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")),

    "q_unpivot" -> ((s, d) => {
      // unpivot (melt) the pivoted table back to (priority, status, n)
      val pivoted = queries("q_pivot")(s, d)
      pivoted.unpivot(
          Array(col("o_orderpriority")),
          Array(col("n_f"), col("n_o"), col("n_p")),
          "status", "n")
        .orderBy("o_orderpriority", "status")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_join_range" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ems FROM events),
         |p AS (SELECT event_id, user_id, ems AS p_ms FROM e WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ems AS c_ms FROM e WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id, p.p_ms,
         |       count(c.c_ms) AS n_clicks
         |FROM p LEFT JOIN c
         |  ON p.user_id = c.user_id AND abs(c.c_ms - p.p_ms) <= $HalfWindowMs
         |GROUP BY p.event_id, p.user_id, p.p_ms
         |ORDER BY p.event_id""".stripMargin,

    "q_win_range" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ems FROM events)
        |SELECT event_id, user_id, ems,
        |       count(*) OVER (PARTITION BY user_id ORDER BY ems
        |                      RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)
        |         AS n_trailing_10m
        |FROM e ORDER BY event_id""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """WITH pv AS (
        |  SELECT o_orderpriority,
        |         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, status, n FROM (
        |  SELECT o_orderpriority, 'n_f' AS status, n_f AS n FROM pv
        |  UNION ALL SELECT o_orderpriority, 'n_o', n_o FROM pv
        |  UNION ALL SELECT o_orderpriority, 'n_p', n_p FROM pv)
        |ORDER BY o_orderpriority, status""".stripMargin
  )
}
