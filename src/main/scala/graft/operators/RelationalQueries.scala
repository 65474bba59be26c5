package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Parity._

/** Core relational operator inventory (SURVEY.md §2.2): scans, filters,
  * joins (inner/broadcast/outer/semi/anti/theta), hash aggregation,
  * distinct aggregation, global sort+limit, set operations.
  *
  * Every query follows the determinism contract (SURVEY.md §7.6): terminal
  * `orderBy` on a unique key tuple, doubles rounded where aggregated, column
  * names aliased identically to the DuckDB oracle.
  *
  * Scale notes (100 TB posture): all plans are declarative DataFrame plans —
  * filters and projections reach the parquet scan (Catalyst pushdown), joins
  * shuffle only on their equi-keys, the dimension sides of star joins are
  * broadcast, and aggregates run partial+final (map-side combine). No
  * driver-side collects anywhere.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q_scan_project" -> ((s, d) =>
      // Projection + limit: ReadSchema in explain() shows only the 4 columns.
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
      // order by every output column so ties are value-identical.
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .limit(100)),

    "q_filter_pred" -> ((s, d) =>
      // Conjunctive predicates: between / comparison / IN / LIKE all push to
      // the parquet scan (PushedFilters) before the shuffle-free project.
      lineitem(s, d)
        .filter(
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24 &&
          col("l_returnflag").isin("A", "R") &&
          col("l_linestatus").like("F%"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                "l_returnflag", "l_linestatus")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                 "l_returnflag", "l_linestatus")),

    "q_join_inner" -> ((s, d) => {
      // Equi join on the natural key; at scale this is a shuffle hash join /
      // SMJ on o_custkey = c_custkey only (no other exchange needed).
      val o = orders(s, d)
      val c = customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(o("o_orderkey"), c("c_custkey"), c("c_name"), o("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "q_join_broadcast" -> ((s, d) => {
      // region (5 rows) is broadcast: no shuffle of nation at any scale.
      val n = nation(s, d)
      val r = region(s, d)
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
        .select(n("n_nationkey"), n("n_name"), r("r_name"))
        .orderBy("n_nationkey")
    }),

    "q_join_outer" -> ((s, d) => {
      // Left outer + aggregate: customers with zero orders survive with
      // n_orders = 0. count(col) skips nulls in both Spark and DuckDB.
      val c = customer(s, d)
      val o = orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(
          count(o("o_orderkey")).as("n_orders"),
          coalesce(sumMoney(o("o_totalprice")), lit(0.0)).as("sum_price"))
        .orderBy("c_custkey")
    }),

    "q_join_semi" -> ((s, d) => {
      // EXISTS: left semi join never materializes the right side's columns,
      // and Spark builds/broadcasts only the distinct keys.
      val c = customer(s, d)
      val o = orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_join_anti" -> ((s, d) => {
      val c = customer(s, d)
      val o = orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_join_theta" -> ((s, d) => {
      // Equi + range predicate: Catalyst keys the shuffle on the equi part
      // (nationkey) and evaluates the range residually — never a Cartesian.
      val sp = supplier(s, d)
      val c = customer(s, d)
      sp.join(c,
          sp("s_nationkey") === c("c_nationkey") && sp("s_acctbal") > c("c_acctbal"),
          "inner")
        .select(sp("s_suppkey"), c("c_custkey"), sp("s_acctbal"), c("c_acctbal"))
        .orderBy("s_suppkey", "c_custkey")
    }),

    "q_join_salted" -> ((s, d) => {
      // Skew-guarded equi-join through GraftOps.saltedJoin: the fact side
      // is salted into 8 sub-keys and the dim side replicated across them,
      // so a pathological hot key spreads over 8 reducers instead of
      // swamping one. Salting only reroutes rows — the join RESULT is
      // identical to the plain join, which is exactly what the oracle
      // checks (plain SQL join + aggregation). Decimal sums keep the
      // aggregate order-independent under the salt's nondeterministic
      // routing.
      val o = orders(s, d).select(col("o_custkey"), col("o_totalprice"))
      val c = customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.api.GraftOps.saltedJoin(o, c, "o_custkey", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
             sumMoney(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")
    }),

    "q_agg_hash" -> ((s, d) =>
      // TPC-H Q1 shape: partial+final HashAggregate, whole-stage codegen.
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // Exact decimal sums → double: order-independent, engine-exact.
          sumMoney(col("l_quantity")).as("sum_qty"),
          sumMoney(col("l_extendedprice")).as("sum_base_price"),
          // per-row product truncated to cents (bit-exact), then exact sum
          sumMoney(floor2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_price"),
          (sumMoney(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct" -> ((s, d) =>
      // Distinct aggregate: Catalyst expands to a two-phase distinct+agg.
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("o_orderstatus")),

    "q_join_lateral" -> ((s, d) => {
      // Correlated LATERAL join (Spark 4 lateralJoin + outer references):
      // each nation picks its top-2 customers by balance. Catalyst
      // DECORRELATES the per-row dependent subquery into a ranked join —
      // never an execute-subquery-per-outer-row loop.
      val top2 = customer(s, d)
        .where(col("c_nationkey") === col("n_nationkey").outer())
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .select("c_custkey", "c_acctbal")
        .limit(2)
      nation(s, d).select("n_nationkey", "n_name")
        .lateralJoin(top2)
        .select(col("n_nationkey"), col("n_name"), col("c_custkey"),
                col("c_acctbal"))
        .orderBy("n_nationkey", "c_custkey")
    }),

    "q_agg_filter" -> ((s, d) =>
      // SQL-standard FILTER-clause aggregation: all conditional counts /
      // sums in ONE pass over the table — each condition is an extra agg
      // slot in the same partial, never a separate scan or self-join.
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_quantity") > 25, 1)).as("n_big"),
          count(when(col("l_discount") >= 0.05, 1)).as("n_disc"),
          sumMoney(when(col("l_quantity") > 25, col("l_extendedprice")))
            .as("big_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "q_sort_limit" -> ((s, d) =>
      // Global top-k: plans as TakeOrderedAndProject — per-partition heap +
      // driver merge of k rows, NOT a full global sort, at any scale.
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)),

    "q_set_union" -> ((s, d) =>
      // UNION (distinct): union-all + hash-distinct on the single column.
      orders(s, d).select(col("o_custkey").as("custkey"))
        .union(customer(s, d).select(col("c_custkey").as("custkey")))
        .distinct()
        .orderBy("custkey")),

    "q_set_intersect" -> ((s, d) =>
      // Catalyst rewrites INTERSECT to a left-semi join over distinct rows.
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    "q_set_except" -> ((s, d) =>
      // Catalyst rewrites EXCEPT to a left-anti join over distinct rows.
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey"))
  )

  def oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |LIMIT 100""".stripMargin,

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |  AND l_returnflag IN ('A','R') AND l_linestatus LIKE 'F%'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |         l_returnflag, l_linestatus""".stripMargin,

    "q_join_inner" ->
      """SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT n.n_nationkey, n.n_name, r.r_name
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY n.n_nationkey""".stripMargin,

    "q_join_outer" ->
      """SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
        |       coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_price
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_theta" ->
      """SELECT s.s_suppkey, c.c_custkey, s.s_acctbal, c.c_acctbal
        |FROM supplier s JOIN customer c
        |  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
        |ORDER BY s.s_suppkey, c.c_custkey""".stripMargin,

    "q_join_salted" ->
      """SELECT c.c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) / 100
        |                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_lateral" ->
      """SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t
        |ORDER BY n_nationkey, c_custkey""".stripMargin,

    "q_agg_filter" ->
      """SELECT l_returnflag,
        |       count(*) FILTER (l_quantity > 25) AS n_big,
        |       count(*) FILTER (l_discount >= 0.05) AS n_disc,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |              FILTER (l_quantity > 25) AS DOUBLE) AS big_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,

    "q_set_union" ->
      """SELECT o_custkey AS custkey FROM orders
        |UNION SELECT c_custkey AS custkey FROM customer
        |ORDER BY custkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin
  )
}
