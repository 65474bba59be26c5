package graft

import graft.sources.BucketedLayout

/** Bucketed co-located join: zero Exchange in the physical plan. */
class BucketedLayoutSpec extends SparkSpec {

  test("matching bucket layouts join without any shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a killed prior JVM can leave orphan table dirs the fresh in-memory
    // catalog doesn't know about — clear them or saveAsTable refuses
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => p.toFile.delete())
      }
    }
    BucketedLayout.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8)
    BucketedLayout.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8)
    // force the sort-merge path (tiny test tables would otherwise broadcast
    // and bucketing would never engage)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedLayout.bucketedJoin(spark, "b_orders", "b_lineitem", "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle at all
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
