package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time a named query N times and dump its executed plan.
  *
  *   sbt "runMain graft.tools.PlanProbe q_stats_covariance /root/testdata/sf0.1 3"
  *
  * Prints one RUN line per iteration (first = cold incl. codegen) and the
  * AQE-final physical plan — the loop the bench can't give per-query.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(key)(spark, dir)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      df.collect()
      println(f"RUN$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
