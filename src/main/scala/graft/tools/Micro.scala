package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-benchmark for isolating operator costs (r18). */
object Micro {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def li = graft.Tables.lineitem(spark, dir).select(
      floor(col("l_extendedprice") * 100).cast("long").as("v"),
      (col("l_orderkey") % 2 === 0).as("in_a"))
    def t(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%6.3f s (rows=$n)")
      }
    }
    t("scan             ") { li.count() }
    t("scan+rep32       ") { li.repartition(32).count() }
    t("agg(v) no rep    ") { li.groupBy("v").count().count() }
    t("agg(v) rep32     ") { li.repartition(32).groupBy("v").count().count() }
    t("agg(v) rep8      ") { li.repartition(8).groupBy("v").count().count() }
    t("ks no fan        ") {
      graft.operators.StatsQueries.ksStat(li).count()
    }
    t("ks fan32         ") {
      graft.operators.StatsQueries.ksStat(li.repartition(32)).count()
    }
    spark.stop()
  }
}
