package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextHash._

/** Dev profiler decomposing q_dedup_simhash's cost, stage-for-stage with
  * the SHIPPED query shape: count-weighted distinct-token hashing, the
  * 60-slot weighted bit-sum aggregation, fingerprint assembly, then the
  * full query (banded bucket aggregation + in-bucket pair expansion).
  */
object SimhashPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[sim] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    for (round <- Seq("cold", "warm")) {
      val tok = documents(spark, sfDir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        .select(col("doc_id"), md5long(col("t")).as("h"), col("c"))
      t(s"$round tok") { tok.count() }
      val bitSums = tok.groupBy("doc_id").agg(
        sum(when(expr("(h >> 0) & 1") === 1, col("c")).otherwise(-col("c"))).as("sb0"),
        (1 until 60).map(j =>
          sum(when(expr(s"(h >> $j) & 1") === 1, col("c")).otherwise(-col("c"))).as(s"sb$j")): _*)
      t(s"$round bitsums") { bitSums.count() }
      val sim = bitSums.select(col("doc_id"),
        (0 until 60).map(j =>
          when(col(s"sb$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      t(s"$round sim") { sim.count() }
      t(s"$round full") { graft.SparkEntry.queries("q_dedup_simhash")(spark, sfDir).count() }
    }
    spark.stop()
  }
}
