package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time named SparkEntry queries cold then warm in one
  * session (cache effects visible), against SPARK_GRAFT_SF_DIR.
  *
  *   runMain graft.tools.Profile q_dedup_minhash q_dedup_ngram
  */
object Profile {
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
    graft.SparkEntry.queries("q_agg_hash")(spark, sfDir).count() // warmup
    val keys = if (args.nonEmpty) args.toSeq else Seq("q_dedup_minhash")
    for (round <- Seq("cold", "warm"); k <- keys) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(k)(spark, sfDir).count()
      println(f"[prof] $round%-4s $k%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
