package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev profiler for the shingle-index layer stack (raw → capped → pairs →
  * clusters): times each memoized layer's build separately, after warming
  * the query shapes at sf0.001 the way `graft.Bench` does — so the numbers
  * are the per-phase costs the bench's first shingle consumer actually
  * pays, not JIT noise.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.operators.DedupPhases"
  */
object DedupPhases {
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
    def phase(dir: String)(label: String, f: () => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f()
      println(f"[phase] $dir%-28s $label%-9s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    for (dir <- Seq("/root/testdata/sf0.001", sfDir)) {
      val p = phase(dir) _
      p("raw",      () => DedupQueries.uncappedShingleHashes(spark, dir).count())
      p("capped",   () => DedupQueries.shingleHashes(spark, dir).count())
      p("pairs",    () => DedupQueries.sharedShinglePairs(spark, dir).count())
      p("clusters", () => DedupQueries.clusterLabels(spark, dir).count())
      p("q_cluster", () => graft.SparkEntry.queries("q_dedup_cluster")(spark, dir).count())
    }
    spark.stop()
  }
}
