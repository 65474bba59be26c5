package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.implicits._
import graft.operators.TextQueries

/** Composed LLM training-data pipeline over the engine's operators — the
  * "what this engine is for at 100 TB" demo:
  *
  *   documents → quality score → near-dup pairs (MinHash-LSH) →
  *   keeper selection (drop the higher doc_id of each dup pair) →
  *   token accounting → corpus written as parquet partitioned by lang.
  *
  * Every stage is a declarative plan from the query inventory; the only
  * driver-side data are the final summary counts. Partitioned output means
  * downstream per-language jobs prune at the directory level.
  *
  * Usage: sbt "runMain graft.tools.PipelineDemo [sfDir] [outDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_corpus")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    // 1. quality scoring (TextQueries formula) — keep the top band
    val quality = TextQueries.queries("q_text_quality")(spark, sfDir)
      .select(col("doc_id"), col("quality_e6"))
    // 2. near-dup pairs via the library API (MinHash-LSH + exact verify)
    val dupPairs = docs.minhashPairs("doc_id", "text", threshold = 0.7)
      .select(col("id_b").as("drop_id")).distinct() // keep lower id of each pair
    // 3. filter + dedup + enrich with token counts
    val tokens = TextQueries.queries("q_text_tokencount")(spark, sfDir)
      .select(col("doc_id"), col("ws_tokens"))
    val corpus = docs
      .join(quality, "doc_id")
      .filter(col("quality_e6") >= 500000)
      .join(dupPairs, col("doc_id") === col("drop_id"), "left_anti")
      .join(tokens, "doc_id")

    corpus.write.mode("overwrite").partitionBy("lang").parquet(outDir)

    val kept = spark.read.parquet(outDir)
    val summary = kept.groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("ws_tokens").as("tokens"))
      .orderBy("lang")
    println(s"[pipeline] $nDocs docs in → ${kept.count()} kept " +
      s"(quality>=0.5, near-dups dropped) → $outDir partitioned by lang")
    summary.show(10, truncate = false)
    spark.stop()
  }
}
