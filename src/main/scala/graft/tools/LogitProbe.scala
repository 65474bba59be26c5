package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness for the learned quality gate:
  *
  *   sbt "runMain graft.tools.LogitProbe /root/testdata/sf0.001"
  *
  * Trains (or artifact-reads) the logistic weights, prints the holdout
  * AUC, keep rate, and the largest-|w| buckets — the convergence loop a
  * full Verify run can't give per-change.
  */
object LogitProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.operators.TextQueries.queries(
      "q_text_quality_model_trained")(spark, dir).count() // forces the fit/read
    val fitSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val auc = graft.operators.TextQueries.trainedQualityHoldoutAuc(spark, dir)
    val evalSec = (System.nanoTime() - t1) / 1e9
    val scored = graft.operators.TextQueries.queries(
      "q_text_quality_model_trained")(spark, dir)
    val n = scored.count()
    val kept = scored.filter("keep").count()
    println(f"[logit] dir=$dir auc=$auc%.4f keep=$kept/$n " +
      f"fit_wall=$fitSec%.1f s eval_wall=$evalSec%.1f s " +
      s"source=${graft.operators.TextQueries.textTrainSource(spark, "logitq", dir)}")
    spark.stop()
  }
}
