package graft

import org.apache.spark.sql.functions._

/** Partition pruning on partitioned layouts (100 TB posture): a filter on
  * the partition column must prune at the directory level — visible as
  * PartitionFilters in the scan, with only the matching partition read.
  */
class PartitionPruningSpec extends SparkSpec {

  test("filter on the partition column prunes directories, not rows") {
    val out = java.nio.file.Files.createTempDirectory("ppart").toString
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(out)

    val q = spark.read.parquet(out).filter(col("lang") === "en")
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
    // only the lang=en directory feeds the scan
    val expected = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(q.count() == expected)
    // a different partition value reads a disjoint row set
    val de = spark.read.parquet(out).filter(col("lang") === "de").count()
    assert(de > 0 && de != expected)
  }
}
