package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for co-located joins (100 TB posture): two fact
  * tables bucketed + sorted on the join key join WITHOUT any exchange —
  * the shuffle happens once at write time and is amortized over every
  * subsequent join. The standard layout for a fact table that is joined
  * on the same key by many downstream queries.
  *
  * Bucketing requires the session catalog (`saveAsTable`); plain
  * `write.parquet` cannot record bucket metadata.
  */
object BucketedLayout {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    write(df, table, key, buckets, "overwrite")

  /** Append a batch into an existing bucketed table with the SAME bucket
    * spec (Spark rejects a mismatched spec): each appended file set is
    * bucketed on the key, so consumers keep planning exchange-free keyed
    * aggregations — the incremental-maintenance write path.
    */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int): Unit =
    write(df, table, key, buckets, "append")

  // one writer for both modes: a layout change (format, sortBy, bucket
  // validation) must not be editable in one path and missed in the other
  private def write(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: String): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on `key` — plans with zero Exchange nodes
    * when bucket counts match (verified by BucketedLayoutSpec).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
