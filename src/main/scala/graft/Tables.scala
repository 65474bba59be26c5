package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver fixtures (TESTDATA.md).
  *
  * All engine queries read base tables through here so scans stay uniform:
  * `spark.read.parquet` gives Spark's vectorized columnar reader with
  * predicate pushdown and column pruning for free (SURVEY.md §4.2).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    * default; read ns as raw Long (ns since epoch) and let callers derive
    * exact ms via `ts div 1000000` (never a double division — ns values
    * exceed double's 2^53 integer range). SURVEY.md §7.5.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Fan a tiny scan out before CPU-heavy per-row expansion (shingle
    * explode + md5, per-centroid scoring, tokenization). A single small
    * parquet file plans ONE input split — parquet cannot split below a
    * row group — so everything until the first shuffle serializes on one
    * core; repartitioning the few-MB input costs a negligible shuffle and
    * buys full parallelism for the expansion. GATED: at data scale the
    * scan already has ≥ defaultParallelism splits and this is the
    * identity — no exchange is added to a big plan.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
