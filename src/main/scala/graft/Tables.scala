package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver fixtures (TESTDATA.md).
  *
  * All engine queries read base tables through here so scans stay uniform:
  * `spark.read.parquet` gives Spark's vectorized columnar reader with
  * predicate pushdown and column pruning for free (SURVEY.md §4.2).
  *
  * Readers are MEMOIZED per (session, path): `spark.read.parquet` runs
  * footer-based schema inference on every call (~65 ms against the local
  * fixtures, and a full file-listing + footer fan-out job at data scale) —
  * re-paying it per query is what a catalog/metastore exists to avoid, and
  * at 100 TB a per-query footer sweep over millions of files is its own
  * distributed job. The memo caches only the ANALYZED READER (schema +
  * file-index snapshot), never data, exactly like a registered external
  * table; the fixture dirs are immutable so snapshot staleness cannot
  * arise. The memo is a small LRU over SESSIONS (a cached Dataset strongly
  * references its session, so weak keys would never free — the map bounds
  * retained sessions instead: evicting the eldest caps what stopped spec
  * sessions can pin, and any evicted-but-live session just re-infers on
  * next use). Reader CONSTRUCTION happens outside the lock — at data
  * scale schema inference is a distributed footer job and must not
  * serialize unrelated sessions; two racing builders produce equivalent
  * plans and the first publish wins. Thread-safe: Verify/Bench run
  * queries sequentially but specs run suites concurrently in one JVM.
  *
  * A shared reader means a query touching one table twice holds the SAME
  * Dataset instance; Spark's DeduplicateRelations re-aliases the second
  * occurrence in a self-join, so composed plans behave as with fresh
  * readers (the full oracle sweep pins this).
  */
object Tables {
  private val MaxSessions = 8
  private val readers =
    new java.util.LinkedHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, DataFrame]](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            scala.collection.concurrent.TrieMap[String, DataFrame]]): Boolean =
        size() > MaxSessions
    }

  /** Sanctioned escape hatch from the "fixture dirs are immutable"
    * convention the memo rests on: any test or tool that REWRITES a
    * parquet dir at a path a live session already read MUST invalidate
    * that path (or [[clear]] the session) before reading again —
    * otherwise the memoized file-index snapshot silently serves stale
    * listings (wrong rows, or FileNotFoundException for compacted files)
    * with no error pointing here. `path` is the full parquet path as
    * [[t]] builds it: `"$dir/$name.parquet"`.
    */
  private[graft] def invalidate(spark: SparkSession, path: String): Unit = {
    readers.synchronized {
      val per = readers.get(spark)
      if (per != null) per.remove(path)
    }
    fireInvalidation(spark, path)
  }

  /** Drop every memoized reader of `spark` (see [[invalidate]]). */
  private[graft] def clear(spark: SparkSession): Unit = {
    readers.synchronized { readers.remove(spark); () }
    fireInvalidation(spark, "*")
  }

  /** Invalidation HOOKS (r19, ADVICE r18): modules that memoize DERIVED
    * fixture content per (session, dir) — the collected centroid Seqs,
    * the vec-0 query row — register here so the sanctioned rewrite
    * escape hatch ([[invalidate]]/[[clear]], and registerFixtureTagged's
    * observed fingerprint change) releases THEIR state too, not just the
    * reader snapshot. Hooks receive (session, parquet path; "*" = all)
    * and must be idempotent. Registration is once per module (object
    * init); a module never touched has no memoized state to release.
    */
  private val invalidationHooks =
    new java.util.concurrent.CopyOnWriteArrayList[(SparkSession, String) => Unit]()

  private[graft] def onInvalidate(h: (SparkSession, String) => Unit): Unit = {
    invalidationHooks.add(h); ()
  }

  private def fireInvalidation(spark: SparkSession, path: String): Unit = {
    import scala.jdk.CollectionConverters._
    invalidationHooks.asScala.foreach { h =>
      try h(spark, path) catch { case _: Exception => }
    }
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val per = readers.synchronized {
      var m = readers.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        readers.put(spark, m)
      }
      m
    }
    val path = s"$dir/$name.parquet"
    per.get(path) match {
      case Some(df) => df
      case None =>
        val df = spark.read.parquet(path) // built unlocked (see scaladoc)
        per.putIfAbsent(path, df).getOrElse(df)
    }
  }

  /** events.ts normalizes to ns-since-epoch Long whatever the fixture's
    * physical type, so every caller derives exact ms via `ts div 1000000`
    * (never a double division — ns values exceed double's 2^53 integer
    * range). SURVEY.md §7.5. Two fixture generations exist: TIMESTAMP
    * (NANOS), which Spark 4 rejects unless nanosAsLong reads it as raw
    * Long (the flag must be set before the reader's FIRST memoized
    * construction — it is baked into the inferred schema), and
    * timestamp[us] (isAdjustedToUTC=false → TIMESTAMP_NTZ), which is cast
    * to TIMESTAMP (exact under the UTC session timezone every entry point
    * sets) and widened µs→ns. DuckDB's `epoch_ms(ts)` floors the same way
    * on both, so oracles are generation-agnostic.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts as timestamp)) * 1000L"))
    }
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
