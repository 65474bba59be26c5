package graft

import org.apache.spark.sql.functions._
import graft.api.{IndexArtifacts, IvfOps}
import graft.operators.DedupQueries

/** Persisted dedup/ANN artifacts: build-once bucketed tables whose keyed
  * consumers plan with zero Exchange in a FRESH session (no index
  * rebuild, no shuffle).
  */
class IndexArtifactsSpec extends SparkSpec {

  private def dropTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // a killed prior JVM can leave orphan table dirs the fresh in-memory
    // catalog doesn't know about — clear them or saveAsTable refuses
    val dir = new java.io.File(s"spark-warehouse/$t")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
    }
  }

  test("persisted shingle index: fresh session reuses it shuffle-free " +
       "and pairs match the session-built memo") {
    dropTable("g_shingle_idx")
    IndexArtifacts.persistShingleIndex(spark, sf, "g_shingle_idx", buckets = 4)

    // fresh session: shares the catalog, NOT the dedup memo caches
    val s2 = spark.newSession()
    val idx = IndexArtifacts.shingleIndex(s2, "g_shingle_idx")

    // the (h)-keyed bucket aggregation — the stage that feeds pair
    // expansion — plans with no Exchange on the bucketed layout
    val agg = idx.groupBy("h").agg(count(lit(1)).as("c"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Bucketed: true"), plan)

    // and the artifact-path pairs equal the session-memo pairs exactly
    val fromArtifact = IndexArtifacts.pairsFromIndex(s2, "g_shingle_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val fromMemo = DedupQueries.pairsPlan(
        DedupQueries.cappedShingleIndex(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(fromArtifact.nonEmpty)
    assert(fromArtifact.toSeq == fromMemo.toSeq)
  }

  test("maintainShingleIndex: a streamed batch becomes near-dup-searchable " +
       "via the artifact with no full-corpus rescan, and replays are idempotent") {
    import spark.implicits._
    dropTable("g_shingle_inc")
    graft.api.IndexArtifacts.persistShingleIndex(spark, sf, "g_shingle_inc", buckets = 4)
    val base = spark.table("g_shingle_inc").count()
    // a twin of an existing corpus doc arrives on the stream under a new id
    val src = Tables.documents(spark, sf).select("doc_id", "text")
      .orderBy("doc_id").limit(1).collect()(0)
    val (srcId, text) = (src.getLong(0), src.getString(1))
    implicit val sq = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("idxmaint").toString
    val q = graft.streaming.StreamingOps.maintainShingleIndex(
      in.toDS().toDF("doc_id", "text"), "g_shingle_inc", ckpt, buckets = 4)
    in.addData((900001L, text))
    q.processAllAvailable()
    q.stop()
    // only the batch was shingled: the artifact grew by exactly the new
    // doc's shingle rows, nothing else was rewritten. Read through the
    // artifact API — the append landed from the micro-batch's session
    // clone, so a raw spark.table() here would serve the stale pre-append
    // file list this session cached for `base`
    val grown = graft.api.IndexArtifacts.shingleIndex(spark, "g_shingle_inc")
    val newRows = grown.filter($"doc_id" === 900001L).count()
    assert(newRows > 0)
    assert(grown.count() == base + newRows)
    // the (source, twin) pair is discoverable through the artifact path
    // alone — no index rebuild, no session memo
    def pairShared(): Long = graft.api.IndexArtifacts
      .pairsFromIndex(spark, "g_shingle_inc")
      .filter($"da" === srcId && $"db" === 900001L)
      .collect() match { case Array(r) => r.getLong(2) }
    val shared = pairShared()
    assert(shared == newRows, s"identical twin must share all $newRows kept shingles, got $shared")
    // an at-least-once REPLAY of the same batch must not inflate counts:
    // the reader dedups (h, doc_id) before pair aggregation
    graft.api.IndexArtifacts.appendShingleIndex(
      spark, Seq((900001L, text)).toDF("doc_id", "text"), "g_shingle_inc", buckets = 4)
    assert(pairShared() == shared, "replayed append inflated shared counts")
  }

  test("appendIvfAssignment under a frozen model equals re-assigning the union") {
    dropTable("g_ivf_inc")
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = e.filter(col("vec_id") < 8).select(col("vec_id").as("cid"), col("v"))
    IndexArtifacts.persistIvfAssignment(spark, e.filter(col("vec_id") % 5 =!= 0),
      cents, nProbe = 2, table = "g_ivf_inc", buckets = 4)
    IndexArtifacts.appendIvfAssignment(spark, e.filter(col("vec_id") % 5 === 0),
      cents, nProbe = 2, table = "g_ivf_inc", buckets = 4)
    val persisted = IndexArtifacts.ivfAssignment(spark, "g_ivf_inc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val live = IvfOps.assign(e, IvfOps.centroidBlock(cents), nProbe = 2)
      .select("vec_id", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(persisted.nonEmpty && persisted.toSeq == live.toSeq)
    // and the appended layout still aggregates on cid exchange-free
    val perBucket = IndexArtifacts.ivfAssignment(spark, "g_ivf_inc")
      .groupBy("cid").agg(count(lit(1)).as("members"))
    perBucket.collect()
    assert(!perBucket.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("persisted IVF assignment: fresh session groups by cid shuffle-free") {
    dropTable("g_ivf_asg")
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = e.filter(col("vec_id") < 8).select(col("vec_id").as("cid"), col("v"))
    IndexArtifacts.persistIvfAssignment(spark, e, cents, nProbe = 2,
      table = "g_ivf_asg", buckets = 4)

    val s2 = spark.newSession()
    val asg = IndexArtifacts.ivfAssignment(s2, "g_ivf_asg")
    val perBucket = asg.groupBy("cid").agg(count(lit(1)).as("members"))
    perBucket.collect()
    val plan = perBucket.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)

    // 2 probes -> every vector appears exactly twice
    val n = Tables.embeddings(spark, sf).count()
    assert(asg.count() == 2 * n)
    // and the persisted assignment matches a live re-assignment
    val live = IvfOps.assign(e, IvfOps.centroidBlock(cents), nProbe = 2)
      .select("vec_id", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val persisted = asg.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(live.toSeq == persisted.toSeq)
  }
}
