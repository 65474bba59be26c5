package graft

import graft.api.IndexArtifacts
import graft.operators.DedupQueries

/** The derived-layer artifact family (persistDerived/readDerived +
  * IndexArtifacts.serveDerivedIncremental): fingerprint-guarded
  * round-trip, torn
  * writes read as absent, and — the property the Bench/Verify warm
  * path rests on — a released session memo re-serves from the artifact
  * with EXACTLY the rows the live build produced.
  */
class DerivedArtifactsSpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
    f.delete()
  }

  test("persist/readDerived round-trip; stale fingerprint, bumped " +
       "version, or torn sidecar all read as ABSENT, never stale") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val table = "g_drv_spec_roundtrip"
    IndexArtifacts.persistDerived(spark, df, table, "fp1:v1")
    val back = IndexArtifacts.readDerived(spark, table, "fp1:v1")
    assert(back.isDefined)
    assert(back.get.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      (1 to 100).map(i => (i.toLong, s"v$i")).toSet)
    // a regenerated input (new fileFingerprint) or a bumped build
    // version must refuse to serve
    assert(IndexArtifacts.readDerived(spark, table, "fp2:v1").isEmpty)
    assert(IndexArtifacts.readDerived(spark, table, "fp1:v2").isEmpty)
    // torn write: data without its sidecar commit marker is absent
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    rm(new java.io.File(s"$wh/${table}__fp"))
    assert(IndexArtifacts.readDerived(spark, table, "fp1:v1").isEmpty)
  }

  test("typo pair layer: a released memo re-serves from the persisted " +
       "artifact, row-identical to the live build plan") {
    val q = SparkEntry.queries("q_dedup_typos")
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val first = rows(q(spark, sf))
    DedupQueries.releaseTypoPairs(spark)
    val second = rows(q(spark, sf))
    assert(DedupQueries.derivedSourceOf(spark, "typo_pairs") == "artifact")
    assert(first == second)
    // and the artifact-served result equals the LIVE plan evaluated raw
    val p = Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_brand", "p_type")
    val live = DedupQueries
      .typoPairsPlan(DedupQueries.typoVariants(p),
        p.select("p_partkey", "p_name"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = second.map(s => (s.head, s(1))).map {
      case (a: Long, b: Long) => (a, b)
    }
    // q_dedup_typos projects (pa, pb, ...) from the pair table
    assert(served == live)
  }

  test("funnel-lag layer: a released memo re-serves from the persisted " +
       "artifact, result-identical (r13 — the winnow round-trip contract " +
       "for the new funnel_lags derived layer)") {
    val q = SparkEntry.queries("q_event_funnel_time")
    val first = q(spark, sf).collect().map(_.toSeq).toSeq
    operators.EventTimeQueries.releaseFunnelLags(spark)
    val second = q(spark, sf).collect().map(_.toSeq).toSeq
    assert(DedupQueries.derivedSourceOf(spark, "funnel_lags") == "artifact",
      DedupQueries.derivedSourceOf(spark, "funnel_lags"))
    assert(first == second)
  }

  test("outlier quartile model: a released memo re-serves from the " +
       "persisted artifact, result-identical, and the query's fences " +
       "match a live Quantiles run (r16)") {
    val q = SparkEntry.queries("q_stats_outliers")
    val first = q(spark, sf).collect().map(_.toSeq).toSeq
    operators.StatsQueries.releaseQuartiles(spark)
    val second = q(spark, sf).collect().map(_.toSeq).toSeq
    assert(DedupQueries.derivedSourceOf(spark, "stats_quartiles") ==
      "artifact", DedupQueries.derivedSourceOf(spark, "stats_quartiles"))
    assert(first == second)
    // served quartiles == a live refinement run, double-for-double
    val live = graft.api.Quantiles.exactQuantiles(
      Tables.lineitem(spark, sf).select("l_returnflag", "l_extendedprice"),
      "l_returnflag", "l_extendedprice", Seq(0.25, 0.75))
      .collect().map(_.toSeq).toSet
    operators.StatsQueries.releaseQuartiles(spark)
    val served = operators.StatsQueries.outlierQuartiles(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(served == live)
  }

  test("winnow + shingle pair layers: released memos re-serve from " +
       "artifacts with identical rows") {
    for ((key, release, phase) <- Seq(
        ("q_dedup_winnow", () => DedupQueries.releaseWinnowPicks(spark),
          "winnow_pairs"),
        ("q_dedup_ngram", () => DedupQueries.releaseShingleIndex(spark),
          "shingle_pairs"),
        ("q_dedup_minhash", () => DedupQueries.releaseBandSignatures(spark),
          "shingle_sigs"))) {
      val q = SparkEntry.queries(key)
      val first = q(spark, sf).collect().map(_.toSeq).toSet
      release()
      val second = q(spark, sf).collect().map(_.toSeq).toSet
      assert(DedupQueries.derivedSourceOf(spark, phase) == "artifact",
        s"$key/$phase: ${DedupQueries.derivedSourceOf(spark, phase)}")
      assert(first == second, key)
    }
  }

  test("ivfpq index layers: released memos re-serve from the persisted " +
       "artifact, bit-identical retrievals (trained + fixture)") {
    val sq = graft.operators.SimilarityQueries
    def rows(name: String): Seq[Seq[Any]] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
    val t1 = rows("q_sim_ivfpq_trained")
    val f1 = rows("q_sim_ivfpq")
    sq.releaseIvfpqIndex(spark)
    val t2 = rows("q_sim_ivfpq_trained")
    val f2 = rows("q_sim_ivfpq")
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index") == "artifact")
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index_fx") == "artifact")
    assert(t1 == t2, s"trained retrieval drifted across serve: $t1 vs $t2")
    assert(f1 == f2, s"fixture retrieval drifted across serve: $f1 vs $f2")
  }

  test("serveDerivedIncremental: grown source APPENDS the delta only; " +
       "mutated source rebuilds (VERDICT r13 #6)") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val src = java.nio.file.Files.createTempDirectory("mfsrc").toString
    val table = "g_drv_spec_incr"
    import org.apache.spark.sql.functions._
    val builds = scala.collection.mutable.ArrayBuffer.empty[String]
    def layerOf(df: DataFrame) =
      df.select(col("k"), (col("k") * 10).as("d"))
    def serve(): (Set[(Long, Long)], String) = {
      val (df, how) = IndexArtifacts.serveDerivedIncremental(
        spark, table, src, "t1",
        { builds += "all"
          layerOf(spark.read.parquet(src)) },
        paths => { builds += s"delta:${paths.size}"
          layerOf(spark.read.parquet(paths: _*)) })
      (df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, how)
    }
    // batch 1 → rebuild; repeat → artifact, no build invoked
    (1L to 5L).toDF("k").coalesce(1).write.mode("append").parquet(src)
    assert(serve() == ((1L to 5L).map(k => (k, k * 10)).toSet, "rebuild"))
    builds.clear()
    assert(serve()._2 == "artifact")
    assert(builds.isEmpty, s"artifact serve ran a build: $builds")
    // batch 2 appended as NEW FILES → append path, delta build only,
    // rows == a full rebuild over the union
    (6L to 9L).toDF("k").coalesce(2).write.mode("append").parquet(src)
    val (rows2, how2) = serve()
    assert(how2 == "append", how2)
    assert(builds.forall(_.startsWith("delta:")), s"builds: $builds")
    assert(rows2 == (1L to 9L).map(k => (k, k * 10)).toSet)
    assert(serve()._2 == "artifact")
    // TORN APPEND recovery (r14 review): simulate a crash between the
    // delta append and the sidecar rewrite — extra rows land in the
    // artifact while the sidecar still carries the old row count. The
    // committed-count check must force a full rebuild, never serve the
    // duplicated state or re-append on top of it.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    Seq((999L, 9990L)).toDF("k", "d")
      .coalesce(1).write.mode("append").parquet(s"$wh/$table")
    builds.clear()
    val (rowsTorn, howTorn) = serve()
    assert(howTorn == "rebuild", howTorn)
    assert(builds.contains("all"))
    assert(rowsTorn == (1L to 9L).map(k => (k, k * 10)).toSet,
      "torn rows must not survive the recovery rebuild")
    // an IN-PLACE mutation (rewrite everything) → full rebuild
    builds.clear()
    val all = spark.read.parquet(src).as[Long].collect().toSeq
    Tables.invalidate(spark, src)
    rm(new java.io.File(src))
    (all :+ 100L).toDF("k").coalesce(1).write.mode("overwrite").parquet(src)
    val (rows3, how3) = serve()
    assert(how3 == "rebuild", how3)
    assert(builds.contains("all"))
    assert(rows3 == (all :+ 100L).map(k => (k, k * 10)).toSet)
  }

  test("serveDerivedIncremental: racing concurrent serves of a grown " +
       "source never duplicate the delta (ADVICE r14)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("mfrace").toString
    val table = "g_drv_spec_race"
    def serve() = IndexArtifacts.serveDerivedIncremental(
      spark, table, src, "t1",
      spark.read.parquet(src).select(col("k"), (col("k") * 10).as("d")),
      paths => spark.read.parquet(paths: _*)
        .select(col("k"), (col("k") * 10).as("d")))
    (1L to 5L).toDF("k").coalesce(1).write.mode("append").parquet(src)
    assert(serve()._2 == "rebuild")
    // grow the source, then serve from several threads at once: without
    // the per-path serialization both observe the stale sidecar, both
    // append the same delta, and the duplicated rows COMMIT as valid
    // state (the count check can't catch a completed racing append)
    (6L to 9L).toDF("k").coalesce(2).write.mode("append").parquet(src)
    val outcomes = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val threads = (1 to 4).map(_ => new Thread(() => {
      outcomes.add(serve()._2): Unit
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val rows = serve()._1.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.sorted == (1L to 9L).map(k => (k, k * 10)).sorted,
      s"racing serves corrupted the artifact: ${rows.sorted}")
    assert(rows.size == 9, s"duplicated delta rows: ${rows.size}")
  }

  test("serveDerivedIncremental: a LIVE foreign lease degrades to the " +
       "live build with no artifact write; a stale lease is broken") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("mflease").toString
    val table = "g_drv_spec_lease"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    // idempotence across suite runs: the warehouse persists, and this
    // test asserts on raw artifact-dir existence
    rm(new java.io.File(s"$wh/$table"))
    rm(new java.io.File(s"$wh/${table}__mf"))
    new java.io.File(s"$wh/${table}__lease").delete()
    def serve() = IndexArtifacts.serveDerivedIncremental(
      spark, table, src, "t1",
      spark.read.parquet(src).select(col("k"), (col("k") * 10).as("d")),
      paths => spark.read.parquet(paths: _*)
        .select(col("k"), (col("k") * 10).as("d")))
    (1L to 3L).toDF("k").coalesce(1).write.mode("append").parquet(src)
    // another JVM holds the lease: this serve must still answer (live
    // build) but must NOT write the artifact or sidecar
    val lease = new java.io.File(s"$wh/${table}__lease")
    assert(lease.createNewFile())
    val (df, how) = serve()
    assert(how == "rebuild")
    assert(df.count() == 3)
    assert(!new java.io.File(s"$wh/$table").exists(),
      "a contended serve must not write artifact state")
    // the holder crashed: an over-TTL lease is broken and serving resumes
    assert(lease.setLastModified(
      System.currentTimeMillis() - IndexArtifacts.LeaseTtlMs - 60000))
    assert(serve()._2 == "rebuild")
    assert(serve()._2 == "artifact")
    assert(!lease.exists(), "the broken lease must be released after serve")
  }

  test("raw shingle layer appends per-doc exactly: grown docs dir == " +
       "full rebuild, downstream consumers agree") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mfdocs").toString
    val docsPath = s"$dir/documents.parquet"
    def doc(i: Long) = (i, "src", (1 to 12).map(t => s"w${(i + t) % 7}")
      .mkString(" "))
    (1L to 20L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    val first = DedupQueries.uncappedShingleHashes(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(Set("rebuild", "artifact")(
      DedupQueries.derivedSourceOf(spark, "shingle_raw")))
    // the corpus GROWS: new parquet part lands beside the old ones
    (21L to 28L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    Tables.invalidate(spark, docsPath)
    DedupQueries.releaseShingleIndex(spark)
    val appended = DedupQueries.uncappedShingleHashes(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(DedupQueries.derivedSourceOf(spark, "shingle_raw") == "append",
      DedupQueries.derivedSourceOf(spark, "shingle_raw"))
    // append ≡ full rebuild: the live plan over the whole grown corpus
    val full = DedupQueries.shinglesOf(
      spark.read.parquet(docsPath)).collect().map(_.toSeq).toSet
    assert(appended == full)
    assert(first.subsetOf(appended) && appended.size > first.size)
    DedupQueries.releaseShingleIndex(spark)
  }

  test("capped + sig layers APPEND on a grown docs dir when no shingle " +
       "crossed DfCap, and equal a full rebuild exactly (VERDICT r14 #2)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mfsig").toString
    val docsPath = s"$dir/documents.parquet"
    def doc(i: Long) = (i, "src", (1 to 12).map(t => s"w${(i + t) % 7}")
      .mkString(" "))
    (1L to 20L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    DedupQueries.releaseShingleIndex(spark)
    DedupQueries.cappedShingleIndex(spark, dir).count()
    graft.operators.DedupQueries.bandSigTable(spark, dir).count()
    // the corpus GROWS; 28 docs over a 7-symbol vocabulary stay far
    // below DfCap=100, so both layers must take the append path
    (21L to 28L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    Tables.invalidate(spark, docsPath)
    DedupQueries.releaseShingleIndex(spark)
    val cappedRows = DedupQueries.cappedShingleIndex(spark, dir)
      .collect().map(_.toSeq).toSet
    val sigRows = DedupQueries.bandSigTable(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(DedupQueries.derivedSourceOf(spark, "shingle_capped") == "append",
      DedupQueries.derivedSourceOf(spark, "shingle_capped"))
    assert(DedupQueries.derivedSourceOf(spark, "shingle_sigs") == "append",
      DedupQueries.derivedSourceOf(spark, "shingle_sigs"))
    // append ≡ rebuild: live plans over the whole grown corpus
    val liveCapped = DedupQueries.capIndex(
      DedupQueries.shinglesOf(spark.read.parquet(docsPath)))
    assert(cappedRows == liveCapped.collect().map(_.toSeq).toSet)
    val liveSigs = DedupQueries.fuzzyGateCorpusSigs(
      spark.read.parquet(docsPath)).collect().map(_.toSeq).toSet
    assert(sigRows == liveSigs)
    DedupQueries.releaseShingleIndex(spark)
  }

  test("a delta that PROMOTES a shingle across DfCap vetoes the append: " +
       "capped + sig layers rebuild and stay exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mfhot").toString
    val docsPath = s"$dir/documents.parquet"
    // every doc carries the same 3-gram "c0 c1 c2" plus unique filler:
    // 95 docs → df=95 ≤ 100 (kept); +10 docs → df=105 > 100 (hot)
    def doc(i: Long) =
      (i, "src", s"c0 c1 c2 u${i}a u${i}b u${i}c u${i}d u${i}e")
    (1L to 95L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    DedupQueries.releaseShingleIndex(spark)
    DedupQueries.bandSigTable(spark, dir).count()
    (96L to 105L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    Tables.invalidate(spark, docsPath)
    DedupQueries.releaseShingleIndex(spark)
    val cappedRows = DedupQueries.cappedShingleIndex(spark, dir)
      .collect().map(_.toSeq).toSet
    val sigRows = DedupQueries.bandSigTable(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(DedupQueries.derivedSourceOf(spark, "shingle_capped") == "rebuild",
      DedupQueries.derivedSourceOf(spark, "shingle_capped"))
    assert(DedupQueries.derivedSourceOf(spark, "shingle_sigs") == "rebuild",
      DedupQueries.derivedSourceOf(spark, "shingle_sigs"))
    val liveCapped = DedupQueries.capIndex(
      DedupQueries.shinglesOf(spark.read.parquet(docsPath)))
      .collect().map(_.toSeq).toSet
    assert(cappedRows == liveCapped)
    // the promoted shingle's hash must be GONE from the rebuilt layer
    assert(cappedRows.size < 105 * 6,
      "promotion did not shrink the capped layer")
    val liveSigs = DedupQueries.fuzzyGateCorpusSigs(
      spark.read.parquet(docsPath)).collect().map(_.toSeq).toSet
    assert(sigRows == liveSigs)
    DedupQueries.releaseShingleIndex(spark)
  }

  test("pair + cluster layers APPEND on a grown docs dir and equal a " +
       "full rebuild exactly (VERDICT r15 #3 — the last rebuild-only " +
       "layers)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mfpairs").toString
    val docsPath = s"$dir/documents.parquet"
    // three exact-dup families (same text → jac 1.0) + unique fillers;
    // vocab stays far below DfCap so the no-promotion veto passes
    def text(fam: Long) = (1 to 12).map(t => s"f${fam}w${(t * 7) % 11}")
      .mkString(" ")
    def uniq(i: Long) = (1 to 12).map(t => s"u${i}x$t").mkString(" ")
    val initial = Seq(
      (1L, text(0)), (2L, text(0)),          // family 0 → label 1
      (10L, text(1)), (11L, text(1)),        // family 1 → label 10
      (20L, uniq(20)), (21L, uniq(21)))      // unlabeled singles
    initial.map { case (i, t) => (i, "src", t) }
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    DedupQueries.releaseShingleIndex(spark)
    DedupQueries.releaseWinnowPicks(spark)
    graft.operators.DedupQueries.clusterLabels(spark, dir).count()
    graft.operators.DedupQueries.winnowScoredPairs(spark, dir).count()
    // GROW: 30 joins family 0 (new-old edge, label 1 keeps the min),
    // 31 duplicates 30 (new-new edge into the same merged component),
    // 40+41 an all-new duplicate family (label 40), 50 unique
    Seq((30L, text(0)), (31L, text(0)), (40L, text(9)), (41L, text(9)),
        (50L, uniq(50)))
      .map { case (i, t) => (i, "src", t) }
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    Tables.invalidate(spark, docsPath)
    DedupQueries.releaseShingleIndex(spark)
    DedupQueries.releaseWinnowPicks(spark)
    val pairRows = graft.operators.DedupQueries.sharedShinglePairs(spark, dir)
      .collect().map(_.toSeq).toSet
    val labelRows = graft.operators.DedupQueries.clusterLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winRows = graft.operators.DedupQueries.winnowScoredPairs(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(DedupQueries.derivedSourceOf(spark, "shingle_pairs") == "append",
      DedupQueries.derivedSourceOf(spark, "shingle_pairs"))
    assert(DedupQueries.derivedSourceOf(spark, "shingle_clusters") == "append",
      DedupQueries.derivedSourceOf(spark, "shingle_clusters"))
    // the winnow family rides the same append doctrine (r16)
    assert(DedupQueries.derivedSourceOf(spark, "winnow_picks") == "append",
      DedupQueries.derivedSourceOf(spark, "winnow_picks"))
    assert(DedupQueries.derivedSourceOf(spark, "winnow_pairs") == "append",
      DedupQueries.derivedSourceOf(spark, "winnow_pairs"))
    val liveWin = DedupQueries.winnowScoredPlan(
      graft.operators.TextQueries.winnowPicks(
        spark.read.parquet(docsPath).select("doc_id", "text"))
        .select("doc_id", "h"))
      .collect().map(_.toSeq).toSet
    assert(winRows == liveWin)
    // append ≡ rebuild: live plans over the whole grown corpus
    val liveCapped = DedupQueries.capIndex(
      DedupQueries.shinglesOf(spark.read.parquet(docsPath)))
    val livePairs = DedupQueries.pairsPlan(liveCapped)
      .collect().map(_.toSeq).toSet
    assert(pairRows == livePairs)
    // labels: families merge to their minima — 30/31 into label 1,
    // 40/41 a fresh component labeled 40
    assert(labelRows == Set((1L, 1L), (2L, 1L), (30L, 1L), (31L, 1L),
      (10L, 10L), (11L, 10L), (40L, 40L), (41L, 40L)), labelRows)
    DedupQueries.releaseShingleIndex(spark)
    DedupQueries.releaseWinnowPicks(spark)
  }

  test("a new doc that would RELABEL an old component (smaller id joins " +
       "— the min moves) vetoes the cluster append: rebuild, exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mfmerge").toString
    val docsPath = s"$dir/documents.parquet"
    def text(fam: Long) = (1 to 12).map(t => s"g${fam}w${(t * 5) % 9}")
      .mkString(" ")
    Seq((10L, text(0)), (11L, text(0)), (20L, text(1)))
      .map { case (i, t) => (i, "src", t) }
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    DedupQueries.releaseShingleIndex(spark)
    graft.operators.DedupQueries.clusterLabels(spark, dir).count()
    // doc 5 duplicates family 0 with an id BELOW the old label 10: the
    // whole component must relabel to 5 — not expressible as an append
    Seq((5L, text(0))).map { case (i, t) => (i, "src", t) }
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    Tables.invalidate(spark, docsPath)
    DedupQueries.releaseShingleIndex(spark)
    val labelRows = graft.operators.DedupQueries.clusterLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(
      DedupQueries.derivedSourceOf(spark, "shingle_clusters") == "rebuild",
      DedupQueries.derivedSourceOf(spark, "shingle_clusters"))
    // the pair table itself still APPENDS (pair rows never relabel)
    assert(DedupQueries.derivedSourceOf(spark, "shingle_pairs") == "append",
      DedupQueries.derivedSourceOf(spark, "shingle_pairs"))
    assert(labelRows == Set((5L, 5L), (10L, 5L), (11L, 5L)), labelRows)
    DedupQueries.releaseShingleIndex(spark)
  }

  test("compactDerived: an append-fragmented layer rewrites to few files " +
       "with IDENTICAL content and sidecar; the next serve reads " +
       "artifact; a failed invariant refuses (VERDICT r15 #4)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mfcompact").toString
    val docsPath = s"$dir/documents.parquet"
    def doc(i: Long) = (i, "src", (1 to 12).map(t => s"k${(i + t) % 7}")
      .mkString(" "))
    (1L to 10L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    DedupQueries.releaseShingleIndex(spark)
    DedupQueries.uncappedShingleHashes(spark, dir).count()
    // two growth rounds → the raw layer accretes ≥3 file groups
    for (lo <- Seq(11L, 21L)) {
      (lo to lo + 5L).map(doc).toDF("doc_id", "source", "text")
        .coalesce(2).write.mode("append").parquet(docsPath)
      Tables.invalidate(spark, docsPath)
      DedupQueries.releaseShingleIndex(spark)
      DedupQueries.uncappedShingleHashes(spark, dir).count()
      assert(DedupQueries.derivedSourceOf(spark, "shingle_raw") == "append")
    }
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    val slug = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val artDir = new java.io.File(s"$wh/g_drv_shraw_$slug")
    def dataFiles: Int = Option(artDir.listFiles).map(_.count(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    ).getOrElse(0)
    val before = spark.read.parquet(artDir.toString)
      .collect().map(_.toSeq).toSet
    assert(dataFiles >= 3, s"expected a fragmented layer, got $dataFiles")
    // a failing invariant must refuse and leave everything intact
    assert(!graft.api.IndexArtifacts.compactDerived(spark,
      s"g_drv_shraw_$slug", _ => false))
    assert(dataFiles >= 3)
    // the real invariant passes → compacted, content + sidecar identical
    assert(graft.api.IndexArtifacts.compactDerived(spark,
      s"g_drv_shraw_$slug", targetFiles = 1))
    assert(dataFiles == 1, s"compacted to $dataFiles files")
    assert(spark.read.parquet(artDir.toString)
      .collect().map(_.toSeq).toSet == before)
    // the next serve still reads the artifact (sidecar untouched)
    DedupQueries.releaseShingleIndex(spark)
    val served = DedupQueries.uncappedShingleHashes(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(DedupQueries.derivedSourceOf(spark, "shingle_raw") == "artifact",
      DedupQueries.derivedSourceOf(spark, "shingle_raw"))
    assert(served == before)
    // the batch wrapper compacts every present layer or skips cleanly
    val res = DedupQueries.compactIndexArtifacts(spark, dir)
    assert(res.nonEmpty)
    DedupQueries.releaseShingleIndex(spark)
  }

  test("content-digest manifests: a file rewritten IN PLACE with " +
       "identical name:size:mtime still rebuilds (VERDICT r15 #6)") {
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("mfdigest").toString
    val table = "g_drv_spec_digest"
    val f = java.nio.file.Paths.get(src, "a.txt")
    java.nio.file.Files.write(f, "1\n2\n3\n".getBytes("UTF-8"))
    val mtime = f.toFile.lastModified()
    def serve(): (Seq[Long], String) = {
      val (df, how) = IndexArtifacts.serveDerivedIncremental(
        spark, table, src, "t1",
        spark.read.text(src).select(col("value").cast("long").as("k")),
        paths => spark.read.text(paths: _*)
          .select(col("value").cast("long").as("k")))
      (df.collect().map(_.getLong(0)).toSeq.sorted, how)
    }
    assert(serve()._2 == "rebuild")
    assert(serve() == (Seq(1L, 2L, 3L), "artifact"))
    // rsync-style restore: same byte count, same mtime, different bytes
    java.nio.file.Files.write(f, "7\n8\n9\n".getBytes("UTF-8"))
    assert(f.toFile.setLastModified(mtime))
    val (rows, how) = serve()
    assert(how == "rebuild",
      s"same-size-same-mtime mutation served as '$how'")
    assert(rows == Seq(7L, 8L, 9L))
  }

  test("MODEL artifacts also reject a same-size-same-mtime in-place " +
       "rewrite: the stale model must refit, not restore (VERDICT r16 #3)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mfmodeldig").toString
    val docsPath = s"$dir/documents.parquet"
    def write(tail: String): Unit =
      Seq((1L, "src", s"alpha beta $tail"), (2L, "src", s"gamma $tail"))
        .toDF("doc_id", "source", "text")
        .coalesce(1).write.mode("overwrite").parquet(docsPath)
    write("one")
    val w1 = operators.TextQueries.trainedQualityWeights(spark, dir)
    assert(operators.TextQueries.textTrainSource(spark, "logitq", dir) ==
      "fit") // fresh dir → fresh fit
    // rewrite the single data file IN PLACE with identical size + mtime
    val part = Option(new java.io.File(docsPath).listFiles).get
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).head
    val mtime = part.lastModified()
    write("two")
    val part2 = Option(new java.io.File(docsPath).listFiles).get
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).head
    assert(part2.setLastModified(mtime))
    Tables.invalidate(spark, docsPath)
    operators.TextQueries.releaseTextModels(spark)
    // the digest fingerprint must force a REFIT on the new content — a
    // stale restore would return w1 verbatim; sizes may coincide, so the
    // check is on the recorded source, backed by the weight values
    val w2 = operators.TextQueries.trainedQualityWeights(spark, dir)
    assert(operators.TextQueries.textTrainSource(spark, "logitq", dir) ==
      "fit",
      operators.TextQueries.textTrainSource(spark, "logitq", dir))
    assert(w2.length == w1.length)
  }

  test("serveDerivedIncremental: a SHRUNKEN source rewrites from the " +
       "artifact via buildShrink; the default (no shrink support) " +
       "rebuilds (VERDICT r16 #1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("mfshrink").toString
    def dataFiles: Seq[java.io.File] =
      Option(new java.io.File(src).listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).toSeq
    val builds = scala.collection.mutable.ArrayBuffer.empty[String]
    def serve(table: String,
              shrink: org.apache.spark.sql.DataFrame =>
                Option[org.apache.spark.sql.DataFrame]) = {
      val (df, how) = IndexArtifacts.serveDerivedIncremental(
        spark, table, src, "t1",
        { builds += "all"
          spark.read.parquet(src).select(col("k"), (col("k") * 10).as("d")) },
        paths => spark.read.parquet(paths: _*)
          .select(col("k"), (col("k") * 10).as("d")),
        buildShrink = shrink)
      (df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, how)
    }
    val withShrink = (art: org.apache.spark.sql.DataFrame) => Some(
      art.join(spark.read.parquet(src).select("k"), Seq("k"), "left_semi"))
    (1L to 5L).toDF("k").coalesce(1).write.mode("append").parquet(src)
    val f1 = dataFiles.map(_.getName).toSet
    (6L to 9L).toDF("k").coalesce(1).write.mode("append").parquet(src)
    assert(serve("g_drv_spec_shrink", withShrink)._2 == "rebuild")
    // DELETE the second batch's file — the manifest strictly shrinks
    dataFiles.filterNot(f => f1(f.getName)).foreach(f => assert(f.delete()))
    Tables.invalidate(spark, src)
    builds.clear()
    val (rows, how) = serve("g_drv_spec_shrink", withShrink)
    assert(how == "shrink", how)
    assert(builds.isEmpty, s"shrink ran a corpus build: $builds")
    assert(rows == (1L to 5L).map(k => (k, k * 10)).toSet)
    // the committed state is durable: next serve is a plain artifact read
    assert(serve("g_drv_spec_shrink", withShrink) ==
      ((1L to 5L).map(k => (k, k * 10)).toSet, "artifact"))
    // a closure returning the artifact frame ITSELF declares "content
    // unchanged": sidecar-only commit — the artifact files are untouched
    (10L to 12L).toDF("k").coalesce(1).write.mode("append").parquet(src)
    Tables.invalidate(spark, src)
    assert(serve("g_drv_spec_shrink", withShrink)._2 == "append")
    val wh0 = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    def artFiles: Set[String] =
      Option(new java.io.File(s"$wh0/g_drv_spec_shrink").listFiles)
        .getOrElse(Array.empty).map(f => f.getName + ":" + f.lastModified)
        .toSet
    val filesBefore = artFiles
    dataFiles.filter(_.getName.contains("-")).sortBy(_.getName).lastOption
      .foreach(f => assert(f.delete())) // delete the newest batch file
    Tables.invalidate(spark, src)
    val (rows3a, how3a) = serve("g_drv_spec_shrink", art => Some(art))
    assert(how3a == "shrink", how3a)
    assert(artFiles == filesBefore,
      "a content-unchanged shrink must not rewrite the artifact")
    // rows still include batch 3's derived rows (the closure declared
    // them unchanged — this layer's rows are per-source-file independent
    // only in the real layers; here we assert the COMMIT semantics)
    assert(rows3a.map(_._1).toSet.subsetOf((1L to 12L).toSet))
    assert(serve("g_drv_spec_shrink", art => Some(art))._2 == "artifact")
    // a layer WITHOUT shrink support (the default) must exact-rebuild
    val t2 = "g_drv_spec_shrink_dflt"
    rm(new java.io.File(src)); Tables.invalidate(spark, src)
    (1L to 5L).toDF("k").coalesce(1).write.mode("append").parquet(src)
    val g1 = dataFiles.map(_.getName).toSet
    (6L to 9L).toDF("k").coalesce(1).write.mode("append").parquet(src)
    assert(serve(t2, _ => None)._2 == "rebuild")
    dataFiles.filterNot(f => g1(f.getName)).foreach(f => assert(f.delete()))
    Tables.invalidate(spark, src)
    val (rows2, how2) = serve(t2, _ => None)
    assert(how2 == "rebuild", how2)
    assert(rows2 == (1L to 5L).map(k => (k, k * 10)).toSet)
  }

  test("DELETION maintenance: removing a source file SHRINKS all eight " +
       "derived layers from their artifacts — no text re-pass — equal " +
       "to a full rebuild, including a component relabel (VERDICT r16 #1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mfdel").toString
    val docsPath = s"$dir/documents.parquet"
    def dataFiles: Seq[java.io.File] =
      Option(new java.io.File(docsPath).listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).toSeq
    def text(fam: Long) = (1 to 12).map(t => s"f${fam}w${(t * 7) % 11}")
      .mkString(" ")
    def uniq(i: Long) = (1 to 12).map(t => s"u${i}x$t").mkString(" ")
    // batch 1: family A {1,2}, family B {10,11}, uniques {20,21}
    Seq((1L, text(0)), (2L, text(0)), (10L, text(1)), (11L, text(1)),
        (20L, uniq(20)), (21L, uniq(21)))
      .map { case (i, t) => (i, "src", t) }
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    val f1 = dataFiles.map(_.getName).toSet
    // batch 2 (to be deleted): 0 joins family A BELOW its min (label
    // becomes 0), {40,41} a fresh family, 50 unique
    Seq((0L, text(0)), (40L, text(9)), (41L, text(9)), (50L, uniq(50)))
      .map { case (i, t) => (i, "src", t) }
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    def releaseAll(): Unit = {
      operators.DedupQueries.releaseShingleIndex(spark)
      operators.DedupQueries.releaseWinnowPicks(spark)
      operators.TextQueries.releaseTokenLayer(spark)
    }
    releaseAll()
    // build every layer over the FULL corpus
    operators.DedupQueries.clusterLabels(spark, dir).count()
    operators.DedupQueries.bandSigTable(spark, dir).count()
    operators.DedupQueries.winnowScoredPairs(spark, dir).count()
    operators.TextQueries.tokenLayer(spark, dir).count()
    assert(operators.DedupQueries.clusterLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((1L, 0L)), "doc 0 should have relabeled family A")
    // DELETE batch 2
    dataFiles.filterNot(f => f1(f.getName)).foreach(f => assert(f.delete()))
    Tables.invalidate(spark, docsPath)
    releaseAll()
    val rawRows = operators.DedupQueries.uncappedShingleHashes(spark, dir)
      .collect().map(_.toSeq).toSet
    val cappedRows = operators.DedupQueries.cappedShingleIndex(spark, dir)
      .collect().map(_.toSeq).toSet
    val sigRows = operators.DedupQueries.bandSigTable(spark, dir)
      .collect().map(_.toSeq).toSet
    val pairRows = operators.DedupQueries.sharedShinglePairs(spark, dir)
      .collect().map(_.toSeq).toSet
    val labelRows = operators.DedupQueries.clusterLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winRows = operators.DedupQueries.winnowScoredPairs(spark, dir)
      .collect().map(_.toSeq).toSet
    val tokRows = operators.TextQueries.tokenLayer(spark, dir)
      .collect().map(_.toSeq).toSet
    for (phase <- Seq("shingle_raw", "shingle_capped", "shingle_sigs",
        "shingle_pairs", "shingle_clusters", "winnow_picks",
        "winnow_pairs", "token_counts"))
      assert(DedupQueries.derivedSourceOf(spark, phase) == "shrink",
        s"$phase: ${DedupQueries.derivedSourceOf(spark, phase)}")
    // shrink ≡ rebuild: live plans over the surviving corpus
    val live = spark.read.parquet(docsPath)
    assert(rawRows == DedupQueries.shinglesOf(live)
      .collect().map(_.toSeq).toSet)
    val liveCapped = DedupQueries.capIndex(DedupQueries.shinglesOf(live))
    assert(cappedRows == liveCapped.collect().map(_.toSeq).toSet)
    assert(sigRows == DedupQueries.fuzzyGateCorpusSigs(live)
      .collect().map(_.toSeq).toSet)
    assert(pairRows == DedupQueries.pairsPlan(liveCapped)
      .collect().map(_.toSeq).toSet)
    assert(winRows == DedupQueries.winnowScoredPlan(
      operators.TextQueries.winnowPicks(live.select("doc_id", "text"))
        .select("doc_id", "h")).collect().map(_.toSeq).toSet)
    assert(tokRows == live
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "source", "token")
      .agg(count(lit(1)).as("c")).collect().map(_.toSeq).toSet)
    // the deleted doc 0 WAS family A's label: the touched component
    // relabels to its surviving min, family B keeps its rows, the
    // deleted family {40,41} vanishes
    assert(labelRows == Set((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)),
      labelRows)
    releaseAll()
  }

  test("a removal that DEMOTES a hot hash back under DfCap vetoes the " +
       "shrink: capped/sig/pair/cluster + winnow-pair layers rebuild " +
       "exact (the r16 #1 demotion veto)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mfdemote").toString
    val docsPath = s"$dir/documents.parquet"
    def dataFiles: Seq[java.io.File] =
      Option(new java.io.File(docsPath).listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).toSeq
    // 105 docs share every shingle/pick hash (identical text, ≥6 tokens
    // so winnow picks exist at K=3/W=4) → hot (df=105 > 100, capped out
    // everywhere); deleting 10 demotes to 95
    def doc(i: Long) = (i, "src", "c0 c1 c2 c3 c4 c5 c6 c7")
    (1L to 95L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    val f1 = dataFiles.map(_.getName).toSet
    (96L to 105L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    def releaseAll(): Unit = {
      operators.DedupQueries.releaseShingleIndex(spark)
      operators.DedupQueries.releaseWinnowPicks(spark)
    }
    releaseAll()
    operators.DedupQueries.clusterLabels(spark, dir).count()
    operators.DedupQueries.bandSigTable(spark, dir).count()
    operators.DedupQueries.winnowScoredPairs(spark, dir).count()
    // every pair-bearing layer is EMPTY while the one hash family is hot
    assert(operators.DedupQueries.sharedShinglePairs(spark, dir).isEmpty)
    dataFiles.filterNot(f => f1(f.getName)).foreach(f => assert(f.delete()))
    Tables.invalidate(spark, docsPath)
    releaseAll()
    val cappedRows = operators.DedupQueries.cappedShingleIndex(spark, dir)
      .collect().map(_.toSeq).toSet
    val pairCount = operators.DedupQueries.sharedShinglePairs(spark, dir)
      .count()
    val labelRows = operators.DedupQueries.clusterLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winCount = operators.DedupQueries.winnowScoredPairs(spark, dir)
      .count()
    // raw + picks still shrink (per-doc exact, no cap coupling) …
    assert(DedupQueries.derivedSourceOf(spark, "shingle_raw") == "shrink")
    assert(DedupQueries.derivedSourceOf(spark, "winnow_picks") == "shrink")
    // … but every DfCap-coupled layer must take the demotion rebuild
    for (phase <- Seq("shingle_capped", "shingle_sigs", "shingle_pairs",
        "shingle_clusters", "winnow_pairs"))
      assert(DedupQueries.derivedSourceOf(spark, phase) == "rebuild",
        s"$phase: ${DedupQueries.derivedSourceOf(spark, phase)}")
    // the demoted hashes are BACK: 95 surviving docs now pair fully
    val live = spark.read.parquet(docsPath)
    assert(cappedRows == DedupQueries.capIndex(DedupQueries.shinglesOf(live))
      .collect().map(_.toSeq).toSet)
    assert(cappedRows.nonEmpty, "demoted shingles must rejoin the index")
    assert(pairCount == 95L * 94 / 2, s"pairs: $pairCount")
    assert(winCount == 95L * 94 / 2, s"winnow pairs: $winCount")
    assert(labelRows == (1L to 95L).map(i => (i, 1L)).toSet)
    releaseAll()
  }

  test("ivfpq index APPENDS on grown embeddings under FROZEN models, " +
       "equal to a full re-encode; a retraction SHRINKS it; models " +
       "refreeze exactly (VERDICT r16 #2)") {
    import spark.implicits._
    val sq = operators.SimilarityQueries
    val dir = java.nio.file.Files.createTempDirectory("mfivfpq").toString
    val embPath = s"$dir/embeddings.parquet"
    def vec(i: Long): Seq[Float] = (0 until 64).map(j =>
      ((i * 131 + j * 17 + (i * i) % 257) % 101).toFloat / 101f)
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, vec(i), (i % 3).toInt))
        .toDF("vec_id", "embedding", "label")
    def dataFiles: Seq[java.io.File] =
      Option(new java.io.File(embPath).listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).toSeq
    def idxRows(trained: Boolean): Set[Seq[Any]] =
      sq.ivfpqIndex(spark, dir, trained).collect().map(_.toSeq).toSet
    batch(0, 29).coalesce(1).write.mode("append").parquet(embPath)
    val f1 = dataFiles.map(_.getName).toSet
    val baseT = idxRows(trained = true)
    val baseF = idxRows(trained = false)
    assert(sq.trainSource(spark, "ivf", dir) == "fit")
    // GROW the corpus: the trained models must keep serving (frozen
    // epoch) and both index variants must APPEND the new vectors only
    batch(30, 39).coalesce(1).write.mode("append").parquet(embPath)
    Tables.invalidate(spark, embPath)
    sq.releaseTrainedModels(spark)
    val grownT = idxRows(trained = true)
    val grownF = idxRows(trained = false)
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index") == "append",
      DedupQueries.derivedSourceOf(spark, "ivfpq_index"))
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index_fx") == "append",
      DedupQueries.derivedSourceOf(spark, "ivfpq_index_fx"))
    assert(sq.trainSource(spark, "ivf", dir) == "frozen")
    assert(sq.trainSource(spark, "ivfpq", dir) == "frozen")
    assert(baseT.subsetOf(grownT) && grownT.size == baseT.size + 10)
    assert(baseF.subsetOf(grownF) && grownF.size == baseF.size + 10)
    // append ≡ rebuild: force a full re-encode under the SAME frozen
    // models by dropping only the index artifacts
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    val slug = dir.replaceAll("[^A-Za-z0-9]+", "_")
    for (t <- Seq("ivfpqidx", "ivfpqidxfx"); sfx <- Seq("", "__mf"))
      rm(new java.io.File(s"$wh/g_drv_${t}_$slug$sfx"))
    sq.releaseIvfpqIndex(spark)
    assert(idxRows(trained = true) == grownT)
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index") == "rebuild")
    assert(idxRows(trained = false) == grownF)
    // RETRACT the growth: the surviving manifest equals the models' fit
    // manifest (they serve as plain artifacts again) and the index
    // shrinks row-locally back to the base rows
    dataFiles.filterNot(f => f1(f.getName)).foreach(f => assert(f.delete()))
    Tables.invalidate(spark, embPath)
    sq.releaseTrainedModels(spark)
    assert(idxRows(trained = true) == baseT)
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index") == "shrink",
      DedupQueries.derivedSourceOf(spark, "ivfpq_index"))
    assert(sq.trainSource(spark, "ivf", dir) == "artifact")
    assert(idxRows(trained = false) == baseF)
    assert(
      DedupQueries.derivedSourceOf(spark, "ivfpq_index_fx") == "shrink",
      DedupQueries.derivedSourceOf(spark, "ivfpq_index_fx"))
    // explicit retrain ends the frozen epoch: models refit, the digest
    // in the index tag changes, and the index REBUILDS
    batch(30, 39).coalesce(1).write.mode("append").parquet(embPath)
    Tables.invalidate(spark, embPath)
    sq.retrainModels(spark, dir)
    idxRows(trained = true)
    assert(sq.trainSource(spark, "ivf", dir) == "fit")
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index") == "rebuild",
      DedupQueries.derivedSourceOf(spark, "ivfpq_index"))
    sq.releaseTrainedModels(spark)
  }

  test("compaction POLICY: a layer accreting past the file-group knob " +
       "compacts ORGANICALLY at the next serve — file groups reset, " +
       "content identical; knob ≤ 0 disables (VERDICT r16 #5)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("mfpolicy").toString
    val table = "g_drv_spec_policy"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    rm(new java.io.File(s"$wh/$table"))
    rm(new java.io.File(s"$wh/${table}__mf"))
    def serve() = IndexArtifacts.serveDerivedIncremental(
      spark, table, src, "t1",
      spark.read.parquet(src).select(col("k"), (col("k") * 10).as("d")),
      paths => spark.read.parquet(paths: _*)
        .select(col("k"), (col("k") * 10).as("d")),
      compactInvariant = a =>
        a.groupBy("k").agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .isEmpty)
    def groups: Int =
      IndexArtifacts.fileGroupCount(spark, s"$wh/$table")
    try {
      // knob OFF: appends accrete file groups without bound
      spark.conf.set("spark.graft.compact.fileGroups", "0")
      (1L to 3L).toDF("k").coalesce(1).write.mode("append").parquet(src)
      assert(serve()._2 == "rebuild")
      assert(groups == 1)
      for (lo <- Seq(4L, 6L, 8L)) {
        (lo to lo + 1).toDF("k").coalesce(1).write.mode("append").parquet(src)
        Tables.invalidate(spark, src)
        assert(serve()._2 == "append")
      }
      assert(groups == 4, s"groups: $groups")
      // knob ON at 2: the NEXT serve (no source change needed) compacts
      // first, then serves the artifact — content identical, groups reset
      spark.conf.set("spark.graft.compact.fileGroups", "2")
      val (df, how) = serve()
      assert(how == "artifact", how)
      assert(groups == 1, s"groups after policy compaction: $groups")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        (1L to 9L).map(k => (k, k * 10)).toSet)
      // and a later append serves normally on the compacted layout
      (10L to 11L).toDF("k").coalesce(1).write.mode("append").parquet(src)
      Tables.invalidate(spark, src)
      assert(serve()._2 == "append")
      assert(groups == 2)
    } finally spark.conf.unset("spark.graft.compact.fileGroups")
  }

  test("compaction policy GUARDS (ADVICE r17): a stale-tag artifact is " +
       "not compacted before its rebuild, and a non-contention skip " +
       "(failing invariant) backs off until the layer is written again") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("mfguard").toString
    val table = "g_drv_spec_policyguard"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    rm(new java.io.File(s"$wh/$table"))
    rm(new java.io.File(s"$wh/${table}__mf"))
    val invariantCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    var invariantVerdict = true
    def serve(tag: String) = IndexArtifacts.serveDerivedIncremental(
      spark, table, src, tag,
      spark.read.parquet(src).select(col("k"), (col("k") * 10).as("d")),
      paths => spark.read.parquet(paths: _*)
        .select(col("k"), (col("k") * 10).as("d")),
      compactInvariant = _ => {
        invariantCalls.incrementAndGet(); invariantVerdict
      })
    def fragment(tag: String, los: Seq[Long]): Unit = {
      // knob OFF while fragmenting — an active policy would compact the
      // accretion away before the guards under test ever see it
      spark.conf.set("spark.graft.compact.fileGroups", "0")
      for (lo <- los) {
        (lo to lo + 1).toDF("k").coalesce(1).write.mode("append").parquet(src)
        Tables.invalidate(spark, src)
        assert(serve(tag)._2 == "append")
      }
      assert(IndexArtifacts.fileGroupCount(spark, s"$wh/$table") > 2)
      spark.conf.set("spark.graft.compact.fileGroups", "2")
    }
    try {
      (1L to 3L).toDF("k").coalesce(1).write.mode("append").parquet(src)
      spark.conf.set("spark.graft.compact.fileGroups", "0")
      assert(serve("t1")._2 == "rebuild")
      fragment("t1", Seq(4L, 6L, 8L))
      // 1) TAG MISMATCH: the policy must skip BEFORE paying the
      // count/invariant scan — the serve is about to rebuild anyway
      invariantCalls.set(0)
      assert(serve("t2")._2 == "rebuild") // tag change → exact rebuild
      assert(invariantCalls.get == 0,
        "a stale-tag artifact must not be compacted pre-rebuild")
      // re-fragment under the NEW tag
      fragment("t2", Seq(10L, 12L, 14L))
      // 2) NON-CONTENTION SKIP BACKS OFF: a failing invariant would
      // re-pay the full-artifact scan on EVERY serve — after one skip
      // the policy must memoize and stop retrying
      invariantVerdict = false
      invariantCalls.set(0)
      assert(serve("t2")._2 == "artifact")
      assert(invariantCalls.get == 1, s"calls: ${invariantCalls.get}")
      assert(serve("t2")._2 == "artifact")
      assert(invariantCalls.get == 1,
        "the failed compaction must memoize — no retry on an unchanged layer")
      // 3) A WRITE CLEARS THE BACKOFF: the layer changed, so the next
      // fragmented serve may try again (and succeed once the invariant
      // holds again)
      spark.conf.set("spark.graft.compact.fileGroups", "0")
      (16L to 17L).toDF("k").coalesce(1).write.mode("append").parquet(src)
      Tables.invalidate(spark, src)
      assert(serve("t2")._2 == "append")
      spark.conf.set("spark.graft.compact.fileGroups", "2")
      invariantVerdict = true
      invariantCalls.set(0)
      val (df, how) = serve("t2")
      assert(how == "artifact")
      assert(invariantCalls.get == 1, "backoff must clear after a write")
      assert(IndexArtifacts.fileGroupCount(spark, s"$wh/$table") == 1)
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        (1L to 17L).map(k => (k, k * 10)).toSet)
    } finally spark.conf.unset("spark.graft.compact.fileGroups")
  }

  test("typo-pair layer SHRINKS on a retracted part file (VERDICT r17 " +
       "#5): kept pairs semi-join, the layer equals a live rebuild, and " +
       "the phase reads shrink") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mftypo").toString
    val partPath = s"$dir/part.parquet"
    def dataFiles: Seq[java.io.File] =
      Option(new java.io.File(partPath).listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).toSeq
    def rowsOf: Set[Seq[Any]] =
      SparkEntry.queries("q_dedup_typos")(spark, dir).collect()
        .map(_.toSeq).toSet
    // batch 1: two 1-edit-apart names (pair) + one far name, one block
    Seq((1L, "widget alpha", "B1", "T1"), (2L, "widget alphb", "B1", "T1"),
        (3L, "unrelated zebra thing", "B1", "T1"))
      .toDF("p_partkey", "p_name", "p_brand", "p_type")
      .coalesce(1).write.mode("append").parquet(partPath)
    val f1 = dataFiles.map(_.getName).toSet
    // batch 2 (to be deleted): 4 pairs with 1 and 2
    Seq((4L, "widget alphc", "B1", "T1"))
      .toDF("p_partkey", "p_name", "p_brand", "p_type")
      .coalesce(1).write.mode("append").parquet(partPath)
    val full = rowsOf
    assert(full.map(p => (p.head, p(1))) ==
      Set((1L, 2L), (1L, 4L), (2L, 4L)), full)
    dataFiles.filterNot(f => f1(f.getName)).foreach(f => assert(f.delete()))
    Tables.invalidate(spark, partPath)
    DedupQueries.releaseTypoPairs(spark)
    val shrunk = rowsOf
    assert(DedupQueries.derivedSourceOf(spark, "typo_pairs") == "shrink",
      DedupQueries.derivedSourceOf(spark, "typo_pairs"))
    // shrink ≡ a live rebuild over the surviving catalog
    val p = spark.read.parquet(partPath)
      .select("p_partkey", "p_name", "p_brand", "p_type")
    val live = DedupQueries
      .typoPairsPlan(DedupQueries.typoVariants(p),
        p.select("p_partkey", "p_name"))
      .collect().map(_.toSeq).toSet
    assert(shrunk == live)
    assert(shrunk.map(x => (x.head, x(1))) == Set((1L, 2L)), shrunk)
    DedupQueries.releaseTypoPairs(spark)
  }

  test("typo shrink under CAP DEMOTION stays exact: a removal that pulls " +
       "a capped-out part back under the variant cap tops the semi-join " +
       "up with verified extras — kept ∪ extras ≡ rebuild (r18)") {
    import spark.implicits._
    // 5 identical names in one block, cap 3: pairs pre-shrink are among
    // ranks {1,2,3}; parts 4 and 5 are capped OUT of pair generation
    def parts(keys: Seq[Long]) = keys
      .map(i => (i, "same exact name", "B1", "T1"))
      .toDF("p_partkey", "p_name", "p_brand", "p_type")
    val all = parts(Seq(1L, 2L, 3L, 4L, 5L))
    val art = DedupQueries.typoPairsPlan(
      DedupQueries.typoVariants(all),
      all.select("p_partkey", "p_name"), cap = 3)
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsOf(art) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // remove part 1: part 4 demotes INTO the cap — its pairs are in no
    // artifact; the plain semi-join would silently lose them
    val surv = parts(Seq(2L, 3L, 4L, 5L))
    val shrunk = pairsOf(
      DedupQueries.typoShrinkPlan(art, surv, cap = 3))
    val rebuild = pairsOf(DedupQueries.typoPairsPlan(
      DedupQueries.typoVariants(surv),
      surv.select("p_partkey", "p_name"), cap = 3))
    assert(shrunk == rebuild)
    assert(shrunk == Set((2L, 3L), (2L, 4L), (3L, 4L)), shrunk)
  }

  test("funnel-lag layer SHRINKS per user on a retracted events file: " +
       "intact users keep artifact rows, touched users recompute over " +
       "surviving events, tombstoned users drop; an untouched-layer " +
       "retraction commits sidecar-only (VERDICT r17 #5)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mffun").toString
    val evPath = s"$dir/events.parquet"
    def dataFiles: Seq[java.io.File] =
      Option(new java.io.File(evPath).listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).toSeq
    def ev(id: Long, u: Long, ms: Long, t: String) =
      (id, u, ms * 1000000L, t) // ts in ns; the layer reads ems = ts/1e6
    // batch 1: user 100 full funnel; user 200 view+click
    Seq(ev(1, 100, 1000, "view"), ev(2, 100, 2000, "click"),
        ev(3, 100, 5000, "purchase"),
        ev(4, 200, 1000, "view"), ev(5, 200, 4000, "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(evPath)
    val f1 = dataFiles.map(_.getName).toSet
    // batch 2: user 200 purchases (their click_to_purchase exists only
    // with this file); user 300 full funnel; user 400 view-only
    Seq(ev(6, 200, 9000, "purchase"),
        ev(7, 300, 1000, "view"), ev(8, 300, 1500, "click"),
        ev(9, 300, 2500, "purchase"), ev(10, 400, 1000, "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(evPath)
    def q: Seq[Seq[Any]] =
      SparkEntry.queries("q_event_funnel_time")(spark, dir)
        .collect().map(_.toSeq).toSeq
    val full = q
    assert(full.nonEmpty)
    // DELETE batch 2: user 100 intact, user 200 touched (count 3 → 2,
    // click_to_purchase must vanish but view_to_click survive), user
    // 300 tombstoned, user 400 was never in the layer
    dataFiles.filterNot(f => f1(f.getName)).foreach(f => assert(f.delete()))
    Tables.invalidate(spark, evPath)
    operators.EventTimeQueries.releaseFunnelLags(spark)
    val shrunk = q
    assert(DedupQueries.derivedSourceOf(spark, "funnel_lags") == "shrink",
      DedupQueries.derivedSourceOf(spark, "funnel_lags"))
    // shrink ≡ rebuild: the query over the served layer equals the live
    // funnel over the surviving events
    val live = operators.EventTimeQueries.funnelTime(
      spark.read.parquet(evPath)
        .withColumn("ems",
          org.apache.spark.sql.functions.expr("ts div 1000000")))
      .collect().map(_.toSeq).toSeq
    assert(shrunk == live, s"shrunk=$shrunk live=$live")
    assert(shrunk != full)
    // batch 3: ONE view-only user in its own file, then retract it —
    // no artifact user is touched, so the closure returns the artifact
    // frame itself and the commit is sidecar-only (still "shrink")
    val f2 = dataFiles.map(_.getName).toSet
    Seq(ev(11, 500, 1000, "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(evPath)
    Tables.invalidate(spark, evPath)
    operators.EventTimeQueries.releaseFunnelLags(spark)
    q // serves (rebuild or append-veto rebuild — growth path)
    dataFiles.filterNot(f => f2(f.getName)).foreach(f => assert(f.delete()))
    Tables.invalidate(spark, evPath)
    operators.EventTimeQueries.releaseFunnelLags(spark)
    val afterNoop = q
    assert(DedupQueries.derivedSourceOf(spark, "funnel_lags") == "shrink")
    assert(afterNoop == shrunk)
    operators.EventTimeQueries.releaseFunnelLags(spark)
  }

  test("token layer appends per-doc exactly on a grown docs dir") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mftok").toString
    val docsPath = s"$dir/documents.parquet"
    def doc(i: Long) = (i, s"s${i % 2}", s"alpha beta w$i alpha")
    (1L to 9L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    val first = graft.operators.TextQueries.tokenLayer(spark, dir)
      .collect().map(_.toSeq).toSet
    (10L to 14L).map(doc).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(docsPath)
    Tables.invalidate(spark, docsPath)
    graft.operators.TextQueries.releaseTokenLayer(spark)
    val appended = graft.operators.TextQueries.tokenLayer(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(DedupQueries.derivedSourceOf(spark, "token_counts") == "append",
      DedupQueries.derivedSourceOf(spark, "token_counts"))
    // append ≡ full rebuild: per-doc token counts over the grown corpus
    val full = spark.read.parquet(docsPath)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "source", "token")
      .agg(count(lit(1)).as("c")).collect().map(_.toSeq).toSet
    assert(appended == full)
    assert(first.subsetOf(appended) && appended.size > first.size)
    graft.operators.TextQueries.releaseTokenLayer(spark)
  }

  test("a FOREIGN retrain raced against a warm model memo never blesses " +
       "a stale-model encode: the index tag carries the AT-LOAD model " +
       "epoch, so a fresh-model session REBUILDS instead of serving the " +
       "raced index as artifact (r18 self-review)") {
    import spark.implicits._
    val sq = operators.SimilarityQueries
    val dir = java.nio.file.Files.createTempDirectory("mfrace").toString
    val embPath = s"$dir/embeddings.parquet"
    def vec(i: Long): Seq[Float] = (0 until 64).map(j =>
      ((i * 131 + j * 17 + (i * i) % 257) % 101).toFloat / 101f)
    (0L to 29L).map(i => (i, vec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(embPath)
    // session A fits the models (epoch E1) and builds the encoded index
    sq.ivfpqIndex(spark, dir, trained = true).collect()
    assert(sq.trainSource(spark, "ivf", dir) == "fit")
    // drop only A's INDEX memo — its MODEL memo stays warm at E1
    sq.releaseIvfpqIndex(spark)
    // a FOREIGN session ends the epoch: refits the models (E2 on disk)
    // and rebuilds the index artifact under the E2 tag
    val sB = spark.newSession()
    sq.retrainModels(sB, dir)
    val e2Rows = sq.ivfpqIndex(sB, dir, trained = true)
      .collect().map(_.toSeq).toSet
    assert(sq.trainSource(sB, "ivf", dir) == "fit")
    assert(DedupQueries.derivedSourceOf(sB, "ivfpq_index") == "rebuild")
    // A serves with its warm E1 memo: the tag must describe the frames
    // A actually encodes (E1), so the E2 sidecar mismatches and A
    // re-encodes with its own frames — committing an E1-CONSISTENT
    // artifact, never an E1 encode blessed with an E2 tag
    sq.ivfpqIndex(spark, dir, trained = true).collect()
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index") == "rebuild",
      DedupQueries.derivedSourceOf(spark, "ivfpq_index"))
    // the decisive probe: a session loading the FRESH (E2) models must
    // MISMATCH A's raced write and rebuild. Under a stat-at-serve-time
    // tag, A's write would have carried E2 and this serve would read
    // "artifact" over a stale-model encode — silently, permanently.
    sq.releaseTrainedModels(spark)
    val fresh = sq.ivfpqIndex(spark, dir, trained = true)
      .collect().map(_.toSeq).toSet
    assert(DedupQueries.derivedSourceOf(spark, "ivfpq_index") == "rebuild",
      DedupQueries.derivedSourceOf(spark, "ivfpq_index"))
    assert(fresh == e2Rows, "the fresh-model serve must equal the E2 encode")
    sq.releaseTrainedModels(spark)
    sq.releaseTrainedModels(sB)
  }

  test("compaction policy TRANSIENT failure (lost fence) does NOT back " +
       "off: the aborted attempt leaves the layout intact and the next " +
       "serve retries and succeeds (r18 self-review)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("mftransient").toString
    val table = "g_drv_spec_policytransient"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    rm(new java.io.File(s"$wh/$table"))
    rm(new java.io.File(s"$wh/${table}__mf"))
    val invariantCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var stealLease = false
    def serve() = IndexArtifacts.serveDerivedIncremental(
      spark, table, src, "t1",
      spark.read.parquet(src).select(col("k"), (col("k") * 10).as("d")),
      paths => spark.read.parquet(paths: _*)
        .select(col("k"), (col("k") * 10).as("d")),
      compactInvariant = _ => {
        invariantCalls.incrementAndGet()
        if (stealLease) {
          // a foreign breaker takes the lease mid-compaction: the
          // invariant runs under the lease BEFORE the tmp write, so the
          // post-write fence check must see the foreign token and abort.
          // Written through the Hadoop FS so the LocalFileSystem's .crc
          // sidecar stays consistent (a raw java.nio overwrite logs
          // ChecksumException noise on every later read)
          val p = new org.apache.hadoop.fs.Path(s"$wh/${table}__lease")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val out = fs.create(p, true)
          out.write("foreign-token".getBytes("UTF-8")); out.close()
        }
        true
      })
    try {
      spark.conf.set("spark.graft.compact.fileGroups", "0")
      (1L to 3L).toDF("k").coalesce(1).write.mode("append").parquet(src)
      assert(serve()._2 == "rebuild")
      for (lo <- Seq(4L, 6L, 8L)) {
        (lo to lo + 1).toDF("k").coalesce(1).write.mode("append").parquet(src)
        Tables.invalidate(spark, src)
        assert(serve()._2 == "append")
      }
      assert(IndexArtifacts.fileGroupCount(spark, s"$wh/$table") > 2)
      spark.conf.set("spark.graft.compact.fileGroups", "2")
      // 1) the compaction attempt loses its fence after the tmp write:
      // transient — the original layout survives, and the serve itself
      // degrades to the contended live build (the stolen lease is live)
      stealLease = true
      invariantCalls.set(0)
      assert(serve()._2 == "rebuild") // contended degrade, no write
      assert(invariantCalls.get == 1, s"calls: ${invariantCalls.get}")
      assert(IndexArtifacts.fileGroupCount(spark, s"$wh/$table") > 2,
        "a fence-lost compaction must leave the fragmented layout intact")
      // 2) the breaker releases; the policy must RETRY (a transient
      // abort memoized as permanent would disable compaction forever on
      // a read-only layer) and succeed
      stealLease = false
      val leaseP = new org.apache.hadoop.fs.Path(s"$wh/${table}__lease")
      assert(leaseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(leaseP, false))
      invariantCalls.set(0)
      val (df, how) = serve()
      assert(how == "artifact")
      assert(invariantCalls.get == 1,
        "the transient failure must not memoize — the retry runs")
      assert(IndexArtifacts.fileGroupCount(spark, s"$wh/$table") == 1)
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        (1L to 9L).map(k => (k, k * 10)).toSet)
    } finally spark.conf.unset("spark.graft.compact.fileGroups")
  }
}
