package graft

import graft.api.IndexArtifacts
import graft.operators.DedupQueries

/** The derived-layer artifact family (persistDerived/readDerived +
  * DedupQueries.servedDerived): fingerprint-guarded round-trip, torn
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
}
