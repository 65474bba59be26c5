package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Streaming-op behavior (SURVEY.md §2.4/§5.2-5): watermark late-drop,
  * session merging, stateful dedup, stream-static join — MemoryStream-driven
  * so out-of-order arrival is scripted exactly.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
  private def t2(h: Int, min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")

  test("watermark drops rows later than threshold (s_watermark_late)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = StreamingOps.tumblingCounts(in.toDF(), watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    // batch 1: events up to 10:55
    in.addData(Ev(t2(10, 5), 1, "click", 1.0), Ev(t2(10, 55), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: 11:30 → once committed, watermark = 11:20
    in.addData(Ev(t2(11, 30), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 3: 10:10 is far behind the 11:20 watermark → dropped; 11:35 fine
    in.addData(Ev(t2(10, 10), 1, "click", 1.0), Ev(t2(11, 35), 1, "click", 1.0))
    q.processAllAvailable()
    in.addData(Ev(t2(13, 0), 1, "click", 1.0)) // push watermark → close 11:00 window
    q.processAllAvailable()
    q.stop()
    // sum by window in case a window surfaces across multiple emissions
    val counts = spark.table("wm_out")
      .groupBy(date_format(col("ws"), "HH:mm").as("w"))
      .agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    // 10:00 window holds the on-time 10:05 + 10:55; the late 10:10 would
    // have made it 3 — its absence proves the watermark drop
    assert(counts.get("10:00").contains(2L), s"got $counts")
    assert(counts.get("11:00").contains(2L), s"got $counts") // 11:30 + 11:35
  }

  test("streaming session_window merges bursts and honors the gap (s_session_stream)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val sess = StreamingOps.sessionize(in.toDF(), "user_id", gap = "30 minutes",
                                       watermark = "5 minutes")
    val q = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    in.addData(Ev(t(0), 7, "a", 0), Ev(t(10), 7, "a", 0), Ev(t(25), 7, "a", 0))
    q.processAllAvailable()
    in.addData(Ev(t2(12, 0), 7, "a", 0)) // 30-min gap passed → new session
    q.processAllAvailable()
    in.addData(Ev(t2(14, 0), 7, "a", 0)) // advance watermark, close session 2
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_out")
      .select(col("user_id"), col("n")).as[(Long, Long)].collect().sortBy(-_._2)
    assert(rows.length >= 2)
    assert(rows.head == (7L, 3L)) // first burst = one session of 3
  }

  test("dropDuplicatesWithinWatermark dedups per key (s_stream_dedup)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val dd = StreamingOps.dedup(in.toDF(), Seq("user_id", "event_type"))
    val q = dd.writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    in.addData(Ev(t(0), 1, "click", 1), Ev(t(1), 1, "click", 2),
               Ev(t(2), 2, "click", 3), Ev(t(3), 1, "view", 4))
    q.processAllAvailable()
    q.stop()
    val n = spark.table("dd_out").count()
    assert(n == 3) // (1,click) deduped; (2,click) and (1,view) kept
  }

  test("stream-static broadcast join enriches events (s_stream_join)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val joined = StreamingOps.enrich(in.toDF(), dim, "user_id", "k")
    val q = joined.writeStream.format("memory").queryName("join_out").start()
    in.addData(Ev(t(0), 1, "click", 1), Ev(t(1), 9, "click", 1))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("join_out").select("user_id", "tier")
      .as[(Long, Option[String])].collect().toMap
    assert(rows(1L).contains("gold"))
    assert(rows(9L).isEmpty) // left outer keeps unmatched stream rows
  }

  test("stream-stream interval join matches within the horizon only " +
       "(s_stream_stream_join)") {
    implicit val sq = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val joined = StreamingOps.intervalJoin(
      purchases.toDF(), signups.toDF(), "user_id",
      horizon = "1 hour", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    // u1 signs up 10:00 and buys 10:30 (in horizon); u2 signs up 10:00
    signups.addData(Ev(t2(10, 0), 1, "signup", 0),
                    Ev(t2(10, 0), 2, "signup", 0))
    purchases.addData(Ev(t2(10, 30), 1, "purchase", 5.0))
    q.processAllAvailable()
    // u2 buys 11:30 — 1.5 h after signup, outside the 1 h horizon → no row
    purchases.addData(Ev(t2(11, 30), 2, "purchase", 6.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_out")
      .select("user_id", "l_ts", "r_ts")
      .as[(Long, Timestamp, Timestamp)].collect().toSeq
    assert(got == Seq((1L, t2(10, 30), t2(10, 0))))
  }

  test("corpusIngest gates quality and dedups content within the watermark") {
    implicit val sq = spark.sqlContext
    val long1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 35).map(i => s"x$i").mkString(" ")
    val in = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingOps.corpusIngest(
      in.toDF().toDF("ts", "doc_id", "text"), "text", "ts")
    val q = out.writeStream.format("memory").queryName("corpus_out")
      .outputMode("append").start()
    in.addData((t(0), 1L, long1), (t(1), 2L, "too short"), (t(2), 3L, other))
    q.processAllAvailable()
    // same content again within the watermark horizon → exact dup, drops
    in.addData((t(3), 4L, long1))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("corpus_out")
      .select("doc_id", "n_tokens").orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    // doc 2 failed the token floor; doc 4 was a content dup of doc 1
    assert(got == Seq((1L, 40L), (3L, 35L)), got.mkString(","))
  }

  test("TextQueries.clean composes under readStream (stateless projection)") {
    // the C4-style cleaner is a pure per-row projection, so the same
    // transform runs unchanged over an unbounded stream in append mode —
    // the streaming half of a corpus-ingest pipeline gets the batch
    // semantics for free
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val body = (1 to 20).map(i => s"tok$i").mkString(" ")
    val cleaned = graft.operators.TextQueries.clean(
      in.toDS().toDF("doc_id", "text"))
    val q = cleaned.writeStream.format("memory").queryName("clean_stream")
      .outputMode("append").start()
    in.addData(
      (1L, s"call 12345678 now ok yes\n$body"),
      (2L, "too thin"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("clean_stream").orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L)) // thin doc gated out
    assert(got(0).getString(1).startsWith("call <PHONE> now ok yes\n"))
  }

  test("learned quality gate composes under readStream (s_quality_gate)") {
    // the trained model applies as a pure per-row projection
    // (rowQualityGate — constant-folded weights, sorted-run decimal
    // fold), so the streaming gate is the batch expression unchanged in
    // append mode; two micro-batches pin row equality with the batch run
    implicit val sq = spark.sqlContext
    val model = Array(0.5, -0.25, 1.5, 0.02, -0.1, 0.05) // 3 buckets+len+w0+thr
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextQueries.rowQualityGate(df, model)
    val rows = Seq((1L, "aa bb aa cc"), (2L, ""), (3L, "zz zz zz"),
                   (4L, (1 to 30).map(i => s"t$i").mkString(" ")))
    val in = MemoryStream[(Long, String)]
    val q = gate(in.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    in.addData(rows.take(2): _*)
    q.processAllAvailable()
    in.addData(rows.drop(2): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gate_stream").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val want = gate(rows.toDF("doc_id", "text")).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"got $got want $want")
    assert(got.size == 4)
  }

  test("bloom membership gate composes under readStream (s_dedup_gate)") {
    // the corpus sketch applies as a pure per-row projection (foldable
    // binary literal + xxhash64 probe), so the streaming gate is the
    // batch expression unchanged in append mode; two micro-batches pin
    // row equality with the batch twin, and the corpus rows themselves
    // pin zero false negatives (a Bloom filter cannot miss an inserted
    // element)
    implicit val sq = spark.sqlContext
    import graft.operators.DedupQueries.{bloomGateRows, bloomAgg}
    val corpus = Seq((10L, "seen one"), (11L, "seen two"), (12L, "seen three"))
    val bytes = bloomAgg(corpus.toDF("doc_id", "text"),
        graft.api.IndexArtifacts.BloomExpectedItems,
        graft.api.IndexArtifacts.BloomNumBits)
      .collect().head.getAs[Array[Byte]]("bf")
    val probe = Seq((1L, "seen one"), (2L, "never before"),
                    (3L, "seen three"), (4L, "also novel"))
    val in = MemoryStream[(Long, String)]
    val q = bloomGateRows(in.toDS().toDF("doc_id", "text"), bytes)
      .writeStream.format("memory").queryName("bloom_gate_stream")
      .outputMode("append").start()
    in.addData(probe.take(2): _*)
    q.processAllAvailable()
    in.addData(probe.drop(2): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bloom_gate_stream").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val want = bloomGateRows(probe.toDF("doc_id", "text"), bytes)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got == want, s"got $got want $want")
    // zero false negatives: every corpus text must flag as maybe_seen
    val fn = bloomGateRows(corpus.toDF("doc_id", "text"), bytes)
      .collect().filter(!_.getBoolean(1))
    assert(fn.isEmpty, s"false negatives: ${fn.mkString(",")}")
    // the duplicated corpus texts in the probe flagged too
    assert(got.filter(t => Set(1L, 3L)(t._1)).forall(_._2))
  }

  test("contamination gate composes under readStream " +
       "(s_contamination_gate) with zero false negatives") {
    // the benchmark-shingle sketch applies as a pure per-row fold
    // (exists over the row's shingle-hash array), so the streaming gate
    // is the batch expression unchanged in append mode; a Bloom filter
    // cannot miss an inserted element, so every doc sharing a shingle
    // with the benchmark MUST flag
    implicit val sq = spark.sqlContext
    import graft.operators.{DedupQueries, TextQueries}
    val leak = "alpha beta gamma delta" // a 4-token benchmark phrase
    val bench = Seq((50L, leak)).toDF("doc_id", "text")
    val bytes = DedupQueries.bloomAggOver(
        DedupQueries.shinglesOf(bench).select("h").distinct(), col("h"),
        graft.api.IndexArtifacts.BloomExpectedItems,
        graft.api.IndexArtifacts.BloomNumBits)
      .collect().head.getAs[Array[Byte]]("bf")
    val probe = Seq(
      (1L, s"intro $leak outro"),          // contains a benchmark shingle
      (2L, "totally unrelated clean text body"),
      (3L, "alpha beta delta gamma"),      // same words, no shared 3-gram
      (4L, "xy"))                          // < 3 tokens: no shingles
    val in = MemoryStream[(Long, String)]
    val q = TextQueries.contaminationGateRows(
        in.toDS().toDF("doc_id", "text"), bytes)
      .writeStream.format("memory").queryName("contam_gate_stream")
      .outputMode("append").start()
    in.addData(probe.take(2): _*)
    q.processAllAvailable()
    in.addData(probe.drop(2): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("contam_gate_stream").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val want = TextQueries.contaminationGateRows(
        probe.toDF("doc_id", "text"), bytes).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got == want, s"got $got want $want")
    // zero false negatives: doc 1 shares shingles with the benchmark
    assert(got.find(_._1 == 1L).exists(_._2))
    // shingle-less doc gates clean like the exact probe
    assert(got.find(_._1 == 4L).exists(!_._2))
  }

  test("fuzzy dedup gate composes under readStream (s_fuzzy_gate): " +
       "two micro-batches bit-equal the batch twin") {
    // per-row signing is a pure projection and the band probes are
    // stream-static equi LEFT joins (one per band COLUMN — no explode,
    // no aggregation, no state), so the streaming gate is the batch
    // expression unchanged in append mode
    implicit val sq = spark.sqlContext
    import graft.operators.DedupQueries
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (100L, body),
      (101L, "corpus only " + (1 to 20).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val corpusSigs = DedupQueries.fuzzyGateCorpusSigs(corpus)
    val hot = Array.empty[Long] // tiny corpus: no shingle crosses DfCap
    val probe = Seq(
      (1L, body),                                        // exact duplicate
      (2L, "novel " + (1 to 20).map(i => s"q$i").mkString(" ")),
      (3L, (1 to 30).map(i => if (i == 30) "chg" else s"w$i").mkString(" ")),
      (4L, "xy"))                                        // < 3 tokens
    val in = MemoryStream[(Long, String)]
    val q = DedupQueries.fuzzyGateRows(
        in.toDS().toDF("doc_id", "text"), hot, corpusSigs)
      .writeStream.format("memory").queryName("fuzzy_gate_stream")
      .outputMode("append").start()
    in.addData(probe.take(2): _*)
    q.processAllAvailable()
    in.addData(probe.drop(2): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val got = rows(spark.table("fuzzy_gate_stream"))
    val want = rows(
      DedupQueries.fuzzyGateRows(probe.toDF("doc_id", "text"), hot, corpusSigs))
    assert(got == want, s"got $got want $want")
    assert(got.size == 4)
    // an exact duplicate hits EVERY band (identical text → identical sigs)
    assert(got.find(_._1 == 1L)
      .exists(t => t._3 && t._2 == DedupQueries.FuzzyBands.toLong))
    // novel and shingle-less docs pass clean
    assert(got.find(_._1 == 2L).exists(!_._3))
    assert(got.find(_._1 == 4L).exists(t => !t._3 && t._2 == 0L))
  }

  test("nearest-duplicate attach composes under readStream " +
       "(s_fuzzy_attach): two micro-batches bit-equal the batch twin; " +
       "an exact duplicate points at its twin, a novel doc at null") {
    implicit val sq = spark.sqlContext
    import graft.operators.DedupQueries
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (100L, body),
      (150L, body), // second copy: attach must point at the SMALLER id
      (101L, "corpus only " + (1 to 20).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val corpusSigs = DedupQueries.fuzzyGateCorpusSigs(corpus)
    val hot = Array.empty[Long]
    val probe = Seq(
      (1L, body),                                        // exact duplicate
      (2L, "novel " + (1 to 20).map(i => s"q$i").mkString(" ")),
      (3L, "xy"))                                        // < 3 tokens
    val in = MemoryStream[(Long, String)]
    val q = DedupQueries.fuzzyAttachRows(
        in.toDS().toDF("doc_id", "text"), hot, corpusSigs)
      .writeStream.format("memory").queryName("fuzzy_attach_stream")
      .outputMode("append").start()
    in.addData(probe.take(1): _*)
    q.processAllAvailable()
    in.addData(probe.drop(1): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val got = rows(spark.table("fuzzy_attach_stream"))
    val want = rows(DedupQueries.fuzzyAttachRows(
      probe.toDF("doc_id", "text"), hot, corpusSigs))
    assert(got == want, s"got $got want $want")
    val byId = got.map(r => r.head.asInstanceOf[Long] -> r).toMap
    // duplicate of BOTH 100 and 150: every band hits, pointer = min id
    assert(byId(1L)(1) == DedupQueries.FuzzyBands.toLong &&
      byId(1L)(2) == 100L, s"dup row: ${byId(1L)}")
    // novel and shingle-less docs attach to nothing
    assert(byId(2L)(2) == null && byId(3L)(2) == null)
  }

  test("cluster route composes under readStream (s_cluster_route): " +
       "bit-equal to the batch twin; a clustered match routes to its " +
       "label, a singleton to itself, a miss to null") {
    implicit val sq = spark.sqlContext
    import graft.operators.DedupQueries
    val bodyB = (1 to 30).map(i => s"w$i").mkString(" ")
    val bodyC = "solo " + (1 to 25).map(i => s"v$i").mkString(" ")
    // corpus doc 20 is clustered under label 10 (its near-dup twin is
    // NOT in the sig index — the transitive-chain case where the probe
    // only reaches a non-canonical member); doc 40 is a singleton
    val corpus = Seq((20L, bodyB), (40L, bodyC)).toDF("doc_id", "text")
    val corpusSigs = DedupQueries.fuzzyGateCorpusSigs(corpus)
    val labels = Seq((20L, 10L)).toDF("id", "label")
    val hot = Array.empty[Long]
    val probe = Seq(
      (1L, bodyB),   // matches 20 → routes to CLUSTER label 10
      (2L, bodyC),   // matches singleton 40 → routes to 40 itself
      (3L, "novel " + (1 to 20).map(i => s"q$i").mkString(" ")))
    val in = MemoryStream[(Long, String)]
    val q = DedupQueries.clusterRouteRows(
        in.toDS().toDF("doc_id", "text"), hot, corpusSigs, labels)
      .writeStream.format("memory").queryName("cluster_route_stream")
      .outputMode("append").start()
    in.addData(probe.take(1): _*)
    q.processAllAvailable()
    in.addData(probe.drop(1): _*)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val got = rows(spark.table("cluster_route_stream"))
    val want = rows(DedupQueries.clusterRouteRows(
      probe.toDF("doc_id", "text"), hot, corpusSigs, labels))
    assert(got == want, s"got $got want $want")
    val byId = got.map(r => r.head.asInstanceOf[Long] -> r).toMap
    assert(byId(1L)(2) == 20L && byId(1L)(3) == 10L,
      s"clustered route: ${byId(1L)}")
    assert(byId(2L)(2) == 40L && byId(2L)(3) == 40L,
      s"singleton route: ${byId(2L)}")
    assert(byId(3L)(2) == null && byId(3L)(3) == null)
  }

  test("s_fuzzy_gate probe signatures equal the capped index's " +
       "signatures row-for-row (the recall lemma)") {
    // the shipped hot set IS the DfCap policy, so a row's pure-projection
    // signature must equal what the corpus index holds for the same text
    // — over EVERY fixture doc, including hot-shingle and short-text edges
    import graft.operators.DedupQueries
    val hot = DedupQueries.fuzzyGateHotSet(spark, sf)
    val probe = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(DedupQueries.perRowBandSigs(col("text"), hot)).as("sig"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val idx = DedupQueries.bandSigTable(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(probe == idx,
      s"probe-only: ${(probe -- idx).take(3)}; index-only: ${(idx -- probe).take(3)}")
  }

  test("s_fuzzy_gate recall vs q_dedup_train_test: every verified " +
       "bench near-dup flags") {
    // candidates ⊇ verified pairs by construction (the gate's band join
    // IS train_test's candidate generation), so a verified bench doc the
    // gate missed would be a broken invariant, not bad luck
    val gate = SparkEntry.queries("s_fuzzy_gate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val verified = SparkEntry.queries("q_dedup_train_test")(spark, sf)
      .collect().map(_.getLong(1)).toSet
    assert(verified.nonEmpty,
      "fixture has no verified train/test near-dups — the recall pin " +
      "would be vacuous; check the fixture split")
    val missed = verified.filterNot(id => gate.getOrElse(id, false))
    assert(missed.isEmpty, s"gate missed verified bench ids: ${missed.take(5)}")
  }

  test("s_contamination_gate agrees with the exact probe: every " +
       "exactly-contaminated doc flags (no false negatives)") {
    import graft.operators.TextQueries
    val gate = SparkEntry.queries("s_contamination_gate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val exact = TextQueries.queries("q_text_contamination")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(2) > 0)).toMap
    val fn = exact.filter { case (id, dirty) => dirty && !gate(id) }
    assert(fn.isEmpty, s"false negatives: ${fn.keys.take(5)}")
    // and the gate is deterministic across runs
    val again = SparkEntry.queries("s_contamination_gate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(gate == again)
  }

  test("s_dedup_gate production path is deterministic with sorted output") {
    val q = SparkEntry.queries("s_dedup_gate")
    val a = q(spark, sf).collect().map(_.toSeq).toSeq
    val b = q(spark, sf).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
    assert(q(spark, sf).columns.toSeq == Seq("doc_id", "maybe_seen"))
  }

  test("media encode+decode composes under readStream (s_mm_decode)") {
    // the codec path is stateless mapPartitions twice over, so the same
    // operators run unchanged over an unbounded stream in append mode —
    // the streaming half of a multimodal-ingest pipeline; the batch twin
    // s_mm_decode is oracle-checked against the byte-math mirror
    implicit val sq = spark.sqlContext
    import graft.operators.MultimodalQueries.{decodeMediaFeatures, encodeMedia}
    def mediaDf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("media_id"), col("media_type"),
                col("payload_s").cast("binary").as("payload"))
    val rows = Seq((1L, "image", "abcdefghij"), (2L, "audio", "xyz"),
                   (3L, "video", "0123456789abcdef"), (4L, "image", ""))
    val in = MemoryStream[(Long, String, String)]
    val decoded = decodeMediaFeatures(encodeMedia(
      mediaDf(in.toDS().toDF("media_id", "media_type", "payload_s"))))
    val q = decoded.writeStream.format("memory").queryName("mm_stream")
      .outputMode("append").start()
    in.addData(rows.take(2): _*)
    q.processAllAvailable()
    in.addData(rows.drop(2): _*) // second micro-batch, incl. empty payload
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mm_stream").orderBy("media_id").collect().toSeq
    val want = decodeMediaFeatures(encodeMedia(mediaDf(
      rows.toDF("media_id", "media_type", "payload_s"))))
      .orderBy("media_id").collect().toSeq
    assert(got.map(_.toSeq) == want.map(_.toSeq), s"got $got want $want")
    assert(got.size == 3) // the empty payload produced no container
  }

  test("windowed-aggregation STATE survives a checkpointed restart") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("aggck").toString
    val out = java.nio.file.Files.createTempDirectory("aggout").toString
    def start() = StreamingOps.tumblingCounts(in.toDF(), watermark = "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // process 1: two clicks land in the 10:00 window; state checkpointed,
    // window still open (watermark behind)
    val q1 = start()
    in.addData(Ev(t2(10, 5), 1, "click", 1.0), Ev(t2(10, 20), 1, "click", 1.0))
    q1.processAllAvailable()
    q1.stop()
    // process 2 (same checkpoint): one more click in the SAME window,
    // then an event far ahead to push the watermark and close it
    val q2 = start()
    in.addData(Ev(t2(10, 40), 1, "click", 1.0))
    q2.processAllAvailable()
    in.addData(Ev(t2(13, 0), 1, "click", 1.0))
    q2.processAllAvailable()
    q2.stop()
    // recovered state means ONE row for the 10:00 window counting all
    // three clicks — lost state would emit a fresh 1-count row (or two
    // rows) for that window
    val rows = spark.read.parquet(out)
      .filter(date_format(col("ws"), "HH:mm") === "10:00")
      .select("n").as[Long].collect().toSeq
    assert(rows == Seq(3L), s"window rows: $rows")
  }

  test("semantic dedup gate composes under readStream (s_semantic_gate): " +
       "two micro-batches bit-equal the batch twin; exact-dup vectors " +
       "with a cap-resident twin always flag") {
    // centroids ship as literal vectors and the probe cells are COLUMNS,
    // so the whole gate is projections + two stream-static equi joins —
    // stateless, append-mode legal
    implicit val sq = spark.sqlContext
    val sg = graft.operators.SimilarityQueries
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0)),
      (2L, Array(0.0, 0.0, 0.0, 1.0))) // cell 2 stays EMPTY
    val corpus = Seq(
      (100L, Seq(1.0, 0.01, 0.0, 0.0)),   // cell 0
      (101L, Seq(0.01, 1.0, 0.0, 0.0)),   // cell 1
      (102L, Seq(0.9, 0.45, 0.0, 0.0)))   // cell 0
      .toDF("vec_id", "v")
    val centsDf = cents.map { case (c, v) => (c, v.toSeq) }
      .toDF("cid", "cv")
    val pack = sg.semanticGateCellPack(corpus, centsDf)
    def gate(df: org.apache.spark.sql.DataFrame) =
      sg.semanticGateRows(df, cents, pack)
    val probe = Seq(
      (1L, Seq(1.0, 0.01, 0.0, 0.0)),  // EXACT dup of corpus 100
      (2L, Seq(0.0, 0.0, 1.0, 0.0)),   // orthogonal to everything
      (3L, Seq(0.95, 0.4, 0.0, 0.0)),  // near-dup of corpus 102
      (4L, Seq(0.0, 0.0, 0.0, 1.0)))   // probes the EMPTY cell first
    val in = MemoryStream[(Long, Seq[Double])]
    val q = gate(in.toDS().toDF("vec_id", "v"))
      .writeStream.format("memory").queryName("semantic_gate_stream")
      .outputMode("append").start()
    in.addData(probe.take(2): _*)
    q.processAllAvailable()
    in.addData(probe.drop(2): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("semantic_gate_stream").orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    val want = gate(probe.toDF("vec_id", "v")).orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"got $got want $want")
    val byId = got.map(r => r.head.asInstanceOf[Long] -> r).toMap
    // exact duplicate: same cell by assignment determinism, cosine 1 —
    // a semantic gate cannot miss it
    assert(byId(1L)(1) == 100L && byId(1L)(3) == true, s"dup row: ${byId(1L)}")
    // near-dup past τ flags; orthogonal row and empty-cell prober don't
    assert(byId(3L)(3) == true)
    assert(byId(2L)(3) == false && byId(4L)(3) == false)
    // determinism across reruns of the batch twin
    assert(want == gate(probe.toDF("vec_id", "v")).orderBy("vec_id")
      .collect().map(_.toSeq).toSeq)
  }

  test("streaming ANN retrieval (s_ann_query): two micro-batches " +
       "bit-equal the batch twin; an exact-match query returns its twin " +
       "at rank 1") {
    implicit val sq = spark.sqlContext
    val sg = graft.operators.SimilarityQueries
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0)),
      (2L, Array(0.0, 0.0, 1.0, 0.0)),  // cells 2 and 3 stay EMPTY
      (3L, Array(0.0, 0.0, 0.0, 1.0)))
    val corpus = Seq(
      (100L, Seq(1.0, 0.01, 0.0, 0.0)),
      (101L, Seq(0.9, 0.45, 0.0, 0.0)),
      (102L, Seq(0.8, 0.6, 0.0, 0.0)),
      (103L, Seq(0.01, 1.0, 0.0, 0.0)))
      .toDF("vec_id", "v")
    val centsDf = cents.map { case (c, v) => (c, v.toSeq) }.toDF("cid", "cv")
    val pack = sg.semanticGateCellPack(corpus, centsDf)
    def serve(df: org.apache.spark.sql.DataFrame) =
      sg.annServeRows(df, cents, pack)
    val probe = Seq(
      (1L, Seq(1.0, 0.01, 0.0, 0.0)),  // exact match of corpus 100
      (2L, Seq(0.7, 0.7, 0.0, 0.0)),   // between the populated cells
      (3L, Seq(0.0, 0.0, 0.6, 0.8)))   // probes ONLY the two empty cells
    val in = MemoryStream[(Long, Seq[Double])]
    val q = serve(in.toDS().toDF("vec_id", "v"))
      .writeStream.format("memory").queryName("ann_query_stream")
      .outputMode("append").start()
    in.addData(probe.take(1): _*)
    q.processAllAvailable()
    in.addData(probe.drop(1): _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ann_query_stream").orderBy("q_id", "rnk")
      .collect().map(_.toSeq).toSeq
    val want = serve(probe.toDF("vec_id", "v")).orderBy("q_id", "rnk")
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"got $got want $want")
    // exact match leads its result list; ranks are 1..k and sims
    // non-increasing within a query
    val q1 = got.filter(_.head == 1L)
    assert(q1.head(2) == 100L && q1.head(1) == 1L, s"q1: $q1")
    // a query probing only EMPTY cells still answers — one all-null
    // row, never a silent drop
    val q3 = got.filter(_.head == 3L)
    assert(q3.size == 1 && q3.head(1) == null && q3.head(2) == null,
      s"empty-cell query must emit a null answer row: $q3")
    got.filter(r => r.head != 3L).groupBy(_.head).foreach { case (_, rows) =>
      val sims = rows.sortBy(r => r(1).asInstanceOf[Long])
        .map(_(3).asInstanceOf[Long])
      assert(sims == sims.sorted.reverse, s"sims not ranked: $rows")
    }
  }

  test("composed curation pipeline (s_curation_pipeline): three gates " +
       "chain statelessly — out-of-order rows BEHIND the watermark still " +
       "bit-equal the batch twin (VERDICT r14 #6)") {
    implicit val sq = spark.sqlContext
    import graft.operators.{DedupQueries, TextQueries}
    // crafted model: score = min(n_tokens/400, 1), threshold 0.02 —
    // docs under 8 tokens fail the quality gate (dim=2: one hashed
    // bucket at weight 0, the length feature at 1.0, bias 0)
    val model = Array(0.0, 1.0, 0.0, 0.02)
    val corpusText = "seen one two three four five six seven eight"
    val corpusBytes = DedupQueries.bloomAgg(
        Seq((10L, corpusText)).toDF("doc_id", "text"),
        graft.api.IndexArtifacts.BloomExpectedItems,
        graft.api.IndexArtifacts.BloomNumBits)
      .collect().head.getAs[Array[Byte]]("bf")
    val leak = "alpha beta gamma delta"
    val benchBytes = DedupQueries.bloomAggOver(
        DedupQueries.shinglesOf(Seq((50L, leak)).toDF("doc_id", "text"))
          .select("h").distinct(), col("h"),
        graft.api.IndexArtifacts.BloomExpectedItems,
        graft.api.IndexArtifacts.BloomNumBits)
      .collect().head.getAs[Array[Byte]]("bf")
    def pipe(df: org.apache.spark.sql.DataFrame) =
      TextQueries.curationPipelineRows(df, model, corpusBytes, benchBytes)
    // one row per fate: survive; quality-reject; membership-reject;
    // contamination-reject; survive but arrive LATE behind the watermark
    val rows = Seq(
      (1L, "clean novel body with plenty of fresh tokens", t2(10, 0)),
      (2L, "too short", t2(10, 0)),
      (3L, corpusText, t2(10, 1)),
      (4L, s"intro $leak and still eight more trailing tokens", t2(10, 1)),
      (5L, "late but perfectly valid document body tokens here", t2(10, 0)))
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = pipe(in.toDS().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    in.addData(rows.take(2): _*)
    q.processAllAvailable()
    in.addData(rows.slice(2, 4): _*) // watermark advances past 10:00
    q.processAllAvailable()
    in.addData(rows.drop(4): _*)     // doc 5's ts is BEHIND the watermark
    q.processAllAvailable()
    q.stop()
    val got = spark.table("curation_stream").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val want = pipe(rows.toDF("doc_id", "text", "ts")).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"got $got want $want")
    // every row reports with its per-stage flags; each gate rejected its
    // crafted row, the short-circuited stages stay null, and the late
    // survivor was NOT dropped — a stateless chain gives a watermark
    // nothing to act on
    val keep = got.filter(_.last == true).map(_.head)
    assert(keep == Seq(1L, 5L), s"survivors: $got")
    val byId = got.map(r => r.head.asInstanceOf[Long] -> r).toMap
    assert(byId(2L)(2) == false && byId(2L)(3) == null,  // quality reject
      s"row 2: ${byId(2L)}")
    assert(byId(3L)(3) == true && byId(3L)(4) == null,   // membership reject
      s"row 3: ${byId(3L)}")
    assert(byId(4L)(4) == true,                          // contamination
      s"row 4: ${byId(4L)}")
  }

  test("file-replay ingest restarts from checkpoint without duplicates (R9/R10)") {
    val srcDir = java.nio.file.Files.createTempDirectory("sbs1src")
    val outDir = java.nio.file.Files.createTempDirectory("sbs1out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sbs1ck").toString
    val mk = (i: Int) =>
      f"MSG,3,111,$i,HX$i%04d,$i,2026/08/12,14:21:${i % 60}%02d.000,2026/08/12,14:21:${i % 60}%02d.100,,$i,,,1.0,2.0,,,0,0,0,0"
    java.nio.file.Files.write(srcDir.resolve("a.txt"),
      (0 until 20).map(mk).mkString("", "\n", "\n").getBytes)
    def runOnce(): Unit = {
      val q = StreamingOps.writeParquet(
        StreamingOps.ingestFiles(spark, srcDir.toString), outDir, ckpt)
      q.awaitTermination()
    }
    runOnce()
    java.nio.file.Files.write(srcDir.resolve("b.txt"),
      (20 until 30).map(mk).mkString("", "\n", "\n").getBytes)
    runOnce() // restart from checkpoint — must process ONLY the new file
    val got = spark.read.parquet(outDir)
    assert(got.count() == 30)
    assert(got.select("hex_ident").distinct().count() == 30)
  }
}
