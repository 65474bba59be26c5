package graft

import org.apache.spark.sql.functions._
import graft.api.implicits._

/** The user-facing operator library (graft.api) driven as a library user
  * would: generic column names, composable DataFrames.
  */
class GraftOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupFirst keeps the deterministic first row per key") {
    val df = Seq((1, 10, "b"), (1, 5, "a"), (2, 7, "c")).toDF("k", "ts", "v")
    val got = graft.api.GraftOps.dedupFirst(df, Seq("k"), Seq(col("ts"), col("v")))
      .orderBy("k").as[(Int, Int, String)].collect().toSeq
    assert(got == Seq((1, 5, "a"), (2, 7, "c")))
  }

  test("asOfJoinPrior attaches the latest prior right value per key") {
    val trades = Seq((1L, 100L), (1L, 205L), (2L, 50L)).toDF("k", "t")
    val quotes = Seq((1L, 90L, 1.0), (1L, 200L, 2.0), (1L, 300L, 3.0))
      .toDF("k", "t", "px")
    val got = trades.asOfJoinPrior(quotes, "k", "t", "t", "px")
      .select("k", "t", "asof_px").orderBy("k", "t")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((1L, 100L, Some(1.0)), (1L, 205L, Some(2.0)),
                      (2L, 50L, None)))
  }

  test("asOfJoinPrior: same-ts ties are deterministic; NULL values count") {
    // two quotes at t=200 — the greater value must win the tie, always
    val trades = Seq((1L, 205L), (2L, 100L)).toDF("k", "t")
    val quotes = Seq((1L, 200L, Some(2.0)), (1L, 200L, Some(7.0)),
                     (2L, 50L, Some(1.0)), (2L, 90L, Option.empty[Double]))
      .toDF("k", "t", "px")
    val got = trades.asOfJoinPrior(quotes, "k", "t", "t", "px")
      .select("k", "t", "asof_px").orderBy("k", "t")
      .as[(Long, Long, Option[Double])].collect().toSeq
    // k=2: the latest observation (t=90) has a NULL px — it must NOT be
    // skipped for the older non-null 1.0
    assert(got == Seq((1L, 205L, Some(7.0)), (2L, 100L, None)))
  }

  test("asOfJoinPrior: a NULL-ts right row never fabricates a prior " +
       "observation (r18 self-review)") {
    // a NULL-ts observation would sort FIRST under the ascending window
    // (nulls-first) with a non-null struct — left rows preceding every
    // REAL observation must still read "no prior observation"
    val trades = Seq((1L, 100L), (1L, 300L)).toDF("k", "t")
    val quotes = Seq((1L, Option.empty[Long], 9.0), (1L, Some(200L), 2.0))
      .toDF("k", "t", "px")
    val got = trades.asOfJoinPrior(quotes, "k", "t", "t", "px")
      .select("k", "t", "asof_px").orderBy("k", "t")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((1L, 100L, None), (1L, 300L, Some(2.0))))
  }

  test("sessionize assigns gap-based session ids") {
    val df = Seq((1, 0L), (1, 1000L), (1, 10000L), (2, 0L))
      .toDF("k", "ms")
    val got = df.sessionize("k", col("ms"), gapMs = 5000)
      .orderBy("k", "ms").select("k", "ms", "session_id")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((1, 0L, 1L), (1, 1000L, 1L), (1, 10000L, 2L), (2, 0L, 1L)))
  }

  test("minhashPairs finds the fixture's planted near-duplicates generically") {
    val pairs = Tables.documents(spark, sf)
      .minhashPairs("doc_id", "text", threshold = 0.8)
      .collect()
    assert(pairs.nonEmpty)
    // agrees with the verified t2 operator on the same data
    val t2 = SparkEntry.queries("q_dedup_ngram")(spark, sf)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val lib = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t2.subsetOf(lib) || lib.subsetOf(t2) || (t2 & lib).nonEmpty)
  }

  test("winnowPairs: generic columns equal the verified t2 operator; " +
       "identical crafted docs pair at Jaccard 1.0") {
    val got = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").as("body"))
      .winnowPairs("id", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val ref = SparkEntry.queries("q_dedup_winnow")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == ref)
    val crafted = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "x1 x2 x3 x4 x5 x6 x7")).toDF("id", "body")
    val pairs = crafted.winnowPairs("id", "body").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(pairs == Seq((1L, 2L, 1000000L)), pairs)
  }

  test("heavyHitters returns exactly the > n/(K+1) items with exact counts") {
    val items = (Seq.fill(200)("a") ++ Seq.fill(90)("b") ++
      (0 until 2000).map(i => s"z$i")).toDF("it")
    // n = 2290 → threshold 45.8: a (200) and b (90) only, exact counts
    val out = items.heavyHitters("it").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 200L), ("b", 90L)), out)
  }

  test("heavyHittersWeighted over pre-aggregated counts equals the " +
       "per-occurrence form (grouped variant too)") {
    // same corpus two ways: one row per occurrence vs (item, count)
    val occ = (Seq.fill(200)("a") ++ Seq.fill(90)("b") ++
      (0 until 2000).map(i => s"z$i")).toDF("it")
    val pre = occ.groupBy("it").agg(count(lit(1)).as("w"))
    val a = occ.heavyHitters("it").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = graft.api.GraftOps.heavyHittersWeighted(pre, "it", "w")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b && a == Seq(("a", 200L), ("b", 90L)), (a, b))
    // grouped: per-group thresholds stay independent under weights
    val rows = (Seq.fill(60)(("g1", "x")) ++ Seq.fill(5)(("g1", "y")) ++
      (0 until 500).map(i => ("g1", s"r$i")) ++ Seq.fill(9)(("g2", "y")))
    val g1 = graft.api.GraftOps
      .heavyHittersBy(rows.toDF("g", "item"), "g", "item").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val g2 = graft.api.GraftOps.heavyHittersByWeighted(
        rows.toDF("g", "item").groupBy("g", "item")
          .agg(count(lit(1)).as("w")), "g", "item", "w").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(g1 == g2, (g1, g2))
  }

  test("minhashJoin: cross-corpus pairs equal the self-join pairs that cross the split") {
    val docs = Tables.documents(spark, sf)
    val leftDocs = docs.filter(col("doc_id") % 2 === 0)
    val rightDocs = docs.filter(col("doc_id") % 2 =!= 0)
    val cross = leftDocs.minhashJoin(rightDocs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => {
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b), r.getLong(2))
      }).toSet
    // the same arithmetic self-joined, restricted to pairs crossing the split
    val expected = docs.minhashPairs("doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => (a % 2 == 0) != (b % 2 == 0) }.toSet
    assert(cross == expected)
    assert(cross.nonEmpty) // the fixture's planted near-dups include cross-parity pairs
  }

  test("minhashJoin: overlapping id spaces between the two sides do not corrupt results") {
    val docs = Tables.documents(spark, sf)
    // re-key both halves onto heavily-overlapping 0-based id spaces — the
    // realistic case of two independently-numbered corpora
    val leftDocs = docs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") / 2).cast("long").as("doc_id"), col("text"))
    val rightDocs = docs.filter(col("doc_id") % 2 =!= 0)
      .select(((col("doc_id") - 1) / 2).cast("long").as("doc_id"), col("text"))
    val got = leftDocs.minhashJoin(rightDocs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth: the same join with the right side shifted to a
    // disjoint id range, mapped back
    val disjoint = leftDocs
      .minhashJoin(rightDocs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
        "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1) - 1000000L, r.getLong(2))).toSet
    assert(got == disjoint)
    assert(got.nonEmpty)
  }

  test("knn returns the verified q_sim_knn neighbours through the library API") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val q = e.filter(col("vec_id") === 0)
    val got = e.filter(col("vec_id") =!= 0).knn("vec_id", "v", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    val want = SparkEntry.queries("q_sim_knn")(spark, sf)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == want)
  }

  test("knn: a zero-norm corpus vector ranks LAST, never NaN-first " +
       "(r18 self-review)") {
    // 0/0 cosine is NaN and Spark orders NaN above every double — the
    // -2 floor must rank the degenerate vector below all real matches
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.8, 0.2)),
                     (3L, Seq(0.0, 0.0))).toDF("vec_id", "v")
    val q = Seq((0L, Seq(1.0, 0.1))).toDF("vec_id", "v")
    val got = corpus.knn("vec_id", "v", q, 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L), got.toString)
    val all = corpus.knn("vec_id", "v", q, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == Seq(1L, 2L, 3L), all.toString)
  }

  test("connectedComponents: fractional ids label exactly through the " +
       "hashed convergence signature (r18 self-review)") {
    // fractional labels can move WITHIN a decimal(38,0) rounding cell
    // (2.9 → 2.6), which a raw-sum signature cannot see — these ids must
    // take the hash path and still reach the true component minima
    val edges = Seq((2.9, 2.6), (2.6, 2.2), (10.5, 11.5)).toDF("a", "b")
    val labels = edges.connectedComponents("a", "b")
    val got = labels.orderBy("id").as[(Double, Double)].collect().toSeq
    labels.unpersist()
    assert(got == Seq(2.2 -> 2.2, 2.6 -> 2.2, 2.9 -> 2.2,
                      10.5 -> 10.5, 11.5 -> 10.5), got.toString)
  }

  test("saltedJoin equals the plain join result") {
    val left = (1 to 100).map(i => (i % 3, i)).toDF("k", "v")
    val right = Seq((0, "x"), (1, "y"), (2, "z")).toDF("k", "name")
    val plain = left.join(right, "k").select("k", "v", "name")
      .orderBy("k", "v").collect().toSeq
    val salted = left.saltedJoin(right, "k", salts = 4)
      .select(left("k"), col("v"), col("name"))
      .orderBy("k", "v").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin under a pathological hot key: correct, and the hot key " +
       "spreads across all salts with bounded per-reducer share") {
    // 60% of all rows on one key — the shape where an unsalted shuffle
    // funnels the whole key through a single reducer
    val n = 20000
    val salts = 8
    val left = spark.range(n).select(
      when($"id" < n * 6 / 10, lit(0))
        .otherwise(pmod($"id", lit(97)) + 1).cast("int").as("k"),
      $"id".as("v"))
    val right = (0 to 97).map(i => (i, s"name$i")).toDF("k", "name")

    // correctness: same multiset as the plain join (checksum, not collect —
    // 20k joined rows)
    val plain = left.join(right, "k")
      .agg(count(lit(1)), sum($"v"), sum(hash($"k", $"name")))
      .as[(Long, Long, Long)].head()
    val viaSalt = left.saltedJoin(right, "k", salts)
      .agg(count(lit(1)), sum($"v"), sum(hash(left("k"), $"name")))
      .as[(Long, Long, Long)].head()
    assert(viaSalt == plain)

    // boundedness: the hot key's rows must land on every one of the
    // `salts` sub-keys, and no sub-key may carry more than a ~2/salts
    // share — i.e. the per-reducer input for the hot key is ~hot/salts,
    // not hot
    val hotTotal = n * 6 / 10
    val spread = graft.api.GraftOps.salted(left, "k", salts)
      .filter($"k" === 0).groupBy($"__salt").count()
      .as[(Int, Long)].collect().toMap
    assert(spread.keySet == (0 until salts).toSet)
    assert(spread.values.max <= hotTotal * 2 / salts,
      s"hot-key reducer share not bounded: $spread")
  }

  test("corpusPipeline drops exact dups, near-dups, and short docs; " +
       "labels survivors with a stable split") {
    val long1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val long2 = (1 to 39).map(i => s"w$i").mkString(" ") + " CHANGED" // ~0.85 jac
    val other = (1 to 35).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, long1),            // canonical of the exact+near cluster
      (2L, long1),            // exact dup of 1 → dropped (keeper rule)
      (3L, long2),            // near-dup of 1 → dropped (lowest-id canon)
      (5L, "too short doc"),  // fails the token floor
      (6L, other)             // clean survivor
    ).toDF("doc_id", "text")
    val out = docs.corpusPipeline("doc_id", "text", minTokens = 30)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 6L), out.mkString(","))
    assert(out.map(_._2) == Seq(40L, 35L))
    assert(out.forall(r => r._3 == "train" || r._3 == "test"))
    // the split label is a pure function of the id — stable across runs
    // and corpus growth
    val again = docs.corpusPipeline("doc_id", "text", minTokens = 30)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(again == out)
  }

  test("contamination scores planted benchmark overlap and zero elsewhere") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 'alpha beta gamma' + 'beta gamma delta'
      (2L, "one two three four five"),        // no overlap
      (3L, "alpha beta gamma"))               // fully contaminated (1 shingle)
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = graft.api.GraftOps.contamination(corpus, bench, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: 3 shingles, 2 in bench; doc 2: 3, 0; doc 3: 1, 1
    assert(got == Seq((1L, 3L, 2L, 666666L), (2L, 3L, 0L, 0L),
                      (3L, 1L, 1L, 1000000L)))
  }

  test("packDocs chunks by exclusive prefix tokens within each shard") {
    val docs = Seq(
      ("s1", 1L, 600L), ("s1", 2L, 600L), ("s1", 3L, 600L), // cum_prev 0,600,1200
      ("s1", 4L, 600L),                                     // cum_prev 1800 → still pack 0
      ("s1", 5L, 600L),                                     // cum_prev 2400 → pack 1
      ("s2", 1L, 2048L),                                    // cum_prev 0 → pack 0
      ("s2", 2L, 1L))                                       // cum_prev 2048 → pack 1
      .toDF("source", "doc_id", "n_tokens")
    val got = graft.api.GraftOps
      .packDocs(docs, "source", "doc_id", $"n_tokens", 2048L)
      .orderBy("source", "doc_id")
      .select("source", "doc_id", "pack_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 1L, 0L), ("s1", 2L, 0L), ("s1", 3L, 0L),
                      ("s1", 4L, 0L), ("s1", 5L, 1L),
                      ("s2", 1L, 0L), ("s2", 2L, 1L)))
  }

  test("connectedComponents labels chains, cliques, and isolated pairs " +
       "with the component minimum") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
                    (10L, 11L), (11L, 12L), (10L, 12L),
                    (21L, 20L)).toDF("a", "b")
    val labels = edges.connectedComponents("a", "b")
    val got = labels.orderBy("id").as[(Long, Long)].collect().toSeq
    labels.unpersist()
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                      10L -> 10L, 11L -> 10L, 12L -> 10L,
                      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: empty edge list and self-loops are safe") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(empty.connectedComponents("a", "b").count() == 0)
    val self = Seq((5L, 5L), (6L, 7L)).toDF("a", "b")
    val labels = self.connectedComponents("a", "b")
    val got = labels.orderBy("id").as[(Long, Long)].collect().toSeq
    labels.unpersist()
    assert(got == Seq(5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("connectedComponents: propagation tier (non-long ids) matches, and " +
       "long-chain graphs escalate to star contraction") {
    // int ids route around the single-task union-find fast path, so this
    // exercises the distributed propagation tier on the same graph as the
    // long-id test above
    val edges = Seq((2, 1), (2, 3), (3, 4),
                    (10, 11), (11, 12), (10, 12),
                    (21, 20)).toDF("a", "b")
    val labels = edges.connectedComponents("a", "b")
    val got = labels.orderBy("id").as[(Int, Int)].collect().toSeq
    labels.unpersist()
    assert(got == Seq(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1,
                      10 -> 10, 11 -> 10, 12 -> 10,
                      20 -> 20, 21 -> 20))
    // 64-node int chain: diameter 63 exceeds the propagation escalation
    // budget, so this must fall through to star contraction and still
    // label every node with the component minimum (0)
    val chain = Seq.tabulate(63)(i => (i + 1, i)).toDF("a", "b")
    val cl = chain.connectedComponents("a", "b")
    assert(cl.count() == 64)
    assert(cl.filter($"label" =!= 0).count() == 0)
    cl.unpersist()
  }

  test("connectedComponentsStar matches propagation on chains, cliques, " +
       "pairs, and self-loops") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
                    (10L, 11L), (11L, 12L), (10L, 12L),
                    (21L, 20L), (30L, 30L)).toDF("a", "b")
    val labels = edges.connectedComponentsStar("a", "b")
    val got = labels.orderBy("id").as[(Long, Long)].collect().toSeq
    labels.unpersist()
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                      10L -> 10L, 11L -> 10L, 12L -> 10L,
                      20L -> 20L, 21L -> 20L, 30L -> 30L))
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(empty.connectedComponentsStar("a", "b").count() == 0)
  }

  test("connectedComponentsStar labels a planted 1000-node chain in " +
       "O(log n) rounds (propagation would need ~999)") {
    // adversarial long-chain graph: edges (i+1, i) for i in [0, 999) —
    // diameter 999. Star contraction doubles the skip distance per round,
    // so maxIter = 25 ≫ log2(1000) must suffice; min-label propagation
    // under the same budget would truncate (and warn).
    val chain = spark.range(999)
      .select(($"id" + 1).as("a"), $"id".as("b"))
    val labels = graft.api.GraftOps
      .connectedComponentsStar(chain.toDF, "a", "b", maxIter = 25)
    assert(labels.count() == 1000)
    assert(labels.filter($"label" =!= 0L).count() == 0)
    labels.unpersist()
  }

  test("connectedComponents escalates a long-chain non-long-id graph to " +
       "star contraction, agreeing with the union-find tier") {
    // string ids rule out the union-find tier, and a 64-node chain cannot
    // converge within EscalateAfterRounds=6 min-label propagation rounds
    // (the min travels ~one hop per round), so this call must fall
    // through to connectedComponentsStar — the O(log n) tier the normal
    // dup-cluster path never needs
    val n = 64
    val sid = (i: Int) => f"n$i%03d"
    val chainStr = (1 until n).map(i => (sid(i - 1), sid(i))).toDF("a", "b")
    val got = graft.api.GraftOps.connectedComponents(chainStr, "a", "b")
    val labels = got.as[(String, String)].collect().toMap
    assert(labels.size == n)
    assert(labels.values.toSet == Set(sid(0)), labels.values.toSet.take(5))
    got.unpersist()
    // the same chain with long ids rides the single-task union-find tier;
    // the tiers must produce identical components
    val chainLong = (1 until n).map(i => ((i - 1).toLong, i.toLong)).toDF("a", "b")
    val uf = graft.api.GraftOps.connectedComponents(chainLong, "a", "b")
    val ufLabels = uf.as[(Long, Long)].collect().toMap
    assert(ufLabels.size == n)
    assert((0 until n).forall(i => sid(ufLabels(i.toLong).toInt) == labels(sid(i))))
    uf.unpersist()
  }

  test("bucketPairs expands each bucket's i<j pairs exactly once") {
    val asg = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L),
                  (3L, 30L)).toDF("cid", "vec_id")
    val got = graft.api.IvfOps.bucketPairs(asg)
      .orderBy("a", "b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)))
  }

  test("bucketPairs caps a planted hot bucket's membership deterministically") {
    // one degenerate bucket with 150 members against cap=100: only the
    // first 100 members (by id) generate pairs, so the task-local pair
    // volume is bounded by cap² regardless of bucket size; healthy
    // buckets are untouched
    val asg = ((1L to 150L).map((7L, _)) ++ Seq((8L, 200L), (8L, 201L)))
      .toDF("cid", "vec_id")
    val got = graft.api.IvfOps.bucketPairs(asg, cap = 100)
    assert(got.count() == 100L * 99 / 2 + 1)
    // no pair from the hot bucket involves a member past the cap
    assert(got.filter($"b" > 100 && $"a" =!= 200L).count() == 0)
  }

  test("bucketPairs: duplicate (bucket, id) rows neither eat cap slots " +
       "nor emit a==a pairs nor satisfy minMembers alone (r13 cap-boundary " +
       "dedup)") {
    // bucket 7: ids 1..4 each duplicated 3x, cap=3 → the cap must keep
    // DISTINCT members {1,2,3}, exactly as a distinct input would
    val dup = (1L to 4L).flatMap(id => Seq.fill(3)((7L, id))).toDF("cid", "vec_id")
    val got = graft.api.IvfOps.bucketPairs(dup, cap = 3)
      .orderBy("a", "b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // a bucket whose ONLY content is one id repeated must not pass
    // minMembers=2 (it cannot pair) — and must emit nothing
    val solo = Seq((9L, 5L), (9L, 5L), (9L, 5L)).toDF("cid", "vec_id")
    assert(graft.api.IvfOps.bucketPairs(solo, minMembers = 2).count() == 0)
  }

  test("curriculumPlan: bucket prefix-sum ordinal equals the brute-force " +
       "global window; shards fill to exactly 64 docs; ord is a " +
       "permutation") {
    import org.apache.spark.sql.expressions.Window
    // 300 crafted docs across quality tiers: long rich text (high
    // decile), mid, and degenerate one-worders (bottom decile)
    val docs = (0L until 300L).map { i =>
      val text = (i % 3) match {
        case 0 => (1 to 60).map(j => s"tok${(i + j) % 37}").mkString(" ")
        case 1 => (1 to 12).map(j => s"w${j % 5}").mkString(" ")
        case _ => "x"
      }
      (i, text)
    }.toDF("doc_id", "text")
    val got = graft.operators.SamplingQueries.curriculumPlan(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // brute force: single global window over the same keys
    val brute = graft.operators.SamplingQueries.curriculumPlan(docs)
      .select("doc_id", "stage")
      .withColumn("h", graft.functions.TextHash.md5long($"doc_id".cast("string")))
      .withColumn("ord", row_number().over(
        Window.orderBy($"stage", $"h", $"doc_id")).cast("long") - 1)
      .select($"doc_id", $"stage", $"ord", expr("ord DIV 64").as("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got.sortBy(_._1) == brute.sortBy(_._1))
    assert(got.map(_._3).sorted == (0L until 300L)) // exact permutation
    val shardSizes = got.groupBy(_._4).view.mapValues(_.size).toMap
    assert(shardSizes.filterKeys(_ < 4).values.forall(_ == 64),
      s"full shards must hold exactly 64: $shardSizes")
    assert(shardSizes(4L) == 300 - 4 * 64)
    // stages are monotone along the ordinal (the curriculum contract)
    assert(got.sortBy(_._3).map(_._2) == got.map(_._2).sorted)
  }

  test("mixCorpus downsamples sources toward the target mixture, " +
       "deterministically, excluding unlisted sources") {
    val docs = ((1L to 4000L).map(i => (i, if (i % 2 == 0) "web" else "books"))
        ++ (9001L to 9100L).map((_, "junk")))
      .toDF("doc_id", "source")
    val out = graft.api.GraftOps
      .mixCorpus(docs, "source", "doc_id", Map("web" -> 3L, "books" -> 1L))
      .cache()
    // unlisted sources are excluded entirely
    assert(out.filter($"source" === "junk").count() == 0)
    // B = min(2000*4/3, 2000*4/1) = 2666; rates: web 2666*3/(4*2000) ≈ 1.0,
    // books 2666/(4*2000) ≈ 0.33 — realized counts are binomial around
    // rate·n, so assert a generous band, and the achieved ratio ≈ 3:1
    val nWeb = out.filter($"source" === "web").count().toDouble
    val nBooks = out.filter($"source" === "books").count().toDouble
    assert(nWeb > 1800, s"web kept $nWeb of 2000")
    assert(math.abs(nWeb / nBooks - 3.0) < 0.5, s"mixture off: $nWeb:$nBooks")
    // membership is a pure function of the id — identical on a second run
    val again = graft.api.GraftOps
      .mixCorpus(docs, "source", "doc_id", Map("web" -> 3L, "books" -> 1L))
    assert(again.exceptAll(out).count() == 0 && out.exceptAll(again).count() == 0)
    out.unpersist()
    // a listed source ABSENT from docs can supply nothing at any positive
    // share: B = 0 and the mixture degrades to EMPTY (never a silent
    // partial mixture with the absent component's weight still diluting
    // the others)
    val missing = graft.api.GraftOps
      .mixCorpus(docs, "source", "doc_id", Map("web" -> 3L, "arxiv" -> 1L))
    assert(missing.count() == 0, "absent listed source must empty the mixture")
  }

  test("mixCorpus rescales byte-count-scale weights instead of " +
       "overflowing Long rate math") {
    val docs = (1L to 4000L).map(i => (i, if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "source")
    // same 3:1 proportions expressed at byte-count scale: raw wsum ~ 2.4e18
    // would push w*B*1e6 far past 2^63 — the rescale keeps the math exact
    // and MUST reproduce the small-weight mixture row for row
    val big = graft.api.GraftOps.mixCorpus(docs, "source", "doc_id",
      Map("web" -> 1800000000000000000L, "books" -> 600000000000000000L))
    val small = graft.api.GraftOps.mixCorpus(docs, "source", "doc_id",
      Map("web" -> 3L, "books" -> 1L))
    assert(big.select("doc_id", "source").exceptAll(
             small.select("doc_id", "source")).count() == 0 &&
           small.select("doc_id", "source").exceptAll(
             big.select("doc_id", "source")).count() == 0)
  }

  test("keepBest: argmax score per group, lowest-id tie-break, generic " +
       "column names") {
    val df = Seq(
      (1L, 10L, 500L), (1L, 11L, 900L), (1L, 12L, 900L), // tie at 900 → 11
      (2L, 20L, 100L)
    ).toDF("grp", "id", "score")
    val got = graft.api.GraftOps.keepBest(df, "grp", "id", "score")
      .orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 3L, 11L, 900L), (2L, 1L, 20L, 100L)), got)
    assert(graft.api.GraftOps.keepBest(df, "grp", "id", "score")
      .columns.toSeq == Seq("grp", "n_members", "keeper_id", "keeper_score"))
  }

  test("epochSchedule library entry point renames arbitrary columns into " +
       "the q_mix_epochs core") {
    import graft.api.implicits._
    val tok = Seq(("A", 100L), ("C", 2500L)).toDF("src", "n_tok")
    val got = tok.epochSchedule("src", "n_tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    // shares 166/833 (sqrt e3 of 10000/50000 over wraw 60000, wsum 999),
    // T = 7800: A target 1296 → capped 4000; C target 6503 → 2601
    assert(got == Seq(("A", 100L, 4000L), ("C", 2500L, 2601L)), got)
  }

  test("heavyHittersBy: per-group exact sets, group totals independent") {
    // each group's floor is ITS n/50 = 2 — the hot token is heavy in its
    // own group only; 1-count noise never survives the exact re-count
    val rows = Seq.fill(60)(("A", "hot")) ++
      (1 to 40).map(i => ("A", s"na$i")) ++
      Seq.fill(60)(("B", "cold")) ++
      (1 to 40).map(i => ("B", s"nb$i"))
    val got = graft.api.GraftOps
      .heavyHittersBy(rows.toDF("g", "item"), "g", "item").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", "hot", 60L), ("B", "cold", 60L)), got)
  }

  test("concentration/diversityHistogram/gini library entry points rename " +
       "arbitrary columns into the t2 cores") {
    // concentration: 3 accounts with counts 3/2/1; k=2 top block = 5 of 6
    val acc = Seq("a", "a", "a", "b", "b", "c").map(Tuple1(_))
      .toDF("account")
    val c = graft.api.GraftOps.concentration(acc, "account", k = 2).collect().head
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3),
            c.getLong(4)) == (3L, 6L, 2L, 5L, 5L * 1000000L / 6L), c)
    // diversity over renamed columns: one single-item key at decile 0
    val d = graft.api.GraftOps.diversityHistogram(
      Seq(("k1", "x"), ("k1", "x")).toDF("acct", "action"), "acct", "action")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(d == Seq((0L, 1L)), d)
    // gini over renamed columns matches the crafted 250000-ppm case
    val g = graft.api.GraftOps.gini(
      Seq(("s1", 1L), ("s2", 3L)).toDF("shard", "bytes"), "shard", "bytes")
      .collect().head
    assert(g.getLong(2) == 250000L, g)
  }

  test("simhashBandPairs caps a planted mega-cluster band bucket") {
    // 10 identical fingerprints — the boilerplate pathology: every band
    // bucket holds all 10 — plus an under-cap 2-doc cluster whose 15-bit
    // band slices never collide with the hot cluster's (0 vs 1 per band)
    val hb = 1L | (1L << 15) | (1L << 30) | (1L << 45)
    val sim = ((1L to 10L).map((_, 0L)) ++ Seq((100L, hb), (101L, hb)))
      .toDF("doc_id", "simhash")
    val capped = graft.operators.DedupQueries.simhashBandPairs(sim, cap = 4)
    // only the first 4 hot docs (by doc_id) pair up — the same 4 in every
    // band, so C(4,2) distinct pairs; the healthy bucket is untouched
    assert(capped.count() == 4L * 3 / 2 + 1)
    assert(capped.filter($"da" <= 10L && $"db" > 4L && $"db" <= 10L).count() == 0)
    // uncapped (default BucketCap far above 10): the full quadratic
    val full = graft.operators.DedupQueries.simhashBandPairs(sim)
    assert(full.count() == 10L * 9 / 2 + 1)
    assert(full.filter($"hamming" =!= 0L).count() == 0)
  }

  test("slidingMembership: each position lands in exactly width/slide " +
       "epoch-aligned windows (renamed columns; brute-force ground truth)") {
    val rows = Seq((-3601000L, "x"), (-1L, "y"), (0L, "z"), (1799999L, "w"),
      (1800000L, "v"), (7200123L, "u"))
    val df = rows.toDF("tick_pos", "payload") // deliberately NOT ems/day
    val got = graft.api.GraftOps
      .slidingMembership(df, "tick_pos", width = 3600000L,
        slide = 1800000L, outCol = "win")
      .select("payload", "win", "tick_pos")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // brute force: every epoch-aligned start s (multiple of slide) with
    // s <= pos < s + width
    val exp = rows.flatMap { case (pos, pay) =>
      val base = Math.floorDiv(pos, 1800000L) * 1800000L
      Seq(base, base - 1800000L).map(s => (pay, s))
    }.toSet
    assert(got == exp)
    got.foreach { case (_, s) => assert(s % 1800000L == 0) }
    // the dau shape: width 7 / slide 1, labeled by window end
    val days = Seq((10L, 1L), (12L, 1L), (12L, 2L)).toDF("d", "u")
    val wau = graft.api.GraftOps
      .slidingMembership(days, "d", width = 7L, slide = 1L, outCol = "ws")
      .select(($"ws" + 6L).as("d"), $"u")
      .groupBy("d").agg(countDistinct($"u").as("wau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 12 sees u1 (active d10 and d12) + u2 → 2; day 16 sees both
    // (d10 exposure ends d16? no — d10+6=16 yes, d12+6=18) → 2
    assert(wau(10L) == 1 && wau(12L) == 2 && wau(16L) == 2 && wau(18L) == 2)
    assert(!wau.contains(19L))
  }
}
