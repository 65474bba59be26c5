package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.Sbs1

/** Property-based invariants (SURVEY.md §5.2 item 4), sampled from
  * scalacheck generators with fixed seeds (scalatest-scalacheck bridge is
  * not in the offline cache, so sampling is driven manually):
  *  - serialize→parse is identity for well-formed squitter rows;
  *  - arbitrary re-chunking of a byte stream frames to the same records
  *    (the reference's R3 contract, minus its strip("\n") merge bug).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val hexGen = Gen.listOfN(6, Gen.oneOf(('0' to '9') ++ ('A' to 'F'))).map(_.mkString)
  private val lineGen: Gen[String] = for {
    tt   <- Gen.choose(1, 8)
    hex  <- hexGen
    alt  <- Gen.option(Gen.choose(0, 45000))
    gs   <- Gen.option(Gen.choose(0, 600))
    lat  <- Gen.option(Gen.choose(-89.0, 89.0))
    sec  <- Gen.choose(0, 59)
  } yield {
    val latS = lat.map(v => f"$v%.5f").getOrElse("")
    val lonS = lat.map(v => f"${-v}%.5f").getOrElse("")
    f"MSG,$tt,111,11111,$hex,111111,2026/08/12,14:21:$sec%02d.000,2026/08/12,14:21:$sec%02d.100," +
      f",${alt.map(_.toString).getOrElse("")},${gs.map(_.toString).getOrElse("")},,$latS,$lonS,,,0,0,0,0"
  }

  /** Canonical form: numeric fields via their parsed-value toString, so the
    * value round-trip is tested rather than decimal formatting ("-84.94590"
    * and "-84.9459" are the same double).
    */
  private def canon(line: String): String = {
    val parts = line.split(",", -1)
    Sbs1.Fields.zipWithIndex.map { case ((_, dt), i) =>
      val v = parts(i)
      if (v.isEmpty) ""
      else dt match {
        case org.apache.spark.sql.types.IntegerType => v.toInt.toString
        case org.apache.spark.sql.types.DoubleType  => v.toDouble.toString
        case _ => v
      }
    }.mkString(",")
  }

  test("parse is lossless for well-formed lines (round-trip, 10 seeds)") {
    (1L to 10L).foreach { seed =>
      val lines = sample(Gen.listOfN(20, lineGen), seed)
      val parsed = Sbs1.parse(lines.toDF("value"), withParsedTime = false)
      assert(parsed.count() == lines.length)
      val back = parsed.collect().map { r =>
        Sbs1.Fields.map { case (n, _) =>
          val i = r.fieldIndex(n)
          if (r.isNullAt(i)) "" else r.get(i).toString
        }.mkString(",")
      }
      assert(back.sorted.toSeq == lines.map(canon).sorted, s"seed $seed")
    }
  }

  test("q_text_dup_ngrams: corpus-wide dup fraction on a crafted corpus " +
       "(cross-doc + within-doc dups, short docs at zero)") {
    val dir = java.nio.file.Files.createTempDirectory("dupngram").toString
    Seq(
      (1L, "a b c d"),   // "a b c","b c d" — first shared with doc 2
      (2L, "x a b c"),   // "x a b","a b c"
      (3L, "p q r"),     // unique trigram
      (4L, "one two"),   // <3 tokens: no trigrams at all
      (5L, "z z z z z")  // "z z z"×3 — within-doc repeats are corpus dups
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_text_dup_ngrams")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 500000L),
      (2L, 2L, 1L, 500000L),
      (3L, 1L, 0L, 0L),
      (4L, 0L, 0L, 0L),
      (5L, 3L, 3L, 1000000L)), got.mkString(","))
  }

  test("q_mix_temperature invariants: thresh capped at 1e6 and decreasing " +
       "in source size, binding source kept ~whole, sampled within bounds") {
    val rows = SparkEntry.queries("q_mix_temperature")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, w, thresh, sampled) =>
      assert(thresh <= 1000000L, s"$src rate past 1: $thresh")
      assert(sampled <= n && sampled >= 0, s"$src sampled $sampled of $n")
      assert(w >= 1, s"$src clamped share vanished")
    }
    // α=1/2 flattening: thresh ∝ sqrt(n)/n is non-increasing in n
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, n1, _, t1, _), (_, n2, _, t2, _)) =>
        if (n1 < n2) assert(t1 >= t2, s"thresh not flattening: n=$n1→$n2 t=$t1→$t2")
      case _ =>
    }
    // the published columns must satisfy the budget identity exactly:
    // wsum = Σ w_e3, B = min(n·wsum DIV w_e3), thresh = w·B·1e6 DIV (wsum·n)
    val wsum = rows.map(_._3).sum
    val b = rows.map { case (_, n, w, _, _) => n * wsum / w }.min
    rows.foreach { case (src, n, w, thresh, _) =>
      assert(thresh == w * b * 1000000L / (wsum * n),
        s"$src thresh $thresh breaks the budget identity (wsum=$wsum B=$b)")
    }
    // differing source sizes must produce genuinely non-uniform rates
    if (rows.map(_._2).distinct.length >= 2)
      assert(rows.map(_._4).distinct.length >= 2, rows.mkString(","))
  }

  test("winnowing guarantee: random docs sharing a ≥ W+K-1 token run " +
       "share a fingerprint at any offsets (15 seeds)") {
    import spark.implicits._
    val word = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    val docGen = for {
      runLen <- Gen.choose(6, 10) // ≥ W+K-1 = 6 guarantees a shared pick
      run <- Gen.listOfN(runLen, word)
      pre1 <- Gen.listOfN(8, word); post1 <- Gen.listOfN(5, word)
      pre2 <- Gen.listOfN(3, word); post2 <- Gen.listOfN(9, word)
    } yield ((pre1 ++ run ++ post1).mkString(" "),
             (pre2 ++ run ++ post2).mkString(" "))
    (1L to 15L).foreach { seed =>
      val (t1, t2) = sample(docGen, seed)
      val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val picks = graft.operators.TextQueries.winnowPicks(docs)
        .select("doc_id", "h").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      assert((picks(1L) & picks(2L)).nonEmpty,
        s"seed $seed: no shared fingerprint across the planted run")
    }
  }

  test("Misra-Gries guarantee holds under random streams and random " +
       "partition merges (20 seeds)") {
    import graft.functions.FrequentItems
    val K = FrequentItems.K
    // zipf-ish streams: a few hot items + a long random tail, random order
    val streamGen: Gen[List[String]] = for {
      hotN <- Gen.choose(1, 5)
      hotReps <- Gen.listOfN(hotN, Gen.choose(50, 400))
      tail <- Gen.choose(100, 3000)
      perm <- Gen.choose(1, 1000003)
    } yield {
      val items = hotReps.zipWithIndex.flatMap { case (r, i) =>
        List.fill(r)(s"hot$i") } ++ (0 until tail).map(i => s"t$i")
      // deterministic pseudo-shuffle: sort by a keyed hash
      items.zipWithIndex.sortBy { case (s, i) =>
        (s.hashCode * perm + i * 31) & 0x7fffffff }.map(_._1)
    }
    (1L to 20L).foreach { seed =>
      val stream = sample(streamGen, seed)
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random partitioning into 1..8 partials, merged pairwise
      val parts = sample(Gen.choose(1, 8), seed * 7 + 1)
      val chunks = stream.grouped(math.max(1, stream.size / parts)).toSeq
      val summary = chunks
        .map(_.foldLeft(FrequentItems.zero)(FrequentItems.reduce))
        .reduce(FrequentItems.merge)
      assert(summary._1.size <= K, s"seed $seed: state ${summary._1.size}")
      assert(summary._2 == n)
      exact.foreach { case (item, cnt) =>
        if (cnt * (K + 1) > n) // a guaranteed heavy hitter...
          assert(summary._1.contains(item),
            s"seed $seed: heavy $item (cnt $cnt, n $n) evicted")
        summary._1.get(item).foreach { est =>
          assert(est <= cnt && est >= cnt - n / (K + 1),
            s"seed $seed: $item est $est outside [${cnt - n / (K + 1)}, $cnt]")
        }
      }
    }
  }

  test("EmbCovAggregator: co-moments are partition-invariant and match a " +
       "direct reference fold (10 seeds)") {
    import graft.functions.EmbCovAggregator
    val D = EmbCovAggregator.Dim
    val vecGen: Gen[Seq[Long]] =
      Gen.listOfN(D, Gen.choose(-2000L, 2000L)).map(_.toSeq)
    val corpusGen: Gen[List[Seq[Long]]] =
      Gen.choose(5, 60).flatMap(n => Gen.listOfN(n, vecGen))
    (1L to 10L).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      // reference: direct O(n·d²) double loop, no aggregator machinery
      val n = corpus.size.toLong
      val sx = Array.fill(D)(0L)
      val sxy = Array.fill(D * D)(0L)
      corpus.foreach { v =>
        var i = 0
        while (i < D) {
          sx(i) += v(i)
          var j = i + 1
          while (j < D) { sxy(i * D + j) += v(i) * v(j); j += 1 }
          i += 1
        }
      }
      // aggregator over a random partitioning, merged in partition order
      val parts = sample(Gen.choose(1, 8), seed * 11 + 3)
      val merged = corpus.grouped(math.max(1, corpus.size / parts)).toSeq
        .map(_.foldLeft(EmbCovAggregator.zero)(EmbCovAggregator.reduce))
        .reduce(EmbCovAggregator.merge)
      val cells = EmbCovAggregator.finish(merged)
      assert(cells.size == D * (D - 1) / 2, s"seed $seed")
      cells.foreach { case (i, j, cn, sxi, sxj, cxy) =>
        assert(cn == n, s"seed $seed ($i,$j)")
        assert(sxi == sx(i) && sxj == sx(j), s"seed $seed ($i,$j)")
        assert(cxy == sxy(i * D + j), s"seed $seed ($i,$j)")
      }
    }
  }

  test("ngram df cap drops hot-shingle pairs, keeps rare-shingle dups") {
    // 150 docs made ONLY of one ultra-common shingle: without the df cap
    // they would emit 150·149/2 = 11175 jaccard-1.0 pairs (the hot-key
    // blow-up); with the cap (df=150 > 100) the shingle leaves the
    // universe and none of them pair. Two docs sharing rare shingles
    // (df=2) must still be found.
    val dir = java.nio.file.Files.createTempDirectory("hotshingle").toString
    val docs = (0 until 150).map(i => (i.toLong, "hot hot hot hot hot")) ++
      Seq((1000L, "aa bb cc dd ee"), (1001L, "aa bb cc dd ee"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1000L, 1001L, 1000000L)), out.mkString(","))
  }

  // ---- skew stress (VERDICT r14 #5): power-law fixtures against the ----
  // ---- capped machinery — one key holding ~10% of all rows           ----

  test("skew stress (simhash bands): a mega-cluster holding 10% of the " +
       "corpus is bounded by the bucket cap; capped pairs match the " +
       "rank-filtered brute force exactly") {
    val rnd = new scala.util.Random(7)
    val mask60 = (1L << 60) - 1
    val hotSig = 0x0FEDCBA987654321L & mask60
    // 40 of 400 fingerprints identical — the boilerplate mega-cluster
    val rows = (0L until 40L).map(id => (id, hotSig)) ++
      (40 until 400).map(i => (i.toLong, rnd.nextLong() & mask60))
    val df = rows.toDF("doc_id", "simhash")
    // pure-Scala reference with the engine's exact banding + cap rule:
    // per (band, bsig) bucket keep the `cap` lowest doc_ids, pair i<j
    def bsig(s: Long, b: Int): Long = (s >> (15 * b)) & 32767
    def refPairs(cap: Int): Set[(Long, Long, Long)] = {
      val buckets =
        scala.collection.mutable.Map.empty[(Int, Long), List[(Long, Long)]]
      rows.sortBy(_._1).foreach { case (id, s) =>
        (0 until 4).foreach { b =>
          val k = (b, bsig(s, b))
          val cur = buckets.getOrElse(k, Nil)
          if (cur.size < cap) buckets(k) = cur :+ ((id, s))
        }
      }
      buckets.values.flatMap { ms =>
        for (i <- ms.indices; j <- i + 1 until ms.size) yield
          (ms(i)._1, ms(j)._1,
           java.lang.Long.bitCount(ms(i)._2 ^ ms(j)._2).toLong)
      }.toSet
    }
    def engine(cap: Int): Set[(Long, Long, Long)] =
      graft.operators.DedupQueries.simhashBandPairs(df, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cap far above the cluster: identical to the uncapped brute force
    assert(engine(4096) == refPairs(Int.MaxValue))
    // cap below the cluster: exact rank-filtered semantics — and the
    // mega-cluster's contribution collapses from C(40,2)=780 pairs to
    // C(8,2)=28 (all four bands keep the SAME 8 lowest ids), so the
    // per-task expansion is bounded by cap² regardless of cluster size
    val capped = engine(8)
    assert(capped == refPairs(8))
    assert(capped.count(p => p._1 < 40 && p._2 < 40) == 28,
      s"hot-cluster pairs not cap-bounded: $capped")
  }

  test("skew stress (IVF cells): a hot cell holding 10% of ids is bounded " +
       "by the bucket cap; capped pairs match the rank-filtered brute force") {
    import graft.api.IvfOps
    // cell 0 holds ids 0..39 (10% of 400); the rest spread over 36 cells
    val asg = ((0 until 40).map(i => (0L, i.toLong)) ++
      (40 until 400).map(i => ((1L + i % 36).toLong, i.toLong)))
      .toDF("cid", "vec_id")
    val byCell = ((0 until 40).map(i => (0L, i.toLong)) ++
      (40 until 400).map(i => ((1L + i % 36).toLong, i.toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def ref(cap: Int): Set[(Long, Long)] =
      byCell.values.flatMap { ids0 =>
        val ids = ids0.take(cap)
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield (ids(i), ids(j))
      }.toSet
    def engine(cap: Int): Set[(Long, Long)] =
      IvfOps.bucketPairs(asg, cap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(engine(4096) == ref(Int.MaxValue))
    val capped = engine(10)
    assert(capped == ref(10))
    // hot cell: C(40,2)=780 pairs collapse to C(10,2)=45
    assert(capped.count(p => p._1 < 40 && p._2 < 40) == 45)
  }

  test("skew stress (pair table): DfCap bounds per-shingle fan-out on a " +
       "power-law index; the pair table matches brute force over the " +
       "capped universe") {
    import graft.operators.DedupQueries
    val dfCap = DedupQueries.DfCapValue
    // h=1: hot in 150 docs (> DfCap) — leaves the universe whole;
    // h=2: df EXACTLY DfCap — kept, the documented worst-case fan-out;
    // h=3: rare (df 2) — must still pair
    val raw = ((0 until 150).map(i => (i.toLong, 1L)) ++
      (0 until dfCap).map(i => (i.toLong, 2L)) ++
      Seq((0L, 3L), (200L, 3L))).toDF("doc_id", "h")
    val capped = DedupQueries.capIndex(raw)
    val dfs = capped.groupBy("h").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!dfs.contains(1L), s"hot shingle survived the cap: $dfs")
    assert(dfs.values.forall(_ <= dfCap), s"df bound violated: $dfs")
    val got = DedupQueries.pairsPlan(capped)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Map(
        2L -> (0 until dfCap).map(_.toLong).toSeq,
        3L -> Seq(0L, 200L))
      .values.flatMap(ds =>
        for (i <- ds.indices; j <- i + 1 until ds.size) yield (ds(i), ds(j)))
      .groupBy(identity).map { case (p, occ) =>
        (p._1, p._2, occ.size.toLong) }.toSet
    assert(got == want)
    // the kept worst case is exactly the DfCap² envelope: C(DfCap,2)
    // pairs from h=2, plus the one rare pair
    assert(got.size == dfCap * (dfCap - 1) / 2 + 1)
  }

  test("annServeRows equals the brute-force probed-cell top-3 on random " +
       "vector sets (10 seeds — pins the top-k invariant fold exactly)") {
    val sg = graft.operators.SimilarityQueries
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val dim = 6
      def vec(): Seq[Double] = Seq.fill(dim)(rnd.nextGaussian())
      val cents = (0L until 4L).map(c => (c, Array.fill(dim)(rnd.nextGaussian())))
      val corpus = (100L until (100L + 20 + rnd.nextInt(20)))
        .map(id => (id, vec()))
      val queries = (1L to 6L).map(id => (id, vec()))
      val centsDf = cents.map { case (c, v) => (c, v.toSeq) }.toDF("cid", "cv")
      val pack = sg.semanticGateCellPack(corpus.toDF("vec_id", "v"), centsDf)
      val got = sg.annServeRows(queries.toDF("vec_id", "v"), cents, pack)
        .collect()
        .filter(_.get(2) != null)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      // driver reference: same assignment rule (cos desc, cid asc), same
      // 2 probes, brute-force top-3 by (cos desc, id asc), floor9 sims
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      def probes(v: Seq[Double]): Seq[Long] =
        cents.map { case (c, cv) => (cos(v, cv.toSeq), -c) }
          .sorted.reverse.take(2).map(-_._2)
      val cellOf: Map[Long, Long] = corpus.map { case (id, v) =>
        id -> probes(v).head }.toMap
      val want = queries.flatMap { case (qid, qv) =>
        val cells = probes(qv).toSet
        corpus.filter { case (id, _) => cells(cellOf(id)) }
          .map { case (id, v) => (cos(qv, v), -id) }
          .sorted.reverse.take(3).zipWithIndex
          .map { case ((s, nid), i) =>
            (qid, (i + 1).toLong, -nid, math.floor(s * 1e9).toLong) }
      }.sortBy(t => (t._1, t._2))
      assert(got == want, s"seed=$seed\ngot  $got\nwant $want")
    }
  }

  test("q_dedup_containment: finds the quote-inclusion pair Jaccard " +
       "misses, keeps identical pairs, drops sub-threshold overlap") {
    // doc 1 (3 shingles) is pasted whole as doc 2's prefix (23 shingles):
    // cont = 3/3 = 1.0 but jac = 3/23 → 130434 — invisible to the ≥0.8
    // near-dup gate. docs 3/4 are identical (cont = jac = 1.0). docs 5/6
    // overlap 1 of 2 shingles: cont = 500000 < 900000 → absent.
    val dir = java.nio.file.Files.createTempDirectory("containment").toString
    val quoted = "c1 c2 c3 c4 c5"
    val docs = Seq(
      (1L, quoted),
      (2L, quoted + " " + (1 to 20).map(i => s"x$i").mkString(" ")),
      (3L, "d1 d2 d3 d4 d5"), (4L, "d1 d2 d3 d4 d5"),
      (5L, "e1 e2 e3 e4"), (6L, "e2 e3 e4 e5"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7)))
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, 23L, 3L, 1000000L, 130434L, "a"),
      (3L, 4L, 3L, 3L, 3L, 1000000L, 1000000L, "a")), out.mkString(","))
  }

  test("shingle index pins at most one cache across dirs; release drops it") {
    import graft.operators.DedupQueries
    def mkDir(n: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("shidx").toString
      (0 until n).map(i => (i.toLong, s"alpha beta g$i d$i e$i"))
        .toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      dir
    }
    val d1 = mkDir(20)
    val d2 = mkDir(25)
    DedupQueries.releaseShingleIndex(spark)
    val base = spark.sparkContext.getPersistentRDDs.size
    // one dir pins exactly the uncapped layer + capped index + shared-pair
    // table (3 RDDs; the uncapped layer doubles as the contamination
    // probe's shingle set)
    SparkEntry.queries("q_dedup_ngram")(spark, d1).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == base + 3)
    // a second dir evicts the first — long-lived sessions sweeping many
    // dirs hold ONE pinned index (+raw +pairs), not one per dir processed
    SparkEntry.queries("q_dedup_ngram")(spark, d2).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == base + 3)
    // same dir again: memoized, still one
    SparkEntry.queries("q_dedup_ngram")(spark, d2).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == base + 3)
    // the cluster layer pins exactly one more (its component labels) and
    // is evicted together with the index
    SparkEntry.queries("q_dedup_cluster")(spark, d2).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == base + 4)
    DedupQueries.releaseShingleIndex(spark)
    assert(spark.sparkContext.getPersistentRDDs.size == base)
    // released ≠ broken: the next query rebuilds transparently
    assert(SparkEntry.queries("q_dedup_ngram")(spark, d1).collect().length >= 0)
  }

  test("afp60 is invariant under positive amplitude scaling (20 seeds)") {
    // the envelope hash thresholds each frame's MEAN energy against the
    // stream mean — a gain change scales both sides of every comparison,
    // so a louder copy of the same recording fingerprints identically
    // (the property that makes it a PERCEPTUAL hash, not a sample hash)
    import graft.functions.MediaCodec
    (1L to 20L).foreach { seed =>
      val n = sample(Gen.choose(30, 900), seed)
      val s1 = sample(Gen.listOfN(n, Gen.choose(-8000, 8000)), seed * 13 + 5)
        .map(_.toShort).toArray
      val scaled = s1.map(v => (v * 3).toShort) // no clipping at ±8000·3
      def h(s: Array[Short]) =
        MediaCodec.afp60(MediaCodec.encodeWavPcm16(s, 16000)).get
      assert(h(s1) == h(scaled), s"seed $seed n $n")
    }
  }

  test("ahash60 is invariant under brightness shift (20 seeds)") {
    // bit k compares 60·cell(k) against Σcells; a constant brightness
    // offset c adds 60·c to both sides — the hash sees structure, not
    // exposure
    import graft.functions.MediaCodec
    (1L to 20L).foreach { seed =>
      val h0 = sample(Gen.choose(8, 32), seed)
      val px = sample(Gen.listOfN(8 * h0, Gen.choose(0, 200)), seed * 11 + 3).toArray
      val brighter = px.map(_ + 55) // stays within the 0..255 byte range
      def h(g: Array[Int]) =
        MediaCodec.ahash60(MediaCodec.encodeBmp24(g, 8, h0)).get
      assert(h(px) == h(brighter), s"seed $seed h $h0")
    }
  }

  test("gapHistogram conservation: bucket totals restate the raw event " +
       "set (random timelines, 10 seeds)") {
    val evGen = for {
      nUsers <- Gen.choose(2, 6)
      rows <- Gen.listOfN(25, for {
        u <- Gen.choose(1L, nUsers.toLong)
        t <- Gen.choose(0L, 200000000L)
      } yield (u, t))
    } yield rows.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
    (1L to 10L).foreach { seed =>
      val rows = sample(evGen, seed)
      val got = graft.operators.EventTimeQueries
        .gapHistogram(rows.toDF("event_id", "user_id", "ems")).collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      val byUser = rows.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
      // every event except each user's first contributes exactly one gap
      assert(got.map(_._1).sum ==
        rows.length.toLong - byUser.size, s"seed $seed")
      // consecutive gaps telescope: Σ gaps = Σ_user (max − min)
      assert(got.map(_._2).sum ==
        byUser.values.map(ts => ts.max - ts.min).sum, s"seed $seed")
    }
  }

  test("epochSchedule invariants under random source sizes (10 seeds)") {
    val tokGen = for {
      n <- Gen.choose(2, 6)
      sizes <- Gen.listOfN(n, Gen.choose(10L, 100000L))
    } yield sizes.zipWithIndex.map { case (t, i) => (s"s$i", t) }
    (1L to 10L).foreach { seed =>
      val tok = sample(tokGen, seed)
      val got = graft.operators.SamplingQueries
        .epochSchedule(tok.toDF("source", "t")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
                   r.getLong(5), r.getBoolean(6)))
      val ntot = tok.map(_._2).sum
      got.foreach { case (src, n, target, e, alloc, capped) =>
        assert(e >= 1 && e <= 4000, s"seed $seed $src epochs $e")
        assert(capped == (e == 4000L), s"seed $seed $src cap flag")
        assert(alloc == n * e / 1000, s"seed $seed $src alloc")
        // an uncapped source never allocates past its target
        if (!capped) assert(alloc <= target, s"seed $seed $src overshoot")
      }
      // quantized shares can only UNDER-shoot the 3× budget
      assert(got.map(_._3).sum <= 3 * ntot, s"seed $seed budget")
    }
  }

  test("zipfHead shape: ranks are 1..min(50,|vocab|), counts " +
       "non-increasing (5 seeds)") {
    val docGen = Gen.listOfN(8,
      Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "tok"))
        .map(_.mkString(" ")))
    (1L to 5L).foreach { seed =>
      val docs = sample(docGen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.TextQueries
        .zipfHead(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(1), r.getInt(2)))
      assert(got.map(_._2).toSeq == (1 to got.length), s"seed $seed ranks")
      assert(got.map(_._1).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b
        case _ => true
      }, s"seed $seed monotone")
    }
  }

  test("mwuStat equals the brute-force tie-aware pair count on random " +
       "splits (8 seeds, heavy ties)") {
    // values drawn from a 6-value domain so ties are dense — the case
    // the per-value half-tie algebra must get exactly right; reference
    // is the O(n²) definition: u2x = Σ over (a∈A, b∈B) of
    // 2·[a > b] + 1·[a = b]
    val obsGen = for {
      na <- Gen.choose(1, 40)
      nb <- Gen.choose(1, 40)
      as <- Gen.listOfN(na, Gen.choose(-3L, 2L))
      bs <- Gen.listOfN(nb, Gen.choose(-3L, 2L))
    } yield (as, bs)
    (1L to 8L).foreach { seed =>
      val (as, bs) = sample(obsGen, seed)
      val brute = (for { a <- as; b <- bs } yield
        if (a > b) 2L else if (a == b) 1L else 0L).sum
      val obs = (as.map((_, true)) ++ bs.map((_, false))).toDF("v", "in_a")
      val row = graft.operators.StatsQueries.mwuStat(obs).collect().head
      assert(row.getAs[Long]("n1") == as.length.toLong, s"seed $seed n1")
      assert(row.getAs[Long]("n2") == bs.length.toLong, s"seed $seed n2")
      assert(row.getAs[Long]("u2x") == brute,
        s"seed $seed u2x ${row.getAs[Long]("u2x")} vs brute $brute")
      assert(row.getAs[Long]("auc_e6") ==
        brute * 1000000L / (2L * as.length * bs.length), s"seed $seed auc")
    }
  }

  test("vocabOverlap equals the brute-force per-pair set intersection " +
       "on random corpora (6 seeds)") {
    val svGen = Gen.listOfN(60, for {
      src <- Gen.oneOf("s1", "s2", "s3", "s4")
      tok <- Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h", "")
    } yield (src, tok))
    (1L to 6L).foreach { seed =>
      val rows = sample(svGen, seed)
      val vocab = rows.groupBy(_._1).map { case (s, ts) =>
        s -> ts.map(_._2).toSet }
      val expect = vocab.keys.toSeq.sorted.combinations(2).toSeq.flatMap {
        case Seq(a, b) =>
          val inter = (vocab(a) & vocab(b)).size.toLong
          if (inter == 0L) None
          else Some((a, b, vocab(a).size.toLong, vocab(b).size.toLong,
            inter,
            inter * 1000000L /
              (vocab(a).size + vocab(b).size - inter)))
      }
      val got = graft.operators.TextQueries
        .vocabOverlap(rows.toDF("source", "token")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                   r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(got == expect, s"seed $seed: $got vs $expect")
    }
  }

  // ---- DECIMAL(38) envelope pins (VERDICT r10 #5): the three e6/e12
  // parity paths whose products outgrow Long at real corpus scale must
  // compute EXACTLY there (BigInt ground truth), with overflow of a
  // BIGINT *output* column surfacing as null — never a wrapped Long.

  test("the suite runs under Spark 4's ANSI default — overflow throws or " +
       "try_cast-nulls, never a silent Long wraparound (VERDICT r10 #8)") {
    // nothing in the repo sets spark.sql.ansi.enabled: every spec, the
    // Verify dump and the Bench main inherit ANSI=on, so the 169
    // oracle-green queries are certified under ANSI semantics already
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val wrapped = intercept[Exception] {
      Seq(Long.MaxValue).toDF("x").selectExpr("x * 2").collect()
    }
    assert(wrapped.getMessage.toLowerCase.contains("overflow"), wrapped)
  }

  test("bm25 scoring stays exact past the Long envelope (1e6·22·T·tf)") {
    import org.apache.spark.sql.functions.{expr, sum}
    val (n, df, t, tf, dl) = (1000000000L, 3L, 5000000000000L, 100L, 2000L)
    // numerator 1e6·22·T·tf ≈ 1.1e22 ≫ 2⁶³ — Long arithmetic wraps here
    val row = Seq((n, df, t, tf, dl)).toDF("n", "df", "t", "tf", "dl")
      .withColumn("idf_e6", expr(operators.TextQueries.IdfE6Expr))
      .withColumn("tfn_e6", expr(operators.TextQueries.TfnE6Expr))
    val got = row.select("idf_e6", "tfn_e6").as[(Long, Long)].head()
    val idfExp = (BigInt(1000000) * (2 * n - 2 * df + 1)) / (2 * df + 1)
    val tfnExp = (BigInt(1000000) * 22 * t * tf) /
      (BigInt(10) * t * tf + BigInt(3) * t + BigInt(9) * dl * n)
    assert(got == (idfExp.toLong, tfnExp.toLong))
    // the per-doc score sum runs in DECIMAL; a score past the BIGINT
    // output contract surfaces as null (the try_cast guard), never wraps
    // and never throws — identical in ANSI and legacy modes
    assert(idfExp * tfnExp > BigInt(Long.MaxValue))
    val score = row.groupBy("n")
      .agg(sum(expr(operators.TextQueries.ScoreTermExpr)).as("score_d"))
      .select(expr("try_cast(score_d AS BIGINT)").as("score_e12"))
      .collect().head
    assert(score.isNullAt(0), s"expected null past envelope, got $score")
  }

  test("anomaly z-test stays exact past the Long envelope (n² > 2⁶³)") {
    val nBase = 4000000000L // n² = 1.6e19 > Long.MaxValue
    val hours = (0L until 24L).map(h => (h, nBase)) :+ (24L, 10 * nBase)
    val out = operators.EventTimeQueries
      .anomalyFlags(hours.toDF("hr", "n"))
      .filter($"hr" === 24L).collect().head
    // BigInt ground truth: zero trailing variance + positive deviation
    val s = BigInt(24) * nBase
    val q = BigInt(24) * nBase * nBase
    val nc = BigInt(10) * nBase * 24
    assert((nc - s) * (nc - s) * 23 > BigInt(9) * 24 * (24 * q - s * s))
    assert(out.getAs[Boolean]("is_anomaly"))
    assert(out.getAs[Long]("trail_s") == s.toLong) // fits: reported
    assert(out.isNullAt(out.fieldIndex("trail_q")),
      "trail_q past the BIGINT contract must surface as null, not wrap")
  }

  test("mix epoch budgets stay exact past the Long envelope (3·ntot·w_e3)") {
    val t = 5000000000000000L // 5e15/source → 3·ntot·w_e3 ≈ 1.5e19 > 2⁶³
    val out = operators.SamplingQueries
      .epochSchedule(Seq(("srcA", t), ("srcB", t)).toDF("source", "t"))
      .orderBy("source").collect()
    val w = math.floor(math.sqrt(t.toDouble)).toLong * 1000
    val wE3 = w * 1000 / (2 * w) // = 500 each
    val ntot = BigInt(2) * t
    val target = BigInt(3) * ntot * wE3 / (2 * wE3)
    val epochs = (target * 1000 / t).min(4000)
    val alloc = BigInt(t) * epochs / 1000
    assert(target > BigInt(Long.MaxValue) / 3 * 2 || target == BigInt(3) * t,
      "fixture sanity") // target = 3·t per source here
    out.foreach { r =>
      assert(r.getAs[Long]("target_tokens") == target.toLong)
      assert(r.getAs[Long]("epochs_e3") == epochs.toLong)
      assert(r.getAs[Long]("alloc_tokens") == alloc.toLong)
    }
  }

  test("framing is invariant under arbitrary chunking (R3, 30 cases)") {
    val frame: Seq[String] => Seq[String] = chunks => {
      val all = chunks.mkString
      all.split("\n", -1).dropRight(1).filter(_.nonEmpty).toSeq
    }
    (1L to 30L).foreach { seed =>
      val lines = sample(Gen.listOfN(10, lineGen), seed)
      val chunkSize = sample(Gen.choose(1, 40), seed * 7 + 1)
      val stream = lines.mkString("", "\n", "\n")
      val chunked = stream.grouped(chunkSize).toSeq
      assert(frame(chunked) == lines, s"seed $seed chunk $chunkSize")
      assert(frame(Seq(stream)) == lines, s"seed $seed single-chunk")
    }
  }
}
