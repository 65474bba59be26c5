package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalQueries
import graft.functions.CentroidAggregator

/** Multimodal plumbing + typed UDAF specs (north star). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table: binary payloads with typed metadata") {
    val m = MultimodalQueries.media(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.select("meta.n_bytes").filter(col("n_bytes") <= 0).count() == 0)
    assert(m.select("media_type").distinct().count() == 3)
  }

  test("stub decode: fixed-width deterministic features per media row") {
    val feats = MultimodalQueries.stubDecodeFeatures(
      MultimodalQueries.media(spark, sf))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Seq[Double]]("features").length == 8))
    // deterministic: running twice gives identical features
    val again = MultimodalQueries.stubDecodeFeatures(
      MultimodalQueries.media(spark, sf)).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // mean byte value of lowercase text lands in a sane band
    val f0 = rows.head.getAs[Seq[Double]]("features").head
    assert(f0 > 32 && f0 < 127)
  }

  test("MediaCodec: BMP round-trip parses header fields and exact pixel stats") {
    import graft.functions.MediaCodec
    val gray = Array(0, 255, 7, 13, 200, 100, 50, 1, 2, 3, 4, 5, 6, 8, 9, 10)
    val bmp = MediaCodec.encodeBmp24(gray, 8, 2)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val f = MediaCodec.decode(bmp).get
    assert(f.fmt == "bmp")
    assert(f.dim1 == 8 && f.dim2 == 2)
    assert(f.valSum == 3L * gray.sum)
    assert(f.valMin == 0 && f.valMax == 255)
    // non-multiple-of-4 stride exercises row padding (w=3 -> stride 12 != 9)
    val g2 = Array(10, 20, 30, 40, 50, 60)
    val f2 = MediaCodec.decode(MediaCodec.encodeBmp24(g2, 3, 2)).get
    assert(f2.valSum == 3L * g2.sum && f2.valMin == 10 && f2.valMax == 60)
  }

  test("MediaCodec: WAV round-trip walks RIFF chunks and sums PCM16 samples") {
    import graft.functions.MediaCodec
    val samples = Array[Short](-32768, 32767, 0, 1, -1, 1000)
    val wav = MediaCodec.encodeWavPcm16(samples, 16000)
    val f = MediaCodec.decode(wav).get
    assert(f.fmt == "wav")
    assert(f.dim1 == 16000 && f.dim2 == samples.length)
    assert(f.valSum == samples.map(_.toLong).sum)
    assert(f.valMin == -32768 && f.valMax == 32767)
    // neither magic -> None (quarantine, not an exception)
    assert(MediaCodec.decode("not a container".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.decode(Array[Byte]()).isEmpty)
  }

  test("MediaCodec.quality: blank-image and clipped-audio degeneracy " +
       "signals on crafted containers") {
    import graft.functions.MediaCodec
    // flat image: every pixel byte equal → variance numerator exactly 0
    val flat = MediaCodec.quality(
      MediaCodec.encodeBmp24(Array.fill(16)(77), 8, 2)).get
    assert(flat.fmt == "bmp" && flat.nUnits == 48 && flat.metricA == 0L)
    assert(flat.metricB == 48L * 77)
    // varied image: n·Σb² − (Σb)² matches driver math over ×3 channels
    val gray = Array(0, 255, 7, 13, 200, 100, 50, 1, 2, 3, 4, 5, 6, 8, 9, 10)
    val v = MediaCodec.quality(MediaCodec.encodeBmp24(gray, 8, 2)).get
    val bs = gray.flatMap(p => Seq(p, p, p)).map(_.toLong)
    assert(v.metricA == bs.length * bs.map(x => x * x).sum
      - bs.sum * bs.sum && v.metricA > 0)
    // clipped audio: both full-scale rails count; |sample| sums exactly
    val samples = Array[Short](-32768, 32767, 0, 1, -1, 1000, 32767)
    val q = MediaCodec.quality(MediaCodec.encodeWavPcm16(samples, 16000)).get
    assert(q.fmt == "wav" && q.nUnits == 7 && q.metricA == 3L)
    assert(q.metricB == samples.map(s => math.abs(s.toLong)).sum)
    // the query's flag lines: blank bmp flags, >1% clip rate flags
    assert(flat.metricA == 0L)
    assert(q.metricA * 100 > q.nUnits)
    assert(MediaCodec.quality("not a container".getBytes("UTF-8")).isEmpty)
  }

  test("MediaCodec: crafted headers with overflowing sizes quarantine as None") {
    import graft.functions.MediaCodec
    import java.nio.{ByteBuffer, ByteOrder}
    // WAV whose data chunk claims ~2^31 bytes: off+8+size overflows Int
    val wav = MediaCodec.encodeWavPcm16(Array[Short](1, 2, 3), 16000)
    val evil = wav.clone()
    ByteBuffer.wrap(evil).order(ByteOrder.LITTLE_ENDIAN).putInt(40, 0x7FFFFFF0)
    assert(MediaCodec.decode(evil).isEmpty) // None, not an exception
    // BMP whose width*3 overflows Int (negative stride would skip bounds)
    val bmp = MediaCodec.encodeBmp24(Array(1, 2, 3, 4), 2, 2)
    val evil2 = bmp.clone()
    ByteBuffer.wrap(evil2).order(ByteOrder.LITTLE_ENDIAN).putInt(18, 715827883)
    assert(MediaCodec.decode(evil2).isEmpty)
    // non-PCM wFormatTag (e.g. WAVE_FORMAT_EXTENSIBLE) with 16 bits per
    // sample: walking the data chunk as raw PCM16 would emit
    // plausible-but-wrong stats — quarantine instead (r18 self-review)
    val nonPcm = wav.clone()
    ByteBuffer.wrap(nonPcm).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 0xFFFE.toShort)
    assert(MediaCodec.decode(nonPcm).isEmpty)
  }

  test("ahash60: planted near-dup image pair lands within the hamming radius") {
    import graft.functions.MediaCodec
    // a high-contrast 8×8 image and a copy with ONE pixel nudged across
    // the mean: hashes differ in at most a few bits; an inverted image
    // is far away
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 220 else 20)
    val nearDup = base.clone(); nearDup(10) = 220 // was 20 — crosses mean
    val inverted = base.map(v => 240 - v)
    def h(g: Array[Int]) = MediaCodec.ahash60(MediaCodec.encodeBmp24(g, 8, 8)).get
    val d01 = java.lang.Long.bitCount(h(base) ^ h(nearDup))
    val dInv = java.lang.Long.bitCount(h(base) ^ h(inverted))
    assert(d01 <= MultimodalQueries.PhashMaxHamming, s"near-dup distance $d01")
    assert(dInv > MultimodalQueries.PhashMaxHamming, s"inverted distance $dInv")
    // WAVs and junk are not images: no fingerprint, never a pair
    assert(MediaCodec.ahash60(
      MediaCodec.encodeWavPcm16(Array[Short](1, 2), 16000)).isEmpty)
    assert(MediaCodec.ahash60("junk".getBytes("UTF-8")).isEmpty)
  }

  test("afp60: planted near-dup audio pair lands within the hamming radius") {
    import graft.functions.MediaCodec
    // 600 samples = 10 per frame; a loud/quiet alternating envelope, a
    // copy with small per-sample jitter (envelope intact), and a copy
    // with the envelope phase flipped (every frame crosses the mean the
    // other way)
    val base = Array.tabulate(600)(i =>
      (if ((i / 10) % 2 == 0) 20000 else 100).toShort)
    val jitter = base.zipWithIndex.map { case (v, i) =>
      (v + (if (i % 7 == 0) 50 else -25)).toShort }
    val flipped = Array.tabulate(600)(i =>
      (if ((i / 10) % 2 == 1) 20000 else 100).toShort)
    def h(s: Array[Short]) =
      MediaCodec.afp60(MediaCodec.encodeWavPcm16(s, 16000)).get
    val dJit = java.lang.Long.bitCount(h(base) ^ h(jitter))
    val dFlip = java.lang.Long.bitCount(h(base) ^ h(flipped))
    assert(dJit <= MultimodalQueries.PhashMaxHamming, s"near-dup distance $dJit")
    assert(dFlip > MultimodalQueries.PhashMaxHamming, s"flipped distance $dFlip")
    // BMPs and junk are not audio: no fingerprint, never a pair
    assert(MediaCodec.afp60(
      MediaCodec.encodeBmp24(Array(1, 2, 3, 4), 2, 2)).isEmpty)
    assert(MediaCodec.afp60("junk".getBytes("UTF-8")).isEmpty)
  }

  test("q_mm_audiofp agrees with brute-force hamming over the fingerprints") {
    val fps = MultimodalQueries.afpMedia(
        MultimodalQueries.encodeMedia(MultimodalQueries.media(spark, sf)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fps.nonEmpty)
    assert(fps.forall { case (id, _) => id % 3 == 1 }, "non-audio id fingerprinted")
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb)
      if h <= MultimodalQueries.PhashMaxHamming
    } yield (a, b, h.toLong)).toSet
    val out = MultimodalQueries.queries("q_mm_audiofp")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    // LSH band recall is guaranteed only ≤3 differing bits (4×15-bit
    // pigeonhole); 4..6-bit pairs may legitimately share no band
    assert(out.subsetOf(brute), s"pairs beyond radius: ${out diff brute}")
    val mustFind = brute.filter(_._3 <= 3)
    assert(mustFind.subsetOf(out), s"missed ≤3-bit pairs: ${mustFind diff out}")
  }

  test("q_mm_phash: pairs are image/video ids, symmetric-free, within radius") {
    val out = MultimodalQueries.queries("q_mm_phash")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty, "fixture yields no perceptual near-dups")
    out.foreach { case (ma, mb, ham) =>
      assert(ma < mb, s"unordered pair ($ma,$mb)")
      assert(ham <= MultimodalQueries.PhashMaxHamming)
      assert(ma % 3 != 1 && mb % 3 != 1, s"audio id in image pair ($ma,$mb)")
    }
  }

  test("q_mm_features: every non-empty doc decodes; stats match driver math") {
    val out = MultimodalQueries.queries("q_mm_features")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.length == docs.count { case (_, t) => t.getBytes("UTF-8").nonEmpty })
    out.take(50).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val bytes = docs(id).getBytes("UTF-8")
      val len = bytes.length
      if (r.getAs[String]("fmt") == "bmp") {
        val h = math.max(1, math.min(32, len / 8))
        val px = (0 until 8 * h).map(i => (bytes(i % len) & 0xff).toLong)
        assert(r.getAs[Long]("dim2") == h)
        assert(r.getAs[Long]("val_sum") == 3 * px.sum)
        assert(r.getAs[Long]("val_min") == px.min)
        assert(r.getAs[Long]("val_max") == px.max)
      } else {
        val ns = math.min(4096, len)
        val sm = (0 until ns).map(i => (bytes(i % len) & 0xff).toLong * 257 - 32768)
        assert(r.getAs[Long]("dim2") == ns)
        assert(r.getAs[Long]("val_sum") == sm.sum)
      }
    }
  }

  test("centroid Aggregator: per-label elementwise mean of embeddings") {
    val e = Tables.embeddings(spark, sf)
      .select(col("label"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Int, Seq[Double])]
    val cents = e.groupByKey(_._1)
      .mapValues(_._2)
      .agg(CentroidAggregator.toColumn.name("centroid"))
      .collect()
    // hand-check one label against a driver-side computation
    val (lbl, got) = {
      val c = cents.head
      (c._1, c._2)
    }
    val vecs = e.filter(_._1 == lbl).map(_._2).collect().map(_.toVector).toVector
    val want = vecs.transpose.map(xs => xs.sum / xs.length)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    assert(got.length == 64)
  }

  test("centroid Aggregator: ragged embeddings fail LOUDLY — never a " +
       "silently truncated centroid (r18 self-review)") {
    import spark.implicits._
    val ragged = Seq((1, Seq(1.0, 2.0, 3.0)), (1, Seq(1.0)))
      .toDF("label", "v").as[(Int, Seq[Double])]
    val e = intercept[Exception] {
      ragged.groupByKey(_._1).mapValues(_._2)
        .agg(CentroidAggregator.toColumn.name("centroid")).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("ragged"), msgs)
  }
}
