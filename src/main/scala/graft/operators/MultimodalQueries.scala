package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.api.IvfOps
import graft.functions.MediaCodec

/** Multimodal columns for LLM training-data pipelines (north star): media
  * as opaque `binary` payloads + typed metadata, with decode / feature
  * extraction / frame sampling as distributed operators.
  *
  * The decode step is a REAL pure-JVM container parser
  * ([[graft.functions.MediaCodec]]): BMP headers and pixel arrays, RIFF/
  * WAVE chunk walks and PCM16 samples — no native codec libraries (the
  * container ships none), and the whole path is oracle-checkable because
  * the features are exact integer statistics reproducible with
  * fixed-offset byte math in DuckDB. `encodeMedia` synthesizes the real
  * containers deterministically from document bytes; at deployment the
  * decoder reads whatever BMP/WAV bytes the lake holds. (The older
  * byte-stripe `stubDecodeFeatures` remains as the template for swapping
  * in an out-of-container codec.)
  *
  * Scale notes: payload bytes never reach a shuffle — metadata projections
  * prune the binary column (columnar parquet would store it in its own
  * chunk); encode and decode run map-side only (mapPartitions batch
  * iteration, the Scala analog of mapInPandas); frame explode is a
  * Generator, not a join.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Synthesized media table: doc text bytes as payload + typed metadata.
    * media_type cycles deterministically; n_frames derives from payload
    * size (a video-ish notion both engines can compute).
    */
  def media(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source"),
        col("lang"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        (col("n_chars") % 30 + 1).cast("long").as("n_frames")).as("meta"))

  /** STUB decoder (no codecs in-container): per-partition batch iteration
    * producing a fixed-width feature vector — mean byte value over 8 equal
    * stripes of the payload. Deterministic, so specs can pin it; swap the
    * body for a real image/audio decode at deployment.
    */
  def stubDecodeFeatures(mediaDf: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    mediaDf.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val stripes = 8
          val feats = Array.tabulate(stripes) { i =>
            val from = i * payload.length / stripes
            val until = math.max((i + 1) * payload.length / stripes, from + 1)
            val slice = payload.slice(from, math.min(until, payload.length))
            if (slice.isEmpty) 0.0
            else slice.map(b => (b & 0xff).toDouble).sum / slice.length
          }
          Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"), feats.toSeq)
        }
      }(enc)
  }

  /** Real media containers from document bytes (map-side, deterministic):
    * image/video rows become 24-bpp BMPs (8×H grayscale, H = clamp(len/8,
    * 1, 32), pixel i = payload byte i mod len — video uses its first
    * frame), audio rows become 16 kHz PCM16 mono WAVs (min(4096, len)
    * samples, sample i = byte(i mod len)·257 − 32768, spanning the int16
    * range). Empty payloads produce no container (no bytes to decode).
    */
  def encodeMedia(mediaDf: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("container", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    mediaDf.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // a NULL payload (null source text) drops like an empty one —
          // payload.length would NPE the task and, in the streaming twin,
          // one bad row would kill the stream (the drop-don't-crash
          // posture; the oracle's octet_length filter drops it too —
          // r18 self-review)
          val len = if (payload == null) 0 else payload.length
          if (len == 0) None
          else {
            val mt = r.getAs[String]("media_type")
            val bytes = mt match {
              case "audio" =>
                val n = math.min(4096, len)
                val samples = Array.tabulate(n)(i =>
                  ((payload(i % len) & 0xff) * 257 - 32768).toShort)
                MediaCodec.encodeWavPcm16(samples, 16000)
              case _ => // image, video (first frame)
                val h = math.max(1, math.min(32, len / 8))
                val gray = Array.tabulate(8 * h)(i => payload(i % len) & 0xff)
                MediaCodec.encodeBmp24(gray, 8, h)
            }
            Some(Row(r.getAs[Long]("media_id"), mt, bytes))
          }
        }
      }(enc)
  }

  /** Parse containers (magic-sniffed BMP/WAV) into exact integer feature
    * rows; unparseable payloads are dropped (quarantine-side in a real
    * pipeline). Map-side only.
    */
  def decodeMediaFeatures(binDf: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("fmt", StringType),
      StructField("dim1", LongType),
      StructField("dim2", LongType),
      StructField("val_sum", LongType),
      StructField("val_min", LongType),
      StructField("val_max", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binDf.select("media_id", "media_type", "container")
      .mapPartitions { rows =>
        // positional getters: upstream mapPartitions emits schema-less
        // GenericRows, where name-based getAs throws
        rows.flatMap { r =>
          MediaCodec.decode(r.getAs[Array[Byte]](2)).map(f =>
            Row(r.getLong(0), r.getString(1),
                f.fmt, f.dim1, f.dim2, f.valSum, f.valMin, f.valMax))
        }
      }(enc)
  }

  /** Map-side quality decode — [[graft.functions.MediaCodec.quality]]
    * over each container, same mapPartitions shape as
    * [[decodeMediaFeatures]] (no built-in codec expression exists). */
  def decodeMediaQuality(binDf: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("fmt", StringType),
      StructField("n_units", LongType),
      StructField("metric_a", LongType),
      StructField("metric_b", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binDf.select("media_id", "container")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          MediaCodec.quality(r.getAs[Array[Byte]](1)).map(q =>
            Row(r.getLong(0), q.fmt, q.nUnits, q.metricA, q.metricB))
        }
      }(enc)
  }

  def queries: Map[String, Q] = Map(
    "q_mm_quality" -> ((s, d) =>
      // Media QUALITY audit — the multimodal twin of q_text_quality:
      // per-container degeneracy signals a curation pass gates on before
      // training. Images: the exact variance numerator n·Σb² − (Σb)²
      // (zero ⇔ a blank/flat frame — the dead-camera/placeholder
      // detector); audio: full-scale clip count (hard distortion) +
      // Σ|sample|. All-integer from the same header walks as
      // q_mm_features, so the DuckDB oracle reproduces every value from
      // the source bytes. flagged = blank image, or >1% clipped samples.
      decodeMediaQuality(encodeMedia(media(s, d)))
        .withColumn("flagged",
          when(col("fmt") === "bmp", col("metric_a") === 0L)
            .otherwise(col("metric_a") * 100 > col("n_units")))
        .orderBy("media_id")),

    "q_mm_meta" -> ((s, d) =>
      // Binary + metadata plumbing: payload digest, sizes, magic bytes.
      media(s, d).select(
        col("media_id"), col("media_type"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.n_frames").as("n_frames"),
        md5(col("payload")).as("payload_md5"),
        upper(substring(hex(col("payload")), 1, 8)).as("magic"),
        col("meta.source").as("source"))
        .orderBy("media_id")),

    "q_mm_frames" -> ((s, d) =>
      // Frame sampling: explode n_frames into frame rows, keep every 5th —
      // a Generator (no join), the scalable frame-index pattern.
      media(s, d)
        .select(col("media_id"), col("meta.n_frames").as("n_frames"))
        .select(col("media_id"), col("n_frames"),
                explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
        .filter(col("frame_idx") % 5 === 0)
        .orderBy("media_id", "frame_idx")),

    "q_mm_features" -> featuresQ,

    // Streaming twin of q_mm_features — the batch plan IS the oracled
    // decode (the Sbs1 streaming-twin doctrine: batch hash-checked here,
    // STREAMING execution pinned by StreamingSpec's MemoryStream run of
    // the same encode+decode operators under readStream: stateless
    // mapPartitions, append mode, no watermark needed).
    "s_mm_decode" -> featuresQ,

    "q_mm_phash" -> ((s, d) => {
      // Perceptual image near-dup — the CommonCrawl-image day-one need:
      // a 60-bit average-hash over each decoded BMP's pixel grid
      // (MediaCodec.ahash60: integer mean-threshold bits, no floats),
      // then candidate pairs through the SAME capped 4×15-bit band join
      // as q_dedup_simhash — bucketed LSH expansion over capped buckets,
      // never all-pairs, so the operator scales exactly as the text
      // simhash does (BucketCap bounds any boilerplate mega-bucket; an
      // all-identical-image cluster degrades to the cap, not O(n²)).
      // Decode is map-side mapPartitions like the rest of the codec
      // family; audio rows drop out at the magic sniff.
      val fp = phashMedia(encodeMedia(media(s, d)))
        .select(col("media_id").as("doc_id"), col("phash").as("simhash"))
      DedupQueries.simhashBandPairs(fp)
        .filter(col("hamming") <= PhashMaxHamming)
        .select(col("da").as("ma"), col("db").as("mb"), col("hamming"))
        .orderBy("ma", "mb")
    }),

    "q_mm_hamming_thresholds" -> ((s, d) => {
      // Hamming-cutoff sensitivity SWEEP for perceptual dedup — the
      // third member of the threshold-sweep family (Jaccard:
      // q_dedup_thresholds, cosine: q_emb_thresholds, hamming: this):
      // image pair + affected-media counts at hamming 0–6 in ONE pass
      // over the SAME capped band join as q_mm_phash (never a
      // per-threshold re-fingerprint). Bounded ×7 threshold and ×2
      // media fan-outs ride the near-dup-sized pair table map-side into
      // a ≤7-cell aggregation; n_pairs = instances DIV 2.
      val fp = phashMedia(encodeMedia(media(s, d)))
        .select(col("media_id").as("doc_id"), col("phash").as("simhash"))
      DedupQueries.simhashBandPairs(fp)
        .filter(col("hamming") <= PhashMaxHamming)
        .select(col("hamming"),
          explode(array((0 to PhashMaxHamming).map(i => lit(i.toLong)): _*))
            .as("max_hamming"),
          col("da"), col("db"))
        .filter(col("hamming") <= col("max_hamming"))
        .select(col("max_hamming"),
          explode(array(col("da"), col("db"))).as("media_id"))
        .groupBy("max_hamming")
        .agg(expr("count(1) DIV 2").as("n_pairs"),
             count_distinct(col("media_id")).as("n_media"))
        .orderBy("max_hamming")
    }),

    "q_mm_resize" -> ((s, d) => {
      // Image RESIZE/thumbnail — the remaining north-star multimodal verb
      // (decode / feature-extract / RESIZE / frame-sample): nearest-
      // neighbour 8×8 over each decoded BMP's channel-0 bytes in FILE
      // row order (ahash60's sampling rule, returning the pixels instead
      // of a fingerprint). Output per image: exact integer stats of the
      // 64 resized cells PLUS an order-sensitive Rabin–Karp checksum
      // (Σ vᵢ·Bⁱ mod p over the row-major cells — the TextHash constants,
      // one arithmetic definition), so the oracle verifies the resized
      // pixel SEQUENCE, not just its multiset. Decode+resize is map-side
      // mapPartitions like the rest of the codec family; payload bytes
      // never reach a shuffle; WAV rows drop at the magic sniff. At
      // deployment the thumbnail bytes themselves would be the written
      // column — the stats+checksum form is what makes the operator
      // oracle-checkable.
      val schema = StructType(Seq(
        StructField("media_id", LongType),
        StructField("out_w", LongType),
        StructField("out_h", LongType),
        StructField("px_sum", LongType),
        StructField("px_min", LongType),
        StructField("px_max", LongType),
        StructField("rk_checksum", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      encodeMedia(media(s, d)).select("media_id", "container")
        .mapPartitions { rows =>
          rows.flatMap { r =>
            MediaCodec.resizeGray(r.getAs[Array[Byte]](1), 8, 8).map { px =>
              var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
              var ck = 0L; var i = 0
              while (i < px.length) {
                val v = px(i).toLong
                sum += v
                if (v < mn) mn = v
                if (v > mx) mx = v
                // v < 2^8 and pw < 2^30: 64 terms stay far inside Long;
                // one mod at the end matches the oracle's list_sum % p
                ck += v * ResizePw(i)
                i += 1
              }
              Row(r.getLong(0), 8L, 8L, sum, mn, mx,
                  ck % graft.functions.TextHash.FpPrime)
            }
          }
        }(enc)
        .orderBy("media_id")
    }),

    "q_mm_audiofp" -> ((s, d) => {
      // Perceptual AUDIO near-dup — q_mm_phash's sibling, closing the
      // multimodal family (re-encoded/re-sampled copies of one recording
      // are the CommonCrawl-audio analog of near-dup images): a 60-bit
      // amplitude-envelope hash over each decoded WAV's PCM16 stream
      // (MediaCodec.afp60: 60 equal-span frame energies, mean-thresholded
      // with exact cross-multiplied integers), then the same capped
      // 4×15-bit band join as the text/image simhash — bucketed LSH over
      // capped buckets, never all-pairs. BMP rows drop at the magic sniff.
      val fp = afpMedia(encodeMedia(media(s, d)))
        .select(col("media_id").as("doc_id"), col("afp").as("simhash"))
      DedupQueries.simhashBandPairs(fp)
        .filter(col("hamming") <= PhashMaxHamming)
        .select(col("da").as("ma"), col("db").as("mb"), col("hamming"))
        .orderBy("ma", "mb")
    })
  )

  /** Real decode: synthesize BMP/WAV containers from payload bytes, then
    * parse them back (headers at fixed LE offsets, pixel array / PCM16
    * walk) into exact integer stats — hash-matched by a DuckDB oracle
    * computing the same arithmetic from the source bytes. ONE body for
    * q_mm_features and its streaming twin s_mm_decode.
    */
  private val featuresQ: Q = (s, d) =>
    decodeMediaFeatures(encodeMedia(media(s, d))).orderBy("media_id")

  /** The q_mm_features byte-math mirror, shared with the s_mm_decode
    * streaming twin (ONE oracle string for one decode definition). */
  private val FeaturesOracle: String =
    """WITH b AS (
      |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS m,
      |         octet_length(encode(text)) AS len,
      |         [('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT
      |            for i in range(1, octet_length(encode(text)) + 1)] AS bv
      |  FROM documents
      |  WHERE octet_length(encode(text)) > 0),
      |imgp AS (
      |  SELECT doc_id, m, h, [bv[(i % len) + 1] for i in range(0, 8 * h)] AS px
      |  FROM (SELECT doc_id, m, len, bv,
      |               greatest(1, least(32, len // 8)) AS h
      |        FROM b WHERE m = 0 OR m = 2)),
      |imgf AS (
      |  SELECT doc_id, m, 'bmp' AS fmt,
      |         CAST(8 AS BIGINT) AS dim1, CAST(h AS BIGINT) AS dim2,
      |         CAST(3 * list_aggregate(px, 'sum') AS BIGINT) AS val_sum,
      |         CAST(list_aggregate(px, 'min') AS BIGINT) AS val_min,
      |         CAST(list_aggregate(px, 'max') AS BIGINT) AS val_max
      |  FROM imgp),
      |audp AS (
      |  SELECT doc_id, m, ns,
      |         [bv[(i % len) + 1] * 257 - 32768 for i in range(0, ns)] AS sm
      |  FROM (SELECT doc_id, m, len, bv, least(4096, len) AS ns
      |        FROM b WHERE m = 1)),
      |audf AS (
      |  SELECT doc_id, m, 'wav' AS fmt,
      |         CAST(16000 AS BIGINT) AS dim1, CAST(ns AS BIGINT) AS dim2,
      |         CAST(list_aggregate(sm, 'sum') AS BIGINT) AS val_sum,
      |         CAST(list_aggregate(sm, 'min') AS BIGINT) AS val_min,
      |         CAST(list_aggregate(sm, 'max') AS BIGINT) AS val_max
      |  FROM audp),
      |allf AS (SELECT * FROM imgf UNION ALL SELECT * FROM audf)
      |SELECT doc_id AS media_id,
      |       ['image', 'audio', 'video'][m + 1] AS media_type,
      |       fmt, dim1, dim2, val_sum, val_min, val_max
      |FROM allf ORDER BY media_id""".stripMargin

  /** Same near-dup acceptance radius as the text simhash (≤6 of 60 bits). */
  val PhashMaxHamming = 6

  /** Rabin–Karp position weights for q_mm_resize's 64-cell checksum:
    * pw(i) = PolyB^i mod FpPrime. ONE definition feeds both the engine
    * fold and the oracle's literal weight list, so the constants cannot
    * drift between the two.
    */
  private[operators] val ResizePw: Array[Long] =
    Array.iterate(1L, 64)(x =>
      x * graft.functions.TextHash.PolyB % graft.functions.TextHash.FpPrime)

  /** (media_id, phash): 60-bit perceptual fingerprints of the decodable
    * images (map-side; WAV/corrupt containers drop at the magic sniff).
    */
  def phashMedia(binDf: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("phash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binDf.select("media_id", "container")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          MediaCodec.ahash60(r.getAs[Array[Byte]](1))
            .map(fp => Row(r.getLong(0), fp))
        }
      }(enc)
  }

  /** (media_id, afp): 60-bit amplitude-envelope fingerprints of the
    * decodable PCM16 WAVs (map-side; BMP/corrupt containers drop at the
    * magic sniff).
    */
  def afpMedia(binDf: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("afp", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    binDf.select("media_id", "container")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          MediaCodec.afp60(r.getAs[Array[Byte]](1))
            .map(fp => Row(r.getLong(0), fp))
        }
      }(enc)
  }

  def oracles: Map[String, String] = Map(
    "q_mm_meta" ->
      """SELECT doc_id AS media_id,
        |       ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(n_chars % 30 + 1 AS BIGINT) AS n_frames,
        |       md5(text) AS payload_md5,
        |       upper(substr(hex(encode(text)), 1, 8)) AS magic,
        |       source
        |FROM documents ORDER BY media_id""".stripMargin,

    // Mirror of the synthesis + resize byte math: image grid is 8×h with
    // gray cell k2 = byte (k2 mod len); resized cell k samples src row
    // ((k//8)·h)//8, col k%8 (width 8 ⇒ identity). Weights are the SAME
    // ResizePw constants the engine folds with; terms < 2^38 so list_sum
    // is exact and one % p matches the engine's single final mod.
    "q_mm_resize" ->
      s"""WITH b AS (
         |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS m,
         |         octet_length(encode(text)) AS len,
         |         [('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT
         |            for i in range(1, octet_length(encode(text)) + 1)] AS bv
         |  FROM documents
         |  WHERE octet_length(encode(text)) > 0),
         |g AS (
         |  SELECT doc_id, len, bv, greatest(1, least(32, len // 8)) AS h
         |  FROM b WHERE m = 0 OR m = 2),
         |r AS (
         |  SELECT doc_id,
         |         [bv[((((k // 8) * h // 8) * 8 + (k % 8)) % len) + 1]
         |            for k in range(0, 64)] AS rs
         |  FROM g)
         |SELECT doc_id AS media_id,
         |       CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
         |       CAST(list_aggregate(rs, 'sum') AS BIGINT) AS px_sum,
         |       CAST(list_aggregate(rs, 'min') AS BIGINT) AS px_min,
         |       CAST(list_aggregate(rs, 'max') AS BIGINT) AS px_max,
         |       CAST(list_aggregate(
         |              [rs[i+1] * [${ResizePw.mkString(", ")}][i+1]
         |                 for i in range(0, 64)], 'sum')
         |            % ${graft.functions.TextHash.FpPrime} AS BIGINT)
         |         AS rk_checksum
         |FROM r ORDER BY media_id""".stripMargin,

    "q_mm_frames" ->
      """SELECT media_id, n_frames, frame_idx FROM (
        |  SELECT doc_id AS media_id,
        |         CAST(n_chars % 30 + 1 AS BIGINT) AS n_frames,
        |         CAST(unnest(range(0, n_chars % 30 + 1)) AS BIGINT) AS frame_idx
        |  FROM documents)
        |WHERE frame_idx % 5 = 0
        |ORDER BY media_id, frame_idx""".stripMargin,

    // Mirror of encodeMedia∘decodeMediaFeatures with fixed-offset byte
    // math: the BMP pixel array is payload byte (i mod len) replicated
    // across 3 channels, the WAV sample stream is byte(i mod len)·257 −
    // 32768 — so the decoded stats are list aggregations over the source
    // bytes (parsed from the hex dump, two chars per byte).
    "q_mm_features" -> FeaturesOracle,
    "s_mm_decode" -> FeaturesOracle,

    // q_mm_features' byte-math mirror, quality edition: image variance
    // numerator over the ×3-replicated pixel bytes (n=24h, Σb=3Σpx,
    // Σb²=3Σpx² ⇒ 72h·Σpx² − 9(Σpx)²), audio full-scale clip count +
    // |sample| sum over the byte·257−32768 stream
    "q_mm_quality" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS m,
        |         octet_length(encode(text)) AS len,
        |         [('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT
        |            for i in range(1, octet_length(encode(text)) + 1)] AS bv
        |  FROM documents
        |  WHERE octet_length(encode(text)) > 0),
        |imgp AS (
        |  SELECT doc_id, h, [bv[(i % len) + 1] for i in range(0, 8 * h)] AS px
        |  FROM (SELECT doc_id, len, bv,
        |               greatest(1, least(32, len // 8)) AS h
        |        FROM b WHERE m = 0 OR m = 2)),
        |imgq AS (
        |  SELECT doc_id, 'bmp' AS fmt,
        |         CAST(24 * h AS BIGINT) AS n_units,
        |         CAST(72 * h * list_aggregate([p*p for p in px], 'sum')
        |              - 9 * list_aggregate(px, 'sum')
        |                  * list_aggregate(px, 'sum') AS BIGINT) AS metric_a,
        |         CAST(3 * list_aggregate(px, 'sum') AS BIGINT) AS metric_b
        |  FROM imgp),
        |audp AS (
        |  SELECT doc_id, ns,
        |         [bv[(i % len) + 1] * 257 - 32768 for i in range(0, ns)] AS sm
        |  FROM (SELECT doc_id, len, bv, least(4096, len) AS ns
        |        FROM b WHERE m = 1)),
        |audq AS (
        |  SELECT doc_id, 'wav' AS fmt,
        |         CAST(ns AS BIGINT) AS n_units,
        |         CAST(len(list_filter(sm,
        |              x -> x = 32767 OR x = -32768)) AS BIGINT) AS metric_a,
        |         CAST(list_aggregate([abs(x) for x in sm], 'sum')
        |              AS BIGINT) AS metric_b
        |  FROM audp),
        |allq AS (SELECT * FROM imgq UNION ALL SELECT * FROM audq)
        |SELECT doc_id AS media_id, fmt, n_units, metric_a, metric_b,
        |       CASE WHEN fmt = 'bmp' THEN metric_a = 0
        |            ELSE metric_a * 100 > n_units END AS flagged
        |FROM allq ORDER BY media_id""".stripMargin,

    // Mirror of ahash60 over the synthetic 8×H BMPs: channel-0 pixel p
    // (file row-major) is payload byte (p mod len); 8×8 nearest-neighbour
    // grid, mean-threshold bits over the first 60 cells, then the exact
    // simhash band/cap/pair SQL from q_dedup_simhash.
    "q_mm_phash" ->
      s"""WITH src AS (
         |  SELECT doc_id, octet_length(encode(text)) AS len,
         |         [('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT
         |            for i in range(1, octet_length(encode(text)) + 1)] AS bv
         |  FROM documents
         |  WHERE octet_length(encode(text)) > 0 AND doc_id % 3 <> 1),
         |g AS (
         |  SELECT doc_id,
         |         [bv[((((k // 8) * h // 8) * 8 + (k % 8)) % len) + 1]
         |          for k in range(0, 60)] AS cells
         |  FROM (SELECT doc_id, len, bv,
         |               greatest(1, least(32, len // 8)) AS h
         |        FROM src)),
         |ph AS (
         |  SELECT doc_id,
         |         list_aggregate(
         |           [CASE WHEN 60 * cells[k + 1] > s
         |                 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END
         |            for k in range(0, 60)], 'sum') AS simhash
         |  FROM (SELECT doc_id, cells, list_aggregate(cells, 'sum') AS s
         |        FROM g)),
         |${DedupQueries.duckBandPairSql("ph", "ma", "mb", PhashMaxHamming)}""".stripMargin,

    // q_mm_phash's fingerprint + band CTEs, the pair SELECT embedded as
    // a further CTE, then the bounded threshold × media fan-out sweep
    "q_mm_hamming_thresholds" ->
      s"""WITH src AS (
         |  SELECT doc_id, octet_length(encode(text)) AS len,
         |         [('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT
         |            for i in range(1, octet_length(encode(text)) + 1)] AS bv
         |  FROM documents
         |  WHERE octet_length(encode(text)) > 0 AND doc_id % 3 <> 1),
         |g AS (
         |  SELECT doc_id,
         |         [bv[((((k // 8) * h // 8) * 8 + (k % 8)) % len) + 1]
         |          for k in range(0, 60)] AS cells
         |  FROM (SELECT doc_id, len, bv,
         |               greatest(1, least(32, len // 8)) AS h
         |        FROM src)),
         |ph AS (
         |  SELECT doc_id,
         |         list_aggregate(
         |           [CASE WHEN 60 * cells[k + 1] > s
         |                 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END
         |            for k in range(0, 60)], 'sum') AS simhash
         |  FROM (SELECT doc_id, cells, list_aggregate(cells, 'sum') AS s
         |        FROM g)),
         |${DedupQueries.duckBandPairCtes("ph")},
         |pairs AS (
         |${DedupQueries.duckBandPairSelect("ma", "mb", PhashMaxHamming)}),
         |f AS (SELECT CAST(t.thr AS BIGINT) AS max_hamming, u.media_id
         |      FROM pairs,
         |           unnest([0, 1, 2, 3, 4, 5, 6]) AS t(thr),
         |           unnest([pairs.ma, pairs.mb]) AS u(media_id)
         |      WHERE pairs.hamming <= t.thr)
         |SELECT max_hamming, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
         |       count(DISTINCT media_id) AS n_media
         |FROM f GROUP BY max_hamming ORDER BY max_hamming""".stripMargin,

    // Mirror of encodeMedia∘afp60 from the source bytes: the WAV sample
    // stream is byte(i mod len)·257 − 32768 over n = min(4096, len)
    // samples; 60 equal-span frames by floor-division bounds (same
    // bounds as the Scala loop), frame energy = Σ|sample|, bit k =
    // energy_k·n > total·count_k (exact integers; an empty frame's
    // NULL sum coalesces to 0 so 0 > 0 keeps the bit clear on both
    // engines). Band join + cap identical to q_mm_phash.
    "q_mm_audiofp" ->
      s"""WITH src AS (
         |  SELECT doc_id, octet_length(encode(text)) AS len,
         |         [('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT
         |            for i in range(1, octet_length(encode(text)) + 1)] AS bv
         |  FROM documents
         |  WHERE octet_length(encode(text)) > 0 AND doc_id % 3 = 1),
         |sv AS (
         |  SELECT doc_id, least(4096, len) AS n,
         |         [abs(bv[(i % len) + 1] * 257 - 32768)
         |            for i in range(0, least(4096, len))] AS av
         |  FROM src),
         |fr AS (
         |  SELECT doc_id, n,
         |         [coalesce(list_aggregate(
         |            av[(k * n) // 60 + 1 : ((k + 1) * n) // 60], 'sum'), 0)
         |            for k in range(0, 60)] AS fs,
         |         [((k + 1) * n) // 60 - (k * n) // 60
         |            for k in range(0, 60)] AS fc,
         |         list_aggregate(av, 'sum') AS tot
         |  FROM sv),
         |ph AS (
         |  SELECT doc_id,
         |         list_aggregate(
         |           [CASE WHEN fs[k + 1] * n > tot * fc[k + 1]
         |                 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END
         |            for k in range(0, 60)], 'sum') AS simhash
         |  FROM fr),
         |${DedupQueries.duckBandPairSql("ph", "ma", "mb", PhashMaxHamming)}""".stripMargin
  )
}
