package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal columns for LLM training-data pipelines (north star): media
  * as opaque `binary` payloads + typed metadata, with decode / feature
  * extraction / frame sampling as distributed operators.
  *
  * The container ships no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`stubDecodeFeatures`) — the Spark
  * side is real: schema (binary + metadata struct), partition-parallel
  * mapPartitions batch iteration (the Scala analog of mapInPandas: one
  * iterator per partition, vectorizable batch shape), and the downstream
  * relational plumbing over extracted features.
  *
  * The media "payloads" are synthesized deterministically from documents
  * (utf-8 bytes stand in for image bytes) so every metadata operator has a
  * DuckDB oracle; the stub feature extractor is oracle-less (rows-only
  * check) but spec-pinned (MultimodalSpec).
  *
  * Scale notes: payload bytes never reach a shuffle — metadata projections
  * prune the binary column (columnar parquet would store it in its own
  * chunk); decode runs map-side only; frame explode is a Generator, not a
  * join.
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

  def queries: Map[String, Q] = Map(
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

    "q_mm_features" -> ((s, d) =>
      // Stubbed decode via mapPartitions (rows-only check; spec-pinned).
      stubDecodeFeatures(media(s, d))
        .select(col("media_id"), col("media_type"),
                floor(element_at(col("features"), 1) * 1e6).cast("long")
                  .as("f0_e6"),
                size(col("features")).cast("long").as("n_feats"))
        .orderBy("media_id"))
  )

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

    "q_mm_frames" ->
      """SELECT media_id, n_frames, frame_idx FROM (
        |  SELECT doc_id AS media_id,
        |         CAST(n_chars % 30 + 1 AS BIGINT) AS n_frames,
        |         CAST(unnest(range(0, n_chars % 30 + 1)) AS BIGINT) AS frame_idx
        |  FROM documents)
        |WHERE frame_idx % 5 = 0
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
