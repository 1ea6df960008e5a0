package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (extension layer, SURVEY.md §7.3): image/audio/
 * video payloads are opaque `binary` columns with typed metadata beside
 * them. The Spark-side mechanics — schema, partition-parallel batch
 * processing via `mapPartitions`, bounded memory per task — are real and
 * tested; the actual codec step is STUBBED (no image/audio libraries in
 * this container) with a clearly-marked deterministic fake.
 */
object Multimodal {

  /** Canonical multimodal record: payload + sidecar metadata. */
  final case class MediaRecord(
      doc_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      declared_w: Int, // metadata as declared upstream (may be 0/unknown)
      declared_h: Int)

  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      byte_len: Long,
      feature: Array[Float]) // decoded feature vector (stub)

  /** Synthesize a multimodal table from `documents` (texts as fake
    * payloads) — deterministic, schema-faithful stand-in for a real
    * binary-column table. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      (col("doc_id") % 640 + 1).cast("int").as("declared_w"),
      (col("doc_id") % 480 + 1).cast("int").as("declared_h"))

  /** Pure-column metadata extraction over the binary payload: length,
    * content digest, magic-prefix — pushdown/codegen friendly, no UDF. */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("modality"),
      length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("digest"),
      lower(hex(substring(col("payload"), 1, 4))).as("magic_hex"))

  /**
   * ===== STUB DECODE =====
   * Deterministic fake "decode": real code would call an image/audio codec
   * here (e.g. javax.imageio / ffmpeg bindings) inside the same
   * mapPartitions shape — one codec context per partition, streaming
   * through the iterator, never materializing the partition.
   * The fake maps the first 8 payload bytes to a feature vector in [0,1).
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < 8) {
      out(i) = (if (i < payload.length) (payload(i) & 0xff) else 0) / 256.0f
      i += 1
    }
    out
  }

  /** Partition-parallel decode: `mapPartitions` so per-partition codec
    * setup is amortized; input stays an iterator (constant memory). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition codec init would go here
      it.map { r =>
        MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
          decodeStub(r.payload))
      }
    }
  }

  /**
   * ===== STUB RESIZE =====
   * Deterministic fake "resize" to target dimensions: real code would
   * decode, scale, and re-encode inside the same mapPartitions shape.
   * The fake keeps every `stride`-th byte where stride preserves the
   * target/declared pixel ratio — schema and batch mechanics are real.
   */
  def resizeStub(payload: Array[Byte], declaredW: Int, declaredH: Int,
                 targetW: Int, targetH: Int): Array[Byte] = {
    val declared = math.max(declaredW * declaredH, 1).toLong
    val target = math.max(targetW * targetH, 1).toLong
    if (target >= declared || payload.isEmpty) return payload
    val keep = math.max((payload.length * target / declared).toInt, 1)
    val out = new Array[Byte](keep)
    var i = 0
    while (i < keep) {
      out(i) = payload((i.toLong * payload.length / keep).toInt)
      i += 1
    }
    out
  }

  /** Partition-parallel resize of image-modality rows to a bounding box;
    * non-image rows pass through untouched. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        if (r.modality != "image") r
        else MediaRecord(r.doc_id, r.modality,
          resizeStub(r.payload, r.declared_w, r.declared_h, targetW, targetH),
          math.min(r.declared_w, targetW), math.min(r.declared_h, targetH))
      }
    }
  }

  /** Frame sampling for video-like payloads: split the payload into
    * `frames` fixed-size chunks, one output row per chunk — pure column
    * algebra (posexplode over substrings), fully distributed. */
  def frameSample(media: DataFrame, frames: Int): DataFrame = {
    val chunk = ceil(length(col("payload")).cast("double") / frames).cast("int")
    media
      .select(col("doc_id"), col("modality"), col("payload"), chunk.as("chunk"))
      .filter(col("chunk") > 0)
      .select(col("doc_id"), col("modality"),
        posexplode(expr(s"transform(sequence(0, $frames - 1)," +
          " f -> substring(payload, f * chunk + 1, chunk))")))
      .toDF("doc_id", "modality", "frame_no", "frame_bytes")
      .filter(length(col("frame_bytes")) > 0)
  }
}
