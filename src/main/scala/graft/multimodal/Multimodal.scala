package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal binary-column plumbing (SURVEY §2 F4).
  *
  * Real pipelines carry image/audio/video as opaque `binary` columns with
  * typed metadata and run batched decode/feature-extraction per partition.
  * The image/audio codecs are NOT in this container, so the decode itself
  * is a clearly-marked deterministic fake — but everything Spark-level is
  * real: the schema, the `mapPartitions` batching shape (decode libraries
  * amortize per-batch setup), and the partition-local execution (no
  * driver-side collect, no shuffle).
  */
object Multimodal {

  /** Typed decode output — the `Dataset[BinaryMeta]` encoder keeps the
    * whole decode inside Catalyst (DeserializeToObject → MapPartitions →
    * SerializeFromObject), unlike an RDD round-trip which would detach the
    * stage from the optimizer and codegen. */
  final case class BinaryMeta(doc_id: Long, n_bytes: Int, width: Int,
                              height: Int, format: String)

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  /** STUB decode: derives fake (width, height, format) from the first two
    * payload bytes. A real deployment swaps `decodeBatch` for the codec
    * call (e.g. JNI image decode) — the Spark plumbing is unchanged. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[BinaryMeta] =
    batch.map { case (id, bytes) =>
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      val fmt = (b0 % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      }
      BinaryMeta(id, bytes.length, 16 + b0 % 64, 16 + b1 % 64, fmt)
    }

  /** Attach a binary payload column (here: the UTF-8 text bytes stand in
    * for an image payload) and run the batched decode stub as a typed
    * `Dataset.mapPartitions` — partition-local, batched, and still a
    * Catalyst plan node. */
  def decodeStub(docs: DataFrame, idCol: String, payloadCol: String,
                 batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
      .toDF()
  }

  /** Typed resize output: payload re-encoded at target dims (stub), with
    * before/after sizes for the shrink-audit downstream. */
  final case class Resized(doc_id: Long, width: Int, height: Int,
                           n_bytes_in: Int, n_bytes_out: Int, payload: Array[Byte])

  /** STUB resize: scales the payload length by the dim ratio (area-
    * proportional truncation) — a real deployment swaps `resizeBatch` for
    * the codec's scaler; the batching, schema, and partition-local shape
    * are the deliverable. Deterministic: output bytes are a prefix. */
  private def resizeBatch(targetW: Int, targetH: Int)(
      batch: Seq[(Long, Array[Byte])]): Seq[Resized] =
    batch.map { case (id, bytes) =>
      val meta = decodeBatch(Seq((id, bytes))).head
      val ratio = math.min(1.0,
        (targetW.toDouble * targetH) / math.max(1, meta.width * meta.height))
      val outLen = math.max(1, math.min(bytes.length, (bytes.length * ratio).toInt))
      Resized(id, targetW, targetH, bytes.length, outLen,
        java.util.Arrays.copyOf(bytes, outLen))
    }

  /** Batched resize over a binary column — same typed-`mapPartitions`
    * plumbing as [[decodeStub]] (codec batching is the one legitimate
    * mapPartitions use; everything else here stays declarative). */
  def resizeStub(docs: DataFrame, idCol: String, payloadCol: String,
                 targetW: Int, targetH: Int, batchSize: Int = 64): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(resizeBatch(targetW, targetH)))
      .toDF()
  }

  /** Frame sampling over a fixed-frame binary payload (the video analog):
    * slice the blob into `frameBytes`-sized frames and keep every
    * `everyK`-th — the standard decimation step before a video corpus is
    * feature-extracted. Unlike codec decode (which needs `mapPartitions`
    * batching, see [[decodeStub]]), fixed-size slicing is pure offset
    * arithmetic, so it stays DECLARATIVE: `sequence` of sampled frame
    * indices → `substring` slices inside a `transform` → `posexplode` —
    * whole-stage codegen end to end, narrow (no shuffle), and the
    * per-row output is bounded by payload size / (frameBytes·everyK).
    * Trailing partial frames are dropped (floor semantics). */
  def frameSample(docs: DataFrame, idCol: String, payloadCol: String,
                  frameBytes: Int, everyK: Int): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(payloadCol).cast("binary").as("__p"),
        floor(length(col(payloadCol).cast("binary")) / frameBytes).as("__nf"))
      .filter(col("__nf") > 0)
      .select(col("doc_id"), expr(
        s"""posexplode(transform(sequence(0L, __nf - 1, ${everyK}L),
           |  i -> substring(__p, CAST(i * $frameBytes + 1 AS INT), $frameBytes)))"""
          .stripMargin).as(Seq("__s", "frame")))
      .select(col("doc_id"),
        (col("__s") * everyK).cast("long").as("frame_no"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_sig"))
  }
}
