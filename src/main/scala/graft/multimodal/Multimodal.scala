package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
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

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  /** STUB decode: derives fake (width, height, format) from the first two
    * payload bytes. A real deployment swaps `decodeBatch` for the codec
    * call (e.g. JNI image decode) — the Spark plumbing is unchanged. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Row] =
    batch.map { case (id, bytes) =>
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      val fmt = (b0 % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      }
      Row(id, bytes.length, 16 + b0 % 64, 16 + b1 % 64, fmt)
    }

  /** Attach a binary payload column (here: the UTF-8 text bytes stand in
    * for an image payload) and run the batched decode stub. */
  def decodeStub(docs: DataFrame, idCol: String, payloadCol: String,
                 batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol), col(payloadCol).cast("binary"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { rows =>
          decodeBatch(rows.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
        }
      }
    spark.createDataFrame(rdd, metaSchema)
  }
}
