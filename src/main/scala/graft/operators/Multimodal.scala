package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal-column plumbing: media payloads as opaque binary columns with
  * typed metadata. The Spark side (schema, batching, partitioning) is real;
  * the codec is a clearly-marked deterministic stub — the actual image/audio
  * libraries are not in this container.
  */
object Multimodal {

  /** Declarative metadata extraction over a binary payload column.
    * "Decode" derives fake-but-deterministic dimensions from the content
    * hash (STUB for a real codec; plumbing and types are the real part).
    */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("hm", Hashing.h60(col("text")))
      .select(
        col("doc_id"),
        expr("octet_length(payload)").as("byte_len"),
        md5(col("payload")).as("content_hash"),
        // integer `div`, not `/` (long / long would widen to double)
        expr("CAST(64 + hm % 512 AS INT)").as("width"),
        expr("CAST(64 + (hm div 512) % 512 AS INT)").as("height"),
        expr("CAST(1 + hm % 8 AS INT)").as("n_frames"))

  final case class MediaBatch(doc_id: Long, payload: Array[Byte])
  final case class DecodedMedia(
      doc_id: Long, byte_len: Int, width: Int, height: Int, n_frames: Int)

  /** Batch decode via mapPartitions — the shape a real codec integration
    * takes (per-partition codec init, row-batch iteration). The decode body
    * is the same deterministic stub as binaryMeta.
    */
  def decodeBatched(spark: SparkSession, media: Dataset[MediaBatch]): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: initialize the (expensive) codec once per partition here
      it.map { m =>
        val h = Hashing.h60jvm(new String(m.payload, java.nio.charset.StandardCharsets.UTF_8))
        DecodedMedia(m.doc_id, m.payload.length,
          (64 + h % 512).toInt, (64 + (h / 512) % 512).toInt, (1 + h % 8).toInt)
      }
    }
  }
}
