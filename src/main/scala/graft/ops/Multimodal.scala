package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata. At 100 TB
  * the payload column stays opaque to Spark (no decode in the scan path);
  * metadata lives in ordinary typed columns so filters/pruning work on it
  * without touching bytes. */
case class MediaRecord(id: Long, payload: Array[Byte], kind: String)

/** Output of the (stubbed) decoder. */
case class DecodedMedia(
    id: Long, byte_len: Int, width: Int, height: Int, channels: Int, feature: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * processed in partition-local batches.
  *
  * The decode itself is a STUB — image/audio libraries are not available in
  * this environment — but it is a deterministic fake, so the whole pipeline
  * (schema, encoders, partitioning, batch shape) is real and testable
  * end-to-end against a SQL oracle. A real deployment swaps `decodePayload`
  * for a native decoder call; the batching seam is exactly where a
  * vectorized/native library would take over a chunk of records at once.
  */
object Multimodal {

  /** Records handed to the decoder per call — sized so a native decoder
    * amortizes per-call overhead without holding a partition in memory. */
  val batchSize = 64

  /** STUB decoder: deterministic fake (dimensions derived from byte length,
    * feature = md5 prefix). Stands in for e.g. JPEG decode + embedding. */
  def decodePayload(payload: Array[Byte]): (Int, Int, Int, String) = {
    val len = payload.length
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString.take(8)
    (len % 640, (len * 7) % 480, 3, hex)
  }

  /** Batched decode over partitions: no shuffle, no driver involvement;
    * each partition streams through `grouped(batchSize)` chunks. */
  def decodeBatched(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, c, f) = decodePayload(r.payload)
          DecodedMedia(r.id, r.payload.length, w, h, c, f)
        }
      }
    }
  }

  /** Wrap a text table as fake media records (payload = utf-8 bytes). Used
    * by the driver queries since the testdata has no true binary columns. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "utf-8").as("payload"),
      lit("image").as("kind")
    ).as[MediaRecord]
  }
}
