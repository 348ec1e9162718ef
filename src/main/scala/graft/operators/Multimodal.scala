package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata; decode / feature
  * extraction runs per-partition over batches (the Scala analog of a
  * Pandas `mapInPandas` UDF — one iterator per partition so a real
  * decoder could amortize model/codec init across the batch).
  *
  * The decode itself is a DETERMINISTIC STUB (this container has no
  * image/audio codecs): byte length, md5 fingerprint, and fake
  * dimensions derived from the digest. The Spark-side contract —
  * schema, partitioning, batch iteration, typed output — is real and
  * tested; swap `decodeStub` for a codec call in production.
  */
object Multimodal {

  /** A media payload row: opaque bytes + source metadata. */
  case class MediaBlob(id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata (what a real decoder would emit: dimensions,
    * duration, fingerprint…).
    */
  case class DecodedMeta(id: Long, kind: String, n_bytes: Long,
      fingerprint: String, width: Int, height: Int)

  /** Deterministic fake decode of one payload. */
  def decodeStub(b: MediaBlob): DecodedMeta = {
    val md = MessageDigest.getInstance("MD5").digest(b.content)
    val hex = md.map("%02x".format(_)).mkString
    // fake dimensions from the first digest bytes — stands in for the
    // codec's real width/height until a decoder library is present
    val w = 64 + (((md(0) & 0xff) << 8 | (md(1) & 0xff)) % 1920)
    val h = 64 + (((md(2) & 0xff) << 8 | (md(3) & 0xff)) % 1080)
    DecodedMeta(b.id, b.kind, b.content.length.toLong, hex, w, h)
  }

  /** Partition-batched decode: one iterator per partition (codec init
    * once per partition, not per row).
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[DecodedMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter => iter.map(decodeStub) }
  }

  /** Build a MediaBlob dataset from any (id, kind, binary) DataFrame. */
  def asBlobs(df: DataFrame, idCol: String, kindCol: String,
      bytesCol: String): Dataset[MediaBlob] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("id"), col(kindCol).as("kind"),
      col(bytesCol).as("content")).as[MediaBlob]
  }
}
