package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.MinHash

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side shape is real (schema, partitioning, batched per-partition
  * execution, deterministic outputs); the *decoders* are STUBS — this
  * container ships no image/audio codecs, so `decodeStub` derives
  * deterministic fake properties from the bytes. Swap `decodeBatch` for a
  * real codec (e.g. JNI or a vectorized Arrow UDF) without touching the
  * plan shape.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], source_url: String)
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Int,
      content_hash: Long, embedding: Array[Float])

  /** STUB decoder: deterministic fake decode of one batch. A real
    * implementation would decode pixels/samples here; the batch shape
    * (amortized setup per `batchSize` items) is what matters for the plan.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { m =>
    val h = {
      var acc = 0xCBF29CE484222325L
      var i = 0
      while (i < m.bytes.length) { acc = (acc ^ m.bytes(i)) * 0x100000001B3L; i += 1 }
      MinHash.mix64(acc)
    }
    // fake dimensions/duration derived from content (deterministic stand-in)
    val dim = 64 + ((h >>> 8) % 1024).toInt
    val emb = Array.tabulate(64) { d =>
      val x = MinHash.mix64(h + d)
      (((x >>> 11).toDouble * 1.1102230246251565e-16).toFloat * 2f) - 1f
    }
    val norm = math.sqrt(emb.map(v => v.toDouble * v).sum)
    val nemb = emb.map(v => (v / norm).toFloat)
    MediaFeatures(m.media_id, m.kind, m.bytes.length,
      width = if (m.kind == "image") dim else 0,
      height = if (m.kind == "image") dim / 2 else 0,
      duration_ms = if (m.kind != "image") ((h >>> 16) % 300000).toInt else 0,
      content_hash = h, embedding = nemb)
  }

  /** Batched per-partition feature extraction over the media table.
    * mapPartitions (not per-row UDF) so a real decoder can amortize model /
    * codec setup per task and process `batchSize` items vectorized.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "bytes", "source_url").as[MediaRow]
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatch))
      .toDF()
  }

  /** Deterministic synthetic media table (bytes derived from ids) — the
    * generator counterpart for specs/benchmarks.
    */
  def generateMedia(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds((id % 3).toInt)
      val len = 256 + ((MinHash.mix64(seed ^ id) >>> 9) % 4096).toInt
      val bytes = new Array[Byte](len)
      var h = MinHash.mix64(seed ^ (id * 31))
      var i = 0
      while (i < len) { h = MinHash.mix64(h); bytes(i) = (h >>> 17).toByte; i += 1 }
      MediaRow(id, kind, bytes, s"https://media.example/$kind/$id")
    }.toDF()
  }
}
