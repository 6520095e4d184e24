package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{MediaCodecs, MinHash}

/** Multimodal column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * Decoders are real pure-JVM codecs ([[graft.core.MediaCodecs]]): 24-bit
  * BMP full decode (dimensions + 8x8 grayscale-thumbnail embedding), RIFF
  * PCM WAV decode (duration + 64-bin RMS energy embedding), PNG IHDR parse
  * (dimensions). Formats this container has no codec for (JPEG, video)
  * stay opaque: dimensions/duration 0 and a content-hash-derived embedding,
  * so the pipeline shape (schema, batching, determinism) is uniform across
  * kinds. Format is sniffed from magic bytes, not trusted from the `kind`
  * column — exactly what a production media pipeline does.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], source_url: String)
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Int,
      content_hash: Long, embedding: Array[Float])

  private def contentHash(bytes: Array[Byte]): Long = {
    var acc = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { acc = (acc ^ bytes(i)) * 0x100000001B3L; i += 1 }
    MinHash.mix64(acc)
  }

  /** Deterministic fallback embedding for formats without a codec here. */
  private def opaqueEmbedding(h: Long): Array[Float] = {
    val emb = Array.tabulate(64) { d =>
      val x = MinHash.mix64(h + d)
      (((x >>> 11).toDouble * 1.1102230246251565e-16).toFloat * 2f) - 1f
    }
    val norm = math.sqrt(emb.foldLeft(0.0)((s, v) => s + v.toDouble * v))
    emb.map(v => (v / norm).toFloat)
  }

  /** Decode one batch. Batched (not per-row) so a heavier codec or model
    * can amortize setup per `batchSize` items; these codecs are cheap but
    * the plan shape is the contract.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { m =>
    val h = contentHash(m.bytes)
    MediaCodecs.decodeBmp(m.bytes) match {
      case Some(img) =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length, img.width, img.height, 0,
          h, MediaCodecs.grayThumbnail(img))
      case None => MediaCodecs.decodeWav(m.bytes) match {
        case Some(wav) =>
          MediaFeatures(m.media_id, m.kind, m.bytes.length, 0, 0,
            MediaCodecs.durationMs(wav), h, MediaCodecs.energyProfile(wav))
        case None => MediaCodecs.parsePngHeader(m.bytes) match {
          case Some(png) =>
            MediaFeatures(m.media_id, m.kind, m.bytes.length, png.width, png.height, 0,
              h, opaqueEmbedding(h)) // header-only: no pixel pass
          case None =>
            MediaFeatures(m.media_id, m.kind, m.bytes.length, 0, 0, 0,
              h, opaqueEmbedding(h))
        }
      }
    }
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

  /** Deterministic synthetic media table with REAL file bytes: images are
    * encoded 24-bit BMPs (id-seeded gradient pixels), audio rows are PCM
    * WAVs (id-seeded sine mixes), video rows are opaque container-like
    * bytes (no video codec in scope). The spec decodes these back and
    * checks dimensions/duration/embeddings round-trip.
    */
  def generateMedia(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds((id % 3).toInt)
      val h = MinHash.mix64(seed ^ id)
      val bytes = kind match {
        case "image" =>
          val w = 8 + ((h >>> 8) % 25).toInt  // 8..32 px
          val hgt = 6 + ((h >>> 16) % 19).toInt // 6..24 px
          val rgb = new Array[Byte](w * hgt * 3)
          var i = 0
          while (i < w * hgt) {
            val x = i % w; val y = i / w
            rgb(i * 3) = ((x * 255 / math.max(1, w - 1)) ^ (h & 0x7f)).toByte
            rgb(i * 3 + 1) = ((y * 255 / math.max(1, hgt - 1)) ^ ((h >> 7) & 0x7f)).toByte
            rgb(i * 3 + 2) = ((x + y + (h >> 14)) & 0xff).toByte
            i += 1
          }
          MediaCodecs.encodeBmp(w, hgt, rgb)
        case "audio" =>
          val rate = 8000
          val nSamp = 400 + ((h >>> 9) % 3200).toInt // 50..450 ms at 8 kHz
          val f = 100.0 + ((h >>> 20) % 900)
          val samples = Array.tabulate(nSamp)(i =>
            (math.sin(2 * math.Pi * f * i / rate) * 12000).toShort)
          MediaCodecs.encodeWav(1, rate, samples)
        case _ =>
          val len = 256 + ((h >>> 9) % 4096).toInt
          val b = new Array[Byte](len)
          var x = MinHash.mix64(seed ^ (id * 31))
          var i = 0
          while (i < len) { x = MinHash.mix64(x); b(i) = (x >>> 17).toByte; i += 1 }
          b
      }
      MediaRow(id, kind, bytes, s"https://media.example/$kind/$id")
    }.toDF()
  }
}
