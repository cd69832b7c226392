package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary with typed
  * metadata, plus the decode / feature-extract / resize / frame-sample
  * plumbing a training pipeline needs.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are clearly-marked DETERMINISTIC STUBS operating on a
  * synthetic container format; everything Spark-side — schema, batched
  * per-partition execution (the Scala analog of mapInPandas: one init per
  * partition, fixed-size batches through the kernel), partitioning — is
  * real and tested.
  *
  * Synthetic container header (16 bytes, big-endian):
  *   magic "GRFT" | kind byte (0=image,1=audio,2=video) | width u16 |
  *   height u16 | frames u16 | payload bytes...
  */
object Multimodal {

  final case class MediaRow(media_id: Long, doc_id: Long, kind: String,
      payload: Array[Byte])
  final case class MediaMeta(media_id: Long, doc_id: Long, kind: String,
      width: Int, height: Int, frames: Int, payload_bytes: Int)
  final case class MediaFeature(media_id: Long, kind: String,
      feature: Array[Float])
  final case class FrameSample(media_id: Long, frame_idx: Int,
      frame_hash: Long)

  final val Magic = Array[Byte]('G', 'R', 'F', 'T')
  final val BatchSize = 64 // the mapInPandas batch-size analog

  /** Deterministic synthetic media corpus builder. */
  def synthCorpus(spark: SparkSession, n: Int, seed: Long = 13L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rnd = new scala.util.Random(seed + i)
      val kind = (i % 3).toInt
      val w = 8 + rnd.nextInt(24); val h = 8 + rnd.nextInt(24)
      val frames = if (kind == 2) 4 + rnd.nextInt(12) else 1
      val payloadLen = 32 + rnd.nextInt(96)
      val bb = java.nio.ByteBuffer.allocate(16 + payloadLen)
      bb.put(Magic).put(kind.toByte)
        .putShort(w.toShort).putShort(h.toShort).putShort(frames.toShort)
      bb.position(16)
      val payload = new Array[Byte](payloadLen); rnd.nextBytes(payload)
      bb.put(payload)
      MediaRow(i, i / 4, Seq("image", "audio", "video")(kind), bb.array())
    }
  }

  /** STUB decode: parse the synthetic header. A real deployment would call
    * an image/audio codec here; the per-partition batched shape is what a
    * decoder needs (amortized init, bounded memory per batch). */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] =
    batch.map { m =>
      val bb = java.nio.ByteBuffer.wrap(m.payload)
      val magic = new Array[Byte](4); bb.get(magic)
      require(magic.sameElements(Magic), s"bad media container for ${m.media_id}")
      val kind = bb.get()
      MediaMeta(m.media_id, m.doc_id, Seq("image", "audio", "video")(kind),
        bb.getShort(), bb.getShort(), bb.getShort(), m.payload.length - 16)
    }

  /** Decode metadata, batched per partition (mapInPandas-shaped). */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one-time per-partition "codec init" would go here (O7 analog)
      it.grouped(BatchSize).flatMap(decodeBatch)
    }
  }

  /** STUB feature extraction: 16-dim deterministic pseudo-embedding from a
    * rolling hash over the payload (stands in for a vision/audio model;
    * batch shape identical to a real model's). */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val f = new Array[Float](16)
        var h = 0xcbf29ce4L
        var i = 16
        while (i < m.payload.length) {
          h = h * 1000003L + (m.payload(i) & 0xff)
          f(i % 16) += ((h % 1000L).toFloat / 1000.0f)
          i += 1
        }
        MediaFeature(m.media_id, m.kind, f)
      })
    }
  }

  /** STUB frame sampling for video payloads: every `stride`-th frame index
    * with a deterministic frame hash (flatMap — one row per sampled frame). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val bb = java.nio.ByteBuffer.wrap(m.payload)
      bb.position(9)
      val frames = bb.getShort(9).toInt
      if (m.kind != "video") Iterator.empty
      else (0 until frames by stride).iterator.map { f =>
        FrameSample(m.media_id, f,
          graft.functions.RollingHash64.hash(m.payload) + f)
      }
    }
  }

  /** Typed-metadata projection as a DataFrame op (media_ref join surface
    * for the docs table's media spans). */
  def metaFrame(media: Dataset[MediaRow]): DataFrame =
    decodeMeta(media).toDF()
      .withColumn("aspect_milli", // integral: Column./ is double division
        floor(col("width") * 1000L / greatest(col("height"), lit(1))).cast("long"))
}
