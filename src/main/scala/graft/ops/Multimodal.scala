package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with decode / feature-extract as
  * partition-local batch functions.
  *
  * Image payloads decode for REAL through JDK ImageIO ([[ImageDecoder]]:
  * PNG/JPEG/GIF/BMP — the formats the JDK ships codecs for; header-only
  * reads, so metadata extraction never pays full pixel decode). Audio
  * payloads decode for real too: WAV/PCM headers parse with JDK-only
  * `javax.sound.sampled` ([[AudioDecoder]] — duration, channels, sample
  * rate; no codec jar involved). Video payloads, and bytes no installed
  * reader recognises, fall back to the clearly-marked [[StubDecoder]] —
  * this container ships no video codecs. Swap the stub for a codec (e.g.
  * JavaCV) without touching the pipeline: the contract is bytes-in,
  * metadata-out.
  *
  * Scale notes: decode is embarrassingly parallel; `mapPartitions` keeps
  * codec init per-partition (not per-row). Binary payloads should live in
  * their own parquet column so column pruning skips them when a query only
  * touches metadata.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, width: Long, height: Long, format: String)

  /** Real image decode via JDK ImageIO. Format detection is by magic
    * bytes (cheap, no reader probe for non-images); dimensions come from
    * the format reader's HEADER ONLY (`ImageReader.getWidth/getHeight`),
    * never a full `ImageIO.read` pixel decode — at training-data scale
    * metadata extraction must not decompress every image.
    */
  object ImageDecoder {
    /** Magic-byte sniff: PNG / JPEG / GIF / BMP (the JDK-shipped codecs). */
    def detectFormat(p: Array[Byte]): Option[String] =
      if (p.length < 4) None
      else if ((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') Some("png")
      else if ((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 && (p(2) & 0xFF) == 0xFF) Some("jpeg")
      else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') Some("gif")
      else if (p(0) == 'B' && p(1) == 'M') Some("bmp")
      else None

    def decode(payload: Array[Byte]): Option[(Long, Long, String)] =
      detectFormat(payload).flatMap { fmt =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Some((r.getWidth(0).toLong, r.getHeight(0).toLong, fmt))
            } catch { case _: java.io.IOException => None }
            finally r.dispose()
          }
        } finally iis.close()
      }
  }

  case class AudioMeta(doc_id: Long, duration_ms: Long, channels: Long,
                       sample_rate: Long, bits_per_sample: Long, encoding: String)

  /** Real audio header parsing via JDK `javax.sound.sampled` — no codec
    * jar needed for RIFF/WAVE (PCM, A-law, μ-law): `AudioSystem
    * .getAudioFileFormat` reads ONLY the header, never the sample data.
    * Magic-byte sniff first (`RIFF....WAVE`) so non-audio payloads never
    * pay a reader probe, mirroring [[ImageDecoder]].
    */
  object AudioDecoder {
    def isWav(p: Array[Byte]): Boolean =
      p.length >= 12 &&
        p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

    /** Full header parse. None when the bytes are not a readable WAV. */
    def decodeFull(payload: Array[Byte]): Option[AudioMeta] =
      if (!isWav(payload)) None
      else try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        val durationMs =
          if (frames >= 0 && fmt.getFrameRate > 0)
            math.round(frames * 1000.0 / fmt.getFrameRate)
          else -1L
        Some(AudioMeta(-1L, durationMs, fmt.getChannels.toLong,
          math.round(fmt.getSampleRate.toDouble),
          fmt.getSampleSizeInBits.toLong, fmt.getEncoding.toString))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

    /** The decode-chain slot: (duration ms, channels, "wav"). */
    def decode(payload: Array[Byte]): Option[(Long, Long, String)] =
      decodeFull(payload).map(m => (m.duration_ms, m.channels, "wav"))
  }

  /** SPI for pluggable audio/video decoders (same reflection pattern as
    * [[graft.transform.TransformModule]]): a codec jar implements this
    * with a no-arg constructor and is injected by CLASS NAME — the name
    * ships to executors and the instance is built once per partition, the
    * right place for expensive codec-context init. Return None for
    * payloads the decoder does not recognise so the chain can fall
    * through.
    */
  trait MediaDecoder {
    def decode(payload: Array[Byte]): Option[(Long, Long, String)]
  }

  /** STUB decoder — deterministic arithmetic on payload size standing in
    * for the VIDEO decode this container cannot ship (no video codecs
    * offline; images decode via ImageIO, WAV audio via javax.sound). The
    * terminal fallback of the decode chain; inject a real [[MediaDecoder]]
    * to take its place for recognised payloads.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Long, Long, String) = {
      val n = payload.length.toLong
      (n % 640, (n * 7) % 480, "stub")
    }
  }

  private def instantiateDecoder(className: String): MediaDecoder =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[MediaDecoder]

  /** Bytes-in, metadata-out: real ImageIO decode for recognised image
    * payloads, then JDK WAV header parsing, then the injected decoder
    * (if any), then the stub. A throwing plugin decoder (corrupt payload
    * behind recognised magic bytes — the same failure class the ImageIO
    * path guards) falls through instead of failing the job.
    */
  def decodeMeta(payload: Array[Byte],
                 custom: Option[MediaDecoder] = None): (Long, Long, String) =
    ImageDecoder.decode(payload)
      .orElse(AudioDecoder.decode(payload))
      .orElse(custom.flatMap { d =>
        try d.decode(payload)
        catch { case scala.util.control.NonFatal(_) => None }
      })
      .getOrElse(StubDecoder.decode(payload))

  /** Attach a binary payload column (here: utf-8 bytes of a text column —
    * the fixtures ship no real media; the pipeline does not care).
    */
  def withBinaryPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).cast("bigint").as("doc_id"),
      encode(col(srcCol), "UTF-8").as("payload"))

  case class ResizedMedia(doc_id: Long, payload: Array[Byte], width: Long,
                          height: Long, format: String)

  /** Resize image payloads to fit within (maxW, maxH), preserving aspect
    * ratio, re-encoded as PNG — the standard normalize-before-training
    * step, real end-to-end via JDK ImageIO. Non-image payloads pass
    * through untouched (format 'passthrough'). Partition-local batches,
    * no shuffle; at corpus scale this is the canonical mapPartitions
    * shape: CPU-bound, embarrassingly parallel, output column replaces
    * the input payload column.
    */
  def resizeImages(spark: SparkSession, withPayload: DataFrame,
                   maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          ImageDecoder.detectFormat(bytes) match {
            case Some(_) =>
              // ImageIO.read THROWS (not just returns null) on truncated
              // payloads with valid magic bytes — and plugin decoders throw
              // RuntimeExceptions (CMMException, IllegalArgumentException,
              // ArrayIndexOutOfBounds) on crafted/corrupt payloads; a corrupt
              // image must not fail the whole job, so every decode failure
              // becomes passthrough.
              val img =
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
                catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) ResizedMedia(id, bytes, -1, -1, "passthrough")
              else {
                val scale = math.min(
                  math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight), 1.0)
                val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
                  math.max(1, (img.getHeight * scale).toInt))
                val out = new java.awt.image.BufferedImage(w, h,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = out.createGraphics()
                try {
                  g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img, 0, 0, w, h, null)
                } finally g.dispose()
                val buf = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", buf)
                ResizedMedia(id, buf.toByteArray, w.toLong, h.toLong, "png")
              }
            case None => ResizedMedia(id, bytes, -1, -1, "passthrough")
          }
        }
      }
  }

  /** Decode a binary payload column into typed metadata via
    * partition-local batches. One narrow stage, no shuffle.
    * `decoderClass` injects an AV [[MediaDecoder]] by name (task config /
    * caller choice); only the NAME is captured by the closure, and the
    * instance is constructed once per partition — codec contexts are
    * expensive and must never be built per row (ImageIO's reader registry
    * is JVM-global, so the image path needs none).
    */
  /** Typed audio-metadata extraction: WAV payloads yield the full header
    * (duration/channels/sample rate/bit depth/encoding); anything else
    * yields encoding 'unknown' with -1 fields, preserving row identity so
    * the caller can filter or join back. Same partition-local shape as
    * [[extractMeta]] — header parse only, one narrow stage, no shuffle.
    */
  def extractAudioMeta(spark: SparkSession,
                       withPayload: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          AudioDecoder.decodeFull(bytes)
            .map(_.copy(doc_id = id))
            .getOrElse(AudioMeta(id, -1L, -1L, -1L, -1L, "unknown"))
        }
      }
  }

  def extractMeta(spark: SparkSession, withPayload: DataFrame,
                  decoderClass: Option[String] = None): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val custom = decoderClass.map(instantiateDecoder)
        it.map { case (id, bytes) =>
          val (w, h, f) = decodeMeta(bytes, custom)
          MediaMeta(id, w, h, f)
        }
      }
  }
}
