package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, batched feature extraction over partitions.
  *
  * The Spark-side architecture is real — schema, partition-wise batched
  * iteration, feature array output. Three decoders plug into the same
  * `mapPartitions` seam: [[decodeImage]] is a REAL image decoder (the
  * JDK's ImageIO — PNG/BMP/GIF need no external codecs), [[decodeAudio]]
  * is a REAL audio decoder (the JDK's `javax.sound.sampled` — WAV/AIFF/
  * AU PCM), and [[decodeStub]] is the clearly-marked deterministic
  * stand-in for the modality whose codecs this container lacks (video).
  * Swapping decoders changes only that one function; nothing in the
  * surrounding plan.
  */
object Multimodal {

  /** Wrap a text column as a binary payload + metadata (the lake-side
    * shape media columns would have: modality tag, byte length,
    * checksum for integrity).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text").as("modality"),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        md5(col(textCol)).as("checksum")).as("meta"))

  case class MediaRow(id: Long, payload: Array[Byte])
  case class MediaFeatures(id: Long, n_bytes: Int, features: Array[Float])

  /** STUB decode/feature-extract: stands in for an image/audio decoder
    * (not available in this environment). Deterministic per payload so
    * the surrounding pipeline is testable: an 8-dim "embedding" of byte
    * histograms. Partition-batched like a real vectorized decoder would
    * be — this is the `mapPartitions` seam where a JNI/codec call or a
    * Pandas-UDF-style batch decoder plugs in.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val hist = new Array[Float](8)
          r.payload.foreach(b => hist((b & 0xFF) % 8) += 1f)
          val n = math.max(r.payload.length, 1)
          MediaFeatures(r.id, r.payload.length, hist.map(_ / n))
        }
      }
  }

  /** REAL image decode through the JDK's ImageIO (PNG, BMP, GIF, JPEG —
    * no external codecs required, headless-safe): per image an 8-bin
    * luminance histogram normalized by pixel count — the same output
    * shape as [[decodeStub]], so the two are drop-in interchangeable in
    * [[featurize]]. Luminance uses the integer Rec.601 weights
    * (299/587/114 per mille) so the features are bit-deterministic
    * across JVMs. A payload ImageIO cannot decode yields an EMPTY
    * feature array rather than failing the partition — at 100 TB a
    * corrupt blob is data, not an exception; filter on
    * `size(features) = 0` to quarantine.
    */
  def decodeImage(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case _: java.io.IOException => null }
          if (img == null) MediaFeatures(r.id, r.payload.length, Array.empty[Float])
          else {
            val hist = new Array[Float](8)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                  (rgb & 0xFF) * 114) / 1000
                hist(lum * 8 / 256) += 1f
                x += 1
              }
              y += 1
            }
            val n = img.getWidth.toLong * img.getHeight
            MediaFeatures(r.id, r.payload.length, hist.map(_ / n))
          }
        }
      }
  }

  /** REAL audio decode through the JDK's `javax.sound.sampled` (WAV/
    * AIFF/AU PCM — no external codecs, headless-safe): the stream is
    * normalized to 16-bit signed PCM, folded to mono by channel
    * averaging, and summarized as the same 8-float feature shape the
    * other decoders emit:
    *
    *   [0..3] per-time-quarter RMS (energy envelope),
    *   [4]    zero-crossing fraction (crude pitch/noisiness),
    *   [5]    peak |amplitude|,
    *   [6]    duration in seconds,
    *   [7]    source channel count.
    *
    * All amplitudes are normalized by 32768 (full-scale 16-bit), and
    * the accumulation is integer/long until the final divisions, so
    * features are deterministic across JVMs. An undecodable payload
    * yields an EMPTY feature array ([[decodeImage]]'s quarantine
    * convention) — corrupt blobs are data, not exceptions.
    */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        rows.map { r =>
          // The whole decode runs under the quarantine try: a malformed
          // header discovered mid-stream (or any codec surprise) yields
          // the empty-features row, never a task failure.
          val feats =
            try {
              val in = AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(r.payload))
              val f = in.getFormat
              val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
                f.getSampleRate, 16, f.getChannels,
                f.getChannels * 2, f.getSampleRate, false)
              val pcm = AudioSystem.getAudioInputStream(target, in)
              val ch = target.getChannels
              val frameBytes = 2 * ch
              // Total frames up front (WAV/AIFF/AU headers carry it) so
              // the time-quarter of each frame is known while STREAMING
              // through fixed-size buffers — per-row memory is the 64 KiB
              // buffer, never the decoded stream (readAllBytes on an
              // hours-long blob would allocate gigabytes per row).
              val nFrames = pcm.getFrameLength
              if (nFrames <= 0) Array.empty[Float]
              else {
                val sumSq = new Array[Long](4)
                val qLen = new Array[Long](4)
                var crossings = 0L
                var peak = 0L
                var prevSign = 0
                var i = 0L
                val buf = new Array[Byte](65536 - 65536 % frameBytes)
                var carry = 0 // bytes of an incomplete frame held over
                var read = pcm.read(buf, carry, buf.length - carry)
                while (read > 0 && i < nFrames) {
                  val avail = carry + read
                  val full = avail / frameBytes
                  var fr = 0
                  while (fr < full && i < nFrames) {
                    var acc = 0L
                    var c = 0
                    while (c < ch) {
                      val o = fr * frameBytes + c * 2
                      acc += ((buf(o) & 0xFF) | (buf(o + 1) << 8)).toShort
                      c += 1
                    }
                    val s = acc / ch
                    // long division: i*4 would overflow Int past 2^29 frames
                    val q = (i * 4 / nFrames).toInt
                    sumSq(q) += s * s
                    qLen(q) += 1
                    if (math.abs(s) > peak) peak = math.abs(s)
                    val sign = java.lang.Long.signum(s).toInt
                    if (sign != 0) {
                      if (prevSign != 0 && sign != prevSign) crossings += 1
                      prevSign = sign
                    }
                    fr += 1
                    i += 1
                  }
                  carry = avail - full * frameBytes
                  if (carry > 0)
                    System.arraycopy(buf, full * frameBytes, buf, 0, carry)
                  read = pcm.read(buf, carry, buf.length - carry)
                }
                if (i == 0L) Array.empty[Float]
                else {
                  val out = new Array[Float](8)
                  var q = 0
                  while (q < 4) {
                    out(q) =
                      if (qLen(q) == 0) 0f
                      else (math.sqrt(sumSq(q).toDouble / qLen(q)) / 32768.0).toFloat
                    q += 1
                  }
                  out(4) = (crossings.toDouble / i).toFloat
                  out(5) = (peak / 32768.0).toFloat
                  out(6) = (i / target.getSampleRate.toDouble).toFloat
                  out(7) = ch.toFloat
                  out
                }
              }
            } catch { case _: Exception => Array.empty[Float] }
          MediaFeatures(r.id, r.payload.length, feats)
        }
      }
  }

  case class ResizedMedia(id: Long, width: Int, height: Int, payload: Array[Byte])
  case class FrameRow(id: Long, frame_idx: Int, frame: Array[Byte])

  /** REAL image resize (JDK only): decode via ImageIO, scale with
    * integer nearest-neighbor — `src(x·W/w, y·H/h)` — and re-encode as
    * PNG. Nearest-neighbor deliberately, not Graphics2D interpolation:
    * the integer index math is bit-deterministic across JVMs and
    * platforms, which makes resized training corpora reproducible (and
    * spec-checkable pixel-exactly). Undecodable payloads quarantine as
    * a 0×0 row with an empty payload.
    */
  def resizeImage(spark: SparkSession, media: DataFrame,
                  w: Int, h: Int): Dataset[ResizedMedia] = {
    require(w > 0 && h > 0, s"target size must be positive, got ${w}x$h")
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case _: java.io.IOException => null }
          if (img == null) ResizedMedia(r.id, 0, 0, Array.empty[Byte])
          else {
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                // long index math: x * srcWidth overflows Int when
                // upscaling wide images to very large targets
                out.setRGB(x, y,
                  img.getRGB((x.toLong * img.getWidth / w).toInt,
                    (y.toLong * img.getHeight / h).toInt))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedMedia(r.id, w, h, bos.toByteArray)
          }
        }
      }
  }

  /** The deterministic frame-container format the video seam uses while
    * this environment lacks real video codecs: magic "GFV0", 4-byte BE
    * frame count, then per frame a 4-byte BE length + the frame bytes
    * (any image format ImageIO can decode). [[packFrames]] builds it;
    * [[sampleFrames]] parses it. Swapping in a real demuxer changes
    * only the parse step — the sampling plumbing, schema, and per-frame
    * decode are the real thing.
    */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GFV0")
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    bos.toByteArray
  }

  /** REAL frame sampling: parse the container, keep every `every`-th
    * frame (a training pipeline never featurizes all ~30 fps), one
    * output row per kept frame — the explode shape downstream
    * per-frame decode ([[decodeImage]]) consumes directly. Malformed
    * containers (bad magic, truncated frame, negative length) yield
    * zero rows — quarantine by absence; anti-join against the input to
    * list them. Pure per-row narrow work, no shuffle.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   every: Int): Dataset[FrameRow] = {
    require(every > 0, s"sampling interval must be positive, got $every")
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          try {
            val in = new java.io.DataInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            val magic = new Array[Byte](4)
            in.readFully(magic)
            if (!java.util.Arrays.equals(magic, "GFV0".getBytes("US-ASCII")))
              Iterator.empty
            else {
              val n = in.readInt()
              if (n < 0) Iterator.empty
              else {
                // parse eagerly so a truncated tail quarantines the
                // WHOLE container (partial frames are worse than none)
                val frames = (0 until n).map { _ =>
                  val len = in.readInt()
                  // bound by the bytes actually present: a corrupt
                  // length field must quarantine, not attempt a
                  // multi-GB allocation (OOM is an Error — it would
                  // sail past the IOException catch and kill the task)
                  if (len < 0 || len > in.available())
                    throw new java.io.IOException(s"bad frame length $len")
                  val f = new Array[Byte](len)
                  in.readFully(f)
                  f
                }
                frames.zipWithIndex.collect {
                  case (f, i) if i % every == 0 => FrameRow(r.id, i, f)
                }.iterator
              }
            }
          } catch { case _: java.io.IOException => Iterator.empty }
        }
      }
  }

  /** Synthesize a 16-bit little-endian PCM WAV payload — the fixture
    * generator for audio queries/specs (deterministic bytes, so decoded
    * features are closed-form predictable).
    */
  def pcmWav(samples: Array[Short], channels: Int, sampleRate: Float): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate, 16,
      channels, channels * 2, sampleRate, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** End-to-end media pipeline: binary wrap → batched decode →
    * features table keyed by id (join-ready with the source table).
    */
  def featurize(spark: SparkSession, df: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val media = attachBinary(df, idCol, textCol)
      .select(col(idCol).as("id"), col("payload"), col("meta"))
    decodeStub(spark, media).toDF()
  }
}
