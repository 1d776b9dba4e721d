package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, batched feature extraction over partitions.
  *
  * The Spark-side architecture is real — schema, partition-wise batched
  * iteration, feature array output. Two decoders plug into the same
  * `mapPartitions` seam: [[decodeImage]] is a REAL image decoder (the
  * JDK's ImageIO — PNG/BMP/GIF need no external codecs), and
  * [[decodeStub]] is the clearly-marked deterministic stand-in for
  * modalities whose codecs this container lacks (audio/video).
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
