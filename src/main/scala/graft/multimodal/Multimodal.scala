package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, batched feature extraction over partitions.
  *
  * The Spark-side architecture is real — schema, partition-wise batched
  * iteration, feature array output. The actual media decoding is a
  * clearly-marked STUB (`decodeStub`): this container has no image/audio
  * codecs, so the decode step computes a deterministic fake feature
  * vector from the bytes. Swapping in a real decoder changes only that
  * one function; nothing in the surrounding plan.
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
