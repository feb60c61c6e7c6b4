package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with a typed metadata struct, processed in partition-batches.
  *
  * The Spark-side machinery — schema, batch iteration, partition layout,
  * feature-column contract — is real and tested; the actual media decode is
  * STUBBED (`decodeStub`) with a deterministic byte-level computation
  * because no image/audio codec libraries exist in this environment. A real
  * deployment swaps `decodeStub` for a JNI/codec call with the identical
  * `Iterator[Row] => Iterator[Row]` shape; nothing else changes.
  *
  * Scale notes: media bytes never leave their partition (mapPartitions, no
  * shuffle); metadata-only queries prune the binary column at the parquet
  * scan, which is the whole point of keeping bytes and metadata in separate
  * columns of one row rather than separate tables.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** Build a deterministic media table from the documents corpus: content =
    * md5-derived fake bytes (stands in for real image payloads). */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      unhex(md5(col("text"))).as("content"),
      struct(
        col("source").as("source"),
        col("n_chars").as("declared_bytes"),
        lit("fake/md5").as("format")).as("meta"))

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_mean", DoubleType, nullable = false),
    StructField("byte_max", IntegerType, nullable = false)))

  /** STUB decode: deterministic byte statistics standing in for
    * decode→resize→feature-extract. Batch shape (Iterator→Iterator per
    * partition) is exactly what a real codec integration uses. */
  def decodeStub(rows: Iterator[Row]): Iterator[Row] =
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      val tpe = r.getString(r.fieldIndex("media_type"))
      val bytes = r.getAs[Array[Byte]]("content")
      val unsigned = bytes.map(b => b & 0xff)
      Row(id, tpe, bytes.length,
        unsigned.sum.toDouble / bytes.length, unsigned.max)
    }

  /** Extract features partition-batch-wise; binary column is consumed here
    * and pruned from everything downstream. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "content").rdd
      .mapPartitions(decodeStub)
    spark.createDataFrame(rdd, featureSchema)
  }
}
