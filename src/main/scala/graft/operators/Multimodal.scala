package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with a typed metadata struct, processed in partition-batches.
  *
  * Image decode is REAL: `content` for image rows is a genuine PNG (encoded
  * partition-locally from a deterministic md5-derived pixel payload) and
  * [[extractFeatures]] decodes it with the JDK's `javax.imageio`, emitting
  * width/height/channel-count and pixel statistics. Because the pixel
  * source is md5-derived, the DuckDB oracle can compute the expected
  * statistics directly from the hash — so an exact oracle validates the
  * whole encode → PNG container → decode round trip. Audio/video decode
  * stays a deterministic byte-stat stub (no audio/video codecs in the JDK);
  * a real deployment swaps that branch for a codec call with the identical
  * `Iterator[Row] => Iterator[Row]` shape.
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

  /** Pixel geometry of the synthesized PNGs: 4×4 8-bit grayscale — exactly
    * the 16 bytes of an md5 digest, one byte per pixel. */
  val PngW = 4
  val PngH = 4

  /** Encode 16 payload bytes as a real 4×4 grayscale PNG. */
  def encodePng(payload: Array[Byte]): Array[Byte] = {
    require(payload.length == PngW * PngH, s"payload must be ${PngW * PngH} bytes")
    val img = new BufferedImage(PngW, PngH, BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < payload.length) {
      img.getRaster.setSample(i % PngW, i / PngW, 0, payload(i) & 0xff)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Build a deterministic media table from the documents corpus: image
    * rows carry a real PNG whose pixels are the md5 digest of the text;
    * audio/video rows carry the raw digest bytes. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val base = docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      unhex(md5(col("text"))).as("payload"),
      struct(
        col("source").as("source"),
        col("n_chars").as("declared_bytes"),
        lit("fake/md5").as("format")).as("meta"))
    val rdd = base.rdd.mapPartitions(_.map { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val tpe = r.getString(r.fieldIndex("media_type"))
      val content = if (tpe == "image") encodePng(payload) else payload
      Row(r.getLong(r.fieldIndex("media_id")), tpe, content, r.getAs[Row]("meta"))
    })
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("px_mean", DoubleType, nullable = false),
    StructField("px_max", IntegerType, nullable = false)))

  /** Per-row decode: images through `javax.imageio` (real PNG parse →
    * raster samples), audio/video through the byte-stat stub. Batch shape
    * (Iterator→Iterator per partition) is exactly what a codec integration
    * uses. */
  def decodeBatch(rows: Iterator[Row]): Iterator[Row] =
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      val tpe = r.getString(r.fieldIndex("media_type"))
      val bytes = r.getAs[Array[Byte]]("content")
      if (tpe == "image") {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        val (w, h, bands) = (img.getWidth, img.getHeight, img.getRaster.getNumBands)
        val samples = for { y <- 0 until h; x <- 0 until w; b <- 0 until bands }
          yield img.getRaster.getSample(x, y, b)
        Row(id, tpe, bytes.length, w, h, bands,
          samples.sum.toDouble / samples.length, samples.max)
      } else {
        val unsigned = bytes.map(b => b & 0xff)
        Row(id, tpe, bytes.length, null, null, null,
          unsigned.sum.toDouble / unsigned.length, unsigned.max)
      }
    }

  /** Extract features partition-batch-wise; the binary column is consumed
    * here and pruned from everything downstream. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "content").rdd
      .mapPartitions(decodeBatch)
    spark.createDataFrame(rdd, featureSchema)
  }
}
