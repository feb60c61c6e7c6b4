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
  * Image AND audio decode are REAL: image rows carry a genuine PNG
  * (encoded partition-locally from a deterministic md5-derived pixel
  * payload) decoded with the JDK's `javax.imageio`; audio rows carry a
  * genuine WAV container (16-bit PCM mono built from the same md5
  * payload) decoded with the JDK's `javax.sound.sampled` — format,
  * channel count, sample rate and frame count all come from the real
  * container parse, and the sample statistics from the decoded PCM.
  * Because both payloads are md5-derived, the DuckDB oracle computes the
  * expected statistics directly from the hash — so an exact oracle
  * validates both encode → container → decode round trips. Video decode
  * stays a deterministic byte-stat stub (the JDK ships no video codecs);
  * a real deployment swaps that branch for a codec call with the
  * identical `Iterator[Row] => Iterator[Row]` shape.
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

  /** Audio geometry of the synthesized WAVs: 16 frames of 16-bit signed
    * PCM, mono, 8 kHz — one frame per md5 byte, sample = (byte − 128)·256
    * (the byte re-centered to signed and scaled to 16-bit range). */
  val WavFrames = 16
  val WavRate = 8000

  /** Encode 16 payload bytes as a real WAV container (RIFF header +
    * little-endian 16-bit PCM data), built by hand so the bytes are
    * deterministic down to the header — the DECODE side goes through
    * `javax.sound.sampled`'s actual parser. */
  def encodeWav(payload: Array[Byte]): Array[Byte] = {
    require(payload.length == WavFrames, s"payload must be $WavFrames bytes")
    val dataLen = WavFrames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(WavRate)
      .putInt(WavRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    payload.foreach(b => bb.putShort((((b & 0xff) - 128) * 256).toShort))
    bb.array()
  }

  /** Build a deterministic media table from the documents corpus: image
    * rows carry a real PNG whose pixels are the md5 digest of the text;
    * audio rows a real WAV whose PCM samples derive from the same digest;
    * video rows the raw digest bytes (stub — no JDK video codec). */
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
      val content = tpe match {
        case "image" => encodePng(payload)
        case "audio" => encodeWav(payload)
        case _ => payload
      }
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
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("px_mean", DoubleType, nullable = false),
    StructField("px_max", IntegerType, nullable = false)))

  /** Per-row decode: images through `javax.imageio` (real PNG parse →
    * raster samples), audio through `javax.sound.sampled` (real RIFF/WAV
    * parse → PCM samples; channels/rate/frames come from the container's
    * format, never assumed), video through the byte-stat stub. Batch
    * shape (Iterator→Iterator per partition) is exactly what a codec
    * integration uses. */
  def decodeBatch(rows: Iterator[Row]): Iterator[Row] =
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      val tpe = r.getString(r.fieldIndex("media_type"))
      val bytes = r.getAs[Array[Byte]]("content")
      tpe match {
        case "image" =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          val (w, h, bands) = (img.getWidth, img.getHeight, img.getRaster.getNumBands)
          val samples = for { y <- 0 until h; x <- 0 until w; b <- 0 until bands }
            yield img.getRaster.getSample(x, y, b)
          Row(id, tpe, bytes.length, w, h, bands, null, null,
            samples.sum.toDouble / samples.length, samples.max)
        case "audio" =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
            s"unexpected PCM layout: $fmt")
          val frames = ais.getFrameLength.toInt
          val data = ais.readAllBytes()
          val samples = (0 until frames * fmt.getChannels).map(i =>
            ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toInt)
          Row(id, tpe, bytes.length, null, null, fmt.getChannels,
            fmt.getSampleRate.toInt, frames,
            samples.sum.toDouble / samples.length, samples.max)
        case _ =>
          val unsigned = bytes.map(b => b & 0xff)
          Row(id, tpe, bytes.length, null, null, null, null, null,
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
