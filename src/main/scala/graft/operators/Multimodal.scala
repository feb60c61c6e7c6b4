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
  * Image, audio AND video decode are REAL container round trips: image
  * rows carry a genuine PNG (encoded partition-locally from a
  * deterministic md5-derived pixel payload) decoded with the JDK's
  * `javax.imageio`; audio rows carry a genuine WAV container (16-bit PCM
  * mono built from the same md5 payload) decoded with the JDK's
  * `javax.sound.sampled`; video rows carry a genuine AVI container
  * (RIFF, like WAV — uncompressed RGB24 DIB frames, the lossless 'DIB '
  * fourcc every AVI tool accepts) decoded by [[decodeAvi]], a real RIFF
  * chunk walker that reads geometry from the parsed `avih`/`strf`
  * headers and reverses the DIB wire format (bottom-up rows, BGR byte
  * order, 4-byte row stride) — the JDK ships no video codec classes, so
  * the container parse is this file's, but nothing is assumed that isn't
  * read from the bytes. Because every payload is md5-derived (and the
  * video codec is lossless by construction), the DuckDB oracle computes
  * the expected statistics directly from the hash — an exact oracle
  * validates all three encode → container → decode round trips. A real
  * deployment swaps the per-type branch for a codec call with the
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

  /** Video geometry of the synthesized AVIs: 4 frames of 2×2 RGB24 at
    * 10 fps. 48 logical samples per clip, tiled cyclically from the
    * 16-byte digest — each digest byte appears exactly 3 times, so the
    * clip's sample mean equals the digest byte mean (what keeps the
    * DuckDB oracle a one-liner). */
  val AviW = 2
  val AviH = 2
  val AviFrames = 4
  val AviFps = 10

  private val AviRowBytes = AviW * 3
  private val AviStride = (AviRowBytes + 3) & ~3 // DIB rows pad to 4 bytes
  private val AviFrameLen = AviStride * AviH

  /** The clip's logical RGB sample sequence for a payload: frame-major,
    * then row-major, then R,G,B — `payload` tiled cyclically over
    * frames × pixels × channels. The encoder writes these through the DIB
    * wire format; [[decodeAvi]] must read them back exactly. */
  def aviSamples(payload: Array[Byte]): IndexedSeq[Int] =
    (0 until AviFrames * AviW * AviH * 3).map(g => payload(g % payload.length) & 0xff)

  /** Encode 16 payload bytes as a real AVI container: RIFF('AVI ') with a
    * parsed-not-assumed header tree (LIST hdrl → avih + LIST strl →
    * strh/strf) and a LIST movi of `00db` uncompressed-DIB frames. The
    * DIB wire format is the real one — bottom-up rows, BGR channel order,
    * 4-byte row stride — so the decode side has actual work to undo. */
  def encodeAvi(payload: Array[Byte]): Array[Byte] = {
    require(payload.length == 16, "payload must be 16 bytes")
    def le32(out: ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def le16(out: ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def fourcc(out: ByteArrayOutputStream, s: String): Unit =
      out.write(s.getBytes("US-ASCII"))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      fourcc(out, id); le32(out, body.length); out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF chunks are word-aligned
      out.toByteArray
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      fourcc(out, listType); bodies.foreach(out.write)
      chunk("LIST", out.toByteArray)
    }
    val samples = aviSamples(payload)
    def frame(f: Int): Array[Byte] = {
      val d = new Array[Byte](AviFrameLen)
      for (y <- 0 until AviH; x <- 0 until AviW; c <- 0 until 3)
        // logical sample (frame-major RGB) → DIB position (bottom-up, BGR)
        d((AviH - 1 - y) * AviStride + x * 3 + (2 - c)) =
          samples(f * AviW * AviH * 3 + (y * AviW + x) * 3 + c).toByte
      d
    }
    val avih = { // MainAVIHeader, 56 bytes
      val out = new ByteArrayOutputStream()
      le32(out, 1000000 / AviFps) // dwMicroSecPerFrame
      le32(out, AviFrameLen * AviFps) // dwMaxBytesPerSec
      le32(out, 0) // dwPaddingGranularity
      le32(out, 0) // dwFlags
      le32(out, AviFrames) // dwTotalFrames
      le32(out, 0) // dwInitialFrames
      le32(out, 1) // dwStreams
      le32(out, AviFrameLen) // dwSuggestedBufferSize
      le32(out, AviW); le32(out, AviH)
      (0 until 4).foreach(_ => le32(out, 0)) // dwReserved
      chunk("avih", out.toByteArray)
    }
    val strh = { // AVIStreamHeader, 56 bytes
      val out = new ByteArrayOutputStream()
      fourcc(out, "vids"); fourcc(out, "DIB ")
      le32(out, 0) // dwFlags
      le16(out, 0); le16(out, 0) // priority, language
      le32(out, 0) // dwInitialFrames
      le32(out, 1); le32(out, AviFps) // scale, rate → fps
      le32(out, 0) // dwStart
      le32(out, AviFrames) // dwLength
      le32(out, AviFrameLen) // dwSuggestedBufferSize
      le32(out, -1) // dwQuality (default)
      le32(out, AviFrameLen) // dwSampleSize
      le16(out, 0); le16(out, 0); le16(out, AviW); le16(out, AviH) // rcFrame
      chunk("strh", out.toByteArray)
    }
    val strf = { // BITMAPINFOHEADER, 40 bytes
      val out = new ByteArrayOutputStream()
      le32(out, 40) // biSize
      le32(out, AviW); le32(out, AviH) // positive height = bottom-up
      le16(out, 1); le16(out, 24) // biPlanes, biBitCount
      le32(out, 0) // biCompression = BI_RGB (uncompressed)
      le32(out, AviFrameLen) // biSizeImage
      le32(out, 0); le32(out, 0); le32(out, 0); le32(out, 0)
      chunk("strf", out.toByteArray)
    }
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi",
      (0 until AviFrames).map(f => chunk("00db", frame(f))): _*)
    val inner = new ByteArrayOutputStream()
    fourcc(inner, "AVI "); inner.write(hdrl); inner.write(movi)
    chunk("RIFF", inner.toByteArray)
  }

  /** Decoded AVI clip: geometry from the PARSED headers, logical RGB
    * samples (frame-major) recovered from the DIB frame chunks. */
  final case class AviClip(width: Int, height: Int, channels: Int,
      nFrames: Int, samples: IndexedSeq[Int])

  /** Decode an AVI by actually walking the RIFF chunk tree: verifies the
    * RIFF/'AVI ' envelope, reads frame count from `avih`, geometry and
    * pixel format from `strf` (rejecting anything but uncompressed 24-bit
    * BI_RGB — this is a decoder, not a codec suite), collects the `##db`
    * frame chunks under LIST movi, and reverses the DIB layout (bottom-up
    * rows, BGR, padded stride) into frame-major RGB samples. Nothing
    * about the writer is assumed beyond the wire format itself: chunk
    * sizes route the walk, header fields drive the pixel math, and a
    * frame-count mismatch between `avih` and the movi list is an error. */
  def decodeAvi(bytes: Array[Byte]): AviClip = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    val riffLen = bb.getInt
    require(riffLen == bytes.length - 8, s"RIFF size $riffLen != ${bytes.length - 8}")
    require(fourcc() == "AVI ", "not an AVI")
    var totalFrames = -1
    var w = -1; var h = -1; var bpp = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk chunks in [from, to); recurse into LISTs — a general RIFF walk,
    // not a fixed-offset skip, so reordered/extra chunks still parse
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        bb.position(pos)
        val id = fourcc()
        val len = bb.getInt
        val body = bb.position()
        // a corrupted/hostile length must FAIL the decode, not wedge it:
        // len <= -8 would stop `pos` advancing (infinite loop on one bad
        // row), and an overlong chunk would read past its parent; the
        // bound check is in Long so a length near Int.MaxValue can't wrap
        // negative and slip past it
        require(len >= 0 && body.toLong + len <= to,
          s"corrupt RIFF chunk '$id' at offset $pos: length $len " +
            s"exceeds enclosing range [$from, $to)")
        id match {
          case "LIST" =>
            // the 4-byte list type must fit inside the chunk — a truncated
            // LIST at the buffer's end would otherwise read past it
            require(len >= 4, s"truncated LIST chunk: length $len < 4")
            fourcc() // list type routes nothing — children identify themselves
            walk(bb.position(), body + len)
          case "avih" =>
            // dwTotalFrames is the 5th dword; a truncated header must not
            // read the sibling chunk's bytes as a frame count
            require(len >= 20, s"truncated avih chunk: length $len < 20")
            bb.position(body + 16)
            totalFrames = bb.getInt
          case "strf" =>
            require(len >= 20, s"truncated strf chunk: length $len < 20")
            bb.position(body + 4) // skip biSize
            w = bb.getInt; h = bb.getInt
            bb.getShort // biPlanes
            bpp = bb.getShort.toInt
            val compression = bb.getInt
            require(compression == 0 && bpp == 24,
              s"unsupported pixel format: biCompression=$compression biBitCount=$bpp " +
                "(this decoder reads uncompressed 24-bit BI_RGB)")
          case dbId if dbId.endsWith("db") || dbId.endsWith("dc") =>
            val d = new Array[Byte](len); bb.get(d); frames += d
          case _ => () // unknown chunk: skip by its declared size
        }
        pos = body + len + (len % 2) // RIFF word alignment
      }
    }
    walk(12, bytes.length)
    require(w > 0 && h > 0, "no strf header — not a video AVI")
    require(totalFrames == frames.size,
      s"avih says $totalFrames frames but movi carries ${frames.size}")
    // stride math in Long: hostile w/h near Int.MaxValue must fail the
    // size check below, not wrap it into agreement with the frame bytes
    val strideL = (w.toLong * 3 + 3) & ~3L
    frames.zipWithIndex.foreach { case (d, i) =>
      require(d.length.toLong == strideL * h,
        s"frame $i carries ${d.length} bytes, expected ${strideL * h} (${w}x$h 24-bit DIB)")
    }
    // safe once verified: strideL * h == d.length <= Int.MaxValue (and
    // unused when there are no frames)
    val stride = strideL.toInt
    val samples = for {
      d <- frames.toIndexedSeq
      y <- 0 until h; x <- 0 until w; c <- 0 until 3
    } yield d((h - 1 - y) * stride + x * 3 + (2 - c)) & 0xff
    AviClip(w, h, 3, frames.size, samples)
  }

  /** Build a deterministic media table from the documents corpus: image
    * rows carry a real PNG whose pixels are the md5 digest of the text;
    * audio rows a real WAV whose PCM samples derive from the same digest;
    * video rows a real AVI whose RGB frames tile the digest cyclically. */
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
        case _ => encodeAvi(payload)
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
    * format, never assumed), video through [[decodeAvi]] (real RIFF/AVI
    * chunk walk → header geometry → DIB frame samples). Batch shape
    * (Iterator→Iterator per partition) is exactly what a codec
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
          val clip = decodeAvi(bytes)
          Row(id, tpe, bytes.length, clip.width, clip.height, clip.channels,
            null, clip.nFrames,
            clip.samples.sum.toDouble / clip.samples.length, clip.samples.max)
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
