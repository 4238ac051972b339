package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode / feature-extraction runs as a
  * per-partition batch transform over a typed Dataset.
  *
  * Three decode tiers, same batch shape:
  *   - [[decodeStub]] — deterministic fake features, the documented seam
  *     for codecs that need a native lib absent from this container
  *     (audio/video);
  *   - [[decodePpm]] — REAL hand-rolled parse of uncompressed binary PPM
  *     (header tokenization + pixel extraction);
  *   - [[decodeImage]] — REAL compressed-codec decode (PNG et al.) via
  *     the JDK's built-in `javax.imageio`, zero new dependencies.
  * Everything around them is the Spark shape a production codec keeps:
  * schema, Encoders, `mapPartitions` batching (decoder state initialized
  * once per partition, not per row), partition-local work, no shuffle.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (SURVEY.md's multimodal
    * mandate). `kind` ∈ image/audio/video in a real pipeline. */
  final case class Media(id: Long, kind: String, bytes: Array[Byte])

  final case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
                                 byte_sum: Long, width: Int, height: Int)

  /** STUB decoder — deterministic fake in place of a codec: "dimensions"
    * from the first two bytes, a checksum-ish feature from the byte sum.
    * Replace with a real decoder; the signature (bytes → features) and the
    * call shape (per-partition, reusable decoder state) stay the same. */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Int) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val w = if (bytes.length > 0) (bytes(0) & 0xff) + 1 else 0
    val h = if (bytes.length > 1) (bytes(1) & 0xff) + 1 else 0
    (sum, w, h)
  }

  /** Batch feature extraction: one decoder "session" per partition (the
    * real-codec pattern — JNI contexts / model handles are per-partition,
    * never per row), rows streamed through it lazily. */
  def features(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { m =>
        val (sum, w, h) = decodeStub(m.bytes)
        MediaFeatures(m.id, m.kind, m.bytes.length.toLong, sum, w, h)
      }
    }
  }

  /** Fixture adapter: documents.text bytes stand in for media payloads so
    * the plumbing is exercised end-to-end on the driver's testdata. */
  def fromDocuments(spark: SparkSession, documents: DataFrame): Dataset[Media] = {
    import spark.implicits._
    documents.select(col("doc_id").as("id"), lit("text").as("kind"),
      col("text").cast("binary").as("bytes")).as[Media]
  }

  /** Metadata-only projection (no decode): id, kind, payload size. */
  def meta(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  // ------------------------------------------------------------------
  // REAL bytes→pixels decode: binary PPM (P6), the one raster format
  // simple enough to parse with zero codec dependencies. This certifies
  // actual decode arithmetic (header tokenization + pixel extraction)
  // through the same per-partition batch shape as [[features]] — the
  // stub above stays as the documented seam for formats that DO need a
  // native codec.
  // ------------------------------------------------------------------

  /** A decoded raster: dimensions from the header, integer pixel stats
    * from the payload (exact, hash-comparable across engines). */
  final case class Raster(width: Int, height: Int, maxVal: Int,
                          pixelSum: Long)

  /** Parse a binary PPM (P6) image — netpbm's uncompressed RGB format:
    * ASCII header `P6 <width> <height> <maxval>` (tokens separated by
    * whitespace, `#` comments running to end-of-line) followed by ONE
    * whitespace byte and `width*height*3` raw channel bytes. A real
    * parser, not a fixture reader: comments, arbitrary whitespace runs
    * and truncated payloads are all handled. None on anything malformed
    * — a decoder that guesses is worse than one that refuses. */
  def decodePpm(bytes: Array[Byte]): Option[Raster] = {
    var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def token(): Option[String] = {
      skipWs()
      val start = i
      while (i < bytes.length && !bytes(i).toChar.isWhitespace &&
        bytes(i) != '#') i += 1
      if (i > start) Some(new String(bytes, start, i - start, "US-ASCII"))
      else None
    }
    def natInt(s: String): Option[Int] =
      if (s.nonEmpty && s.forall(_.isDigit) && s.length <= 9) Some(s.toInt)
      else None
    for {
      magic <- token() if magic == "P6"
      w <- token().flatMap(natInt) if w > 0
      h <- token().flatMap(natInt) if h > 0
      m <- token().flatMap(natInt) if m > 0 && m < 65536
      // exactly one whitespace byte separates header from payload
      _ <- if (i < bytes.length && bytes(i).toChar.isWhitespace) { i += 1; Some(()) }
           else None
      n = w.toLong * h * 3 if m < 256 // 2-byte-per-sample PPMs not needed here
      if bytes.length - i >= n
    } yield {
      var sum = 0L
      var j = i
      val end = i + n.toInt
      while (j < end) { sum += bytes(j) & 0xff; j += 1 }
      Raster(w, h, m, sum)
    }
  }

  final case class DecodedFeatures(id: Long, width: Long, height: Long,
                                   pixel_sum: Long, pixel_mean_q4: Long)

  /** Real-decode feature extraction: [[decodePpm]] per row inside the
    * same per-partition batch shape as [[features]]; undecodable rows are
    * dropped (the quarantine-split a production pipeline would route to a
    * dead-letter sink). `pixel_mean_q4` is the mean channel value
    * quantized to 1e-4 via integer arithmetic (floor(sum*1e4/n + .5) on
    * longs) so the value is exact and portable. */
  def featuresPpm(media: Dataset[Media]): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodePpm(m.bytes).map { r =>
          val n = r.width.toLong * r.height * 3
          DecodedFeatures(m.id, r.width.toLong, r.height.toLong, r.pixelSum,
            (r.pixelSum * 10000L + n / 2) / n)
        }
      }
    }
  }

  /** Deterministic planted PPM payloads, one per document: width/height
    * and every channel byte derive from `doc_id` by formula
    * (`w = 1 + id%7`, `h = 1 + id%5`, `pixel(k) = (id*31 + 7k) mod 256`)
    * so an external oracle recomputes the expected decoded features from
    * the id alone — the planted-fixture analogue of the hash-derived JL
    * sign matrix. Payload construction is row-local (no shuffle); a real
    * pipeline reads the bytes column off parquet instead. */
  def plantedPpm(spark: SparkSession, documents: DataFrame): Dataset[Media] = {
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (1 + id % 7).toInt
      val h = (1 + id % 5).toInt
      val header = s"P6\n# planted fixture\n$w $h\n255\n"
        .getBytes("US-ASCII")
      val body = new Array[Byte](w * h * 3)
      var k = 0
      while (k < body.length) {
        body(k) = ((id * 31 + 7L * k) % 256).toByte
        k += 1
      }
      Media(id, "image", header ++ body)
    }
  }

  // ------------------------------------------------------------------
  // REAL compressed-codec decode: PNG through the JDK's built-in
  // `javax.imageio` (zero new dependencies — the sandbox ships no
  // external image libs, but ImageIO's PNG/JPEG/BMP readers are part of
  // the JDK itself). Where [[decodePpm]] certified hand-rolled parse
  // arithmetic on an uncompressed format, this certifies the seam a real
  // corpus needs: an actual DEFLATE-compressed codec behind the same
  // per-partition batch shape and the same planted-formula oracle.
  // ------------------------------------------------------------------

  /** Decode any ImageIO-supported raster (PNG here; the JDK reader set
    * also covers JPEG/BMP/GIF) to the same [[Raster]] feature contract as
    * [[decodePpm]]: dimensions + the exact sum of 8-bit R,G,B channel
    * values over all pixels, row-major. None on undecodable bytes.
    *
    * PNG is lossless, so planted pixel formulas survive the
    * encode→decode round trip EXACTLY — the decoded features certify
    * real inflate+unfilter work against an external oracle that never
    * ran the codec ([[plantedPng]]). JPEG would not (lossy), which is
    * why the planted fixture standardizes on PNG. */
  def decodeImage(bytes: Array[Byte]): Option[Raster] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None // unrecognized magic: not a supported raster
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB-packed, alpha ignored
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some(Raster(w, h, 255, sum))
      }
    } catch { case _: Exception => None }

  /** PNG-decode feature extraction — identical output contract to
    * [[featuresPpm]] (same DecodedFeatures schema, same integer mean
    * quantization) over [[decodeImage]]. The per-partition init is REAL
    * here: ImageIO's disk-backed stream cache is disabled once per
    * partition, not per row — the decoder-state-per-partition pattern
    * the stub documents. */
  def featuresPng(media: Dataset[Media]): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        decodeImage(m.bytes).map { r =>
          val n = r.width.toLong * r.height * 3
          DecodedFeatures(m.id, r.width.toLong, r.height.toLong, r.pixelSum,
            (r.pixelSum * 10000L + n / 2) / n)
        }
      }
    }
  }

  /** Planted PNG payloads: the SAME pixel formula as [[plantedPpm]]
    * (`w = 1 + id%7`, `h = 1 + id%5`, channel k = (id*31 + 7k) mod 256,
    * row-major RGB) rendered into a real PNG via ImageIO — so the
    * mm_decode oracle's formula replay certifies both decoders
    * unchanged, and any inflate/unfilter defect shows up as a hash
    * mismatch. Encoding is row-local (no shuffle); PNG's losslessness is
    * what licenses sharing the oracle. */
  def plantedPng(spark: SparkSession, documents: DataFrame): Dataset[Media] = {
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val w = (1 + id % 7).toInt
        val h = (1 + id % 5).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val k0 = 3L * (y.toLong * w + x)
            val r = ((id * 31 + 7L * k0) % 256).toInt
            val g = ((id * 31 + 7L * (k0 + 1)) % 256).toInt
            val b = ((id * 31 + 7L * (k0 + 2)) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "png", out),
          "JDK PNG writer missing — ImageIO always ships one")
        Media(id, "image", out.toByteArray)
      }
    }
  }

  final case class Frame(id: Long, frame_idx: Long, n_bytes: Long,
                         byte_sum: Long)

  /** Frame sampling over an opaque media payload: the byte stream is cut
    * into fixed `frameBytes` chunks ("frames" — a real decoder would emit
    * decoded frames here) and every `step`-th frame is kept. The classic
    * video-pipeline shape: per-partition batch transform, one output row
    * per sampled frame, no shuffle — sampling density scales the work
    * linearly and each 100 TB split samples independently.
    *
    * The per-frame feature is the STUB (byte count + byte sum standing in
    * for a decode+embed); the flatMap plumbing — chunking, stride, typed
    * output rows — is the part a real codec drops into. */
  def frameSample(media: Dataset[Media], frameBytes: Int = 64,
                  step: Int = 4): Dataset[Frame] = {
    require(frameBytes > 0 && step > 0)
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = (m.bytes.length + frameBytes - 1) / frameBytes
      (0 until nFrames by step).iterator.map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, m.bytes.length)
        var sum = 0L
        var j = from
        while (j < until) { sum += m.bytes(j) & 0xff; j += 1 }
        Frame(m.id, i.toLong, (until - from).toLong, sum)
      }
    }
  }
}
