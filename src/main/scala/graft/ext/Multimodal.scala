package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode / feature-extraction runs as a
  * per-partition batch transform over a typed Dataset.
  *
  * Four decode tiers, same batch shape:
  *   - [[decodeStub]] — deterministic fake features, the documented seam
  *     for codecs that need a native lib absent from this container
  *     (video);
  *   - [[decodePpm]] — REAL hand-rolled parse of uncompressed binary PPM
  *     (header tokenization + pixel extraction);
  *   - [[decodeImage]] — REAL compressed-codec decode (PNG et al.) via
  *     the JDK's built-in `javax.imageio`, zero new dependencies;
  *   - [[decodeWav]] — REAL audio decode: hand-rolled RIFF/WAVE PCM16
  *     chunk walker, certified on the JDK `javax.sound` encoder's bytes.
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
  /** P6 header parse shared by [[decodePpm]] and [[decodePpmPixels]]:
    * (width, height, maxval, payload offset), or None on malformation —
    * identical accept/reject semantics to the original inline parse. */
  private def parsePpmHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
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
    } yield (w, h, m, i)
  }

  def decodePpm(bytes: Array[Byte]): Option[Raster] = for {
    (w, h, m, off) <- parsePpmHeader(bytes)
    n = w.toLong * h * 3 if m < 256 // 2-byte-per-sample PPMs not needed here
    if bytes.length - off >= n
  } yield {
    var sum = 0L
    var j = off
    val end = off + n.toInt
    while (j < end) { sum += bytes(j) & 0xff; j += 1 }
    Raster(w, h, m, sum)
  }

  /** Like [[decodePpm]] but hands back the raw interleaved RGB bytes for
    * pixel-level transforms ([[resizePpm]]). Same strictness. */
  def decodePpmPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = for {
    (w, h, m, off) <- parsePpmHeader(bytes)
    n = w.toLong * h * 3 if m < 256
    if bytes.length - off >= n
  } yield (w, h, java.util.Arrays.copyOfRange(bytes, off, off + n.toInt))

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

  /** Resized-image features: output geometry + the exact integer sum of
    * all output channel values (certifies every block's rounding). */
  final case class ResizedFeatures(id: Long, out_w: Long, out_h: Long,
                                   out_sum: Long)

  /** Deterministic area-average downscale by an integer factor — the
    * image-pipeline resize step, made exact: each output channel value is
    * `floor((Σ block + B/2) / B)` over its `factor×factor` input block
    * (B = factor², round-half-up in pure longs), so the result is
    * bit-identical on any engine and an external oracle can replay it.
    * Images whose dimensions the factor does not divide are quarantine-
    * dropped (same discipline as undecodable payloads) — a production
    * variant would pad or crop, which is policy, not arithmetic.
    *
    * Row-local mapPartitions, no shuffle: at 100 TB each split resizes
    * independently and the output is factor² times smaller than the
    * input — the canonical decode→transform→shrink pipeline shape. */
  def resizePpm(media: Dataset[Media], factor: Int = 2): Dataset[ResizedFeatures] = {
    require(factor > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodePpmPixels(m.bytes).flatMap { case (w, h, px) =>
          blockMeanSum(w, h, px, factor).map { case (ow, oh, s) =>
            ResizedFeatures(m.id, ow.toLong, oh.toLong, s)
          }
        }
      }
    }
  }

  /** The pure resize kernel: (out_w, out_h, Σ rounded block means) over
    * interleaved RGB bytes, None when factor doesn't divide the dims.
    * Property-tested against a brute-force model independent of this
    * loop nest. */
  def blockMeanSum(w: Int, h: Int, px: Array[Byte],
                   factor: Int): Option[(Int, Int, Long)] = {
    if (w % factor != 0 || h % factor != 0) None
    else {
      val ow = w / factor
      val oh = h / factor
      val area = factor * factor
      var outSum = 0L
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var c = 0
          while (c < 3) {
            var bsum = 0L
            var dy = 0
            while (dy < factor) {
              var dx = 0
              while (dx < factor) {
                val k = 3 * ((oy * factor + dy) * w + ox * factor + dx) + c
                bsum += px(k) & 0xff
                dx += 1
              }
              dy += 1
            }
            outSum += (bsum + area / 2) / area
            c += 1
          }
          ox += 1
        }
        oy += 1
      }
      Some((ow, oh, outSum))
    }
  }

  /** Planted even-dimension PPMs for the resize path: `w = 2·(1+id%3)`,
    * `h = 2·(1+id%2)`, same channel formula as [[plantedPpm]]
    * (`pixel(k) = (id·31 + 7k) mod 256`) — factor-2 blocks always
    * complete, so the oracle replays every block's rounded mean. */
  def plantedPpmEven(spark: SparkSession, documents: DataFrame): Dataset[Media] = {
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (2 * (1 + id % 3)).toInt
      val h = (2 * (1 + id % 2)).toInt
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
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

  /** PNG IHDR fields — all the geometry a pipeline usually needs,
    * extracted WITHOUT running the codec. */
  final case class PngHeader(width: Int, height: Int, bitDepth: Int,
                             colorType: Int)

  /** Metadata fast path: read a PNG's dimensions from the 8-byte
    * signature + IHDR chunk alone — no inflate, no unfilter, O(33 bytes)
    * per image whatever its size. The image analogue of
    * [[graft.sources.ParquetMeta]]'s footer-only count: filtering a
    * corpus by resolution or aspect ratio must not pay full decode.
    * Strict: exact signature, first chunk must be a 13-byte IHDR,
    * positive dims — anything else is None. */
  def decodePngHeader(bytes: Array[Byte]): Option[PngHeader] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    if (bytes.length < 33) None
    else if (!bytes.take(8).sameElements(sig)) None
    else if (u32(8) != 13L) None // IHDR data length is always 13
    else if (new String(bytes, 12, 4, "US-ASCII") != "IHDR") None
    else {
      val w = u32(16)
      val h = u32(20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
      else Some(PngHeader(w.toInt, h.toInt, bytes(24) & 0xff, bytes(25) & 0xff))
    }
  }

  final case class PngMeta(id: Long, width: Long, height: Long,
                           bit_depth: Long, color_type: Long)

  /** Header-only feature extraction over [[decodePngHeader]] — same
    * quarantine-drop batch shape as the full decoders, a constant 33
    * bytes of work per row. */
  def metaPng(media: Dataset[Media]): Dataset[PngMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodePngHeader(m.bytes).map(p =>
          PngMeta(m.id, p.width.toLong, p.height.toLong, p.bitDepth.toLong,
            p.colorType.toLong))
      }
    }
  }

  final case class PhashFeatures(id: Long, q0: Long, q1: Long, q2: Long,
                                 q3: Long, sig: Long)

  /** Perceptual-hash signature — IMAGE near-dup blocking, the visual
    * analogue of SimHash: each quadrant contributes one bit, set iff
    * the quadrant's pixel mass exceeds the image mean (`4·q > total` in
    * exact integers — quadrants hold exactly n/4 samples on even dims,
    * so no division, no float, engine-replayable). Equal signatures
    * block candidate pairs the way MinHash bands do for text; a
    * brightness-shifted or lightly-recompressed copy keeps its mass
    * DISTRIBUTION and lands in the same bucket while exact hashing
    * misses it. This 4-bit quadrant form is the certified kernel of the
    * real 64-bit aHash/dHash (8×8 grid, same arithmetic, same plan);
    * odd dimensions quarantine-drop like every decoder here. Row-local
    * mapPartitions; the downstream blocking join is a plain groupBy on
    * `sig`. */
  def phashPpm(media: Dataset[Media]): Dataset[PhashFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodePpmPixels(m.bytes).flatMap { case (w, h, px) =>
          if (w % 2 != 0 || h % 2 != 0) None
          else {
            val qs = new Array[Long](4)
            var p = 0
            val n = w * h
            while (p < n) {
              val y = p / w
              val x = p % w
              val q = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
              var c = 0
              while (c < 3) { qs(q) += px(3 * p + c) & 0xff; c += 1 }
              p += 1
            }
            val total = qs.sum
            var sig = 0L
            var i = 0
            while (i < 4) {
              if (4L * qs(i) > total) sig |= (1L << i)
              i += 1
            }
            Some(PhashFeatures(m.id, qs(0), qs(1), qs(2), qs(3), sig))
          }
        }
      }
    }
  }

  /** JPEG frame-header fields from the SOF segment — geometry without
    * entropy decode. `progressive` distinguishes SOF2 from baseline. */
  final case class JpegHeader(width: Int, height: Int, precision: Int,
                              components: Int, progressive: Boolean)

  /** Metadata fast path for JPEG: walk the marker-segment list from SOI
    * to the first SOF0/SOF1/SOF2 and read precision + dimensions +
    * component count from it — no Huffman decode, no IDCT, O(header
    * bytes) per image whatever its size. Real image corpora are
    * JPEG-heavy, and filtering by resolution must not pay full decode
    * (the [[decodePngHeader]] discipline; lossy content is exactly why
    * the HEADER is the only exactly-checkable part of a JPEG).
    *
    * Grammar (public JPEG/JFIF spec): `FFD8` (SOI), then segments of
    * `FF <marker> <len:u16 incl. itself> <payload>`; any number of FF
    * fill bytes may precede a marker; standalone markers (TEM, RST0-7)
    * carry no length. SOF payload is precision:u8, height:u16,
    * width:u16, components:u8.
    *
    * Strict-or-refuse: truncated segments, a SOS/EOI before any SOF,
    * zero dimensions (the DNL deferred-height form), non-baseline/
    * non-progressive SOF variants (SOF3/5-7/9-11/13-15 — lossless and
    * arithmetic codings this engine never certifies), or a length < 2
    * all return None rather than guessing. */
  def decodeJpegHeader(bytes: Array[Byte]): Option[JpegHeader] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 1 < bytes.length) {
      if (u8(i) != 0xff) return None // marker must start with FF
      var j = i
      while (j < bytes.length && u8(j) == 0xff) j += 1 // FF fill bytes
      if (j >= bytes.length) return None
      val marker = u8(j)
      j += 1
      marker match {
        case 0xc0 | 0xc1 | 0xc2 => // SOF0 baseline / SOF1 ext. / SOF2 prog.
          if (j + 2 > bytes.length) return None
          val len = u16(j)
          // 8 = len(2) + precision(1) + height(2) + width(2) + ncomp(1)
          if (len < 8 || j + len > bytes.length) return None
          val precision = u8(j + 2)
          val h = u16(j + 3)
          val w = u16(j + 5)
          val ncomp = u8(j + 7)
          if (w <= 0 || h <= 0 || ncomp <= 0) return None
          return Some(JpegHeader(w, h, precision, ncomp, marker == 0xc2))
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd |
             0xce | 0xcf =>
          return None // other SOF families: refuse, don't guess
        case 0xd9 | 0xda =>
          return None // EOI / SOS before any SOF: no frame header exists
        case 0x01 | 0xd0 | 0xd1 | 0xd2 | 0xd3 | 0xd4 | 0xd5 | 0xd6 | 0xd7 =>
          i = j // standalone marker, no length field
        case _ =>
          if (j + 2 > bytes.length) return None
          val len = u16(j)
          if (len < 2 || j + len > bytes.length) return None
          i = j + len
      }
    }
    None // ran off the end without a SOF
  }

  final case class JpegMeta(id: Long, width: Long, height: Long,
                            precision: Long, components: Long)

  /** Header-only JPEG metadata over [[decodeJpegHeader]] — the same
    * quarantine-drop batch shape as [[metaPng]]. */
  def metaJpeg(media: Dataset[Media]): Dataset[JpegMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodeJpegHeader(m.bytes).map(p =>
          JpegMeta(m.id, p.width.toLong, p.height.toLong, p.precision.toLong,
            p.components.toLong))
      }
    }
  }

  /** Planted JPEG payloads: the [[plantedPng]] geometry (`w = 1 + id%7`,
    * `h = 1 + id%5`) encoded by the JDK's own JPEG writer. The pixel
    * CONTENT is lossy and never certified; the header fields are exact —
    * the planted-formula oracle covers dimensions plus the 8-bit 3-
    * component baseline frame the JDK writer always emits for
    * TYPE_INT_RGB, so the marker walk is checked against an encoder it
    * shares no code with. */
  def plantedJpeg(spark: SparkSession, documents: DataFrame): Dataset[Media] = {
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
        require(javax.imageio.ImageIO.write(img, "jpg", out),
          "JDK JPEG writer missing — ImageIO always ships one")
        Media(id, "image", out.toByteArray)
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL audio decode: RIFF/WAVE PCM16 via a hand-rolled chunk walker
  // (the PPM discipline applied to audio — strict, loud, zero deps).
  // The planted fixture is ENCODED by the JDK's independent
  // `javax.sound.sampled` writer, so the parser is certified against
  // bytes it never produced, and the DuckDB oracle replays the sample
  // formula without ever running either codec.
  // ------------------------------------------------------------------

  /** A decoded PCM16 clip: format fields from the fmt chunk, integer
    * amplitude stats from the data chunk (exact, hash-comparable). */
  final case class AudioClip(channels: Int, sampleRate: Int, frames: Long,
                             ampSum: Long, ampMax: Long)

  /** Parse a RIFF/WAVE container with 16-bit signed little-endian PCM:
    * walk the chunk list (any order, unknown chunks skipped, word-aligned
    * sizes honored), require a PCM fmt chunk before data, and fold the
    * data chunk's samples into |amplitude| sum/max. None on anything
    * malformed or non-PCM16 — a decoder that guesses is worse than one
    * that refuses. */
  def decodeWav(bytes: Array[Byte]): Option[AudioClip] =
    decodeWavWith(bytes)(_ => (), (_, _) => ())

  /** The chunk walk with per-sample hooks — ONE walker serves the plain
    * decode and the signature fold ([[phashWav]]); `init` receives the
    * total sample count before the first `onSample(index, |amp|)`. */
  private def decodeWavWith(bytes: Array[Byte])(
      init: Int => Unit, onSample: (Int, Long) => Unit): Option[AudioClip] = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int): String =
      if (i + 4 <= bytes.length) new String(bytes, i, 4, "US-ASCII") else ""
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val size = u32(i + 4)
      val body = i + 8
      if (body + size > bytes.length) return None // truncated chunk
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = u16(body)
        val channels = u16(body + 2)
        val rate = u32(body + 4)
        val bits = u16(body + 14)
        // PCM (1) at 16 bits only — everything else is loudly not-ours
        if (audioFormat != 1 || bits != 16 || channels < 1) return None
        fmt = Some((channels, rate.toInt))
      } else if (id == "data") {
        val (channels, rate) = fmt.getOrElse(return None)
        if (size % 2 != 0) return None
        val n = (size / 2).toInt
        if (n % channels != 0) return None
        init(n)
        var sum = 0L
        var max = 0L
        var k = 0
        while (k < n) {
          val s = u16(body + 2 * k).toShort.toInt // sign-extend LE int16
          val a = math.abs(s).toLong
          sum += a
          if (a > max) max = a
          onSample(k, a)
          k += 1
        }
        return Some(AudioClip(channels, rate, (n / channels).toLong, sum, max))
      }
      i = body + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
    }
    None // no data chunk
  }

  final case class AudioPhash(id: Long, q0: Long, q1: Long, q2: Long,
                              q3: Long, sig: Long)

  /** Audio perceptual signature — [[phashPpm]]'s quadrants over TIME:
    * one bit per temporal quarter of the clip, set iff that quarter's
    * amplitude mass beats the clip mean (`4·q > total`, exact integers
    * — quarter membership is `(4·k) div n`, so uneven quarters differ
    * by at most one sample and both engines place every sample
    * identically). A re-encoded or slightly re-leveled copy keeps its
    * energy ENVELOPE and lands in the same blocking bucket; exact
    * hashing misses it. The certified kernel of a real audio
    * fingerprint (same arithmetic at 64+ bands/windows). Zero-sample
    * clips refuse (a signature over nothing is a lie), malformed bytes
    * quarantine-drop like every decoder here. */
  def phashWav(media: Dataset[Media]): Dataset[AudioPhash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        var n = 0
        val qs = new Array[Long](4)
        decodeWavWith(m.bytes)(
          total => n = total,
          (k, a) => qs(((4L * k) / n).toInt) += a
        ).flatMap { _ =>
          if (n == 0) None
          else {
            val total = qs.sum
            var sig = 0L
            var i = 0
            while (i < 4) {
              if (4L * qs(i) > total) sig |= (1L << i)
              i += 1
            }
            Some(AudioPhash(m.id, qs(0), qs(1), qs(2), qs(3), sig))
          }
        }
      }
    }
  }

  /** WAV metadata without touching a sample: walk the chunk list, read
    * the fmt fields, take the data chunk's SIZE — frames = size/(2·ch) —
    * and never load its body. O(header) per clip whatever its length
    * (the [[decodePngHeader]] discipline for audio: filtering a corpus
    * by duration or sample rate must not pay a sample fold). Same
    * strictness as [[decodeWav]]: PCM16 only, malformed → None. */
  def decodeWavMeta(bytes: Array[Byte]): Option[AudioClip] = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int): String =
      if (i + 4 <= bytes.length) new String(bytes, i, 4, "US-ASCII") else ""
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int)] = None
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val size = u32(i + 4)
      val body = i + 8
      if (body + size > bytes.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        if (u16(body) != 1 || u16(body + 14) != 16 || u16(body + 2) < 1)
          return None
        fmt = Some((u16(body + 2), u32(body + 4).toInt))
      } else if (id == "data") {
        val (channels, rate) = fmt.getOrElse(return None)
        if (size % 2 != 0) return None
        val n = size / 2
        if (n % channels != 0) return None
        // amp stats are -1: explicitly "not computed", never mistaken
        // for the silent-clip zeros a real fold can produce
        return Some(AudioClip(channels, rate, n / channels, -1L, -1L))
      }
      i = body + size.toInt + (size.toInt & 1)
    }
    None
  }

  final case class WavMeta(id: Long, channels: Long, sample_rate: Long,
                           n_frames: Long)

  /** Header-only audio features over [[decodeWavMeta]]. */
  def metaWav(media: Dataset[Media]): Dataset[WavMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodeWavMeta(m.bytes).map(c =>
          WavMeta(m.id, c.channels.toLong, c.sampleRate.toLong, c.frames))
      }
    }
  }

  final case class WavFeatures(id: Long, channels: Long, sample_rate: Long,
                               n_frames: Long, amp_sum: Long, amp_max: Long)

  /** WAV-decode feature extraction over [[decodeWav]], same per-partition
    * batch shape and quarantine-drop semantics as [[featuresPpm]]. */
  def featuresWav(media: Dataset[Media]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodeWav(m.bytes).map(c =>
          WavFeatures(m.id, c.channels.toLong, c.sampleRate.toLong,
            c.frames, c.ampSum, c.ampMax))
      }
    }
  }

  /** Planted WAV payloads, one per document, every field a formula of
    * `doc_id` (channels = 1 + id%2, rate = 8000 + 4000·(id%3),
    * frames = 16 + id%17, sample(k) = ((id·37 + 11k) mod 65536) − 32768
    * over the interleaved sample index k) — ENCODED through the JDK's
    * own `javax.sound.sampled` WAVE writer, so [[decodeWav]] is
    * exercised on an independent encoder's bytes and the oracle
    * recomputes the amplitude stats from the id alone. */
  def plantedWav(spark: SparkSession, documents: DataFrame): Dataset[Media] = {
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + 4000 * (id % 3)).toInt
        val frames = (16 + id % 17).toInt
        val total = frames * channels
        val pcm = new Array[Byte](total * 2)
        var k = 0
        while (k < total) {
          val s = (((id * 37 + 11L * k) % 65536) - 32768).toShort
          pcm(2 * k) = (s & 0xff).toByte
          pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, false) // signed, little-endian
        val out = new java.io.ByteArrayOutputStream()
        val in = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        javax.sound.sampled.AudioSystem.write(in,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out): Unit
        Media(id, "audio", out.toByteArray)
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL video container parse: YUV4MPEG2 (Y4M) — the standard
  // interchange format for RAW planar video (ffmpeg/x264/VMAF all speak
  // it): a plain-text header, then `FRAME\n`-delimited uncompressed YUV
  // planes. Like PPM for images, it is the honest zero-dependency video
  // format: parsing it exercises real container work (header grammar,
  // per-colorspace plane geometry, frame stride) with no codec library.
  // Frame SAMPLING happens inside the walk: skipped frames are skipped
  // by index arithmetic — their bytes are never read, which is exactly
  // the 1/step work reduction frame sampling buys at 100 TB.
  // ------------------------------------------------------------------

  /** One sampled, decoded video frame: plane-separated byte sums (the
    * Y/UV boundary arithmetic is what they certify) plus the header
    * geometry replicated per row for the oracle. */
  final case class VideoFrame(id: Long, frame_idx: Long, width: Long,
                              height: Long, fps_num: Long, y_sum: Long,
                              uv_sum: Long)

  /** Parsed Y4M stream metadata + per-SAMPLED-frame plane sums. */
  final case class Y4mClip(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                           sampled: Seq[(Int, Long, Long)]) // (idx, ySum, uvSum)

  /** Parse a YUV4MPEG2 stream, folding every `step`-th frame's luma and
    * chroma planes into exact integer sums and SKIPPING the rest without
    * reading them.
    *
    * Grammar (public Y4M spec, as written by ffmpeg): header line
    * `YUV4MPEG2 (<tag><value>)*\n` with required `W`/`H`/`F<num>:<den>`
    * tags; each frame is `FRAME(<params>)?\n` + one raw picture of
    * geometry-determined size. Supported colorspaces: `C420*` (chroma
    * subsampled 2×2 — frame is w·h + 2·(w/2)·(h/2) bytes, even
    * dimensions required), `C444` (w·h·3), `Cmono` (w·h, uv_sum 0).
    * `C422` and anything unknown → None: a parser that guesses plane
    * geometry corrupts every downstream feature silently.
    *
    * None on any malformation (bad magic, missing tags, truncated
    * frame, trailing garbage) — same strict-or-refuse discipline as
    * [[decodePpm]]/[[decodeWav]]. */
  def decodeY4m(bytes: Array[Byte], step: Int): Option[Y4mClip] = {
    require(step > 0)
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      i // == length when unterminated
    }
    val hEnd = lineEnd(0)
    if (hEnd >= bytes.length) return None // unterminated header
    val header = new String(bytes, 0, hEnd, "US-ASCII")
    val parts = header.split(" ")
    if (parts.isEmpty || parts(0) != "YUV4MPEG2") return None
    def natInt(s: String): Option[Int] =
      if (s.nonEmpty && s.forall(c => c >= '0' && c <= '9'))
        try Some(s.toInt) catch { case _: NumberFormatException => None }
      else None
    var w, h, fn, fd = -1
    var cs = "420jpeg" // the Y4M default when no C tag is present
    var pi = 1
    while (pi < parts.length) {
      val p = parts(pi)
      if (p.nonEmpty) (p.head, p.tail) match {
        case ('W', v) => w = natInt(v).getOrElse(-1)
        case ('H', v) => h = natInt(v).getOrElse(-1)
        case ('F', v) => v.split(":") match {
          case Array(n, d) =>
            fn = natInt(n).getOrElse(-1)
            fd = natInt(d).getOrElse(-1)
          case _ => return None
        }
        case ('C', v) => cs = v
        case ('I' | 'A' | 'X', _) => // interlace/aspect/comment: ignored
        case _ => return None // unknown tag letter: refuse, don't guess
      }
      pi += 1
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    // EXACT 8-bit colorspace whitelist, not a "420" prefix match: a
    // C420p10/C420p16 high-bit-depth stream has twice the plane bytes,
    // and guessed 8-bit geometry would misalign every frame — the
    // refuse-don't-guess contract applies to bit depth too.
    // Plane sizes in Long: a crafted header like W46341 H46341 overflows
    // w*h in Int to a NEGATIVE size, which slips past the truncation
    // check and walks `bytes` at negative offsets — a task-killing
    // ArrayIndexOutOfBounds instead of the contracted None (decodePpm
    // already computes its byte count as Long for the same reason).
    val (ySizeL, uvSizeL) =
      if (cs == "420" || cs == "420jpeg" || cs == "420mpeg2" ||
          cs == "420paldv") {
        if (w % 2 != 0 || h % 2 != 0) return None
        (w.toLong * h, 2L * (w / 2) * (h / 2))
      } else if (cs == "444") (w.toLong * h, 2L * w * h)
      else if (cs == "mono") (w.toLong * h, 0L)
      else return None
    val frameSizeL = ySizeL + uvSizeL
    // A frame larger than the payload (or than any JVM array can hold)
    // can never parse — refuse before the walk so the Int narrowing
    // below is provably lossless.
    if (frameSizeL > bytes.length || frameSizeL > Int.MaxValue) return None
    val ySize = ySizeL.toInt
    val uvSize = uvSizeL.toInt
    val frameSize = frameSizeL.toInt
    val sampled = Seq.newBuilder[(Int, Long, Long)]
    var i = hEnd + 1
    var idx = 0
    while (i < bytes.length) {
      // frame marker line: FRAME optionally followed by parameters
      val fEnd = lineEnd(i)
      if (fEnd >= bytes.length) return None
      val marker = new String(bytes, i, fEnd - i, "US-ASCII")
      if (marker != "FRAME" && !marker.startsWith("FRAME ")) return None
      val body = fEnd + 1
      if (body + frameSize > bytes.length) return None // truncated picture
      if (idx % step == 0) {
        var ySum = 0L
        var k = body
        val yEnd = body + ySize
        while (k < yEnd) { ySum += bytes(k) & 0xff; k += 1 }
        var uvSum = 0L
        val uvEnd = yEnd + uvSize
        while (k < uvEnd) { uvSum += bytes(k) & 0xff; k += 1 }
        sampled += ((idx, ySum, uvSum))
      } // else: the whole picture is SKIPPED — no byte reads
      i = body + frameSize
      idx += 1
    }
    Some(Y4mClip(w, h, fn, fd, sampled.result()))
  }

  /** Y4M frame-sampled feature extraction: one output row per kept frame,
    * undecodable payloads quarantine-dropped — the real-codec version of
    * [[frameSample]]'s stub chunking. Row-local flatMap, no shuffle; at
    * scale each split samples independently and step divides the decode
    * work, not just the output. */
  def featuresY4m(media: Dataset[Media], step: Int = 2): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      decodeY4m(m.bytes, step).iterator.flatMap { c =>
        c.sampled.iterator.map { case (idx, ySum, uvSum) =>
          VideoFrame(m.id, idx.toLong, c.width.toLong, c.height.toLong,
            c.fpsNum.toLong, ySum, uvSum)
        }
      }
    }
  }

  /** Scene-cut detection — the shot-boundary primitive that makes video
    * frame sampling content-aware (sample per SHOT, not per fixed
    * stride, and a cut list is the index a video search or captioning
    * pipeline joins against). A cut is declared between consecutive
    * frames when the luma mass jumps by more than `threshold` gray
    * levels PER PIXEL: `|Δy_sum| > w·h·threshold` — dimension-
    * normalized without division, pure integers, engine-replayable.
    * Plan: the row-local frame decode ([[featuresY4m]] at step 1 — a
    * cut detector must see every frame) feeds one lag window per clip
    * and one per-clip aggregate; single-frame clips have no transition
    * and emit no row. */
  def sceneCuts(media: Dataset[Media], threshold: Long = 2L): DataFrame = {
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    val f = featuresY4m(media, step = 1).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("frame_idx"))
    f.withColumn("prev", lag(col("y_sum"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("jump", abs(col("y_sum") - col("prev")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("jump") > col("width") * col("height") * threshold, 1L)
          .otherwise(0L)).as("n_cuts"),
        max(col("jump")).as("max_jump"))
  }

  /** Planted Y4M payloads, every field a formula of `doc_id`:
    * `w = 2·(1 + id%3)`, `h = 2·(1 + id%2)`, `frames = 1 + id%5`,
    * `fps = (24 + id%2):1`, colorspace C420jpeg; luma byte k of frame f
    * is `(id·13 + 5f + 3k) mod 256`, chroma byte k (U then V
    * concatenated) is `(id·17 + 7f + k) mod 256`. The oracle replays
    * these sums from the id alone — a wrong plane boundary, frame
    * stride, or header parse shows up as a hash mismatch. */
  def plantedY4m(spark: SparkSession, documents: DataFrame): Dataset[Media] = {
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (2 * (1 + id % 3)).toInt
      val h = (2 * (1 + id % 2)).toInt
      val frames = (1 + id % 5).toInt
      val fps = (24 + id % 2).toInt
      val header = s"YUV4MPEG2 W$w H$h F$fps:1 Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII")
      val ySize = w * h
      val uvSize = 2 * (w / 2) * (h / 2)
      val out = new java.io.ByteArrayOutputStream(
        header.length + frames * (6 + ySize + uvSize))
      out.write(header, 0, header.length)
      var f = 0
      while (f < frames) {
        out.write("FRAME\n".getBytes("US-ASCII"), 0, 6)
        var k = 0
        while (k < ySize) {
          out.write(((id * 13 + 5L * f + 3L * k) % 256).toInt)
          k += 1
        }
        k = 0
        while (k < uvSize) {
          out.write(((id * 17 + 7L * f + k) % 256).toInt)
          k += 1
        }
        f += 1
      }
      Media(id, "video", out.toByteArray)
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
