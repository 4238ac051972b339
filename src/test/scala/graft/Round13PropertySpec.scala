package graft

import graft.ext.Multimodal
import org.scalacheck.{Gen, Prop, Properties}

/** Properties for the round-13 work:
  *  - the JPEG SOF marker walk agrees with the JDK's full decoder on
  *    real JPEGs it never produced (random dims, both writers' quality
  *    settings) and is TOTAL on garbage and corrupted payloads;
  *  - truncating a valid JPEG anywhere inside the header region makes
  *    the walk refuse (None), never mis-read. */
object Round13PropertySpec extends Properties("round13") {

  // 40 trials suite-wide: the stats/bloom properties each write real
  // parquet (and the bloom one runs a full distributed commit) per
  // trial — the default 100 triples suite wall time for no extra
  // coverage class (the ComponentsPropertySpec discipline)
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(40)

  private def rmTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) rmTree(it.next())
      } finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p): Unit
  }

  private def encodeJpeg(w: Int, h: Int, seed: Long,
                         quality: Option[Float]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt() & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    quality match {
      case None =>
        require(javax.imageio.ImageIO.write(img, "jpg", out))
      case Some(q) =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(q)
        val ios = javax.imageio.ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
        writer.dispose(); ios.close()
    }
    out.toByteArray
  }

  private val genDims: Gen[(Int, Int, Long, Option[Float])] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
    seed <- Gen.choose(0L, Long.MaxValue)
    q <- Gen.oneOf(None, Some(0.3f), Some(0.95f))
  } yield (w, h, seed, q)

  property("decodeJpegHeader agrees with the JDK decoder on real JPEGs") =
    Prop.forAll(genDims) { case (w, h, seed, q) =>
      val bytes = encodeJpeg(w, h, seed, q)
      val hdr = Multimodal.decodeJpegHeader(bytes)
      val full = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      hdr.exists(p => p.width == full.getWidth && p.height == full.getHeight &&
        p.precision == 8 && p.components == 3)
    }

  property("decodeJpegHeader refuses every header-region truncation") =
    Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 40)) { (w, h) =>
      val bytes = encodeJpeg(w, h, 7L, None)
      // find the SOF offset so we only truncate inside the header walk
      // (truncating after the SOF still parses — trailing entropy data
      // is beyond the fast path's contract, like decodePpm's trailing
      // bytes)
      val sof = bytes.indices.find(i =>
        (bytes(i) & 0xff) == 0xff && i + 1 < bytes.length &&
          (bytes(i + 1) & 0xff) == 0xc0).getOrElse(0)
      (0 to math.min(sof + 7, bytes.length - 1)).forall(n =>
        Multimodal.decodeJpegHeader(bytes.take(n)).isEmpty)
    }

  // ---------------------------------------- manifest stats / blooms
  // (these need a SparkSession; each trial writes real parquet and
  // cleans its scratch up — see overrideParameters above)

  private def withParquet[A](rows: Seq[(Long, Double, String)])(
      f: (java.nio.file.Path, org.apache.spark.sql.DataFrame) => A): A = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r13-stats-")
    try {
      val df = rows.toDF("id", "v", "s").coalesce(1)
      df.write.mode("overwrite").parquet(dir.toString)
      val listing = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        val p = listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        f(p, df)
      } finally listing.close()
    } finally rmTree(dir)
  }

  private val genRows: Gen[List[(Long, Double, String)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.choose(-1000000L, 1000000L)
      v <- Gen.oneOf(Gen.choose(-1e6, 1e6), Gen.const(0.0), Gen.const(-0.0))
      s <- Gen.alphaNumStr.map(_.take(20))
    } yield (id, v, s))

  property("forFile stats bracket every row the engine computes") =
    Prop.forAllNoShrink(genRows) { rows =>
      withParquet(rows) { (p, df) =>
        val schema = df.schema
        val st = graft.sources.TxStats.forFile(p, schema)
        val ids = rows.map(_._1)
        val vs = rows.map(_._2)
        val ss = rows.map(_._3)
        // min/max recorded must be TRUE bounds of the written rows —
        // anything tighter would license a wrong skip
        st.get("id").forall(c =>
          c.min.toLong <= ids.min && c.max.toLong >= ids.max) &&
        st.get("v").forall(c =>
          c.min.toDouble <= vs.min && c.max.toDouble >= vs.max) &&
        st.get("s").forall(c => ss.nonEmpty &&
          c.min <= ss.min && c.max >= ss.max)
      }
    }

  property("excludes never skips a file holding a matching row") =
    Prop.forAllNoShrink(genRows, Gen.choose(0, 1000)) { (rows, pick) =>
      withParquet(rows) { (p, df) =>
        import org.apache.spark.sql.sources._
        val st = graft.sources.TxStats.forFile(p, df.schema)
        val (id, v, s) = rows(pick % rows.length)
        // a literal taken FROM the file can never be excluded
        Seq[Filter](EqualTo("id", id), GreaterThanOrEqual("id", id),
          LessThanOrEqual("id", id), EqualTo("v", v), EqualTo("s", s),
          In("id", Array[Any](id, 999999999L)),
          And(EqualTo("id", id), EqualTo("s", s)))
          .forall(f => !graft.sources.TxStats.excludes(st, df.schema, f))
      }
    }

  property("file blooms have no false negatives on committed keys") =
    Prop.forAllNoShrink(genRows) { rows =>
      val spark = TestSpark.spark
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("r13-bloom-")
      try {
        val tbl = s"$dir/t"
        graft.sources.TxTable.commit(
          rows.toDF("id", "v", "s").coalesce(1), tbl, "overwrite",
          bloomColumns = Seq("id", "s"))
        import org.apache.spark.sql.sources.EqualTo
        val m = graft.sources.TxTable.readManifest(
          java.nio.file.Paths.get(tbl), 1L)
        m.files.forall { f =>
          val bl = m.blooms.getOrElse(f, Map.empty)
          rows.forall { case (id, _, s) =>
            !graft.sources.TxStats.bloomExcludes(bl, EqualTo("id", id)) &&
              !graft.sources.TxStats.bloomExcludes(bl, EqualTo("s", s))
          }
        }
      } finally rmTree(dir)
    }

  // ----------------------------------------------------- html strip
  private val genTextPiece: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(" "),
      Gen.const("AT&T"), Gen.const("a & b"))

  private val genHtmlDoc: Gen[(String, String)] = {
    // (html, expectedText) built together from a well-formed grammar
    val piece: Gen[(String, String)] = Gen.frequency(
      4 -> genTextPiece.map(t => (t, t)),
      2 -> genTextPiece.map(t => (s"<b>$t</b>", t)),
      1 -> Gen.const(("<!-- <p>x</p> -->", "")),
      1 -> Gen.const(("<script>if (a<b) {}</script>", "")),
      1 -> Gen.const(("<style>p { x: y }</style>", "")),
      1 -> Gen.const(("&amp;&lt;&gt;&#65;&#x42;", "&<>AB")),
      1 -> Gen.const(("<div class=\"q\">", "")))
    Gen.listOf(piece).map { ps =>
      (ps.map(_._1).mkString, ps.map(_._2).mkString)
    }
  }

  property("html_strip recovers the model text from well-formed docs") =
    Prop.forAll(genHtmlDoc) { case (html, want) =>
      val got = graft.functions.HtmlOps.strip(
        org.apache.spark.unsafe.types.UTF8String.fromString(html))
      got != null && got.toString == want
    }

  property("html_strip is total on arbitrary strings (null, never throw)") =
    Prop.forAll(Gen.listOf(Gen.oneOf('<', '>', '&', ';', '#', 'a', '!',
      '-', '/', 's', 'c', 'r', 'i', 'p', 't', 'x', '1')).map(_.mkString)) { s =>
      graft.functions.HtmlOps.strip(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      true
    }

  private val genBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)

  property("decodeJpegHeader is total on garbage and corrupted payloads") =
    Prop.forAll(genBytes) { b =>
      Multimodal.decodeJpegHeader(b)
      val prefixed = Array(0xff.toByte, 0xd8.toByte) ++ b
      Multimodal.decodeJpegHeader(prefixed)
      true
    }

  property("decodeJpegHeader survives random byte flips in valid JPEGs") =
    Prop.forAll(Gen.choose(1, 30), Gen.choose(1, 30),
      Gen.listOfN(4, Gen.choose(0, Int.MaxValue))) { (w, h, flips) =>
      val bytes = encodeJpeg(w, h, 3L, None)
      flips.foreach(f => bytes(f % bytes.length) =
        (bytes(f % bytes.length) ^ (1 << (f % 8))).toByte)
      Multimodal.decodeJpegHeader(bytes) // must not throw; value free
      true
    }
}
