package graft

import graft.ext.Multimodal
import org.scalacheck.{Gen, Prop, Properties}

/** Properties for the round-12 work, checked against independent
  * in-memory models on random inputs:
  *  - every decoder is TOTAL (returns an Option, never throws) on
  *    arbitrary garbage AND on bit-flipped corruptions of valid
  *    payloads — the repair-cascade discipline applied to codecs;
  *  - the WAV round trip is exact: random PCM16 clips encoded by the
  *    JDK's independent `javax.sound` writer decode to the precise
  *    amplitude stats an in-memory fold computes from the raw samples. */
object Round12PropertySpec extends Properties("round12") {

  // ------------------------------------------------------ WAV round trip
  private case class Clip(channels: Int, rate: Int, samples: Array[Short])

  private val genClip: Gen[Clip] = for {
    channels <- Gen.choose(1, 2)
    rate <- Gen.oneOf(8000, 16000, 44100)
    frames <- Gen.choose(1, 200)
    samples <- Gen.listOfN(frames * channels,
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort))
  } yield Clip(channels, rate, samples.toArray)

  private def encodeJdk(c: Clip): Array[Byte] = {
    val pcm = new Array[Byte](c.samples.length * 2)
    var k = 0
    while (k < c.samples.length) {
      pcm(2 * k) = (c.samples(k) & 0xff).toByte
      pcm(2 * k + 1) = ((c.samples(k) >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      c.rate.toFloat, 16, c.channels, true, false)
    val out = new java.io.ByteArrayOutputStream()
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      (c.samples.length / c.channels).toLong)
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out): Unit
    out.toByteArray
  }

  property("decodeWav inverts the JDK encoder with exact amplitude stats") =
    Prop.forAll(genClip) { c =>
      val got = Multimodal.decodeWav(encodeJdk(c))
      val want = Multimodal.AudioClip(c.channels, c.rate,
        (c.samples.length / c.channels).toLong,
        c.samples.map(s => math.abs(s.toInt).toLong).sum,
        c.samples.map(s => math.abs(s.toInt).toLong).max)
      got.contains(want)
    }

  // ------------------------------------------------- decoder totality
  private val genBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)

  /** A valid payload with a few random byte flips — the adversarial
    * input class a fuzzer finds first (mostly-valid headers). */
  private def corrupt(valid: Array[Byte]): Gen[Array[Byte]] = for {
    n <- Gen.choose(1, 4)
    idxs <- Gen.listOfN(n, Gen.choose(0, math.max(0, valid.length - 1)))
    vals <- Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))
  } yield {
    val b = valid.clone()
    idxs.zip(vals).foreach { case (i, v) => if (b.nonEmpty) b(i) = v }
    b
  }

  private val validWav: Array[Byte] =
    encodeJdk(Clip(2, 8000, Array.tabulate(64)(k => (k * 991).toShort)))
  private val validPpm: Array[Byte] =
    ("P6\n4 3\n255\n" + "x" * 36).getBytes("US-ASCII")
  private val validPng: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out): Unit
    out.toByteArray
  }

  property("decodeWavMeta agrees with the full decoder, amp stats aside") =
    Prop.forAll(genClip) { c =>
      val bytes = encodeJdk(c)
      val full = Multimodal.decodeWav(bytes)
      val meta = Multimodal.decodeWavMeta(bytes)
      meta.map(m => (m.channels, m.sampleRate, m.frames)) ==
        full.map(f => (f.channels, f.sampleRate, f.frames)) &&
        meta.forall(m => m.ampSum == -1L && m.ampMax == -1L)
    }

  property("decodeWavMeta is total on garbage and corrupted payloads") =
    Prop.forAll(Gen.oneOf(genBytes, corrupt(validWav))) { b =>
      Multimodal.decodeWavMeta(b); true
    }

  property("decodeWav is total on garbage and corrupted payloads") =
    Prop.forAll(Gen.oneOf(genBytes, corrupt(validWav))) { b =>
      Multimodal.decodeWav(b); true // Option out, no throw
    }

  property("decodePpm is total on garbage and corrupted payloads") =
    Prop.forAll(Gen.oneOf(genBytes, corrupt(validPpm))) { b =>
      Multimodal.decodePpm(b); true
    }

  property("decodeImage is total on garbage and corrupted payloads") =
    Prop.forAll(Gen.oneOf(genBytes, corrupt(validPng))) { b =>
      Multimodal.decodeImage(b); true
    }

  property("decodePngHeader agrees with the full decoder on real PNGs") =
    Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 30)) { (w, h) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out): Unit
      val hdr = Multimodal.decodePngHeader(out.toByteArray)
      hdr.contains(Multimodal.PngHeader(w, h, 8, 2))
    }

  property("decodePngHeader is total on garbage and corrupted payloads") =
    Prop.forAll(Gen.oneOf(genBytes, corrupt(validPng))) { b =>
      Multimodal.decodePngHeader(b); true
    }

  // ------------------------------------------------- Y4M video parse
  private case class Vid(w: Int, h: Int, fn: Int, fd: Int,
                         frames: Seq[Array[Byte]]) // per frame: Y then UV

  private val genVid: Gen[Vid] = for {
    w <- Gen.choose(1, 4).map(_ * 2) // C420 needs even dims
    h <- Gen.choose(1, 3).map(_ * 2)
    fn <- Gen.choose(1, 60)
    fd <- Gen.choose(1, 2)
    n <- Gen.choose(1, 6)
    frames <- Gen.listOfN(n, Gen.listOfN(w * h + w * h / 2,
      Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
  } yield Vid(w, h, fn, fd, frames)

  private def encodeY4m(v: Vid): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W${v.w} H${v.h} F${v.fn}:${v.fd} Ip A0:0 C420jpeg\n"
      .getBytes("US-ASCII"))
    v.frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(f)
    }
    out.toByteArray
  }

  property("decodeY4m recovers exact per-sampled-frame plane sums") =
    Prop.forAll(genVid, Gen.choose(1, 3)) { (v, step) =>
      val got = Multimodal.decodeY4m(encodeY4m(v), step)
      val ySize = v.w * v.h
      val want = v.frames.zipWithIndex.collect {
        case (f, i) if i % step == 0 =>
          (i, f.take(ySize).map(b => (b & 0xff).toLong).sum,
            f.drop(ySize).map(b => (b & 0xff).toLong).sum)
      }
      got.contains(Multimodal.Y4mClip(v.w, v.h, v.fn, v.fd, want))
    }

  property("decodeY4m handles C444/mono plane geometry and rejects C422") =
    Prop.forAll(Gen.oneOf("444", "mono", "422"), Gen.choose(1, 4),
      Gen.choose(1, 4), Gen.choose(1, 3), Gen.choose(0L, Long.MaxValue)) {
      (cs, w, h, n, seed) =>
        val frameSize = cs match {
          case "444"  => w * h * 3
          case "mono" => w * h
          case _      => w * h * 2 // 422's geometry, which must be refused
        }
        val rnd = new scala.util.Random(seed)
        val frames = Seq.fill(n)(Array.fill(frameSize)(rnd.nextInt(256).toByte))
        val out = new java.io.ByteArrayOutputStream()
        out.write(s"YUV4MPEG2 W$w H$h F30:1 C$cs\n".getBytes("US-ASCII"))
        frames.foreach { f => out.write("FRAME\n".getBytes("US-ASCII")); out.write(f) }
        val got = Multimodal.decodeY4m(out.toByteArray, 1)
        if (cs == "422") got.isEmpty // refuse, don't guess plane geometry
        else {
          val ySize = w * h
          val want = frames.zipWithIndex.map { case (f, i) =>
            (i, f.take(ySize).map(b => (b & 0xff).toLong).sum,
              f.drop(ySize).map(b => (b & 0xff).toLong).sum)
          }
          got.contains(Multimodal.Y4mClip(w, h, 30, 1, want))
        }
    }

  property("decodeY4m step-s output is the step-1 output filtered") =
    Prop.forAll(genVid, Gen.choose(2, 4)) { (v, step) =>
      val all = Multimodal.decodeY4m(encodeY4m(v), 1).get.sampled
      val some = Multimodal.decodeY4m(encodeY4m(v), step).get.sampled
      some == all.filter(_._1 % step == 0)
    }

  private val validY4m: Array[Byte] =
    encodeY4m(Vid(4, 2, 25, 1, Seq(Array.tabulate(12)(_.toByte))))

  property("decodeY4m is total on garbage and corrupted payloads") =
    Prop.forAll(Gen.oneOf(genBytes, corrupt(validY4m))) { b =>
      Multimodal.decodeY4m(b, 2); true
    }

  // ------------------------------------------------- block-mean resize
  property("blockMeanSum matches a brute-force per-block model") =
    Prop.forAll(Gen.choose(1, 3), Gen.choose(1, 3), Gen.choose(1, 2),
      Gen.choose(0L, Long.MaxValue)) { (bw, bh, factor, seed) =>
      val w = bw * factor
      val h = bh * factor
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val area = factor * factor
      // model: group input channel values by (block, channel) via a map
      val sums = scala.collection.mutable.Map.empty[(Int, Int, Int), Long]
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        sums.updateWith((y / factor, x / factor, c))(o =>
          Some(o.getOrElse(0L) + (px(3 * (y * w + x) + c) & 0xff)))
      val want = sums.values.map(s => (s + area / 2) / area).sum
      Multimodal.blockMeanSum(w, h, px, factor)
        .contains((w / factor, h / factor, want))
    }

  property("blockMeanSum refuses non-divisible dimensions") =
    Prop.forAll(Gen.choose(1, 5), Gen.choose(1, 5)) { (w, h) =>
      val px = new Array[Byte](w * h * 3)
      val r = Multimodal.blockMeanSum(w, h, px, 2)
      r.isDefined == (w % 2 == 0 && h % 2 == 0)
    }

  // ----------------------------------------- CellArgmin null-slot rule
  /** A null element slot must null the whole cell id (the interpreted
    * aggregate+array_min it replaced propagated null), while clean rows
    * in the same frame still assign — exercised through a real plan so
    * the containsNull=true codegen branch runs, not just nullSafeEval. */
  property("cell_argmin nulls rows with null slots, assigns clean rows") =
    Prop.forAll(Gen.choose(1, 5)) { nullAt0 =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, element_at}
      val cents = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))
      // arrays built via element_at tricks keep containsNull=true; row 1
      // holds a null slot, row 2 is clean and nearest cell 1
      val df = Seq((1L, Seq(Some(1.0), None)), (2L, Seq(Some(9.0), Some(9.0))))
        .toDF("id", "v")
        .select(col("id"), graft.functions.VectorFunctions.cell_argmin(
          col("v"), cents).as("cell"))
      val rows = df.orderBy("id").collect()
      rows(0).isNullAt(1) && rows(1).getInt(1) == 1
    }
}
