package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** The REAL decode half of the multimodal path: binary-PPM parsing
  * (header tokenization, comments, malformed rejection) and the
  * planted-payload end-to-end whose oracle is `mm_decode`. */
class MultimodalSpec extends SparkSpec {

  private def ppm(header: String, body: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ body

  test("decodePpm parses a well-formed P6 with comment and whitespace runs") {
    val body = Array[Byte](0, 10, 20, 30, 40, 50) // 2x1 RGB
    val img = ppm("P6 # a comment\n  2\t1\n255\n", body)
    val r = Multimodal.decodePpm(img)
    assert(r.contains(Multimodal.Raster(2, 1, 255, 150L)))
  }

  test("decodePpm ignores trailing bytes past the payload") {
    val body = Array[Byte](1, 2, 3)
    val img = ppm("P6\n1 1\n255\n", body ++ Array[Byte](99, 98))
    assert(Multimodal.decodePpm(img).contains(
      Multimodal.Raster(1, 1, 255, 6L)))
  }

  test("decodePpm refuses malformed inputs instead of guessing") {
    val good = ppm("P6\n1 1\n255\n", Array[Byte](1, 2, 3))
    assert(Multimodal.decodePpm(good).isDefined) // sanity
    // wrong magic (P5 is grayscale pgm)
    assert(Multimodal.decodePpm(ppm("P5\n1 1\n255\n",
      Array[Byte](1, 2, 3))).isEmpty)
    // truncated payload: 2x2 needs 12 bytes
    assert(Multimodal.decodePpm(ppm("P6\n2 2\n255\n",
      Array[Byte](1, 2, 3))).isEmpty)
    // zero dimension
    assert(Multimodal.decodePpm(ppm("P6\n0 1\n255\n",
      Array.empty[Byte])).isEmpty)
    // non-numeric header token
    assert(Multimodal.decodePpm(ppm("P6\nx 1\n255\n",
      Array[Byte](1, 2, 3))).isEmpty)
    // 2-byte-per-sample maxval (unsupported here)
    assert(Multimodal.decodePpm(ppm("P6\n1 1\n65535\n",
      Array[Byte](1, 2, 3, 4, 5, 6))).isEmpty)
    // empty input
    assert(Multimodal.decodePpm(Array.empty[Byte]).isEmpty)
  }

  test("featuresPpm over planted payloads equals the doc_id formula") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 5L, 12L, 34L).toDF("doc_id")
    val got = Multimodal.featuresPpm(Multimodal.plantedPpm(spark, docs))
      .collect().map(f =>
        f.id -> ((f.width, f.height, f.pixel_sum, f.pixel_mean_q4))).toMap
    val want = Seq(0L, 1L, 5L, 12L, 34L).map { id =>
      val w = 1 + id % 7
      val h = 1 + id % 5
      val n = w * h * 3
      val ps = (0L until n).map(k => (id * 31 + 7 * k) % 256).sum
      id -> ((w, h, ps, (ps * 10000 + n / 2) / n))
    }.toMap
    assert(got == want)
  }

  test("featuresPpm drops undecodable rows (dead-letter split)") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(1L, "image", "P6\n1 1\n255\nABC".getBytes("US-ASCII")),
      Multimodal.Media(2L, "image", "not a ppm".getBytes("US-ASCII"))).toDS()
    val out = Multimodal.featuresPpm(media).collect()
    assert(out.map(_.id).toSeq == Seq(1L))
    assert(out.head.pixel_sum == ('A'.toLong + 'B' + 'C'))
  }

  test("plantedPpm payloads decode to their own formula (round trip)") {
    import spark.implicits._
    val docs = spark.range(0, 40).select(col("id").as("doc_id"))
    val medias = Multimodal.plantedPpm(spark, docs).collect()
    assert(medias.length == 40)
    medias.foreach { m =>
      val r = Multimodal.decodePpm(m.bytes)
      assert(r.isDefined, s"id=${m.id} failed to decode")
      assert(r.get.width == 1 + m.id % 7)
      assert(r.get.height == 1 + m.id % 5)
    }
  }
}
