package graft

import graft.exec.{Sanitizer, Sinks}
import org.apache.spark.sql.functions._

/** SURVEY.md §1.2 sanitizer (stringify the non-JSON-native) + §2.5 sinks. */
class SanitizerSinksSpec extends SparkSpec {

  private lazy val mixed = {
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "s")
      .withColumn("ts", to_timestamp(lit("2024-03-01 12:34:56")))
      .withColumn("d", to_date(lit("2024-03-01")))
      .withColumn("dec", lit(java.math.BigDecimal.valueOf(12.34)))
      .withColumn("bin", lit("AB".getBytes("UTF-8")))
  }

  test("sanitize: timestamp/date/decimal to string, binary to base64") {
    val out = Sanitizer.sanitize(mixed)
    val types = out.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("ts") == "string" && types("d") == "string" &&
      types("dec") == "string" && types("bin") == "string")
    val r = out.head()
    assert(r.getString(2) == "2024-03-01 12:34:56")
    assert(r.getString(3) == "2024-03-01")
    assert(r.getString(4) == "12.34")
    assert(r.getString(5) == java.util.Base64.getEncoder.encodeToString("AB".getBytes))
    // JSON-native columns untouched
    assert(r.getLong(0) == 1L && r.getString(1) == "x")
  }

  test("frameSample: chunking, stride, and byte features") {
    import spark.implicits._
    val bytes = Array.tabulate[Byte](130)(i => (i % 7).toByte) // 3 chunks of 64
    val media = Seq(graft.ext.Multimodal.Media(1L, "video", bytes)).toDS()
    val frames = graft.ext.Multimodal.frameSample(media, frameBytes = 64, step = 2)
      .collect().sortBy(_.frame_idx)
    // chunks 0,1,2 exist; stride 2 keeps 0 and 2; chunk 2 has 130-128=2 bytes
    assert(frames.map(f => (f.frame_idx, f.n_bytes)).toSeq == Seq((0L, 64L), (2L, 2L)))
    assert(frames(0).byte_sum == (0 until 64).map(_ % 7).sum)
    assert(frames(1).byte_sum == (128 until 130).map(_ % 7).sum)
  }

  test("jsonRows: sanitized toJSON envelope rows") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    assert(Sinks.jsonRows(df).as[String].collect().toSeq ==
      Seq("""{"id":1,"name":"a"}"""))
  }

  test("csv sink: single header file; sharded sink: one file per partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Sinks.csv(employees, s"$dir/one")
    val files = new java.io.File(s"$dir/one").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head == "emp_id,name,age,department,salary,experience_years")
    assert(lines.length == 6) // header + 5 rows

    Sinks.csvSharded(employees.repartition(3), s"$dir/sharded")
    val shards = new java.io.File(s"$dir/sharded").listFiles()
      .count(_.getName.endsWith(".csv"))
    assert(shards == 3)
  }
}
