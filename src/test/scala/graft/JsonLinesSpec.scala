package graft

import graft.sources.JsonLines
import org.apache.spark.sql.functions._

/** JSONL sink/source round trip: quoting, escapes, nested-JSON strings,
  * numerics, and nulls must all survive serialize → parse. */
class JsonLinesSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-jsonl-spec-").toString

  test("roundTrip: values identical, including quoting torture cases") {
    val df = Seq(
      (1L, """{"k": 1, "s": "a b"}""", "plain"),
      (2L, """line with "quotes" and \backslash""", "tab\there"),
      (3L, null.asInstanceOf[String], "unicode: é 中 ♥")
    ).toDF("id", "props", "note")
    val back = JsonLines.roundTrip(df, tmpDir())
    // names and types survive; nullability does not (a JSON source reads
    // every field nullable — absent keys are legal in every line)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("roundTrip: long and double fidelity") {
    val df = Seq((Long.MaxValue, 0.1 + 0.2, -0.0),
      (Long.MinValue + 1, 1.7976931348623157e308, 4.9e-324))
      .toDF("l", "d1", "d2")
    val back = JsonLines.roundTrip(df, tmpDir()).orderBy("l").collect()
    val orig = df.orderBy("l").collect()
    assert(back.map(_.toSeq).toSeq == orig.map(_.toSeq).toSeq)
  }

  test("read: FAILFAST surfaces a malformed line loudly") {
    val dir = tmpDir()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"id\": 1}\nnot json at all\n".getBytes("UTF-8"))
    val schema = Seq((1L)).toDF("id").schema
    val ex = intercept[Exception] {
      JsonLines.read(spark, schema, dir).collect()
    }
    assert(ex.getMessage != null)
  }

  test("read: explicit schema means no inference pass (scan plans once)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val dir = tmpDir()
    df.write.mode("overwrite").json(dir)
    // filter + projection stay narrow over the schema-enforced source
    val back = JsonLines.read(spark, df.schema, dir)
      .filter(col("id") > 1).select("s")
    assert(back.collect().map(_.getString(0)).toSeq == Seq("b"))
  }
}
