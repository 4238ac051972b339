package graft

import graft.ext.Pii
import org.apache.spark.sql.functions._

/** PII census/redaction and domain stats on hand-checkable strings. */
class PiiSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "mail bob@corp.io or sue@corp.io, call 555-123-4567"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 no contact"),
      (3L, "clean text with nothing sensitive"),
      (4L, "see https://a.example.org/x and http://b.example.org then https://a.example.org/y")
    ).toDF("doc_id", "text")
  }

  test("scanRedact: counts per category and has_pii flag") {
    val r = Pii.scanRedact(docs, "doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(r(0) == ((2L, 1L, 0L, true)))
    assert(r(1) == ((0L, 0L, 2L, true)))
    assert(r(2) == ((0L, 0L, 0L, false)))
    assert(r(3) == ((0L, 0L, 0L, false)))
  }

  test("scanRedact: all matches replaced, clean text untouched") {
    val red = Pii.scanRedact(docs, "doc_id", "text").orderBy("doc_id")
      .select("redacted").collect().map(_.getString(0))
    assert(red(0) == "mail <EMAIL> or <EMAIL>, call <PHONE>")
    assert(red(1) == "server at <IP> and <IP> no contact")
    assert(red(2) == "clean text with nothing sensitive")
  }

  test("domainStats: host extraction, mention vs distinct-doc counts") {
    val more = docs.union(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(5L, "also https://a.example.org/z"))),
        docs.schema))
    val r = Pii.domainStats(more, "doc_id", "text")
      .orderBy(col("n_mentions").desc, col("domain")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a.example.org: 3 mentions across docs 4 and 5; b.example.org: 1/1
    assert(r.toSeq == Seq(("a.example.org", 3L, 2L), ("b.example.org", 1L, 1L)))
  }
}
