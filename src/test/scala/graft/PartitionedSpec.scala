package graft

import graft.sources.Partitioned
import org.apache.spark.sql.functions._

/** Partitioned-layout round trip: values survive, and a partition
  * predicate prunes the scan to matching directories. */
class PartitionedSpec extends SparkSpec {

  test("write/read round trip preserves rows; filter prunes partitions") {
    import spark.implicits._
    val df = Seq((1L, "en", 10L), (2L, "es", 20L), (3L, "en", 30L))
      .toDF("doc_id", "lang", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-part-test-")
      .toString
    Partitioned.write(df, "lang", tmp)
    // one directory per language
    val dirs = new java.io.File(tmp).listFiles().map(_.getName)
      .filter(_.startsWith("lang=")).sorted.toSeq
    assert(dirs == Seq("lang=en", "lang=es"))
    val back = Partitioned.read(spark, tmp).filter(col("lang") === "en")
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
    // the predicate lands in PartitionFilters (directory enumeration),
    // NOT PushedFilters (row-group evaluation inside opened files)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("= en"), plan.take(1500))
  }

  test("vocabEncode: deterministic ids, unknowns are -1, positions align") {
    import spark.implicits._
    val d = Seq((1L, "b a b"), (2L, "a b z")).toDF("doc_id", "text")
    // freqs: b=3, a=2, z=1; vocabSize=2 -> b=1, a=2, z=unknown
    val out = graft.ext.TextStats.vocabEncode(d, "doc_id", "text", 2)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 1L),
      (2L, 0L, 2L), (2L, 1L, 1L), (2L, 2L, -1L)))
  }

  test("vocabEncode: frequency ties rank by term, ids stay in [1, k]") {
    import spark.implicits._
    val d = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val out = graft.ext.TextStats.vocabEncode(d, "doc_id", "text", 10)
      .orderBy("doc_id", "pos").collect().map(_.getLong(2)).toSeq
    // x and y both freq 2: x ranks first lexicographically
    assert(out == Seq(1L, 2L, 1L, 2L))
  }
}
