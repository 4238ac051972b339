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

}
