package graft

import graft.sources.TxTable

class ProbeMergeSpec extends SparkSpec {
  test("probe merge evolution alignment") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("probe-wh-").toString
    spark.conf.set("spark.sql.catalog.txprobe", "graft.sources.TxCatalog")
    spark.conf.set("spark.sql.catalog.txprobe.root", wh)
    val tbl = s"$wh/db/p"
    TxTable.commit(
      Seq((1L, 5L, "en"), (2L, 7L, "de")).toDF("id", "n", "lang"),
      tbl, "overwrite", partitionBy = Some(Seq("lang")))
    Seq((2L, "de", 70L, true), (3L, "fr", 9L, false))
      .toDF("id", "lang", "n", "flag")
      .createOrReplaceTempView("probe_src")
    val parsed = spark.sessionState.sqlParser.parsePlan(
      """MERGE WITH SCHEMA EVOLUTION INTO txprobe.db.p t
        |USING probe_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val analyzed = spark.sessionState.analyzer.executeAndCheck(parsed,
      new org.apache.spark.sql.catalyst.QueryPlanningTracker())
    println("=== ANALYZED ===")
    println(analyzed.treeString.take(6000))
  }
}
