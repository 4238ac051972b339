package graft

import java.nio.file.Files

import graft.sources.{TxPartitionedScan, TxTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning on the partitioned tx scan
  * (TxPartitionedScan + SupportsRuntimeV2Filtering): a fact-dim join
  * whose dim filter selects a handful of partition values must not
  * scan every fact partition — Catalyst injects a dynamic subquery on
  * the dim broadcast, BatchScanExec hands the materialized keys back
  * as V2 IN predicates, and the scan drops whole value groups BEFORE
  * any parquet footer is opened. */
class TxDppSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("txdpp-").toString + "/tbl"

  /** Collect TxPartitionedScans, descending through AQE query stages
    * (QueryStageExec is leaf-like; plain collect stops at it). */
  private def txScans(plan: SparkPlan): Seq[TxPartitionedScan] = {
    val here = plan match {
      case b: BatchScanExec => Seq(b.scan).collect {
        case s: TxPartitionedScan => s }
      case _ => Nil
    }
    val kids: Seq[SparkPlan] = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case other => other.children
    }
    here ++ kids.flatMap(txScans)
  }

  private def fixture(): (String, DataFrame) = {
    import spark.implicits._
    val tbl = tmp()
    val fact = (1 to 300).map(i =>
      (i.toLong, Seq("en", "de", "fr")(i % 3), i * 10L))
      .toDF("id", "lang", "chars")
    TxTable.commit(fact, tbl, "overwrite", partitionBy = Some(Seq("lang")))
    // the dim must be FILE-backed: an in-memory LocalRelation folds its
    // filter away before PartitionPruning runs, and DPP requires a
    // selective Filter node on the dim side (the real fact-dim shape)
    val dimDir = Files.createTempDirectory("txdpp-dim-").toString
    Seq(("en", "keep"), ("de", "drop"), ("fr", "drop"))
      .toDF("lang", "flag").write.mode("overwrite").parquet(dimDir)
    (tbl, spark.read.parquet(dimDir))
  }

  test("fact-dim join prunes fact value groups at runtime") {
    val (tbl, dim) = fixture()
    val wh = tbl.stripSuffix("/tbl")
    spark.conf.set("spark.sql.catalog.txdpp", "graft.sources.TxCatalog")
    spark.conf.set("spark.sql.catalog.txdpp.root", wh)
    dim.createOrReplaceTempView("txdpp_dim")
    val q = spark.sql(
      """SELECT f.id, f.chars FROM txdpp.tbl f
        |JOIN txdpp_dim d ON f.lang = d.lang
        |WHERE d.flag = 'keep'""".stripMargin)
    val rows = q.collect()
    // correctness first: exactly the en slice
    assert(rows.length == 100)
    assert(rows.map(_.getLong(0) % 3).forall(_ == 0))
    // the optimizer injected a dynamic pruning subquery on the scan
    assert(q.queryExecution.executedPlan.toString
      .toLowerCase.contains("dynamicpruning"),
      "expected a dynamic pruning subquery on the tx scan")
    // and the scan planned ONLY the matching value group — the de/fr
    // groups were dropped before any parquet footer was opened
    val scans = txScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a TxPartitionedScan in the plan")
    assert(scans.exists(s => s.plannedGroups == 1 && s.runtimePruned > 0),
      s"expected 1 planned group with pruning, got " +
        scans.map(s => (s.plannedGroups, s.runtimePruned)).mkString(","))
  }

  test("DPP result equals the non-DPP plan; unknown shapes keep everything") {
    val (tbl, dim) = fixture()
    val wh = tbl.stripSuffix("/tbl")
    spark.conf.set("spark.sql.catalog.txdpp2", "graft.sources.TxCatalog")
    spark.conf.set("spark.sql.catalog.txdpp2.root", wh)
    dim.createOrReplaceTempView("txdpp2_dim")
    def run() = spark.sql(
      """SELECT f.id, f.chars, d.flag FROM txdpp2.tbl f
        |JOIN txdpp2_dim d ON f.lang = d.lang
        |WHERE d.flag <> 'keep'
        |ORDER BY f.id""".stripMargin)
    val withDpp = run().collect()
    val old = spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val without = try run().collect() finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", old)
    assert(withDpp.toSeq == without.toSeq)
    assert(withDpp.length == 200) // de + fr
  }

  test("a runtime filter never prunes the null-valued group (kept conservatively)") {
    import spark.implicits._
    val tbl = tmp()
    val fact = Seq((1L, "en", 10L), (2L, null.asInstanceOf[String], 20L),
      (3L, "de", 30L)).toDF("id", "lang", "chars")
    TxTable.commit(fact, tbl, "overwrite", partitionBy = Some(Seq("lang")))
    val wh = tbl.stripSuffix("/tbl")
    spark.conf.set("spark.sql.catalog.txdpp3", "graft.sources.TxCatalog")
    spark.conf.set("spark.sql.catalog.txdpp3.root", wh)
    Seq(("en", 1)).toDF("lang", "w").createOrReplaceTempView("txdpp3_dim")
    val q = spark.sql(
      """SELECT f.id FROM txdpp3.tbl f
        |JOIN txdpp3_dim d ON f.lang = d.lang""".stripMargin)
    // a null partition key can never join — correctness is unaffected
    // whether or not the group is planned; only the en row survives
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
