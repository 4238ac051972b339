package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.sources.TxTable
import org.apache.spark.sql.functions._

/** The transactional manifest-log table: commit atomicity, snapshot
  * isolation, optimistic-concurrency conflicts, and time travel. */
class TxTableSpec extends SparkSpec {

  private def tmpTable(): String =
    Files.createTempDirectory("graft-txspec-").toString + "/tbl"

  private def frame(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, s"p$i")).toDF("id", "payload")
  }

  test("overwrite then append then overwrite: every snapshot readable") {
    val tbl = tmpTable()
    assert(TxTable.commit(frame(1L, 2L), tbl, "overwrite") == 1L)
    assert(TxTable.commit(frame(3L), tbl, "append") == 2L)
    assert(TxTable.commit(frame(9L), tbl, "overwrite") == 3L)
    def ids(v: Long) = TxTable.readVersion(spark, tbl, v)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(1L) == Set(1L, 2L))
    assert(ids(2L) == Set(1L, 2L, 3L))
    assert(ids(3L) == Set(9L))
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).toSet == Set(9L))
    assert(TxTable.latestVersion(tbl).contains(3L))
  }

  test("a racing writer loses the version exactly once, loudly") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    // simulate the race: another writer already published v2
    val log = Paths.get(tbl).resolve("_txlog")
    Files.write(log.resolve("v00002.json"),
      Files.readAllBytes(log.resolve("v00001.json")))
    intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.commit(frame(2L), tbl, "append"))
    // the losing commit left no manifest and no temp file behind
    val names = Files.list(log).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(names == Seq("v00001.json", "v00002.json"))
  }

  test("append with a mismatched schema is rejected loudly") {
    import spark.implicits._
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    val e = intercept[IllegalArgumentException](TxTable.commit(
      Seq((1L, 2.5)).toDF("id", "score"), tbl, "append"))
    assert(e.getMessage.contains("schema"))
    // overwrite MAY change the schema (it defines a new snapshot)
    TxTable.commit(Seq((1L, 2.5)).toDF("id", "score"), tbl, "overwrite")
    assert(TxTable.read(spark, tbl).columns.toSeq == Seq("id", "score"))
  }

  test("reading a never-committed table fails loudly; data files immutable") {
    val tbl = tmpTable()
    intercept[IllegalStateException](TxTable.read(spark, tbl))
    TxTable.commit(frame(1L), tbl, "overwrite")
    val before = Files.walk(Paths.get(tbl, "data")).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.toString).toSet
    TxTable.commit(frame(2L), tbl, "overwrite")
    val after = Files.walk(Paths.get(tbl, "data")).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.toString).toSet
    // overwrite added files but deleted nothing: v1 stays time-travelable
    assert(before.subsetOf(after) && after.size > before.size)
    assert(TxTable.readVersion(spark, tbl, 1L).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L))
  }

  test("empty-frame commit round-trips schema without files") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L).filter(lit(false)), tbl, "overwrite")
    val out = TxTable.read(spark, tbl)
    assert(out.columns.toSeq == Seq("id", "payload") && out.count() == 0L)
  }

  test("diff: inserts and deletes labeled; identical versions diff empty") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L, 2L), tbl, "overwrite")
    TxTable.commit(frame(3L), tbl, "append")
    TxTable.commit(frame(2L, 9L), tbl, "overwrite")
    val d13 = TxTable.diff(spark, tbl, 1L, 3L)
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    assert(d13 == Set(("insert", 9L), ("delete", 1L))) // 2 survives both
    assert(TxTable.diff(spark, tbl, 2L, 2L).count() == 0L)
  }

  test("diff: multiset semantics count duplicate rows exactly") {
    val tbl = tmpTable()
    TxTable.commit(frame(7L), tbl, "overwrite")
    TxTable.commit(frame(7L, 7L, 7L), tbl, "overwrite") // same row 3x
    val d = TxTable.diff(spark, tbl, 1L, 2L).collect()
    assert(d.length == 2 && d.forall(_.getString(2) == "insert"))
  }

  test("diff across a schema change is rejected loudly") {
    import spark.implicits._
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    TxTable.commit(Seq((1L, 2.5)).toDF("id", "score"), tbl, "overwrite")
    intercept[IllegalArgumentException](TxTable.diff(spark, tbl, 1L, 2L))
  }
}
