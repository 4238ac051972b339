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

  test("a racing OVERWRITE loses the version exactly once, loudly") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    // deterministic race: a competitor publishes v2 between this
    // overwrite's version computation and its publish. An overwrite
    // defines the whole new snapshot against a vanished head, so it
    // must NOT auto-rebase — retrying would silently truncate the
    // winner's commit.
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.commit(frame(9L), tbl, "overwrite"): Unit)
    intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.commit(frame(2L), tbl, "overwrite", primitive = prim))
    // the losing commit left no manifest and no temp file behind
    val log = Paths.get(tbl).resolve("_txlog")
    val names = Files.list(log).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(names == Seq("v00001.json", "v00002.json"))
    // the winner's snapshot is intact — nothing truncated
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("a racing blind APPEND auto-rebases onto the new head (OCC reconciliation)") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    // deterministic race: while this append publishes, a competitor
    // lands frame(2) first — the append must rebase and commit BOTH
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.commit(frame(2L), tbl, "append"): Unit)
    val v = TxTable.commit(frame(3L), tbl, "append", primitive = prim)
    assert(v == 3L) // landed one past the winner, no manual retry
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // history shows three commits; every version stays readable
    assert(TxTable.versions(tbl) == Seq(1L, 2L, 3L))
    assert(TxTable.readVersion(spark, tbl, 2L).count() == 2L)
  }

  test("append rebase refuses when table METADATA moved under it") {
    // constraints changed concurrently: the staged rows were never
    // validated against the new set — must stay a loud conflict
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.addConstraint(spark, tbl, "pos", "id > 0"): Unit)
    val e = intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.commit(frame(2L), tbl, "append", primitive = prim))
    assert(e.getMessage.contains("cannot rebase"), e.getMessage)
    assert(e.getMessage.contains("constraint"), e.getMessage)
    // nothing half-applied: head is the constraint commit, ids intact
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // and the loser's staged files were reclaimed: the only data dirs
    // left are the ones live manifests reference
    val live = TxTable.readManifest(Paths.get(tbl), 2L).files
      .map(_.split('/')(1)).toSet
    val onDisk = Files.list(Paths.get(tbl).resolve("data")).iterator()
      .asScala.map(_.getFileName.toString).toSet
    assert(onDisk == live)
  }

  test("append rebase refuses when the winner already committed this txn (zombie replay)") {
    // the exactly-once race rebaseAppend must NOT paper over: two
    // writers carry the SAME (appId, batchId) — both passed the sink's
    // lastTxn pre-check — and the loser, if it auto-rebased, would
    // commit the batch a second time, silently duplicating rows
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.commit(frame(2L), tbl, "append",
        txn = Some(("app", 7L))): Unit)
    val e = intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.commit(frame(2L), tbl, "append", txn = Some(("app", 7L)),
        primitive = prim))
    assert(e.getMessage.contains("committed by another writer"),
      e.getMessage)
    // exactly-once held: the batch's row appears ONCE
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(TxTable.lastTxn(tbl, "app").contains(7L))
    // a NEWER batch from the same app still rebases fine (not a replay)
    val prim2 = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.commit(frame(3L), tbl, "append"): Unit)
    val v = TxTable.commit(frame(4L), tbl, "append",
      txn = Some(("app", 8L)), primitive = prim2)
    assert(v == TxTable.latestVersion(tbl).get)
    assert(TxTable.lastTxn(tbl, "app").contains(8L))
  }

  test("compact racing an append rebases: both land, rows = union, winner files kept") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L, 2L), tbl, "overwrite")
    TxTable.commit(frame(3L), tbl, "append")
    var injected = Seq.empty[String]
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => {
        TxTable.commit(frame(9L), tbl, "append"): Unit
        injected = TxTable.readManifest(Paths.get(tbl), 3L).files
      })
    val v = TxTable.compact(spark, tbl, targetBytes = 1L << 30,
      primitive = prim)
    assert(v == 4L)
    // rows unchanged by the compaction, the racing append's row present
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 9L))
    // the winner append's files carried into the rebased manifest
    // verbatim (they were not part of the compaction's consumed set)
    val head = TxTable.readManifest(Paths.get(tbl), 4L)
    val winnerNew = injected.toSet --
      TxTable.readManifest(Paths.get(tbl), 2L).files.toSet
    assert(winnerNew.nonEmpty && winnerNew.subsetOf(head.files.toSet))
    assert(head.op == "compact")
  }

  test("compact refuses rebase when the winner consumed its files (same-file race)") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L, 2L, 3L), tbl, "overwrite")
    // the injected competitor DELETES rows, rewriting the very files the
    // compaction consumed — replaying the compaction would resurrect
    // the deleted row, so the rebase must refuse loudly
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.deleteWhere(spark, tbl,
        Seq(org.apache.spark.sql.sources.EqualTo("id", 2L))): Unit)
    val e = intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.compact(spark, tbl, targetBytes = 1L << 30,
        primitive = prim))
    assert(e.getMessage.contains("consumed"), e.getMessage)
    // the delete won; the failed compaction changed nothing
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("row-level rebase: file-disjoint deletes both land (WriteSerializable)") {
    import org.apache.spark.sql.sources.EqualTo
    val tbl = tmpTable()
    // two files with disjoint id ranges — each delete's read set is one
    // file, selected by the manifest min/max stats
    TxTable.commit(frame(1L, 2L).coalesce(1), tbl, "overwrite")
    TxTable.commit(frame(3L, 4L).coalesce(1), tbl, "append")
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.deleteWhere(spark, tbl, Seq(EqualTo("id", 4L))): Unit)
    val v = TxTable.deleteWhere(spark, tbl, Seq(EqualTo("id", 1L)),
      primitive = prim)
    assert(v == 4L) // landed one past the winner, no refusal
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("row-level rebase: a concurrent add OUTSIDE the predicate rebases, INSIDE refuses") {
    import org.apache.spark.sql.sources.LessThanOrEqual
    val tbl = tmpTable()
    TxTable.commit(frame(1L, 2L, 5L).coalesce(1), tbl, "overwrite")
    // winner appends id=99 — provably outside `id <= 2`, so the delete
    // serializes after it and both land
    val ok = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.commit(frame(99L).coalesce(1), tbl, "append"): Unit)
    val v = TxTable.deleteWhere(spark, tbl,
      Seq(LessThanOrEqual("id", 2L)), primitive = ok)
    assert(v == 3L)
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(5L, 99L))
    // winner appends id=1 — INSIDE the `id <= 5` predicate (which also
    // touches the surviving id=5 file, so the delete really races):
    // serializing after the winner would have deleted that row too, so
    // the lost race must refuse
    val bad = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.commit(frame(1L).coalesce(1), tbl, "append"): Unit)
    val e = intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.deleteWhere(spark, tbl,
        Seq(LessThanOrEqual("id", 5L)), primitive = bad))
    assert(e.getMessage.contains("cannot prove row-free"), e.getMessage)
    // the winner's row survived the refusal intact
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L, 99L))
  }

  test("row-level rebase: an UNCONDITIONAL delete refuses any concurrent add") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.commit(frame(2L), tbl, "append"): Unit)
    val e = intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.deleteWhere(spark, tbl, Seq.empty, primitive = prim))
    assert(e.getMessage.contains("no prunable predicate"), e.getMessage)
  }

  test("row-level rewrites still refuse ANY lost race (update-vs-update)") {
    import org.apache.spark.sql.sources.EqualTo
    val tbl = tmpTable()
    TxTable.commit(frame(1L, 2L), tbl, "overwrite")
    // two DELETEs racing on the SAME file: the loser must NOT rebase —
    // its predicate was evaluated against a snapshot the winner rewrote
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.deleteWhere(spark, tbl, Seq(EqualTo("id", 1L))): Unit)
    intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.deleteWhere(spark, tbl, Seq(EqualTo("id", 2L)),
        primitive = prim))
    // winner's delete holds; loser applied nothing
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L))
  }

  test("streaming sink survives a mid-stream compaction (exactly-once preserved)") {
    import graft.streaming.TxSink
    val tbl = tmpTable()
    assert(TxSink.appendBatch(tbl, frame(1L, 2L), 0L, "qS"))
    // while batch 1 publishes, compaction lands first — the sink's
    // append must rebase, keep its (appId, batchId) watermark, and the
    // compacted bytes must survive
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.compact(spark, tbl, targetBytes = 1L << 30): Unit)
    assert(TxSink.appendBatch(tbl, frame(3L), 1L, "qS", primitive = prim))
    assert(TxSink.lastBatchId(tbl, "qS").contains(1L))
    // a replay of batch 1 still skips (watermark survived the rebase)
    assert(!TxSink.appendBatch(tbl, frame(99L), 1L, "qS"))
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // drain completes: one more batch on the quiet table
    assert(TxSink.appendBatch(tbl, frame(4L), 2L, "qS"))
    assert(TxTable.read(spark, tbl).count() == 4L)
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

  test("mergeSchema append evolves by-name; old files read NULL new cols") {
    import spark.implicits._
    val tbl = tmpTable()
    TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"),
      tbl, "overwrite")
    // append a frame with a NEW column and WITHOUT the old payload
    TxTable.commit(Seq((3L, 7.5)).toDF("id", "score"), tbl, "append",
      mergeSchema = true)
    val v2 = TxTable.readVersion(spark, tbl, 2L).orderBy("id")
    assert(v2.schema.fieldNames.toSeq == Seq("id", "payload", "score"))
    val rows = v2.collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(rows == Seq(
      (1L, Some("a"), None), (2L, Some("b"), None),
      (3L, None, Some(7.5))))
    // v1 still reads with its own committed (un-evolved) schema
    assert(TxTable.readVersion(spark, tbl, 1L).schema.fieldNames.toSeq ==
      Seq("id", "payload"))
    // a further plain append must match the EVOLVED schema
    TxTable.commit(
      Seq((4L, "c", 1.0)).toDF("id", "payload", "score"), tbl, "append")
    assert(TxTable.read(spark, tbl).count() == 4L)
  }

  test("mergeSchema refuses a type conflict on a shared column") {
    import spark.implicits._
    val tbl = tmpTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "payload"), tbl, "overwrite")
    val e = intercept[IllegalArgumentException] {
      TxTable.commit(Seq((2L, 5.0)).toDF("id", "payload"), tbl, "append",
        mergeSchema = true)
    }
    assert(e.getMessage.contains("type conflict on 'payload'"))
    // and WITHOUT the flag, new columns still refuse (drift ≠ evolution)
    val e2 = intercept[IllegalArgumentException] {
      TxTable.commit(Seq((2L, 5.0)).toDF("id", "score"), tbl, "append")
    }
    assert(e2.getMessage.contains("mergeSchema"))
  }

  test("TxStats.excludes: boundaries inclusive, doubt keeps the file") {
    import graft.sources.TxStats
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType), StructField("s", StringType)))
    val st = Map("id" -> TxStats.ColStat("100", "200"),
      "v" -> TxStats.ColStat("1.5", "9.5"),
      "s" -> TxStats.ColStat("bbb", "mmm"))
    def ex(f: Filter) = TxStats.excludes(st, schema, f)
    // point lookups: outside skips, boundaries never do
    assert(ex(EqualTo("id", 99L)) && ex(EqualTo("id", 201L)))
    assert(!ex(EqualTo("id", 100L)) && !ex(EqualTo("id", 200L)))
    assert(ex(EqualTo("id", 99)) /* int literal against long stats */)
    // ranges: strict vs inclusive at the edges
    assert(ex(GreaterThan("id", 200L)) && !ex(GreaterThan("id", 199L)))
    assert(ex(GreaterThanOrEqual("id", 201L)) &&
      !ex(GreaterThanOrEqual("id", 200L)))
    assert(ex(LessThan("id", 100L)) && !ex(LessThan("id", 101L)))
    assert(ex(LessThanOrEqual("id", 99L)) && !ex(LessThanOrEqual("id", 100L)))
    // doubles, incl. the NaN guard (NaN literal must never skip)
    assert(ex(LessThan("v", 1.5)) && !ex(LessThan("v", 1.6)))
    assert(!ex(EqualTo("v", Double.NaN)))
    // ASCII strings skip; non-ASCII literals keep the file
    assert(ex(EqualTo("s", "aaa")) && !ex(EqualTo("s", "ccc")))
    assert(!ex(EqualTo("s", "cccé")))
    // IN skips only when EVERY member is excluded; null members keep
    assert(ex(In("id", Array[Any](1L, 2L, 300L))))
    assert(!ex(In("id", Array[Any](1L, 150L))))
    assert(!ex(In("id", Array[Any](1L, null))))
    // And: one excluding conjunct suffices; Or: both arms must exclude
    assert(ex(And(EqualTo("id", 99L), EqualTo("s", "ccc"))))
    assert(ex(Or(EqualTo("id", 99L), EqualTo("id", 300L))))
    assert(!ex(Or(EqualTo("id", 99L), EqualTo("id", 150L))))
    // unknown columns / shapes / missing stats never skip
    assert(!ex(EqualTo("nope", 1L)))
    assert(!ex(IsNull("id")) && !ex(IsNotNull("id")))
    assert(!TxStats.excludes(Map.empty, schema, EqualTo("id", 99L)))
    // FLOAT stats parse through Float first: "0.1".toDouble and 0.1f
    // widened to double differ, and the cross-domain compare wrongly
    // excluded a file whose rows equal the literal exactly
    val fSchema = StructType(Seq(StructField("f", FloatType)))
    val fst = Map("f" -> TxStats.ColStat("0.1", "0.1"))
    assert(!TxStats.excludes(fst, fSchema, EqualTo("f", 0.1f)))
    assert(!TxStats.excludes(fst, fSchema, GreaterThanOrEqual("f", 0.1f)))
    assert(!TxStats.excludes(fst, fSchema, LessThanOrEqual("f", 0.1f)))
    assert(TxStats.excludes(fst, fSchema, GreaterThan("f", 0.1f)))
    assert(TxStats.excludes(fst, fSchema, EqualTo("f", 0.2f)))
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

  test("append accepts an all-nullable parquet read-back of its own schema") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite") // id/payload non-nullable
    // round-trip through parquet widens every field to nullable
    TxTable.commit(TxTable.read(spark, tbl), tbl, "append")
    assert(TxTable.read(spark, tbl).count() == 2L)
  }

  private def dataFiles(tbl: String): Set[String] =
    Files.walk(Paths.get(tbl, "data")).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.toString).toSet

  test("vacuum frees overwritten versions, keeps every retained one intact") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L, 2L), tbl, "overwrite")
    TxTable.commit(frame(3L), tbl, "append")
    TxTable.commit(frame(9L), tbl, "overwrite")
    val v2Before = TxTable.readVersion(spark, tbl, 2L)
      .select("id").collect().map(_.getLong(0)).toSet
    val stats = TxTable.vacuum(tbl, retain = 2, minAgeMillis = 0L)
    assert(stats.expiredVersions == Seq(1L))
    assert(stats.deletedFiles == 0L) // v1's files are all carried by v2
    // retained versions read identically; the expired one fails loudly
    assert(TxTable.readVersion(spark, tbl, 2L).select("id").collect()
      .map(_.getLong(0)).toSet == v2Before)
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).toSet == Set(9L))
    intercept[IllegalArgumentException](TxTable.readVersion(spark, tbl, 1L))
    // a second vacuum down to 1 version deletes v1+v2's now-dead files
    val files2 = dataFiles(tbl)
    val stats2 = TxTable.vacuum(tbl, retain = 1, minAgeMillis = 0L)
    assert(stats2.expiredVersions == Seq(2L) && stats2.deletedFiles > 0L)
    assert(dataFiles(tbl).size < files2.size)
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).toSet == Set(9L))
  }

  test("vacuum never deletes a file a retained manifest lists") {
    // randomized-ish commit histories driven from a fixed seed: the
    // property the contract hangs on, checked over many shapes
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val tbl = tmpTable()
      val nCommits = 2 + rnd.nextInt(4)
      (1 to nCommits).foreach { i =>
        val ids = (1 to (1 + rnd.nextInt(3))).map(_ => rnd.nextLong(50))
        TxTable.commit(frame(ids: _*), tbl,
          if (rnd.nextBoolean()) "append" else "overwrite")
      }
      val retain = 1 + rnd.nextInt(nCommits)
      val keep = ((nCommits - retain + 1) to nCommits).map(_.toLong)
      val before = keep.map(v => v -> TxTable.readVersion(spark, tbl, v)
        .select("id").collect().map(_.getLong(0)).toSeq.sorted).toMap
      TxTable.vacuum(tbl, retain, minAgeMillis = 0L)
      keep.foreach { v =>
        assert(TxTable.readVersion(spark, tbl, v).select("id").collect()
          .map(_.getLong(0)).toSeq.sorted == before(v),
          s"version $v changed after vacuum(retain=$retain)")
      }
    }
  }

  test("vacuum minAge spares young unreferenced files (in-flight commits)") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    TxTable.commit(frame(2L), tbl, "overwrite")
    val before = dataFiles(tbl)
    // every file here is seconds old — a 1h age floor must delete nothing
    val stats = TxTable.vacuum(tbl, retain = 1, minAgeMillis = 3600000L)
    assert(stats.deletedFiles == 0L && dataFiles(tbl) == before)
  }

  test("compact: fewer files, identical content, history intact") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L, 2L), tbl, "overwrite")
    TxTable.commit(frame(3L), tbl, "append")
    TxTable.commit(frame(4L, 5L), tbl, "append")
    val before = TxTable.read(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val nFilesBefore = dataFiles(tbl).count(_.endsWith(".parquet"))
    assert(nFilesBefore >= 3) // one+ per commit — something to compact
    val v = TxTable.compact(spark, tbl, targetBytes = 1L << 30)
    assert(v == 4L)
    // content identical, now in ONE file (everything fits one group)
    assert(TxTable.read(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq == before)
    val m4 = TxTable.readManifest(Paths.get(tbl), 4L)
    assert(m4.files.size == 1, m4.files)
    // and the compaction's DELTA records its actions incrementally:
    // one added file, the three consumed ones removed
    val delta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        Paths.get(tbl, "_txlog", "v00004.json")))
    assert(delta.get("fmt").asInt() == 2)
    assert(delta.get("add").size() == 1)
    assert(delta.get("remove").size() >= 3)
    // pre-compaction versions stay readable until vacuumed
    assert(TxTable.readVersion(spark, tbl, 2L).count() == 3L)
    val stats = TxTable.vacuum(tbl, retain = 1, minAgeMillis = 0L)
    assert(stats.deletedFiles >= nFilesBefore)
    assert(TxTable.read(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq == before)
  }

  test("compact splits into multiple files when groups overflow target") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L, 2L), tbl, "overwrite")
    TxTable.commit(frame(3L, 4L), tbl, "append")
    TxTable.compact(spark, tbl, targetBytes = 1L) // every file overflows
    val manifest = java.nio.file.Files.readString(Paths.get(tbl, "_txlog",
      f"v${TxTable.latestVersion(tbl).get}%05d.json"))
    assert(manifest.split("\\.parquet").length - 1 >= 2, manifest)
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("TxSink: replayed batch ids commit exactly once") {
    import graft.streaming.TxSink
    val tbl = tmpTable()
    assert(TxSink.appendBatch(tbl, frame(1L, 2L), 0L, "qA"))
    assert(TxSink.appendBatch(tbl, frame(3L), 1L, "qA"))
    // crash-recovery replay of batch 1: same id, must be skipped
    assert(!TxSink.appendBatch(tbl, frame(3L), 1L, "qA"))
    assert(!TxSink.appendBatch(tbl, frame(99L), 0L, "qA")) // stale replay too
    assert(TxSink.appendBatch(tbl, frame(4L), 2L, "qA"))
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(TxSink.lastBatchId(tbl, "qA").contains(2L))
    // a batch writer interleaves without disturbing the stream's ids
    TxTable.commit(frame(50L), tbl, "append")
    assert(TxSink.lastBatchId(tbl, "qA").contains(2L))
    assert(TxSink.appendBatch(tbl, frame(5L), 3L, "qA"))
    assert(TxTable.read(spark, tbl).count() == 6L)
  }

  test("TxSink: watermarks are per-appId — a fresh stream's batch 0 lands") {
    import graft.streaming.TxSink
    val tbl = tmpTable()
    // stream A has advanced to batch 7 on this table
    assert(TxSink.appendBatch(tbl, frame(1L), 7L, "qA"))
    // a NEW stream (fresh checkpoint) restarts batch ids at 0 — an
    // unscoped high-water mark would silently drop all its batches
    assert(TxSink.appendBatch(tbl, frame(2L), 0L, "qB"))
    assert(TxSink.appendBatch(tbl, frame(3L), 1L, "qB"))
    assert(!TxSink.appendBatch(tbl, frame(3L), 1L, "qB")) // B's own replay
    assert(!TxSink.appendBatch(tbl, frame(9L), 7L, "qA")) // A's own replay
    assert(TxSink.lastBatchId(tbl, "qA").contains(7L))
    assert(TxSink.lastBatchId(tbl, "qB").contains(1L))
    assert(TxSink.lastBatchId(tbl, "qC").isEmpty)
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("TxSink: watermark survives vacuum and compaction (txns carry)") {
    import graft.streaming.TxSink
    val tbl = tmpTable()
    assert(TxSink.appendBatch(tbl, frame(1L), 0L, "qA"))
    assert(TxSink.appendBatch(tbl, frame(2L), 1L, "qA"))
    // overwrite + vacuum expires the manifests whose op labels recorded
    // batches 0 and 1; the carried-forward txns map must still hold them
    TxTable.commit(frame(9L), tbl, "overwrite")
    TxTable.vacuum(tbl, retain = 1, minAgeMillis = 0L)
    assert(TxSink.lastBatchId(tbl, "qA").contains(1L))
    assert(!TxSink.appendBatch(tbl, frame(99L), 1L, "qA")) // replay still skips
    assert(TxSink.appendBatch(tbl, frame(3L), 2L, "qA"))
    // compaction rewrites the snapshot — watermark rides through
    TxTable.compact(spark, tbl, targetBytes = 1L << 30)
    assert(TxSink.lastBatchId(tbl, "qA").contains(2L))
    assert(TxTable.read(spark, tbl).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L, 9L))
  }

  test("runConcurrently: bounded in-flight, every task exactly once, loud failure") {
    import java.util.concurrent.atomic.AtomicInteger
    val active = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val runs = new AtomicInteger(0)
    TxTable.runConcurrently(24, 4) { _ =>
      val a = active.incrementAndGet()
      peak.updateAndGet(m => math.max(m, a))
      Thread.sleep(20)
      runs.incrementAndGet()
      active.decrementAndGet(): Unit
    }
    assert(runs.get() == 24)
    assert(peak.get() <= 4, s"pool bound violated: ${peak.get()} in flight")
    assert(peak.get() >= 2, "tasks never overlapped — pool is sequential")
    // a failing task propagates its own exception, not a wrapper
    val e = intercept[IllegalStateException](
      TxTable.runConcurrently(8, 3)(i =>
        if (i == 5) throw new IllegalStateException("task 5 failed")))
    assert(e.getMessage == "task 5 failed")
  }

  test("two-writer publishExclusive contention: exactly one PUT wins") {
    // direct contention on the PRIMITIVE (below, the same race runs
    // through the full commit protocol): two threads publish the same
    // target simultaneously, many rounds; exactly one must succeed and
    // the loser must see FileAlreadyExistsException every time
    val prims = Seq[(String, () => graft.sources.CommitPrimitive)](
      "posix" -> (() => graft.sources.PosixLinkPrimitive),
      "condput" -> (() => new graft.sources.CondPutPrimitive))
    prims.foreach { case (name, mk) =>
      val prim = mk()
      (0 until 25).foreach { round =>
        val dir = Files.createTempDirectory("graft-prim-race")
        val target = dir.resolve(s"v$round.json")
        val gate = new java.util.concurrent.CountDownLatch(1)
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val losses = new java.util.concurrent.atomic.AtomicInteger(0)
        val ts = (1 to 2).map(i => new Thread(() => {
          gate.await()
          try { prim.publishExclusive(target, Array[Byte](i.toByte)); wins.incrementAndGet(): Unit }
          catch { case _: java.nio.file.FileAlreadyExistsException => losses.incrementAndGet(): Unit }
        }))
        ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
        assert(wins.get() == 1 && losses.get() == 1,
          s"$name round $round: ${wins.get()} winners")
        assert(Files.size(target) == 1L, s"$name: torn/partial publish")
      }
    }
  }

  test("OCC race: 6 racing appends all land with NO caller retry, one version each") {
    val doubles = Seq(
      "posix" -> graft.sources.PosixLinkPrimitive,
      "condput" -> new graft.sources.CondPutPrimitive)
    doubles.foreach { case (name, prim) =>
      val tbl = tmpTable()
      TxTable.commit(frame(0L), tbl, "overwrite", primitive = prim)
      // 6 threads race to append ONCE each — no retry loop in the
      // caller: the reconciling publish must absorb every lost race
      // internally and serialize all 6 into versions 2..7
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      val okay = new java.util.concurrent.atomic.AtomicInteger(0)
      try {
        val fs = (1 to 6).map(i => pool.submit(new Runnable {
          def run(): Unit = {
            TxTable.commit(frame(i.toLong), tbl, "append",
              primitive = prim)
            okay.incrementAndGet(): Unit
          }
        }))
        fs.foreach(_.get())
      } finally pool.shutdownNow()
      assert(okay.get() == 6, s"$name: not every writer landed")
      assert(TxTable.latestVersion(tbl).contains(7L), s"$name: gaps")
      assert(TxTable.read(spark, tbl).select("id").collect()
        .map(_.getLong(0)).sorted.toSeq == (0L to 6L), s"$name: lost rows")
    }
  }

  test("a lost commit race reclaims its own data files") {
    val tbl = tmpTable()
    TxTable.commit(frame(1L), tbl, "overwrite")
    val prim = new graft.sources.ConflictInjectingPrimitive(
      graft.sources.PosixLinkPrimitive,
      () => TxTable.commit(frame(9L), tbl, "overwrite"): Unit)
    // overwrite: no rebase path, the conflict surfaces and the staged
    // files are reclaimed
    intercept[java.nio.file.FileAlreadyExistsException](
      TxTable.commit(frame(2L), tbl, "overwrite", primitive = prim))
    // no orphaned data/<uuid> left: every on-disk commit dir is
    // referenced by a live manifest
    val live = Seq(1L, 2L)
      .flatMap(v => TxTable.readManifest(Paths.get(tbl), v).files)
      .map(_.split('/')(1)).toSet
    val onDisk = Files.list(Paths.get(tbl).resolve("data")).iterator()
      .asScala.map(_.getFileName.toString).toSet
    assert(onDisk == live)
  }

  test("compactZOrder narrows 2-D tiles, never changes rows, keeps bloom coverage") {
    import spark.implicits._
    import graft.sources.TxStats
    import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThanOrEqual}
    val dir = Files.createTempDirectory("tx-zorder-").toString + "/tbl"
    // 16 distinct (x, y) points scattered over the 16x16 plane, id-striped
    // across three commits and hash-split within each — every pre-rewrite
    // file spans nearly the full extent of BOTH dimensions
    val rows = (0L until 200L).map(i => (i, i % 16, (i * 7) % 16))
    (0 until 3).foreach { s =>
      TxTable.commit(rows.filter(_._1 % 3 == s).toDF("id", "x", "y")
          .repartition(2), dir,
        if (s == 0) "overwrite" else "append", bloomColumns = Seq("id")): Unit
    }
    val before = TxTable.readManifest(Paths.get(dir), 3L)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(before.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // the 2-D box probe x<=3 AND y<=3: only (0,0) qualifies (x=i%16<=3
    // with y=7i%16<=3 forces i%16=0), z = 0 — one Morton tile
    val box: Seq[Filter] = Seq(
      GreaterThanOrEqual("x", 0L), LessThanOrEqual("x", 3L),
      GreaterThanOrEqual("y", 0L), LessThanOrEqual("y", 3L))
    def kept(m: TxTable.Manifest): Int = m.files.count { f =>
      val st = m.stats.getOrElse(f, Map.empty[String, TxStats.ColStat])
      !box.exists(fl => TxStats.excludes(st, schema, fl))
    }
    val keptBefore = kept(before)
    assert(keptBefore >= 4, s"fixture must start unprunable, kept=$keptBefore")
    val v = TxTable.compactZOrder(spark, dir, "x", "y", numFiles = 8,
      bits = 4)
    assert(v == 4L)
    val after = TxTable.readManifest(Paths.get(dir), 4L)
    assert(after.op == "zorder")
    // sampled range boundaries are not tile-aligned, so a straddling
    // file or two can survive — the contract is a strict (here: at
    // least halved) reduction, not a perfect single-tile hit
    assert(kept(after) < keptBefore && kept(after) <= keptBefore / 2,
      s"zorder must narrow the box's candidates: ${kept(after)} vs $keptBefore")
    // rows moved between files but never changed: identical multiset,
    // and the pre-rewrite layout stays time-travelable
    def content(v: Long) = TxTable.readVersion(spark, dir, v)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(content(4L) == content(3L))
    // bloom coverage survives the rewrite on every rewritten file
    assert(after.files.nonEmpty &&
      after.files.forall(f => after.blooms.get(f).exists(_.contains("id"))))
  }
}
