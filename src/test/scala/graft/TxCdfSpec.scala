package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.sources.TxTable

/** The `graft-txcdf` streaming change-data-feed: manifest-version
  * offsets, exactly-once across checkpointed restarts, the append-only
  * refusal contract, and the version tag's correctness. */
class TxCdfSpec extends SparkSpec {
  import spark.implicits._

  private def mkBase(): String =
    Files.createTempDirectory("txcdf-spec-").toString

  private def drain(tbl: String, ckpt: String, out: String,
                    opts: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft-txcdf").option("path", tbl)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def got(out: String): Seq[(Long, Long, String)] = {
    // a drain that failed before its first batch leaves the sink dir
    // absent or metadata-only — both read as "nothing served"
    val dir = new java.io.File(out)
    val hasData = dir.exists() && dir.listFiles() != null &&
      dir.listFiles().exists(_.getName.endsWith(".parquet"))
    if (!hasData) Seq.empty
    else spark.read.parquet(out)
      .select("_commit_version", "id", "s").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted
  }

  test("readChangeFeed: commit-time change files serve rewrites as cdc rows") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), tbl,
      "overwrite",
      properties = Map(TxTable.CdfProperty -> "true"))          // v1
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), tbl, "append") // v2
    TxTable.deleteWhere(spark, tbl,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 2L)))        // v3
    drain(tbl, s"$base/ckpt", s"$base/out",
      Map("readChangeFeed" -> "true"))
    val rows = spark.read.parquet(s"$base/out")
      .select("_commit_version", "_change_type", "id", "s")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq.sorted
    assert(rows == Seq(
      (1L, "insert", 1L, "a"), (1L, "insert", 2L, "b"),
      (2L, "insert", 3L, "c"), (3L, "delete", 2L, "b")), rows)
    // the plain append feed still REFUSES the delete version — change
    // files serve only the opted-in cdc reader
    val e = intercept[StreamingQueryException](
      drain(tbl, s"$base/ckpt2", s"$base/out2"))
    assert(e.getMessage.contains("rewrites or removes rows"),
      e.getMessage)
    // and skipChangeCommits still skips it even in cdc mode
    drain(tbl, s"$base/ckpt3", s"$base/out3",
      Map("readChangeFeed" -> "true", "skipChangeCommits" -> "true"))
    val skipped = spark.read.parquet(s"$base/out3")
      .select("_change_type").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(skipped == Seq("insert"), skipped)
  }

  test("readChangeFeed refuses pre-property rewrites (no change files exist)") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    // table WITHOUT tx.changeDataFeed: the delete writes no change files
    TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), tbl,
      "overwrite")
    TxTable.deleteWhere(spark, tbl,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 2L)))
    val e = intercept[StreamingQueryException](
      drain(tbl, s"$base/ckpt", s"$base/out",
        Map("readChangeFeed" -> "true")))
    assert(e.getMessage.contains("tx.changeDataFeed"), e.getMessage)
  }

  test("appends drain version-tagged, exactly once across checkpointed restarts") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), tbl,
      "overwrite")                                             // v1
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), tbl, "append") // v2
    drain(tbl, s"$base/ckpt", s"$base/out")
    assert(got(s"$base/out") ==
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c")))

    // a new commit after the drain: the SAME checkpoint serves ONLY it
    TxTable.commit(Seq((4L, "d")).toDF("id", "s"), tbl, "append") // v3
    drain(tbl, s"$base/ckpt", s"$base/out")
    assert(got(s"$base/out") ==
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c"), (3L, 4L, "d")))

    // and a drain with nothing new serves nothing (no duplicates)
    drain(tbl, s"$base/ckpt", s"$base/out")
    assert(got(s"$base/out").size == 4)
  }

  test("a rewriting commit refuses loudly; skipChangeCommits skips it") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), tbl, "overwrite") // v1
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), tbl, "overwrite") // v2
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), tbl, "append")    // v3
    val e = intercept[StreamingQueryException](
      drain(tbl, s"$base/ckpt", s"$base/out"))
    assert(e.getMessage.contains("rewrites or removes rows") ||
      Option(e.getCause).exists(_.getMessage != null) &&
        e.getCause.getMessage.contains("rewrites or removes rows"))
    // nothing may have been served past the refusal point: v1 at most
    assert(got(s"$base/out").forall(_._1 == 1L))

    // the opt-in skips v2 entirely (v2's rewritten copy of nothing-new
    // is NOT re-served) and still serves v1's snapshot + v3's append
    drain(tbl, s"$base/ckpt2", s"$base/out2",
      Map("skipChangeCommits" -> "true"))
    assert(got(s"$base/out2") == Seq((1L, 1L, "a"), (3L, 3L, "c")))
  }

  test("compaction commits are skipped automatically") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), tbl, "overwrite")
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), tbl, "append")
    val v = TxTable.compact(spark, tbl, targetBytes = 1L << 30) // v3
    assert(v == 3L)
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), tbl, "append") // v4
    drain(tbl, s"$base/ckpt", s"$base/out")
    // the compacted re-copies of ids 1-2 must NOT be re-served
    assert(got(s"$base/out") ==
      Seq((1L, 1L, "a"), (2L, 2L, "b"), (4L, 3L, "c")))
  }

  test("startingVersion begins the feed mid-history") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), tbl, "overwrite")
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), tbl, "append")
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), tbl, "append")
    drain(tbl, s"$base/ckpt", s"$base/out",
      Map("startingVersion" -> "3"))
    assert(got(s"$base/out") == Seq((3L, 3L, "c")))
    // a TAG NAME resolves too (r20 — the VERSION AS OF dispatch on the
    // stream surface); unknown names refuse loudly
    TxTable.tag(tbl, "resume-here", 2L)
    drain(tbl, s"$base/ckpt2", s"$base/out2",
      Map("startingVersion" -> "resume-here"))
    assert(got(s"$base/out2") == Seq((2L, 2L, "b"), (3L, 3L, "c")))
    val e = intercept[Exception](
      drain(tbl, s"$base/ckpt3", s"$base/out3",
        Map("startingVersion" -> "nope")))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(6)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("neither a version number nor a tag"), msgs)
  }

  test("a TxSink-written table tails through the CDF (stream: labels are appends)") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), tbl, "overwrite")
    // the replication loop's write side: the exactly-once sink labels
    // its commits 'stream:<appId>:<batchId>' — the feed must serve
    // them as the appends they are, not refuse them as rewrites
    assert(graft.streaming.TxSink.appendBatch(tbl,
      Seq((2L, "b")).toDF("id", "s"), 0L, "q1"))
    assert(graft.streaming.TxSink.appendBatch(tbl,
      Seq((3L, "c")).toDF("id", "s"), 1L, "q1"))
    drain(tbl, s"$base/ckpt", s"$base/out")
    assert(got(s"$base/out") ==
      Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c")))
    // and the batch feed serves them through the direct insert arm
    val ch = graft.sources.TxChanges.between(spark, tbl, 1L, 3L)
      .select("_commit_version", "_change_type", "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(ch == Seq((2L, "insert", 2L), (3L, "insert", 3L)))
  }

  test("a vacuumed manifest behind the checkpoint refuses loudly") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), tbl, "overwrite")
    drain(tbl, s"$base/ckpt", s"$base/out") // checkpoint at v1
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), tbl, "append")  // v2
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), tbl, "append")  // v3
    TxTable.commit(Seq((4L, "d")).toDF("id", "s"), tbl, "append")  // v4
    TxTable.vacuum(tbl, retain = 2, minAgeMillis = 0L) // v1, v2 gone
    val e = intercept[StreamingQueryException](
      drain(tbl, s"$base/ckpt", s"$base/out"))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(6)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("vacuumed"))
  }

  test("maxVersionsPerTrigger caps each micro-batch at n versions") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), tbl, "overwrite")
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), tbl, "append")
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), tbl, "append")
    drain(tbl, s"$base/ckpt", s"$base/out",
      Map("maxVersionsPerTrigger" -> "1"))
    // complete AND correctly tagged...
    assert(got(s"$base/out") ==
      Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c")))
    // ...in one micro-batch PER VERSION: the checkpoint's offset log
    // records a batch per trigger (0, 1, 2)
    val batches = new java.io.File(s"$base/ckpt/offsets").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).map(_.toLong).sorted
    assert(batches.toSeq == Seq(0L, 1L, 2L),
      s"expected 3 one-version batches, got offsets ${batches.toSeq}")
    // an invalid cap refuses loudly
    val e = intercept[Exception](
      drain(tbl, s"$base/ckpt2", s"$base/out2",
        Map("maxVersionsPerTrigger" -> "0")))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(6).flatMap(t => Option(t.getMessage))
      .mkString(" | ").contains("maxVersionsPerTrigger"))
  }

  test("maxFilesPerTrigger drains a 10-file version as bounded micro-batches") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    // one table-sized version: 10 files in v1 (the overwrite-backfill
    // shape that version-granular admission would ship as ONE batch)
    TxTable.commit((0L until 100L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(10), tbl, "overwrite")
    assert(TxTable.readManifest(java.nio.file.Paths.get(tbl), 1L)
      .files.size == 10)
    drain(tbl, s"$base/ckpt", s"$base/out",
      Map("maxFilesPerTrigger" -> "3"))
    // complete and exactly-once across the partial-offset checkpoints
    val rows = got(s"$base/out")
    assert(rows.size == 100 && rows.map(_._2) == (0L until 100L) &&
      rows.forall(_._1 == 1L))
    // ceil(10/3) = 4 micro-batches, each checkpointed
    val batches = new java.io.File(s"$base/ckpt/offsets").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).map(_.toLong).sorted
    assert(batches.toSeq == Seq(0L, 1L, 2L, 3L),
      s"expected 4 file-capped batches, got offsets ${batches.toSeq}")
    // the first batch's committed offset is PARTIAL — version 1, file 3
    val first = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/ckpt/offsets/0")), "UTF-8")
    assert(first.contains("1:3"), first)
  }

  test("file-granular offsets replay exactly across a mid-version restart") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    TxTable.commit((0L until 100L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(10), tbl, "overwrite")
    TxTable.commit(Seq((200L, "x")).toDF("id", "s"), tbl, "append")
    val schema = org.apache.spark.sql.types.DataType.fromJson(
        TxTable.readManifest(java.nio.file.Paths.get(tbl), 1L).schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    def stream(opts: Map[String, String]) = new graft.sources.TxCdfStream(
      schema, tbl, 1L, false,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(opts).asJava))
    val s1 = stream(Map("maxFilesPerTrigger" -> "4"))
    val lim = s1.getDefaultReadLimit
    val o1 = s1.latestOffset(s1.initialOffset(), lim)
    assert(o1.json == "1:4", o1.json)
    val o2 = s1.latestOffset(o1, lim)
    assert(o2.json == "1:8", o2.json)
    // restart mid-version: a FRESH stream resumes from the checkpointed
    // partial offset and walks the identical immutable file order —
    // v1's 2-file remainder plus v2's single file fit one batch
    val s2 = stream(Map("maxFilesPerTrigger" -> "4"))
    val o3 = s2.latestOffset(s2.deserializeOffset(o2.json),
      s2.getDefaultReadLimit)
    assert(o3.json == "2", o3.json)
    // nothing left: the offset must not move (no empty batches)
    assert(s2.latestOffset(o3, s2.getDefaultReadLimit).json == "2")
    // pre-file-granular checkpoints parse unchanged
    assert(s2.deserializeOffset("7").json == "7")
    // a byte cap smaller than one file still admits one (never stalls)
    val sb = stream(Map("maxBytesPerTrigger" -> "1"))
    val b1 = sb.latestOffset(sb.initialOffset(), sb.getDefaultReadLimit)
    assert(b1.json == "1:1", b1.json)
    // versions-only cap keeps its arithmetic fast path, partial starts
    // counting their remainder as the first version of the batch
    val sv = stream(Map("maxVersionsPerTrigger" -> "1"))
    assert(sv.latestOffset(sv.deserializeOffset("1:8"),
      sv.getDefaultReadLimit).json == "1")
  }

  test("the batch drain answers the same rows as reading the versions directly") {
    val base = mkBase()
    val tbl = s"$base/tbl"
    val r = new scala.util.Random(7)
    (1 to 4).foreach { i =>
      val rows = Seq.fill(5)((r.nextLong(1000), r.nextInt(100).toString))
      TxTable.commit(rows.toDF("id", "s"), tbl,
        if (i == 1) "overwrite" else "append")
    }
    drain(tbl, s"$base/ckpt", s"$base/out")
    val cdf = spark.read.parquet(s"$base/out")
      .select("id", "s").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq.sorted
    val direct = TxTable.read(spark, tbl)
      .select("id", "s").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq.sorted
    assert(cdf == direct)
  }
}
