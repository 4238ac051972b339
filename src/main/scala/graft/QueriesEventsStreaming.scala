package graft

import graft.compile.NlCompiler
import graft.exec.Executor
import graft.ext.{Dedup, Events, Multimodal, Similarity, TextStats}
import graft.ir.MongoJson
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryHelpers._

/** Event analytics (sessions, outliers) and every Structured Streaming drain, including the custom DSv2 dirtail source.
  *
  * One of six per-domain registries merged by [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] — pure relocation of the former monolithic
  * maps, no behavior change (22 entries incl. the round-12 custom-exec
  * as-of/attribution, stream-scored-outlier, and batch+streaming
  * dirtail paths). */
private[graft] object QueriesEventsStreaming {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 3σ anomaly flag with division-free integer arithmetic (Events
    // .outliers scaladoc) — the boundary set is engine-exact, so the
    // oracle reproduces the flagged rows bit-for-bit
    "events_outliers" -> ((s: SparkSession, dir: String) =>
      Events.outliers(Tables.events(s, dir), "event_type", "value",
          sigmas = 3)
        .orderBy("event_id")),
    // ----- robust MAD anomaly flags (Events.madOutliers scaladoc:
    // doubled-median integer arithmetic, 50% breakdown point where the
    // z-score's σ is inflated by the very spikes it hunts) -----
    "events_mad" -> ((s: SparkSession, dir: String) =>
      Events.madOutliers(Tables.events(s, dir), "event_type", "value",
          k = 5)
        .orderBy("event_id")),
    "events_hourly" -> ((s: SparkSession, dir: String) =>
      Events.hourly(Tables.events(s, dir)).orderBy("hour", "event_type")),
    "events_sessions" -> ((s: SparkSession, dir: String) =>
      Events.sessions(Tables.events(s, dir), gapMinutes = 30)
        .orderBy("user_id", "session_id")),
    // Structured Streaming end-to-end: readStream over the same parquet →
    // watermarked hourly window agg → memory sink, drained with
    // Trigger.AvailableNow. Same output schema and arithmetic as the batch
    // events_hourly, so the STREAMING pipeline is certified against the
    // same DuckDB oracle.
    "stream_hourly" -> ((s: SparkSession, dir: String) =>
      drainStream(s, "graft_stream_hourly", "complete",
        graft.streaming.EventsStream.hourlyCounts(eventsStream(s, dir)))
        .orderBy("hour", "event_type")),
    // watermarked stream-stream interval join (EventsStream
    // .viewToClickJoin scaladoc: two-sided time bound -> provably bounded
    // state), drained append-mode, certified vs the batch interval join
    "stream_join" -> ((s: SparkSession, dir: String) =>
      drainStream(s, "graft_stream_join", "append",
        graft.streaming.EventsStream.viewToClickJoin(eventsStream(s, dir)),
        // inner interval join: matches emit in the data batch; the
        // trailing no-data batch only evicts state — skip it
        watermarkFinalizes = false)
        .orderBy("user_id", "view_t", "click_t")),
    // the LEFT-OUTER watermarked interval join — the attribution shape
    // users actually run (views with no click). Unmatched rows emit
    // only after the global watermark passes view_ts + gap
    // (EventsStream.viewToClickJoinOuter scaladoc), so the certified
    // set is all matched pairs plus the null rows of the
    // watermark-finalized prefix; the oracle applies the identical
    // cutoff (least(max view, max click) as the final watermark).
    "stream_join_outer" -> ((s: SparkSession, dir: String) =>
      drainStream(s, "graft_stream_join_outer", "append",
        graft.streaming.EventsStream.viewToClickJoinOuter(
          eventsStream(s, dir)))
        .orderBy(col("user_id"), col("view_t"),
          col("click_t").asc_nulls_first)),
    // the CUSTOM DataSource V2 micro-batch source (graft-dirtail,
    // sources/DirTailSource.scala): events re-shipped as immutable JSONL
    // files (ts as epoch micros — the kafkaEvents wire convention), tailed
    // back through the source's deterministic file-count offsets, and
    // drained through the SAME certified hourly topology — a green hash
    // certifies the source's offset/partition/row-decode machinery
    // end-to-end, not just the aggregate
    // predicate-restricted drain through the custom source. NOTE the
    // honest mechanics: Spark's micro-batch planner does not call
    // pushFilters (probed on 4.1), so in THIS streaming topology the
    // predicate evaluates above the scan; the source's own pushdown
    // machinery fires on the BATCH read path (source_dirtail below,
    // plan-asserted in DirTailSourceSpec). Same answer either way —
    // certified against the hourly oracle restricted identically
    "stream_dirtail_filtered" -> ((s: SparkSession, dir: String) => {
      val src = dirtailEventsDir(s, dir)
      val wire = DirtailWireSchema
      val stream = s.readStream.format("graft-dirtail").schema(wire)
        .option("path", src).load()
        .where(col("user_id") > 75L)
      drainStream(s, "graft_stream_dirtail_filtered", "complete",
        graft.streaming.EventsStream.hourlyCounts(stream))
        .orderBy("hour", "event_type")
    }),
    "stream_dirtail" -> ((s: SparkSession, dir: String) => {
      val src = dirtailEventsDir(s, dir)
      val wire = DirtailWireSchema
      val stream = s.readStream.format("graft-dirtail").schema(wire)
        .option("path", src).load()
      drainStream(s, "graft_stream_dirtail", "complete",
        graft.streaming.EventsStream.hourlyCounts(stream))
        .orderBy("hour", "event_type")
    }),
    // the BATCH half of the dirtail table (BATCH_READ capability): the
    // backfill read of everything shipped so far, where the source's
    // comparison-filter pushdown genuinely fires — Spark's
    // V2ScanRelationPushDown serves batch DSv2 relations, and
    // DirTailSourceSpec asserts the predicate lands in PushedFilters
    // with the filter column absent from ReadSchema
    "source_dirtail" -> ((s: SparkSession, dir: String) => {
      val src = dirtailEventsDir(s, dir)
      val wire = DirtailWireSchema
      s.read.format("graft-dirtail").schema(wire)
        .option("path", src).load()
        .where(col("user_id") > 75L)
        .groupBy(date_format(date_trunc("hour", col("ts")),
            "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy("hour", "event_type")
    }),
    // the BATCH write half of the dirtail table: two df.write epochs
    // append through the claim-next-epoch commit protocol (staged files,
    // deterministic part-<epoch>-<partition> names, exclusive marker),
    // then the batch read aggregates everything back — one green hash
    // certifies batch serialization + commit + decode together
    "source_dirtail_write" -> ((s: SparkSession, dir: String) => {
      val out = scratchDir("graft-dtw-")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      ev.filter(col("event_type").isin("view", "click"))
        .write.format("graft-dirtail").option("path", out)
        .mode("append").save()
      ev.filter(col("event_type") === "purchase")
        .write.format("graft-dirtail").option("path", out)
        .mode("append").save()
      s.read.format("graft-dirtail").schema(DirtailWireSchema)
        .option("path", out).load()
        .groupBy(date_format(date_trunc("hour", col("ts")),
            "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy("hour", "event_type")
    }),
    // the full custom-IO loop: events stream OUT through the dirtail
    // DSv2 SINK (per-task staged JSONL, epoch-commit rename + exclusive
    // marker — exactly-once to the visible namespace), then the sink's
    // own output is tailed back through the dirtail SOURCE into the
    // certified hourly topology — one green hash certifies writer
    // serialization, commit protocol, offsets, and row decode together
    "stream_dirtail_sink" -> ((s: SparkSession, dir: String) => {
      val out = scratchDir("graft-dirtail-sink-")
      val q = eventsStream(s, dir).writeStream.format("graft-dirtail")
        .option("path", out)
        .option("checkpointLocation", scratchDir("graft-dirtail-sinkckpt-"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wire = DirtailWireSchema
      val back = s.readStream.format("graft-dirtail").schema(wire)
        .option("path", out).load()
      drainStream(s, "graft_stream_dirtail_sink", "complete",
        graft.streaming.EventsStream.hourlyCounts(back))
        .orderBy("hour", "event_type")
    }),
    // streaming hourly counts finalized with the batch growth arithmetic
    // (Events.growthOverHourly) — certifies against the events_growth
    // oracle, the stream_hll maintain-then-finalize pattern
    "stream_growth" -> ((s: SparkSession, dir: String) =>
      Events.growthOverHourly(
          drainStream(s, "graft_stream_growth", "complete",
            graft.streaming.EventsStream.hourlyCounts(eventsStream(s, dir))))
        .orderBy("event_type", "hour")),
    // the moment state (Olap.momentState) maintained AS A STREAM — sums
    // and counts are streaming-native aggregates with |types| state rows —
    // finalized batch-side; certifies against the agg_varstats oracle
    "stream_incragg" -> ((s: SparkSession, dir: String) =>
      graft.ext.Olap.finalizeMoments(
          drainStream(s, "graft_stream_incragg", "complete",
            graft.ext.Olap.momentState(eventsStream(s, dir),
              "event_type", "value")),
          "event_type")
        .orderBy("event_type")),
    // the model-serving split certified end-to-end: the moment state is
    // LEARNED over the stream (the stream_incragg drain), then applied
    // as a broadcast scoring model to the batch frame with the identical
    // integer 3-sigma test — flags hash-match the pure-batch
    // events_outliers oracle, proving stream-learned == batch-computed
    "stream_outliers" -> ((s: SparkSession, dir: String) =>
      graft.ext.Events.outliersFromState(
          Tables.events(s, dir),
          drainStream(s, "graft_stream_outliers", "complete",
            graft.ext.Olap.momentState(eventsStream(s, dir),
              "event_type", "value")),
          "event_type", "value", sigmas = 3)
        .orderBy("event_id")),
    // Stateful streaming certified against SQL: gap sessionization via
    // flatMapGroupsWithState + EVENT-TIME timeouts over the same events
    // parquet. Closed sessions = every session a later event closed, plus
    // last sessions whose timeout timestamp the final watermark strictly
    // passed; the oracle replicates exactly that.
    "stream_sessions" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val evts = eventsStream(s, dir)
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.EventsStream.Evt]
      drainStream(s, "graft_stream_sessions", "append",
        graft.streaming.EventsStream.sessionize(evts).toDF())
        .orderBy("user_id", "start_ms")
    }),
    // Stream-static join: the event stream enriches against the broadcast
    // customer dim, then aggregates per (hour, segment) — certified against
    // the identical batch join+group SQL
    "stream_enrich" -> ((s: SparkSession, dir: String) =>
      drainStream(s, "graft_stream_enrich", "complete",
        graft.streaming.EventsStream.hourlyBySegment(eventsStream(s, dir),
          Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))))
        .orderBy("hour", "c_mktsegment")),
    // Streaming exact dedup: watermarked dropDuplicates on (hour window,
    // user, type) — first occurrence emitted, state purged as the
    // watermark passes each window. Oracle = batch SELECT DISTINCT.
    "stream_dedup" -> ((s: SparkSession, dir: String) =>
      drainStream(s, "graft_stream_dedup", "append",
        graft.streaming.EventsStream.dedupKeys(eventsStream(s, dir)),
        // dedup emits FIRST occurrences in the data batch; the no-data
        // batch only purges expired state — skip it
        watermarkFinalizes = false)
        .orderBy("hour", "user_id", "event_type")),
    // ----- exactly-once transactional streaming sink (TxSink scaladoc:
    // each micro-batch is one atomic TxTable commit stamped with its
    // batch id; replays skip) — the certified output is the final table,
    // which must be EXACTLY the source multiset: a duplicated or dropped
    // batch breaks the hash -----
    "stream_txsink" -> ((s: SparkSession, dir: String) => {
      val base = scratchDir("graft-stx-")
      val tbl = s"$base/tbl"
      val src = eventsStream(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_c"))
      DrainLock.synchronized {
        val saved = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = src.writeStream
            .option("checkpointLocation", s"$base/ckpt")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, id: Long) =>
              // appId scopes the exactly-once watermark to THIS logical
              // stream — a fresh checkpoint restarting ids at 0 against
              // a shared table must not collide with other writers
              graft.streaming.TxSink.appendBatch(tbl, b, id,
                appId = "stream_txsink"): Unit
            }
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      }
      graft.sources.TxTable.read(s, tbl).orderBy("event_id")
    }),
    // ----- streaming CHANGE-DATA-FEED over the tx table (TxCdfSource
    // scaladoc: manifest versions are the offsets, each micro-batch
    // serves exactly the files its versions added, rows tagged with
    // _commit_version) — drained through the exactly-once FILE sink and
    // read back: a wrong set-diff, a double-served file, or an
    // off-by-one offset breaks the version column's hash -----
    "stream_txcdf" -> ((s: SparkSession, dir: String) => {
      val base = scratchDir("graft-txcdf-")
      val tbl = s"$base/tbl"
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.sources.TxTable.commit(
        docs.filter(col("lang") === "en"), tbl, "overwrite")
      graft.sources.TxTable.commit(
        docs.filter(col("lang") === "de"), tbl, "append")
      graft.sources.TxTable.commit(
        docs.filter(col("lang") === "fr"), tbl, "append")
      val out = s"$base/out"
      DrainLock.synchronized {
        val saved = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = s.readStream.format("graft-txcdf").option("path", tbl)
            .load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      }
      s.read.parquet(out)
        .select(col("_commit_version").as("version"), col("doc_id"),
          col("lang"), col("n_chars"))
        .orderBy("version", "doc_id")
    }),
    // ----- the streaming CDF in readChangeFeed mode (TxCdfSource:
    // rewriting commits on a tx.changeDataFeed table serve their
    // COMMIT-TIME change files as cdc rows — pre/postimages for
    // UPDATE, delete rows for DELETE — instead of refusing; appends
    // tag 'insert'). The fixture crosses overwrite/append/UPDATE/
    // DELETE; a wrong change frame, a missed version, or a mislabeled
    // row breaks the hash -----
    "stream_txcdf_cdc" -> ((s: SparkSession, dir: String) => {
      val wh = EntryHelpers.txCatalogWarehouse(s, dir)
      EntryHelpers.txCdcVersion(s, dir, wh): Unit
      val base = scratchDir("graft-cdc-")
      val out = s"$base/out"
      DrainLock.synchronized {
        val saved = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = s.readStream.format("graft-txcdf")
            .option("path", s"$wh/db/cdc")
            .option("readChangeFeed", "true").load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      }
      s.read.parquet(out)
        .select(col("_commit_version").as("version"),
          col("_change_type").as("change"), col("doc_id"), col("lang"),
          col("n_chars"))
        .orderBy("version", "change", "doc_id")
    }),
    // ----- STREAMING ANN-INDEX MAINTENANCE — the CDF composed with
    // IvfIndex.append: the index is built over v1's snapshot, later
    // commits drain version-per-trigger through foreachBatch into the
    // frozen-quantizer append (one assignment pass per batch, nothing
    // retrained or rewritten), and the served top-k equals the
    // from-scratch oracle because batching cannot change frozen
    // assignments. (The drain here is single-writer; a production
    // deployment makes the append idempotent per epoch like TxSink.) -----
    "stream_ivf_append" -> ((s: SparkSession, dir: String) => {
      val base = scratchDir("graft-ivfs-")
      val tbl = s"$base/tbl"
      val idx = s"$base/idx"
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"))
      val even = emb.filter(col("vec_id") % 2 === 0)
      graft.sources.TxTable.commit(even, tbl, "overwrite")
      graft.ext.IvfIndex.buildKMeans(even, "vec_id", "embedding", idx,
        nlist = KmK, iters = KmIters)
      // two ingest commits → two CDF versions → two append batches
      graft.sources.TxTable.commit(
        emb.filter(col("vec_id") % 4 === 1), tbl, "append")
      graft.sources.TxTable.commit(
        emb.filter(col("vec_id") % 4 === 3), tbl, "append")
      DrainLock.synchronized {
        val saved = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = s.readStream.format("graft-txcdf").option("path", tbl)
            .option("startingVersion", "2")
            .option("maxVersionsPerTrigger", "1").load()
            .writeStream
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              graft.ext.IvfIndex.append(
                b.select(col("vec_id"), col("embedding")),
                "vec_id", "embedding", idx): Unit
            }
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      }
      graft.ext.IvfIndex.topK(s, idx, "vec_id", "embedding",
        queryVec(emb), k = 5, nprobe = 2)
    }),
    // ----- INCREMENTAL TABLE REPLICATION — the full lakehouse loop in
    // one certified query: table A's manifest log tails as a CDF
    // (one-version-per-trigger admission), and each micro-batch lands
    // in table B through the exactly-once transactional sink (TxSink
    // batch-id watermarks, so a replayed batch commits nothing). The
    // certified output is B's final snapshot, which must be EXACTLY
    // A's content — a dropped, duplicated, or re-served version breaks
    // the hash -----
    "stream_txreplicate" -> ((s: SparkSession, dir: String) => {
      val base = scratchDir("graft-txrep-")
      val src = s"$base/src"
      val dst = s"$base/dst"
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.sources.TxTable.commit(
        docs.filter(col("lang") === "en"), src, "overwrite")
      graft.sources.TxTable.commit(
        docs.filter(col("lang") === "de"), src, "append")
      graft.sources.TxTable.commit(
        docs.filter(col("lang") === "fr"), src, "append")
      DrainLock.synchronized {
        val saved = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = s.readStream.format("graft-txcdf").option("path", src)
            .option("maxVersionsPerTrigger", "1").load()
            .drop("_commit_version")
            .writeStream
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, id: Long) =>
              graft.streaming.TxSink.appendBatch(dst, b, id,
                appId = "stream_txreplicate"): Unit
            }
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      }
      graft.sources.TxTable.read(s, dst).orderBy("doc_id")
    }),
    // ----- FILE-GRANULAR admission (r19 — the Delta
    // maxFilesPerTrigger dual): one table-sized version (a multi-file
    // overwrite snapshot, the restarted-replica worst case) drains as
    // ceil(files/3) bounded micro-batches, the offset advancing
    // THROUGH the version's immutable sorted file list (TxCdfOffset
    // idx) with a checkpoint between each — batch count and the first
    // PARTIAL committed offset are require-pinned; the drained rows
    // hash-match the source exactly once across the partial-offset
    // checkpoints -----
    "stream_txcdf_files" -> ((s: SparkSession, dir: String) => {
      val base = scratchDir("graft-txcdff-")
      val tbl = s"$base/tbl"
      graft.sources.TxTable.commit(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .filter(col("lang") === "en").repartition(10),
        tbl, "overwrite")
      val nFiles = graft.sources.TxTable.readManifest(
        java.nio.file.Paths.get(tbl), 1L).files.size
      require(nFiles >= 4,
        s"fixture needs a multi-file version, got $nFiles files")
      val out = s"$base/out"
      DrainLock.synchronized {
        val saved = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = s.readStream.format("graft-txcdf").option("path", tbl)
            .option("maxFilesPerTrigger", "3").load()
            .drop("_commit_version")
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      }
      val expected = (nFiles + 2) / 3
      val batches = new java.io.File(s"$base/ckpt/offsets").listFiles()
        .map(_.getName).filterNot(_.startsWith(".")).map(_.toLong).sorted
      require(batches.length == expected,
        s"a $nFiles-file version under maxFilesPerTrigger=3 must drain " +
          s"as $expected batches, got ${batches.toSeq}")
      val first = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$base/ckpt/offsets/0")), "UTF-8")
      require(first.contains("1:3"),
        s"the first committed offset must be partial (1:3): $first")
      s.read.parquet(out).select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),
    // ----- the CDF composed with STATEFUL streaming dedup — the
    // incremental-ingest topology the feed exists for: commit v2
    // re-appends every en row (planted duplicates), the tailed feed
    // drains under a one-version-per-trigger admission cap
    // (TxCdfStream scaladoc), and dropDuplicates' state keeps the
    // FIRST occurrence per doc_id exactly once across micro-batch
    // boundaries — a dropped or re-served version breaks the hash -----
    "stream_txcdf_dedup" -> ((s: SparkSession, dir: String) => {
      val base = scratchDir("graft-txcdfd-")
      val tbl = s"$base/tbl"
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.sources.TxTable.commit(
        docs.filter(col("lang") === "en"), tbl, "overwrite")
      graft.sources.TxTable.commit(
        docs.filter(col("lang").isin("de", "en")), tbl, "append")
      graft.sources.TxTable.commit(
        docs.filter(col("lang") === "fr"), tbl, "append")
      drainStream(s, "graft_stream_txcdf_dedup", "append",
        s.readStream.format("graft-txcdf").option("path", tbl)
          .option("maxVersionsPerTrigger", "1").load()
          .dropDuplicates("doc_id")
          .select(col("doc_id"), col("lang"), col("n_chars")))
        .orderBy("doc_id")
    }),
    // STREAMING sketch maintenance: the HLL register state is one
    // supported max-aggregation, maintained incrementally over the event
    // stream (complete mode, ≤ m rows per group of state) and finalized
    // batch-side — certified against the identical batch-HLL oracle
    "stream_hll" -> ((s: SparkSession, dir: String) =>
      graft.ext.Hll.finalize(
          drainStream(s, "graft_stream_hll", "complete",
            graft.ext.Hll.registers(eventsStream(s, dir),
              "event_type", "user_id")),
          "event_type")
        .orderBy("event_type")),
    // As-of join (latest order at or before each event, per customer) via
    // the union + single-window merge shape — one shuffle of |L|+|R| rows,
    // no join operator in the plan (AsOf scaladoc has the scale argument)
    "join_asof" -> ((s: SparkSession, dir: String) =>
      graft.ext.AsOf.asofJoin(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts")),
          Tables.orders(s, dir),
          "user_id", "o_custkey", "ts", "o_orderdate",
          valueCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = "o_orderkey")
        .select(col("event_id"),
          col("asof_o_orderkey").as("asof_orderkey"),
          col("asof_o_totalprice").as("asof_price"))
        .orderBy("event_id")),
    // last-touch attribution — each purchase credited to the user's
    // latest click at or before it — is EXACTLY as-of semantics. The
    // click side is a FACT, not a dimension (it grows with the corpus),
    // so this routes through asofJoinAuto: broadcast exec while the
    // build fits the cap, the merge-window compose past it — at 100×
    // the query switches plans instead of dying on the broadcast cap.
    "events_attribution" -> ((s: SparkSession, dir: String) => {
      val ev = Tables.events(s, dir)
      graft.plans.AsOfPhys.asofJoinAuto(
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts")),
          ev.filter(col("event_type") === "click")
            .select(col("event_id").as("click_id"), col("user_id"),
              col("ts")),
          "user_id", "user_id", "ts", "ts",
          valueCols = Seq("click_id"), tieBreak = "click_id")
        .select(col("event_id").as("purchase_id"),
          col("asof_click_id").as("attributed_click"))
        .orderBy("purchase_id")
    }),
    // the ROUTER's other arm certified: an explicit tiny cap forces the
    // build side over the threshold, so asofJoinAuto provably takes the
    // merge-window compose (plan-asserted in AsOfPhysSpec: no AsOfJoinExec
    // node) — same oracle as join_asof/join_asof_phys, three plans, one
    // answer, and no query anywhere hard-codes a fact-sized broadcast.
    "join_asof_auto" -> ((s: SparkSession, dir: String) =>
      graft.plans.AsOfPhys.asofJoinAuto(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts")),
          Tables.orders(s, dir),
          "user_id", "o_custkey", "ts", "o_orderdate",
          valueCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = "o_orderkey",
          maxBuildRows = 100L)
        .select(col("event_id"),
          col("asof_o_orderkey").as("asof_orderkey"),
          col("asof_o_totalprice").as("asof_price"))
        .orderBy("event_id")),
    // the mirror direction: EARLIEST order at or after each event ("next
    // purchase after the click") — same single-shuffle merge-window plan
    // scanned over reversed time, smallest-tie determinism
    "join_asof_fwd" -> ((s: SparkSession, dir: String) =>
      graft.ext.AsOf.asofJoinForward(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts")),
          Tables.orders(s, dir),
          "user_id", "o_custkey", "ts", "o_orderdate",
          valueCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = "o_orderkey")
        .select(col("event_id"),
          col("asof_o_orderkey").as("next_orderkey"),
          col("asof_o_totalprice").as("next_price"))
        .orderBy("event_id")),
    // nearest direction (pandas merge_asof direction='nearest'): the
    // closest order in EITHER direction, equal distances preferring
    // backward — one union sort carries both window frames, so the cost
    // is the backward join plus a projection (AsOf scaladoc)
    "join_asof_near" -> ((s: SparkSession, dir: String) =>
      graft.ext.AsOf.asofJoinNearest(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts")),
          Tables.orders(s, dir),
          "user_id", "o_custkey", "ts", "o_orderdate",
          valueCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = "o_orderkey")
        .select(col("event_id"),
          col("asof_o_orderkey").as("near_orderkey"),
          col("asof_o_totalprice").as("near_price"))
        .orderBy("event_id")),
    // the merge_asof parameter surface: tolerance (a 30-day staleness
    // budget — matches farther back yield NULL) composed with
    // allowExactMatches = false (strict `r.t < l.t`). Both are
    // row-local: one predicate on the matched time riding in the
    // candidate struct, one flipped sort literal — the single-shuffle
    // single-window plan is unchanged (AsOf scaladoc).
    "join_asof_tol" -> ((s: SparkSession, dir: String) =>
      graft.ext.AsOf.asofJoin(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts")),
          Tables.orders(s, dir),
          "user_id", "o_custkey", "ts", "o_orderdate",
          valueCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = "o_orderkey",
          toleranceMicros = Some(30L * 86400 * 1000000L),
          allowExactMatches = false)
        .select(col("event_id"),
          col("asof_o_orderkey").as("tol_orderkey"),
          col("asof_o_totalprice").as("tol_price"))
        .orderBy("event_id")),
    // The SAME as-of semantics through the custom WHOLE-operator path:
    // logical AsOfJoin node → injected planner strategy → broadcast
    // binary-search AsOfJoinExec (plans/AsOfJoinPlan.scala scaladoc has
    // the broadcast-dim vs merge-window routing). Certified against the
    // identical oracle as join_asof — two physical plans, one answer.
    "join_asof_phys" -> ((s: SparkSession, dir: String) =>
      graft.plans.AsOfPhys.asofJoinBroadcast(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts")),
          Tables.orders(s, dir),
          "user_id", "o_custkey", "ts", "o_orderdate",
          valueCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = "o_orderkey")
        .select(col("event_id"),
          col("asof_o_orderkey").as("asof_orderkey"),
          col("asof_o_totalprice").as("asof_price"))
        .orderBy("event_id")),
  )

  val oracles: Map[String, String] = Map(
    // the cleared-denominator 3σ test replayed in int128: (n·v − sv)² >
    // 9·(n·svv − sv²) over cent-quantized values — no float anywhere
    // a state maintained over the full stream equals the batch moments,
    // so the stream-scored flags replay the batch oracle verbatim
    "stream_outliers" ->
      ("""WITH q AS (
         |  SELECT event_id, event_type,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
         |  FROM events
         |), s AS (
         |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(value_c) AS HUGEINT) AS sv,
         |    CAST(sum(value_c * value_c) AS HUGEINT) AS svv
         |  FROM q GROUP BY event_type
         |)
         |SELECT q.event_id, q.event_type, q.value_c
         |FROM q JOIN s USING (event_type)
         |WHERE (s.n * q.value_c - s.sv) * (s.n * q.value_c - s.sv)
         |  > 9 * (s.n * s.svv - s.sv * s.sv)
         |ORDER BY event_id""".stripMargin),
    "events_outliers" ->
      ("""WITH q AS (
         |  SELECT event_id, event_type,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
         |  FROM events
         |), s AS (
         |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(value_c) AS HUGEINT) AS sv,
         |    CAST(sum(value_c * value_c) AS HUGEINT) AS svv
         |  FROM q GROUP BY event_type
         |)
         |SELECT q.event_id, q.event_type, q.value_c
         |FROM q JOIN s USING (event_type)
         |WHERE (s.n * q.value_c - s.sv) * (s.n * q.value_c - s.sv)
         |  > 9 * (s.n * s.svv - s.sv * s.sv)
         |ORDER BY event_id""".stripMargin),
    // the same doubled-median rank selection: med2 = two middle ranks
    // (x2 when the group is odd), mad4 likewise over |2x - med2|, flag
    // 2*ad2 > k*mad4 — every value BIGINT, no division anywhere
    "events_mad" ->
      ("""WITH q AS (
         |  SELECT event_id, event_type,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
         |  FROM events
         |), r AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY value_c) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM q
         |), med AS (
         |  SELECT event_type, CAST(sum(value_c) *
         |    (CASE WHEN max(n) % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT) AS med2
         |  FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
         |  GROUP BY event_type
         |), d AS (
         |  SELECT q.event_id, q.event_type, q.value_c,
         |    abs(q.value_c * 2 - m.med2) AS ad2
         |  FROM q JOIN med m USING (event_type)
         |), r2 AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ad2) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM d
         |), mad AS (
         |  SELECT event_type, CAST(sum(ad2) *
         |    (CASE WHEN max(n) % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT) AS mad4
         |  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
         |  GROUP BY event_type
         |)
         |SELECT d.event_id, d.event_type, d.value_c
         |FROM d JOIN mad USING (event_type)
         |WHERE d.ad2 * 2 > 5 * mad.mad4
         |ORDER BY event_id""".stripMargin),
    "events_hourly" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    // the streaming pipeline computes the identical aggregate — same oracle
    "stream_hourly" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    // the two batch-written epochs hold exactly the three event types —
    // the hourly aggregate restricted to them must replay
    "source_dirtail_write" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events WHERE event_type IN ('view', 'click', 'purchase')
         |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    // the batch read with the pushed predicate must land the identical
    // restricted aggregate — any pushdown defect (wrong comparison,
    // swallowed null, mis-projected row) breaks the hash
    "source_dirtail" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events WHERE user_id > 75
         |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    // the hourly aggregate restricted by the predicate evaluated above
    // the micro-batch scan (see the query comment for the honest
    // streaming-vs-batch pushdown split)
    "stream_dirtail_filtered" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events WHERE user_id > 75
         |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    // identical aggregate through the custom DSv2 source: the JSONL
    // round trip (epoch-micros wire ts) must be value-exact, so the
    // stream_hourly oracle certifies the source machinery verbatim
    "stream_dirtail" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    // the sink→source loop must be value-exact end to end, so the same
    // hourly oracle certifies the writer+commit+tail composition
    "stream_dirtail_sink" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    "events_sessions" ->
      ("""WITH flagged AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |              OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), sess AS (
         |  SELECT user_id, ts,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged
         |)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS s_end
         |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin),
    // closed sessions only: non-last sessions (a later event exceeded the
    // gap) plus last sessions whose lastTs+gap the final watermark
    // (max ts, zero lateness) STRICTLY passed — Spark fires event-time
    // timeouts when the watermark advances beyond the set timestamp
    "stream_sessions" ->
      ("""WITH flagged AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |              OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), sess AS (
         |  SELECT user_id, ts,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged
         |), agg AS (
         |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
         |    min(ts) AS s_start, max(ts) AS s_end
         |  FROM sess GROUP BY user_id, session_id
         |), mx AS (SELECT max(ts) AS max_ts FROM events)
         |SELECT user_id, n_events,
         |  CAST(epoch_ms(CAST(s_start AS TIMESTAMP)) AS BIGINT) AS start_ms,
         |  CAST(epoch_ms(CAST(s_end AS TIMESTAMP)) AS BIGINT) AS end_ms
         |FROM agg, mx
         |WHERE s_end + INTERVAL 30 MINUTE < max_ts
         |ORDER BY user_id, start_ms""".stripMargin),
    // the stream-static join computes the identical batch join + aggregate
    "stream_enrich" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |  c_mktsegment, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1, 2 ORDER BY hour, c_mktsegment""".stripMargin),
    // streaming dedup emits each (hour, user, type) exactly once — the
    // batch DISTINCT is its exact oracle (same hour stringification as
    // events_hourly/stream_hourly)
    "stream_dedup" ->
      ("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |  user_id, event_type
         |FROM events GROUP BY 1, 2, 3
         |ORDER BY hour, user_id, event_type""".stripMargin),
    // the exactly-once sink must land the source multiset bit-for-bit:
    // a replayed (duplicated) or dropped micro-batch breaks this hash
    "stream_txsink" ->
      ("""SELECT event_id, user_id, event_type,
         |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
         |FROM events ORDER BY event_id""".stripMargin),
    // the replica must land the source content bit-for-bit: three
    // versions tailed, three exactly-once commits
    "stream_txreplicate" ->
      ("""SELECT doc_id, lang, n_chars FROM documents
         |WHERE lang IN ('en', 'de', 'fr')
         |ORDER BY doc_id""".stripMargin),
    // the file-capped drain moved the same rows, just in more batches:
    // a duplicated or dropped slice of the 10-file version breaks this
    "stream_txcdf_files" ->
      ("""SELECT doc_id, lang, n_chars FROM documents
         |WHERE lang = 'en' ORDER BY doc_id""".stripMargin),
    // first-occurrence dedup over the duplicated feed: every doc once
    // (the v2 en re-appends vanish into dropDuplicates' state)
    "stream_txcdf_dedup" ->
      ("""SELECT doc_id, lang, n_chars FROM documents
         |WHERE lang IN ('en', 'de', 'fr')
         |ORDER BY doc_id""".stripMargin),
    // the CDF replays from the commit definitions: each append's rows
    // arrive tagged with exactly the version that published them
    // arrival batching cannot change frozen-quantizer assignments, so
    // the streamed index answers the SAME oracle as the batch append
    "stream_ivf_append" -> EntryHelpers.IvfAppendOracle,
    "stream_txcdf" ->
      ("""SELECT CAST(1 AS BIGINT) AS version, doc_id, lang, n_chars
         |FROM documents WHERE lang = 'en'
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), doc_id, lang, n_chars
         |FROM documents WHERE lang = 'de'
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), doc_id, lang, n_chars
         |FROM documents WHERE lang = 'fr'
         |ORDER BY version, doc_id""".stripMargin),
    // the cdc drain replayed from the fixture's commit definitions:
    // v1/v2 appends tag 'insert', the v3 UPDATE emits pre/postimages
    // of the de rows, the v4 DELETE emits the short en rows
    "stream_txcdf_cdc" ->
      ("""SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change,
         |  doc_id, lang, n_chars
         |FROM documents WHERE lang = 'en'
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'insert', doc_id, lang, n_chars
         |FROM documents WHERE lang = 'de'
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'update_preimage', doc_id, lang,
         |  n_chars
         |FROM documents WHERE lang = 'de'
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'update_postimage', doc_id, lang,
         |  n_chars + 1000
         |FROM documents WHERE lang = 'de'
         |UNION ALL
         |SELECT CAST(4 AS BIGINT), 'delete', doc_id, lang, n_chars
         |FROM documents WHERE lang = 'en' AND n_chars < 200
         |ORDER BY version, change, doc_id""".stripMargin),
    // deterministic as-of reference: latest admissible order date, ties on
    // (date) broken by largest o_orderkey — the same total order the
    // engine's (time, side, tie) window sort establishes
    "join_asof" ->
      ("""SELECT e.event_id,
         |  (SELECT o.o_orderkey FROM orders o
         |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS asof_orderkey,
         |  (SELECT o.o_totalprice FROM orders o
         |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS asof_price
         |FROM events e ORDER BY e.event_id""".stripMargin),
    // the correlated last-click reference: latest admissible click time,
    // ties to the largest click id — the exec's (time, tie) order
    "events_attribution" ->
      ("""SELECT p.event_id AS purchase_id,
         |  (SELECT c.event_id FROM events c
         |   WHERE c.event_type = 'click' AND c.user_id = p.user_id
         |     AND c.ts <= p.ts
         |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1)
         |    AS attributed_click
         |FROM events p WHERE p.event_type = 'purchase'
         |ORDER BY purchase_id""".stripMargin),
    // identical reference for the custom-exec path: two physical plans
    // (merge-window vs broadcast binary-search) must land one answer
    "join_asof_phys" ->
      ("""SELECT e.event_id,
         |  (SELECT o.o_orderkey FROM orders o
         |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS asof_orderkey,
         |  (SELECT o.o_totalprice FROM orders o
         |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS asof_price
         |FROM events e ORDER BY e.event_id""".stripMargin),
    // forward mirror: earliest admissible order, smallest key on ties
    "join_asof_fwd" ->
      ("""SELECT e.event_id,
         |  (SELECT o.o_orderkey FROM orders o
         |   WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
         |   ORDER BY o.o_orderdate ASC, o.o_orderkey ASC LIMIT 1) AS next_orderkey,
         |  (SELECT o.o_totalprice FROM orders o
         |   WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
         |   ORDER BY o.o_orderdate ASC, o.o_orderkey ASC LIMIT 1) AS next_price
         |FROM events e ORDER BY e.event_id""".stripMargin),
    // nearest reference: min |Δt|, ties to the backward direction, then
    // the within-direction tie rule (backward largest key, forward
    // smallest — the sign flip encodes both in one ORDER BY)
    "join_asof_near" ->
      ("""SELECT e.event_id,
         |  (SELECT o.o_orderkey FROM orders o
         |   WHERE o.o_custkey = e.user_id
         |   ORDER BY abs(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
         |       - epoch_us(e.ts)) ASC,
         |     (CAST(o.o_orderdate AS TIMESTAMP) > e.ts) ASC,
         |     CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
         |       THEN -o.o_orderkey ELSE o.o_orderkey END ASC
         |   LIMIT 1) AS near_orderkey,
         |  (SELECT o.o_totalprice FROM orders o
         |   WHERE o.o_custkey = e.user_id
         |   ORDER BY abs(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
         |       - epoch_us(e.ts)) ASC,
         |     (CAST(o.o_orderdate AS TIMESTAMP) > e.ts) ASC,
         |     CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
         |       THEN -o.o_orderkey ELSE o.o_orderkey END ASC
         |   LIMIT 1) AS near_price
         |FROM events e ORDER BY e.event_id""".stripMargin),
    // tolerance + strict boundary layered onto the backward brute-force
    // reference: admissible = strictly earlier AND within 30 days
    "join_asof_tol" ->
      ("""SELECT e.event_id,
         |  (SELECT o.o_orderkey FROM orders o
         |   WHERE o.o_custkey = e.user_id
         |     AND CAST(o.o_orderdate AS TIMESTAMP) < e.ts
         |     AND epoch_us(e.ts) - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
         |         <= 2592000000000
         |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
         |    AS tol_orderkey,
         |  (SELECT o.o_totalprice FROM orders o
         |   WHERE o.o_custkey = e.user_id
         |     AND CAST(o.o_orderdate AS TIMESTAMP) < e.ts
         |     AND epoch_us(e.ts) - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
         |         <= 2592000000000
         |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
         |    AS tol_price
         |FROM events e ORDER BY e.event_id""".stripMargin),
    // the router's forced-merge arm answers the SAME reference as
    // join_asof/join_asof_phys — three plans, one answer
    "join_asof_auto" ->
      ("""SELECT e.event_id,
         |  (SELECT o.o_orderkey FROM orders o
         |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS asof_orderkey,
         |  (SELECT o.o_totalprice FROM orders o
         |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS asof_price
         |FROM events e ORDER BY e.event_id""".stripMargin),
    // the drained inner join emits exactly the matched pairs of the plain
    // batch interval self-join
    "stream_join" ->
      ("""SELECT v.user_id,
         |  strftime(v.vts, '%Y-%m-%d %H:%M:%S') AS view_t,
         |  strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_t
         |FROM (SELECT user_id, ts AS vts FROM events
         |      WHERE event_type = 'view') v
         |JOIN (SELECT user_id, ts AS cts FROM events
         |      WHERE event_type = 'click') c
         |  ON v.user_id = c.user_id AND c.cts >= v.vts
         | AND c.cts <= v.vts + INTERVAL 5 MINUTE
         |ORDER BY v.user_id, view_t, click_t""".stripMargin),
    // the outer drain adds to the inner join's pairs every view with NO
    // admissible click whose null row the final watermark (least of the
    // two sides' max event times, lateness 0) already released —
    // view_ts + gap strictly below the watermark, the engine's
    // state-eviction bound
    "stream_join_outer" ->
      ("""WITH v AS (SELECT user_id, ts AS vts FROM events
         |           WHERE event_type = 'view'),
         |     c AS (SELECT user_id AS cu, ts AS cts FROM events
         |           WHERE event_type = 'click'),
         |     w AS (SELECT least((SELECT max(vts) FROM v),
         |                        (SELECT max(cts) FROM c)) AS wm)
         |SELECT v.user_id,
         |  strftime(v.vts, '%Y-%m-%d %H:%M:%S') AS view_t,
         |  strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_t
         |FROM v JOIN c
         |  ON c.cu = v.user_id AND c.cts >= v.vts
         | AND c.cts <= v.vts + INTERVAL 5 MINUTE
         |UNION ALL
         |SELECT v.user_id,
         |  strftime(v.vts, '%Y-%m-%d %H:%M:%S') AS view_t,
         |  CAST(NULL AS VARCHAR) AS click_t
         |FROM v, w
         |WHERE v.vts + INTERVAL 5 MINUTE < w.wm
         |  AND NOT EXISTS (SELECT 1 FROM c
         |    WHERE c.cu = v.user_id AND c.cts >= v.vts
         |      AND c.cts <= v.vts + INTERVAL 5 MINUTE)
         |ORDER BY user_id, view_t, click_t NULLS FIRST""".stripMargin),
    // the streamed moment state finalizes to the identical statistics —
    // the agg_varstats oracle verbatim
    "stream_incragg" ->
      ("""WITH c AS (
         |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
         |  FROM events
         |), m AS (
         |  SELECT event_type, count(*) AS n, sum(vc) AS sv,
         |    sum(vc * vc) AS svv
         |  FROM c GROUP BY event_type
         |)
         |SELECT event_type, n,
         |  round(CAST(sv AS DOUBLE) / n, 4) AS mean_c,
         |  round(CAST(n * svv - sv * sv AS DOUBLE) /
         |        CAST(n * n AS DOUBLE), 4) AS var_c
         |FROM m ORDER BY event_type""".stripMargin),
    // the complete-mode drain retains every window, so the streaming
    // finalize answers the identical question — same oracle
    "stream_growth" ->
      ("""WITH h AS (
         |  SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |    event_type, count(*) AS n
         |  FROM events GROUP BY 1, 2
         |), g AS (
         |  SELECT hour, event_type, n,
         |    lag(n) OVER (PARTITION BY event_type ORDER BY hour) AS prev_n
         |  FROM h
         |)
         |SELECT hour, event_type, n, n - prev_n AS delta,
         |  round((n - prev_n) * 100.0 / prev_n, 4) AS pct
         |FROM g ORDER BY event_type, hour""".stripMargin),
    // the streaming register maintenance computes the identical sketch
    "stream_hll" -> HllOracle,
  )
}
