package graft

import graft.compile.NlCompiler
import graft.exec.Executor
import graft.ext.{Dedup, Events, Multimodal, Similarity, TextStats}
import graft.ir.MongoJson
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryHelpers._

/** Text analytics/cleaning, the composed pipeline funnel, packing, sampling/mixing, and incremental/substring/decontamination dedup.
  *
  * One of six per-domain registries merged by [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] — pure relocation of the former monolithic
  * maps, no behavior change (24 entries incl. the round-12 PPS path). */
private[graft] object QueriesTextSampling {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality" -> ((s: SparkSession, dir: String) =>
      TextStats.quality(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    "text_langstats" -> ((s: SparkSession, dir: String) =>
      TextStats.langStats(Tables.documents(s, dir), "lang", "text", "n_chars")
        .orderBy("lang")),
    "text_langid" -> ((s: SparkSession, dir: String) =>
      TextStats.langId(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    "text_fingerprint" -> ((s: SparkSession, dir: String) =>
      TextStats.fingerprints(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // the SAME fingerprint through the registered SQL surface: pure
    // spark.sql over the session-registered codegen kernel, certified by
    // the driver gate against the identical oracle — proves the function
    // registry path end-to-end, not just in a suite
    "text_fingerprint_sql" -> ((s: SparkSession, dir: String) => {
      GraftExtensions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("graft_docs_fp")
      s.sql("SELECT doc_id, rolling_fingerprint(text) AS fp " +
        "FROM graft_docs_fp ORDER BY doc_id")
    }),
    // HTML-to-text over a planted wrapper: tags, a comment, and a
    // script block (containing a bare '<' — the regex-stripper killer)
    // wrap each document; the codegen'd single-pass stripper must
    // recover exactly the clean text plus the decoded entity run
    // (functions/HtmlExpressions.scala scaladoc). Scan-side kernel, no
    // shuffle beyond the orderBy.
    "text_html_strip" -> ((s: SparkSession, dir: String) => {
      val clean = translate(col("text"), "<>&", "")
      val planted = concat(
        lit("<html><!-- meta "), (col("doc_id") % 7).cast("string"),
        lit(" --><body class=\"d"), (col("doc_id") % 5).cast("string"),
        lit("\"><p>"), clean,
        lit("</p><div>x &amp; y &#65;&#x42;</div>" +
          "<script>if (a<b) { var t = \"<p>\"; }</script></body></html>"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.HtmlFunctions.html_strip(planted).as("stripped"))
        .orderBy("doc_id")
    }),
    "text_topterms" -> ((s: SparkSession, dir: String) =>
      TextStats.topTerms(Tables.documents(s, dir), "text", k = 50)
        .orderBy(col("doc_freq").desc, col("term"))),
    "text_lenhist" -> ((s: SparkSession, dir: String) =>
      TextStats.lenHistogram(Tables.documents(s, dir), "n_chars", width = 100)
        .orderBy("bucket")),
    // ----- equi-depth dual of the histogram: ~50 docs per decile, cut
    // points from the aggregated length distribution (TextStats
    // .lenDeciles scaladoc: the corpus is never globally sorted) -----
    "text_ntile" -> ((s: SparkSession, dir: String) =>
      TextStats.lenDeciles(Tables.documents(s, dir), "n_chars", buckets = 10)
        .orderBy("bucket")),
    // C4-style quality gate: keep docs ≥100 chars, stopword ratio ≥0.02,
    // mean token length ≤5.0 — thresholds on the ROUNDED metrics so the
    // keep set is reproducible externally
    "text_cleanpass" -> ((s: SparkSession, dir: String) =>
      TextStats.cleanPass(Tables.documents(s, dir), "doc_id", "text",
          minChars = 100L, minStopwordRatio = 0.02, maxAvgTokenLen = 5.0)
        .orderBy("doc_id")),
    // The COMPOSED training-data pipeline as one certified funnel: raw →
    // C4 quality gate (text_cleanpass thresholds) → exact dedup (min-id
    // per content hash) → decontamination (drop the eval slice and its
    // exact matches) with per-stage survivor counts — the stages chain,
    // which no single-stage query proves. Each stage is the operator the
    // standalone query certifies; the broadcast anti-join keeps the
    // survivors from re-shuffling for decontamination.
    "pipeline_funnel" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      val s1 = TextStats.cleanPass(docs, "doc_id", "text",
        minChars = 100L, minStopwordRatio = 0.02, maxAvgTokenLen = 5.0)
        .select(col("doc_id"))
      // each stage feeds BOTH its own count and every later stage:
      // persisted (TrackedCache, released by Dedup.unpersistAll) so the
      // gate/dedup work runs once, not once per downstream count — at
      // 100 TB you materialize each funnel stage, never re-run it
      val d1 = graft.ext.TrackedCache.persistTracked(
        docs.join(s1, Seq("doc_id")))
      val byFp = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(lower(col("text")))).orderBy(col("doc_id"))
      val d2 = graft.ext.TrackedCache.persistTracked(
        d1.withColumn("__rn", row_number().over(byFp))
          .filter(col("__rn") === 1).drop("__rn"))
      val eval = docs.filter(col("source") === "src19")
        .select(lower(col("text")).as("__evtext")).distinct()
      val d3 = d2.filter(col("source") =!= "src19")
        .join(broadcast(eval), lower(col("text")) === col("__evtext"),
          "left_anti")
      Seq(("raw", docs), ("quality_gate", d1), ("exact_dedup", d2),
        ("decontaminated", d3)).zipWithIndex.map { case ((name, df), i) =>
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(i.toLong).as("stage"), lit(name).as("stage_name"),
            col("n_docs"))
      }.reduce(_ unionAll _).orderBy("stage")
    }),
    // exact per-language median doc length — middle-rows formulation, not
    // percentile_approx, precisely so an external engine can reproduce it
    "text_lenmedian" -> ((s: SparkSession, dir: String) =>
      TextStats.groupMedian(Tables.documents(s, dir), "lang", "n_chars")
        .withColumnRenamed("median", "median_chars")
        .orderBy("lang")),
    // Sequence packing: per-language concat-and-cut block assignment at a
    // 512-token budget — one window per shard, no global order
    "pack_blocks" -> ((s: SparkSession, dir: String) =>
      graft.ext.Packing.packBlocks(Tables.documents(s, dir),
          "doc_id", "text", "lang", budget = 512L)
        .select(col("lang"), col("doc_id"), col("n_tokens"), col("block"))
        .orderBy("lang", "doc_id")),
    // Size-balanced shard export (Packing.shardBalanced scaladoc: the
    // two-level LPT round-robin — per-bucket windows, never a global
    // order): every doc assigned exactly once, per-doc assignment
    // certified (the per-shard mass balance is suite-asserted)
    "pack_shards" -> ((s: SparkSession, dir: String) =>
      graft.ext.Packing.shardBalanced(Tables.documents(s, dir),
          "doc_id", "n_chars", numShards = 8, buckets = 4)
        .select(col("doc_id"), col("n_chars"), col("shard"))
        .orderBy("doc_id")),
    // Deterministic content-hash sampling: downsample English to 20%, keep
    // 50% elsewhere — membership is a pure function of the text, so every
    // engine/run/cluster selects the identical subset (rand() does not)
    "sample_stratified" -> ((s: SparkSession, dir: String) =>
      graft.ext.Sampling.stratifiedHashSample(Tables.documents(s, dir),
          "lang", "text", rates = Map("en" -> 2), defaultKeep = 5, outOf = 10)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")),
    // the uniform dual: one global ~30% keep rate, same pure-content
    // membership function (a narrow scan-resident predicate, no shuffle)
    "sample_hash" -> ((s: SparkSession, dir: String) =>
      graft.ext.Sampling.hashSample(Tables.documents(s, dir),
          "text", keep = 3, outOf = 10)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")),
    // Per-source quota rebalancing: at most 8 docs per source, picked by
    // content-fingerprint order — the deterministic data-mixing cut
    // (Sampling.quotaSample scaladoc: WindowGroupLimit prunes map-side)
    "sample_quota" -> ((s: SparkSession, dir: String) =>
      graft.ext.Sampling.quotaSample(Tables.documents(s, dir),
          "source", "doc_id", "text", quota = 8)
        .orderBy("source", "rnk")),
    // Systematic PPS sampling: exactly 20 weighted picks per source where
    // a doc's pick count is proportional to its LENGTH share — telescoping
    // floor((cum+w)k/W) arithmetic, content-fingerprint order, pure long
    // division (Sampling.ppsSample scaladoc; heavy docs get copies > 1)
    "sample_pps" -> ((s: SparkSession, dir: String) =>
      graft.ext.Sampling.ppsSample(Tables.documents(s, dir),
          "doc_id", "text", "n_chars", "source", k = 20)
        .orderBy("doc_id")),
    // Temperature-based source mixture (α = 1/2): keep ~half the corpus
    // redistributed by sqrt-share — small sources boosted, multi-epoch
    // `copies` where the boosted rate exceeds 1 (Sampling
    // .temperatureSample scaladoc: one IEEE-exact sqrt per source, then
    // pure integer arithmetic; membership is the same content-hash
    // predicate as sample_hash)
    "sample_temperature" -> ((s: SparkSession, dir: String) =>
      graft.ext.Sampling.temperatureSample(Tables.documents(s, dir),
          "source", "doc_id", "text", targetNum = 1, targetDen = 2)
        .orderBy("doc_id")),
    // Reproducible 80/10/10 train/val/test assignment — membership is a
    // pure function of the text (Sampling.threeWaySplit scaladoc:
    // append-stable, leak-proof under duplication, zero shuffles)
    "sample_split" -> ((s: SparkSession, dir: String) =>
      graft.ext.Sampling.threeWaySplit(Tables.documents(s, dir), "text",
          trainPct = 80, valPct = 10)
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")),
    // Incremental-ingest dedup: sources 0-9 play the already-accepted
    // corpus (persisted as a 32-byte/doc fingerprint index), sources
    // 10-19 the new batch — survivors are batch docs whose content the
    // index has not seen. The corpus text is never rescanned
    "dedup_incremental" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      val srcNum = expr("CAST(substr(source, 4) AS INT)")
      val tmp = scratchDir("graft-fpix-")
      graft.ext.Dedup.buildFingerprintIndex(
        docs.filter(srcNum < 10), "text", tmp)
      graft.ext.Dedup.incremental(docs.filter(srcNum >= 10), "text", tmp)
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),
    // ----- SUBSTRING-level exact dedup (Dedup.substringSpans scaladoc:
    // cross-document duplicated runs ≥ k tokens found as merged k-gram
    // anchor coverage — the Lee-et-al span-removal shape, bounded) over
    // the planted-boilerplate corpus; certified output is every maximal
    // duplicated span with its text -----
    "dedup_substring" -> ((s: SparkSession, dir: String) =>
      graft.ext.Dedup.substringSpans(spanDocs(s, dir), "doc_id", "text",
          k = 5)
        .orderBy("doc_id", "start")),
    // the excision half: spans cut out, survivors re-joined — certified
    // per-doc clean text + removed-token count
    "dedup_substring_clean" -> ((s: SparkSession, dir: String) =>
      graft.ext.Dedup.removeDupSpans(spanDocs(s, dir), "doc_id", "text",
          k = 5)
        .orderBy("doc_id")),
    // Decontamination: scrub training docs whose exact normalized content
    // appears in the held-out source (src19 plays the benchmark/eval set);
    // anti-join on md5 fingerprints with the tiny eval side broadcast
    "dedup_decontaminate" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      graft.ext.Dedup.decontaminate(
          docs.filter(col("source") =!= "src19"),
          docs.filter(col("source") === "src19"), "text")
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),
    // ----- graded contamination score: per eval doc, the fraction of its
    // distinct shingles found anywhere in train (Dedup.overlapRate
    // scaladoc: one broadcast equi-join on the shingle, train never
    // shuffles) -----
    "dedup_overlap" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      graft.ext.Dedup.overlapRate(
          docs.filter(col("source") =!= "src19"),
          docs.filter(col("source") === "src19"), "doc_id", "text")
        .orderBy("doc_id")
    }),
    // ----- who-copies-from-whom: shared distinct fingerprints per source
    // pair (Dedup.crossSourceDupes scaladoc: 32-byte fp join, documents
    // never shuffle). The synthetic corpus has almost no natural
    // cross-source dupes, so a 'mirror' source re-emitting every 7th doc
    // is planted — the derivation is pure doc_id arithmetic the oracle
    // replays, and it guarantees the certification compares real rows -----
    "dedup_crossrate" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      val corpus = docs.select(col("source"), col("text"))
        .union(docs.filter(col("doc_id") % 7 === 0)
          .select(lit("mirror").as("source"), col("text")))
      graft.ext.Dedup.crossSourceDupes(corpus, "text", "source")
        .orderBy("src_a", "src_b")
    }),
    // ----- §2.10 events / JSON / windows / joins -----
    "events_json" -> ((s: SparkSession, dir: String) =>
      Events.jsonProps(Tables.events(s, dir)).orderBy("event_id")),
  )

  val oracles: Map[String, String] = Map(
    "text_quality" ->
      s"WITH $QualityCtes SELECT * FROM q ORDER BY doc_id",
    "text_langstats" ->
      ("""SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    "text_langid" ->
      ("""WITH s AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |h AS (SELECT doc_id,
         |  len([x for x in w if x IN ('the','and','of','to','is','in')]) AS en,
         |  len([x for x in w if x IN ('el','la','de','que','y','los')]) AS es,
         |  len([x for x in w if x IN ('der','die','und','das','nicht','ist')]) AS de,
         |  len([x for x in w if x IN ('le','la','les','et','des','une')]) AS fr,
         |  len([x for x in w if x IN ('的','是','了','在','我','有')]) AS zh
         |  FROM s),
         |b AS (SELECT doc_id, en, es, de, fr, zh, greatest(en, es, de, fr, zh) AS best FROM h)
         |SELECT doc_id,
         |  CASE WHEN best = 0 THEN 'und'
         |       WHEN en = best THEN 'en' WHEN es = best THEN 'es'
         |       WHEN de = best THEN 'de' WHEN fr = best THEN 'fr'
         |       ELSE 'zh' END AS pred_lang,
         |  CAST(best AS BIGINT) AS score
         |FROM b ORDER BY doc_id""".stripMargin),
    "text_fingerprint" ->
      // BIGINT lambda input: DuckDB's list_reduce accumulates in the element
      // type, and INT32 overflows at (acc * 31) — cast before folding.
      ("""SELECT doc_id,
         |  CAST(list_reduce([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')],
         |       (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin),
    // the planted wrapper strips back to the clean text plus the fixed
    // decoded-entity run — replayed without any HTML machinery at all
    "text_html_strip" ->
      ("""SELECT doc_id,
         |  translate(text, '<>&', '') || 'x & y AB' AS stripped
         |FROM documents ORDER BY doc_id""".stripMargin),
    // one fingerprint, three surfaces: Column API, SQL function, oracle
    "text_fingerprint_sql" ->
      ("""SELECT doc_id,
         |  CAST(list_reduce([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')],
         |       (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin),
    // the same two-level round-robin replayed: per-bucket size-desc
    // rank (ties to the lower doc_id), shard = (rank0 + bucket) mod k —
    // pure integer arithmetic, identical on any engine
    "pack_shards" ->
      ("""WITH r AS (
         |  SELECT doc_id, n_chars, doc_id % 4 AS b,
         |    row_number() OVER (PARTITION BY doc_id % 4
         |      ORDER BY n_chars DESC, doc_id) - 1 AS r0
         |  FROM documents
         |)
         |SELECT doc_id, n_chars, CAST((r0 + b) % 8 AS BIGINT) AS shard
         |FROM r ORDER BY doc_id""".stripMargin),
    // same tokenization (single-space split) and the same
    // preceding-total/budget float division + floor in both engines;
    // integer token counts are exact in double far past any corpus size
    "pack_blocks" ->
      ("""WITH t AS (
         |  SELECT lang, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |)
         |SELECT lang, doc_id, n_tokens,
         |  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
         |              - n_tokens) / 512.0) AS BIGINT) AS block
         |FROM t ORDER BY lang, doc_id""".stripMargin),
    "text_lenhist" ->
      ("""SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket,
         |  count(*) AS n_docs, min(n_chars) AS min_len, max(n_chars) AS max_len
         |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin),
    // equi-depth cut points from the aggregated length distribution,
    // exact integer arithmetic: bucket = (cum_before * 10) div total
    "text_ntile" ->
      ("""WITH d AS (
         |  SELECT n_chars, count(*) AS cnt FROM documents GROUP BY n_chars
         |), c AS (
         |  SELECT n_chars, cnt,
         |    sum(cnt) OVER (ORDER BY n_chars
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cum0,
         |    (SELECT sum(cnt) FROM d) AS total
         |  FROM d
         |)
         |SELECT CAST((cum0 * 10) // total AS BIGINT) AS bucket,
         |  CAST(sum(cnt) AS BIGINT) AS n_docs,
         |  min(n_chars) AS min_len, max(n_chars) AS max_len
         |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin),
    // the SAME QualityCtes metric arithmetic with the gate's thresholds on
    // the rounded values
    "text_cleanpass" ->
      (s"""WITH $QualityCtes
         |SELECT * FROM q
         |WHERE n_chars >= 100 AND stopword_ratio >= 0.02 AND avg_token_len <= 5.0
         |ORDER BY doc_id""".stripMargin),
    // the composed funnel: same QualityCtes gate, min-id-per-hash dedup,
    // NOT-EXISTS decontamination — stage counts chain
    "pipeline_funnel" ->
      (s"""WITH $QualityCtes, s1 AS (
         |  SELECT doc_id FROM q
         |  WHERE n_chars >= 100 AND stopword_ratio >= 0.02
         |    AND avg_token_len <= 5.0
         |), d1 AS (
         |  SELECT d.* FROM documents d JOIN s1 USING (doc_id)
         |), d2 AS (
         |  SELECT * FROM (
         |    SELECT d1.*, row_number() OVER (
         |      PARTITION BY md5(lower(text)) ORDER BY doc_id) AS rn
         |    FROM d1) WHERE rn = 1
         |), d3 AS (
         |  SELECT * FROM d2 WHERE source <> 'src19' AND NOT EXISTS (
         |    SELECT 1 FROM documents e
         |    WHERE e.source = 'src19' AND lower(e.text) = lower(d2.text))
         |)
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
         |    count(*) AS n_docs FROM documents
         |  UNION ALL SELECT 1, 'quality_gate', count(*) FROM d1
         |  UNION ALL SELECT 2, 'exact_dedup', count(*) FROM d2
         |  UNION ALL SELECT 3, 'decontaminated', count(*) FROM d3
         |) ORDER BY stage""".stripMargin),
    // identical middle-rows median formulation; tie order among equal
    // values cannot change which VALUES are selected
    "text_lenmedian" ->
      ("""WITH r AS (
         |  SELECT lang, n_chars,
         |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS cnt
         |  FROM documents
         |)
         |SELECT lang, max(cnt) AS n_docs,
         |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS median_chars
         |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
         |GROUP BY lang ORDER BY lang""".stripMargin),
    // the same Rabin-Karp fold as text_fingerprint decides membership, so
    // the oracle reproduces the exact subset, not a statistical twin
    // the identical Rabin–Karp fold mod 100 with the 80/90 cut points
    "sample_split" ->
      ("""WITH fp AS (
         |  SELECT doc_id,
         |    CAST(list_reduce([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')],
         |         (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) % 100 AS b
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM fp ORDER BY doc_id""".stripMargin),
    "sample_hash" ->
      ("""WITH fp AS (
         |  SELECT doc_id, lang,
         |    CAST(list_reduce([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')],
         |         (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) % 10 AS b
         |  FROM documents
         |)
         |SELECT doc_id, lang FROM fp WHERE b < 3
         |ORDER BY doc_id""".stripMargin),
    "sample_stratified" ->
      ("""WITH fp AS (
         |  SELECT doc_id, lang,
         |    CAST(list_reduce([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')],
         |         (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) % 10 AS b
         |  FROM documents
         |)
         |SELECT doc_id, lang FROM fp
         |WHERE b < CASE WHEN lang = 'en' THEN 2 ELSE 5 END
         |ORDER BY doc_id""".stripMargin),
    // replay the temperature recipe: per-source counts, the ONE
    // IEEE-correctly-rounded sqrt (quantized to 1e-3 longs), then pure
    // integer rate/epoch/remainder arithmetic and the same content-hash
    // membership fold as sample_hash (1e6 buckets)
    "sample_temperature" ->
      ("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |q AS (SELECT source, n,
         |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS qs
         |      FROM c),
         |t AS (SELECT sum(n) AS nn, sum(qs) AS w FROM q),
         |r AS (SELECT source, n, qs,
         |        CAST((((SELECT nn FROM t) * 1 // 2) * qs * 1000000)
         |          // ((SELECT w FROM t) * n) AS BIGINT) AS rate
         |      FROM q),
         |fp AS (SELECT doc_id, source,
         |         CAST(list_reduce([CAST(ascii(ch) AS BIGINT) for ch in string_split(text, '')],
         |           (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT)
         |           % 1000000 AS b
         |       FROM documents)
         |SELECT fp.doc_id AS doc_id, fp.source AS source,
         |  CAST(r.rate // 1000000
         |    + CASE WHEN fp.b < r.rate % 1000000 THEN 1 ELSE 0 END
         |    AS BIGINT) AS copies
         |FROM fp JOIN r ON fp.source = r.source
         |WHERE r.rate // 1000000
         |    + CASE WHEN fp.b < r.rate % 1000000 THEN 1 ELSE 0 END > 0
         |ORDER BY doc_id""".stripMargin),
    // the full (un-modded) fingerprint fold orders the per-source pick,
    // so the oracle reproduces the exact quota subset and rank
    "sample_quota" ->
      ("""WITH fp AS (
         |  SELECT source, doc_id,
         |    CAST(list_reduce([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')],
         |         (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fp
         |  FROM documents
         |)
         |SELECT source, doc_id,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY fp, doc_id)
         |    AS BIGINT) AS rnk
         |FROM fp
         |QUALIFY rnk <= 8
         |ORDER BY source, rnk""".stripMargin),
    // the telescoping floor arithmetic replayed over the same
    // fingerprint order; DuckDB's window sums widen to HUGEINT so the
    // products never overflow and the final copies casts back
    "sample_pps" ->
      ("""WITH fp AS (
         |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
         |    CAST(list_reduce([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')],
         |         (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS f
         |  FROM documents WHERE n_chars > 0
         |), c AS (
         |  SELECT doc_id, source, w,
         |    COALESCE(sum(w) OVER (PARTITION BY source ORDER BY f, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         |    sum(w) OVER (PARTITION BY source) AS tot
         |  FROM fp
         |)
         |SELECT doc_id, source, w,
         |  CAST(((cum + w) * 20) // tot - (cum * 20) // tot AS BIGINT)
         |    AS copies
         |FROM c
         |WHERE ((cum + w) * 20) // tot - (cum * 20) // tot > 0
         |ORDER BY doc_id""".stripMargin),
    // md5(lower(text)) equality == lower(text) equality (no collisions at
    // any realistic corpus size), so NOT EXISTS over the text is exact
    "dedup_incremental" ->
      ("""SELECT d.doc_id FROM documents d
         |WHERE CAST(substr(d.source, 4) AS INT) >= 10 AND NOT EXISTS (
         |  SELECT 1 FROM documents e
         |  WHERE CAST(substr(e.source, 4) AS INT) < 10
         |    AND lower(e.text) = lower(d.text))
         |ORDER BY d.doc_id""".stripMargin),
    "dedup_decontaminate" ->
      ("""SELECT d.doc_id FROM documents d
         |WHERE d.source <> 'src19' AND NOT EXISTS (
         |  SELECT 1 FROM documents e
         |  WHERE e.source = 'src19' AND lower(e.text) = lower(d.text))
         |ORDER BY d.doc_id""".stripMargin),
    // the substring-dedup derivation shared by both substring queries:
    // SpanCte plants the boilerplate, then the same sequential 5-gram
    // poly hash as the engine (GramPolyOps — list_reduce's first-element
    // seed equals the 0-seeded fold), cross-doc-duplicated grams via
    // HAVING count(DISTINCT doc_id) >= 2, and gaps-and-islands coverage
    // merge (windows of equal width: a later start within `width` of the
    // previous hit keeps the island open)
    "dedup_substring" ->
      (s"""WITH $SpanCte, t AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |  FROM spand
         |), g AS (
         |  SELECT doc_id, least(5, len(ws)) AS width,
         |    list_transform(range(1, greatest(len(ws) - 5, 0) + 2),
         |      i -> array_to_string(ws[i:i+4], ' ')) AS grams
         |  FROM t WHERE len(ws) > 0
         |), h AS (
         |  SELECT doc_id, width, list_transform(grams, t2 ->
         |    list_reduce([CAST(ascii(c) AS BIGINT)
         |                 for c in string_split(t2, '')],
         |      (a, x) -> (a * 31 + x) % 2147483647) * 2147483648
         |    + list_reduce([CAST(ascii(c) AS BIGINT)
         |                   for c in string_split(t2, '')],
         |      (a, x) -> (a * 131 + x) % 2147483629)) AS hs
         |  FROM g
         |), ph AS (
         |  SELECT doc_id, width, generate_subscripts(hs, 1) - 1 AS pos,
         |    unnest(hs) AS hv
         |  FROM h
         |), dup AS (
         |  SELECT hv FROM ph GROUP BY hv HAVING count(DISTINCT doc_id) >= 2
         |), hit AS (
         |  SELECT doc_id, width, pos FROM ph JOIN dup USING (hv)
         |), isl AS (
         |  SELECT doc_id, width, pos,
         |    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |                 + width
         |      THEN 1 ELSE 0 END AS brk
         |  FROM hit
         |), cum AS (
         |  SELECT doc_id, width, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM isl
         |), sp AS (
         |  SELECT doc_id, min(pos) AS start, max(pos) + max(width) - 1 AS endp
         |  FROM cum GROUP BY doc_id, grp
         |)
         |SELECT sp.doc_id, CAST(start AS BIGINT) AS start,
         |  CAST(endp - start + 1 AS BIGINT) AS len,
         |  array_to_string(ws[start+1 : endp+1], ' ') AS span_text
         |FROM sp JOIN t USING (doc_id)
         |ORDER BY doc_id, start""".stripMargin),
    // same span derivation, then per-token covered flags via a range
    // join against the spans; survivors string_agg back in order
    "dedup_substring_clean" ->
      (s"""WITH $SpanCte, t AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |  FROM spand
         |), g AS (
         |  SELECT doc_id, least(5, len(ws)) AS width,
         |    list_transform(range(1, greatest(len(ws) - 5, 0) + 2),
         |      i -> array_to_string(ws[i:i+4], ' ')) AS grams
         |  FROM t WHERE len(ws) > 0
         |), h AS (
         |  SELECT doc_id, width, list_transform(grams, t2 ->
         |    list_reduce([CAST(ascii(c) AS BIGINT)
         |                 for c in string_split(t2, '')],
         |      (a, x) -> (a * 31 + x) % 2147483647) * 2147483648
         |    + list_reduce([CAST(ascii(c) AS BIGINT)
         |                   for c in string_split(t2, '')],
         |      (a, x) -> (a * 131 + x) % 2147483629)) AS hs
         |  FROM g
         |), ph AS (
         |  SELECT doc_id, width, generate_subscripts(hs, 1) - 1 AS pos,
         |    unnest(hs) AS hv
         |  FROM h
         |), dup AS (
         |  SELECT hv FROM ph GROUP BY hv HAVING count(DISTINCT doc_id) >= 2
         |), hit AS (
         |  SELECT doc_id, width, pos FROM ph JOIN dup USING (hv)
         |), isl AS (
         |  SELECT doc_id, width, pos,
         |    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |                 + width
         |      THEN 1 ELSE 0 END AS brk
         |  FROM hit
         |), cum AS (
         |  SELECT doc_id, width, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM isl
         |), sp AS (
         |  SELECT doc_id, min(pos) AS start, max(pos) + max(width) - 1 AS endp
         |  FROM cum GROUP BY doc_id, grp
         |), tokpos AS (
         |  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS ti, unnest(ws) AS tok
         |  FROM t
         |), marked AS (
         |  SELECT tp.doc_id, tp.ti, tp.tok,
         |    max(CASE WHEN sp.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS cov
         |  FROM tokpos tp LEFT JOIN sp
         |    ON sp.doc_id = tp.doc_id AND tp.ti >= sp.start AND tp.ti <= sp.endp
         |  GROUP BY tp.doc_id, tp.ti, tp.tok
         |)
         |SELECT doc_id,
         |  coalesce(string_agg(CASE WHEN cov = 0 THEN tok END, ' '
         |                      ORDER BY ti), '') AS clean_text,
         |  CAST(sum(cov) AS BIGINT) AS n_removed
         |FROM marked GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin),
    // distinct (source, md5) pairs, fp equi-join, strict ordering keeps
    // each unordered source pair once
    "dedup_crossrate" ->
      ("""WITH corpus AS (
         |  SELECT source, text FROM documents
         |  UNION ALL
         |  SELECT 'mirror', text FROM documents WHERE doc_id % 7 = 0
         |), fp AS (
         |  SELECT DISTINCT source AS src, md5(lower(text)) AS fp
         |  FROM corpus
         |)
         |SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
         |FROM fp a JOIN fp b ON a.fp = b.fp AND a.src < b.src
         |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin),
    // same distinct 3-gram shingle derivation as JaccardCtes, split by
    // the src19 eval cut; hit fraction rounded like the engine
    "dedup_overlap" ->
      ("""WITH toks AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS s FROM documents
         |), g AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(s) < 3 THEN [array_to_string(s, ' ')]
         |         ELSE list_distinct([array_to_string(s[i:i+2], ' ')
         |                             for i in range(1, len(s) - 1)]) END AS grams
         |  FROM toks
         |), ev AS (
         |  SELECT doc_id, unnest(grams) AS gram FROM g WHERE source = 'src19'
         |), tr AS (
         |  SELECT DISTINCT gram FROM (
         |    SELECT unnest(grams) AS gram FROM g WHERE source <> 'src19')
         |), j AS (
         |  SELECT ev.doc_id, count(*) AS n_grams,
         |    sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
         |  FROM ev LEFT JOIN tr ON ev.gram = tr.gram
         |  GROUP BY ev.doc_id
         |)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  round(CAST(n_hits AS DOUBLE) / n_grams, 4) AS overlap
         |FROM j ORDER BY doc_id""".stripMargin),
    "text_topterms" ->
      // same tokenization as the engine (single-space split, per-doc
      // distinct) and the same deterministic k-boundary tie-break on term
      ("""SELECT term, count(*) AS doc_freq FROM (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
         |  FROM documents
         |) GROUP BY term ORDER BY doc_freq DESC, term LIMIT 50""".stripMargin),
    "events_json" ->
      ("SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events ORDER BY event_id"),
  )
}
