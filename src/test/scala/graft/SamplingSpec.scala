package graft

import graft.ext.{Dedup, Sampling, TextStats}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling, length histogram, decontamination. */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "alpha beta gamma"),
    (2L, "en", "beta gamma delta"),
    (3L, "en", "gamma delta epsilon"),
    (4L, "de", "zeta eta theta"),
    (5L, "de", "eta theta iota"),
    (6L, "fr", "iota kappa lambda")).toDF("doc_id", "lang", "text")

  test("hashSample: deterministic across calls; keep=outOf keeps all") {
    val a = Sampling.hashSample(docs, "text", 5, 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "text", 5, 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // membership is a function of content, not of the run
    assert(Sampling.hashSample(docs, "text", 10, 10).count() == 6)
    assert(Sampling.hashSample(docs, "text", 0, 10).count() == 0)
  }

  test("stratifiedHashSample: per-stratum rate, default for the rest") {
    val kept = Sampling.stratifiedHashSample(docs, "lang", "text",
      rates = Map("en" -> 0), defaultKeep = 10, outOf = 10)
      .select("lang").collect().map(_.getString(0)).toSet
    assert(kept == Set("de", "fr")) // en fully cut, others fully kept
  }

  test("stratified subset equals per-row hash predicate (the oracle rule)") {
    val got = Sampling.stratifiedHashSample(docs, "lang", "text",
      rates = Map("en" -> 2), defaultKeep = 5, outOf = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byHand = docs
      .withColumn("b", pmod(TextStats.rollingFingerprint(col("text")), lit(10L)))
      .filter(when(col("lang") === "en", col("b") < 2).otherwise(col("b") < 5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == byHand)
  }

  test("lenHistogram: bucket edges and exact min/max") {
    val d = docs.withColumn("len", length(col("text")).cast("long"))
    val h = TextStats.lenHistogram(d, "len", width = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // lengths: 16,16,19 -> bucket 1; 14,13,17 -> bucket 1 too... compute:
    val lens = docs.select(length(col("text"))).collect().map(_.getInt(0))
    val exp = lens.groupBy(_ / 10).toSeq.sortBy(_._1)
      .map { case (b, ls) => (b.toLong, ls.length.toLong,
        ls.min.toLong, ls.max.toLong) }
    assert(h.toSeq == exp)
  }

  test("decontaminate: drops exact-content overlap, case-insensitive") {
    val train = Seq((1L, "keep me"), (2L, "Shared Text"), (3L, "also kept"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "shared text")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, eval, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }

  test("packBlocks: per-shard concat-and-cut block assignment") {
    val d = Seq(
      (1L, "s1", "a b c"), // 3 tokens, starts at 0 -> block 0
      (2L, "s1", "d e f g"), // starts at 3 -> block 0
      (3L, "s1", "h i"), // starts at 7 -> block 1 (budget 5)
      (4L, "s1", "j"), // starts at 9 -> block 1
      (5L, "s2", "k l m n o p") // own shard, starts at 0 -> block 0
    ).toDF("doc_id", "shard", "text")
    val out = graft.ext.Packing.packBlocks(d, "doc_id", "text", "shard", 5L)
      .orderBy("shard", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 2L, 1L),
      (4L, 1L, 1L), (5L, 6L, 0L)))
  }

  test("packBlocks: blocks are contiguous, dense, and budget-bounded") {
    // a longer shard: blocks must tile the prefix sums without gaps
    val docs = (1L to 40L).map(i => (i, "s", ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "shard", "text")
    val rows = graft.ext.Packing.packBlocks(docs, "doc_id", "text", "shard", 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    var cum = 0L
    rows.foreach { case (_, n, block) =>
      assert(block == cum / 10L) // starts in the block its prefix sum says
      cum += n
    }
    // block ids are nondecreasing and never skip more than the doc spans
    rows.sliding(2).foreach { case Array((_, _, b1), (_, n2, b2)) =>
      assert(b2 >= b1 && b2 <= b1 + (n2 + 10L) / 10L + 1)
    case _ => () }
  }

  test("quotaSample: at most quota rows per group, fingerprint-ordered") {
    val out = Sampling.quotaSample(docs, "lang", "doc_id", "text", quota = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // per-group caps respected; fr has only one doc
    val byLang = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang == Map("en" -> 2, "de" -> 2, "fr" -> 1))
    // ranks are 1..n within each group
    assert(out.groupBy(_._1).values.forall(g =>
      g.map(_._3).sorted.toSeq == (1L to g.length).toSeq))
    // the pick order is the fingerprint order, reproduced by hand
    val fps = docs
      .withColumn("fp", TextStats.rollingFingerprint(col("text")))
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("fp")))
    val expected = fps.groupBy(_._1).toSeq.flatMap { case (lang, g) =>
      g.sortBy(r => (r._3, r._2)).take(2).zipWithIndex
        .map { case ((_, id, _), i) => (lang, id, i + 1L) }
    }.toSet
    assert(out.toSet == expected)
  }

  test("quotaSample: deterministic across runs and repartitionings") {
    val a = Sampling.quotaSample(docs, "lang", "doc_id", "text", 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sampling.quotaSample(docs.repartition(7), "lang", "doc_id",
        "text", 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("threeWaySplit: pure function of text, splits partition the corpus") {
    val docs = (1L to 200L).map(i => (i, s"document number $i text"))
      .toDF("doc_id", "text")
    val a = graft.ext.Sampling.threeWaySplit(docs, "text", 80, 10)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // identical under a different partitioning — and every doc has a split
    val b = graft.ext.Sampling.threeWaySplit(docs.repartition(7), "text",
        80, 10)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    val shares = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(shares("train") > shares.getOrElse("test", 0))
    intercept[IllegalArgumentException](
      graft.ext.Sampling.threeWaySplit(docs, "text", 80, 30))
  }

  test("temperatureSample: sqrt-share rates, multi-epoch boost for rare sources") {
    // 180 "web" docs vs 20 "book" docs, keep ~half: sqrt-share gives web
    // q=13416, book q=4472 → rates web 100/180·13416/17888 = 0.4166…,
    // book 100/20·4472/17888 = 1.25 → books get 1 whole epoch + 25% more
    // varying LENGTHS, not just a numeric suffix: a 31-ary poly hash of
    // texts differing only in the last chars clusters within 31^k of each
    // other mod 1e6 — real corpora vary in length, the fixture must too
    val docs = ((1L to 180L).map(i =>
      (i, "web", s"web page $i " + "lorem ipsum " * (i % 11).toInt)) ++
      (201L to 220L).map(i =>
        (i, "book", s"book text $i " + "chapter " * (i % 5).toInt)))
      .toDF("doc_id", "source", "text")
    val out = Sampling.temperatureSample(docs, "source", "doc_id", "text",
        targetNum = 1, targetDen = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // replay the documented integer arithmetic
    val q = Map("web" -> math.floor(math.sqrt(180d) * 1000).toLong,
      "book" -> math.floor(math.sqrt(20d) * 1000).toLong)
    val w = q.values.sum
    val target = 200L / 2
    val rate = q.map { case (s, qs) =>
      s -> (BigInt(target) * qs * 1000000L /
        (BigInt(w) * (if (s == "web") 180L else 20L))).toLong
    }
    assert(rate("book") / 1000000L == 1L, s"book rate ${rate("book")}")
    assert(rate("web") / 1000000L == 0L && rate("web") % 1000000L > 0L)
    // every book appears (epoch floor = 1); copies ∈ {1, 2}
    val books = out.filter(_._2 == "book")
    assert(books.length == 20 && books.forall(c => c._3 == 1L || c._3 == 2L))
    // web docs are a strict hash subset with copies == 1
    val webs = out.filter(_._2 == "web")
    assert(webs.nonEmpty && webs.length < 180 && webs.forall(_._3 == 1L))
    // deterministic: identical under repartitioning
    val out2 = Sampling.temperatureSample(docs.repartition(7), "source",
        "doc_id", "text", 1, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }

  test("ppsSample draws exactly k weighted picks per stratum") {
    val rnd = new scala.util.Random(5L)
    val docs = (1L to 200L).map(i => (i, s"doc text $i ${rnd.nextInt(999)}",
        (1 + rnd.nextInt(500)).toLong, s"s${i % 4}"))
      .toDF("doc_id", "text", "n_chars", "source")
    val out = Sampling.ppsSample(docs, "doc_id", "text", "n_chars",
        "source", k = 13)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    // the telescoping floors sum to exactly k per stratum, every time
    val perStratum = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(perStratum == Map("s0" -> 13L, "s1" -> 13L, "s2" -> 13L,
      "s3" -> 13L), perStratum.toString)
    // a row heavier than W/k is picked more than once
    val heavy = Seq((1L, "tiny", 1L, "x"), (2L, "huge", 1000L, "x"))
      .toDF("doc_id", "text", "n_chars", "source")
    val h = Sampling.ppsSample(heavy, "doc_id", "text", "n_chars",
        "source", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(h(2L) >= 9L && h.values.sum == 10L)
  }

  test("decontaminate plan: broadcast anti-join on fingerprints") {
    val train = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val eval = Seq((3L, "b")).toDF("doc_id", "text")
    val plan = Dedup.decontaminate(train, eval, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(800))
  }

  test("shardBalanced: every doc once, shards near-equal mass, deterministic") {
    // heavy-tailed sizes: the case naive hash sharding gets wrong
    val docs = (0L until 1000L)
      .map(i => (i, if (i % 97 == 0) 5000L + i else (i * i) % 997 + 1))
      .toDF("id", "sz")
    val a = graft.ext.Packing.shardBalanced(docs, "id", "sz",
      numShards = 8, buckets = 16)
    // exactly-once assignment into [0, 8)
    assert(a.count() == 1000L)
    assert(a.select("id").distinct().count() == 1000L)
    assert(a.filter(col("shard") < 0 || col("shard") >= 8).count() == 0L)
    // near-equal mass: the round-robin of per-bucket size-sorted docs
    // bounds the spread far below what skew-oblivious hashing gives
    val masses = a.groupBy("shard").agg(sum(col("sz")).as("m"))
      .collect().map(_.getLong(1))
    assert(masses.length == 8)
    val (mn, mx) = (masses.min, masses.max)
    assert(mx.toDouble / mn < 1.25,
      s"shard mass spread too wide: min=$mn max=$mx")
    // deterministic: a second run assigns identically
    val b = graft.ext.Packing.shardBalanced(docs, "id", "sz",
      numShards = 8, buckets = 16)
    assert(a.select("id", "shard").collect().map(r =>
        (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      b.select("id", "shard").collect().map(r =>
        (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }
}
