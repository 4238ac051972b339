package graft

import graft.ext.Dedup
import graft.functions.ShingleFunctions.shingle_hashes
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 dedup family on hand-checkable toy documents. */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d",   "en"),
      (2L, "a b c e",   "en"),  // shares "a b c" with 1 -> J = 1/3
      (3L, "a b c d",   "en"),  // exact duplicate of 1 -> J = 1
      (4L, "x y z w q", "de"),
      (5L, "short",     "en"),  // < n tokens -> whole-text shingle
      (6L, "short",     "de")   // same text as 5
    ).toDF("doc_id", "text", "lang")
  }

  test("shingle_hashes: same set sizes as the string shingles, incl. short texts") {
    val a = docs.select(size(Dedup.shingles(col("text"), 3)).as("s")).collect().map(_.getInt(0)).toSeq
    val b = docs.select(size(shingle_hashes(col("text"), 3)).as("s")).collect().map(_.getInt(0)).toSeq
    assert(a == b)
    assert(b == Seq(2, 2, 2, 3, 1, 1))
  }

  test("shingle_hashes: identical texts hash identically, different differ") {
    val h = docs.select(col("doc_id"), shingle_hashes(col("text"), 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(h(1L) == h(3L))
    assert(h(5L) == h(6L))
    assert(h(1L) != h(2L))
    assert(h(1L).toSet.intersect(h(2L).toSet).size == 1) // shared "a b c"
  }

  test("exact dedup keeps min id per key group") {
    val out = Dedup.exact(docs, "doc_id", Seq("lang"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "en"), (4L, "de")))
  }

  test("fingerprint dedup: identical texts collapse") {
    val out = Dedup.byFingerprint(docs, "doc_id", "text")
    assert(out.count() == 4) // 1&3 collapse, 5&6 collapse
    assert(ids(out.select(col("doc_id").as("emp_id"))) == Seq(1L, 2L, 4L, 5L))
  }

  test("jaccardPairs: hand-computed values") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // J(1,2) = 1/3 = 0.3333, J(1,3) = 1, J(2,3) = 1/3, J(5,6) = 1
    assert(pairs == Seq(
      (1L, 2L, 0.3333), (1L, 3L, 1.0), (2L, 3L, 0.3333), (5L, 6L, 1.0)))
  }

  test("jaccardPairs threshold excludes below-boundary pairs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    assert(pairs.count() == 2) // only the two J=1.0 pairs
  }

  test("minhashLshPairs equals exact jaccard on this data") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
      bands = 64, rowsPerBand = 2, threshold = 0.3)
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(lsh == exact)
  }

  test("simhash: identical docs get identical signatures; pairs found at hamming 0") {
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(3L))
    assert(sigs(5L) == sigs(6L))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((5L, 6L)))
  }

  test("simhashPairs rejects maxHamming beyond the banding guarantee") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
    }
  }

  test("simhashPairs wider radii keep exact recall (pigeonhole banding)") {
    // brute-force reference over the tiny fixture at radius 7
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 7
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("candidate-pair budget: loud failure over budget, exact results under it") {
    // fixture implies a handful of candidate pairs — budget 1 must blow
    val e = intercept[IllegalStateException] {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3,
        maxCandidatePairs = 1L).count()
    }
    assert(e.getMessage.contains("candidate-pair budget"))
    assert(e.getMessage.contains("maxShingleDf"))
    // a generous budget changes nothing about the result
    val guarded = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.3, maxCandidatePairs = 1000000L)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(guarded == Seq(
      (1L, 2L, 0.3333), (1L, 3L, 1.0), (2L, 3L, 0.3333), (5L, 6L, 1.0)))
  }

  test("unpersistAll releases every tracked cache block") {
    // Two sharp edges: the SparkContext is shared across concurrently
    // running suites (global cache emptiness is not assertable), and the
    // CacheManager dedupes persists by logical plan (re-running an op on
    // `docs` reuses earlier tests' blocks). So: a frame unique to this
    // test — its persists are guaranteed fresh — and assert exactly those
    // blocks are gone after the drain.
    import spark.implicits._
    val fresh = Seq((101L, "u v w x y z u v w"), (102L, "u v w x y z u v w"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minhashLshPairs(fresh, "doc_id", "text", n = 3,
      bands = 16, rowsPerBand = 2, threshold = 0.3).count(): Unit
    Dedup.simhashPairs(fresh, "doc_id", "text", maxHamming = 0).count(): Unit
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty)
    Dedup.unpersistAll(blocking = true)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.intersect(after).isEmpty)
  }

  test("df-cut prunes hot shingles and recomputes sizes consistently") {
    // "a b c" appears in docs 1,2,3 (df=3); cut at df>2 removes it.
    // Doc1 {b c d}, doc2 {b c e}, doc3 {b c d}: J(1,3)=1 over retained sets.
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.99, maxShingleDf = 2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs == Seq((1L, 3L, 1.0), (5L, 6L, 1.0)))
  }

  test("incremental: batch docs already in the index are dropped; append " +
      "extends the index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fpix-spec-")
      .toString
    val corpus = Seq((1L, "seen text"), (2L, "Other Seen")).toDF("doc_id", "text")
    Dedup.buildFingerprintIndex(corpus, "text", dir)
    val batch = Seq(
      (10L, "seen text"),   // exact overlap -> dropped
      (11L, "other seen"),  // case-normalized overlap -> dropped
      (12L, "brand new")    // survives
    ).toDF("doc_id", "text")
    val kept = Dedup.incremental(batch, "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L))
    // accept the survivors into the index; a re-run of the same batch
    // now drops everything — the idempotence an ingest loop relies on
    Dedup.appendToFingerprintIndex(batch.filter($"doc_id" === 12L),
      "text", dir)
    assert(Dedup.incremental(batch, "text", dir).count() == 0L)
  }

  test("crossSourceDupes: shared fingerprints per unordered source pair") {
    import spark.implicits._
    val d = Seq(
      ("s1", "same text"), ("s2", "Same Text"),   // case-folded dup
      ("s1", "other"), ("s3", "other"),
      ("s2", "other"),
      ("s1", "unique one"), ("s1", "same text")   // in-source repeat: 1 fp
    ).toDF("source", "text")
    val out = Dedup.crossSourceDupes(d, "text", "source")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // pairs share: (s1,s2): "same text"+"other"=2; (s1,s3): 1; (s2,s3): 1
    assert(out == Seq(("s1", "s2", 2L), ("s1", "s3", 1L), ("s2", "s3", 1L)))
  }

  test("overlapRate: per-eval-doc hit fraction over distinct shingles") {
    import spark.implicits._
    val train = Seq(
      (1L, "a b c d"),          // shingles: "a b c", "b c d"
      (2L, "x y z w")           // shingles: "x y z", "y z w"
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b c d"),         // both shingles in train -> 1.0
      (11L, "a b c q"),         // "a b c" hits, "b c q" misses -> 0.5
      (12L, "q r s t"),         // nothing hits -> 0.0
      (13L, "hi")               // short doc: whole text, no hit -> 0.0
    ).toDF("doc_id", "text")
    val out = Dedup.overlapRate(train, eval, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((10L, 2L, 2L, 1.0), (11L, 2L, 1L, 0.5),
      (12L, 2L, 0L, 0.0), (13L, 1L, 0L, 0.0)))
  }

  test("incremental plan: anti-join probes 32-byte fingerprints, not text") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fpix-spec-")
      .toString
    Dedup.buildFingerprintIndex(Seq((1L, "a")).toDF("doc_id", "text"),
      "text", dir)
    val plan = Dedup.incremental(Seq((2L, "b")).toDF("doc_id", "text"),
      "text", dir).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert(plan.contains("md5"), plan.take(1200)) // the key is the digest
  }

  test("winnowPairs: localized shared run pairs docs Jaccard would miss") {
    import spark.implicits._
    // docs 1/2 share an 8-token run (>= w+k-1 = 8) inside unrelated text:
    // whole-set 3-gram Jaccard is ~6/32 < 0.5, but winnowing fires
    val run = "one two three four five six seven eight"
    val d = Seq(
      (1L, s"aa bb cc dd ee ff gg hh $run"),
      (2L, s"$run pp qq rr ss tt uu vv ww"),
      (3L, "totally unrelated words here only once")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, "doc_id", "text",
        k = 4, w = 5, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)))
    val jac = Dedup.jaccardPairs(d, "doc_id", "text", n = 3,
      threshold = 0.5).count()
    assert(jac == 0L) // the global-similarity operator can't see the run
  }

  test("winnowPairs: minShared filters, df-cut silences boilerplate fps") {
    import spark.implicits._
    // the same text in 4 docs: every fp has df=4; maxFpDf=3 prunes all
    val d = (1L to 4L).map(i => (i, "common boiler plate line repeated"))
      .toDF("doc_id", "text")
    assert(Dedup.winnowPairs(d, "doc_id", "text", maxFpDf = 3L,
      minShared = 1L).count() == 0L)
    // with the cap above df the 6 pairs all appear
    assert(Dedup.winnowPairs(d, "doc_id", "text", maxFpDf = 10L,
      minShared = 1L).count() == 6L)
  }

  test("substringSpans: maximal cross-doc spans at k-gram resolution") {
    import spark.implicits._
    // docs 1 and 2 share the interior run "v w x y z" (5 tokens = k);
    // doc 3 is unrelated; doc 4 repeats a run with doc 5 TWICE (both
    // occurrences must be flagged); intra-doc-only repetition (doc 3's
    // own doubled tail) must NOT flag
    val d = Seq(
      (1L, "a1 b1 c1 v w x y z d1 e1"),
      (2L, "p2 v w x y z q2 r2 s2 t2"),
      (3L, "m3 n3 o3 m3 n3 o3 u3 i3 j3 k3"),
      (4L, "g h i j k f4 g h i j k h4"),
      (5L, "z5 g h i j k y5 x5 w5 v5")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(d, "doc_id", "text", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    Dedup.unpersistAll()
    assert(spans == Set(
      (1L, 3L, 5L, "v w x y z"),
      (2L, 1L, 5L, "v w x y z"),
      (4L, 0L, 5L, "g h i j k"),
      (4L, 6L, 5L, "g h i j k"),
      (5L, 1L, 5L, "g h i j k")))
    // excision drops exactly the spans and re-joins survivors
    val clean = Dedup.removeDupSpans(d, "doc_id", "text", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    Dedup.unpersistAll()
    assert(clean == Set(
      (1L, "a1 b1 c1 d1 e1", 5L),
      (2L, "p2 q2 r2 s2 t2", 5L),
      (3L, "m3 n3 o3 m3 n3 o3 u3 i3 j3 k3", 0L),
      (4L, "f4 h4", 10L),
      (5L, "z5 y5 x5 w5 v5", 5L)))
  }

  test("substringSpans: adjacent duplicated runs merge into one span") {
    import spark.implicits._
    // "q r s" + "t u v" planted back-to-back in doc 1; each 3-run is
    // shared with a DIFFERENT partner doc, so the k-gram anchors differ
    // but their coverage touches — one merged maximal span comes out
    val d = Seq(
      (1L, "x1 q r s t u v y1"),
      (2L, "a2 q r s b2 c2 d2 e2"),
      (3L, "t u v f3 g3 h3 i3 j3")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(d, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    Dedup.unpersistAll()
    assert(spans == Set(
      (1L, 1L, 6L, "q r s t u v"),
      (2L, 1L, 3L, "q r s"),
      (3L, 0L, 3L, "t u v")))
  }
}
