package graft.ext

import graft.functions.ShingleFunctions.{shingle_hashes, token_poly_hashes}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication — exact, fingerprint, n-gram-Jaccard, MinHash+LSH
  * and SimHash — the LLM-training-pipeline extension layer mandated by
  * BASELINE.json (the reference itself, /root/reference/No_Sql.py, has no
  * dedup; these are designed Spark-first for 100 TB scale).
  *
  * Scale design notes (SURVEY.md §7.4.7):
  *  - Exact / fingerprint dedup is one hash-partitioned `groupBy` — the
  *    minimum possible shuffle, AQE-coalesced.
  *  - `jaccardPairs` blocks candidate pairs on SHARED SHINGLES, never
  *    all-pairs: any pair with Jaccard > 0 shares ≥1 shingle, so blocking is
  *    lossless; hot-shingle skew is the known risk, mitigated upstream by a
  *    document-frequency cut (see `maxShingleDf`) — the standard trick at
  *    web scale where stop-shingles would otherwise quadratically blow up.
  *  - `minhashLshPairs` is the true 100 TB path: O(n·bands) band keys, an
  *    equi-join per bucket, exact verification only on candidates. Raise
  *    `rowsPerBand` as n grows to keep the random-collision candidate count
  *    ~linear (P[band collision] ≈ s^r for Jaccard s).
  */
object Dedup {

  /** Whitespace tokenization (documents.text is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles as STRINGS — the readable reference
    * formulation (kept for tests and for oracles that need the literal
    * shingles). The hot paths use [[graft.functions.ShingleHashes]] via
    * [[shingle_hashes]] instead: same set semantics, one codegen'd pass,
    * 8-byte elements. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
  }

  /** Exact dedup: canonical representative = min(id) per key group.
    * One shuffle on the key; map-side partial aggregation applies. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol) +: keyCols.map(col): _*)

  /** Fingerprint dedup: md5 of the normalized text. Hashing first keeps the
    * shuffle rows narrow (32-byte key instead of the full document) — at
    * 100 TB the difference is the whole job. */
  def fingerprint(text: Column): Column = md5(lower(text))

  def byFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("fp"))

  /** Exact n-gram Jaccard near-duplicate pairs, blocked on shared shingles.
    *
    * Both sides of the threshold comparison use `round(j, 4)` so the engine
    * and any re-implementation (the DuckDB oracle) agree at the boundary.
    *
    * @param maxShingleDf drop shingles appearing in more than this many docs
    *                     BEFORE sizes are computed (df-cut; 0 = keep all).
    *                     With the cut enabled the metric is exact Jaccard
    *                     over the RETAINED shingle sets — set sizes are
    *                     recomputed post-prune so numerator and denominator
    *                     agree (pruning shingles from only the numerator
    *                     would systematically underestimate similarity).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxShingleDf: Long = 0L): DataFrame = {
    // Shingles ride as 64-bit hashes end to end (codegen'd single-pass
    // kernel): the self-join shuffles each exploded row twice, and 8-byte
    // longs vs ~20-byte strings is the difference in shuffle bytes; a
    // cross-doc hash collision overcounts one shared shingle w.p.
    // ~distinct²/2^65 — immaterial. Persisted: both join sides read it.
    val grams = df.select(
      col(idCol).cast("long").as("id"),
      shingle_hashes(col(textCol), n).as("grams"))
      .withColumn("sz", size(col("grams")).cast("long"))
    val exploded = grams.select(col("id"), col("sz"),
      explode(col("grams")).as("gram"))
      .persist()
    val pruned =
      if (maxShingleDf <= 0) exploded
      else {
        val hot = exploded.groupBy("gram")
          .agg(count(lit(1)).as("df_cnt"))
          .filter(col("df_cnt") > maxShingleDf)
          .select("gram")
        // prune-then-size: recompute per-doc set sizes over the retained
        // shingles so Jaccard is consistent (docs left with zero retained
        // shingles drop out entirely — they can no longer pair anyway)
        exploded.join(broadcast(hot), Seq("gram"), "left_anti")
          .withColumn("sz",
            count(lit(1)).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("id"))))
      }
    val a = pruned.alias("a")
    val b = pruned.alias("b")
    val shared = a.join(b,
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("shared"))
    val j = round(
      col("shared") / (col("sz_a") + col("sz_b") - col("shared")), 4)
    shared.select(col("id_a"), col("id_b"), j.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -----------------------------------------------------------------------
  // MinHash + banded LSH
  // -----------------------------------------------------------------------

  private val MersennePrime31 = 2147483647L // 2^31 - 1

  /** Deterministic per-hash coefficients (splitmix64 of the index) —
    * reproducible across runs and executors, no RNG state shipped. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Per-permutation MinHash aggregate: min over shingle rows of
    * ((a_i * h + b_i) mod 2^31-1), where h = shingle-hash mod 2^31-1.
    * 31-bit coefficients keep every intermediate in a long — Spark 4 runs
    * ANSI mode by default and a 64-bit multiply would throw
    * ARITHMETIC_OVERFLOW instead of wrapping. A 2^31 hash space is ample
    * for per-document shingle-set sketches. */
  private def minhashAgg(h: Column, i: Int): Column = {
    val a = (splitmix64(2L * i) >>> 33) | 1L      // 31-bit odd multiplier
    val b = splitmix64(2L * i + 1) >>> 33         // 31-bit offset
    min(pmod(lit(a) * h + lit(b), lit(MersennePrime31)))
  }

  /** MinHash signatures as one hash-aggregate: explode shingles, hash each
    * ONCE, then numHashes codegen'd `min` aggregates in a single shuffle
    * with map-side partial aggregation.
    *
    * Why not `array_min(transform(grams, ...))` per permutation (the r2
    * formulation): higher-order functions are interpreted — 128 lambda
    * passes per document outside codegen (BENCH_r02: dedup_minhash 18 s).
    * The aggregate form keeps everything in WholeStageCodegen/HashAggregate
    * and is the shape that scales: partial min per partition, tiny
    * (numHashes × 8 bytes) rows across the wire. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame = {
    val hashed = df.select(
      col(idCol).cast("long").as("id"),
      explode(shingle_hashes(col(textCol), n)).as("g"))
      .select(col("id"), pmod(col("g"), lit(MersennePrime31)).as("h"))
    val aggs = (0 until numHashes).map(i => minhashAgg(col("h"), i).as(s"m$i"))
    hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Banded-LSH near-dup pairs with exact Jaccard verification.
    *
    * numHashes = bands × rowsPerBand. Candidate pairs come from an equi-join
    * on (band index, band signature hash) — NEVER an all-pairs product.
    * Candidates are then verified with exact shingle-set Jaccard, so false
    * positives cost time, never correctness; false negatives are bounded by
    * (1 - s^r)^b, maximal AT the threshold (≈1e-8 for s=0.5, r=2, b=64) and
    * decreasing in s — every pair the threshold admits is found w.p.
    * ≥ 1 - 1e-8.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 64, rowsPerBand: Int = 2,
                      threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    // gram sets are read three times (signatures + both verify sides) —
    // persist so the shingle kernel runs once per row, not three times
    val grams = df.select(
      col(idCol).cast("long").as("id"),
      shingle_hashes(col(textCol), n).as("grams"))
      .persist()
    val hashed = grams.select(col("id"), explode(col("grams")).as("g"))
      .select(col("id"), pmod(col("g"), lit(MersennePrime31)).as("h"))
    val aggs = (0 until numHashes).map(i => minhashAgg(col("h"), i).as(s"m$i"))
    val sigs = hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val bandKeys = sigs.select(col("id"),
      posexplode(array((0 until bands).map { bIdx =>
        xxhash64((lit(bIdx) +: (0 until rowsPerBand).map(r =>
          col(s"m${bIdx * rowsPerBand + r}"))): _*)
      }: _*)).as(Seq("band", "key")))
    val l = bandKeys.alias("l")
    val r = bandKeys.alias("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val ga = grams.select(col("id").as("id_a"), col("grams").as("grams_a"))
    val gb = grams.select(col("id").as("id_b"), col("grams").as("grams_b"))
    val verified = candidates.join(ga, "id_a").join(gb, "id_b")
      .withColumn("shared",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("long"))
      .withColumn("jaccard", round(
        col("shared") /
          (size(col("grams_a")) + size(col("grams_b")) - col("shared")), 4))
    verified.filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // -----------------------------------------------------------------------
  // SimHash
  // -----------------------------------------------------------------------

  /** 64-bit SimHash per document: explode distinct tokens, hash once, sum
    * the per-bit contributions in ONE shuffle (groupBy id), then pack the
    * sign bits.
    *
    * The 64 per-bit counts are packed into 16 lane-aggregates (4 × 16-bit
    * lanes per long): bit j of a token hash contributes `1 << (16*(j%4))`
    * to aggregate j/4. One `sum` over simple bit arithmetic per lane group
    * compiles to a fraction of the generated code of 64 `sum(when(...))`
    * aggregates — plan codegen was HALF the cold runtime of the r2 shape —
    * and the aggregation buffer shrinks 4x. Sign rule: bit set iff
    * 2*ones >= n_tokens, identical (including the tie) to
    * sum(±1) >= 0. Bound: a document must have < 65,536 DISTINCT tokens or
    * a lane overflows (ANSI mode would throw, not corrupt); real corpora
    * are orders of magnitude below.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // token hash = portable 62-bit poly hash (graft.functions.TokenPolyOps),
    // NOT xxhash64: the exact same value is computable in DuckDB SQL, so the
    // whole SimHash pipeline gets a hash-matching external oracle. Bits
    // 62/63 of every hash are zero — those signature bits land constant 0
    // on all documents and never affect Hamming distances.
    val tok = df.select(col(idCol).cast("long").as("id"),
        explode(token_poly_hashes(col(textCol))).as("h"))
    val laneAggs = (0 until 16).map { g =>
      val packed = (0 until 4).map { l =>
        val j = g * 4 + l
        shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L)) * lit(1L << (16 * l))
      }.reduce(_ + _)
      sum(packed).as(s"s$g")
    }
    val agg = tok.groupBy("id")
      .agg(laneAggs.head, (laneAggs.tail :+ count(lit(1)).as("n")): _*)
    val sig = (0 until 64).map { j =>
      val ones = shiftrightunsigned(col(s"s${j / 4}"), 16 * (j % 4))
        .bitwiseAND(lit(0xffffL))
      when(ones * lit(2L) >= col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 8 bands of 8 bits (pigeonhole: any
    * pair with Hamming distance ≤ 7 agrees exactly on ≥1 band), verify with
    * bit_count(xor) ≤ maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7, "8x8-bit banding only guarantees recall to Hamming 7")
    val sigs = simhash(df, idCol, textCol)
    // persisted: both self-join sides read it (without this the whole
    // signature aggregation runs twice)
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 8).map { bIdx =>
        shiftrightunsigned(col("simhash"), bIdx * 8).bitwiseAND(lit(0xffL))
      }: _*)).as(Seq("band", "key")))
      .persist()
    val l = banded.alias("l")
    val r = banded.alias("r")
    // hamming filter BEFORE distinct: bit_count(xor) is a codegen'd two
    // instructions, so evaluating it per joined row and discarding misses
    // early shrinks the distinct's shuffle input by ~100x vs deduping all
    // band-collision candidates first
    l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        expr("bit_count(l.simhash ^ r.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
