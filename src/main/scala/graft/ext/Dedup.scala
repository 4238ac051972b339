package graft.ext

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

  /** Distinct word n-gram shingles. Texts shorter than n collapse to one
    * whole-text shingle so every doc has ≥1 block key. */
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
    val grams = df.select(
      col(idCol).cast("long").as("id"),
      shingles(col(textCol), n).as("grams"))
      .withColumn("sz", size(col("grams")).cast("long"))
    val exploded = grams.select(col("id"), col("sz"),
      explode(col("grams")).as("gram"))
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

  /** MinHash signature: for each of `numHashes` permutations i,
    * min over shingles g of ((a_i * (xxhash64(g) mod 2^31-1) + b_i) mod
    * 2^31-1), with 31-bit coefficients so every intermediate fits a long —
    * Spark 4 runs ANSI mode by default and a 64-bit multiply would throw
    * ARITHMETIC_OVERFLOW instead of wrapping. A 2^31 hash space is ample for
    * per-document shingle-set sketches. Pure Catalyst expressions —
    * whole-stage-codegen'd, no UDFs. */
  def minhashSignature(gramsCol: Column, numHashes: Int): Column = {
    val sigs = (0 until numHashes).map { i =>
      val a = (splitmix64(2L * i) >>> 33) | 1L      // 31-bit odd multiplier
      val b = splitmix64(2L * i + 1) >>> 33         // 31-bit offset
      array_min(transform(gramsCol,
        g => pmod(lit(a) * pmod(xxhash64(g), lit(MersennePrime31)) + lit(b),
          lit(MersennePrime31))))
    }
    array(sigs: _*)
  }

  /** Banded-LSH near-dup pairs with exact Jaccard verification.
    *
    * numHashes = bands × rowsPerBand. Candidate pairs come from an equi-join
    * on (band index, band signature hash) — NEVER an all-pairs product.
    * Candidates are then verified with exact shingle-set Jaccard, so false
    * positives cost time, never correctness; false negatives are bounded by
    * (1 - s^r)^b (≈1e-8 for s=0.5, r=2, b=64).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 64, rowsPerBand: Int = 2,
                      threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val grams = df.select(
      col(idCol).cast("long").as("id"),
      shingles(col(textCol), n).as("grams"))
      .withColumn("sig", minhashSignature(col("grams"), numHashes))
    val bandKeys = grams.select(col("id"),
      posexplode(array((0 until bands).map { bIdx =>
        xxhash64(lit(bIdx), slice(col("sig"), bIdx * rowsPerBand + 1, rowsPerBand))
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
    * the per-bit ±1 contributions in ONE shuffle (groupBy id), then pack the
    * sign bits. Avoids 64 separate array folds per row. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$j")
    }
    val agg = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { j =>
      when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))
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
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 8).map { bIdx =>
        shiftrightunsigned(col("simhash"), bIdx * 8).bitwiseAND(lit(0xffL))
      }: _*)).as(Seq("band", "key")))
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.simhash").as("sig_a"), col("r.simhash").as("sig_b"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(sig_a ^ sig_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
