package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Bloom-filter runtime pruning for selective joins — the explicit form of
  * the row-level runtime filter a 100 TB fact join lives or dies by.
  *
  * Shape: a selective dimension (after its own predicates) is folded into a
  * fixed-size bit set; the fact side is filtered by membership probes AT THE
  * SCAN (a narrow per-row predicate inside whole-stage codegen), and only
  * the surviving sliver reaches the join shuffle. False positives cost
  * nothing but a few extra joined-away rows — the exact join after the
  * prune makes the result identical to the unpruned join, which is exactly
  * why the declared query can be certified against a plain-SQL oracle.
  * False negatives cannot happen (every probe of a built key finds its bits
  * set — see the ScalaCheck property).
  *
  * The filter itself is deliberately tiny (default 1024 words = 8 KiB): it
  * is collected to the driver once and shipped inside the plan as a codegen
  * reference object, the same way Spark's own `InjectRuntimeFilter` ships
  * its bloom.
  * That driver hop is O(words), NEVER O(|dim|) — the aggregation that folds
  * keys into words is distributed (map-side partial `bit_or`, then a
  * ≤`words`-row shuffle). Sizing: FP rate ≈ (1 − e^(−k·n/m))^k with
  * m = words·64 bits; the default (65 536 bits, k = 5) holds FP < 1% out to
  * n ≈ 7 000 build keys and degrades gracefully, never incorrectly, beyond.
  *
  * Probe positions use Kirsch–Mitzenmacher double hashing
  * (pos_j = h1 + j·(2·h2+1) mod m): two engine-portable mixes serve any k.
  * The mixes reuse the [[Hll]] multiply-mod-(2³¹−1) + xor-shift rounds, so
  * every intermediate stays far below 2⁶³ on any engine.
  */
object Bloom {

  private val P = 2147483647L // 2^31 - 1 (prime)

  /** Normalize a key column to the long the mixes operate on. Numeric
    * keys cast; STRING keys fold through xxhash64 — build and probe
    * apply the identical fold, which is all a transparent runtime filter
    * needs (the exact join after the prune restores engine-portable
    * results, so the string hash never has to be oracle-replayed).
    * Anything else would cast to NULL on both sides and silently wipe
    * the join out — reject it loudly instead. */
  private[graft] def stringKey(df: DataFrame, keyCol: String): Boolean =
    df.schema(keyCol).dataType match {
      case StringType     => true
      case _: NumericType => false
      case other => throw new IllegalArgumentException(
        s"bloom key '$keyCol' must be numeric or string, got " +
          s"${other.simpleString} — a cast-to-long of this type is NULL " +
          "and every probe would fail")
    }

  private def norm(key: Column, isString: Boolean): Column =
    if (isString) xxhash64(key) else key.cast("long")

  /** Two rounds of multiply-mod-P interleaved with xor-shift folds —
    * the [[Hll]] avalanche recipe with caller-chosen odd multipliers.
    * Expects a pre-normalized long key. */
  private def mix(key: Column, m1: Long, m2: Long): Column = {
    val x0 = pmod(key, lit(P))
    val x1 = pmod(x0 * lit(m1), lit(P))
    val x2 = x1.bitwiseXOR(shiftrightunsigned(x1, 15))
    val x3 = pmod(x2 * lit(m2), lit(P))
    x3.bitwiseXOR(shiftrightunsigned(x3, 13))
  }

  private def h1(key: Column): Column = mix(key, 1103515245L, 1566083941L)
  private def h2(key: Column): Column = mix(key, 69069L, 1277459L)

  /** Probe position j over m = words·64 bits. `2·h2+1` keeps the stride
    * odd so a zero h2 cannot collapse all k probes onto one bit; j ≤ k and
    * h2 < 2³¹ bound the product far below overflow. Build-side only —
    * the probe side runs the same arithmetic in one codegen'd kernel
    * ([[graft.functions.BloomOps]]; floorMod ≡ pmod for these positive
    * moduli), computing h1/h2 once per row instead of once per conjunct. */
  private def pos(key: Column, j: Int, words: Int): Column =
    pmod(h1(key) + lit(j.toLong) * (h2(key) * 2L + 1L),
      lit(words.toLong * 64L))

  /** The k probe positions of a key as one array column — the build-side
    * arithmetic exposed for per-file bloom construction
    * ([[graft.sources.TxStats]] file skipping): callers explode this and
    * bit_or per (file, word). */
  private[graft] def posArray(key: Column, isString: Boolean, k: Int,
                              words: Int): Column = {
    val keyed = norm(key, isString)
    array((0 until k).map(j => pos(keyed, j, words)): _*)
  }

  /** Fold the distinct build keys into the word array: each key sets k
    * bits; bits land in 64-bit words via a distributed two-level `bit_or`
    * (map-side partials, ≤ `words` rows on the wire). The driver only ever
    * sees the finished ≤ 8 KiB array. NULL build keys set no bits — an
    * inner join could never match them. */
  def buildWords(dim: DataFrame, keyCol: String,
                 words: Int = 1024, k: Int = 5): Array[Long] = {
    require(words >= 1 && k >= 1, s"need words >= 1 and k >= 1, got $words/$k")
    val keyed = norm(col(keyCol), stringKey(dim, keyCol))
    val probed = dim.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(j =>
        pos(keyed, j, words)): _*)).as("pos"))
      // the Scala shiftleft overload wants a literal shift; the SQL
      // function takes a column (codegen'd identically)
      .select((col("pos") / 64L).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          (col("pos") % 64L).cast("int")).as("mask"))
    val rows = probed.groupBy(col("w"))
      .agg(expr("bit_or(mask)").as("word"))
      .collect()
    val arr = new Array[Long](words)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership probe as one narrow scan-resident predicate: all k bits
    * set, evaluated by a single codegen'd kernel that derives h1/h2 once
    * per row ([[graft.functions.BloomProbe]]; the word array rides the
    * plan as a codegen reference object). No join, no broadcast exchange,
    * no state. NULL keys probe to NULL and are filtered (they cannot
    * survive the exact inner join either). Set `isString` for string
    * keys — it must match the type `buildWords` saw, and a plain numeric
    * cast of a string would NULL out and drop every row. */
  def mightContain(key: Column, wordsArr: Array[Long], k: Int = 5,
                   isString: Boolean = false): Column = {
    require(wordsArr.nonEmpty && k >= 1, "empty filter or k < 1")
    graft.functions.BloomFunctions.bloom_probe(norm(key, isString), wordsArr, k)
  }

  /** Inner equi-join with the fact side bloom-pruned before the shuffle.
    * Result rows are identical to `fact.join(dim, fact(factKey) ===
    * dim(dimKey))` — the bloom only removes rows the join would drop.
    * The dim side is evaluated twice (build + join); pass a cheap or
    * cached dim, which a selective runtime-filter build side always is.
    * Key types are taken from the schemas: numeric keys hash via cast,
    * string keys via xxhash64, mixed or exotic sides are rejected loudly
    * (a silent NULL-cast would return an empty "pruned" join). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      words: Int = 1024, k: Int = 5): DataFrame = {
    val dimStr = stringKey(dim, dimKey)
    val factStr = stringKey(fact, factKey)
    require(dimStr == factStr,
      s"bloom join keys disagree: '$factKey' is " +
        s"${if (factStr) "string" else "numeric"} but '$dimKey' is " +
        s"${if (dimStr) "string" else "numeric"} — hash folds would differ")
    val arr = buildWords(dim, dimKey, words, k)
    fact.filter(mightContain(col(factKey), arr, k, isString = factStr))
      .join(dim, col(factKey) === dim(dimKey))
  }
}
