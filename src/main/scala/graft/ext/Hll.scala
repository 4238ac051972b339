package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch with ENGINE-PORTABLE internals.
  *
  * Spark's `approx_count_distinct` is algorithm-defined (xxhash64 + its
  * own register layout), so no external engine can reproduce its answer
  * and the operator can't be oracle-certified. This formulation makes
  * every step arithmetic any SQL engine replays bit-for-bit:
  *
  *  - hash: two rounds of 31-bit multiply-mod-(2³¹−1) interleaved with
  *    xor-shift folds — a plain affine hash has zero avalanche and
  *    collapses sequential ids into few ranks (observed 4× underestimate);
  *    the multiply/xor composition mixes while every product stays far
  *    below 2⁶³, so no engine-specific overflow behavior is exercised;
  *  - register = h mod m, payload w = h div m (25 bits for m=64);
  *  - rank = 26 − bitlength(w), w=0 ⇒ 26 — bitlength via the binary
  *    string length (`bin` / `printf('%b')`), pure integers;
  *  - register aggregation = max(rank) — the HLL merge, commutative and
  *    order-independent;
  *  - the harmonic sum Σ 2^(−Mⱼ) is rescaled by 2²⁶ into the EXACT
  *    integer Σ 2^(26−Mⱼ) (every term is dyadic with denominator 2²⁶;
  *    absent registers contribute 2²⁶) — the only floating-point in the
  *    whole sketch is the final fixed-order estimate division.
  *
  * Cost shape matches the real thing: one partial-aggregated shuffle of
  * (group, register) rows — at most m rows per group on the wire
  * regardless of input size — then an m-row fold per group. Accuracy is
  * standard raw-HLL (~1.04/√m ≈ 13% for m=64); the small-range
  * linear-counting correction is deliberately omitted because it needs
  * `ln`, whose last-ulp behavior is libm-specific — and
  * [[Olap.distinctCounts]] is the exact dual when truth is required.
  */
object Hll {

  val Registers = 64 // m — power of two; payload = 25 bits of h div m

  /** The sketch STATE: (grp, reg, m_j) — max rank per register. This is
    * the mergeable, bounded (≤ m rows per group) representation; in
    * Structured Streaming it is a single supported `max` aggregation, so
    * the sketch can be maintained incrementally over a stream and
    * finalized batch-side ([[finalize]]) — see the `stream_hll` entry. */
  def registers(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    // SQL count-distinct semantics: NULL keys count nothing
    val p = lit(2147483647L)
    val hashed = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("grp"),
        pmod(col(keyCol).cast("long"), p).as("x0"))
      .select(col("grp"), pmod(col("x0") * 1103515245L, p).as("x1"))
      .select(col("grp"),
        col("x1").bitwiseXOR(shiftrightunsigned(col("x1"), 15)).as("x2"))
      .select(col("grp"), pmod(col("x2") * 1566083941L, p).as("x3"))
      .select(col("grp"),
        col("x3").bitwiseXOR(shiftrightunsigned(col("x3"), 13)).as("h"))
    val ranked = hashed.select(col("grp"),
        pmod(col("h"), lit(Registers.toLong)).as("reg"),
        expr(s"h div $Registers").as("w"))
      .select(col("grp"), col("reg"),
        when(col("w") === 0L, lit(26L))
          .otherwise(lit(26L) - length(bin(col("w")))).as("rank"))
    ranked.groupBy(col("grp"), col("reg"))
      .agg(max(col("rank")).as("m_j"))
  }

  /** Fold register state into (group, n_regs, isum, estimate). */
  def finalize(regs: DataFrame, groupCol: String): DataFrame =
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(1L, cast(26 - m_j as int))")).as("__isum_p"))
      .select(col("grp").as(groupCol), col("n_regs"),
        (col("__isum_p") + (lit(Registers.toLong) - col("n_regs")) *
          lit(67108864L)).as("isum"),
        // alpha·m²·2²⁶ / isum, every factor and the association explicit
        // so the oracle's CAST(0.709 AS DOUBLE) * 4096 * 67108864 folds to
        // the identical double
        ((lit(0.709) * lit(4096.0)) * lit(67108864.0) /
          (col("__isum_p") + (lit(Registers.toLong) - col("n_regs")) *
            lit(67108864L)).cast("double")).as("hll_estimate"))

  /** Per-group HLL state and raw estimate:
    * (group, n_regs hit, exact harmonic integer sum, estimate). */
  def distinctEstimate(df: DataFrame, groupCol: String,
                       keyCol: String): DataFrame =
    finalize(registers(df, groupCol, keyCol), groupCol)
}
