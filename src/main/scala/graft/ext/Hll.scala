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

  /** m. The rank base, absent-register weight, and the oracle SQL all
    * derive from it below — but the Alpha bias constant is m-specific, so
    * changing m requires updating Alpha (and the oracle literals) in the
    * same commit; the require makes that impossible to forget. */
  val Registers = 64
  require(Registers == 64,
    "Alpha and the oracle SQL literals are derived for m=64 — update them together")
  /** payload bits of h div m (h < 2^31). */
  private val PayloadBits = 31 - Integer.numberOfTrailingZeros(Registers)
  /** rank of w=0 — PayloadBits + 1 = 26 for m=64. */
  private[graft] val RankBase = (PayloadBits + 1).toLong
  /** an absent register's harmonic term, 2^RankBase = 2^26 for m=64. */
  private[graft] val AbsentWeight = 1L << RankBase

  /** The sketch STATE: (grp, reg, m_j) — max rank per register. This is
    * the mergeable, bounded (≤ m rows per group) representation; in
    * Structured Streaming it is a single supported `max` aggregation, so
    * the sketch can be maintained incrementally over a stream and
    * finalized batch-side ([[finalize]]) — see the `stream_hll` entry. */
  def registers(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    // the register hash is a LONG fold: a non-numeric key would cast to
    // NULL after the isNotNull filter and silently produce garbage
    // registers (the Bloom string-key landmine class) — reject loudly;
    // pre-fold strings to a long (e.g. a portable poly hash) first
    df.schema(keyCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"Hll key '$keyCol' must be numeric, got ${other.simpleString} — " +
          "cast-to-long of this type is NULL and the sketch would be empty" +
          " or wrong; fold strings to a long first")
    }
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
        when(col("w") === 0L, lit(RankBase))
          .otherwise(lit(RankBase) - length(bin(col("w")))).as("rank"))
    ranked.groupBy(col("grp"), col("reg"))
      .agg(max(col("rank")).as("m_j"))
  }

  /** The HLL UNION: merge two register states by max per (group,
    * register). This is the property that makes the sketch an
    * infrastructure primitive rather than a one-shot aggregate — shard
    * sketches, daily sketches, or per-source sketches combine into the
    * exact sketch of the unioned input (max is associative, commutative,
    * idempotent), so a 100 TB distinct count can be maintained as cheap
    * per-partition states and merged on demand. The merged state is
    * bit-identical to [[registers]] over the concatenated inputs by
    * construction — certified by the `agg_hll_union` entry, whose oracle
    * sketches the un-split table directly. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("grp"), col("reg"))
      .agg(max(col("m_j")).as("m_j"))

  /** The partial harmonic sum → isum column (integer, exact). */
  private def isumExpr = col("__isum_p") +
    (lit(Registers.toLong) - col("n_regs")) * lit(AbsentWeight)

  /** alpha·m²·2^RankBase / isum, every factor and the association
    * explicit so the oracle's CAST(0.709 AS DOUBLE) * 4096 * 67108864
    * folds to the identical double. */
  private def estimateExpr =
    (lit(0.709) * lit((Registers.toLong * Registers).toDouble)) *
      lit(AbsentWeight.toDouble) / isumExpr.cast("double")

  /** Fold register state into (group, n_regs, isum, estimate). */
  def finalize(regs: DataFrame, groupCol: String): DataFrame =
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(1L, cast($RankBase - m_j as int))"))
          .as("__isum_p"))
      .select(col("grp").as(groupCol), col("n_regs"),
        isumExpr.as("isum"), estimateExpr.as("hll_estimate"))

  /** Pairwise SET-INTERSECTION estimates by inclusion–exclusion over the
    * sketch: |A∩B| ≈ Ê(A) + Ê(B) − Ê(A∪B), where Ê(A∪B) is the estimate
    * of the max-merged register state — the measure HLL supports
    * natively (the sketch is closed under union but NOT intersection, so
    * audience-overlap / shared-user questions are answered exactly this
    * way in practice, error compounding as the standard ~1.04/√m per
    * term). Negative differences clamp to zero; the clamped value is
    * floor-quantized to 1e-4 like every certified double here.
    *
    * Cost shape: the corpus is sketched ONCE ([[registers]] — the only
    * pass that sees data mass); everything after runs on register
    * states, ≤ m rows per group. Pair enumeration is |G|²/2 on the tiny
    * distinct-group frame, and each pair's union state is ≤ 2m rows into
    * a partial-aggregated max — at 100 TB the intersection matrix costs
    * the same as at 100 MB once the sketches exist. */
  def intersectEstimate(df: DataFrame, groupCol: String,
                        keyCol: String): DataFrame = {
    val regs = registers(df, groupCol, keyCol)
    val singles = finalize(regs, groupCol)
      .select(col(groupCol), col("hll_estimate"))
    val groups = regs.select(col("grp")).distinct()
    val pairs = groups.select(col("grp").as("grp_a"))
      .crossJoin(groups.select(col("grp").as("grp_b")))
      .filter(col("grp_a") < col("grp_b"))
    val ra = regs.select(col("grp").as("grp_a"), col("reg"), col("m_j"))
    val rb = regs.select(col("grp").as("grp_b"), col("reg"), col("m_j"))
    val unioned = pairs.join(ra, Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("reg"), col("m_j"))
      .unionByName(pairs.join(rb, Seq("grp_b"))
        .select(col("grp_a"), col("grp_b"), col("reg"), col("m_j")))
      .groupBy(col("grp_a"), col("grp_b"), col("reg"))
      .agg(max(col("m_j")).as("m_j"))
    val uest = unioned.groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(1L, cast($RankBase - m_j as int))"))
          .as("__isum_p"))
      .select(col("grp_a"), col("grp_b"), estimateExpr.as("est_union"))
    val ea = singles.select(col(groupCol).as("grp_a"),
      col("hll_estimate").as("est_a"))
    val eb = singles.select(col(groupCol).as("grp_b"),
      col("hll_estimate").as("est_b"))
    uest.join(broadcast(ea), Seq("grp_a")).join(broadcast(eb), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(lit(0L),
          floor((col("est_a") + col("est_b") - col("est_union")) * 1e4 + 0.5)
            .cast("long")).as("isect_e4"))
  }

  /** Per-group HLL state and raw estimate:
    * (group, n_regs hit, exact harmonic integer sum, estimate). */
  def distinctEstimate(df: DataFrame, groupCol: String,
                       keyCol: String): DataFrame =
    finalize(registers(df, groupCol, keyCol), groupCol)
}
