package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible way to cut a
  * corpus down or rebalance strata for training runs.
  *
  * `sample(fraction)` / `rand()` are seed- and partitioning-dependent: a
  * re-run, a different partition count, or a different engine yields a
  * different subset, which poisons any downstream diff or cache. Hashing
  * the CONTENT instead makes membership a pure function of the row: every
  * engine, every run, every cluster size selects the identical subset, and
  * the filter is a narrow per-row predicate the scan absorbs (no shuffle,
  * no state).
  *
  * The hash is [[TextStats.rollingFingerprint]] (Rabin–Karp mod 1e9+7) —
  * already engine-portable (the same fold is expressible in plain SQL),
  * already codegen'd. Hash-mod sampling is biased only if the hash is; a
  * 31-ary poly hash over natural text is uniform enough for rate control
  * (it is NOT a cryptographic guarantee).
  */
object Sampling {

  /** Keep rows whose content hash lands in [0, keep) of [0, outOf) —
    * a deterministic ~keep/outOf sample. */
  def hashSample(df: DataFrame, textCol: String,
                 keep: Int, outOf: Int): DataFrame = {
    require(outOf > 0 && keep >= 0 && keep <= outOf,
      s"need 0 <= keep <= outOf, got $keep/$outOf")
    df.filter(bucket(col(textCol), outOf) < keep)
  }

  /** Per-stratum keep rates (stratum value → keep numerator), e.g. lang →
    * rate to downsample a dominant language. Strata absent from `rates`
    * fall back to `defaultKeep`. Still one narrow scan — the rate lookup
    * compiles to a `when` chain, never a join. */
  def stratifiedHashSample(df: DataFrame, strataCol: String, textCol: String,
                           rates: Map[String, Int], defaultKeep: Int,
                           outOf: Int): DataFrame = {
    require(outOf > 0, "outOf must be positive")
    val keep = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultKeep)) {
      case (acc, (stratum, k)) =>
        when(col(strataCol) === lit(stratum), lit(k)).otherwise(acc)
    }
    df.filter(bucket(col(textCol), outOf) < keep)
  }

  /** Per-group quota sampling — the data-mixing primitive: keep at most
    * `quota` rows per group (source, language, domain), chosen by content-
    * fingerprint order with an id tie-break so the selection is a pure
    * function of the data — every engine/run/cluster picks the identical
    * rows, unlike rand()-ranked reservoir draws.
    *
    * One shuffle on the group column; the `row_number <= quota` filter is
    * the shape Spark 4 plans as WindowGroupLimit, so each map partition
    * prunes to its local top-`quota` BEFORE the shuffle — the exchange
    * carries O(partitions · quota) rows per group, not the group's full
    * mass. That is what keeps a 100 TB source-rebalancing pass from
    * shuffling 100 TB. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
                  textCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    import org.apache.spark.sql.expressions.Window
    df.select(col(groupCol), col(idCol),
        TextStats.rollingFingerprint(col(textCol)).as("__fp"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col(groupCol))
        .orderBy(col("__fp"), col(idCol))))
      .filter(col("rnk") <= quota)
      .select(col(groupCol), col(idCol), col("rnk").cast("long").as("rnk"))
  }

  /** Deterministic train/val/test assignment: content hash mod 100 cut at
    * `trainPct` and `trainPct + valPct` — the reproducible split every
    * training pipeline needs. Because membership is a pure function of
    * the TEXT, the split survives re-runs, repartitions, engine swaps,
    * and incremental appends (a new document lands in its split without
    * moving anyone else — rand()-splits reshuffle everyone). A document
    * duplicated across snapshots always lands in the same split, so the
    * split can never leak a near-copy across the train/eval wall by
    * nondeterminism. Zero shuffles: one narrow scan-side expression. */
  def threeWaySplit(df: DataFrame, textCol: String,
                    trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"need trainPct + valPct <= 100, got $trainPct + $valPct")
    val b = bucket(col(textCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Temperature-based source mixture — the Pile/ROOTS data-mixing
    * recipe: sample source `s` at a rate proportional to `n_s^α` with
    * α = 1/2, so small sources are boosted relative to their share and a
    * dominant crawl stops drowning everything (α=1 is natural frequency,
    * α=0 is uniform-by-source; 1/2 is the classic temperature midpoint).
    * A source whose boosted rate exceeds 1 is REPEATED — the output's
    * `copies` column is the per-document multiplicity (integer epochs +
    * a content-hash-sampled fractional epoch), exactly how multi-epoch
    * upweighting is specified in the published mixtures.
    *
    * Engine-exact by construction: α = 1/2 is the one temperature whose
    * power is IEEE-CORRECTLY-ROUNDED on every platform (`sqrt` is
    * required exact by IEEE 754 where `pow(x, 0.7)` is not), and the
    * single sqrt per SOURCE is immediately floor-quantized to 1e-3
    * longs, after which every step — weight sum, target split, per-source
    * rate in 1e-6 space, epoch/remainder split, hash membership — is
    * integer arithmetic any engine replays bit-for-bit.
    *
    * Scale shape: one tiny per-source count aggregate (collected with a
    * loud cap — sources are metadata, documents are not), rates compiled
    * into a single literal-map lookup (`element_at` on a `typedLit` map —
    * a `when`-chain at the 10k-source cap builds a ~10k-deep nested
    * CaseWhen that overflows Catalyst's recursive transforms long before
    * the loud cap fires; one flat map literal has constant tree depth),
    * membership = the same scan-resident content-hash predicate as
    * [[hashSample]]. No join, no shuffle beyond the count.
    *
    * `targetNum/targetDen` is the overall sampled fraction of N (e.g.
    * 1/2 → keep about half the corpus, redistributed across sources by
    * temperature). Output: (id, source, copies ≥ 1). */
  def temperatureSample(df: DataFrame, sourceCol: String, idCol: String,
                        textCol: String, targetNum: Long, targetDen: Long,
                        maxSources: Int = 10000): DataFrame = {
    require(targetNum > 0 && targetDen > 0,
      s"target fraction must be positive, got $targetNum/$targetDen")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .orderBy(col(sourceCol)).limit(maxSources + 1).collect()
      .map { r =>
        require(!r.isNullAt(0), s"null $sourceCol rows have no mixture " +
          "weight — filter them or bucket them under an explicit label")
        (r.getString(0), r.getLong(1))
      }
    require(counts.length <= maxSources,
      s"more than $maxSources sources — the rate table is driver-resident" +
        " metadata; aggregate your source labels or raise the cap")
    // q_s = floor(sqrt(n_s)·1e3): the only floating-point step, and sqrt
    // is correctly rounded by IEEE mandate — bit-identical across engines
    val q = counts.map { case (s, n) =>
      (s, n, math.floor(math.sqrt(n.toDouble) * 1000d).toLong)
    }
    val bigN = counts.map(_._2).sum
    val w = q.map(_._3).sum // integer sum — order-free
    val target = bigN * targetNum / targetDen
    // rate_s in 1e-6 space: ideal rows for s = target·q_s/W, spread over
    // n_s docs. BigInt intermediate: target·q_s·1e6 overflows a long at
    // petabyte corpus sizes, the exact regime this is for.
    val rates = q.map { case (s, n, qs) =>
      val r = (BigInt(target) * qs * 1000000L / (BigInt(w) * n)).toLong
      (s, r / 1000000L, r % 1000000L) // (source, whole epochs, remainder)
    }
    // missing keys are impossible (the count aggregate covered every
    // source and rejected nulls) but coalesce keeps the closed-world
    // default the when-chain's otherwise(0) used to provide
    val epochs = coalesce(
      element_at(typedLit(rates.map { case (s, e, _) => (s, e) }.toMap),
        col(sourceCol)), lit(0L))
    val rem = coalesce(
      element_at(typedLit(rates.map { case (s, _, r) => (s, r) }.toMap),
        col(sourceCol)), lit(0L))
    df.select(col(idCol), col(sourceCol),
        (epochs + when(bucket(col(textCol), 1000000) < rem, lit(1L))
          .otherwise(lit(0L))).as("copies"))
      .filter(col("copies") > 0)
  }

  private def bucket(text: Column, outOf: Int): Column =
    pmod(TextStats.rollingFingerprint(text), lit(outOf.toLong))

  /** Systematic PPS (probability-proportional-to-size) sampling, per
    * stratum: draw exactly `k` weighted picks from each stratum, where a
    * row's pick count is proportional to its weight share — the
    * weight-aware dual of [[quotaSample]]'s count quota (sample by doc
    * LENGTH or quality mass, not per-doc).
    *
    * Deterministic and engine-exact: rows order by (content fingerprint,
    * id) — a content-addressed total order, no rand() — and row i with
    * exclusive running weight `cum` and weight `w` is picked
    * `floor((cum+w)·k/W) − floor(cum·k/W)` times (W = stratum total).
    * That telescopes to exactly k picks per stratum, heavy rows can be
    * picked more than once (`copies` > 1 — a row heavier than W/k always
    * is), and everything is long division — any engine replays it.
    *
    * Scale: one window shuffle partitioned by stratum (the pack_blocks
    * per-shard pattern — NO global single-partition cumsum); the product
    * cum·k must fit a long, guarded LOUDLY up front (at petabyte strata
    * raise the grain or shard the stratum key — overflow is a config
    * error, not a silent wrap). */
  def ppsSample(df: DataFrame, idCol: String, textCol: String,
                weightCol: String, strataCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(col(idCol), col(strataCol),
        col(weightCol).cast("long").as("w"),
        TextStats.rollingFingerprint(col(textCol)).as("__fp"))
      .where(col("w") > 0)
    val maxW = base.groupBy(col(strataCol)).agg(sum(col("w")).as("tw"))
      .agg(coalesce(max(col("tw")), lit(0L))).head().getLong(0)
    require(maxW <= Long.MaxValue / k,
      s"ppsSample: stratum weight $maxW x k=$k overflows long arithmetic " +
        "- shard the stratum key or reduce k")
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(col("__fp"), col(idCol))
    val cum = coalesce(sum(col("w")).over(
      ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val tot = sum(col("w")).over(Window.partitionBy(col(strataCol)))
    base.select(col(idCol), col(strataCol), col("w"),
        cum.as("__cum"), tot.as("__tot"))
      .withColumn("copies",
        expr(s"((__cum + w) * $k) div __tot - (__cum * $k) div __tot"))
      .where(col("copies") > 0)
      .select(col(idCol), col(strataCol), col("w"), col("copies"))
  }
}
