package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — explicit key salting.
  *
  * When one join key carries a disproportionate share of the fact rows
  * (the classic hot-customer / hot-null / hot-default-value shapes), a
  * shuffled hash or sort-merge join lands that key's entire volume on ONE
  * reducer: the job runs at the speed of its hottest key. AQE's skew-join
  * splitting handles sort-merge cases adaptively; salting is the explicit,
  * planner-independent fix that also works for aggregations and for joins
  * AQE can't split.
  *
  * Shape: the fact side gets a deterministic salt in [0, buckets) derived
  * from a UNIQUE fact column (never random — retries and speculative tasks
  * must salt identically), widening the key space `buckets`-fold; the
  * dimension side is replicated once per salt value with `explode`. Join
  * on (key, salt). Dimension replication costs |dim| × buckets rows — use
  * for genuinely small-to-medium dims where broadcast is impossible (too
  * big for the driver) but skew still bites.
  */
object Skew {

  /** Deterministic salt from a unique column — stable across retries. */
  /** Join-key skew audit: the k heaviest keys of a prospective join key
    * with their row counts and per-mille share of the table — the number
    * you look at BEFORE deciding between a plain shuffle join, a
    * broadcast, or [[saltedJoin]]. One partial-aggregated groupBy on the
    * key + a TakeOrderedAndProject prune to k; the share is exact integer
    * per-mille ((cnt·1000) div total) so the report hash-matches any
    * engine. */
  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    counts
      .crossJoin(broadcast(df.agg(count(lit(1)).as("total"))))
      .select(col(keyCol), col("cnt"),
        expr("(cnt * 1000) div total").as("permille"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(k)
  }

  def salt(uniqueCol: Column, buckets: Int): Column =
    pmod(xxhash64(uniqueCol), lit(buckets.toLong)).cast("int")

  /** Inner equi-join `fact.factKey == dim.dimKey`, salted `buckets`-wide.
    * Result rows are identical to the unsalted join (salting only splits
    * partitions, never changes matches). */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 factUnique: String, buckets: Int = 16): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val saltedFact = fact.withColumn("__salt", salt(col(factUnique), buckets))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
