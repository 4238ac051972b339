package graft

import graft.ext.Skew
import org.apache.spark.sql.functions._

/** Salted-join correctness: identical matches to the plain join on skewed
  * data, deterministic salt, and the widened key space actually splits the
  * hot key across salt values. */
class SkewSpec extends SparkSpec {

  test("saltedJoin == plain join on a hot-key fact table") {
    import spark.implicits._
    // 90% of fact rows hit customer 1 — the classic hot key
    val fact = (1L to 200L).map(i =>
      (i, if (i <= 180) 1L else i % 5 + 1, i.toDouble)).toDF("rowid", "cust", "v")
    val dim = (1L to 6L).map(i => (i, s"seg${i % 3}")).toDF("c_id", "seg")
    val plain = fact.join(dim, fact("cust") === dim("c_id"))
      .groupBy("seg").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("seg").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedJoin(fact, dim, "cust", "c_id", "rowid", buckets = 4)
      .groupBy("seg").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("seg").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == plain)
  }

  test("salt is deterministic and spreads the hot key over the buckets") {
    import spark.implicits._
    val ids = (1L to 1000L).toDF("id")
    val salts = ids.select(Skew.salt(col("id"), 8).as("s"))
    val again = ids.select(Skew.salt(col("id"), 8).as("s"))
    assert(salts.collect().map(_.getInt(0)).toSeq ==
      again.collect().map(_.getInt(0)).toSeq)
    val distribution = salts.groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(distribution.keySet == (0 until 8).toSet)
    // roughly uniform: no bucket takes more than 2.5x its fair share
    assert(distribution.values.max < 1000 / 8 * 5 / 2)
  }
}
