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

  test("keySkew: heaviest keys first, exact per-mille, k bound, tie-break") {
    import spark.implicits._
    val d = (Seq.fill(6)("hot") ++ Seq.fill(2)("warm") ++
      Seq.fill(2)("cool")).toDF("k")
    val out = Skew.keySkew(d, "k", k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 6/10 = 600 permille; warm and cool tie at 2 -> "cool" wins by key
    assert(out.toSeq == Seq(("hot", 6L, 600L), ("cool", 2L, 200L)))
    intercept[IllegalArgumentException](Skew.keySkew(d, "k", 0))
  }

  test("orphans: missing parents and NULL FKs counted; audit unions rows") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = graft.ext.Integrity.audit(Seq(
        graft.ext.Integrity.orphans(child, parent, "fk", "pk", "c->p"),
        graft.ext.Integrity.orphans(parent.select(col("pk").as("fk")),
          parent, "fk", "pk", "p->p")))
      .orderBy("rel").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // 99 has no parent and the NULL fk references nothing -> 2 orphans
    assert(out.toSeq == Seq(("c->p", 2L), ("p->p", 0L)))
  }
}
