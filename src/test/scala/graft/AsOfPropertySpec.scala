package graft

import graft.ext.AsOf
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property: the window-merge as-of join equals a row-by-row Scala oracle
  * ("latest right row with the same key at or before my time; ties by
  * largest tie-break; NULL keys/times never match") on random inputs with
  * duplicate keys, duplicate timestamps, and nulls on both sides. */
object AsOfPropertySpec extends Properties("asof") {

  private lazy val spark = TestSpark.spark

  private case class L(id: Long, k: Option[Long], t: Option[Long])
  private case class R(tie: Long, k: Option[Long], t: Option[Long], v: Long)

  private val genKey: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.choose(0L, 3L).map(Some(_)), 1 -> Gen.const(None))
  private val genTime: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.choose(0L, 9L).map(Some(_)), 1 -> Gen.const(None))

  private val genCase: Gen[(List[L], List[R])] = for {
    nl <- Gen.choose(0, 12)
    nr <- Gen.choose(0, 12)
    ls <- Gen.listOfN(nl, Gen.zip(genKey, genTime))
    rs <- Gen.listOfN(nr, Gen.zip(genKey, genTime, Gen.choose(100L, 999L)))
  } yield (
    ls.zipWithIndex.map { case ((k, t), i) => L(i.toLong, k, t) },
    rs.zipWithIndex.map { case ((k, t, v), i) => R(i.toLong, k, t, v) })

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def oracle(l: L, rs: Seq[R]): Option[Long] = for {
    lk <- l.k
    lt <- l.t
    best <- rs.filter(r => r.k.contains(lk) && r.t.exists(_ <= lt))
      .sortBy(r => (r.t.get, r.tie)).lastOption
  } yield best.v

  property("equals the per-row latest-admissible oracle") =
    Prop.forAll(genCase) { case (ls, rs) =>
      val lDf = spark.createDataFrame(
        spark.sparkContext.parallelize(ls.map(l =>
          Row(l.id, l.k.map(Long.box).orNull, l.t.map(ts).orNull)), 2),
        StructType(Seq(StructField("event_id", LongType),
          StructField("user_id", LongType), StructField("ts", TimestampType))))
      val rDf = spark.createDataFrame(
        spark.sparkContext.parallelize(rs.map(r =>
          Row(r.tie, r.k.map(Long.box).orNull, r.t.map(ts).orNull,
            Long.box(r.v))), 2),
        StructType(Seq(StructField("o_id", LongType),
          StructField("cust", LongType), StructField("odate", TimestampType),
          StructField("val", LongType))))
      val got = AsOf.asofJoin(lDf, rDf, "user_id", "cust", "ts", "odate",
          valueCols = Seq("val"), tieBreak = "o_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      val want = ls.map(l => l.id -> oracle(l, rs)).toMap
      (got.keySet == want.keySet) :| s"row set: ${got.keySet} vs ${want.keySet}" &&
        Prop.all(ls.map(l =>
          (got(l.id) == want(l.id)) :| s"left ${l.id}: ${got(l.id)} vs ${want(l.id)}"): _*)
    }
}
