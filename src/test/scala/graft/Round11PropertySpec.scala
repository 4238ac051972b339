package graft

import graft.ext.KMeans
import org.scalacheck.{Gen, Prop, Properties}

/** Properties for the round-11 work, checked against independent
  * in-memory Scala oracles on random inputs:
  *  - distributed KMeans.fit/assigned equal an in-memory Lloyd model
  *    that re-implements the portable arithmetic contract (quantized
  *    squared-distance argmin with lower-cell ties, 1e-10 long-quantized
  *    means, keep-previous on empty cells) — EXACT double equality, not
  *    tolerance: the whole point of the contract is bit-reproducibility. */
object Round11PropertySpec extends Properties("round11") {

  private lazy val spark = TestSpark.spark

  // ------------------------------------------------------------ k-means
  /** In-order IEEE fold then floor-quantize — mirrors KMeans.qdist2. */
  private def qd2(v: Seq[Double], c: Seq[Double]): Long = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
    math.floor(acc * 1e8 + 0.5).toLong
  }

  private def argminCell(v: Seq[Double],
                         cents: IndexedSeq[Seq[Double]]): Int =
    cents.zipWithIndex.map { case (c, j) => (qd2(v, c), j) }.min._2

  /** Naive driver-side Lloyd with the identical portable arithmetic. */
  private def fitModel(rows: Seq[(Long, Seq[Double])], k: Int,
                       iters: Int): IndexedSeq[Seq[Double]] = {
    var cents = rows.sortBy(_._1).take(k).map(_._2).toIndexedSeq
    for (_ <- 1 to iters) {
      val groups = rows.groupBy { case (_, v) => argminCell(v, cents) }
      cents = cents.indices.map { j =>
        groups.get(j) match {
          case Some(vs) =>
            val n = vs.size
            cents(j).indices.map { p =>
              vs.map(r => math.floor(r._2(p) * 1e10 + 0.5).toLong).sum
                .toDouble / n / 1e10
            }
          case None => cents(j)
        }
      }
    }
    cents
  }

  private val genKmeans: Gen[(List[(Long, List[Double])], Int, Int)] = for {
    dims <- Gen.choose(2, 6)
    n <- Gen.choose(3, 20)
    k <- Gen.choose(1, 3)
    iters <- Gen.choose(0, 3)
    vecs <- Gen.listOfN(n, Gen.listOfN(dims, Gen.choose(-4.0, 4.0)))
  } yield (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) },
    math.min(k, n), iters)

  property("KMeans.fit/assigned = in-memory Lloyd model, bit-exact") =
    Prop.forAll(genKmeans) { case (rows, k, iters) =>
      import spark.implicits._
      val df = rows.toDF("vec_id", "embedding")
      val got = KMeans.fit(df, "vec_id", "embedding", k, iters)
      val want = fitModel(rows, k, iters)
      val centroidsMatch = got.size == want.size &&
        got.zip(want).forall { case (g, w) =>
          g.size == w.size && g.zip(w).forall { case (a, b) => a == b }
        }
      val gotCells = KMeans.assigned(df, "vec_id", "embedding", k, iters)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val cellsMatch = rows.forall { case (id, v) =>
        gotCells(id) == argminCell(v, want)
      }
      centroidsMatch && cellsMatch
    }

  // ------------------------------------------- substring-level dedup
  /** Naive in-memory model of Dedup.substringSpans at the GRAM-STRING
    * level (the 62-bit poly hash is injective for test purposes): grams
    * duplicated across >= 2 distinct docs, per-doc coverage merged with
    * the same equal-width island rule. Returns (doc, start, len,
    * span_text) and the excision (doc, clean, removed). */
  private def modelSpans(docs: Seq[(Long, String)], k: Int)
      : (Set[(Long, Long, Long, String)], Map[Long, (String, Long)]) = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toIndexedSeq
    }
    val grams = toks.map { case (id, ws) =>
      val kk = math.min(k, ws.length)
      id -> (if (ws.isEmpty) IndexedSeq.empty[(Int, String)]
             else (0 to ws.length - kk).map(i =>
               (i, ws.slice(i, i + kk).mkString(" "))))
    }
    val dup = grams.flatMap { case (id, gs) => gs.map(g => (g._2, id)) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val spans = grams.flatMap { case (id, gs) =>
      val ws = toks.toMap.apply(id)
      val kk = math.min(k, ws.length)
      val hits = gs.collect { case (p, g) if dup(g) => p }
      val islands = scala.collection.mutable.ListBuffer[(Int, Int)]()
      hits.foreach { p =>
        // merge when coverage overlaps or touches: start <= last end + 1
        if (islands.nonEmpty && p <= islands.last._2 + 1)
          islands(islands.size - 1) =
            (islands.last._1, math.max(islands.last._2, p + kk - 1))
        else islands += ((p, p + kk - 1))
      }
      islands.map { case (s, e) =>
        (id, s.toLong, (e - s + 1).toLong, ws.slice(s, e + 1).mkString(" "))
      }
    }.toSet
    val cleaned = toks.map { case (id, ws) =>
      val cov = spans.collect {
        case (d, s, l, _) if d == id => (s.toInt until (s + l).toInt)
      }.flatten.toSet
      val kept = ws.zipWithIndex.collect {
        case (w, i) if !cov(i) => w
      }
      id -> (kept.mkString(" "), cov.size.toLong)
    }.toMap
    (spans, cleaned)
  }

  private val genDocs: Gen[(List[(Long, String)], Int)] = for {
    k <- Gen.choose(2, 4)
    n <- Gen.choose(2, 8)
    docs <- Gen.listOfN(n,
      Gen.choose(0, 14).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
          .map(_.mkString(" "))))
  } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k)

  property("substringSpans/removeDupSpans = in-memory span model") =
    Prop.forAll(genDocs) { case (docs, k) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val (wantSpans, wantClean) = modelSpans(docs, k)
      val gotSpans = graft.ext.Dedup
        .substringSpans(df, "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      val gotClean = graft.ext.Dedup
        .removeDupSpans(df, "doc_id", "text", k)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      graft.ext.Dedup.unpersistAll()
      gotSpans == wantSpans && gotClean == wantClean
    }

  // --------------------------------------- temperature mixture sampling
  /** The engine's content hash: floorMod(acc·31 + codePoint, 1e9+7)
    * folded over code points, seed 0 (FingerprintExpressions). */
  private def fp(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = java.lang.Math.floorMod(acc * 31L + cp, 1000000007L)
      i += Character.charCount(cp)
    }
    acc
  }

  /** In-memory replay of Sampling.temperatureSample's documented
    * arithmetic: per-source counts → floor(sqrt·1e3) weights → integer
    * rates in 1e-6 space → epoch + hash-remainder copies. */
  private def modelTemperature(docs: List[(Long, String, String)],
                               num: Long, den: Long): Map[Long, Long] = {
    val counts = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val q = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1000d).toLong
    }
    val w = q.values.sum
    val target = counts.values.sum * num / den
    val rate = counts.map { case (s, n) =>
      s -> (BigInt(target) * q(s) * 1000000L / (BigInt(w) * n)).toLong
    }
    docs.flatMap { case (id, s, text) =>
      val r = rate(s)
      val copies = r / 1000000L +
        (if (java.lang.Math.floorMod(fp(text), 1000000L) < r % 1000000L) 1L
         else 0L)
      if (copies > 0) Some(id -> copies) else None
    }.toMap
  }

  private val genMix: Gen[(List[(Long, String, String)], Long, Long)] = for {
    nSrc <- Gen.choose(1, 4)
    sizes <- Gen.listOfN(nSrc, Gen.choose(1, 25))
    texts <- Gen.sequence[List[List[String]], List[String]](
      sizes.map(sz => Gen.listOfN(sz,
        Gen.choose(0, 30).flatMap(len =>
          Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString)))))
    nd <- Gen.oneOf((1L, 2L), (1L, 3L), (2L, 3L), (1L, 1L), (3L, 2L))
  } yield {
    val docs = texts.zipWithIndex.flatMap { case (ts, si) =>
      ts.map(t => (s"src$si", t))
    }.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
    (docs, nd._1, nd._2)
  }

  property("temperatureSample = in-memory sqrt-share integer model") =
    Prop.forAll(genMix) { case (docs, num, den) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "source", "text")
      val got = graft.ext.Sampling
        .temperatureSample(df, "source", "doc_id", "text", num, den)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      got == modelTemperature(docs, num, den)
    }
}
