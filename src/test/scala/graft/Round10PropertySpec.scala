package graft

import graft.ext.{Components, TextStats}
import org.scalacheck.{Gen, Prop, Properties}

/** Properties for the round-10 hardening work, each checked against an
  * independent in-memory Scala oracle on random inputs:
  *  - applyClustersBest picks the max-score / min-id representative on
  *    IDS SPANNING THE FULL LONG RANGE (including Long.MinValue, where
  *    the old `-id` tie-break overflowed under ANSI — bitwise NOT is a
  *    total order-reversing bijection);
  *  - pageRank with `redistributeDangling = true` matches the exact
  *    integer power-method model on graphs with guaranteed dangling
  *    nodes, and redistribution never LOSES mass relative to the
  *    drop-dangling default. */
object Round10PropertySpec extends Properties("round10") {

  private lazy val spark = TestSpark.spark

  // ----------------------------------------------- applyClustersBest
  // distinct ids drawn from the extremes and the full range
  private val genIds: Gen[List[Long]] = for {
    n <- Gen.choose(2, 12)
    core <- Gen.listOfN(n, Gen.oneOf(
      Gen.const(Long.MinValue), Gen.const(Long.MaxValue),
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(-10L, 10L)))
  } yield (Long.MinValue :: core).distinct // MinValue always present

  private val genClustered: Gen[(List[(Long, Long)], List[Long])] = for {
    ids <- genIds
    nClusters <- Gen.choose(1, math.max(1, ids.size / 2))
    assign <- Gen.listOfN(ids.size, Gen.choose(0, nClusters - 1))
    scores <- Gen.listOfN(ids.size, Gen.choose(0L, 5L)) // narrow: force ties
  } yield {
    val byCluster = ids.zip(assign).groupBy(_._2)
    val pairs = byCluster.values.toList.flatMap { members =>
      val comp = members.map(_._1).min
      members.map { case (id, _) => (id, comp) }
    }
    (pairs.sortBy(_._1), scores)
  }

  property("applyClustersBest = in-memory argmax oracle on full-range ids") =
    Prop.forAll(genClustered) { case (pairs, scores) =>
      import spark.implicits._
      val ids = pairs.map(_._1)
      val df = ids.zip(scores).toDF("doc_id", "score")
      val clusters = pairs.toDF("id", "comp")
      val got = Components.applyClustersBest(df, "doc_id", clusters, "score")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val score = ids.zip(scores).toMap
      val want = pairs.groupBy(_._2).values.map { members =>
        // keep the max score; ties to the SMALLEST id
        members.map(_._1).maxBy(id => (score(id), ~id))
      }.toSet
      got == want
    }

  // ------------------------------------------------ dangling PageRank
  /** Exact integer power-method model, replicating pageRank's contract
    * symbol for symbol: floor division everywhere, per-edge contribution
    * pr·85·w div (100·outw), teleport 15·scale div (100·N), and (when
    * redistributing) the dangling mass D taken from the PRE-update rank
    * vector, shared as 85·D div (100·N). All quantities non-negative, so
    * `/` on Long is Spark's `div`. */
  private def model(edges: Seq[(Long, Long, Long)], iters: Int,
                    scale: Long, redis: Boolean): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var pr = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val cs = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => pr(s) * 85L * w / (100L * outw(s)) }.sum
      }
      val dmass =
        if (redis) nodes.filterNot(outw.contains).map(pr).sum else 0L
      pr = nodes.map(nd => nd -> (15L * scale / (100L * n) +
        (if (redis) dmass * 85L / (100L * n) else 0L) +
        cs.getOrElse(nd, 0L))).toMap
    }
    pr
  }

  // src drawn from 0..n-2 and one forced edge into n-1: node n-1 appears
  // only as a destination, so every generated graph HAS a dangling node
  private val genGraph: Gen[(Seq[(Long, Long, Long)], Int)] = for {
    n <- Gen.choose(3, 8)
    m <- Gen.choose(1, 12)
    raw <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, (n - 2).toLong)
      d <- Gen.choose(0L, (n - 1).toLong)
      w <- Gen.choose(1L, 100L)
    } yield (s, d, w))
    wLast <- Gen.choose(1L, 100L)
    iters <- Gen.choose(1, 4)
  } yield {
    val forced = (0L, (n - 1).toLong, wLast)
    // distinct (src,dst): duplicate edges would double outw vs the model
    val dedup = (forced +: raw).groupBy(e => (e._1, e._2))
      .values.map(_.head).toSeq.sortBy(e => (e._1, e._2))
    (dedup, iters)
  }

  property("pageRank(redistributeDangling) = exact integer model") =
    Prop.forAll(genGraph) { case (edges, iters) =>
      import spark.implicits._
      val df = edges.toDF("src", "dst", "w")
      val got = Components.pageRank(df, "src", "dst", "w", iters = iters,
          scale = 1000000L, redistributeDangling = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = model(edges, iters, 1000000L, redis = true)
      val dropTotal = model(edges, iters, 1000000L, redis = false)
        .values.sum
      // redistribution conserves (floor-rounded) mass the drop variant
      // sheds through the dangling node
      got == want && want.values.sum >= dropTotal
    }

  // --------------------------------------------------------------- BPE
  /** Independent model of one exhaustive left-to-right merge pass —
    * recursive pattern match, deliberately unlike the engine's
    * imperative builder. */
  private def mergeList(syms: List[String],
                        m: (String, String)): List[String] = syms match {
    case a :: b :: rest if a == m._1 && b == m._2 =>
      (a + b) :: mergeList(rest, m)
    case a :: rest => a :: mergeList(rest, m)
    case Nil       => Nil
  }

  /** Independent BPE trainer: recompute every round's weighted pair
    * counts from scratch (zip/groupBy), winner = count desc then lex
    * pair; stops early when pairs run out. */
  private def modelMerges(wordFreq: Map[String, Long],
                          rounds: Int): List[(String, String)] = {
    var segs = wordFreq.map { case (w, f) =>
      w -> (w.toList.map(_.toString), f)
    }
    var ms = List.empty[(String, String)]
    var continue = rounds > 0
    while (continue) {
      val counts = segs.values.toList
        .flatMap { case (syms, f) => syms.zip(syms.drop(1)).map(_ -> f) }
        .groupBy(_._1).map { case (p, fs) => p -> fs.map(_._2).sum }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toList
          .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
        ms = ms :+ best
        segs = segs.map { case (w, (syms, f)) =>
          w -> (mergeList(syms, best), f)
        }
        continue = ms.size < rounds
      }
    }
    ms
  }

  /** Independent reference encoder: the GPT-2 `bpe()` loop — repeatedly
    * merge ALL occurrences of the lowest-rank pair present. */
  private def modelEncode(word: String,
                          merges: List[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.toList.map(_.toString)
    var done = false
    while (!done) {
      val ranked = syms.zip(syms.drop(1)).flatMap(p => rank.get(p))
      if (ranked.isEmpty) done = true
      else syms = mergeList(syms, merges(ranked.min))
    }
    syms
  }

  // ------------------------------------------- JL random projection
  /** Independent model of [[graft.ext.Similarity.randomProject]]: same
    * hash formula, in-order double fold, floor-quantize. */
  private def modelProject(vec: List[Float],
                           outDim: Int): Map[Long, Long] =
    (0 until outDim).map { j =>
      var acc = 0.0
      var i = 0
      while (i < vec.length) {
        val h = (i.toLong * 73856093L + j.toLong * 19349663L + 83492791L) %
          65521L
        val m = (h * 2654435761L) % 2147483647L
        val sign = 1.0 - 2.0 * (m % 2L).toDouble
        acc = acc + sign * vec(i).toDouble
        i += 1
      }
      j.toLong -> math.floor(acc / math.sqrt(outDim.toDouble) * 1e4 + 0.5)
        .toLong
    }.toMap

  private val genProjVecs: Gen[(List[List[Float]], Int)] = for {
    n <- Gen.choose(1, 6)
    d <- Gen.choose(1, 12)
    vs <- Gen.listOfN(n, Gen.listOfN(d, Gen.oneOf(
      Gen.const(0.0f), Gen.choose(-100.0f, 100.0f))))
    outDim <- Gen.choose(1, 8)
  } yield (vs, outDim)

  property("randomProject = in-memory hash-sign fold model") =
    Prop.forAll(genProjVecs) { case (vs, outDim) =>
      import spark.implicits._
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = graft.ext.Similarity
        .randomProject(df, "vec_id", "embedding", outDim)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
      val want = vs.zipWithIndex.flatMap { case (v, i) =>
        modelProject(v, outDim).map { case (j, y) => ((i.toLong, j), y) }
      }.toMap
      got == want
    }

  private val genCorpus: Gen[(List[String], Int)] = for {
    n <- Gen.choose(1, 8)
    words <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 8)
      cs <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield cs.mkString)
    dup <- Gen.listOfN(n, Gen.choose(1, 3)) // occurrence weights
    k <- Gen.choose(1, 5)
  } yield (words.zip(dup).flatMap { case (w, d) => List.fill(d)(w) }, k)

  property("bpeEncode = independent trainer + GPT-2-loop encoder") =
    Prop.forAll(genCorpus) { case (occurrences, k) =>
      import spark.implicits._
      val wf = occurrences.groupBy(identity)
        .map { case (w, os) => w -> os.size.toLong }
      val ms = modelMerges(wf, k)
      ms.isEmpty || {
        val n = ms.size // achievable rounds (engine throws past them)
        assert(TextStats.learnBpeMerges(wf.toList.sortBy(_._1), n) == ms)
        val got = TextStats.bpeEncode(occurrences.toDF("text"), "text",
            numMerges = n)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
          .groupBy(_._1)
          .map { case (w, rows) =>
            w -> rows.sortBy(_._2).map(_._3).toList
          }
        val want = wf.keys.map(w => w -> modelEncode(w, ms)).toMap
        graft.ext.Dedup.unpersistAll()
        // pieces match the reference loop AND reassemble the word
        got == want && got.forall { case (w, ps) => ps.mkString == w }
      }
    }
}
