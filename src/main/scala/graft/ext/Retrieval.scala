package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval with reciprocal-rank fusion — the
  * standard RAG serving topology (Cormack et al. 2009's RRF over a BM25
  * list and an ANN list): each retriever contributes its top-C ranked
  * candidates per query, and fusion scores a document
  * `Σ 1/(rrfK + rank)` over the lists it appears in. Rank fusion
  * deliberately ignores raw score scales — the two retrievers' scores
  * are incomparable, their RANKS are not.
  *
  * Engine-exact arithmetic: the lexical score is the EXACT BM25 of
  * [[TextStats.bm25TopTerms]] — the k1=6/5, b=3/4 tf side cleared into
  * the integer rational `22·S·tf / (10·S·tf + 3·S + 9·dl·N)` (one
  * IEEE-identical double division), times the integer-quantized
  * idf_q6 = N·10⁶ div df, floor(·+0.5)-rounded and SUMMED over the
  * query's terms. The cosine is the repo-standard round(·,4) double,
  * and the fused score is `Σ floor(10⁹/(rrfK + rank))` — integers end
  * to end, no float drift across engines.
  *
  * Scale shape, per batch of Q queries:
  *   - the query set rides a BROADCAST frame (terms and vectors are
  *     driver metadata, like `sim_knn`'s probe batch) — the corpus is
  *     scanned, never replicated per query beyond the Q-way multiply;
  *   - the lexical tf aggregate materializes only the query terms'
  *     postings (broadcast semi-join BEFORE the groupBy), and document
  *     length rides the same scan (`size(tokens)` computed next to the
  *     explode) so no corpus-wide length join exists;
  *   - per-query top-C ranks use `row_number` over
  *     `partitionBy(query_id)` with the rank filter adjacent — Spark 4
  *     plans WindowGroupLimit (per-partition prune to C before the
  *     shuffle), so the fusion join touches 2·C·Q rows at any corpus
  *     size. A full-corpus rank would be the anti-pattern: RRF only
  *     ever reads the heads of the lists. */
object Retrieval {

  /** One retrieval query: an id the caller chooses, its lexical terms,
    * its embedding-space vector. */
  final case class RetrievalQuery(queryId: Long, terms: Seq[String],
                                  vec: Seq[Double])

  /** Batched fused top-k: (query_id, id, rrf_score, lex_rank, vec_rank)
    * — ranks are null for a document only one retriever surfaced. */
  def hybridTopKBatch(docs: DataFrame, docIdCol: String, textCol: String,
                      emb: DataFrame, vecIdCol: String, vecCol: String,
                      queries: Seq[RetrievalQuery],
                      k: Int = 10, candidates: Int = 50,
                      rrfK: Int = 60): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_.queryId).distinct.size == queries.size,
      "query ids must be unique")
    queries.foreach { q =>
      require(q.terms.nonEmpty, s"query ${q.queryId}: need at least one term")
      require(q.vec.nonEmpty, s"query ${q.queryId}: need a non-empty vector")
    }
    require(k > 0 && candidates >= k, s"need 0 < k <= candidates")
    val lexTop = lexTopBatch(docs, docIdCol, textCol, queries, candidates)
    val vecTop = vecTopExact(emb, vecIdCol, vecCol, queries, candidates)
    fuse(lexTop, vecTop, k, rrfK)
  }

  /** The lexical arm: per-query BM25 top-`candidates` ranks —
    * (query_id, id, lex_rank). Object scaladoc has the scale shape. */
  private def lexTopBatch(docs: DataFrame, docIdCol: String,
                          textCol: String, queries: Seq[RetrievalQuery],
                          candidates: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // (query_id, term) pairs as a broadcast frame: the semi-join replaces
    // an isin() so one corpus explode serves every query in the batch
    val qterms = broadcast(
      queries.flatMap(q => q.terms.distinct.map(t => (q.queryId, t)))
        .toDF("query_id", "term"))
    val toks = TextStats.toks(col(textCol))
    // dl (doc token count) rides the exploding scan — no corpus-wide
    // length join; S and N are one broadcast totals row from a second
    // scan-side aggregate
    val occ = docs.select(col(docIdCol).as("id"),
        size(toks).cast("long").as("dl"), explode(toks).as("term"))
      .join(qterms, "term")
    val tf = occ.groupBy(col("query_id"), col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // df is a CORPUS property of the term (shared across queries)
    val dfreq = tf.select(col("term"), col("id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val tot = docs.agg(count(lit(1)).as("__n"),
      sum(size(toks).cast("long")).as("__s"))
    // TextStats.bm25TopTerms' exact rational, verbatim
    val num = lit(22L) * col("__s") * col("tf")
    val den = lit(10L) * col("__s") * col("tf") + lit(3L) * col("__s") +
      lit(9L) * col("dl") * col("__n")
    val idf = expr("(__n * 1000000) div df_docs")
    val w = floor(num.cast("double") / den.cast("double") *
      idf.cast("double") + lit(0.5)).cast("long")
    val lex = tf.join(dfreq, "term").crossJoin(broadcast(tot))
      .withColumn("__w", w)
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("__w")).as("lex_score"))
    lex
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("lex_score").desc, col("id").asc)).cast("long"))
      .filter(col("lex_rank") <= candidates)
      .select(col("query_id"), col("id"), col("lex_rank"))
  }

  /** The exact vector arm: per-query q4-cosine top-`candidates` ranks
    * over a full corpus scan — (query_id, id, vec_rank). */
  private def vecTopExact(emb: DataFrame, vecIdCol: String, vecCol: String,
                          queries: Seq[RetrievalQuery],
                          candidates: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val qvecs = broadcast(
      queries.map(q => (q.queryId, q.vec,
          math.sqrt(q.vec.foldLeft(0.0)((a, x) => a + x * x))))
        .toDF("query_id", "qvec", "qnorm"))
    val v = Similarity.asDouble(col(vecCol))
    // self-norm hoisted BELOW the cross join: the projection sits under
    // the join operator so ProjectCollapsing can't merge it upward, and
    // each corpus vector's O(dim) self-dot + sqrt runs once — not once
    // per query. Same arithmetic, same association, bit-identical cosine.
    val embN = emb.select(col(vecIdCol), v.as("__v"),
      sqrt(graft.functions.VectorFunctions.array_dot(v, v)).as("__vn"))
    val cos = round(
      graft.functions.VectorFunctions.array_dot(col("__v"), col("qvec")) /
        (col("__vn") * col("qnorm")), 4)
    embN.crossJoin(qvecs)
      .select(col("query_id"), col(vecIdCol).as("id"), cos.as("sim"))
      .withColumn("vec_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("id").asc)).cast("long"))
      .filter(col("vec_rank") <= candidates)
      .select(col("query_id"), col("id"), col("vec_rank"))
  }

  /** RRF fusion over the two per-query rank lists — object scaladoc. */
  private def fuse(lexTop: DataFrame, vecTop: DataFrame, k: Int,
                   rrfK: Int): DataFrame = {
    val fused = lexTop.join(vecTop, Seq("query_id", "id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"1000000000 div ($rrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($rrfK + vec_rank)"), lit(0L)))
    fused
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_score").desc, col("id").asc)))
      .filter(col("__r") <= k)
      .select(col("query_id"), col("id"), col("rrf_score"),
        col("lex_rank"), col("vec_rank"))
  }

  /** Single-query fused top-k: (id, rrf_score, lex_rank, vec_rank) —
    * a batch of one (same plan shape; the query_id partition column
    * also keeps every Window partitioned, so no single-partition
    * WindowExec warning ever fires). */
  def hybridTopK(docs: DataFrame, docIdCol: String, textCol: String,
                 emb: DataFrame, vecIdCol: String, vecCol: String,
                 queryTerms: Seq[String], queryVec: Seq[Double],
                 k: Int = 10, candidates: Int = 50,
                 rrfK: Int = 60): DataFrame =
    hybridTopKBatch(docs, docIdCol, textCol, emb, vecIdCol, vecCol,
      Seq(RetrievalQuery(0L, queryTerms, queryVec)), k, candidates, rrfK)
      .drop("query_id")

  /** [[hybridTopK]] with the vector arm served by the PERSISTED IVF-PQ
    * index ([[IvfIndex.topKPq]]) — the 100 TB serving topology: the
    * exact arm scans every embedding per query; here the coarse
    * quantizer prunes the scan to `nprobe` cell PARTITIONS
    * (plan-asserted PartitionFilters in `IvfIndexSpec`), asymmetric
    * distance scores the PQ codes inside them (embeddings unread), and
    * the final `candidates` ADC winners are re-scored exactly against
    * the pruned raw partitions only. `vec_rank` ranks those candidates
    * by the EXACT rescored cosine (ties to the smaller id) — the same
    * orientation the exact arm uses, so fusion arithmetic is unchanged
    * and recall loss is confined to candidates ADC missed. Lexical arm
    * and RRF fusion are [[hybridTopKBatch]]'s, verbatim. */
  def hybridTopKAnn(docs: DataFrame, docIdCol: String, textCol: String,
                    indexPath: String, vecIdCol: String,
                    queryTerms: Seq[String], queryVec: Seq[Double],
                    k: Int = 10, candidates: Int = 50, nprobe: Int = 2,
                    rrfK: Int = 60): DataFrame =
    hybridTopKAnnBatch(docs, docIdCol, textCol, indexPath, vecIdCol,
      Seq(RetrievalQuery(0L, queryTerms, queryVec)), k, candidates,
      nprobe, rrfK)
      .drop("query_id")

  /** The BATCHED ANN-served hybrid ([[hybridTopKAnn]] scaladoc): the
    * lexical arm and fusion still ride one broadcast query frame
    * ([[hybridTopKBatch]]'s plan, verbatim); the vector arm unions one
    * partition-pruned IVF-PQ probe per query — which is the real
    * serving shape: each query's coarse-quantizer rank is driver
    * metadata (nlist rows), its scan touches only ITS nprobe cells, and
    * queries share nothing but the index. Batch cost is therefore
    * Q x (one pruned code scan + k rescore dots), not Q x corpus. */
  def hybridTopKAnnBatch(docs: DataFrame, docIdCol: String,
                         textCol: String, indexPath: String,
                         vecIdCol: String, queries: Seq[RetrievalQuery],
                         k: Int = 10, candidates: Int = 50,
                         nprobe: Int = 2, rrfK: Int = 60): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_.queryId).distinct.size == queries.size,
      "query ids must be unique")
    queries.foreach { q =>
      require(q.terms.nonEmpty, s"query ${q.queryId}: need at least one term")
      require(q.vec.nonEmpty, s"query ${q.queryId}: need a non-empty vector")
    }
    require(k > 0 && candidates >= k, s"need 0 < k <= candidates")
    val s = docs.sparkSession
    val lexTop = lexTopBatch(docs, docIdCol, textCol, queries, candidates)
    // ONE centroid-scan job ranks the coarse cells for every query in
    // the batch (IvfIndex.rankCellsMany: a probe at any nprobe is a
    // prefix of the ranked list) — instead of one probe job per query;
    // maxRank = nprobe bounds the driver transfer to nprobe rows/query
    val cellLists = IvfIndex.rankCellsMany(s, indexPath,
      queries.map(_.vec), maxRank = nprobe)
    val vecTop = queries.zip(cellLists)
      .map { case (q, cells) =>
        IvfIndex.topKPqCells(s, indexPath, vecIdCol, q.vec,
            k = candidates, probes = cells, rescore = true)
          .withColumn("query_id", lit(q.queryId))
      }
      .reduce(_ unionByName _)
      .withColumn("vec_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col(vecIdCol).asc)).cast("long"))
      .select(col("query_id"), col(vecIdCol).as("id"), col("vec_rank"))
    fuse(lexTop, vecTop, k, rrfK)
  }
}
