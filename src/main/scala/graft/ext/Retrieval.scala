package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval with reciprocal-rank fusion — the
  * standard RAG serving topology (Cormack et al. 2009's RRF over a BM25
  * list and an ANN list): each retriever contributes its top-C ranked
  * candidates, and fusion scores a document `Σ 1/(rrfK + rank)` over the
  * lists it appears in. Rank fusion deliberately ignores raw score
  * scales — the two retrievers' scores are incomparable, their RANKS are
  * not.
  *
  * Engine-exact arithmetic: the lexical score is the integer
  * tf·idf_q6 sum (idf_q6 = N·10⁶ div df, [[TextStats.tfidfTopTerms]]'s
  * quantization), the cosine is the repo-standard round(·,4) double, and
  * the fused score is `Σ floor(10⁹/(rrfK + rank))` — pure integer, no
  * float drift across engines.
  *
  * Scale shape: each side reduces to its top-C by
  * `orderBy(...).limit(C)` — planned as TakeOrderedAndProject (per-
  * partition top-C then a C-row driver merge, never a global sort) — so
  * the fusion join touches 2·C rows no matter the corpus size; the
  * lexical tf aggregate only materializes the query terms' postings
  * (filter-before-groupBy), and the vector side is one scan with the
  * codegen'd [[graft.functions.ArrayDot]]. A full-corpus rank would be
  * the anti-pattern: RRF only ever reads the heads of the lists. */
object Retrieval {

  /** Fused top-k: (id, rrf_score, lex_rank, vec_rank) — ranks are null
    * for a document only one retriever surfaced. */
  def hybridTopK(docs: DataFrame, docIdCol: String, textCol: String,
                 emb: DataFrame, vecIdCol: String, vecCol: String,
                 queryTerms: Seq[String], queryVec: Seq[Double],
                 k: Int = 10, candidates: Int = 50,
                 rrfK: Int = 60): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(queryVec.nonEmpty, "need a non-empty query vector")
    require(k > 0 && candidates >= k, s"need 0 < k <= candidates")

    // ---- lexical side: tf·idf_q6 over the query terms only ----
    val toks = TextStats.toks(col(textCol))
    val occ = docs.select(col(docIdCol).as("id"),
        explode(toks).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = occ.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val lexTop = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("__w", col("tf") * expr("(__n * 1000000) div df_docs"))
      .groupBy(col("id")).agg(sum(col("__w")).as("lex_score"))
      .orderBy(col("lex_score").desc, col("id").asc)
      .limit(candidates)
      .select(col("id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("lex_score").desc, col("id").asc))
          .cast("long").as("lex_rank"))

    // ---- vector side: cosine vs the query vector, repo-standard q4 ----
    val v = Similarity.asDouble(col(vecCol))
    val q = typedLit(queryVec)
    val qn = math.sqrt(queryVec.foldLeft(0.0)((a, x) => a + x * x))
    val cos = round(
      graft.functions.VectorFunctions.array_dot(v, q) /
        (sqrt(graft.functions.VectorFunctions.array_dot(v, v)) * lit(qn)), 4)
    val vecTop = emb.select(col(vecIdCol).as("id"), cos.as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(candidates)
      .select(col("id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("id").asc))
          .cast("long").as("vec_rank"))

    // ---- RRF fusion over the two C-row lists ----
    val fused = lexTop.join(vecTop, Seq("id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"1000000000 div ($rrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($rrfK + vec_rank)"), lit(0L)))
    fused.orderBy(col("rrf_score").desc, col("id").asc).limit(k)
      .select(col("id"), col("rrf_score"), col("lex_rank"), col("vec_rank"))
  }
}
