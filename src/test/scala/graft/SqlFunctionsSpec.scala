package graft

/** The SQL registration surface: custom expressions callable from
  * spark.sql after GraftExtensions.register. */
class SqlFunctionsSpec extends SparkSpec {

  test("array_dot / shingle_hashes / token_poly_hashes callable from SQL") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(dot == 32.0)

    val nShingles = spark.sql(
      "SELECT size(shingle_hashes('a b c d', 3)) AS n").head().getInt(0)
    assert(nShingles == 2)

    val toks = spark.sql(
      "SELECT size(token_poly_hashes('x y x')) AS n").head().getInt(0)
    assert(toks == 2) // distinct tokens

    // and they participate in whole-stage codegen paths over real frames
    import spark.implicits._
    Seq(("a b c d e", 1)).toDF("text", "id").createOrReplaceTempView("t")
    val viaSql = spark.sql(
      "SELECT id, size(shingle_hashes(text, 3)) AS n FROM t").head()
    assert(viaSql.getInt(1) == 3)

    // the AGGREGATE registers too: the analyzer wraps the returned
    // AggregateFunction, and SQL groups produce the same struct the
    // Column API does
    (1L to 100L).map(i => (s"g${i % 2}", i)).toDF("g", "k")
      .createOrReplaceTempView("hll_t")
    val viaAggSql = spark.sql(
      "SELECT g, hll_sketch(k).hll_estimate AS e FROM hll_t GROUP BY g " +
        "ORDER BY g").collect().map(r => (r.getString(0), r.getDouble(1)))
    val viaColumn = spark.table("hll_t").groupBy($"g")
      .agg(graft.functions.HllFunctions.hll_sketch($"k").as("s"))
      .select($"g", $"s.hll_estimate").orderBy($"g")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(viaAggSql.toSeq == viaColumn.toSeq)
  }

  test("analysis-time errors for bad arity / non-literal n") {
    GraftExtensions.register(spark)
    intercept[Exception] { spark.sql("SELECT array_dot(array(1.0D))").collect() }
    intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b', length('xy'))").collect()
    }
  }
}
