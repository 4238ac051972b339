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

  test("round-13 kernels callable from SQL, bit-identical to the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, Array(0.5, 1.5, -2.0, 3.0))).toDF("id", "v")
      .createOrReplaceTempView("vt")

    val jlSql = spark.sql("SELECT jl_project(v, 2) AS p FROM vt")
      .head().getSeq[Double](0)
    val jlCol = spark.table("vt")
      .select(graft.functions.VectorFunctions.jl_project($"v", 2).as("p"))
      .head().getSeq[Double](0)
    assert(jlSql == jlCol && jlSql.length == 2)

    // cell_argmin takes its centroid matrix as a constant SQL expression
    val cents = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 1.0, -2.0, 3.0))
    val cellSql = spark.sql(
      "SELECT cell_argmin(v, array(array(0.0D,0.0D,0.0D,0.0D)," +
        " array(1.0D,1.0D,-2.0D,3.0D))) AS c FROM vt").head().getInt(0)
    val cellCol = spark.table("vt")
      .select(graft.functions.VectorFunctions.cell_argmin($"v", cents).as("c"))
      .head().getInt(0)
    assert(cellSql == cellCol && cellSql == 1)

    val fpSql = spark.sql("SELECT rolling_fingerprint('hello world') AS f")
      .head().getLong(0)
    val fpCol = Seq(Tuple1("hello world")).toDF("t")
      .select(graft.functions.FingerprintFunctions.rolling_fingerprint($"t"))
      .head().getLong(0)
    assert(fpSql == fpCol)

    val gramSql = spark.sql("SELECT gram_poly_hashes('a b c d', 2) AS g")
      .head().getSeq[Long](0)
    val gramCol = Seq(Tuple1("a b c d")).toDF("t")
      .select(graft.functions.ShingleFunctions.gram_poly_hashes($"t", 2))
      .head().getSeq[Long](0)
    assert(gramSql == gramCol && gramSql.length == 3)

    val shSql = spark.sql(
      "SELECT simhash_signature(token_poly_hashes('a b c')) AS s")
      .head().getLong(0)
    val shCol = Seq(Tuple1("a b c")).toDF("t")
      .select(graft.functions.SketchFunctions.simhash_signature(
        graft.functions.ShingleFunctions.token_poly_hashes($"t")))
      .head().getLong(0)
    assert(shSql == shCol)

    val coeffs = Array(3L, 5L, 7L, 11L)
    val mhSql = spark.sql(
      "SELECT minhash_signature(token_poly_hashes('a b c'), " +
        "array(3L, 5L, 7L, 11L)) AS m").head().getSeq[Long](0)
    val mhCol = Seq(Tuple1("a b c")).toDF("t")
      .select(graft.functions.SketchFunctions.minhash_signature(
        graft.functions.ShingleFunctions.token_poly_hashes($"t"), coeffs))
      .head().getSeq[Long](0)
    assert(mhSql == mhCol && mhSql.length == 2)
  }

  test("html_strip: tags, comments, raw-text blocks, entities, strictness") {
    GraftExtensions.register(spark)
    def strip(h: String): Option[String] = {
      val r = spark.sql(
        s"SELECT html_strip('${h.replace("'", "\\'")}') AS t").head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    assert(strip("<p>hello <b>world</b></p>") == Some("hello world"))
    // the regex-killer: a bare '<' INSIDE script code, and markup in a
    // string literal — the whole block must vanish
    assert(strip("a<script>if (x<1) { s = \"<p>\"; }</script>b") == Some("ab"))
    assert(strip("a<STYLE>p { color: red }</STYLE>b") == Some("ab"))
    assert(strip("a<!-- <p>not text</p> -->b") == Some("ab"))
    // entities: named, decimal, hex; bare & stays literal
    assert(strip("x &amp; y &#65;&#x42; &lt;tag&gt;") ==
      Some("x & y AB <tag>"))
    assert(strip("AT&T and R&D") == Some("AT&T and R&D"))
    // a STRAY close tag (no opener — everywhere in real HTML) drops
    // like any other tag instead of opening a phantom raw-text hunt
    assert(strip("ok</script>") == Some("ok"))
    assert(strip("a</script>b</script>c") == Some("abc"))
    assert(strip("a</style>b") == Some("ab"))
    // '>' inside a quoted attribute value is data, not the tag close
    assert(strip("<a title=\"a>b\">x</a>") == Some("x"))
    assert(strip("<div data-f='x => y'>t</div>") == Some("t"))
    // surrogate numeric references map to U+FFFD, never lone surrogates
    assert(strip("&#xD800;z") == Some("�z"))
    assert(strip("&#55296;z") == Some("�z"))
    // the NUL reference is the spec's other invalid-codepoint class —
    // same U+FFFD mapping, not literal '&#0;' text
    assert(strip("&#0;z") == Some("�z"))
    assert(strip("&#x0;z") == Some("�z"))
    // strict-or-refuse on structural malformation (an OPEN '<' with no
    // closing '>' — "<p>trailing text" is well-formed, the tag closed;
    // an unterminated attribute QUOTE is malformed too)
    assert(strip("text <p unterminated") == None)
    assert(strip("<a title=\"never closed>x") == None)
    assert(strip("<!-- never closed") == None)
    assert(strip("<script>var x = 1;") == None)
    // SQL and Column API agree
    import spark.implicits._
    val viaCol = Seq(Tuple1("<i>x</i> &gt; y")).toDF("h")
      .select(graft.functions.HtmlFunctions.html_strip($"h"))
      .head().getString(0)
    assert(viaCol == "x > y")
  }

  test("round-13 kernels refuse non-constant plan-baked arguments") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, Array(0.5, 1.5))).toDF("id", "v").createOrReplaceTempView("vt2")
    // a row-dependent centroid matrix cannot be baked into codegen
    intercept[Exception] {
      spark.sql("SELECT cell_argmin(v, array(v)) FROM vt2").collect()
    }
    intercept[Exception] {
      spark.sql(
        "SELECT minhash_signature(array(id), array(id, 5L)) FROM vt2")
        .collect()
    }
    // odd coefficient count is not a valid (a,b) schedule
    intercept[Exception] {
      spark.sql(
        "SELECT minhash_signature(array(1L), array(3L, 5L, 7L))").collect()
    }
  }

  test("analysis-time errors for bad arity / non-literal n") {
    GraftExtensions.register(spark)
    intercept[Exception] { spark.sql("SELECT array_dot(array(1.0D))").collect() }
    intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b', length('xy'))").collect()
    }
  }
}
