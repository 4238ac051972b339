package graft

import java.nio.file.Files

import org.apache.spark.sql.Row


import graft.sources.TxTable

/** The DSv2 TxCatalog: SQL name resolution, VERSION/TIMESTAMP time
  * travel, pushdown reaching the delegated parquet scan, and the loud
  * read-only contract. */
class TxCatalogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("txcat-spec-").toString
    import spark.implicits._
    val t1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "v")
    val t2 = Seq((3L, "c", 30.0)).toDF("id", "s", "v")
    TxTable.commit(t1, s"$wh/db/t", "overwrite")   // v1
    TxTable.commit(t2, s"$wh/db/t", "append")      // v2
    TxTable.commit(t2, s"$wh/db/t", "overwrite")   // v3
    spark.conf.set("spark.sql.catalog.txspec", "graft.sources.TxCatalog")
    spark.conf.set("spark.sql.catalog.txspec.root", wh)
    wh
  }

  test("latest snapshot resolves through pure SQL") {
    warehouse
    val got = spark.sql("SELECT id, s, v FROM txspec.db.t ORDER BY id").collect()
    assert(got.toSeq == Seq(Row(3L, "c", 30.0)))
  }

  test("VERSION AS OF reads each committed snapshot") {
    warehouse
    def ids(v: Int) = spark.sql(
      s"SELECT id FROM txspec.db.t VERSION AS OF $v ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids(1) == Seq(1L, 2L))
    assert(ids(2) == Seq(1L, 2L, 3L))
    assert(ids(3) == Seq(3L))
  }

  test("TIMESTAMP AS OF resolves to the newest version published by then") {
    warehouse
    // far future → latest; manifest mtimes are in the past
    val got = spark.sql(
      "SELECT id FROM txspec.db.t TIMESTAMP AS OF '2999-01-01 00:00:00'")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L))
    val e = intercept[Exception] {
      spark.sql(
        "SELECT id FROM txspec.db.t TIMESTAMP AS OF '1990-01-01 00:00:00'")
        .collect()
    }
    assert(e.getMessage.contains("no version"))
  }

  test("SQL and Scala API agree on every version") {
    warehouse
    (1 to 3).foreach { v =>
      val sql = spark.sql(
        s"SELECT id, s, v FROM txspec.db.t VERSION AS OF $v ORDER BY id")
        .collect().toSeq
      val api = TxTable.readVersion(spark, s"$warehouse/db/t", v.toLong)
        .orderBy("id").collect().toSeq
      assert(sql == api, s"version $v disagrees")
    }
  }

  test("filter pushdown reaches the delegated parquet scan") {
    warehouse
    val df = spark.sql("SELECT id FROM txspec.db.t VERSION AS OF 1 WHERE id = 2")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(id,2)]") ||
      plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2)]"),
      s"expected pushed filters in:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("missing table and vacuumed/unknown version fail loudly") {
    warehouse
    // the catalog's NoSuchTableException surfaces wrapped in Spark's
    // analysis error (TABLE_OR_VIEW_NOT_FOUND)
    val missing = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM txspec.db.nope").collect()
    }
    assert(missing.getMessage.contains("nope"))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM txspec.db.t VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("version 99"))
  }

  test("DDL and writes are refused loudly, reads stay the only surface") {
    warehouse
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE txspec.db.t2 (id BIGINT) USING parquet")
    }
    assert(e1.getMessage.contains("TxTable.commit"))
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO txspec.db.t VALUES (9, 'z', 9.0)")
    }
    // no SupportsWrite capability → Spark rejects the append itself
    assert(e2.getMessage.toLowerCase.contains("does not support") ||
      e2.getMessage.toLowerCase.contains("unsupported"))
    val e3 = intercept[Exception] {
      spark.sql("DROP TABLE txspec.db.t")
    }
    assert(e3.getMessage.contains("vacuum"))
  }

  test("namespace listing sees the table, SHOW TABLES works") {
    warehouse
    val tables = spark.sql("SHOW TABLES IN txspec.db").collect()
      .map(_.getString(1)).toSeq
    assert(tables.contains("t"))
    val ns = spark.sql("SHOW NAMESPACES IN txspec").collect()
      .map(_.getString(0)).toSeq
    assert(ns.contains("db"))
  }
}
