package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("probe-rlw-").toString
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft_tx", "graft.sources.TxCatalog")
      .config("spark.sql.catalog.graft_tx.root", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "v")
      .write.format("noop") // just force session init
      .mode("overwrite").save()
    graft.sources.TxTable.commit(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "name", "v"),
      s"$wh/db/t", "overwrite")
    try {
      s.sql("UPDATE graft_tx.db.t SET v = v + 1 WHERE id = 2").show()
    } catch { case e: Throwable => println(s"UPDATE error: ${e.getClass.getName}: ${e.getMessage.take(300)}") }
    try {
      Seq((2L, "bb", 99L), (4L, "d", 40L)).toDF("id", "name", "v")
        .createOrReplaceTempView("src")
      s.sql("""MERGE INTO graft_tx.db.t t USING src s ON t.id = s.id
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""").show()
    } catch { case e: Throwable => println(s"MERGE error: ${e.getClass.getName}: ${e.getMessage.take(300)}") }
    s.stop()
  }
}
