package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Metadata-only parquet row count — the exact analog of the reference's
  * `estimated_document_count()` (/root/reference/No_Sql.py:416), which
  * reads collection metadata and never scans documents.
  *
  * A Spark `count(*)` over parquet is already cheap (empty read schema,
  * per-row-group counts), but it still schedules a task per file split and
  * materializes empty row batches. This path reads ONLY file footers,
  * distributed over the file list — at 100 TB that's thousands of ~KB
  * footer reads instead of a scan job, and it returns the same exact
  * count (parquet footers store exact row counts; nothing is estimated).
  */
object ParquetMeta {

  /** Exact row count from parquet footers. `path` may be a single file or
    * a directory tree (fully recursed — Hive-partitioned layouts like
    * `root/dt=.../part-*.parquet` count correctly). */
  def footerCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory) {
        val it = fs.listFiles(p, /* recursive = */ true)
        val out = Seq.newBuilder[String]
        while (it.hasNext) {
          val s = it.next()
          if (s.isFile && s.getPath.getName.endsWith(".parquet"))
            out += s.getPath.toString
        }
        out.result()
      } else Seq(path)
    if (files.isEmpty) return 0L
    // The driver's Hadoop conf carries filesystem credentials/impls
    // (spark.hadoop.* — s3a keys, custom nameservices); ship the entries to
    // the executors rather than rebuilding a default Configuration there,
    // which would break on any non-default filesystem.
    val confEntries: Array[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
    val bc = spark.sparkContext.broadcast(confEntries)
    spark.sparkContext
      .parallelize(files, math.min(files.size, spark.sparkContext.defaultParallelism))
      .map { f =>
        val c = new Configuration(false)
        bc.value.foreach { case (k, v) => c.set(k, v) }
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), c))
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }
      .sum()
      .toLong
  }
}
