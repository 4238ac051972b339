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
    * a directory (recursed one level, the standard layout). */
  def footerCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString)
      else Seq(path)
    if (files.isEmpty) return 0L
    // footer reads run on executors; the Hadoop conf is rebuilt there
    // (default construction resolves local/HDFS URIs embedded in the paths)
    spark.sparkContext
      .parallelize(files, math.min(files.size, spark.sparkContext.defaultParallelism))
      .map { f =>
        val c = new Configuration()
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), c))
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }
      .sum()
      .toLong
  }
}
