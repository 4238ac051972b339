package graft

import graft.ext.{IvfIndex, Similarity}

/** Persisted IVF index: build-once layout, probe-time partition pruning,
  * and result parity with the rebuild-per-query ivfTopK. */
class IvfIndexSpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f, 0.0f), 1),
      (3L, Seq(0.1f, 0.9f, 0.0f), 1),
      (4L, Seq(0.0f, 0.0f, 1.0f), 2),
      (5L, Seq(0.0f, 0.1f, 0.9f), 2)
    ).toDF("vec_id", "embedding", "label")
  }

  test("indexed topK matches the rebuild-per-query ivfTopK") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-test").toString
    IvfIndex.build(vecs, "vec_id", "embedding", "label", dir)
    val q = Seq(1.0, 0.05, 0.0)
    val indexed = IvfIndex.topK(spark, dir, "vec_id", "embedding", q,
        k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rebuilt = Similarity.ivfTopK(vecs, "vec_id", "embedding", "label", q,
        k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed == rebuilt)
    assert(indexed.map(_._1) == Seq(0L, 1L, 3L)) // cells 0+1 probed, not 2
  }

  test("probe scan reads ONLY the probed cell partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-prune").toString
    IvfIndex.build(vecs, "vec_id", "embedding", "label", dir)
    val out = IvfIndex.topK(spark, dir, "vec_id", "embedding",
      Seq(1.0, 0.05, 0.0), k = 3, nprobe = 2)
    out.collect()
    // partition pruning: the probe filter lands in PartitionFilters with
    // exactly the two probed cells — cell=2's directory is pruned at file
    // listing and never scanned (inputFiles can't show this: it reports
    // the unfiltered relation)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:"), plan.take(2000))
    assert("PartitionFilters: \\[[^\\]]*IN \\(0,1\\)".r
      .findFirstIn(plan).isDefined, plan.take(2000))
  }
}
