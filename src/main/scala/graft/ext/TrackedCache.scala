package graft.ext

import org.apache.spark.sql.DataFrame

/** Shared cache lifecycle for operators whose plans read an intermediate
  * frame more than once (dedup pair self-joins, tf-idf's tf frame):
  * persist at creation, release explicitly once the result is consumed.
  * Without the release, each call leaks blocks into the LRU and a long
  * session ends up evicting and recomputing hot data (observed as a 4x
  * slowdown of late queries in BENCH_r03 plus "Asked to cache already
  * cached data" warnings).
  *
  * A queue (not a set): repeated calls each add their own blocks and each
  * deserves its own release.
  *
  * `private[graft]`: the declared-query layer (SparkEntry's composed
  * pipeline entries) shares the same lifecycle — anything persisted here
  * is released by the harness's per-query `Dedup.unpersistAll`. */
private[graft] object TrackedCache {

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  def unpersistAll(blocking: Boolean = false): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = tracked.poll()
    }
  }
}
