package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Per-call-site cache slots for operators that persist intermediate
  * frames (Dedup.jaccardPairsBy shingle sets, Bronze.denseIds ranged
  * frame). Each slot holds at most ONE persisted frame: re-entering the
  * call site unpersists the slot's previous occupant before persisting
  * the new frame, so a long-lived session that re-runs the operator
  * (e.g. Bench looping its queries) holds a bounded cache instead of
  * accumulating dead entries until LRU eviction or `clearCache()`.
  *
  * Unpersisting the previous occupant makes an old returned plan that
  * still references it recompute its lineage. That is result-identical
  * whenever the lineage is deterministic — which every caller here
  * guarantees by contract (denseIds/Quantiles/Packing document that
  * their order columns must be a total order; with genuinely tied rows
  * a recompute may reassign ids among the ties, exactly as rerunning
  * the operator would).
  */
private[graft] object ManagedCache {
  private val held = scala.collection.mutable.Map.empty[String, DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) under `slot`, releasing whatever the
    * slot held before. Returns the persisted frame. */
  def swap(slot: String, df: DataFrame): DataFrame = synchronized {
    held.remove(slot).foreach(_.unpersist(blocking = false))
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    held(slot) = p
    p
  }

  /** Explicitly release one slot (no-op if empty). */
  def release(slot: String): Unit = synchronized {
    held.remove(slot).foreach(_.unpersist(blocking = false))
  }

  /** Release every slot — for tests and session teardown. */
  def releaseAll(): Unit = synchronized {
    held.valuesIterator.foreach(_.unpersist(blocking = false))
    held.clear()
  }

  private[graft] def size: Int = synchronized(held.size)
}
