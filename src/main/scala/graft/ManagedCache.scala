package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Per-call-site cache slots for operators that persist intermediate
  * frames (Dedup.jaccardPairsBy shingle sets, Bronze.denseIds ranged
  * frame). Slots are keyed by (call site, canonicalized-plan hash):
  * re-running the SAME plan through an operator swaps its one slot (so a
  * long-lived session that loops a query — e.g. Bench — holds a bounded
  * cache instead of accumulating dead entries), while composing the same
  * operator over DIFFERENT inputs in one larger plan (denseIds on two
  * tables then joined) keeps both frames cached rather than silently
  * unpersisting the first before its consumer executes.
  *
  * Distinct plans per call site are LRU-bounded at [[maxPerSite]];
  * crossing the bound unpersists the oldest same-site frame. Any consumer
  * still referencing an evicted frame recomputes its lineage — result-
  * identical whenever the lineage is deterministic, which every caller
  * here guarantees by contract (denseIds/Quantiles/Packing document that
  * their order columns must be a total order; with genuinely tied rows a
  * recompute may reassign ids among the ties, exactly as rerunning the
  * operator would). Such evictions are counted ([[evictionCount]]) and
  * logged so a recompute-heavy composition is observable instead of a
  * silent slowdown.
  */
private[graft] object ManagedCache {
  // insertion-ordered so same-site LRU eviction drops the oldest plan
  private val held =
    scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
  private val evicted = new java.util.concurrent.atomic.AtomicLong
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Most distinct concurrently-cached plans per call site. One larger
    * plan composing the same operator more than this many times starts
    * recomputing; raise if a legitimate composition needs more. */
  val maxPerSite: Int = 4

  /** Persist `df` (MEMORY_AND_DISK) under `slot`, releasing any previous
    * frame for the same (slot, plan). Returns the persisted frame. */
  def swap(slot: String, df: DataFrame): DataFrame = synchronized {
    val key = s"$slot#${df.queryExecution.logical.semanticHash()}"
    held.remove(key).foreach(_.unpersist(blocking = false))
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    held(key) = p
    val sameSite = held.keysIterator.filter(_.startsWith(s"$slot#")).toSeq
    sameSite.dropRight(maxPerSite).foreach { k =>
      evicted.incrementAndGet()
      log.info(s"ManagedCache: evicting oldest frame of call site '$slot' " +
        s"(> $maxPerSite distinct plans cached); consumers still holding " +
        "it will recompute")
      held.remove(k).foreach(_.unpersist(blocking = false))
    }
    p
  }

  /** Explicitly release a call site's slots (no-op if empty). */
  def release(slot: String): Unit = synchronized {
    val keys = held.keysIterator.filter(_.startsWith(s"$slot#")).toSeq
    keys.foreach(k => held.remove(k).foreach(_.unpersist(blocking = false)))
  }

  /** Release every slot — for tests and session teardown. */
  def releaseAll(): Unit = synchronized {
    held.valuesIterator.foreach(_.unpersist(blocking = false))
    held.clear()
  }

  /** LRU evictions of still-cached same-site frames since JVM start —
    * nonzero means some composition exceeded [[maxPerSite]] and is
    * recomputing. */
  def evictionCount: Long = evicted.get()

  private[graft] def size: Int = synchronized(held.size)
}
