package graft

import org.apache.spark.sql.functions._

/** Slot semantics of [[ManagedCache]]: same-plan re-entry swaps in place,
  * distinct plans for one call site coexist (the compose-twice-in-one-plan
  * case the old call-site-only keying silently broke), and the per-site
  * LRU bound evicts observably. */
class ManagedCacheSpec extends SparkTestBase {

  private def frame(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "v")
  }

  test("same plan swaps its slot; distinct plans coexist up to the bound") {
    ManagedCache.releaseAll()
    val slot = "spec.slot"
    ManagedCache.swap(slot, frame(3))
    val size1 = ManagedCache.size
    // identical plan → same key → swap, not stack
    ManagedCache.swap(slot, frame(3))
    assert(ManagedCache.size == size1)
    // a different plan through the same call site keeps BOTH frames
    // cached (e.g. denseIds over two tables joined in one larger plan)
    val two = ManagedCache.swap(slot, frame(4))
    assert(ManagedCache.size == size1 + 1)
    assert(two.storageLevel.useMemory || two.storageLevel.useDisk)
    ManagedCache.releaseAll()
  }

  test("exceeding maxPerSite evicts the oldest frame and counts it") {
    ManagedCache.releaseAll()
    val slot = "spec.lru"
    val before = ManagedCache.evictionCount
    val first = ManagedCache.swap(slot, frame(10))
    (11 to 10 + ManagedCache.maxPerSite).foreach(n => ManagedCache.swap(slot, frame(n)))
    // maxPerSite+1 distinct plans → one eviction, of the oldest
    assert(ManagedCache.evictionCount == before + 1)
    assert(ManagedCache.size == ManagedCache.maxPerSite)
    assert(first.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    ManagedCache.releaseAll()
  }

  test("release clears every plan of a call site") {
    ManagedCache.releaseAll()
    ManagedCache.swap("spec.rel", frame(5))
    ManagedCache.swap("spec.rel", frame(6))
    ManagedCache.swap("spec.other", frame(7))
    ManagedCache.release("spec.rel")
    assert(ManagedCache.size == 1)
    ManagedCache.releaseAll()
  }
}
