package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The per-JVM persisted-index registry behind the a6/d7/t10/t11/h1
  * gate queries: one build per key, stable path on re-access, and the
  * build actually ran at the returned location. */
class IndexMemoSpec extends AnyFunSuite {

  test("builds once per key, returns the same path, isolates keys") {
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(p: String): Unit = {
      built.incrementAndGet()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p, "marker"), "x")
      ()
    }
    val key = s"spec:${System.nanoTime()}"
    val p1 = IndexMemo.path(key)(build)
    val p2 = IndexMemo.path(key)(build)
    assert(p1 == p2, "re-access must return the memoized path")
    assert(built.get() == 1, "build must run exactly once per key")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p1, "marker")),
      "the build must have run at the returned path")
    val p3 = IndexMemo.path(s"$key-other")(build)
    assert(p3 != p1 && built.get() == 2, "distinct keys get distinct builds")
  }

  test("a failed build is not memoized; the next access retries") {
    // the consumers' builders (SilverIndex.refresh*) are idempotent on a
    // partial tree, so retry-on-next-access is the correct contract: a
    // transient failure (disk, interrupted job) must not pin a broken
    // path for the rest of the JVM
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val key = s"spec-fail:${System.nanoTime()}"
    def flaky(p: String): Unit = {
      if (attempts.incrementAndGet() == 1) sys.error("transient build failure")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
      ()
    }
    intercept[RuntimeException](IndexMemo.path(key)(flaky))
    val p = IndexMemo.path(key)(flaky)
    assert(attempts.get() == 2, "second access must re-run the build")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    assert(IndexMemo.path(key)(flaky) == p && attempts.get() == 2,
      "a successful build memoizes")
  }
}
