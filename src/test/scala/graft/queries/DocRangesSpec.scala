package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md's family headers carry query-index ranges ("## Portable
  * sketches (k1–k7)") that were hand-maintained — and drifted four
  * times across r13/r14 (the recurring header-range class both
  * verdicts flagged). This spec makes the drift impossible: every
  * `<letter>1–<letter><N>` range in a SCALE.md header must name
  * exactly the max index that family has in `SparkEntry.queries`,
  * and every lettered family in the gate that uses the `<letter><n>_`
  * naming must be covered by some header range. */
class DocRangesSpec extends AnyFunSuite {

  private val header = "^#+ .*".r
  private val range = "\\(?([a-z])1[–-]\\1?(\\d+)\\)?".r
  private val key = "^([a-z])(\\d+)_.*".r

  test("SCALE.md header ranges match the gate's per-family max index") {
    val scale = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SCALE.md")), "UTF-8")
    val declared: Map[Char, Int] = scale.linesIterator
      .filter(l => header.pattern.matcher(l).matches())
      .flatMap(l => range.findAllMatchIn(l)
        .map(m => m.group(1).head -> m.group(2).toInt))
      .toMap
    assert(declared.nonEmpty, "no ranges parsed — header format changed?")

    val actual: Map[Char, Int] = graft.SparkEntry.queries.keys
      .collect { case key(p, n) => p.head -> n.toInt }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).max }

    declared.foreach { case (p, n) =>
      assert(actual.contains(p),
        s"SCALE.md declares family '$p' but the gate has no '${p}N_' query")
      assert(actual(p) == n,
        s"SCALE.md header says ${p}1–$p$n but the gate's max is " +
          s"$p${actual(p)} — update the header")
    }
    // families that use the lettered-index naming must all be declared
    // somewhere (g/h/j/m are narrated inside other sections by design —
    // they keep single-digit counts; everything that has grown a range
    // header stays pinned)
    val exemptSmallFamilies = Set('g', 'h', 'j', 'm')
    (actual.keySet -- declared.keySet -- exemptSmallFamilies).foreach { p =>
      fail(s"gate family '$p' (max ${actual(p)}) has no SCALE.md " +
        "header range — add one (or exempt it here with a reason)")
    }
  }
}
