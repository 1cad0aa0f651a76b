package graft.pipeline

import java.time.temporal.ChronoUnit
import java.time.{Instant, LocalDate, ZoneId}

/** Five-field cron expression (minute hour day-of-month month day-of-week),
  * the wall-clock schedule grammar the reference deploys with
  * (/root/reference/src/data_ingestion.py:98-106 `cron="0 0 * * 0"` —
  * Sunday 00:00; src/fuzzy_flows.py:16-23 `0 1 * * 0`; src/cleaned_data.py:
  * 48-56 `0 2 * * 0`). Graft's [[Scheduler]] previously only offered a
  * fixed-rate grid anchored at launch ("every 7d from start"); this anchors
  * ticks to wall-clock slots ("Sundays at 00:00") like the reference's
  * Prefect crons.
  *
  * Grammar per field: `*`, `n`, `a-b`, comma lists, and `/step` suffixes
  * on star or ranges (star-slash-15, `1-5/2`). Day-of-week is 0-7 with 0=7=
  * Sunday. Standard vixie-cron day rule: when BOTH day-of-month and
  * day-of-week are restricted, a day matches if EITHER does; otherwise both
  * (each `*` matches everything).
  *
  * Evaluation is in an explicit [[ZoneId]] (UTC unless the caller says
  * otherwise) — a schedule must not silently follow container-local time.
  */
final case class Cron(minutes: Set[Int], hours: Set[Int], doms: Set[Int],
    months: Set[Int], dows: Set[Int],
    domRestricted: Boolean, dowRestricted: Boolean) {

  private val minutesSorted = minutes.toIndexedSeq.sorted
  private val hoursSorted = hours.toIndexedSeq.sorted

  private def dayMatches(date: LocalDate): Boolean = {
    val dom = doms(date.getDayOfMonth)
    // java.time: Mon=1..Sun=7; cron Sunday is 0 (7 normalized at parse)
    val dow = dows(date.getDayOfWeek.getValue % 7)
    if (domRestricted && dowRestricted) dom || dow else dom && dow
  }

  /** Epoch millis of the first slot STRICTLY after `afterMs` — firing at a
    * slot then asking for the next from inside that same minute advances,
    * so an overrunning run skips missed slots instead of stacking them
    * (same collapse semantics as [[Scheduler.loop]]). Day-wise scan:
    * bounded by the 4-year leap cycle (any satisfiable spec fires within
    * it), each step O(|hours|·|minutes|) worst case. */
  def nextFire(afterMs: Long, zone: ZoneId): Long = {
    val from = Instant.ofEpochMilli(afterMs).atZone(zone)
      .truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    var date = from.toLocalDate
    var d = 0
    val maxDays = 366 * 4 + 1
    while (d < maxDays) {
      if (months(date.getMonthValue) && dayMatches(date)) {
        val firstDay = d == 0
        var hi = 0
        while (hi < hoursSorted.length) {
          val h = hoursSorted(hi)
          if (!firstDay || h >= from.getHour) {
            val minFloor = if (firstDay && h == from.getHour) from.getMinute else 0
            val mIdx = minutesSorted.indexWhere(_ >= minFloor)
            if (mIdx >= 0)
              return date.atTime(h, minutesSorted(mIdx)).atZone(zone)
                .toInstant.toEpochMilli
          }
          hi += 1
        }
      }
      date = date.plusDays(1)
      d += 1
    }
    // unreachable for any spec parse() accepts (all fields non-empty and
    // dom<=31 can only starve on impossible dates like Feb 30, which the
    // 4-year scan also covers for Feb 29)
    throw new IllegalArgumentException(
      s"cron spec never fires (e.g. a day-of-month no month has): $this")
  }
}

object Cron {

  private final case class Field(name: String, min: Int, max: Int)
  private val fields = Seq(Field("minute", 0, 59), Field("hour", 0, 23),
    Field("day-of-month", 1, 31), Field("month", 1, 12),
    Field("day-of-week", 0, 7))

  /** Parse `"0 0 * * 0"`-style five-field specs. Rejects wrong arity,
    * out-of-range values, inverted ranges, and zero steps. */
  def parse(spec: String): Cron = {
    val parts = spec.trim.split("\\s+")
    require(parts.length == 5,
      s"cron spec must have 5 fields (minute hour dom month dow), " +
        s"got ${parts.length} in '$spec'")
    val sets = fields.zip(parts).map { case (f, p) => parseField(f, p) }
    val dows = sets(4).map(_ % 7) // 7 -> 0, both mean Sunday
    // vixie marks a day field "star" by its FIRST char — "*/2" is a star
    // field and does not arm the dom/dow OR rule
    Cron(sets(0), sets(1), sets(2), sets(3), dows,
      domRestricted = !parts(2).startsWith("*"),
      dowRestricted = !parts(4).startsWith("*"))
  }

  private def parseField(f: Field, part: String): Set[Int] = {
    def bad(item: String, why: String) = throw new IllegalArgumentException(
      s"bad ${f.name} field item '$item': $why")
    part.split(",").toSeq.flatMap { item =>
      val (rangePart, step) = item.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) =>
          val st = try s.toInt catch {
            case _: NumberFormatException => bad(item, "non-numeric step")
          }
          if (st < 1) bad(item, "step must be >= 1")
          (r, st)
        case _ => bad(item, "more than one '/'")
      }
      val (lo, hi) = rangePart match {
        case "*" => (f.min, f.max)
        case r => r.split("-") match {
          case Array(a) =>
            val v = try a.toInt catch {
              case _: NumberFormatException => bad(item, "non-numeric value")
            }
            // bare value with a step means "from v to max" (cronie
            // semantics: "30/10 * * * *" fires at :30, :40, :50)
            (v, if (step > 1) f.max else v)
          case Array(a, b) =>
            val (va, vb) = try (a.toInt, b.toInt) catch {
              case _: NumberFormatException => bad(item, "non-numeric range")
            }
            (va, vb)
          case _ => bad(item, "more than one '-'")
        }
      }
      if (lo < f.min || hi > f.max) bad(item,
        s"out of range ${f.min}-${f.max}")
      if (lo > hi) bad(item, "inverted range")
      lo.to(hi, step)
    }.toSet
  }
}
