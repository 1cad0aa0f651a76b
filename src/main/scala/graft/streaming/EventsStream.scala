package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured-Streaming-first event processing. The reference is batch-only
  * (SURVEY §2.9), so this is the engine's streaming extension: the same
  * transforms run over `readStream` (with watermarks) and over batch frames
  * (the oracle-checked path) — one definition, two execution modes.
  */
object EventsStream {

  /** Tumbling-window counts/sums per event type. Works on batch and
    * streaming inputs; streaming callers should `withWatermark` first. */
  def windowedStats(events: DataFrame, windowLength: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      // sum in DECIMAL for order-independence, emit DOUBLE (decimal
      // output columns can't hash-match the DuckDB oracle's float64)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Watermarked streaming variant (append-mode safe). */
  def windowedStatsStream(events: DataFrame, windowLength: String,
      watermark: String): DataFrame =
    windowedStats(events.withWatermark("ts", watermark), windowLength)

  /** Session aggregation via the built-in `session_window` (gap-merged).
    * Emits per (user, session): bounds, event count, value sum. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))

  /** Deterministic first event per key: the batch-checkable face of
    * stream deduplication (row_number over (ts, tieBreak) = 1). */
  def firstEventPerKey(events: DataFrame, keys: Seq[String],
      tieBreak: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col("ts") +: tieBreak.map(col)).map(_.asc): _*)
    events.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Streaming dedup for at-least-once sources: keeps the first arrival
    * per key, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark` — state for a key is dropped once
    * the watermark passes its event time, so reprocessing storms don't
    * grow state without bound). */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** STREAM-STREAM interval join: same-key pairs with
    * `right.ts ∈ [left.ts, left.ts + window]`, both sides watermarked so
    * Structured Streaming can bound the join state (rows older than
    * watermark + window are evicted). The batch face of the same plan is
    * [[graft.operators.TemporalJoins.intervalJoin]] — one definition of
    * the condition, two execution modes. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      window: String, watermark: String): DataFrame =
    graft.operators.TemporalJoins.intervalJoin(
      left.withWatermark(leftTs, watermark),
      right.withWatermark(rightTs, watermark),
      keys, leftTs, rightTs, window)

  /** Stream-static enrichment join: events against a small static
    * dimension, broadcast so the stream side never shuffles. Works
    * identically over batch and readStream inputs (stream-static joins
    * are stateless in Structured Streaming). */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  // --- custom-state variant (flatMapGroupsWithState) ---

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionAgg(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Custom sessionization with explicit state — the
    * `flatMapGroupsWithState` surface for semantics `session_window`
    * can't express (emitting sessions only on close). Production streams
    * should pass `timeout = ProcessingTimeTimeout` plus a real trigger
    * interval so idle sessions eventually flush; with the default
    * NoTimeout, a session closes when a later event arrives past the gap
    * (note: with the as-fast-as-possible test trigger, a processing-time
    * timeout spins continuous no-data batches and
    * `processAllAvailable` never settles — hence the parameter). */
  /** One incoming event for [[sessionizeStatefulStream]]. */
  final case class VisitEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long)
  /** One CLOSED visit: the stream's append-only output row. Bounds are
    * exact epoch-microseconds (the x8 precision contract) — the serve
    * layer reconstructs timestamps with `timestamp_micros`. */
  final case class Visit(user_id: Long, session_idx: Long, start_us: Long,
      end_us: Long, n_events: Long)
  /** Keyed state: the user's one OPEN visit plus its 1-based index.
    * `n == 0` is the CLOSED-HISTORY tombstone — no open visit, `idx`
    * visits emitted so far. The tombstone is what keeps session
    * numbering global across an idle gap: an event-time timeout closes
    * the visit, but the NEXT visit of the same user must number
    * `idx + 1`, so the counter survives the close (x8's per-user
    * running index has no expiry). One row of 4 longs per ever-seen
    * user; a deployment that numbers visits by start time instead may
    * `remove()` on timeout and hold state for active users only. */
  final case class OpenVisit(startUs: Long, lastUs: Long, n: Long, idx: Long)

  /** Exact epoch-µs of a Timestamp: epoch seconds × 10⁶ plus the full
    * sub-second nanos field (adding µs to `getTime` directly would
    * double-count the millisecond part, which lives in both). */
  private[streaming] def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Gap-based sessionization under STREAMING arrival with explicit
    * keyed state — the stateful face of
    * [[graft.operators.Sessions.sessionize]] (x8), semantics-identical
    * so the accumulated output passes x8's DuckDB oracle verbatim:
    * per user, (ts, event_id)-ordered events split where the exact
    * epoch-µs gap EXCEEDS `gapMicros` (a gap of exactly `gapMicros`
    * stays in-session), sessions numbered 1-based in time order.
    *
    * Mechanics: `flatMapGroupsWithState` in Append mode. A visit is
    * emitted when a later event of the same user breaks the gap; the
    * final open visit per user flushes via EVENT-TIME TIMEOUT — state
    * arms a timeout at `last_event + gap`, and when the watermark
    * (1 s of slack — see the inline note) passes it (any later input,
    * or `flushUser` sentinel rows in a finite replay) the visit closes
    * with no further data for that user. State per user is ONE OpenVisit (4 longs) — at
    * 100 TB the state store holds |active users| tiny rows, the
    * watermark retires idle ones, and no window/sort over history
    * exists anywhere (contrast the batch face's per-user sort: here
    * each micro-batch sorts only its own rows per user).
    *
    * In-order contract: rows arrive in non-decreasing event time per
    * user ACROSS micro-batches (the watermark admits at most 1 s of
    * disorder; within a batch the fold sorts). `flushUser` names an
    * OPT-IN sentinel user id whose rows advance the watermark without
    * creating state (finite replays use it to fire the final
    * timeouts); with the default `None` no id is special and every
    * user's events sessionize — a feed whose real ids could collide
    * with a sentinel simply picks a vacant one. */
  def sessionizeStatefulStream(spark: SparkSession, events: DataFrame,
      gapMicros: Long, flushUser: Option[Long] = None): Dataset[Visit] = {
    require(gapMicros > 0, s"gapMicros must be > 0: $gapMicros")
    import spark.implicits._
    val gapMs = gapMicros / 1000L
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"))
      // 1 s of slack, not 0: a row whose ts EQUALS the previous batch's
      // max sits exactly on a 0-delay watermark, where the late-row
      // filter's boundary convention decides its fate — the slack keeps
      // boundary-tied arrivals (legal under the in-order contract)
      // strictly ahead of the watermark. Timeouts are armed at
      // last + gap + 1ms, far above any 1 s slack effect.
      .withWatermark("ts", "1 second")
      .as[VisitEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenVisit, Visit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[OpenVisit]) =>
          if (state.hasTimedOut) {
            val o = state.get
            // keep the counter (tombstone, no timeout re-armed): the
            // user's next visit must number idx + 1
            state.update(o.copy(n = 0))
            Iterator.single(Visit(user, o.idx, o.startUs, o.lastUs, o.n))
          } else if (flushUser.contains(user)) {
            // sentinel: consume, never create state — its event time
            // already advanced the watermark at the source
            Iterator.empty
          } else {
            val sorted = it.map(e => (micros(e.ts), e.event_id))
              .toIndexedSeq.sorted
            val st = state.getOption
            var open = st.filter(_.n > 0)
            val doneIdx = st.map(_.idx).getOrElse(0L)
            val closed = Vector.newBuilder[Visit]
            sorted.foreach { case (t, _) =>
              open = open match {
                case Some(o) if t - o.lastUs <= gapMicros =>
                  // min/max keep the bounds monotonic if an arrival
                  // lands inside the watermark's 1 s slack window
                  // (in-order feeds never exercise this)
                  Some(o.copy(startUs = math.min(o.startUs, t),
                    lastUs = math.max(o.lastUs, t), n = o.n + 1))
                case Some(o) =>
                  closed += Visit(user, o.idx, o.startUs, o.lastUs, o.n)
                  Some(OpenVisit(t, t, 1, o.idx + 1))
                case None =>
                  // doneIdx > 0 when a timeout already closed earlier
                  // visits — numbering continues, never restarts
                  Some(OpenVisit(t, t, 1, doneIdx + 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              // timeouts clear on every invocation — re-arm at
              // last + gap (+1 ms: the timeout clock is ms-grained,
              // floor alone could fire one µs-fraction early)
              state.setTimeoutTimestamp(
                math.floorDiv(o.lastUs, 1000L) + gapMs + 1L)
            }
            closed.result().iterator
          }
      }
  }

  /** One incoming event for [[funnelStatefulStream]]. */
  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      et: String)
  /** Keyed funnel state: per step, the greedy-earliest completion time
    * `t` (epoch-µs; Long.MinValue = unset) and the LAST seen event
    * time `last` (the equal-timestamp rescue — see the fold). One row
    * of 2k longs per user ever seen in the funnel's event types. */
  final case class FunnelState(t: Seq[Long], last: Seq[Long])
  /** One COMPLETED funnel: emitted exactly once, when the final step's
    * time sets. Bounds are exact epoch-µs (the x8/x12 precision
    * contract). */
  final case class Completion(user_id: Long, t1_us: Long, tk_us: Long)

  /** Ordered-funnel completion under STREAMING arrival — the stateful
    * face of [[graft.operators.Funnel.earliestCompletion]] (x12's
    * substrate), semantics-identical over in-order feeds so the
    * accumulated completions reproduce the batch operator's completed
    * set exactly (and x12's oracle applies verbatim once the k3 rank
    * selection runs over them — the s13 gate).
    *
    * Mechanics: `flatMapGroupsWithState`, NO timeout — a funnel
    * completes on an EVENT (the final step arriving), never on
    * idleness, so nothing needs flushing and no sentinel exists.
    * Greedy-earliest is prefix-monotone (a set tᵢ never changes), so
    * the in-order fold sets each step's time at its first qualifying
    * arrival and emits the Completion when step k sets. Within a batch
    * the fold sorts by (ts, step index) so a same-timestamp chain
    * (view,click,purchase all at t) completes in one pass; ACROSS
    * batches the same tie needs the `last` maxima: a step-j event at
    * ts v that arrived BEFORE step j−1 was set can only qualify if
    * t_{j−1} later sets to exactly v (in-order arrival bounds the
    * eventual t_{j−1} ≥ its ts), so when a step sets at v the fold
    * cascades through later steps whose last-seen time equals v.
    *
    * In-order contract as [[sessionizeStatefulStream]]: non-decreasing
    * event time per user across micro-batches. State is one 2k-long
    * row per participating user; completed users keep a tombstone-like
    * final state so a completion can never re-emit.
    *
    * `stateTtlUs` (default None = NoTimeout, state retained forever —
    * exact, but unbounded on a continuous feed): when set, the input
    * gains an EVENT-TIME watermark delayed by TTL (+1 s slack) and
    * state is evicted the moment the watermark passes its last
    * activity (EventTimeTimeout — NOT a processing-time timeout, whose
    * always-run-another-batch contract busy-loops the no-data engine;
    * measured in EventsStreamSpec's first TTL attempt). The watermark
    * delay EQUALS the TTL so the engine's late-data drop boundary
    * coincides with eviction: an event arriving more than TTL behind
    * the stream's max event time belongs (by the per-user in-order
    * contract) to a user whose state the TTL already evicted — the
    * drop and the eviction are the same retention decision, not two.
    * The in-order contract is per USER; cross-user skew within the TTL
    * is untouched. Documented caveats at the retention boundary, the
    * price of bounding state: (1) a STALLED funnel loses its
    * progress — steps arriving after eviction restart from empty (or,
    * if older than the boundary, are dropped as late), so a completion
    * whose steps straddle an idle gap longer than the TTL is missed;
    * (2) a COMPLETED user's tombstone is evicted too, so a duplicated/
    * replayed final-step event arriving after eviction would re-emit
    * the completion — exactly-once holds only within the retention
    * window. Size the TTL well above the funnel's expected end-to-end
    * latency, the feed's cross-user event-time skew, and the source's
    * replay horizon. */
  def funnelStatefulStream(spark: SparkSession, events: DataFrame,
      steps: Seq[String],
      stateTtlUs: Option[Long] = None): Dataset[Completion] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(steps.distinct.size == steps.size,
      s"repeated step types are ambiguous: $steps")
    require(stateTtlUs.forall(_ > 0L),
      s"stateTtlUs must be positive when set: $stateTtlUs")
    import spark.implicits._
    val k = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    val Unset = Long.MinValue
    val timeoutConf =
      if (stateTtlUs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val base = events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_type").cast("string").as("et"))
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("et").isin(steps.map(x => x: Any): _*))
    // the watermark exists ONLY to drive TTL eviction — the NoTimeout
    // path keeps its exact plan (and drops no late rows). Delay = TTL
    // (+1 s slack): the late-drop boundary IS the eviction boundary
    val fed = stateTtlUs.fold(base)(ttl =>
      base.withWatermark("ts",
        s"${math.floorDiv(ttl, 1000L) + 1000L} milliseconds"))
    fed
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Completion](
        OutputMode.Append(), timeoutConf) {
        case (user, it, state: GroupState[FunnelState]) =>
          // re-arm on every data invocation (timeouts clear each call):
          // the TTL already lives in the watermark's delay, so the
          // timeout fires as soon as the watermark passes the user's
          // last activity; the max() guard keeps the armed instant
          // strictly ahead of the current watermark (Spark rejects
          // timestamps at or behind it)
          def arm(maxSeenUs: Long): Unit = stateTtlUs.foreach { _ =>
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1L,
                math.floorDiv(maxSeenUs, 1000L) + 1L))
          }
          if (state.hasTimedOut) {
            // TTL eviction: stalled progress and completed tombstones
            // alike (the documented retention-boundary caveats)
            state.remove()
            Iterator.empty
          } else {
          val st0 = state.getOption.getOrElse(
            FunnelState(Seq.fill(k)(Unset), Seq.fill(k)(Unset)))
          val wasComplete = st0.t(k - 1) != Unset
          if (wasComplete) {
            // a tombstone that keeps seeing events keeps living
            if (stateTtlUs.isDefined)
              arm(it.map(e => micros(e.ts)).max)
            Iterator.empty
          }
          else {
            val t = st0.t.toArray
            val last = st0.last.toArray
            // (ts, step) sort: a same-ts chain advances in step order
            val sorted = it.map(e => (micros(e.ts), stepIdx(e.et)))
              .toIndexedSeq.sorted
            def cascade(j: Int, v: Long): Unit = {
              var i = j + 1
              while (i < k && t(i) == Unset && last(i) == v) {
                t(i) = v; i += 1
              }
            }
            sorted.foreach { case (ts, j) =>
              if (t(k - 1) == Unset) {
                last(j) = ts // in-order: ts is the max seen for step j
                if (j == 0) {
                  if (t(0) == Unset) { t(0) = ts; cascade(0, ts) }
                } else if (t(j) == Unset && t(j - 1) != Unset &&
                    ts >= t(j - 1)) {
                  t(j) = ts; cascade(j, ts)
                }
              }
            }
            state.update(FunnelState(t.toIndexedSeq, last.toIndexedSeq))
            if (sorted.nonEmpty) arm(sorted.last._1)
            if (t(k - 1) != Unset)
              Iterator.single(Completion(user, t(0), t(k - 1)))
            else Iterator.empty
          }
          }
      }
  }

  def sessionizeWithState(spark: SparkSession, events: DataFrame,
      gapMillis: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout()): Dataset[SessionAgg] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("value").cast("double"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionAgg](
        OutputMode.Append(), timeout) {
        case (user, it, state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil).map(s =>
              SessionAgg(user, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.end), s.n, s.total))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption.getOrElse(Nil)
            var closed = List.empty[SessionState]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                // strict `< gap` aligns with session_window (windows
                // [t, t+gap) merge only when they overlap); min/max keep
                // the bounds monotonic when a cross-batch late event
                // lands inside or before the open session
                case s :: rest if t < s.end + gapMillis =>
                  open = s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t),
                    n = s.n + 1, total = s.total + e.value) :: rest
                case s :: rest =>
                  closed = s :: closed
                  open = SessionState(t, t, 1, e.value) :: rest
                case Nil =>
                  open = List(SessionState(t, t, 1, e.value))
              }
            }
            state.update(open)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
              state.setTimeoutDuration(gapMillis * 2)
            closed.reverseIterator.map(s =>
              SessionAgg(user, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.end), s.n, s.total))
          }
      }
  }
}
