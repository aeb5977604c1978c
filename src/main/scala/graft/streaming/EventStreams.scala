package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming jobs over the `events` table (SURVEY.md §2).
  *
  * The reference's streaming story was batch jobs re-run on new HDFS
  * files; Structured Streaming's file source is the same model made
  * incremental — each new file becomes a micro-batch, with watermarks
  * bounding state instead of full recomputation. The batch twins
  * (Relational.q19EventWindows / q21Sessionize) share the
  * aggregation logic, which is how the oracle covers them.
  */
object EventStreams {

  /** File-source stream over the events parquet, ts normalized to the
    * instant-bearing type by the SAME schema switch as the batch
    * loader (Tables.normalizeEventTs) — a stream source needs an
    * explicit schema, so the on-disk encoding is probed with a
    * footer-only batch read first and the stream schema mirrors it.
    * (Round-9 regression: this reader hard-coded the nanos-as-long
    * encoding while the batch side adapted; when the testdata flipped
    * to micros NTZ every streaming timestamp shrank 1000×. The shared
    * normalizer + Tables.pinEventTimeScale make that class of flip
    * fail loudly at the source.) The file source requires a directory
    * (in production events land as files in a drop directory); a
    * single-file test input is staged behind a symlink directory. */
  def readEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = new java.io.File(s"$d/events.parquet")
    val path =
      if (src.isFile) {
        val dir = graft.sources.TempDirs.scratch("graft-events-")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("events.parquet"), src.toPath)
        dir.toString
      } else src.toString
    val onDisk = s.read.parquet(path)
    // pin keyed on the SOURCE path (not the per-call staging dir) so
    // batch and stream reads of one dataset share one memoized check
    graft.sources.Tables.pinEventTimeScale(
      graft.sources.Tables.normalizeEventTs(onDisk), s"$d/events.parquet")
    graft.sources.Tables.normalizeEventTs(
      s.readStream.schema(onDisk.schema).parquet(path))
  }

  /** Tumbling 1-hour event-time windows with a 1-hour watermark —
    * the streaming twin of q19_event_windows. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"), col("value_cents"))

  /** Stream-stream interval join: purchases joined to the same user's
    * clicks within the preceding hour. Both sides carry watermarks so
    * the join state is bounded (the engine drops buffered rows older
    * than watermark + interval) — the property that keeps this runnable
    * forever at production volume. */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** Stream-stream LEFT OUTER interval join — the attribution shape
    * the inner join cannot answer: purchases with NO preceding click
    * in the window surface with a null click_id. Matches emit
    * eagerly (same as the inner join); an UNMATCHED purchase is held
    * in the state store until the watermark proves no qualifying
    * click can still arrive (watermark past its interval bound),
    * then emits once with nulls — so the null rows are exactly the
    * "organic purchase" set, produced incrementally and exactly
    * once. The dual watermarks bound both buffers; state size is the
    * in-horizon row count, same as the inner form. */
  def purchaseClickJoinOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"), "left_outer")
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"))
  }

  /** Stream-stream FULL OUTER interval join — the CDC-reconciliation
    * shape: BOTH unmatched sides surface, so one query yields the
    * attribution matches, the organic purchases (null click_id) AND
    * the unconverted clicks (null purchase_id). Same bounded
    * dual-watermark state as the left form — each side's buffer is
    * its in-horizon rows; an unmatched row (either side) is held
    * until the watermark proves no partner can still arrive, then
    * emits once with nulls, exactly once. `user_id` coalesces across
    * the sides because either may be null in the outer rows. */
  def purchaseClickJoinFull(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"), "full_outer")
      .select(col("purchase_id"), col("click_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"))
  }

  /** Stream-STATIC enrichment join — the most common production
    * streaming shape (more common than stream-stream): each
    * micro-batch of the event stream is joined to a slowly-changing
    * static dimension (customer segment). The static side is a plain
    * batch DataFrame: Spark RE-PLANS it every micro-batch (so a
    * dimension refresh is picked up on the next batch without a
    * restart) and broadcasts it when small. The join is STATELESS —
    * no watermark, no state store, nothing to expire — which is why
    * this shape runs forever at production volume while a
    * stream-stream join needs dual watermarks to bound state. Batch
    * twin: the identical join on the batch events frame (spec-proved
    * equal). */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("segment"), lit("(none)")).as("segment"))

  // ts stays in the Dataset (not just ts_us) because the event-time
  // watermark rides on that column's metadata; projecting it away
  // would disable EventTimeTimeout
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Stateful sessionization via flatMapGroupsWithState: 30-min-gap
    * sessions per user. State is one (lastTs, counts) pair per user
    * AND it is expired: each update arms an event-time timeout at
    * lastTs + gap, so once the watermark passes a user's last event
    * plus one session gap the state is removed — total state is
    * bounded by the number of users active inside the watermark
    * horizon, not by all users ever seen.
    *
    * Emission semantics (documented contract): one cumulative
    * snapshot row per user per micro-batch in which that user had
    * events — upsert semantics, consumers keep the latest row per
    * user_id (exactly what the memory-sink spec does via toMap).
    * Events arriving out of order ACROSS micro-batches (within the
    * watermark) can split one true session into two — the standard
    * incremental-sessionization approximation; events later than the
    * watermark restart a fresh session if the old state already
    * expired. Batch twin: q21_sessionize. */
  /** Native session-window aggregation — the DECLARATIVE form of
    * [[sessionize]]: Spark's built-in `session_window` merges events
    * closer than the gap into [first, last+gap) sessions with state
    * the ENGINE manages (watermark-evicted, RocksDB-capable), where
    * the flatMapGroupsWithState form hand-rolls the same lifecycle.
    * Per-session grain (bounds + counts + revenue) vs [[sessionize]]'s
    * per-user running totals — the two cover both session outputs a
    * pipeline wants. Semantics note vs the lag-gap family
    * (q21/adv_session_revenue): session windows are half-open, so a
    * successor exactly gap later starts a NEW session (diff >= gap),
    * while lag-gap's `diff > gap` would keep it — the spec pins
    * batch parity through the >= formulation. The SAME code runs
    * batch and stream (session_window aggregates in batch since
    * Spark 3.2), which is what makes the streaming result testable
    * against its batch twin row-for-row. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("value_cents"))

  def sessionize(events: DataFrame): Dataset[UserSessions] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), UserSessions](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[SessionEvent],
         state: GroupState[(Long, Long, Long)]) =>
          val gapUs = 1800000000L
          val gapMs = gapUs / 1000L
          if (state.hasTimedOut) {
            // idle for a full session gap past the watermark: the last
            // emitted snapshot already carried this user's final totals
            state.remove()
            Iterator.empty
          } else {
            val (prevLast, prevEvents, prevSessions) =
              state.getOption.getOrElse((Long.MinValue, 0L, 0L))
            var last = prevLast
            var nEvents = prevEvents
            var nSessions = prevSessions
            it.toSeq.sortBy(_.ts_us).foreach { e =>
              if (last == Long.MinValue || e.ts_us - last > gapUs) nSessions += 1
              last = e.ts_us
              nEvents += 1
            }
            state.update((last, nEvents, nSessions))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, last / 1000L + gapMs))
            Iterator(UserSessions(user, nEvents, nSessions))
          }
      }
  }

  case class SessionState(last_us: Long, n_events: Long, n_sessions: Long)

  /** The [[sessionize]] lifecycle on `transformWithState` — Spark 4's
    * arbitrary-state API and the designated successor to
    * flatMapGroupsWithState: state lives in NAMED, typed slots the
    * store schema-tracks (so state layout can evolve across restarts),
    * timers are engine-owned objects instead of a single hand-set
    * timeout timestamp, and each slot carries its own TTL policy. Same
    * per-user fold as [[sessionize]]; requires the RocksDB state
    * store provider (the API is implemented only there — which is
    * also the production backend). Emission: one cumulative snapshot
    * per user per micro-batch, upsert semantics (Update mode).
    *
    * RESET-ON-RETURN caveat (the price of horizon-bounded state): a
    * user idle past watermark + gap has their state dropped by the
    * timer, so if they RETURN the fold restarts from zero and the
    * next snapshot REGRESSES that user's cumulative totals under
    * upsert semantics — "cumulative" here means within a state
    * lifetime, not forever. This is the deliberate trade every
    * bounded-state sessionizer makes (keeping all users ever seen is
    * exactly the unbounded-state failure the timer exists to
    * prevent); a consumer needing true lifetime totals folds the
    * per-lifetime snapshots downstream (sum on expire-then-return,
    * e.g. max-per-epoch + sum), it does not widen the stream's
    * horizon. Spec-pinned: an expired user's return restarts at the
    * new events' counts. */
  private class SessionCounter
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SessionEvent, UserSessions] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[SessionState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserSessions] = {
      val gapUs = 1800000000L
      val prev =
        if (state.exists()) state.get()
        else SessionState(Long.MinValue, 0L, 0L)
      var last = prev.last_us
      var nEvents = prev.n_events
      var nSessions = prev.n_sessions
      rows.toSeq.sortBy(_.ts_us).foreach { e =>
        if (last == Long.MinValue || e.ts_us - last > gapUs) nSessions += 1
        last = e.ts_us
        nEvents += 1
      }
      state.update(SessionState(last, nEvents, nSessions))
      // ENGINE-owned expiry, the flatMapGroupsWithState twin's
      // bounded-state property on the new API: once the watermark
      // passes this user's last event plus one session gap the timer
      // fires and the state is dropped — total state tracks users
      // active inside the watermark horizon, never all users ever
      // seen. Timers are a keyed SET here, so the superseded timer
      // from the previous batch is deleted, not accumulated.
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(last / 1000L + gapUs / 1000L)
      Iterator(UserSessions(user, nEvents, nSessions))
    }
    override def handleExpiredTimer(user: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[UserSessions] = {
      // the last emitted snapshot carried this user's final totals
      // FOR THIS STATE LIFETIME (Update-mode upsert semantics) — drop
      // the state. If the user returns later, the fold restarts from
      // zero and the next snapshot supersedes this one (the
      // reset-on-return caveat in the class doc).
      state.clear()
      Iterator.empty
    }
  }

  def sessionizeTws(events: DataFrame): Dataset[UserSessions] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionCounter,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update())
  }
}
