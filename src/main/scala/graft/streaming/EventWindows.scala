package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Windowed event analytics — batch and Structured Streaming forms of
  * the same aggregations (an extension beyond the reference, whose
  * "streaming" is bounded incremental pull — SURVEY B37).
  */
object EventWindows {

  /** Parity-harness runner shared by every streaming entry point in
    * this package: AvailableNow over the finite parquet fixture into
    * a named in-memory sink. The memory sink collects output on the
    * DRIVER — it exists so the batch==streaming specs can read the
    * result as a table, and it is NOT the deployment shape. The
    * deployable piece is the transform itself: a real pipeline
    * applies the same transform to `readStream` and writes to a
    * durable sink (parquet/kafka/foreachBatch) with a production
    * trigger.
    */
  private[streaming] def runToMemory(df: org.apache.spark.sql.DataFrame,
      queryName: String, mode: String,
      availableNow: Boolean = true): StreamingQuery = {
    val w = df.writeStream.outputMode(mode)
      .format("memory").queryName(queryName)
    // AvailableNow drains the files present at START and terminates —
    // right for the one-shot parity harnesses. The multi-phase
    // eviction specs instead write files WHILE the query runs (with
    // `processAllAvailable()` barriers between phases — the only
    // arrival-order control that doesn't lean on file mod-time
    // ordering), which needs the continuous micro-batch trigger.
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Tumbling 1-hour counts per event_type (batch form). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding 2-hour windows advancing hourly. */
  def slidingTwoHour(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "2 hours", "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sessionization: per-user sessions split on gaps > 30 minutes,
    * expressed with lag + running sum (batch form; the streaming form
    * would use flatMapGroupsWithState).
    */
  def userSessions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order by the millisecond epoch (not raw ts): the oracle computes
    // in ms, and ordering must agree where sub-ms timestamps tie
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val withGap = events
      .withColumn("ms", expr("unix_micros(ts) DIV 1000"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull
          || col("ms") - col("prev_ms") > 30L * 60 * 1000, 1).otherwise(0))
    withGap
      .withColumn("session_ix", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_ix"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  /** Per-user session accumulator for the stateful streaming path. */
  final case class SessionAgg(nSessions: Long, lastMs: Long,
      curEvents: Long, maxEvents: Long)

  /** Stateful streaming sessionization via `mapGroupsWithState`: state
    * (open-session tail) survives across micro-batches, so sessions
    * spanning batch boundaries are counted once — the custom-state
    * shape the reference has no analog for (its execution is bounded).
    * Events inside one micro-batch are sorted per user; state holds
    * only the session tail, not the events.
    *
    * Ordering contract: batches must arrive in per-user event-time
    * order (within-batch disorder is sorted here, but an entire LATE
    * batch would move the session tail backwards and split sessions).
    * File sources with time-ordered file arrival satisfy this; for a
    * heavily out-of-order source, prefer
    * [[streamingSessionWindows]] — a `session_window` aggregation
    * with a watermark, which buys reordering tolerance at the cost of
    * windowed state.
    * Both emitted columns are monotone nondecreasing, so when
    * execution splits into multiple batches (update mode emits one
    * row per user per batch), consumers fold with `max` per user —
    * the same contract [[streamingFunnelFirsts]] documents with
    * `min`.
    */
  def streamingUserSessions(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      gapMs: Long = 30L * 60 * 1000): StreamingQuery = {
    import spark.implicits._

    def update(userId: Long, rows: Iterator[(Long, Long, Long)],
        state: GroupState[SessionAgg]): (Long, Long, Long) = {
      var st = state.getOption.getOrElse(SessionAgg(0L, Long.MinValue, 0L, 0L))
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ms, _) =>
        st = if (st.lastMs == Long.MinValue || ms - st.lastMs > gapMs)
          SessionAgg(st.nSessions + 1, ms, 1L, math.max(st.maxEvents, 1L))
        else
          SessionAgg(st.nSessions, ms, st.curEvents + 1,
            math.max(st.maxEvents, st.curEvents + 1))
      }
      state.update(st)
      (userId, st.nSessions, st.maxEvents)
    }

    runToMemory(
      spark.readStream.schema(schema).parquet(dir)
        .selectExpr("user_id", "unix_micros(ts) DIV 1000 AS ms", "event_id")
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
        .toDF("user_id", "n_sessions", "max_session_events"),
      queryName, "update")
  }

  /** Watermark-tolerant sessionization via Spark's built-in
    * `session_window`: events whose windows overlap merge into one
    * session, and the watermark bounds how late an event may arrive
    * and still merge — the escape hatch [[streamingUserSessions]]'s
    * ordering contract points to for sources that cannot guarantee
    * per-user batch arrival order. State is per-open-session (not
    * per-user-tail), evicted once the watermark passes a session's
    * end.
    *
    * Emits one row per (user_id, session) with the session's event
    * count; the per-user summary ([[userSessions]]'s columns) is one
    * aggregation over it — kept OUT of this query because stacking a
    * second streaming aggregation on a session window needs
    * `foreachBatch` in real deployments; the spec (and a deployment)
    * folds the sink instead.
    *
    * Output-mode notes: Spark does not support `update` mode for
    * session windows. `"append"` (real-unbounded shape) emits only
    * watermark-closed sessions and evicts their state; `"complete"`
    * (default here, the bounded parity shape — same convention as
    * [[streamingTumblingHourly]]) re-emits all sessions so a finite
    * fixture's trailing sessions (which no watermark ever closes)
    * are visible to the parity check. The append contract — a closed
    * session is emitted EXACTLY once, in the first batch whose
    * watermark passes its end, and never-closed trailing sessions
    * are withheld — is pinned by its own multi-batch spec
    * (`maxFilesPerTrigger` forces the batch boundaries, exactly like
    * [[streamingFunnelFirsts]]).
    *
    * Boundary convention: a gap of EXACTLY `gap` splits here (windows
    * merge on overlap, i.e. strictly-less-than) but merges in the
    * batch form (strictly-greater-than split) — divergence is
    * confined to events landing on the gap boundary at timestamp
    * precision, which real corpora don't produce (the parity spec
    * runs on the fixture and holds exactly).
    */
  def streamingSessionWindows(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      gap: String = "30 minutes", watermark: String = "2 hours",
      outputMode: String = "complete",
      maxFilesPerTrigger: Int = 0,
      availableNow: Boolean = true): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val tuned = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    runToMemory(
      tuned.parquet(dir)
        .withWatermark("ts", watermark)
        .groupBy(col("user_id"),
          session_window(col("ts"), gap).as("session"))
        .agg(count(lit(1)).as("n_events")),
      queryName, outputMode, availableNow)
  }

  /** View→click attribution pairing (batch form): every (view, click)
    * pair of the same user where the click lands within
    * `maxLagMinutes` of the view — the time-bounded event-correlation
    * join behind attribution, conversion-lag, and causal-window
    * analyses. Inclusive on both bounds; `lag_us` is the exact
    * integer microsecond lag (both engines compute it from the stored
    * micros, no float).
    *
    * Shape: an equi-join on user_id with the time bound as a pushed
    * residual predicate — a standard shuffle hash join whose bytes are
    * the two filtered event streams, never a cartesian; at 100 TB
    * both sides partition by user_id and the residual prunes
    * in-partition. The streaming form is
    * [[streamingViewClickPairs]] — same pairs, incremental.
    */
  def viewClickPairs(events: DataFrame, maxLagMinutes: Int = 30): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    views.join(clicks, Seq("user_id"))
      .filter(col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") +
          expr(s"INTERVAL $maxLagMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  /** LEFT-OUTER form of [[viewClickPairs]]: every view appears, with
    * null click columns when no click landed inside the lag window —
    * the ABANDONMENT stream (the unconverted views are usually the
    * rows the analysis wants). The time bound lives in the JOIN
    * condition, not a post-filter — a left join with a WHERE on the
    * right side would silently turn inner. Null sort keys are pinned
    * with coalesce(click_id, -1): Spark orders nulls first ASC,
    * DuckDB last, and the oracle must not depend on that dialect
    * choice.
    */
  def viewClickPairsOuter(events: DataFrame,
      maxLagMinutes: Int = 30): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    views.join(clicks,
        col("user_id") === col("c_user_id") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") +
            expr(s"INTERVAL $maxLagMinutes MINUTES"),
        "left_outer")
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
      .orderBy(col("user_id"), col("view_id"),
        coalesce(col("click_id"), lit(-1L)))
  }

  /** Stream-stream LEFT-OUTER interval join — [[viewClickPairsOuter]]
    * incremental: matched pairs emit when both sides arrive; an
    * UNMATCHED view emits (null click columns) only once the
    * watermark proves no in-lag click can still arrive — exactly-once
    * for both row kinds, pinned by the multi-phase spec. Same
    * watermark/state-retention machinery as the inner form.
    */
  def streamingViewClickPairsOuter(spark: SparkSession, dir: String,
      schema: StructType, queryName: String, maxLagMinutes: Int = 30,
      watermark: String = "2 hours",
      availableNow: Boolean = true): StreamingQuery = {
    def side(eventType: String, idAs: String, tsAs: String,
        userAs: String) =
      spark.readStream.schema(schema).parquet(dir)
        .filter(col("event_type") === eventType)
        .select(col("user_id").as(userAs), col("event_id").as(idAs),
          col("ts").as(tsAs))
        .withWatermark(tsAs, watermark)
    val views = side("view", "view_id", "view_ts", "user_id")
    val clicks = side("click", "click_id", "click_ts", "c_user_id")
    runToMemory(
      views.join(clicks,
          expr(s"""user_id = c_user_id AND
            click_ts >= view_ts AND
            click_ts <= view_ts + interval $maxLagMinutes minutes"""),
          "left_outer")
        .select(col("user_id"), col("view_id"), col("click_id"),
          (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
            .as("lag_us")),
      queryName, "append", availableNow)
  }

  /** Stream-stream interval join — [[viewClickPairs]] incremental:
    * both sides carry watermarks, and the time-bound condition lets
    * Spark derive the state retention window (a view older than the
    * click watermark minus the lag bound can never match again and
    * its state is evicted; same for clicks) — the bounded-state
    * contract that makes a stream-stream inner join runnable forever.
    * Append mode is the only supported output mode for stream-stream
    * joins; each pair is emitted exactly once, when both sides have
    * arrived. The parity spec pins streamed == batch on the fixture;
    * the multi-phase spec pins cross-batch pairing (a click arriving
    * batches after its view still pairs).
    */
  def streamingViewClickPairs(spark: SparkSession, dir: String,
      schema: StructType, queryName: String, maxLagMinutes: Int = 30,
      watermark: String = "2 hours",
      availableNow: Boolean = true): StreamingQuery = {
    def side(eventType: String, idAs: String, tsAs: String,
        userAs: String) =
      spark.readStream.schema(schema).parquet(dir)
        .filter(col("event_type") === eventType)
        .select(col("user_id").as(userAs), col("event_id").as(idAs),
          col("ts").as(tsAs))
        .withWatermark(tsAs, watermark)
    val views = side("view", "view_id", "view_ts", "user_id")
    val clicks = side("click", "click_id", "click_ts", "c_user_id")
    runToMemory(
      views.join(clicks,
          expr(s"""user_id = c_user_id AND
            click_ts >= view_ts AND
            click_ts <= view_ts + interval $maxLagMinutes minutes"""))
        .select(col("user_id"), col("view_id"), col("click_id"),
          (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
            .as("lag_us")),
      queryName, "append", availableNow)
  }

  /** Per-user firsts for the funnel's stateful streaming form:
    * epoch-micros of the first view/click/purchase, `Long.MaxValue`
    * = not seen yet.
    */
  final case class FunnelFirsts(tView: Long, tClick: Long, tPurchase: Long)

  /** Stateful streaming form of the event funnel's per-user stage:
    * state is three epoch-micros (the first view/click/purchase seen
    * so far) — O(1) per user, never the events — and each micro-batch
    * emits the user's updated firsts. The firsts only ever decrease,
    * so a downstream consumer (or the spec) can fold emissions with
    * `min` and land on exactly the batch answer; the funnel counts
    * are then one aggregation over the per-user firsts.
    * `maxFilesPerTrigger > 0` forces multi-batch execution so tests
    * exercise state surviving batch boundaries.
    */
  def streamingFunnelFirsts(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    import spark.implicits._

    def update(userId: Long, rows: Iterator[(Long, String, Long)],
        state: GroupState[FunnelFirsts]): (Long, Long, Long, Long) = {
      var st = state.getOption.getOrElse(
        FunnelFirsts(Long.MaxValue, Long.MaxValue, Long.MaxValue))
      rows.foreach { case (_, eventType, us) =>
        eventType match {
          case "view"     => if (us < st.tView) st = st.copy(tView = us)
          case "click"    => if (us < st.tClick) st = st.copy(tClick = us)
          case "purchase" => if (us < st.tPurchase) st = st.copy(tPurchase = us)
          case _          => ()
        }
      }
      state.update(st)
      (userId, st.tView, st.tClick, st.tPurchase)
    }

    val reader = spark.readStream.schema(schema)
    val tuned = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    runToMemory(
      tuned.parquet(dir)
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
        .as[(Long, String, Long)]
        .groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
        .toDF("user_id", "t_view_us", "t_click_us", "t_purchase_us"),
      queryName, "update")
  }

  /** Per-user retention state: first-event epoch day, the set of
    * active epoch days, and a monotone update counter.
    */
  final case class RetentionState(cohortDay: Long, days: Set[Long],
      version: Long)

  /** Stateful streaming form of the retention-cohort query
    * (`x_events_retention`): state per user is its cohort day + the
    * set of active days (bounded by the stream's day span, not its
    * event count) and each micro-batch emits the user's FULL current
    * (cohort_day, day_offset) snapshot stamped with a monotone
    * `version`. Snapshot-plus-version makes the fold order-tolerant
    * where the funnel's min-fold relies on monotone firsts: a LATE
    * batch carrying an earlier first event rewrites the cohort and
    * every offset, and consumers simply keep each user's
    * max-`version` rows — `SELECT … WHERE (user_id, version) IN
    * (max per user)` — then aggregate distinct users per
    * (cohort_day, day_offset). The spec pins equality with the batch
    * query across forced multi-batch execution.
    */
  def streamingRetention(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode

    val MsPerDay = 86400000L
    def update(userId: Long, rows: Iterator[(Long, Long)],
        state: GroupState[RetentionState])
        : Iterator[(Long, Long, java.sql.Date, Int)] = {
      var st = state.getOption.getOrElse(
        RetentionState(Long.MaxValue, Set.empty, 0L))
      rows.foreach { case (_, ms) =>
        val day = ms / MsPerDay // events are post-epoch; floor division
        st = RetentionState(math.min(st.cohortDay, day), st.days + day,
          st.version)
      }
      st = st.copy(version = st.version + 1)
      state.update(st)
      st.days.iterator.map(d => (userId, st.version,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(st.cohortDay)),
        (d - st.cohortDay).toInt))
    }

    val reader = spark.readStream.schema(schema)
    val tuned = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    runToMemory(
      tuned.parquet(dir)
        .selectExpr("user_id", "unix_micros(ts) DIV 1000 AS ms")
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(update)
        .toDF("user_id", "version", "cohort_day", "day_offset"),
      queryName, "update")
  }

  /** Structured Streaming form of [[tumblingHourly]], parameterized on
    * output mode because the watermark's role differs:
    * - `"append"` — the real-unbounded-source shape: the 2-hour
    *   watermark FINALIZES and EVICTS windows, so aggregation state
    *   stays bounded and only closed windows emit.
    * - `"complete"` (default, what the bounded parity check uses) —
    *   every window re-emits each batch and the watermark does NOT
    *   evict state; correct for a finite fixture compared against the
    *   batch form, but state grows with the window count on a real
    *   stream — use append there.
    */
  def streamingTumblingHourly(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      outputMode: String = "complete",
      maxFilesPerTrigger: Int = 0,
      availableNow: Boolean = true): StreamingQuery =
    runToMemory(tumblingStream(spark, dir, schema, maxFilesPerTrigger),
      queryName, outputMode, availableNow)

  /** The watermarked tumbling transform over a file stream, UNSUNK —
    * the deployable piece: the parity harness memory-sinks it
    * ([[streamingTumblingHourly]]); a durable deployment attaches
    * `foreachBatch` feeding the writer stack's idempotent MERGE
    * (update-mode re-emissions of a refined window UPDATE the same
    * PK row, so at-least-once delivery × idempotent sink =
    * effectively-once — the live-PG streaming spec pins that
    * composition end-to-end).
    */
  private[graft] def tumblingStream(spark: SparkSession, dir: String,
      schema: StructType, maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream.schema(schema)
    val tuned = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    tuned.parquet(dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // same aggregates as the batch form — the parity contract is
      // the full row, not just the count
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
  }

  /** Structured Streaming form of [[slidingTwoHour]] — same watermark
    * semantics as [[streamingTumblingHourly]]; a sliding window just
    * assigns each event to windowDuration/slideDuration overlapping
    * windows, so state per key is that factor larger and the
    * append-mode eviction contract matters sooner on a real stream.
    */
  def streamingSlidingTwoHour(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      outputMode: String = "complete"): StreamingQuery =
    runToMemory(
      spark.readStream.schema(schema).parquet(dir)
        .withWatermark("ts", "4 hours")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      queryName, outputMode)
}
