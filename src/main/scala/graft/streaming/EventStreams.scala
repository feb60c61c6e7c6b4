package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table (SURVEY.md §2.10
  * extension surface — the reference is batch-only, its "incremental" loads
  * are MERGE diffing; this is the streaming path the bronze `Source` trait
  * was designed to accept).
  *
  * Every transform here is expressed once and runs identically over a
  * `readStream` or a batch `read` DataFrame — the streaming specs exploit
  * that by asserting stream output == batch output on the same files.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 minutes is dropped, state for closed windows is
  * evicted); sessionization state is per-key and evicted on event-time
  * timeout — both are the standard shapes that keep state stores bounded on
  * unbounded inputs.
  */
object EventStreams {

  /** The testdata stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * only reads via `spark.sql.legacy.parquet.nanosAsLong` (set in our
    * session builders) — so `ts` arrives as a nanosecond LONG and is
    * converted here with exact integer division (double math would lose
    * precision above 2^53 ns). Timestamp-typed inputs pass through. */
  def normalizeTs(df: DataFrame): DataFrame =
    if (df.schema.fieldNames.contains("ts") &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df.withColumn("ts", col("ts").cast("timestamp"))

  /** File-source streaming read of the events table (parquet), resolving
    * BOTH physical layouts: a single file named `events.parquet` (the
    * generated testdata) streams via a glob filter inside `dir` (the
    * file source's basePath must be a directory, so the file path can't
    * be passed directly), while a directory of part-files under
    * `events.parquet/` (anything Spark itself wrote, e.g. the 10x
    * smoke's scaled inputs) streams as the directory itself — there the
    * glob filter on the table name would match zero part-files and
    * silently stream nothing. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val table = s"$dir/events.parquet"
    val schema = spark.read.parquet(table).schema
    val p = new org.apache.hadoop.fs.Path(table)
    val isDir = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).isDirectory
    if (isDir) spark.readStream.schema(schema).parquet(table)
    else spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  /** Tumbling 10-minute counts/sums per event type with a 10-minute
    * watermark. */
  def tumblingAgg(events: DataFrame): DataFrame =
    normalizeTs(events)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 6).cast("double").as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 10-minute windows every 5 minutes. */
  def slidingAgg(events: DataFrame): DataFrame =
    normalizeTs(events)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("win_start"), col("n_events"))

  /** Stream-static dimension enrichment: events join a STATIC dimension
    * frame (e.g. a store-table read — the static side is re-planned per
    * micro-batch in streaming) on `user_id`, then tumbling 1-hour
    * counts/sums per (window, segment). The standard streaming-medallion
    * shape: facts stream, dimensions sit in the lakehouse. LEFT join —
    * events from unknown users survive under segment 'N/A', the
    * reference's unknown-member convention (01_Init.py:265-277, the -9
    * member's string twin). Works identically over a batch frame (oracle
    * twin x48); StreamingSpec pins stream == batch.
    *
    * The dim carries NO broadcast hint: a user-keyed "dimension" is
    * user-cardinality, which a 100 TB deployment does not bound. The
    * static side's size is known to the planner from its relation
    * statistics (file sizes for a store/parquet read) at every
    * micro-batch re-plan, so it broadcasts exactly while it fits under
    * `autoBroadcastJoinThreshold` and degrades to a shuffled join —
    * never a driver OOM — when it outgrows that. Same contract as
    * [[graft.operators.Collocations]]' vocabulary joins. */
  def enrichedTumblingAgg(events: DataFrame, dim: DataFrame): DataFrame =
    normalizeTs(events)
      .withWatermark("ts", "10 minutes")
      .join(dim.select(col("user_id"), col("segment")),
        Seq("user_id"), "left_outer")
      .withColumn("segment", coalesce(col("segment"), lit("N/A")))
      .groupBy(window(col("ts"), "60 minutes").as("win"), col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 6).cast("double").as("sum_value"))
      .select(col("win.start").as("win_start"), col("segment"),
        col("n_events"), col("sum_value"))

  /** Exactly-once-per-id stream: duplicates within the watermark horizon are
    * dropped by keyed state. `dropDuplicatesWithinWatermark` (not plain
    * `dropDuplicates`) is load-bearing: a subset that omits the
    * event-time column never evicts its dedup state — the keyed set grows
    * with lifetime-distinct ids until the state store dies, exactly the
    * unbounded-state shape the watermark exists to prevent. The
    * within-watermark variant expires an id's entry once the watermark
    * passes it, which is also the documented semantics (an id reused
    * AFTER the horizon is a new event, not a duplicate). */
  def dedupedStream(events: DataFrame): DataFrame =
    normalizeTs(events)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (attribution shape): each click pairs
    * with the same user's purchases inside [click, click+windowMinutes].
    * Watermarks on BOTH sides + the time-range conjunct bound the join
    * state — Spark evicts buffered rows once the watermark passes the
    * interval, the standard state-bounding recipe for stream-stream joins.
    * Works identically over batch DataFrames (the oracle twin x27). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val c = normalizeTs(clicks).filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val p = normalizeTs(purchases).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Timestamp, end: Timestamp, n: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Stateful sessionization: 30-minute inactivity gap closes a session;
    * event-time timeout evicts state (custom state via
    * flatMapGroupsWithState — SURVEY.md §2.10 / build brief streaming
    * surface). */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.end, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.end.getTime <= gapMs =>
                  // a within-watermark event can arrive OUT OF ORDER
                  // across batches (earlier than the session's current
                  // span): extend the span with min/max, never let the
                  // end regress below the start — a later gap test
                  // against a regressed end would split the session in
                  // the wrong place and emit end < start
                  val start =
                    if (e.ts.getTime < s.start.getTime) e.ts else s.start
                  val end = if (e.ts.getTime > s.end.getTime) e.ts else s.end
                  cur = Some(SessionState(start, end, s.n + 1))
                case Some(s) =>
                  closed ::= Session(user, s.start, s.end, s.n)
                  cur = Some(SessionState(e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end.getTime + gapMs)
            }
            closed.reverseIterator
          }
        })
  }

  final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelHit(user_id: Long, step: Long, step_name: String, ts: Timestamp)
  /** Attained step times so far (epoch millis, earliest-qualifying), in
    * step order — at most `steps.length` longs per user, NEVER the event
    * history. */
  final case class FunnelState(times: List[Long])

  /** Streaming twin of [[graft.operators.Funnel.conversion]]: per-user
    * ordered-step progress kept in `flatMapGroupsWithState`, one
    * [[FunnelHit]] emitted the moment a user attains a step. Step i
    * qualifies when its event lands strictly after step i-1's time and
    * within `windowSecs` of it — the same earliest-qualifying greedy the
    * batch operator computes, so on event-time-ordered batches the
    * emitted hits aggregate to exactly the batch funnel (asserted by
    * StreamingSpec). State is a fixed-size vector of attained step
    * times; a completed vector is its own tombstone. */
  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
      windowSecs: Long, idleTtlMs: Option[Long] = None): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    val stepArr = steps.toIndexedSeq
    val windowMs = windowSecs * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, ttlMode(idleTtlMs))(
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var times = state.getOption.map(_.times).getOrElse(Nil)
          if (times.length == stepArr.length) { ttlArm(state, idleTtlMs); Iterator.empty }
          else {
            val hits = List.newBuilder[FunnelHit]
            // event-time order inside the batch: a step time may only
            // depend on strictly earlier events
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val k = times.length // next step index
              if (k < stepArr.length && e.event_type == stepArr(k)) {
                val t = e.ts.getTime
                val qualifies = k == 0 ||
                  (t > times.last && t <= times.last + windowMs)
                if (qualifies) {
                  times = times :+ t
                  hits += FunnelHit(user, k + 1L, stepArr(k), e.ts)
                }
              }
            }
            // a completed vector stays as its own tombstone — removing it
            // would let a later event of the first step type restart the
            // funnel and double-emit
            if (times.nonEmpty) state.update(FunnelState(times))
            ttlArm(state, idleTtlMs)
            hits.result().iterator
          }
          }
        })
  }

  /** Timeout mode for the opt-in inactivity TTL on the stateful streams:
    * `None` (the default) keeps state forever — exact semantics, but
    * per-user state lives as long as the job even for users never seen
    * again, so state size tracks LIFETIME user cardinality. A TTL bounds
    * state to recently-active users at a documented semantics cost: a
    * boundary-spanning pair/path/funnel-step whose gap exceeds the TTL is
    * lost (the carried state was dropped), and for the funnel a TIMED-OUT
    * completed vector loses its tombstone — a later first-step event
    * restarts that user's funnel. The trade every production stream makes
    * (Delta/Flink idle-state retention); the specs pin both behaviors. */
  private def ttlMode(idleTtlMs: Option[Long]): GroupStateTimeout =
    if (idleTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** (Re-)arm the inactivity timeout after processing a group's batch —
    * every arrival extends the lease. */
  private def ttlArm[S](state: GroupState[S], idleTtlMs: Option[Long]): Unit =
    idleTtlMs.foreach(ms => if (state.exists) state.setTimeoutDuration(ms))

  final case class TransEvent(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String)
  final case class TransPair(user_id: Long, prev_type: String, next_type: String)
  /** The user's LAST event under the (ts, event_id) total order — one
    * fixed-size record per user, never the event history. */
  final case class TransState(lastTs: Long, lastId: Long, lastType: String)

  /** Streaming twin of [[graft.operators.Funnel.transitionMatrix]]'s pair
    * formation: per-user adjacency pairs emitted as events arrive, with
    * `flatMapGroupsWithState` carrying only the last-seen event. On
    * event-time-ordered batches the emitted pairs aggregate to exactly
    * the batch matrix (batch-boundary invariance is StreamingSpec's job —
    * the pair spanning two batches forms from the carried state). The
    * downstream count/probability aggregation is ordinary relational code
    * over the pair stream. */
  def transitionStream(events: Dataset[TransEvent],
      idleTtlMs: Option[Long] = None): Dataset[TransPair] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, ttlMode(idleTtlMs))(
        (user: Long, rows: Iterator[TransEvent], state: GroupState[TransState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = List.newBuilder[TransPair]
            var last = state.getOption
            // event-time order inside the batch (same contract as the
            // funnel: batches arrive event-time ordered)
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              last.foreach(s => out += TransPair(user, s.lastType, e.event_type))
              last = Some(TransState(e.ts.getTime, e.event_id, e.event_type))
            }
            last.foreach(state.update)
            ttlArm(state, idleTtlMs)
            out.result().iterator
          }
        })
  }

  final case class PathHit(user_id: Long, path: String)
  /** The types of the user's most recent depth−1 events in order — a
    * fixed-size window, never the event history. */
  final case class PathState(recent: List[String])

  /** Streaming twin of [[graft.operators.Funnel.topPaths]]' path
    * formation: emit each length-`depth` journey the moment its last
    * event arrives, carrying only the previous depth−1 event types as
    * state. Boundary-spanning paths form from the carried window, so on
    * event-time-ordered batches the emitted paths aggregate to exactly
    * the batch operator's counts (StreamingSpec pins it); the global
    * top-k over the path stream is ordinary relational code. */
  def pathStream(events: Dataset[TransEvent], depth: Int,
      idleTtlMs: Option[Long] = None): Dataset[PathHit] = {
    require(depth >= 2, "a path needs at least two steps")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, ttlMode(idleTtlMs))(
        (user: Long, rows: Iterator[TransEvent], state: GroupState[PathState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = List.newBuilder[PathHit]
            var recent = state.getOption.map(_.recent).getOrElse(Nil)
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              if (recent.length == depth - 1)
                out += PathHit(user, (recent :+ e.event_type).mkString(" > "))
              recent = (recent :+ e.event_type).takeRight(depth - 1)
            }
            if (recent.nonEmpty) state.update(PathState(recent))
            ttlArm(state, idleTtlMs)
            out.result().iterator
          }
        })
  }
}
