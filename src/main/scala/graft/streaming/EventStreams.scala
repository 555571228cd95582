package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

// ---------------------------------------------------------------------
// Streaming STATE case classes live at the TOP LEVEL of the package, not
// nested in the object (VERDICT r12 #2): Janino cannot resolve the
// accessors of object-nested classes in generated encoder code ("No
// applicable constructor/method found ... EventStreams$SessSt.start()"),
// so every stateful micro-batch paid a failed compile + interpreted
// (row-at-a-time) state encode/decode and flooded logs with
// CodeGenerator ERRORs. Top-level classes codegen cleanly.
// CHECKPOINT COMPATIBILITY: the hoist renames the encoder target class
// (EventStreams$SessSt -> graft.streaming.SessSt) — a query restarted
// from a pre-r13 checkpoint fails state schema validation BY DESIGN;
// restart stateful queries from a fresh checkpoint location (the r11
// ADVICE convention).
// ---------------------------------------------------------------------

/** flatMapGroupsWithState session accumulator ([[EventStreams.sessionize]]). */
final case class SessionState(start: Long, last: Long, n: Long, sum: Double)

/** Pending-interval state of [[EventStreams.sessionizeWithTimers]]. */
private[streaming] final case class SessSt(start: Long, last: Long, n: Long)

/** Per-doc verdict tally of the yield streams' stage 2. */
private[streaming] final case class BandTally(seen: Int, collided: Boolean,
                                              cross: Boolean, tsMax: Long)

/** A live minhash band claim: the OWNING doc_id plus the evidence the
  * verifier scores against (the full signature). The owner id is what
  * makes takedown possible at all — a claim that cannot name its owner
  * cannot be released by a purge of that owner.
  */
private[streaming] final case class Claim(owner: Long, s: Array[Long])

/** A live sign-LSH bucket claim: owner id + int8 codes ([[Claim]]'s
  * embedding twin).
  */
private[streaming] final case class EmbClaim(owner: Long, c: Array[Int])

/** One fingerprint presentation for [[EventStreams.streamingExactDedup]]:
  * the md5 key, the presenting doc and whether the row is a TAKEDOWN
  * (releases the claim its doc owns instead of presenting).
  */
final case class FpRow(band_key: String, ts: Timestamp, doc_id: Long,
                       retract: Boolean)

/** An admitted presentation ([[EventStreams.streamingExactDedup]]'s
  * processor output — a case class rather than a bare Long because
  * Spark 4.1's TransformWithState planning NPEs on primitive output
  * encoders; the id-only view maps off this afterward).
  */
final case class FpAdmitted(doc_id: Long, ts: Timestamp)

/** One SpaceSaving counter slot ([[EventStreams.streamingHeavyHitters]]). */
private[streaming] final case class HhSlot(item: String, cnt: Long, err: Long)

/** Per-group fixed-bin histogram state ([[EventStreams.streamingQuantiles]]). */
private[streaming] final case class QHist(counts: Array[Long], n: Long,
                                          mn: Long, mx: Long)

/** Structured Streaming slice (SURVEY.md §2.12): the reference is pure
  * batch, so these re-express its time-window aggregate (A1) over an
  * unbounded `events(ts, user_id, event_type, value, ...)` source, plus
  * the stateful sessionization a 100 TB event pipeline needs.
  *
  * All transforms take a DataFrame that may be batch OR streaming —
  * identical plans; watermarks only bind on streaming input.
  */
object EventStreams {

  /** Streaming exact dedup — the unbounded-source variant of
    * `graft.ops.Dedup.exactDedup`: drop events whose fingerprint
    * (md5 of the payload columns) was already seen within the watermark
    * horizon. `dropDuplicatesWithinWatermark` bounds the dedup state by
    * event time, which is what makes exact dedup feasible on an
    * unbounded 100 TB stream — state holds one fingerprint per distinct
    * payload per horizon, not per all time. Batch input degrades to a
    * plain dropDuplicates on the same key. The engine-managed state
    * here carries NO owner, so it cannot honor a takedown mid-horizon —
    * corpus pipelines that need the purge contract use
    * [[streamingExactDedup]] (owner-carrying claims, the
    * [[streamingMinhashDedup]] machinery at J = 1).
    */
  def streamingDedup(events: DataFrame, payloadCols: Seq[String],
                     watermark: String = "1 hour"): DataFrame = {
    val keyed = events.withColumn("__fp",
      md5(concat_ws("", payloadCols.map(col): _*)))
    if (events.isStreaming)
      keyed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("__fp")
        .drop("__fp")
    else keyed.dropDuplicates("__fp").drop("__fp")
  }

  /** The fingerprint claim machine behind [[streamingExactDedup]] —
    * the exact-dedup member of the owner-carrying claim family
    * ([[BandClaimProcessor]] with J = 1 semantics, no verification
    * needed because the key IS the full evidence): the first doc to
    * present a fingerprint claims it and is emitted; every later
    * presentation within the TTL horizon drops, including a replay of
    * the owner itself (each kept id emits exactly once per horizon —
    * the at-least-once-source property). A TAKEDOWN row releases the
    * claim iff its doc_id OWNS it — a fingerprint claimed by a
    * surviving doc keeps suppressing, and a non-owner retract is a
    * no-op — after which the fingerprint is claimable again, within
    * the same micro-batch (rows process in (ts, doc_id) order).
    */
  private final class FpClaimProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, FpRow, FpAdmitted] {
    @transient private var owner:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[FpRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[FpAdmitted] = {
      val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.doc_id))
      sorted.iterator.flatMap { r =>
        if (r.retract) {
          if (owner.exists() && owner.get() == r.doc_id) owner.clear()
          Iterator.empty
        } else if (!owner.exists()) {
          owner.update(r.doc_id)
          Iterator.single(FpAdmitted(r.doc_id, r.ts))
        } else Iterator.empty
      }
    }
  }

  /** Streaming exact dedup WITH the purge contract — the takedown-
    * aware flavor [[streamingDedup]] cannot express (VERDICT r12:
    * `dropDuplicatesWithinWatermark` state is fingerprint-keyed with
    * no owner, so a purged doc's fingerprint keeps suppressing
    * re-crawls until watermark expiry): emit the doc_ids of documents
    * whose md5 text fingerprint no live claim holds, with claims that
    * NAME their owner so a takedown can release exactly the purged
    * doc's. `takedowns` carries the purged documents (id + text — the
    * [[graft.ops.Dedup.retractFromDigestCounts]] contract: the purge
    * has the payload in hand); a post-purge copy is admitted in the
    * next micro-batch, a fingerprint owned by a survivor still binds.
    *
    * Owner-claims ARE the n159 refcount here: the corpus this stream
    * admits holds at most one live doc per fingerprint, so the
    * refcount is 0 or 1 and "release iff owner" equals "decrement and
    * free at zero" — the spec law replays the drained scenario through
    * the batch digest lifecycle (digestCounts → retract →
    * incrementalDedupByDigests) and matches. 100 TB shape: text never
    * enters the shuffle — rows carry (16-byte fingerprint, ts, id);
    * state is one long per live fingerprint, TTL-bounded (the
    * processing-time analog of the exact-dedup watermark horizon).
    * Requires the RocksDB state store provider. Restart from a fresh
    * checkpoint when switching from [[streamingDedup]] (different
    * state machinery by design).
    */
  def streamingExactDedup(docs: Dataset[Doc],
      ttl: java.time.Duration = java.time.Duration.ofHours(1),
      takedowns: Option[Dataset[Doc]] = None): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // claims and takedowns hash through the SAME expression, so a
    // purge lands on exactly the fingerprint its claim sits under
    def fpRowsOf(d: Dataset[Doc], retract: Boolean) =
      d.select(md5(col("text")).as("band_key"), col("ts"), col("doc_id"),
        lit(retract).as("retract"))
    val rows = takedowns.fold(fpRowsOf(docs, retract = false))(td =>
      fpRowsOf(docs, retract = false)
        .unionByName(fpRowsOf(td, retract = true)))
    rows.as[FpRow]
      .groupByKey(_.band_key)
      .transformWithState(new FpClaimProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
      .map(_.doc_id)
  }

  /** Tumbling event-time window aggregate with late-data watermark. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))
  }

  /** Sliding window variant (window, slide). */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
                    slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), window_, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
              col("event_type"), col("n_events"))
  }

  /** Session-window aggregate (gap-based) — built-in session_window. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
              col("user_id"), col("n_events"), col("sum_value"))
  }

  /** Stream-stream interval join: purchases matched to clicks of the
    * same user at most `gap` before them. Both sides carry watermarks so
    * state is bounded: Spark retains click state only within the join
    * window (the unbounded-state trap of naive stream joins).
    */
  def clicksBeforePurchases(events: DataFrame, gap: String = "10 minutes",
                            watermark: String = "1 hour"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("c_id"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
      col("c_ts") <= col("p_ts") &&
      col("c_ts") >= col("p_ts") - expr(s"INTERVAL $gap"))
      .select("user_id", "p_id", "p_ts", "c_id", "c_ts")
  }

  /** Stream-stream LEFT OUTER interval join: every purchase emits,
    * with its preceding click within `gap` or NULL click columns when
    * none exists. The outer semantics are the interesting part on
    * streams: a null row can only be emitted once the watermark has
    * passed the join window — the engine must PROVE no future click
    * can still match — so unmatched results trail the watermark
    * instead of appearing immediately (the spec drives exactly that
    * delayed-null contract). State stays bounded by the same
    * watermark that gates the nulls.
    */
  def purchasesWithOptionalClick(events: DataFrame, gap: String = "10 minutes",
                                 watermark: String = "1 hour"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("c_id"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
      col("c_ts") <= col("p_ts") &&
      col("c_ts") >= col("p_ts") - expr(s"INTERVAL $gap"), "left_outer")
      .select("user_id", "p_id", "p_ts", "c_id", "c_ts")
  }

  /** Stream-static enrichment: join the unbounded stream against a
    * bounded dimension. No watermark and no state — Spark re-plans the
    * static side per micro-batch, and a small dim broadcasts, so each
    * batch pays a map-side hash probe, never a stateful shuffle. This
    * is the standard shape for attaching reference data (user tier,
    * geo, catalog row) to a 100 TB event firehose; the same call works
    * on batch input with the identical plan.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), key)

  final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * engine's arbitrary-state extension point (emits a session when the
    * user is idle past `gapMs`, using event-time timeouts).
    */
  /** Batch sessionization — the bounded-input twin of [[sessionize]]:
    * a user's event stream breaks into sessions at gaps strictly longer
    * than `gapUs` micros. Two per-user windows (lag flags the break,
    * a running sum numbers the session) + one grouped agg; every window
    * partition is ONE user's events, so the shape is bounded by the
    * busiest user, never the corpus, and all arithmetic is integer
    * micros — the session assignment replays exactly on any engine.
    * Returns (user_id, session_idx, n_events, start_us, end_us, dur_us).
    */
  def batchSessions(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev.withColumn("new_s",
        when(coalesce(col("us") - lag(col("us"), 1).over(w),
          lit(Long.MaxValue)) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }

  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Event row for the transformWithState surfaces. */
  final case class Ev(ts: Timestamp, user_id: Long, event_type: String,
      value: Double)

  /** TTL dedup processor: emits the FIRST row per key while unexpired
    * state exists, drops the rest; the state value expires `ttl` after
    * its last update, after which the key is admitted again — the
    * arbitrary-state shape (Spark 4 transformWithState) that
    * `dropDuplicatesWithinWatermark` cannot express, because its
    * horizon is event time while suppression windows ("send at most
    * one alert per key per minute") are processing time.
    */
  private final class TtlDedupProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Ev, Ev] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        org.apache.spark.sql.Encoders.scalaBoolean,
        org.apache.spark.sql.streaming.TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Ev] = {
      val out =
        if (!seen.exists() && rows.hasNext) Iterator.single(rows.next())
        else Iterator.empty
      seen.update(true) // refreshes the TTL clock on every sighting
      out
    }
  }

  /** Closed session emitted by [[sessionizeWithTimers]]: half-open
    * [start, last + gap), the q48 session_window convention.
    */
  final case class SessionRow(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long)

  /** Per-user sessionization as an explicit state machine with
    * EVENT-TIME TIMERS — the transformWithState mechanism neither
    * state TTL (processing-time) nor the q48 engine session_window
    * (no custom emit logic) covers. The gap is enforced on the DATA
    * path, in BOTH directions: a micro-batch gives no per-key order,
    * and with a watermark delay > 0 an event may even PREDATE a
    * pending session by more than the gap (out-of-order cross-batch
    * arrival) — folding it in via min/max would merge two true
    * sessions separated by more than the gap. So the pending state
    * and the batch's events merge as INTERVALS sorted by start
    * (events are points, each pending session is [start, last]).
    *
    * Sessions emit ONLY from `handleExpiredTimer`, when the watermark
    * passes `last + gap` — never early from the data path. Emitting a
    * gap-closed interval inline (the pre-r9 behavior) is wrong under
    * delay > 0: a within-bound straggler arriving after the inline
    * emit would open a second session OVERLAPPING the emitted one.
    * Keeping every not-yet-finalized interval in state instead makes
    * the guarantees unconditional for within-bound arrivals — emitted
    * sessions per key are pairwise disjoint AND separated by more
    * than the gap, and every event lands in exactly one session
    * (spec-pinned: EventStreamsSpec "delayed-watermark session
    * laws"). State per key is the pending-interval list — bounded by
    * lateness window / gap intervals of three longs each (exactly one
    * with the default delay of 0), watermark-bounded like every
    * streaming state here. Stale timers no-op on the
    * `close <= expiry` check instead of needing deleteTimer
    * bookkeeping; each fire re-arms for the earliest interval still
    * pending.
    */
  private final class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, SessionRow] {
    @transient private var st:
      org.apache.spark.sql.streaming.ListState[SessSt] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getListState[SessSt]("sess",
        org.apache.spark.sql.Encoders.product[SessSt],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessionRow] = {
      val items = rows.map { e =>
        val ms = e.ts.getTime; SessSt(ms, ms, 1L)
      }.toArray ++ (if (st.exists()) st.get().toArray else Array.empty[SessSt])
      if (items.nonEmpty) {
        val sorted = items.sortBy(s => (s.start, s.last))
        val merged = scala.collection.mutable.ArrayBuffer(sorted.head)
        sorted.tail.foreach { s =>
          val cur = merged.last
          if (s.start > cur.last + gapMs) merged += s
          else merged(merged.length - 1) =
            SessSt(cur.start, math.max(cur.last, s.last), cur.n + s.n)
        }
        st.put(merged.toArray)
        getHandle.registerTimer(merged.head.last + gapMs)
      }
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionRow] = {
      if (!st.exists()) Iterator.empty
      else {
        // an interval is FINAL only once the watermark is STRICTLY
        // past its close: the data path merges an event at exactly
        // last + gap (the batchSessions strict-gap convention — a new
        // session needs a gap STRICTLY greater), so emitting while
        // close == watermark would be claiming final what a boundary
        // event could still extend. The engine's late filter happens
        // to drop ts == watermark (spec-pinned), making that orphan
        // unreachable TODAY — the strict check keeps the processor's
        // semantics self-consistent rather than leaning on the
        // engine's filter-equality convention.
        // Drain by the CURRENT watermark, not just the registered
        // expiry: one fire finalizes every interval the watermark has
        // passed, so emission never stalls a batch behind a stale
        // early timer (a not-yet-final interval just re-arms below).
        val horizon = math.max(expiredTimerInfo.getExpiryTimeInMs(),
          timerValues.getCurrentWatermarkInMs())
        val (closed, open) = st.get().toArray.partition(_.last + gapMs < horizon)
        if (open.isEmpty) st.clear()
        else {
          st.put(open)
          // re-arm past the horizon when the earliest close sits ON it
          // (the boundary no-op case): the next fire must see a
          // strictly later watermark or it would no-op forever
          getHandle.registerTimer(math.max(open.head.last + gapMs, horizon + 1L))
        }
        closed.iterator.map(c => SessionRow(key, new Timestamp(c.start),
          new Timestamp(c.last + gapMs), c.n))
      }
    }
  }

  /** Event-time-timer sessionization: closed sessions stream out as
    * the watermark passes each session's gap timer. Requires the
    * RocksDB state store provider (the transformWithState backing
    * store). `delay` is the watermark lateness bound on `ts`.
    */
  def sessionizeWithTimers(events: Dataset[Ev], gap: java.time.Duration,
                           delay: String = "0 seconds"): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gap.toMillis),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Suppression-window dedup on (user_id, event_type): at most one
    * emitted row per key per `ttl` of processing time. Requires the
    * RocksDB state store provider (transformWithState's backing
    * store); the spec proves both directions — duplicates inside the
    * window drop, the key re-admits after expiry.
    */
  def dedupWithTtl(events: Dataset[Ev], ttl: java.time.Duration): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(e => e.user_id + "/" + e.event_type)
      .transformWithState(new TtlDedupProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** Document row for [[streamingMinhashDedup]]. */
  final case class Doc(ts: Timestamp, doc_id: Long, text: String)
  /** One (band key, doc, full signature) presentation — stage-1 rows.
    * `retract` marks a TAKEDOWN presentation ([[streamingMinhashYield]]'s
    * `takedowns` input): instead of claiming/colliding, it releases the
    * band's claim iff `doc_id` owns it, and emits no verdict.
    */
  final case class BandRow(band_key: String, ts: Timestamp, doc_id: Long,
                           sig: Array[Long], retract: Boolean = false)
  /** Stage-1 verdict: was this doc the first to present this band?
    * `prior` records WHOSE claim suppressed an unfresh presentation —
    * true when the band's owner predates this micro-batch (the
    * streaming analog of n153's cross-vs-within evidence: an earlier
    * horizon is the corpus, the current batch is the slice); always
    * false on fresh verdicts.
    */
  final case class BandVerdict(doc_id: Long, ts: Timestamp, fresh: Boolean,
                               prior: Boolean)
  /** Per-document crawl-yield verdict ([[streamingMinhashYield]] /
    * [[streamingEmbeddingYield]]): status is `admitted` (every band
    * fresh — the doc the dedup stream emits), `cross` (suppressed by
    * a claim from an EARLIER micro-batch — the existing-corpus analog;
    * wins mixed evidence, the n153 rule), or `within` (suppressed only
    * by claims made in the doc's own batch — a slice-mate dup). `ts`
    * is the document's own event time (the max over its band rows —
    * they all carry the doc's ts), so downstream windowed aggregation
    * ([[streamingYieldCounts]]) needs no join back to the source.
    */
  final case class YieldVerdict(doc_id: Long, ts: Timestamp, status: String)

  /** Stage 1 of streaming near-dup dedup, keyed by MINHASH BAND KEY:
    * the first document to present a band claims it, storing its FULL
    * minhash signature (TTL-bounded ValueState); every later
    * presentation is VERIFIED against the claimer by the
    * matching-component fraction — Broder's unbiased Jaccard
    * estimator, the verification a pure band-collision gate lacks
    * (the batch operator's exact-Jaccard pass, re-expressed on the
    * only evidence a stream can keep) — and votes fresh iff the
    * estimate stays below `threshold`. A REPLAY of the claiming doc
    * itself estimates J = 1 and votes unfresh, so an at-least-once
    * source re-delivering a document within the TTL horizon cannot
    * emit it twice (each kept id is emitted exactly once per
    * horizon). Within a micro-batch rows process in (ts, doc_id)
    * order, so the earliest/lowest doc claims — the streaming analog
    * of batch minhashDedup's drop-the-higher-id rule. Suppressed docs
    * still HOLD their fresh bands, which keeps suppression transitive
    * the way batch banding is; like the batch verify, comparison is
    * against the bucket's doc of record (the claimer), so state stays
    * one (owner id, signature) per live band.
    *
    * TAKEDOWN rows (`retract = true`, the streaming analog of
    * [[graft.ops.Dedup.retractFromIndex]]): release the claim iff the
    * row's doc_id OWNS it — a claim owned by a surviving doc still
    * binds, and retracting a doc that owns nothing is a no-op — and
    * emit no verdict. After release the band is claimable again within
    * the same micro-batch (rows process in (ts, doc_id) order, so a
    * retract with an earlier ts frees the band for later claimers),
    * and a post-purge near-copy is ADMITTED — the n154 admission
    * semantics, live.
    */
  private final class BandClaimProcessor(threshold: Double, numHashes: Int,
      ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, BandRow, BandVerdict] {
    @transient private var owner:
      org.apache.spark.sql.streaming.ValueState[Claim] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      owner = getHandle.getValueState[Claim]("owner",
        org.apache.spark.sql.Encoders.product[Claim],
        org.apache.spark.sql.streaming.TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[BandRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[BandVerdict] = {
      // tracked ACROSS the batch's rows: true while the live claim was
      // made by an earlier micro-batch — the `prior` evidence the yield
      // report classifies as cross-horizon suppression. A claim made
      // (or re-made after a retraction) inside this batch flips it
      // false: its suppressions are within-batch evidence.
      var ownerFromEarlierBatch = owner.exists()
      val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.doc_id))
      sorted.iterator.flatMap { r =>
        if (r.retract) {
          if (owner.exists() && owner.get().owner == r.doc_id) {
            owner.clear()
            ownerFromEarlierBatch = false
          }
          Iterator.empty
        } else if (!owner.exists()) {
          owner.update(Claim(r.doc_id, r.sig))
          ownerFromEarlierBatch = false
          Iterator.single(BandVerdict(r.doc_id, r.ts, fresh = true,
            prior = false))
        } else {
          val c = owner.get().s
          var hits = 0; var i = 0
          val n = math.min(c.length, r.sig.length)
          while (i < n) { if (c(i) == r.sig(i)) hits += 1; i += 1 }
          val fresh = hits.toDouble < threshold * numHashes
          Iterator.single(BandVerdict(r.doc_id, r.ts, fresh = fresh,
            prior = !fresh && ownerFromEarlierBatch))
        }
      }
    }
  }

  /** Stage 2, keyed by doc_id: tally the `nBands` per-band verdicts
    * (all arrive in the doc's own micro-batch — the band explode and
    * the claim stage never split a doc across batches) and emit ONE
    * [[YieldVerdict]] per doc: `admitted` iff every band was fresh
    * (the row the dedup streams keep), else `cross` when any
    * suppressing claim predates the batch (cross wins mixed evidence,
    * the n153 rule) or `within` otherwise. The dedup and the yield
    * report are FILTERS over this one stream, so they can never
    * disagree — no new state, just classification of evidence the
    * claim stage already emits. State clears on the final verdict;
    * the TTL only reaps docs truncated mid-flight by a failure.
    */
  private final class AllBandsFreshProcessor(nBands: Int,
      ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, BandVerdict, YieldVerdict] {
    @transient private var tally:
      org.apache.spark.sql.streaming.ValueState[BandTally] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      tally = getHandle.getValueState[BandTally]("tally",
        org.apache.spark.sql.Encoders.product[BandTally],
        org.apache.spark.sql.streaming.TTLConfig(ttl))
    override def handleInputRows(key: Long, rows: Iterator[BandVerdict],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[YieldVerdict] = {
      var t = if (tally.exists()) tally.get()
        else BandTally(0, false, false, Long.MinValue)
      rows.foreach(r => t = BandTally(t.seen + 1, t.collided || !r.fresh,
        t.cross || (!r.fresh && r.prior), math.max(t.tsMax, r.ts.getTime)))
      if (t.seen >= nBands) {
        tally.clear()
        val status =
          if (!t.collided) "admitted" else if (t.cross) "cross" else "within"
        Iterator.single(YieldVerdict(key, new Timestamp(t.tsMax), status))
      } else {
        tally.update(t)
        Iterator.empty
      }
    }
  }

  /** Streaming NEAR-duplicate dedup — the unbounded-source variant of
    * [[graft.ops.Dedup.minhashDedup]], completing the dedup ladder
    * ([[streamingDedup]] exact / incremental-digest / this): emit the
    * doc_ids of documents none of whose minhash LSH bands was claimed
    * by an earlier document within the `ttl` horizon. Two chained
    * `transformWithState` stages, both keyed SMALL:
    *
    *   1. explode each doc into its `bands` band keys (band index +
    *      the signature slice — slice equality is the exact batch
    *      collision condition, replayed from minhashNearDups) and let
    *      the FIRST presenter claim each band ([[BandClaimProcessor]]);
    *   2. regroup the per-band verdicts by doc_id and keep the doc
    *      iff every band was fresh ([[AllBandsFreshProcessor]]).
    *
    * 100 TB shape: text never enters a shuffle — stage 1 carries
    * (band key, ts, id, signature), stage 2 (id, ts, bool); state is
    * one signature per live band (`numHashes` longs — the price of
    * verification; the pre-r10 flag-only stage suppressed EVERY band
    * collision, so a sub-threshold collision in the coarse-band
    * regime silently dropped a keeper) and one (int, bool) per
    * in-flight doc, both TTL-bounded, the processing-time analog of
    * the exact-dedup watermark horizon. The verdict is Broder's
    * matching-fraction estimate against the band's CLAIMER (the
    * streaming analog of the batch exact-Jaccard pass). `threshold`
    * defaults to 0.5 — the BENCH-FIXTURE convention the streaming
    * specs and oracles use, NOT the batch operator's default (batch
    * `minhashDedup` defaults to 0.8); the spec-pinned
    * equality-with-batch law holds when the thresholds are explicitly
    * matched, as the spec does. The spec also pins that a
    * band-colliding sub-threshold pair survives. Degenerate docs
    * (< k words — empty signature) share every band key WITH identical
    * signatures (est J = 1), so they still collapse to one survivor:
    * pre-filter them upstream. Requires the RocksDB state store
    * provider.
    */
  def streamingMinhashDedup(docs: Dataset[Doc], k: Int = 5,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.5,
      seed: Long = 42L,
      ttl: java.time.Duration = java.time.Duration.ofHours(1),
      takedowns: Option[Dataset[Doc]] = None): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    streamingMinhashYield(docs, k, numHashes, bands, threshold, seed, ttl,
        takedowns)
      .filter(_.status == "admitted").map(_.doc_id)
  }

  /** Streaming crawl-yield report — the n153 observability twin for
    * the streaming dedup (VERDICT r10 #7): one [[YieldVerdict]] per
    * input document, classifying it `admitted` / `cross` (suppressed
    * by a claim from an earlier micro-batch — the existing-corpus
    * analog, winning mixed evidence exactly as n153's report does) /
    * `within` (suppressed only by its own batch). No new state: the
    * claim stage already knows whether a suppressing owner predates
    * the batch, and stage 2 classifies that evidence while tallying.
    * [[streamingMinhashDedup]] IS this stream filtered to `admitted`,
    * so report and drop can never disagree (the spec law: statuses
    * partition the drained input; `admitted` equals the dedup
    * stream's output). Downstream, per-horizon counts are one
    * `groupBy(status)` away — the rows carry everything — and the
    * watermark-windowed flavor ships as [[streamingYieldCounts]].
    *
    * TAKEDOWNS (the streaming half of the purge story — the batch
    * indexes retract via [[graft.ops.Dedup.retractFromIndex]], but a
    * live band claim owned by a purged doc would otherwise keep
    * suppressing its near-copies until TTL expiry): `takedowns` is a
    * second stream carrying the PURGED documents (id + text — the
    * purge request has the payload, exactly as batch
    * `retractFromDigestCounts` takes removedDocs). Each purge row
    * bands identically to a claim row and releases, per band, the
    * claim its doc owns; claims owned by OTHER docs are untouched, and
    * a takedown row never appears in the verdict output. Laws
    * (EventStreamsSpec): a post-purge near-copy of the removed doc is
    * ADMITTED in the next micro-batch (the n154 admission semantics),
    * surviving claims still bind, and the drained survivors equal the
    * batch incremental dedup against the RETRACTED index on the same
    * scenario.
    *
    * CHECKPOINT COMPATIBILITY (ADVICE r11): the claim state now
    * carries its owner id and the tally its event time, and the
    * verdict schema gained `ts` — a query restarted from a pre-r12
    * checkpoint fails state/sink schema validation BY DESIGN. Restart
    * takedown-aware queries from a fresh checkpoint location.
    */
  def streamingMinhashYield(docs: Dataset[Doc], k: Int = 5,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.5,
      seed: Long = 42L,
      ttl: java.time.Duration = java.time.Duration.ofHours(1),
      takedowns: Option[Dataset[Doc]] = None): Dataset[YieldVerdict] = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.GraftFunctions.minhash_words
    val r = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      concat_ws(":", lit(b),
        array_join(transform(slice(col("sig"), b * r + 1, r),
          _.cast("string")), ","))
    }
    // claims and takedowns band through the SAME expression tree — a
    // purge row lands on exactly the band keys its claims sit under,
    // by construction rather than convention
    def bandRowsOf(d: Dataset[Doc], retract: Boolean) =
      d.select(col("ts"), col("doc_id"),
          minhash_words(col("text"), k, numHashes, seed).as("sig"))
        .select(col("ts"), col("doc_id"), col("sig"),
          explode(array(bandCols: _*)).as("band_key"),
          lit(retract).as("retract"))
    val rows = takedowns.fold(bandRowsOf(docs, retract = false))(td =>
      bandRowsOf(docs, retract = false)
        .unionByName(bandRowsOf(td, retract = true)))
    rows.as[BandRow]
      .groupByKey(_.band_key)
      .transformWithState(new BandClaimProcessor(threshold, numHashes, ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new AllBandsFreshProcessor(bands, ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** Vector row for [[streamingEmbeddingDedup]]. */
  final case class Vec(ts: Timestamp, vec_id: Long, embedding: Array[Float])
  /** One (bucket key, vector) presentation — embedding stage-1 rows;
    * `retract` marks a takedown presentation (the [[BandRow]] contract).
    */
  final case class EmbBandRow(band_key: String, ts: Timestamp, doc_id: Long,
                              codes: Array[Int], retract: Boolean = false)

  /** Stage 1 of streaming embedding near-dup, keyed by SIGN-LSH BUCKET:
    * the first vector to present a bucket claims it, storing its INT8
    * CODES (the [[graft.ops.Similarity.scalarQuantize]] quantization —
    * 4x smaller state than floats, and the cosine between code vectors
    * equals the cosine between dequantized vectors because the
    * per-vector scales cancel); every later presentation is verified
    * against the claimer by quantized cosine — integer dots, one sqrt,
    * deterministic per pair — and votes fresh iff it is NOT a near-dup
    * of the claimer (below `threshold`). A replay of the claiming
    * vector itself scores cos = 1 and votes unfresh, so an
    * at-least-once source cannot emit a kept id twice within the TTL
    * horizon (the [[BandClaimProcessor]] property, kept by
    * construction). Unlike the minhash stage this is NOT pure
    * collision: sign buckets at production `planes` are coarse enough
    * that unrelated vectors do collide, so the verdict needs the
    * cosine check the batch operator performs in its verification
    * pass — performed here against the bucket's claimer.
    */
  private final class EmbClaimProcessor(threshold: Double,
      ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, EmbBandRow, BandVerdict] {
    @transient private var owner:
      org.apache.spark.sql.streaming.ValueState[EmbClaim] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      owner = getHandle.getValueState[EmbClaim]("owner",
        org.apache.spark.sql.Encoders.product[EmbClaim],
        org.apache.spark.sql.streaming.TTLConfig(ttl))
    private def qcos(a: Array[Int], b: Array[Int]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i).toLong * b(i); na += a(i).toLong * a(i)
        nb += b(i).toLong * b(i); i += 1
      }
      if (na == 0L || nb == 0L) 0.0
      else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    override def handleInputRows(key: String, rows: Iterator[EmbBandRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[BandVerdict] = {
      // the BandClaimProcessor conventions, verbatim: the prior flag
      // tracks whether the LIVE claim predates this batch, and a
      // retract row releases only the claim its doc_id owns
      var ownerFromEarlierBatch = owner.exists()
      val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.doc_id))
      sorted.iterator.flatMap { r =>
        if (r.retract) {
          if (owner.exists() && owner.get().owner == r.doc_id) {
            owner.clear()
            ownerFromEarlierBatch = false
          }
          Iterator.empty
        } else if (!owner.exists()) {
          owner.update(EmbClaim(r.doc_id, r.codes))
          ownerFromEarlierBatch = false
          Iterator.single(BandVerdict(r.doc_id, r.ts, fresh = true,
            prior = false))
        } else {
          val fresh = qcos(owner.get().c, r.codes) < threshold
          Iterator.single(BandVerdict(r.doc_id, r.ts, fresh = fresh,
            prior = !fresh && ownerFromEarlierBatch))
        }
      }
    }
  }

  /** Streaming embedding near-dup dedup — the sign-LSH twin of
    * [[streamingMinhashDedup]], completing the dedup family's
    * streaming column (exact / minhash-text / embedding): emit the
    * vec_ids of vectors that near-duplicate (quantized cosine >=
    * `threshold`) no bucket claimer within the `ttl` horizon. Same
    * two-stage transformWithState choreography: explode each vector
    * into its `tables` sign-LSH bucket keys (the
    * [[graft.ops.Similarity.withSignBuckets]] kernel — splitmix-derived
    * hyperplanes, so batch and stream bucket identically), claim-and-
    * verify per bucket ([[EmbClaimProcessor]]), then regroup verdicts
    * by vec_id and keep iff EVERY bucket voted fresh
    * ([[AllBandsFreshProcessor]], shared with the minhash path).
    *
    * 100 TB shape: raw float embeddings never enter a shuffle or
    * state — stage 1 carries int8 codes (4x smaller; byte-packable in
    * a production store) keyed by bucket, stage 2 (id, bool) rows;
    * state is one code vector per live bucket and one (int, bool) per
    * in-flight vector, TTL-bounded. Like the batch operator this
    * verifies only against bucket CLAIMERS, not every suppressed
    * mate, and scores quantized rather than float cosine — the
    * spec-pinned law (equals batch [[graft.ops.Dedup.embeddingDedup]]
    * on the drained input) holds when near-dup groups collide with
    * their claimers and no pair sits within quantization error of the
    * threshold, the regime the batch operator's own bucketing targets.
    * Requires the RocksDB state store provider.
    */
  def streamingEmbeddingDedup(vecs: Dataset[Vec], threshold: Double = 0.95,
      planes: Int = 12, tables: Int = 4,
      ttl: java.time.Duration = java.time.Duration.ofHours(1),
      takedowns: Option[Dataset[Vec]] = None): Dataset[Long] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    streamingEmbeddingYield(vecs, threshold, planes, tables, ttl, takedowns)
      .filter(_.status == "admitted").map(_.doc_id)
  }

  /** [[streamingMinhashYield]] for the embedding stream: one
    * [[YieldVerdict]] per input vector, `admitted` / `cross` /
    * `within` under the same classification (shared
    * [[AllBandsFreshProcessor]] — literally the same stage 2, so the
    * two modalities cannot drift). [[streamingEmbeddingDedup]] is this
    * stream filtered to `admitted`. `takedowns` carries purged
    * VECTORS (id + embedding) and releases, per bucket, the claims
    * their ids own — the [[streamingMinhashYield]] takedown contract,
    * including its checkpoint-compatibility note.
    */
  def streamingEmbeddingYield(vecs: Dataset[Vec], threshold: Double = 0.95,
      planes: Int = 12, tables: Int = 4,
      ttl: java.time.Duration = java.time.Duration.ofHours(1),
      takedowns: Option[Dataset[Vec]] = None): Dataset[YieldVerdict] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.GraftFunctions.sign_buckets
    // quantization is the scalarQuantize column formula — codegen'd on
    // the stream BEFORE any state boundary, one scan; takedown rows
    // bucket through the SAME expressions, so a purge lands on exactly
    // the keys its claims sit under
    def bucketRowsOf(d: Dataset[Vec], retract: Boolean) =
      graft.ops.Similarity.scalarQuantize(d.toDF())
        .select(col("ts"), col("vec_id").as("doc_id"), col("codes"),
          posexplode(sign_buckets(col("embedding"), planes, tables))
            .as(Seq("t", "bucket")))
        .select(concat_ws(":", col("t"), col("bucket")).as("band_key"),
          col("ts"), col("doc_id"), col("codes"),
          lit(retract).as("retract"))
    val rows = takedowns.fold(bucketRowsOf(vecs, retract = false))(td =>
      bucketRowsOf(vecs, retract = false)
        .unionByName(bucketRowsOf(td, retract = true)))
    rows.as[EmbBandRow]
      .groupByKey(_.band_key)
      .transformWithState(new EmbClaimProcessor(threshold, ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new AllBandsFreshProcessor(tables, ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** Windowed crawl-yield COUNTS over a verdict stream — the n153-style
    * per-window report the yield streams left to the consumer (VERDICT
    * r11 #7): one row per (event-time window, status) with the number
    * of documents so classified. No new state machinery — one
    * watermarked tumbling aggregate over the verdicts the claim stages
    * already emit (each [[YieldVerdict]] carries its document's event
    * time), so the counts can never disagree with the per-doc stream:
    * the spec law is that the emitted counts partition the drained
    * verdicts per window and `admitted` equals the dedup stream's
    * output count. Works on batch verdict relations too (the
    * [[tumblingCounts]] convention — watermark binds only on streams).
    *
    * 100 TB shape: the aggregate's state is one count triple per live
    * window — the verdict stream is already one row per DOCUMENT (not
    * per band), and the watermark reaps closed windows.
    */
  def streamingYieldCounts(verdicts: Dataset[YieldVerdict],
                           window_ : String = "1 hour",
                           watermark: String = "2 hours"): DataFrame = {
    val df = verdicts.toDF()
    val src = if (df.isStreaming) df.withWatermark("ts", watermark) else df
    src.groupBy(window(col("ts"), window_).as("w"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("w.start").as("window_start"), col("status"), col("n_docs"))
  }

  /** One ingested document for [[streamingCardCounts]]. */
  final case class CardDoc(ts: Timestamp, doc_id: Long, lang: String,
                           text: String)

  /** Streaming data-card ledger — the card family's streaming member
    * (batch = [[graft.ops.Profile.cardState]], incremental =
    * merge/retract, and THIS for the live ingest view): per
    * (event-time window, lang) doc and token counts via ONE
    * watermarked tumbling aggregate — no custom state. Each flushed
    * window's rows are a card-state LEDGER SHARD: summing a window's
    * rows over langs reproduces `cardState`'s `lang_docs` /
    * `lang_tokens` entries for exactly the docs in that window (the
    * spec law), so folding a flushed window into the published card
    * state is pure keyed addition — the n169 algebra, fed by the
    * stream. Bounded (batch) inputs run the same aggregate without
    * the watermark gate, so backfills and the live path cannot
    * disagree.
    */
  def streamingCardCounts(docs: Dataset[CardDoc],
                          window_ : String = "1 hour",
                          watermark: String = "2 hours"): DataFrame = {
    val df = docs.toDF()
    val src = if (df.isStreaming) df.withWatermark("ts", watermark) else df
    src.groupBy(window(col("ts"), window_).as("w"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.ops.TextAnalysis.tokenCount(col("text"))).as("n_tokens"))
      .select(col("w.start").as("window_start"), col("lang"),
        col("n_docs"), col("n_tokens"))
  }

  /** One observed (group, item) occurrence for [[streamingHeavyHitters]]. */
  final case class GroupItem(group: String, item: String)
  /** Summary row: `est` is the SpaceSaving estimate (always >= the true
    * count), `err` its overestimation bound (true >= est - err), and
    * `n_seen` the group's total occurrences when the row was emitted —
    * a monotone emission stamp, so the rows at max `n_seen` per group
    * ARE the final summary under an Append sink.
    */
  final case class HhRow(group: String, item: String, est: Long, err: Long,
                         n_seen: Long)

  /** SpaceSaving (Metwally, Agrawal & El Abbadi 2005) over a stream,
    * keyed by group: k counter slots per group; a known item
    * increments, a new item fills a free slot at (1, 0), and once the
    * slots are full a new item EVICTS the minimum-count slot (ties to
    * the lexicographically smallest item, for determinism),
    * inheriting its count + 1 with `err` = the evicted count. The
    * classic guarantees hold per group, all order-robust and
    * spec-pinned: `est >= true >= est - err` for every summarized
    * item, every item with true count > n_seen/k IS in the summary
    * (min slot count <= n_seen/k), and with <= k distinct items the
    * summary is EXACT (err = 0) — the regime where this doubles as
    * exact streaming per-group top-k.
    */
  private final class SpaceSavingProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, GroupItem, HhRow] {
    @transient private var slots:
      org.apache.spark.sql.streaming.ListState[HhSlot] = _
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      slots = getHandle.getListState[HhSlot]("slots",
        org.apache.spark.sql.Encoders.product[HhSlot],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[GroupItem],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[HhRow] = {
      val m = scala.collection.mutable.HashMap[String, (Long, Long)]()
      if (slots.exists()) slots.get().foreach(s => m(s.item) = (s.cnt, s.err))
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { r =>
        n += 1
        m.get(r.item) match {
          case Some((c, e)) => m(r.item) = (c + 1, e)
          case None if m.size < k => m(r.item) = (1L, 0L)
          case None =>
            val (evict, (mc, _)) = m.minBy { case (it, (c, _)) => (c, it) }
            m.remove(evict)
            m(r.item) = (mc + 1, mc)
        }
      }
      seen.update(n)
      val arr = m.toArray.map { case (it, (c, e)) => HhSlot(it, c, e) }
        .sortBy(s => (-s.cnt, s.item))
      slots.put(arr)
      arr.iterator.map(s => HhRow(key, s.item, s.cnt, s.err, n))
    }
  }

  /** Streaming per-group heavy hitters / top-k — the identity-carrying
    * complement to the streaming CMS (counts without identities) and
    * the unbounded-source variant of the batch Misra-Gries summary:
    * "which tokens / domains / URL patterns are flooding each source
    * RIGHT NOW" without ever holding a per-item map. Emits the
    * group's full k-slot summary after every batch that touches it
    * (Append; monotone `n_seen` stamps which emission is final).
    *
    * 100 TB shape: state is EXACTLY k slots per live group, whatever
    * the item cardinality — the item universe never enters state, a
    * shuffle, or the driver; each batch is one pass over its rows
    * grouped by `group`. Guarantees and eviction rule in
    * [[SpaceSavingProcessor]]. Like ANY SpaceSaving summary the exact
    * `est`/`err` values depend on arrival order (a micro-batch gives
    * no per-key order) — what the spec pins are the order-INVARIANT
    * guarantees above, which is the contract this sketch family
    * offers. Requires the RocksDB state store provider
    * (transformWithState's backing store).
    */
  def streamingHeavyHitters(items: Dataset[GroupItem], k: Int): Dataset[HhRow] = {
    require(k >= 1 && k <= 4096, "k slots per group must lie in [1, 4096]")
    val spark = items.sparkSession
    import spark.implicits._
    items.groupByKey(_.group)
      .transformWithState(new SpaceSavingProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** One observed (group, value) for [[streamingQuantiles]]. */
  final case class GroupValue(group: String, value: Long)
  /** Bracketed quantile estimate: the true q-quantile of everything the
    * group has seen lies in [bracket_lo, bracket_hi] (inclusive, the
    * n43 histQuantiles bracket semantics); `n_seen` is the monotone
    * emission stamp — rows at max n_seen per group ARE the final
    * summary under an Append sink (the HhRow convention).
    */
  final case class QBracket(group: String, q: Double, n_seen: Long,
                            bracket_lo: Long, bracket_hi: Long)

  /** Fixed-bin integer histogram per group: counts are ADDITIVE, so the
    * sketch is mergeable and every emitted bracket is invariant to
    * arrival order and batch boundaries — the property the whole
    * streaming sketch family trades on. Values outside the declared
    * [lo, hi] range clamp into the edge bins, and the tracked per-group
    * min/max widen exactly those edge bins' brackets, so containment
    * holds UNCONDITIONALLY (no silent lying about outliers). After
    * each batch that touches a group, one row per requested quantile
    * is emitted from the updated histogram.
    */
  private final class HistQuantileProcessor(lo: Long, hi: Long, bins: Int,
      qs: Seq[Double])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, GroupValue, QBracket] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[QHist] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[QHist]("hist",
        org.apache.spark.sql.Encoders.product[QHist],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[GroupValue],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[QBracket] = {
      val w = (hi - lo + bins) / bins // ceil((range+1)/bins), the Sketch width
      val h = if (st.exists()) st.get()
        else QHist(new Array[Long](bins), 0L, Long.MaxValue, Long.MinValue)
      val counts = h.counts.clone()
      var n = h.n; var mn = h.mn; var mx = h.mx
      rows.foreach { r =>
        val v = r.value
        val b =
          if (v < lo) 0
          else if (v > hi) bins - 1
          else math.min(((v - lo) / w).toInt, bins - 1)
        counts(b) += 1L
        n += 1L
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      st.update(QHist(counts, n, mn, mx))
      qs.iterator.map { q =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        var b = 0; var cum = counts(0)
        while (cum < target && b < bins - 1) { b += 1; cum += counts(b) }
        val binLo = lo + b.toLong * w
        // saturating upper edge (ADVICE r10), shared with the batch
        // bisections so the bracket arithmetic cannot drift
        val binHi = graft.ops.Sketch.saturatedHi(binLo, w, hi)
        // edge bins absorb the clamped outliers, so their brackets
        // widen to the observed extremes — containment stays exact
        val loB = if (b == 0) math.min(binLo, mn) else binLo
        val hiB = if (b == bins - 1) math.max(binHi, mx) else binHi
        QBracket(key, q, n, loB, hiB)
      }
    }
  }

  /** Streaming mergeable quantiles — the distribution member that
    * completes the streaming sketch family (HLL = how many distinct,
    * CMS = how often a known item, SpaceSaving = which items,
    * quantiles = how the values are distributed): per-group bracketed
    * p50/p99-style estimates over an unbounded stream, with the n43
    * [[graft.ops.Sketch.histQuantiles]] bracket semantics — the true
    * q-quantile of everything seen provably lies inside the emitted
    * [bracket_lo, bracket_hi], brackets collapse to EXACT values when
    * `bins` covers the declared value range at width 1, and the
    * whole summary is arrival-order- and batch-boundary-invariant
    * because histogram counts are additive (the mergeability that
    * makes the sketch a sketch). `[lo, hi]` is the caller's declared
    * value range (token counts, byte sizes — pipeline-known bounds);
    * out-of-range values clamp into the edge bins and the tracked
    * min/max widen those bins' brackets, so the guarantee survives
    * outliers instead of quietly breaking.
    *
    * 100 TB shape: state is EXACTLY `bins` longs + 3 longs per live
    * group, whatever the value cardinality or stream length; each
    * batch is one in-memory pass over its rows grouped by `group`;
    * nothing is ever sorted and no per-value state exists. Range
    * guard: `hi - lo < 2^63 - bins`, the [[graft.ops.Sketch]]
    * convention, so the ceil width can never wrap. Requires the
    * RocksDB state store provider (transformWithState's backing
    * store).
    */
  def streamingQuantiles(values: Dataset[GroupValue], lo: Long, hi: Long,
                         bins: Int = 64,
                         qs: Seq[Double] = Seq(0.5, 0.99)): Dataset[QBracket] = {
    require(bins >= 2 && bins <= 65536, "bins outside [2, 65536]")
    require(hi >= lo, "declared range is empty")
    require(BigInt(hi) - BigInt(lo) < BigInt(Long.MaxValue) - bins,
      "value range exceeds 2^63 - bins - shift/scale values first")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val spark = values.sparkSession
    import spark.implicits._
    values.groupByKey(_.group)
      .transformWithState(new HistQuantileProcessor(lo, hi, bins, qs),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
