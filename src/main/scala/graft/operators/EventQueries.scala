package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream (time-ordered) operators over the `events` table: the
  * as-of join and sessionization — the two temporal operators every
  * event-analytics engine needs beyond plain windowed aggregation (q9,
  * q14). Both are phrased as partitioned-window dataflow:
  *
  *  - ONE shuffle keyed by `user_id`, then per-key time order within
  *    the partition — no range-explode join, no driver loops;
  *  - at 100 TB this scales with the number of users (partition count),
  *    and a per-key sort that Spark runs as part of the window exchange;
  *    a skewed power-user key is one partition's sort, not a replanned
  *    join.
  *
  * The as-of join deliberately avoids the naive formulation
  * (inequality join `click.ts <= purchase.ts` + nearest-pick), which is
  * a BroadcastNestedLoop/cartesian per user-key at scale: unioning both
  * streams and running `last(_, ignoreNulls)` over the time-ordered
  * window computes the same "latest prior" semantics in one pass.
  */
object EventQueries {

  private val usecPerSec = 1e6

  /** Generic AS-OF JOIN: for every left row, the latest right row of
    * the same `key` with right.`ts` <= left.`ts` (ties on ts resolved
    * by `tieBreak` — the latest (ts, tieBreak) right row wins; a right
    * row exactly at the left timestamp matches). Appends `matchedCol`,
    * a struct of the ENTIRE matched right row, null when nothing
    * precedes — callers filter for inner semantics or keep for outer.
    *
    * The union + last(ignoreNulls) formulation (q35's shape, offered
    * here as the reusable operator): both sides align on (key, ts,
    * side, payload-struct) and union, ONE window partitioned by key
    * ordered (ts, side, tieBreak) carries the latest right payload
    * forward. One key shuffle, no inequality join, state per key =
    * one struct — the reason this beats the nested-loop formulation
    * at any scale.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, ts: String, tieBreak: String,
      matchedCol: String = "matched"): DataFrame = {
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    // right rows order BEFORE left rows at identical (ts, tieBreak):
    // an exactly-simultaneous right row is "at or before" the left
    val l = left.select(left(key).as("__k"), left(ts).as("__ts"),
      left(tieBreak).as("__tb"), lit(1).as("__side"),
      struct(left.columns.toIndexedSeq.map(left(_)): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val r = right.select(right(key).as("__k"), right(ts).as("__ts"),
      right(tieBreak).as("__tb"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.toIndexedSeq.map(right(_)): _*).as("__r"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    left.columns.zipWithIndex.foldLeft(
      matched.withColumn(matchedCol, col("__m")))(
      (df, ci) => df.withColumn(ci._1, col("__l").getField(ci._1)))
      .select((left.columns.toIndexedSeq :+ matchedCol).map(col): _*)
  }

  /** q35 — as-of join (event attribution): for each `purchase`, the
    * latest `click` of the same user at or before it (order key
    * (ts, event_id), so the semantics are deterministic even under ts
    * ties). Emits the purchase, the matched click, and the
    * click-to-purchase gap in seconds; purchases with no prior click
    * are dropped (inner as-of semantics).
    */
  def q35AsofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
      .filter(col("ts").isNotNull &&
        col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clickMark = when(col("event_type") === "click",
      struct(col("ts").as("cts"), col("event_id").as("cid")))
    ev.withColumn("lc", last(clickMark, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("lc").isNotNull)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("lc.cid").as("click_id"),
        round((unix_micros(col("ts")) - unix_micros(col("lc.cts"))) /
          usecPerSec, 6).as("gap_s"))
      .orderBy("purchase_id")
  }

  /** q50 — event-type TRANSITION matrix: per user, each consecutive
    * (event → next event) pair in (ts, event_id) order, counted over
    * the corpus — the Markov/bigram statistic behind next-action
    * models and funnel design. One lead() window on the same single
    * user-key exchange as q35/q38/q48, then a 25-key partial
    * aggregation: the shuffle after the window carries (from, to)
    * pairs already combined map-side.
    */
  def q50Transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    CoreQueries.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** q52 — weekly retention cohorts: users grouped by the week of
    * their first event (weeks indexed from the corpus epoch), then the
    * distinct-user count at each week offset since that first event,
    * with retention as a fraction of the cohort's week-0 size — the
    * standard product-analytics cohort matrix, and the two-level
    * temporal aggregation shape.
    *
    * Scale shape: ONE user-key aggregation pins each user's cohort day
    * (min over the user, map-side combined); the join back to the
    * user's events is user-key co-partitioned (AQE may broadcast the
    * per-user table when small — at 100 TB both sides are already
    * hashed on user_id, so it stays a co-located shuffle join); the
    * (user, cohort, offset) distinct and the matrix aggregate then
    * carry 3 small longs per row. The week-0 cohort size arrives via a
    * window over the ~weeks² matrix — driver-scale state, no second
    * scan.
    */
  def q52RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit("2024-01-01")
    val ev = CoreQueries.events(spark, dir)
      .filter(col("ts").isNotNull) // round-4 null-timestamp contract
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = ev.groupBy("user_id").agg(min(col("d")).as("cohort_d"))
    val cells = ev.join(cohort, Seq("user_id"))
      .select(col("user_id"),
        floor(datediff(col("cohort_d"), epoch) / 7).as("cohort_week"),
        floor(datediff(col("d"), col("cohort_d")) / 7).as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val w0 = Window.partitionBy("cohort_week")
    cells
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_users"))).over(w0))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** q42 — sliding RANGE-frame window: per-type daily totals with a
    * trailing 3-day moving average. The range frame is over an integer
    * day ordinal, so days missing from the data genuinely fall out of
    * the frame (a ROWS frame would silently span gaps). Two-level
    * shape: the daily rollup is a partial-agg shuffle on (day, type);
    * the moving window then partitions by type — at 100 TB the window
    * state per partition is the number of DAYS, not events, so this
    * composes with any retention. Decimal day sums keep the moving
    * averages shuffle-order independent (the oracle contract).
    */
  def q42MovingAverage(spark: SparkSession, dir: String): DataFrame = {
    val daily = CoreQueries.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("day_sum_d"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("d_ord")
      .rangeBetween(-2, 0)
    daily
      .withColumn("d_ord", datediff(col("d"), lit("2024-01-01")).cast("long"))
      .withColumn("ma3_sum", sum(col("day_sum_d")).over(w))
      .withColumn("ma3_days", count(lit(1)).over(w))
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("day_sum_d").cast("double").as("day_sum"),
        col("n_events"),
        round(col("ma3_sum").cast("double") / col("ma3_days"), 6)
          .as("ma3_avg"))
      .orderBy("event_type", "day")
  }

  /** q40 — pivot (long→wide reshape): per-user event-type count matrix.
    * The explicit value list keeps the plan single-pass (no extra
    * distinct-values job) and the output schema static — which is also
    * the 100 TB rule: pivot over an unbounded column is a schema
    * explosion, so production pivots always declare their columns.
    * Missing combinations are 0, not null (`na.fill` after the pivot).
    */
  def q40PivotEventMatrix(spark: SparkSession, dir: String): DataFrame =
    CoreQueries.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy("user_id")

  /** q44 — bounded INTERVAL join (window attribution, ALL matches): for
    * each purchase, every click by the same user in the trailing hour
    * [ts−1h, ts] — the many-match complement of q35's latest-only as-of.
    *
    * Scale shape: the naive formulation is an inequality join, which
    * Catalyst can only execute as a nested-loop per user key. Instead
    * time is discretized into window-sized buckets: each click lands in
    * exactly ONE bucket, each purchase probes exactly TWO consecutive
    * buckets (a trailing window of length w spans at most two w-sized
    * buckets), so the join is a hash equi-join on (user_id, bucket)
    * followed by the exact time refine. No pair can emit twice — the
    * two probed buckets are distinct — so no dedup pass is needed, and
    * the shuffle carries ids plus one long, never the event payload.
    * The same shape handles any bounded interval; only an UNbounded
    * window needs the union-window as-of form (q35).
    */
  /** Generic bounded INTERVAL JOIN: every (left, right) pair of the
    * same `key` where right.`ts` lands in [left.`ts` − window,
    * left.`ts`] — the time-bucket discretization described on q44,
    * exposed as the reusable operator. Right rows land in ONE
    * window-sized bucket, left rows probe exactly TWO, so the range
    * join is a hash equi-join + exact refine with no duplicate
    * emissions. Left/right payload columns survive with their names
    * (caller disambiguates collisions beforehand).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      windowSeconds: Long): DataFrame = {
    val winUs = windowSeconds * usecPerSec.toLong
    // Each side projects its key / bucket / microsecond-ts into DISTINCT
    // scratch attributes before the join, so the condition never relies
    // on Spark's shared-lineage self-join disambiguation (which logs
    // "trivially true equals predicate" and breaks down when both
    // inputs derive from the same scan with identical column names).
    val r = right
      .withColumn("__rk", col(key)).drop(key)
      .withColumn("__rts", unix_micros(col(rightTs)))
      .withColumn("__rbkt", floor(col("__rts") / winUs))
    val l = left
      .withColumn("__lk", col(key))
      .withColumn("__lts", unix_micros(col(leftTs)))
      .withColumn("__lbkt",
        explode(sequence(
          floor((col("__lts") - winUs) / winUs),
          floor(col("__lts") / winUs))))
    l.join(r, col("__lbkt") === col("__rbkt") && col("__lk") === col("__rk") &&
        col("__rts") >= col("__lts") - winUs && col("__rts") <= col("__lts"))
      .drop("__lk", "__rk", "__lts", "__rts", "__lbkt", "__rbkt")
  }

  def q44IntervalJoin(spark: SparkSession, dir: String,
      windowSeconds: Long = 3600): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    intervalJoin(purchases, clicks, "user_id", "pts", "cts", windowSeconds)
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        round((unix_micros(col("pts")) - unix_micros(col("cts"))) /
          usecPerSec, 6).as("gap_s"))
      .orderBy("purchase_id", "click_id")
  }

  /** q63 — multi-touch (linear) attribution: each purchase's value is
    * split EQUALLY across all clicks by the same user in the trailing
    * hour, then credited revenue aggregates per click hour — the
    * complement of q35's last-touch (winner-take-all) attribution and
    * the standard marketing-mix shape.
    *
    * Shape: the [[intervalJoin]] bucket equi-join supplies the
    * (purchase, click) pairs; the per-purchase click count comes from
    * a window over the purchase key on those SAME pairs (no second
    * join); credits are decimal-exact (value quantized before the
    * split, credit = value/n rounded to a fixed scale so grouped sums
    * are shuffle-order independent).
    */
  def q63LinearAttribution(spark: SparkSession, dir: String,
      windowSeconds: Long = 3600): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"), col("value").as("pvalue"))
    val pairs = intervalJoin(purchases, clicks, "user_id", "pts", "cts",
      windowSeconds)
    val wP = Window.partitionBy("purchase_id")
    pairs
      .withColumn("n_touch", count(lit(1)).over(wP))
      // credit = round(value/n, 6) in IEEE double (identical in every
      // engine for positive values), then decimal so the grouped sum
      // is exact and shuffle-order independent
      .withColumn("credit",
        round(col("pvalue") / col("n_touch"), 6).cast("decimal(18,6)"))
      .groupBy(date_format(date_trunc("hour", col("cts")),
        "yyyy-MM-dd HH:mm:ss").as("click_hour"))
      .agg(count(lit(1)).as("n_credited_clicks"),
        sum(col("credit")).cast("double").as("credited_revenue"))
      .orderBy("click_hour")
  }

  /** Gap-based session ids: the lag-flag + running-sum labeling shared
    * by q38 and q48 — one user-key shuffle, session ids dense 1..k per
    * user in (ts, event_id) order.
    */
  def withSessionIds(df: DataFrame, gapSeconds: Long): DataFrame = {
    // a null ts has no position in a session's time order; Spark sorts
    // window nulls FIRST while DuckDB sorts them LAST, so keeping them
    // would give engine-dependent session splits — dropped explicitly
    // (mirrored by WHERE ts IS NOT NULL in the q38/q48/q73 oracles)
    val withTs = df.filter(col("ts").isNotNull)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    val newSession = when(
      gapUs.isNull || gapUs > gapSeconds * usecPerSec.toLong, 1L)
      .otherwise(0L)
    withTs.withColumn("session_id", sum(newSession).over(wRun))
  }

  /** q38 — sessionization: group each user's events into sessions
    * separated by gaps > 6 h (sized to this corpus's ~7 h median
    * inter-event gap; the operator is gap-parametric), then aggregate
    * per session. The classic two-window formulation
    * ([[withSessionIds]]) plus a grouped aggregate on (user, session)
    * — still the single user-key shuffle. Session bounds are emitted
    * as formatted strings (the q9 rule: formatted timestamps compare
    * exactly across engines).
    */
  def q38Sessionize(spark: SparkSession, dir: String,
      gapSeconds: Long = 6 * 3600): DataFrame = {
    withSessionIds(
      CoreQueries.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value")),
      gapSeconds)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(
        col("user_id"), col("session_id"), col("n_events"),
        date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss").as("start_s"),
        round((unix_micros(col("end_ts")) - unix_micros(col("start_ts"))) /
          usecPerSec, 6).as("duration_s"),
        col("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** q48 — session funnel (ordered-sequence analytics): per user, how
    * many gap-bounded sessions exist, how many contain a click, and how
    * many CONVERT — a purchase strictly after the session's first click
    * (ties broken by event_id, the engine-wide order key).
    *
    * Shape: the q38 session labeling plus one grouped aggregate — the
    * sequence predicate ("purchase after first click") needs only the
    * first-click (ts, event_id) and each purchase's (ts, event_id), so
    * the session group state is two scalars, never the event sequence.
    * Everything rides the SAME single user-key exchange: session window,
    * per-session aggregate ((user, session) clusters under user
    * hash-partitioning), and the final per-user rollup.
    */
  def q48SessionFunnel(spark: SparkSession, dir: String,
      gapSeconds: Long = 6 * 3600): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val orderKey = struct(col("ts"), col("event_id"))
    val sessions = withSessionIds(ev, gapSeconds)
      .groupBy("user_id", "session_id")
      .agg(
        min(when(col("event_type") === "click", orderKey))
          .as("first_click"),
        max(when(col("event_type") === "purchase", orderKey))
          .as("last_purchase"))
    sessions
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        count(col("first_click")).as("n_click_sessions"),
        count(when(col("first_click").isNotNull &&
          col("last_purchase").isNotNull &&
          (col("last_purchase.ts") > col("first_click.ts") ||
            (col("last_purchase.ts") === col("first_click.ts") &&
              col("last_purchase.event_id") > col("first_click.event_id"))),
          lit(1))).as("n_converted"))
      .orderBy("user_id")
  }

  /** q66 — gaps-and-islands: per user, runs of CONSECUTIVE active days
    * (days with >= 1 event) and the best streak — the engagement-streak
    * statistic. The classic formulation: distinct (user, day), a
    * per-user row_number over days, and `day_ordinal - row_number` as
    * the island key (constant within a gap-free run, strictly
    * increasing across gaps).
    *
    * Shape: two exchanges, each earning its place. The distinct
    * shuffles on (user, day) WITH map-side partial dedup — the wire
    * carries each partition's distinct day pairs, never the raw
    * events (a user-only repartition-first variant would be one
    * exchange but ship every event row). The window then re-keys the
    * deduped pairs (tiny: days per user) on user alone, and both
    * rollup aggregations reuse that clustering (hashpartitioning on
    * user satisfies clustering on (user, island)). Reported only for
    * users with a streak >= 3 (the filter is on an aggregate — HAVING).
    */
  /** Per-key day-streak statistics over any (key, timestamp) stream:
    * `best_streak` (longest run of consecutive active days),
    * `n_streaks`, `active_days` — the reusable gaps-and-islands
    * operator behind q66 (crafted-input specs drive THIS function, so
    * they pin the shipped dataflow, not a copy).
    */
  def dayStreaks(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", epoch: String = "2024-01-01"): DataFrame = {
    val days = events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol), to_date(col(tsCol)).as("d"))
      .distinct()
    val w = Window.partitionBy(keyCol).orderBy("d")
    days
      .withColumn("island",
        datediff(col("d"), lit(epoch)) - row_number().over(w))
      .groupBy(col(keyCol), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(keyCol)
      .agg(max(col("len")).as("best_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
  }

  def q66Streaks(spark: SparkSession, dir: String): DataFrame =
    dayStreaks(CoreQueries.events(spark, dir))
      .filter(col("best_streak") >= 3)
      .orderBy("user_id")

  /** q67 — set operators (INTERSECT / EXCEPT): the click/purchase
    * audience overlap. `intersect` and `except` are their own logical
    * operators (Catalyst plans them as distinct + left-semi/left-anti
    * hash joins — both sides shuffle once on the full row as the key),
    * distinct from the column-predicate semi/anti joins of q10/q43
    * where only the probe key is compared.
    *
    * Scale shape: the inputs are already distinct user-id sets (the
    * per-type distinct collapses events to users map-side first), so
    * the set ops shuffle 8-byte keys; the three branches reuse the
    * same two inputs and AQE plans each tiny count independently.
    */
  def q67SetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select("user_id").distinct()
    val clickers = users("click")
    val buyers = users("purchase")
    def branch(label: String, d: DataFrame) =
      d.agg(count(lit(1)).as("n_users"))
        .select(lit(label).as("cohort"), col("n_users"))
    branch("both", clickers.intersect(buyers))
      .unionByName(branch("click_only", clickers.except(buyers)))
      .unionByName(branch("purchase_only", buyers.except(clickers)))
      .orderBy("cohort")
  }

  /** q73 — ordered SEQUENCE-PATTERN matching within sessions: users
    * with a session whose event sequence contains the subsequence
    * view → click → purchase (in that order, other events freely
    * interleaved) — MATCH_RECOGNIZE-style behavioral pattern mining,
    * phrased for a shuffle engine: the session's event types collapse
    * to ONE ordered string per session (array_sort over (ts, event_id,
    * type) structs — the engine-wide composite order key — then
    * project + join), and the pattern is a regex over that string.
    *
    * Scale shape: rides the q38/q48 single user-key exchange; per-
    * session state is the type sequence (bounded by session length,
    * never corpus length), and the regex runs codegen'd per session
    * row. A pattern over a 100 TB stream is exactly this: sessionize,
    * collapse, match — never a self-join per pattern step (the k-step
    * pattern as k-way join explodes combinatorially; q48's funnel is
    * the 2-scalar special case that avoids even the sequence string).
    */
  def q73SequencePattern(spark: SparkSession, dir: String,
      gapSeconds: Long = 6 * 3600,
      pattern: String = "view.*click.*purchase"): DataFrame = {
    // null-ts events carry no position in a time sequence — dropped
    // EXPLICITLY (and mirrored in the oracle's WHERE): without the
    // filter the two engines place them differently (Spark windows
    // sort nulls first / new session, DuckDB's lag-CASE merges them
    // into the prior session) and the gate would diverge on the first
    // null-ts row
    val ev = CoreQueries.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val sessions = withSessionIds(ev, gapSeconds)
      .groupBy("user_id", "session_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ",").as("seq"))
    sessions
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("seq").rlike(pattern), lit(1))).as("n_matched"))
      .filter(col("n_matched") > 0)
      .orderBy("user_id")
  }

  /** q70 — INCREMENTAL AGGREGATION MAINTENANCE: the production shape
    * where a per-(type, day) aggregate TABLE is maintained as batches
    * land, and reports roll up from the stored partials — the corpus
    * is never re-scanned. Here the landed partial table is simulated
    * by aggregating events before the cutoff day, the fresh batch is
    * the raw events at/after it; the merge is `union + re-aggregate`,
    * which is exactly why the partials must be MERGEABLE aggregates:
    * count/sum merge by sum, min/max by min/max, and the day count
    * rides for free because day is a grain key of the partial table.
    *
    * The oracle computes the same report DIRECTLY from all raw events
    * — the hash-match of the two paths is the algebraic proof that
    * the incremental path loses nothing. (A non-mergeable statistic —
    * a median, a distinct count kept as a scalar — would fail exactly
    * this check; at scale those ride as sketches, cf. llmops.Sketches'
    * HLL union.)
    */
  /** q87 — the anomaly-history counter (G9) as a gate query: nightly
    * per-user top-10 by most-negative value (the
    * [[graft.pipeline.AnomalyPipeline.nightlyTopAnomalies]] partials)
    * counted per user over the trailing 90 days ending at the newest
    * stored night ([[graft.pipeline.AnomalyPipeline
    * .anomalyHistoryCounter]]) — the engine analog of the reference's
    * REST-archive Counter
    * (`filter_anomaly_notification/filter_utils.py:160-192`).
    */
  def q87AnomalyHistory(spark: SparkSession, dir: String): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(to_date(col("ts")).as("night"), col("user_id"),
        col("value"), col("event_id"))
    val nightly = graft.pipeline.AnomalyPipeline.nightlyTopAnomalies(
      ev, scoreCol = "value", objectIdCol = "user_id",
      nightCol = "night", n = 10, tieBreakCol = "event_id")
    graft.pipeline.AnomalyPipeline.anomalyHistoryCounter(nightly, 90)
      .select(col("object_id").as("user_id"), col("n_top_hits"))
  }

  def q70IncrementalRollup(spark: SparkSession, dir: String,
      cutoff: String = "2024-03-01"): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("value").cast("decimal(18,2)").as("v"))
    def partials(raw: DataFrame): DataFrame = raw
      .groupBy("event_type", "d")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    // null days (null ts) must land in exactly ONE side or the
    // incremental path silently diverges from the direct aggregation
    // (a null fails BOTH d < cutoff and d >= cutoff); they ride with
    // the fresh batch and form their own null-day partial group
    val landedAgg = partials(ev.filter(col("d") < lit(cutoff)))
    val freshAgg = partials(ev.filter(
      col("d") >= lit(cutoff) || col("d").isNull))
    landedAgg.unionByName(freshAgg)
      .groupBy("event_type")
      .agg(sum(col("n")).as("n_events"),
        sum(col("sv")).cast("double").as("total_value"),
        min(col("mn")).cast("double").as("min_value"),
        max(col("mx")).cast("double").as("max_value"),
        // count(d), not count(*): a null-day partial group (null ts
        // events) is not a day — matching COUNT(DISTINCT day) on the
        // direct path, which ignores nulls
        count(col("d")).as("n_days"))
      .orderBy("event_type")
  }
}
