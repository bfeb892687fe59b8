package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream operators over the `events` table: band (interval)
  * join, as-of join, tumbling windows, deterministic hash sampling.
  *
  * These are the batch forms of the streaming operators in
  * graft.streaming; the implementations are chosen for cluster scale:
  *  - the band join time-buckets both sides and runs two equi-joins
  *    (bucket, bucket+1) instead of a nested-loop theta join — shuffle
  *    volume is O(n), and each bucket pair is a hash join;
  *  - the as-of join is the union+window formulation (one shuffle by
  *    user, one sort) rather than a per-row correlated lookup;
  *  - hash sampling replaces `orderBy(rand())` so the sample is
  *    deterministic, reproducible across engines, and needs no sort.
  */
object EventOps {
  import Tables._

  def queries: Vector[Q] = Vector(
    // ---- band join via time bucketing --------------------------------
    // errors within 5 minutes after a purchase by the same user
    Q("q21_band_join",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val bucketUs = 300000000L // 5 minutes in microseconds
        val p = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("pts"),
            (unix_micros($"ts") / bucketUs).cast(LongType).as("pb"))
        val e = ev.filter($"event_type" === "error")
          .select($"user_id".as("e_user_id"), $"event_id".as("error_id"), $"ts".as("ets"),
            (unix_micros($"ts") / bucketUs).cast(LongType).as("eb"))
        def leg(shift: Int) = p.join(e,
          p("user_id") === e("e_user_id") && e("eb") === p("pb") + shift)
        leg(0).union(leg(1))
          .filter($"ets" > $"pts" && $"ets" <= $"pts" + expr("INTERVAL 5 MINUTE"))
          .select($"purchase_id", $"error_id")
          .orderBy($"purchase_id", $"error_id")
      },
      Some("""
        SELECT p.event_id AS purchase_id, e.event_id AS error_id
        FROM events p JOIN events e
          ON p.user_id = e.user_id
          AND p.event_type = 'purchase' AND e.event_type = 'error'
          AND CAST(e.ts AS TIMESTAMP) > CAST(p.ts AS TIMESTAMP)
          AND CAST(e.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
        ORDER BY purchase_id, error_id""")),

    // ---- as-of join (union + window last, scalable) ------------------
    // for every error, the most recent click by the same user at-or-before it
    Q("q22_asof_join",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", lit(0).as("kind"),
            $"event_id".as("click_id"), lit(null).cast(LongType).as("error_id"))
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts", lit(1).as("kind"),
            lit(null).cast(LongType).as("click_id"), $"event_id".as("error_id"))
        // clicks sort before errors at equal ts => "at or before" inclusive
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts", $"kind", $"click_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.union(errors)
          .withColumn("matched_click", last($"click_id", ignoreNulls = true).over(w))
          .filter($"kind" === 1)
          .select($"error_id", $"matched_click".as("click_id"))
          .orderBy($"error_id")
      },
      Some("""
        SELECT e.event_id AS error_id,
          (SELECT ARG_MAX(c.event_id, c.ts) FROM events c
           WHERE c.user_id = e.user_id AND c.event_type = 'click'
             AND CAST(c.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)) AS click_id
        FROM events e WHERE e.event_type = 'error'
        ORDER BY error_id""")),

    // ---- nearest as-of join (both directions) ------------------------
    // For every error, the click by the same user CLOSEST in time —
    // before or after — with ties preferring the earlier click. Same
    // union+window scale shape as q22 (one shuffle by user, no per-row
    // subquery): the backward candidate is `last(click)` over the
    // at-or-before frame, the forward candidate `first(click)` over
    // the strictly-after frame, then one projection picks the smaller
    // gap. Candidate tie rules are pinned: among equal-ts backward
    // clicks the largest click_id (last in (ts, click_id) order),
    // among forward the smallest — the oracle's QUALIFY re-derivation
    // states the same rules explicitly.
    Q("q89_asof_nearest",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", lit(0).as("kind"),
            struct($"ts".as("cts"), $"event_id".as("click_id")).as("c"),
            lit(null).cast(LongType).as("error_id"))
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts", lit(1).as("kind"),
            lit(null).cast(StructType(Seq(
              StructField("cts", TimestampType), StructField("click_id", LongType)))).as("c"),
            $"event_id".as("error_id"))
        val ord = Seq($"ts", $"kind", $"c.click_id", $"error_id")
        val wb = Window.partitionBy($"user_id").orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy($"user_id").orderBy(ord: _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        clicks.union(errors)
          .withColumn("b", last($"c", ignoreNulls = true).over(wb))
          .withColumn("f", first($"c", ignoreNulls = true).over(wf))
          .filter($"kind" === 1)
          .withColumn("gap_b", unix_micros($"ts") - unix_micros($"b.cts"))
          .withColumn("gap_f", unix_micros($"f.cts") - unix_micros($"ts"))
          .withColumn("pick_b",
            $"b".isNotNull && ($"f".isNull || $"gap_b" <= $"gap_f"))
          .filter($"b".isNotNull || $"f".isNotNull)
          .select($"error_id",
            when($"pick_b", $"b.click_id").otherwise($"f.click_id").as("click_id"),
            when($"pick_b", lit("before")).otherwise(lit("after")).as("direction"),
            when($"pick_b", $"gap_b").otherwise($"gap_f").as("gap_us"))
          .orderBy($"error_id")
      },
      Some("""
        WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        err AS (SELECT user_id, event_id AS error_id, ts FROM ev WHERE event_type = 'error'),
        b AS (SELECT e.error_id, c.event_id AS click_id,
                epoch_us(e.ts) - epoch_us(c.ts) AS gap
              FROM err e JOIN ev c
                ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
              QUALIFY ROW_NUMBER() OVER (PARTITION BY e.error_id
                ORDER BY c.ts DESC, c.event_id DESC) = 1),
        f AS (SELECT e.error_id, c.event_id AS click_id,
                epoch_us(c.ts) - epoch_us(e.ts) AS gap
              FROM err e JOIN ev c
                ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts > e.ts
              QUALIFY ROW_NUMBER() OVER (PARTITION BY e.error_id
                ORDER BY c.ts ASC, c.event_id ASC) = 1)
        SELECT err.error_id AS error_id,
          CASE WHEN b.gap IS NOT NULL AND (f.gap IS NULL OR b.gap <= f.gap)
               THEN b.click_id ELSE f.click_id END AS click_id,
          CASE WHEN b.gap IS NOT NULL AND (f.gap IS NULL OR b.gap <= f.gap)
               THEN 'before' ELSE 'after' END AS direction,
          CAST(CASE WHEN b.gap IS NOT NULL AND (f.gap IS NULL OR b.gap <= f.gap)
               THEN b.gap ELSE f.gap END AS BIGINT) AS gap_us
        FROM err
        LEFT JOIN b ON b.error_id = err.error_id
        LEFT JOIN f ON f.error_id = err.error_id
        WHERE b.click_id IS NOT NULL OR f.click_id IS NOT NULL
        ORDER BY err.error_id""")),

    // ---- tumbling window aggregation (batch form of streaming window)
    Q("q23_tumbling_window",
      (s, dir) => {
        import s.implicits._
        events(s, dir)
          .groupBy(window($"ts", "6 hours").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value", 4).as("total_value"))
          .select(unix_timestamp($"w.start").as("w_start"), $"event_type", $"n", $"total_value")
          .orderBy($"w_start", $"event_type")
      },
      Some(s"""
        SELECT CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP)) / 21600) * 21600 AS BIGINT) AS w_start,
          event_type, COUNT(*) AS n, ${dsumSql("value", 4)} AS total_value
        FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // ---- batch sessionization (session_window vs gaps-and-islands) --
    // Variable-length sessions per user: events within 30 minutes of
    // the previous event merge. Spark's native session_window state
    // machine against the classic lag/cumsum islands construction in
    // the oracle — two entirely different algorithms, same sessions.
    // Session end follows Spark's definition (last event + gap).
    // Scale shape: one shuffle on user_id; session merging is
    // per-partition streaming state, no self-join.
    Q("q65_sessionize",
      (s, dir) => {
        import s.implicits._
        events(s, dir)
          .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
          .agg(count(lit(1)).as("n_events"), dsum($"value", 4).as("total_value"))
          .select($"user_id", unix_timestamp($"w.start").as("s_start"),
            unix_timestamp($"w.end").as("s_end"), $"n_events", $"total_value")
          .orderBy($"user_id", $"s_start")
      },
      Some(s"""
        WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        flagged AS (SELECT user_id, event_id, ts, value,
            CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (SELECT user_id, ts, value,
            SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged),
        sess AS (SELECT user_id, sid, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
            COUNT(*) AS n_events, ${dsumSql("value", 4)} AS total_value
          FROM numbered GROUP BY user_id, sid)
        SELECT user_id,
          CAST(FLOOR(EPOCH(start_ts)) AS BIGINT) AS s_start,
          CAST(FLOOR(EPOCH(end_ts + INTERVAL 30 MINUTE)) AS BIGINT) AS s_end,
          CAST(n_events AS BIGINT) AS n_events, total_value
        FROM sess ORDER BY user_id, s_start""")),

    // ---- event funnel (ordered multi-step conversion) ----------------
    // How many users progressed view -> click (after their first view)
    // -> purchase (after that click)? Each step is one per-user
    // conditional MIN — three doc-keyed aggregates and two broadcast-
    // sized joins on user_id, no window over the full event stream and
    // no self-join of events against events. Step timestamps chain
    // strictly (>), so the funnel is genuinely ordered, not mere
    // set-membership.
    Q("q93_event_funnel",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir)
        val v = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("vts"))
        val c = ev.filter($"event_type" === "click")
          .join(v, "user_id").filter($"ts" > $"vts")
          .groupBy($"user_id").agg(min($"ts").as("cts"))
        val p = ev.filter($"event_type" === "purchase")
          .join(c, "user_id").filter($"ts" > $"cts")
          .groupBy($"user_id").agg(min($"ts").as("pts"))
        v.agg(count(lit(1)).as("n_viewed"))
          .crossJoin(c.agg(count(lit(1)).as("n_clicked_after")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchased_after")))
      },
      Some("""
        WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        v AS (SELECT user_id, MIN(ts) AS vts FROM ev WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS cts FROM ev e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.vts GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS pts FROM ev e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.cts GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
               (SELECT COUNT(*) FROM c) AS n_clicked_after,
               (SELECT COUNT(*) FROM p) AS n_purchased_after""")),

    // ---- retention cohorts --------------------------------------------
    // The classic retention triangle: users grouped by first-activity
    // week (cohort), counted in each later week they return. Weeks are
    // integer epoch-microsecond divisions — exact in both engines, no
    // date arithmetic to drift. Two shuffles total: the per-user
    // cohort aggregate and the (cohort, offset) count-distinct.
    Q("q94_retention_cohorts",
      (s, dir) => {
        import s.implicits._
        val weekUs = 604800000000L
        val act = events(s, dir)
          .select($"user_id", expr(s"unix_micros(ts) div $weekUs").as("wk"))
          .distinct()
        val cohort = act.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
        act.join(cohort, "user_id")
          .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
          .agg(countDistinct($"user_id").as("n_users"))
          .orderBy($"cohort_wk", $"week_offset")
      },
      Some("""
        WITH act AS (SELECT DISTINCT user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
          FROM events),
        cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY user_id)
        SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset,
          CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM act a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""")),

    // ---- deterministic hash sample (A4-analogue, reproducible) -------
    Q("q24_hash_sample",
      (s, dir) => {
        import s.implicits._
        // ~1/8 deterministic sample: first hex digit of md5(key) in 0..1
        events(s, dir)
          .filter(substring(md5($"event_id".cast(StringType)), 1, 1).isin("0", "1"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_sampled"), dsum($"value", 4).as("value_sum"))
          .orderBy($"event_type")
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n_sampled, ${dsumSql("value", 4)} AS value_sum
        FROM events
        WHERE SUBSTRING(MD5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0', '1')
        GROUP BY event_type ORDER BY event_type""")),

    // ---- SCD-2 dimension-history build (q155) ------------------------
    // The classic warehouse history table the CDC family was missing:
    // q111 is SCD-1 (overwrite), q112 diffs snapshots; THIS builds the
    // type-2 validity-interval history from a change stream. Per user,
    // the tracked attribute is the event_type "state": collapse
    // consecutive duplicates (a repeated state is not a new version),
    // then version the change points and close each interval with the
    // next change's timestamp (NULL valid_to = current row).
    // Timestamps publish as epoch MICROS (BIGINT) — the engine's
    // cross-engine-exact convention (q89's epoch_us arithmetic).
    // Scale: both windows share ONE (user_id)-hash exchange (same
    // partitioning + ordering; the change-point filter preserves the
    // partitioning, so the second sort is exchange-free). Per-user
    // streams bound window state exactly as in q65 — there is no
    // global window anywhere.
    Q("q155_scd2_history",
      (s, dir) => {
        import s.implicits._
        scd2(s, dir)
          .withColumn("is_current", $"valid_to".isNull)
          .orderBy($"user_id", $"version")
      },
      Some(s"""
        WITH $scd2Cte
        SELECT user_id, version, state,
          CAST(valid_from AS BIGINT) AS valid_from,
          CAST(valid_to AS BIGINT) AS valid_to,
          (valid_to IS NULL) AS is_current
        FROM hist ORDER BY user_id, version""")),

    // ---- as-of feature snapshot (q165) -------------------------------
    // The OTHER half of the q161 leakage story: q161 joins facts to
    // the dimension version valid at event time; this MATERIALIZES
    // the per-user feature vector AS OF a cutoff — trailing-window
    // counts, value sums, recency, last action — computed STRICTLY
    // from events at-or-before the cutoff, with post-cutoff events in
    // the corpus as live leakage bait (cutoff = max ts − 7 days, so a
    // leaky implementation would change the published numbers). This
    // is the feature-store materialization job (what a training run
    // reads at time T); all window arithmetic is epoch-micro integers,
    // the last action rides a (ts, event_id, type) struct-argmax
    // (event_id unique ⇒ deterministic), and users whose history is
    // entirely post-cutoff are absent by definition (they did not
    // exist at T).
    //
    // Scale: one corpus scan filtered against the broadcast 1-row
    // cutoff (BNLJ whitelisted), then ONE user-keyed partial-combined
    // aggregate carrying every feature as a conditional agg — adding
    // a feature adds zero passes, the q151 ANALYZE principle.
    Q("q165_feature_snapshot",
      (s, dir) => {
        import s.implicits._
        val day = 86400000000L
        val ev = events(s, dir)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
            $"event_type", $"value")
        val cut = ev.agg((max($"us") - lit(7L * day)).as("cut"))
        ev.crossJoin(broadcast(cut))
          .filter($"us" <= $"cut")
          .groupBy($"user_id")
          .agg(
            count(lit(1)).as("n_total"),
            sum(when($"us" > $"cut" - lit(30L * day), 1L).otherwise(0L)).as("n_30d"),
            sum(when($"us" > $"cut" - lit(7L * day), 1L).otherwise(0L)).as("n_7d"),
            dsum(when($"us" > $"cut" - lit(30L * day), $"value"), 4).as("value_30d"),
            max($"us").as("last_us"),
            max(struct($"us", $"event_id", $"event_type")).getField("event_type")
              .as("last_type"),
            first($"cut").as("c"))
          .select($"user_id", $"n_total", $"n_30d", $"n_7d",
            coalesce($"value_30d", lit(0.0)).as("value_30d"), $"last_us",
            expr("CAST((c - last_us) div 86400000000 AS BIGINT)").as("days_idle"),
            $"last_type")
          .orderBy($"user_id")
      },
      Some(s"""
        WITH ev AS (SELECT user_id, event_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value FROM events),
        cut AS (SELECT MAX(us) - 7 * 86400000000 AS c FROM ev)
        SELECT user_id,
          CAST(COUNT(*) AS BIGINT) AS n_total,
          CAST(SUM(CASE WHEN us > c - 30 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_30d,
          CAST(SUM(CASE WHEN us > c - 7 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
          COALESCE(${dsumSql("CASE WHEN us > c - 30 * 86400000000 THEN value END", 4)}, 0.0) AS value_30d,
          CAST(MAX(us) AS BIGINT) AS last_us,
          CAST((ANY_VALUE(c) - MAX(us)) // 86400000000 AS BIGINT) AS days_idle,
          (MAX({'t': us, 'e': event_id, 'y': event_type}))['y'] AS last_type
        FROM ev, cut WHERE us <= c
        GROUP BY user_id ORDER BY user_id""")),

    // ---- point-in-time-correct enrichment join (q161) ----------------
    // The feature-store join that prevents training-serving LEAKAGE
    // (Feast's get_historical_features semantics): each fact row is
    // enriched with the dimension version that was valid AT ITS EVENT
    // TIME — never the current one, never a future one. Dimension =
    // q155's SCD-2 history; facts = the event stream itself, which
    // makes the contract self-checking: intervals are half-open
    // [valid_from, valid_to) and per-user disjoint, so EVERY event
    // matches exactly one version (same-timestamp transitions create
    // empty intervals that match nothing) and the output row count
    // must equal the event count — the oracle's row-count compare
    // enforces completeness, its cell compare enforces correctness.
    //
    // Scale: an EQUI-join on user_id (the stream's natural
    // distribution) with the interval test as a post-probe residual —
    // per-user version counts are bounded by the change rate, so the
    // residual scans a handful of versions per probe; never an
    // unbounded range join, never a broadcast hint (both sides are
    // corpus-derived; the history is usually the small side and AQE
    // may broadcast it when it measures small).
    Q("q161_pit_join",
      (s, dir) => {
        import s.implicits._
        val ev = events(s, dir).select($"event_id", $"user_id",
          unix_micros($"ts").as("ts_us"), $"event_type")
        val dim = scd2(s, dir)
          .select($"user_id", $"version", $"state", $"valid_from", $"valid_to")
        ev.join(dim, Seq("user_id"))
          .filter($"ts_us" >= $"valid_from" &&
            ($"valid_to".isNull || $"ts_us" < $"valid_to"))
          .select($"event_id", $"user_id", $"ts_us", $"event_type",
            $"state", $"version")
          .orderBy($"event_id")
      },
      Some(s"""
        WITH $scd2Cte
        SELECT e.event_id, e.user_id, epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
          e.event_type, h.state, h.version
        FROM events e JOIN hist h ON h.user_id = e.user_id
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= h.valid_from
          AND (h.valid_to IS NULL OR epoch_us(CAST(e.ts AS TIMESTAMP)) < h.valid_to)
        ORDER BY e.event_id""")),

    // ---- next-event-prediction dataset (q174, new r7) -----------------
    // The behavioral-LM training-data builder: per user, the event
    // stream in (epoch-µs, event_id) order becomes sliding
    // (3-event context → next event) training pairs — the event-log
    // twin of next-token prediction, and the dataset a
    // recommendation / journey model trains on. Published as the
    // top-20 (context, next) pair counts: the transition table a
    // modeler eyeballs for degenerate loops (one dominant
    // context→next pair = a tracking bug, not behavior) before
    // training on the full pair stream.
    //
    // Scale: ONE user-keyed window exchange (lag ×3 share the same
    // window frame — q09's class, bounded by per-user history), then
    // a partial-combined (context, next) count whose key space is
    // |event_types|^4, corpus-independent; top-20 is orderBy.limit
    // (TakeOrderedAndProject). Ordering is epoch-µs + event_id on
    // BOTH engines (Spark truncates parquet ns to µs; DuckDB
    // TIMESTAMP is µs) — the established EventOps contract.
    Q("q174_event_lm_dataset",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"), $"event_id")
        events(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("e1", lag($"event_type", 3).over(w))
          .withColumn("e2", lag($"event_type", 2).over(w))
          .withColumn("e3", lag($"event_type", 1).over(w))
          .filter($"e1".isNotNull)
          .select(concat_ws(" > ", $"e1", $"e2", $"e3").as("ctx"),
            $"event_type".as("next_event"))
          .groupBy($"ctx", $"next_event").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"ctx", $"next_event")
          .limit(20)
      },
      Some("""
        WITH o AS (SELECT user_id, event_type,
            LAG(event_type, 3) OVER w AS e1,
            LAG(event_type, 2) OVER w AS e2,
            LAG(event_type, 1) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id))
        SELECT e1 || ' > ' || e2 || ' > ' || e3 AS ctx,
          event_type AS next_event, CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE e1 IS NOT NULL
        GROUP BY 1, 2 ORDER BY n DESC, ctx, next_event LIMIT 20""")),

    // ---- session-gap dial (q210) -------------------------------------
    // q65 sessionizes at ONE gap (30 min); this prices the whole dial —
    // the session count and mean session length at every candidate gap
    // G ∈ {5 min, 30 min, 2 h, 12 h} — the table a pipeline owner reads
    // BEFORE freezing the session_window parameter (and the state-size
    // planning input for the streaming form: open-session state scales
    // with sessions-per-watermark). The identity that makes it one
    // pass: n_sessions(G) = n_users + #{intra-user gaps ≥ G} (each
    // user's first event opens a session; every qualifying gap opens
    // one more — q65's `>=` boundary contract verbatim), so the whole
    // curve is ONE lag window over (user, time) and one aggregate with
    // per-G conditional sums; no per-G re-sessionization. Gaps ride
    // exact BIGINT microseconds (unix_micros/epoch_us — the engines'
    // shared timestamp grid).
    //
    // Scale: one exchange (user-partitioned window — the q65 shape),
    // one 1-row aggregate, a 4-row stack publish. The curve is
    // non-increasing in G by construction (suffix counts) — spec'd.
    Q("q210_session_gap_curve",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val gapsMin = Seq(5L, 30L, 120L, 720L)
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        val g = events(s, dir)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
          .withColumn("gap", $"us" - lag($"us", 1).over(w))
        val aggCols = Seq(
          sum(when($"gap".isNull, 1L).otherwise(0L)).as("n_users")) ++
          gapsMin.map(m => sum(when($"gap" >= m * 60000000L, 1L).otherwise(0L))
            .as(s"b$m"))
        val agg = g.agg(count(lit(1)).as("n_events"), aggCols: _*)
        val stackExpr = gapsMin.map(m =>
          s"CAST($m AS BIGINT), n_users + b$m").mkString(
          s"stack(${gapsMin.size}, ", ", ", ") AS (gap_minutes, n_sessions)")
        agg.selectExpr("n_events", stackExpr)
          .select($"gap_minutes", $"n_sessions",
            round($"n_events".cast(org.apache.spark.sql.types.DoubleType)
              / $"n_sessions", 6).as("avg_events_per_session"))
          .orderBy($"gap_minutes")
      },
      Some {
        val legs = Seq(5L, 30L, 120L, 720L).map(m => s"""
        SELECT CAST($m AS BIGINT) AS gap_minutes,
          n_users + b$m AS n_sessions,
          ROUND(CAST(n_events AS DOUBLE) / (n_users + b$m), 6)
            AS avg_events_per_session FROM agg""")
        s"""
        WITH e AS (SELECT user_id, event_id,
                     epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        g AS (SELECT us - LAG(us) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS gap FROM e),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(SUM(CASE WHEN gap IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
          ${Seq(5L, 30L, 120L, 720L).map(m =>
            s"CAST(SUM(CASE WHEN gap >= ${m * 60000000L} THEN 1 ELSE 0 END) AS BIGINT) AS b$m")
            .mkString(",\n          ")}
        FROM g)
        SELECT gap_minutes, n_sessions, avg_events_per_session FROM (
        ${legs.mkString("\n        UNION ALL ")}) c
        ORDER BY gap_minutes"""
      })
  )

  /** q155's SCD-2 history build, shared with q161's point-in-time
    * join: per user, consecutive-duplicate states collapse, change
    * points are versioned, each interval closes at the next change
    * (NULL valid_to = current). Both windows ride ONE user_id
    * exchange; timestamps are epoch micros (cross-engine-exact). */
  private def scd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(s, dir).select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"event_type")
      .withColumn("version", row_number().over(w))
      .withColumn("next_ts", lead($"ts", 1).over(w))
      .select($"user_id", $"version", $"event_type".as("state"),
        unix_micros($"ts").as("valid_from"),
        unix_micros($"next_ts").as("valid_to"))
  }

  /** Oracle twin of [[scd2]], ending in `hist(user_id, version, state,
    * valid_from, valid_to)` — one source of truth for both oracles. */
  private val scd2Cte: String = """
        ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
               FROM events),
        ch AS (SELECT user_id, event_id, ts, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM ev),
        chg AS (SELECT user_id, event_id, ts, event_type FROM ch
                WHERE prev IS NULL OR prev <> event_type),
        hist AS (SELECT user_id,
                   CAST(ROW_NUMBER() OVER w AS INT) AS version,
                   event_type AS state,
                   epoch_us(ts) AS valid_from,
                   epoch_us(LEAD(ts) OVER w) AS valid_to
                 FROM chg WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"""
}
