package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.E — window functions.
  *
  * Every window partitions on a real entity key (customer / user), so at
  * scale the single shuffle that feeds the window is hash-partitioned by
  * that key and each partition sorts locally — no global sort, no driver
  * involvement. Frames that need time arithmetic order on unix_micros
  * (exact integers) rather than floating epoch seconds, so frame-boundary
  * comparisons are bit-exact and match the DuckDB oracle.
  */
object Windows extends QueryModule {

  def all: Seq[Q] = Seq(
    // Sweep-line concurrency census (round 12): peak simultaneous
    // 30-minute-gap sessions per day — the capacity question ("how many
    // users at once?") interval analytics answers. Each session emits
    // +1/−1 endpoints; the running sum is a window PARTITIONED BY DAY
    // (ordered us, +1 before −1 at an instant — inclusive overlap), and
    // sessions spanning midnight contribute an integer CARRY-IN to each
    // later day they touch (≤2-day spans for gap sessions, bounded
    // fan-out) — so no global sort exists at any scale. Tied endpoints
    // are interchangeable within a delta group (the day-max is invariant
    // under their order), and all state is integer: engine-exact.
    Q(
      "win_concurrency",
      (s, dir) => {
        val D = 86400000000L
        val sess = graft.api.Pipeline.sessionize(
            Tables.events(s, dir), col("user_id"), col("ts"),
            col("event_id"), gapMinutes = 30)
          .groupBy(col("sess_key"), col("session_seq"))
          .agg(min("sess_us").as("st"), max("sess_us").as("en"))
          .select(col("st"), col("en"),
            expr(s"st div ${D}L").as("st_day"),
            expr(s"en div ${D}L").as("en_day"))
        val pts = sess.select(col("st_day").as("day"), col("st").as("us"),
            lit(1L).as("delta"))
          .unionAll(sess.select(col("en_day").as("day"), col("en").as("us"),
            lit(-1L).as("delta")))
        // sequence() runs DESCENDING when start > stop in Spark — guard
        // the no-carry (single-day) sessions out before the explode.
        val carry = sess.filter(col("en_day") > col("st_day"))
          .select(explode(sequence(col("st_day") + 1, col("en_day")))
            .as("day"))
          .groupBy("day").agg(count(lit(1)).as("carry_in"))
        val w = Window.partitionBy("day")
          .orderBy(col("us"), col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // FULL outer join + greatest(peak, 0): a day whose only
        // endpoints are carried-session ENDS has a negative running-sum
        // peak (true peak = the day-start baseline, carry_in itself),
        // and a ≥3-day session's middle days have carry but no
        // endpoints at all — both day classes must still report.
        pts.withColumn("run", sum("delta").over(w))
          .groupBy("day")
          .agg(max("run").as("peak"),
            sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"))
          .join(carry, Seq("day"), "full_outer")
          .select(col("day"),
            coalesce(col("n_starts"), lit(0L)).as("n_starts"),
            coalesce(col("carry_in"), lit(0L)).as("carry_in"),
            (coalesce(col("carry_in"), lit(0L)) +
              greatest(coalesce(col("peak"), lit(0L)), lit(0L)))
              .as("max_concurrent"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        flagged AS (
          SELECT user_id, event_id, us,
                 CASE WHEN us - lag(us) OVER w > 1800000000
                        OR lag(us) OVER w IS NULL
                      THEN 1 ELSE 0 END AS is_new
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        sessed AS (
          SELECT user_id, us,
                 CAST(sum(is_new) OVER (PARTITION BY user_id
                                        ORDER BY us, event_id
                                        ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_seq
          FROM flagged),
        sess AS (
          SELECT user_id, session_seq, min(us) AS st, max(us) AS en
          FROM sessed GROUP BY 1, 2),
        pts AS (
          SELECT st // 86400000000 AS day, st AS us,
                 CAST(1 AS BIGINT) AS delta FROM sess
          UNION ALL
          SELECT en // 86400000000, en, CAST(-1 AS BIGINT) FROM sess),
        carry AS (
          SELECT day, CAST(count(*) AS BIGINT) AS carry_in FROM (
            SELECT unnest(generate_series(st // 86400000000 + 1,
                                          en // 86400000000)) AS day
            FROM sess WHERE en // 86400000000 > st // 86400000000)
          GROUP BY 1),
        runs AS (
          SELECT day, delta,
                 sum(delta) OVER (PARTITION BY day
                                  ORDER BY us, delta DESC
                                  ROWS UNBOUNDED PRECEDING) AS run
          FROM pts),
        agg AS (
          SELECT day, CAST(max(run) AS BIGINT) AS peak,
                 CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_starts
          FROM runs GROUP BY 1)
        SELECT coalesce(agg.day, carry.day) AS day,
               CAST(coalesce(n_starts, 0) AS BIGINT) AS n_starts,
               CAST(coalesce(carry_in, 0) AS BIGINT) AS carry_in,
               CAST(coalesce(carry_in, 0) +
                    greatest(coalesce(peak, 0), 0) AS BIGINT)
                 AS max_concurrent
        FROM agg FULL OUTER JOIN carry ON carry.day = agg.day
        ORDER BY coalesce(agg.day, carry.day)""")),

    // row_number / rank / dense_rank / ntile per customer. row_number and
    // ntile order by a total order (tie-break on o_orderkey) so they're
    // deterministic; rank/dense_rank use the value order alone, which is
    // deterministic in value even with ties.
    Q(
      "win_rank",
      (s, dir) => {
        val total = Window.partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        val byValue = Window.partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"))
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            row_number().over(total).as("rn"),
            rank().over(byValue).as("rnk"),
            dense_rank().over(byValue).as("drnk"),
            ntile(4).over(total).as("quartile"))
          .orderBy("o_orderkey")
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
               rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
               dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
               CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS quartile
        FROM orders
        ORDER BY o_orderkey""")),

    // Top-3 orders per customer: rank window + filter — Spark pushes the
    // rn<=3 filter into the window sort as a group-limit at scale.
    Q(
      "win_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, rn FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn""")),

    // The same top-k-per-group SEMANTICS as win_topk_per_group, executed by
    // the engine's own physical operator instead of a window: the custom
    // TopKPerGroup logical node plans (via TopKPerGroupStrategy, registered
    // through SparkSessionExtensions / session.experimental) as a map-side
    // bounded-heap pass, ONE shuffle of at most groups·k rows per input
    // partition, and a final heap merge — no SortExec, no WindowExec, no
    // rank materialized for rows outside the top k. The window form sorts
    // every row of every group (O(n log n), spills at 100 TB); this is
    // O(n log k) with O(groups·k) state. The order includes the unique
    // (l_orderkey, l_linenumber) tiebreaker, making the kept row SET total
    // and the key DuckDB-checkable. Plan shape pinned in TopKPlanSpec.
    Q(
      "topk_physical",
      (s, dir) => {
        val top = graft.api.Plans.topKPerGroup(
          Tables.lineitem(s, dir)
            .select(col("l_returnflag"), col("l_linestatus"),
              col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice")),
          groupCols = Seq("l_returnflag", "l_linestatus"),
          orderCols = Seq(
            ("l_extendedprice", true), ("l_orderkey", false),
            ("l_linenumber", false)),
          k = 4)
        top.orderBy("l_returnflag", "l_linestatus",
          "l_orderkey", "l_linenumber")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
               l_extendedprice
        FROM (
          SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
                 l_extendedprice,
                 row_number() OVER (
                   PARTITION BY l_returnflag, l_linestatus
                   ORDER BY l_extendedprice DESC, l_orderkey ASC,
                            l_linenumber ASC) AS rn
          FROM lineitem)
        WHERE rn <= 4
        ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber""")),

    // Inter-event gap per user via lag/lead on exact microsecond epochs.
    Q(
      "win_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(asc("ts"), asc("event_id"))
        Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"), col("event_type"),
            (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
              .as("gap_us"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, user_id, event_type,
               epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
               lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
        ORDER BY event_id""")),

    // Running (cumulative) sum/count per user: ROWS frame, so partial sums
    // accumulate in identical order on both engines.
    Q(
      "win_running_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(asc("ts"), asc("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"),
            round(sum(col("value")).over(w), 4).as("running_value"),
            count(lit(1)).over(w).as("running_n"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, user_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
               count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        FROM events
        ORDER BY event_id""")),

    // Trailing 1-hour moving average per user: RANGE frame over integer
    // microseconds (not float seconds) for exact boundary semantics.
    Q(
      "win_range_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0L)
        Tables.events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts")))
          .select(
            col("event_id"), col("user_id"),
            round(avg(col("value")).over(w), 4).as("avg_1h"),
            count(lit(1)).over(w).as("n_1h"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, user_id,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS avg_1h,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h
        FROM events
        ORDER BY event_id""")),

    // Moving average over a ROWS frame (previous 5 rows + current) — the
    // frame SURVEY §2.E calls `rowsBetween`; distinct from the RANGE frame
    // above in how peers are counted.
    Q(
      "win_moving_rows",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(asc("ts"), asc("event_id"))
          .rowsBetween(-5, 0)
        Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"),
            round(avg(col("value")).over(w), 4).as("avg_6rows"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, user_id,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 5 PRECEDING AND CURRENT ROW), 4) AS avg_6rows
        FROM events
        ORDER BY event_id""")),

    // Distribution windows: percent_rank and cume_dist of each customer's
    // balance within their nation — relative standing without a self-join.
    Q(
      "win_percent_cume",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // c_acctbal ties would make the rank functions order-dependent per
        // engine; the composite ordering value is unique per customer.
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal") * 1000000000.0 + col("c_custkey"))
        Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"),
            round(percent_rank().over(w), 4).as("pr"),
            round(cume_dist().over(w), 4).as("cd"))
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey, c_nationkey,
               round(percent_rank() OVER w, 4) AS pr,
               round(cume_dist() OVER w, 4) AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal * 1000000000.0 + c_custkey)
        ORDER BY c_custkey""")),

    // Value-navigation window functions (first/last/nth over an explicit
    // full frame): per-partition reference values attached to every row.
    // The frame must be spelled out — the default frame stops at CURRENT
    // ROW, which silently turns last_value into "current value" in both
    // engines. Ordering is tie-broken on o_orderkey so the navigated
    // values are unique and engine-independent.
    Q(
      "win_nth_value",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(asc("o_totalprice"), asc("o_orderkey"))
        val wf = w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"),
            first(col("o_totalprice")).over(wf).as("cheapest"),
            last(col("o_totalprice")).over(wf).as("priciest"),
            nth_value(col("o_totalprice"), 10).over(wf).as("tenth_cheapest"))
          .orderBy("o_orderkey")
      },
      oracle = Some("""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               first_value(o_totalprice) OVER w AS cheapest,
               last_value(o_totalprice)  OVER w AS priciest,
               nth_value(o_totalprice, 10) OVER w AS tenth_cheapest
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey""")),

    // Equal-frequency bucketing: ntile quartiles of account balance per
    // market segment — the binning pass behind decile/quartile features.
    // Both engines put the remainder rows in the LEADING buckets, so a
    // unique total order (balance then key) makes tiles engine-exact.
    Q(
      "win_ntile",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(asc("c_acctbal"), asc("c_custkey"))
        Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            ntile(4).over(w).as("bal_quartile"))
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               ntile(4) OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal ASC, c_custkey ASC)
                 AS bal_quartile
        FROM customer ORDER BY c_custkey"""))
  ,

    // Gaps-and-islands: longest consecutive-day purchase streak per user.
    // The classic day - row_number() island key — all integer math on
    // epoch-days, so engine-exact. Two shuffles (distinct days, then the
    // per-user window), both on user_id; island lengths aggregate
    // map-side. The streak question is the canonical retention feature at
    // any scale.
    Q(
      "win_streak",
      (s, dir) =>
        graft.api.Pipeline.streaks(
            Tables.events(s, dir).filter(col("event_type") === "purchase"),
            col("user_id"), expr("unix_micros(ts) div 86400000000"))
          .select(col("k").as("user_id"), col("n_streaks"),
            col("longest_streak"), col("n_active_days"))
          .orderBy("user_id"),
      oracle = Some("""
        WITH d AS (
          SELECT DISTINCT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
          FROM events WHERE event_type = 'purchase'),
        r AS (SELECT user_id, day,
                     row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
              FROM d),
        s AS (SELECT user_id, day - rn AS grp, count(*) AS len
              FROM r GROUP BY 1, 2)
        SELECT user_id,
               count(*) AS n_streaks,
               CAST(max(len) AS BIGINT) AS longest_streak,
               CAST(sum(len) AS BIGINT) AS n_active_days
        FROM s GROUP BY user_id ORDER BY user_id""")),

    // Running COUNT(DISTINCT) over a window — which Spark (and most
    // engines) won't evaluate directly — via the first-occurrence-flag
    // trick: flag each row that introduces a new (user, event_type), then
    // a running SUM of flags over the user's timeline IS the distinct
    // count so far. Two windows, both partitioned on user_id, so one
    // shuffle; no per-row state blowup at any scale.
    Q(
      "win_running_distinct",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("mu"))
        val wFirst = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "event_type").orderBy("mu")
        val wRun = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("mu")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("is_first",
            when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
          .withColumn("n_types_seen", sum(col("is_first")).over(wRun))
          .select(col("event_id"), col("user_id"), col("n_types_seen"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH f AS (
          SELECT event_id, user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS mu,
                 CASE WHEN row_number() OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY epoch_us(CAST(ts AS TIMESTAMP))) = 1
                   THEN 1 ELSE 0 END AS is_first
          FROM events)
        SELECT event_id, user_id,
               CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY mu
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_types_seen
        FROM f ORDER BY event_id""")),

    // Forward-fill (gap-fill) — the timeseries repair primitive: error
    // events are treated as missing readings and carry the user's last
    // good value forward via last(..., ignoreNulls) over a running
    // frame. Values are copied, never combined, so floats stay
    // bit-exact; leading gaps (no prior good value) stay null.
    Q(
      "win_gap_fill",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("v",
            when(col("event_type") =!= "error", col("value")))
          .select(col("event_id"), col("user_id"), col("v"),
            last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, user_id,
               CASE WHEN event_type <> 'error' THEN value END AS v,
               last_value(CASE WHEN event_type <> 'error' THEN value END
                 IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS v_filled
        FROM events ORDER BY event_id""")),

    // Rolling z-score anomaly signal: each reading scored against the
    // trailing 20-row mean/stddev of ITS OWN user stream — the streaming
    // alternative to the global screen in agg_outliers. A float window
    // sum is NOT order-free across engines on SLIDING frames (DuckDB's
    // segment tree vs Spark's per-frame recompute differ in the last
    // ulp — measured), so the frame sums run on ×1000-quantized
    // INTEGERS and mean/z come out of one shared double formula.
    // Single-row frames yield null z on both sides.
    Q(
      "win_rolling_z",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
          .rowsBetween(-19, 0)
        val d = (c: org.apache.spark.sql.Column) => c.cast("double")
        val ev = Tables.events(s, dir)
          .withColumn("vq", round(col("value") * 1000, 0).cast("long"))
        val s1 = sum(col("vq")).over(w)
        val s2 = sum(col("vq") * col("vq")).over(w)
        val n = count(lit(1)).over(w)
        ev.select(col("event_id"), col("user_id"),
            // s1/(n·1000) terminates at 5 decimals (n ≤ 20 ⇒ denominator
            // 20000 = 2^5·5^4), so round(…,4) would sit exactly on the
            // half-way knife edge — round at 6 is past the exact width.
            round(d(s1) / d(n) / 1000.0, 6).as("roll_mean"),
            round(when(n >= 2,
              (d(col("vq")) - d(s1) / d(n)) /
                sqrt((d(s2) - d(s1) * d(s1) / d(n)) / (d(n) - 1.0))),
              4).as("roll_z"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH q AS (
          SELECT event_id, user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS mu,
                 CAST(round(value * 1000, 0) AS BIGINT) AS vq
          FROM events),
        f AS (
          SELECT event_id, user_id, vq,
                 sum(vq) OVER w AS s1,
                 sum(vq * vq) OVER w AS s2,
                 count(*) OVER w AS n
          FROM q
          WINDOW w AS (PARTITION BY user_id ORDER BY mu, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id,
               round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0, 6)
                 AS roll_mean,
               round(CASE WHEN n >= 2 THEN
                 (CAST(vq AS DOUBLE) -
                  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) /
                 sqrt((CAST(s2 AS DOUBLE) -
                       CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
                       CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
                 END, 4) AS roll_z
        FROM f ORDER BY event_id""")),

    // Linear interpolation of missing readings — win_gap_fill's LOCF
    // upgraded to time-weighted repair: each error-row reading is
    // reconstructed from the last good value before and the first good
    // value after, weighted by microsecond distance. Neighbor values and
    // times are SELECTED (last/first over directional frames, floats
    // untouched); the interpolation itself is one shared double formula
    // over exact integer times. Edges (no neighbor on one side) fall
    // back to the available side.
    Q(
      "win_interpolate",
      (s, dir) => {
        val ord = Seq(unix_micros(col("ts")).asc, col("event_id").asc)
        val wb = Window.partitionBy("user_id").orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wf = Window.partitionBy("user_id").orderBy(ord: _*)
          .rowsBetween(1, Window.unboundedFollowing)
        val ev = Tables.events(s, dir)
          .withColumn("mu", unix_micros(col("ts")))
          .withColumn("good",
            when(col("event_type") =!= "error", col("value")))
          .withColumn("gmu",
            when(col("event_type") =!= "error", col("mu")))
        val vp = last(col("good"), ignoreNulls = true).over(wb)
        val tp = last(col("gmu"), ignoreNulls = true).over(wb)
        val vn = first(col("good"), ignoreNulls = true).over(wf)
        val tn = first(col("gmu"), ignoreNulls = true).over(wf)
        val interp = when(col("good").isNotNull, col("good"))
          .when(vp.isNotNull && vn.isNotNull,
            vp + (vn - vp) * (col("mu") - tp).cast("double") /
              (tn - tp).cast("double"))
          .otherwise(coalesce(vp, vn))
        ev.select(col("event_id"), col("user_id"),
            col("good").isNull.as("was_missing"),
            round(interp, 4).as("v_interp"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_id, user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS mu,
                 CASE WHEN event_type <> 'error' THEN value END AS good,
                 CASE WHEN event_type <> 'error'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS gmu
          FROM events),
        f AS (
          SELECT event_id, user_id, mu, good,
                 last_value(good IGNORE NULLS) OVER wb AS vp,
                 last_value(gmu IGNORE NULLS) OVER wb AS tp,
                 first_value(good IGNORE NULLS) OVER wf AS vn,
                 first_value(gmu IGNORE NULLS) OVER wf AS tn
          FROM e
          WINDOW wb AS (PARTITION BY user_id ORDER BY mu, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               wf AS (PARTITION BY user_id ORDER BY mu, event_id
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        SELECT event_id, user_id,
               good IS NULL AS was_missing,
               round(CASE
                 WHEN good IS NOT NULL THEN good
                 WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
                   vp + (vn - vp) * CAST(mu - tp AS DOUBLE) /
                        CAST(tn - tp AS DOUBLE)
                 ELSE coalesce(vp, vn) END, 4) AS v_interp
        FROM f ORDER BY event_id""")),

    // Rolling 3-day distinct users per event type — the WAU/MAU family's
    // hard case: DISTINCT doesn't compose over window frames (yesterday's
    // and today's sets overlap), so the window collects the per-day
    // distinct SETS and unions them. Two-level cardinality discipline:
    // the data-sized distinct happens in the day-grain pre-aggregate
    // (shuffle on (type, day)); the set-union window then runs over
    // day-cardinality rows only — at 100 TB the window sees
    // types × days rows regardless of event volume. Rolling values vary
    // 53..122 of 150 users on this corpus — genuinely discriminating.
    Q(
      "win_rolling_distinct",
      (s, dir) => {
        val day = expr("unix_micros(ts) div 86400000000")
        val daily = Tables.events(s, dir)
          .select(col("event_type"), day.as("day"), col("user_id"))
          .distinct()
          .groupBy("event_type", "day")
          .agg(collect_set("user_id").as("us"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rangeBetween(-2, 0)
        daily
          .withColumn("wau_3d",
            size(array_distinct(flatten(collect_list("us").over(w)))))
          .select(col("event_type"), col("day"),
            size(col("us")).as("n_users_day"), col("wau_3d"))
          .orderBy("event_type", "day")
      },
      oracle = Some("""
        WITH d AS (
          SELECT DISTINCT event_type,
                 CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                 user_id
          FROM events),
        days AS (SELECT event_type, day, count(*) AS n_users_day
                 FROM d GROUP BY 1, 2)
        SELECT event_type, day, n_users_day,
               (SELECT count(DISTINCT d2.user_id) FROM d d2
                WHERE d2.event_type = days.event_type
                  AND d2.day BETWEEN days.day - 2 AND days.day)
                 AS wau_3d
        FROM days ORDER BY event_type, day""")),

    // Bollinger volatility bands over the zero-filled daily event-count
    // series per type (round 13) — the ops-monitoring companion to
    // win_rolling_z (per-entity anomaly z) and agg_changepoint_cusum
    // (retrospective location): bands answer "is TODAY's volume inside
    // its own recent volatility envelope", the alert primitive volume
    // monitors page on. Window = 7 full days (rowsBetween −6..0, short
    // warm-up rows dropped by the n=7 filter); the series is
    // calendar-densified exactly like agg_autocorr so a silent zero-day
    // WIDENS the band and shows up instead of vanishing. Discipline:
    // daily counts are exact integers, window sums s1/s2 are exact
    // integer sums, and mid/σ/bands evaluate ONE fixed double tree from
    // them — identical in the oracle.
    Q(
      "win_bollinger",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type").as("et"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x0"))
        val filled = daily.groupBy("et")
          .agg(min("day").as("lo"), max("day").as("hi"))
          .select(col("et"),
            explode(sequence(col("lo"), col("hi"))).as("day"))
          .join(daily, Seq("et", "day"), "left")
          .select(col("et"), col("day"),
            coalesce(col("x0"), lit(0L)).as("x"))
        val w = Window.partitionBy("et").orderBy("day").rowsBetween(-6, 0)
        val d = (c: org.apache.spark.sql.Column) => c.cast("double")
        val s1 = sum(col("x")).over(w)
        val s2 = sum(col("x") * col("x")).over(w)
        val n = count(lit(1)).over(w)
        val mid = d(s1) / 7.0
        val sd = sqrt((d(s2) - d(s1) * d(s1) / 7.0) / 6.0)
        filled
          .select(col("et"), col("day"), col("x"), n.as("n7"),
            round(mid, 4).as("mid"),
            round(mid + sd * 2.0, 4).as("upper"),
            round(mid - sd * 2.0, 4).as("lower"))
          .filter(col("n7") === 7).drop("n7")
          .orderBy("et", "day")
      },
      oracle = Some("""
        WITH daily AS (
          SELECT event_type AS et,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS x0
          FROM events GROUP BY 1, 2),
        span AS (SELECT et, min(day) AS lo, max(day) AS hi
                 FROM daily GROUP BY et),
        grid AS (
          SELECT et, unnest(generate_series(lo, hi)) AS day FROM span),
        filled AS (
          SELECT grid.et, grid.day, coalesce(daily.x0, 0) AS x
          FROM grid
          LEFT JOIN daily ON daily.et = grid.et AND daily.day = grid.day),
        f AS (
          SELECT et, day, x,
                 sum(x) OVER w AS s1,
                 sum(x * x) OVER w AS s2,
                 count(*) OVER w AS n
          FROM filled
          WINDOW w AS (PARTITION BY et ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        SELECT et, day, x,
               round(CAST(s1 AS DOUBLE) / 7.0, 4) AS mid,
               round(CAST(s1 AS DOUBLE) / 7.0
                 + 2.0 * sqrt((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0),
                 4) AS upper,
               round(CAST(s1 AS DOUBLE) / 7.0
                 - 2.0 * sqrt((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0),
                 4) AS lower
        FROM f WHERE n = 7
        ORDER BY et, day""")),

    // Maximum drawdown per user — the running-peak-to-trough analytic
    // behind burn-rate / SLA-budget / portfolio monitoring: each user's
    // value stream becomes a centered cumulative walk (cents − 5000, so
    // the level rises and falls around the corpus mean of ~$49.63), and
    // drawdown at t = running peak − current level. Both cumulative
    // aggregates (level, peak) are UNBOUNDED-PRECEDING running frames —
    // the left-to-right-accumulating frame class that is float-order-
    // safe in both engines (NOTES: sliding frames are not), and here
    // all-integer anyway. Two window functions share ONE (partition,
    // order) spec, so this is a single clustered shuffle on user_id +
    // one per-partition sort; the per-user rollup then map-combines.
    Q(
      "win_drawdown",
      (s, dir) => {
        def w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val b = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            (round(col("value") * 100).cast("long") - 5000L).as("step"))
        // level, then peak = running max OF the level: stacked windows
        // over the identical (partition, order) spec — one shuffle +
        // one sort, two Window nodes.
        val walk = b
          .select(col("user_id"), col("ts"), col("event_id"),
            col("step"), sum("step").over(w).as("level"))
          .select(col("user_id"), col("step"), col("level"),
            max("level").over(w).as("peak"))
        walk
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            round(max(col("peak") - col("level")) / 100.0, 2)
              .as("max_drawdown"),
            round(max("peak") / 100.0, 2).as("peak_level"),
            round(sum("step") / 100.0, 2).as("final_level"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH b AS (
          SELECT user_id, ts, event_id,
                 CAST(round(value * 100) AS BIGINT) - 5000 AS step
          FROM events),
        lv AS (
          SELECT user_id, ts, event_id, step,
                 sum(step) OVER w AS level
          FROM b
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        walk AS (
          SELECT user_id, step, level,
                 max(level) OVER w AS peak
          FROM lv
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id, count(*) AS n_events,
               round(max(peak - level) / 100.0, 2) AS max_drawdown,
               round(max(peak) / 100.0, 2) AS peak_level,
               round(sum(step) / 100.0, 2) AS final_level
        FROM walk GROUP BY user_id ORDER BY user_id""")),

    // Leave-one-out mean-target encoding — the categorical feature
    // engineering primitive a tabular-ML pipeline runs before training
    // (and the one that leaks if done naively: encoding a row with a
    // group mean that INCLUDES the row's own target leaks the label).
    // Per event: category = event_type, target = (value > 100), and the
    // encoding is (group positives − own y) / (group size − 1) — the
    // exact LOO rate in floor permyriad, all integers. Single-member
    // groups (impossible here, guarded anyway) encode null. Scale: one
    // hash aggregate for the group sums + a broadcast join back; no
    // window, no sort — linear and partition-agnostic.
    Q(
      "win_target_encoding",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            when(col("value") > 100.0, 1L).otherwise(0L).as("y"))
        val g = ev.groupBy("event_type")
          .agg(count(lit(1)).as("gn"), sum("y").as("gp"))
        ev.join(broadcast(g), Seq("event_type"))
          .select(col("event_id"), col("event_type"), col("y"),
            when(col("gn") > 1,
              expr("(10000 * (gp - y)) div (gn - 1)"))
              .otherwise(lit(null)).as("loo_pm"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT event_id, event_type,
                 CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS y
          FROM events),
        g AS (
          SELECT event_type, count(*) AS gn,
                 CAST(sum(y) AS BIGINT) AS gp
          FROM ev GROUP BY 1)
        SELECT ev.event_id, ev.event_type, CAST(ev.y AS BIGINT) AS y,
               CASE WHEN g.gn > 1
                    THEN (10000 * (g.gp - ev.y)) // (g.gn - 1)
                    ELSE NULL END AS loo_pm
        FROM ev JOIN g USING (event_type)
        ORDER BY event_id""")),

    // Irregular-interval exponential decay state per user — the
    // feature-store decay counter (session heat, rate-limit budget,
    // recency-weighted spend): s_i = v_i + e^(−Δt/τ)·s_{i−1} with τ = 1h,
    // where Δt is the ACTUAL gap to the previous event, not a fixed tick
    // (agg_ewma's regular-series sibling). Exactness discipline: v and
    // the per-row decay factor are floor-quantized to 1e-4 integers
    // (floor has no tie semantics — the round() HALF_UP trap that bit
    // ml_corr_matrix cannot occur), and the recursion runs in BIGINT
    // micro-units with truncating division on positive state, so the
    // whole trajectory is bit-identical in both engines. The per-row
    // floor makes the fold genuinely sequential per user (no window
    // closed form), so the engine runs an ordered flatMapGroups fold —
    // state is ONE long per user, the pack_sequences contract — and the
    // oracle replays it as a recursive CTE. Output: per-user final and
    // peak state.
    Q(
      "win_ewma_irregular",
      (s, dir) => {
        val sp = s
        import sp.implicits._
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("tus"),
            floor(col("value") * 10000).cast("long").as("vq"))
          .as[(Long, Long, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroups { (u: Long, it: Iterator[(Long, Long, Long, Long)]) =>
            val evs = it.toArray.sortBy(e => (e._3, e._2))
            var st = 0L
            var prev = 0L
            var mx = 0L
            var n = 0
            evs.foreach { case (_, _, tus, vq) =>
              val dq =
                if (n == 0) 0L
                else math.floor(math.exp(
                  -(tus - prev).toDouble / 3.6e9) * 10000).toLong
              st = vq + (dq * st) / 10000
              if (st > mx) mx = st
              prev = tus
              n += 1
            }
            Iterator.single((u, n.toLong, st, mx))
          }
          .toDF("user_id", "n_events", "s_final", "s_max")
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                 CAST(floor(value * 10000) AS BIGINT) AS vq,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn,
                 lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS ptus
          FROM events),
        d AS (
          SELECT user_id, rn, vq,
                 CASE WHEN rn = 1 THEN 0
                      ELSE CAST(floor(exp(-(tus - ptus) / 3600000000.0)
                                      * 10000) AS BIGINT) END AS dq
          FROM ev),
        st AS (
          SELECT user_id, rn, vq AS s FROM d WHERE rn = 1
          UNION ALL
          SELECT d.user_id, d.rn, d.vq + (d.dq * st.s) // 10000
          FROM st JOIN d ON d.user_id = st.user_id AND d.rn = st.rn + 1)
        SELECT user_id, count(*) AS n_events,
               arg_max(s, rn) AS s_final, max(s) AS s_max
        FROM st GROUP BY user_id ORDER BY user_id""")),

    // Holt's linear-trend (double exponential) smoothing of the daily
    // event volume, with a 1- and 7-day-ahead forecast — the capacity
    // planner beside the diagnostic decompositions. The coupled
    // recurrence (l_t from l,b; b_t from Δl) cannot unroll as windows,
    // so the ENGINE folds the calendar-bounded zero-filled series
    // (collect + aggregate — legitimate exactly because the series is
    // bounded by the calendar, the agg_ewma contract) and the ORACLE
    // replays it as a RECURSIVE CTE. Cross-engine exactness: the state
    // is integer micro-units, every α=1/5, β=1/10 step is term-wise
    // TRUNCATING division (Spark's div and DuckDB's // both truncate
    // toward zero — floor would diverge on negative trends), so the
    // whole trajectory is bit-identical.
    Q(
      "win_holt_forecast",
      (s, dir) => {
        val S = 1000000L
        def tdiv(a: org.apache.spark.sql.Column, b: Long) =
          when(a < 0, -floor((a * -1) / b.toDouble))
            .otherwise(floor(a / b.toDouble)).cast("long")
        val counts = Tables.events(s, dir)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("n"))
        val dense = counts.agg(min("day").as("d0"), max("day").as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(counts, Seq("day"), "left")
          .select(col("day"), (coalesce(col("n"), lit(0L)) * S).as("xq"))
        val series = dense
          .groupBy(lit(1).as("g"))
          .agg(sort_array(collect_list(struct(col("day"), col("xq"))))
            .as("st"))
          .select(transform(col("st"), e => e.getField("xq")).as("xs"))
        val acc0 = struct(
          element_at(col("xs"), 2).as("l"),
          (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("b"))
        def step(acc: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column) = {
          val lNew = tdiv(x, 5) +
            tdiv((acc.getField("l") + acc.getField("b")) * 4, 5)
          struct(lNew.as("l"),
            (tdiv(lNew - acc.getField("l"), 10) +
              tdiv(acc.getField("b") * 9, 10)).as("b"))
        }
        series
          .select(size(col("xs")).as("n_days"),
            aggregate(slice(col("xs"), lit(3), size(col("xs")) - 2), acc0,
              step).as("fin"))
          .select(col("n_days").cast("long").as("n_days"),
            round(col("fin.l") / 1e6, 4).as("level"),
            round(col("fin.b") / 1e6, 4).as("trend"),
            round((col("fin.l") + col("fin.b")) / 1e6, 4)
              .as("forecast_1d"),
            round((col("fin.l") + lit(7) * col("fin.b")) / 1e6, 4)
              .as("forecast_7d"))
      },
      oracle = Some("""
        WITH RECURSIVE counts AS (
          SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                 count(*) AS n
          FROM events GROUP BY 1),
        daily AS (
          SELECT row_number() OVER (ORDER BY d.day) AS i,
                 coalesce(c.n, 0) * 1000000 AS xq
          FROM (SELECT unnest(generate_series(
                  (SELECT min(day) FROM counts),
                  (SELECT max(day) FROM counts))) AS day) d
          LEFT JOIN counts c ON c.day = d.day),
        rec(i, l, b) AS (
          SELECT CAST(2 AS BIGINT),
                 (SELECT xq FROM daily WHERE i = 2),
                 (SELECT xq FROM daily WHERE i = 2)
                   - (SELECT xq FROM daily WHERE i = 1)
          UNION ALL
          SELECT r.i + 1,
                 d.xq // 5 + ((r.l + r.b) * 4) // 5,
                 (d.xq // 5 + ((r.l + r.b) * 4) // 5 - r.l) // 10
                   + (r.b * 9) // 10
          FROM rec r JOIN daily d ON d.i = r.i + 1
          WHERE r.i < (SELECT max(i) FROM daily)),
        fin AS (SELECT l, b FROM rec ORDER BY i DESC LIMIT 1)
        SELECT (SELECT max(i) FROM daily) AS n_days,
               round(l / 1e6, 4) AS level,
               round(b / 1e6, 4) AS trend,
               round((l + b) / 1e6, 4) AS forecast_1d,
               round((l + 7 * b) / 1e6, 4) AS forecast_7d
        FROM fin""")),

    // Daily p50/p95/p99 bands of the event value — the latency/SLO
    // dashboard row, computed EXACTLY without ever sorting the fact
    // frame: per-day VALUE HISTOGRAM (cardinality ≤ distinct cents),
    // cumulative window over it, quantile = first value whose scaled
    // cumulative count crosses the k·n threshold (the dq_skew_report /
    // agg_percentile_weighted integer-crossing recipe — no float
    // interpolation semantics to diverge between engines, ever).
    // Scale: one map-combined (day, cents) census; windows run over
    // histogram rows, never events.
    Q(
      "win_latency_bands",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val h = Tables.events(s, dir)
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("day", "cents").agg(count(lit(1)).as("c"))
        val cum = Window.partitionBy("day").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val t = h
          .withColumn("cumc", sum("c").over(cum))
          .withColumn("n", sum("c").over(Window.partitionBy("day")))
        def pick(k: Int) =
          min(when(col("cumc") * 100 >= lit(k) * col("n"),
            col("cents"))) / 100.0
        t.groupBy("day")
          .agg(max("n").as("n_events"),
            round(pick(50), 2).as("p50"),
            round(pick(95), 2).as("p95"),
            round(pick(99), 2).as("p99"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH h AS (
          SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 count(*) AS c
          FROM events GROUP BY 1, 2),
        t AS (
          SELECT day, cents, c,
                 sum(c) OVER (PARTITION BY day ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cumc,
                 sum(c) OVER (PARTITION BY day) AS n
          FROM h)
        SELECT day, CAST(max(n) AS BIGINT) AS n_events,
               round(min(CASE WHEN cumc * 100 >= 50 * n THEN cents END)
                 / 100.0, 2) AS p50,
               round(min(CASE WHEN cumc * 100 >= 95 * n THEN cents END)
                 / 100.0, 2) AS p95,
               round(min(CASE WHEN cumc * 100 >= 99 * n THEN cents END)
                 / 100.0, 2) AS p99
        FROM t GROUP BY day ORDER BY day""")),

    // STL-lite seasonal decomposition of the daily event volume:
    // value = trend (centered 7-day MA, full windows only) + weekly
    // seasonal (per epoch-day-of-week mean of the detrended series) +
    // residual — the anomaly-screening split behind every volume
    // monitor (dq_volume_drift flags moves; this says which PART
    // moved). Epoch dow (day % 7), not locale weekday, so both engines
    // bucket identically. Exactness: trend = one 7-int sum / 7.0;
    // detrended values quantize 1e-6 BEFORE the seasonal mean (the
    // only cross-row double sum here — integers make it order-free);
    // residual is a fixed-structure double expression. Scale: the
    // fact table collapses to the day frame first; every window runs
    // over calendar-bounded rows.
    Q(
      "win_seasonal_decompose",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("n"))
          .withColumn("dow", pmod(col("day"), lit(7)))
        val ma = Window.orderBy("day").rowsBetween(-3, 3)
        val t = daily
          .withColumn("wn", count(lit(1)).over(ma))
          .withColumn("trend",
            when(col("wn") === 7, sum("n").over(ma) / 7.0))
          .withColumn("detq",
            when(col("trend").isNotNull,
              round((col("n") - col("trend")) * 1e6).cast("long")))
        val seas = t.filter(col("detq").isNotNull)
          .groupBy("dow")
          .agg((sum("detq").cast("double") / count(lit(1)) / 1e6)
            .as("seasonal_raw"))
        t.join(broadcast(seas), Seq("dow"), "left")
          .select(col("day"), col("dow"), col("n"),
            round(col("trend"), 4).as("trend"),
            when(col("trend").isNotNull,
              round(col("seasonal_raw"), 4)).as("seasonal"),
            when(col("trend").isNotNull,
              round(col("n") - col("trend") - col("seasonal_raw"), 4))
              .as("residual"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH daily AS (
          SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                 count(*) AS n
          FROM events GROUP BY 1),
        t AS (
          SELECT day, day % 7 AS dow, n,
                 CASE WHEN count(*) OVER w = 7
                      THEN sum(n) OVER w / 7.0 END AS trend
          FROM daily
          WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                       AND 3 FOLLOWING)),
        td AS (
          SELECT *, CASE WHEN trend IS NOT NULL THEN
                   CAST(round((n - trend) * 1e6) AS BIGINT) END AS detq
          FROM t),
        seas AS (
          SELECT dow,
                 CAST(sum(detq) AS DOUBLE) / count(*) / 1e6
                   AS seasonal_raw
          FROM td WHERE detq IS NOT NULL GROUP BY 1)
        SELECT day, dow, n,
               round(trend, 4) AS trend,
               CASE WHEN trend IS NOT NULL
                    THEN round(seasonal_raw, 4) END AS seasonal,
               CASE WHEN trend IS NOT NULL
                    THEN round(n - trend - seasonal_raw, 4)
               END AS residual
        FROM td LEFT JOIN seas USING (dow)
        ORDER BY day"""))
  )
}
