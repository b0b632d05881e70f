package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function parity (SURVEY.md §2.6): all 11 built-in window
  * functions + any-aggregate-as-window + ROWS / RANGE frames.
  *
  * Note: the reference REJECTS window aggregates in distributed mode
  * (reference planner.rs:138-141 — "NotImplemented"); Spark executes them
  * distributed by partitioning on the PARTITION BY key, so this engine is
  * strictly more capable here. Each window below partitions on a real key
  * (never an empty OVER ()), so at 100 TB the work spreads across
  * executors with one shuffle on the partition key.
  */
object WindowQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val all: Seq[Q] = Seq(

    Q("q_window_rank",
      """SELECT c_custkey, c_mktsegment,
        |  ROW_NUMBER() OVER w AS rn,
        |  RANK() OVER w AS rnk,
        |  DENSE_RANK() OVER w AS drnk,
        |  CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prnk,
        |  CAST(CUME_DIST() OVER w AS DOUBLE) AS cdist,
        |  NTILE(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rn""".stripMargin) { (s, d) =>
      // Deterministic tiebreak (c_custkey) in the window order — without
      // it row_number/ntile are partition-order-dependent and would flap
      // across cluster sizes.
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer").select(
        col("c_custkey"), col("c_mktsegment"),
        // bigint: DuckDB's rank family returns int64; align widths so a
        // dtype-sensitive comparator sees identical schemas
        row_number().over(w).cast("bigint").as("rn"),
        rank().over(w).cast("bigint").as("rnk"),
        dense_rank().over(w).cast("bigint").as("drnk"),
        percent_rank().over(w).cast("double").as("prnk"),
        cume_dist().over(w).cast("double").as("cdist"),
        ntile(4).over(w).cast("bigint").as("quartile"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },

    Q("q_window_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice) OVER w AS prev_price,
        |  LEAD(o_totalprice) OVER w AS next_price,
        |  LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
        |  LAST_VALUE(o_orderkey) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(wFull).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_window_agg_frames",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  MIN(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min_last3,
        |  COUNT(*) OVER
        |    (PARTITION BY o_custkey ORDER BY o_totalprice
        |     RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_within_50k
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      // Aggregates as window functions over ROWS and RANGE frames
      // (reference WindowFrame*, datafusion.proto:651-676). The running
      // sum uses the exact-decimal trick (Qh) so it is order-exact.
      val wOrd = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wLast3 = wOrd.rowsBetween(-2, Window.currentRow)
      val wRange = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"))
        .rangeBetween(-50000, Window.currentRow)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(Qh.D12)).over(wRun).cast("double").as("running_total"),
        min(col("o_totalprice")).over(wLast3).as("min_last3"),
        count(lit(1)).over(wRange).as("n_within_50k"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_window_groups_emul",
      """WITH r AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    DENSE_RANK() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY CAST(o_orderdate AS DATE)) AS dr,
        |    o_totalprice
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus, CAST(dr AS INT) AS dr,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_orderstatus ORDER BY dr
        |     RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS grp_sum
        |FROM r ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // GROUPS frames (SQL:2011) are unparseable in Spark 4.1.2 AND
      // DuckDB 1.0 — but GROUPS semantics are exactly expressible by
      // composition: dense_rank assigns each peer group (same order-day)
      // one integer, and a RANGE frame over that integer counts GROUPS.
      // "SUM over 2 GROUPS PRECEDING" = sum of the current day's orders
      // plus the two preceding distinct days', peer rows included —
      // which a ROWS frame cannot express when group sizes vary (~2.4
      // rows per (status, day) here). This closes the one SURVEY §2 row
      // previously documented out as a Spark engine gap (PARITY.md).
      //
      // PLAN (round-16 core decade): a GROUPS-frame AGGREGATE depends
      // only on the peer-group KEY — grp_sum is a function of (status,
      // day), never of the individual row — so the corpus never needs
      // window-sorting at all. Collapse to per-(status, day) decimal
      // totals (map-side partial agg to |statuses|×|days| cells), run
      // dense_rank + the RANGE window over that model-sized frame
      // (identical dr: dense_rank of distinct days ≡ dense_rank over
      // their member rows), broadcast-join the (dr, grp_sum) pair back.
      // The old spelling ran two window passes over the full corpus
      // with |statuses| = 3 sort tasks — parallelism bounded by the
      // partition key's cardinality (7.5× at 10× data; at 100 TB a
      // 3-way sort of the corpus). q_window_groups_sql keeps the
      // general two-window rewrite — it exercises the injected-parser
      // GROUPS surface for arbitrary (incl. non-decomposable) frames;
      // this twin is the scale path for decomposable aggregates, and
      // CurationSpec pins its semantics against brute force.
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate").cast("date").as("day"), col("o_totalprice"))
      val drW = Window.partitionBy("o_orderstatus").orderBy("day")
      val sumW = Window.partitionBy("o_orderstatus").orderBy(col("dr"))
        .rangeBetween(-2, Window.currentRow)
      val days = o.groupBy(col("o_orderstatus"), col("day"))
        .agg(sum(col("o_totalprice").cast(Qh.D12)).as("day_sum"))
        .withColumn("dr", dense_rank().over(drW))
        .withColumn("grp_sum", sum(col("day_sum")).over(sumW).cast("double"))
        .select(col("o_orderstatus"), col("day"), col("dr"), col("grp_sum"))
      o.join(broadcast(days), Seq("o_orderstatus", "day"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("dr").cast("int").as("dr"), col("grp_sum"))
        .orderBy("o_orderkey")
    },

    Q("q_window_groups_sql",
      """WITH r AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    DENSE_RANK() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY CAST(o_orderdate AS DATE)) AS dr,
        |    o_totalprice
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus, CAST(dr AS INT) AS dr,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_orderstatus ORDER BY dr
        |     RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS grp_sum
        |FROM r ORDER BY o_orderkey""".stripMargin)(
      // The GROUPS frame in literal SQL TEXT (round-12 verdict item #5):
      // graft.plans.GroupsFrames rewrites the statement into the
      // dense_rank composition proven by q_window_groups_emul above; on
      // Engine / wire-server sessions the SAME rewrite runs inside the
      // parser (GraftExtensions.injectParser — EngineSpec pins raw-text
      // parsing), so a JDBC client's GROUPS query runs verbatim. The
      // vanilla gate session calls the rewrite explicitly because parser
      // extensions attach at session build time. DuckDB 1.0 cannot parse
      // GROUPS either, so the oracle spells the composition.
      Q.sqlRun("wgsql", "orders") { p =>
        graft.plans.GroupsFrames.rewrite(
          s"""SELECT o_orderkey, o_orderstatus,
             |  CAST(DENSE_RANK() OVER (PARTITION BY o_orderstatus
             |       ORDER BY CAST(o_orderdate AS DATE)) AS INT) AS dr,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
             |    (PARTITION BY o_orderstatus ORDER BY CAST(o_orderdate AS DATE)
             |     GROUPS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS grp_sum
             |FROM ${p}orders ORDER BY o_orderkey""".stripMargin)
      }),

    // --- frame EXCLUDE clauses (SQL:2011), emulated ---------------------
    Q("q_window_exclude_emul",
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (9000000200000000, 1000000000000003, TIMESTAMP '2023-11-15 00:00:00', 10.0),
        |    (9000000200000001, 1000000000000003, TIMESTAMP '2023-11-15 00:00:00', 20.0),
        |    (9000000200000002, 1000000000000003, TIMESTAMP '2023-11-15 00:00:00', 30.0),
        |    (9000000200000003, 1000000000000003, TIMESTAMP '2023-11-15 00:10:00', 5.5),
        |    (9000000200000004, 1000000000000004, TIMESTAMP '2023-11-15 00:00:00', 7.25),
        |    (9000000200000005, 1000000000000004, TIMESTAMP '2023-11-15 00:00:00', 8.75)
        |  ) v(event_id, user_id, ts, value))
        |SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts
        |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |     EXCLUDE CURRENT ROW) AS DOUBLE) AS excl_row,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts
        |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |     EXCLUDE GROUP) AS DOUBLE) AS excl_group,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts
        |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |     EXCLUDE TIES) AS DOUBLE) AS excl_ties
        |FROM ev ORDER BY event_id""".stripMargin) { (s, d) =>
      // Frame EXCLUDE clauses (SQL:2011) — unparseable in Spark 4.1.2,
      // native in DuckDB (which makes the oracle the REAL spelling and
      // this the emulation, the q_window_groups_emul pattern in
      // reverse). SQL:2011 peers are rows equal on ALL order keys, so
      // the window orders by ts ALONE — with a unique tiebreak in the
      // ORDER BY every peer group is a singleton and EXCLUDE GROUP/TIES
      // degenerate to EXCLUDE CURRENT ROW / no-op (round-9 ADVICE: the
      // previous (ts, event_id) ordering did exactly that, and the
      // gate corpus has zero same-(user, ts) pairs, so the tie branch
      // was never exercised). Two deterministic fixture users with
      // same-ts rows now ride along, generated identically in both
      // engines (the q_events_regularity precedent; ids at 10^15 are
      // unreachable by ×M-scaled corpora). The frame is RANGE, not
      // ROWS: a ROWS frame ending at CURRENT ROW makes the result
      // depend on arbitrary tie order, while a RANGE frame spans all
      // peers — every output below is tie-order-invariant:
      //   le  = SUM over ts' ≤ ts (RANGE frame, peers included);
      //   EXCLUDE CURRENT ROW = le − v        (NULL if frame \ row is empty);
      //   EXCLUDE GROUP       = le − peer_sum (NULL if no earlier rows),
      //     where peer_sum = SUM over the full (user, ts) peer group;
      //   EXCLUDE TIES        = le − peer_sum + v (current row kept ⇒
      //     never empty).
      // All three ride the decimal cast end-to-end, so the subtractions
      // are exact and both engines hash-match. Cost: the peer sum
      // partitions by (user, ts) — a refinement of the main partition
      // key, so Catalyst plans ONE exchange on user_id and sorts once;
      // no second corpus shuffle. NULL convention: an empty excluded
      // frame yields NULL in the standard — emulated by nullifying via
      // the frame/peer COUNTS, not by value comparison (a legitimate
      // 0.0 sum survives).
      val fixtures = s.sql(
        """SELECT * FROM VALUES
          |  (9000000200000000L, 1000000000000003L, timestamp'2023-11-15 00:00:00', 10.0D),
          |  (9000000200000001L, 1000000000000003L, timestamp'2023-11-15 00:00:00', 20.0D),
          |  (9000000200000002L, 1000000000000003L, timestamp'2023-11-15 00:00:00', 30.0D),
          |  (9000000200000003L, 1000000000000003L, timestamp'2023-11-15 00:10:00', 5.5D),
          |  (9000000200000004L, 1000000000000004L, timestamp'2023-11-15 00:00:00', 7.25D),
          |  (9000000200000005L, 1000000000000004L, timestamp'2023-11-15 00:00:00', 8.75D)
          |  AS t(event_id, user_id, ts, value)""".stripMargin)
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").as("ts"), col("value"))
        .unionAll(fixtures)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").cast(Qh.D12).as("v"))
      val le = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val peers = Window.partitionBy("user_id", "ts")
      ev.withColumn("run", sum(col("v")).over(le))
        .withColumn("nrun", count(lit(1)).over(le))
        .withColumn("prun", sum(col("v")).over(peers))
        .withColumn("nprun", count(lit(1)).over(peers))
        .select(col("event_id"), col("user_id"),
          when(col("nrun") > 1, (col("run") - col("v")).cast("double")).as("excl_row"),
          when(col("nrun") - col("nprun") > 0,
            (col("run") - col("prun")).cast("double")).as("excl_group"),
          // TIES keeps the current row, so its frame is never empty
          (col("run") - col("prun") + col("v")).cast("double").as("excl_ties"))
        .orderBy("event_id")
    },

    // --- time-interval RANGE frames -------------------------------------
    Q("q_window_range_time",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts
        |     RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trailing_30m,
        |  CAST(COUNT(*) OVER
        |    (PARTITION BY user_id ORDER BY ts
        |     RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS n_30m
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      // Time-interval RANGE frames — the trailing-window aggregate AS A
      // FRAME (the interval JOIN q_join_interval computes the same
      // semantics as a pair join; the frame spelling is one window pass
      // with no join at all, the right plan when every row needs its
      // own trailing aggregate). RANGE over the timestamp order key
      // includes ALL rows in [ts−30 min, ts] regardless of ties — no
      // event_id tiebreak in the ORDER BY, because RANGE frames are
      // value-based and a tiebreak column would make the frame
      // ROWS-like. The Spark frame keys on unix_micros (a cast to
      // long would truncate to SECONDS and shift boundary rows vs the
      // oracle's microsecond-exact INTERVAL arithmetic — every ts in
      // this corpus has a sub-second component). Decimal through the
      // sum, cast at output. Shape for 100 TB: one user-keyed
      // exchange + per-partition sort; the frame scan is the sliding
      // two-pointer the engine implements — never a per-row re-scan.
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts").cast("timestamp")))
        .rangeBetween(-30L * 60 * 1000000, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").as("ts"),
          col("value").cast(Qh.D12).as("v"))
        .select(col("event_id"), col("user_id"),
          sum(col("v")).over(w).cast("double").as("trailing_30m"),
          count(lit(1)).over(w).cast("bigint").as("n_30m"))
        .orderBy("event_id")
    },
  )
}
