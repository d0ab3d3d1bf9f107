package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import Util._

/** Relational operator coverage beyond the reference's single lookup
  * join (SURVEY.md §2.6): multi-way joins, semi/anti joins, rollup,
  * ranking windows, set operations, distinct aggregation, sort/limit.
  * The reference gets none of these; a user switching to this engine
  * gets them Catalyst-native. Join strategy notes per query:
  *  - dims (region/nation/customer at these SFs) are broadcast —
  *    BroadcastHashJoin, no shuffle of the fact side;
  *  - fact⨝fact (lineitem⨝orders) shuffles on the join key once and
  *    AQE handles skew at scale.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary: the headline scan+agg.
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Broadcast dim join: revenue per market segment.
    "q_join_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.dim(s, dir, "customer", "c_custkey", "c_mktsegment")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // 5-way join through the dim chain: revenue per nation.
    // lineitem⨝orders shuffles once on orderkey; customer/nation/region
    // all broadcast.
    "q_multi_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.dim(s, dir, "orders", "o_orderkey", "o_custkey")
      val c = Tables.dim(s, dir, "customer", "c_custkey", "c_nationkey")
      val n = Tables.dim(s, dir, "nation", "n_nationkey", "n_name", "n_regionkey")
      val r = Tables.dim(s, dir, "region", "r_regionkey", "r_name")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // HUB-SKEWED join through the explicit salting machinery
    // (ops.Scale.saltedLeftJoin, shuffle form — broadcastDim = false
    // models a dim too big to broadcast, which is precisely when skew
    // can exist). The fact side is deliberately hub-shaped: ~30% of
    // events remap onto ONE user (the PERF.md §7c lesson — one hot key
    // is how 100 TB joins die), so an unsalted shuffle join would put
    // ~30% of all rows on a single reducer. The salt spreads the hub
    // over 16 (key, salt) reducers; SkewProbe measures the straggler
    // the salt removes, PlanSpec pins the salt into the join keys and
    // forbids a broadcast from sneaking back in.
    "q_skew_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("uid",
          when(pmod(col("event_id"), lit(10)) < 3, lit(7L))
            .otherwise(col("user_id")))
      val cust = Tables.dim(s, dir, "customer", "c_custkey", "c_mktsegment")
      Scale.saltedLeftJoin(ev, cust, "uid", "c_custkey",
          saltIdCol = "event_id", saltBuckets = 16, broadcastDim = false)
        .groupBy(coalesce(col("c_mktsegment"), lit("unmatched")).as("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    // Left-semi join (EXISTS): customers having ≥1 high-value order.
    "q_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 200000.0)
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // Left-anti join (NOT EXISTS): customers with no orders at all.
    "q_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // ROLLUP grouping-set aggregation; NULL grouping rows surfaced as
    // 'ALL' so ordering/hashing is engine-neutral.
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")),

    // Ranking window: top-2 orders per customer by totalprice
    // (deterministic tie-break on o_orderkey).
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    // Set operations: customer keys vs order-placing keys.
    "q_set_ops" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey").as("k"))
      val o = Tables.orders(s, dir).select(col("o_custkey").as("k"))
      def one(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
      one("except", c.except(o))
        .unionAll(one("intersect", c.intersect(o)))
        .unionAll(one("union", c.union(o).distinct()))
        .orderBy("op")
    }),

    // Exact distinct aggregation (reference couldn't: fresh UUID per
    // event — SURVEY.md §2.6; testdata user_id repeats, so it's real).
    "q_distinct_users" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // Global sort + limit.
    "q_sort_limit" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(10)),

    // CUBE grouping sets (all four combinations).
    "q_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")),

    // Pivot (categorical spread to columns): events per type × device-
    // class bucket. Spark .pivot with explicit values keeps the plan
    // static; oracle spells the same CASE-sum columns.
    "q_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("bucket", pmod(col("user_id"), lit(3)))
        .groupBy(col("event_type"))
        .pivot("bucket", Seq(0, 1, 2))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map("0" -> "b0", "1" -> "b1", "2" -> "b2"))
        .na.fill(0L, Seq("b0", "b1", "b2"))
        .orderBy("event_type")),

    // Scalar subquery: orders above the global average price.
    "q_scalar_subquery" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val avgPrice = o.agg(
        (dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy("o_orderstatus")
    }),

    // Interval/range join: lineitems shipped within 90 days of their
    // order's date — equi-key join with a range predicate (the planner
    // keeps it a hash join on orderkey; the range is a post-filter, so
    // no O(n·m) range scan).
    "q_interval_join" -> ((s, dir) => {
      val li = Tables.dim(s, dir, "lineitem", "l_orderkey", "l_shipdate", "l_extendedprice")
      val o = Tables.dim(s, dir, "orders", "o_orderkey", "o_orderdate", "o_orderstatus")
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_in_window"),
          dsum(col("l_extendedprice")).as("window_value"))
        .orderBy("o_orderstatus")
    }),

    // AS-OF join via the custom operator (graft.plans.AsOfJoin:
    // logical node → strategy → one-pass merge exec): each event
    // matched to the user's most recent order at event time. Right
    // side deduped per (key, time) for deterministic ties; DuckDB
    // checks it with its native ASOF LEFT JOIN.
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // o_orderdate arrives as TIMESTAMP_NTZ; cast to TIMESTAMP
      // explicitly (session is pinned UTC, so the instant is
      // unchanged) — the as-of validator now rejects cross-side type
      // mixes rather than trusting the raw 64-bit slots to agree
      val od = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
        .withColumn("o_orderts", col("o_orderdate").cast("timestamp"))
      graft.plans.AsOf.join(ev, od,
          ev("user_id"), od("o_custkey"), ev("ts"), od("o_orderts"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy("event_id")
    }),

    // RANGE-frame window (value-based, vs the ROWS frames elsewhere):
    // trailing-7-day order count/revenue per customer — gaps in the
    // date axis are handled by the frame, not row counting.
    "q_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day_num"))
        .rangeBetween(-6, 0)
      Tables.orders(s, dir)
        .withColumn("day_num", datediff(col("o_orderdate"), lit("1990-01-01")).cast("long"))
        .withColumn("n_7d", count(lit(1)).over(w))
        .withColumn("rev_7d",
          sum(col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"), col("day_num"),
          col("n_7d"), col("rev_7d"))
        .orderBy("o_orderkey")
    }),

    // Scalar date/time function coverage: extract + arithmetic + format.
    "q_date_funcs" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"),
          max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("last_day"))
        .orderBy("yr", "qtr")),

    // Scalar string function coverage: case, substring, pad, trim,
    // concat, replace, length — engine-native scalar library over the
    // dimension attributes.
    "q_string_funcs" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
          concat_ws("-", lower(col("c_mktsegment")),
            col("c_nationkey").cast("string")).as("seg_nation"),
          length(regexp_replace(col("c_name"), "[aeiou]", "")).as("consonant_len"))
        .orderBy("c_custkey")),

    // Conditional/null-handling function coverage: CASE, nullif,
    // coalesce, least/greatest.
    "q_conditional_funcs" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 1000, "low")
            .otherwise("high").as("bal_class"),
          coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg_or_other"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
          least(col("c_nationkey").cast("long"), lit(10L)).as("nation_capped"))
        .orderBy("c_custkey")),

    // GLOBAL distinct-user count — the corpus-wide cardinality that
    // complements q_distinct_users' per-type breakdown. This is the
    // exact twin of the HLL++ path: approx_count_distinct uses a
    // sketch that differs from DuckDB's, so the approximate form
    // cannot be oracle-hashed — SqlSurfaceSpec bounds it against this
    // exact count instead (within HLL++ error).
    "q_distinct_approx" -> ((s, dir) =>
      Tables.events(s, dir)
        .agg(countDistinct(col("user_id")).as("n_exact"))),

    // KMV DISTINCT SKETCH — deterministic approximate cardinality,
    // the hash-CHECKABLE twin of q_distinct_approx's HLL++ bound
    // check: the native bounded-state kmv_min_hashes aggregate keeps
    // each group's 256 smallest DISTINCT md5-derived 60-bit hashes
    // (a pure function of the input SET — partitioning-, merge-order-
    // and engine-independent, so DuckDB replays it exactly), and the
    // estimator (k−1)·2⁶⁰/h₍ₖ₎ stays visible in the query (k = 64,
    // BELOW the per-type user cardinality at every test SF, so the
    // gate exercises the ESTIMATOR branch, not just the exact
    // under-full fallback). SCALE
    // SHAPE: O(k) state per group with map-side partial combine — a
    // 100 TB distinct count never shuffles its distinct values,
    // unlike the exact countDistinct (which ships every distinct
    // (type, user) pair through the shuffle) that rides along here
    // as the per-group accuracy audit.
    "q_kmv_distinct" -> ((s, dir) => {
      val k = 64
      // NULL user_ids are dropped BEFORE grouping, matching the
      // oracle's sketch CTE (which filters then inner-joins): an
      // all-NULL group would otherwise emit an empty-sketch row here
      // that the oracle drops, and divide rel_err by n_exact = 0.
      // Post-filter every surviving group has n_exact >= 1.
      val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val sk = e.groupBy(col("event_type"))
        .agg(graft.functions.kmv_min_hashes(
          TextOps.hash60(col("user_id").cast("string")), k).as("mins"))
      val ex = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      val est = when(size(col("mins")) < k, size(col("mins")).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976L).cast("double")
          / element_at(col("mins"), k).cast("double"))
      sk.join(ex, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          roundTo(est, 6).as("n_est"),
          roundTo((est - col("n_exact").cast("double"))
            / col("n_exact").cast("double"), 6).as("rel_err"))
        .orderBy("event_type")
    }),

    // COUNT-MIN HEAVY HITTERS — the frequency-estimation sketch
    // (Cormode & Muthukrishnan 2005) as a native bounded-state
    // aggregate over deterministic affine bucketing, so unlike
    // Spark's stock count_min_sketch (engine-specific serialized
    // form) every counter AND every point estimate is hash-gated
    // against a DuckDB replay. One corpus pass builds the d×w
    // counter matrix (d=4, w=256 → 8 KB of state regardless of item
    // cardinality, mergeable map-side); the exact per-user counts
    // ride along ONLY for the top-10 audit — at 100 TB the sketch is
    // what answers "how hot is user X" without shuffling every
    // distinct user. CMS estimates are upper bounds (collisions only
    // ADD), so n_est ≥ n_exact by construction — the oracle pins the
    // exact estimate values, the spec pins the bound.
    "q_cms_heavy" -> ((s, dir) => {
      val d = 4
      val w = 256
      val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val h = TextOps.hash60(col("user_id").cast("string"))
      val sk = e.agg(graft.functions.cms_sketch(h, d, w).as("cms"))
      val top = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id").asc).limit(10)
      top.crossJoin(broadcast(sk))
        .select(col("user_id"), col("n_exact"),
          graft.functions.cms_point(col("cms"), h, d, w).as("n_est"))
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_join_agg" ->
      s"""SELECT c.c_mktsegment, count(*) AS n_orders,
         |  ${dsumSql("o.o_totalprice")} AS revenue
         |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same hub remap + left join + agg, unsalted — salting must be
    // invisible in the result
    "q_skew_join" ->
      s"""SELECT COALESCE(c.c_mktsegment, 'unmatched') AS c_mktsegment,
         |  count(*) AS n_events,
         |  ${dsumSql("e.value")} AS sum_value
         |FROM (SELECT CASE WHEN event_id % 10 < 3 THEN 7 ELSE user_id END AS uid,
         |        value FROM events) e
         |LEFT JOIN customer c ON e.uid = c.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_multi_join" ->
      s"""SELECT r.r_name, n.n_name,
         |  ${dsumSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |  COALESCE(l_linestatus, 'ALL') AS linestatus,
         |  count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY 1, 2""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,

    "q_set_ops" ->
      """SELECT 'except' AS op, count(*) AS n FROM
        |  (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL SELECT 'intersect', count(*) FROM
        |  (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL SELECT 'union', count(*) FROM
        |  (SELECT DISTINCT k FROM (SELECT c_custkey AS k FROM customer
        |                           UNION ALL SELECT o_custkey FROM orders))
        |ORDER BY op""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the k smallest distinct hashes per group are a pure function of
    // the input set — replayed here by ORDER BY h over the distinct
    // (type, hash) pairs; same estimator arithmetic, same rounding
    "q_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |    ${TextOps.hash60Sql("CAST(user_id AS VARCHAR)")} AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
         |  FROM h),
         |sk AS (
         |  SELECT event_type, max(CASE WHEN rn = 64 THEN h END) AS hk,
         |    count(*) AS nd
         |  FROM r WHERE rn <= 64 GROUP BY 1),
         |ex AS (
         |  SELECT event_type, count(DISTINCT user_id) AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT e.event_type, e.n_exact,
         |  ${roundToSql(
             "CASE WHEN s.nd < 64 THEN CAST(s.nd AS DOUBLE) " +
               "ELSE 63.0 * CAST(1152921504606846976 AS DOUBLE) " +
               "/ CAST(s.hk AS DOUBLE) END", 6)} AS n_est,
         |  ${roundToSql(
             "((CASE WHEN s.nd < 64 THEN CAST(s.nd AS DOUBLE) " +
               "ELSE 63.0 * CAST(1152921504606846976 AS DOUBLE) " +
               "/ CAST(s.hk AS DOUBLE) END) - CAST(e.n_exact AS DOUBLE)) " +
               "/ CAST(e.n_exact AS DOUBLE)", 6)} AS rel_err
         |FROM ex e JOIN sk s USING (event_type)
         |ORDER BY event_type""".stripMargin,

    // every counter replayed as a GROUP BY sum over the same affine
    // bucketing, every point estimate as the d-way min
    "q_cms_heavy" ->
      s"""WITH r AS (SELECT unnest(range(0, 4)) AS i),
         |hv AS (
         |  SELECT ${TextOps.hash60Sql("CAST(user_id AS VARCHAR)")} % 2147483647 AS hp
         |  FROM events WHERE user_id IS NOT NULL),
         |c AS (
         |  SELECT r.i,
         |    ((((1000003*(r.i+1)+12345) % 2147483647) * hv.hp
         |      + ((998244353*(r.i+1)+777) % 2147483647)) % 2147483647) % 256 AS b,
         |    count(*) AS n
         |  FROM hv CROSS JOIN r GROUP BY 1, 2),
         |top AS (
         |  SELECT user_id, count(*) AS n_exact FROM events
         |  WHERE user_id IS NOT NULL GROUP BY 1
         |  ORDER BY n_exact DESC, user_id ASC LIMIT 10),
         |tb AS (
         |  SELECT t.user_id, t.n_exact, r.i,
         |    ((((1000003*(r.i+1)+12345) % 2147483647)
         |      * (${TextOps.hash60Sql("CAST(t.user_id AS VARCHAR)")} % 2147483647)
         |      + ((998244353*(r.i+1)+777) % 2147483647)) % 2147483647) % 256 AS b
         |  FROM top t CROSS JOIN r)
         |SELECT tb.user_id, tb.n_exact, CAST(min(c.n) AS BIGINT) AS n_est
         |FROM tb JOIN c ON c.i = tb.i AND c.b = tb.b
         |GROUP BY 1, 2 ORDER BY tb.user_id""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_cube" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY 1, 2""".stripMargin,

    "q_pivot" ->
      """SELECT event_type,
        |  count(*) FILTER (WHERE user_id % 3 = 0) AS b0,
        |  count(*) FILTER (WHERE user_id % 3 = 1) AS b1,
        |  count(*) FILTER (WHERE user_id % 3 = 2) AS b2
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scalar_subquery" ->
      s"""SELECT o_orderstatus, count(*) AS n_above FROM orders
         |WHERE o_totalprice > (SELECT ${dsumSql("o_totalprice")} / count(*)
         |                      FROM orders) * 1.5
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_distinct_approx" ->
      """SELECT count(DISTINCT user_id) AS n_exact FROM events""".stripMargin,

    "q_range_frame" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) AS day_num
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day_num,
        |  count(*) OVER w AS n_7d,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS rev_7d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q_date_funcs" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         |  count(*) AS n, ${dsumSql("o_totalprice")} AS total,
         |  max(strftime(o_orderdate, '%Y-%m-%d')) AS last_day
         |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_upper,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        |  concat_ws('-', lower(c_mktsegment), CAST(c_nationkey AS VARCHAR)) AS seg_nation,
        |  CAST(length(regexp_replace(c_name, '[aeiou]', '', 'g')) AS INTEGER) AS consonant_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_conditional_funcs" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 1000 THEN 'low' ELSE 'high' END AS bal_class,
        |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
        |  GREATEST(c_acctbal, 0.0) AS bal_floor,
        |  LEAST(CAST(c_nationkey AS BIGINT), 10) AS nation_capped
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_interval_join" ->
      s"""SELECT o.o_orderstatus, count(*) AS n_in_window,
         |  ${dsumSql("l.l_extendedprice")} AS window_value
         |FROM lineitem l JOIN orders o
         |  ON l.l_orderkey = o.o_orderkey
         | AND l.l_shipdate >= o.o_orderdate
         | AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_asof_join" ->
      """WITH od AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
        |    max_by(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, od.o_orderkey, od.o_totalprice
        |FROM events e ASOF LEFT JOIN od
        |  ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin
  )
}
