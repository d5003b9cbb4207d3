package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Relational query surface (SURVEY §2.2–§2.8 + F17): aggregations,
  * joins (equi / semi / anti / outer / theta / range / as-of), windows,
  * sorts, top-k, set ops and date arithmetic — each paired with its
  * DuckDB oracle SQL.
  *
  * Determinism rules shared by both sides (the driver hash-compares):
  *  - money/double sums go through DECIMAL casts (exact, associativity-
  *    independent) INTERNALLY, but every final projection casts the
  *    decimal to DOUBLE on both engines: the driver's comparator reads
  *    Spark parquet via pandas (DECIMAL → decimal.Decimal, scale kept:
  *    '136933.00') and the DuckDB oracle via .df() (DECIMAL → float64:
  *    '136933.0'), so a DECIMAL in the output hash-mismatches even when
  *    values are identical. One exact-decimal→IEEE rounding is
  *    bit-identical in both engines;
  *  - double avgs are rounded to 4 decimals;
  *  - no ArrayType and no nullable integer aggregate ever reaches a
  *    final projection (pandas crashes sorting arrays; DuckDB renders
  *    HUGEINT/nullable ints as float64) — OutputShapeSpec enforces all
  *    of this for every catalog query;
  *  - timestamps are rendered as strings or epoch microseconds;
  *  - every ORDER BY carries a unique tiebreak key;
  *  - rank/rownum outputs are INTEGER on both sides.
  *
  * Scale notes (100 TB target) are on each query where non-obvious.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec2 = DecimalType(18, 2)

  // Final-projection rule: decimal math internally, DOUBLE on the wire
  // (see determinism notes above).
  private def dbl(c: Column): Column = c.cast(DoubleType)

  // Revenue math stays in exact decimal space end-to-end. Casting a
  // *computed* double product to decimal is NOT portable: Spark rounds
  // the double's shortest decimal representation (BigDecimal.valueOf)
  // while DuckDB rounds the exact binary value — they disagree on
  // x.xxxx5-shaped products. Casting the raw 2-decimal factors first and
  // multiplying as decimals is exact and identical in both engines.
  private def oneD = lit(1).cast(DecimalType(3, 2))
  private def discPrice: Column =
    col("l_extendedprice").cast(DecimalType(12, 2)) *
      (oneD - col("l_discount").cast(DecimalType(4, 2)))
  private def charge: Column =
    discPrice * (oneD + col("l_tax").cast(DecimalType(4, 2)))
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
  private val chargeSql =
    s"($discPriceSql) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"

  /** Epoch microseconds of a (possibly NTZ) timestamp column; session tz
    * is pinned UTC so NTZ→TIMESTAMP cast is a wall-clock reinterpretation
    * identical to DuckDB's `epoch_us(CAST(ts AS TIMESTAMP))`.
    */
  private def us(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** DuckDB fragment equivalent of [[us]]. */
  private def usSql(col: String): String = s"epoch_us(CAST($col AS TIMESTAMP))"

  val all: Seq[GraftQuery] = Seq(

    // ---------------------------------------------------------------- A4
    // TPC-H Q1 shape: scan-heavy grouped aggregation. Scale: partial
    // aggregation (map-side combine) is automatic for hash aggregates;
    // only |groups| rows cross the shuffle. Filter + 7-column projection
    // push down to the parquet scan.
    GraftQuery(
      "q1_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum($chargeSql) AS DOUBLE) AS sum_charge,
         |  round(avg(l_quantity), 4) AS avg_qty,
         |  round(avg(l_discount), 4) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dbl(sum(col("l_quantity").cast(dec2))).as("sum_qty"),
          dbl(sum(col("l_extendedprice").cast(dec2))).as("sum_base_price"),
          dbl(sum(discPrice)).as("sum_disc_price"),
          dbl(sum(charge)).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---------------------------------------------------------------- A5
    GraftQuery(
      "q_count_distinct",
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          dbl(sum(col("value").cast(dec2))).as("sum_value"))
        .orderBy(col("event_type"))
    },

    // ---------------------------------------------------------------- A6
    // ROLLUP over a 3-table dim join; dims broadcast (no shuffle for the
    // joins — only the final aggregation exchanges |groups| rows).
    GraftQuery(
      "q_rollup",
      """SELECT r_name, n_name,
        |  CAST(GROUPING(r_name) AS INTEGER) AS g_r,
        |  CAST(GROUPING(n_name) AS INTEGER) AS g_n,
        |  count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          grouping(col("r_name")).cast(IntegerType).as("g_r"),
          grouping(col("n_name")).cast(IntegerType).as("g_n"),
          count(lit(1)).as("n_cust"),
          dbl(sum(col("c_acctbal").cast(dec2))).as("sum_acctbal"))
        .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first,
          col("n_name").asc_nulls_first)
    },

    // ---------------------------------------------------------------- A6
    GraftQuery(
      "q_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_s,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_p,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast(IntegerType).as("g_s"),
          grouping(col("o_orderpriority")).cast(IntegerType).as("g_p"),
          count(lit(1)).as("n_orders"),
          dbl(sum(col("o_totalprice").cast(dec2))).as("sum_total"))
        .orderBy(col("g_s"), col("g_p"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ---------------------------------------------------------------- J3/O4
    // TPC-H Q3 shape: 3-way join + agg + top-k. customer filter prunes
    // before the join; top-k is TakeOrderedAndProject (no global sort).
    GraftQuery(
      "q3_top_revenue",
      s"""SELECT l_orderkey,
        |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-06-01").cast(TimestampType))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-01").cast(TimestampType))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .agg(dbl(sum(discPrice)).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---------------------------------------------------------------- J3
    // TPC-H Q5 shape: 6-table star join with a same-nation constraint.
    // Scale: fact tables join on their keys; all dims broadcast.
    GraftQuery(
      "q5_nation_revenue",
      s"""SELECT n_name,
        |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name IN ('EUROPE', 'ASIA')
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val su = broadcast(t(s, dir, "supplier"))
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region").filter(col("r_name").isin("EUROPE", "ASIA")))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dbl(sum(discPrice)).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---------------------------------------------------------------- J4
    GraftQuery(
      "q_join_semi",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_discount") > 0.06)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dbl(sum(col("o_totalprice").cast(dec2))).as("sum_total"))
        .orderBy(col("o_orderpriority"))
    },

    // ---------------------------------------------------------------- J4
    GraftQuery(
      "q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ---------------------------------------------------------------- J3 (outer)
    GraftQuery(
      "q_join_outer",
      """SELECT n_name, count(c_custkey) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      n.join(c, col("c_nationkey") === col("n_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"),
          dbl(sum(col("c_acctbal").cast(dec2))).as("sum_acctbal"))
        .orderBy(col("n_name"))
    },

    // ---------------------------------------------------------------- J3 (full outer)
    GraftQuery(
      "q_join_full",
      """WITH cc AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
        |     ss AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(cc.nk, ss.nk) AS nk, n_cust, n_supp
        |FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      val cc = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val ss = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      cc.join(ss, Seq("nk"), "full_outer")
        .select(col("nk"), col("n_cust"), col("n_supp"))
        .orderBy(col("nk"))
    },

    // ---------------------------------------------------------------- J5 (theta)
    GraftQuery(
      "q_join_theta",
      """SELECT a.s_suppkey AS s1, b.s_suppkey AS s2
        |FROM supplier a JOIN supplier b ON a.s_acctbal < b.s_acctbal
        |ORDER BY s1, s2""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "supplier").select(col("s_suppkey").as("s1"),
        col("s_acctbal").as("bal1"))
      val b = t(s, dir, "supplier").select(col("s_suppkey").as("s2"),
        col("s_acctbal").as("bal2"))
      a.join(broadcast(b), col("bal1") < col("bal2"))
        .select(col("s1"), col("s2"))
        .orderBy(col("s1"), col("s2"))
    },

    // ---------------------------------------------------------------- J6 (bounded range join)
    // For each click, purchases by the same user within the next 30 min.
    // Spark side uses the scalable bucketed-range-join pattern: both
    // sides get a 30-min time bucket; the click side explodes to
    // (bucket, bucket+1) so the equi-join on (user_id, bucket) covers the
    // whole range — a pure hash join instead of an unbounded theta join.
    // At 100 TB this keeps the join an exchange-on-(user,bucket) hash
    // join; the naive form would be a nested-loop per user.
    GraftQuery(
      "q_join_range",
      s"""SELECT a.event_id AS click_id, count(b.event_id) AS n_purchases
         |FROM events a LEFT JOIN events b
         |  ON b.user_id = a.user_id AND b.event_type = 'purchase'
         |  AND ${usSql("b.ts")} > ${usSql("a.ts")}
         |  AND ${usSql("b.ts")} <= ${usSql("a.ts")} + 1800000000
         |WHERE a.event_type = 'click'
         |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin) { (s, dir) =>
      val bucketUs = 1800000000L // 30 min
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          us(col("ts")).as("click_us"))
        .withColumn("bucket",
          explode(array(floor(col("click_us") / bucketUs),
            floor(col("click_us") / bucketUs) + 1)))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          us(col("ts")).as("p_us"))
        .withColumn("bucket", floor(col("p_us") / bucketUs))
      clicks.join(purchases,
          col("user_id") === col("p_user") && clicks("bucket") === purchases("bucket") &&
            col("p_us") > col("click_us") &&
            col("p_us") <= col("click_us") + bucketUs,
          "left_outer")
        .groupBy(col("click_id"))
        .agg(count(col("p_id")).as("n_purchases"))
        .orderBy(col("click_id"))
    },

    // ---------------------------------------------------------------- J6 (as-of)
    // As-of join composed from a window (SURVEY §2.5 J6): for each
    // purchase, the user's most recent strictly-earlier click. One
    // shuffle on user_id; no self-join at all.
    GraftQuery(
      "q_join_asof",
      s"""WITH w AS (
         |  SELECT event_id, user_id, event_type, ${usSql("ts")} AS purchase_us,
         |    last_value(CASE WHEN event_type = 'click' THEN ${usSql("ts")} END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ${usSql("ts")}, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_us
         |  FROM events)
         |SELECT event_id, user_id, purchase_us, prev_click_us
         |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(us(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .withColumn("purchase_us", us(col("ts")))
        .withColumn("prev_click_us",
          last(when(col("event_type") === "click", us(col("ts"))), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("purchase_us"),
          col("prev_click_us"))
        .orderBy(col("event_id"))
    },

    // ---------------------------------------------------------------- W3
    GraftQuery(
      "q_window_rank",
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    CAST(rank() OVER w AS INTEGER) AS rnk,
        |    CAST(dense_rank() OVER w AS INTEGER) AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |SELECT o_custkey, o_orderkey, total, rn, rnk, drnk
        |FROM r WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dbl(col("o_totalprice").cast(dec2)).as("total"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // ---------------------------------------------------------------- W4
    GraftQuery(
      "q_window_lag",
      s"""SELECT event_id, user_id,
         |  round(value - lag(value) OVER w, 2) AS delta,
         |  round(lead(value) OVER w - value, 2) AS next_delta
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ${usSql("ts")}, event_id)
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(us(col("ts")), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"),
          round(lead(col("value"), 1).over(w) - col("value"), 2).as("next_delta"))
        .orderBy(col("event_id"))
    },

    // ---------------------------------------------------------------- W5
    GraftQuery(
      "q_window_frame",
      s"""SELECT event_id, user_id,
         |  CAST(sum(CAST(value AS DECIMAL(18,2)))
         |    OVER (PARTITION BY user_id ORDER BY ${usSql("ts")}, event_id
         |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum,
         |  round(avg(value)
         |    OVER (PARTITION BY user_id ORDER BY ${usSql("ts")}, event_id
         |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ord = Window.partitionBy(col("user_id")).orderBy(us(col("ts")), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          dbl(sum(col("value").cast(dec2))
            .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .as("running_sum"),
          round(avg(col("value")).over(ord.rowsBetween(-3, Window.currentRow)), 4)
            .as("moving_avg"))
        .orderBy(col("event_id"))
    },

    // ---------------------------------------------------------------- O4
    // Top-k: orderBy+limit plans as TakeOrderedAndProject — per-partition
    // heaps + driver merge of k rows, not a global sort.
    GraftQuery(
      "q_topk",
      """SELECT l_orderkey, l_linenumber, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          dbl(col("l_extendedprice").cast(dec2)).as("price"))
        .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    },

    // ---------------------------------------------------------------- O3
    GraftQuery(
      "q_sort",
      """SELECT s_suppkey, s_name, s_nationkey, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM supplier ORDER BY acctbal DESC, s_suppkey""".stripMargin) { (s, dir) =>
      t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          dbl(col("s_acctbal").cast(dec2)).as("acctbal"))
        .orderBy(col("acctbal").desc, col("s_suppkey"))
    },

    // ---------------------------------------------------------------- U1
    GraftQuery(
      "q_union_all",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier) u
        |GROUP BY nk ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .unionByName(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk"))
    },

    // ---------------------------------------------------------------- U3
    GraftQuery(
      "q_intersect",
      """SELECT * FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT
        |  SELECT s_nationkey AS nk FROM supplier) i
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    },

    // ---------------------------------------------------------------- U3
    GraftQuery(
      "q_except",
      """SELECT * FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT
        |  SELECT s_nationkey AS nk FROM supplier) e
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    },

    // ---------------------------------------------------------------- F17
    GraftQuery(
      "q_date_ops",
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS quarter,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  min(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS min_day,
        |  max(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS max_day
        |FROM orders
        |GROUP BY month, quarter ORDER BY month""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          quarter(col("o_orderdate")).as("quarter"))
        .agg(count(lit(1)).as("n_orders"),
          dbl(sum(col("o_totalprice").cast(dec2))).as("sum_total"),
          min(datediff(col("o_orderdate"), lit("1995-01-01"))).as("min_day"),
          max(datediff(col("o_orderdate"), lit("1995-01-01"))).as("max_day"))
        .orderBy(col("month"))
    },

    // ---------------------------------------------------------------- T5 (tumbling, batch form)
    GraftQuery(
      "q_hourly_events",
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY hour_start, event_type ORDER BY hour_start, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts").cast(TimestampType)),
            "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          dbl(sum(col("value").cast(dec2))).as("sum_value"))
        .orderBy(col("hour_start"), col("event_type"))
    },

    // ---------------------------------------------------------------- T5/T7 (session window, batch form)
    // Gap-based sessionization (30-min inactivity): lag → new-session
    // flag → running sum = session id. Same shape Structured Streaming's
    // session_window produces; one shuffle on user_id.
    GraftQuery(
      "q_session_window",
      s"""WITH o AS (
         |  SELECT user_id, event_id, ${usSql("ts")} AS tus, value FROM events),
         |m AS (
         |  SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
         |                   OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
         |                 THEN 1 ELSE 0 END AS is_new
         |  FROM o),
         |s AS (
         |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                              ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM m)
         |SELECT user_id, CAST(sid AS INTEGER) AS session_id, count(*) AS n_events,
         |  min(tus) AS session_start_us, max(tus) AS session_end_us,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), us(col("ts")).as("tus"), col("value"))
        .withColumn("is_new",
          when(lag(col("tus"), 1).over(byUser).isNull ||
            col("tus") - lag(col("tus"), 1).over(byUser) > 1800000000L, 1).otherwise(0))
        .withColumn("sid", sum(col("is_new"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid").cast(IntegerType).as("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("tus")).as("session_start_us"),
          max(col("tus")).as("session_end_us"),
          dbl(sum(col("value").cast(dec2))).as("sum_value"))
        .orderBy(col("user_id"), col("session_id"))
    })
}
