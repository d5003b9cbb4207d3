package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{GraftConf, Tables}
import graft.functions.SimilarityFunctions.elementHash
import graft.functions.TextFunctions
import graft.jobs.CombineJob
import graft.operators.{Scored, TopKByScore}

/** Coverage extensions: the rest of the W3 ranking family
  * (ntile / percent_rank / cume_dist), F17 JSON scalar ops, and the
  * §2.10 typed-Aggregator surface exercised as an oracle-checked query.
  */
object ExtendedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------- W3
    GraftQuery(
      "q_window_ntile",
      """SELECT s_nationkey, s_suppkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cume
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      t(s, dir, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"),
          ntile(4).over(w).cast(IntegerType).as("quartile"),
          round(percent_rank().over(w), 4).as("pct_rank"),
          round(cume_dist().over(w), 4).as("cume"))
        .orderBy(col("s_nationkey"), col("s_suppkey"))
    },

    // ------------------------------------------------------------ F17
    // JSON scalar ops over the events.props payload column.
    GraftQuery(
      "q_json_ops",
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast(IntegerType)
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(k).as("sum_k"),
          round(avg(k), 4).as("avg_k"),
          min(k).as("min_k"),
          max(k).as("max_k"))
        .orderBy(col("event_type"))
    },

    // ---------------------------------------------------------- §2.10
    // Typed Aggregator top-k: top-3 orders by totalprice per customer.
    // Map-side partial aggregation carries ≤ k rows per group across
    // the exchange (vs the window form shuffling every row); the oracle
    // is the equivalent window query.
    GraftQuery(
      "q_topk_agg",
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS score,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS INTEGER) AS rank
        |  FROM orders)
        |SELECT o_custkey, rank, o_orderkey, round(score, 2) AS total
        |FROM r WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val topk = udaf(new TopKByScore(3))
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(topk(col("o_orderkey"), col("o_totalprice").cast(DoubleType))
          .as("top"))
        .select(col("o_custkey"),
          posexplode(col("top")).as(Seq("pos", "item")))
        .select(col("o_custkey"),
          (col("pos") + 1).cast(IntegerType).as("rank"),
          col("item.id").as("o_orderkey"),
          round(col("item.score"), 2).as("total"))
        .orderBy(col("o_custkey"), col("rank"))
    },

    // ------------------------------------------------------------ F17
    // Array aggregation: collect_list is order-nondeterministic under
    // parallel aggregation, so the deterministic form sorts first; the
    // final projection then STRINGIFIES the array (array_join) — the
    // driver's pandas comparator cannot sort rows on an array column
    // (unhashable numpy.ndarray), so ArrayType must never reach a final
    // projection.
    GraftQuery(
      "q_array_agg",
      """SELECT user_id,
        |  array_to_string(list_sort(list(event_type)), ',') AS types,
        |  len(list_distinct(list(event_type))) AS n_distinct_types,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          array_join(array_sort(collect_list(col("event_type"))), ",").as("types"),
          size(array_distinct(collect_list(col("event_type"))))
            .as("n_distinct_types"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },

    // ----------------------------------------------------------- pivot
    // Explicit-value pivot (dynamic pivot would need a driver-side
    // distinct pass — at 100 TB you pin the column set). Oracle uses
    // the portable CASE-aggregation form, which is also exactly what
    // Catalyst lowers pivot to.
    GraftQuery(
      "q_pivot", {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val cases = types.map(t =>
          s"CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS $t").mkString(",\n        |  ")
        s"""SELECT user_id,
           |  $cases
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
      }) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType))
        .orderBy(col("user_id"))
    },

    // --------------------------------------------- pivot (dynamic values)
    // df.pivot(col) WITHOUT a pinned value list: Spark runs a driver-side
    // distinct pass to discover the pivot columns (sorted), then lowers
    // to the same CASE-aggregation as the explicit form. That extra
    // distinct job is the documented cost of dynamic pivot at scale —
    // q_pivot is the 100 TB shape; this covers the reference-parity
    // surface where the value set is data-driven.
    GraftQuery(
      "q_pivot_dynamic", {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val cases = types.map(t =>
          s"CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS $t").mkString(",\n        |  ")
        s"""SELECT user_id,
           |  $cases
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
      }) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type")
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType))
        .orderBy(col("user_id"))
    },

    // --------------------------------------------------------- unpivot
    // unpivot/melt: wide per-type sums back to (user_id, type, total).
    // Oracle mirrors with UNION ALL; unpivot drops NULL cells — the
    // UNION arms filter accordingly.
    GraftQuery(
      "q_unpivot", {
        val types = Seq("click", "purchase")
        val arms = types.map(t =>
          s"""SELECT user_id, '$t' AS event_type, CAST($t AS DOUBLE) AS total FROM w WHERE $t IS NOT NULL""")
          .mkString("\n        |UNION ALL\n        |")
        s"""WITH w AS (
           |  SELECT user_id,
           |    sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS click,
           |    sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS purchase
           |  FROM events GROUP BY user_id)
           |$arms
           |ORDER BY user_id, event_type""".stripMargin
      }) { (s, dir) =>
      val wide = t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "purchase"))
        .agg(sum(col("value").cast(DecimalType(18, 2))))
      wide.unpivot(
          Array(col("user_id")),
          Array(col("click"), col("purchase")),
          "event_type", "total")
        .withColumn("total", col("total").cast(DoubleType))
        .orderBy(col("user_id"), col("event_type"))
    },

    // ------------------------------------------------------------- U3
    // Multiset EXCEPT ALL (duplicate-preserving difference).
    GraftQuery(
      "q_except_all",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT l_suppkey % 50 AS nk FROM lineitem
        |  EXCEPT ALL
        |  SELECT s_suppkey % 50 AS nk FROM supplier) e
        |GROUP BY nk ORDER BY nk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{col, count, lit}
      t(s, dir, "lineitem").select((col("l_suppkey") % 50).as("nk"))
        .exceptAll(t(s, dir, "supplier").select((col("s_suppkey") % 50).as("nk")))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk"))
    },

    // ------------------------------------------------------------- A6
    // Explicit GROUPING SETS (beyond rollup/cube): identical SQL text
    // on both engines via the spark.sql surface.
    GraftQuery.sameSql(
      "q_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_s,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_p,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    // ------------------------------------------------------------- A5
    // Sketch aggregates (HLL++ count-distinct, quantile summaries):
    // sketch internals are engine-specific, so the hash-checked outputs
    // are the exact count-distinct plus BOOLEANS comparing each sketch
    // against its Spark-side exact answer (the oracle emits literal
    // TRUE). Still exercises HLL++ and the relative-error quantile
    // summary under the driver's gate; ApproxAggSpec bounds the errors
    // numerically.
    GraftQuery(
      "q_approx_stats",
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  TRUE AS approx_ok, TRUE AS p50_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      // exact-distinct and the sketch aggregates run as SEPARATE
      // passes joined on the (few-row) group key: one Aggregate mixing
      // a DISTINCT agg with non-distinct ones plans as an Expand that
      // doubles every input row, and each doubled row drags the heavy
      // sketch buffers (16k-register HLL at rsd 0.01, accuracy-10000
      // quantile summaries) through the distinct's regrouping — 6.1 s
      // at sf0.1 vs 0.9 s split (measured round 12, surfaced by the
      // bench-action fix; under count() the aggs were pruned
      // entirely). At scale the split also halves the shuffled rows:
      // each pass exchanges only its own per-group partials.
      val ev = t(s, dir, "events")
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val sketch = ev.groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.01).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("ap50"),
          expr("percentile(value, 0.45)").as("lo"),
          expr("percentile(value, 0.55)").as("hi"))
      // null-safe key (<=> plans as a hash-join key too): a NULL group
      // key aggregates to a row in BOTH passes, and a plain equi-join
      // would drop it (null != null) where the single-aggregate form
      // and the oracle SQL both keep it
      val sk = sketch.withColumnRenamed("event_type", "sk_event_type")
      exact.join(broadcast(sk), col("event_type") <=> col("sk_event_type"))
        .select(col("event_type"), col("n_users"),
          // HLL++ at rsd 1% vs a 5% gate: deterministic for a given
          // dataset, and 5σ of slack across sf changes.
          (abs(col("au") - col("n_users")) <=
            col("n_users").cast(DoubleType) * 0.05).as("approx_ok"),
          (col("ap50") >= col("lo") && col("ap50") <= col("hi")).as("p50_ok"))
        .orderBy(col("event_type"))
    },

    // --------------------------------------------------------- S8/J1
    // The upsert sink's MERGE semantics under the hash gate: matched
    // keys take UPDATE columns from the stage and keep every other
    // column from the target; unmatched rows pass through whole —
    // exactly Combine_send_to_postgresql.py:239-249's ON CONFLICT
    // behavior, expressed relationally (Upsert.merge) and mirrored as a
    // FULL OUTER JOIN in the oracle.
    GraftQuery(
      "q_upsert_merge",
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |stg AS (
        |  SELECT o_orderkey AS k, 'U' AS status,
        |    CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS price
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT coalesce(s.k, t.k) AS k,
        |  CASE WHEN s.k IS NOT NULL AND t.k IS NOT NULL THEN s.status
        |       ELSE coalesce(s.status, t.status) END AS status,
        |  CAST(CASE WHEN s.k IS NOT NULL AND t.k IS NOT NULL THEN t.price
        |            ELSE coalesce(s.price, t.price) END AS DOUBLE) AS price
        |FROM tgt t FULL OUTER JOIN stg s ON t.k = s.k
        |ORDER BY k""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
      val dec2 = DecimalType(18, 2)
      val tgt = orders.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
          col("o_totalprice").cast(dec2).as("price"))
      val stg = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("k"), lit("U").as("status"),
          (col("o_totalprice").cast(dec2) * 2).as("price"))
      graft.sinks.Upsert.merge(tgt, stg, "k", Seq("status"))
        .select(col("k"), col("status"),
          col("price").cast(DoubleType).as("price"))
        .orderBy(col("k"))
    },

    // ---------------------------------------------------------- §2.10
    // Salted two-phase aggregation for a skewed grouping key (the
    // manual fix for single-hot-key skew AQE's partition splitting
    // cannot touch): phase 1 aggregates (key, salt) partials, phase 2
    // merges per key. The oracle is the plain one-phase GROUP BY —
    // algebraic aggregates make the two forms exactly equal, and the
    // decimal value column keeps the double-summation order out of the
    // hash.
    GraftQuery(
      "q_skew_agg",
      """SELECT user_id % 5 AS k, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (s, dir) =>
      val df = t(s, dir, "events").select((col("user_id") % 5).as("k"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      graft.operators.SkewJoin.saltedCountSum(df, "k", "v", salts = 8)
        .select(col("k"), col("n"), col("sum").cast(DoubleType).as("sum_v"))
        .orderBy(col("k"))
    },

    // ---------------------------------------------------------- §2.10
    // Bounded-state heavy-hitter detection (the hot-key finder that
    // feeds skew mitigation): a Misra–Gries typed Aggregator keeps 128
    // counters per partial buffer regardless of N or key cardinality —
    // vs the full groupBy over every distinct key — and its mergeable
    // guarantee (candidates ⊇ every key with share > 1/129) makes the
    // exact confirm count over just the candidates return EXACTLY the
    // >1% heavy hitters. The sketch's candidate SET is partitioning-
    // dependent; the confirmed result is not — extra candidates die on
    // the exact threshold, missing ones are impossible — which is what
    // lets a sketch-based query pass a hash-equality oracle. The
    // grouping key is synthetically skewed (as q_skew_agg): 40% of
    // events collapse onto keys 0/1, the rest spread over the user tail.
    GraftQuery(
      "q_heavy_hitters",
      """WITH d AS (SELECT CASE WHEN user_id % 10 < 4 THEN user_id % 2
        |                       ELSE user_id END AS k FROM events)
        |SELECT k, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
        |HAVING count(*) * 100 > (SELECT count(*) FROM events)
        |ORDER BY k""".stripMargin) { (s, dir) =>
      import s.implicits._
      val skewKey = when(col("user_id") % 10 < 4, col("user_id") % 2)
        .otherwise(col("user_id")).cast(LongType)
      val keyed = t(s, dir, "events").select(skewKey.as("k"))
      val candidates = keyed.as[Long]
        .select(new graft.operators.MisraGries(128).toColumn)
        .toDF("ks").select(explode(col("ks")).as("k"))
      val total = t(s, dir, "events").agg(count(lit(1)).as("total"))
      keyed.join(broadcast(candidates), "k")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .join(broadcast(total))
        .filter(col("n") * 100 > col("total"))
        .select(col("k"), col("n"))
        .orderBy(col("k"))
    },

    // ------------------------------------------------------------- P7
    // The SQL entry path: temp views + spark.sql, with a CORRELATED
    // scalar subquery Catalyst decorrelates into an aggregate+join.
    // Spark and DuckDB run the IDENTICAL SQL text (quantities are
    // integer-valued doubles, so avg() is bit-identical regardless of
    // summation order — magnitudes stay < 2^53).
    GraftQuery.sameSql(
      "q_sql_subquery",
      """SELECT l_partkey, count(*) AS n_above
        |FROM lineitem l
        |WHERE l_quantity > (SELECT avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin),

    // ------------------------------------------------------------- P7
    // HAVING against a global scalar-aggregate subquery (TPC-H Q11
    // shape): groups kept only when their share clears a threshold
    // computed over the whole table.
    GraftQuery.sameSql(
      "q_sql_having",
      """SELECT l_suppkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))) >
        |  (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.011 FROM lineitem)
        |ORDER BY l_suppkey""".stripMargin),

    // ------------------------------------------------------------- P7
    // NOT IN anti-semantics + distinct count (TPC-H Q16 shape):
    // suppliers with no 'F' order against them, counted per part size.
    GraftQuery.sameSql(
      "q_sql_notin",
      """SELECT p_size, count(DISTINCT l_suppkey) AS n_supp
        |FROM part JOIN lineitem ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (
        |  SELECT l2.l_suppkey FROM lineitem l2
        |  JOIN orders ON l2.l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F' AND l2.l_returnflag = 'R'
        |    AND l2.l_quantity >= 46)
        |GROUP BY p_size ORDER BY p_size""".stripMargin),

    // ------------------------------------------------------- T5 native
    // Native session_window in batch mode, oracle'd by the gap-merge
    // SQL. session_window opens a NEW session when the inter-event gap
    // is ≥ the 30-min gap (the manual lag-form in q_session_window uses
    // strict >; the synthetic timestamps never land exactly on the
    // boundary, and the oracle here mirrors the ≥ semantics).
    GraftQuery(
      "q_session_native",
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |         value FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
        |                   OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) >= 1800000000
        |                 THEN 1 ELSE 0 END AS is_new
        |  FROM o),
        |s AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(tus) AS session_start_us, max(tus) AS session_end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts").cast(TimestampType), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          (unix_micros(col("w.end")) - 1800000000L).as("session_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // ------------------------------------------- rolling-hash fingerprint
    // Rabin–Karp 3-token window hashes over one-SHA-per-token values;
    // the min window hash is a winnowing-style document fingerprint.
    GraftQuery(
      "q_fingerprint_rolling",
      s"""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts
         |            FROM documents),
         |hp AS (SELECT doc_id, [substring(sha256(x), 1, 7) FOR x IN ts] AS hp FROM tok),
         |hv AS (SELECT doc_id,
         |         [list_sum([(strpos('0123456789abcdef', substring(h, p, 1)) - 1)
         |                    * CAST(16**(7 - p) AS BIGINT) FOR p IN range(1, 8)])
         |          FOR h IN hp] AS hv FROM hp),
         |r AS (SELECT doc_id,
         |        CASE WHEN len(hv) >= 3 THEN
         |          [((((hv[i] * ${TextFunctions.RollB}) % ${TextFunctions.RollP} + hv[i+1])
         |             * ${TextFunctions.RollB}) % ${TextFunctions.RollP} + hv[i+2]) % ${TextFunctions.RollP}
         |           FOR i IN range(1, len(hv) - 1)]
         |        ELSE [] END AS fps
         |      FROM hv)
         |SELECT doc_id, len(fps) AS n_windows,
         |  CAST(coalesce(list_min(fps), -1) AS BIGINT) AS min_fp,
         |  CAST(coalesce(list_max(fps), -1) AS BIGINT) AS max_fp
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val hv = t(s, dir, "documents")
        .select(col("doc_id"),
          transform(TextFunctions.tokens(lower(col("text"))), elementHash(_))
            .as("hv"))
      hv.select(col("doc_id"),
          TextFunctions.rollingFingerprints(col("hv")).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_windows"),
          // coalesce to a non-null BIGINT sentinel: a NULL-able integer
          // aggregate renders as float64 in the driver's pandas/DuckDB
          // paths ('123.0' vs '123') and hash-mismatches.
          coalesce(array_min(col("fps")), lit(-1L)).as("min_fp"),
          coalesce(array_max(col("fps")), lit(-1L)).as("max_fp"))
        .orderBy(col("doc_id"))
    },

    // --------------------------------------------- pipeline composition
    // The reference combine stage END-TO-END (normalize → key filter →
    // first-wins dedup → fixed projection) over landing-shaped rows
    // synthesized from documents: ragged values, empty keys (derived),
    // bad scores (→0), empty subreddits (→default), duplicate keys
    // across two "files" (first file wins). The oracle replays the
    // exact semantics in SQL — this is the full CombineJob.transform
    // under the hash gate, not just its pieces.
    GraftQuery(
      "q_pipeline_combine", {
        val salt = GraftConf.default.salt
        s"""WITH f0 AS (
           |  SELECT CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'K' || CAST(doc_id AS VARCHAR) END AS thing_key,
           |    CAST(doc_id AS VARCHAR) AS id,
           |    CASE WHEN doc_id % 7 = 0 THEN 'N/A' ELSE CAST(n_chars % 100 AS VARCHAR) END AS score,
           |    'HTTPS://Reddit.com/R/' || source || '/' || CAST(doc_id AS VARCHAR) || '//' AS permalink,
           |    substring(text, 1, 40) AS title,
           |    CASE WHEN doc_id % 5 = 0 THEN '' ELSE source END AS subreddit,
           |    0 AS file_seq, doc_id AS row_seq
           |  FROM documents),
           |f1 AS (
           |  SELECT 'K' || CAST(doc_id AS VARCHAR) AS thing_key,
           |    CAST(doc_id AS VARCHAR) AS id,
           |    '999' AS score,
           |    'dup-permalink' AS permalink, 'dup title' AS title,
           |    source AS subreddit, 1 AS file_seq, doc_id AS row_seq
           |  FROM documents WHERE doc_id % 4 = 0 AND doc_id % 3 <> 0),
           |u AS (SELECT * FROM f0 UNION ALL SELECT * FROM f1),
           |n AS (
           |  SELECT
           |    CASE WHEN thing_key IS NULL OR thing_key = ''
           |         THEN sha256('$salt' || 't3:' || coalesce(nullif(id, ''),
           |                regexp_replace(lower(trim(permalink)), '/+$$', '', 'g'), ''))
           |         ELSE thing_key END AS thing_key,
           |    't3' AS thing_type,
           |    coalesce(nullif(id, ''), '') AS id,
           |    '' AS created_at,
           |    coalesce(TRY_CAST(score AS INTEGER), 0) AS score,
           |    0 AS num_comments,
           |    coalesce(nullif(title, ''), '') AS title_sanitized,
           |    '' AS author_hash,
           |    coalesce(regexp_replace(lower(trim(permalink)), '/+$$', '', 'g'), '') AS permalink,
           |    CASE WHEN subreddit IS NULL OR subreddit = '' THEN 'ItalyTravel' ELSE subreddit END AS subreddit,
           |    '' AS flair_text,
           |    file_seq, row_seq
           |  FROM u),
           |d AS (
           |  SELECT *, row_number() OVER (PARTITION BY thing_key
           |            ORDER BY file_seq, row_seq) AS rn
           |  FROM n WHERE thing_key IS NOT NULL AND thing_key <> '')
           |SELECT thing_key, thing_type, id, created_at,
           |  CAST(score AS VARCHAR) AS score, CAST(num_comments AS VARCHAR) AS num_comments,
           |  title_sanitized, author_hash, permalink, subreddit, flair_text
           |FROM d WHERE rn = 1 ORDER BY thing_key""".stripMargin
      }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val f0 = docs.select(
        when(col("doc_id") % 3 === 0, lit(""))
          .otherwise(concat(lit("K"), col("doc_id").cast(StringType))).as("thing_key"),
        col("doc_id").cast(StringType).as("id"),
        when(col("doc_id") % 7 === 0, lit("N/A"))
          .otherwise((col("n_chars") % 100).cast(StringType)).as("score"),
        concat(lit("HTTPS://Reddit.com/R/"), col("source"), lit("/"),
          col("doc_id").cast(StringType), lit("//")).as("permalink"),
        substring(col("text"), 1, 40).as("title"),
        when(col("doc_id") % 5 === 0, lit("")).otherwise(col("source"))
          .as("subreddit"),
        lit(0).as("file_seq"), col("doc_id").as("row_seq"))
      val f1 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 3 =!= 0)
        .select(
          concat(lit("K"), col("doc_id").cast(StringType)).as("thing_key"),
          col("doc_id").cast(StringType).as("id"),
          lit("999").as("score"),
          lit("dup-permalink").as("permalink"),
          lit("dup title").as("title"),
          col("source").as("subreddit"),
          lit(1).as("file_seq"), col("doc_id").as("row_seq"))
      CombineJob.transform(f0.unionByName(f1), GraftConf.default)
        .orderBy(col("thing_key"))
    })
}
