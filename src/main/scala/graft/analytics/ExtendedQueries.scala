package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
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
        |  sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS sum_k,
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
    })
}
