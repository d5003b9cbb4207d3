package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bucketing: the co-located-join scale story. Writing both join sides
  * bucketed by the join key lets the sort-merge join run with ZERO
  * exchanges — at 100 TB this is the difference between a full-fact
  * shuffle and none. (Broadcast disabled for the test so the join
  * cannot cheat.)
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without any exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dir = "/root/testdata/sf0.001"
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("or_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("or_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))

      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself is exchange-free; only the (tiny) final agg
      // output ordering may exchange — assert no exchange feeds the join
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan.take(2000))
      assert(!plan.substring(joinIdx).contains("Exchange"),
        plan.substring(joinIdx).take(2000))
      // and the aggregation on the same key reuses the bucket partitioning
      assert("Exchange".r.findAllIn(plan).isEmpty, plan.take(2000))

      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS or_bucketed")
    }
  }
}
