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

  test("two-phase LSH: materialized band table bucketed by band key self-joins exchange-free") {
    // SCALING.md's "one structural change at true 100 TB": phase 1
    // computes signatures once and writes the band table bucketed by
    // the join key; phase 2's candidate self-join then needs NO
    // exchange at all — the in-query repartition barrier the sf-scale
    // queries use disappears along with its shuffle.
    import graft.functions.SimilarityFunctions._
    import graft.functions.TextFunctions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select(col("doc_id"), coalesce(lower(col("text")), lit("")).as("text"))
      val tok = docs.select(col("doc_id"), tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 3)
      val sig = tok
        .select(col("doc_id"),
          minhashSignatureFromHashes(
            transform(array_distinct(shinglesFromTokens(col("ts"), 3)),
              elementHash(_)), 16).as("sg"))
      val bands = sig
        .select(col("doc_id"), col("sg"),
          explode(sequence(lit(0), lit(3))).as("b"))
        .withColumn("bsig", bandSignature(col("sg"), col("b"), 4))
        .select("doc_id", "b", "bsig")
      bands.write.mode("overwrite")
        .bucketBy(8, "b", "bsig").sortBy("b", "bsig")
        .saveAsTable("bands_bucketed")

      val t = spark.table("bands_bucketed")
      val pairs = t.as("x").join(t.as("y"),
        col("x.b") === col("y.b") && col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
        .distinct()

      val plan = pairs.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan.take(2000))
      // nothing below the join exchanges: the signature pipeline ran in
      // phase 1, and the bucketed layout co-locates both join sides
      assert(!plan.substring(joinIdx).contains("Exchange"),
        plan.substring(joinIdx).take(2000))
      assert(pairs.count() >= 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bands_bucketed")
    }
  }
}
