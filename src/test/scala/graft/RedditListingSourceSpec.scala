package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The DSv2 "reddit-listing" format: registered short name, exploded
  * post rows, per-file partitions, null tolerance, limit option —
  * result-equivalent to the schema'd-JSON ingest path
  * (ListingSource), which the FetchJob golden test pins.
  */
class RedditListingSourceSpec extends SparkSpec {

  private val listingA =
    """{"data": {"children": [
      |  {"kind": "t3", "data": {"name": "t3_a1", "id": "a1",
      |   "created_utc": 1694253032.0, "score": 5, "num_comments": 2,
      |   "title": "first", "author": "alice", "permalink": "/r/x/a1/",
      |   "subreddit": "italytravel", "link_flair_text": "Flair"}},
      |  {"kind": "t3", "data": {"id": "a2", "title": "second",
      |   "score": 1}}
      |]}}""".stripMargin

  private val listingB =
    """{"data": {"children": [
      |  {"kind": "t3", "data": {"name": "t3_b1", "id": "b1",
      |   "created_utc": 1694260000, "score": 7, "num_comments": 0,
      |   "title": "third", "author": "bob", "permalink": "/r/x/b1/",
      |   "subreddit": "italytravel", "link_flair_text": null}}
      |]}}""".stripMargin

  test("format('reddit-listing') reads a directory of listing pages") {
    withTempDir { dir =>
      Files.write(dir.resolve("page1.json"), listingA.getBytes("UTF-8"))
      Files.write(dir.resolve("page2.json"), listingB.getBytes("UTF-8"))

      val df = spark.read.format("reddit-listing")
        .option("path", dir.toString).load()
      assert(df.schema == graft.sources.RedditListingSource.PostSchema)
      assert(df.rdd.getNumPartitions == 2) // one partition per page file

      val rows = df.orderBy(col("id")).collect()
      assert(rows.length == 3)
      assert(rows(0).getAs[String]("name") == "t3_a1")
      assert(rows(0).getAs[Double]("created_utc") == 1694253032.0)
      // null-safe on absent fields (row a2)
      assert(rows(1).getAs[String]("author") == null)
      assert(rows(1).getAs[Long]("score") == 1L)
      // integral created_utc parses as double
      assert(rows(2).getAs[Double]("created_utc") == 1694260000.0)
    }
  }

  test("limit option caps posts per page (reference LIMIT semantics)") {
    withTempDir { dir =>
      Files.write(dir.resolve("page.json"), listingA.getBytes("UTF-8"))
      val df = spark.read.format("reddit-listing")
        .option("path", dir.toString).option("limit", "1").load()
      assert(df.count() == 1)
    }
  }

  test("query-level LIMIT pushes down into the scan (SupportsPushDownLimit)") {
    withTempDir { dir =>
      Files.write(dir.resolve("page1.json"), listingA.getBytes("UTF-8"))
      Files.write(dir.resolve("page2.json"), listingB.getBytes("UTF-8"))
      val df = spark.read.format("reddit-listing")
        .option("path", dir.toString).load().limit(1)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("pushedLimit=1"), plan.take(1500))
      assert(df.collect().length == 1)
    }
  }

  test("projection prunes the scan to the selected columns (SupportsPushDownRequiredColumns)") {
    withTempDir { dir =>
      Files.write(dir.resolve("page1.json"), listingA.getBytes("UTF-8"))
      val df = spark.read.format("reddit-listing")
        .option("path", dir.toString).load()
        .select("name", "score")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("cols=name,score"), plan.take(1500))
      val rows = df.orderBy(col("name").asc_nulls_first).collect()
      assert(rows.map(_.getAs[String]("name")).toSeq == Seq(null, "t3_a1"))
      assert(rows.map(_.getAs[Long]("score")).toSeq == Seq(1L, 5L))
    }
  }

  test("string-equality filters push into the reader (SupportsPushDownFilters)") {
    withTempDir { dir =>
      Files.write(dir.resolve("page1.json"), listingA.getBytes("UTF-8"))
      Files.write(dir.resolve("page2.json"), listingB.getBytes("UTF-8"))
      val df = spark.read.format("reddit-listing")
        .option("path", dir.toString).load()
        .filter(col("author") === "bob")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("eq=[author=bob]"), plan.take(1500))
      val rows = df.collect()
      assert(rows.map(_.getAs[String]("name")).toSeq == Seq("t3_b1"))
      // non-equality predicates stay Spark-side and still work
      val mixed = spark.read.format("reddit-listing")
        .option("path", dir.toString).load()
        .filter(col("subreddit") === "italytravel" && col("score") > 4)
      assert(mixed.queryExecution.executedPlan.toString
        .contains("eq=[subreddit=italytravel]"))
      assert(mixed.collect().map(_.getAs[String]("name")).toSet ==
        Set("t3_a1", "t3_b1"))
    }
  }

  test("DSv2 rows feed FetchJob.transform identically to the JSON path") {
    withTempDir { dir =>
      Files.write(dir.resolve("page.json"), listingA.getBytes("UTF-8"))
      val viaDsv2 = graft.jobs.FetchJob.transform(
        spark.read.format("reddit-listing").option("path", dir.toString).load())
      val viaJson = graft.jobs.FetchJob.transform(
        graft.sources.ListingSource.posts(
          graft.sources.ListingSource.read(spark, dir.resolve("page.json").toString)))
      assert(viaDsv2.orderBy("id").collect().toSeq ==
        viaJson.orderBy("id").collect().toSeq)
    }
  }
}
