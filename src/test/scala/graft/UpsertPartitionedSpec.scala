package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.Upsert

/** The partition-pruned parquet upsert (S8's engine-managed-table scale
  * path): same merge semantics as the full-rewrite layout, but a batch
  * rewrites ONLY the hash-bucket partitions containing staged keys —
  * untouched partitions' data files must remain byte-identical, which
  * is the property that turns per-batch cost from O(table) into
  * O(batch) at 100 TB.
  */
class UpsertPartitionedSpec extends SparkSpec {

  private val Buckets = 8

  private def rows(kv: (String, Int)*): DataFrame = {
    import spark.implicits._
    kv.toSeq.toDF("thing_key", "score")
      .withColumn("title_sanitized", concat(lit("t-"), col("thing_key")))
      .withColumn("author_hash", concat(lit("a-"), col("thing_key")))
  }

  private def upsert(stage: DataFrame, dir: String): Unit =
    Upsert.upsertParquetPartitioned(spark, stage, dir,
      updateColumns = Seq("score", "title_sanitized"), numBuckets = Buckets)

  private def tableState(dir: String): Map[String, (Int, String, String)] =
    Upsert.readKeyedTable(spark, dir).collect()
      .map(r => r.getAs[String]("thing_key") ->
        ((r.getAs[Int]("score"), r.getAs[String]("title_sanitized"),
          r.getAs[String]("author_hash")))).toMap

  /** (relative file path → content hash) of every parquet data file. */
  private def fileHashes(dir: String): Map[String, String] = {
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        root.relativize(p).toString -> md.digest(Files.readAllBytes(p))
          .map("%02x".format(_)).mkString
      }.toMap
  }

  private def bucketOf(key: String): Int =
    rows(key -> 0).select(Upsert.keyBucket(col("thing_key"), Buckets))
      .collect().head.getInt(0)

  test("partitioned upsert: merge semantics match the full-rewrite path") {
    withTempDir { root =>
      val flat = root.resolve("flat").toString
      val part = root.resolve("part").toString
      val base = rows("K1" -> 1, "K2" -> 2, "K3" -> 3, "K4" -> 4)
      val batch = rows("K2" -> 20, "K9" -> 90)
      Upsert.upsertParquet(spark, base, flat,
        updateColumns = Seq("score", "title_sanitized"))
      Upsert.upsertParquet(spark, batch, flat,
        updateColumns = Seq("score", "title_sanitized"))
      upsert(base, part)
      upsert(batch, part)
      val expect = spark.read.parquet(flat).collect()
        .map(r => (r.getAs[String]("thing_key"), r.getAs[Int]("score"),
          r.getAs[String]("title_sanitized"), r.getAs[String]("author_hash")))
        .sortBy(_._1).toSeq
      val got = Upsert.readKeyedTable(spark, part).collect()
        .map(r => (r.getAs[String]("thing_key"), r.getAs[Int]("score"),
          r.getAs[String]("title_sanitized"), r.getAs[String]("author_hash")))
        .sortBy(_._1).toSeq
      assert(got == expect)
      // update semantics: score updated, conflict-protected kept
      val st = tableState(part)
      assert(st("K2") == ((20, "t-K2", "a-K2")))
      assert(st("K9") == ((90, "t-K9", "a-K9")))
    }
  }

  test("untouched partitions are byte-identical after an upsert") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      // enough keys that several buckets are populated
      val keys = (1 to 40).map(i => s"K$i" -> i)
      upsert(rows(keys: _*), dir)
      val before = fileHashes(dir)
      val touchedBucket = bucketOf("K7")
      val populated = Paths.get(dir).toFile.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("kb=")).map(_.getName)
      assert(populated.length > 2, s"want several buckets, got ${populated.toSeq}")

      upsert(rows("K7" -> 700), dir)
      val after = fileHashes(dir)

      val (touched, untouched) =
        before.keys.partition(_.startsWith(s"kb=$touchedBucket/"))
      assert(untouched.nonEmpty)
      untouched.foreach { f =>
        assert(after.get(f).contains(before(f)),
          s"untouched partition file changed or vanished: $f")
      }
      // the touched bucket WAS rewritten (fresh file names)
      assert(touched.forall(f => !after.contains(f)),
        s"touched bucket kb=$touchedBucket kept its old files")
      // and the data is right
      val st = tableState(dir)
      assert(st("K7")._1 == 700)
      assert(st("K8")._1 == 8)
      assert(st.size == 40)
    }
  }

  test("partitioned upsert is idempotent and insert-creates the table") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      val batch = rows("A" -> 1, "B" -> 2)
      upsert(batch, dir)
      upsert(batch, dir) // replay converges
      val st = tableState(dir)
      assert(st == Map(
        "A" -> ((1, "t-A", "a-A")), "B" -> ((2, "t-B", "a-B"))))
      // readKeyedTable hides the layout column
      assert(!Upsert.readKeyedTable(spark, dir).columns.contains("kb"))
    }
  }

  test("a legacy flat table migrates in place on its first partitioned upsert") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      // born under the legacy full-rewrite layout: no kb partitions
      Upsert.upsertParquet(spark, rows("K1" -> 1, "K2" -> 2), dir,
        updateColumns = Seq("score", "title_sanitized"))
      upsert(rows("K2" -> 20, "K3" -> 3), dir)
      val st = tableState(dir)
      assert(st == Map(
        "K1" -> ((1, "t-K1", "a-K1")),
        "K2" -> ((20, "t-K2", "a-K2")),
        "K3" -> ((3, "t-K3", "a-K3"))))
      // and the table is now bucketed: later batches prune
      assert(Paths.get(dir).toFile.listFiles().exists(_.getName.startsWith("kb=")))
      upsert(rows("K3" -> 30), dir)
      assert(tableState(dir)("K3")._1 == 30)
    }
  }

  test("the table's bucket count is pinned at creation, not per call") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      val keys = (1 to 40).map(i => s"K$i" -> i)
      upsert(rows(keys: _*), dir) // created with Buckets = 8
      // a later batch arriving with a DIFFERENT bucket count must not
      // rebucket: a key hashed under the new count would miss its old
      // partition and duplicate instead of update
      Upsert.upsertParquetPartitioned(spark, rows("K7" -> 700), dir,
        updateColumns = Seq("score", "title_sanitized"), numBuckets = 3)
      val all = Upsert.readKeyedTable(spark, dir).collect()
      assert(all.length == 40, s"duplicate keys after bucket mismatch: ${all.length}")
      assert(tableState(dir)("K7")._1 == 700)
    }
  }

  test("a bucket retired by a crashed swap is restored on the next run") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      val keys = (1 to 40).map(i => s"K$i" -> i)
      upsert(rows(keys: _*), dir)
      val before = tableState(dir)
      // simulate a crash after "retire live" but before "install new":
      // the bucket's only copy sits in the .retired sibling
      val b = bucketOf("K7")
      val retired = root.resolve(".table.retired")
      Files.createDirectories(retired)
      Files.move(Paths.get(dir, s"kb=$b"), retired.resolve(s"kb=$b"))
      assert(!Files.exists(Paths.get(dir, s"kb=$b")))
      // the next (retry) batch must first restore the bucket, then merge
      upsert(rows("K7" -> 700), dir)
      val st = tableState(dir)
      assert(st.size == 40, "rows lost across crash recovery")
      assert(st("K7")._1 == 700)
      assert(st.filterNot(_._1 == "K7") == before.filterNot(_._1 == "K7"))
      assert(!Files.exists(retired), "retired scratch dir must be cleaned up")
    }
  }

  test("a migration crash between the swap renames loses no rows on retry") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      Upsert.upsertParquet(spark, rows("K1" -> 1, "K2" -> 2), dir,
        updateColumns = Seq("score", "title_sanitized"))
      // simulate the migration crashing between rename(dir -> .old) and
      // rename(stage -> dir): the table's ONLY copy sits in .old, and a
      // half-baked stage dir is still lying around
      Files.move(Paths.get(dir), root.resolve(".table.old"))
      Files.createDirectories(root.resolve(".table.stage"))
      Files.writeString(root.resolve(".table.stage").resolve("junk"), "x")
      assert(!Files.exists(Paths.get(dir)))
      // the retry (at-least-once: same batch re-delivered) must restore
      // the flat table from .old BEFORE clearing scratch, then migrate —
      // not rebuild the table from the stage batch alone
      upsert(rows("K2" -> 20, "K3" -> 3), dir)
      assert(tableState(dir) == Map(
        "K1" -> ((1, "t-K1", "a-K1")),
        "K2" -> ((20, "t-K2", "a-K2")),
        "K3" -> ((3, "t-K3", "a-K3"))), "pre-existing rows stranded in .old")
      assert(!Files.exists(root.resolve(".table.old")), ".old not cleaned up")
      // and the migrated table carries its bucket pin (written into the
      // staged dir pre-swap, so no crash can separate layout from pin)
      assert(Files.exists(Paths.get(dir, "_graft_buckets")))
    }
  }

  test("full-rewrite upsert restores a crashed swap the same way") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      Upsert.upsertParquet(spark, rows("K1" -> 1, "K2" -> 2), dir,
        updateColumns = Seq("score", "title_sanitized"))
      Files.move(Paths.get(dir), root.resolve(".table.old"))
      Upsert.upsertParquet(spark, rows("K3" -> 3), dir,
        updateColumns = Seq("score", "title_sanitized"))
      assert(tableState(dir).keySet == Set("K1", "K2", "K3"),
        "pre-existing rows stranded in .old")
    }
  }

  test("a bucketed table with no pin refuses a contradicted bucket count") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      upsert(rows((1 to 40).map(i => s"K$i" -> i): _*), dir) // Buckets = 8
      Files.delete(Paths.get(dir, "_graft_buckets")) // pin lost / foreign table
      // some partition id must exceed the smaller count for the check
      val maxKb = Paths.get(dir).toFile.listFiles()
        .map(_.getName).filter(_.startsWith("kb=")).map(_.drop(3).toInt).max
      assert(maxKb >= 3)
      val e = intercept[IllegalStateException] {
        Upsert.upsertParquetPartitioned(spark, rows("K7" -> 700), dir,
          updateColumns = Seq("score", "title_sanitized"), numBuckets = 3)
      }
      assert(e.getMessage.contains("refusing to adopt"), e.getMessage)
      // a LARGER count must also refuse: no partition id exceeds it, but
      // rows don't hash to their partitions under it — adopting would
      // prune reads to the wrong buckets and silently duplicate keys
      val e2 = intercept[IllegalStateException] {
        Upsert.upsertParquetPartitioned(spark, rows("K7" -> 700), dir,
          updateColumns = Seq("score", "title_sanitized"), numBuckets = 64)
      }
      assert(e2.getMessage.contains("refusing to adopt"), e2.getMessage)
      // a MATCHING adoption (rows rehash to their partitions) is
      // allowed and re-pins
      Upsert.upsertParquetPartitioned(spark, rows("K7" -> 700), dir,
        updateColumns = Seq("score", "title_sanitized"), numBuckets = Buckets)
      assert(Files.exists(Paths.get(dir, "_graft_buckets")))
      assert(tableState(dir).size == 40)
      assert(tableState(dir)("K7")._1 == 700)
    }
  }

  test("target read is partition-pruned to staged buckets") {
    withTempDir { root =>
      val dir = root.resolve("table").toString
      upsert(rows((1 to 40).map(i => s"K$i" -> i): _*), dir)
      // the pruned read the sink issues: filter on the partition column
      val touched = Seq(bucketOf("K7"))
      val plan = spark.read.parquet(dir)
        .filter(col("kb").isin(touched.map(Int.box): _*))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters:"), plan.take(1500))
      assert(plan.contains("kb#"), plan.take(1500))
    }
  }
}
