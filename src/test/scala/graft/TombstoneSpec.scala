package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.IncrementalParquet

/** The deletion lifecycle (tombstones + serve-side filtering +
  * physical purge) on the shared incremental machinery. Pins the
  * properties a GDPR-class takedown depends on: exactly-once delete
  * batches (replay is a no-op forever, including after purge);
  * serve-side filtering from the moment the delete acks with zero
  * rewrite; purge rewrites ONLY the partitions holding tombstoned
  * rows (O(touched), never O(table) — untouched partitions stay
  * byte-identical); purge + clear leaves the table byte-clean and a
  * fully-emptied partition disappears; in-flight (unacked) ingest
  * state defers the clear instead of corrupting it.
  */
class TombstoneSpec extends SparkSpec {

  private def rows(lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    (lo until hi).map(i => (i, s"payload-$i", (i % 8).toInt))
      .toDF("doc_id", "payload", "bkt")
  }

  private def append(dir: String, d: DataFrame, id: Long): Unit =
    IncrementalParquet.appendIdempotent(spark, dir, "bkt", id)(d)

  private def served(dir: String): Seq[Long] =
    IncrementalParquet.applyTombstones(spark, dir, "doc_id")(
      spark.read.parquet(dir)).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted.toSeq

  /** (fileName -> mtime) census of every partition dir. */
  private def fileCensus(dir: String): Map[String, Long] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("bkt="))
      .flatMap(p => Files.list(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => s"${p.getFileName}/${f.getFileName}" ->
          Files.getLastModifiedTime(f).toMillis))
      .toMap

  test("tombstone append is exactly-once; serve filters from the ack " +
      "on with no table rewrite; a never-deleted table's serve is " +
      "plan-identical (no join added)") {
    import spark.implicits._
    withTempDir { root =>
      val t = root.resolve("t").toString
      append(t, rows(0, 64), 0L)
      val before = fileCensus(t)
      // no tombstones: applyTombstones is the identity — same plan
      val plain = spark.read.parquet(t)
      assert(IncrementalParquet.applyTombstones(spark, t, "doc_id")(plain)
        .queryExecution.optimizedPlan ==
        plain.queryExecution.optimizedPlan)
      IncrementalParquet.appendTombstonesIdempotent(spark, t, "doc_id", 0L)(
        Seq(3L, 11L, 11L, 999L).toDF("doc_id")) // dup + never-ingested
      assert(served(t) == (0L until 64L).filterNot(Set(3L, 11L)).sorted)
      // the DATA files were not rewritten by the takedown
      assert(fileCensus(t) == before, "takedown must not rewrite the table")
      // replay of the same delete batch: no-op (acked)
      IncrementalParquet.appendTombstonesIdempotent(spark, t, "doc_id", 0L)(
        Seq(5L).toDF("doc_id")) // different content — must be IGNORED
      assert(served(t).contains(5L), "replayed delete batch must be a no-op")
      assert(IncrementalParquet.tombstoneAcked(spark, t, 0L))
      assert(!IncrementalParquet.tombstoneAcked(spark, t, 1L))
    }
  }

  test("purge rewrites ONLY partitions holding tombstoned rows; " +
      "untouched partitions stay byte-identical; tombstone rows clear " +
      "but replayed delete batches stay no-ops; a fully-deleted " +
      "partition disappears") {
    import spark.implicits._
    withTempDir { root =>
      val t = root.resolve("t").toString
      append(t, rows(0, 64), 0L)
      // delete keys in buckets 3 (3,11,19,...) — and ALL of bucket 5
      val b5 = (0L until 64L).filter(_ % 8 == 5)
      val del = Seq(3L, 11L) ++ b5
      IncrementalParquet.appendTombstonesIdempotent(spark, t, "doc_id", 0L)(
        del.toDF("doc_id"))
      val before = fileCensus(t)
      val purged = IncrementalParquet.purgeTombstoned(
        spark, t, "bkt", "doc_id")(s => Int.box(s.toInt))
      assert(purged == 2, s"expected exactly buckets 3 and 5, got $purged")
      val after = fileCensus(t)
      val untouchedBefore = before.view.filterKeys(k =>
        !k.startsWith("bkt=3/") && !k.startsWith("bkt=5/")).toMap
      val untouchedAfter = after.view.filterKeys(k =>
        !k.startsWith("bkt=3/") && !k.startsWith("bkt=5/")).toMap
      assert(untouchedAfter == untouchedBefore,
        "purge must not rewrite partitions without tombstoned rows")
      assert(!Files.exists(Paths.get(t, "bkt=5")),
        "a fully-deleted partition must disappear")
      // byte-clean: raw read (no tombstone filter) excludes deleted
      val raw = spark.read.parquet(t).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(del.filter(_ < 64).forall(!raw.contains(_)))
      assert(raw == (0L until 64L).toSet -- del)
      // tombstone rows cleared; acks retained; replay still a no-op
      assert(!IncrementalParquet.hasTombstones(spark, t))
      assert(IncrementalParquet.tombstoneAcked(spark, t, 0L))
      IncrementalParquet.appendTombstonesIdempotent(spark, t, "doc_id", 0L)(
        Seq(7L).toDF("doc_id"))
      assert(!IncrementalParquet.hasTombstones(spark, t),
        "replayed delete batch after purge must stay a no-op")
      assert(served(t).contains(7L))
      // a SECOND delete cycle works (fresh batch id)
      IncrementalParquet.appendTombstonesIdempotent(spark, t, "doc_id", 1L)(
        Seq(7L).toDF("doc_id"))
      assert(!served(t).contains(7L))
      IncrementalParquet.purgeTombstoned(
        spark, t, "bkt", "doc_id")(s => Int.box(s.toInt))
      assert(!spark.read.parquet(t).select(col("doc_id"))
        .collect().map(_.getLong(0)).contains(7L))
    }
  }

  test("purge skips a partition holding UNACKED batch files and " +
      "retains the tombstones (serve stays filtered); the next purge " +
      "after the ingest settles completes the cycle") {
    import spark.implicits._
    withTempDir { root =>
      val t = root.resolve("t").toString
      append(t, rows(0, 64), 0L)
      IncrementalParquet.appendTombstonesIdempotent(spark, t, "doc_id", 0L)(
        Seq(2L, 3L).toDF("doc_id")) // buckets 2 and 3
      // simulate a crashed in-flight ingest into bucket 2: a batch
      // file whose ack marker does not exist
      val crashed = Paths.get(t, "bkt=2", "b99-0.parquet")
      val donor = Files.list(Paths.get(t, "bkt=2")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
      Files.copy(donor, crashed)
      val purged = IncrementalParquet.purgeTombstoned(
        spark, t, "bkt", "doc_id")(s => Int.box(s.toInt))
      assert(purged == 1, "only bucket 3 is safe to rewrite")
      assert(IncrementalParquet.hasTombstones(spark, t),
        "tombstones must survive while a touched partition is skipped")
      assert(!served(t).contains(2L), "serve stays filtered meanwhile")
      // ingest settles: ack b99, then purge completes and clears
      Files.createDirectories(Paths.get(t, "_ingested"))
      Files.createFile(Paths.get(t, "_ingested", "b99"))
      val purged2 = IncrementalParquet.purgeTombstoned(
        spark, t, "bkt", "doc_id")(s => Int.box(s.toInt))
      assert(purged2 == 1)
      assert(!IncrementalParquet.hasTombstones(spark, t))
      val raw = spark.read.parquet(t).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(!raw.contains(2L) && !raw.contains(3L))
    }
  }
}
