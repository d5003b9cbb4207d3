package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sinks.CuratedCorpus

/** Layout contract of the curated-corpus writer: hive partition dirs,
  * partition pruning at read, contiguous sorted sortCol ranges per file
  * (what makes parquet min/max row-group pruning effective at 100 TB).
  */
class CuratedCorpusSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def listParquet(dir: JPath): Seq[JPath] = {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
  }

  test("writes hive partitions, prunes them at read, sorts within files") {
    withTempDir { root =>
      val out = root.resolve("corpus").toString
      val docs = Tables.load(spark, sfDir, "documents")
      CuratedCorpus.write(docs, out, Seq("lang"), "doc_id", numFiles = 8)

      val langs = docs.select("lang").distinct().as(spark.implicits.newStringEncoder)
        .collect().toSet
      val dirs = Files.list(root.resolve("corpus")).iterator()
      import scala.jdk.CollectionConverters._
      val partDirs = dirs.asScala.map(_.getFileName.toString)
        .filter(_.startsWith("lang=")).toSet
      assert(partDirs == langs.map(l => s"lang=$l"),
        s"partition dirs $partDirs != expected for langs $langs")

      // Partition pruning: the lang predicate must land in
      // PartitionFilters (directory-level pruning), not PushedFilters.
      val read = spark.read.parquet(out).filter(col("lang") === "en")
      val plan = read.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(lang"),
        s"lang predicate not partition-pruned:\n$plan")
      assert(read.count() == docs.filter(col("lang") === "en").count())

      // Every file holds doc_ids sorted ascending (tight min/max stats),
      // and files within one partition dir cover disjoint ranges (the
      // range exchange's contiguity guarantee).
      val files = listParquet(root.resolve("corpus"))
      assert(files.nonEmpty)
      val ranges = files.map { f =>
        val ids = spark.read.parquet(f.toString)
          .select("doc_id").as(spark.implicits.newLongEncoder).collect().toSeq
        assert(ids == ids.sorted, s"unsorted doc_id in $f")
        (f.getParent.getFileName.toString, ids.min, ids.max)
      }
      ranges.groupBy(_._1).foreach { case (part, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq((_, _, hi), (_, lo, _)) =>
            assert(hi < lo, s"overlapping file ranges in $part: $sorted")
          case _ =>
        }
      }
    }
  }
}
