package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.analytics.SimilarityQueries
import graft.core.Tables
import graft.operators.CodebookTrainer

/** Incremental ANN index ingest: appending a new vector batch into the
  * stored codes table must (a) yield a table that serves row-identically
  * to one built from the full corpus in one shot, and (b) never rewrite
  * the files of cells the batch does not touch — the property that
  * makes per-batch ingest O(batch), not O(index), at 100 TB.
  */
class CodesIncrementalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("append-half == build-full, and untouched cell files are byte-stable") {
    withTempDir { root =>
      val e = Tables.load(spark, sf, "embeddings")
      val cb = CodebookTrainer.initCodebook(e, 16, normalize = false)
      val full = root.resolve("full").toString
      val inc = root.resolve("inc").toString

      SimilarityQueries.codesTable(e, cb, cb)
        .write.mode("overwrite").partitionBy("cell").parquet(full)

      val half1 = e.filter(col("vec_id") % 2 === 0)
      val half2 = e.filter(col("vec_id") % 2 =!= 0)
      SimilarityQueries.codesTable(half1, cb, cb)
        .write.mode("overwrite").partitionBy("cell").parquet(inc)

      // snapshot the first batch's data files before the append
      def files(dir: String): Map[String, Long] = {
        val r = Paths.get(dir)
        import scala.jdk.CollectionConverters._
        Files.walk(r).iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
          .map(p => r.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
          .toMap
      }
      val before = files(inc)

      SimilarityQueries.appendToCodes(half2, inc, cb, cb)

      // (b) every pre-existing data file survives the append untouched
      val after = files(inc)
      before.foreach { case (f, mtime) =>
        assert(after.contains(f), s"append rewrote/removed $f")
        assert(after(f) == mtime, s"append modified $f")
      }
      assert(after.size > before.size, "append added no files")

      // (a) the incrementally built index serves row-identically to the
      // one-shot build
      val servedInc = SimilarityQueries.ivfPqServeFromCodes(
        e, spark.read.parquet(inc), cb, cb, 10).collect().toSeq
      val servedFull = SimilarityQueries.ivfPqServeFromCodes(
        e, spark.read.parquet(full), cb, cb, 10).collect().toSeq
      assert(servedInc == servedFull)
      // and to the in-query index (transitively q_ann_ivfpq)
      assert(servedInc == SparkEntry.queries("q_ann_ivfpq")(spark, sf)
        .collect().toSeq)
    }
  }
}
