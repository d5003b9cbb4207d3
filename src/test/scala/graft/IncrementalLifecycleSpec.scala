package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.DedupQueries
import graft.sinks.IncrementalParquet

/** Randomized lifecycle property for the incremental-table protocol —
  * the machinery now under four production tables (signatures, sign
  * buckets, ANN codes, raw vectors). The deterministic specs pin each
  * crash window in isolation; this one drives seeded RANDOM
  * interleavings of the live operations (append, replay of an already-
  * acked batch, minor firing, full rewrite) and demands after EVERY
  * step that the on-disk table equals an in-memory reference of
  * exactly-once batch content — so any interleaving that duplicates,
  * drops, or resurrects rows fails at the first step that breaks, with
  * the seed and op trace in the failure message.
  */
class IncrementalLifecycleSpec extends SparkSpec {

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def batchDf(b: Int, rows: Int): DataFrame = {
    import spark.implicits._
    (0 until rows).map { k =>
      val id = b * 10000L + k
      (id, s"w${math.floorMod(mix(id), 500)} w${math.floorMod(mix(id * 31), 500)} body $id")
    }.toDF("doc_id", "text")
  }

  test("random op interleavings keep the table exactly-once (seeded)") {
    for (seed <- Seq(11L, 77L, 1234L)) {
      withTempDir { root =>
        val t = root.resolve(s"sig-$seed").toString
        val rnd = new scala.util.Random(seed)
        var nextBatch = 0
        val applied = scala.collection.mutable.ArrayBuffer.empty[Int]
        val trace = scala.collection.mutable.ArrayBuffer.empty[String]

        def expectIds(): Set[Long] =
          applied.flatMap(b => (0 until 50).map(k => b * 10000L + k)).toSet

        def check(): Unit = {
          val got = spark.read.parquet(t).select(col("doc_id"))
            .collect().map(_.getLong(0)).toSeq
          val want = expectIds()
          assert(got.size == want.size && got.toSet == want,
            s"seed=$seed trace=${trace.mkString(",")}: " +
              s"${got.size} rows on disk vs ${want.size} expected " +
              s"(dupes=${got.size - got.toSet.size})")
        }

        // first op is always an append so the table exists
        DedupQueries.appendToSignaturesIdempotent(batchDf(0, 50), t, 0L)
        applied += 0; nextBatch = 1; trace += "a0"
        check()

        for (_ <- 0 until 14) {
          rnd.nextInt(10) match {
            case n if n < 4 => // fresh append
              val b = nextBatch
              DedupQueries.appendToSignaturesIdempotent(batchDf(b, 50), t, b.toLong)
              applied += b; nextBatch += 1; trace += s"a$b"
            case n if n < 6 => // replay of a random already-acked batch
              val b = applied(rnd.nextInt(applied.size))
              DedupQueries.appendToSignaturesIdempotent(batchDf(b, 50), t, b.toLong)
              trace += s"r$b"
            case n if n < 9 => // minor firing (may be a no-op)
              val k = IncrementalParquet.compactMinor(spark, t, "bkt",
                minBatchFiles = 1 + rnd.nextInt(2), maxBaseFiles = 2 + rnd.nextInt(3))
              trace += s"m$k"
            case _ => // full rewrite
              val k = DedupQueries.compactSignatures(spark, t)
              trace += s"F$k"
          }
          check()
        }

        // end state: one more of each compaction kind, then every acked
        // batch replays to a no-op even though its files were absorbed
        IncrementalParquet.compactMinor(spark, t, "bkt", minBatchFiles = 1)
        trace += "m!"; check()
        DedupQueries.compactSignatures(spark, t)
        trace += "F!"; check()
        applied.toSeq.distinct.foreach { b =>
          DedupQueries.appendToSignaturesIdempotent(batchDf(b, 50), t, b.toLong)
        }
        trace += "replay-all"; check()
      }
    }
  }
}
