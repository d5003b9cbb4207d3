package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Pins `Tables.parquetCachedSchema`'s contract (round 12): the cache
  * holds SCHEMA only — data reads and file listings always run fresh —
  * keyed by path + top-level FileStatus so an in-place rewrite
  * re-infers, while appends inside existing partition dirs (which can
  * leave the top-level mtime untouched) legitimately hit the cache
  * because every engine-managed table has a fixed per-path schema.
  */
class SchemaCacheSpec extends SparkSpec {

  test("cached-schema read sees fresh DATA after an in-partition append") {
    withTempDir { root =>
      import spark.implicits._
      val dir = root.resolve("t").toString
      Seq((1L, 10)).toDF("id", "cell")
        .write.partitionBy("cell").parquet(dir)
      assert(Tables.parquetCachedSchema(spark, dir).count() == 1)
      // append INTO the existing cell=10 partition: schema unchanged,
      // rows must be visible even when the schema cache hits
      Seq((2L, 10)).toDF("id", "cell")
        .write.mode("append").partitionBy("cell").parquet(dir)
      val df = Tables.parquetCachedSchema(spark, dir)
      assert(df.count() == 2, "cache must never cache data or listings")
      assert(df.schema.fieldNames.toSet == Set("id", "cell"))
    }
  }

  test("an in-place rewrite with a different schema re-infers") {
    withTempDir { root =>
      import spark.implicits._
      val dir = root.resolve("t").toString
      Seq((1L, "a")).toDF("id", "s").write.parquet(dir)
      assert(Tables.parquetCachedSchema(spark, dir)
        .schema.fieldNames.toSet == Set("id", "s"))
      // the cache invalidates on the top-level (len, mtime) — on a
      // filesystem with coarse (1s) mtime granularity a fast rewrite
      // can land under the SAME status key, so retry the overwrite
      // until the key provably moved (asserted, not assumed: a stale
      // key would serve the old cached schema and flake this test)
      def statusKey: String = {
        val p = new org.apache.hadoop.fs.Path(dir)
        val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p)
        s"${st.getLen}:${st.getModificationTime}"
      }
      val before = statusKey
      var tries = 0
      while ({
        Seq((1L, 2.0, true)).toDF("id", "d", "b")
          .write.mode("overwrite").parquet(dir)
        statusKey == before && tries < 40
      }) { tries += 1; Thread.sleep(50) }
      assert(statusKey != before,
        "rewrite never moved the FileStatus key — cannot test re-inference")
      val df = Tables.parquetCachedSchema(spark, dir)
      assert(df.schema.fieldNames.toSet == Set("id", "d", "b"),
        "rewrite must change the FileStatus key and re-infer")
      assert(df.count() == 1)
    }
  }

  test("partition-pruned reads keep typed partition filters through the cache") {
    withTempDir { root =>
      import spark.implicits._
      val dir = root.resolve("t").toString
      Seq((1L, 3), (2L, 4)).toDF("id", "cell")
        .write.partitionBy("cell").parquet(dir)
      val pruned = Tables.parquetCachedSchema(spark, dir)
        .filter(col("cell") === 3)
      assert(pruned.count() == 1)
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      assert(scan.contains("PartitionFilters") && scan.contains("cell"),
        s"partition pruning must survive the explicit schema:\n$scan")
    }
  }
}
