package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline.{UserEvent, UserStatsProcessor}

/** Streaming state-store probe — the SCALING.md evidence for the one
  * north-star surface with no batch analog: keyed state size and
  * throughput for `dropDuplicatesWithinWatermark` and
  * `transformWithState` on the RocksDB state-store backend at 100k /
  * 1M / 4M distinct keys.
  *
  * Method: a parquet directory of `n` rows with `n` distinct keys
  * (64-hex SHA-256 dedup keys — the fingerprint shape the
  * decontamination gate dedups on) is consumed with
  * `Trigger.AvailableNow` + `maxFilesPerTrigger` so state builds
  * across several micro-batches, exactly like production ingest; event
  * times span 1h against a 2h watermark so no state is evicted and the
  * final `StateOperatorProgress` reports the store at full key
  * cardinality. The interesting numbers are the per-key state
  * footprint (flat across cardinalities ⇒ sizing executor state disks
  * at 100 TB is arithmetic) and rows/s (flat ⇒ state maintenance is
  * not the ingest bottleneck).
  */
object StreamStateProbe {

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("stream-state", 32)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    spark.range(1).count() // warm the session

    for (n <- Seq(100000L, 1000000L, 4000000L)) {
      val inDir = s"/tmp/stream_state_in_$n"
      if (!new java.io.File(inDir).exists) {
        spark.range(n)
          .select(
            col("id").as("user_id"),
            sha2(col("id").cast("string"), 256).as("key"),
            timestamp_seconds(lit(1700000000L) + col("id") % 3600).as("ts"),
            (col("id") % 97).cast("double").as("value"))
          .repartition(8)
          .write.mode("overwrite").parquet(inDir)
      }
      val schema = spark.read.parquet(inDir).schema

      def runQuery(label: String)(
          build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"probe-$label-$n").toString
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "2")
          .parquet(inDir)
        val t0 = System.nanoTime()
        val q = build(src).writeStream
          .format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val so = q.lastProgress.stateOperators.head
        val rocksSst = Option(so.customMetrics.get("rocksdbSstFileSize"))
          .map(_.longValue()).getOrElse(-1L)
        val rocksMem = Option(so.customMetrics.get("rocksdbTotalMemoryUsageBytes"))
          .map(_.longValue()).getOrElse(-1L)
        println(f"SCALE-STREAMSTATE op=$label keys=$n rows=$n wall=$wall%.1f " +
          f"rows_per_s=${n / wall}%.0f state_rows=${so.numRowsTotal} " +
          f"mem_bytes=${so.memoryUsedBytes} sst_bytes=$rocksSst " +
          f"rocks_mem_bytes=$rocksMem " +
          f"bytes_per_key=${(so.memoryUsedBytes + math.max(rocksSst, 0)).toDouble / n}%.1f")
      }

      runQuery("dropDupWithinWM") { src =>
        src.withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark("key")
      }
      runQuery("transformWithState") { src =>
        src.select(col("user_id"), col("value")).as[UserEvent]
          .groupByKey(_.user_id)
          .transformWithState(new UserStatsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF()
      }
    }
    spark.stop()
  }
}
