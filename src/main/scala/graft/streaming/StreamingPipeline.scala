package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.{GraftConf, Model}
import graft.jobs.{CombineJob, LoadJob}
import graft.sinks.Upsert

/** Structured Streaming mode (SURVEY §2.9): the reference IS a
  * hand-rolled file-source stream — cron-appended CSVs, exactly-once
  * consumption via archive-move, keyed upsert sink. One streaming query
  * replaces both DAGs:
  *
  *  - T1 cadence → `Trigger.ProcessingTime` / `AvailableNow`
  *  - T2 exactly-once files → checkpointed file source +
  *    `cleanSource=archive` (the engine's own archive-after-batch)
  *  - T3 at-least-once + idempotent sink → `foreachBatch` keyed upsert
  *  - T4 in-batch dedup → first-wins inside the batch
  *  - T5 no-watermark changelog upsert (late rows still update score)
  */
object StreamingPipeline {

  /** All-string schema of the landing CSV (header family of the current
    * fetcher). Streaming reads need an explicit schema.
    */
  val LandingSchema: StructType =
    StructType(Model.DbColumns.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))

  /** The fused combine+load stream: landing dir → normalize → in-batch
    * first-wins dedup → typed upsert into the parquet serving table.
    * `maxFilesPerTrigger` bounds batch size; `cleanSource=archive`
    * reproduces the loaded/-move (T2).
    *
    * In-batch encounter order: the file source provides no global file
    * rank, so first-wins uses `input_file_name` (lexicographic — the
    * reference's sort order) + in-partition position, which for the
    * unsplittable micro-batch files equals the reference's order.
    */
  def start(
      spark: SparkSession,
      dataDir: String,
      loadedDir: String,
      tableDir: String,
      checkpointDir: String,
      conf: GraftConf = GraftConf.default,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = spark.readStream
      .schema(LandingSchema)
      .option("header", "true")
      .option("pathGlobFilter", "italytravel_*.csv")
      .option("maxFilesPerTrigger", "16")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", loadedDir)
      .csv(dataDir)

    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val ordered = batch
            .withColumn("file_seq",
              dense_rank().over(
                org.apache.spark.sql.expressions.Window
                  .orderBy(input_file_name())))
            .withColumn("row_seq", monotonically_increasing_id())
          val stage = LoadJob.typed(CombineJob.transform(ordered, conf))
            .withColumn("ingested_at", current_timestamp())
          Upsert.upsertParquet(spark, stage, tableDir,
            updateColumns = conf.updateColumns)
        }
        ()
      }
      .start()
  }

  // ------------------------------------------------------------ T5/T7

  /** Event-time tumbling aggregation with a watermark (T5 analytics
    * form): counts + value sums per (window, event_type); late data
    * beyond the watermark is dropped.
    */
  def hourlyEventCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-key running state for T7: tracks each user's event count and
    * running value sum across micro-batches via mapGroupsWithState —
    * the engine analog of per-`thing_key` score-trajectory tracking.
    */
  final case class UserEvent(user_id: Long, value: Double)
  final case class UserStat(user_id: Long, n_events: Long, sum_value: Double)

  def trackUserStats(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          val next = rows.foldLeft(prev) { (s, e) =>
            UserStat(uid, s.n_events + 1, s.sum_value + e.value)
          }
          state.update(next)
          next
      }
  }

  /** Cross-batch keyed dedup with bounded state (T4 scale form):
    * duplicates of a key arriving within the watermark horizon are
    * dropped; state ages out beyond it.
    */
  def dedupWithinWatermark(
      df: DataFrame,
      key: String,
      tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(key)
}
