package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Loader for the analytics corpus (repo:TESTDATA.md): one parquet file
  * per table under a scale-factor directory.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The events table carries INT64 TIMESTAMP(NANOS) — a parquet type
    // Spark doesn't model (SPARK-40819). Read nanos as long, then
    // normalize to TimestampType at microsecond precision (`div` keeps
    // the arithmetic in exact integer space; a double division would
    // lose precision above 2^53 ns). DuckDB's CAST(ts_ns AS TIMESTAMP)
    // truncates identically, so oracle parity holds.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = parquetCachedSchema(spark, s"$sfDir/$name.parquet")
    df.schema.fields.filter(f => f.name == "ts" && f.dataType == LongType)
      .foldLeft(df)((d, f) =>
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000"))))
  }

  /** Inferred-schema cache for parquet reads of stable-schema tables —
    * the corpus tables and the engine's stored derived-state tables.
    * `spark.read.parquet(path)` pays a footer-read JOB per call for
    * schema inference; at the warm-serve job-count floor (round 11/12:
    * tiny-input walls are jobs × fixed overhead, not data) that one
    * job is a measurable slice of EVERY catalog query's wall. The
    * cache validates against the top-level FileStatus (len + mtime),
    * so an in-place rewrite of a table file re-infers. Appends INSIDE
    * an existing partition dir can leave the top-level mtime unchanged
    * and hit the cache — safe here by construction: every stored table
    * kind in this engine has a fixed per-path schema (appends and
    * compaction never alter columns), and SCHEMA is all the cache
    * holds; file listings and data reads always run fresh. One entry
    * per PATH (the status key is stored in the value and replaced when
    * it drifts): keying the map by path+status would insert a fresh
    * entry on every compaction/overwrite that touches the top-level
    * mtime and never evict the stale one — a slow driver-side leak
    * over a long-lived maintenance loop's hundreds of firings.
    * Residual risk (shared with IncrementalParquet's note cache): a
    * same-length rewrite within one mtime tick on a coarse-granularity
    * filesystem is invisible to the (len, mtime) key — harmless here
    * because rewrites of a stored table never change its schema, which
    * is all this cache holds.
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  def parquetCachedSchema(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val statusKey = s"${st.getLen}:${st.getModificationTime}"
    val cached = schemaCache.get(path)
    if (cached != null && cached._1 == statusKey)
      spark.read.schema(cached._2).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, (statusKey, df.schema))
      df
    }
  }

  /** The bucket id the incremental writers assign to `value` —
    * computed via the SAME plan-side expression (pmod∘hash) they use,
    * evaluated on a 1-row frame, so a driver-side reimplementation can
    * never drift from the stored layout.
    */
  def hashBucket(spark: SparkSession, value: String, n: Int): Int =
    spark.range(1).select(pmod(hash(lit(value)), lit(n))).head.getInt(0)

  /** The distinct values of `values`' single string column together
    * with their writer-side bucket ids — THE one implementation of
    * the collect-for-literal-pushdown idiom every stored-index serve
    * uses (bm25 literal arm, phrase serves, relevance model): bucket
    * ids come from the SAME plan-side expression the incremental
    * writers use (pmod∘hash), evaluated in ONE job over the
    * (driver-sized by construction) value frame, so a serve-side
    * reimplementation can never drift from the stored layout.
    */
  def valueBuckets(values: DataFrame, n: Int): (Seq[String], Seq[Int]) = {
    // values already ON the driver (a LocalRelation — the localized
    // query sides since r17) take the job-free arm: same expression,
    // eagerly evaluated — an interactive serve's bucket derivation
    // must not cost a scheduler round trip (the job-floor lesson)
    localStrings(values) match {
      case Some(vs) => valueBucketsLocal(vs, n)
      case None =>
        val c = col(values.columns.head)
        val rows = values.select(c.as("v"), pmod(hash(c), lit(n)).as("bkt"))
          .distinct().collect()
        (rows.map(_.getString(0)).toSeq.distinct,
          rows.map(_.getInt(1)).toSeq.distinct)
    }
  }

  /** [[valueBuckets]] for values ALREADY on the driver: the SAME
    * plan-side expression (pmod∘hash) the incremental writers use,
    * eagerly evaluated (its children are Literals, so it is resolved
    * and needs no row) — bit-identical bucket ids with NO Spark job.
    */
  def valueBucketsLocal(values: Seq[String], n: Int): (Seq[String], Seq[Int]) = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    val vs = values.distinct
    // the very expression `pmod(hash(v), n)` resolves to — Murmur3Hash
    // (seed 42) under Pmod — constructed resolved so it evals eagerly
    val bkts = vs.map(v =>
      Pmod(new Murmur3Hash(Seq(Literal.create(v, StringType))), Literal(n))
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Int]).distinct
    (vs, bkts)
  }

  /** The single string column of a frame whose OPTIMIZED plan is a
    * LocalRelation, extracted without running a job (the optimizer
    * collapses Project-over-LocalRelation, so `select` of one column
    * of a localized frame qualifies); None for distributed frames —
    * callers then fall back to the plan-side derivation.
    */
  private def localStrings(df: DataFrame): Option[Seq[String]] =
    df.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if lr.output.size == 1 &&
            lr.output.head.dataType ==
              org.apache.spark.sql.types.StringType =>
        Some(lr.data.map(r => Option(r.getUTF8String(0))
          .map(_.toString).orNull).toSeq)
      case _ => None
    }

  /** Register every table as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Content fingerprint of a table's files (names + sizes + mtimes,
    * SHA-256). Memo keys for per-corpus derived state (codebooks, stored
    * codes/signature tables) fold this in, so an in-session mutation of
    * a corpus dir changes the key and forces a rebuild instead of
    * silently serving stale derived data. One FS listing per call —
    * metadata-only, no data read.
    */
  def tableFingerprint(spark: SparkSession, sfDir: String, name: String): String = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val p = new Path(s"$sfDir/$name.parquet")
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val entries =
      if (!fs.exists(p)) Seq("absent")
      else if (fs.getFileStatus(p).isDirectory) {
        // RECURSIVE listing: partitioned layouts (cell=/lang= subdirs)
        // keep their data files one level down — a top-level-only scan
        // would fingerprint them all as the same empty listing and
        // serve stale derived state after a mutation
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          val rel = p.toUri.relativize(st.getPath.toUri).getPath
          buf += s"$rel:${st.getLen}:${st.getModificationTime}"
        }
        buf.sorted.toSeq
      } else {
        val st = fs.getFileStatus(p)
        Seq(s"${p.getName}:${st.getLen}:${st.getModificationTime}")
      }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(entries.mkString(";").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Memo key for state derived from `sfDir/name`: the path plus the
    * content fingerprint (see [[tableFingerprint]]).
    */
  def derivedStateKey(spark: SparkSession, sfDir: String, name: String): String =
    s"$sfDir@${tableFingerprint(spark, sfDir, name)}"

  /** Build-once-per-key parquet memo shared by every per-corpus derived
    * state (stored signatures, sign buckets, codes tables): look the
    * key up, else write into a fresh temp dir via `build` and publish
    * with putIfAbsent — a lost creation race leaves one orphan temp dir
    * and adopts the winner's path. Centralized so the race/invalidation
    * semantics cannot drift between the four call sites.
    */
  def memoizedParquet(
      memo: java.util.concurrent.ConcurrentHashMap[String, String],
      key: String, tmpPrefix: String)(build: String => Unit): String = {
    val hit = memo.get(key)
    if (hit != null) hit
    else {
      val out = java.nio.file.Files.createTempDirectory(tmpPrefix).toString
      build(out)
      val prev = memo.putIfAbsent(key, out)
      if (prev != null) prev else out
    }
  }
}
