package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Model

/** Keyed UPSERT sink (SURVEY §2.1 S7/S8/S10) — the one genuinely custom
  * component: Spark's JDBC writer has no ON CONFLICT path.
  *
  * Three layers, outermost first:
  *  1. [[merge]] — the relational semantics (full-outer-join + column
  *     selection), engine-side, used by tests and by the parquet-table
  *     upsert the streaming pipeline drives. Same semantics as Delta's
  *     `MERGE WHEN MATCHED UPDATE SET ... WHEN NOT MATCHED INSERT`.
  *  2. [[upsertStatement]] — the `INSERT ... ON CONFLICT (key) DO UPDATE
  *     SET col = EXCLUDED.col` SQL the reference hands Postgres
  *     (Combine_send_to_postgresql.py:239-249), with identifier quoting
  *     per `q_ident` (:220-225).
  *  3. [[writeJdbc]] — executor-parallel delivery: repartition by key
  *     (co-locates conflicting rows → no deadlock between batches),
  *     per-partition PreparedStatement batches inside a transaction.
  *     Per-partition transactions are a weakening of the reference's
  *     single-txn commit (SURVEY §7.4 risk #2); the sink is idempotent
  *     under retry, which is what at-least-once needs.
  *  4. [[writeJdbcStaged]] — the faithful atomicity variant: parallel
  *     load of a scratch stage table, then ONE set-based merge
  *     transaction against the target (the reference's single-commit
  *     contract, Combine_send_to_postgresql.py:251-264).
  */
object Upsert {

  /** How the upsert statement reaches the database. [[Postgres]] is the
    * reference's single-statement `ON CONFLICT` form (the production
    * dialect); [[UpdateElseInsert]] is the portable ANSI fallback —
    * UPDATE by key, INSERT when no row matched — for engines without a
    * native upsert. JdbcUpsertSpec drives BOTH the DDL and the
    * UpdateElseInsert path end-to-end against embedded Derby (the only
    * JDBC engine shipped in this image); the Postgres path shares every
    * layer above the final statement shape.
    */
  sealed trait Dialect extends Serializable
  case object Postgres extends Dialect
  case object UpdateElseInsert extends Dialect

  /** `"` quoting as in q_ident (Combine_send_to_postgresql.py:220-225). */
  def qIdent(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  /** The reference's upsert statement, parameterized. */
  def upsertStatement(
      table: String,
      columns: Seq[String] = Model.DbColumns,
      keyColumn: String = "thing_key",
      updateColumns: Seq[String] = Model.DefaultUpdateColumns): String = {
    val cols = columns.map(qIdent).mkString(", ")
    val params = columns.map(_ => "?").mkString(", ")
    val sets = updateColumns
      .map(c => s"${qIdent(c)} = EXCLUDED.${qIdent(c)}")
      .mkString(", ")
    s"INSERT INTO $table ($cols) VALUES ($params) " +
      s"ON CONFLICT (${qIdent(keyColumn)}) DO UPDATE SET $sets"
  }

  /** UPDATE arm of the [[UpdateElseInsert]] dialect. */
  def updateStatement(
      table: String,
      keyColumn: String = "thing_key",
      updateColumns: Seq[String] = Model.DefaultUpdateColumns): String =
    s"UPDATE $table SET ${updateColumns.map(c => s"${qIdent(c)} = ?").mkString(", ")} " +
      s"WHERE ${qIdent(keyColumn)} = ?"

  /** INSERT arm of the [[UpdateElseInsert]] dialect. */
  def insertStatement(
      table: String,
      columns: Seq[String] = Model.DbColumns): String =
    s"INSERT INTO $table (${columns.map(qIdent).mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})"

  /** Idempotent target-table DDL (S10 — legacy loader behavior,
    * FIXTURES.md §5).
    */
  val EnsureTableDdl: Seq[String] = Seq(
    "CREATE SCHEMA IF NOT EXISTS reddit_schema",
    """CREATE TABLE IF NOT EXISTS reddit_schema.redit_table (
      |  thing_key       TEXT PRIMARY KEY,
      |  thing_type      TEXT NOT NULL,
      |  id              TEXT,
      |  created_at      TIMESTAMPTZ,
      |  score           INTEGER,
      |  num_comments    INTEGER,
      |  title_sanitized TEXT,
      |  author_hash     TEXT,
      |  permalink       TEXT,
      |  subreddit       TEXT,
      |  flair_text      TEXT,
      |  ingested_at     TIMESTAMPTZ NOT NULL DEFAULT NOW()
      |)""".stripMargin,
    "CREATE INDEX IF NOT EXISTS redit_table_id_idx ON reddit_schema.redit_table (id)",
    "CREATE INDEX IF NOT EXISTS redit_table_subreddit_idx ON reddit_schema.redit_table (subreddit)")

  /** Relational upsert: rows of `stage` merged into `target` on `key`.
    * Matched rows keep target values except `updateColumns` (taken from
    * stage); unmatched stage rows are inserted whole. Exactly the
    * conflict semantics of Combine_send_to_postgresql.py:239-249 —
    * including NOT touching created_at/author_hash/permalink on update.
    *
    * `stage` must be key-unique (the pipeline dedups first, :152-161).
    * Scale: both sides hash-exchange on the key once; with a bucketed
    * target table the exchange disappears entirely.
    */
  def merge(
      target: DataFrame,
      stage: DataFrame,
      key: String = "thing_key",
      updateColumns: Seq[String] = Model.DefaultUpdateColumns): DataFrame = {
    val dataCols = target.columns.filter(_ != key).toSeq
    val t = target.as("t")
    val s = stage.as("s")
    val joined = t.join(s, t(key) === s(key), "full_outer")
    val matched = t(key).isNotNull && s(key).isNotNull
    joined.select(
      coalesce(s(key), t(key)).as(key) +:
        dataCols.map { c =>
          val su = updateColumns.contains(c)
          when(matched, if (su) s(c) else t(c))
            .otherwise(coalesce(s(c), t(c)))
            .as(c)
        }: _*)
  }

  /** Executor-parallel JDBC upsert. Driver must be on the classpath;
    * `props` carries user/password. Idempotent: re-running the same
    * batch converges to the same table state.
    */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      props: java.util.Properties = new java.util.Properties(),
      keyColumn: String = "thing_key",
      updateColumns: Seq[String] = Model.DefaultUpdateColumns,
      numPartitions: Int = 8,
      batchSize: Int = 1000,
      ensureDdl: Seq[String] = Seq.empty,
      dialect: Dialect = Postgres): Unit = {
    val columns = df.columns.toSeq
    val sql = upsertStatement(table, columns, keyColumn, updateColumns)
    val updSql = updateStatement(table, keyColumn, updateColumns)
    val insSql = insertStatement(table, columns)
    val updIdx = updateColumns.map(columns.indexOf)
    val keyIdx = columns.indexOf(keyColumn)
    val propMap = {
      val m = scala.collection.mutable.Map[String, String]()
      props.stringPropertyNames().forEach(k => m += k -> props.getProperty(k))
      m.toMap
    }

    if (ensureDdl.nonEmpty) {
      val conn = connect(url, propMap)
      try { ensureDdl.foreach(d => conn.createStatement().execute(d)) }
      finally conn.close()
    }

    df.repartition(numPartitions, col(keyColumn))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val conn = connect(url, propMap)
          try {
            conn.setAutoCommit(false)
            dialect match {
              case Postgres =>
                val st = conn.prepareStatement(sql)
                var n = 0
                rows.foreach { r =>
                  columns.indices.foreach(i => st.setObject(i + 1, r.get(i)))
                  st.addBatch()
                  n += 1
                  if (n % batchSize == 0) st.executeBatch()
                }
                st.executeBatch()
              case UpdateElseInsert =>
                val upd = conn.prepareStatement(updSql)
                val ins = conn.prepareStatement(insSql)
                rows.foreach { r =>
                  updIdx.zipWithIndex.foreach { case (ci, p) =>
                    upd.setObject(p + 1, r.get(ci))
                  }
                  upd.setObject(updIdx.size + 1, r.get(keyIdx))
                  if (upd.executeUpdate() == 0) {
                    columns.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
                    ins.executeUpdate()
                  }
                }
            }
            conn.commit()
          } catch {
            case e: Throwable => rollbackQuietly(conn, e); throw e
          } finally conn.close()
        }
      }
  }

  /** The set-based merge statement(s) [[writeJdbcStaged]] executes in
    * ONE transaction. [[Postgres]]: the reference's `ON CONFLICT` upsert
    * as a single `INSERT … SELECT` over the stage table.
    * [[UpdateElseInsert]]: the portable pair — correlated UPDATE of the
    * update columns for matched keys, then INSERT … WHERE NOT EXISTS
    * for new keys — both inside the same transaction.
    *
    * Every stage read is `DISTINCT`: the parallel stage load is plain
    * constraint-free INSERTs, so a Spark task retry (or speculative
    * duplicate) after its per-partition commit leaves the partition's
    * rows in the stage TWICE. Without the dedup, `ON CONFLICT` errors
    * with "cannot affect row a second time", the correlated scalar
    * subquery errors on two rows, and the NOT EXISTS arm silently
    * double-inserts — DISTINCT restores [[writeJdbc]]'s documented
    * retry idempotence (retry duplicates are exact row copies; the
    * stage is key-unique upstream of that by the pipeline's dedup).
    */
  def mergeFromStageStatements(
      target: String,
      stage: String,
      columns: Seq[String],
      keyColumn: String = "thing_key",
      updateColumns: Seq[String] = Model.DefaultUpdateColumns,
      dialect: Dialect = Postgres): Seq[String] = {
    val cols = columns.map(qIdent).mkString(", ")
    val k = qIdent(keyColumn)
    dialect match {
      case Postgres =>
        val sets = updateColumns
          .map(c => s"${qIdent(c)} = EXCLUDED.${qIdent(c)}")
          .mkString(", ")
        Seq(s"INSERT INTO $target ($cols) SELECT DISTINCT $cols FROM $stage " +
          s"ON CONFLICT ($k) DO UPDATE SET $sets")
      case UpdateElseInsert =>
        val sets = updateColumns.map { c =>
          s"${qIdent(c)} = (SELECT DISTINCT s.${qIdent(c)} FROM $stage s " +
            s"WHERE s.$k = $target.$k)"
        }.mkString(", ")
        Seq(
          s"UPDATE $target SET $sets " +
            s"WHERE EXISTS (SELECT 1 FROM $stage s WHERE s.$k = $target.$k)",
          s"INSERT INTO $target ($cols) " +
            s"SELECT DISTINCT ${columns.map(c => s"s.${qIdent(c)}").mkString(", ")} " +
            s"FROM $stage s " +
            s"WHERE NOT EXISTS (SELECT 1 FROM $target t WHERE t.$k = s.$k)")
    }
  }

  /** Single-transaction stage-and-merge delivery — the faithful
    * atomicity variant of the reference loader, which runs the whole
    * batch on one cursor and commits ONCE
    * (Combine_send_to_postgresql.py:251-264), so readers never observe
    * a partially-applied batch. [[writeJdbc]]'s per-partition
    * transactions trade that for executor parallelism on the target
    * table itself; here the parallel phase only loads a private scratch
    * STAGE table (partial stage visibility is harmless — nothing reads
    * it), and the target is touched exclusively by the set-based merge
    * statement(s) of [[mergeFromStageStatements]] on a single
    * connection with a single commit. Any mid-merge failure rolls the
    * target back to its exact prior state — including rows the UPDATE
    * arm had already modified inside the doomed transaction
    * (JdbcUpsertSpec proves this on Derby).
    *
    * Scale shape: the stage load is the same key-partitioned
    * executor-parallel path as [[writeJdbc]]; the merge is one
    * server-side set operation (no per-row driver round trips), which
    * is how warehouse upserts are shipped at any scale. Still
    * idempotent under retry: re-running the same batch converges.
    *
    * SINGLE-WRITER per target table, like the parquet sinks and the
    * reference's one loader task (max_active_runs=1): the scratch stage
    * name derives from the target (created unqualified in the
    * connection's default schema), so two concurrent loaders for the
    * same target — or a loader racing its own retry — would DROP/CREATE
    * each other's stage mid-load. Concurrent loads of DIFFERENT targets
    * are fine (disjoint stage names); a deployment that genuinely needs
    * concurrent same-target loaders must pass a distinct per-run
    * `stageTable`.
    */
  def writeJdbcStaged(
      df: DataFrame,
      url: String,
      table: String,
      props: java.util.Properties = new java.util.Properties(),
      keyColumn: String = "thing_key",
      updateColumns: Seq[String] = Model.DefaultUpdateColumns,
      numPartitions: Int = 8,
      batchSize: Int = 1000,
      ensureDdl: Seq[String] = Seq.empty,
      dialect: Dialect = Postgres,
      stageTable: Option[String] = None): Unit = {
    val columns = df.columns.toSeq
    val stage = stageTable.getOrElse(table.replace('.', '_') + "_stage")
    val cols = columns.map(qIdent).mkString(", ")
    val insSql = insertStatement(stage, columns)
    val mergeSqls =
      mergeFromStageStatements(table, stage, columns, keyColumn, updateColumns, dialect)
    val propMap = {
      val m = scala.collection.mutable.Map[String, String]()
      props.stringPropertyNames().forEach(k => m += k -> props.getProperty(k))
      m.toMap
    }
    def missingTable(e: java.sql.SQLException): Boolean =
      Set("42P01", "42Y55", "42S02").contains(e.getSQLState) ||
        // drivers that report no SQLState (or a generic one) still name
        // the condition in the message — but require TABLE context near
        // the phrase (either order: "table X does not exist" and
        // "not found: table X" are both real dialects), or a mere
        // "schema X does not exist" from a misconfigured connection
        // would be silently swallowed here
        (e.getMessage != null && e.getMessage.toLowerCase.matches(
          "(?s).*(no such table|(table|relation)[^\\n]{0,120}" +
            "(does not exist|doesn't exist|not found)|" +
            "(does not exist|doesn't exist|not found)[^\\n]{0,40}" +
            "(table|relation)).*"))
    def dropStage(conn: Connection): Unit =
      try conn.createStatement().execute(s"DROP TABLE $stage")
      catch {
        // ONLY "table does not exist" is fine (Postgres 42P01, Derby
        // 42Y55, SQL-standard-ish 42S02, message fallback); a
        // permissions or lock failure must surface HERE, not later as
        // a confusing CREATE error
        case e: java.sql.SQLException if missingTable(e) => ()
      }

    val setup = connect(url, propMap)
    try {
      ensureDdl.foreach(d => setup.createStatement().execute(d))
      dropStage(setup)
      // column types cloned from the target; constraints are NOT copied
      // (stage is scratch — the target's constraints fire at merge time)
      setup.createStatement().execute(
        s"CREATE TABLE $stage AS SELECT $cols FROM $table WITH NO DATA")
    } finally setup.close()

    // parallel phase: plain batched INSERTs into the scratch stage
    df.repartition(numPartitions, col(keyColumn))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val conn = connect(url, propMap)
          try {
            conn.setAutoCommit(false)
            val st = conn.prepareStatement(insSql)
            var n = 0
            rows.foreach { r =>
              columns.indices.foreach(i => st.setObject(i + 1, r.get(i)))
              st.addBatch()
              n += 1
              if (n % batchSize == 0) st.executeBatch()
            }
            st.executeBatch()
            conn.commit()
          } catch {
            case e: Throwable => rollbackQuietly(conn, e); throw e
          } finally conn.close()
        }
      }

    // serial phase: the whole batch reaches the target in ONE commit
    val conn = connect(url, propMap)
    try {
      conn.setAutoCommit(false)
      try {
        mergeSqls.foreach(m => conn.createStatement().executeUpdate(m))
        conn.commit()
      } catch {
        case e: Throwable => rollbackQuietly(conn, e); throw e
      }
      conn.setAutoCommit(true) // scratch cleanup, outside the merge txn
      // best-effort: the batch is already committed, so a transient
      // lock/permission failure dropping scratch must not fail the job
      // (the next run's setup dropStage clears leftovers — and THERE a
      // real failure still surfaces)
      try dropStage(conn)
      catch {
        case e: java.sql.SQLException =>
          System.err.println(s"[writeJdbcStaged] post-commit stage cleanup failed: $e")
      }
    } finally conn.close()
  }

  private def connect(url: String, props: Map[String, String]): Connection = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(url, p)
  }

  /** Deterministic key bucket for the partitioned table layout. */
  def keyBucket(key: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column =
    pmod(hash(key), lit(numBuckets))

  /** Read a keyed table written by [[upsertParquetPartitioned]] (or the
    * legacy flat layout): the bucket column is an internal layout
    * detail, not data, so it never reaches readers.
    */
  def readKeyedTable(
      spark: SparkSession, tableDir: String, bucketCol: String = "kb"): DataFrame = {
    val df = spark.read.parquet(tableDir)
    if (df.columns.contains(bucketCol)) df.drop(bucketCol) else df
  }

  /** The bucket-count pin of a partitioned keyed table. The count is a
    * LAYOUT property, not a per-call choice: rebucketing with a
    * different count would strand existing rows in partitions no batch
    * ever reads again (silent duplicate keys), so the table records it
    * at creation and every later batch uses the recorded value —
    * callers' `numBuckets` only applies when the table is born.
    * Underscore-prefixed files are invisible to Spark's parquet reader.
    */
  private def bucketsFile(dir: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(dir, "_graft_buckets")

  /** Roll back without masking the real failure: on a dead connection
    * rollback() itself throws, and an unguarded call would replace the
    * original exception (and the PG driver's batch diagnostics) with a
    * useless "connection closed". The rollback failure is attached as
    * a suppressed exception instead.
    */
  private def rollbackQuietly(conn: java.sql.Connection, cause: Throwable): Unit =
    try conn.rollback()
    catch { case r: Throwable => cause.addSuppressed(r) }

  private def readBuckets(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Int] = {
    // primary, else the rename-aside backup writeBuckets' non-atomic
    // fallback parks the old pin in: a crash between "park aside" and
    // "install new" must not make the table look pinless
    val f0 = bucketsFile(dir)
    val f = if (fs.exists(f0)) f0
      else new org.apache.hadoop.fs.Path(dir, "._graft_buckets.bak")
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  private def writeBuckets(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, n: Int): Unit = {
    // temp + rename: a crash mid-write must not leave a zero-byte pin
    // — readBuckets would throw on it forever, bricking the table (the
    // one non-self-healing window an in-place create would open)
    val tmp = new org.apache.hadoop.fs.Path(
      dir, s"._graft_buckets.tmp")
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8"))
    finally out.close()
    val dest = bucketsFile(dir)
    // overwrite-capable rename (FileContext), NOT delete-then-rename:
    // a crash between those two steps would leave the table pinless,
    // and although the pinless adopt path verifies by rehashing (loud,
    // see upsertParquetPartitioned), recovery would then depend on the
    // caller re-passing the original count — the pin must simply never
    // vanish once written.
    try
      org.apache.hadoop.fs.FileContext.getFileContext(dest.toUri, fs.getConf)
        .rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem binding for this scheme (e.g. s3a
        // without fs.AbstractFileSystem.s3a.impl): park the old pin
        // aside, install the new one, then drop the backup — SOME pin
        // file exists at every crash point (readBuckets consults the
        // backup when the primary is missing), unlike a plain
        // delete+rename whose mid-crash window leaves the table
        // pinless until the loud rehash-adopt path recovers it.
        val bak = new org.apache.hadoop.fs.Path(dir, "._graft_buckets.bak")
        if (fs.exists(dest)) {
          // primary present: any .bak is an older generation
          fs.delete(bak, false)
          if (!fs.rename(dest, bak))
            throw new IllegalStateException(s"rename $dest -> $bak failed")
        }
        // primary absent + .bak present (prior crash between park and
        // install): the .bak is the SOLE pin — keep it until the new
        // primary is live, else a crash in this window leaves the
        // table pinless, the exact state the backup scheme prevents
        if (!fs.rename(tmp, dest))
          throw new IllegalStateException(s"rename $tmp -> $dest failed")
        fs.delete(bak, false)
    }
  }

  /** Partition-pruned parquet upsert — the engine-managed-table path
    * that survives 100 TB. The table is hive-partitioned by a
    * deterministic hash bucket of the key (`kb=<0..numBuckets-1>`,
    * count pinned in `_graft_buckets` at creation); a batch
    * (1) computes the staged buckets, (2) reads ONLY those partitions
    * (partition pruning — the scan never touches the rest of the
    * table), (3) merges, and (4) swaps only the touched partition
    * directories. Untouched partitions' files are never rewritten —
    * byte-identical across upserts (UpsertPartitionedSpec asserts
    * this) — so per-batch cost is O(touched partitions) ≈ O(stage
    * size), not O(table size) like the legacy [[upsertParquet]] full
    * rewrite. A pre-existing table in the legacy FLAT layout (no `kb`
    * partitions) is migrated in place: one O(table) merge-and-rewrite
    * into the bucketed layout, then every later batch is pruned.
    *
    * Crash-consistency matches the sink's at-least-once contract: the
    * new files for ALL touched partitions are fully staged before the
    * first (metadata-only) directory rename, and a replaced partition
    * is parked in a `.retired` sibling (NOT inside the stage dir)
    * until its replacement is installed. A crash anywhere mid-swap
    * leaves every bucket's data in exactly one of live/retired; the
    * next run restores any retired-but-never-replaced bucket before
    * touching anything, then the idempotent merge converges — no
    * window in which a bucket's only copy sits in a directory the
    * retry deletes. Single-writer, like the reference's one loader
    * task (max_active_runs=1).
    */
  /** The crash-recovery preamble of [[upsertParquetPartitioned]],
    * callable on its own: heal a table whose previous swap crashed
    * mid-flight BEFORE anything reads it. The upsert runs this itself,
    * but a maintenance loop that READS the table to compute its next
    * write (e.g. the cluster-labels fold reading current labels to
    * derive a delta) must also run it first — otherwise a replay after
    * a mid-swap crash computes from a table missing a retired bucket
    * (or missing entirely, parked in `.old`) and writes a delta that
    * permanently diverges from the recomputed truth even though the
    * upsert itself would have healed the files.
    */
  def recoverParquetPartitioned(spark: SparkSession, tableDir: String): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val dir = new Path(tableDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    val retiredDir = new Path(dir.getParent, s".${dir.getName}.retired")
    val oldDir = new Path(dir.getParent, s".${dir.getName}.old")

    // recover from a crash between the migration's rename(dir -> .old)
    // and rename(stage -> dir) (or [[upsertParquet]]'s identical swap on
    // this table): the table's ONLY copy sits in .old with dir missing —
    // restore it BEFORE deleting the stage scratch, or this retry would
    // rebuild the table from the stage batch alone and silently strand
    // every pre-existing row. A stale .old NEXT TO a live dir is the
    // opposite (a swap that crashed after install, before cleanup) and
    // is safe to clear.
    if (!fs.exists(dir) && fs.exists(oldDir)) {
      if (!fs.rename(oldDir, dir))
        throw new IllegalStateException(
          s"recovery rename $oldDir -> $dir failed")
    } else if (fs.exists(oldDir)) {
      fs.delete(oldDir, true)
    }

    // recover from a crash between "retire live bucket" and "install
    // replacement": restore any bucket whose live dir is missing, THEN
    // clear scratch state
    if (fs.exists(retiredDir)) {
      fs.listStatus(retiredDir).foreach { st =>
        val live = new Path(dir, st.getPath.getName)
        if (!fs.exists(live) && !fs.rename(st.getPath, live))
          throw new IllegalStateException(
            s"recovery rename ${st.getPath} -> $live failed")
      }
      fs.delete(retiredDir, true)
    }
  }

  def upsertParquetPartitioned(
      spark: SparkSession,
      stage0: DataFrame,
      tableDir: String,
      key: String = "thing_key",
      updateColumns: Seq[String] = Model.DefaultUpdateColumns,
      numBuckets: Int = 64): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    // ONE evaluation of the caller's stage: the touched-bucket collect
    // and the merged write below both consume it, and a
    // non-deterministic lineage evaluated twice could stage rows into
    // a bucket absent from `touched` — whose files the tmp cleanup
    // would then silently discard
    val stage = stage0.localCheckpoint()
    val dir = new Path(tableDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, s".${dir.getName}.stage")
    val retiredDir = new Path(dir.getParent, s".${dir.getName}.retired")
    val oldDir = new Path(dir.getParent, s".${dir.getName}.old")

    recoverParquetPartitioned(spark, tableDir)
    fs.delete(tmp, true)

    if (!fs.exists(dir)) {
      // staged create: the bucket-count pin is written INTO the staged
      // directory before the (atomic) install, so a bucketed table can
      // never exist without its pin — no crash window between table
      // birth and pin write
      stage.withColumn("kb", keyBucket(col(key), numBuckets))
        .write.partitionBy("kb").parquet(tmp.toString)
      writeBuckets(fs, tmp, numBuckets)
      if (!fs.rename(tmp, dir))
        throw new IllegalStateException(s"rename $tmp -> $dir failed")
      return
    }

    val existing = spark.read.parquet(tableDir)
    if (!existing.columns.contains("kb")) {
      // legacy flat layout: one-time O(table) migration to buckets.
      // The pin travels inside the staged directory (see create path);
      // the crash window between the two renames is covered by the
      // .old restore in the recovery preamble above.
      val migrated = merge(existing, stage, key, updateColumns)
        .withColumn("kb", keyBucket(col(key), numBuckets))
      migrated.write.partitionBy("kb").parquet(tmp.toString)
      writeBuckets(fs, tmp, numBuckets)
      if (!fs.rename(dir, oldDir))
        throw new IllegalStateException(s"rename $dir -> $oldDir failed")
      if (!fs.rename(tmp, dir))
        throw new IllegalStateException(s"rename $tmp -> $dir failed")
      fs.delete(oldDir, true)
      return
    }

    // the table's pinned bucket count wins over the parameter. Every
    // table THIS sink creates is born with its pin (both install paths
    // write it into the staged directory pre-swap), so a missing pin
    // means a bucketed layout of foreign provenance: adopting the
    // caller's parameter is only safe if the existing layout actually
    // hashes under it, which observed partition IDS alone cannot prove
    // (a 4-bucket table adopted as 64 shows no id >= 64, yet staged
    // keys would hash past their existing rows and silently duplicate).
    // So VERIFY by rehashing: one key-column scan asserting every
    // stored row sits in keyBucket(key, numBuckets). O(table), but only
    // on the rare pinless path — the same order as the migration that
    // produced such a table.
    val nb = readBuckets(fs, dir).getOrElse {
      val mismatched = existing
        .filter(keyBucket(col(key), numBuckets) =!= col("kb"))
        .limit(1).count()
      if (mismatched > 0)
        throw new IllegalStateException(
          s"$dir has no _graft_buckets pin and its rows do NOT hash to " +
            s"their partitions under numBuckets=$numBuckets; refusing to " +
            "adopt — rebucketing would silently duplicate keys. Restore " +
            "the pin or migrate the table explicitly.")
      writeBuckets(fs, dir, numBuckets)
      numBuckets
    }
    val withBucket = stage.withColumn("kb", keyBucket(col(key), nb))
    // staged bucket ids: bounded by nb, a tiny driver-side list
    val touched = withBucket.select(col("kb")).distinct()
      .collect().map(_.getInt(0)).sorted
    // partition-pruned target read: only touched buckets are scanned
    val target = existing
      .filter(col("kb").isin(touched.map(Int.box): _*))
      .drop("kb")
    val merged = merge(target, stage, key, updateColumns)
      .withColumn("kb", keyBucket(col(key), nb))
    merged.write.partitionBy("kb").parquet(tmp.toString)
    // swap ONLY touched partition dirs (metadata renames; data files
    // for the whole batch were fully written above)
    fs.mkdirs(retiredDir)
    touched.foreach { p =>
      val live = new Path(dir, s"kb=$p")
      val next = new Path(tmp, s"kb=$p")
      if (fs.exists(live) && !fs.rename(live, new Path(retiredDir, s"kb=$p")))
        throw new IllegalStateException(s"rename $live -> $retiredDir failed")
      if (fs.exists(next) && !fs.rename(next, live))
        throw new IllegalStateException(s"rename $next -> $live failed")
    }
    fs.delete(retiredDir, true)
    fs.delete(tmp, true)
  }

  /** Parquet-table upsert used by tests and small serving tables: read
    * current table, [[merge]], atomically swap the table directory.
    * Single-writer — matches the reference's one loader task
    * (max_active_runs=1). This is a FULL-TABLE rewrite per batch —
    * fine at the reference's scale (one Postgres table), wrong at
    * 100 TB; [[upsertParquetPartitioned]] is the scale path and what
    * the streaming pipeline drives.
    */
  def upsertParquet(
      spark: SparkSession,
      stage: DataFrame,
      tableDir: String,
      key: String = "thing_key",
      updateColumns: Seq[String] = Model.DefaultUpdateColumns): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val dir = new Path(tableDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir.getParent, s".${dir.getName}.old")
    // crash between the two swap renames left the table's only copy in
    // .old: restore it first, or this retry would merge against nothing
    // and strand every pre-existing row (same recovery as the
    // partitioned path's preamble)
    if (!fs.exists(dir) && fs.exists(old) && !fs.rename(old, dir))
      throw new IllegalStateException(s"recovery rename $old -> $dir failed")
    val merged =
      if (fs.exists(dir)) merge(spark.read.parquet(tableDir), stage, key, updateColumns)
      else stage
    val tmp = new Path(dir.getParent, s".${dir.getName}.new")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(dir) && !fs.rename(dir, old))
      throw new IllegalStateException(s"rename $dir -> $old failed")
    if (!fs.rename(tmp, dir))
      throw new IllegalStateException(s"rename $tmp -> $dir failed")
    fs.delete(old, true)
  }
}
