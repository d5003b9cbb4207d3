package graft

import java.sql.DriverManager

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.core.Model
import graft.sinks.Upsert

/** End-to-end JDBC delivery for the upsert sink against a REAL database
  * (embedded Derby, the only JDBC engine in this image): DDL-on-load,
  * insert-new, update-only-the-5-update-columns, untouched-columns-
  * preserved, idempotent replay, and transaction rollback on failure —
  * the observable behaviors of the reference loader
  * (/root/reference/dags/Combine_send_to_postgresql.py:228-264).
  *
  * Derby has no `ON CONFLICT`, so this drives the portable
  * [[Upsert.UpdateElseInsert]] dialect; everything above the final
  * statement shape (partitioning, per-partition transactions, parameter
  * binding, DDL bootstrap) is the same code the Postgres dialect runs.
  */
class JdbcUpsertSpec extends SparkSpec {

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  // column identifiers quoted to match qIdent's statement quoting
  // (Derby folds unquoted identifiers to UPPERCASE; Postgres to lower)
  private val ddl = Seq(
    """CREATE TABLE redit_table (
      |  "thing_key"       VARCHAR(128) PRIMARY KEY,
      |  "thing_type"      VARCHAR(16) NOT NULL,
      |  "id"              VARCHAR(64),
      |  "created_at"      TIMESTAMP,
      |  "score"           INTEGER,
      |  "num_comments"    INTEGER,
      |  "title_sanitized" VARCHAR(512),
      |  "author_hash"     VARCHAR(128),
      |  "permalink"       VARCHAR(512),
      |  "subreddit"       VARCHAR(128),
      |  "flair_text"      VARCHAR(128)
      |)""".stripMargin)

  private val schema = StructType(Model.DbColumns.map {
    case c @ ("score" | "num_comments") => StructField(c, IntegerType)
    case "created_at" => StructField("created_at", TimestampType)
    case c => StructField(c, StringType)
  })

  private def row(key: String, score: Int, title: String,
      author: String = "a0", flair: String = "f0"): Row =
    Row(key, "t3", key.stripPrefix("t3_"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      score, score * 2, title, author, s"/r/x/$key", "ItalyTravel", flair)

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)

  private def readAll(url: String): Map[String, (Int, String, String, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT "thing_key", "score", "title_sanitized", "author_hash", "flair_text" FROM redit_table""")
      Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => r.getString(1) -> (r.getInt(2), r.getString(3), r.getString(4), r.getString(5)))
        .toMap
    } finally conn.close()
  }

  private def freshUrl(name: String): String = s"jdbc:derby:memory:$name;create=true"

  test("DDL-on-load + insert-new delivers every staged row over real JDBC") {
    val url = freshUrl("ins")
    Upsert.writeJdbc(df(row("t3_a", 1, "ta"), row("t3_b", 2, "tb"), row("t3_c", 3, "tc")),
      url, "redit_table", numPartitions = 2, ensureDdl = ddl,
      dialect = Upsert.UpdateElseInsert)
    val got = readAll(url)
    assert(got.keySet == Set("t3_a", "t3_b", "t3_c"))
    assert(got("t3_b") == ((2, "tb", "a0", "f0")))
  }

  test("conflict updates only the update columns; others keep their stored values") {
    val url = freshUrl("upd")
    Upsert.writeJdbc(df(row("t3_a", 1, "old", author = "origA"), row("t3_b", 2, "tb")),
      url, "redit_table", numPartitions = 2, ensureDdl = ddl,
      dialect = Upsert.UpdateElseInsert)
    // second batch: t3_a re-arrives with new score/title AND a new
    // author_hash — author_hash is NOT an update column, so the stored
    // value must survive (Combine_send_to_postgresql.py:243-248)
    Upsert.writeJdbc(df(row("t3_a", 9, "new", author = "newA", flair = "f9"),
        row("t3_d", 4, "td")),
      url, "redit_table", numPartitions = 2,
      dialect = Upsert.UpdateElseInsert)
    val got = readAll(url)
    assert(got.keySet == Set("t3_a", "t3_b", "t3_d"))
    assert(got("t3_a") == ((9, "new", "origA", "f9"))) // updated + preserved
    assert(got("t3_b") == ((2, "tb", "a0", "f0")))     // untouched row intact
  }

  test("replaying the same batch is idempotent") {
    val url = freshUrl("idem")
    val batch = df(row("t3_a", 1, "ta"), row("t3_b", 2, "tb"))
    Upsert.writeJdbc(batch, url, "redit_table", numPartitions = 2,
      ensureDdl = ddl, dialect = Upsert.UpdateElseInsert)
    val first = readAll(url)
    Upsert.writeJdbc(batch, url, "redit_table", numPartitions = 2,
      dialect = Upsert.UpdateElseInsert)
    assert(readAll(url) == first)
  }

  test("staged mode inserts, updates only update columns, and is idempotent") {
    val url = freshUrl("stg")
    Upsert.writeJdbcStaged(df(row("t3_a", 1, "old", author = "origA"), row("t3_b", 2, "tb")),
      url, "redit_table", numPartitions = 2, ensureDdl = ddl,
      dialect = Upsert.UpdateElseInsert)
    Upsert.writeJdbcStaged(df(row("t3_a", 9, "new", author = "newA", flair = "f9"),
        row("t3_d", 4, "td")),
      url, "redit_table", numPartitions = 2,
      dialect = Upsert.UpdateElseInsert)
    val got = readAll(url)
    assert(got.keySet == Set("t3_a", "t3_b", "t3_d"))
    assert(got("t3_a") == ((9, "new", "origA", "f9"))) // updated + preserved
    assert(got("t3_b") == ((2, "tb", "a0", "f0")))
    // idempotent replay
    Upsert.writeJdbcStaged(df(row("t3_a", 9, "new", author = "newA", flair = "f9"),
        row("t3_d", 4, "td")),
      url, "redit_table", numPartitions = 2,
      dialect = Upsert.UpdateElseInsert)
    assert(readAll(url) == got)
  }

  test("staged mode: task-retry duplicates in the stage merge exactly-once") {
    // the parallel stage load is plain constraint-free INSERTs, so an
    // executor that commits its partition and dies before reporting
    // leaves the partition's rows in the stage TWICE when Spark reruns
    // the task. Feeding full-row duplicates reproduces that state: the
    // DISTINCT stage reads must merge each key exactly once (the
    // correlated scalar subquery would otherwise error on two rows,
    // and the NOT EXISTS insert arm would silently double-insert)
    val url = freshUrl("stgdup")
    Upsert.writeJdbcStaged(df(row("t3_a", 1, "old")), url, "redit_table",
      numPartitions = 2, ensureDdl = ddl, dialect = Upsert.UpdateElseInsert)
    Upsert.writeJdbcStaged(
      df(row("t3_a", 9, "new"), row("t3_a", 9, "new"),
        row("t3_n", 5, "tn"), row("t3_n", 5, "tn")),
      url, "redit_table", numPartitions = 2,
      dialect = Upsert.UpdateElseInsert)
    val got = readAll(url)
    assert(got.keySet == Set("t3_a", "t3_n"), got)
    assert(got("t3_a")._1 == 9 && got("t3_n")._1 == 5, got)
    // the Postgres dialect's single statement dedups the same way
    val pg = Upsert.mergeFromStageStatements(
      "redit_table", "redit_table_stage", Model.DbColumns)
    assert(pg.head.contains("SELECT DISTINCT"), pg.head)
  }

  test("staged mode: a mid-merge failure leaves the target untouched") {
    val url = freshUrl("stgrb")
    Upsert.writeJdbcStaged(df(row("t3_a", 1, "ta")), url, "redit_table",
      numPartitions = 1, ensureDdl = ddl, dialect = Upsert.UpdateElseInsert)
    val before = readAll(url)
    // The batch carries a valid UPDATE for t3_a (score 1 → 9) plus a
    // duplicated new key: the stage table has no constraints, so the
    // stage load succeeds, the merge's UPDATE arm applies, and then the
    // INSERT arm violates the target's PRIMARY KEY — failing the merge
    // AFTER the target was already modified inside the transaction.
    // Single-commit contract: the applied UPDATE must roll back too,
    // leaving the target byte-identical (the reference's one-cursor,
    // one-commit behavior; writeJdbc's per-partition transactions
    // cannot make this guarantee across partitions).
    intercept[java.sql.SQLException] {
      Upsert.writeJdbcStaged(
        df(row("t3_a", 9, "new"), row("t3_x", 5, "x1"), row("t3_x", 6, "x2")),
        url, "redit_table", numPartitions = 1,
        dialect = Upsert.UpdateElseInsert)
    }
    assert(readAll(url) == before, "mid-merge failure must leave the target untouched")
    // and the sink recovers: the next good batch re-creates the stage
    // and lands cleanly
    Upsert.writeJdbcStaged(df(row("t3_a", 9, "new"), row("t3_x", 5, "x1")),
      url, "redit_table", numPartitions = 1, dialect = Upsert.UpdateElseInsert)
    assert(readAll(url)("t3_a")._1 == 9)
  }

  test("postgres staged merge renders the reference's single ON CONFLICT statement") {
    val stmts = Upsert.mergeFromStageStatements(
      "reddit_schema.redit_table", "reddit_schema.redit_table_stage",
      Seq("thing_key", "thing_type", "score"),
      keyColumn = "thing_key", updateColumns = Seq("score"),
      dialect = Upsert.Postgres)
    assert(stmts.size == 1, "postgres merge must be ONE statement (one commit)")
    assert(stmts.head ==
      """INSERT INTO reddit_schema.redit_table ("thing_key", "thing_type", "score") """ +
        """SELECT DISTINCT "thing_key", "thing_type", "score" FROM reddit_schema.redit_table_stage """ +
        """ON CONFLICT ("thing_key") DO UPDATE SET "score" = EXCLUDED."score"""")
  }

  test("a failing row rolls back the whole transaction (single-partition batch)") {
    val url = freshUrl("rb")
    Upsert.writeJdbc(df(row("t3_a", 1, "ta")), url, "redit_table",
      numPartitions = 1, ensureDdl = ddl, dialect = Upsert.UpdateElseInsert)
    val before = readAll(url)
    // t3_ok would insert fine; the null thing_type row violates NOT NULL
    val bad = Row("t3_bad", null, "bad",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      0, 0, "t", "a", "/r/x/bad", "s", "f")
    intercept[org.apache.spark.SparkException] {
      Upsert.writeJdbc(df(row("t3_ok", 5, "tok"), bad), url, "redit_table",
        numPartitions = 1, dialect = Upsert.UpdateElseInsert)
    }
    assert(readAll(url) == before, "partial batch must not survive a rollback")
  }
}
