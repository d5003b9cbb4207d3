package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model
import graft.sinks.Upsert

/** The sink's PRODUCTION dialect executed against a REAL Postgres.
  * This image ships Postgres server binaries but no Postgres JDBC
  * driver (offline resolver), so the JVM wire path stays covered by
  * Derby (`JdbcUpsertSpec`); what THIS suite closes is the dialect
  * itself: every SQL string the sink ships — the reference DDL
  * (TIMESTAMPTZ/TEXT/PK), the stage-clone
  * `CREATE TABLE … WITH NO DATA`, and the single-statement
  * `INSERT … SELECT … ON CONFLICT DO UPDATE` merge — runs verbatim on
  * a scratch server provisioned by the suite (initdb + pg_ctl as the
  * `postgres` user, unix socket only), with the semantics the sink
  * promises: insert, update-columns-only on conflict, idempotent
  * replay, single-statement atomicity. Cancels (visibly) where the
  * binaries or the postgres user are missing.
  *
  * The one layer no suite in this image can drive is the pgjdbc WIRE
  * path (`Upsert.writeJdbc`/`writeJdbcStaged` against a postgres:
  * URL). An env-gated suite for it (`PostgresGateSpec`, rounds 5–11)
  * cancelled every round — a perpetually-skipped test is noise in the
  * "all green" claim, so it was folded into this doc (round 12). To
  * close the gap in an environment that can: put the pgjdbc jar on
  * the classpath, point `GRAFT_PG_URL` at a scratch database
  * (`jdbc:postgresql://host/db?user=u&password=p`), and drive
  * `Upsert.writeJdbc` (executor-parallel ON CONFLICT) and
  * `Upsert.writeJdbcStaged` (single-transaction merge; a duplicate
  * new key must roll the whole statement back) — exactly the
  * scenarios tests 1–4 below run via psql.
  */
class PostgresDialectSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val table = "reddit_schema.redit_table"
  private val stage = "reddit_schema_redit_table_stage"

  private var root: java.nio.file.Path = _
  private var sock: String = _
  private var up = false

  private def haveBinaries: Boolean =
    Seq("initdb", "pg_ctl", "psql", "runuser").forall(b =>
      Seq("sh", "-c", s"command -v $b").!(ProcessLogger(_ => ())) == 0) &&
      Seq("sh", "-c", "id -u postgres").!(ProcessLogger(_ => ())) == 0

  private def asPg(cmd: String): Int =
    Process(Seq("runuser", "-u", "postgres", "--", "sh", "-c", cmd),
      cwd = root.toFile).!(ProcessLogger(_ => (), _ => ()))

  override def beforeAll(): Unit = {
    if (haveBinaries) {
      root = Files.createTempDirectory("graft-pg")
      sock = root.resolve("sock").toString
      Files.createDirectories(Paths.get(sock))
      Seq("chown", "-R", "postgres", root.toString).!
      require(asPg(s"initdb -D ${root.resolve("data")} -U graft") == 0, "initdb")
      require(asPg(s"pg_ctl -D ${root.resolve("data")} -l ${root.resolve("log")} " +
        s"""-o "-k $sock -h ''" start""") == 0, "pg_ctl start")
      up = true
    }
  }

  override def afterAll(): Unit = {
    if (up) asPg(s"pg_ctl -D ${root.resolve("data")} stop -m immediate")
    if (root != null)
      Seq("rm", "-rf", root.toString).!
  }

  /** Run `sql` via psql; returns (exitCode, stdout lines). */
  private def psql(sql: String): (Int, Seq[String]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Process(Seq("psql", "-h", sock, "-U", "graft", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1", "-At", "-c", sql), cwd = root.toFile)
      .!(ProcessLogger(out += _, _ => ()))
    (code, out.toSeq)
  }

  private def exec(sql: String): Seq[String] = {
    val (code, out) = psql(sql)
    assert(code == 0, s"psql failed:\n$sql\n${out.mkString("\n")}")
    out
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** INSERT one staged row with the sink's column list. */
  private def stageRow(key: String, score: Int, title: String,
      author: String): String = {
    val vals = Model.DbColumns.map {
      case "thing_key" => lit(key)
      case "thing_type" => lit("t3")
      case "id" => lit(key.stripPrefix("t3_"))
      case "created_at" => "TIMESTAMPTZ '2024-01-01 00:00:00+00'"
      case "score" => score.toString
      case "num_comments" => (score * 2).toString
      case "title_sanitized" => lit(title)
      case "author_hash" => lit(author)
      case c => lit(s"$c-$key")
    }
    s"INSERT INTO $stage (${Model.DbColumns.map(Upsert.qIdent).mkString(", ")}) " +
      s"VALUES (${vals.mkString(", ")})"
  }

  private def mergeSql: String = Upsert.mergeFromStageStatements(
    table, stage, Model.DbColumns, dialect = Upsert.Postgres).head

  private def readRows(): Map[String, (Int, String, String)] =
    exec(s"""SELECT "thing_key", "score", "author_hash", "title_sanitized" FROM $table""")
      .map(_.split('|')).map(a => a(0) -> ((a(1).toInt, a(2), a(3)))).toMap

  private def gate(): Unit =
    assume(up, "no Postgres binaries / postgres user in this environment")

  test("the reference DDL runs verbatim on real Postgres, twice (idempotent)") {
    gate()
    Upsert.EnsureTableDdl.foreach(exec)
    Upsert.EnsureTableDdl.foreach(exec) // IF NOT EXISTS everywhere
    assert(exec(s"SELECT count(*) FROM $table") == Seq("0"))
  }

  test("stage clone + ON CONFLICT merge: insert, update-columns-only, idempotent") {
    gate()
    Upsert.EnsureTableDdl.foreach(exec)
    exec(s"TRUNCATE $table")
    // the exact stage-clone statement writeJdbcStaged issues
    exec(s"DROP TABLE IF EXISTS $stage")
    exec(s"CREATE TABLE $stage AS SELECT " +
      s"${Model.DbColumns.map(Upsert.qIdent).mkString(", ")} FROM $table WITH NO DATA")
    exec(stageRow("t3_a", 1, "ta", "origA"))
    exec(mergeSql)
    // second batch: conflict on t3_a must update ONLY the update
    // columns (score, num_comments, title_sanitized, …) and preserve
    // author_hash; t3_b inserts whole
    exec(s"TRUNCATE $stage")
    exec(stageRow("t3_a", 9, "new", "newA"))
    exec(stageRow("t3_b", 2, "tb", "authB"))
    exec(mergeSql)
    val got = readRows()
    assert(got.keySet == Set("t3_a", "t3_b"))
    assert(got("t3_a") == ((9, "origA", "new")),
      s"update must touch only update-columns: ${got("t3_a")}")
    assert(got("t3_b") == ((2, "authB", "tb")))
    // replaying the same batch converges (at-least-once delivery)
    exec(mergeSql)
    assert(readRows() == got)
  }

  test("the single merge statement is atomic: a duplicate staged key rolls back everything") {
    gate()
    Upsert.EnsureTableDdl.foreach(exec)
    exec(s"TRUNCATE $table")
    exec(s"DROP TABLE IF EXISTS $stage")
    exec(s"CREATE TABLE $stage AS SELECT " +
      s"${Model.DbColumns.map(Upsert.qIdent).mkString(", ")} FROM $table WITH NO DATA")
    exec(stageRow("t3_a", 1, "ta", "a0"))
    exec(mergeSql)
    val before = readRows()
    // ON CONFLICT DO UPDATE "cannot affect row a second time": the
    // statement fails as a unit — t3_x's first row must NOT survive
    exec(s"TRUNCATE $stage")
    exec(stageRow("t3_a", 9, "new", "a9"))
    exec(stageRow("t3_x", 5, "x1", "ax"))
    exec(stageRow("t3_x", 6, "x2", "ax"))
    val (code, _) = psql(mergeSql)
    assert(code != 0, "duplicate staged key must fail the merge statement")
    assert(readRows() == before, "failed merge must leave the target untouched")
  }
}
