package graft

import java.sql.DriverManager

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.core.Model
import graft.sinks.Upsert

/** Real-Postgres end-to-end gate for the upsert sink over ACTUAL JDBC.
  * This image ships Postgres server binaries but no Postgres JDBC
  * driver (offline resolver), so `JdbcUpsertSpec` (embedded Derby)
  * drives every JVM layer, and `PostgresDialectSpec` executes the
  * shipped DDL + `ON CONFLICT` merge statements verbatim on a
  * self-provisioned real Postgres via psql; the one remaining gap —
  * the pgjdbc wire path — closes the moment an environment can: point
  * `GRAFT_PG_URL` at a scratch database (e.g.
  * `jdbc:postgresql://host/db?user=u&password=p`, driver jar on the
  * classpath) and both the executor-parallel `ON CONFLICT` path and
  * the staged single-transaction merge run end-to-end, including the
  * reference DDL (`Upsert.EnsureTableDdl` — TIMESTAMPTZ/TEXT are
  * Postgres types) and mid-merge-failure atomicity. Without the env
  * var every test CANCELS (visible as canceled, not silently green).
  */
class PostgresGateSpec extends SparkSpec {

  private val urlOpt = sys.env.get("GRAFT_PG_URL")

  private val schema = StructType(Model.DbColumns.map {
    case c @ ("score" | "num_comments") => StructField(c, IntegerType)
    case "created_at" => StructField("created_at", TimestampType)
    case c => StructField(c, StringType)
  })

  private def row(key: String, score: Int, title: String,
      author: String = "a0"): Row =
    Row(key, "t3", key.stripPrefix("t3_"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      score, score * 2, title, author, s"/r/x/$key", "ItalyTravel", "f0")

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)

  private val table = "reddit_schema.redit_table"

  private def withFreshTarget[T](url: String)(f: => T): T = {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(s"DROP TABLE IF EXISTS $table")
    finally conn.close()
    f
  }

  private def readRows(url: String): Map[String, (Int, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"""SELECT "thing_key", "score", "author_hash" FROM $table""")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => r.getString(1) -> (r.getInt(2), r.getString(3))).toMap
    } finally conn.close()
  }

  test("postgres: ON CONFLICT upsert inserts, updates update-columns, preserves the rest") {
    assume(urlOpt.nonEmpty, "GRAFT_PG_URL not set — no Postgres in this environment")
    val url = urlOpt.get
    withFreshTarget(url) {
      Upsert.writeJdbc(df(row("t3_a", 1, "ta", author = "origA")), url, table,
        numPartitions = 2, ensureDdl = Upsert.EnsureTableDdl)
      Upsert.writeJdbc(df(row("t3_a", 9, "new", author = "newA"), row("t3_b", 2, "tb")),
        url, table, numPartitions = 2)
      val got = readRows(url)
      assert(got.keySet == Set("t3_a", "t3_b"))
      assert(got("t3_a") == ((9, "origA"))) // score updated, author preserved
    }
  }

  test("postgres: staged single-transaction merge is atomic under mid-merge failure") {
    assume(urlOpt.nonEmpty, "GRAFT_PG_URL not set — no Postgres in this environment")
    val url = urlOpt.get
    withFreshTarget(url) {
      Upsert.writeJdbcStaged(df(row("t3_a", 1, "ta")), url, table,
        numPartitions = 1, ensureDdl = Upsert.EnsureTableDdl)
      val before = readRows(url)
      // duplicate new key: ON CONFLICT DO UPDATE "cannot affect row a
      // second time" — the single merge statement fails, everything
      // rolls back, the target is untouched
      intercept[java.sql.SQLException] {
        Upsert.writeJdbcStaged(
          df(row("t3_a", 9, "new"), row("t3_x", 5, "x1"), row("t3_x", 6, "x2")),
          url, table, numPartitions = 1)
      }
      assert(readRows(url) == before)
      Upsert.writeJdbcStaged(df(row("t3_a", 9, "new"), row("t3_x", 5, "x1")),
        url, table, numPartitions = 1)
      assert(readRows(url)("t3_a")._1 == 9)
    }
  }
}
