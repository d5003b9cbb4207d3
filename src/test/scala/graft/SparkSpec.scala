package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Shared local SparkSession for all suites (one JVM under sbt fork). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("graft-test", 4)

  /** One-column string DataFrame. */
  def strDf(values: Seq[String], name: String = "v"): DataFrame = {
    import spark.implicits._
    values.toDF(name)
  }

  /** Evaluate a Column over single string inputs. */
  def evalStr(values: Seq[String])(
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] = {
    import org.apache.spark.sql.functions.col
    strDf(values).select(f(col("v"))).collect().toSeq.map(_.get(0))
  }

  /** Reference oracle for salted SHA-256 (`_hash_value` /
    * `_sha256_hex`, /root/reference/dags/Fetch_reddit.py:58-63).
    */
  def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Land `df` as ONE parquet file named `name` in `incoming` — the
    * arrival protocol every stream-ingest suite simulates (a producer
    * dropping one complete file per batch). Shared here so the landing
    * semantics cannot drift between the ingest suites.
    */
  def land(df: DataFrame, incoming: java.nio.file.Path, name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("land")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = java.nio.file.Files.list(tmp)
    val part =
      try listing.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally listing.close()
    java.nio.file.Files.move(part, incoming.resolve(name))
  }

  def withTempDir[T](f: java.nio.file.Path => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test")
    try f(dir)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
