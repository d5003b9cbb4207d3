package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.GraftConf
import graft.operators.Normalize

/** Row-level fidelity fuzz: `Normalize` vs a direct Scala port of the
  * reference's `_normalize_row`
  * (/root/reference/dags/Combine_send_to_postgresql.py:81-120) run as
  * an in-test oracle over randomized ragged rows — missing columns,
  * empty strings, nulls, junk numerics, mixed header families.
  */
class NormalizeOracleSpec extends SparkSpec {

  private val conf = GraftConf(salt = "fuzz-salt")

  /** The reference function, literally transcribed (dict-in dict-out). */
  private def normalizeRowOracle(row: Map[String, String]): Map[String, String] = {
    def get(k: String): String = row.get(k).filter(_ != null).getOrElse("")
    def orElse(v: String, d: String) = if (v.isEmpty) d else v

    val redditId = orElse(get("post_id"), get("id"))
    val thingType = orElse(get("thing_type"), "t3")
    val pl = orElse(get("permalink"), get("url"))
    val permalinkNorm =
      if (pl.isEmpty) ""
      else pl.trim.toLowerCase.reverse.dropWhile(_ == '/').reverse
    val thingKey = {
      val existing = get("thing_key")
      if (existing.nonEmpty) existing
      else sha256Hex(conf.salt + s"$thingType:${orElse(redditId, permalinkNorm)}")
    }
    def intOr0(s: String): Int =
      try s.trim.toInt catch { case _: Exception => 0 }

    Map(
      "thing_key" -> thingKey,
      "thing_type" -> thingType,
      "id" -> redditId,
      "created_at" -> get("created_at"),
      "score" -> intOr0(orElse(get("score"), "0")).toString,
      "num_comments" -> intOr0(orElse(get("num_comments"), "0")).toString,
      "title_sanitized" -> orElse(get("title_sanitized"), get("title")),
      "author_hash" -> get("author_hash"),
      "permalink" -> permalinkNorm,
      "subreddit" -> orElse(get("subreddit"), conf.subredditDefault),
      "flair_text" -> get("flair_text"))
  }

  test("Normalize == reference _normalize_row on 300 randomized ragged rows") {
    val rnd = new Random(99)
    val allCols = Seq("thing_key", "thing_type", "post_id", "id", "url",
      "permalink", "created_at", "score", "num_comments", "title_sanitized",
      "title", "author_hash", "subreddit", "flair_text")
    def randVal(col: String): String = rnd.nextInt(6) match {
      case 0 => ""
      case 1 => null
      case 2 if col == "score" || col == "num_comments" => rnd.nextInt(1000).toString
      case 2 => s"v${rnd.nextInt(100)}"
      case 3 => "N/A"
      case 4 if col == "permalink" || col == "url" => s"  HTTPS://X.com/${rnd.nextInt(50)}///  "
      case 4 => s"  MiXeD ${rnd.nextInt(50)} "
      case _ => rnd.nextInt(50).toString
    }

    // three header families, like the real landing dir
    val families = Seq(
      allCols.filterNot(Set("post_id", "url", "title")),
      Seq("id", "author_hash", "title", "score", "num_comments", "created_at", "permalink"),
      Seq("post_id", "url", "title", "score", "num_comments", "created_at", "thing_key"))

    families.foreach { cols =>
      val rows = (0 until 100).map(_ => cols.map(c => c -> randVal(c)).toMap)
      val schema = StructType(cols.map(StructField(_, StringType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(cols.map(r): _*))), schema)

      val got = Normalize(df, conf).collect().map { r =>
        r.schema.fieldNames.zipWithIndex.map { case (f, i) =>
          f -> String.valueOf(r.get(i))
        }.toMap
      }
      val want = rows.map(normalizeRowOracle)
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        w.foreach { case (k, v) =>
          assert(g(k) == v, s"family=${cols.mkString(",")} row=$i col=$k: " +
            s"got '${g(k)}' want '$v' (input=${rows(i)})")
        }
      }
    }
  }
}
