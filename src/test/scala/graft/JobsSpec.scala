package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.core.GraftConf
import graft.jobs.{CombineJob, FetchJob, LoadJob}
import graft.sinks.Upsert

/** Golden end-to-end tests for the three pipeline jobs (FIXTURES.md
  * §1-§5; SURVEY §5.2 item 3): fixture listing JSON → landing CSV,
  * ragged landing CSVs → combined CSV (coalesce + key derivation +
  * first-wins dedup + archive), combined CSV → typed upsert.
  */
class JobsSpec extends SparkSpec {

  private val conf = GraftConf(salt = "test-salt")
  private def h(v: String) = sha256Hex(conf.salt + v)

  private def write(dir: Path, name: String, content: String): Unit =
    Files.write(dir.resolve(name), content.getBytes("UTF-8"))

  private def readCsvText(file: String): Vector[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(java.nio.file.Paths.get(file)).asScala.toVector
  }

  // ------------------------------------------------------------- Fetch

  test("FetchJob: listing JSON → hashed/sanitized landing CSV (golden)") {
    withTempDir { dir =>
      val longTitle = "y" * 400
      val listing =
        s"""{"data": {"children": [
           |  {"kind": "t3", "data": {"name": "t3_aaa", "id": "aaa",
           |   "created_utc": 1694253032.0, "score": 5, "num_comments": 2,
           |   "title": "Contact\\nme at foo@bar.com  or 12345678",
           |   "author": "alice", "permalink": "/r/italytravel/comments/aaa/x/",
           |   "subreddit": "italytravel", "link_flair_text": "Trip Report"}},
           |  {"kind": "t3", "data": {"id": "bbb",
           |   "title": "Venezia è bellissima — $longTitle",
           |   "author": "bob", "score": 1, "num_comments": 0}},
           |  {"kind": "t3", "data": {"name": "t3_ccc", "id": "ccc",
           |   "created_utc": 0.0, "score": 0, "num_comments": 0,
           |   "title": null, "author": null, "permalink": null,
           |   "subreddit": null, "link_flair_text": null}}
           |]}}""".stripMargin
      write(dir, "listing.json", listing)
      val out = dir.resolve("italytravel_1.csv").toString
      FetchJob.run(spark, dir.resolve("listing.json").toString, out, conf)

      val lines = readCsvText(out)
      assert(lines.head ==
        "thing_key,thing_type,id,created_at,score,num_comments,title_sanitized,author_hash,permalink,subreddit,flair_text")
      assert(lines.length == 4)

      // row 1: full row — all hashes per the reference oracle
      val r1 = lines(1)
      assert(r1.startsWith(
        s"${h("t3_aaa")},t3,${h("aaa")},2023-09-09T09:50:32Z,5,2,"))
      assert(r1.contains("Contact me at [redacted-email] or [redacted-number]"))
      assert(r1.contains(h("alice")))
      assert(r1.contains(h("https://www.reddit.com/r/italytravel/comments/aaa/x/")))
      assert(r1.endsWith("italytravel,Trip Report"))

      // row 2: name coalesced to t3_bbb; no created_utc → empty; title
      // truncated to 300; subreddit defaulted; unicode intact
      val r2 = lines(2)
      assert(r2.startsWith(s"${h("t3_bbb")},t3,${h("bbb")},,1,0,"))
      val title2 = r2.split(",", -1)(6)
      assert(title2.length <= 302) // 300 + possible CSV quoting
      assert(title2.contains("Venezia è bellissima"))
      assert(r2.contains("italytravel"))

      // row 3: created_utc 0.0 is falsy → empty created_at; null title →
      // empty; null author/permalink → empty hash
      val r3 = lines(3)
      assert(r3 == s"${h("t3_ccc")},t3,${h("ccc")},,0,0,,,,italytravel,")
    }
  }

  test("FetchJob legacy profile keeps raw absolutized permalink") {
    import spark.implicits._
    val posts = Seq(("t3_a", "a", "/r/x/y/", "t", "u", "s"))
      .toDF("name", "id", "permalink", "title", "author", "subreddit")
      .withColumn("created_utc", lit(1.0))
      .withColumn("score", lit(1L))
      .withColumn("num_comments", lit(0L))
      .withColumn("link_flair_text", lit(null).cast("string"))
    val out = FetchJob.transform(posts, GraftConf.legacy)
      .select("permalink").collect().head.getString(0)
    assert(out == "https://www.reddit.com/r/x/y/")
  }

  // ----------------------------------------------------------- Combine

  test("CombineJob: ragged headers, key derivation, first-wins, archive") {
    withTempDir { root =>
      val data = Files.createDirectory(root.resolve("data"))
      val combined = Files.createDirectory(root.resolve("combined"))
      val loaded = root.resolve("loaded").toString

      // file 1 — current header; includes dup key K1 (first wins) and a
      // non-numeric score
      write(data, "italytravel_a.csv",
        """thing_key,thing_type,id,created_at,score,num_comments,title_sanitized,author_hash,permalink,subreddit,flair_text
          |K1,t3,id1,2025-09-09T12:30:32Z,10,3,First title,AH1,HTTPS://Reddit.com/A/,italytravel,Flair1
          |K2,t3,id2,2025-09-09T12:31:00Z,N/A,1,Second title,AH2,,italytravel,
          |""".stripMargin)
      // file 2 — legacy jq header (id,author,title,...): no thing_key →
      // derived; permalink normalized; subreddit defaulted; K1 dup row
      write(data, "italytravel_b.csv",
        """id,author,title,score,num_comments,created_at,permalink
          |id9,ann,Legacy title,7,0,2025-09-09T13:00:00Z,https://www.reddit.com/r/italytravel/comments/id9///
          |""".stripMargin)
      // file 3 — post_id/url variant + a later duplicate of K1 (loses)
      write(data, "italytravel_c.csv",
        """post_id,url,title,score,num_comments,created_at,thing_key
          |idX,https://EXample.com/Z/,Url title,3,1,2025-09-09T14:00:00Z,
          |ignored,,Dup of K1,99,99,2025-09-09T15:00:00Z,K1
          |""".stripMargin)
      // empty + header-only files: skipped/no-op, still archived
      write(data, "italytravel_d.csv", "")
      write(data, "italytravel_e.csv", "thing_key,score\n")

      val outPath = CombineJob.run(spark, data.toString, combined.toString,
        loaded, conf, Some("italytravel_combined_T.csv")).get

      val lines = readCsvText(outPath)
      assert(lines.head ==
        "thing_key,thing_type,id,created_at,score,num_comments,title_sanitized,author_hash,permalink,subreddit,flair_text")
      val rows = lines.tail.map(_.split(",", -1)).map(r => r(0) -> r).toMap
      assert(rows.size == 4)

      // first-wins: K1 kept file-a's version (score 10, not 99)
      assert(rows("K1")(4) == "10")
      assert(rows("K1")(6) == "First title")
      // permalink normalized (lower, no trailing slash)
      assert(rows("K1")(8) == "https://reddit.com/a")
      // N/A score → 0
      assert(rows("K2")(4) == "0")
      // legacy row: derived key = sha256(salt + "t3:id9")
      val k9 = h("t3:id9")
      assert(rows.contains(k9))
      assert(rows(k9)(6) == "Legacy title")
      assert(rows(k9)(9) == "ItalyTravel") // combine-stage default
      // post_id/url variant: derived from post_id, url normalized
      val kx = h("t3:idX")
      assert(rows(kx)(8) == "https://example.com/z")

      // exactly-once: all five sources archived out of data/
      import scala.jdk.CollectionConverters._
      assert(Files.list(data).iterator().asScala.isEmpty)
      assert(Files.list(java.nio.file.Paths.get(loaded))
        .iterator().asScala.toSeq.map(_.getFileName.toString).sorted ==
        Seq("italytravel_a.csv", "italytravel_b.csv", "italytravel_c.csv",
          "italytravel_d.csv", "italytravel_e.csv"))
    }
  }

  test("CombineJob: no files → None; only junk rows → archive + throw") {
    withTempDir { root =>
      val data = Files.createDirectory(root.resolve("data"))
      val combined = Files.createDirectory(root.resolve("combined"))
      val loaded = root.resolve("loaded").toString
      assert(CombineJob.run(spark, data.toString, combined.toString, loaded,
        conf).isEmpty)

      write(data, "italytravel_junk.csv", "")
      intercept[IllegalStateException] {
        CombineJob.run(spark, data.toString, combined.toString, loaded, conf)
      }
      import scala.jdk.CollectionConverters._
      assert(Files.list(data).iterator().asScala.isEmpty) // archived anyway
    }
  }

  // ------------------------------------------------------ Upsert merge

  test("Upsert.merge: update-columns only; untouched columns preserved") {
    import spark.implicits._
    val target = Seq(
      ("K1", "t3", "id1", "2025-01-01T00:00:00Z", 1, 1, "old title", "AH", "PL", "sub", "f"),
      ("K2", "t3", "id2", "2025-01-02T00:00:00Z", 2, 2, "keep", "AH2", "PL2", "sub", "g"))
      .toDF("thing_key", "thing_type", "id", "created_at", "score",
        "num_comments", "title_sanitized", "author_hash", "permalink",
        "subreddit", "flair_text")
    val stage = Seq(
      // matches K1: changes EVERY column — only the 5 update columns may land
      ("K1", "tX", "idX", "2099-01-01T00:00:00Z", 100, 50, "new title", "AHX", "PLX", "subX", "fX"),
      // new key → inserted whole
      ("K3", "t3", "id3", "2025-03-03T00:00:00Z", 3, 3, "third", "AH3", "PL3", "sub", null))
      .toDF("thing_key", "thing_type", "id", "created_at", "score",
        "num_comments", "title_sanitized", "author_hash", "permalink",
        "subreddit", "flair_text")

    val out = Upsert.merge(target, stage)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 3)
    val k1 = out("K1")
    assert(k1.getInt(4) == 100 && k1.getInt(5) == 50) // score, num_comments updated
    assert(k1.getString(6) == "new title" && k1.getString(9) == "subX"
      && k1.getString(10) == "fX")
    // NOT updated: thing_type, id, created_at, author_hash, permalink
    assert(k1.getString(1) == "t3" && k1.getString(2) == "id1")
    assert(k1.getString(3) == "2025-01-01T00:00:00Z")
    assert(k1.getString(7) == "AH" && k1.getString(8) == "PL")
    assert(out("K2").getString(6) == "keep")
    assert(out("K3").getString(6) == "third")
  }

  test("LoadJob: typed casts + parquet upsert is idempotent") {
    withTempDir { root =>
      val combinedCsv = root.resolve("combined.csv")
      write(root, "combined.csv",
        """thing_key,thing_type,id,created_at,score,num_comments,title_sanitized,author_hash,permalink,subreddit,flair_text
          |K1,t3,id1,2025-09-09T12:30:32Z,10,3,T1,AH1,PL1,sub,
          |K2,t3,id2,,bad,1,T2,AH2,PL2,sub,F2
          |""".stripMargin)
      val table = root.resolve("table").toString
      LoadJob.run(spark, combinedCsv.toString, table, conf)
      LoadJob.run(spark, combinedCsv.toString, table, conf) // idempotent

      val df = spark.read.parquet(table)
      assert(df.count() == 2)
      val byKey = df.collect().map(r => r.getAs[String]("thing_key") -> r).toMap
      assert(byKey("K1").getAs[Int]("score") == 10)
      assert(byKey("K2").getAs[Int]("score") == 0) // bad cast → 0
      assert(byKey("K2").getAs[java.sql.Timestamp]("created_at") == null)
      assert(byKey("K1").getAs[java.sql.Timestamp]("created_at") != null)
      assert(df.schema("ingested_at").dataType.typeName == "timestamp")
    }
  }

  test("PipelineJob: fetch → combine → load end-to-end, replay-idempotent") {
    withTempDir { root =>
      val listing =
        """{"data": {"children": [
          |  {"kind": "t3", "data": {"name": "t3_p1", "id": "p1",
          |   "created_utc": 1694253032.0, "score": 3, "num_comments": 1,
          |   "title": "pipeline title", "author": "ann",
          |   "permalink": "/r/x/p1/", "subreddit": "italytravel"}}
          |]}}""".stripMargin
      write(root, "listing.json", listing)
      val lp = root.resolve("listing.json").toString
      val work = root.resolve("work").toString

      graft.jobs.PipelineJob.run(spark, Seq(lp), work, conf)
      val t1 = spark.read.parquet(s"$work/table")
      assert(t1.count() == 1)
      assert(t1.collect().head.getAs[String]("thing_key") == h("t3_p1"))

      // replay the same listing: landing dir was archived, new fetch
      // re-lands the same post, upsert converges to the same row
      graft.jobs.PipelineJob.run(spark, Seq(lp), work, conf)
      val t2 = spark.read.parquet(s"$work/table")
      assert(t2.count() == 1)
      assert(t2.collect().head.getAs[Int]("score") == 3)
    }
  }

  test("CSV sink round-trips commas, quotes, and unicode (§7.4 risk #5)") {
    withTempDir { dir =>
      import spark.implicits._
      val nasty = Seq(
        ("K1", """Rome, Florence — and "Venice" too"""),
        ("K2", "plain"),
        ("K3", "trailing space "),
        ("K4", "€99 – caffè"))
        .toDF("thing_key", "title_sanitized")
      val out = dir.resolve("nasty.csv").toString
      graft.sinks.AtomicCsv.writeFile(
        graft.sinks.AtomicCsv.projectTo(nasty, Seq("thing_key", "title_sanitized")),
        out)
      val back = spark.read.option("header", "true").csv(out)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(back("K1") == """Rome, Florence — and "Venice" too""")
      assert(back("K2") == "plain")
      assert(back("K3") == "trailing space ")
      assert(back("K4") == "€99 – caffè")
    }
  }

  test("latestByMtime picks the newest matching file (legacy W2)") {
    withTempDir { dir =>
      write(dir, "italytravel_a.csv", "x")
      write(dir, "other.csv", "x")
      Thread.sleep(20)
      write(dir, "italytravel_b.csv", "x")
      val latest = graft.sources.LandingCsv.latestByMtime(spark, dir.toString)
      assert(latest.exists(_.endsWith("italytravel_b.csv")), latest)
      assert(graft.sources.LandingCsv
        .latestByMtime(spark, dir.toString, prefix = "zzz").isEmpty)
    }
  }

  test("file_seq map-lookup scales to a 1e5-file listing (the when-chain could not)") {
    withTempDir { dir =>
      write(dir, "italytravel_000000.csv", "thing_key,score\nK0,1\n")
      write(dir, "italytravel_099999.csv", "thing_key,score\nK9,2\n")
      // map covers the full claimed listing scale; only two files exist.
      // The pre-fix folded when-chain built one nested CASE per entry
      // and would blow the analyzer/codegen stack here.
      val fileSeqOf = (0 until 100000)
        .map(i => f"italytravel_$i%06d.csv" -> i).toMap
      val files = Seq(dir.resolve("italytravel_000000.csv").toString,
        dir.resolve("italytravel_099999.csv").toString)
      val got = graft.sources.LandingCsv.read(spark, files, fileSeqOf)
        .select("thing_key", "file_seq", "row_seq").collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
      assert(got("K0") == ((0, 1)))
      assert(got("K9") == ((99999, 1)))
    }
  }

  test("upsertStatement renders the reference ON CONFLICT SQL") {
    val sql = Upsert.upsertStatement("reddit_schema.redit_table")
    assert(sql.startsWith(
      """INSERT INTO reddit_schema.redit_table ("thing_key", "thing_type", "id", "created_at", "score", "num_comments", "title_sanitized", "author_hash", "permalink", "subreddit", "flair_text") VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)"""))
    assert(sql.contains("""ON CONFLICT ("thing_key") DO UPDATE SET"""))
    assert(sql.contains(""""score" = EXCLUDED."score""""))
    assert(Upsert.qIdent("""we"ird""") == "\"we\"\"ird\"")
  }
}
