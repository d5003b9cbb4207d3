package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.PipelineFunctions._

/** Unit vectors for SURVEY §2.4 F1–F14 against the reference's Python
  * semantics (reimplemented as in-test oracles), plus generator-driven
  * properties (SURVEY §5.2 item 2) evaluated column-wise in one pass.
  */
class PipelineFunctionsSpec extends SparkSpec {

  private val salt = "test-salt"

  test("sanitizeTitle matches the reference transform order") {
    val in = "Contact me\nat foo@bar.com  or\t 1234567890 now"
    val out = evalStr(Seq(in))(sanitizeTitle(_)).head
    assert(out == "Contact me at [redacted-email] or [redacted-number] now")
  }

  test("sanitizeTitle truncates to 300 chars AFTER redaction") {
    val in = "x" * 250 + " someone@example.com " + "y" * 100
    val out = evalStr(Seq(in))(sanitizeTitle(_)).head.asInstanceOf[String]
    assert(out.length == 300)
    assert(out.contains("[redacted-email]")) // redaction happened pre-truncate
  }

  test("sanitizeTitle is idempotent on arbitrary strings") {
    val gen = Gen.listOfN(60,
      Gen.oneOf(Gen.asciiPrintableStr, Gen.alphaNumStr,
        Gen.const("a@b.co 12345678\n\n  x"))).sample.get
    val df = strDf(gen)
    val diff = df.select(
        sanitizeTitle(col("v")).as("once"),
        sanitizeTitle(sanitizeTitle(col("v"))).as("twice"))
      .filter(not(col("once") <=> col("twice")))
    assert(diff.count() == 0)
  }

  test("saltedSha256: empty/null → empty string, else sha256(salt||v)") {
    val out = evalStr(Seq("abc", "", null))(saltedSha256(salt, _))
    assert(out == Seq(sha256Hex(salt + "abc"), "", ""))
  }

  test("normPermalink: trim, lower, strip trailing slashes") {
    val out = evalStr(Seq("  /R/Test//  ", "https://X.com/a/", "abc"))(normPermalink)
    assert(out == Seq("/r/test", "https://x.com/a", "abc"))
  }

  test("safeInt: non-numeric and decimal strings → 0 (Python int() semantics)") {
    val out = evalStr(Seq("42", "-7", "N/A", "", "12.5", null))(safeInt(_))
    assert(out == Seq(42, -7, 0, 0, 0, 0))
  }

  test("firstPresent treats empty string as missing (Python falsiness)") {
    import spark.implicits._
    val df = Seq(("", "fallback"), ("x", "y"), (null, "z"))
      .toDF("a", "b")
    val out = df.select(firstPresent(col("a"), col("b"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("fallback", "x", "z"))
  }

  test("fullname: name wins, else t3_<id>, else null") {
    import spark.implicits._
    val df = Seq(("t3_abc", "abc"), (null, "xyz"), (null, null))
      .toDF("name", "id")
    val out = df.select(fullname(col("name"), col("id"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("t3_abc", "t3_xyz", null))
  }

  test("deriveThingKey: reference base string incl. trailing colon") {
    import spark.implicits._
    val df = Seq(
      ("have", "id1", "/r/x"),   // key present → untouched
      ("", "id1", "/r/x"),       // derived from id
      ("", "", "/r/x"),          // derived from permalink
      ("", "", "")               // both empty → base "t3:"
    ).toDF("k", "id", "pl")
    val out = df.select(
      deriveThingKey(salt, col("k"), lit("t3"),
        nullif(col("id"), lit("")), nullif(col("pl"), lit(""))))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq(
      "have",
      sha256Hex(salt + "t3:id1"),
      sha256Hex(salt + "t3:/r/x"),
      sha256Hex(salt + "t3:")))
  }

  test("epochToTs + isoZ renders reference ISO-8601 Z strings") {
    import spark.implicits._
    val df = Seq(1694253032.0).toDF("e")
    val out = df.select(isoZ(epochToTs(col("e")))).collect().head.getString(0)
    assert(out == "2023-09-09T09:50:32Z")
  }

  test("quantizeLog2 absorbs 1-ulp libm differences (dyadic, exact)") {
    import spark.implicits._
    import graft.analytics.TextQueries.{quantizeLog2, Log2Grid}
    // representative smoothed-bigram log-probs, plus values seeded one
    // ulp apart (the cross-engine libm risk being closed): quantized
    // twins must collapse to the SAME grid value
    val base = Seq(math.log(3.0 / 7) / math.log(2), -9.965784284662087,
      -0.07400058144377693, -17.3219280948874)
    val pairs = base.flatMap(v => Seq((v, v), (v, Math.nextUp(v)),
      (v, Math.nextDown(Math.nextUp(v)))))
    val rows = pairs.toDF("a", "b")
      .select(quantizeLog2(col("a")).as("qa"), quantizeLog2(col("b")).as("qb"))
      .collect()
    rows.foreach { r =>
      val (qa, qb) = (r.getDouble(0), r.getDouble(1))
      assert(qa == qb, s"1-ulp twin crossed the grid: $qa vs $qb")
      // the scale/unscale round-trip is exact: qa is ON the 2^-30 grid
      assert(qa * Log2Grid == math.floor(qa * Log2Grid), s"off-grid $qa")
    }
  }

  test("sanitize properties: bounded, no emails/digit-runs survive") {
    val strs = Gen.listOfN(80, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.const("a@b.co c@d.org 123456789012 \n \t x" * 20))).sample.get
    val bad = strDf(strs).select(sanitizeTitle(col("v")).as("s"))
      .filter(length(col("s")) > 300 ||
        col("s").rlike(EmailRe) || col("s").rlike(LongDigitsRe))
    assert(bad.count() == 0)
  }
}
