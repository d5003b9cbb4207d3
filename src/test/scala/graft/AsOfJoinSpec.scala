package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** AsOfJoin vs a brute-force in-test oracle (per left row: argmax-ts
  * right row with ts ≤ / < left.ts), including equal-timestamp edges
  * and keys with no preceding right row.
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s"2025-01-01 $s:00")

  test("inclusive and strict as-of match the brute-force oracle") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, price)
      ("A", ts("09:00"), 1.0), ("A", ts("10:00"), 2.0), ("A", ts("11:00"), 3.0),
      ("B", ts("10:30"), 9.0)).toDF("sym", "qts", "price")
    val trades = Seq( // (key, ts, qty)
      ("A", ts("10:00"), 5L), // equal-ts edge: inclusive → 2.0, strict → 1.0
      ("A", ts("10:59"), 6L),
      ("A", ts("08:00"), 7L), // before any quote → null
      ("B", ts("11:00"), 8L),
      ("C", ts("12:00"), 9L)) // key never quoted → null
      .toDF("sym", "tts", "qty")

    def oracle(strict: Boolean): Map[(String, Timestamp), Option[Double]] = {
      val qs = quotes.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      trades.collect().map { t =>
        val cand = qs.filter(q => q._1 == t.getString(0) &&
          (if (strict) q._2.before(t.getTimestamp(1))
           else !q._2.after(t.getTimestamp(1))))
        (t.getString(0), t.getTimestamp(1)) ->
          (if (cand.isEmpty) None else Some(cand.maxBy(_._2.getTime)._3))
      }.toMap
    }

    for (strict <- Seq(false, true)) {
      val got = AsOfJoin(trades, quotes, "sym", "tts", "qts",
          Seq("price"), strict = strict)
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) ->
          Option(r.get(r.fieldIndex("asof_price"))).map(_.asInstanceOf[Double]))
        .toMap
      assert(got == oracle(strict), s"strict=$strict")
    }
  }
}
