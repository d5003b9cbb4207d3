package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.FirstWins

/** Deterministic first-wins dedup vs the reference's `seen_keys` loop
  * (Combine_send_to_postgresql.py:136,152-161) reimplemented as an
  * in-test oracle (SURVEY §5.2 item 2).
  */
class FirstWinsSpec extends SparkSpec {

  test("keeps exactly the first encounter per key, any input order") {
    val rnd = new Random(42)
    // row_seq unique within each file_seq so encounter order is total
    val rows = (0 until 500).map { i =>
      (s"k${rnd.nextInt(60)}", rnd.nextInt(10), i, s"payload$i")
    }
    // oracle: iterate in (file_seq, row_seq) order with a seen-set
    val oracle = rows
      .sortBy { case (_, f, r, _) => (f, r) }
      .foldLeft(Vector.empty[(String, Int, Int, String)] -> Set.empty[String]) {
        case ((acc, seen), row @ (k, _, _, _)) =>
          if (seen(k)) (acc, seen) else (acc :+ row, seen + k)
      }._1.map(r => (r._1, r._4)).toSet

    import spark.implicits._
    val df = rnd.shuffle(rows)
      .toDF("thing_key", "file_seq", "row_seq", "payload")
      .repartition(7) // physical order ≠ encounter order
    val got = FirstWins(df).select("thing_key", "payload")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == oracle)
  }

  test("output keys are unique and a subset of input keys") {
    import spark.implicits._
    val df = Seq(("a", 0, 0, "x"), ("a", 0, 1, "y"), ("b", 1, 0, "z"))
      .toDF("thing_key", "file_seq", "row_seq", "p")
    val out = FirstWins(df).select("thing_key", "p").as[(String, String)]
      .collect().toMap
    assert(out == Map("a" -> "x", "b" -> "z"))
  }
}
