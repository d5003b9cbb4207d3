package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Round-2 widening of the relational surface beyond SURVEY §2's rows:
  * conditional (FILTER-clause) and bitwise aggregates, generators with
  * ordinality (posexplode), time-RANGE window frames, and a bucketed
  * edit-distance candidate-pair join (the classic fuzzy-dedup operator
  * the reference's exact-key dedup cannot express).
  *
  * Output-shape rules follow [[CoreQueries]]: decimal math internal,
  * DOUBLE on the wire, INTEGER ranks/positions/distances, unique
  * ORDER BY tiebreaks.
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec2 = DecimalType(18, 2)
  private def dbl(c: Column): Column = c.cast(DoubleType)

  private def us(c: Column): Column = unix_micros(c.cast(TimestampType))
  private def usSql(col: String): String = s"epoch_us(CAST($col AS TIMESTAMP))"

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------- A4+
    // Conditional aggregation (SQL FILTER clause) plus bitwise
    // aggregates. Spark expresses FILTER as when()-guarded inputs —
    // identical semantics (non-matching rows contribute NULL, which
    // every aggregate skips) and still one map-side partial aggregate:
    // no extra scan or shuffle versus the unconditional form.
    GraftQuery(
      "q_agg_filter",
      """SELECT event_type,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE value > 50) AS n_hi,
        |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE value > 50), 0) AS DOUBLE) AS sum_hi,
        |  count(DISTINCT user_id) FILTER (WHERE value > 50) AS users_hi,
        |  coalesce(bit_or(user_id), 0) AS users_bor,
        |  coalesce(bit_xor(event_id), 0) AS events_bxor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val hi = col("value") > 50
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          count(when(hi, lit(1))).as("n_hi"),
          dbl(coalesce(sum(when(hi, col("value").cast(dec2))), lit(0).cast(dec2)))
            .as("sum_hi"),
          count_distinct(when(hi, col("user_id"))).as("users_hi"),
          coalesce(expr("bit_or(user_id)"), lit(0L)).as("users_bor"),
          coalesce(expr("bit_xor(event_id)"), lit(0L)).as("events_bxor"))
        .orderBy(col("event_type"))
    },

    // ----------------------------------------------------------- P1+/gen
    // Generator with ordinality: posexplode over the token array. The
    // explode is a narrow per-row flatMap (no shuffle); the modulo
    // predicate is pushed below the generator by Catalyst so only the
    // sampled docs are ever tokenized. DuckDB's ordinality analog is the
    // zipped-unnest form (unnest(range(len(l))) ∥ unnest(l)).
    GraftQuery(
      "q_explode_pos",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id % 37 = 0),
        |e AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(len(toks))) AS INTEGER) AS pos,
        |    unnest(toks) AS tok
        |  FROM t)
        |SELECT doc_id, pos, tok FROM e WHERE pos < 8
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") % 37 === 0)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(col("pos") < 8)
        .select(col("doc_id"), col("pos").cast(IntegerType).as("pos"), col("tok"))
        .orderBy(col("doc_id"), col("pos"))
    },

    // ------------------------------------------------------------- W5+
    // Event-time RANGE frame: trailing 1-hour sliding aggregate per
    // user, ordered by epoch microseconds (a numeric order key, so the
    // frame is an exact micros interval — no sessionization shuffle
    // beyond the single window partition exchange). RANGE/peer
    // semantics (ties share a frame) match between engines per the SQL
    // standard.
    GraftQuery(
      "q_window_time_range",
      s"""SELECT event_id, user_id,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS hr_sum,
         |  CAST(count(*) OVER w AS INTEGER) AS hr_n
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ${usSql("ts")}
         |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(us(col("ts")))
        .rangeBetween(-3600000000L, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          dbl(sum(col("value").cast(dec2)).over(w)).as("hr_sum"),
          count(lit(1)).over(w).cast(IntegerType).as("hr_n"))
        .orderBy(col("event_id"))
    },

    // --------------------------------------------------------- sampling
    // Deterministic stratified sampling: per-stratum keep rates (‰)
    // applied through a salted-key hash-mod — the reproducible way to
    // downsample overrepresented strata in a training mix (rerunning
    // the pipeline keeps EXACTLY the same rows; no RNG, no seed-per-
    // partition coupling). Scan-stage only: the filter is one SHA per
    // row and prunes before any shuffle.
    GraftQuery(
      "q_sample_stratified",
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_returnflag,
        |    list_sum([(strpos('0123456789abcdef', substring(h, p, 1)) - 1)
        |              * CAST(16**(7 - p) AS BIGINT) FOR p IN range(1, 8)]) % 1000
        |      AS bucket
        |  FROM (SELECT l_orderkey, l_linenumber, l_returnflag,
        |          substring(sha256(CAST(l_orderkey AS VARCHAR) || '|' ||
        |                           CAST(l_linenumber AS VARCHAR)), 1, 7) AS h
        |        FROM lineitem))
        |WHERE bucket < (CASE l_returnflag WHEN 'A' THEN 50
        |                WHEN 'R' THEN 100 ELSE 10 END)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      import graft.functions.SimilarityFunctions.elementHash
      val bucket = elementHash(
        concat(col("l_orderkey").cast(StringType), lit("|"),
          col("l_linenumber").cast(StringType))) % 1000
      val rate = when(col("l_returnflag") === "A", 50)
        .when(col("l_returnflag") === "R", 100).otherwise(10)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .filter(bucket < rate)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ----------------------------------------------------------- layout
    // The z-order clustering key under the oracle gate: DuckDB spreads
    // the same Morton magic numbers with plain bitwise ops, so the
    // codegen expression's bit layout is pinned cross-engine. The key
    // is what [[graft.sinks.CuratedCorpus.writeZClustered]] range-
    // partitions on; here it's projected and ordered so the driver
    // hashes the actual interleave of every sampled row.
    GraftQuery(
      "q_zorder_key",
      s"""WITH base AS (
         |  SELECT event_id, user_id % 256 AS x,
         |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y
         |  FROM events),
         |s1 AS (SELECT event_id, x, y,
         |  ((x | (x << 16)) & 281470681808895) AS a1,
         |  ((y | (y << 16)) & 281470681808895) AS b1 FROM base),
         |s2 AS (SELECT event_id, x, y,
         |  ((a1 | (a1 << 8)) & 71777214294589695) AS a2,
         |  ((b1 | (b1 << 8)) & 71777214294589695) AS b2 FROM s1),
         |s3 AS (SELECT event_id, x, y,
         |  ((a2 | (a2 << 4)) & 1085102592571150095) AS a3,
         |  ((b2 | (b2 << 4)) & 1085102592571150095) AS b3 FROM s2),
         |s4 AS (SELECT event_id, x, y,
         |  ((a3 | (a3 << 2)) & 3689348814741910323) AS a4,
         |  ((b3 | (b3 << 2)) & 3689348814741910323) AS b4 FROM s3),
         |s5 AS (SELECT event_id, x, y,
         |  ((a4 | (a4 << 1)) & 6148914691236517205) AS a5,
         |  ((b4 | (b4 << 1)) & 6148914691236517205) AS b5 FROM s4)
         |SELECT event_id, x, y, (a5 | (b5 << 1)) AS z
         |FROM s5 ORDER BY z, event_id LIMIT 500""".stripMargin) { (s, dir) =>
      val x = col("user_id") % 256
      val y = hour(col("ts").cast(TimestampType)).cast(LongType)
      t(s, dir, "events")
        .select(col("event_id"), x.as("x"), y.as("y"),
          graft.expressions.ZOrder.zorder2(x, y).as("z"))
        .orderBy(col("z"), col("event_id"))
        .limit(500)
    },

    // ----------------------------------------------------------- dedup+
    // Fuzzy candidate pairs by edit distance: block on (p_brand,
    // p_size, length band) — an equi self-join whose pair count is
    // Σ bucket², not n² — then levenshtein only on co-bucketed
    // candidates. The length band is the piece that keeps the blocking
    // honest as buckets grow (round-8 sf1 sweep: the fixed
    // (brand, size) key alone goes quadratic in bucket size, 16.4×
    // wall for 10× rows): edit distance ≤ 3 bounds the LENGTH
    // difference by 3, so with band = len/4 a true pair's bands differ
    // by at most 1 — one side probes {band-1, band, band+1} (each pair
    // matches exactly once: the three probes are distinct) and recall
    // stays exact while per-bucket mass is cut by the band occupancy.
    // The oracle keeps the un-banded join: identical verified output.
    // At still-larger scale the same trick composes with a phonetic or
    // prefix key; the plan shape (equi-join, scalar verify after) is
    // already the scalable one.
    GraftQuery(
      "q_fuzzy_pairs",
      """WITH b AS (SELECT p_brand, p_size, p_partkey, p_name FROM part)
        |SELECT a.p_brand, a.p_size,
        |  a.p_partkey AS key_a, c.p_partkey AS key_b,
        |  a.p_name AS name_a, c.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, c.p_name) AS INTEGER) AS dist
        |FROM b a JOIN b c
        |  ON a.p_brand = c.p_brand AND a.p_size = c.p_size
        |  AND a.p_partkey < c.p_partkey
        |WHERE levenshtein(a.p_name, c.p_name) <= 3
        |ORDER BY key_a, key_b""".stripMargin) { (s, dir) =>
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
          floor(length(col("p_name")) / 4).as("band"))
      val a = p.select(col("p_brand"), col("p_size"), col("band"),
        col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      // probe side: each row under its band and both neighbors —
      // |len_a - len_b| <= 3 < 4 implies |band_a - band_b| <= 1
      val b = p.select(col("p_brand"), col("p_size"),
          explode(array(col("band") - 1, col("band"), col("band") + 1))
            .as("band"),
          col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b, Seq("p_brand", "p_size", "band"))
        .filter(col("key_a") < col("key_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 3)
        .select(col("p_brand"), col("p_size"), col("key_a"), col("key_b"),
          col("name_a"), col("name_b"), col("dist"))
        .orderBy(col("key_a"), col("key_b"))
    }
  )
}
