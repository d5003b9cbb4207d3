package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.PipelineFunctions._

/** The reference pipeline's transforms (SURVEY §2.4 F1–F14, §2.3 A1)
  * exercised over the analytics corpus so the DuckDB oracle can check
  * them. The `documents`/`events` tables stand in for reddit titles and
  * listing rows; semantics are exactly the reference's.
  *
  * DuckDB regex note: `regexp_replace` needs the 'g' flag to match
  * Spark's replace-all semantics.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Salt = "graft-salt"

  val all: Seq[GraftQuery] = Seq(

    // ---------------------------------------------------------------- F1-F5
    // `_sanitize_title` (Fetch_reddit.py:50-55) over documents.text:
    // newline strip → whitespace collapse+trim → email redact → long-
    // digit redact → 300-char truncate, in reference order.
    GraftQuery(
      "q_sanitize_text",
      """SELECT doc_id,
        |  substring(
        |    regexp_replace(
        |      regexp_replace(
        |        trim(regexp_replace(regexp_replace(text, '\n', ' ', 'g'), '\s+', ' ', 'g')),
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[redacted-email]', 'g'),
        |      '[0-9]{7,}', '[redacted-number]', 'g'),
        |    1, 300) AS sanitized
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // regex chain ABOVE the sort (the q_normalize_row discipline,
      // applied catalog-wide in r17): a global orderBy's range sampler
      // executes its child twice, so a heavy projection below the sort
      // pays double
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), sanitizeTitle(col("text")).as("sanitized"))
    },

    // ---------------------------------------------------------------- F6/F8
    // `_hash_value` (Fetch_reddit.py:58-63) + fullname derivation
    // (Fetch_reddit.py:150): thing_key = sha256(salt ‖ "t3_<id>").
    GraftQuery(
      "q_salted_hash",
      s"""SELECT doc_id,
         |  sha256('$Salt' || 't3_' || CAST(doc_id AS VARCHAR)) AS thing_key,
         |  CASE WHEN source IS NULL OR source = '' THEN ''
         |       ELSE sha256('$Salt' || source) END AS source_hash
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // sha projection above the sort (the q_normalize_row discipline)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          saltedSha256(Salt, fullname(lit(null).cast(StringType),
            col("doc_id").cast(StringType))).as("thing_key"),
          saltedSha256(Salt, col("source")).as("source_hash"))
    },

    // ---------------------------------------------------------------- F7
    // Epoch↔timestamp round trip (Fetch_reddit.py:144-148): take the
    // event's epoch seconds, rebuild a timestamp, render ISO-8601 `Z`.
    GraftQuery(
      "q_epoch_iso",
      """SELECT event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s,
        |  strftime(make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) * 1000000),
        |           '%Y-%m-%dT%H:%M:%SZ') AS created_at_iso
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val epochS = floor(unix_micros(col("ts").cast(TimestampType)) / 1000000L)
      t(s, dir, "events")
        .select(col("event_id"),
          epochS.cast(LongType).as("epoch_s"),
          isoZ(epochToTs(epochS)).as("created_at_iso"))
        .orderBy(col("event_id"))
    },

    // ---------------------------------------------------------------- F9/F10
    // Permalink absolutize (Fetch_reddit.py:149) then `_norm_permalink`
    // (Combine_send_to_postgresql.py:49-56): lower, trim, strip trailing
    // slashes. Pseudo-URLs synthesized from `source`.
    GraftQuery(
      "q_norm_permalink",
      """SELECT doc_id,
        |  regexp_replace(lower(trim('https://www.reddit.com' || '/R/' || source || '/' ||
        |    CAST(doc_id AS VARCHAR) || '///')), '/+$', '', 'g') AS permalink
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val raw = concat(lit("/R/"), col("source"), lit("/"),
        col("doc_id").cast(StringType), lit("///"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          normPermalink(absolutizePermalink(raw)).as("permalink"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------- F11-F13
    // `_normalize_row` semantics (Combine_send_to_postgresql.py:81-120):
    // multi-name coalesce with ""-as-missing, safe int cast (non-numeric
    // → 0), constant defaults. props' numeric field plays "score".
    GraftQuery(
      "q_normalize_row",
      """SELECT event_id,
        |  coalesce(nullif(event_type, ''), 'unknown') AS etype,
        |  coalesce(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER), 0) AS score,
        |  coalesce(TRY_CAST(event_type AS INTEGER), 0) AS bad_cast_default
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      // sort BEFORE the regex projection: a global orderBy evaluates
      // its child twice (the range-partitioner's sample pass runs the
      // full child plan, then the sort stage runs it again), so an
      // expensive projection below the sort pays double — 1.94 s at
      // sf0.1 vs 1.0 s projected-above (round 12; surfaced by the
      // bench-action fix). Above the sort it runs once, after the
      // exchange; the sort carries the ~100-byte props column instead,
      // the right trade for a regex-heavy row.
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"),
          firstPresent(col("event_type"), lit("unknown")).as("etype"),
          safeInt(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)).as("score"),
          safeInt(col("event_type")).as("bad_cast_default"))
    },

    // ---------------------------------------------------------------- F14
    // Conditional key derivation (Combine_send_to_postgresql.py:89-93):
    // rows with an even doc_id "arrive" without a thing_key and get
    // sha256(salt ‖ "t3:<id-or-permalink>"); odd rows keep theirs.
    GraftQuery(
      "q_derive_key",
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0
         |       THEN sha256('$Salt' || 't3:' || CAST(doc_id AS VARCHAR))
         |       ELSE 'have-key-' || CAST(doc_id AS VARCHAR) END AS thing_key
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val existing = when(col("doc_id") % 2 === 0, lit(""))
        .otherwise(concat(lit("have-key-"), col("doc_id").cast(StringType)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          deriveThingKey(Salt, existing, lit("t3"),
            col("doc_id").cast(StringType), lit(null).cast(StringType))
            .as("thing_key"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------- A1/W1
    // Deterministic first-wins dedup (Combine_send_to_postgresql.py:152-161):
    // keep the first occurrence per key in (file order, row order) —
    // here per `source` in doc_id order. `dropDuplicates` would keep an
    // arbitrary row; the row_number window reproduces encounter order.
    GraftQuery(
      "q_dedup_firstwins",
      """WITH r AS (
        |  SELECT doc_id, source, lang,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INTEGER) AS rn
        |  FROM documents)
        |SELECT doc_id, source, lang FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    })
}
