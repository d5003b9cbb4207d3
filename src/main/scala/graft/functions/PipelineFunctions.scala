package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The reference's row-at-a-time Python helpers re-expressed as pure
  * `Column` combinators (SURVEY §2.4 F1–F14). Zero UDFs: every transform
  * is a built-in Catalyst expression, so whole-stage codegen, predicate
  * pushdown and column pruning all stay intact.
  */
object PipelineFunctions {

  /** Email regex from /root/reference/dags/Fetch_reddit.py:44. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long-digit-run regex from Fetch_reddit.py:45. */
  val LongDigitsRe = "[0-9]{7,}"

  /** F1 — newline strip (Fetch_reddit.py:51). */
  def stripNewlines(c: Column): Column = regexp_replace(c, "\n", " ")

  /** F2 — whitespace collapse + trim (Fetch_reddit.py:52). */
  def collapseWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** F3 — email redaction (Fetch_reddit.py:53). */
  def redactEmails(c: Column): Column =
    regexp_replace(c, EmailRe, "[redacted-email]")

  /** F4 — ≥7-digit-run redaction (Fetch_reddit.py:54). */
  def redactLongDigits(c: Column): Column =
    regexp_replace(c, LongDigitsRe, "[redacted-number]")

  /** F5 — truncation (Fetch_reddit.py:55; legacy jq era used 500). */
  def truncateTo(c: Column, maxLen: Int): Column = substring(c, 1, maxLen)

  /** F1–F5 fused — `_sanitize_title` (Fetch_reddit.py:50-55): strip
    * newlines, collapse whitespace, redact emails then digit runs,
    * truncate. Order matters and matches the reference exactly.
    */
  def sanitizeTitle(c: Column, maxLen: Int = 300): Column =
    truncateTo(redactLongDigits(redactEmails(collapseWhitespace(stripNewlines(c)))), maxLen)

  /** F6 — salted SHA-256, empty string for null/empty input
    * (`_hash_value`, Fetch_reddit.py:58-63).
    */
  def saltedSha256(salt: String, c: Column): Column =
    when(c.isNull || c === "", lit("")).otherwise(sha2(concat(lit(salt), c), 256))

  /** F7 — epoch seconds → TimestampType (Fetch_reddit.py:144-148); keep
    * typed, render with [[isoZ]] only at the CSV edge.
    */
  def epochToTs(c: Column): Column = timestamp_seconds(c)

  /** ISO-8601 `Z` rendering used by the fetch-stage CSV (Fetch_reddit.py:146). */
  def isoZ(c: Column): Column = date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** F8 — reddit fullname coalesce with Python FALSINESS semantics
    * (Fetch_reddit.py:150: `d.get("name") or (f"t3_{id}" if id else
    * None)`): an empty-string `name` counts as missing (falls through to
    * `t3_<id>`), and an empty-string `id` yields null — never a bare
    * `"t3_"`. `concat` null-propagates, so `nullif` on both inputs
    * reproduces both branches exactly.
    */
  def fullname(name: Column, id: Column): Column =
    coalesce(nullif(name, lit("")), concat(lit("t3_"), nullif(id, lit(""))))

  /** F9 — permalink absolutize, null-propagating (Fetch_reddit.py:149). */
  def absolutizePermalink(c: Column): Column =
    concat(lit("https://www.reddit.com"), c)

  /** F10 — `_norm_permalink`: strip, lowercase, drop trailing slashes
    * (Combine_send_to_postgresql.py:49-56).
    */
  def normPermalink(c: Column): Column =
    regexp_replace(lower(trim(c)), "/+$", "")

  /** F13 — safe int cast: non-numeric → default
    * (Combine_send_to_postgresql.py:96-101).
    */
  def safeInt(c: Column, default: Int = 0): Column =
    coalesce(c.try_cast(IntegerType), lit(default))

  /** F11 — multi-name coalesce with empty-string-as-missing semantics:
    * Python falsiness treats `""` like absent
    * (Combine_send_to_postgresql.py:82,86,103).
    */
  def firstPresent(cols: Column*): Column =
    coalesce(cols.map(c => nullif(c, lit(""))): _*)

  /** F14 — conditional key derivation: when `thing_key` is missing,
    * SHA-256(salt ‖ "<type>:<id-or-normalized-permalink>")
    * (Combine_send_to_postgresql.py:89-93). The colon is present even
    * when id AND permalink are empty, and the hash is `_sha256_hex`
    * (:58-61) which — unlike `_hash_value` — hashes empty input too.
    */
  def deriveThingKey(
      salt: String,
      thingKey: Column,
      thingType: Column,
      id: Column,
      permalinkNorm: Column): Column = {
    val basis = concat(thingType, lit(":"),
      coalesce(firstPresent(id, permalinkNorm), lit("")))
    when(thingKey.isNull || thingKey === "", sha2(concat(lit(salt), basis), 256))
      .otherwise(thingKey)
  }
}
