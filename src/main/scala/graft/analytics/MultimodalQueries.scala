package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal binary-column surface: metadata projection, deterministic
  * frame slicing, and (stub-decoded) feature extraction over a media
  * table synthesized from `documents` (payload = UTF-8 bytes, so the
  * byte-level oracle is exactly reproducible in DuckDB via encode()).
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String) =
    Multimodal.fromDocuments(Tables.load(s, dir, "documents"))

  private val kindSql =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------ meta
    // Typed metadata over opaque payloads: byte length + content hash.
    // Catalyst prunes `meta`/`payload` subfields it doesn't need; at
    // scale this projection is what flows into joins — payload stays in
    // the scan stage.
    GraftQuery(
      "q_multimodal_meta",
      s"""SELECT doc_id AS media_id, $kindSql AS kind,
         |  octet_length(encode(text)) AS n_bytes,
         |  sha256(text) AS payload_sha
         |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      media(s, dir).toDF()
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha"))
        .orderBy(col("media_id"))
    },

    // ---------------------------------------------------------- frames
    // Frame sampling: 8 evenly spaced payload slices per video; the
    // slice-boundary arithmetic is integer-exact, so DuckDB reproduces
    // per-frame byte counts without touching the bytes.
    GraftQuery(
      "q_multimodal_frames",
      s"""SELECT doc_id AS media_id, i AS frame_idx,
         |  CAST((octet_length(encode(text)) * (i + 1)) // 8
         |     - (octet_length(encode(text)) * i) // 8 AS INTEGER) AS frame_bytes
         |FROM documents, (SELECT unnest(range(0, 8)) AS i)
         |WHERE $kindSql = 'video'
         |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      val frames = Multimodal.sampleFrames(
        media(s, dir).filter(col("kind") === "video"), 8)
      frames
        .select(col("media_id"),
          posexplode(col("frames")).as(Seq("frame_idx", "frame")))
        .select(col("media_id"), col("frame_idx").cast(LongType).as("frame_idx"),
          length(col("frame")).cast(IntegerType).as("frame_bytes"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // -------------------------------------------------------- features
    // Stub-decode + 16-bin byte-histogram features, full hash check of
    // the typed mapPartitions path: the integer bin counts are exact in
    // both engines. Bin index = byte / 16 = the byte's HIGH NIBBLE, so
    // the DuckDB oracle counts first-of-pair hex digits in
    // hex(encode(text)) — no byte-indexing needed. The normalized
    // float32 `features` view (ANN input) is covered by MultimodalSpec.
    GraftQuery(
      "q_multimodal_features",
      s"""WITH h AS (
         |  SELECT doc_id, $kindSql AS kind, hex(encode(text)) AS hx,
         |    CAST(octet_length(encode(text)) AS INTEGER) AS n
         |  FROM documents)
         |SELECT doc_id AS media_id, kind, n AS n_bytes,
         |  array_to_string(
         |    [len([p FOR p IN range(1, n + 1)
         |          IF substring(hx, 2 * p - 1, 1) = d])
         |     FOR d IN ['0','1','2','3','4','5','6','7',
         |               '8','9','A','B','C','D','E','F']], ',') AS hist
         |FROM h ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.features(media(s, dir)).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          array_join(transform(col("hist"), _.cast(StringType)), ",")
            .as("hist"))
        .orderBy(col("media_id"))
    })
}
