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
    // Stub-decode + 16-bin byte-histogram features (rows-only check: the
    // histogram loop lives in typed Scala, not SQL). Output feeds the
    // ANN cosine operators directly.
    GraftQuery.noOracle("q_multimodal_features") { (s, dir) =>
      Multimodal.features(media(s, dir)).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("features"), 1), 4).as("f0"),
          round(element_at(col("features"), 2), 4).as("f1"),
          round(aggregate(col("features"), lit(0.0d),
            (acc, x) => acc + x), 4).as("f_sum"))
        .orderBy(col("media_id"))
    })
}
