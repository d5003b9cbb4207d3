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
    },

    // --------------------------------------------------------- decoded
    // REAL container decode, hash-gated end-to-end: payloads are actual
    // 24-bpp BMP (doc_id % 4 == 0) / deflate-compressed RGB PNG
    // (doc_id % 4 == 2, per-row filters cycling all five types) /
    // PCM-16 WAV (odd) files synthesized deterministically from the
    // text bytes, and the Spark side must parse the real formats — BMP
    // stride padding, bottom-up row order, BGR→RGB swap; PNG chunk
    // CRCs, zlib inflate, Sub/Up/Average/Paeth unfilter; WAV chunk
    // walk, sample-rate field, int16 sign — to reproduce the decoded
    // statistics the oracle computes directly from encode(text) via the
    // known construction (BMP and PNG share one pixel construction, so
    // the oracle is container-independent while the engine runs two
    // different decoders). pos_sum (position-weighted value sum) is
    // what binds the layout handling: any row-flip, padding, filter or
    // channel-order mistake shifts values to different positions and
    // breaks the hash. The DuckDB side never parses a container; it
    // computes the EXPECTED decode from the raw bytes, which is exactly
    // what makes this an independent gate on the decoders.
    GraftQuery(
      "q_multimodal_decoded",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, L,
        |    [(strpos('0123456789ABCDEF', substring(hx, 2*t+1, 1))-1)*16
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*t+2, 1))-1)
        |     FOR t IN range(0, L)] AS bs
        |  FROM b),
        |w AS (
        |  SELECT doc_id, L, bs,
        |    [CASE WHEN bs[2*t+1] + 256*bs[2*t+2] >= 32768
        |          THEN bs[2*t+1] + 256*bs[2*t+2] - 65536
        |          ELSE bs[2*t+1] + 256*bs[2*t+2] END
        |     FOR t IN range(0, L // 2)] AS smp
        |  FROM v)
        |SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS fmt,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |    THEN greatest((L + 14) // 15, 1) * 15
        |    ELSE L // 2 END AS BIGINT) AS n_vals,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN coalesce(list_sum(bs), 0)
        |    ELSE coalesce(list_sum(smp), 0) END AS BIGINT) AS val_sum,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |    THEN coalesce(list_sum([bs[t+1] * t FOR t IN range(0, L)]), 0)
        |    ELSE coalesce(list_sum([smp[t+1] * t
        |                            FOR t IN range(0, L // 2)]), 0)
        |    END AS BIGINT) AS pos_sum,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0
        |    ELSE 8000 + (doc_id % 3) * 4000 END AS INTEGER) AS sr,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN greatest((L + 14) // 15, 1)
        |    ELSE L // 2 END AS INTEGER) AS n_rows
        |FROM w ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dec = Multimodal.decode(
        Multimodal.fromDocumentsEncoded(Tables.load(s, dir, "documents")))
      dec.map { d =>
        // invert the float normalization exactly: /255 (image) and
        // /32768 (audio) both round-trip bit-exactly through Float
        val scale = if (d.kind == "image") 255f else 32768f
        val ints = d.tensor.map(v => Math.round(v * scale).toLong)
        val posSum = ints.iterator.zipWithIndex.map {
          case (v, i) => v * i
        }.sum
        (d.media_id, d.kind, ints.size.toLong, ints.sum, posSum,
          d.sample_rate, d.shape.head)
      }.toDF("media_id", "fmt", "n_vals", "val_sum", "pos_sum", "sr", "n_rows")
        .withColumn("sr", col("sr").cast(IntegerType))
        .withColumn("n_rows", col("n_rows").cast(IntegerType))
        .orderBy(col("media_id"))
    },

    // ----------------------------------------------------------- video
    // REAL AVI container decode — the last media kind off the stub.
    // Every document becomes an uncompressed 24-bpp DIB AVI: 4 frame
    // slices (the q_multimodal_frames boundary formula) padded into
    // width-5 RGB frames, frame rate varying by doc. The Spark side
    // must walk RIFF LISTs, parse strh (fps) and the BITMAPINFOHEADER,
    // and undo per-frame DIB layout (bottom-up rows, stride padding,
    // BGR); the oracle computes the expected tensor statistics directly
    // from encode(text) and the construction math. pos_sum is the
    // layout gate: it weights every byte by its position in the decoded
    // (frame, row, col, channel) order, so frame order, row flips,
    // stride handling and channel swaps all break the hash.
    GraftQuery(
      "q_multimodal_video",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, L,
        |    greatest(((L + 3) // 4 + 14) // 15, 1) AS h,
        |    [(strpos('0123456789ABCDEF', substring(hx, 2*t+1, 1))-1)*16
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*t+2, 1))-1)
        |     FOR t IN range(0, L)] AS bs
        |  FROM b)
        |SELECT doc_id AS media_id,
        |  4 AS n_frames,
        |  CAST(h AS INTEGER) AS fh,
        |  CAST(8 + doc_id % 5 AS INTEGER) AS fps,
        |  CAST(4 * h * 15 AS BIGINT) AS n_vals,
        |  CAST(coalesce(list_sum(bs), 0) AS BIGINT) AS val_sum,
        |  CAST(coalesce(list_sum(
        |    [coalesce(list_sum(
        |       [bs[t+1] * (f * h * 15 + (t - (L * f) // 4))
        |        FOR t IN range((L * f) // 4, (L * (f+1)) // 4)]), 0)
        |     FOR f IN range(0, 4)]), 0) AS BIGINT) AS pos_sum
        |FROM v ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dec = Multimodal.decode(
        Multimodal.videoFromDocuments(Tables.load(s, dir, "documents")))
      dec.map { d =>
        val ints = d.tensor.map(v => Math.round(v * 255f).toLong)
        val posSum = ints.iterator.zipWithIndex.map {
          case (v, i) => v * i
        }.sum
        (d.media_id, d.shape.head, d.shape(1), d.sample_rate,
          ints.size.toLong, ints.sum, posSum)
      }.toDF("media_id", "n_frames", "fh", "fps", "n_vals", "val_sum", "pos_sum")
        .withColumn("n_frames", col("n_frames").cast(IntegerType))
        .withColumn("fh", col("fh").cast(IntegerType))
        .withColumn("fps", col("fps").cast(IntegerType))
        .orderBy(col("media_id"))
    },

    // -------------------------------------------------- video scene cuts
    // Inter-frame difference analysis over the DECODED video — the
    // frame-sampling companion (shot-boundary detection is how a video
    // curation pass picks representative frames): per adjacent frame
    // pair, the sum of absolute pixel differences (exact integers), and
    // `cut_after` = the frame boundary with the largest difference
    // (earliest wins ties) — the most likely scene boundary. The Spark
    // side walks the REAL AVI container (RIFF/strh/DIB — the
    // q_multimodal_video decoder); the oracle computes expected frame
    // bytes from the construction (frame f holds bytes
    // [L·f/4, L·(f+1)/4) zero-padded into a w·h·3 buffer).
    GraftQuery(
      "q_multimodal_scenecut",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, L,
        |    CAST(greatest(((L + 3) // 4 + 14) // 15, 1) AS BIGINT) AS h,
        |    [(strpos('0123456789ABCDEF', substring(hx, 2*t+1, 1))-1)*16
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*t+2, 1))-1)
        |     FOR t IN range(0, L)] AS bs
        |  FROM b),
        |d AS (
        |  SELECT doc_id, h,
        |    [CAST(coalesce(list_sum(
        |       [abs((CASE WHEN k < (L*(f+1))//4 - (L*f)//4
        |              THEN bs[(L*f)//4 + k + 1] ELSE 0 END)
        |           - (CASE WHEN k < (L*(f+2))//4 - (L*(f+1))//4
        |              THEN bs[(L*(f+1))//4 + k + 1] ELSE 0 END))
        |        FOR k IN range(0, h * 15)]), 0) AS BIGINT)
        |     FOR f IN range(0, 3)] AS diffs
        |  FROM v)
        |SELECT doc_id AS media_id,
        |  diffs[1] AS diff_01, diffs[2] AS diff_12, diffs[3] AS diff_23,
        |  CAST(CASE WHEN diffs[1] >= diffs[2] AND diffs[1] >= diffs[3] THEN 1
        |            WHEN diffs[2] >= diffs[3] THEN 2
        |            ELSE 3 END AS INTEGER) AS cut_after
        |FROM d ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dec = Multimodal.decode(
        Multimodal.videoFromDocuments(Tables.load(s, dir, "documents")))
      dec.map { d =>
        val ints = d.tensor.map(v => Math.round(v * 255f).toLong)
        val fsz = ints.size / 4 // 4 frames, h*15 values each
        val diffs = (0 until 3).map { f =>
          var acc = 0L
          var k = 0
          while (k < fsz) {
            acc += math.abs(ints(f * fsz + k) - ints((f + 1) * fsz + k))
            k += 1
          }
          acc
        }
        val cut =
          if (diffs(0) >= diffs(1) && diffs(0) >= diffs(2)) 1
          else if (diffs(1) >= diffs(2)) 2
          else 3
        (d.media_id, diffs(0), diffs(1), diffs(2), cut)
      }.toDF("media_id", "diff_01", "diff_12", "diff_23", "cut_after")
        .withColumn("cut_after", col("cut_after").cast(IntegerType))
        .orderBy(col("media_id"))
    },

    // ------------------------------------------------ pixel-plane resize
    // REAL 2× box downsample over the DECODED image — the brief's
    // "resize" at the pixel plane (Multimodal.resize is the
    // metadata-plane transform; this one averages actual decoded
    // pixels): output pixel (r, c, ch) = floor(mean of the 2×2 input
    // block), exact integer arithmetic (sum of 4 bytes // 4 — floor
    // division agrees across engines on non-negatives), odd edge
    // cropped as a box filter does. The oracle re-derives the expected
    // DECODED pixels from the construction (never parsing a container)
    // and the same block math; ds_pos_sum binds output layout — any
    // row/col/channel mix-up shifts values to different positions and
    // breaks the hash. Scale: decode + resize are partition-local over
    // the payload column; the output is 4 scalars per image.
    GraftQuery(
      "q_multimodal_resize",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents WHERE doc_id % 2 = 0),
        |v AS (
        |  SELECT doc_id, L,
        |    CAST(greatest((L + 14) // 15, 1) AS BIGINT) AS h,
        |    [(strpos('0123456789ABCDEF', substring(hx, 2*t+1, 1))-1)*16
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*t+2, 1))-1)
        |     FOR t IN range(0, L)] AS bs
        |  FROM b),
        |r AS (
        |  SELECT doc_id, h // 2 AS oh, CAST(2 AS BIGINT) AS ow,
        |    [((CASE WHEN (2*(k//6))*15   + 2*((k%6)//3)*3     + k%3 < L THEN bs[(2*(k//6))*15   + 2*((k%6)//3)*3     + k%3 + 1] ELSE 0 END)
        |     + (CASE WHEN (2*(k//6))*15   + (2*((k%6)//3)+1)*3 + k%3 < L THEN bs[(2*(k//6))*15   + (2*((k%6)//3)+1)*3 + k%3 + 1] ELSE 0 END)
        |     + (CASE WHEN (2*(k//6)+1)*15 + 2*((k%6)//3)*3     + k%3 < L THEN bs[(2*(k//6)+1)*15 + 2*((k%6)//3)*3     + k%3 + 1] ELSE 0 END)
        |     + (CASE WHEN (2*(k//6)+1)*15 + (2*((k%6)//3)+1)*3 + k%3 < L THEN bs[(2*(k//6)+1)*15 + (2*((k%6)//3)+1)*3 + k%3 + 1] ELSE 0 END)
        |     ) // 4
        |     FOR k IN range(0, (h // 2) * 6)] AS ds
        |  FROM v)
        |SELECT doc_id AS media_id,
        |  CAST(oh AS INTEGER) AS out_h, CAST(ow AS INTEGER) AS out_w,
        |  CAST(coalesce(list_sum(ds), 0) AS BIGINT) AS ds_sum,
        |  CAST(coalesce(list_sum([ds[k+1] * k
        |    FOR k IN range(0, oh * 6)]), 0) AS BIGINT) AS ds_pos_sum
        |FROM r ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // filter BEFORE decode: the kind is a MediaRecord field, so the
      // audio half's payloads never reach the (inflate-heavy) decoder
      val dec = Multimodal.decode(
        Multimodal.fromDocumentsEncoded(Tables.load(s, dir, "documents"))
          .filter(col("kind") === "image").as[Multimodal.MediaRecord])
      dec.map { d =>
        val ints = d.tensor.map(v => Math.round(v * 255f).toLong)
        val h = d.shape.head
        val (oh, ow) = (h / 2, 2)
        def px(row: Int, colc: Int, ch: Int): Long = {
          val i = row * 15 + colc * 3 + ch
          if (i < ints.size) ints(i) else 0L
        }
        var dsSum = 0L
        var dsPos = 0L
        var k = 0
        for (r <- 0 until oh; c <- 0 until ow; ch <- 0 until 3) {
          val v = (px(2 * r, 2 * c, ch) + px(2 * r, 2 * c + 1, ch) +
            px(2 * r + 1, 2 * c, ch) + px(2 * r + 1, 2 * c + 1, ch)) / 4
          dsSum += v; dsPos += v * k; k += 1
        }
        (d.media_id, oh, ow, dsSum, dsPos)
      }.toDF("media_id", "out_h", "out_w", "ds_sum", "ds_pos_sum")
        .withColumn("out_h", col("out_h").cast(IntegerType))
        .withColumn("out_w", col("out_w").cast(IntegerType))
        .orderBy(col("media_id"))
    },

    // ------------------------------------------------- audio features
    // Decoded-audio quality features — the audio-side heuristics a
    // media curation pass reads (silence/noise gating, clipping
    // detection): zero-crossing count (s_i·s_{i+1} < 0 — exact integer
    // product), total energy Σs² (BIGINT — 32768²·n is ~1e12 at these
    // lengths), and peak |s|. All integers end to end.
    GraftQuery(
      "q_multimodal_audio_stats",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents WHERE doc_id % 2 = 1),
        |v AS (
        |  SELECT doc_id, L // 2 AS n,
        |    [(strpos('0123456789ABCDEF', substring(hx, 2*t+1, 1))-1)*16
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*t+2, 1))-1)
        |     FOR t IN range(0, L)] AS bs
        |  FROM b),
        |w AS (
        |  SELECT doc_id, n,
        |    [CASE WHEN bs[2*t+1] + 256*bs[2*t+2] >= 32768
        |          THEN bs[2*t+1] + 256*bs[2*t+2] - 65536
        |          ELSE bs[2*t+1] + 256*bs[2*t+2] END
        |     FOR t IN range(0, n)] AS smp
        |  FROM v)
        |SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(coalesce(len([i FOR i IN range(0, n - 1)
        |    IF smp[i+1] * smp[i+2] < 0]), 0) AS BIGINT) AS zero_cross,
        |  CAST(coalesce(list_sum([smp[i+1] * smp[i+1]
        |    FOR i IN range(0, n)]), 0) AS BIGINT) AS energy,
        |  CAST(coalesce(list_max([abs(smp[i+1])
        |    FOR i IN range(0, n)]), 0) AS BIGINT) AS peak
        |FROM w ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // filter BEFORE decode — see q_multimodal_resize
      val dec = Multimodal.decode(
        Multimodal.fromDocumentsEncoded(Tables.load(s, dir, "documents"))
          .filter(col("kind") === "audio").as[Multimodal.MediaRecord])
      dec.map { d =>
        val smp = d.tensor.map(v => Math.round(v * 32768f).toLong)
        val zc = (0 until smp.size - 1)
          .count(i => smp(i) * smp(i + 1) < 0).toLong
        val energy = smp.iterator.map(v => v * v).sum
        val peak = if (smp.isEmpty) 0L else smp.iterator.map(math.abs).max
        (d.media_id, smp.size.toLong, zc, energy, peak)
      }.toDF("media_id", "n_samples", "zero_cross", "energy", "peak")
        .orderBy(col("media_id"))
    },

    // ----------------------------------------------- content fingerprint
    // Cross-container media dedup key — a 16-block integer average-hash
    // (aHash family) over the DECODED tensor: block t covers tensor
    // indices {i : ⌊i·16/n⌋ = t}, bit t set when the block mean ≥ the
    // global mean, compared by exact integer cross-multiplication
    // (s_t·n ≥ total·cnt_t — no division anywhere). Because the hash is
    // a function of decoded CONTENT, the same pixels in different
    // containers (BMP vs PNG share one pixel construction here)
    // fingerprint identically — the property a payload-byte hash
    // (q_multimodal_meta's sha) cannot give, and what makes this the
    // media-side member of the dedup family. The oracle re-derives the
    // expected decode from the construction (the q_multimodal_decoded
    // discipline: the DuckDB side never parses a container) and the
    // same block math relationally. dup_count/canonical_id come from
    // one window over (fmt, fp) — at scale the fingerprint is the
    // grouping key for a hash-groupBy media dedup, exactly like the
    // 64-hex key of q_dedup_exact.
    GraftQuery(
      "q_multimodal_fingerprint",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, L,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN CAST(greatest((L + 14) // 15, 1) * 15 AS BIGINT)
        |         ELSE CAST(L // 2 AS BIGINT) END AS nv,
        |    [(strpos('0123456789ABCDEF', substring(hx, 2*t+1, 1))-1)*16
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*t+2, 1))-1)
        |     FOR t IN range(0, L)] AS bs
        |  FROM b),
        |w AS (
        |  SELECT doc_id, nv,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN [CASE WHEN i < L THEN bs[i+1] ELSE 0 END
        |            FOR i IN range(0, nv)]
        |      ELSE [CASE WHEN bs[2*i+1] + 256*bs[2*i+2] >= 32768
        |            THEN bs[2*i+1] + 256*bs[2*i+2] - 65536
        |            ELSE bs[2*i+1] + 256*bs[2*i+2] END
        |            FOR i IN range(0, nv)] END AS vals
        |  FROM v),
        |ex AS (
        |  SELECT doc_id, nv, total, vals[i+1] AS val, (i * 16) // nv AS blk
        |  FROM (SELECT doc_id, nv, vals,
        |          CAST(coalesce(list_sum(vals), 0) AS BIGINT) AS total,
        |          unnest(range(0, nv)) AS i FROM w)),
        |blocks AS (
        |  SELECT doc_id, blk, max(nv) AS nv, max(total) AS total,
        |    CAST(sum(val) AS BIGINT) AS s, count(*) AS cnt
        |  FROM ex GROUP BY doc_id, blk),
        |fpt AS (
        |  SELECT doc_id,
        |    CAST(coalesce(sum(CASE WHEN s * nv >= total * cnt
        |      THEN (CAST(1 AS BIGINT) << blk) ELSE 0 END), 0) AS BIGINT) AS fp,
        |    max(nv) AS n_vals
        |  FROM blocks GROUP BY doc_id)
        |SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS fmt,
        |  n_vals, fp,
        |  CAST(count(*) OVER (PARTITION BY doc_id % 2, fp) AS BIGINT)
        |    AS dup_count,
        |  min(doc_id) OVER (PARTITION BY doc_id % 2, fp) AS canonical_id
        |FROM fpt ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dec = Multimodal.decode(
        Multimodal.fromDocumentsEncoded(Tables.load(s, dir, "documents")))
      val fps = dec.map { d =>
        val scale = if (d.kind == "image") 255f else 32768f
        val ints = d.tensor.map(v => Math.round(v * scale).toLong)
        val nv = ints.size
        val total = ints.sum
        val sums = new Array[Long](16)
        val cnts = new Array[Long](16)
        ints.iterator.zipWithIndex.foreach { case (v, i) =>
          val b = ((i.toLong * 16) / nv).toInt
          sums(b) += v; cnts(b) += 1
        }
        val fp = (0 until 16).foldLeft(0L) { (acc, t) =>
          if (cnts(t) > 0 && sums(t) * nv >= total * cnts(t))
            acc | (1L << t)
          else acc
        }
        (d.media_id, d.kind, nv.toLong, fp)
      }.toDF("media_id", "fmt", "n_vals", "fp")
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fmt"), col("fp"))
      fps.withColumn("dup_count", count(lit(1)).over(wf))
        .withColumn("canonical_id", min(col("media_id")).over(wf))
        .orderBy(col("media_id"))
    })
}
