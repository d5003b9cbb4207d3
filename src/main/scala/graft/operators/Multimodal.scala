package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` payloads with typed metadata; decode,
  * feature-extraction, resize and frame-sampling run as partition-local
  * Dataset transforms.
  *
  * The decode step is a clearly marked STUB — this container ships no
  * image/audio codecs — producing a deterministic fake from the payload
  * bytes. Everything AROUND the stub is the real engineering: the
  * schema, the typed Dataset API, the mapPartitions batch shape (decoder
  * state initialized once per partition, streamed row-by-row — exactly
  * how a JNI/FFI codec handle would be scoped), and the partitioning
  * story (payloads hash-partition by media_id; feature vectors are
  * fixed-length `Array[Float]` ready for the ANN operators in
  * [[graft.functions.SimilarityFunctions]]).
  *
  * Scale: payload bytes never shuffle — decode/featurize are narrow;
  * only the small (media_id, features, meta) projection flows into
  * joins/aggregations downstream.
  */
object Multimodal {

  /** Opaque media payload + typed metadata (the lakehouse-standard
    * binary-column layout).
    */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      meta: MediaMeta)

  final case class MediaMeta(
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  /** Decoded representation: a float tensor flattened row-major +
    * its shape (what a real image decode would produce).
    */
  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      shape: Seq[Int],
      tensor: Seq[Float])

  /** `hist` carries the raw integer bin counts (exact, engine-portable —
    * this is what the DuckDB oracle reproduces); `features` is the
    * normalized float32 view the ANN operators consume.
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      hist: Seq[Int],
      features: Seq[Float])

  val FeatureDim = 16

  /** STUB decoder — ??? in spirit: a real implementation would hand
    * `payload` to an image/audio codec. The deterministic fake maps each
    * payload byte to a float in [0,1) so downstream shapes are honest:
    * images decode to (height, width) tensors, audio to (n_samples,).
    */
  private def decodeStub(r: MediaRecord): DecodedMedia = {
    val floats = r.payload.map(b => ((b & 0xff).toFloat) / 256f).toSeq
    val shape = r.kind match {
      case "image" =>
        val w = math.max(r.meta.width, 1)
        Seq(math.max(floats.size / w, 1), w)
      case _ => Seq(floats.size)
    }
    DecodedMedia(r.media_id, r.kind, shape, floats)
  }

  /** Decode a media Dataset. Partition-local: the (stub) codec is
    * instantiated once per partition and streamed — the batch shape a
    * real FFI decoder needs.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec handle would be created HERE, once per partition
      it.map(decodeStub)
    }
  }

  /** Fixed-length feature extraction straight from payloads (decode
    * fused in — one pass, no tensor materialization): a 16-bin byte
    * histogram normalized to sum 1. Deterministic, codec-free, and the
    * output feeds the cosine/ANN operators unchanged.
    */
  def features(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val hist = new Array[Int](FeatureDim)
        r.payload.foreach(b => hist((b & 0xff) / FeatureDim) += 1)
        val n = math.max(r.payload.length, 1)
        MediaFeatures(r.media_id, r.kind, r.payload.length, hist.toSeq,
          hist.map(_.toFloat / n).toSeq)
      }
    }
  }

  /** Frame sampling: split a (fake) video payload into `n` evenly
    * spaced frame slices — the schema/partitioning shape of real frame
    * extraction (output is `array<binary>`, one element per frame).
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val frames = if (r.payload.isEmpty) Seq.empty[Array[Byte]]
      else (0 until n).map { i =>
        val start = (r.payload.length.toLong * i / n).toInt
        val end = (r.payload.length.toLong * (i + 1) / n).toInt
        java.util.Arrays.copyOfRange(r.payload, start, math.max(end, start))
      }
      (r.media_id, r.kind, frames)
    }.toDF("media_id", "kind", "frames")
  }

  /** "Resize" = metadata-plane transform (a real one would re-encode the
    * payload; the stub scales meta and keeps bytes — schema-honest).
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Synthesize a media table from the documents corpus: payload =
    * UTF-8 bytes of the text (deterministic, reproducible in the DuckDB
    * oracle via encode()). kind cycles by doc_id.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        col("text").cast(BinaryType).as("payload"),
        struct(
          lit(32).as("width"), lit(32).as("height"),
          lit(16000).as("sample_rate"), lit(8).as("n_frames")).as("meta"))
      .as[MediaRecord]
  }
}
