package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.SimilarityFunctions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data curation: exact
  * (fingerprint hash-groupBy), MinHash+LSH, SimHash with byte blocking,
  * and n-gram Jaccard. The synthetic corpus has no planted duplicates,
  * so each query UNIONs `documents` with deterministically perturbed
  * copies (id + 10000) — the oracle SQL plants the identical copies, so
  * the dup-detection result is fully hash-checked.
  *
  * Scale design (100 TB): signatures are per-row scan-stage expressions
  * (no explode of shingle×seed); the only shuffles are (a) the groupBy /
  * self-join on SMALL keys (fingerprint, band signature, simhash byte)
  * and (b) final ordering. All-pairs comparison never happens — LSH
  * bands and simhash-byte pigeonhole blocking bound candidate sets.
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** MinHash params: k=16 hashes in 4 bands × 4 rows. */
  private val K = 16
  private val Bands = 4
  private val RowsPerBand = 4

  // -------------------------------------------------------- corpora
  // Exact-dup corpus: every 10th doc re-appears (id+10000) uppercased
  // and whitespace-padded — invisible to the normalizing fingerprint.
  private def exactDupCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(
        docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(lit(" "), upper(col("text")), lit("  ")).as("text")))

  private val exactDupCorpusSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 10000 AS doc_id, ' ' || upper(text) || '  ' AS text
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  // Near-dup corpus: every 25th doc re-appears (id+10000) with its last
  // two tokens dropped — high-Jaccard but not identical.
  private def nearDupCorpus(docs: DataFrame): DataFrame = {
    val ts = tokens(lower(col("text")))
    docs.select(col("doc_id"), lower(col("text")).as("text"))
      .unionByName(
        docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat_ws(" ", slice(ts, lit(1), greatest(size(ts) - 2, lit(1))))
              .as("text")))
  }

  private val nearDupCorpusSql =
    """SELECT doc_id, lower(text) AS text FROM documents
      |UNION ALL
      |SELECT doc_id + 10000 AS doc_id,
      |  array_to_string(ts[1:greatest(len(ts) - 2, 1)], ' ') AS text
      |FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ts
      |      FROM documents WHERE doc_id % 25 = 0)""".stripMargin

  /** Distinct 3-gram shingle set of lowercase text (both engines). */
  private def shingleSet(text: Column): Column =
    array_distinct(shingles(lower(text), 3))

  private val shingleSetSql =
    """list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |               FOR i IN range(1, greatest(len(ts) - 1, 1))])""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // ---------------------------------------------------------- exact
    // Exact dedup: group by normalizing fingerprint (lower + whitespace
    // collapse + SHA-256). At scale: one hash-partitioned groupBy on a
    // 64-char key with map-side partial aggregation.
    GraftQuery(
      "q_dedup_exact",
      s"""WITH c AS ($exactDupCorpusSql)
         |SELECT sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         |  count(*) AS n_copies, min(doc_id) AS first_doc
         |FROM c GROUP BY fp ORDER BY fp""".stripMargin) { (s, dir) =>
      exactDupCorpus(t(s, dir, "documents"))
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("fp"))
    },

    // -------------------------------------------------------- MinHash
    // MinHash+LSH near-dup candidates: per-row 16-hash signature (one
    // scan-stage expression), explode only the 4 band keys, self-join on
    // (band, band-signature) — candidates ≪ all-pairs. est_jaccard =
    // agreeing signature positions / 16.
    GraftQuery(
      "q_dedup_minhash",
      s"""WITH c AS ($nearDupCorpusSql),
         |sh AS (SELECT doc_id, $shingleSetSql AS shs
         |       FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM c)
         |       WHERE len(ts) >= 3),
         |sig AS (SELECT doc_id,
         |          [list_min([sha256(i::VARCHAR || '|' || s) FOR s IN shs])
         |           FOR i IN range(0, $K)] AS sg
         |        FROM sh),
         |band AS (SELECT doc_id, sg, b,
         |           sg[$RowsPerBand*b+1] || '|' || sg[$RowsPerBand*b+2] || '|' ||
         |           sg[$RowsPerBand*b+3] || '|' || sg[$RowsPerBand*b+4] AS bsig
         |         FROM sig, (SELECT unnest(range(0, $Bands)) AS b)),
         |pair AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                a.sg AS sga, b.sg AS sgb
         |         FROM band a JOIN band b
         |           ON a.b = b.b AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(CAST(list_sum([CASE WHEN sga[i] = sgb[i] THEN 1 ELSE 0 END
         |                       FOR i IN range(1, ${K + 1})]) AS DOUBLE) / $K.0, 4)
         |    AS est_jaccard
         |FROM pair ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val sh = nearDupCorpus(t(s, dir, "documents"))
        .filter(size(tokens(col("text"))) >= 3)
        .select(col("doc_id"), shingleSet(col("text")).as("shs"))
      val sig = sh.select(col("doc_id"),
        minhashSignature(col("shs"), K).as("sg"))
      val bands = sig.select(col("doc_id"), col("sg"),
          explode(sequence(lit(0), lit(Bands - 1))).as("b"))
        .withColumn("bsig", bandSignature(col("sg"), col("b"), RowsPerBand))
      val a = bands.select(col("b"), col("bsig"),
        col("doc_id").as("doc_a"), col("sg").as("sga"))
      val b = bands.select(col("b").as("b2"), col("bsig").as("bsig2"),
        col("doc_id").as("doc_b"), col("sg").as("sgb"))
      a.join(b, col("b") === col("b2") && col("bsig") === col("bsig2") &&
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sga"), col("sgb"))
        .distinct()
        .select(col("doc_a"), col("doc_b"),
          round(minhashEstJaccard(col("sga"), col("sgb"), K), 4)
            .as("est_jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // -------------------------------------------------------- SimHash
    // SimHash near-dup: 32-bit signature per doc; byte blocking
    // (pigeonhole: Hamming ≤ 3 ⇒ one of the 4 bytes agrees) replaces
    // all-pairs with 4 small equi-joins; survivors filtered on exact
    // Hamming ≤ 6 via xor+bit_count.
    GraftQuery(
      "q_dedup_simhash",
      s"""WITH c AS ($nearDupCorpusSql),
         |tok AS (SELECT doc_id, list_distinct(regexp_extract_all(text, '\\S+')) AS ts FROM c),
         |h AS (SELECT doc_id, [substring(sha256(x), 1, 8) FOR x IN ts] AS hs FROM tok),
         |b AS (SELECT doc_id,
         |        [CASE WHEN list_sum([
         |            (((strpos('0123456789abcdef', substring(x, (j // 4) + 1, 1)) - 1)
         |              // CAST(2 ** (3 - (j % 4)) AS INTEGER)) % 2) * 2 - 1
         |            FOR x IN hs]) > 0 THEN 1::BIGINT ELSE 0::BIGINT END
         |         FOR j IN range(0, 32)] AS bits
         |      FROM h),
         |sim AS (SELECT doc_id,
         |          CAST(list_reduce(bits, (acc, v) -> acc * 2 + v) AS BIGINT) AS sh
         |        FROM b),
         |blk AS (SELECT doc_id, sh, k, CAST((sh >> (8 * k)) % 256 AS BIGINT) AS byte
         |        FROM sim, (SELECT unnest(range(0, 4)) AS k)),
         |pair AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                a.sh AS sha, b.sh AS shb
         |         FROM blk a JOIN blk b
         |           ON a.k = b.k AND a.byte = b.byte AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, sha AS simhash_a, shb AS simhash_b,
         |  CAST(bit_count(xor(sha, shb)) AS INTEGER) AS hamming
         |FROM pair WHERE bit_count(xor(sha, shb)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val sim = nearDupCorpus(t(s, dir, "documents"))
        .select(col("doc_id"), simhash32(col("text")).as("sh"))
      val blocks = sim.select(col("doc_id"), col("sh"),
          explode(array((0 until 4).map { k =>
            struct(lit(k).as("k"), simhashByte(col("sh"), k).as("byte"))
          }: _*)).as("blk"))
        .select(col("doc_id"), col("sh"),
          col("blk.k").as("k"), col("blk.byte").as("byte"))
      val a = blocks.select(col("k"), col("byte"),
        col("doc_id").as("doc_a"), col("sh").as("sha"))
      val b = blocks.select(col("k").as("k2"), col("byte").as("byte2"),
        col("doc_id").as("doc_b"), col("sh").as("shb"))
      a.join(b, col("k") === col("k2") && col("byte") === col("byte2") &&
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sha"), col("shb"))
        .distinct()
        .filter(hamming(col("sha"), col("shb")) <= 6)
        .select(col("doc_a"), col("doc_b"),
          col("sha").as("simhash_a"), col("shb").as("simhash_b"),
          hamming(col("sha"), col("shb")).cast(IntegerType).as("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // -------------------------------------------------------- Jaccard
    // Exact n-gram Jaccard within a blocking key (here: shared MinHash
    // band from the same 16-hash signature — the verification stage of
    // the standard LSH-then-verify dedup pipeline). Output: candidate
    // pairs with true Jaccard ≥ 0.5.
    GraftQuery(
      "q_dedup_jaccard",
      s"""WITH c AS ($nearDupCorpusSql),
         |sh AS (SELECT doc_id, $shingleSetSql AS shs
         |       FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM c)
         |       WHERE len(ts) >= 3),
         |sig AS (SELECT doc_id, shs,
         |          [list_min([sha256(i::VARCHAR || '|' || s) FOR s IN shs])
         |           FOR i IN range(0, $K)] AS sg
         |        FROM sh),
         |band AS (SELECT doc_id, shs, b,
         |           sg[$RowsPerBand*b+1] || '|' || sg[$RowsPerBand*b+2] || '|' ||
         |           sg[$RowsPerBand*b+3] || '|' || sg[$RowsPerBand*b+4] AS bsig
         |         FROM sig, (SELECT unnest(range(0, $Bands)) AS b)),
         |pair AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                a.shs AS sa, b.shs AS sb
         |         FROM band a JOIN band b
         |           ON a.b = b.b AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |j AS (SELECT doc_a, doc_b,
         |        CAST(len(list_intersect(sa, sb)) AS DOUBLE)
         |          / (len(sa) + len(sb) - len(list_intersect(sa, sb))) AS jac
         |      FROM pair)
         |SELECT doc_a, doc_b, round(jac, 4) AS jaccard
         |FROM j WHERE jac >= 0.5 ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val sh = nearDupCorpus(t(s, dir, "documents"))
        .filter(size(tokens(col("text"))) >= 3)
        .select(col("doc_id"), shingleSet(col("text")).as("shs"))
      val sig = sh.select(col("doc_id"), col("shs"),
        minhashSignature(col("shs"), K).as("sg"))
      val bands = sig.select(col("doc_id"), col("shs"), col("sg"),
          explode(sequence(lit(0), lit(Bands - 1))).as("b"))
        .withColumn("bsig", bandSignature(col("sg"), col("b"), RowsPerBand))
      val a = bands.select(col("b"), col("bsig"),
        col("doc_id").as("doc_a"), col("shs").as("sa"))
      val b = bands.select(col("b").as("b2"), col("bsig").as("bsig2"),
        col("doc_id").as("doc_b"), col("shs").as("sb"))
      a.join(b, col("b") === col("b2") && col("bsig") === col("bsig2") &&
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
        .distinct()
        .withColumn("jac", jaccard(col("sa"), col("sb")))
        .filter(col("jac") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---------------------------------------------- embedding near-dup
    // Cosine near-dup over the embedding column. sf corpora are small
    // enough for the exact pairwise form; the 100 TB path is
    // q_ann_lsh's sign-bucket blocking (same cosine kernel).
    GraftQuery(
      "q_dedup_embed",
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_reduce([v[i] * v[i] FOR i IN range(1, 65)],
        |                         (a, b) -> a + b)) AS nrm
        |      FROM e),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        list_reduce([a.v[i] * b.v[i] FOR i IN range(1, 65)],
        |                    (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
        |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cos, 4) AS cosine
        |FROM p WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos", cosine(col("va"), col("vb")))
        .filter(col("cos") >= 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    })
}
