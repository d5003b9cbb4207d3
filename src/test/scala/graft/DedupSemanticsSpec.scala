package graft

/** Semantic checks for the dedup catalog queries: the oracle proves
  * Spark and DuckDB agree; these prove the answer MEANS something —
  * the planted near-duplicates (doc_id + 10000) are actually found,
  * with high similarity scores, and exact dedup groups collapse the
  * planted exact copies.
  */
class DedupSemanticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("minhash LSH recalls planted near-dup pairs with high est_jaccard") {
    val pairs = run("q_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 10000 }
    // 20 planted copies (doc_id % 25) — LSH recall won't be perfect by
    // construction, but must find the clear majority, at high estimate
    assert(planted.length >= 15, s"found only ${planted.length} planted pairs")
    assert(planted.forall(_._3 >= 0.5),
      s"low estimates: ${planted.filter(_._3 < 0.5).mkString(",")}")
  }

  test("jaccard verification scores planted pairs near 1") {
    val pairs = run("q_dedup_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 10000 }
    assert(planted.length >= 15)
    assert(planted.forall(_._3 >= 0.8),
      s"low jaccard: ${planted.filter(_._3 < 0.8).mkString(",")}")
  }

  test("simhash blocking recalls planted pairs at small hamming") {
    val pairs = run("q_dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    val planted = pairs.filter { case (a, b, _) => b == a + 10000 }
    assert(planted.length >= 12, s"found only ${planted.length}")
    assert(planted.forall(_._3 <= 6))
  }

  test("64-bit simhash pair blocking recalls planted pairs") {
    // 8 disjoint blocks over the 60 significant bits: hamming <= 6
    // leaves at least two clean blocks, so the 28 block-pair keys
    // guarantee complete recall to radius 6
    val pairs = run("q_dedup_simhash64").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    val planted = pairs.filter { case (a, b, _) => b == a + 10000 }
    assert(planted.length >= 12, s"found only ${planted.length}")
    assert(planted.forall(_._3 <= 6))
  }

  test("64-bit pair blocking == brute-force all-pairs at hamming <= 6 (exact)") {
    // the complete-recall proof against semantic ground truth, not just
    // planted pairs: recompute every doc's sketch through the same
    // public pipeline the query uses, brute-force ALL pairs in-memory,
    // and demand set equality with the blocked join's output
    import org.apache.spark.sql.functions._
    import graft.functions.SimilarityFunctions.{elementHash60, simhash64FromHashes}
    import graft.functions.TextFunctions.{shinglesFromTokens, tokens}
    val sketches = graft.analytics.DedupQueries
      .nearDupCorpus(graft.core.Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"),
        simhash64FromHashes(transform(
          array_distinct(shinglesFromTokens(col("ts"), 3)),
          elementHash60(_))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (a, sa) <- sketches.iterator
      (b, sb) <- sketches.iterator
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (a, b)).toSet
    val blocked = run("q_dedup_simhash64").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == truth,
      s"missed ${(truth -- blocked).size}, spurious ${(blocked -- truth).size}")
    assert(truth.nonEmpty, "vacuous: no pairs at hamming <= 6 at all")
  }

  test("embed banded blocking recalls planted near-dup vectors vs the exact all-pairs oracle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.SimilarityFunctions.{dot, l2Norm}
    // plant near-dup copies (vec_id + 10000, small deterministic
    // per-coordinate perturbation → cosine ≈ 0.997)
    val base = graft.core.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val planted = base.filter(_._1 % 10 == 0).map { case (id, v) =>
      (id + 10000, v.zipWithIndex.map { case (x, j) =>
        x + ((id + j) % 3 - 1) * 0.01f })
    }
    val corpus = spark.createDataset(base.toSeq ++ planted.toSeq)
      .toDF("vec_id", "embedding")
    // recall oracle: the exact all-pairs form this operator replaced
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      l2Norm(col("embedding")).as("na"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      l2Norm(col("embedding")).as("nb"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.95)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.analytics.DedupQueries.embedNearDupPairs(corpus, 0.95)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && exact.size >= planted.length,
      s"oracle found only ${exact.size} pairs for ${planted.length} planted")
    assert(blocked.subsetOf(exact)) // verify stage: no false positives
    val recall = blocked.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"banded blocking recall $recall (${blocked.size}/${exact.size})")
  }

  test("substring-span dedup recalls every planted partial copy exactly") {
    import org.apache.spark.sql.functions._
    // token count per base doc — the planted slice lengths clamp to it
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("q_dedup_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    // single-span copies (d+10000): tokens 4..23 of d behind 6-token
    // markers → expected maximal span (start_a=4, start_b=7, len=L)
    val singles = nTok.keys.filter(_ % 20 == 0).flatMap { d =>
      val L = math.min(20, math.max(0, nTok(d) - 3))
      if (L >= 8) Some((d, d + 10000L, 4L, 7L, L.toLong)) else None
    }.toSet
    assert(singles.nonEmpty)
    val missedS = singles.diff(rows)
    assert(missedS.isEmpty, s"missed single spans: $missedS")

    // two-span copies (d+20000): slices 4..11 and 20..35; the second
    // starts at position 13+L1 in the copy, after the middle markers
    val twos = nTok.keys.filter(_ % 100 == 0).flatMap { d =>
      val n = nTok(d)
      val l1 = math.min(8, math.max(0, n - 3))
      val l2 = if (n >= 20) math.min(16, n - 19) else 0
      val first = if (l1 == 8)
        Seq((d, d + 20000L, 4L, 7L, 8L),
          // copy-vs-copy: the +10000 and +20000 copies of the same
          // original share exactly the first 8 copied tokens
          (d + 10000L, d + 20000L, 7L, 7L, 8L))
      else Seq.empty
      val second = if (l2 >= 8)
        Seq((d, d + 20000L, 20L, 13L + l1, l2.toLong)) else Seq.empty
      first ++ second
    }.toSet
    assert(twos.nonEmpty)
    val missedT = twos.diff(rows)
    assert(missedT.isEmpty, s"missed two-span rows: $missedT")

    // no span may ever touch a marker run: planted-pair spans stay
    // inside the copied slice (len <= 20), and every pair is ordered
    assert(rows.forall { case (a, b, _, _, len) =>
      a < b && (b < 10000 || len <= 20)
    })
  }

  test("df-capped spans drop boilerplate-only pairs, keep true copies") {
    import org.apache.spark.sql.functions._
    val basePairs = run("q_dedup_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dfRows = run("q_dedup_spans_df").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val dfPairs = dfRows.map(t => (t._1, t._2)).toSet

    // the 50-doc footer family. Pure-footer windows have df = 50 and
    // are capped; BOUNDARY windows (shared doc tail + footer prefix)
    // are doc-group-specific (small df) and legitimately bridge pairs
    // whose common suffix alone is shorter than k — a real df-capped
    // dedup emits exactly those. So the pairs that must vanish are
    // the ones with ZERO common token suffix: for them every shared
    // window lies fully inside the footer.
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val bp = toks.keys.toSeq.sorted
    def sharedSuffix(a: Long, b: Long): Int =
      toks(a).reverse.zip(toks(b).reverse).takeWhile { case (x, y) => x == y }.size
    val footerOnly = for {
      a <- bp; b <- bp
      if a < b && !basePairs((a, b)) && sharedSuffix(a, b) == 0
    } yield (a, b)
    assert(footerOnly.length > 1000, s"expected ~1200, got ${footerOnly.length}")
    val leaked = footerOnly.filter(dfPairs)
    assert(leaked.isEmpty, s"boilerplate-only pairs survived the cap: " +
      s"${leaked.take(5).mkString(",")} (${leaked.length} total)")
    // and every surviving footer-family pair NOT in the footer-less
    // output is a tail-bridge: nonzero shared suffix, pinned so the
    // boundary-window semantics cannot silently drift
    val bridges = dfPairs.filter { case (a, b) =>
      a % 10 == 7 && b % 10 == 7 && a < 10000 && b < 10000 &&
        !basePairs((a, b))
    }
    assert(bridges.forall { case (a, b) => sharedSuffix(a, b) >= 1 })

    // true planted copies survive the cap exactly (their fingerprints
    // have df <= 3; the footer never touches even-id originals/copies)
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val singles = nTok.keys.filter(_ % 20 == 0).flatMap { d =>
      val L = math.min(20, math.max(0, nTok(d) - 3))
      if (L >= 8) Some((d, d + 10000L, 4L, 7L, L.toLong)) else None
    }.toSet
    val missed = singles.diff(dfRows.toSet)
    assert(missed.isEmpty, s"cap dropped true copy spans: $missed")
  }

  test("span removal deletes exactly the copied slices from higher-id docs") {
    import org.apache.spark.sql.functions._
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("q_dedup_spans_removal").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

    // every corpus doc is emitted
    assert(rows.size == nTok.size + nTok.keys.count(_ % 20 == 0) +
      nTok.keys.count(_ % 100 == 0))

    // single-span copies: the copied slice is removed IN FULL and the
    // rewritten text is exactly the twelve marker tokens — any span in
    // the copy lies inside the slice, and the (d, d+10000) span covers
    // all of it
    val singles = nTok.keys.filter(_ % 20 == 0)
    assert(singles.nonEmpty)
    singles.foreach { d =>
      val l = math.min(20, math.max(0, nTok(d) - 3))
      val id = d + 10000L
      val (removed, clean) = rows(id)
      if (l >= 8) {
        assert(removed == l, s"copy $id: removed $removed, slice was $l")
        val markers =
          (Seq.fill(6)(s"z$id") ++ Seq.fill(6)(s"y$id")).mkString(" ")
        assert(clean == markers, s"copy $id rewrote to: $clean")
      } else assert(removed == 0, s"sub-k slice of $id was removed")
    }

    // a doc that never appears as the higher-id side keeps its exact
    // (lowercased, whitespace-normalized) text
    val bSide = run("q_dedup_spans").collect().map(_.getLong(1)).toSet
    val untouched = nTok.keys.filter(d => !bSide(d))
    assert(untouched.nonEmpty)
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", split(trim(lower(col("text"))), "\\s+")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    untouched.take(50).foreach { d =>
      val (removed, clean) = rows(d)
      assert(removed == 0 && clean == orig(d), s"doc $d altered: $clean")
    }
  }

  test("span removal handles a 100k-token document without doc-sized agg state") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // round-9 verdict #6: the old reassembly collected every (pos, tok)
    // of a doc into ONE aggregation row — O(doc tokens) buffer. The
    // interval formulation bounds agg state by span count; this drives
    // a 120k-token doc with scattered removal intervals through
    // removeSpans and checks the rewrite against a Scala oracle.
    val n = 120000
    val toks = (1 to n).map(i => s"t$i")
    val corpus = Seq((1L, toks.mkString(" ")), (2L, "a b c")).toDF("doc_id", "text")
    // removal intervals on doc 1: [101,109), [105,120) (overlapping),
    // [50000,50008), the tail [119993,120001); doc 2 untouched
    val spans = Seq(
      (0L, 1L, 1L, 101L, 8L), (0L, 1L, 1L, 105L, 15L),
      (0L, 1L, 1L, 50000L, 8L), (0L, 1L, 1L, 119993L, 8L))
      .toDF("doc_a", "doc_b", "start_a", "start_b", "span_len")
    val out = graft.analytics.DedupQueries.removeSpans(corpus, spans)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val covered = (101 until 120).toSet ++ (50000 until 50008) ++
      (119993 until 120001)
    val expectKept = (1 to n).filterNot(covered).map(i => s"t$i")
    assert(out(1L)._1 == covered.size.toLong)
    assert(out(1L)._2 == expectKept.mkString(" "))
    assert(out(2L) == ((0L, "a b c")))
  }

  test("exact dedup collapses every planted exact copy") {
    val groups = run("q_dedup_exact").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 50 planted copies (doc_id % 10): exactly those fingerprints have
    // n_copies = 2, everything else is unique
    val dups = groups.filter(_._2 == 2)
    assert(dups.length == 50)
    assert(dups.forall(_._3 % 10 == 0)) // first_doc is the original
    assert(groups.forall(_._2 <= 2))
  }
}
