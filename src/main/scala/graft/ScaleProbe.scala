package graft
import org.apache.spark.sql.functions._
import graft.functions.SimilarityFunctions._
import graft.functions.TextFunctions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("scale", 32)
    spark.range(1).count()
    for ((path, label) <- Seq(
        ("/root/testdata/sf0.1/documents.parquet", "5k"),
        ("/tmp/scale_docs_50k.parquet", "50k"),
        ("/tmp/scale_docs_500k.parquet", "500k"))) {
      val docs = spark.read.parquet(path).select(col("doc_id"), lower(col("text")).as("text"))
      // minhash LSH candidate pipeline (no planted dups; raw corpus)
      def lsh() = {
        val tok = docs.select(col("doc_id"), tokens(col("text")).as("ts")).filter(size(col("ts")) >= 3)
        val sh = tok.select(col("doc_id"), array_distinct(shinglesFromTokens(col("ts"), 3)).as("shs"))
        val hv = sh.select(col("doc_id"), transform(col("shs"), elementHash(_)).as("hv"))
        val sig = hv.select(col("doc_id"), minhashSignatureFromHashes(col("hv"), 16).as("sg")).repartition(col("doc_id"))
        val bands = sig.select(col("doc_id"), col("sg"), explode(sequence(lit(0), lit(3))).as("b"))
          .withColumn("bsig", bandSignature(col("sg"), col("b"), 4))
        val a = bands.select(col("b"), col("bsig"), col("doc_id").as("da"))
        val c = bands.select(col("b").as("b2"), col("bsig").as("bsig2"), col("doc_id").as("db"))
        a.join(c, col("b") === col("b2") && col("bsig") === col("bsig2") && col("da") < col("db"))
          .select("da", "db").distinct().count()
      }
      def sim() = {
        val tok = docs.select(col("doc_id"), tokens(col("text")).as("ts")).filter(size(col("ts")) >= 3)
        val sh = tok.select(col("doc_id"), array_distinct(shinglesFromTokens(col("ts"), 3)).as("shs"))
        val hv = sh.select(col("doc_id"), transform(col("shs"), elementHash32(_)).as("hv"))
        hv.select(col("doc_id"), simhash32FromHashes(col("hv")).as("sh")).agg(countDistinct(col("sh"))).collect()(0).getLong(0)
      }
      var t0 = System.nanoTime(); val cands = lsh(); val tLsh = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime(); val nsim = sim(); val tSim = (System.nanoTime()-t0)/1e9
      println(f"SCALE $label lsh_candidates=$cands lsh_s=$tLsh%.1f simhash_distinct=$nsim simhash_s=$tSim%.1f")
    }

    // Embedding banded-blocking sweep: candidate volume + wall across
    // corpus sizes and (bands, bits) configs — the SCALING.md evidence
    // that `bits` is the knob that keeps dense sign-LSH subcritical as n
    // grows. Corpora are synthesized once to /tmp (murmur-hash uniform
    // floats — NOT sin(phase+j), which puts every vector in a 2-D
    // subspace and collapses the buckets; generation is not timed). The
    // probe counts DISTINCT candidate id-pairs only (the verify stage's
    // vector fetch is the operator's job, measured by Bench).
    import org.apache.spark.sql.types.FloatType
    def embCands(e: org.apache.spark.sql.DataFrame, bands: Int, bits: Int): Long = {
      val banded = e.select(col("vec_id"),
        posexplode(denseSignBuckets(col("embedding"), bands, bits, 64))
          .as(Seq("band", "bucket")))
      val a = banded.select(col("band"), col("bucket"), col("vec_id").as("ia"))
      val c = banded.select(col("band").as("b2"), col("bucket").as("k2"),
        col("vec_id").as("ib"))
      a.join(c, col("band") === col("b2") && col("bucket") === col("k2") &&
          col("ia") < col("ib"))
        .select("ia", "ib").distinct().count()
    }
    for ((n, label) <- Seq(10000 -> "10k", 100000 -> "100k", 1000000 -> "1M")) {
      val path = s"/tmp/scale_embed_$label.parquet"
      if (!new java.io.File(path).exists) {
        spark.range(n).select(col("id").as("vec_id"),
            transform(sequence(lit(1), lit(64)),
              j => (hash(col("id"), j) / lit(2.147483648e9)).cast(FloatType))
              .as("embedding"))
          .write.mode("overwrite").parquet(path)
      }
      val e = spark.read.parquet(path)
      val configs =
        if (n >= 1000000) Seq((8, 16), (8, 24)) // 4×8 at 1M is the n²/2^bits wall
        else Seq((4, 8), (8, 16), (8, 24))
      for ((bands, bits) <- configs) {
        val t1 = System.nanoTime()
        val c = embCands(e, bands, bits)
        val w = (System.nanoTime() - t1) / 1e9
        val allPairs = n.toLong * (n - 1) / 2
        println(f"SCALE-EMBED $label bands=$bands bits=$bits candidates=$c " +
          f"(${c.toDouble / allPairs}%.2e of $allPairs%d all-pairs) wall=$w%.1f")
      }
    }
    // Bloom prefilter sweep: membership FP rate + probe wall at corpus
    // scale. Geometry must track n (m ≈ 16n keeps kn/m ≈ 1/4): the probe
    // is scan-stage either way; what the sweep shows is that the FP rate
    // follows the analytic (1-e^(-kn/m))^k, so sizing the broadcast
    // bitset is arithmetic, not tuning.
    {
      import graft.operators.{BloomBuild, BloomFilter, BloomHashes}
      import spark.implicits._
      val (bh1, bh2) = BloomFilter.hashColumns(col("fp"))
      def hashed(ids: org.apache.spark.sql.DataFrame) = ids
        .withColumn("fp", sha2(concat(lit("m"), col("id").cast("string")), 256))
        .withColumn("h1", bh1).withColumn("h2", bh2)
      for ((n, mBits, probesN) <- Seq(
          (100000, 1 << 20, 1000000), (1000000, 1 << 24, 10000000))) {
        val bloom = new BloomBuild(mBits, BloomFilter.DefaultProbes)
        val bloomRow = hashed(spark.range(n).toDF("id"))
          .select(col("h1"), col("h2")).as[BloomHashes]
          .select(bloom.toColumn).toDF("bloom")
        // non-members: disjoint id space (offset by 2^40)
        val others = hashed(spark.range(probesN).select(
          (col("id") + (1L << 40)).as("id")))
        val t0 = System.nanoTime()
        val fp = others.join(broadcast(bloomRow))
          .filter(BloomFilter.mightContain(col("bloom"), col("h1"), col("h2"), mBits))
          .count()
        val w = (System.nanoTime() - t0) / 1e9
        val kn = 4.0 * n / mBits
        val analytic = math.pow(1 - math.exp(-kn), 4)
        println(f"SCALE-BLOOM n=$n m=$mBits probes=$probesN fp=$fp " +
          f"(rate=${fp.toDouble / probesN}%.2e analytic=$analytic%.2e) wall=$w%.1f")
      }
    }

    // PQ encode + ADC scoring at corpus scale: encoding is now a
    // scan-stage codegen kernel against the compiled codebook
    // (graft.expressions.PqEncode — the round-3 explode+groupBy form
    // shuffled 128 rows per corpus vector to compute the same argmins);
    // scoring is 8 array probes per (query, vector). Both are linear
    // in corpus size — the probe measures wall at 100k and 1M vectors.
    {
      import graft.expressions.PqExpressions
      for (label <- Seq("100k", "1M")) {
        val e = spark.read.parquet(s"/tmp/scale_embed_$label.parquet")
        val cb = graft.operators.CodebookTrainer.initCodebook(e, 16, normalize = false)
        var t0 = System.nanoTime()
        val codes = e.select(col("vec_id").as("n_id"),
          PqExpressions.pqEncode(col("embedding"), cb, 8, 8).as("cl"))
        codes.cache().count()
        val wEnc = (System.nanoTime() - t0) / 1e9
        val qdt = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"),
            PqExpressions.pqSubDists(col("embedding"), cb, 8, 8).as("dl"))
        t0 = System.nanoTime()
        val scored = codes.join(broadcast(qdt), col("n_id") =!= col("q_id"))
          .select(col("q_id"), col("n_id"),
            PqExpressions.adcScore(col("cl"), col("dl"), 8).as("ad2"))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
              .orderBy(col("ad2"), col("n_id"))))
          .filter(col("r") <= 8).count()
        val wAdc = (System.nanoTime() - t0) / 1e9
        codes.unpersist()
        println(f"SCALE-PQ corpus=$label encode_s=$wEnc%.1f " +
          f"adc_top8_s=$wAdc%.1f candidates=$scored")
      }
    }

    // int8 quantized candidate cut at 1M vectors: fidelity of the
    // integer-score top-8 cut vs the exact float top-3, plus the wall of
    // the integer pass (10 broadcast queries x 1M corpus = 10M kernel
    // dots). The compute story at fixture scale is parity (on-the-fly
    // quantization adds two floors per element); the 100 TB win is the
    // 4x scan-IO cut once codes are materialized 1-byte arrays.
    {
      val e = spark.read.parquet("/tmp/scale_embed_1M.parquet")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("cv"))
      val w8 = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
        .orderBy(col("s").desc, col("n_id"))
      def topk(score: org.apache.spark.sql.Column, k: Int): Map[Long, Seq[Long]] = {
        c.join(broadcast(q), col("n_id") =!= col("q_id"))
          .withColumn("s", score)
          .withColumn("r", row_number().over(w8)).filter(col("r") <= k)
          .select("q_id", "n_id").collect()
          .groupBy(_.getLong(0)).map { case (g, rs) => g -> rs.map(_.getLong(1)).toSeq }
      }
      var t0 = System.nanoTime()
      val int8 = topk(quantizedDotI8(col("qv"), col("cv")).cast("double"), 8)
      val wInt = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val exact = topk(dot(col("qv"), col("cv")), 3)
      val wF = (System.nanoTime() - t0) / 1e9
      val hits = exact.keys.toSeq.map(k => exact(k).count(int8(k).toSet)).sum
      println(f"SCALE-INT8 corpus=1M queries=10 exact_top3_in_int8_top8=$hits/30 " +
        f"int8_pass_s=$wInt%.1f float_pass_s=$wF%.1f")
    }
    spark.stop()
  }
}
