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
    spark.stop()
  }
}
