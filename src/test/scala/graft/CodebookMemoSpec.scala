package graft

import graft.operators.CodebookTrainer

/** Train-once / serve-many: a session serving the same corpus must not
  * re-run k-means per query (the bench invokes every trained query once
  * per pass — retraining there measured ~1s of pure training jobs per
  * invocation at sf0.1 in round 4). The memo is keyed on (data path,
  * algorithm, all training params), so different corpora or params
  * still train.
  */
class CodebookMemoSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("a repeat trained-query invocation runs zero trainings") {
    CodebookTrainer.clearMemo()
    val first = SparkEntry.queries("q_ann_ivfpq_trained")(spark, sfDir)
      .collect()
    val after1 = CodebookTrainer.trainingsRun.get()
    val second = SparkEntry.queries("q_ann_ivfpq_trained")(spark, sfDir)
      .collect()
    val after2 = CodebookTrainer.trainingsRun.get()
    assert(after2 == after1,
      s"repeat invocation retrained (${after2 - after1} trainings)")
    assert(first.toSeq == second.toSeq, "memoized serve changed the result")
  }

  test("sibling trained queries share the session's codebooks") {
    CodebookTrainer.clearMemo()
    SparkEntry.queries("q_ann_ivfpq_trained")(spark, sfDir).collect()
    val after = CodebookTrainer.trainingsRun.get()
    // ivf_trained and pq_trained each reuse one of ivfpq's two codebooks
    SparkEntry.queries("q_ann_ivf_trained")(spark, sfDir).collect()
    SparkEntry.queries("q_ann_pq_trained")(spark, sfDir).collect()
    assert(CodebookTrainer.trainingsRun.get() == after,
      "sibling queries retrained instead of sharing the memo")
  }

  test("different params or corpus keys do train") {
    CodebookTrainer.clearMemo()
    val e = graft.core.Tables.load(spark, sfDir, "embeddings")
    val before = CodebookTrainer.trainingsRun.get()
    val a = CodebookTrainer.cachedSphericalIvf(e, sfDir, 16, 64, 2)
    val b = CodebookTrainer.cachedSphericalIvf(e, sfDir, 16, 64, 2)
    assert(CodebookTrainer.trainingsRun.get() == before + 1)
    assert(a sameElements b)
    CodebookTrainer.cachedSphericalIvf(e, sfDir, 16, 64, 1) // iters differ
    CodebookTrainer.cachedSphericalIvf(e, sfDir + "/other", 16, 64, 2)
    assert(CodebookTrainer.trainingsRun.get() == before + 3)
  }
}
