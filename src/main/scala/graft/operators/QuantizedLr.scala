package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deterministic distributed logistic regression — the supervised
  * sibling of [[CodebookTrainer]]'s k-means discipline: full-batch
  * gradient descent whose every state transition is CROSS-ENGINE
  * EXACT, so a DuckDB oracle can re-derive the trained weights (and
  * therefore every downstream score) bit-for-bit by unrolling the
  * iterations as CTEs.
  *
  * The determinism ladder (each rung keeps state on a dyadic grid so
  * IEEE arithmetic is exact and aggregation order cannot matter):
  *
  *  - features are floor-quantized to the 2⁻²⁰ grid at construction;
  *  - weights live on the 2⁻²⁰ grid, so every wⱼ·xⱼ product is an
  *    exact 2⁻⁴⁰ dyadic and the margin z = Σ wⱼxⱼ is exact under ANY
  *    summation order (≤ k small terms);
  *  - σ(z) = 1/(1+e⁻ᶻ) is the one libm call; its result is
  *    floor-quantized to 2⁻²⁰ so a 1-ulp exp() difference between
  *    engines cannot escape (the [[graft.analytics.TextQueries]]
  *    quantizeLog2 discipline — boundary-crossing odds ~2⁻³² per
  *    evaluation);
  *  - each per-doc gradient term (σ−y)·xⱼ is an exact 2⁻⁴⁰ dyadic,
  *    floored onto the 2⁻³⁰ grid (a per-term Long) and summed as
  *    `decimal(38,0)` — an integer sum is order-independent under any
  *    partitioning AND exact at any corpus size (a BIGINT sum read
  *    back as double was only exactly convertible while n·2³⁰ < 2⁵³,
  *    a silent 8.4M-doc exactness cliff). The one conversion of the
  *    exact integer sum to double is IEEE round-to-nearest on both
  *    engines (Java `BigDecimal.doubleValue`, DuckDB `CAST(hugeint
  *    AS DOUBLE)`), so the converted operand — hence every weight —
  *    still matches bit-for-bit past the old bound;
  *  - the weight update wⱼ ← ⌊(wⱼ − η·gⱼ/2³⁰/n)·2²⁰⌋/2²⁰ re-lands on
  *    the 2⁻²⁰ grid (η a power of two), so the grid never deepens
  *    across iterations.
  *
  * Scale shape: the feature frame is localCheckpoint-materialized
  * once (the standard iterative-ML persist), then each iteration is
  * ONE aggregation job over it (k integer sums, map-side combined);
  * the weights are a k-element driver array compiled into the next
  * iteration's expressions — exactly how a production distributed GD
  * ships its state.
  */
object QuantizedLr {

  private val Q20 = 1048576.0d        // 2^20: feature/weight/sigma grid
  private val Q30 = 1073741824.0d     // 2^30: gradient-term grid

  /** Train on a frame with columns `x: array<double>` (k quantized
    * features, index 1 = intercept convention is the caller's) and
    * `y: double` (0.0/1.0). Returns the k weights (all on the 2⁻²⁰
    * grid). Bit-identical across partitionings and engines.
    */
  def train(feat: DataFrame, k: Int, iters: Int, eta: Double): Array[Double] = {
    require(eta == math.pow(2, math.round(math.log(eta) / math.log(2))),
      s"eta must be a power of two for exact updates: $eta")
    val cached = feat.select(col("x"), col("y")).localCheckpoint()
    val n = cached.count().toDouble
    var w = Array.fill(k)(0.0)
    for (_ <- 0 until iters) {
      val wl = typedlit(w)
      val z = (0 until k)
        .map(j => element_at(wl, j + 1) * element_at(col("x"), j + 1))
        .reduce(_ + _)
      val sig = floor(lit(1.0) / (lit(1.0) + exp(-z)) * Q20) / Q20
      val gus = (0 until k).map(j =>
        sum(floor((sig - col("y")) * element_at(col("x"), j + 1) * Q30)
          .cast(LongType).cast(DecimalType(38, 0))).as(s"g$j"))
      val r = cached.agg(gus.head, gus.tail: _*).head
      w = Array.tabulate(k)(j =>
        math.floor(
          (w(j) - eta * r.getDecimal(j).doubleValue() / Q30 / n) * Q20) / Q20)
    }
    w
  }

  /** [[train]] memoized per (data key, dims) — the train-once/serve-
    * many discipline of [[CodebookTrainer.cachedPq]]; defensive copy
    * because callers compile the array into scoring expressions.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()

  def cached(feat: => DataFrame, dataKey: String, k: Int, iters: Int,
      eta: Double): Array[Double] = {
    val key = s"lr|$dataKey|$k|$iters|$eta"
    val hit = memo.get(key)
    val w = if (hit != null) hit
    else {
      val trained = train(feat, k, iters, eta)
      val prev = memo.putIfAbsent(key, trained)
      if (prev != null) prev else trained
    }
    w.clone()
  }
}
