package graft.analytics

import graft.functions.SimilarityFunctions.hyperplaneSign

/** Generators for the oracle-SQL fragments that mirror the dense
  * sign-LSH kernel ([[graft.expressions.SignBuckets]]): the ±1
  * hyperplane constants are emitted verbatim, and each bucket bit is
  * the sign of the same left-to-right signed coordinate sum the kernel
  * computes (±1 products are exact ⇒ bit-identical across engines).
  */
private[analytics] object OracleSql {

  /** One `SELECT … UNION ALL …` arm per band over a CTE named `n`
    * exposing (vec_id, v, nrm): emits (vec_id, v, nrm, band, bucket).
    */
  def denseSignBandArms(bands: Int, bits: Int, dim: Int): String =
    (0 until bands).map { band =>
      val bucket = (0 until bits).map { bit =>
        val terms = (0 until dim).map { c =>
          val op = if (hyperplaneSign(band, bit, c) > 0) "+" else "-"
          s"$op v[${c + 1}]"
        }.mkString(" ")
        s"(CASE WHEN (0.0 $terms) > 0 THEN CAST(${1L << bit} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
      }.mkString("(", "\n            + ", ")")
      s"SELECT vec_id, v, nrm, $band AS band,\n          $bucket AS bucket FROM n"
    }.mkString("\n        UNION ALL\n        ")
}
