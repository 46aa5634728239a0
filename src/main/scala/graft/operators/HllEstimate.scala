package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single source of truth for turning `hll_distinct` register state
  * (`functions/HllDistinct.scala`, p = 9 → m = 512) into an estimate.
  *
  * Four declared queries read the sketch — q129 (per-language 3-shingle
  * ndv), q135 (register rollup across grains), q136 (per-source corpus
  * profile), and the streaming q134 (distinct users per window) — and
  * each one's DuckDB oracle replays the arithmetic from the exact-integer
  * `(n_zero, z_scaled)` pair. Flajolet et al. 2007's estimator with the
  * small-range linear-counting branch:
  *
  *   raw = α₅₁₂ · m² · 2⁵² / z_scaled,  α₅₁₂ = 0.7213 / (1 + 1.079/m)
  *   est = m · ln(m / n_zero)   when n_zero > 0 and raw ≤ 2.5·m
  *       = raw                  otherwise,  rounded to 4 dp
  *
  * The double chain is written in ONE fixed left-associated order here
  * and mirrored literally by every oracle — a geometry or threshold tweak
  * lands in exactly one Scala site (plus the oracles, which check.py
  * would immediately flag if missed). Keeping four hand-expanded copies
  * in sync was flagged by the r12 review as silent-drift risk.
  */
object HllEstimate {

  /** m = 2^9 registers; must match HllDistinct.P. */
  val M = 512.0

  private val TwoPow52 = 4503599627370496.0

  /** Bias-corrected raw estimate from the pre-scaled exact-integer
    * harmonic sum (`z_scaled` = Σ 2^(52−M_j), empty registers counting
    * 2^52). Exactly one double division of exact integers. */
  def rawEst(zScaled: Column): Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M)) *
      lit(M) * lit(M) * lit(TwoPow52) / zScaled.cast("double")

  /** 4-dp-rounded estimate with the linear-counting branch (raw ≤ 2.5·m
    * and at least one empty register). */
  def estimate(nZero: Column, zScaled: Column): Column = {
    val raw = rawEst(zScaled)
    round(
      when(nZero > 0 && raw <= lit(2.5 * M),
        lit(M) * log(lit(M) / nZero.cast("double")))
        .otherwise(raw), 4)
  }

  /** The ±15% accuracy pin (≈ 3.2σ at m = 512, σ ≈ 1.04/√m), computed
    * from the ROUNDED estimate so both engines judge the same value. */
  def okBound(est: Column, exact: Column): Column =
    abs(est / exact.cast("double") - lit(1.0)) <= lit(0.15)
}
