package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity over quasi-identifier columns — the release-gate audit a
  * privacy review runs before a dataset leaves the boundary: every
  * combination of quasi-identifiers must be shared by at least k rows,
  * otherwise the combination singles people out. Complements the
  * row-level PII surface (redaction, salted pseudonymization): those
  * scrub direct identifiers; this catches re-identification by JOINING
  * quasi-identifiers.
  *
  * Scale shape: one hash aggregate on the quasi-identifier tuple (the
  * only corpus-sized exchange). Enforcement anti-joins the violating
  * class list back — that list is small by construction when the data is
  * nearly anonymous (it is the exceptional classes), so Spark broadcasts
  * it; a pathological input where MOST classes violate degrades to a
  * shuffle join, still linear.
  */
object Privacy {

  /** Equivalence classes smaller than k: the quasi columns plus `n`
    * (class size), ready for review or for [[kAnonymize]]. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k $k must be >= 2 to mean anything")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Suppression enforcement: drop every row whose quasi-identifier
    * class is smaller than k. The surviving table is k-anonymous on
    * `quasiCols` by construction. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String],
                 k: Long): DataFrame =
    df.join(broadcast(kAnonymityAudit(df, quasiCols, k)
        .select(quasiCols.map(col): _*)),
      quasiCols, "left_anti")

  /** ε-differentially-private count release (Dwork et al. 2006, the
    * Laplace mechanism): per group, `count + Laplace(1/ε)` — sensitivity
    * of a count is 1, so the noise scale 1/ε gives ε-DP. Released as
    * exact MILLI-counts (floor((n + noise)·1000) as BIGINT) so the figure
    * is hash-stable cross-engine.
    *
    * The noise here is DETERMINISTIC — the uniform is the repo's portable
    * 48-bit md5 prefix of the group key, pushed through the Laplace
    * inverse CDF (−(1/ε)·sign(u−½)·ln(1−2|u−½|)) — which is what makes
    * the release REPRODUCIBLE and the gate row oracle-checkable: both
    * engines derive the identical double from the identical key. A real
    * deployment keeps the mechanism but derives u from a keyed PRF
    * (HMAC with a secret release key) instead of the public md5, so
    * observers can't invert the noise; the md5 stand-in is the
    * testable skeleton of exactly that pipeline. One release per
    * (key, release-id) — reusing a key's noise across releases would
    * compose the budgets.
    *
    * Scale shape: one hash aggregate (the count) + map-only noise
    * arithmetic on the |groups|-sized result. Nothing else moves. */
  def dpCountRelease(df: DataFrame, groupCol: String,
                     epsilon: Double): DataFrame = {
    require(epsilon > 0, s"epsilon $epsilon must be positive")
    val u = (conv(substring(md5(col(groupCol).cast("string")), 1, 12),
      16, 10).cast("double") + lit(0.5)) / lit(Math.pow(2.0, 48))
    val z = u - lit(0.5)
    val noise = lit(-1.0 / epsilon) *
      when(z >= 0, lit(1.0)).otherwise(lit(-1.0)) *
      log(lit(1.0) - lit(2.0) * abs(z))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol),
        floor((col("n").cast("double") + noise) * 1000)
          .cast("long").as("released_milli"))
  }
}
