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
}
