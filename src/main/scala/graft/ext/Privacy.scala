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

  /** Laplace inverse CDF noise from a 48-bit-hex-prefix uniform, then the
    * milli-count release shape shared by [[dpCountRelease]] and
    * [[deterministicLaplaceRelease]]: per group, `count + Laplace(1/ε)` —
    * sensitivity of a count is 1, so noise scale 1/ε is the Dwork et al.
    * 2006 Laplace mechanism. Released as exact MILLI-counts
    * (floor((n + noise)·1000) as BIGINT) so the figure is hash-stable
    * cross-engine. One hash aggregate (the count) + map-only noise
    * arithmetic on the |groups|-sized result — nothing else moves. */
  private def laplaceMilliRelease(df: DataFrame, groupCol: String,
                                  epsilon: Double,
                                  hexDigest: org.apache.spark.sql.Column)
      : DataFrame = {
    require(epsilon > 0, s"epsilon $epsilon must be positive")
    val u = (conv(substring(hexDigest, 1, 12), 16, 10).cast("double") +
      lit(0.5)) / lit(Math.pow(2.0, 48))
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

  /** ε-differentially-private count release — the PRODUCTION path: the
    * Laplace-mechanism uniform derives from a keyed PRF,
    * `HMAC-SHA256(secret, group-key)`, so an observer WITHOUT the
    * release secret cannot recompute the noise and invert the release
    * (with the secret the release stays reproducible — same
    * (secret, key) → same uniform → same milli floor, which is what lets
    * a release be re-derived for audit without storing it). The secret
    * must be generated fresh per release id and kept out of the released
    * artifact: reusing one secret across releases of the same counts
    * re-publishes the same noise and composes the ε budgets; publishing
    * it reduces this to [[deterministicLaplaceRelease]].
    *
    * The digest is computed in a CLOSURE-based function, deliberately
    * not a Catalyst expression over `lit(secret)`: a plan Literal is
    * printed by explain(), the Spark UI SQL tab, and event logs, which
    * would leak the secret to every plan observer. The closure ships
    * inside the serialized task binary instead — the one place a scalar
    * UDF beats a built-in — and the cost is nil because the digest runs
    * on the POST-aggregate |groups|-sized frame, never the corpus. HMAC
    * (vs the previous sha256-of-concatenation) also closes that
    * construction's documented length-extension caveat. */
  def dpCountRelease(df: DataFrame, groupCol: String, epsilon: Double,
                     secret: String): DataFrame = {
    require(secret.nonEmpty,
      "dpCountRelease requires a non-empty release secret; for the " +
        "test-only public-hash variant use deterministicLaplaceRelease")
    val hmacHex = udf { (key: String) =>
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(
        secret.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        "HmacSHA256"))
      mac.doFinal(
          Option(key).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }
    laplaceMilliRelease(df, groupCol, epsilon,
      hmacHex(col(groupCol).cast("string")))
  }

  /** TEST-ONLY Laplace-shaped release — NOT differentially private: the
    * uniform is the PUBLIC md5 of the group key, so anyone can recompute
    * the noise per key and recover the exact count. It exists because
    * that same public determinism is what makes the gate row
    * (`q_x_dp_release`) oracle-checkable cross-engine — both engines
    * derive the identical double from the identical key — i.e. this is
    * the testable skeleton of [[dpCountRelease]] (identical mechanism,
    * public digest instead of the keyed PRF). Never wire THIS variant
    * into a real release pipeline. */
  def deterministicLaplaceRelease(df: DataFrame, groupCol: String,
                                  epsilon: Double): DataFrame =
    laplaceMilliRelease(df, groupCol, epsilon,
      md5(col(groupCol).cast("string")))
}
