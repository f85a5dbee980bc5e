package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA, top principal component by power iteration — the
  * classic "what single direction explains this embedding table" probe
  * (drift monitoring, anisotropy checks, whitening prep), built from
  * aggregates only: no MLlib, no matrix library, no collect of anything
  * larger than the dim-sized vector itself.
  *
  * Power iteration on the (implicit, never materialized) covariance:
  *   v₀ = e₁;  v_{t+1} = X'ᵀ(X'v_t) / ‖X'ᵀ(X'v_t)‖,  X' mean-centered
  * run for a FIXED iteration count so the result is a deterministic,
  * oracle-checkable function of the table (engine agreement needs the
  * same fixed computation, not convergence).
  *
  * Scale shape per iteration: the current vector v is dim-sized and lives
  * on the driver (64 doubles here — THE legitimate driver-side value,
  * like k-means centroids); the dot products X'v are map-only against a
  * `typedLit` broadcast of v; the dim-sized re-projection Σᵢ sᵢ·x'ᵢ is a
  * 64-key aggregate with map-side partials. One corpus scan and one
  * dim-sized exchange per iteration, zero vec_id-keyed shuffles. The
  * centered array column is localCheckpoint-ed once and reused by every
  * iteration.
  */
object Pca {

  /** Top principal component after `iterations` power steps. Output: one
    * row per dimension — (dim 1-based BIGINT, loading_ppm = the unit
    * component value ×10⁶ rounded to 2 dp, the repo's cross-engine float
    * convention). */
  def topComponent(df: DataFrame, vecCol: String,
                   iterations: Int = 4): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = df.sparkSession
    val xs = df.select(transform(col(vecCol), _.cast("double")).as("x"))
    val dim = xs.select(size(col("x"))).head().getInt(0)
    // mean vector (dim-sized, driver-held like v itself)
    val mu = xs.select(posexplode(col("x")).as(Seq("d", "xv")))
      .groupBy(col("d")).agg(avg(col("xv")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val muArr = Array.tabulate(dim)(mu(_))
    val xc = xs.select(zip_with(col("x"), typedLit(muArr.toSeq),
        (a, b) => a - b).as("x"))
      .localCheckpoint(true) // one centering pass; every iteration reuses
    var v = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iterations) {
      val w = xc
        .select(col("x"), aggregate(zip_with(col("x"), typedLit(v.toSeq),
          (a, b) => a * b), lit(0.0), (acc, e) => acc + e).as("s"))
        .select(posexplode(col("x")).as(Seq("d", "xv")), col("s"))
        .groupBy(col("d")).agg(sum(col("xv") * col("s")).as("w"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val warr = Array.tabulate(dim)(w(_))
      val nrm = math.sqrt(warr.map(x => x * x).sum)
      v = warr.map(_ / nrm)
    }
    import spark.implicits._
    v.zipWithIndex
      .map { case (value, i) => ((i + 1).toLong, value) }.toSeq
      .toDF("dim", "loading")
      .select(col("dim"), round(col("loading") * 1e6, 2).as("loading_ppm"))
  }
}
