package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.TextExprs._

/** Session-extension registration (SURVEY.md §7.3): installs the engine's
  * native expression family into any session built with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * so SQL users get `simhash64`, `minhash_sig`, `cosine_sim`, … without
  * programmatic registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> (xs => MinHashSig(xs.head, 128, 3)),
    "simhash64" -> (xs => SimHash64(xs.head)),
    "ngram_jaccard" -> (xs => NgramJaccard(xs(0), xs(1), 3)),
    "cosine_sim" -> (xs => CosineSim(xs(0), xs(1))),
    "winnow_sig" -> (xs => WinnowSig(xs.head, 9, 12)),
    "sorted_shingles" -> (xs => SortedShingles(xs.head, 3)),
    "gram_hashes" -> (xs => GramHashes(xs.head, 5)),
    "array_jaccard" -> (xs => ArrayJaccard(xs(0), xs(1))),
    "repetition_stats" -> (xs => RepetitionStats(xs.head)),
    "hyperplane_bucket" -> (xs => HyperplaneBucket(xs.head, 16, 42L)),
    "l2_normalize" -> (xs => L2Normalize(xs.head)),
    "quantize_int8" -> (xs => QuantizeInt8(xs.head)),
    "quantize_scale" -> (xs => QuantizeScale(xs.head)))

  override def apply(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    // whole-operator extension: plans graft.plans.AsofJoinNode into the
    // co-partitioned streaming-merge AsofJoinExec
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // optimizer extension: cheap length-difference guard ahead of bounded
    // levenshtein predicates (see EditDistancePrefilter soundness notes)
    e.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
  }
}
