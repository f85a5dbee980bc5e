package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/types are aligned on both sides because the
  * driver's compare sorts columns by name and hashes values.
  *
  * Conventions that keep the oracle hash stable across engines:
  *  - every aggregate / computed column is aliased identically on both sides;
  *  - integer-valued outputs are cast to BIGINT on both sides (Spark ints are
  *    int32, DuckDB counts/extracts are int64);
  *  - computed doubles are round(x, 2) on both sides (sum order differs);
  *  - raw timestamps are only emitted via date_trunc (testdata `events.ts` is
  *    nanosecond-precision parquet: Spark truncates to micros on read, DuckDB
  *    keeps ns — truncated values agree).
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    expectEmpty: Boolean = false)

/** The full query surface, assembled from the parity catalog (SURVEY.md §2)
  * and the LLM-pipeline extension operators. */
object Catalog {
  lazy val all: Seq[Q] =
    ParityQueries.all ++ TpchQueries.all ++ AnalyticsQueries.all ++
      ExtensionQueries.all ++ PipelineQueries.all ++ StreamingQueries.all ++
      AnchorQueries.all ++ CurationQueries.all

  lazy val byName: Map[String, Q] = {
    val names = all.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    all.map(q => q.name -> q).toMap
  }
}
