package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.schemas.Schemas
import graft.sources.Sources

/** The ordered ETL runner mirroring etl.py (SURVEY.md §3.1): two staging
  * loads, then the five star inserts — fact first requires both staging
  * tables; order matters and each step is an eager action (the reference's
  * per-statement `conn.commit()` analogue, §4).
  *
  * Star tables are landed as parquet under `warehouseDir/<table>` through the
  * positional-insert writer: distribution and sort keys mirror the
  * reference's distkey/sortkey declarations (sql_queries.py:74-121, §4) —
  * repartition on the dist key co-locates join keys, sortWithinPartitions
  * tightens parquet min/max stats for zone-map-style pruning.
  */
object Pipeline {

  final case class Result(counts: Map[String, Long])

  def run(spark: SparkSession, eventsPath: String, songsPath: String,
          warehouseDir: String, timeDimLimit: Option[Int] = None): Result = {

    // ---- COPY stage (sql_queries.py:136-150) ----
    val stgEvents = Sources.readEventsJson(spark, eventsPath)
    val stgSongs = Sources.readSongsJson(spark, songsPath)
    stgEvents.write.mode(SaveMode.Overwrite)
      .parquet(s"$warehouseDir/stg_song_events")
    stgSongs.write.mode(SaveMode.Overwrite)
      .parquet(s"$warehouseDir/stg_songs")

    // Transforms read the LANDED staging data (as Redshift's inserts do),
    // so the fact/dim builds scan columnar parquet, not raw JSON, and the
    // staging write is the single pass over the raw input.
    val events = spark.read.parquet(s"$warehouseDir/stg_song_events")
    val songsStg = spark.read.parquet(s"$warehouseDir/stg_songs")

    // ---- INSERT stage, reference order (sql_queries.py:326-332) ----
    val steps: Seq[(String, DataFrame, org.apache.spark.sql.types.StructType,
                    Option[String], Seq[String])] = Seq(
      // (table, frame, DDL schema, distKey, sortKeys) — dist/sort per
      // sql_queries.py:74-121 (song_id distkey + item_in_session sortkey on
      // fact; registration/title/artist_name/date sortkeys on dims)
      ("fct_song_plays", StarSchemaEtl.songPlays(events, songsStg),
        Schemas.fctSongPlays, Some("song_id"), Seq("item_in_session")),
      ("dim_users", StarSchemaEtl.users(events),
        Schemas.dimUsers, None, Seq("registration")),
      ("dim_songs", StarSchemaEtl.songs(songsStg),
        Schemas.dimSongs, Some("song_id"), Seq("title")),
      ("dim_artists", StarSchemaEtl.artists(songsStg),
        Schemas.dimArtists, Some("artist_id"), Seq("artist_name")),
      ("dim_time_dimensions",
        StarSchemaEtl.timeDimensions(events, timeDimLimit),
        Schemas.dimTimeDimensions, Some("time_key"), Seq("date"))
    )

    val counts = scala.collection.mutable.Map[String, Long](
      "stg_song_events" -> events.count(),
      "stg_songs" -> songsStg.count())

    steps.foreach { case (table, df, schema, distKey, sortKeys) =>
      val aligned = Sources.alignPositional(df, schema)
      Sources.writeDistributed(aligned, s"$warehouseDir/$table",
        distKey = distKey, sortKeys = sortKeys)
      counts(table) = spark.read.parquet(s"$warehouseDir/$table").count()
    }
    Result(counts.toMap)
  }
}
