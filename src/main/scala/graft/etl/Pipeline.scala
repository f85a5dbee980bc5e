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

  /** FAITHFUL end-to-end run: the reference warehouse schema + semantics —
    * reference DDL columns/order/types (Schemas.Reference), the
    * day-of-month "hour" bug, the LIMIT 100 time-dim cap — landed as
    * parquet under `warehouseDir`. One deliberate divergence: the
    * reference's bare `LIMIT 100` is an unspecified subset (not
    * reproducible even across its own runs), so the faithful time dim
    * takes the first 100 events by (ts, sessionId, itemInSession) —
    * deterministic here, same shape there. A reference user who needs
    * their Redshift warehouse's layout runs THIS; the default `run`
    * is the corrected/extended schema. */
  def runFaithful(spark: SparkSession, eventsPath: String, songsPath: String,
                  warehouseDir: String): Result = {
    val events = Sources.readEventsJson(spark, eventsPath)
    val songsStg = Sources.readSongsJson(spark, songsPath)
    val steps: Seq[(String, DataFrame,
                    org.apache.spark.sql.types.StructType)] = Seq(
      ("fct_song_plays", StarSchemaEtl.songPlaysFaithful(events, songsStg),
        Schemas.Reference.fctSongPlays),
      ("dim_users", StarSchemaEtl.usersFaithful(events),
        Schemas.Reference.dimUsers),
      ("dim_songs", StarSchemaEtl.songs(songsStg),
        Schemas.Reference.dimSongs),
      ("dim_artists", StarSchemaEtl.artistsFaithful(songsStg),
        Schemas.Reference.dimArtists),
      ("dim_time_dimensions", StarSchemaEtl.timeDimensionsFaithful(events),
        Schemas.Reference.dimTimeDimensions))
    val counts = scala.collection.mutable.Map[String, Long](
      "stg_song_events" -> events.count(), "stg_songs" -> songsStg.count())
    steps.foreach { case (table, df, schema) =>
      Sources.insertInto(Sources.alignPositional(df, schema), schema,
        s"$warehouseDir/$table", SaveMode.Overwrite)
      counts(table) = spark.read.parquet(s"$warehouseDir/$table").count()
    }
    Result(counts.toMap)
  }

  /** The create_tables.py → etl.py COMPOSITION: land staging and star data
    * INTO the session-catalog tables that `Ddl.recreateAll` created
    * (create_tables.py:36-37 then etl.py:36-37; the reference's INSERTs
    * target those tables, e.g. sql_queries.py:156). Each append is
    * positional (`insertInto` matches by position, exactly the reference's
    * `INSERT INTO t SELECT …` without a column list), through the same
    * explicit align-and-cast used by the path-based writer.
    *
    * `Ddl.recreateAll(spark)` must have run first — this is the contract,
    * not a convenience: inserting into a missing table is an error in both
    * engines. The path-based `run` above remains the distributed-layout
    * variant (dist/sort-key parquet); this one gives `spark.table(...)` /
    * `spark.sql` users the reference's catalog-resident warehouse. */
  def runIntoCatalog(spark: SparkSession, eventsPath: String,
                     songsPath: String,
                     timeDimLimit: Option[Int] = None): Result = {
    val counts = scala.collection.mutable.Map[String, Long]()

    // ---- COPY stage: JSON → catalog staging tables ----
    Sources.alignPositional(Sources.readEventsJson(spark, eventsPath),
      Schemas.stgSongEvents).write.insertInto("stg_song_events")
    Sources.alignPositional(Sources.readSongsJson(spark, songsPath),
      Schemas.stgSongs).write.insertInto("stg_songs")
    val events = spark.table("stg_song_events")
    val songsStg = spark.table("stg_songs")
    counts("stg_song_events") = events.count()
    counts("stg_songs") = songsStg.count()

    // ---- INSERT stage, reference order (sql_queries.py:326-332) ----
    // The staging frames read back from the catalog, so the fact/dim
    // builds scan the landed columnar data — same single-pass-over-raw
    // discipline as the path-based run.
    val inserts: Seq[(String, DataFrame)] = Seq(
      "fct_song_plays" -> StarSchemaEtl.songPlays(events, songsStg),
      "dim_users" -> StarSchemaEtl.users(events),
      "dim_songs" -> StarSchemaEtl.songs(songsStg),
      "dim_artists" -> StarSchemaEtl.artists(songsStg),
      "dim_time_dimensions" ->
        StarSchemaEtl.timeDimensions(events, timeDimLimit))
    inserts.foreach { case (table, df) =>
      Sources.alignPositional(df, Schemas.starTables.toMap.apply(table))
        .write.insertInto(table)
      counts(table) = spark.table(table).count()
    }
    Result(counts.toMap)
  }
}
