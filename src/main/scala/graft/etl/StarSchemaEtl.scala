package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TimeFns

/** The reference's five INSERT…SELECT transforms (sql_queries.py:153-303) as
  * pure DataFrame → DataFrame functions, output columns in star-DDL order
  * (the positional-INSERT contract, SURVEY.md §7.4.5).
  *
  * Scale shape: the songs/artists dims come from the (small) catalog side and
  * broadcast; the fact build's only wide shuffle is the left join, and its
  * build side is the broadcast catalog — at 100 TB of events this is a
  * map-only pipeline over the event scan.
  */
object StarSchemaEtl {

  /** fct_song_plays (sql_queries.py:155-182): filter page='NextSong', LEFT
    * join to the song catalog on (artist, title) — unmatched plays keep NULL
    * song_id/artist_id (the reference's documented choice, :175-176). NULL
    * join keys never match (`===` is null-rejecting, like SQL `=`;
    * deliberately not `<=>`, SURVEY.md §7.4.6). */
  def songPlays(events: DataFrame, songs: DataFrame): DataFrame = {
    val plays = events.filter(col("page") === "NextSong")
    val joined = plays.join(
      broadcast(songs),
      plays("artist") === songs("artist_name") && plays("song") === songs("title"),
      "left")
    val ts = TimeFns.epochMillisToTs(col("ts"))
    joined.select(
      col("itemInSession").as("item_in_session"),
      col("sessionId").as("session_id"),
      col("song_id"),
      col("artist_id"),
      TimeFns.timeKey(ts).as("time_key"),
      col("userId").as("user_id"),
      col("level"),
      col("userAgent").as("user_agent"),
      col("location"),
      ts.as("ts"))
  }

  /** dim_users (sql_queries.py:184-193): 6-column DISTINCT over ALL staged
    * events — logged-out rows contribute a NULL-user row by design
    * (SURVEY.md §1.4). */
  def users(events: DataFrame): DataFrame =
    events.select(
      col("userId").as("user_id"),
      col("firstName").as("first_name"),
      col("lastName").as("last_name"),
      col("gender"),
      col("registration"),
      col("level")).distinct()

  /** dim_songs (sql_queries.py:195-202). */
  def songs(stgSongs: DataFrame): DataFrame =
    stgSongs.select(col("song_id"), col("title"), col("duration"), col("year"))
      .distinct()

  /** dim_artists (sql_queries.py:204-212). */
  def artists(stgSongs: DataFrame): DataFrame =
    stgSongs.select(
      col("artist_id"), col("artist_name"), col("artist_location"),
      col("artist_latitude"), col("artist_longitude")).distinct()

  /** dim_time_dimensions (sql_queries.py:214-303): distinct event hours →
    * 15 derived columns. The reference caps the source at LIMIT 100
    * (sql_queries.py:220, an acknowledged hack) — parameterized here,
    * default unlimited (SURVEY.md §7.4.7). */
  def timeDimensions(events: DataFrame, limit: Option[Int] = None): DataFrame = {
    val src = limit.map(events.limit).getOrElse(events)
    val hours = src
      .select(date_trunc("hour", TimeFns.epochMillisToTs(col("ts"))).as("h"))
      .distinct()
    hours.select(TimeFns.timeDimensionColumns(col("h")): _*)
  }

  // ---------------------------------------------------------------------
  // FAITHFUL transforms: exact reference DDL columns/order/semantics
  // (Schemas.Reference) for users who need outputs identical to the
  // reference warehouse — auth kept, no artist_id/user_agent, reference
  // column order, and the day-of-month "hour" bug reproduced.
  // ---------------------------------------------------------------------

  /** fct_song_plays exactly as sql_queries.py:155-182 lands it. */
  def songPlaysFaithful(events: DataFrame, songs: DataFrame): DataFrame = {
    val plays = events.filter(col("page") === "NextSong")
    val joined = plays.join(
      broadcast(songs),
      plays("artist") === songs("artist_name") && plays("song") === songs("title"),
      "left")
    val ts = TimeFns.epochMillisToTs(col("ts"))
    joined.select(
      col("auth"),
      col("itemInSession").as("item_in_session"),
      col("level"),
      col("location"),
      col("sessionId").as("session_id"),
      col("song_id"),
      col("userId").as("user_id"),
      TimeFns.timeKey(ts).cast("int").as("time_key"),
      ts.as("ts"))
  }

  /** dim_users exactly as sql_queries.py:184-193 lands it. */
  def usersFaithful(events: DataFrame): DataFrame =
    events.select(
      col("firstName").as("firstname"),
      col("lastName").as("lastname"),
      col("gender"),
      col("level"),
      col("registration"),
      col("userId").as("user_id")).distinct()

  /** dim_artists exactly as sql_queries.py:204-212 lands it. */
  def artistsFaithful(stgSongs: DataFrame): DataFrame =
    stgSongs.select(
      col("artist_id"), col("artist_latitude"), col("artist_longitude"),
      col("artist_location"), col("artist_name")).distinct()

  /** dim_time_dimensions exactly as sql_queries.py:215-303 lands it —
    * including the LIMIT 100 source cap (`:220`) as the DEFAULT here,
    * because faithful means faithful. */
  def timeDimensionsFaithful(events: DataFrame,
                             limit: Option[Int] = Some(100)): DataFrame = {
    // The reference's bare `LIMIT 100` (sql_queries.py:224) picks an
    // UNSPECIFIED 100-row subset — not reproducible run-to-run in either
    // engine. For faithful-but-deterministic output we take the first 100
    // by (ts, sessionId, itemInSession), a total order over real events —
    // the one deliberate divergence from the reference's semantics.
    val src = limit.map(n =>
      events.orderBy(col("ts"), col("sessionId"), col("itemInSession"))
        .limit(n)).getOrElse(events)
    val hours = src
      .select(date_trunc("hour", TimeFns.epochMillisToTs(col("ts"))).as("h"))
      .distinct()
    hours.select(TimeFns.referenceTimeDimensionColumns(col("h")): _*)
  }
}
