package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructTypes for every table the engine touches.
  *
  * Two families:
  *  - Sparkify staging + star schema, mirroring the reference DDL
  *    (/root/reference/sql_queries.py:33-134). Types follow SURVEY.md §1.3
  *    (TEXT→String, INT→Integer, BIGINT→Long, FLOAT→Double,
  *    TIMESTAMP→Timestamp, DATE→Date, BOOLEAN→Boolean).
  *  - The driver testdata star schema (/root/testdata/sf0.001 … sf0.1,
  *    TESTDATA.md) used by the oracle-checked query surface.
  *
  * Every table gets a declared schema: schema-on-read with an explicit
  * StructType keeps JSON/parquet scans deterministic and lets Catalyst prune
  * columns at the source instead of inferring (an extra pass over 100 TB).
  */
object Schemas {

  // -------------------------------------------------------------------------
  // Sparkify staging (reference sql_queries.py:33-69)
  // -------------------------------------------------------------------------

  /** stg_song_events — raw app event log (sql_queries.py:33-54).
    * `userId` arrives as "" in raw JSON but is INT in the DDL; we read it as
    * string and cast downstream (SURVEY.md §1.4).
    */
  val stgSongEvents: StructType = StructType(Seq(
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("itemInSession", IntegerType),
    StructField("lastName", StringType),
    StructField("length", DoubleType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", LongType),
    StructField("sessionId", IntegerType),
    StructField("song", StringType),
    StructField("status", IntegerType),
    StructField("ts", LongType),
    StructField("userAgent", StringType),
    StructField("userId", StringType) // "" → null, cast to int at staging
  ))

  /** stg_songs — song catalog (sql_queries.py:56-69), loaded name-matched
    * (json 'auto', sql_queries.py:147). */
  val stgSongs: StructType = StructType(Seq(
    StructField("num_songs", IntegerType),
    StructField("artist_id", StringType),
    StructField("artist_latitude", DoubleType),
    StructField("artist_longitude", DoubleType),
    StructField("artist_location", StringType),
    StructField("artist_name", StringType),
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("duration", DoubleType),
    StructField("year", IntegerType)
  ))

  // -------------------------------------------------------------------------
  // Sparkify star schema — EXTENDED variant (the repo's default warehouse).
  //
  // This is NOT a column-for-column mirror of the reference DDL
  // (sql_queries.py:71-134). Deliberate deltas, chosen in SURVEY §7.4 and
  // §8 so the README's star-join analytics work:
  //  - fct_song_plays: drops `auth` (session auth state, no analytical use),
  //    ADDS `artist_id` (enables the artist-dim star join the reference's
  //    README describes but its fact can't serve) and `user_agent`;
  //    column order differs.
  //  - dim_users / dim_artists: same columns, reordered key-first
  //    (user_id/artist_id lead); dim_users renames firstName/lastName →
  //    first_name/last_name.
  //  - dim_time_dimensions: ADDS `trunc_time` (the join-ready timestamp the
  //    insert already computes then throws away) and moves `hour`; `hour` is
  //    the CORRECTED hour-of-day (the reference's is a day-of-month bug,
  //    sql_queries.py:224).
  //
  // Column ORDER here is the repo's own positional-INSERT contract
  // (SURVEY.md §7.4 point 5). For byte-for-byte reference fidelity use the
  // `Reference` schemas below with StarSchemaEtl's *Faithful transforms.
  // -------------------------------------------------------------------------

  val fctSongPlays: StructType = StructType(Seq(
    StructField("item_in_session", IntegerType),
    StructField("session_id", IntegerType),
    StructField("song_id", StringType),
    StructField("artist_id", StringType),
    StructField("time_key", LongType),
    StructField("user_id", IntegerType),
    StructField("level", StringType),
    StructField("user_agent", StringType),
    StructField("location", StringType),
    StructField("ts", TimestampType)
  ))

  val dimUsers: StructType = StructType(Seq(
    StructField("user_id", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("gender", StringType),
    StructField("registration", LongType),
    StructField("level", StringType)
  ))

  val dimSongs: StructType = StructType(Seq(
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("duration", DoubleType),
    StructField("year", IntegerType)
  ))

  val dimArtists: StructType = StructType(Seq(
    StructField("artist_id", StringType),
    StructField("artist_name", StringType),
    StructField("artist_location", StringType),
    StructField("artist_latitude", DoubleType),
    StructField("artist_longitude", DoubleType)
  ))

  /** dim_time_dimensions (sql_queries.py:117-134); NOT NULL expressed as
    * nullable=false where the reference declares it. */
  val dimTimeDimensions: StructType = StructType(Seq(
    StructField("time_key", LongType, nullable = false),
    StructField("trunc_time", TimestampType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("week", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("quarter", IntegerType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("hour", IntegerType, nullable = false),
    StructField("day_of_week", IntegerType, nullable = false),
    StructField("is_weekend", BooleanType, nullable = false),
    StructField("fiscal_year", IntegerType, nullable = false),
    StructField("fiscal_quarter", IntegerType, nullable = false),
    StructField("season", StringType),
    StructField("special_event", StringType)
  ))

  // -------------------------------------------------------------------------
  // Sparkify star schema — FAITHFUL variant: exact reference DDL columns,
  // order, and types (sql_queries.py:71-134; unquoted Redshift identifiers
  // fold to lowercase, hence `firstname`/`lastname`; SMALLINT → ShortType,
  // the INT time_key stays IntegerType). Use with StarSchemaEtl's
  // *Faithful transforms to reproduce the reference warehouse
  // byte-for-byte, day-of-month "hour" bug included.
  // -------------------------------------------------------------------------

  object Reference {
    /** sql_queries.py:71-84. */
    val fctSongPlays: StructType = StructType(Seq(
      StructField("auth", StringType),
      StructField("item_in_session", IntegerType),
      StructField("level", StringType),
      StructField("location", StringType),
      StructField("session_id", IntegerType),
      StructField("song_id", StringType),
      StructField("user_id", IntegerType),
      StructField("time_key", IntegerType),
      StructField("ts", TimestampType)
    ))

    /** sql_queries.py:86-96. */
    val dimUsers: StructType = StructType(Seq(
      StructField("firstname", StringType),
      StructField("lastname", StringType),
      StructField("gender", StringType),
      StructField("level", StringType),
      StructField("registration", LongType),
      StructField("user_id", IntegerType)
    ))

    /** sql_queries.py:98-105 — identical to the extended dim_songs. */
    val dimSongs: StructType = Schemas.dimSongs

    /** sql_queries.py:107-115. */
    val dimArtists: StructType = StructType(Seq(
      StructField("artist_id", StringType),
      StructField("artist_latitude", DoubleType),
      StructField("artist_longitude", DoubleType),
      StructField("artist_location", StringType),
      StructField("artist_name", StringType)
    ))

    /** sql_queries.py:117-134. */
    val dimTimeDimensions: StructType = StructType(Seq(
      StructField("time_key", IntegerType),
      StructField("hour", IntegerType),
      StructField("date", DateType, nullable = false),
      StructField("day", ShortType, nullable = false),
      StructField("week", ShortType, nullable = false),
      StructField("month", ShortType, nullable = false),
      StructField("quarter", ShortType, nullable = false),
      StructField("year", ShortType, nullable = false),
      StructField("day_of_week", ShortType, nullable = false),
      StructField("is_weekend", BooleanType, nullable = false),
      StructField("fiscal_year", ShortType, nullable = false),
      StructField("fiscal_quarter", ShortType, nullable = false),
      StructField("season", StringType),
      StructField("special_event", StringType)
    ))
  }

  /** All star tables keyed by name, in reference creation order
    * (sql_queries.py:307-315). */
  val starTables: Seq[(String, StructType)] = Seq(
    "stg_song_events" -> stgSongEvents,
    "stg_songs" -> stgSongs,
    "fct_song_plays" -> fctSongPlays,
    "dim_users" -> dimUsers,
    "dim_songs" -> dimSongs,
    "dim_artists" -> dimArtists,
    "dim_time_dimensions" -> dimTimeDimensions
  )

  // -------------------------------------------------------------------------
  // Driver testdata (TESTDATA.md / FIXTURES.md §B)
  // -------------------------------------------------------------------------

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)
  ))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)
  ))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)
  ))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)
  ))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)
  ))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)
  ))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)
  ))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))

  val testdataTables: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings
  )
}
