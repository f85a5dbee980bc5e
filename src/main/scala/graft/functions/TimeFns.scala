package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** E-series scalar expression library (SURVEY.md §2.6) as pure Column
  * functions — usable from both the DataFrame API and SQL-built plans, and
  * fully whole-stage-codegen'd (built-ins only, no UDFs).
  */
object TimeFns {

  /** E1 — epoch-millis BIGINT → TIMESTAMP with the reference's INTEGER
    * division semantics (`TIMESTAMP 'epoch' + ts/1000 * INTERVAL '1 second'`,
    * sql_queries.py:168): Redshift's bigint/1000 truncates to whole seconds
    * (confirmed by Fiddle cell 54 output), so floor before converting —
    * Spark's `/` on longs would keep millis through the double. */
  def epochMillisToTs(c: Column): Column =
    timestamp_seconds(floor(c / 1000).cast("long"))

  /** E2 — date_trunc('hour', ts) (sql_queries.py:166-169). */
  def truncHour(ts: Column): Column = date_trunc("hour", ts)

  /** E3 — CAST(TO_CHAR(ts,'YYYYMMDDHH24') AS bigint) → 2018110301-style
    * integer time key (sql_queries.py:164-172). */
  def timeKey(ts: Column): Column =
    date_format(ts, "yyyyMMddHH").cast("long")

  /** E4 — hour of day. The reference's SUBSTRING(…, 9, 2) actually extracts
    * day-of-month (sql_queries.py:224, proven by Fiddle cell 51); per
    * SURVEY.md §7.4.2 the default is the CORRECT hour. `faithful = true`
    * reproduces the reference's bug byte-for-byte — characters 9-10 of the
    * 'yyyy-MM-dd HH:mm:ss' rendering are the DAY digits — for users who
    * need outputs identical to the reference's actual (buggy) warehouse. */
  def hourOfDay(ts: Column, faithful: Boolean = false): Column =
    if (faithful) substring(ts.cast("string"), 9, 2).cast("int")
    else hour(ts)

  /** E6 — week of year. Spark weekofyear is ISO-8601; Redshift EXTRACT(WEEK)
    * differs near year boundaries (SURVEY.md §7.4.3) — ISO chosen, oracle SQL
    * uses the same. */
  def week(ts: Column): Column = weekofyear(ts)

  /** E7 — day of week, 1=Sunday..7=Saturday. The reference computes
    * EXTRACT(DOW)+1 (sql_queries.py:246-250, Redshift DOW is 0=Sun) which
    * lands exactly on Spark's native dayofweek convention. */
  def dayOfWeek(ts: Column): Column = dayofweek(ts)

  /** E8 — is_weekend: CASE WHEN EXTRACT(DOW …) IN (0,6) (sql_queries.py:
    * 251-257) ⇔ Spark dayofweek ∈ {1=Sun, 7=Sat}. */
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  /** E9 — fiscal year, April-start: Jan-Mar belong to the PREVIOUS fiscal
    * year (sql_queries.py:258-270). */
  def fiscalYear(ts: Column): Column =
    when(month(ts).between(1, 3), year(ts) - 1).otherwise(year(ts))

  /** E10 — fiscal quarter: Jan-Mar→4, Apr-Jun→1, Jul-Sep→2, Oct-Dec→3
    * (sql_queries.py:271-285). */
  def fiscalQuarter(ts: Column): Column =
    when(month(ts).between(1, 3), 4)
      .when(month(ts).between(4, 6), 1)
      .when(month(ts).between(7, 9), 2)
      .otherwise(3)

  /** E11 — season: (12,1,2)→Winter, (3,4,5)→Spring, (6,7,8)→Summer,
    * else Fall (sql_queries.py:286-300). */
  def season(ts: Column): Column =
    when(month(ts).isin(12, 1, 2), "Winter")
      .when(month(ts).isin(3, 4, 5), "Spring")
      .when(month(ts).isin(6, 7, 8), "Summer")
      .otherwise("Fall")

  /** The full 15-column time-dimension derivation from a timestamp column,
    * in the EXTENDED dim_time_dimensions order (Schemas.dimTimeDimensions;
    * E12 is the NULL special_event placeholder at sql_queries.py:301).
    * Extends the reference DDL with `trunc_time` and the corrected `hour`
    * — see Schemas.scala for the documented deltas. */
  def timeDimensionColumns(ts: Column): Seq[Column] = Seq(
    timeKey(ts).as("time_key"),
    ts.as("trunc_time"),
    to_date(ts).as("date"),
    dayofmonth(ts).as("day"),
    week(ts).as("week"),
    month(ts).as("month"),
    quarter(ts).as("quarter"),
    year(ts).as("year"),
    hourOfDay(ts).as("hour"),
    dayOfWeek(ts).as("day_of_week"),
    isWeekend(ts).as("is_weekend"),
    fiscalYear(ts).as("fiscal_year"),
    fiscalQuarter(ts).as("fiscal_quarter"),
    season(ts).as("season"),
    lit(null).cast("string").as("special_event")
  )

  /** The FAITHFUL 14-column derivation: exact reference DDL order and
    * semantics (sql_queries.py:117-134 DDL, :215-303 insert) — no
    * trunc_time column, `hour` in position 2 computed with the reference's
    * SUBSTRING day-of-month bug. Byte-for-byte reproduction of the
    * reference warehouse's dim_time_dimensions. */
  def referenceTimeDimensionColumns(ts: Column): Seq[Column] = Seq(
    timeKey(ts).as("time_key"),
    hourOfDay(ts, faithful = true).as("hour"),
    to_date(ts).as("date"),
    dayofmonth(ts).as("day"),
    week(ts).as("week"),
    month(ts).as("month"),
    quarter(ts).as("quarter"),
    year(ts).as("year"),
    dayOfWeek(ts).as("day_of_week"),
    isWeekend(ts).as("is_weekend"),
    fiscalYear(ts).as("fiscal_year"),
    fiscalQuarter(ts).as("fiscal_quarter"),
    season(ts).as("season"),
    lit(null).cast("string").as("special_event")
  )
}
