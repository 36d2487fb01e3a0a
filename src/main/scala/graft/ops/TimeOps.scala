package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D1–D4 date/time operators (SURVEY.md §2.9).
  *
  * The reference derives calendar features from a double UNIX-epoch column
  * (reference `spark/model_training.py:83-90`, `spark/preprocessor.py:26-32`,
  * `spark/utils.py:11-14`). All features are native Catalyst expressions;
  * one `select` keeps everything inside a single whole-stage-codegen span.
  */
object TimeOps {

  /** D1: double epoch-seconds → timestamp (reference `spark/preprocessor.py:26`).
    * Spark defines double→timestamp as seconds-since-epoch. */
  def epochToTimestamp(c: Column): Column = c.cast("timestamp")

  /** D2: `to_timestamp(from_unixtime(x))` (reference `spark/utils.py:11-14`). */
  def fromUnixSeconds(c: Column): Column = to_timestamp(from_unixtime(c))

  /** Epoch seconds (long) from a timestamp — the inverse of D1/D2. */
  def toUnixSeconds(c: Column): Column = unix_timestamp(c)

  /** D4: the full training-path calendar-feature set
    * (reference `spark/model_training.py:83-90`; the inference path omits
    * minute/second, `spark/preprocessor.py:27-32`).
    *
    * NOTE: Spark's `dayofweek` is 1=Sunday..7=Saturday; the DuckDB oracle
    * must use `dayofweek(ts)+1` (DuckDB is 0=Sunday). */
  def withTimeFeatures(df: DataFrame, ts: Column): DataFrame =
    df.withColumns(Map(
      "year"        -> year(ts),
      "month"       -> month(ts),
      "day"         -> dayofmonth(ts),
      "hour"        -> hour(ts),
      "minute"      -> minute(ts),
      "second"      -> second(ts),
      "day_of_week" -> dayofweek(ts),
      "day_of_year" -> dayofyear(ts)
    ))
}
