package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TIME-type convention (SURVEY §7.4).
  *
  * The reference models TIME as INT milliseconds-of-day in UTC with no date
  * component (`sabot/.../record/CompleteType.java:160`, TIME(3)). Spark 4.1
  * has a native nanosecond-precision `TimeType`; the graft convention is:
  *
  *  - engine-internal representation: Spark `TIME(6)` columns;
  *  - interchange with reference-style data: INT millis-of-day via the two
  *    converters below (lossless in the reference direction, since the
  *    reference precision is millis);
  *  - TIME columns never carry a timezone — like the reference, a TIME is a
  *    wall-clock time-of-day, and the session timezone (UTC here,
  *    GraftSession) is only applied when combining with a DATE.
  */
object TimeConv {

  /** Spark TIME → reference INT millis-of-day. */
  def toMillisOfDay(t: Column): Column =
    (hour(t).cast("long") * 3600000L + minute(t).cast("long") * 60000L +
      (date_part(lit("SECOND"), t) * 1000).cast("long")).cast("int")

  /** Reference INT millis-of-day → Spark TIME(6). */
  def fromMillisOfDay(ms: Column): Column =
    call_function("make_time",
      (ms.cast("long") / lit(3600000L)).cast("int"),
      ((ms.cast("long") % 3600000L) / lit(60000L)).cast("int"),
      (ms.cast("long") % 60000L).cast("decimal(16,6)") / 1000)
}
