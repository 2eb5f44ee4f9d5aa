package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cube.Engine

/** As-of join — for each left row, the latest right row with the same
  * key and right.time <= left.time. Spark has no native as-of operator;
  * the naive form (theta join on key + range, then per-key argmax) is a
  * quadratic blowup on hot keys.
  *
  * This is the scale-correct single-shuffle form: tag and union both
  * sides, window by key ordered by (time, side) with the right side
  * sorting first on ties, and carry the right payload forward with
  * last(_, ignoreNulls). One shuffle on the key, sort within partitions,
  * no range predicate, no skew amplification — the same plan shape at
  * 100 TB. Equivalent to ANSI `ASOF LEFT JOIN` (DuckDB oracle gates it).
  *
  * If several right rows share (key, time), which one is carried is
  * tie-ambiguous — same as ASOF JOIN itself; callers needing
  * determinism should pre-aggregate the right side to unique times.
  */
object AsOf {

  /** Left keeps all its columns; right contributes its non-key columns
    * prefixed `r_` (its time column becomes `r_<time>`). Left rows with
    * no prior right row carry nulls (left-outer semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame = {
    for (df <- Seq(left, right); c <- Seq(key, time))
      require(df.columns.contains(c),
        s"asofJoin: column '$c' missing from one side " +
          s"(left: ${left.columns.mkString(",")}; right: ${right.columns.mkString(",")})")
    val lPay = left.columns.filterNot(c => c == key || c == time).toSeq
    val rPay = (time +: right.columns.filterNot(c => c == key || c == time)).toSeq
    val lType = StructType(lPay.map(left.schema(_)))
    val rType = StructType(rPay.map(right.schema(_)))
    val lu = left.select(col(key), col(time), lit(1).as("_side"),
      struct(lPay.map(col): _*).as("_l"), lit(null).cast(rType).as("_r"))
    val ru = right.select(col(key), col(time), lit(0).as("_side"),
      lit(null).cast(lType).as("_l"), struct(rPay.map(col): _*).as("_r"))
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("_rff", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col(key) +: col(time) +:
        (lPay.map(c => col("_l." + c).as(c)) ++
          rPay.map(c => col("_rff." + c).as("r_" + c))): _*)
  }

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * the same key and right.time >= left.time ("what happens next"):
    * time-to-conversion, next-quote, next-maintenance-window joins. The
    * mirror of [[asofJoin]] with the same single-shuffle shape: tag and
    * union, window by key ordered by (time, side) with the LEFT side
    * sorting first on ties (an equal-time right row qualifies under >=),
    * and pull the right payload BACKWARD with first(_, ignoreNulls) over
    * the [current, unbounded following] frame. Equivalent to DuckDB's
    * `ASOF LEFT JOIN ... ON l.t <= r.t`, which gates it.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame = {
    for (df <- Seq(left, right); c <- Seq(key, time))
      require(df.columns.contains(c),
        s"asofJoinForward: column '$c' missing from one side")
    val lPay = left.columns.filterNot(c => c == key || c == time).toSeq
    val rPay = (time +: right.columns.filterNot(c => c == key || c == time)).toSeq
    val lType = StructType(lPay.map(left.schema(_)))
    val rType = StructType(rPay.map(right.schema(_)))
    val lu = left.select(col(key), col(time), lit(0).as("_side"),
      struct(lPay.map(col): _*).as("_l"), lit(null).cast(rType).as("_r"))
    val ru = right.select(col(key), col(time), lit(1).as("_side"),
      lit(null).cast(lType).as("_l"), struct(rPay.map(col): _*).as("_r"))
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lu.unionByName(ru)
      .withColumn("_rff", first(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(col(key) +: col(time) +:
        (lPay.map(c => col("_l." + c).as(c)) ++
          rPay.map(c => col("_rff." + c).as("r_" + c))): _*)
  }

  /** Nearest as-of join — for each left row, the right row with the same
    * key that is temporally CLOSEST (either direction); ties (equidistant
    * before and after) resolve to the earlier right row. Both carries
    * come from ONE tagged union and one sort: the backward candidate via
    * last-ignoreNulls over [unbounded, current] (equal-time right rows
    * sort before left, so dt = 0 lands here), the forward candidate via
    * first-ignoreNulls over [current, unbounded] (strictly later rights),
    * then a per-row pick of the closer. Same single-shuffle scale shape
    * as [[asofJoin]]; no second pass, no self-join of the two carries.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame = {
    for (df <- Seq(left, right); c <- Seq(key, time))
      require(df.columns.contains(c),
        s"asofJoinNearest: column '$c' missing from one side")
    val lPay = left.columns.filterNot(c => c == key || c == time).toSeq
    val rPay = (time +: right.columns.filterNot(c => c == key || c == time)).toSeq
    val lType = StructType(lPay.map(left.schema(_)))
    val rType = StructType(rPay.map(right.schema(_)))
    val lu = left.select(col(key), col(time), lit(1).as("_side"),
      struct(lPay.map(col): _*).as("_l"), lit(null).cast(rType).as("_r"))
    val ru = right.select(col(key), col(time), lit(0).as("_side"),
      lit(null).cast(lType).as("_l"), struct(rPay.map(col): _*).as("_r"))
    val ord = Window.partitionBy(col(key)).orderBy(col(time), col("_side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dtB = expr(s"unix_micros(CAST($time AS TIMESTAMP)) - " +
      s"unix_micros(CAST(_rb.$time AS TIMESTAMP))")
    val dtF = expr(s"unix_micros(CAST(_rf.$time AS TIMESTAMP)) - " +
      s"unix_micros(CAST($time AS TIMESTAMP))")
    lu.unionByName(ru)
      .withColumn("_rb", last(col("_r"), ignoreNulls = true).over(wb))
      .withColumn("_rf", first(col("_r"), ignoreNulls = true).over(wf))
      .filter(col("_side") === 1)
      .withColumn("_rn",
        when(col("_rf").isNull, col("_rb"))
          .when(col("_rb").isNull, col("_rf"))
          .when(dtB <= dtF, col("_rb"))
          .otherwise(col("_rf")))
      .select(col(key) +: col(time) +:
        (lPay.map(c => col("_l." + c).as(c)) ++
          rPay.map(c => col("_rn." + c).as("r_" + c))): _*)
  }

  /** Events wiring (nearest): each click annotated with the temporally
    * closest purchase in either direction — attribution when the causal
    * arrow is unknown (a purchase just BEFORE a support click explains
    * it as well as one after). Absolute minutes plus a direction flag;
    * the signed gap never goes through integer division (trunc-vs-floor
    * on negatives is not portable).
    */
  def clickNearestPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = new Engine(spark, dir).table("events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    asofJoinNearest(clicks, purchases, "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("r_ts").as("purchase_ts"),
        col("r_purchase_value").as("purchase_value"),
        expr("abs(unix_micros(CAST(r_ts AS TIMESTAMP)) - " +
          "unix_micros(CAST(ts AS TIMESTAMP))) div 60000000")
          .as("minutes_abs"),
        when(col("r_ts").isNull, lit(null).cast("int"))
          .when(col("r_ts") < col("ts"), lit(-1))
          .when(col("r_ts") === col("ts"), lit(0))
          .otherwise(lit(1)).as("direction"))
      .orderBy(col("event_id"))
  }

  /** Events wiring (forward): each click annotated with the user's NEXT
    * purchase at or after the click, plus the minutes until it — the
    * time-to-conversion frame.
    */
  def clickNextPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = new Engine(spark, dir).table("events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    asofJoinForward(clicks, purchases, "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("r_ts").as("purchase_ts"),
        col("r_purchase_value").as("purchase_value"),
        expr("(unix_micros(CAST(r_ts AS TIMESTAMP)) - " +
          "unix_micros(CAST(ts AS TIMESTAMP))) div 60000000")
          .as("minutes_to_purchase"))
      .orderBy(col("event_id"))
  }

  /** Events wiring: each click event annotated with the user's most
    * recent purchase at or before the click.
    */
  def clickLastPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = new Engine(spark, dir).table("events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    asofJoin(clicks, purchases, "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("r_ts").as("purchase_ts"), col("r_purchase_value").as("purchase_value"))
      .orderBy(col("event_id"))
  }
}
