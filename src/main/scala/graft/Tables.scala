package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet star schema (TESTDATA.md).
  *
  * All engine queries take `(SparkSession, sfDir)` and read through here so
  * that the scan layer stays in one place: at cluster scale these reads
  * would be partitioned parquet directories; locally they are single files.
  * Catalyst pushes filters/column pruning into these scans — nothing is
  * materialized here.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** The events.parquet `ts` column has shipped in three encodings across
    * fixture generations, and the engine reads all of them, normalizing to
    * a tz-aware TimestampType so downstream code (unix_micros, watermarks,
    * Row.getTimestamp) sees ONE type:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read nanos
    *    as long and convert to a microsecond timestamp (hour/minute
    *    bucketing is unaffected by the truncation);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; cast to TimestampType — sessions run with
    *    spark.sql.session.timeZone=UTC, so the naive wall time is
    *    interpreted as UTC, identical to what the nanos path produced;
    *  - UTC-adjusted micros/millis (what Spark itself writes): already
    *    TimestampType, pass through untouched.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: epoch-nanos exceed double mantissa range,
        // so float division drifts the microsecond value by ±1
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
