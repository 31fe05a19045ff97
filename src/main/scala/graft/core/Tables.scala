package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table catalog over the driver-generated parquet test data
  * (TESTDATA.md). Paths are `"$dir/<name>.parquet"`; schemas are fixed
  * by the generator, so we read without inference (parquet is
  * self-describing) and keep the raw column names.
  *
  * At cluster scale these reads benefit from parquet column pruning +
  * predicate pushdown automatically as long as callers select/filter
  * before any wide transform — all operators in `graft.ops` follow
  * that discipline.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some data
    * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in
    * others, so the reader adapts to the footer instead of assuming:
    *   - NANOS: Spark 4 refuses to map nanos to its µs TimestampType,
    *     so we read nanos as long (`nanosAsLong`) and floor-truncate
    *     to µs ourselves — the same floor semantics Spark applies to
    *     µs data.
    *   - MICROS (NTZ): cast NTZ → TimestampType; all sessions run with
    *     `spark.sql.session.timeZone=UTC`, so the cast is
    *     instant-preserving and yields the identical µs epoch values.
    * Downstream logic works on floor-second epochs either way
    * (cross-engine reproducible).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→LTZ cast below is instant-preserving ONLY under UTC; an
    // ad-hoc session built without the config would silently shift
    // every event by the host offset, so the adaptation enforces its
    // own precondition instead of assuming the builder set it
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
