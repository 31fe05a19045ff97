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
  /** Analyzed-DataFrame memo per (session, dir, name): every
    * `spark.read.parquet` re-reads the file footer on the driver and
    * re-builds the file index, and the harness mains construct each
    * base table hundreds of times (314 queries × their scaffolds) —
    * measured ~5-9% of the full bench wall at sf0.1 (r16 probe:
    * ~300 s vs 318/331 s, 211/314 queries faster). This reuses the
    * PLAN/SCHEMA only: a DataFrame is an immutable logical plan, no
    * row data is held, and every action on it still computes from the
    * parquet files. Keyed by the session object itself so a new
    * session (or a different data dir) always re-resolves; the map
    * grows with (#sessions × #tables), both bounded per JVM.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent(
      (spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

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
