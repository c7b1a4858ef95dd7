package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish star schema + events /
  * documents / embeddings tables (see /root/repo/TESTDATA.md and
  * FIXTURES.md §2). Plain parquet scans — predicates and projections
  * placed on top of these are pushed into the scan by Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped as two parquet encodings across driver
    * testdata generations: TIMESTAMP(NANOS) (which Spark's reader
    * rejects → read nanos as long via the legacy conf and convert) and
    * TIMESTAMP(MICROS) isAdjustedToUTC=false (which Spark infers as
    * TIMESTAMP_NTZ). Normalize both to the session-zone TIMESTAMP the
    * rest of the engine (and the r1–r6 oracle compares) uses; the
    * session zone is pinned to UTC, so the NTZ→LTZ cast is value-exact.
    * For the nanos path `div` is exact integer division — epoch nanos
    * (~1.7e18) exceed double's 53-bit mantissa, so the float `/`
    * operator would round ~12% of rows 1µs off versus DuckDB's integer
    * truncation. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Deterministic md5 half-bucket: TRUE when the first hex char of
    * md5(key) lands in 0–7 — the RNG-free ~50/50 split primitive
    * (t17/t22's shard idiom). Every query that needs complementary
    * halves (q37's history/increment, t30's ref/cur) MUST take both
    * sides from THIS definition (predicate and its negation): two
    * hand-spelled complements can drift and silently double-count or
    * drop the boundary bucket. A NULL key hashes to NULL, which would
    * make BOTH the predicate and its negation NULL and silently drop
    * the row from both halves — so NULL keys land deterministically in
    * the LOW half (coalesce TRUE), keeping the two halves a true
    * partition of the input. The DuckDB oracles spell the same
    * expression textually —
    * `coalesce(substr(md5(CAST(k AS VARCHAR)), 1, 1) <= '7', TRUE)`. */
  def inLowMd5Half(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, lit, md5, substring}
    coalesce(substring(md5(c.cast("string").cast("binary")), 1, 1) <= "7", lit(true))
  }

  /** Register all tables as temp views (for spark.sql users). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
