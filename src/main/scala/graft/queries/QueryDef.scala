package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * (DataFrame API) implementation plus, when SQL-expressible, the exact
  * DuckDB oracle that must hash-match it.
  *
  * Conventions keeping the hash compare stable across engines:
  *   - every output has a total ORDER BY (unique key), applied in BOTH
  *     engines, so row order is deterministic;
  *   - double aggregates are round()ed (2-4 dp) in BOTH engines, so
  *     float summation-order noise cannot flip a bit;
  *   - column names are identical on both sides (the driver sorts
  *     columns by name before hashing);
  *   - integer-sum type skew (DuckDB HUGEINT vs Spark BIGINT) is
  *     normalized with explicit CASTs in the SQL.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  /** Rows-only check (driver records rows>0): for ops DuckDB can't express. */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
