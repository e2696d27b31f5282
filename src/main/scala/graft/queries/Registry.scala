package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-harness query: a Spark definition plus (optionally) the
  * equivalent ANSI SQL that DuckDB replays on the same parquet files
  * (SURVEY.md §0.4). `oracle == None` → the driver records a weaker
  * rows-only check (approximate / engine-specific ops).
  *
  * Determinism contract: every query output ends in a total ORDER BY on a
  * unique key, mirrored exactly in the oracle SQL, so the driver's
  * value-hash compare is row-order stable. Floating aggregates are rounded
  * on BOTH sides to absorb cross-engine summation-order noise; integer
  * aggregates are cast to BIGINT on both sides (DuckDB sums integers to
  * HUGEINT, Spark to LONG).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
