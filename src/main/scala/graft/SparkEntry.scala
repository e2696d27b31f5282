package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Q, Relational, SeenOps, Stats, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (SURVEY.md §2 + the
  * training-data pipeline ops); `oracleSql` carries the DuckDB-equivalent
  * ANSI SQL for every SQL-expressible entry. Column names and row order are
  * aligned pairwise (see graft.queries.Q).
  */
object SparkEntry {

  /** Every registered operator query, in a stable order. */
  val registry: Seq[Q] =
    Relational.all ++ Stats.all ++ TextOps.all ++ VectorOps.all ++ SeenOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The segmentation downstream: grouped aggregation over the
    * extracted-text-shaped table (BASELINE.json north_star). */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 2).as("avg_chars"))
      .orderBy("lang")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
