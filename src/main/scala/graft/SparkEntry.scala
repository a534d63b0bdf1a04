package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Declared

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All declared queries live in `graft.queries.*` as [[Declared]]
  * values carrying both the Spark build function and the DuckDB oracle
  * SQL; this object is just the flat registry the driver consumes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Declared.all.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Declared.all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
