package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared, oracle-checkable query.
  *
  * @param name      stable key; becomes the Verify output dir name
  * @param surveyRef SURVEY.md §2 row(s) this query exercises (e.g. "A1,F1")
  * @param build     Spark-side query over the parquet tables in `dir`
  * @param oracle    equivalent ANSI SQL for DuckDB over the same tables
  *                  (None → driver falls back to a rows-only check)
  * @param scaleNote how this holds up at 100 TB / 1000 executors:
  *                  shuffle keys, broadcast choices, skew story
  *
  * Conventions (driver contract):
  *  - every computed column is aliased IDENTICALLY in Spark and SQL;
  *  - both sides ORDER BY the full key so row order is deterministic;
  *  - double-valued aggregates are rounded on BOTH sides (same digits)
  *    so accumulation-order ulp noise cannot flip the hash compare.
  */
final case class Declared(
    name: String,
    surveyRef: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    scaleNote: String = "")

object Declared {
  /** All declared queries, every module. Order = documentation order. */
  lazy val all: Seq[Declared] =
    Relational.all ++ Relational2.all ++ TimeSeries.all ++ Spatial.all ++
      LlmExt.all ++ LlmExt2.all ++ LlmExt3.all ++ LlmExt4.all ++ LlmExt5.all ++
      LlmExt6.all ++ LlmExt7.all ++ LlmExt8.all ++ LlmExt9.all ++
      LlmExt10.all ++ LlmExt11.all ++
      Events.all ++ Analytics.all ++ Analytics2.all ++ Analytics3.all ++
      Analytics4.all ++ Analytics5.all ++ Analytics6.all ++ Analytics7.all ++
      Analytics8.all ++ Analytics9.all ++ Analytics10.all ++ Analytics11.all ++
      Analytics12.all ++ Analytics13.all ++ Analytics14.all ++
      Analytics15.all ++ Analytics16.all ++ Analytics17.all ++
      Analytics18.all ++ Analytics19.all ++ Analytics20.all ++
      Analytics21.all ++ Analytics22.all ++ Analytics23.all ++
      Analytics24.all ++ Analytics25.all ++ Analytics26.all ++
      Analytics27.all ++ Analytics28.all ++ Analytics29.all ++
      Analytics30.all ++ Analytics31.all ++ Analytics32.all ++
      Analytics33.all ++ Analytics34.all ++ Analytics35.all ++
      Analytics36.all ++ Analytics37.all ++ Analytics38.all ++ GeoIngest.all
}
