package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in [[graft.queries.Queries]]. */
object SparkEntry {
  /** Flagship: the full streaming CDC pipeline (upsert merge) on sf=0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_cdc_pipeline_upsert")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracleSql
}
