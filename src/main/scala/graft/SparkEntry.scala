package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreQueries.q01(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.CoreQueries.queries ++ operators.DomainQueries.queries ++
      operators.TextQueries.queries ++ operators.SketchQueries.queries ++
      operators.Multimodal.queries ++ operators.Records.queries ++
      operators.TextPrep.queries ++ operators.EventJoins.queries ++ operators.TextRank.queries ++ operators.Graphs.queries ++ operators.Analytics.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.CoreQueries.oracle ++ operators.DomainQueries.oracle ++
      operators.TextQueries.oracle ++ operators.TextPrep.oracle ++
      operators.Records.oracle ++ operators.EventJoins.oracle ++ operators.TextRank.oracle ++ operators.Graphs.oracle ++ operators.SketchQueries.oracle ++ operators.Multimodal.oracle ++ operators.Analytics.oracle
}
