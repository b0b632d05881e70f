package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Exposes the full parity catalog (one `Q` per implemented operator from
  * SURVEY.md §2, plus the LLM-pipeline operators) to the driver's
  * correctness gate and bench.
  */
object SparkEntry {

  /** The complete query catalog. Order matters only for readability. */
  val catalog: Seq[Q] =
    RelationalQueries.all ++
      TpchQueries.all ++
      SubqueryQueries.all ++
      AggregateQueries.all ++
      WindowQueries.all ++
      FunctionQueries.all ++
      ReshapeQueries.all ++
      SourceQueries.all ++
      PipelineQueries.all ++
      CurationQueries.all ++
      MultimodalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 — the reference's own golden-output anchor (reference
    * README.md:42-50). */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case Q(n, _, Some(o)) => n -> o }.toMap
}
