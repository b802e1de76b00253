package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query; those with SQL-expressible semantics also declare the DuckDB oracle
  * text the driver hash-compares against.
  */
object SparkEntry {

  /** All declared queries, from every catalog module. SURVEY §2.3's Q24 and
    * Q28 are implemented by domain/north-star operators; aliases keep the
    * declared numbering resolvable 1:1 from `queries`. */
  def catalog: Seq[QueryDef] = {
    val base = CoreQueries.all ++ domain.DomainQueries.all ++ NorthStarQueries.all ++
      streaming.StreamQueries.all ++ LayoutQueries.all ++ ModelQueries.all
    val byName = base.map(q => q.name -> q).toMap
    base ++ Seq(
      byName("laser_shared_loci").copy(name = "q24_shared_loci"),
      byName("sim_topk_brute").copy(name = "q28_topk"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.find(_.name == "q09_agg_group").get.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
