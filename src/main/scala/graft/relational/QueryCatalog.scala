package graft.relational

/** The full declared query inventory: relational surface + array-operator
  * conformance (SURVEY §2.C) + training-data pipeline operators. The driver
  * harness runs every entry through Verify (DuckDB hash-compare at sf0.01)
  * and the `headline` subset through Bench (sf0.1). */
object QueryCatalog {
  val all: Seq[CatalogQuery] =
    RelationalQueries.all ++ ArrayOpQueries.all ++ PipelineQueries.all

  lazy val byName: Map[String, CatalogQuery] = {
    val names = all.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    all.map(q => q.name -> q).toMap
  }

  lazy val headlines: Seq[CatalogQuery] = all.filter(_.headline)
}
