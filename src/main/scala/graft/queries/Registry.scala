package graft.queries

/** Central query registry — SparkEntry derives the driver-facing maps from
  * here. Add each new operator's QueryDef to its module's `all` and list the
  * module here.
  */
object Registry {
  val all: Seq[QueryDef] =
    RelationalQueries.all ++ NoiseQueries.all ++ DedupQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++ EventQueries.all ++
      RelationalQueries2.all ++ ExtQueries.all ++ PipelineQueries.all ++
      Round4Queries.all ++ Round4Queries2.all ++ Round4Queries3.all ++
      Round5Queries.all ++ Round5Queries2.all ++ Round5Queries3.all ++
      Round5Queries4.all ++ Round5Queries5.all ++ Round5Queries6.all ++
      Round5Queries7.all ++ Round6Queries.all ++ Round6Queries2.all ++
      Round6Queries3.all ++ Round6Queries4.all ++ Round6Queries5.all ++
      Round6Queries6.all ++ Round6Queries7.all ++ Round6Queries8.all ++
      Round6Queries9.all ++ Round7Queries.all ++ Round8Queries.all ++
      Round8Queries2.all ++ Round9Queries.all ++ Round10Queries.all ++
      Round10Queries2.all ++ Round10Queries3.all ++ Round11Queries.all ++
      Round11Queries2.all ++ Round12Queries.all ++ Round13Queries.all ++
      Round13Queries2.all ++ Round13Queries3.all ++ Round13Queries4.all ++
      Round14Queries.all ++ Round15Queries.all ++ Round16Queries.all

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
