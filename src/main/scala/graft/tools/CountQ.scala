package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"QCOUNT=${q.size} OCOUNT=${o.size} noOracle=${(q -- o).toSeq.sorted.mkString(",")} orphanOracle=${(o -- q).mkString(",")}")
  }
}
