package graft
/** Print every registered query name, one per line — lets sweep
  * tooling shard SPARK_GRAFT_ONLY lists without a Spark session. */
object ListQueries {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
