package graft
import java.nio.file.{Files, Paths}

/** Dev harness: dump ONE query's result + its oracle SQL in the Verify
  * layout, so `tools/check_oracle.py <out> <sfDir>` can gate a single
  * query during iteration (full Verify runs every query, ~2 min). */
object One {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = core.Tables.session("graft-one",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val sql = SparkEntry.oracleSql.get(name)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      sql.map(s => s"{${q(name)}: ${q(s)}}").getOrElse("{}"))
    spark.stop()
  }
}
