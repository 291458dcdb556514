package graft.tools

/** Dev tool: dump `explain("formatted")` for named registry queries to
  * files — the per-round plans evidence (plans/rNN/query_before.txt /
  * _after.txt) the optimization rounds commit. Usage:
  *   runMain graft.tools.PlanDump outDir suffix q1,q2,... [dataDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = graft.core.Tables.session("plan-dump", "8")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(out) { df.explain("formatted") }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        out.toByteArray)
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
