package graft.core

import org.apache.spark.sql.SparkSession

/** Small shared utilities that had started to be re-derived inline
  * (r12 review): conf scoping, filesystem recursive delete, and the
  * shuffle-write meter used by scale measurements and specs.
  */
object Util {

  /** Set `confs`, run `body`, restore every key to its prior value
    * (or unset it) even on failure. */
  def withConfs[A](spark: SparkSession, confs: Seq[(String, String)])
                  (body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Recursive delete; closes the walk stream (a bare Files.walk holds
    * a directory fd until GC). No-op when the path doesn't exist. */
  def deleteRecursively(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq
          .sortBy(_.getNameCount)(Ordering[Int].reverse)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }

  /** Drop a managed table AND clear its (possibly orphaned) warehouse
    * directory. A fresh session's catalog doesn't know tables a
    * previous JVM materialized, but the warehouse dir survives —
    * `saveAsTable` then fails with LOCATION_ALREADY_EXISTS, and one
    * mid-block failure wedges every later run. (The j3cAutoProjection
    * pattern, shared so audit/spec fixtures can't re-derive it wrong.) */
  def dropTableAndLocation(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
        .getPath).resolve(name)
    deleteRecursively(loc)
  }

  /** Run `job` with a temporary listener summing shuffle WRITE volume,
    * then spin until the async listener bus goes quiet (fixed sleeps
    * race with stragglers — the r12 bitmap lesson). Returns
    * (result, records, bytes). */
  def measureShuffleWrites[A](spark: SparkSession)(job: => A)
      : (A, Long, Long) = {
    val records = new java.util.concurrent.atomic.AtomicLong
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = job
      var last = -1L
      var spins = 0
      while (spins < 25 && records.get != last) {
        last = records.get; spins += 1; Thread.sleep(200)
      }
      (r, records.get, bytes.get)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
