package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table access + oracle-exact numeric helpers.
  *
  * The correctness gate hash-compares Spark results against DuckDB running
  * ANSI SQL on the same parquet. Raw `sum(double)` is order-dependent and
  * will not hash-match across engines, so every money/quantity aggregate is
  * routed through `decimal(18,2)` (the synthetic data is exactly 2-decimal):
  * decimal sums are exact in both engines and the final cast back to double
  * is the same correctly-rounded conversion on both sides.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // defensive: a caller-supplied session may not have the conf the
      // engine sessions set at build time (runtime-settable legacy conf)
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => }
    }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The events fixture carries TIMESTAMP(NANOS) which Spark reads only as
    // long (nanosAsLong); normalize to a session-TZ-free timestamp so query
    // semantics match engines that read nanos natively.
    // `div` = integer division: Spark's `/` casts longs to double, and
    // epoch nanos (~1.7e18) exceed double's 53-bit mantissa — the double
    // path corrupts ~2% of timestamps by 1µs
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }

  /** Register all tables as temp views (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))

  /** Exact decimal image of a 2-decimal double column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact average: exact decimal sum divided by count, both engines agree. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** Local-mode session used by mains and tests. */
  def session(appName: String, cores: String = "32"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", cores)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
