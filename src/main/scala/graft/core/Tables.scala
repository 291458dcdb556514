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

  /** Register all tables as temp views (for spark.sql entry points).
    * Memoized per (session, dir) — r20: 16 query bodies call this, and
    * each un-memoized call re-resolved all 10 parquet footers and
    * re-bound 10 views (~0.3-0.5 s per sql_* query at sf0.1, measured
    * as the bulk of those queries' wall). A view is a lazy name→plan
    * binding, not data: every query still computes from parquet. Keyed
    * on the session OBJECT in a WeakHashMap (the flagshipStatsCache
    * precedent) with the dir as the value, so a dir switch re-registers
    * and dead sessions don't pin. `force` re-binds unconditionally —
    * for callers that shadowed a view and need the fixture back. */
  private val registeredFor = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  def registerAll(spark: SparkSession, sfDir: String,
                  force: Boolean = false): Unit =
    registeredFor.synchronized {
      if (force || registeredFor.get(spark) != sfDir) {
        names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
        registeredFor.put(spark, sfDir)
      }
    }

  /** Scale-adaptive fan-out for heavy per-row compute after a scan that
    * CANNOT be split: a table whose entire input fits inside one scan
    * split (one small file, one parquet row group — the fixture shape,
    * and the "one huge unsplittable file" input-skew case in general)
    * runs its whole map stage as a SINGLE task, serializing explodes,
    * kernels and joins no matter how many cores the session has. When
    * that is the case, buy parallelism with ONE exchange of the (by
    * definition small) input, hash-partitioned on `key` so a downstream
    * groupBy(key) reuses the partitioning instead of adding a second
    * exchange — and, because every key group stays whole inside one
    * partition, per-group aggregation order (hence any floating-point
    * accumulation) is bit-identical to the single-task plan.
    *
    * At scale this is a structural NO-OP: any input bigger than one scan
    * split (≤ 128 MB by default) already gives the map stage its
    * parallelism, and the frame is returned untouched — so the exchange
    * can never become a payload shuffle of a large table. Partition
    * count comes from spark.sql.shuffle.partitions (session-derived),
    * not a local constant. */
  /** Total byte size of a scan's input files, via the Hadoop FileSystem
    * API so every scheme a Spark scan can read (file://, hdfs://, s3a://)
    * resolves (r19 VERDICT Next #9: the previous java.io.File probe threw
    * on every non-`file:` URI, silently disabling fanOut exactly in the
    * motivating case — a genuinely small REMOTE input). A file that still
    * fails to resolve counts as huge: fail-safe toward NOT fanning, so a
    * big input can never be shuffled by a probe error. */
  private[graft] def inputBytes(files: Array[String],
      conf: org.apache.hadoop.conf.Configuration): Long =
    files.map { p =>
      try {
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(conf).getFileStatus(path).getLen
      } catch { case _: Exception => Long.MaxValue / 1024 }
    }.sum

  def fanOut(df: DataFrame, key: Column): DataFrame = {
    // Frames that already shuffle upstream (joins, aggregates, windows,
    // global sorts, explicit repartitions) are no-ops (r20): their map
    // stage downstream of the exchange is not pinned to the scan's
    // split count, so the extra exchange buys no parallelism — it only
    // adds a pass. Measured (r19→r20 idle 32c rows): fanning the
    // post-join frames inside the curation pipeline cost
    // llm_curation_pipeline 1.64→2.35 s and llm_contamination_report
    // 1.05→1.29 s, while every bare-scan site held its win
    // (llm_decontaminate 3.69→0.84 s idle-to-idle).
    val shuffledUpstream = try {
      import org.apache.spark.sql.catalyst.plans.logical._
      df.queryExecution.analyzed.collectFirst {
        case p @ (_: Join | _: Aggregate | _: Window | _: Sort |
                  _: Distinct | _: Deduplicate | _: RepartitionOperation) => p
      }.isDefined
    } catch { case _: Exception => false }
    if (shuffledUpstream) return df
    // streaming frames (no inputFiles) and non-file sources: no-op —
    // their parallelism is the source's business
    val files = try df.inputFiles catch { case _: Exception => Array.empty[String] }
    val bytes =
      if (files.isEmpty) 0L
      else inputBytes(files,
        try df.sparkSession.sessionState.newHadoopConf()
        catch { case _: Exception => new org.apache.hadoop.conf.Configuration() })
    val oneSplit = try {
      org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    } catch { case _: Exception => 128L * 1024 * 1024 }
    if (files.nonEmpty && bytes <= oneSplit) {
      // explicit partition count: without it AQE treats the exchange as
      // coalescible and folds the (tiny-bytes, heavy-compute-downstream)
      // shuffle straight back to ONE partition — the advisory size knows
      // bytes, not the compute the rows fan into
      val n = try df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
              catch { case _: Exception => df.sparkSession.sparkContext.defaultParallelism }
      df.repartition(n, key)
    } else df
  }

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
