package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only probe for the streaming trio's cost breakdown (r20 —
  * VERDICT r19 Next #4: st6 2.4 s / st7 2.4 s / st9 2.7 s at sf0.1).
  * Mirrors the registered query bodies but keeps the StreamingQuery
  * handle so micro-batch count and per-batch durationMs (addBatch /
  * getBatch / walCommit / stateOps) are readable from recentProgress —
  * the registered closures drain and drop the handle. Also decomposes
  * llm_semantic_dedup (Next #5) into fit / assign / pairs / CC stages.
  * Usage: tools/run_direct.sh graft.tools.StProbe [sfDir]
  */
object StProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tables.session("graft-stprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stprobe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def report(tag: String, q: org.apache.spark.sql.streaming.StreamingQuery)
        : Unit =
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        def ms(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
        println(s"[stprobe] $tag batch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerMs=${ms("triggerExecution")} addBatchMs=${ms("addBatch")} " +
          s"getBatchMs=${ms("getBatch")} walMs=${ms("walCommit")} " +
          s"stateMs=${ms("commitOffsets")}")
      }
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")

    for (round <- 1 to 2) {
      println(s"[stprobe] ---- round $round ----")
      spark.conf.set("spark.sql.shuffle.partitions", "4")

      // ---- st6_stream_near_dedup ----
      timed("st6 total") {
        val schema = spark.read.parquet(s"$dir/documents.parquet").schema
        val sd = Files.createTempDirectory("stprobe_st6")
        Files.createSymbolicLink(sd.resolve("documents.parquet"),
          java.nio.file.Paths.get(s"$dir/documents.parquet").toAbsolutePath)
        val stream = spark.readStream.schema(schema).parquet(sd.toString)
        val qname = "stp6_" + java.util.UUID.randomUUID().toString
          .replace("-", "")
        val q = timed("st6 start+drain") {
          val qq = graft.streaming.StreamIngest.streamingNearDup(
              stream, "doc_id", "text", threshold = 0.3).toDF()
            .writeStream.format("memory").queryName(qname)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          qq.awaitTermination(); qq
        }
        report("st6", q)
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        timed("st6 count+anti-join+sort tail") {
          val stride = graft.gates.ScaleGates.nearDupStride(docs.count())
          val kept = docs.select(col("doc_id"))
            .join(spark.table(qname).select(col("id").as("doc_id")),
              Seq("doc_id"), "left_anti")
          (if (stride == 1L) kept
           else kept.filter(col("doc_id") % stride === 0))
            .orderBy("doc_id").localCheckpoint(true)
        }
        spark.catalog.dropTempView(qname)
      }

      // ---- st7_stream_join ----
      timed("st7 total") {
        val schema = spark.read.parquet(s"$dir/events.parquet").schema
        val sd = Files.createTempDirectory("stprobe_st7")
        Files.createSymbolicLink(sd.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
        def ts(df: DataFrame) = df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _: org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn("ts", col("ts").cast("timestamp"))
          case _ => df
        }
        def src() = ts(spark.readStream.schema(schema).parquet(sd.toString))
        val clicks = src().filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("click_ts"))
          .withWatermark("click_ts", "30 minutes")
        val buys = src().filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"),
            col("user_id").as("buy_user"), col("ts").as("buy_ts"))
          .withWatermark("buy_ts", "30 minutes")
        val joined = clicks.join(buys,
          col("user_id") === col("buy_user") &&
            col("buy_ts") >= col("click_ts") &&
            col("buy_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        val qname = "stp7_" + java.util.UUID.randomUUID().toString
          .replace("-", "")
        val q = timed("st7 start+drain") {
          val qq = joined.writeStream.format("memory").queryName(qname)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          qq.awaitTermination(); qq
        }
        report("st7", q)
        timed("st7 project+sort tail") {
          spark.table(qname)
            .select(col("click_id"), col("buy_id"), col("user_id"),
              ((unix_micros(col("buy_ts")) - unix_micros(col("click_ts")))
                / lit(1000L)).cast("long").as("delay_ms"))
            .orderBy("click_id", "buy_id").localCheckpoint(true)
        }
        spark.catalog.dropTempView(qname)
      }

      // ---- st9_stream_late_drop ----
      timed("st9 total") {
        val base = Files.createTempDirectory("stprobe_st9")
        val inDir = base.resolve("in"); Files.createDirectories(inDir)
        val outDir = base.resolve("out").toString
        val ckpt = base.resolve("ckpt").toString
        val ev0 = spark.read.parquet(s"$dir/events.parquet")
        val ts = (ev0.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            ev0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _: org.apache.spark.sql.types.TimestampNTZType =>
            ev0.withColumn("ts", col("ts").cast("timestamp"))
          case _ => ev0
        }).select(col("event_id"), col("ts"))
        def addBatch(df: DataFrame, tag: String): Unit =
          timed(s"st9 addBatch $tag (parquet write+move)") {
            val tmp = base.resolve(s"stage_$tag")
            df.write.parquet(tmp.toString)
            val listing = Files.list(tmp)
            try {
              var i = 0
              listing.filter(_.getFileName.toString.endsWith(".parquet"))
                .forEach { p =>
                  Files.move(p, inDir.resolve(s"$tag-$i.parquet")); i += 1
                }
            } finally listing.close()
          }
        val sch = ts.schema
        def runOnce(tag: String): Unit = timed(s"st9 streaming run $tag") {
          val q = spark.readStream.schema(sch).parquet(inDir.toString)
            .withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "1 hour"))
            .agg(count(lit(1)).as("cnt"))
            .writeStream.format("parquet").option("path", outDir)
            .option("checkpointLocation", ckpt).outputMode("append")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          report(s"st9/$tag", q)
        }
        addBatch(ts.filter(col("ts") < lit("2024-01-21")), "b1")
        runOnce("b1")
        addBatch(ts.filter(col("ts") >= lit("2024-01-21"))
          .unionByName(ts.filter(col("ts") < lit("2024-01-06"))), "b2")
        runOnce("b2")
        timed("st9 read-back tail") {
          spark.read.parquet(outDir)
            .select(col("window.start").cast("timestamp_ntz").as("hour"),
              col("cnt"))
            .orderBy("hour").localCheckpoint(true)
        }
      }

      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)

      // ---- llm_semantic_dedup stage decomposition (Next #5) ----
      timed("semdedup total") {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val n = timed("semdedup count") { emb.count() }
        val kCells =
          if (n == graft.gates.ScaleGates.FixtureRows) 16
          else math.max(16, math.round(n / 1000.0).toInt)
        val (assigned, pairs) = timed("semdedup fit+assign plan") {
          graft.dedup.Similarity.semanticDedupPairs(emb, "vec_id",
            "embedding", k = kCells, threshold = 0.9, fitCap = 100000L,
            maxClusterSize = 100000, seed = 42L)
        }
        val p = timed("semdedup pairs materialize") {
          val c = pairs.cache(); c.count(); c
        }
        timed("semdedup dupGroups (CC + sizes)") {
          graft.dedup.Curation.dupGroups(emb.select(col("vec_id")), p,
            "vec_id").localCheckpoint(true)
        }
        p.unpersist(blocking = false)
        assigned.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
