package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus the Spark-side plumbing for decode / feature
  * extraction / frame sampling.
  *
  * Image decode ([[decodeImage]], `javax.imageio`) and audio decode
  * ([[decodeAudio]], `javax.sound.sampled`) are REAL — JDK-built-in codecs,
  * actual bytes in, actual dimensions/durations out. Video is the one
  * remaining STUB (`decodeStub`): no video codec ships with the JDK or this
  * environment, so it derives deterministic fake metadata from the bytes —
  * the schema, partitioning, batch shape and operator wiring stay real and
  * testable; swap it for a codec UDF (or an Arrow-batched mapInPandas on
  * the PySpark side) in production.
  */
object Multimodal {

  /** Canonical multimodal schema: id + modality tag + payload + metadata. */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Wrap a text/blob frame into the multimodal shape (payload = utf-8
    * bytes) — the fixture generator for tests and demos. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               modality: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** REAL image decode via `javax.imageio` (JDK-built-in: PNG, JPEG, GIF,
    * BMP, WBMP) — replaces [[decodeStub]] for the image modality. Width /
    * height come from the actual bytes; mime from magic-byte sniffing;
    * undecodable or null payloads keep null dimensions. duration_ms stays
    * null (images). Audio/video decode remains stubbed by declared
    * necessity (no media libraries in this environment).
    *
    * Scale shape: a deserializing per-row codec is inherently black-box
    * work — same boundary as an Arrow-batched `mapInPandas` decode; the
    * UDF preserves partitioning (no shuffle) and runs where the payload
    * partition lives. */
  def decodeImage(df: DataFrame): DataFrame = {
    val decode = udf { payload: Array[Byte] =>
      if (payload == null) None
      else {
        val mime =
          if (payload.length >= 4 && payload(0) == 0x89.toByte &&
            payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G')
            "image/png"
          else if (payload.length >= 2 && payload(0) == 0xFF.toByte &&
            payload(1) == 0xD8.toByte) "image/jpeg"
          else if (payload.length >= 3 && payload(0) == 'G' &&
            payload(1) == 'I' && payload(2) == 'F') "image/gif"
          else if (payload.length >= 2 && payload(0) == 'B' &&
            payload(1) == 'M') "image/bmp"
          else "application/octet-stream"
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          catch { case _: Exception => null }
        if (img == null) Some((mime, Option.empty[Int], Option.empty[Int]))
        else Some((mime, Some(img.getWidth), Some(img.getHeight)))
      }
    }
    df.withColumn("_dec", decode(col("payload")))
      .withColumn("meta", struct(
        coalesce(col("_dec._1"), col("meta.mime")).as("mime"),
        col("_dec._2").as("width"),
        col("_dec._3").as("height"),
        lit(null).cast("long").as("duration_ms")))
      .drop("_dec")
  }

  /** REAL audio decode via `javax.sound.sampled` (JDK-built-in: WAV, AIFF,
    * AU) — replaces [[decodeStub]] for the audio modality. duration_ms is
    * computed from the actual frame count / frame rate in the byte stream;
    * mime from magic-byte sniffing (RIFF/WAVE, FORM/AIFF, .snd);
    * undecodable or null payloads keep a null duration. Width/height stay
    * null (audio). Video decode remains stubbed by declared necessity (no
    * video codec libraries ship with the JDK or this environment).
    *
    * Same scale shape as [[decodeImage]]: per-row black-box codec work,
    * partition-preserving, runs where the payload partition lives. */
  def decodeAudio(df: DataFrame): DataFrame = {
    val decode = udf { payload: Array[Byte] =>
      if (payload == null) None
      else {
        val mime =
          if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
            payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'W' &&
            payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')
            "audio/wav"
          else if (payload.length >= 12 && payload(0) == 'F' &&
            payload(1) == 'O' && payload(2) == 'R' && payload(3) == 'M' &&
            payload(8) == 'A' && payload(9) == 'I' && payload(10) == 'F')
            "audio/aiff"
          else if (payload.length >= 4 && payload(0) == '.' &&
            payload(1) == 's' && payload(2) == 'n' && payload(3) == 'd')
            "audio/basic"
          else "application/octet-stream"
        val dur: Option[Long] =
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              val fmt = ais.getFormat
              val frames = ais.getFrameLength
              if (frames >= 0 && fmt.getFrameRate > 0)
                Some(math.round(frames * 1000.0 / fmt.getFrameRate))
              else None
            } finally ais.close()
          } catch { case _: Exception => None }
        Some((mime, dur))
      }
    }
    df.withColumn("_dec", decode(col("payload")))
      .withColumn("meta", struct(
        coalesce(col("_dec._1"), col("meta.mime")).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        col("_dec._2").as("duration_ms")))
      .drop("_dec")
  }

  /** DECODE STUB — deterministic fake dimensions from the payload hash.
    * Real implementation: a codec UDF or Arrow-batched python decode; the
    * surrounding plumbing (schema, null payloads, partition preservation)
    * is what this operator contracts. */
  def decodeStub(df: DataFrame): DataFrame = {
    val h = xxhash64(col("payload"))
    df.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      when(col("payload").isNull, lit(null).cast("int"))
        .otherwise((pmod(h, lit(1920L)) + 1).cast("int")).as("width"),
      when(col("payload").isNull, lit(null).cast("int"))
        .otherwise((pmod(h, lit(1080L)) + 1).cast("int")).as("height"),
      when(col("payload").isNull, lit(null).cast("long"))
        .otherwise(pmod(h, lit(600000L))).as("duration_ms")))
  }

  /** FEATURE STUB — fixed-width float features derived deterministically
    * from payload bytes (per-position byte hash scaled to [0,1);
    * zero-padded past the payload end). Pure-expression, so the feature
    * pass is a full-speed scan; a real extractor swaps in at this exact
    * signature (binary → Array[Float] `features`). */
  def featuresStub(df: DataFrame, dim: Int = 16): DataFrame =
    df.withColumn("features",
      transform(sequence(lit(1), lit(dim)), i =>
        when(col("payload").isNotNull && i <= octet_length(col("payload")),
          (pmod(xxhash64(col("payload").substr(i.cast("int"), lit(1))),
            lit(256L)).cast("double") / 256.0).cast("float"))
          .otherwise(lit(0.0f))))

  /** Frame sampling: split a (video) payload into `n` evenly-spaced
    * fixed-size byte windows — the partition/batch shape of real frame
    * sampling, with slicing as the stand-in decode. */
  def frameSample(df: DataFrame, n: Int, frameBytes: Int = 64): DataFrame =
    df.withColumn("frames",
      when(col("payload").isNull, lit(null))
        .otherwise(transform(sequence(lit(0), lit(n - 1)), k => {
          val len = octet_length(col("payload"))
          val step = greatest((len / n).cast("long"), lit(1L))
          substring(col("payload"), (k.cast("long") * step + 1).cast("int"),
            lit(frameBytes))
        })))

  /** Per-modality partition routing: repartition by modality so downstream
    * per-modality decode stages are co-located (the real-cluster layout:
    * image/audio/video executors hold only their modality's partitions). */
  def partitionByModality(df: DataFrame, parts: Int): DataFrame =
    df.repartition(parts, col("modality"))
}
