package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.fromText(
    Seq((1L, "hello world payload"), (2L, ""), (3L, "another binary blob"))
      .toDF("id", "txt"), "id", "txt")

  test("fromText produces the canonical multimodal schema") {
    assert(assets.schema.fieldNames.toSeq ==
      Seq("asset_id", "modality", "payload", "meta"))
    assert(assets.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("decodeStub fills deterministic dimensions; null payload stays null") {
    val d1 = Multimodal.decodeStub(assets).select("asset_id", "meta.width")
      .as[(Long, Option[Int])].collect().toMap
    val d2 = Multimodal.decodeStub(assets).select("asset_id", "meta.width")
      .as[(Long, Option[Int])].collect().toMap
    assert(d1 == d2) // deterministic
    assert(d1(1L).isDefined && d1(1L).get >= 1 && d1(1L).get <= 1920)
  }

  test("featuresStub: fixed width, [0,1), zero-padded") {
    val f = Multimodal.featuresStub(assets, dim = 8)
      .select("asset_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f.values.forall(_.length == 8))
    assert(f(1L).forall(v => v >= 0.0f && v < 1.0f))
    assert(f(2L).forall(_ == 0.0f)) // empty payload → all padding
  }

  test("frameSample yields n frames per asset") {
    val fr = Multimodal.frameSample(assets.filter($"asset_id" === 1), n = 4)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(fr.length == 4)
  }

  test("partitionByModality co-locates modalities") {
    val parted = Multimodal.partitionByModality(assets, 2)
    assert(parted.rdd.getNumPartitions == 2)
  }

  test("decodeImage reads real PNG/JPEG dimensions from bytes") {
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF0000)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val rows = Seq(
      (1L, encode(2, 2, "png")),
      (2L, encode(3, 5, "jpg")),
      (3L, "not an image at all".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = Multimodal.fromText(
        rows.map { case (id, _) => (id, "") }.toDF("id", "txt"), "id", "txt")
      .drop("payload")
      .join(rows.toDF("asset_id", "payload"), "asset_id")
    val out = Multimodal.decodeImage(df)
      .select($"asset_id", $"meta.mime", $"meta.width", $"meta.height")
      .as[(Long, String, Option[Int], Option[Int])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (("image/png", Some(2), Some(2))))
    assert(out(2L) == (("image/jpeg", Some(3), Some(5))))
    // undecodable bytes: octet-stream mime, null dims
    assert(out(3L)._1 == "application/octet-stream" && out(3L)._2.isEmpty)
    // null payload: dims stay null, original mime kept
    assert(out(4L)._2.isEmpty && out(4L)._3.isEmpty)
  }

  test("decodeAudio reads real WAV duration from bytes") {
    import javax.sound.sampled._
    def wav(sampleRate: Float, nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      var i = 0
      while (i < nFrames) { // quiet sine so the payload isn't all zeros
        val v = (math.sin(i * 0.05) * 2000).toInt
        pcm(2 * i) = (v & 0xFF).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, wav(8000f, 4000)),   // 500 ms
      (2L, wav(16000f, 24000)), // 1500 ms
      (3L, "definitely not audio".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = Multimodal.fromText(
        rows.map { case (id, _) => (id, "") }.toDF("id", "txt"), "id", "txt",
        modality = "audio")
      .drop("payload")
      .join(rows.toDF("asset_id", "payload"), "asset_id")
    val out = Multimodal.decodeAudio(df)
      .select($"asset_id", $"meta.mime", $"meta.duration_ms", $"meta.width")
      .as[(Long, String, Option[Long], Option[Int])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (("audio/wav", Some(500L), None)))
    assert(out(2L) == (("audio/wav", Some(1500L), None)))
    // undecodable bytes: octet-stream mime, null duration
    assert(out(3L)._1 == "application/octet-stream" && out(3L)._2.isEmpty)
    // null payload: duration stays null, original mime kept
    assert(out(4L)._2.isEmpty)
  }
}
