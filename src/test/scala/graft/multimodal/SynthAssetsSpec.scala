package graft.multimodal

import graft.{SparkEntry, SparkSpec}

/** Gates for the driver-visible mm_* queries: payload synthesis is
  * deterministic and id-discriminative, and each registered query runs
  * the REAL kernel (decoded dims/durations come from the bytes, not the
  * generator). */
class SynthAssetsSpec extends SparkSpec {

  test("synthesis is deterministic and id-discriminative") {
    assert(SynthAssets.pngBytes(3L).toSeq == SynthAssets.pngBytes(3L).toSeq)
    assert(SynthAssets.wavBytes(3L).toSeq == SynthAssets.wavBytes(3L).toSeq)
    assert(SynthAssets.aviBytes(3L).toSeq == SynthAssets.aviBytes(3L).toSeq)
    assert(SynthAssets.pngBytes(3L).toSeq != SynthAssets.pngBytes(4L).toSeq)
    assert(SynthAssets.wavBytes(3L).toSeq != SynthAssets.wavBytes(4L).toSeq)
    assert(SynthAssets.aviBytes(3L).toSeq != SynthAssets.aviBytes(4L).toSeq)
  }

  test("nonneg clamps abs(Long.MinValue) and keeps every other value") {
    // math.abs(Long.MinValue) IS Long.MinValue (two's complement) — the
    // clamp must map it to 0 without touching any other magnitude
    assert(SynthAssets.nonneg(Long.MinValue) == 0L)
    assert(SynthAssets.nonneg(Long.MaxValue) == Long.MaxValue)
    assert(SynthAssets.nonneg(-5L) == 5L)
    assert(SynthAssets.nonneg(5L) == 5L)
    assert(SynthAssets.nonneg(0L) == 0L)
  }

  test("mm_image_phash: real decode, distinct hashes, stable re-run") {
    val q = SparkEntry.queries("mm_image_phash")(spark, sfDir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1) == "image/png" &&
      r.getInt(2) == 48 && r.getInt(3) == 32 && !r.isNullAt(4)))
    // id-keyed scenes -> phashes discriminate (strictly more than one)
    assert(rows.map(_.getLong(4)).distinct.length > rows.length / 2)
    val again = SparkEntry.queries("mm_image_phash")(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mm_image_resize: output is a real 16x12 PNG (re-decoded dims)") {
    val rows = SparkEntry.queries("mm_image_resize")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1) == "image/png" &&
      r.getInt(2) == 16 && r.getInt(3) == 12 && r.getInt(4) > 0))
  }

  test("mm_audio_features: duration from bytes, centroid tracks the tone") {
    val rows = SparkEntry.queries("mm_audio_features")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // 4096 samples at 8 kHz = 512 ms, decoded from the container
    assert(rows.forall(r => r.getString(1) == "audio/wav" &&
      r.getLong(2) == 512L && r.getInt(3) == 12))
    val centroids = rows.map(_.getDouble(4))
    assert(centroids.forall(c => c > 0.0 && c < 1.0))
    assert(centroids.distinct.length > rows.length / 2)
  }

  test("mm_video_features: 3 MJPEG frames, 64-dim embedding") {
    val rows = SparkEntry.queries("mm_video_features")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) == 3 && r.getInt(2) == 64))
  }
}
