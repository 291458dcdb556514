package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic multimodal payload synthesis — REAL container bytes
  * (PNG via ImageIO, WAV PCM via javax.sound, MJPEG-in-AVI via the RIFF
  * grammar) rendered from the asset id alone, so the driver-visible
  * multimodal queries run the true decode/feature kernels on
  * reproducible inputs derived from the tabular fixture. The containers
  * are the same shapes MultimodalSpec's fixtures exercise; here they are
  * produced IN the executors (a per-row UDF, partition-preserving, no
  * shuffle) exactly where a real pipeline would read blob columns.
  *
  * Rendering is id-keyed (splitmix-style bit mixing), so two assets get
  * visually distinct scenes — pHashes and feature vectors discriminate,
  * not collapse. */
object SynthAssets {

  private def mix(id: Long, salt: Long): Long = {
    var x = id * 0x9E3779B97F4A7C15L + salt
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
    x
  }

  /** `|x|` clamped to [0, Long.MaxValue]: `math.abs(Long.MinValue)` is
    * still negative (two's complement), which would yield a negative
    * block offset / sub-0 Hz tone for that one mixed value. Clamping to 0
    * closes the hole while keeping every other id's asset bytes — and
    * thus all frozen goldens — unchanged (floorMod would remap ~half the
    * id space). */
  private[multimodal] def nonneg(x: Long): Long = math.abs(x) max 0L

  /** The id-derived dark-block position of [[pngBytes]] — the ONLY
    * image parameter, so two assets with equal (bx, by) render
    * identical pixels (and must hash/encode identically). Shared with
    * the off-fixture per-combo consistency gates (ScaleGates), whose
    * DuckDB twins re-derive the same pair via the mix SQL chain. */
  private[graft] def imageBlock(id: Long): (Int, Int) = {
    val w = 48; val h = 32
    val m = mix(id, 1)
    ((nonneg(m) % (w / 2)).toInt + w / 4,
      ((m >>> 8) % (h / 2)).toInt + h / 4)
  }

  /** The id-derived pure-tone frequency of [[wavBytes]] — the only
    * audio parameter; the spectral centroid must track hz/4000
    * (fraction of the 4 kHz Nyquist). */
  private[graft] def toneHz(id: Long): Double =
    500.0 + (nonneg(mix(id, 2)) % 3000L).toDouble

  /** 48×32 PNG: horizontal gradient + an id-placed dark block (structure
    * in the low frequencies, where pHash looks). */
  def pngBytes(id: Long): Array[Byte] = {
    val w = 48; val h = 32
    val (bx, by) = imageBlock(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255) / (w - 1)
      val v = if (x > bx && y > by) base / 4 else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    Multimodal.imageIoMemOnly() // no temp-file stream cache in executors
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Mono 16-bit 8 kHz WAV, 4096 samples of an id-keyed pure tone in
    * [500, 3500) Hz — the spectral centroid tracks the tone, so features
    * discriminate by id. */
  def wavBytes(id: Long): Array[Byte] = {
    import javax.sound.sampled._
    val rate = 8000f
    val hz = toneHz(id)
    val n = 4096
    val samples = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * hz * i / rate) * 12000).toInt
      samples(i * 2) = (v & 0xFF).toByte
      samples(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // --- RIFF/AVI muxing (same grammar Multimodal.Avi parses: little-
  // endian sizes, even-offset padding, LIST hdrl with avih + LIST movi
  // with 00dc JPEG chunks) ---
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length & 1
    val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("ISO-8859-1")).putInt(body.length).put(body)
    bb.array()
  }
  private def riffList(listType: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("ISO-8859-1") ++ body)
  private def avih(w: Int, h: Int, usPerFrame: Int, frames: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(usPerFrame).putInt(0).putInt(0).putInt(0).putInt(frames)
    bb.position(32); bb.putInt(w).putInt(h)
    riffChunk("avih", bb.array())
  }

  /** 3-frame MJPEG-in-AVI, 32×24 @ 25 fps: per-frame brightness walks an
    * id-keyed ramp (temporal structure for the video embedding). */
  def aviBytes(id: Long): Array[Byte] = {
    val w = 32; val h = 24
    val m = mix(id, 3)
    val frames = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val lift = ((nonneg(m) % 96L).toInt + f * 40) & 0xFF
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((x * 200) / (w - 1) + lift) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      Multimodal.imageIoMemOnly()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val hdrl = riffList("hdrl", avih(w, h, 40000, frames.size))
    val movi = riffList("movi",
      frames.flatMap(f => riffChunk("00dc", f)).toArray)
    "RIFF".getBytes("ISO-8859-1") ++ {
      val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(body.length).array() ++ body
    }
  }

  // --- ISO-BMFF muxing (same grammar Multimodal.Bmff parses: big-endian
  // [u32 size][4cc][body] boxes, moov -> mvhd (v0: timescale@12,
  // duration@16) + trak -> tkhd (v0: 16.16 width/height @76)) ---
  private def bmffBox(typ: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length) // big-endian
    bb.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
    bb.array()
  }

  /** Minimal valid MP4: `ftyp` + `moov(mvhd, trak(tkhd))` + an opaque
    * id-keyed `mdat` (stand-in codec payload — metadata decode never
    * reads it). Spec-complete v0 boxes: mvhd 100-byte body with
    * rate/volume/matrix, tkhd 84-byte body with identity matrix.
    * Width/height/duration derive from the asset id, so the metadata
    * surface discriminates by id and is cross-derivable arithmetically
    * (the mm_mp4_metadata golden twin). */
  def mp4Bytes(id: Long): Array[Byte] = {
    val m = mix(id, 4)
    val w = 160 + (nonneg(m) % 8L).toInt * 16
    val h = 96 + ((m >>> 8) % 6L).toInt * 16
    val durMs = 1000L + (m >>> 16) % 60000L
    val ftyp = bmffBox("ftyp",
      "isom".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
        "isomiso2".getBytes("ISO-8859-1"))
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.position(12); bb.putInt(1000) // timescale: 1 unit = 1 ms
      bb.putInt(durMs.toInt)           // duration (fits: < 61000)
      bb.putInt(0x00010000)            // rate 1.0
      bb.putShort(0x0100.toShort)      // volume 1.0
      bb.position(36); bb.putInt(0x00010000) // identity matrix
      bb.position(52); bb.putInt(0x00010000)
      bb.position(68); bb.putInt(0x40000000)
      bb.position(96); bb.putInt(2)    // next track id
      bmffBox("mvhd", bb.array())
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(7)                     // v0 + flags: enabled|in-movie
      bb.position(12); bb.putInt(1)    // track id
      bb.position(20); bb.putInt(durMs.toInt)
      bb.position(40); bb.putInt(0x00010000) // identity matrix
      bb.position(56); bb.putInt(0x00010000)
      bb.position(72); bb.putInt(0x40000000)
      bb.putInt(w << 16).putInt(h << 16)     // 16.16 fixed-point @76
      bmffBox("tkhd", bb.array())
    }
    // REAL sample table (trak→mdia→minf→stbl): per-sample sizes (stsz,
    // sample_size=0 form), sync-sample cadence (stss) and one stts run —
    // the codec-free per-frame facts mp4Features reads. A real mdia
    // carries mdhd/hdlr first; the synthetic container keeps only what
    // the ISO grammar needs for the walk (documented minimalism, same
    // as the metadata boxes above).
    val ms = mix(id, 6)
    val nSamples = 8 + ((ms >>> 4) % 25L).toInt   // 8..32 frames
    val syncStep = 2 + ((ms >>> 12) % 6L).toInt   // keyframe every 2..7
    val sampleSizes =
      Array.tabulate(nSamples)(j => 200 + (nonneg(mix(id, 64 + j)) % 800L).toInt)
    val stsz = {
      val bb = java.nio.ByteBuffer.allocate(12 + 4 * nSamples)
      bb.putInt(0).putInt(0).putInt(nSamples) // v0+flags, per-sample, n
      sampleSizes.foreach(bb.putInt)
      bmffBox("stsz", bb.array())
    }
    val syncs = (1 to nSamples by syncStep).toArray
    val stss = {
      val bb = java.nio.ByteBuffer.allocate(8 + 4 * syncs.length)
      bb.putInt(0).putInt(syncs.length)
      syncs.foreach(bb.putInt)
      bmffBox("stss", bb.array())
    }
    val stts = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(0).putInt(1) // one run: n samples, even ms spacing
      bb.putInt(nSamples).putInt((durMs / nSamples).toInt)
      bmffBox("stts", bb.array())
    }
    val mdia = bmffBox("mdia",
      bmffBox("minf", bmffBox("stbl", stts ++ stss ++ stsz)))
    val moov = bmffBox("moov", mvhd ++ bmffBox("trak", tkhd ++ mdia))
    val mdat = bmffBox("mdat",
      Array.tabulate(64 + (nonneg(m >>> 24) % 64L).toInt)(i =>
        mix(id, 5 + i).toByte))
    ftyp ++ moov ++ mdat
  }

  private def assets(df: DataFrame, idCol: String, modality: String,
                     render: Long => Array[Byte]): DataFrame = {
    val renderU = udf { id: Long => render(id) }
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      renderU(col(idCol).cast("long")).as("payload"),
      struct(
        lit(null).cast("string").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))
  }

  /** (asset_id, "image", png payload, blank meta) per input row. */
  def images(df: DataFrame, idCol: String): DataFrame =
    assets(df, idCol, "image", pngBytes)

  /** (asset_id, "audio", wav payload, blank meta) per input row. */
  def audios(df: DataFrame, idCol: String): DataFrame =
    assets(df, idCol, "audio", wavBytes)

  /** (asset_id, "video", mjpeg-avi payload, blank meta) per input row. */
  def videos(df: DataFrame, idCol: String): DataFrame =
    assets(df, idCol, "video", aviBytes)

  /** (asset_id, "video", MP4 payload, blank meta) per input row. */
  def mp4s(df: DataFrame, idCol: String): DataFrame =
    assets(df, idCol, "video", mp4Bytes)
}
