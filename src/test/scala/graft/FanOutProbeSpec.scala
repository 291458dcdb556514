package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration

/** A local-disk FileSystem that owns the `mockfs` scheme — how an hdfs://
  * path resolves on a real cluster. RawLocalFileSystem itself claims
  * `file:///`, so its checkPath rejects any mockfs:// path; overriding
  * getUri is the documented way to mount a different scheme over it.
  */
class MockFsForProbe extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}

/** Pins the fanOut size probe's Hadoop-FS resolution (r19 VERDICT Next #9).
  * The previous probe (`new java.io.File(new java.net.URI(p)).length`) threw
  * on every non-`file:` URI and fell into the "huge" fallback, so fanOut
  * silently no-op'ed on hdfs://- or s3a://-style paths — the exact
  * motivating case (a small remote input whose whole scan lands in one
  * split). No Spark session needed: the probe is a pure function of
  * (paths, hadoop conf).
  */
class FanOutProbeSpec extends AnyFunSuite {

  private def tmpFile(bytes: Int): java.io.File = {
    val f = java.io.File.createTempFile("fanout-probe", ".bin")
    f.deleteOnExit()
    val out = new java.io.FileOutputStream(f)
    try out.write(new Array[Byte](bytes)) finally out.close()
    f
  }

  test("file:// URIs resolve to their true length") {
    val f = tmpFile(4096)
    val got = graft.core.Tables.inputBytes(
      Array(f.toURI.toString), new Configuration())
    assert(got == 4096L, s"got $got")
  }

  test("non-file scheme resolves through the Hadoop FileSystem registry") {
    // a non-`file:` scheme backed by RawLocalFileSystem: the URI reads
    // mockfs://... yet the bytes live on local disk — exactly how an
    // hdfs:// path resolves on a real cluster. The old java.io.File probe
    // threw here and returned the huge fallback.
    val f = tmpFile(1234)
    val conf = new Configuration()
    conf.set("fs.mockfs.impl", classOf[MockFsForProbe].getName)
    val uri = "mockfs://" + f.getAbsolutePath
    val got = graft.core.Tables.inputBytes(Array(uri), conf)
    assert(got == 1234L, s"got $got")
  }

  test("unresolvable files count as huge (fail-safe: never fan a big input)") {
    val got = graft.core.Tables.inputBytes(
      Array("nosuchscheme://bucket/key"), new Configuration())
    assert(got >= Long.MaxValue / 1024, s"got $got")
    // ...and a missing local file is huge too, not zero
    val gone = graft.core.Tables.inputBytes(
      Array("file:///definitely/not/here.parquet"), new Configuration())
    assert(gone >= Long.MaxValue / 1024, s"got $gone")
  }

  test("multiple files sum") {
    val a = tmpFile(100); val b = tmpFile(200)
    val got = graft.core.Tables.inputBytes(
      Array(a.toURI.toString, b.toURI.toString), new Configuration())
    assert(got == 300L, s"got $got")
  }
}
