package graft

import java.nio.file.{Files, Paths}

import graft.sources.ManifestSource

/** Manifest parsing must match the reference's fscanf("%s") semantics:
  * blank lines don't consume ids, exactly N declared paths are read, and
  * file paths with URI-special characters survive the corpus join.
  */
class ManifestSpec extends SparkSpec {

  test("blank lines and trailing junk don't shift doc ids") {
    val dir = Files.createTempDirectory("graft-manifest")
    Files.writeString(dir.resolve("f1.txt"), "alpha one\n")
    Files.writeString(dir.resolve("f2.txt"), "beta two\n")
    Files.writeString(dir.resolve("f3.txt"), "gamma three\n")
    val manifest = dir.resolve("m.txt")
    Files.writeString(manifest, "3\nf1.txt\n\nf2.txt\n\n\nf3.txt\nTRAILING_JUNK_NOT_A_DOC\n")
    val refs = ManifestSource
      .docRefs(spark, manifest.toString, dir.toString)
      .orderBy("file_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(refs.toSeq == Seq((1L, "f1.txt"), (2L, "f2.txt"), (3L, "f3.txt")))
  }

  test("paths with spaces and plus signs survive the corpus join") {
    val dir = Files.createTempDirectory("graft-manifest-enc")
    Files.writeString(dir.resolve("my doc.txt"), "spacey words\n")
    Files.writeString(dir.resolve("a+b.txt"), "plussy words\n")
    val manifest = dir.resolve("m.txt")
    Files.writeString(manifest, "2\nmy doc.txt\na+b.txt\n")
    val postings = Engine
      .indexFromManifest(spark, manifest.toString, dir.toString)
      .orderBy("word")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(postings.toSeq == Seq(
      ("plussy", Seq(2L)), ("spacey", Seq(1L)), ("words", Seq(1L, 2L))))
  }
}
