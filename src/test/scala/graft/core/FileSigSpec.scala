package graft.core

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The shared file-signature helper behind every staleness marker (IVF
  * index, KgRunner staged run, eval slice cache): signature must flip on
  * content/mtime change, stay stable otherwise, and handle a missing input
  * without throwing.
  */
class FileSigSpec extends AnyFunSuite {

  test("single file: stable while unchanged, flips on mtime or size change") {
    val f = Files.createTempFile("filesig", ".dat")
    Files.write(f, "abc".getBytes)
    val s1 = FileSig.of(f.toString)
    assert(s1 == FileSig.of(f.toString), "same bytes+mtime must sign identically")
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(f).toMillis + 1234))
    val s2 = FileSig.of(f.toString)
    assert(s1 != s2, "mtime change must flip the signature")
    Files.write(f, "abcdef".getBytes)
    assert(FileSig.of(f.toString) != s2, "size change must flip the signature")
  }

  test("directory: signs direct children order-independently; child change flips") {
    val d = Files.createTempDirectory("filesigdir")
    Files.write(d.resolve("b.part"), "22".getBytes)
    Files.write(d.resolve("a.part"), "1".getBytes)
    val s1 = FileSig.of(d.toString)
    assert(s1 == FileSig.of(d.toString))
    Files.write(d.resolve("a.part"), "1x".getBytes)
    assert(FileSig.of(d.toString) != s1, "child size change must flip")
  }

  test("missing path signs without throwing and flips once the input appears") {
    val d = Files.createTempDirectory("filesigmiss")
    val p = d.resolve("not_yet.parquet")
    val absent = FileSig.of(p.toString)
    assert(absent.nonEmpty) // lenient branch: no NoSuchFileException
    Files.write(p, "now".getBytes)
    assert(FileSig.of(p.toString) != absent, "appearing input must change the signature")
  }

  test("different paths with missing inputs sign differently") {
    assert(FileSig.of(Paths.get("/no/such/a").toString) !=
      FileSig.of(Paths.get("/no/such/b").toString))
  }
}
