package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** File-level signature (names + sizes + mtimes — no data scan) of a file or
  * a directory's direct children, MD5-hex. The one shared implementation
  * behind every staleness marker (IVF index `_CORPUS_SIG`, KgRunner
  * `_RUNSIG`, centroid / eval-slice caches), so the lenient missing-path
  * branch and directory-stream hygiene live in a single place instead of
  * drifting across copies.
  */
object FileSig {

  def of(pathStr: String): String = {
    val dir = Paths.get(pathStr)
    val parts: Seq[String] =
      if (Files.isDirectory(dir)) {
        val s = Files.list(dir)
        try {
          val it = s.iterator()
          val b = Seq.newBuilder[String]
          while (it.hasNext) b += entry(it.next())
          b.result().sorted
        } finally s.close()
      } else if (Files.exists(dir)) Seq(entry(dir))
      // absent input signs as the path string — a clear "missing" signature
      // that flips as soon as the input appears, instead of an opaque
      // NoSuchFileException out of the caller's marker check
      else Seq(dir.toString)
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(s => d.update(s.getBytes(StandardCharsets.UTF_8)))
    hex(d.digest())
  }

  private def entry(p: Path): String =
    s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }
}
