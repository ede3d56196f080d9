package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TokSpec extends AnyFunSuite {
  test("tokenize matches Python str.split() semantics") {
    assert(Tok.tokenize("a b c").toSeq == Seq("a", "b", "c"))
    assert(Tok.tokenize("  a   b\tc\n d  ").toSeq == Seq("a", "b", "c", "d"))
    assert(Tok.tokenize("").isEmpty)
    assert(Tok.tokenize("   \t\n").isEmpty)
    assert(Tok.tokenize("one").toSeq == Seq("one"))
  }

  test("prefixTokenCount == len(split(text[:p]))") {
    val text = "  foo   bar baz"
    for (p <- 0 to text.length) {
      assert(Tok.prefixTokenCount(text, p) == Tok.tokenize(text.substring(0, p)).length,
        s"prefix $p")
    }
  }

  test("charSpan reproduces model.py:153-166 offset math") {
    val tokens = Array("alpha", "beta", "gamma", "delta")
    val (v, start, stop) = Tok.charSpan(tokens, 1, 2)
    assert(v == "beta gamma")
    assert(stop == "alpha beta gamma".length)
    assert(start == stop - v.length)
    val text = tokens.mkString(" ")
    assert(text.substring(start, stop) == v)
  }

  test("normalize is idempotent") {
    val t = "  a \t b   c "
    assert(Tok.normalize(t) == "a b c")
    assert(Tok.normalize(Tok.normalize(t)) == Tok.normalize(t))
  }
}
