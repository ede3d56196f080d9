package graft.core

/** Tokenization + span math reproducing the reference's semantics.
  *
  * Reference: `pyramid_nested_ner/utils/text.py:1-2` (`default_tokenizer =
  * text.split()`) and the canonical char-offset → token-offset rule at
  * `pyramid_nested_ner/vectorizers/labels/__init__.py:83-84`.
  *
  * Python's argument-less `str.split()` splits on runs of arbitrary
  * whitespace and drops leading/trailing whitespace (never yields empty
  * tokens). We replicate that exactly.
  */
object Tok {

  /** Python `str.split()` equivalent. */
  def tokenize(text: String): Array[String] = {
    if (text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
        out += text.substring(start, i)
      }
    }
    out.toArray
  }

  /** A token with its char span (Python split alignment: tokens are the
    * maximal non-whitespace runs; `end` exclusive).
    */
  final case class TokSpan(text: String, start: Int, end: Int)

  /** `tokenize` plus char offsets — the alignment the wrg reader rebuilds
    * via `str.find(" ")` (`utils/data.py:106-111`), generalized to arbitrary
    * whitespace.
    */
  def tokenizeWithOffsets(text: String): Array[TokSpan] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TokSpan]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
        out += TokSpan(text.substring(start, i), start, i)
      }
    }
    out.toArray
  }

  /** Token count of the prefix `text[0:charPos)` — the reference's
    * `len(tokenize(text[:entity.start]))` (labels/__init__.py:83).
    */
  def prefixTokenCount(text: String, charPos: Int): Int = {
    val p = math.max(0, math.min(charPos, text.length))
    var i = 0
    var count = 0
    while (i < p) {
      while (i < p && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < p) {
        count += 1
        while (i < p && !Character.isWhitespace(text.charAt(i))) i += 1
      }
    }
    count
  }

  /** Reference `model.py:139`: text is normalized as `" ".join(tokenize(text))`
    * before anything else touches it.
    */
  def normalize(text: String): String = tokenize(text).mkString(" ")

  /** Char-offset reconstruction from a token index + token length, exactly as
    * `model.py:153-166`:
    *   value = " ".join(tokens[t : t+l])
    *   stop  = len(" ".join(tokens[: t+l]))
    *   start = stop - len(value)
    * (`l` here is the span token-length, i.e. reference `l + 1`.)
    */
  def charSpan(tokens: Array[String], startTok: Int, lenTok: Int): (String, Int, Int) = {
    val value = tokens.slice(startTok, startTok + lenTok).mkString(" ")
    var stop = 0
    var i = 0
    val end = math.min(startTok + lenTok, tokens.length)
    while (i < end) {
      stop += (if (i == 0) tokens(i).length else tokens(i).length + 1)
      i += 1
    }
    (value, stop - value.length, stop)
  }
}
