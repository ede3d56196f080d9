package graft.core

/** Word + char id spaces reproducing the reference vectorizers.
  *
  * Word: `vectorizers/text/word.py:23-33` — {PAD:"<PAD>"→0, lexicon…, UNK last};
  * OOV → UNK.
  * Char: `vectorizers/text/char.py:8-28` — PAD '□'=0, Basic Latin chr(32..126),
  * Latin-1 supplement chr(161..254), UNK '¤' last (id 190). The reference
  * raises KeyError on out-of-alphabet chars (`char.py:37`); inputs are
  * sanitized upstream (`utils/data.py:29` maps non-printable to '¤'). We fold
  * the sanitize into the lookup: any out-of-alphabet char → UNK.
  */
final class WordVocab(val lexicon: Array[String]) extends Serializable {
  val padId = 0
  private val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](lexicon.length * 2)
    var i = 0
    while (i < lexicon.length) { m.putIfAbsent(lexicon(i), Integer.valueOf(i + 1)); i += 1 }
    m
  }
  val unkId: Int = lexicon.length + 1
  val size: Int = lexicon.length + 2 // PAD + lexicon + UNK

  def id(token: String): Int = {
    val v = index.get(token)
    if (v eq null) unkId else v.intValue
  }

  def ids(tokens: Array[String]): Array[Int] = {
    val out = new Array[Int](tokens.length)
    var i = 0
    while (i < tokens.length) { out(i) = id(tokens(i)); i += 1 }
    out
  }
}

object CharVocab extends Serializable {
  // PAD(0) + chr(32..126) (95) + chr(161..254) (94) + UNK(last) = 191 symbols.
  val size = 191
  val padId = 0
  val unkId = 190
  val unkChar = '¤' // '¤'

  /** char → id; out-of-alphabet → UNK (sanitize folded in, utils/data.py:29). */
  def id(c: Char): Int = {
    if (c >= 32 && c <= 126) c - 32 + 1
    else if (c >= 161 && c <= 254) c - 161 + 96
    else unkId
  }

  def ids(token: String): Array[Int] = {
    val out = new Array[Int](token.length)
    var i = 0
    while (i < token.length) { out(i) = id(token.charAt(i)); i += 1 }
    out
  }

  /** Sanitize a string into the reference alphabet (for fixture/table gen). */
  def sanitize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // keep whitespace (tokenizer boundary), map other out-of-alphabet to '¤'
      if ((c >= 32 && c <= 126) || (c >= 161 && c <= 254) || Character.isWhitespace(c)) sb.append(c)
      else sb.append(unkChar)
      i += 1
    }
    sb.toString
  }
}
