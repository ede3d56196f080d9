package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Asserts LabelCodec against golden fixtures re-derived by the
  * dependency-free Python port of the reference encoder
  * (`tools/gen_golden.py` → `src/test/resources/golden/decode_cases.json`).
  * See FIXTURES.md §4.
  */
class LabelCodecGoldenSpec extends AnyFunSuite {

  private val cases: List[JValue] = {
    val in = getClass.getResourceAsStream("/golden/decode_cases.json")
    require(in != null, "golden/decode_cases.json missing — run tools/gen_golden.py")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    JsonMethods.parse(txt) match {
      case JArray(cs) => cs
      case other      => fail(s"unexpected golden JSON: $other")
    }
  }

  private def str(j: JValue): String = j match { case JString(s) => s; case x => fail(s"not a string: $x") }
  private def int(j: JValue): Int = j match {
    case JInt(i) => i.toInt
    case JLong(l) => l.toInt
    case x => fail(s"not an int: $x")
  }
  private def arr(j: JValue): List[JValue] = j match {
    case JArray(a) => a
    case JNothing | JNull => Nil
    case x => fail(s"not an array: $x")
  }

  private def tokSpans(text: String, ents: List[JValue]): Seq[TokSpan] =
    ents.map { e =>
      val start = int(e \ "start")
      val value = str(e \ "value")
      TokSpan(str(e \ "name"), Tok.prefixTokenCount(text, start), Tok.tokenize(value).length)
    }

  /** golden remedy row (list of "B-kind"/"I-kind") → our Long mask */
  private def rowMask(codec: LabelCodec, row: List[JValue]): Long =
    row.foldLeft(0L) { (m, tag) =>
      val s = str(tag)
      val k = codec.entities.indexOf(s.drop(2))
      require(k >= 0, s"unknown kind in $s")
      m | (if (s.startsWith("B-")) codec.bBit(k) else codec.iBit(k))
    }

  for (c <- cases) {
    val id = str(c \ "id")
    val kinds = arr(c \ "kinds").map(str)
    val maxDepth = int(c \ "maxDepth")
    val text = str(c \ "text")
    val tokens = Tok.tokenize(text)
    val codec = new LabelCodec(kinds)
    val spans = tokSpans(text, arr(c \ "entities"))

    test(s"[$id] single-label encode matches reference re-derivation") {
      val (layers, remedy) = codec.encodeSingle(tokens.length, spans, maxDepth)
      val goldLayers = arr(c \ "layers").map(l => arr(l).map(int))
      assert(layers.length == goldLayers.length, "layer count")
      layers.zip(goldLayers).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got.toSeq == want, s"layer ${i + 1}")
      }
      val goldRemedy = c \ "remedy" match {
        case JNull | JNothing => None
        case JArray(rows)     => Some(rows.map(r => rowMask(codec, arr(r))))
        case x                => fail(s"bad remedy: $x")
      }
      assert(remedy.map(_.toSeq) == goldRemedy.map(_.toSeq), "remedy bitmap")
    }

    test(s"[$id] single-label decode + char-offset reconstruction match") {
      val (layers, remedy) = codec.encodeSingle(tokens.length, spans, maxDepth)
      val decoded = codec.decodeSingle(layers, remedy, maxDepth)
      val gold = arr(c \ "decoded").map { d =>
        (str(d \ "name"), int(d \ "startTok"), int(d \ "lenTok"),
          str(d \ "value"), int(d \ "start"), int(d \ "stop"))
      }
      assert(decoded.length == gold.length, "mention count")
      val normTokens = Tok.tokenize(Tok.normalize(text))
      decoded.zip(gold).foreach { case (got, (name, st, ln, value, start, stop)) =>
        assert(got.kind == name && got.startTok == st && got.lenTok == ln, s"span $got")
        val (v, s0, s1) = Tok.charSpan(normTokens, got.startTok, got.lenTok)
        assert(v == value && s0 == start && s1 == stop, s"char span of $got")
      }
    }

    test(s"[$id] multi-label encode matches reference re-derivation") {
      val (layers, remedy) = codec.encodeMulti(tokens.length, spans, maxDepth)
      val goldLayers = arr(c \ "multiLayers").map(l => arr(l).map(ng => arr(ng).map(str)))
      assert(layers.length == goldLayers.length, "layer count")
      layers.zip(goldLayers).zipWithIndex.foreach { case ((got, want), i) =>
        val wantMasks = want.map(_.foldLeft(0L)((m, n) => m | (1L << codec.entities.indexOf(n))))
        assert(got.toSeq == wantMasks, s"layer ${i + 1}")
      }
      val goldRemedy = c \ "multiRemedy" match {
        case JNull | JNothing => None
        case JArray(rows)     => Some(rows.map(r => rowMask(codec, arr(r))))
        case x                => fail(s"bad remedy: $x")
      }
      assert(remedy.map(_.toSeq) == goldRemedy.map(_.toSeq), "remedy bitmap")
    }

    test(s"[$id] multi-label decode matches") {
      val (layers, remedy) = codec.encodeMulti(tokens.length, spans, maxDepth)
      val decoded = codec.decodeMulti(layers, remedy, maxDepth)
      val gold = arr(c \ "multiDecoded").map { d =>
        TokSpan(str(d \ "name"), int(d \ "startTok"), int(d \ "lenTok"))
      }
      assert(decoded.toList == gold)
    }
  }
}
