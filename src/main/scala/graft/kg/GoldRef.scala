package graft.kg

import java.util.Locale
import scala.collection.mutable
import graft.core._

/** Sequential, collections-only re-derivation of the ENTIRE pipeline
  * (docs → mentions → dict → link → CC → triples) used as the golden
  * reference for tests (SURVEY.md §5.4): the distributed DataFrame pipeline
  * must reproduce these outputs exactly (per-row span-sequence equality;
  * triple P/R). Deliberately implemented with plain loops + union-find —
  * an independent code path from the Spark jobs it validates.
  */
object GoldRef {

  private val HexChars = "0123456789abcdef".toCharArray

  def bytesToHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(2 * i) = HexChars(v >>> 4)
      out(2 * i + 1) = HexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def md5hex(s: String): String = {
    val d = Md5.get()
    d.reset()
    bytesToHex(d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  def mdFrac(s: String): Double =
    java.lang.Long.parseLong(md5hex(s).substring(0, 6), 16) / 16777216.0

  def kindOf(s: String): String =
    Mentions.Kinds(java.lang.Long.parseLong(md5hex(s).substring(6, 10), 16).toInt % Mentions.Kinds.length)

  def entity(alias: String, salt: String = ""): String = "E" + md5hex(alias + salt).take(12)

  def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  // ------------------------------------------------------------ dictionary

  def ngrams(docs: Seq[PyramidDoc]): Set[String] = {
    val out = mutable.HashSet.empty[String]
    docs.foreach { d =>
      val toks = d.spans.filter(_.kind == "text").sortBy(_.offset).map(_.text)
      for (len <- 1 to 3; i <- 0 to toks.length - len)
        out += lower(toks.slice(i, i + len).mkString(" "))
    }
    out.filter(_.nonEmpty).toSet
  }

  def dict(docs: Seq[PyramidDoc]): Seq[AliasRow] = {
    val aliases = ngrams(docs).filter(a => mdFrac(a) < AliasDict.Selectivity).toSeq.sorted
    aliases.flatMap { a =>
      val primary = AliasRow(a, entity(a), kindOf(a), mdFrac(a + "#p") * 0.5 + 0.5)
      val secondary =
        if (mdFrac(a + "#a") < AliasDict.Ambiguity && a.contains(" ")) {
          val head = a.split(" ")(0)
          Some(AliasRow(a, entity(head), kindOf(head), mdFrac(a + "#q") * 0.5))
        } else None
      primary +: secondary.toSeq
    }
  }

  // -------------------------------------------------------------- mentions

  def mentions(docs: Seq[PyramidDoc], model: Mentions.Model): Seq[Mention] = {
    val inf = new PyramidInference(model.weights, model.vocab)
    docs.flatMap(d => Mentions.detectDoc(d, inf, model.codec))
  }

  // ------------------------------------------------------- link + CC + kg

  final case class Best(entityId: String, kind: String, prior: Double)

  def bestCandidates(rows: Seq[AliasRow]): Map[String, Best] =
    rows.groupBy(_.alias).map { case (a, rs) =>
      val b = rs.maxBy(r => (r.prior, r.entity_id))
      a -> Best(b.entity_id, b.kind, b.prior)
    }

  /** union-find canonical map: every entity in an edge → min of its component */
  def canonicalMap(rows: Seq[AliasRow]): Map[String, String] = {
    val parent = mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    rows.groupBy(_.alias).values.foreach { rs =>
      val es = rs.map(_.entity_id).distinct.sorted.take(Canonical.MaxCandidatesPerAlias)
      if (es.length > 1) es.tail.foreach(e => union(es.head, e))
    }
    val nodes = rows.groupBy(_.alias).values.flatMap { rs =>
      val es = rs.map(_.entity_id).distinct.sorted.take(Canonical.MaxCandidatesPerAlias)
      if (es.length > 1) es else Nil
    }.toSet
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  def triples(docs: Seq[PyramidDoc], model: Mentions.Model): Set[Triple] = {
    val d = dict(docs)
    val best = bestCandidates(d)
    val canon = canonicalMap(d)
    val out = mutable.HashSet.empty[Triple]
    val inf = new PyramidInference(model.weights, model.vocab)
    docs.foreach { doc =>
      val linked = Mentions.detectDoc(doc, inf, model.codec).flatMap { m =>
        best.get(lower(m.text)).map { b =>
          val c = canon.getOrElse(b.entityId, b.entityId)
          (m, b, c)
        }
      }
      linked.foreach { case (m, b, c) =>
        out += Triple(c, "instance_of", b.kind)
        out += Triple(c, "mentioned_in", doc.doc_id)
        if (m.media_ref.nonEmpty) out += Triple(c, "depicted_in", m.media_ref)
      }
      linked.sliding(2).foreach {
        case Seq((_, _, c1), (_, _, c2)) if c1 != c2 =>
          out += Triple(c1, "co_occurs_with", c2)
        case _ => ()
      }
    }
    out.toSet
  }
}
