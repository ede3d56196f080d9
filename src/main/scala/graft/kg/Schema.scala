package graft.kg

/** Row types of the KG-construction pipeline (BASELINE.json input_hint):
  * input is an Iceberg-style table of interleaved text + media documents
  * `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`;
  * output is `(subj, pred, obj)` triples.
  */

/** One interleaved span. kind = "text" | "media" (entity kinds appear only in
  * mention/gold tables, never in the input docs — FIXTURES.md §1/§2).
  */
final case class SpanRec(kind: String, text: String, media_ref: String, offset: Int)

final case class PyramidDoc(doc_id: String, spans: Array[SpanRec])

/** A detected mention. `start_tok`/`len` are in text-token space; `order` is
  * the reference decode enumeration position (layers asc, then remedy);
  * `media_ref` is the nearest media span within the attach window ("" if none).
  */
final case class Mention(
    doc_id: String,
    mention_id: String,
    kind: String,
    text: String,
    media_ref: String,
    start_tok: Int,
    len: Int,
    order: Int)

/** Alias-dictionary row (FIXTURES.md §3). */
final case class AliasRow(alias: String, entity_id: String, kind: String, prior: Double)

/** Mention linked to its best dictionary candidate. */
final case class LinkedMention(
    doc_id: String,
    mention_id: String,
    kind: String,
    text: String,
    media_ref: String,
    start_tok: Int,
    len: Int,
    order: Int,
    entity_id: String,
    prior: Double)

final case class Triple(subj: String, pred: String, obj: String)
