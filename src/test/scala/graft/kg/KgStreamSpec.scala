package graft.kg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming KG ingest == batch pipeline: the stream path (file source →
  * streaming detect mapPartitions → stream-static broadcast link) must emit
  * exactly the rows the batch slice pipeline produces.
  */
class KgStreamSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("kgstream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("streaming detect+link emits exactly the batch slice linking") {
    val cols = Seq("doc_id", "mention_id", "kind", "text", "media_ref",
      "start_tok", "len", "order", "entity_id", "dict_kind", "prior")
    val stream = KgStream.linkedStream(spark, sfDir, queryName = "kg_stream_spec")
      .select(cols.head, cols.tail: _*)
    val batch = Eval.sliceLinked(spark, sfDir).select(cols.head, cols.tail: _*)
    val got = rowSet(stream)
    val want = rowSet(batch)
    assert(got.nonEmpty, "stream emitted no linked mentions")
    assert(got == want,
      s"stream vs batch diff: onlyStream=${(got -- want).take(3)} onlyBatch=${(want -- got).take(3)}")
  }
}
