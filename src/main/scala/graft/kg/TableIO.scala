package graft.kg

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin table-layout seam for the ops layer's storage (SURVEY.md §7: "keep a
  * thin TableIO trait so a real Iceberg catalog is a config swap").
  *
  * The north rule targets Iceberg tables; this image has no Iceberg jar
  * (SURVEY env facts), so the shipped implementation emulates the layout
  * with Parquet dirs + the runner's JSON manifests. A production deployment
  * implements this trait over an Iceberg catalog (`spark.table`,
  * `writeTo(...).overwritePartitions()`, partition `bucket(N, doc_id)`) and
  * passes it to [[KgRunner.run]] — no runner changes.
  */
trait TableIO extends Serializable {
  /** overwrite `table` partitioned by `bucketCol` */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String): Unit
  /** idempotently overwrite ONE bucket partition of `table` */
  def writeBucket(df: DataFrame, table: String, bucket: Int): Unit
  /** overwrite an unpartitioned dimension table */
  def write(df: DataFrame, table: String): Unit
  def read(spark: SparkSession, table: String): DataFrame
  /** partition-pruned read of one bucket */
  def readBucket(spark: SparkSession, table: String, bucket: Int): DataFrame
  /** true iff `table` exists with a complete (committed) write */
  def exists(table: String): Boolean
}

/** Parquet-dir emulation: `<root>/<table>[/bucket=<b>]`, `_SUCCESS` as the
  * commit marker (what Iceberg's snapshot commit provides natively).
  */
final class ParquetTableIO(root: String) extends TableIO {
  private def path(table: String) = s"$root/$table"

  def writeBucketed(df: DataFrame, table: String, bucketCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(bucketCol).parquet(path(table))

  def writeBucket(df: DataFrame, table: String, bucket: Int): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"${path(table)}/bucket=$bucket")

  def write(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(table))

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  def readBucket(spark: SparkSession, table: String, bucket: Int): DataFrame =
    spark.read.parquet(s"${path(table)}/bucket=$bucket")

  def exists(table: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path(table), "_SUCCESS"))
}
