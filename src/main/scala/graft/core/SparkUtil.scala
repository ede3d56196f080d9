package graft.core

import org.apache.spark.sql.Dataset

/** Shared Spark plumbing helpers. */
object SparkUtil {

  /** Widen a narrow input to the cluster's parallelism before a CPU-bound
    * per-partition stage. A 100 TB scan has thousands of splits, but a
    * small/compacted input (a coalesce(1) staged table, a single parquet
    * file) arrives as ONE split and would serialize the whole stage through
    * one core — the trap every compute-bound mapPartitions in this codebase
    * must defend against (mention detection, media decode). The `.rdd`
    * partition probe is plan metadata only (no job), and the exchange moves
    * each row once.
    */
  def widen[T](ds: Dataset[T]): Dataset[T] = {
    val par = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < par) ds.repartition(par) else ds
  }
}
