package graft

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

import graft.core.Fmt
import graft.ops.Similarity

/** ANN-at-scale benchmark (VERDICT r4 next-round #4): the IVF/LSH layouts
  * are scale-correct by construction, but the largest corpus they were
  * MEASURED on was sf0.1 (~4k vectors). This main synthesizes a
  * deterministic ≥1M-vector corpus (the CcBench pattern: closed-form
  * checkable — vectors are planted-center + bounded noise, so true neighbors
  * share a planted center and brute-force gives exact ground truth), builds
  * the on-disk partitioned IVF index through the production
  * `ensureIvfIndex`, and measures:
  *
  *   - indexed probe reads (`annIvfIndexed`) vs the brute-force scan
  *     (`cosineTopK`) on identical queries — wall time, min of 2 reps;
  *   - on-disk pruned-vs-total bytes: size of the probed `cluster=`
  *     partitions vs the whole index, plus a PartitionFilters plan assert —
  *     the measured row behind the "a probe reads ~probes·rep/clusters of
  *     the corpus via static partition pruning" claim. (Task inputMetrics
  *     were tried and under-report on local-FS scans, so disk accounting is
  *     the honest number.)
  *   - recall@10 vs brute force (must hold ≥ 0.8, same bar as OpsSpec).
  *
  * Usage: runMain graft.AnnBench   (GRAFT_ANN_N overrides the 1M default)
  */
object AnnBench {

  val Dim: Int = Similarity.Dim
  val PlantedCenters = 64
  /** bench-scale IVF shape: the production defaults (k=32, probes=10) were
    * tuned for the tiny sf corpora where 10/32 probed cells is the recall
    * knee; at 1M vectors the index gets cluster room (k=128) and the same
    * probe count, so pruning is visible (10 probes × rep 2 of 128 cells)
    */
  val K = 128
  val Probes: Int = Similarity.IvfProbes
  val Rep: Int = Similarity.IvfAssignRep

  private def splitmix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** deterministic value in [-1, 1] for (i, d) */
  private def unit(i: Long, d: Int): Float =
    (((splitmix(i * 131L + d) >>> 16) & 0xffffff).toDouble / 0x7fffff - 1.0).toFloat

  def centers: Array[Array[Float]] =
    Array.tabulate(PlantedCenters, Dim) { (c, d) =>
      val u = java.lang.Long.remainderUnsigned(
        graft.core.Rng.streamKey(s"annc#$c#$d"), 2000001L)
      (u / 1000000.0 - 1.0).toFloat
    }

  /** corpus: vector i = planted center (i % C) + 0.25·noise — nearest
    * neighbors are same-center by construction, so IVF recall against brute
    * force is a meaningful quality signal, not noise-vs-noise
    */
  def stageCorpus(spark: SparkSession, dir: String, n: Long): Unit = {
    val marker = Paths.get(dir, "_ANN_STAGED")
    val sig = s"annbench-v1:n=$n:dim=$Dim:c=$PlantedCenters"
    if (Files.exists(marker) && Files.readString(marker) == sig) return
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centers)
    spark.range(n).repartition(32).map { i =>
      val c = bc.value((i % PlantedCenters).toInt)
      (i, Array.tabulate(Dim)(d => c(d) + 0.25f * unit(i, d)))
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    bc.destroy()
    Files.writeString(marker, sig)
  }

  private def dirBytes(p: Path): Long = {
    if (!Files.isDirectory(p)) return if (Files.exists(p)) Files.size(p) else 0L
    val s = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(dirBytes).sum
    } finally s.close()
  }

  /** wall sec, min of 2 reps */
  private def timed2(body: => Unit): Double = {
    var best = Double.MaxValue
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      body
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_ANN_N", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val queryMod = math.max(1L, n / 50) // ~50 probe queries
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ann-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"/root/repo/target/annbench/sf_ann$n"
    Files.createDirectories(Paths.get(dir))
    val (_, genSec) = Bench.time(stageCorpus(spark, dir, n))

    val indexDir = s"$dir/ivf_index.parquet"
    val (_, buildSec) = Bench.time(
      Similarity.ensureIvfIndex(spark, dir, indexDir, K, Rep))

    // probed partitions on disk: the same router the query path collects
    val probed = Similarity.annIvfIndexed(spark, dir, indexDir, K, Probes, queryMod)
    val plan = probed.queryExecution.executedPlan.toString
    // non-empty filter required: FileSourceScan prints "PartitionFilters: []"
    // on an unpruned scan too, so a bare contains() would be vacuous
    require(plan.contains("PartitionFilters: [cluster"),
      s"probe scan must be partition-pruned on cluster:\n${plan.take(1200)}")

    val probeSec = timed2(
      Bench.force(Similarity.annIvfIndexed(spark, dir, indexDir, K, Probes, queryMod)))
    val bruteSec = timed2(
      Bench.force(Similarity.cosineTopK(spark, dir, queryMod)))

    // recall@10 vs exact — collect both top-k tables (≤ 50 × 10 rows each)
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topk(Similarity.cosineTopK(spark, dir, queryMod))
    val approx = topk(Similarity.annIvfIndexed(spark, dir, indexDir, K, Probes, queryMod))
    val recall = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exact.size
    require(recall >= 0.8, s"recall@10 $recall below the 0.8 bar")

    // pruned-vs-total on disk: bytes under the probed cluster dirs vs the
    // whole index (rep-weighted — the index stores each vector `Rep` times)
    val probedSet = Similarity.annIvfProbedClusters(spark, dir, K, Probes, queryMod)
    val idxTotal = dirBytes(Paths.get(indexDir))
    val idxProbed = probedSet.map(c => dirBytes(Paths.get(indexDir, s"cluster=$c"))).sum

    val corpusBytes = dirBytes(Paths.get(dir, "embeddings.parquet"))
    val line =
      s"""{"metric":"ann_bench","n":$n,"dim":$Dim,"k":$K,"probes":$Probes,"rep":$Rep,""" +
        s""""queries":${exact.size},"gen_sec":${Fmt.f1(genSec)},"build_sec":${Fmt.f1(buildSec)},""" +
        s""""probe_sec":${Fmt.f2(probeSec)},"brute_sec":${Fmt.f2(bruteSec)},""" +
        s""""index_bytes_total":$idxTotal,"index_bytes_probed":$idxProbed,""" +
        s""""probed_clusters":${probedSet.size},""" +
        s""""pruned_frac":${Fmt.f3(1.0 - idxProbed.toDouble / idxTotal)},""" +
        s""""corpus_bytes":$corpusBytes,"recall_at_10":${Fmt.f3(recall)}}"""
    println(line)

    val md = new StringBuilder
    md ++= "## IVF ANN at 1M vectors — measured (round 5)\n\n"
    md ++= s"`Similarity.ensureIvfIndex` + `annIvfIndexed` on a deterministic synthetic\n"
    md ++= s"corpus (n=$n, dim=$Dim, $PlantedCenters planted centers + bounded noise),\n"
    md ++= s"k=$K clusters, $Probes probes, assignment replication $Rep, local[$cpus].\n"
    md ++= "Pruned-vs-total is the on-disk size of the probed `cluster=` partitions vs\n"
    md ++= "the whole index (the plan is asserted to carry PartitionFilters, so the\n"
    md ++= "probe scan physically touches only those directories); the probe wall time\n"
    md ++= "includes the router scan of the corpus for query vectors.\n\n"
    md ++= "| n | queries | index build (s) | probe (s) | brute force (s) | index probed/total | pruned | recall@10 |\n"
    md ++= "|---|---|---|---|---|---|---|---|\n"
    md ++= s"| $n | ${exact.size} | ${Fmt.f1(buildSec)} | ${Fmt.f2(probeSec)} | ${Fmt.f2(bruteSec)} " +
      s"| ${idxProbed / 1048576}/${idxTotal / 1048576} MiB " +
      s"| ${Fmt.f1(100 * (1.0 - idxProbed.toDouble / idxTotal))}% | ${Fmt.f3(recall)} |\n"
    md ++= s"\n- raw JSON: `$line`\n"
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/ROUND5_ANN.md"), md.toString,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    spark.stop()
  }
}
