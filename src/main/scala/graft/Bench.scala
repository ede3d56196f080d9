package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.ModelConfig
import graft.kg.{DocGen, Mentions, Triples}

/** Driver benchmark main: runs every SparkEntry query (forced to full
  * materialization via the noop sink) plus the amplified KG-pipeline
  * headline, prints ONE JSON line in the driver schema.
  */
object Bench {

  def force(df: DataFrame): Long = {
    df.write.format("noop").mode("overwrite").save()
    -1L
  }

  def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** 1-min host load average minus this JVM's own cores — the same external
    * contention signal ScalingBench records, so a noise-polluted battery row
    * is machine-flaggable from the JSON alone.
    */
  private def externalLoad(selfCpus: Double): Double = {
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    math.max(0.0, os.getSystemLoadAverage - selfCpus)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val amplify = sys.env.getOrElse("GRAFT_AMPLIFY", "8").toInt
    // the reference's real experiment shape (GENIA: depth 8, 200-d) costs
    // ~5.6x the default per token (InferBench calibration) — bench it at a
    // smaller amplification so the secondary headline stays bounded
    val amplifyGenia = sys.env.getOrElse("GRAFT_AMPLIFY_GENIA", "2").toInt
    // GRAFT_CFG=genia flips the PRIMARY headline to the reference-shaped
    // model; by default the primary is the default config and a genia
    // secondary headline is emitted alongside it
    val cfgName = sys.env.getOrElse("GRAFT_CFG", "default")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selfCpus = cpus.toDouble

    // fixture staging (reader-format files, sequential KG goldens) is input
    // prep, not operator cost — run it OUTSIDE the timed region so the first
    // query to touch a cold stage dir doesn't absorb a one-time ~60 s
    val (_, stageSec) = time {
      graft.sources.ReaderStage.stage(spark, sfDir)
      graft.kg.KgStage.stage(spark, sfDir)
      // the bucketed checkpointed run behind kg_triples_compacted is also
      // one-time staging (signature-guarded) — pay it here, not in rep 1
      graft.kg.KgRunner.ensureRun(spark, sfDir,
        graft.sources.ReaderStage.stageDir(sfDir).resolve("kgrun").toString)
    }

    // failures are reported EXPLICITLY (failed list + negative sentinel time)
    // — a swallowed exception must not masquerade as a plausible duration.
    // A query that failed once is SKIPPED on later passes (re-running a
    // known-failing query would only re-pay its wall time).
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // R full INTERLEAVED battery passes, min per query ACROSS passes: the
    // sandbox host has bursty multi-minute noisy-neighbor windows, and
    // back-to-back reps of one query share the same window (round-3 battery
    // showed a 7 s query as a 119 s row even with min-of-2). Interleaving
    // puts a full battery (~minutes) between a query's reps, so the min is
    // taken across DIFFERENT contention windows.
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "2").toInt
    require(reps >= 1, s"GRAFT_BENCH_REPS must be >= 1, got $reps")
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // per query: (best sec, ext_load of the best rep)
    val best = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    for (_ <- 1 to reps) {
      names.foreach { case (name, fn) =>
        if (!failed.contains(name)) {
          val load0 = externalLoad(selfCpus)
          val (ok, sec) = time {
            try { force(fn(spark, sfDir)); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              failed += name
              false
            }
          }
          val extLoad = (load0 + externalLoad(selfCpus)) / 2
          // several operators persist intermediates they legitimately reuse
          // within one query (jaccard shingles, simhash bands, slice docs);
          // drop them between queries so storage-memory pressure from query
          // k doesn't tax query k+1
          spark.catalog.clearCache()
          if (ok && best.get(name).forall(_._1 > sec)) best(name) = (sec, extLoad)
        }
      }
    }
    val results = names.map { case (name, _) =>
      name -> (if (failed.contains(name)) (-1.0, 0.0) else best(name))
    }

    // headline: full KG pipeline on the amplified corpus, triples/sec.
    // Input prep (docs materialization, model/lexicon build, token count) is
    // OUTSIDE the timed region — same methodology as ScalingBench, so the
    // two reports are comparable.
    def headline(cfg: ModelConfig, amp: Int): (Double, Long, Long, Long, Double) = {
      val docs = DocGen.amplifiedDocs(spark, sfDir, amp).cache()
      val nDocs = docs.count()
      val model = Mentions.buildModel(docs, cfg)
      val nTokens = docs.toDF().selectExpr("sum(size(filter(spans, s -> s.kind = 'text')))")
        .head().getLong(0)
      val h = Triples.pipelineHandle(docs, model)
      val (_, kgSec) = time {
        force(h.triples)
      }
      val nTriples = h.triples.count() // cached subtrees — count is cheap
      h.unpersistAll()
      docs.unpersist()
      spark.catalog.clearCache()
      (kgSec, nTriples, nDocs, nTokens, externalLoad(selfCpus))
    }

    // A headline failure (e.g. an OOM at the genia shape) must not discard
    // the minutes of battery measurement already done — the single result
    // line is printed no matter what, with -1 sentinels for the failed
    // headline (same convention as a failed battery query).
    def safeHeadline(tag: String, cfg: ModelConfig, amp: Int): (Double, Long, Long, Long, Double) =
      try headline(cfg, amp)
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $tag headline FAILED: ${e.getMessage}")
          (-1.0, -1L, -1L, -1L, 0.0)
      }

    val primaryCfg = if (cfgName == "genia") ModelConfig.genia else ModelConfig()
    val (kgSec, nTriples, nDocs, nTokens, kgLoad) = safeHeadline(cfgName, primaryCfg, amplify)
    // secondary headline at the OTHER config, so every BENCH_r*.json carries
    // both the default-shape and the reference-(GENIA-)shaped throughput
    val secondaryName = if (cfgName == "genia") "default" else "genia"
    val secondaryCfg = if (cfgName == "genia") ModelConfig() else ModelConfig.genia
    val (gSec, gTriples, gDocs, gTokens, gLoad) =
      safeHeadline(secondaryName, secondaryCfg, amplifyGenia)

    import graft.core.Fmt.f1
    def perSec(n: Long, sec: Double): Double = if (sec > 0) n / sec else -1.0
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val loads = results.map { case (k, (_, l)) => "\"" + k + "\":" + f1(l) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2._1).filter(_ >= 0).sum + math.max(kgSec, 0)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""failed":$failedJson,"reps":$reps,"ext_load":$loads,""" +
        s""""stage_prep_sec":$stageSec,"cfg":"$cfgName",""" +
        s""""kg_pipeline_sec":$kgSec,"kg_triples":$nTriples,"kg_docs":$nDocs,""" +
        s""""kg_tokens":$nTokens,"kg_amplify":$amplify,"kg_ext_load":${f1(kgLoad)},""" +
        s""""kg_triples_per_sec":${perSec(nTriples, kgSec)},"kg_tokens_per_sec":${perSec(nTokens, kgSec)},""" +
        s""""cfg_2":"$secondaryName","kg2_pipeline_sec":$gSec,"kg2_triples":$gTriples,""" +
        s""""kg2_docs":$gDocs,"kg2_tokens":$gTokens,"kg2_amplify":$amplifyGenia,""" +
        s""""kg2_ext_load":${f1(gLoad)},""" +
        s""""kg2_triples_per_sec":${perSec(gTriples, gSec)},"kg2_tokens_per_sec":${perSec(gTokens, gSec)}}""")
    spark.stop()
  }
}
