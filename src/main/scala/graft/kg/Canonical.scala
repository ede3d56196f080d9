package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 3 — canonicalization: connected components over candidate-entity
  * edges, via alternating large-star / small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond" — the PAPERS.md "BTS" lineage), as an
  * iterative DataFrame loop. No GraphX, no RDDs (input_hint); lineage is
  * truncated with localCheckpoint every iteration, convergence is detected
  * with a cheap (count, hash-sum) fingerprint instead of a full diff.
  *
  * O(log n) rounds; each round is two self-joins on the min-neighbor
  * aggregate. Hot head-token stars (the skew case) are exactly what
  * large-star splits.
  */
object Canonical {

  /** Per-alias candidate cap for edge derivation: a degenerate alias carrying
    * thousands of candidates would square inside the pair expansion; capping
    * at the SORTED first k keeps per-alias work bounded and deterministic
    * (the synthetic dict has ≤2 candidates; a real KB occasionally more).
    */
  val MaxCandidatesPerAlias = 16

  /** candidate edges from the dictionary: an alias carrying k candidate
    * entities connects ALL of them pairwise (shared-alias ambiguity,
    * SURVEY.md §7 stage 3) — a (min, max)-only derivation would silently
    * split components when an alias has ≥3 candidates.
    */
  def edgesFromDict(dict: DataFrame): DataFrame =
    dict.groupBy("alias")
      .agg(slice(sort_array(collect_set(col("entity_id"))), 1, MaxCandidatesPerAlias).as("es"))
      .where(size(col("es")) > 1)
      .select(explode(expr(
        "flatten(transform(es, (x, i) -> transform(slice(es, i + 2, size(es)), " +
          "y -> struct(x as src, y as dst))))")).as("e"))
      .select(col("e.src"), col("e.dst"))
      .distinct()

  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .where(col("u") =!= col("v"))
    val minN = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.join(minN, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    // orient each edge large -> small
    val dir = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
    val minN = dir.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    dir.join(minN, "u")
      .select(col("v").as("src"), col("m").as("dst"))
      .unionAll(minN.select(col("u").as("src"), col("m").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  private def fingerprint(edges: DataFrame): (Long, Long) = {
    // decimal sum: ANSI mode (Spark 4 default) would overflow a Long sum
    val row = edges.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("h")).head()
    (row.getLong(0), row.getDecimal(1).hashCode().toLong)
  }

  /** Below this many edges the graph fits comfortably on the driver; an
    * in-memory union-find beats ~6 Spark jobs per star round. The distributed
    * loop remains the path for KB-scale graphs.
    */
  val DriverCcThreshold = 500000L

  /** edges → (entity_id, canonical_id) mapping covering every node that
    * appears in an edge (isolated entities stay their own canonical id via
    * the coalesce at apply time).
    */
  def connectedComponents(edges0: DataFrame, maxIter: Int = 20,
                          driverThreshold: Long = DriverCcThreshold): DataFrame =
    connectedComponentsWithStats(edges0, maxIter, driverThreshold)._1

  /** run statistics for benchmarking/diagnostics: which path ran and how many
    * star rounds the distributed loop needed (0 on the driver fast path)
    */
  final case class CcStats(edgesIn: Long, usedDriverPath: Boolean, iterations: Int)

  def connectedComponentsWithStats(edges0: DataFrame, maxIter: Int = 20,
                                   driverThreshold: Long = DriverCcThreshold): (DataFrame, CcStats) = {
    var edges = edges0.select("src", "dst").where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nIn = edges.count()
    if (nIn <= driverThreshold)
      return (driverUnionFind(edges), CcStats(nIn, usedDriverPath = true, 0))
    var fp = fingerprint(edges)
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nfp = fingerprint(next)
      converged = nfp == fp
      edges = next
      fp = nfp
      i += 1
    }
    // star forest: edges point child -> root; roots map to themselves
    val out = edges.select(col("src").as("entity_id"), col("dst").as("canonical_id"))
      .unionAll(edges.select(col("dst").as("entity_id"), col("dst").as("canonical_id")))
      .groupBy("entity_id").agg(min("canonical_id").as("canonical_id"))
    (out, CcStats(nIn, usedDriverPath = false, i))
  }

  /** small-graph fast path: collect + union-find with min-root, one job in,
    * one local DataFrame out. Same output contract as the star loop
    * (component minimum as canonical id) — KgPipelineSpec pins both paths
    * against GoldRef's independent union-find.
    */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val pairs = edges.as[(String, String)].collect()
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    nodes.iterator.map(n => (n, find(n))).toSeq.sortBy(_._1)
      .toDF("entity_id", "canonical_id")
  }

  /** canonical-map rows above which the broadcast join flips to shuffle —
    * same sizing rationale as Link.BroadcastMaxAliases (the map rows are
    * narrower, so the threshold is higher).
    */
  val BroadcastMaxMapRows = 2000000L

  /** Size-guarded canonicalize: the map is an aggregate the caller usually
    * persists, so the count probe is cheap; broadcast vs shuffle follows the
    * actual row count instead of a static flag.
    */
  def canonicalizeAuto(linked: DataFrame, canonMap: DataFrame,
                       maxBroadcastRows: Long = BroadcastMaxMapRows): DataFrame =
    canonicalize(linked, canonMap, useBroadcast = canonMap.count() <= maxBroadcastRows)

  /** apply the canonical map to linked mentions; map is usually ≪ corpus →
    * broadcast, but caller can disable for huge KBs.
    */
  def canonicalize(linked: DataFrame, canonMap: DataFrame, useBroadcast: Boolean = true): DataFrame = {
    val m = if (useBroadcast) broadcast(canonMap) else canonMap
    linked.join(m, Seq("entity_id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("entity_id")))
  }
}
