package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the missing half of near-dup dedup: pair detection gives edges;
  * choosing ONE survivor per duplicate cluster needs the components.
  *
  * Algorithm: iterative minimum-label propagation. Each round every
  * node adopts the smallest label in its closed neighborhood; converges
  * in O(diameter) rounds. Each round is two shuffles (join + min-agg)
  * over the edge list — the standard large-graph pattern when the
  * cluster diameter is small (near-dup clusters are tiny cliques, so
  * 2-4 rounds in practice). Checkpoint-free: label frames are cached
  * and the previous round unpersisted to keep lineage bounded.
  */
object ConnectedComponents {

  /** Edge-count threshold below which the components are solved with
    * driver-side union-find instead of iterative propagation. 4M edges
    * is ~64 MB on the driver — far inside any real driver budget — and
    * the dedup pair graphs this serves are SPARSE by construction
    * (bucket/block caps + exact verification bound the edges, not the
    * corpus), so at 100 TB most runs still land under it. The win is
    * structural: union-find is one job + O(E α(E)) driver work, where
    * the propagation loop pays O(diameter) sequential Spark stages —
    * pure scheduling latency on graphs this small. */
  val LocalSolveMaxEdges = 4000000L

  /** @param edges two-column DataFrame (src, dst), undirected.
    * @return (node, component) where component = min node id reachable. */
  def run(edges: DataFrame, srcCol: String = "id_a", dstCol: String = "id_b",
          maxIter: Int = 20, localSolveMaxEdges: Long = LocalSolveMaxEdges): DataFrame = {
    // Size-adaptive: count is ~free when the caller cached the pair
    // frame (dropNearDuplicates does; the count doubles as the cache
    // materialization the symmetrize union needs anyway). The local
    // path packs ids into Long — only integral id columns may take it
    // (a string/decimal id would silently NULL-out or change equality
    // under cast("long"), diverging from the propagation path).
    if (localSolveMaxEdges > 0 &&
        isIntegral(edges.schema(srcCol).dataType) &&
        isIntegral(edges.schema(dstCol).dataType) &&
        edges.limit(
        (localSolveMaxEdges + 1).min(Int.MaxValue.toLong).toInt)
        .count() <= localSolveMaxEdges)
      return runLocal(edges, srcCol, dstCol)
    // no distinct(): callers emit each undirected pair once (id_a <
    // id_b), so the two union directions cannot collide — and even if
    // a caller passed duplicates, min-label propagation is unaffected
    // by edge multiplicity. Saves a full shuffle of the edge list.
    // repartition by the join key: the per-round label join then
    // reuses the cached hash partitioning instead of re-shuffling the
    // (large) edge side every iteration — only the (small) label frame
    // moves per round.
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .repartition(col("v"))
      .cache()
    val nodes = sym.select(col("u").as("node")).distinct()
    // localCheckpoint truncates lineage each round — iterative joins
    // otherwise stack a plan tree per iteration (planning cost grows
    // superlinearly and eventually OOMs the driver, long before the
    // executors feel anything).
    // lazy like the round checkpoints: round 1's materialization (via
    // the first convergence check) computes it — no standalone init job
    var labels = nodes.withColumn("comp", col("node")).localCheckpoint(false)
    // Sum-fixpoint convergence is INTEGRAL-only (same gate as the local
    // solve): fractional ids (double/float/scaled decimal) round under
    // cast("decimal(38,0)"), so a strict label decrease inside one unit
    // (2.4 -> 2.1) can leave the sum unchanged and declare convergence
    // with unconverged labels. Everything non-integral takes the exact
    // per-node change check instead.
    val integralIds = isIntegral(edges.schema(srcCol).dataType) &&
      isIntegral(edges.schema(dstCol).dataType)
    var converged = false
    var iter = 0
    var prevSum: Option[java.math.BigDecimal] = None
    while (!converged && iter < maxIter) {
      // Smallest comp in the closed neighborhood, TWO shuffles per
      // round: propagate labels across edges (join on v), then union
      // the nodes' own labels in before the min — the self label rides
      // the same groupBy shuffle, where a labels⋈neighborMin left join
      // would be a third exchange.
      // (Pointer-jumping — adopting comp[comp] each round for
      // O(log diameter) convergence — was measured SLOWER here: the
      // extra self-join per round costs more than the 2 rounds it
      // saves on near-dup graphs, whose diameter is already small.)
      val next = sym
        .join(labels.select(col("node").as("v"), col("comp").as("c")), "v")
        .select(col("u").as("node"), col("c"))
        .union(labels.select(col("node"), col("comp").as("c")))
        .groupBy("node").agg(min("c").as("comp"))
        .localCheckpoint(false)
      iter += 1
      // Convergence = the label-sum fixpoint: min-label propagation
      // only ever DECREASES labels, so any change strictly decreases
      // Σcomp, and two checked rounds with equal sums mean nothing
      // moved in between. The check is a 1-row aggregate over the
      // checkpointed frame (LAZY checkpoint: this is also the action
      // that materializes the round) — no join against the previous
      // round, no `changed` bookkeeping column. decimal(38,0): exact
      // at any node-count × id-range the engine will meet.
      // Near-dup cliques converge in 2-4 rounds: checking every 2nd
      // round (and on the last) halves the driver-side job count —
      // at scale the per-round cost is job-scheduling latency, not
      // data. Worst case one extra (label-identical) round runs.
      if (iter % 2 == 0 || iter == maxIter) {
        if (integralIds) {
          val s = next.agg(sum(col("comp").cast("decimal(38,0)"))).first.getDecimal(0)
          converged = prevSum.exists(_.compareTo(s) == 0)
          prevSum = Some(s)
        } else {
          // Non-integral labels (string ids: no lossless numeric cast;
          // fractional ids: decimal rounding can mask a change). Exact
          // check instead: did any node's label change since last
          // round? One join of two node-sized frames per checked round.
          converged = next
            .join(labels.select(col("node"), col("comp").as("prev")), "node")
            .where(col("comp") =!= col("prev"))
            .isEmpty
        }
      }
      labels = next
    }
    sym.unpersist()
    labels
  }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Driver-side union-find with min-id roots: unions always attach
    * the larger root under the smaller, so each tree's root IS the
    * component minimum — byte-identical output to the propagation
    * loop. One collect, no iteration, no per-round stages. */
  private def runLocal(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp)
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val nodes = new java.util.TreeSet[java.lang.Long]()
    es.foreach { case (a, b) => nodes.add(a); nodes.add(b) }
    val out = new Array[(Long, Long)](nodes.size)
    var i = 0
    nodes.forEach { n => out(i) = (n.longValue, find(n.longValue)); i += 1 }
    val dt = edges.schema(srcCol).dataType
    spark.createDataFrame(out.toSeq).toDF("node", "comp")
      .select(col("node").cast(dt).as("node"), col("comp").cast(dt).as("comp"))
  }

  /** Keep one representative (min id) per near-dup cluster: rows of
    * `df` minus every non-minimal member of each component. Nodes not
    * in any edge survive untouched. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame,
                         srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    // run() scans the edge list twice (the symmetrization union):
    // without this cache the whole upstream pair-detection pipeline
    // (shingling, jaccard join) executes once per direction.
    val comps = run(pairs.cache(), srcCol, dstCol)
    val victims = comps.where(col("node") =!= col("comp"))
      .select(col("node").as(idCol))
    df.join(victims, Seq(idCol), "left_anti")
  }

  /** Keep the BEST representative per near-dup cluster instead of the
    * minimal id: within each component the survivor is the member
    * maximizing `scoreCol` (ties to the lower id) — the curation-aware
    * variant (keep the highest-quality copy, drop the rest). Nodes not
    * in any edge survive untouched.
    *
    * Scale shape: the component frame is node-sized (edges' endpoints
    * only — orders below the corpus under capped pair detection), the
    * score join touches only those nodes, and the per-component argmax
    * is a WindowGroupLimit-executable row_number over the component
    * key. The corpus itself sees one anti-join against the victim ids. */
  def dropNearDuplicatesByScore(df: DataFrame, idCol: String, pairs: DataFrame,
                                scoreCol: org.apache.spark.sql.Column,
                                srcCol: String = "id_a",
                                dstCol: String = "id_b"): DataFrame = {
    val comps = run(pairs.cache(), srcCol, dstCol)
    val scored = comps.join(
      df.select(col(idCol).as("node"), scoreCol.as("_score")), Seq("node"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("comp").orderBy(col("_score").desc, col("node").asc)
    val victims = scored
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") > 1)
      .select(col("node").as(idCol))
    df.join(victims, Seq(idCol), "left_anti")
  }
}
