package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dedup cluster resolution (SURVEY §2.3 Tier C): near-dup pair lists
  * (q24–q26) name EDGES, but a dedup policy needs COMPONENTS — "keep one
  * doc per duplicate cluster" requires resolving transitive chains
  * (a~b, b~c ⇒ {a,b,c} is one cluster even if a and c never paired).
  *
  * q59 resolves q26's verified Jaccard pairs into connected components
  * by iterative min-label propagation: every clustered doc converges to
  * the minimum doc_id reachable from it, which is a unique fixed point —
  * deterministic regardless of execution order, so the result is fully
  * oracle-checkable (DuckDB computes the same fixed point via a
  * recursive transitive-closure CTE).
  */
object GraphOps {

  /** Iteration guard: near-dup clusters are shallow (duplicate families,
    * not long chains), so propagation converges in a handful of rounds;
    * the cap turns a surprise pathological graph into a loud error
    * instead of an unbounded driver loop. */
  private val MaxIters = 25

  /** Minimum reachable label per node of an undirected edge list.
    * One round = one shuffle-join of labels onto edges + one min-agg;
    * rounds needed = component diameter. At 100 TB-scale graphs with
    * long chains you'd switch to the alternating large-star/small-star
    * algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
    * and Beyond" — O(log²​ n) rounds) or pointer doubling; for dedup
    * families (diameter ≲ 5) plain propagation does fewer total shuffles.
    * Each round's result is materialized via persist + count so the
    * lineage stays one round deep (an uncached loop would re-execute
    * every prior round per action, exponentially). */
  private[graft] def minLabel(edges: DataFrame): DataFrame = {
    // The propagation loop runs join+agg PER ROUND over a pair-list-
    // sized frame (thousands of rows at test scale; pair lists are
    // always corpus-sparse). At 32 shuffle partitions each round pays
    // 32 empty-partition task overheads × 2 shuffles; sizing the
    // rounds' shuffles to the frame (8) halves the loop's wall clock
    // without touching semantics. A 100 TB pair list sizes this UP —
    // the knob is frame volume, the same rule as streaming state
    // partitions (StreamHarness.withStreamingPartitions).
    graft.Confs.withShufflePartitions(edges.sparkSession, 8)(minLabelLoop(edges))
  }

  private def minLabelLoop(edges: DataFrame): DataFrame = {
    val ss = edges.sparkSession
    import ss.implicits._
    // Symmetric closure once; scanned every round → persist.
    val sym = edges.select($"src", $"dst")
      .unionAll(edges.select($"dst".as("src"), $"src".as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select($"src".as("node")).distinct()
      .withColumn("label", $"node")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Convergence probe: per-node labels only ever DECREASE (min-merge),
    // so Σlabel strictly decreases until the fixed point — comparing two
    // longs replaces a per-round anti-join, and the agg is a partial
    // (map-side) aggregate with no shuffle of its own. sum() over an
    // EMPTY label set is null (an edgeless graph — a corpus with no
    // near-dup pairs is normal, not an error), hence the 0L default.
    def labelSum(df: DataFrame): Long = {
      val cell = df.agg(sum($"label")).head
      if (cell.isNullAt(0)) 0L else cell.getLong(0)
    }
    var prevSum = labelSum(labels)
    var converged = labels.isEmpty // nothing to propagate on an empty graph
    var iters = 0
    // Frames persisted by the loop that an exception must release: the
    // current `labels` plus (transiently) the round's `next` before the
    // swap — otherwise a mid-probe failure pins blocks for the session.
    var pending: DataFrame = null
    try {
      while (!converged) {
        iters += 1
        require(iters <= MaxIters,
          s"connected components did not converge in $MaxIters rounds")
        // Labels flowing across edges, min-merged with each node's own.
        val prop = sym.join(labels, $"dst" === $"node")
          .select($"src".as("node"), $"label")
        val next = labels.unionAll(prop)
          .groupBy($"node").agg(min($"label").as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        pending = next
        val curSum = labelSum(next)
        labels.unpersist(blocking = false)
        labels = next
        pending = null
        converged = curSum == prevSum
        prevSum = curSum
      }
    } catch {
      // The iteration-cap (or any mid-round) failure must not leave the
      // round's frames pinned in the block manager for the session's life.
      case t: Throwable =>
        labels.unpersist(blocking = false)
        if (pending != null) pending.unpersist(blocking = false)
        sym.unpersist(blocking = false)
        throw t
    }
    sym.unpersist(blocking = false)
    labels
  }

  /** q59 — near-dup cluster resolution: q26's verified pairs → connected
    * components → one row per clustered doc with its cluster id (the
    * component's min doc_id — the canonical "keep" representative under
    * a keep-first policy) and the cluster size. Singleton docs (no
    * near-dup pair) are by design absent: at 100 TB the pair list is
    * millions of rows where the corpus is billions, and clustering only
    * the paired minority keeps every shuffle pair-list-sized. */
  val q59 = QuerySpec(
    "q59_dedup_cluster_resolve",
    (s, d) => {
      import s.implicits._
      val pairs = NearDup.q26.run(s, d)
        .select($"doc_a".as("src"), $"doc_b".as("dst"))
      val labels = minLabel(pairs)
      val sizes = labels.groupBy($"label").agg(count(lit(1)).as("cluster_size"))
      val out = labels.join(sizes, "label")
        .select($"node".as("doc_id"), $"label".as("cluster_id"),
          $"cluster_size".cast("int").as("cluster_size"))
        .orderBy($"doc_id")
      // Sever the result from the loop's persisted frames: materialize
      // before unpersist so labels can be freed eagerly.
      val rows = out.collect()
      labels.unpersist(blocking = false)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    },
    // Assembled via mkString, not stripMargin: the embedded q26 SQL
    // contains || concat operators (stripMargin corrupts lines that
    // START with ||; mkString sidesteps the class of bug entirely).
    NearDup.q26.oracle.map(jacSql => Seq(
      s"WITH RECURSIVE cand AS (${jacSql.replace("ORDER BY doc_a, doc_b", "")}),",
      "edges AS (SELECT doc_a AS a, doc_b AS b FROM cand",
      "          UNION ALL SELECT doc_b, doc_a FROM cand),",
      "reach(src, node) AS (",
      "  SELECT DISTINCT a, a FROM edges",
      "  UNION",
      "  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),",
      "lbl AS (SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY src),",
      "sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY cluster_id)",
      "SELECT l.doc_id, l.cluster_id, CAST(sz.cluster_size AS INT) AS cluster_size",
      "FROM lbl l JOIN sz USING (cluster_id)",
      "ORDER BY doc_id").mkString("\n")),
  )

  /** q94 — semantic dedup with a keep policy (the SemDeDup shape:
    * embedding-similarity clusters, one survivor each): q27's cosine
    * pairs resolve to connected components (minLabel), and within each
    * cluster the representative is the HIGHEST-ENERGY member (max
    * squared L2 norm, ties to min vec_id) — "keep the most informative
    * copy", the embedding-space analogue of q57's longest-copy policy.
    * Norms are sequential-fold doubles computed identically on both
    * engines, so the argmax never flakes. At 100 TB the pairs come from
    * q24/q28 blocks, not the all-pairs join; everything downstream of
    * the pair list is pair-count-sized (labels, sizes, one window over
    * clusters). */
  val q94 = QuerySpec(
    "q94_semantic_dedup_keep",
    (s, d) => {
      import s.implicits._
      import graft.functions.VectorOps.{asDouble, normSq}
      val pairs = NearDup.q27.run(s, d)
        .select($"vec_a".as("src"), $"vec_b".as("dst"))
      val labels = minLabel(pairs)
      val sizes = labels.groupBy($"label").agg(count(lit(1)).as("cluster_size"))
      val energy = graft.Tables.embeddings(s, d)
        .select($"vec_id", normSq(asDouble($"embedding")).as("energy"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"label").orderBy($"energy".desc, $"node")
      val out = labels.join(sizes, "label")
        .join(energy, $"node" === $"vec_id")
        .withColumn("rk", row_number().over(w))
        .select($"node".as("vec_id"), $"label".as("cluster_id"),
          $"cluster_size".cast("int").as("cluster_size"),
          ($"rk" === 1).as("kept"))
        .orderBy($"vec_id")
      val rows = out.collect()
      labels.unpersist(blocking = false)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    },
    NearDup.q27.oracle.map(cosSql => Seq(
      s"WITH RECURSIVE cand AS (${cosSql.replace("ORDER BY vec_a, vec_b", "")}),",
      "edges AS (SELECT vec_a AS a, vec_b AS b FROM cand",
      "          UNION ALL SELECT vec_b, vec_a FROM cand),",
      "reach(src, node) AS (",
      "  SELECT DISTINCT a, a FROM edges",
      "  UNION",
      "  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),",
      "lbl AS (SELECT src AS vec_id, min(node) AS cluster_id FROM reach GROUP BY src),",
      "sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY cluster_id),",
      s"en AS (SELECT vec_id, ${Det.sqlNormSq("CAST(embedding AS DOUBLE[])")} AS energy FROM embeddings),",
      "rk AS (SELECT l.vec_id, l.cluster_id, sz.cluster_size, ",
      "  row_number() OVER (PARTITION BY l.cluster_id ORDER BY en.energy DESC, l.vec_id) AS r",
      "  FROM lbl l JOIN sz USING (cluster_id) JOIN en USING (vec_id))",
      "SELECT vec_id, cluster_id, CAST(cluster_size AS INT) AS cluster_size,",
      "  (r = 1) AS kept",
      "FROM rk ORDER BY vec_id").mkString("\n")),
  )

  val all: Seq[QuerySpec] = Seq(q59, q94)
}
