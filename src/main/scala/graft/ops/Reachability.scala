package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recursive-CTE graph reachability (`WITH RECURSIVE` — Spark 4's
  * UnionLoop execution) over the episode transition graph: for every
  * ordered episode pair, the minimum hop count and the number of
  * distinct walks of length ≤ [[MaxHops]]. The bounded-hop BFS a
  * recommendation / funnel analyst asks of a session graph, expressed
  * in the first-class SQL form a warehouse user would actually write —
  * exercising the engine's recursive-query surface, which nothing else
  * in the battery touches ([[PageRank]] covers the ITERATIVE-driver
  * form of graph compute; this covers the declarative one).
  *
  * Scale shape: each recursion level is one shuffled equi-join of the
  * previous level against the edge table (UnionLoop materializes the
  * per-level frontier), so cost is linear in the number of walks
  * enumerated — the inherent output of a walk-counting query — and the
  * hop bound caps the depth at a constant. The final (src, dst)
  * aggregate collapses walks map-side. Edges derive exactly like
  * [[PageRank.episodePageRank]]'s transitions (one windowed lag pass
  * over cleansed events, session-gap bounded), deduplicated to the
  * distinct edge set so walk counts are graph-structural, not
  * event-weighted.
  *
  * Deterministic end-to-end (integer hops, exact counts), so the
  * DuckDB `WITH RECURSIVE` oracle replays it cell-for-cell. */
object Reachability {

  /** Hop bound: recursion terminates by depth, not by fixpoint — the
    * transition graph is cyclic, so an unbounded walk enumeration
    * would diverge (and min-hop BFS past 3 adds nothing a 20-node
    * episode graph can distinguish). */
  val MaxHops = 3

  def episodeReachability(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val edges = graft.ingest.Events.cleansed(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("episode_id"))
      .withColumn("prev_ts_us", lag(col("ts_us"), 1).over(w))
      .withColumn("src", lag(col("episode_id"), 1).over(w))
      .filter(col("prev_ts_us").isNotNull &&
        col("ts_us") - col("prev_ts_us") < PageRank.GapUs &&
        col("src") =!= col("episode_id"))
      .select(col("src"), col("episode_id").as("dst"))
      .distinct()
    reachability(spark, edges)
  }

  /** Pure form over a (src, dst) edge frame — exposed for the
    * hand-graph spec. */
  def reachability(spark: SparkSession, edges: DataFrame,
                   maxHops: Int = MaxHops): DataFrame = {
    // Materialized once: UnionLoop re-resolves the view every
    // recursion level, and an uncached view would re-run the whole
    // corpus-scale edge derivation per hop (measured 4.4 s → 2.6 s at
    // sf0.1). The edge set is graph-grain (distinct episode pairs),
    // so the cache is small at any corpus size.
    val cached = edges.persist()
    cached.count()
    cached.createOrReplaceTempView("rc_edges")
    spark.sql(
      s"""WITH RECURSIVE reach AS (
         |  SELECT src, dst, 1 AS hops FROM rc_edges
         |  UNION ALL
         |  SELECT r.src, e.dst AS dst, r.hops + 1 AS hops
         |  FROM reach r JOIN rc_edges e ON r.dst = e.src
         |  WHERE r.hops < $maxHops
         |)
         |SELECT src, dst, CAST(min(hops) AS INT) AS min_hops,
         |  count(1) AS n_paths
         |FROM reach GROUP BY src, dst""".stripMargin)
  }
}
