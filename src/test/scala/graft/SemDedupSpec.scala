package graft

import graft.sim.{KMeans, SemDedup, Similarity}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** SemDeDup cluster-scoped semantic dedup: brute-force parity of the
  * dominance rule against a driver-side replay on the real sf0.001
  * corpus, structural invariants of the verdict frame, and the
  * no-cross-join plan contract (the cluster key must bound the pair
  * search). */
class SemDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Tau = 0.80

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("keep/drop verdicts match a driver-side brute-force replay") {
    val verdicts = SemDedup.dedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getBoolean(3)))
    val assigned = KMeans.fit(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
    val emb = Similarity.quantizedNonZero(spark, dir)
      .select("vec_id", "q", "n").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toArray, r.getLong(2))))
      .toMap

    assert(verdicts.length == assigned.length,
      "one verdict per assigned (nonzero) vector")

    val byCluster = assigned.groupBy(_._2)
    val expectedDropped = assigned.filter { case (id, c, cent) =>
      byCluster(c).exists { case (oid, _, ocent) =>
        oid != id &&
          (ocent < cent || (ocent == cent && oid < id)) && {
            val (qa, na) = emb(id); val (qb, nb) = emb(oid)
            val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
            r6(dot.toDouble /
              (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))) >= Tau
          }
      }
    }.map(_._1).toSet

    val gotDropped = verdicts.filter(!_._3).map(_._1).toSet
    assert(gotDropped == expectedDropped)
  }

  test("every cluster keeps at least one member") {
    val verdicts = SemDedup.dedup(spark, dir)
      .collect().map(r => (r.getInt(2), r.getBoolean(3)))
    val byCluster = verdicts.groupBy(_._1)
    byCluster.foreach { case (c, vs) =>
      assert(vs.exists(_._2), s"cluster $c kept no member")
    }
  }

  test("pair search is a cluster equi-join, never a cross join") {
    val plan = SemDedup.dedup(spark, dir).queryExecution.executedPlan
    def collectAll(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(collectAll)
    val nodes = collectAll(plan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "cartesian product in the SemDeDup plan")
    // The only nested-loop joins allowed are the broadcast of the k·dim
    // centroid frame inside KMeans.assign (bounded by k, not by N²).
    val nl = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(nl.forall(_.toString.contains("BuildRight")) || nl.isEmpty)
  }
}
