package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log-driven incremental maintenance for a TWO-TABLE JOIN view —
  * `V = SELECT dims, SUM(measures) FROM A JOIN B ON jk GROUP BY dims`
  * kept current from the two tables' change logs without re-running
  * the join. [[CdcView]] covers single-table group-bys; a join view
  * adds the classic difficulty that a one-row change on one side can
  * touch MANY view rows through the join — and the classic answer is
  * the signed delta decomposition:
  *
  *   Δ(A ⋈ B)  =  ΔA ⋈ B₁  ∪  A₀ ⋈ ΔB         (signed multisets)
  *
  * where ΔX is the span's net row delta (old images sign −1, new
  * images sign +1 — [[graft.runtime.ChangeLog.netDiff]] images) and
  * the identity telescopes exactly:
  * `ΔA⋈B₁ = A₁⋈B₁ − A₀⋈B₁` and `A₀⋈ΔB = A₀⋈B₁ − A₀⋈B₀`, so the sum
  * is `A₁⋈B₁ − A₀⋈B₀` — the view delta, with no cancellation error
  * because every measure is exact-arithmetic
  * ([[CdcView.requireExactMeasures]], enforced).
  *
  * `A₀` — the left table AS OF the span start — comes from
  * [[graft.runtime.ChangeLog.snapshotAt]], the time-travel
  * reconstruction: the join-view problem is exactly why that
  * operator earns its keep beyond auditing. Scale shape: `ΔA ⋈ B₁`
  * and `A₀ ⋈ ΔB` each join a LOG-SCALE side against a table — the
  * shuffle volume is O(Δ × match fan-out), and the A₀ scan prunes to
  * ΔB's join keys when the caller pre-restricts (pass
  * `aAtStart.join(bDeltaKeys, "left_semi")` — exact, because A₀ rows
  * with no ΔB match contribute nothing to that branch). Nothing here
  * re-reads history deeper than the span.
  *
  * Measures are (name, expression-over-the-joined-columns) pairs
  * rather than a projection function: the signed row weight must ride
  * THROUGH the projection, and an opaque `DataFrame => DataFrame`
  * would drop it. Dims are joined-frame column names. */
object CdcJoinView {

  private[graft] val SignCol = "_cjv_sign"

  /** Signed net row images: o_ images at −1 (every key present at the
    * span start), n_ images at +1 (every key present at the end).
    * Shared with [[CdcStarView]], the N-ary generalization. */
  private[graft] def signedRows(net: DataFrame,
                                keys: Seq[String]): DataFrame = {
    val vals = net.columns.toSeq
      .filter(c => c.startsWith("o_") && !keys.contains(c))
      .map(_.stripPrefix("o_"))
    val minus = net.filter(col("diff_status") =!= "added")
      .select(keys.map(col) ++ vals.map(c => col(s"o_$c").as(c)) :+
        lit(-1L).as(SignCol): _*)
    val plus = net.filter(col("diff_status") =!= "removed")
      .select(keys.map(col) ++ vals.map(c => col(s"n_$c").as(c)) :+
        lit(1L).as(SignCol): _*)
    minus.unionByName(plus)
  }

  /** The DISTINCT join-key values ΔB touches — old AND new images
    * both, because a join-key move restricts A₀ on its source and its
    * destination key alike. This is the semi-join restriction the
    * scaladoc above prescribes for `aAtStart`
    * (`aAtStart.join(deltaJoinKeys(...), joinKeys, "left_semi")` —
    * exact, log-scale), now a named helper so the persisted loop
    * ([[graft.runtime.JoinView]]) and callers share one definition. */
  def deltaJoinKeys(bNet: DataFrame, bKeys: Seq[String],
                    joinKeys: Seq[String]): DataFrame =
    signedRows(bNet, bKeys).select(joinKeys.map(col): _*).distinct()

  /** The per-group contribution delta of the two spans. `aNet`/`bNet`
    * are [[graft.runtime.ChangeLog.netDiff]] frames of each log's
    * span (an empty frame for a side that did not move); `bCurrent`
    * is B AFTER its span; `aAtStart` is A AS OF the A-span's start
    * ([[graft.runtime.ChangeLog.snapshotAt]], optionally
    * semi-restricted to ΔB's join keys). Apply the result with
    * [[CdcView.applyDelta]]. */
  def joinGroupDelta(aNet: DataFrame, aKeys: Seq[String],
                     bNet: DataFrame, bKeys: Seq[String],
                     bCurrent: DataFrame, aAtStart: DataFrame,
                     joinKeys: Seq[String], dims: Seq[String],
                     measures: Seq[(String, Column)]): DataFrame = {
    def contributions(joined: DataFrame): DataFrame =
      joined.select(dims.map(col) ++
        measures.map { case (n, e) => (e * col(SignCol)).as(n) } :+
        col(SignCol).as("n_rows"): _*)
    val fromA = contributions(
      signedRows(aNet, aKeys).join(bCurrent, joinKeys))
    val fromB = contributions(
      aAtStart.join(signedRows(bNet, bKeys), joinKeys))
    val delta = fromA.unionByName(fromB)
      .groupBy(dims.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        measures.map { case (n, _) => sum(col(n)).as(n) }: _*)
    CdcView.requireExactMeasures(delta.schema, measures.map(_._1))
    delta
  }
}
