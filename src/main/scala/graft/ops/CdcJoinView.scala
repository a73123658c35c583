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

  /** [[joinGroupDelta]] for a LEFT OUTER join view —
    * `V = SELECT dims, SUM(ms) FROM A LEFT JOIN B ON jk GROUP BY dims`
    * — the shape every reference gold join takes (J1–J9, e.g.
    * `gold_user_daily_metrics.py:80-82`: metrics ⟕ side aggregates
    * where zero-match groups must survive). The classic hard IVM
    * case: an A row's contribution is its JOINED rows when B has
    * matches for its key and ONE NULL-EXTENDED row when it has none,
    * so a ΔB that creates a key's FIRST match (or removes its LAST)
    * must also retract (or restore) the null-extended contributions
    * of every A row on that key — the count-augmented outer-join
    * delta. Telescoping, term by term:
    *
    *  - `A₁⟕B₁ − A₀⟕B₁` is row-local in A, so it is the signed
    *    `ΔA ⟕ B₁` — one LEFT join of the signed images (unmatched
    *    delta rows come through null-extended with their sign);
    *  - `A₀⟕B₁ − A₀⟕B₀` splits per join key k by B's match count:
    *    while it stays positive the difference is the inner
    *    `A₀ ⋈ ΔB`; a 0→m transition additionally RETRACTS the
    *    null-extended A₀ rows on k (sign −1); an m→0 transition
    *    restores them (sign +1). The match counts come from B₁ and
    *    ΔB alone (`cnt₀ = cnt₁ − Σ signs`), both restricted to ΔB's
    *    keys — no maintained count table, no extra state to crash.
    *
    * NULL measure semantics, stated: contributions are summed with
    * NULL reading as 0 (the signed fold cannot distinguish "group
    * with only null-extended rows" from any other zero-sum), so a
    * view measure over a B column reads 0 — not SQL's NULL — for
    * all-unmatched groups. Mirror with `COALESCE(SUM(e), 0)` (equal
    * everywhere else). `aAtStart` must cover ΔB's join keys (the
    * usual semi-restriction is exact here too: an A₀ row off ΔB's
    * keys has identical output against B₀ and B₁). */
  def leftJoinGroupDelta(aNet: DataFrame, aKeys: Seq[String],
                         bNet: DataFrame, bKeys: Seq[String],
                         bCurrent: DataFrame, aAtStart: DataFrame,
                         joinKeys: Seq[String], dims: Seq[String],
                         measures: Seq[(String, Column)]): DataFrame = {
    def contributions(joined: DataFrame): DataFrame =
      joined.select(dims.map(col) ++
        measures.map { case (n, e) =>
          coalesce(e * col(SignCol), lit(0L)).as(n) } :+
        col(SignCol).as("n_rows"): _*)
    val signedB = signedRows(bNet, bKeys)
    // Term 1 — A moved: signed ΔA LEFT-joined to B₁; an unmatched
    // image carries null B columns and still counts (COUNT(*)).
    val fromA = contributions(
      signedRows(aNet, aKeys).join(bCurrent, joinKeys, "left"))
    // Term 2a — B moved, matched part: the inner A₀ ⋈ ΔB.
    val fromB = contributions(aAtStart.join(signedB, joinKeys))
    // Term 2b — match-count transitions on ΔB's keys. cnt₁ counts B₁
    // rows per key (probe restricted to ΔB's keys — log-scale);
    // cnt₀ = cnt₁ − Σ signs. Keys crossing zero flip their A₀ rows'
    // null-extended contributions: first match retracts them (−1),
    // last unmatch restores them (+1).
    val cnt1 = bCurrent
      .join(signedB.select(joinKeys.map(col): _*).distinct(),
        joinKeys, "left_semi")
      .groupBy(joinKeys.map(col): _*)
      .agg(count(lit(1)).as("_cjv_c1"))
    val transitions = signedB
      .groupBy(joinKeys.map(col): _*)
      .agg(sum(col(SignCol)).as("_cjv_net"))
      .join(cnt1, joinKeys, "left")
      .withColumn("_cjv_c1", coalesce(col("_cjv_c1"), lit(0L)))
      .withColumn("_cjv_c0", col("_cjv_c1") - col("_cjv_net"))
      .filter((col("_cjv_c0") === 0 && col("_cjv_c1") > 0) ||
        (col("_cjv_c0") > 0 && col("_cjv_c1") === 0))
      .select(joinKeys.map(col) :+
        when(col("_cjv_c0") === 0, lit(-1L)).otherwise(lit(1L))
          .as(SignCol): _*)
    val bNullCols = bCurrent.schema.fields
      .filterNot(f => joinKeys.contains(f.name))
      .map(f => lit(null).cast(f.dataType).as(f.name))
    val fromTransitions = contributions(
      aAtStart.join(transitions, joinKeys)
        .select((col("*") +: bNullCols.toSeq): _*))
    val delta = fromA.unionByName(fromB).unionByName(fromTransitions)
      .groupBy(dims.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        measures.map { case (n, _) => sum(col(n)).as(n) }: _*)
    CdcView.requireExactMeasures(delta.schema, measures.map(_._1))
    delta
  }
}
