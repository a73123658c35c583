package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[PlanFingerprint.normalizeGid]] — the machine classifier for
  * the one known benign plan-drift class (RewriteDistinctAggregates
  * gid renumbering, see PlanFingerprint scaladoc). The shapes below
  * are cut-down versions of the real drift observed five times in
  * round 14 on `orders_daily_distinct`: gid literals 1↔2 swapped, the
  * Expand row list and the mid-Aggregate column order swapped with
  * them, everything else byte-identical. */
class PlanFingerprintSpec extends AnyFunSuite {

  // The round-14 drift, miniaturized: same tree, gids renumbered.
  private val planGid12 =
    """Aggregate [d#], [d#, count(if ((gid# = 1)) u# else null) AS nu#, count(if ((gid# = 2)) w# else null) AS nw#]
      |+- Aggregate [d#, u#, w#, gid#], [d#, u#, w#, gid#]
      |   +- Expand [[d#, u#, null, 1], [d#, null, w#, 2]], [d#, u#, w#, gid#]
      |      +- Project [d#, u#, w#]
      |         +- Relation [<SF>] parquet""".stripMargin

  private val planGid21 =
    """Aggregate [d#], [d#, count(if ((gid# = 2)) u# else null) AS nu#, count(if ((gid# = 1)) w# else null) AS nw#]
      |+- Aggregate [d#, w#, u#, gid#], [d#, w#, u#, gid#]
      |   +- Expand [[d#, null, w#, 1], [d#, u#, null, 2]], [d#, u#, w#, gid#]
      |      +- Project [d#, u#, w#]
      |         +- Relation [<SF>] parquet""".stripMargin

  test("a pure gid renumbering normalizes to the identical text") {
    assert(PlanFingerprint.normalizeGid(planGid12) ===
      PlanFingerprint.normalizeGid(planGid21))
  }

  test("a real rewrite on a gid line still drifts after normalization") {
    // Same renumbering, but the second distinct now counts v# instead
    // of w# — a genuine expression change that must NOT normalize away.
    val realChange = planGid21
      .replace("count(if ((gid# = 1)) w# else null)",
        "count(if ((gid# = 1)) v# else null)")
    assert(PlanFingerprint.normalizeGid(planGid12) !==
      PlanFingerprint.normalizeGid(realChange))
  }

  test("a structural change on a gid line (extra Expand row) drifts") {
    val extraRow = planGid12.replace(
      "Expand [[d#, u#, null, 1], [d#, null, w#, 2]]",
      "Expand [[d#, u#, null, 1], [d#, null, w#, 2], [d#, null, null, 3]]")
    assert(PlanFingerprint.normalizeGid(planGid12) !==
      PlanFingerprint.normalizeGid(extraRow))
  }

  test("a literal-only change on a gid line drifts (the integer " +
      "multiset rides the normalized text), and a user column merely " +
      "containing 'gid' is never normalized") {
    // Scrubbing alone would hash these identically — the appended
    // sorted integer multiset ({1,2} vs {1,5}) keeps the guard strict
    // on gid lines (round-16 ADVICE fix).
    val litChange = planGid12
      .replace("(gid# = 2)) w#", "(gid# = 5)) w#")
    assert(PlanFingerprint.normalizeGid(planGid12) !==
      PlanFingerprint.normalizeGid(litChange))
    // The line predicate is the gid COLUMN marker (`gid#`), not a
    // bare substring: a user column named around 'gid' passes through
    // byte-identical, integer literals intact.
    val userCol = "Project [orig_gid_col#, n#, 42]"
    assert(PlanFingerprint.normalizeGid(userCol) === userCol)
  }

  test("lines without gid pass through byte-identical") {
    val noGid =
      """Filter (o_total# > 100)
        |+- Project [o_id#, o_total#, ts_2024]
        |   +- Relation [<SF>] parquet""".stripMargin
    assert(PlanFingerprint.normalizeGid(noGid) === noGid)
    // In particular: integer literals OUTSIDE gid lines (a filter
    // constant, a limit) must stay — changing them is a real drift.
    val constChange = noGid.replace("> 100", "> 200")
    assert(PlanFingerprint.normalizeGid(noGid) !==
      PlanFingerprint.normalizeGid(constChange))
  }
}
