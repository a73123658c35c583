package graft

import graft.ops.IntervalJoin

/** Interval-overlap join arms: measured selection at the cap boundary,
  * and cell-for-cell equality of the salted hot-bucket pass against the
  * plain per-bucket join (the DedupSpec arm pattern). */
class IntervalJoinSpec extends SparkSpec {

  test("arm selection is measured, both directions") {
    assert(IntervalJoin.selectArm(IntervalJoin.HotBucketCap) ==
      IntervalJoin.ColdArm)
    assert(IntervalJoin.selectArm(IntervalJoin.HotBucketCap + 1) ==
      IntervalJoin.SaltArm)
    assert(IntervalJoin.selectArm(0L) == IntervalJoin.ColdArm)
  }

  test("salted hot-bucket arm == plain arm cell-for-cell") {
    // cap=4 makes every real hour-bucket hot, so the whole corpus runs
    // through the 2-D salt split (g = ceil(m/4) groups, both sides
    // fanned ×g) — and must reproduce the plain join exactly: same
    // candidate pairs exactly once each, same overlap filter, same
    // counts.
    val dir = "/root/testdata/sf0.001"
    def rows(arm: IntervalJoin.Arm, cap: Long) =
      IntervalJoin.concurrentSessions(spark, dir, arm, cap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    val plain = rows(IntervalJoin.ColdArm, IntervalJoin.HotBucketCap)
    val salted = rows(IntervalJoin.SaltArm, 4L)
    assert(plain == salted,
      s"arm divergence: plain-only=${(plain -- salted).take(3)} " +
        s"salted-only=${(salted -- plain).take(3)}")
    assert(plain.nonEmpty && plain.exists(_._4 > 0L),
      "fixture must exercise real overlaps")
    // AutoArm at harness scale resolves to the plain plan.
    assert(rows(IntervalJoin.AutoArm, IntervalJoin.HotBucketCap) == plain)
  }
}
