package graft

import org.apache.spark.sql.SparkSession

/** Round-over-round PLAN regression guard — the structural complement
  * to the wall-clock bench. The bench is noisy (ambient bursts swing
  * untouched queries 2–4×), so a silent plan regression on an
  * untouched query — a filter that stopped pushing, a broadcast that
  * became a shuffle, a decorrelation that re-introduced per-row
  * re-execution — can hide inside measurement noise for rounds.
  * PlanSpec pins the highest-value plans individually; this pins ALL
  * of them cheaply: one canonical fingerprint per registered query,
  * committed as `PLANS.json`, diffed per round.
  *
  * Fingerprint = md5 of the OPTIMIZED LOGICAL plan's canonicalized
  * string (pre-AQE, so it is deterministic and data-independent at a
  * fixed scale factor), with environment noise scrubbed: expression
  * ids, the sf-dir path, the warehouse dir, tmp dirs, and
  * localCheckpoint RDD ids. A changed fingerprint is not necessarily
  * a regression — it is a REVIEW PROMPT: explain the query, compare,
  * then either fix or re-record.
  *
  * Known benign-drift class (round 14): a multi-distinct aggregate's
  * gid ASSIGNMENT (RewriteDistinctAggregates) orders its groups by a
  * hash that shifts with the JVM-global ExprId counter — so ADDING a
  * query that plans earlier in the alphabetical battery can renumber
  * another query's gids (same tree, gid 1↔2 swapped, Expand rows and
  * the mid-Aggregate column order swapped with them). Within a FIXED
  * battery the assignment is deterministic (verified across six fresh
  * JVMs), so the guard still catches every real rewrite.
  *
  * That class is AUTO-CLASSIFIED (round 15): alongside the raw record,
  * `write` commits `PLANS_NORM.json` — the same fingerprints computed
  * over a gid-NORMALIZED text ([[normalizeGid]]: on each line that
  * mentions `gid`, integer literals are scrubbed and the line's
  * comma-fragments sorted, so a pure renumbering — same fragments,
  * permuted — hashes identically while any expression/node change on
  * those lines still drifts). `check` then partitions drifts: raw
  * drift + norm stable = BENIGN (gid renumbering, machine-verified —
  * just run `write` and commit, no dump archaeology); norm drift =
  * REAL (exit 1). Lines without `gid` are never normalized, so the
  * norm record is byte-equal in strictness everywhere else.
  *
  * At 149 queries the class turned out to be JVM-UNSTABLE within a
  * fixed battery too (`orders_daily_distinct`'s gid hash sits on a
  * boundary: write and check in fresh JVMs can disagree), so the RAW
  * record may report an intermittent BENIGN — by design not a
  * failure; the NORMALIZED record is the binding guard for plans in
  * this class.
  *
  * Usage (pinned to sf0.01 — fingerprints are per-scale because AQE-
  * independent logical shapes can still differ through fixture
  * parameters derived from data):
  *   graft.PlanFingerprint write   # (re)record PLANS.json + PLANS_NORM.json
  *   graft.PlanFingerprint check   # exit 1 + name every REAL drift;
  *                                 # gid renumbering reports as BENIGN
  */
object PlanFingerprint {

  private val DefaultSf = "/root/testdata/sf0.01"
  private val RecordPath = "PLANS.json"
  private val NormRecordPath = "PLANS_NORM.json"

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Canonical plan text. The RAW optimized plan, not `.canonicalized`:
    * canonicalization re-orders commutative chains and comparison
    * operands by hashCode, and `ExprId.hashCode` seeds from the
    * per-JVM random `jvmId` plus allocation-order ids — so the
    * canonicalized TEXT is less stable across JVMs than the raw rule
    * output, whose ordering is the deterministic product of the
    * optimizer's rewrites. Expression ids themselves are scrubbed
    * textually below, along with paths and JVM object identities. */
  private def canonical(spark: SparkSession, sfDir: String,
                        df: org.apache.spark.sql.DataFrame): String = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val scrubbed = df.queryExecution.optimizedPlan.toString
      .replace(sfDir, "<SF>")
      .replace(warehouse, "<WH>")
      .replaceAll("file:[^\\s,\\)\\]]*", "<PATH>")
      .replaceAll("/tmp/[^\\s,\\)\\]]*", "<TMP>")
      .replaceAll("#\\d+", "#")
      // A persist()ed frame's InMemoryRelation prints its cached
      // PHYSICAL subtree: physical plan ids and JVM object identities
      // (lambda classes, array toString) vary per run — scrub them.
      .replaceAll("\\[plan_id=\\d+\\]", "[plan_id=]")
      .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+", "Lambda")
      .replaceAll("@[0-9a-fA-F]{4,16}", "@")
      // NamedLambdaVariable names carry a JVM-GLOBAL ordinal (`lambda
      // x_5`): any query that allocates lambdas earlier in the battery
      // shifts every later query's ordinals — same environment-noise
      // class as expression ids, scrubbed the same way.
      .replaceAll("lambda x_\\d+", "lambda x_")
    sortCommutative(scrubbed)
  }

  /** Canonicalization orders a commutative chain's children by
    * hashCode — which, for subquery / dynamic-pruning references,
    * seeds from the per-JVM random `ExprId.jvmId` — so the printed
    * `multicommutativeop(...)` argument ORDER is not stable across
    * JVMs. Re-sort every group's top-level arguments textually
    * (innermost first), which is order-canonical after the scrubs. */
  private def sortCommutative(s0: String): String = {
    val token = "multicommutativeop("
    def matchParen(s: String, open: Int): Int = {
      var depth = 0; var j = open
      while (j < s.length) {
        s.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j += 1
      }
      -1
    }
    def splitTopLevel(body: String): Seq[String] = {
      val args = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0; var last = 0
      var j = 0
      while (j < body.length) {
        body.charAt(j) match {
          case '(' | '[' => depth += 1
          case ')' | ']' => depth -= 1
          case ',' if depth == 0 =>
            args += body.substring(last, j).trim; last = j + 1
          case _ =>
        }
        j += 1
      }
      args += body.substring(last).trim
      args.toSeq
    }
    var s = s0
    var idx = s.indexOf(token)
    var guard = 0
    while (idx >= 0 && guard < 100000) {
      guard += 1
      val close = matchParen(s, idx + token.length - 1)
      if (close < 0) return s // unbalanced (a literal) — stop honestly
      val body = s.substring(idx + token.length, close)
      if (body.contains(token)) {
        // Not innermost — find a deeper group first.
        idx = s.indexOf(token, idx + token.length)
      } else {
        val sorted = splitTopLevel(body).sorted.mkString(", ")
        s = s.substring(0, idx) + "MCOP(" + sorted + ")" +
          s.substring(close + 1)
        idx = s.indexOf(token) // restart: outer groups may be next
      }
    }
    s
  }

  /** Gid-renumbering normalizer — the machine check for the one known
    * benign-drift class. On every line that references the
    * RewriteDistinctAggregates `gid` COLUMN (the scrubbed attribute
    * prints as `gid#` — a bare substring match would also fire on
    * user columns merely containing "gid"): scrub integer literals
    * (the gid VALUES live as bare ints inside the Expand projection
    * lists) and sort the line's comma-separated fragments (the Expand
    * rows and mid-Aggregate column order that swap WITH the values).
    * A pure renumbering permutes fragments without changing their
    * multiset → identical normalized text; a real rewrite on those
    * lines changes a fragment → still drifts. Scrubbing alone would
    * also hide a REAL change that only alters a literal on a gid line
    * (a filter constant inside an aggregate, say) — so the line's
    * integer MULTISET, sorted, is appended to the normalized text: a
    * renumbering permutes the same values (multiset unchanged), a
    * changed literal changes it (drift). All other lines pass through
    * untouched. */
  private[graft] def normalizeGid(text: String): String =
    text.linesIterator.map { line =>
      if (GidColumn.findFirstIn(line).isDefined) {
        val ints = IntLit.findAllIn(line).toSeq.sorted
        val scrubbed = line.replaceAll("\\b\\d+\\b", "N")
        scrubbed.split(",", -1).map(_.trim).sorted.mkString(",") +
          ints.mkString(" ints{", ",", "}")
      } else line
    }.mkString("\n")

  private val GidColumn = "\\bgid#".r
  private val IntLit = "\\b\\d+\\b".r

  private def fingerprints(spark: SparkSession, sfDir: String)
      : Seq[(String, String, String)] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, q) =>
        val text =
          try canonical(spark, sfDir, q(spark, sfDir))
          catch { case e: Throwable =>
            sys.error(s"plan build failed for $name: ${e.getMessage}")
          }
        (name, md5(text), md5(normalizeGid(text)))
      }
  }

  private def render(sfDir: String, fps: Seq[(String, String)]): String =
    fps.map { case (n, h) => s"""  "$n": "$h"""" }
      .mkString(s"""{\n  "_sf": "$sfDir",\n""", ",\n", "\n}\n")

  private def parse(text: String): Map[String, String] =
    """"([^"]+)":\s*"([^"]+)"""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2)).toMap - "_sf"

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("check")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", DefaultSf)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-planfp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (mode == "dump") {
        // Debug aid: print the canonical text (SPARK_GRAFT_ONLY to
        // subset) — diff two JVMs' dumps to find unstable content.
        val only = sys.env.get("SPARK_GRAFT_ONLY")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        SparkEntry.queries.toSeq.sortBy(_._1)
          .filter { case (n, _) => only.forall(_.contains(n)) }
          .foreach { case (name, q) =>
            println(s"===== $name =====")
            println(canonical(spark, sfDir, q(spark, sfDir)))
          }
        return
      }
      val fps = fingerprints(spark, sfDir)
      mode match {
        case "write" =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(RecordPath),
            render(sfDir, fps.map(f => (f._1, f._2))).getBytes("UTF-8"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(NormRecordPath),
            render(sfDir, fps.map(f => (f._1, f._3))).getBytes("UTF-8"))
          println(s"recorded ${fps.size} plan fingerprints to " +
            s"$RecordPath + $NormRecordPath")
        case "check" =>
          def readRecord(path: String): Map[String, String] = {
            val p = java.nio.file.Paths.get(path)
            if (java.nio.file.Files.exists(p))
              parse(new String(java.nio.file.Files.readAllBytes(p),
                "UTF-8"))
            else Map.empty
          }
          val recorded = readRecord(RecordPath)
          val recordedNorm = readRecord(NormRecordPath)
          val drifted = fps.filter { case (n, h, _) =>
            recorded.get(n).exists(_ != h)
          }
          // A raw drift whose NORMALIZED fingerprint matches the norm
          // record is the machine-verified gid-renumbering class; one
          // whose norm fingerprint ALSO drifted (or has no norm record
          // to compare) is a real rewrite and fails.
          val (benign, real) = drifted.partition { case (n, _, nh) =>
            recordedNorm.get(n).contains(nh)
          }
          val missing = fps.map(_._1).filterNot(recorded.contains)
          val stale = (recorded.keySet -- fps.map(_._1).toSet).toSeq.sorted
          benign.foreach { case (n, h, _) =>
            println(s"INFO $n: raw ${recorded(n)} -> $h, normalized " +
              "unchanged (gid renumbering — machine-verified, no " +
              "action needed; the raw hash for this class is " +
              "JVM-unstable by design)") }
          real.foreach { case (n, h, _) =>
            println(s"DRIFT $n: ${recorded(n)} -> $h") }
          missing.foreach(n => println(s"NEW $n (not in $RecordPath)"))
          stale.foreach(n => println(s"GONE $n (recorded, no query)"))
          if (real.nonEmpty) {
            println(s"${real.size} plan(s) REALLY drifted — explain, " +
              "review, then fix or re-record with " +
              "`graft.PlanFingerprint write`")
            sys.exit(1)
          }
          println(s"plans stable: ${fps.size} checked, " +
            s"${benign.size} gid-renumber info, ${missing.size} new, " +
            s"${stale.size} retired")
      }
    } finally spark.stop()
  }
}
