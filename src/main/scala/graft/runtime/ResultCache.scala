package graft.runtime

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-RESULT cache keyed on the physical state of the query's
  * input tables: serve a previously-materialized result when the
  * inputs haven't changed, recompute (and re-materialize) when they
  * have. At 100 TB this is the difference between a dashboard query
  * costing a full scan on every refresh and costing one metadata
  * listing: the recompute bill is paid once per INPUT CHANGE, not
  * once per read, and the serving plan is a bare scan of the (small)
  * result.
  *
  * Validity is the inputs' LISTING SIGNATURE — an md5 over every
  * input's recursive file listing (path, length, mtime) — not a
  * high-watermark. Deliberate: watermarks only advance on appends,
  * but this warehouse REWRITES under a fixed watermark (a
  * [[Forget.forgetUser]] partition rewrite, a [[Compaction]], a
  * [[ChangeLog.checkpoint]] fold), and a watermark-keyed cache would
  * serve stale — personal-data-stale, in the forget case — results.
  * The listing catches every rewrite: Spark part-file names carry a
  * fresh job UUID on every write, so any committed mutation changes
  * the signature even when sizes and counts collide; length+mtime
  * back that up. The listing is one metadata sweep per input — the
  * same bill every maintenance op here already pays, O(files), no
  * data read.
  *
  * Consistency caveat, stated not hidden: signature and serve are two
  * reads, so a writer mutating an input BETWEEN them can produce a
  * result computed from a mix — the same torn-read exposure any
  * non-snapshot reader of these tables has, and the staged-swap
  * layout keeps each table internally atomic. The cache never
  * WIDENS the exposure: a hit serves a result that was computed
  * entirely in the past, which is strictly more consistent than a
  * live recompute racing the writer.
  *
  * Crash safety (the [[MergeUpsert]] ordering discipline): the
  * signature is deleted BEFORE the data swaps and rewritten LAST
  * after it, so every crash window leaves either the old (sig, data)
  * pair intact or a missing/mismatched signature — both converge to
  * a recompute. A torn state can cost a redundant recompute, never a
  * stale serve. Concurrent serves of the same name may race the swap
  * (last writer wins, both serve correct data they staged); the
  * single-writer-per-name discipline of every maintenance op here
  * applies.
  *
  * What this is NOT: an incremental view ([[MaterializedView]]
  * applies log deltas; this recomputes from scratch on any change) —
  * the right tool when the query isn't log-maintainable or the
  * inputs aren't change-logged, and the wrong one when a 100 TB
  * input changes every batch (then the recompute fires every batch
  * and the cache only dedups reads BETWEEN batches — still often the
  * win for dashboard-cadence readers). */
object ResultCache {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataDir(cacheRoot: String, name: String) =
    s"$cacheRoot/$name/data"
  private def sigPath(cacheRoot: String, name: String) =
    new Path(s"$cacheRoot/$name/_sig")

  /** The inputs' current listing signature: md5 over every file's
    * (path, length, mtime), recursively, sorted — one metadata sweep
    * per input directory (or file), no data read. A missing input
    * contributes its absence (a table appearing or vanishing changes
    * the signature too). Fields AND entries are NUL-delimited so the
    * encoding is injective: without separators, two distinct listings
    * could encode to the same byte stream (a digit sliding across the
    * length/mtime or mtime/next-path boundary) and collide to one
    * digest — a theoretical stale-serve window in the one component
    * whose whole correctness rests on this hash. NUL cannot appear in
    * a filesystem path and the numbers are plain digits, so every
    * field boundary is unambiguous. */
  def signature(spark: SparkSession, inputDirs: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    inputDirs.sorted.foreach { dir =>
      val p = new Path(dir)
      val fs = fsOf(spark, p)
      md.update(s"|$dir|".getBytes("UTF-8"))
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        val entries = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          entries += s"${st.getPath}\u0000${st.getLen}" +
            s"\u0000${st.getModificationTime}\u0000"
        }
        entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
      } else md.update("absent".getBytes("UTF-8"))
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  private def readSig(spark: SparkSession, cacheRoot: String,
                      name: String): Option[String] = {
    val p = sigPath(cacheRoot, name)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](256)
      var n = in.read(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      Some(new String(buf.toByteArray, "UTF-8").trim)
        .filter(_.nonEmpty)
    } finally in.close()
  }

  /** True when the last serve's signature matches the inputs' current
    * state — exposed so callers (and specs) can distinguish the hit
    * path without serving. */
  def isCurrent(spark: SparkSession, cacheRoot: String, name: String,
                inputDirs: Seq[String], version: String = ""): Boolean = {
    val d = new Path(dataDir(cacheRoot, name))
    readSig(spark, cacheRoot, name)
      .contains(signature(spark, inputDirs) + ":" + version) &&
      fsOf(spark, d).exists(d)
  }

  /** Drop the cached result (the next serve recomputes). */
  def invalidate(spark: SparkSession, cacheRoot: String,
                 name: String): Unit = {
    val root = new Path(s"$cacheRoot/$name")
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
  }

  /** Serve `name`: the cached result when the inputs' signature AND
    * the caller's `version` token match the last materialization (a
    * bare scan — `compute` is not even constructed into a plan), a
    * recompute-and-materialize otherwise. Either way the returned
    * frame reads from the cache directory, so repeated consumption
    * never re-runs the query.
    *
    * `version` is the QUERY's identity, owned by the caller: the
    * listing signature watches the inputs, but nothing here can see
    * that the query's own definition changed (the cache outlives the
    * JVM, and plan-derived fingerprints are not stable across JVMs —
    * [[graft.PlanFingerprint]]'s scrubbing exists because of that).
    * Bump it with the query (a literal `"v2"`, a config hash) or a
    * definition change silently serves the OLD query's result until
    * the next input change.
    *
    * `registerIn` names logged WAREHOUSE tables (typically ⊆ the
    * inputs) whose [[Consumers]] registries should list this cache as
    * a NON-BLOCKING OBSERVER: the collapse ignores it (a cache owes no
    * log span — any input change is caught by the signature), but
    * [[Forget.forgetUser]] / [[Retention.expireBefore]] DELETE the
    * entry when they purge the table, so a materialization that may
    * hold purged rows never outlives the purge on disk (without this,
    * the signature mismatch prevents a stale SERVE but the old bytes
    * persist until the next serve). Leave empty for inputs outside
    * the warehouse (read-only source data has no registry to write). */
  def serve(spark: SparkSession, cacheRoot: String, name: String,
            inputDirs: Seq[String], version: String = "",
            registerIn: Seq[String] = Seq.empty)
           (compute: => DataFrame): DataFrame = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-'),
      s"cache name '$name' must be a [A-Za-z0-9_-]+ token (it names " +
        "a directory)")
    val sig = signature(spark, inputDirs) + ":" + version
    val data = dataDir(cacheRoot, name)
    val dataP = new Path(data)
    val fs = fsOf(spark, dataP)
    // Observer registration is refreshed on every serve (hit or miss):
    // position 0 is meaningless by design — observers never clamp, the
    // signature is the real position — but the refreshed-at stamp
    // keeps the listing honest about which caches are live.
    def registered(df: DataFrame): DataFrame = {
      registerIn.foreach(t => Consumers.register(spark, t,
        s"cache-$name", 0L, viewDir = Some(s"$cacheRoot/$name"),
        observer = true))
      df
    }
    if (readSig(spark, cacheRoot, name).contains(sig) &&
        fs.exists(dataP))
      return registered(spark.read.parquet(data))

    // Miss: retire the signature FIRST (a crash mid-swap must read as
    // a miss, never as "old sig + new data" or vice versa), stage the
    // result, swap, then commit the signature LAST. Stale staging
    // dirs from crashed computes are swept here — invisible to reads
    // (dot-prefixed) but not free on disk.
    val entryRoot = new Path(s"$cacheRoot/$name")
    if (fs.exists(entryRoot))
      fs.listStatus(entryRoot)
        .filter(_.getPath.getName.startsWith(".data-staging-"))
        .foreach(st => fs.delete(st.getPath, true))
    val sp = sigPath(cacheRoot, name)
    if (fs.exists(sp)) fs.delete(sp, false)
    val staging = new Path(
      s"$cacheRoot/$name/.data-staging-${java.util.UUID.randomUUID()}")
    compute.write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(dataP)) fs.delete(dataP, true)
    if (!fs.rename(staging, dataP))
      sys.error(s"result-cache publish failed: $staging -> $dataP")
    val tmp = new Path(sp.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(sig.getBytes("UTF-8")) finally out.close()
    fs.rename(tmp, sp)
    registered(spark.read.parquet(data))
  }

  /** Registered face: TPC-H Q1 served THROUGH the cache. The first
    * serve materializes (or validates a previous run's entry against
    * the live listing), the second must HIT — its compute thunk fails
    * loud if ever forced — and the registered answer is the bare scan
    * of the cached result. The DuckDB oracle recomputes Q1 from
    * scratch, so a stale or torn serve (the failure modes the
    * signature discipline exists to prevent) would hash-mismatch. */
  def q1PricingCached(s: SparkSession, dir: String): DataFrame = {
    val root = graft.sim.AnnIndex.dir(s, dir, "result_cache")
    val inputs = Seq(s"$dir/lineitem.parquet")
    val v = "q1-pricing-v1" // bump with any change to Q1's definition
    serve(s, root, "q1_pricing", inputs, v)(
      graft.tpch.CoreOps.q1PricingSummary(s, dir))
    serve(s, root, "q1_pricing", inputs, v)(
      sys.error("cache hit expected: inputs unchanged between serves"))
  }
}
