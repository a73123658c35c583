package graft.text

import graft.functions.SignatureExpressions
import graft.util.{Layout, Num}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection — the scale path for fuzzy dedup
  * (blocked trigram Jaccard in [[TextOps.ngramJaccard]] is the exact
  * baseline it is verified against in DedupSpec).
  *
  * The registered contract is what a 100 TB training-data pipeline
  * actually consumes: a **doc → canonical cluster assignment** (connected
  * components of the "exact trigram Jaccard ≥ threshold" graph), not the
  * pair list — on a template-heavy corpus the pair list is Θ(N²) while the
  * assignment stays Θ(N).
  *
  * Candidate generation has TWO arms, either of which can feed the one
  * exact-Jaccard confirm:
  *
  *  - **LSH arm** (the scale path): trigrams → [[NumPerms]] permutation
  *    min-hashes → [[Bands]] bands → bucket self-join → candidate edges →
  *    signature-agreement pre-filter. Probabilistic (a borderline pair can
  *    miss every band), but per-bucket work stays linear even on dense
  *    template families (hub edges, below).
  *  - **Prefix-filter arm** (the exactness guarantee): classic set-
  *    similarity-join prefix filtering ([[prefixCandidates]]) is complete —
  *    every pair with Jaccard ≥ threshold shares a token in its
  *    frequency-ordered prefix, so its candidate set provably contains
  *    every true edge and the confirmed graph (hence its components) is
  *    EXACT, not approximate.
  *
  * The registered query MEASURES which arm to run ([[AutoArm]]): the
  * prefix arm alone while its estimated join volume stays within
  * [[PrefixBudgetPerDoc]] (a complete arm makes LSH candidates pure
  * overhead — measured at sf0.1, the union added ~6.7M already-covered
  * pairs for zero new edges), the LSH arm past the budget (template
  * families / dense corpora, where prefix pays O(family²)) at its
  * documented miss probability (BASELINE.md).
  *
  * All hash parameters are fixed constants (LCG-derived), so results are
  * deterministic across runs and partitionings. No UDFs: signatures are
  * nested higher-order expressions (transform/aggregate) plus the native
  * expressions in graft.functions, fully codegen'd.
  */
object MinHashDedup {

  // 128 permutations in 32 bands of 4: a pair at exactly the 0.6
  // threshold collides in some band with p = 1-(1-0.6⁴)³² ≈ 0.989 (16
  // bands would leave ~10% of borderline edges undiscovered). The LSH arm
  // needs only good recall, not completeness — the prefix-filter arm
  // closes the gap exactly.
  val NumPerms = 128
  val Bands = 32
  val RowsPerBand = 4
  val Prime = 2147483647L // 2^31 - 1

  /** Deterministic permutation parameters from a fixed LCG (seed 42). */
  private val (permA, permB): (Seq[Long], Seq[Long]) = {
    var state = 42L
    def next(): Long = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      (state >>> 33) % (Prime - 1)
    }
    val a = Seq.fill(NumPerms)(next() + 1) // a in [1, P-1]
    val b = Seq.fill(NumPerms)(next())
    (a, b)
  }

  /** doc_id + sorted full-width trigram hashes (`tgh`, array<bigint>) +
    * minhash signature (`minhash`, array<bigint> of length [[NumPerms]]),
    * via the native MinHashSignature expression (graft.functions).
    *
    * Trigrams are hashed with full 64-bit xxhash64 — NOT reduced mod a
    * 31-bit prime — because `tgh` is also what the exact confirm compares:
    * a within-doc 31-bit collision would shrink a set and shift its
    * Jaccard against the string-trigram oracle (expected ~0.4 collisions
    * per 5k-doc corpus at 31 bits; ~1e-11 at 64 bits, and at 1e9-doc scale
    * still ~1e-5). MinHashSignature reduces mod prime internally. */
  def signatures(docs: DataFrame): DataFrame = {
    SignatureExpressions.register(docs.sparkSession, NumPerms,
      permA.toArray, permB.toArray, Prime)
    Layout.spread(docs)
      .withColumn("norm", lower(regexp_replace(col("text"), (TextOps.Ws + "+"), " ")))
      .withColumn("tg", expr(
        "CASE WHEN length(norm) >= 3 THEN " +
          "array_distinct(transform(sequence(1, length(norm) - 2), " +
          "i -> substring(norm, i, 3))) ELSE array() END"))
      .withColumn("tgh", expr("array_sort(transform(tg, t -> xxhash64(t)))"))
      .withColumn("minhash", expr("graft_minhash(tgh)"))
      .select(col("doc_id"), col("tgh"), col("minhash"))
  }

  /** Buckets up to this size emit all pairs; larger buckets emit hub
    * edges instead (each member → the bucket's first [[HubsPerBucket]]
    * docs). With r = 4 rows per band, random (low-similarity) collisions
    * are rare, so a large bucket means a genuine template family — hub
    * edges keep it connected for the component step at O(size·K) cost,
    * and K hubs give every member K independent chances of a confirmed
    * (≥ threshold) link into its component (and every band re-rolls the
    * chance: a family bucket recurs in all [[Bands]] bands). The cap
    * bounds per-bucket quadratic work at 128²/2 ≈ 8k pairs. */
  val AllPairsMaxBucket = 128
  val HubsPerBucket = 32

  /** LSH candidate edges (doc_a < doc_b). Work per bucket is
    * O(min(size², size·K)): quadratic only while small.
    *
    * ONE bounded-state aggregation computes, per bucket, its size and its
    * `allPairsMax` smallest member ids (graft_capped_ids — a
    * [[graft.functions.CappedSortedLongs]] buffer of at most allPairsMax
    * longs, never family-scale state; a collect_list here would grow
    * linearly with a template family's membership, the executor-OOM shape
    * the gold rewrites eliminated).
    *
    * SMALL buckets (≤ [[AllPairsMaxBucket]]): the capped list IS the full
    * sorted member list. Identical lists are deduped ACROSS bands (a
    * template family lands the same member set in every band — near-
    * identical docs share the whole signature) and a narrow generator
    * expression emits each list's i<j pairs once — measured ~[[Bands]]×
    * less pre-distinct pair volume with the IDENTICAL distinct pair set.
    *
    * BIG buckets (template families): the first [[HubsPerBucket]] of the
    * capped list are the bucket's hubs; re-joining the (tiny) hub table
    * back to the banded rows links every member to each hub. The join has
    * no explicit broadcast hint on purpose: the hub side is a fresh
    * aggregate, so AQE broadcasts it at any realistic bucket count and
    * degrades to a shuffle join past that — there is no driver-side
    * collect to outgrow. Compared with the previous window formulation
    * (rank members per bucket, self-join the rank-≤K prefix) this drops
    * the per-bucket sort and two exchanges from the plan. */
  /** (doc_id, band_idx, band_key) rows — each doc's [[Bands]] LSH bucket
    * keys. Band key = hash of the band's minhash slice (long group key,
    * not a concatenated string; false bucket collisions are filtered by
    * the estimate/confirm stages anyway). posexplode_outer, not
    * posexplode: the plain form's InferFiltersFromGenerate filter would
    * re-evaluate the whole 32-band transform twice more per doc. Not
    * persisted: consumers re-run a narrow codegen'd transform over the
    * cached signature frame. Shared with [[IncrementalDedup]], whose
    * persisted band postings must key identically to the delta side. */
  private[graft] def banded(sigs: DataFrame): DataFrame =
    sigs
      .select(col("doc_id"), posexplode_outer(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"xxhash64(slice(minhash, b * $RowsPerBand + 1, $RowsPerBand)))"))
        .as(Seq("band_idx", "band_key")))
      .filter(col("band_idx").isNotNull) // pos-null = empty array only

  def candidateEdges(sigs: DataFrame,
                     allPairsMax: Int = AllPairsMaxBucket,
                     hubs: Int = HubsPerBucket): DataFrame = {
    val b = banded(sigs)
    val buckets = b.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bucket_n"),
        expr(s"graft_capped_ids(doc_id, $allPairsMax)").as("ids"))

    val smallLists = buckets.filter(col("bucket_n") <= allPairsMax)
      .select(col("ids")).distinct()
    val smallPairs = smallLists
      .select(explode_outer(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "y -> struct(x AS doc_a, y AS doc_b))))")).as("p"))
      .filter(col("p").isNotNull) // outer-null = singleton bucket only
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))

    val bigHubs = buckets.filter(col("bucket_n") > allPairsMax)
      .select(col("band_idx"), col("band_key"),
        slice(col("ids"), 1, hubs).as("hubs"))
    // A family bucket recurs in ~every band with the SAME hub list, so a
    // member meets each hub list ~[[Bands]] times — dedupe the narrow
    // (doc_id, hubs) rows BEFORE exploding to per-hub pairs (measured
    // ~30× less pre-distinct hub-edge volume on the dense sf0.1 corpus,
    // identical distinct pair set).
    val hubEdges = b.join(bigHubs, Seq("band_idx", "band_key"))
      .select(col("doc_id"), col("hubs")).distinct()
      .select(col("doc_id"), explode(col("hubs")).as("hub_id"))
      .filter(col("hub_id") < col("doc_id"))
      .select(col("hub_id").as("doc_a"), col("doc_id").as("doc_b"))

    // No materialization: the pair list feeds one linear estimate →
    // confirm plan (downstream callers persist the CONFIRMED edges,
    // which are what gets re-read). NO pair-level distinct: both
    // sources already dedupe at their own grain (identical small-bucket
    // id LISTS across bands collapse in smallLists; hub rows collapse in
    // the (doc_id, hubs) distinct), so residual duplicates are only
    // overlapping-but-unequal small lists — measured < 0.1 % of the
    // 2.28 M pairs at sf0.1 — while the distinct cost a full shuffle of
    // the pair list (the only exchange the estimate→confirm pipeline
    // had; both its joins broadcast). Duplicate survivors are absorbed:
    // components() permits duplicate edges by contract, and
    // nearDuplicates keeps its own post-confirm distinct.
    smallPairs.unionByName(hubEdges)
  }

  /** Prefix-filtering candidate pairs (doc_a < doc_b) — COMPLETE for
    * Jaccard ≥ threshold−1e−4 (the margin absorbs the contract's
    * 4-decimal rounding before its ≥-threshold cut).
    *
    * Order all tokens globally by (document frequency asc, token value).
    * For a qualifying pair with sizes na ≤ nb the required overlap is
    * α ≥ t′/(1+t′)·(na+nb), which bounds it both ways: α ≥ 2t′/(1+t′)·na
    * and (via the size filter na ≥ t′·nb) α ≥ t′·nb. The smallest common
    * token therefore sits within the first na − ⌈2t′/(1+t′)·na⌉ + 1
    * tokens of the SMALLER set (the short "index" prefix, ≈0.25·n at
    * t′=0.6) and the first nb − ⌈t′·nb⌉ + 1 tokens of the LARGER set
    * (the long "probe" prefix, ≈0.4·n) — else one side would have too
    * many rarer non-shared tokens to reach α. Joining short(smaller) ×
    * long(larger) on token is the PPJoin/Vernica asymmetric-prefix
    * filter: complete, with far fewer false candidates than the
    * symmetric long×long join (a token must land in the rarest quarter
    * of the smaller doc). Ties na = nb are ordered by doc_id.
    *
    * Frequency ordering keeps common tokens out of prefixes, so token
    * buckets stay small on natural corpora; a template family still pays
    * O(family²) here, which is exactly the regime where the LSH arm alone
    * (linear hub edges) is the 100 TB configuration. The token-frequency
    * table is one row per distinct trigram — a fresh aggregate with
    * stats, so AQE picks the broadcast join by itself. */
  def prefixCandidates(sigs: DataFrame, threshold: Double): DataFrame = {
    val ranked = rankedPrefix(sigs, threshold)
    // Materialize before releasing the shared ranked frame — the pair
    // list is two longs per row; the checkpoint is what lets this method
    // leave no cached state behind for long-lived sessions.
    val out = prefixJoin(ranked, threshold).localCheckpoint()
    ranked.unpersist()
    out
  }

  /** The frequency-ordered probe-prefix token frame (persisted: read by
    * both join sides and the volume estimate). Callers own the
    * unpersist. */
  private def rankedPrefix(sigs: DataFrame, threshold: Double): DataFrame = {
    val tp = math.max(threshold - 1e-4, 0.0)
    val toks = sigs.select(col("doc_id"), size(col("tgh")).as("n"),
      explode(col("tgh")).as("tok"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("dfreq"), col("tok"))
    toks.join(dfreq, Seq("tok"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - ceil(lit(tp) * col("n")) + lit(1))
      .select("tok", "doc_id", "n", "rn")
      .persist()
  }

  /** The asymmetric short×long prefix join over [[rankedPrefix]]. */
  private def prefixJoin(ranked: DataFrame, threshold: Double): DataFrame = {
    val tp = math.max(threshold - 1e-4, 0.0)
    val idxFrac = 2 * tp / (1 + tp)
    val short = ranked
      .filter(col("rn") <= col("n") - ceil(lit(idxFrac) * col("n")) + lit(1))
      .select(col("tok").as("tok_s"), col("doc_id").as("id_s"),
        col("n").as("n_s"))
    val long = ranked
      .select(col("tok").as("tok_l"), col("doc_id").as("id_l"),
        col("n").as("n_l"))
    short.join(long,
        col("tok_s") === col("tok_l") &&
          (col("n_s") < col("n_l") ||
            (col("n_s") === col("n_l") && col("id_s") < col("id_l"))) &&
          col("n_s") >= ceil(lit(tp) * col("n_l")))
      .select(least(col("id_s"), col("id_l")).as("doc_a"),
        greatest(col("id_s"), col("id_l")).as("doc_b"))
      .distinct()
  }

  /** Deterministic prefix-join volume estimate from the token document-
    * frequency HISTOGRAM — the [[AutoArm]] measurement.
    *
    * The exact quantity is Σ_tok short(tok)·probe(tok), which needs
    * per-doc frequency ranks (a full-corpus window over every exploded
    * token — the estimator this replaces spent ~2.3 s of pure decision
    * cost at sf0.1 on a sampled version of that window). This estimator
    * keeps the same appearance-weighted quantity but assigns prefix slots
    * globally instead of per-doc: prefixes hold each doc's RAREST tokens,
    * so fill the global short-prefix slot budget Σ_doc L(n) with token
    * appearances in ascending document-frequency order, each assigned
    * appearance contributing ~dfreq candidate pairs (the probe-prefix
    * bucket of a rare token ≈ its document frequency — the same
    * approximation the sampled estimator used). The whole measurement is
    * one narrow aggregation chain over the exploded tokens (dfreq →
    * histogram, no join-back, no window) plus a driver fold over the tiny
    * (d, count) histogram; deterministic, no sampling noise.
    *
    * Regime fidelity (the only thing the decision consumes):
    *  - sparse natural corpus: dfreq mass sits at 1–3 → volume ≈ slots·O(1)
    *    → prefix;
    *  - template family of size F: every token's dfreq ≈ F, volume ≈
    *    slots·F ≈ 0.25·n·F² — the F² blow-up the budget exists to catch;
    *  - dense tiny-vocab corpus: all appearances common → volume ≈
    *    slots·Θ(nDocs), correctly past budget even though LSH buckets
    *    would look benign.
    * Saturating Double accumulation: at 10⁹ docs slots·dfreq overflows a
    * Long; the decision only needs "past the budget", not the exact count. */
  private[graft] def histogramVolumeEstimate(sigs: DataFrame,
                                      threshold: Double): Long =
    statsAndVolume(sigs, threshold)._3

  /** The driver greedy fill over a collected (dfreq, token-count)
    * histogram and a slot budget. */
  private def greedyFill(hist: Array[(Long, Long)], slots: Long): Long = {
    var remaining = slots
    var vol = 0.0
    hist.foreach { case (d, nTok) =>
      if (remaining > 0) {
        val take = math.min(d * nTok, remaining)
        vol += take.toDouble * d
        remaining -= take
      }
    }
    if (vol >= Long.MaxValue.toDouble) Long.MaxValue else vol.toLong
  }

  /** [[corpusStats]] then the histogram aggregation, deliberately as TWO
    * sequential actions: the stats aggregate's single narrow scan
    * materializes the signature cache first, and the histogram job reads
    * it warm. (A one-job union of the two branches was measured SLOWER —
    * its two independent stages race to materialize the cold cache and
    * duplicate the signature build.) Returns (nDocs, totTokens,
    * estimated volume). */
  private def statsAndVolume(sigs: DataFrame,
                             threshold: Double): (Long, Long, Long) = {
    val (nDocs, totTokens, slots) = corpusStats(sigs, threshold)
    val h = sigs.select(explode(col("tgh")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    (nDocs, totTokens, greedyFill(h, slots))
  }

  /** (row count, total token count, short-prefix slot budget) of a
    * signature frame in ONE action over the cached signatures: the first
    * two gate the explicit broadcast hints below, the third seeds
    * [[histogramFill]] — fused so the decision pipeline costs one job,
    * not three. */
  private def corpusStats(sigs: DataFrame,
                          threshold: Double): (Long, Long, Long) = {
    val tp = math.max(threshold - 1e-4, 0.0)
    val idxFrac = 2 * tp / (1 + tp)
    val r = sigs.agg(count(lit(1)),
      coalesce(sum(size(col("tgh"))), lit(0L)),
      coalesce(sum(
        size(col("tgh")).cast("long")
          - ceil(lit(idxFrac) * size(col("tgh"))).cast("long") + lit(1L)),
        lit(0L))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Signature-agreement pre-filter over candidate edges: estimated
    * Jaccard (fraction of equal minhash components, [[NumPerms]] long
    * comparisons) must reach threshold−0.25 — a ~4σ margin, so only the
    * LSH arm's candidates go through it; the prefix arm bypasses it to
    * keep the completeness guarantee unconditional. */
  private def estimateSurvivors(sigs: DataFrame, edges: DataFrame,
                                threshold: Double,
                                nDocs: Long): DataFrame = {
    val minAgree = math.max(0,
      math.ceil((threshold - 0.25) * NumPerms).toInt)
    // Per-doc (not per-pair) projection of the fixed-width signature:
    // ~NumPerms·8 bytes per row. Cached parents carry no stats, so the
    // broadcast must be hinted — and the hint gated, because an explicit
    // broadcast() hard-fails (no fallback) past the 8 GB relation limit.
    val mhBytes = nDocs * (NumPerms * 8L + 40L)
    // ONE projected frame joined twice (vs a per-side aliased projection):
    // both joins' build plans canonicalize identically, so ReuseExchange
    // materializes a single broadcast instead of two. The projection
    // carries the set size too: jaccard ≤ min(n)/max(n), so a pair whose
    // sizes differ by more than the threshold ratio can never confirm —
    // two integer comparisons prune it before the 128-long agreement
    // loop ever runs (and before the trigram arrays join in).
    val tp = math.max(threshold - 1e-4, 0.0)
    val mh = Layout.maybeBroadcast(
      sigs.select(col("doc_id"), col("minhash"),
        size(col("tgh")).as("n")), mhBytes)
    edges
      .join(mh.as("ma"), col("doc_a") === col("ma.doc_id"))
      .join(mh.as("mb"), col("doc_b") === col("mb.doc_id"))
      .filter(
        col("ma.n") >= lit(tp) * col("mb.n") &&
          col("mb.n") >= lit(tp) * col("ma.n") &&
          expr("graft_sig_agreement(ma.minhash, mb.minhash)") >= minAgree)
      .select("doc_a", "doc_b")
  }

  /** Exact trigram Jaccard over candidate pairs, keeping edges with
    * round4(|∩|/|∪|) ≥ threshold — the same expression shape as the
    * oracle. Runs on SORTED hashed trigram sets: two-pointer merge
    * intersection (native expression — no per-pair hash set), union by
    * inclusion–exclusion. The per-doc trigram projections are several KB
    * per row, so the broadcast hint is gated on the measured total token
    * count; past the limit both joins degrade to shuffle joins (the pair
    * frame is repartitioned on the join key either way). */
  private def exactConfirm(sigs: DataFrame, cands: DataFrame,
                           threshold: Double, totTokens: Long,
                           nDocs: Long): DataFrame = {
    val tgBytes = totTokens * 8L + nDocs * 48L
    // Same single-frame double-join shape as the estimate stage: the two
    // broadcast builds collapse into one via ReuseExchange.
    val tg = Layout.maybeBroadcast(
      sigs.select(col("doc_id"), col("tgh")), tgBytes)
    cands
      .join(tg.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(tg.as("tb"), col("doc_b") === col("tb.doc_id"))
      .withColumn("inter",
        expr("graft_sorted_intersect(ta.tgh, tb.tgh)").cast("bigint"))
      .withColumn("uni",
        (size(col("ta.tgh")) + size(col("tb.tgh"))).cast("bigint")
          - col("inter"))
      .withColumn("jaccard", Num.guardedRatio(col("inter"), col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Candidate edges confirmed by exact trigram Jaccard ≥ threshold.
    *
    * Two-stage on purpose: the estimate join ships only the fixed-width
    * minhash; the trigram sets (several KB/doc) are joined only onto
    * estimate survivors. Fusing both into one join would drag the
    * trigram arrays through every candidate row's shuffle — measured 4×
    * slower at sf0.1. */
  def confirmedEdges(sigs: DataFrame, edges: DataFrame,
                     threshold: Double): DataFrame = {
    val (nDocs, totTokens, _) = corpusStats(sigs, threshold)
    exactConfirm(sigs, estimateSurvivors(sigs, edges, threshold, nDocs),
      threshold, totTokens, nDocs)
  }

  /** Edge-count ceiling for the driver union-find fast path in
    * [[components]]. 4M edges collect as ~4M boxed Tuple2 rows — a few
    * hundred MB of transient driver heap near the ceiling (the long-term
    * union-find state is a primitive LongMap, far smaller) — so the
    * ceiling is set well inside a default driver's budget, not at the
    * raw 16-bytes-per-edge arithmetic. The gate bounds EVERYTHING the
    * driver path materializes: union-find touches edge endpoints only
    * (≤ 2·edges entries), never the vertex set. */
  val DriverComponentsMaxEdges: Long = 4000000L

  /** Connected components → (doc_id, canonical_id = component minimum).
    *
    * Small graphs (≤ [[DriverComponentsMaxEdges]] edges, measured, not
    * guessed) collect the EDGE LIST to the driver and run path-compressed
    * union-find over its endpoints — the same small-graph shortcut graph
    * libraries take, since a sub-second driver pass beats several
    * distributed rounds. Vertices that touch no edge are singletons by
    * definition and never reach the driver: they take the identity
    * assignment distributively (left join + coalesce), so a
    * billion-doc corpus with a sparse dup graph stays executor-side —
    * the driver cost is bounded by the edge gate alone. Union by
    * min-root keeps every root the component minimum, so the output is
    * identical to the distributed path.
    *
    * Larger graphs run min-label propagation with pointer jumping:
    * every vertex starts as its own label; each round pushes the smaller
    * label across every edge, then compresses paths by following each
    * label to ITS label (labels are always ≤ their owner, so the jump is
    * monotone). Edge propagation alone needs diameter rounds; the jump
    * halves chain lengths every round, so convergence is O(log diameter).
    * Labels only decrease and their sum is a strictly decreasing
    * convergence measure, so the loop needs one aggregate action per round
    * and `localCheckpoint` keeps the plan from growing with the iteration
    * count.
    *
    * Duplicate edges are permitted (both paths absorb them), which lets
    * callers skip a multi-million-row distinct on the candidate union. */
  def components(vertices: DataFrame, edges: DataFrame,
                 driverMaxEdges: Long = DriverComponentsMaxEdges)
      : DataFrame = {
    val e = edges.select(col("doc_a"), col("doc_b")).persist()
    // count() first, collect() from the warm cache second. (A fused
    // limit(ceiling+1).collect() was measured SLOWER: CollectLimit
    // executes as several incrementally-scaled jobs.)
    val nE = e.count()
    val out =
      if (nE <= driverMaxEdges) {
        // Endpoint assignments from the driver (≤ 2·nE rows), identity
        // for everyone else — the vertex frame itself never leaves the
        // executors.
        val ep = endpointComponents(
          e.collect().iterator.map(r => (r.getLong(0), r.getLong(1))),
          vertices.sparkSession)
        vertices.select(col("doc_id"))
          .join(ep.withColumnRenamed("doc_id", "ep_id"),
            col("doc_id") === col("ep_id"), "left")
          .select(col("doc_id"),
            coalesce(col("canonical_id"), col("doc_id"))
              .as("canonical_id"))
      } else distributedComponents(vertices, e)
    e.unpersist()
    out
  }

  /** Path-compressed union-find on the driver over EDGE ENDPOINTS only
    * (exposed for the DedupSpec gate test); union by min root, so the
    * final root of every endpoint is its component's minimum doc_id.
    * Returns one row per distinct endpoint — no singleton vertices. */
  private[graft] def driverEndpointComponents(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    endpointComponents(
      e.select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
        .iterator,
      e.sparkSession)
  }

  /** The union-find itself, over an already-collected edge iterator —
    * [[components]] feeds it the rows its gate action shipped, so the
    * small-graph path pays exactly one distributed job. */
  private def endpointComponents(pairs: Iterator[(Long, Long)],
                                 spark: SparkSession): DataFrame = {
    import spark.implicits._
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    parent.keys.toSeq.map(v => (v, find(v)))
      .toDF("doc_id", "canonical_id")
  }

  private def distributedComponents(vertices: DataFrame,
                                    edges: DataFrame): DataFrame = {
    val both = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col("doc_id"), col("doc_id").as("lbl"))
      .localCheckpoint()
    val nV = labels.count()
    // The label map is one row per vertex (narrow) while the edge list
    // dominates the round — broadcast the labels so the edge side never
    // re-shuffles. Checkpointed frames have no size stats, so the gated
    // hint stands in for the AQE decision; past the ceiling the rounds
    // run as shuffle joins (both sides hash-partitioned on the key).
    val lblBytes = nV * 64L
    var lastSum = labels.agg(sum(col("lbl"))).head().getLong(0)
    var converged = false
    while (!converged) {
      val prop = both.join(Layout.maybeBroadcast(labels, lblBytes),
          both("src") === labels("doc_id"))
        .select(col("dst").as("doc_id"), col("lbl"))
      val merged = labels.unionByName(prop)
        .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
      // pointer jump (twice): label(v) := label(label(v)) — each jump is
      // a self-join of the narrow label map and quarters the remaining
      // chain length per round
      val next = jump(jump(merged, lblBytes), lblBytes).localCheckpoint()
      val s = next.agg(sum(col("lbl"))).head().getLong(0)
      converged = s == lastSum
      lastSum = s
      labels = next
    }
    labels.select(col("doc_id"), col("lbl").as("canonical_id"))
  }

  private def jump(labels: DataFrame, lblBytes: Long): DataFrame =
    labels.join(
        Layout.maybeBroadcast(labels.select(col("doc_id").as("p"),
          col("lbl").as("plbl")), lblBytes),
        col("lbl") === col("p"))
      .select(col("doc_id"), col("plbl").as("lbl"))

  /** Candidate-generation arm selector for [[clusters]] /
    * [[nearDuplicates]]. */
  sealed trait Arm
  /** Force the complete (exact-components) prefix-filter arm. */
  case object PrefixArm extends Arm
  /** Force the probabilistic LSH arm (the dense-corpus configuration). */
  case object LshArm extends Arm
  /** Measure, then choose: prefix while its estimated join volume stays
    * within [[PrefixBudgetPerDoc]]·nDocs, LSH past it. */
  case object AutoArm extends Arm

  /** Prefix-arm volume budget, in estimated candidate pairs per doc.
    * Below it the complete prefix join is shuffle-safe and exactness is
    * free; above it (template families — a single family of size F pays
    * F² in one token's bucket — or a tiny-vocabulary corpus where every
    * prefix bucket is a constant fraction of the corpus) the LSH arm's
    * hub-edge buckets keep per-bucket work linear at the documented
    * borderline-miss probability. The budget is deliberately ~2× the
    * measured harness-gate volume (~3.7k pairs/doc at sf0.001/sf0.01) and
    * well under the sf0.1 density (~35.9k), so the gate scales stay on the
    * exact arm and the dense bench scale exercises the LSH arm. */
  val PrefixBudgetPerDoc: Long = 8192L

  /** Measured arm choice for a signature frame — the [[AutoArm]] rule,
    * exposed so tests (and operators) can observe the decision. The
    * measurement is [[histogramVolumeEstimate]]: one narrow aggregation
    * over the exploded tokens plus a driver histogram fold — calibrated
    * against the per-doc-rank sampled estimator it replaced (within ~10%
    * at sf0.001 3.7k vs 4.0k pairs/doc, sf0.01 3.7k vs 4.0k, sf0.1 35.9k
    * vs 38.7k, DedupSpec family 14.1k vs 13.3k), so
    * [[PrefixBudgetPerDoc]] carries over unchanged. */
  def selectArm(sigs: DataFrame, threshold: Double, nDocs: Long): Arm =
    if (histogramVolumeEstimate(sigs, threshold) <=
      PrefixBudgetPerDoc * nDocs) PrefixArm
    else LshArm

  /** Stats + resolved arm in one decision action ([[statsAndVolume]] for
    * AutoArm; plain [[corpusStats]] — no histogram — for a fixed arm). */
  private def resolveArm(sigs: DataFrame, threshold: Double,
                         arm: Arm): (Long, Long, Arm) = arm match {
    case AutoArm =>
      val (n, t, vol) = statsAndVolume(sigs, threshold)
      (n, t, if (vol <= PrefixBudgetPerDoc * n) PrefixArm else LshArm)
    case fixed =>
      val (n, t, _) = corpusStats(sigs, threshold)
      (n, t, fixed)
  }

  /** Resolve an arm into candidate edges. */
  private def armCands(sigs: DataFrame, threshold: Double, resolved: Arm,
                       nDocs: Long): DataFrame = resolved match {
    case LshArm =>
      estimateSurvivors(sigs, candidateEdges(sigs), threshold, nDocs)
    case _ => prefixCandidates(sigs, threshold)
  }

  /** The registered query: near-duplicate cluster assignment over the
    * documents table. Every doc appears exactly once; singletons map to
    * themselves. Oracle: DuckDB recursive-CTE components over the exact
    * all-pairs trigram-Jaccard graph (OpsOracles.minhashClusters).
    *
    * Arm selection is MEASURED by default ([[AutoArm]]): the prefix arm
    * is complete — every true (rounded-Jaccard ≥ threshold) edge is
    * confirmed, so the components equal the exact graph's components up
    * to the ~1e-11 within-doc 64-bit trigram-hash collision chance
    * (BASELINE.md) — and is chosen while its measured volume estimate
    * stays within budget (it does at the sf0.001/sf0.01 gate scales).
    * Past the budget (template families, dense tiny-vocab corpora — the
    * sf0.1 bench corpus crosses it) the LSH arm runs: hub-edge buckets,
    * linear per family, with the documented borderline-edge miss
    * probability. No caller flag decides the scale behavior — the
    * measured corpus does. */
  def clusters(spark: SparkSession, dir: String,
               threshold: Double = 0.6, arm: Arm = AutoArm): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = signatures(docs).cache()
    val (nDocs, totTokens, resolved) = resolveArm(sigs, threshold, arm)
    val cands = armCands(sigs, threshold, resolved, nDocs)
    val edges = exactConfirm(sigs, cands, threshold, totTokens, nDocs)
    // Vertices come straight from the parquet scan (signatures preserve
    // doc_ids 1:1), so after components() materializes the edge set the
    // signature cache has no live dependents and can be released here
    // instead of leaking into long-lived sessions.
    val out = components(docs.select(col("doc_id")), edges)
    sigs.unpersist()
    out
  }

  /** Pair-level view (doc_a, doc_b, jaccard) — kept for diagnostics and
    * recall tests; the registered contract is [[clusters]]. Same arm
    * selection as [[clusters]], so the default pair list is exact while
    * the corpus stays within the prefix budget. Materialized eagerly so
    * the signature cache can be released before returning. */
  def nearDuplicates(spark: SparkSession, dir: String,
                     threshold: Double = 0.6,
                     arm: Arm = AutoArm): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = signatures(docs).cache()
    val (nDocs, totTokens, resolved) = resolveArm(sigs, threshold, arm)
    val cands = armCands(sigs, threshold, resolved, nDocs)
    val out = exactConfirm(sigs, cands, threshold, totTokens, nDocs)
      .distinct() // pair-level view: one row per confirmed pair
      .localCheckpoint()
    sigs.unpersist()
    out
  }
}
