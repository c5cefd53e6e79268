package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Sampling for a 100 TB corpus must be (a) reproducible across runs
  * and engines — a re-run of the pipeline must pick the same rows, or
  * every downstream artifact changes; (b) skew-proof — `ORDER BY
  * rand()` breaks both. The pseudo-random key here is `md5(id)`:
  * uniformly distributed, stable everywhere (`rand()` is neither),
  * and cheap.
  *
  * Scale shape: one hash-partition shuffle by stratum; each stratum
  * reduces to its top-k inside the window. Both samplers keep their
  * rank filter directly on the raw `row_number` against a LITERAL
  * bound, so Catalyst's InferWindowGroupLimit fires: a Partial
  * WindowGroupLimit ahead of the exchange caps what every map
  * partition forwards at the bound, and the Final one caps reducer
  * state — a pathologically hot stratum ships ≤ bound rows per map
  * partition instead of its entire population through one reducer.
  * PlanQualitySpec pins the WindowGroupLimit in both plans.
  */
object Sampling {

  /** The shared deterministic-rank contract: rows ranked within each
    * stratum by md5 of the id, ties broken by the id itself — total,
    * stable, and mirrored verbatim by the DuckDB oracle text of t06
    * and t10. Both samplers MUST rank through here.
    *
    * The rank is the RAW integer `row_number` — callers filter on it
    * first (the shape InferWindowGroupLimit matches; a cast in
    * between defeats the rule) and widen to long after.
    */
  private def withSampleRank(df: DataFrame, strataCol: String,
      idCol: String): DataFrame = {
    val key: Column = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
  }

  /** k deterministic rows per stratum, ranked by md5 of the id (ties
    * broken by the id itself, so the pick is total and stable).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame =
    withSampleRank(df, strataCol, idCol)
      .where(col("sample_rank") <= k)
      .withColumn("sample_rank", col("sample_rank").cast("long"))

  /** Deterministic data-mixing resampler: per-stratum quota plus
    * epoch upsampling — the "data mixture" step of training-set
    * assembly (e.g. 3 epochs of wiki, 1 epoch of web crawl). For each
    * stratum in `mix`, keeps its quota of rows by the same stable
    * md5-of-id rank as [[stratifiedSample]], then replicates each
    * kept row once per epoch with an `epoch` index column. Strata not
    * in `mix` are dropped (quota 0).
    *
    * Scale shape: one hash-partition shuffle by stratum for the rank
    * window; the epoch replication is a generator in the same stage —
    * output rows are produced where the input partition lives, so
    * upsampling never shuffles. The `mix` CASE expressions are pure
    * literals folded into codegen. The per-stratum quota is a CASE
    * expression Catalyst can't turn into a group limit on its own, so
    * the filter carries an extra `rank <= max(quotas)` LITERAL
    * conjunct — semantically redundant, but it's what
    * InferWindowGroupLimit extracts, capping per-map-partition
    * forwarding at the largest quota even for a hot stratum.
    */
  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences ("packs") — the sample-packing step that turns a
    * curated corpus into dense fixed-length training rows. Streaming
    * first-fit semantics: docs are taken in deterministic id order
    * within each group, and a doc joins the pack its preceding
    * cumulative token count falls in (`pack_id = floor((cum − n) /
    * budget)`), so a doc straddling a boundary OVERFLOWS its pack
    * rather than splitting — the standard greedy packer, fully
    * order-deterministic and engine-portable (no greedy bin-search
    * state that would differ across engines).
    *
    * Scale shape: one hash exchange on the group + an incremental
    * running-sum window (UNBOUNDED PRECEDING — constant per-row
    * state). Strict sequential packing is inherently serial within a
    * group: pick a `groupCol` with enough cardinality (source, shard,
    * ...) to spread reducers; the shuffle carries (group, id, count)
    * only.
    */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", floor(
        (col("cum_tokens") - col("n_tokens")).cast("double") / budgetTokens)
        .cast("long"))
  }

  /** Packing-waste curve — for every candidate context length, what
    * the [[packSequences]] concat-and-chunk layout would cost: packs
    * needed, padding tokens (each group's final partial pack),
    * padding fraction, and how many documents STRADDLE a pack
    * boundary (the attention-fragmentation cost packing trades
    * against padding — short contexts waste little padding but split
    * many documents; long contexts the reverse). The context-length
    * planner beside t16's layout, run before committing a sequence
    * length.
    *
    * One group-keyed running-sum window — the same pass t16 runs —
    * shared by EVERY candidate length: per-length straddle flags and
    * pack counts are integer floor-division arithmetic on (cum,
    * n_tokens, total), so the sweep adds no second corpus pass.
    * Everything is exact integers until the one padding_frac divide.
    *
    * @return (budget, n_packs, n_tokens, n_padding, padding_frac,
    *         n_straddled) ordered by budget
    */
  def packingWasteCurve(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, budgets: Seq[Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ > 0) &&
      budgets == budgets.sorted && budgets.distinct == budgets,
      "budgets must be positive, sorted, distinct")
    val base = df.select(col(groupCol).as("grp"),
      col(idCol).as("id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ls = broadcast(df.sparkSession
      .createDataFrame(budgets.map(Tuple1(_))).toDF("budget"))
    val straddle = base.withColumn("cum", sum(col("n_tokens")).over(w))
      .crossJoin(ls)
      .groupBy(col("budget"))
      .agg(sum(when(
        expr("(cum - n_tokens) div budget") =!= expr("(cum - 1) div budget"),
        1L).otherwise(0L)).as("n_straddled"))
    // each group's total = max(cum); summed directly so the totals
    // leg needs no second window pass
    val st = base.groupBy(col("grp")).agg(sum(col("n_tokens")).as("t"))
    val packs = st.crossJoin(ls)
      .groupBy(col("budget"))
      .agg(
        sum(expr("(t + budget - 1) div budget")).as("n_packs"),
        sum(col("t")).as("n_tokens"),
        sum(expr("((t + budget - 1) div budget) * budget - t")).as("n_padding"))
    packs.join(broadcast(straddle), Seq("budget"))
      .select(col("budget"), col("n_packs"), col("n_tokens"), col("n_padding"),
        (col("n_padding").cast("double") /
          (col("n_packs") * col("budget")).cast("double")).as("padding_frac"),
        col("n_straddled"))
  }

  /** Deterministic train/val/test split by hashed id — the dataset
    * split step every training pipeline needs. A row's split is a
    * pure function of its id (md5), so the assignment is reproducible
    * across runs, engines, partitionings, and corpus growth: adding
    * documents never moves an existing document between splits (the
    * property a `row_number % 10` split lacks).
    *
    * Split boundaries are quantized to 1/65536 by comparing the first
    * FOUR hex chars of the md5 lexicographically against literal
    * thresholds — fixed-length lowercase hex compares identically to
    * the numeric value, and both engines render md5 the same way, so
    * the oracle mirrors the expression verbatim. `splits` lists
    * (name, fraction) in order; fractions are floored to the 1/65536
    * grid and the LAST split takes the remainder, so fractions
    * need not sum to exactly 1.0.
    *
    * NULL ids land in the LAST split — md5(NULL) is NULL, every
    * `WHEN key < bound` is null-false, and the ELSE fires. This is
    * standard SQL CASE semantics and both engines agree (the oracle
    * hash-match holds either way), but it means a nullable id column
    * silently skews the final split: enforce id non-nullness upstream
    * if that matters.
    *
    * Scale shape: a scan-stage codegen CASE over a 4-char substring —
    * no shuffle, no state; the split of 100 TB costs one pass.
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall { case (_, f) => f > 0.0 && f < 1.0 },
      "fractions must be in (0, 1)")
    require(splits.init.map(_._2).sum < 1.0,
      "non-final fractions must sum below 1")
    val key = substring(md5(col(idCol).cast("string")), 1, 4)
    val bounds = splits.init.scanLeft(0.0)(_ + _._2).tail
      .map(f => f"${math.floor(f * 65536).toLong}%04x")
    val assigned = splits.init.zip(bounds).foldRight(
        lit(splits.last._1): Column) { case (((name, _), b), acc) =>
      when(key < lit(b), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Leakage-safe train/val/test split: the [[hashSplit]] assignment
    * keyed by each document's NEAR-DUP CLUSTER representative instead
    * of its own id, so a near-duplicate pair can never straddle
    * train and test — the eval-hygiene failure a plain per-doc split
    * commits silently (a test doc whose near-copy sits in train is a
    * leaked answer, and at web-corpus dup rates that is a large slice
    * of "test"). Singletons key by their own id, so on a dup-free
    * corpus this IS hashSplit.
    *
    * Scale: the pair graph + closure are d06's (cap `maxPostings` in
    * production); the corpus-side join is ids-only and the split
    * itself stays a scan-stage md5 CASE.
    *
    * @return (id, rep, split) — rep the cluster key the split hashed
    */
  def leakageSafeSplit(docs: DataFrame, textCol: String, idCol: String,
      splits: Seq[(String, Double)], n: Int = 3, threshold: Double = 0.3,
      maxPostings: Option[Int] = Some(10000)): DataFrame = {
    val comp = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs, textCol, idCol, n, threshold, maxPostings))
      .select(col("id"), col("component"))
    val keyed = docs.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("rep"))
    hashSplit(keyed, "rep", splits).select(col("id"), col("rep"), col("split"))
  }

  /** Temperature-scaled source mixing weights — the α-sampling recipe
    * (mT5/XLM-R style): w_s ∝ n_s^α. α=1 keeps natural proportions,
    * α→0 approaches uniform; the standard knob for up-weighting
    * low-resource sources in a multi-source training mix. Output per
    * source: doc count, natural fraction, and the temperature weight
    * — the multinomial a sampler then draws from (feed the weights to
    * [[sourceMix]] quotas to materialize the resample).
    *
    * Scale shape: ONE partial-aggregated groupBy on the source key
    * (source cardinality ≪ corpus), then window sums over the handful
    * of source rows. Fractions are rounded 6 dp: Σ n^α accumulates in
    * engine order, and for α other than 0.5/1 `pow` itself is only
    * 1-ulp reproducible across libms (α=0.5 is IEEE sqrt-exact).
    *
    * @return (source, n_docs, natural_frac, temp_weight)
    */
  def temperatureWeights(df: DataFrame, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)) // a handful of source rows — global is fine
    df.groupBy(col(strataCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      // pow(x, 0.5) is NOT contractually sqrt(x) — route the common
      // α=0.5 through the IEEE-exact sqrt so the weight is
      // bit-reproducible cross-engine
      .withColumn("__pow",
        if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
        else pow(col("n_docs").cast("double"), lit(alpha)))
      .select(col("source"), col("n_docs"),
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(w).cast("double"), 6).as("natural_frac"),
        round(col("__pow") / sum(col("__pow")).over(w), 6).as("temp_weight"))
  }

  /** WEIGHTED reservoir sample, Efraimidis-Spirakis A-ES keys with
    * DETERMINISTIC uniforms: row priority = ln(u)/w where u ∈ (0, 1]
    * derives from the first 12 md5 nibbles of the id and w is the
    * caller's weight column — keep the top-k priorities per stratum.
    * ln(u)/w orders identically to the textbook u^(1/w) key
    * (monotone transform) without `pow`, and the deterministic u
    * makes the whole draw reproducible across runs, engines, and
    * partitionings — the property that lets the DuckDB oracle
    * reconstruct the exact sample (a PRNG-based sampler could only
    * be property-tested). This is how a curation pipeline samples
    * "proportional to quality score" or "proportional to length"
    * instead of uniformly ([[stratifiedSample]]).
    *
    * Rows with weight <= 0 are dropped (zero mass can't be drawn;
    * negative has no A-ES meaning) — mirrored in the oracle so both
    * engines agree.
    *
    * Scale shape: one hash exchange on the stratum for the rank
    * window, with the filter-on-row_number shape
    * InferWindowGroupLimit turns into a per-partition top-k (the
    * [[stratifiedSample]] pin) — per-reducer state is k rows however
    * hot the stratum. Priorities are scan-stage codegen (md5 + ln).
    * Cross-engine tie risk: two priorities within 1 ulp of each
    * other could rank differently per libm; with 48-bit uniforms the
    * spacing is ~2⁻⁴⁸ of a unit — the same accepted-odds class as
    * the xxhash64 collision notes.
    *
    * @return (stratum, id, weight, priority round-6, sample_rank)
    */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // (first 12 md5 nibbles + 1) / 2^48 ∈ (0, 1]: +1 dodges ln(0);
    // 12 nibbles keep the integer exact in a double (48 < 53 bits)
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long").cast("double") + lit(1.0)) / lit(281474976710656.0)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__pr").desc, col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn("__pr", log(u) / col(weightCol).cast("double"))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
      .select(col(strataCol), col(idCol), col(weightCol),
        round(col("__pr"), 6).as("priority"),
        col("sample_rank").cast("long").as("sample_rank"))
  }

  /** Deterministic epoch shuffle — the data-loading permutation a
    * trainer replays: position = rank of md5("epoch:id"), so the
    * order is (a) uniform-ish per epoch, (b) DIFFERENT across epochs
    * (the hash reseeds), and (c) bit-reproducible across engines,
    * partitionings, and restarts — a crashed epoch resumes mid-stream
    * by position without materializing the permutation anywhere. The
    * md5-rank trick is [[hashSplit]]'s determinism applied to
    * ordering instead of assignment.
    *
    * Scale: the rank is one global sort by a scan-stage digest. A
    * trainer that only needs PER-SHARD order drops the window for
    * `sortWithinPartitions` after repartitioning on the digest — same
    * key, no total order, no single-reducer tail. The global-rank
    * form is the oracle-able contract.
    *
    * @return (idCol, position) — position 1..N within the epoch
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame = {
    val key = md5(concat_ws(":", lit(epoch), col(idCol)))
    df.select(col(idCol), key.as("__k"))
      .withColumn("position",
        row_number().over(Window.orderBy(col("__k"), col(idCol))).cast("long"))
      .select(col(idCol), col("position"))
  }

  /** Length-bucket padding-efficiency report — the batching audit
    * run before fixing a bucketing scheme: documents bucket by token
    * count into [edge_i, edge_{i+1}) ranges, and each bucket reports
    * how many pad tokens batching-to-the-bucket-max would burn
    * (padding_frac = 1 − Σlen / (n · max_len)). The whole point of
    * length bucketing is driving this number down vs one global
    * bucket; this measures it on YOUR corpus.
    *
    * One partial-aggregated exchange on the bucket index (token
    * counts are a scan-stage projection); output is edge-count rows.
    *
    * @param edges ascending bucket lower bounds; the first bucket
    *              starts at edges.head (shorter docs drop — they
    *              belong to a filter, not a batch)
    * @return (bucket_lo, n_docs, max_len, sum_tokens, padding_frac)
    */
  def lengthBuckets(df: DataFrame, textCol: String, idCol: String,
      edges: Seq[Int]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      "edges must be ascending and distinct")
    val n = TextAnalysis.tokenCount(col(textCol))
    val lo = edges.tail.foldLeft(
      when(n >= edges.head, lit(edges.head)).otherwise(lit(null).cast("int"))) {
      (acc, e) => when(n >= e, lit(e)).otherwise(acc)
    }
    df.select(n.as("__n"), lo.as("bucket_lo"))
      .where(col("bucket_lo").isNotNull)
      .groupBy(col("bucket_lo").cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("__n")).as("max_len"),
        sum(col("__n")).as("sum_tokens"))
      .withColumn("padding_frac",
        round(lit(1.0) - col("sum_tokens").cast("double") /
          (col("n_docs") * col("max_len")).cast("double"), 6))
  }

  /** Token-budget selection: fill a training-token budget with the
    * highest-priority documents — the final assembly step of every
    * curation pipeline ("we can afford B tokens; take the best docs
    * until they're spent"). Deterministic greedy: order by
    * (priority DESC, id), keep every doc whose PRECEDING cumulative
    * token count is still under the budget — so exactly one doc
    * straddles the boundary and selection is reproducible.
    *
    * Priority here is the distinct-token count (lexical diversity,
    * integer-exact); callers with a trained scorer pass any column.
    *
    * Scale note: the running sum is ONE global sort — the
    * oracle-able contract (the t38 move). At 100 TB, replace the
    * exact cut with a priority-histogram threshold (select everything
    * above p*, binary-search p* on the aggregated histogram) and keep
    * this exact spelling for the boundary bucket only.
    *
    * @return selected docs: (doc_id, priority, n_tokens, cum_before)
    */
  def tokenBudgetSelect(docs: DataFrame, textCol: String, idCol: String,
      budget: Long,
      priorityCol: Option[Column] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    val prio = priorityCol.getOrElse(
      size(array_distinct(split(col(textCol), " "))).cast("long"))
    val feat = graft.ops.ScaleOps.fanOut(docs).select(
      col(idCol).as("doc_id"),
      prio.as("priority"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    feat
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .where(col("cum_before") < budget)
      .select(col("doc_id"), col("priority"), col("n_tokens"), col("cum_before"))
  }

  /** WATER-FILLING token-budget allocation across sources — the step
    * between [[temperatureWeights]] (what mixture do we WANT) and
    * [[tokenBudgetSelect]] (which docs fill a source's share): given a
    * total token budget B and per-source supply A_s, allocate B
    * proportionally to the temperature weights w_s ∝ n_docs^α, except
    * a source can never be allocated more tokens than it HAS — its
    * surplus redistributes proportionally among the unsaturated rest
    * (rare sources saturate first; exactly the situation α-sampling
    * creates by design). The fixpoint has a sort-based closed form:
    * order sources by supply-per-weight A_s/w_s ascending — the
    * saturated set is a prefix of that order, because the water level
    * R/W (remaining budget over remaining weight) is non-decreasing
    * while saturation continues and each flag compares the next ratio
    * against the current level. The prefix ends at the FIRST failing
    * flag (cumulative AND), after which every remaining source takes
    * w_s × final level < A_s.
    *
    * Determinism: flags cross-multiply (A_s·W ≤ w_s·R) instead of
    * dividing, prefix sums run in the one explicit (ratio, source)
    * order on both engines, and α = 0.5 routes through IEEE-exact
    * sqrt (the t28 contract).
    *
    * Scale shape: ONE corpus scan (per-source count + token sum with
    * map-side partial aggregation); everything after operates on the
    * |sources|-row frame, where the unpartitioned windows are free.
    *
    * @return (source, n_docs, avail_tokens, weight round-6,
    *         saturated 0/1, alloc_tokens round-6, fill_frac round-6)
    */
  /** REPEAT-EPOCH budget plan — the data-constrained scaling decision
    * (Muennighoff et al. 2023, public literature): when the token
    * budget exceeds the unique supply, sources are REPEATED, and the
    * value of epoch r decays geometrically (δ^{r−1} of a fresh pass).
    * The optimal greedy spends each marginal raw token on the
    * (source, epoch) with the highest marginal value w·δ^{r−1}
    * (w = the source's mean t02 quality): because v strictly
    * decreases in r, one global sort of the |sources|×maxEpochs
    * candidate epochs by (v desc, source, epoch) IS the greedy
    * trajectory — funded prefix + one partial epoch at the budget
    * crossing. δ is fixed at 0.5 so every power is exact binary and
    * the plan is bit-portable.
    *
    * Scale shape: ONE partial-aggregated corpus scan to a
    * |sources|-row frame (token sums + DECIMAL-exact quality means);
    * everything after runs on |sources|×maxEpochs rows — the t61
    * k-row-state discipline.
    *
    * @return (source, unique_tokens, quality_w, epochs_full,
    *         partial_tokens, raw_alloc, effective_tokens round-6) one
    *         row per source (unsorted — callers order)
    */
  def repeatEpochPlan(df: DataFrame, strataCol: String, textCol: String,
      budget: Long, maxEpochs: Int = 4): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs >= 1 && maxEpochs <= 8, "maxEpochs must be in [1, 8]")
    val base = graft.ops.ScaleOps.fanOut(df)
      .groupBy(col(strataCol).as("source"))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("unique_tokens"),
        count(lit(1)).as("n_docs"),
        sum(round(graft.pipeline.TextAnalysis.qualityScore(col(textCol)), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("qsum"))
      .withColumn("quality_w",
        round(col("qsum").cast("double") / col("n_docs").cast("double"), 6))
      .select(col("source"), col("unique_tokens"), col("quality_w"))
    // δ^{r−1} as a literal when-chain (δ = 0.5 → exact binary)
    def dpow(r: Column): Column = (1 to maxEpochs).foldLeft(lit(Double.NaN)) {
      case (acc, i) => when(r === i, lit(math.pow(0.5, i - 1))).otherwise(acc)
    }
    val cands = base
      .select(col("source"), col("unique_tokens"), col("quality_w"),
        explode(sequence(lit(1), lit(maxEpochs))).as("r"))
      .withColumn("v", col("quality_w") * dpow(col("r")))
    val ord = Window.orderBy(col("v").desc, col("source"), col("r"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(budget)
    val walked = cands
      .withColumn("cumc", sum(col("unique_tokens")).over(cum))
      .withColumn("prevc", col("cumc") - col("unique_tokens"))
      // fully funded epochs fit under B; the crossing epoch takes the
      // exact integer remainder
      .withColumn("full", when(col("cumc") <= b, 1L).otherwise(0L))
      .withColumn("ptoks",
        when(col("prevc") < b && col("cumc") > b, b - col("prevc"))
          .otherwise(0L))
    val perSrc = walked.groupBy(col("source"))
      .agg(max(col("unique_tokens")).as("unique_tokens"),
        max(col("quality_w")).as("quality_w"),
        sum(col("full")).as("epochs_full"),
        sum(col("ptoks")).as("partial_tokens"))
      .withColumn("raw_alloc",
        col("epochs_full") * col("unique_tokens") + col("partial_tokens"))
    // effective = unique·2·(1 − 0.5^full) + partial·0.5^full (δ = 0.5
    // geometric sum), the 0.5^full factor again a literal when-chain
    def hpow(f: Column): Column = (0 to maxEpochs).foldLeft(lit(Double.NaN)) {
      case (acc, i) => when(f === i, lit(math.pow(0.5, i))).otherwise(acc)
    }
    perSrc.select(col("source"), col("unique_tokens"), col("quality_w"),
      col("epochs_full"), col("partial_tokens"), col("raw_alloc"),
      round(col("unique_tokens").cast("double") * lit(2.0) *
          (lit(1.0) - hpow(col("epochs_full"))) +
        col("partial_tokens").cast("double") * hpow(col("epochs_full")), 6)
        .as("effective_tokens"))
  }

  def budgetAllocation(df: DataFrame, strataCol: String, textCol: String,
      budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val base = graft.ops.ScaleOps.fanOut(df)
      .groupBy(col(strataCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("avail_tokens"))
      .withColumn("w",
        if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
        else pow(col("n_docs").cast("double"), lit(alpha)))
      .withColumn("ratio", col("avail_tokens").cast("double") / col("w"))
    // |sources| rows from here on — global windows are k-row state
    val ord = Window.orderBy(col("ratio"), col("source"))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(budget.toDouble)
    val flagged = base
      .withColumn("pa", coalesce(
        sum(col("avail_tokens").cast("double")).over(pre), lit(0.0)))
      .withColumn("pw", coalesce(sum(col("w")).over(pre), lit(0.0)))
      .withColumn("tw", sum(col("w")).over(all))
      // A_k · W_{k-1} ≤ w_k · R_{k-1}, cross-multiplied (all terms > 0)
      .withColumn("flag",
        when(col("avail_tokens").cast("double") * (col("tw") - col("pw")) <=
          col("w") * (b - col("pa")), lit(1)).otherwise(lit(0)))
      .withColumn("saturated", min(col("flag")).over(cum))
    val level =
      (b - coalesce(sum(when(col("saturated") === 1,
          col("avail_tokens").cast("double"))).over(all), lit(0.0))) /
        (col("tw") - coalesce(sum(when(col("saturated") === 1,
          col("w"))).over(all), lit(0.0)))
    val alloc = when(col("saturated") === 1,
      col("avail_tokens").cast("double")).otherwise(col("w") * level)
    flagged.select(
      col("source"), col("n_docs"), col("avail_tokens"),
      round(col("w"), 6).as("weight"),
      col("saturated").cast("long").as("saturated"),
      round(alloc, 6).as("alloc_tokens"),
      round(alloc / col("avail_tokens").cast("double"), 6).as("fill_frac"))
  }

  def sourceMix(df: DataFrame, strataCol: String, idCol: String,
      mix: Map[String, (Int, Int)]): DataFrame = {
    require(mix.nonEmpty, "mix must name at least one stratum")
    val quota = mix.foldLeft(lit(0)) { case (acc, (s, (q, _))) =>
      when(col(strataCol) === s, lit(q)).otherwise(acc)
    }
    val epochs = mix.foldLeft(lit(0)) { case (acc, (s, (_, e))) =>
      when(col(strataCol) === s, lit(e)).otherwise(acc)
    }
    val maxQuota = mix.values.map(_._1).max
    withSampleRank(df, strataCol, idCol)
      // epochs guard: sequence(1, 0) would DESCEND and emit [1, 0]
      .where(col("sample_rank") <= maxQuota &&
        col("sample_rank") <= quota && epochs > 0)
      .withColumn("sample_rank", col("sample_rank").cast("long"))
      .withColumn("epoch", explode(sequence(lit(1), epochs)))
      .withColumn("epoch", col("epoch").cast("long"))
  }
}
