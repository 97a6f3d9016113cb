package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Deterministic content-hash sampling for training-data pipelines.
  *
  * `df.sample()` draws from a seeded RNG whose stream depends on partition
  * layout, so the selected set changes under repartitioning, AQE, or a
  * different executor count — unacceptable for reproducible dataset builds.
  * Hash sampling instead keys the decision on the ROW's content: a row is in
  * the sample iff its key's md5-derived bucket falls under the threshold.
  * The same row is always in (or out) regardless of cluster topology, the
  * filter is a pure codegen'd map that pipelines with the scan, and the md5
  * arithmetic exists in DuckDB so sampled queries stay oracle-exact.
  */
object Sampling {

  val Buckets = 10000 // basis-point resolution

  /** stable bucket in [0, buckets) from the key's md5 (first 32 bits). */
  def hashBucket(key: Column, buckets: Int = Buckets): Column =
    pmod(conv(substring(md5(to_binary(key.cast(StringType), lit("utf-8"))), 1, 8), 16, 10)
      .cast(LongType), lit(buckets.toLong))

  /** keep ~fraction of rows, decided by content hash of `key`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    df.filter(hashBucket(key) < math.round(fraction * Buckets))
  }

  /** deterministic TRAIN/VAL/TEST split assignment — the last step of every
    * dataset build: each row gets the split label whose cumulative
    * basis-point interval its content-hash bucket falls in, so the split is
    * a pure codegen'd projection, reproducible under any partitioning, and
    * STABLE UNDER CORPUS GROWTH (a row's label depends only on its own key,
    * so adding documents never moves an existing document across splits —
    * the property that keeps eval sets honest between dataset versions).
    * `splits` are (label, fraction) in declaration order, fractions summing
    * to ≤ 1; rows hashing past the last interval get `defaultLabel`
    * (useful as a holdout). */
  def assignSplit(df: DataFrame, key: Column,
                  splits: Seq[(String, Double)],
                  defaultLabel: String = "holdout",
                  outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplit requires >= 1 split")
    splits.foreach { case (_, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f not in [0,1]") }
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions sum to ${splits.map(_._2).sum} > 1")
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets) }.tail
    val b = hashBucket(key)
    val label = splits.zip(cuts).reverse.foldLeft(lit(defaultLabel)) {
      case (acc, ((name, _), cut)) => when(b < cut, name).otherwise(acc)
    }
    df.withColumn(outCol, label)
  }

  /** stratified variant: per-stratum sampling rates (stratum value →
    * fraction), `default` for unlisted strata — the class-rebalancing
    * primitive (e.g. downsample dominant languages). Single codegen'd
    * filter, no shuffle, no per-stratum scans. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    (fractions.values ++ Seq(default)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f not in [0,1]"))
    // deterministic threshold expression: sorted iteration order
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(default * Buckets))) { case (acc, (s, f)) =>
        when(stratum === s, lit(math.round(f * Buckets))).otherwise(acc)
      }
    df.filter(hashBucket(key) < thr)
  }

  /** DOMAIN-MIXING rates to a global TOKEN budget — the mixture step every
    * training run performs (choose how much of each source/domain to keep
    * so the final dataset hits a token budget at a target composition; the
    * DoReMi/Pile-style knob, with fixed rather than learned weights). For
    * domain d with target weight w_d and corpus token count T_d:
    * rate_d = min(1, w_d·budget / T_d) — a domain already under its
    * allocation is kept whole, an over-represented one is hash-downsampled
    * to its share. Weights are SHARES OF ONE BUDGET: explicit entries claim
    * their mass and the remainder splits uniformly over unspecified
    * domains, so target shares sum to ≤ 1 and the budget holds.
    *
    * The per-domain token table is DOMAINS-sized, so deriving rates is one
    * tiny aggregate collected to the driver — the same offline-index shape
    * as [[Similarity.ivfFit]] (an engine-external oracle can then embed the
    * resulting basis-point thresholds as literals). Sampling itself is
    * [[stratifiedHashSample]]: one codegen'd content-hash filter, no
    * shuffle, reproducible under any partitioning.
    *
    * min(1,·) makes the budget an UPPER BOUND, not a target: allocation
    * unclaimed by kept-whole (capped) domains is not redistributed, so
    * realized kept tokens can undershoot `budgetTokens` even when other
    * domains could absorb the slack. If the budget is a target, use
    * [[tokenBudgetRatesWaterfill]], which redistributes the slack until
    * the budget is met exactly. */
  def tokenBudgetRates(df: DataFrame, textCol: String, domainCol: String,
                       budgetTokens: Long,
                       weights: Map[String, Double] = Map.empty): Map[String, Double] =
    tokenBudgetRates(df, TextAnalysis.tokenCount(col(textCol)), domainCol,
      budgetTokens, weights)

  /** [[tokenBudgetRates]] with the TOKENIZER AS A PARAMETER: production
    * budgets are BPE tokens, not whitespace tokens, so the per-row token
    * count is any Column expression — [[TextAnalysis.subwordCount]] as the
    * BPE stand-in, a real tokenizer's precomputed count column, or a
    * native counting Expression. The whitespace form above is this with
    * `TextAnalysis.tokenCount(col(textCol))`. */
  def tokenBudgetRates(df: DataFrame, tokenCountCol: Column, domainCol: String,
                       budgetTokens: Long,
                       weights: Map[String, Double]): Map[String, Double] = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    weights.values.foreach(w =>
      require(w >= 0.0 && w <= 1.0, s"weight $w not in [0,1]"))
    require(weights.values.sum <= 1.0 + 1e-9,
      s"explicit weights sum to ${weights.values.sum} > 1: shares are " +
        "fractions of ONE budget")
    val totals = domainTokenTotals(df, tokenCountCol, domainCol)
    val shares = resolvedShares(totals, weights)
    totals.map { case (d, t) =>
      (d, if (t <= 0) 1.0 else math.min(1.0, shares(d) * budgetTokens / t))
    }
  }

  /** per-domain corpus token counts (DOMAINS-sized driver map). Null-domain
    * rows can't be allocated a share; they fall through to
    * [[stratifiedHashSample]]'s `default` rate (0.0) at apply time. The
    * domain key is cast to string up front so an int-coded source column
    * yields string-keyed rates (matching [[tokenBudgetSample]]'s
    * comparison) instead of a ClassCastException at collect. */
  private def domainTokenTotals(df: DataFrame, tokenCountCol: Column,
                                domainCol: String): Map[String, Long] =
    df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast(StringType).as("__d"))
      .agg(coalesce(sum(tokenCountCol.cast(LongType)), lit(0L)).as("__t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  /** target budget share per domain. Weights are shares of ONE budget:
    * explicit weights claim their mass, the REMAINDER splits uniformly over
    * unspecified domains — so target shares always sum to ≤ 1 and the
    * budget is actually respected (a bare 1/k default for unspecified
    * domains would over-allocate whenever explicit weights already claim
    * part of the mass). */
  private def resolvedShares(totals: Map[String, Long],
                             weights: Map[String, Double]): Map[String, Double] = {
    val unspecified = totals.keySet -- weights.keySet
    val residual = math.max(0.0,
      1.0 - weights.collect { case (d, w) if totals.contains(d) => w }.sum)
    val defaultW = if (unspecified.isEmpty) 0.0 else residual / unspecified.size
    totals.map { case (d, _) => (d, weights.getOrElse(d, defaultW)) }
  }

  /** [[tokenBudgetRates]] with WATERFILLING — the budget as a TARGET, not a
    * cap: allocation unclaimed by kept-whole (saturated) domains is
    * redistributed over the still-downsampled ones in proportion to their
    * weights, iterating until no new domain saturates. Each round saturates
    * ≥ 1 domain or stops, so it converges in ≤ |domains| rounds — a
    * driver-side loop over the DOMAINS-sized map, nothing distributed.
    * Realized kept tokens = min(budgetTokens, total tokens of the domains
    * carrying nonzero share) exactly; a domain with share 0 (explicit
    * weights summing to 1 leave unlisted domains no residual) receives
    * nothing in any round — by design, zero-weight means excluded. */
  def tokenBudgetRatesWaterfill(df: DataFrame, textCol: String,
                                domainCol: String, budgetTokens: Long,
                                weights: Map[String, Double] = Map.empty): Map[String, Double] =
    tokenBudgetRatesWaterfill(df, TextAnalysis.tokenCount(col(textCol)),
      domainCol, budgetTokens, weights)

  /** [[tokenBudgetRatesWaterfill]] with the tokenizer as a parameter — the
    * [[tokenBudgetRates]] Column-overload twin, so BPE-unit budgets get the
    * exact-target waterfilling semantics too. */
  def tokenBudgetRatesWaterfill(df: DataFrame, tokenCountCol: Column,
                                domainCol: String, budgetTokens: Long,
                                weights: Map[String, Double]): Map[String, Double] = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    weights.values.foreach(w =>
      require(w >= 0.0 && w <= 1.0, s"weight $w not in [0,1]"))
    require(weights.values.sum <= 1.0 + 1e-9,
      s"explicit weights sum to ${weights.values.sum} > 1: shares are " +
        "fractions of ONE budget")
    val totals = domainTokenTotals(df, tokenCountCol, domainCol)
    val shares = resolvedShares(totals, weights)
    // saturated = kept whole (its tokens fit inside its current allocation)
    var saturated = totals.filter(_._2 <= 0).keySet
    var done = false
    var alloc = Map.empty[String, Double]
    while (!done) {
      val residual = budgetTokens.toDouble -
        saturated.iterator.map(d => totals(d).toDouble).sum
      val openShare = (totals.keySet -- saturated).iterator.map(shares).sum
      alloc = (totals.keySet -- saturated).iterator.map { d =>
        (d, if (openShare <= 0) 0.0 else shares(d) / openShare * residual)
      }.toMap
      val newlySat = alloc.collect {
        case (d, a) if a >= totals(d).toDouble => d
      }.toSet
      if (newlySat.isEmpty || residual <= 0) done = true
      else saturated ++= newlySat
    }
    totals.map { case (d, t) =>
      (d,
        if (saturated.contains(d) || t <= 0) 1.0
        else math.max(0.0, math.min(1.0, alloc(d) / t)))
    }
  }

  /** apply [[tokenBudgetRates]] with the content-hash filter keyed on the
    * row id. Rows of `df` are returned unchanged. The domain column is
    * cast to string to match the string-keyed rate table. */
  def tokenBudgetSample(df: DataFrame, idCol: String, domainCol: String,
                        rates: Map[String, Double]): DataFrame =
    stratifiedHashSample(df, col(idCol), col(domainCol).cast(StringType), rates)

  /** α-TEMPERATURE domain mixing rates — the multilingual/domain
    * re-balancing rule of XLM-R and mT5: sample domain i with probability
    * q_i ∝ n_i^α, α ∈ (0, 1]. α = 1 reproduces the corpus's natural
    * composition; α → 0 approaches uniform, flattening the head and
    * upweighting the tail — the standard fix for head domains drowning out
    * rare ones. The output budget is `targetFraction` of the corpus
    * (scale-invariant — the same α gives the same composition at 100×);
    * domain i's keep rate is min(1, q_i·T / n_i). min(1,·) caps saturated
    * tail domains: upsampling without replacement would mean duplicating
    * documents, which is exactly what the dedup pipeline removes — as with
    * [[tokenBudgetRates]], capped mass is not redistributed (budget as
    * upper bound).
    *
    * Scale shape: one count aggregate to a DOMAINS-sized driver map, the
    * power/normalize math driver-local; apply with
    * [[stratifiedHashSample]]/[[tokenBudgetSample]] (content-hash keyed —
    * partitioning-independent and growth-stable like every sampler here).
    */
  def temperatureRates(df: DataFrame, domainCol: String, alpha: Double,
                       targetFraction: Double): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction must be in (0,1], got $targetFraction")
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast(StringType).as("__d"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val total = counts.values.sum
    val z = counts.values.iterator.map(n => math.pow(n.toDouble, alpha)).sum
    val target = targetFraction * total
    counts.map { case (d, n) =>
      (d, if (n <= 0 || z <= 0) 0.0
          else math.min(1.0, math.pow(n.toDouble, alpha) / z * target / n))
    }
  }

  /** EXACTLY k rows per stratum, chosen by content hash — the fixed-SIZE
    * sibling of [[stratifiedHashSample]]'s fixed-RATE sampling ("200 eval
    * docs per language", not "0.1% per language"). Selection = the k
    * smallest md5(key) per stratum (key ties broken by the key itself), so
    * membership is partition-layout-independent and the oracle is a plain
    * `row_number() OVER (PARTITION BY stratum ORDER BY md5, key) <= k`.
    *
    * Scale shape: a naive window does exactly that oracle — which sorts
    * EVERY stratum's full row set through single tasks (the per-partition
    * window sort; a 100 TB corpus with 10 languages = 10 impossible
    * tasks). Instead, a 24-bit hash-prefix histogram (≤16M × strata tiny
    * rows) finds, per stratum, the smallest prefix value t whose
    * cumulative count reaches k; only rows with prefix ≤ t — a PROVEN
    * superset of the true top-k, expected size ≈ k + stratum/2²⁴, since a
    * smaller fixed-width hex prefix implies a smaller full hash — enter
    * the ranking window. The histogram threshold is exact, not
    * probabilistic: the result row set equals the naive oracle's
    * bit-for-bit (ProfilingSpec proves equality across k at the stratum
    * boundary cases, including k past the stratum size).
    *
    * Strata with fewer than k rows keep every row (no threshold exists —
    * the left join's null-`__t` branch). */
  def groupSampleK(df: DataFrame, stratumCol: String, key: Column,
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"groupSampleK: k must be >= 1, got $k")
    val withH = df
      .withColumn("__h", md5(to_binary(key.cast(StringType), lit("utf-8"))))
      .withColumn("__p24",
        conv(substring(col("__h"), 1, 6), 16, 10).cast(LongType))
    val cum = withH.groupBy(col(stratumCol), col("__p24"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum",
        sum("__c").over(Window.partitionBy(stratumCol).orderBy("__p24")))
    val thresholds = cum.filter(col("__cum") >= k)
      .groupBy(stratumCol).agg(min("__p24").as("__t"))
    withH.join(broadcast(thresholds), Seq(stratumCol), "left")
      .filter(col("__t").isNull || col("__p24") <= col("__t"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(stratumCol).orderBy(col("__h"), key)))
      .filter(col("__rn") <= k)
      .drop("__h", "__p24", "__t", "__rn")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES): the
    * k rows with the smallest −ln(u)/w, where u is a deterministic uniform
    * derived from md5(key) — heavier rows draw systematically smaller
    * scores, so inclusion probability scales with weight, and the same
    * corpus always yields the same sample (the [[hashSample]] doctrine
    * applied to importance sampling: mix by quality/length without an RNG
    * whose stream depends on partition layout).
    *
    * u = (first 52 hash bits + 1) / 2⁵³ ∈ (0, ½] — exact dyadic, never 0
    * (no infinite scores) and never 1 (no colliding zero scores). The
    * score is fixed to integer NANOS before ranking (the q_unigram_lm
    * doctrine): cross-engine ln disagreement at the last ulp cannot
    * reorder near-ties, and the key breaks exact ties. Rows with
    * non-positive weight are dropped (a weight of 0 means "never sample").
    *
    * Scale shape: a pure codegen'd projection followed by a global top-k
    * (`TakeOrderedAndProject` — per-partition heaps, no global sort). */
  def weightedSampleK(df: DataFrame, key: Column, weight: Column,
                      k: Int): DataFrame = {
    require(k >= 1, s"weightedSampleK: k must be >= 1, got $k")
    val u = (conv(substring(
        md5(to_binary(key.cast(StringType), lit("utf-8"))), 1, 13), 16, 10)
      .cast(DoubleType) + 1.0) / 9007199254740992.0 // 2^53
    df.filter(weight.cast(DoubleType) > 0)
      .withColumn("score_nanos",
        round(negate(log(u)) / weight.cast(DoubleType) * 1e9).cast(LongType))
      .orderBy(col("score_nanos"), key)
      .limit(k)
  }
}
