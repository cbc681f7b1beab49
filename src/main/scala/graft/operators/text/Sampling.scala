package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting.
  *
  * Training-data pipelines need repeatable sampling: the same document
  * must land in the same split on every run, on any cluster layout, with
  * no RNG state. Keying a 28-bit md5 prefix (engine-portable hex) by id
  * gives a uniform bucket in [0, buckets); sampling and train/val/test
  * splits are then pure filters — map-only, no shuffle, pushdown-safe.
  * Salting with `seed` decorrelates independent samples over the same
  * corpus.
  */
case class HashSampler(idCol: String = "doc_id", buckets: Int = 100,
    seed: String = "graft") {
  require(buckets > 0, "buckets must be positive")

  /** Uniform deterministic bucket in [0, buckets). */
  def bucket: Column =
    pmod(conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))),
      1, 7), 16, 10).cast("long"), lit(buckets.toLong))

  /** Keep ~keepBuckets/buckets of the rows (deterministic). */
  def sample(df: DataFrame, keepBuckets: Int): DataFrame =
    df.filter(bucket < keepBuckets)

  /** Assign train/val/test labels by bucket range: [0, trainBuckets) →
    * train, [trainBuckets, trainBuckets+valBuckets) → val, rest → test. */
  def split(df: DataFrame, trainBuckets: Int, valBuckets: Int,
      splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol,
      when(bucket < trainBuckets, "train")
        .when(bucket < trainBuckets + valBuckets, "val")
        .otherwise("test"))

  /** Stratified sampling: per-class keep fractions (in buckets out of
    * `buckets`), e.g. Map("en" -> 50, "*" -> 10). Still a pure filter —
    * the standard way to rebalance language/domain mixes. */
  def sampleStratified(df: DataFrame, classCol: String,
      keepBuckets: Map[String, Int], defaultKeep: Int = 0): DataFrame = {
    val limit = keepBuckets.foldLeft(lit(defaultKeep)) { case (acc, (k, v)) =>
      when(col(classCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket < limit)
  }

  /** Deterministic k-per-group sample: rank group members by a salted
    * md5 of the id (a fixed "random" order reproducible anywhere) and
    * keep the first k — the distributed, rerun-stable stand-in for
    * per-group reservoir sampling. */
  def samplePerGroup(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(concat(col(idCol).cast("string"), lit(":" + seed))), col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}

/** Domain-mixture sampling (The Pile / DoReMi-style data mixing): hit
  * target per-source proportions within a document budget. Per-source
  * rates come from one narrow groupBy over the actual counts
  * (`rate_s = min(1, budget·p_s / n_s)`); the rate table (one row per
  * source) broadcasts back and the sample itself is a deterministic
  * hash filter — map-only over the corpus, rerun-stable on any cluster
  * layout. Sources short of their target are taken whole: upsampling
  * belongs at the training data-loader (epoch weights), not in the
  * corpus sample. */
case class MixtureSampler(idCol: String = "doc_id",
    sourceCol: String = "source", seed: String = "graft") {

  /** Uniform deterministic u ∈ [0, 1) per document (28-bit md5). */
  def u01: Column =
    conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))),
      1, 7), 16, 10).cast("double") / 268435456.0

  /** (source, n_docs, rate) for the given target weights and budget. */
  def rates(df: DataFrame, weights: Map[String, Double], budget: Long): DataFrame = {
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    df.groupBy(sourceCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("rate",
        least(lit(1.0), lit(budget.toDouble) * w / col("n_docs").cast("double")))
  }

  /** The mixed sample: keep each doc iff its hash falls under its
    * source's rate. */
  def sample(df: DataFrame, weights: Map[String, Double], budget: Long): DataFrame =
    df.join(broadcast(rates(df, weights, budget).select(col(sourceCol), col("rate"))),
        Seq(sourceCol))
      .filter(u01 < col("rate"))

  /** Temperature-scaled mixture (the multilingual-corpus standard —
    * mC4/XLM-R exponential smoothing, UniMax's motivation): target
    * share p_s ∝ n_s^(1/T), so T = 1 reproduces natural proportions and
    * growing T flattens toward uniform — the lever against head-domain
    * dominance that needs NO hand-tuned weight map; the weights derive
    * from the corpus itself.
    *
    * One narrow per-source count aggregate, the Σ n^(1/T) normalizer
    * attached as a 1-row broadcast (the Winsorizer bounds pattern — no
    * driver collect, no unbounded window), per-source rates rounded to
    * 6 dp so any engine replays the keep decision, and the sample is
    * the same deterministic hash filter as [[sample]]. The rate join is
    * UNhinted: source cardinality is data-driven (millions of domains
    * at 100 TB), so the broadcast decision belongs to the cost model /
    * AQE, not a hint. Null sources form a real group (null-safe join),
    * matching CorpusGates. */
  def sampleTemperature(df: DataFrame, temperature: Double,
      budget: Long): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .withColumn("__p", pow(col("__n").cast("double"), lit(1.0 / temperature)))
    val tot = counts.agg(sum("__p").as("__tot"))
    val rateTab = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol).as("__src"),
        least(lit(1.0), round(lit(budget.toDouble) * col("__p") /
          col("__tot") / col("__n").cast("double"), 6)).as("rate"))
    df.join(rateTab, df(sourceCol) <=> rateTab("__src"))
      .filter(u01 < col("rate"))
      .drop("__src", "rate")
  }
}

/** Token-budget sampling: fill each source's TOKEN budget (not document
  * count — what a training run actually consumes) greedily in a
  * deterministic salted-hash order. A document is taken while the
  * tokens already taken from its source are still under budget, so each
  * source overshoots by at most one document and a budget > 0 always
  * yields at least one document. Documents whose token count evaluates
  * to null (e.g. a null text field) count as 0 tokens and pass through
  * free rather than being silently dropped.
  *
  * Scale shape: the cumulative sum runs over a NARROW (id, source,
  * tokens) projection — one shuffle partitioned by source, sorting only
  * three columns — and survivors semi-join back to the wide payload,
  * which shuffles once. Skewed sources (one giant domain) are the
  * window's partition skew; split them upstream with a salted
  * sub-source key and per-shard budgets if a single source approaches
  * executor memory. */
case class TokenBudgetSampler(idCol: String = "doc_id",
    sourceCol: String = "source", seed: String = "graft") {

  /** Stable per-doc order key — the same salted md5 family as
    * [[HashSampler]], so samples are rerun-stable on any layout. */
  private def orderKey: Column =
    md5(concat(col(idCol).cast("string"), lit(":" + seed)))

  /** Keep documents filling each source's token budget. `tokenCount`
    * is any Column yielding the per-doc token count (e.g.
    * [[graft.functions.TextFns.wsTokenCount]] or a precomputed
    * column); `budgets` maps source → token budget, `defaultBudget`
    * applies to unlisted sources (0 = drop them). */
  def sample(df: DataFrame, tokenCount: Column,
      budgets: Map[String, Long], defaultBudget: Long = 0L): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(orderKey, col(idCol))
    val picked = df
      .select(col(idCol), col(sourceCol),
        // null token counts (e.g. null text) ride along free at 0 —
        // same pass-through convention as too-short-to-shingle docs;
        // a null must never poison the running sum and silently drop
        // every later doc's cumulative total
        coalesce(tokenCount.cast("long"), lit(0L)).as("__tok"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") - col("__tok") < budget)
      .select(col(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }

  /** The skew escape hatch [[sample]]'s scaladoc promises: one giant
    * source makes the per-source running sum a single window partition
    * (every (id, tokens) row of that source sorts on ONE task). This
    * variant splits each source into `shards` deterministic salted
    * sub-shards and fills each shard independently, so the window
    * partitions by (source, shard) and the largest sort task shrinks
    * ~`shards`×. The per-shard budgets sum EXACTLY to the source
    * budget (⌊b/k⌋ each, +1 for the first b mod k shards); the
    * overshoot bound weakens from ≤1 document per source to ≤1 per
    * shard — and sharding introduces an UNDERSHOOT mode [[sample]]
    * cannot have: a token-light shard can exhaust its documents while
    * heavier shards are capped at their per-shard budget, so the total
    * taken for a source can fall short of its budget by up to
    * ~`shards` × max-doc-tokens even when the source has enough tokens
    * overall (SamplingSpec's `t >= b - 4*m` bound assumes this). Same
    * salted-md5 hash family as [[sample]], so the result is
    * rerun-stable on any cluster layout; `sampleSharded(_, _, _, 1)`
    * picks the identical document set as [[sample]]. */
  def sampleSharded(df: DataFrame, tokenCount: Column,
      budgets: Map[String, Long], shards: Int,
      defaultBudget: Long = 0L): DataFrame = {
    require(shards > 0, "shards must be positive")
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val k = lit(shards.toLong)
    // decorrelated from orderKey by a different salt, so shard
    // membership and within-shard order are independent hashes
    val shard = pmod(conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":shard:" + seed))), 1, 7), 16, 10).cast("long"), k)
    // exact budget split; the double division is exact because
    // (budget - budget mod k) is a multiple of k (budgets < 2^53)
    val perShard = ((budget - pmod(budget, k)) / k).cast("long") +
      when(col("__shard") < pmod(budget, k), lit(1L)).otherwise(lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), col("__shard")).orderBy(orderKey, col(idCol))
    val picked = df
      .select(col(idCol), col(sourceCol), shard.as("__shard"),
        coalesce(tokenCount.cast("long"), lit(0L)).as("__tok"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") - col("__tok") < perShard)
      .select(col(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }
}

/** UniMax mixture allocation (Chung et al. 2023, arXiv:2304.09151
  * "UniMax: Fairer and More Effective Language Sampling for
  * Large-Scale Multilingual Pretraining"): split a total token budget
  * over sources by WATERFILLING under a per-source epoch cap — each
  * source gets an equal share of the remaining budget unless that
  * share exceeds `epochCap` epochs of the source's own tokens, in
  * which case the source is capped and its leftover flows to the
  * larger sources. Kills head-domain dominance like temperature
  * smoothing ([[MixtureSampler.sampleTemperature]]) but with a HARD
  * repetition bound: no source is ever allocated more than `epochCap`
  * passes over its data (Muennighoff et al. 2023 measure repeating
  * past ~4 epochs as rapidly diminishing returns).
  *
  * The paper's sequential loop (ascending by size: take
  * `min(epochCap·n_s, remaining/left)`, update remaining) has a closed
  * form this implementation evaluates instead: once the uniform share
  * stops being capped it stays CONSTANT for every later source
  * (removing an uncapped source removes exactly one share), so the
  * allocation is "cap the first m sources, split the rest evenly",
  * with m = the longest prefix (ascending by tokens) where
  * `epochCap·n_i · (k−i+1) ≤ B − Σ_{j<i} epochCap·n_j`. Everything is
  * 64-bit integer arithmetic (the cap×count product in decimal(38,0) —
  * at 100 TB, cap ~10¹⁴ × 10⁶ sources overflows a Long), the even
  * share is an integer division with the remainder distributed +1 to
  * the first `rem` uncapped sources in the same deterministic order,
  * so any engine replays the allocation bit for bit.
  *
  * Scale shape: the allocation runs over the per-source TOKEN-TOTAL
  * table (one map-side-combined groupBy; one row per source). Its
  * rank/prefix-sum uses the [[SequencePacker]] two-phase scan — range
  * partition, per-partition windows, a #partitions-row offset table —
  * never a bare global window, so a million-domain source table still
  * ranks in parallel. The two "which prefix is capped" reductions are
  * 1-row aggregates attached back as broadcasts. Document selection
  * then fills each source's allocated budget greedily in the
  * [[TokenBudgetSampler]] salted-hash order (same overshoot-≤-1-doc
  * contract; budget ≥ epochCap·n takes the source whole — upsampling
  * to multiple epochs belongs at the training data-loader, the
  * [[MixtureSampler]] convention). */
case class UniMaxSampler(epochCap: Int = 4, idCol: String = "doc_id",
    sourceCol: String = "source", seed: String = "graft") {
  require(epochCap >= 1, "epochCap must be >= 1")

  private def orderKey: Column =
    md5(concat(col(idCol).cast("string"), lit(":" + seed)))

  /** (source, n_tokens, budget): the UniMax allocation of `totalBudget`
    * tokens. Null sources form a real group (the CorpusGates
    * convention) and sort first, matching the oracle's NULLS FIRST. */
  def budgets(df: DataFrame, tokenCount: Column, totalBudget: Long): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val counts = df.groupBy(sourceCol).agg(
      sum(coalesce(tokenCount.cast("long"), lit(0L))).as("n_tokens"))
    // two-phase rank + prefix sum over the source table (ascending by
    // (n_tokens, source)): per-partition windows + a #partitions-row
    // offset join — the SequencePacker pattern, no single-task window
    // the cumulative CAP sums run in decimal(38,0) end to end: a Long
    // cumsum overflows at exactly the scale the closed form must
    // survive (~10⁶ sources × cap ~10¹⁴ exceeds 2⁶³ partway through
    // the prefix, flipping the capped-prefix condition arbitrarily);
    // per-source __cap itself is Long-safe (≤ epochCap × total tokens)
    val parted = counts.repartitionByRange(col("n_tokens"), col(sourceCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__cap", col("n_tokens") * epochCap)
      .withColumn("__capd", (col("n_tokens") * epochCap).cast("decimal(38,0)"))
    val w = Window.partitionBy("__pid")
      .orderBy(col("n_tokens"), col(sourceCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = parted
      .withColumn("__i_local", count(lit(1)).over(w))
      .withColumn("__cum_local", sum("__capd").over(w))
      .localCheckpoint(eager = false)
    val totals = local.groupBy("__pid")
      .agg(count(lit(1)).as("__rows"), sum("__capd").as("__caps"))
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) BigInt(0) else BigInt(r.getDecimal(2).toBigInteger)))
      .sortBy(_._1)
    val k = totals.map(_._2).sum
    val rowPrefix = totals.scanLeft(0L)(_ + _._2).dropRight(1)
    val capPrefix = totals.scanLeft(BigInt(0))(_ + _._3).dropRight(1)
    val rowOffsetCol: Column =
      totals.map(_._1).zip(rowPrefix).foldLeft(lit(0L)) {
        case (acc, (pid, off)) => when(col("__pid") === pid, lit(off)).otherwise(acc)
      }
    val capOffsetCol: Column =
      totals.map(_._1).zip(capPrefix).foldLeft(lit(0).cast("decimal(38,0)")) {
        case (acc, (pid, off)) => when(col("__pid") === pid,
          lit(new java.math.BigDecimal(off.bigInteger))).otherwise(acc)
      }
    val o = local
      .withColumn("__i", col("__i_local") + rowOffsetCol)
      .withColumn("__cumcap", col("__cum_local") + capOffsetCol)
    // capped iff the epoch cap undercuts an even split of what's left
    // assuming every smaller source was capped — exact in decimal(38,0)
    val cond = col("__capd") * (lit(k) - col("__i") + 1) <=
      lit(totalBudget) - (col("__cumcap") - col("__capd"))
    val mRow = o.agg(coalesce(min(when(!cond, col("__i"))) - 1, lit(k)).as("__m"))
    val smRow = o.crossJoin(broadcast(mRow)).agg(
      max(col("__m")).as("__m"),
      coalesce(max(when(col("__i") === col("__m"), col("__cumcap"))),
        lit(0).cast("decimal(38,0)")).as("__sm"))
    o.crossJoin(broadcast(smRow))
      // B − s_m ∈ [0, B] (s_m ≤ B by the capped-prefix condition), so
      // the uncapped share arithmetic is safely back in Long
      .withColumn("__left", (lit(totalBudget) - col("__sm")).cast("long"))
      .withColumn("__k_unc", lit(k) - col("__m"))
      .withColumn("budget",
        when(col("__i") <= col("__m"), col("__cap")).otherwise(
          expr("__left div __k_unc") +
            when(col("__i") - col("__m") <= pmod(col("__left"), col("__k_unc")),
              lit(1L)).otherwise(lit(0L))))
      .select(col(sourceCol), col("n_tokens"), col("budget"))
  }

  /** The UniMax sample: each source's allocated budget filled greedily
    * in deterministic salted-hash order (the [[TokenBudgetSampler]]
    * window over the narrow projection; survivors semi-join back). */
  def sample(df: DataFrame, tokenCount: Column, totalBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE tokenization pass: the narrow projection feeds both the
    // allocation's per-source totals and the greedy fill (tokenizing
    // 1M docs twice measured ~40% of the probe's wall)
    val narrow = df.select(col(idCol), col(sourceCol),
      coalesce(tokenCount.cast("long"), lit(0L)).as("__tok"))
      .localCheckpoint(eager = false)
    val b = budgets(narrow, col("__tok"), totalBudget)
      .select(col(sourceCol).as("__src"), col("budget"))
    val w = Window.partitionBy(sourceCol).orderBy(orderKey, col(idCol))
    val picked = narrow
      .join(b, col(sourceCol) <=> col("__src"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") - col("__tok") < col("budget"))
      .select(col(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }
}

/** Deterministic training-shard layout — the step between a curated
  * corpus and the trainer's data loader (the reference's pipeline ends
  * at a writer; an LLM run additionally needs its input GLOBALLY
  * shuffled and split into a fixed number of shards whose order every
  * rerun and every engine reproduces: epoch order is part of the
  * experiment).
  *
  * Order comes from the salted-md5 family (`:ord:` salt), sharding
  * from an independent `:shard:` salt — decorrelated hashes, no RNG
  * state, byte-identical layout on any cluster/partitioning. A shard
  * read in `pos` order replays its slice of the global permutation.
  *
  * Scale shape: shard assignment is map-only; the per-shard `pos`
  * rank is a window over (shard) sorted by the order key — that sort
  * IS the physical write layout (ordered shard files are the
  * product), it scales per-shard (n/nShards rows each, grow nShards
  * with the corpus), and the wide payload shuffles exactly once, on
  * the shard key. */
case class TrainingShardLayout(nShards: Int = 32,
    idCol: String = "doc_id", seed: String = "graft") {
  require(nShards > 0, "nShards must be positive")

  private def orderKey: Column =
    md5(concat(col(idCol).cast("string"), lit(":ord:" + seed)))

  /** Map-only shard id in [0, nShards). */
  def shard: Column =
    pmod(conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":shard:" + seed))), 1, 7), 16, 10).cast("long"),
      lit(nShards.toLong)).cast("int")

  /** All input columns + (shard, pos): pos is the 0-based rank within
    * the shard under the shuffled order (ties impossible — the id is
    * the tiebreak). */
  def assign(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(orderKey, col(idCol))
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Write `outDir/shard=K/` parquet, each shard's file(s) sorted by
    * `pos`, plus a `_manifest` parquet of per-shard row/token counts —
    * what a data-loader needs to plan an epoch without opening shards.
    * Returns the manifest. */
  def write(df: DataFrame, outDir: String,
      tokenCount: Option[Column] = None): DataFrame = {
    val assigned = assign(
      tokenCount.map(tc => df.withColumn("__tok", tc.cast("long")))
        .getOrElse(df))
    assigned
      .repartition(nShards, col("shard")).sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val manifest = assigned.groupBy("shard").agg(
      count(lit(1)).as("rows"),
      (if (tokenCount.isDefined) sum(col("__tok")) else lit(null).cast("long"))
        .as("tokens"))
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }
}

/** Exact per-group top-fraction selection — the percentile quality gate
  * (FineWeb-Edu's "keep documents above the classifier-score
  * percentile", per domain): keep the ceil(frac·n_g) best rows of each
  * group by (score desc, id asc). Deterministic and EXACT, without a
  * per-group global sort:
  *
  *   1. histogram (group, score) → counts — the only corpus-wide
  *      aggregate, map-side combined, sized by DISTINCT scores per
  *      group (scores are rounded upstream, so this is bounded);
  *   2. a window cumsum over the HISTOGRAM (tiny) finds each group's
  *      threshold score and how many boundary ties to admit;
  *   3. rows join the per-(group, score) verdict on an equi-key:
  *      scores above the threshold keep wholesale; ONLY the boundary
  *      ties (score == threshold) pay a row_number, and that window is
  *      partitioned by (group, score) — the tie set, not the group.
  *
  * The degenerate worst case (every row of a group sharing one score)
  * makes the boundary window the whole group — same cost as the naive
  * rank, never worse. A group with n_g ≥ 1 keeps at least one row
  * (ceil). */
case class TopFractionByGroup(
    frac: Double,
    groupCol: String = "source",
    scoreCol: String = "score",
    idCol: String = "doc_id") {
  require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")

  def apply(df: DataFrame): DataFrame =
    GroupQuota.select(df,
      total => ceil(total * frac).cast("long"),
      groupCol, scoreCol, idCol)
}

/** Curriculum shard layout — [[TrainingShardLayout]]'s ordered sibling
  * (curriculum learning, Bengio et al. 2009): shard membership stays
  * the balanced deterministic hash, but WITHIN each shard documents
  * order by an explicit difficulty/quality score ascending (easy-first
  * — e.g. CCNet perplexity: most-fluent documents lead the epoch) with
  * the id as tiebreak, instead of the shuffled `:ord:` hash. A loader
  * reading shards in `pos` order replays the curriculum; the score
  * column is the experiment knob (negate it for hard-first).
  *
  * Same scale shape as TrainingShardLayout: map-only shard assignment;
  * the per-shard rank window IS the physical write layout, scaling
  * per-shard (grow nShards with the corpus). */
case class CurriculumShardLayout(nShards: Int = 32,
    idCol: String = "doc_id", seed: String = "graft") {
  require(nShards > 0, "nShards must be positive")

  /** All input columns + (shard, pos): pos ranks by (score asc, id). */
  def assign(df: DataFrame, score: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(score.asc, col(idCol).asc)
    df.withColumn("shard", TrainingShardLayout(nShards, idCol, seed).shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }
}

/** Per-group FIXED quota cap — the RefinedWeb/anti-spam "at most n
  * documents per domain" rule, the fixed-count sibling of
  * [[TopFractionByGroup]]'s fractional gate (a content farm with 10⁶
  * pages gets the same ceiling as a blog with 10³; a fraction would
  * still admit 10⁵ of the farm). Same histogram-quota machinery, so no
  * per-group sort of the corpus and the payload never shuffles. */
case class GroupCap(
    n: Int,
    groupCol: String = "source",
    scoreCol: String = "score",
    idCol: String = "doc_id") {
  require(n > 0, "cap must be positive")

  def apply(df: DataFrame): DataFrame =
    GroupQuota.select(df, total => least(lit(n.toLong), total),
      groupCol, scoreCol, idCol)
}

/** Shared quota-selection machinery behind [[TopFractionByGroup]] and
  * [[GroupCap]]: keep, per group, the `quota(groupTotal)` best rows by
  * score (ties: smallest id).
  *
  * Scale shape: the verdict is computed on the NARROW (id, group,
  * score) projection and survivors semi-join back — the wide payload
  * never sorts or shuffles for the selection (measured 5× at 1M docs:
  * the full frame rode the (group, score) sort-merge join with its
  * text column attached). The per-group work runs over the (group,
  * score) HISTOGRAM — bounded by distinct scores, not rows — with one
  * tie-boundary window over just the boundary block.
  *
  * NULL-score rows are deliberately excluded BEFORE the histogram: a
  * quality gate admits only affirmatively-scored rows, and an unscored
  * row must not inflate the group's quota (it can never survive the
  * score equi-join anyway). Score rows upstream, or coalesce to a
  * sentinel, if unscored rows should compete. */
private[graft] object GroupQuota {
  def select(df: DataFrame, quota: Column => Column,
      groupCol: String, scoreCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val narrow = df.select(col(idCol), col(groupCol), col(scoreCol))
      .where(col(scoreCol).isNotNull)
    val hist = narrow.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val byScoreDesc = Window.partitionBy(groupCol).orderBy(col(scoreCol).desc)
    val whole = Window.partitionBy(groupCol)
    // __cum = rows at-or-above this score; __k = the group's quota;
    // __take = quota left when this score's tie block starts
    val marks = hist
      .withColumn("__cum", sum(col("__c")).over(byScoreDesc))
      .withColumn("__k", quota(sum(col("__c")).over(whole)))
      .withColumn("__take", col("__k") - (col("__cum") - col("__c")))
      .filter(col("__take") > 0)
      .select(col(groupCol), col(scoreCol),
        (col("__cum") <= col("__k")).as("__full"), col("__take"))
    // ONE pass over the joined rows: the old kept/boundary split
    // referenced `joined` twice and the union re-evaluated the whole
    // hist-window + join subtree per branch. Full tie blocks keep every
    // row regardless of rank, boundary blocks keep the first __take by
    // id — the per-(group, score) window is bounded by the largest tie
    // block, never the group.
    val picked = narrow.join(marks, Seq(groupCol, scoreCol))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(groupCol, scoreCol).orderBy(col(idCol))))
      .filter(col("__full") || col("__rn") <= col("__take"))
    df.join(picked.select(col(idCol)), Seq(idCol), "left_semi")
  }
}

/** Leakage-safe train/val/test splitting: assign splits per near-dup
  * COMPONENT, not per document — every member of a connected
  * near-duplicate component inherits the split of its component label,
  * so two near-copies of the same page can never land one in train and
  * one in test. That straddle is the classic eval-contamination path
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better": train/test overlap via near-dups inflates benchmark
  * numbers even after exact dedup), and a per-doc hash split — exactly
  * because it is uniform and id-keyed — puts a near-dup PAIR on the
  * train/test boundary with probability 2·p·(1−p).
  *
  * Composition over existing pieces: candidate edges (any near-dup
  * operator's pairs — MinHash LSH here) → [[graft.operators.dedup
  * .ConnectedComponents]] min-label → [[HashSampler.split]] keyed on
  * the COMPONENT id instead of the doc id. The split stays a pure
  * deterministic md5-bucket filter (rerun-stable, layout-independent);
  * the only added cost over the per-doc split is the component
  * labeling the dedup pass computes anyway — at 100 TB, reuse ONE
  * labeling for both dedup survivor selection and the split.
  *
  * Reference anchor: the reference dedups (operators/dedup) but splits
  * per-record; this is the composition its own benchmark-decontam
  * story implies. */
object LeakageSafeSplit {

  /** (input columns) + component + split. Isolated docs are their own
    * component, so they split exactly like a per-doc hash split keyed
    * by id. */
  def apply(df: DataFrame, edges: DataFrame, trainBuckets: Int = 80,
      valBuckets: Int = 10, idCol: String = "doc_id", buckets: Int = 100,
      seed: String = "graft", splitCol: String = "split"): DataFrame = {
    val comp = graft.operators.dedup.ConnectedComponents(
      edges, df.select(idCol), idCol)
    HashSampler(idCol = "component", buckets = buckets, seed = seed)
      .split(df.join(comp, Seq(idCol)), trainBuckets, valBuckets, splitCol)
  }

  /** The audit for an EXISTING split column: components whose members
    * straddle more than one split — (component, n_docs, n_splits,
    * splits) per leaking component, empty when the split is
    * leakage-safe. Run this before trusting any eval built from a
    * corpus someone split per-document. Narrow all the way: the corpus
    * contributes only (id, split), the labeling only (id, component);
    * output is bounded by the number of LEAKING components. Null
    * splits are ignored by the distinct count (SQL semantics) — a
    * component mixing null and one real split does NOT flag; splits
    * produced by [[HashSampler.split]] / [[LeakageSafeSplit.apply]]
    * are never null. */
  def audit(df: DataFrame, edges: DataFrame, idCol: String = "doc_id",
      splitCol: String = "split"): DataFrame = {
    val comp = graft.operators.dedup.ConnectedComponents(
      edges, df.select(idCol), idCol)
    df.select(col(idCol), col(splitCol)).join(comp, Seq(idCol))
      .groupBy("component")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col(splitCol)).as("n_splits"),
        array_sort(collect_set(col(splitCol))).as("splits"))
      .filter(col("n_splits") > 1)
  }
}
