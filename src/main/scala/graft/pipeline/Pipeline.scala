package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Config-driven staged pipeline — the Spark-native re-expression of
  * the reference's framework (framework/executor.py + operator.py:
  * Filter / Refiner / Deduplicator stages defined in YAML, executed by
  * Ray actor pools with a metrics funnel).
  *
  * Here a pipeline is a *lazy* composition of DataFrame transforms:
  * Catalyst fuses all stages into one physical plan (filters collapse
  * into the scan, refiner columns stay in whole-stage codegen), so
  * "stages" cost nothing at runtime — the opposite of the reference's
  * materialized per-stage batches. Funnel observability comes from
  * `Dataset.observe`, which counts rows in-flight without extra jobs.
  */
sealed trait PipelineOp { def name: String }

/** Boolean keep-predicate over the current schema (reference Filter). */
case class FilterOp(name: String, predicate: DataFrame => Column) extends PipelineOp

/** Adds/rewrites columns (reference Refiner). */
case class RefineOp(name: String, refine: DataFrame => DataFrame) extends PipelineOp

/** Keep-first dedup on a derived key (reference Deduplicator). */
case class DedupOp(name: String, key: DataFrame => Column, idCol: String) extends PipelineOp

/** Per-operator runtime metrics (reference framework/metrics: each
  * stage reports rows in/out, pass-rate, wall time and records/sec). */
case class StageMetrics(op: String, rowsIn: Long, rowsOut: Long, wallSec: Double) {
  def passRate: Double = if (rowsIn > 0) rowsOut.toDouble / rowsIn else 0.0
  def recPerSec: Double = if (wallSec > 0) rowsIn / wallSec else 0.0
}

case class Pipeline(ops: Seq[PipelineOp]) {

  /** Apply all ops; lazy (one action materializes the whole chain),
    * with one lineage cut per dedup stage — see [[dedupCut]]. */
  def apply(df: DataFrame): DataFrame = ops.foldLeft(df) {
    case (d, FilterOp(_, p)) => d.filter(p(d))
    case (d, RefineOp(_, f)) => f(d)
    case (d, DedupOp(_, k, id)) =>
      val c = dedupCut(d)
      graft.operators.dedup.KeepFirst(c, k(c), id)
  }

  /** A dedup references its input twice (winners ⋈ input). Composed
    * naively, every dedup stage doubles the number of upstream
    * evaluations — the fused capstone chain (3 dedup layers over a
    * regexp-heavy 2.25M-row prefix) re-ran its prefix ~8× and took
    * >10 min where staged execution took 114 s — and the *printed*
    * plan tree grows exponentially with dedup count. A LAZY
    * `localCheckpoint(eager = false)` shares ONE cached-on-first-use
    * RDD between the two branches (and every later stage) while the
    * job stays a single action, and compacts the plan to a LogicalRDD.
    * Streaming plans cannot checkpoint; there the double-reference is
    * per-micro-batch and bounded by the trigger size. Observed plans
    * cannot either — the checkpoint would bury upstream CollectMetrics
    * nodes and their Observations would read 0. */
  private def dedupCut(d: DataFrame): DataFrame = graft.operators.Lineage.cut(d)

  /** Apply with an `observe` row-counter after the input and after every
    * op. Returns the result plus the Observation handles; read them with
    * [[funnelReport]] after running any action on the result. */
  def observed(df: DataFrame): (DataFrame, Seq[(String, Observation)]) = {
    val obsIn = new Observation()
    var obs = Vector("input" -> obsIn)
    var cur = df.observe(obsIn, count(lit(1)).as("n"))
    ops.foreach { op =>
      cur = (op match {
        case FilterOp(_, p) => cur.filter(p(cur))
        case RefineOp(_, f) => f(cur)
        // NO dedupCut here: a localCheckpoint would bury the upstream
        // observe nodes inside an opaque RDD whose CollectMetrics never
        // reach the action's Observation listener (counts read 0).
        // Operators with an internal cut (UrlDedup) keep it — their
        // own observe nodes sit above the checkpoint.
        case DedupOp(_, k, id) => graft.operators.dedup.KeepFirst(cur, k(cur), id)
      })
      val o = new Observation()
      obs :+= op.name -> o
      cur = cur.observe(o, count(lit(1)).as("n"))
    }
    (cur, obs)
  }

  /** (step, n_rows) after an action has materialized the observed
    * DataFrame. A stage whose observe node never executed reports -1
    * (rendered "n/a"): operators with INTERNAL iteration checkpoints —
    * the MinHash-components survivor dedup's loop state, PageRank —
    * must cut lineage mid-algorithm regardless of observation (without
    * the cut their recursive plans explode), and that cut buries every
    * upstream CollectMetrics inside an opaque RDD. Exact per-stage
    * counts for such chains come from the staged paths
    * ([[funnelStaged]] / `graft.Main profile`), which this report
    * points at instead of crashing the run. */
  def funnelReport(obs: Seq[(String, Observation)]): Seq[(String, Long)] =
    obs.map { case (name, o) =>
      name -> o.get.get("n").map(_.asInstanceOf[Long]).getOrElse(-1L)
    }

  /** Streaming twin of [[observed]]: NAMED observe nodes, which the
    * engine reports per micro-batch through
    * `QueryProgressEvent.observedMetrics` — funnel counts with zero
    * extra jobs, collected by
    * [[graft.streaming.StreamingMetricsListener]]. Names carry a
    * zero-padded stage index so reports keep pipeline order. */
  def observedStream(df: DataFrame): DataFrame = {
    var cur = df.observe("graft_stage_000_input", count(lit(1)).as("n"))
    ops.zipWithIndex.foreach { case (op, i) =>
      cur = (op match {
        case FilterOp(_, p) => cur.filter(p(cur))
        case RefineOp(_, f) => f(cur)
        case DedupOp(_, k, id) => graft.operators.dedup.KeepFirst(cur, k(cur), id)
      })
      cur = cur.observe(f"graft_stage_${i + 1}%03d_${op.name}", count(lit(1)).as("n"))
    }
    cur
  }

  /** Diagnostic per-operator profiling: each stage is materialized and
    * timed on its own — the reference's execution model (one actor-pool
    * batch per stage), reproduced so per-op wall time and rec/s are
    * measurable. Production runs should use [[observed]] instead:
    * Catalyst fuses the whole pipeline into one pass, so per-op wall
    * time *does not exist* there — which is the optimization. Use
    * profile() on a sample to find the slow operator, then run fused.
    *
    * Stages are cut with `localCheckpoint(eager = true)`, NOT
    * `persist`: self-referencing stages (winners ⋈ input dedups)
    * expand the shared upstream subtree once per reference, so a
    * cumulatively-composed chain's *printed* tree grows exponentially
    * with stage count even though the in-memory DAG is shared — and
    * `persist` renders exactly that tree for the cache name
    * (InMemoryRelation's cachedName), which at stage 8+ of the
    * curation capstone is an OOM, not a string. The checkpoint
    * replaces each stage's plan with a compact LogicalRDD, bounding
    * every downstream plan by ONE stage's ops. Checkpointed blocks are
    * released by the ContextCleaner as stage references drop. */
  def profile(df: DataFrame): (DataFrame, Seq[StageMetrics]) = {
    var cur = df.localCheckpoint(true)
    var rows = cur.count()
    val metrics = ops.map { op =>
      val t0 = System.nanoTime()
      val next = (op match {
        case FilterOp(_, p) => cur.filter(p(cur))
        case RefineOp(_, f) => f(cur)
        case DedupOp(_, k, id) => graft.operators.dedup.KeepFirst(cur, k(cur), id)
      }).localCheckpoint(true)
      val outRows = next.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val m = StageMetrics(op.name, rows, outRows, wall)
      cur = next
      rows = outRows
      m
    }
    (cur, metrics)
  }

  /** [[profile]]'s staged execution (each stage localCheckpointed once,
    * so self-referencing stages never re-derive their upstream and the
    * plan stays bounded by one stage's ops) WITHOUT the per-stage
    * count actions — for consumers that need only the FINAL frame, the
    * 2·|stages| jobs profile() pays for its metrics are pure overhead.
    * The last stage skips its checkpoint too: its output flows straight
    * into whatever action the caller runs. */
  def stagedApply(df: DataFrame): DataFrame = {
    if (ops.isEmpty) return df
    var cur = df.localCheckpoint(true)
    ops.zipWithIndex.foreach { case (op, i) =>
      val next = op match {
        case FilterOp(_, p) => cur.filter(p(cur))
        case RefineOp(_, f) => f(cur)
        case DedupOp(_, k, id) => graft.operators.dedup.KeepFirst(cur, k(cur), id)
      }
      cur = if (i == ops.length - 1) next else next.localCheckpoint(true)
    }
    cur
  }

  /** Per-document rejection audit — the provenance twin of the funnel:
    * for every INPUT row, which stage dropped it (`rejected_by`, with
    * its 1-based `stage_idx`) or `kept` (idx 0) — the "why is my
    * document gone" answer a curation run owes its corpus users, and
    * the per-stage sample you debug a threshold with.
    *
    * Staged like [[profile]] (each stage checkpointed once); each
    * stage adds ONE left-anti join of the narrow id columns
    * (stage-in vs stage-out) — no driver-side ids, the audit is a
    * DataFrame union of those per-stage drop sets. The accumulator is
    * itself checkpointed every [[Pipeline.AuditCheckpointEvery]] stages
    * (the loop-state discipline every iterative operator here uses), so
    * a 50-stage chain carries at most a 16-leg union plan, never a
    * 50-leg one. Cost is the staged run plus an id-keyed anti join per
    * stage, all on checkpointed
    * narrow inputs. `idCol` must be unique per input row (the corpus
    * contract every dedup in the chain already assumes); the audit's
    * "exactly one verdict per row" property is the spec's first
    * assertion. */
  def rejectionAudit(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    var cur = df.localCheckpoint(true)
    var audit: Option[DataFrame] = None
    ops.zipWithIndex.foreach { case (op, i) =>
      val next = (op match {
        case FilterOp(_, p) => cur.filter(p(cur))
        case RefineOp(_, f) => f(cur)
        case DedupOp(_, k, id) => graft.operators.dedup.KeepFirst(cur, k(cur), id)
      }).localCheckpoint(true)
      val lost = cur.select(col(idCol))
        .join(next.select(col(idCol)), Seq(idCol), "left_anti")
        .select(col(idCol), lit(i + 1).as("stage_idx"),
          lit(op.name).as("rejected_by"))
      audit = Some(audit.fold(lost)(_.unionByName(lost)))
      if ((i + 1) % Pipeline.AuditCheckpointEvery == 0)
        audit = audit.map(_.localCheckpoint(true))
      cur = next
    }
    val kept = cur.select(col(idCol), lit(0).as("stage_idx"),
      lit("kept").as("rejected_by"))
    audit.fold(kept)(_.unionByName(kept))
  }

  /** Per-stage funnel as a DataFrame (step_idx, step, n_rows) —
    * computed the staged way ([[profile]]: each stage checkpointed
    * once, counted, previous stage released), NOT via `observe`: dedup
    * operators reference their input twice (winners ⋈ input), and a
    * CollectMetrics node inside a self-referenced subtree would count
    * every row once per reference. Counts are a handful of driver longs
    * (one per stage) — bounded regardless of corpus size. */
  def funnelStaged(df: DataFrame): DataFrame = {
    val (_, metrics) = profile(df)
    val spark = df.sparkSession
    import spark.implicits._
    val steps = ("input", metrics.headOption.map(_.rowsIn).getOrElse(0L)) +:
      metrics.map(m => (m.op, m.rowsOut))
    steps.zipWithIndex
      .map { case ((name, n), i) => (i, name, n) }
      .toDF("step_idx", "step", "n_rows")
  }

  /** Reference-style stage summary with per-op wall time + rec/s
    * (scripts/generate_metrics_report.py, README "Performance"). */
  def formatStageReport(metrics: Seq[StageMetrics]): String = {
    val sb = new StringBuilder
    sb.append("=" * 72).append('\n')
    val input = metrics.headOption.map(_.rowsIn).getOrElse(0L)
    val output = metrics.lastOption.map(_.rowsOut).getOrElse(0L)
    val wall = metrics.map(_.wallSec).sum
    val pct = if (input > 0) 100.0 * output / input else 0.0
    sb.append(f"Input: $input%,d -> Output: $output%,d ($pct%.1f%% pass)  ")
    sb.append(f"Total: $wall%.2fs  ${if (wall > 0) input / wall else 0.0}%,.0f rec/s%n")
    sb.append(f"  ${"operator"}%-28s ${"rows_out"}%12s ${"pass"}%7s ${"wall_s"}%8s ${"rec/s"}%12s%n")
    metrics.foreach { m =>
      sb.append(f"  ${m.op}%-28s ${m.rowsOut}%,12d ${m.passRate * 100}%6.1f%% ${m.wallSec}%8.3f ${m.recPerSec}%,12.0f%n")
    }
    sb.append("=" * 72)
    sb.toString
  }

  /** Human-readable funnel in the reference's report style
    * (framework/metrics/reporter.py): per-op rows in → out + pass rate. */
  def formatReport(funnel: Seq[(String, Long)], wallSeconds: Double = 0.0): String = {
    val sb = new StringBuilder
    sb.append("=" * 60).append('\n')
    val input = funnel.headOption.map(_._2).getOrElse(0L)
    val output = funnel.lastOption.map(_._2).getOrElse(0L)
    if (input >= 0) {
      val pct = if (input > 0) 100.0 * output / input else 0.0
      sb.append(f"Input: $input%,d -> Output: $output%,d ($pct%.1f%% pass)%n")
      if (wallSeconds > 0)
        sb.append(f"Total time: $wallSeconds%.2fs  Throughput: ${input / wallSeconds}%,.0f records/sec%n")
    } else {
      sb.append(f"Output: $output%,d (input count not observable — run `profile` for exact counts)%n")
      if (wallSeconds > 0) sb.append(f"Total time: $wallSeconds%.2fs%n")
    }
    funnel.sliding(2).foreach {
      case Seq((_, in), (op, out)) =>
        if (out < 0)
          sb.append(f"  $op%-32s ${"n/a"}%12s (stage not observable here — run `profile` for exact counts)%n")
        else if (in < 0)
          sb.append(f"  $op%-32s $out%,12d (pass rate n/a — previous stage not observable)%n")
        else {
          val p = if (in > 0) 100.0 * out / in else 0.0
          sb.append(f"  $op%-32s $out%,12d ($p%.1f%% pass)%n")
        }
      case _ =>
    }
    sb.append("=" * 60)
    sb.toString
  }

  /** Single-pass funnel for filter/dedup-only pipelines: one scan, one
    * aggregate — the 100 TB-friendly way to audit pass-rates without
    * running the pipeline N times. Refiners are applied (they may feed
    * later predicates) but do not add funnel steps of their own beyond a
    * pass-through count. */
  def funnelCounts(df: DataFrame): DataFrame = {
    // build cumulative predicates against the fully-refined frame
    val refined = ops.foldLeft(df) {
      case (d, RefineOp(_, f)) => f(d)
      case (d, _) => d
    }
    // Project each stage's predicate/dedup-key expression ONCE as a
    // column; the aggregate below then conjoins cheap slot reads.
    // Embedding the raw predicates directly would re-inline predicates
    // 1..k into stage k's agg expression — O(stages² · |predicate|)
    // generated code inside ONE hashAgg doConsume, which whole-stage
    // codegen cannot split (inputs are Java locals) and janino then
    // fails to compile, silently dropping the plan to interpreted.
    // Multi-referenced non-cheap columns also block CollapseProject, so
    // the projection genuinely survives into the physical plan.
    val staged = ops.zipWithIndex.map {
      case (FilterOp(n, p), i) => (s"__funnel_p$i", p(refined))
      case (DedupOp(_, k, _), i) => (s"__funnel_k$i", k(refined))
      case (RefineOp(_, _), i) => (s"__funnel_r$i", lit(true))
    }
    val projected = refined.select(col("*") +: staged.map {
      case (c, e) => e.as(c) }: _*)
    var cum: Column = lit(true)
    var aggs = Vector[(String, Column)]("input" -> count(lit(1)))
    ops.zipWithIndex.foreach {
      case (FilterOp(n, _), i) =>
        cum = cum && col(s"__funnel_p$i")
        aggs :+= n -> sum(when(cum, 1L).otherwise(0L))
      case (RefineOp(n, _), _) =>
        aggs :+= n -> sum(when(cum, 1L).otherwise(0L))
      case (DedupOp(n, _, _), i) =>
        aggs :+= n -> countDistinct(when(cum, col(s"__funnel_k$i")))
    }
    val row = projected.agg(aggs.head._2.as("c0"),
      aggs.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"c${i + 1}") }: _*)
    val steps = aggs.map(_._1).zipWithIndex.map { case (n, i) =>
      struct(lit(i).as("step_idx"), lit(n).as("step"), col(s"c$i").cast("long").as("n_rows"))
    }
    row.select(explode(array(steps: _*)).as("s"))
      .select(col("s.step_idx"), col("s.step"), col("s.n_rows"))
  }
}

object Pipeline {
  /** How often [[Pipeline.rejectionAudit]] checkpoints its union
    * accumulator: without this, an N-stage chain's audit plan is an
    * N-leg union — narrow columns, but a 50-stage chain would carry a
    * 50-leg plan through every downstream optimization pass. 16 keeps
    * the plan bounded while amortizing the checkpoint over many cheap
    * (3-column) legs. */
  val AuditCheckpointEvery = 16
}
