package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cut for self-referencing operators — the shared form of the
  * fix the fused curation capstone measured (SURVEY §5.12/§16): a
  * keep-first/near-dup operator references its input at least twice
  * (winners ⋈ input), so composed lazily after expression-deriving
  * stages the upstream chain re-evaluates once per reference, AND
  * Catalyst's filter pushdown substitutes derived columns' full
  * expressions into every predicate reference below the join —
  * exponential recompute across stacked dedup layers (naive fused
  * 11-stage chain: >703 s where staged ran 114 s at 2.25M rows).
  *
  * A LAZY `localCheckpoint(eager = false)` shares ONE
  * cached-on-first-use RDD between the references while the job stays
  * a single action, and compacts the printed plan to a LogicalRDD
  * (`persist()` instead renders the cache name from the EXPANDED tree,
  * which doubles per dedup layer — at stage 8+ the *string* is the
  * driver OOM).
  *
  * Streams cannot checkpoint, and neither can an OBSERVED plan
  * (`Pipeline.observed` funnels): a checkpoint would bury the upstream
  * CollectMetrics nodes inside an opaque RDD and their Observations
  * would read 0. Both fall back to the plain multi-reference, which
  * those diagnostic modes accept (bounded per micro-batch / per run).
  */
object Lineage {
  def cut(df: DataFrame): DataFrame = {
    val observed = df.queryExecution.analyzed.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c
    }.nonEmpty
    // already a bare checkpointed-RDD scan (e.g. a staged pipeline's
    // per-stage localCheckpoint, or a caller that cut already): there
    // is no lineage to cut and no multi-reference hazard — wrapping it
    // again would STORE THE SAME ROWS A SECOND TIME (one more full
    // buffer of the input per operator) for zero plan compaction.
    val alreadyCut = df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    if (df.isStreaming || observed || alreadyCut) df
    else df.localCheckpoint(false)
  }
}
