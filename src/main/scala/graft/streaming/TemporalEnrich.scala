package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal (versioned-dimension) enrichment of a stream — Flink's "temporal
  * table join" / the lakehouse SCD2 lookup, composed Spark-first: a
  * stream-static LEFT join on the key plus the validity-interval predicate,
  * so every event is decorated with the dimension row that was current AT THE
  * EVENT'S OWN version/time, not at processing time (the distinction that
  * makes backfills and replays reproducible).
  *
  * The dimension side is a plain DataFrame in SCD2 shape
  * ([[graft.operators.Relational.scd2Merge]]): per business key, versioned
  * rows with `[valid_from, valid_to)` intervals, the open row carrying a null
  * `valid_to`. Because SCD2 intervals are disjoint per key, each event
  * matches at most one dimension row — the join cannot fan out (pinned in
  * TemporalSpec).
  *
  * Scale: with `broadcastDim = true` (the default — dimensions are usually
  * small) the dimension broadcasts, so stream-static joins never shuffle the
  * stream side; each micro-batch re-plans the join, so a dimension backed by
  * a table path picks up merges between batches without restarting the
  * query. At a dimension too large to broadcast, pass `broadcastDim = false`
  * and the planner's cost-based choice applies (typically shuffle both
  * sides) — semantics unchanged, one shuffle of the batch's events, and no
  * forced driver-side materialization of an oversized dimension.
  */
object TemporalEnrich {

  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      key: (String, String),
      version: String,
      validFrom: String = "valid_from",
      validTo: String = "valid_to",
      broadcastDim: Boolean = true): DataFrame =
    stream.join(
      if (broadcastDim) broadcast(dim) else dim,
      stream(key._1) === dim(key._2) &&
        dim(validFrom) <= stream(version) &&
        (dim(validTo).isNull || stream(version) < dim(validTo)),
      "left")
}
