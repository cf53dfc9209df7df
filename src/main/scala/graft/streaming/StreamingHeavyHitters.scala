package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters with BOUNDED state: the Space-Saving sketch
  * (Metwally et al., "Efficient Computation of Frequent and Top-k Elements
  * in Data Streams", ICDT 2005) sharded over `flatMapGroupsWithState` —
  * the streaming twin of the batch count-min ledger
  * ([[graft.text.TextOps]] `cmsTopK`). A plain streaming `groupBy(token)`
  * keeps one state row PER DISTINCT TOKEN (unbounded on an open vocabulary);
  * this keeps exactly `capacity` counters per shard regardless of stream
  * length — the property that makes frequency monitoring viable on an
  * unbounded 100 TB/day stream.
  *
  * Sharding: tokens hash onto `shards` state keys, each holding an
  * independent Space-Saving summary. A token's total count lands entirely in
  * its own shard, so per-shard guarantees carry over: any token with true
  * count > batchCount/capacity (per shard) is retained, and every estimate
  * overcounts by at most the recorded `err` (the evicted minimum at
  * insertion) — the spec pins both. Shards scale the state-store shuffle
  * like any keyed aggregation.
  *
  * Emission: Update mode; after each micro-batch every shard re-emits its
  * current monitor list (token, est, err), so the sink always holds the
  * latest frequency table per shard.
  */
object StreamingHeavyHitters {

  case class TokenCount(token: String, est: Long, err: Long)
  case class Summary(counters: Map[String, (Long, Long)]) // token -> (est, err)

  case class ShardCounts(shard: Int, token: String, est: Long, err: Long)

  def plan(tokens: DataFrame, capacity: Int = 8, shards: Int = 4): Dataset[ShardCounts] = {
    import tokens.sparkSession.implicits._
    tokens
      .select(pmod(hash(col("token")), lit(shards)).cast("int").as("shard"), col("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        process(capacity))
  }

  private def process(capacity: Int)(
      shard: Int,
      rows: Iterator[(Int, String)],
      state: GroupState[Summary]): Iterator[ShardCounts] = {
    var counters = state.getOption.map(_.counters).getOrElse(Map.empty)
    // batch-local pre-aggregation: one Space-Saving update per distinct token
    val batch = rows.map(_._2).toSeq.groupBy(identity).view.mapValues(_.size.toLong)
    // deterministic apply order so replays rebuild identical summaries
    batch.toSeq.sortBy(_._1).foreach { case (token, n) =>
      counters.get(token) match {
        case Some((est, err)) =>
          counters = counters.updated(token, (est + n, err))
        case None if counters.size < capacity =>
          counters = counters.updated(token, (n, 0L))
        case None =>
          // evict the minimum (ties: lexicographically first, deterministic);
          // the newcomer inherits its count as the overcount bound
          val (evicted, (minEst, _)) = counters.minBy { case (t, (e, _)) => (e, t) }
          counters = (counters - evicted).updated(token, (minEst + n, minEst))
      }
    }
    state.update(Summary(counters))
    counters.iterator.map { case (t, (est, err)) => ShardCounts(shard, t, est, err) }
  }
}
