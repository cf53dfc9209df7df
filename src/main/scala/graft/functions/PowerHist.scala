package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch for the rollup lattice: a sparse histogram of
  * the power measure quantized to [[PowerHist.BinWidth]]-watt bins, stored
  * as a `map<bin, count>` column beside the other partial aggregates
  * (SURVEY.md §4 — Druid ships approximate-histogram columns on its rollups
  * for exactly this; `database/Druid_conf_power_raw_avro` is the analog).
  *
  * The sketch is EXACT for the quantized distribution: every level of the
  * lattice merges bins by summing counts (associative + commutative), so a
  * percentile computed from any merged histogram equals the percentile of
  * the quantized raw values — no re-scan, no decay with lattice depth. The
  * only error versus the un-quantized measure is quantization itself,
  * bounded by one [[PowerHist.BinWidth]]. Sketch size is bounded by the
  * measure's value range / BinWidth (keys actually observed), independent
  * of row count — the property that lets a 100 TB table serve percentile
  * tiles from kilobyte-sized per-group maps.
  */
object PowerHist {

  /** Quantization width (watts): `bin = floor(power / BinWidth)`. Every
    * histogram-served percentile is exact over `bin * BinWidth` values and
    * within BinWidth of the un-quantized percentile.
    */
  val BinWidth = 1.0

  def bin(power: Double): Long = math.floor(power / BinWidth).toLong

  private[graft] def mergeMaps(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    small.foldLeft(large) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
  }

  /** Raw measure → histogram. Input is `Option[Double]` so SQL NULLs skip
    * (the rollup's `cnt_power` discipline: the sketch's total count always
    * equals the null-safe measure count).
    */
  class HistAggregator
      extends Aggregator[Option[Double], Map[Long, Long], Map[Long, Long]] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(m: Map[Long, Long], v: Option[Double]): Map[Long, Long] =
      v.fold(m)(p => m.updated(bin(p), m.getOrElse(bin(p), 0L) + 1L))
    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      mergeMaps(a, b)
    override def finish(m: Map[Long, Long]): Map[Long, Long] = m
    override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  }

  /** Histogram → histogram: one lattice (or serving-time) merge step. */
  class MergeAggregator
      extends Aggregator[Map[Long, Long], Map[Long, Long], Map[Long, Long]] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(m: Map[Long, Long], v: Map[Long, Long]): Map[Long, Long] =
      if (v == null) m else mergeMaps(m, v)
    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      mergeMaps(a, b)
    override def finish(m: Map[Long, Long]): Map[Long, Long] = m
    override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  }

  val mergeAggregator = new MergeAggregator

  /** `hist(powerCol)` — build a histogram per group from the raw measure. */
  def hist(c: Column): Column = udaf(new HistAggregator).apply(c)

  /** `merge(histCol)` — merge per-group histograms one level up. */
  def merge(c: Column): Column = udaf(mergeAggregator).apply(c)

  /** Inverse CDF with the discrete rule both engines can state exactly:
    * the smallest bin whose cumulative count reaches `ceil(p * total)`
    * (percentile_disc over the quantized values). None for an empty
    * histogram (all-NULL or empty group) — the aggregate's NULL.
    */
  def quantileBin(m: scala.collection.Map[Long, Long], p: Double): Option[Long] = {
    if (m == null || m.isEmpty) return None
    val total = m.valuesIterator.sum
    val target = math.ceil(p * total).toLong.max(1L)
    var cum = 0L
    m.toSeq.sortBy(_._1).foreach { case (b, c) =>
      cum += c
      if (cum >= target) return Some(b)
    }
    Some(m.keysIterator.max)
  }

  /** [[quantileBin]] rendered in watts, null-propagating — the scalar the
    * RollupRewrite rule splices after its merge aggregate.
    */
  def quantileValue(m: scala.collection.Map[Long, Long], p: Double): java.lang.Double =
    quantileBin(m, p).map(b => b * BinWidth: java.lang.Double).orNull
}
