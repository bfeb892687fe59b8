package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters summary as a first-class mergeable Spark
  * aggregate [EXT] — the deterministic-guarantee sibling of q114's
  * count-min: a bounded summary of at most `m` counters whose estimate
  * obeys, for EVERY item x and ANY partition/merge order,
  *
  *   true(x) − N/(m+1)  ≤  est(x)  ≤  true(x)
  *
  * (N = stream length; est(x) = 0 for items not retained). In
  * particular every item with true(x) > N/(m+1) is GUARANTEED to be
  * retained — that invariant is what q131 publishes, because it is
  * merge-order-free, while the raw counter values legitimately vary
  * with Spark's nondeterministic shuffle-merge order (same reason q105
  * publishes the min-of-mins signature: only order-free facts are
  * reproducible facts on a cluster).
  *
  * - `reduce`: the classic counter update — increment a held counter,
  *   insert while capacity remains, else decrement ALL counters by one
  *   (zeros evicted, the new item NOT inserted). The decrement is the
  *   textbook O(m) form; per-element cost is bounded by the constant
  *   `m`, not the corpus (heap-backed implementations shave the
  *   constant, not the asymptotics).
  * - `merge`: pointwise counter sum, then if more than `m` counters
  *   survive, subtract the (m+1)-th largest count from every counter
  *   and evict non-positives — the mergeable-summaries construction
  *   (Agarwal, Cormode, Huang, Phillips, Wei, Yi, PODS 2012), which
  *   preserves the error bound additively: each input summary's error
  *   plus the subtracted offset stays ≤ N/(m+1) of the COMBINED
  *   stream. Associativity of the BOUND (not the values) is exactly
  *   what a shuffle needs.
  *
  * Buffer rides kryo (a mutable HashMap); the output is a plain
  * `map<string,bigint>` column, so callers explode it relationally.
  */
class MisraGries(m: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(m >= 1, s"MisraGries capacity must be >= 1, got $m")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(
      b: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
    MisraGries.observe(b, x, m)
    b
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > m) {
      // (m+1)-th largest count, subtracted from all (evict non-positive)
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val offset = counts(counts.length - (m + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - offset)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** The classic counter update — increment a held counter, insert
    * while capacity remains, else decrement ALL (zeros evicted, the
    * new item NOT inserted). Shared by the batch Aggregator and the
    * streaming skew monitor (`StreamOps.skewMonitor`): ONE source of
    * truth for the summary semantics, so the q131 error bound applies
    * identically to both forms. */
  private[graft] def observe(
      b: mutable.HashMap[String, Long], x: String, m: Int): Unit = {
    if (x == null) return
    b.get(x) match {
      case Some(c) => b.update(x, c + 1)
      case None if b.size < m => b.update(x, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        b.mapValuesInPlace((_, c) => c - 1)
        b.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(b.remove)
    }
  }

  /** Column API: `tokens.agg(MisraGries.summary($"tok", 256))` →
    * one `map<string,bigint>` of ≤ 256 candidate heavy hitters. */
  def summary(c: Column, m: Int): Column = udaf(new MisraGries(m)).apply(c)

  /** SQL registration: `SELECT mg_summary(tok) FROM ...` (capacity
    * fixed at registration time — SQL aggregates take no config args). */
  def register(spark: SparkSession, m: Int = 256): Unit =
    spark.udf.register("mg_summary", udaf(new MisraGries(m)))
}
