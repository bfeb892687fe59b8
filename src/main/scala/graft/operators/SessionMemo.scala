package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive shared frames (the q66
  * components run, the q168 √n-IVF index, the q179 PQ codebook).
  * Several registered queries legitimately share one priced
  * dependency — q66/q79/q176/q177/q184 all ride the label-propagation
  * components frame, q168/q178/q185 the trained IVF index — and
  * re-deriving it per query is correct but quintuple-pays the most
  * expensive frame in the repo within one bench/Verify process (and,
  * at 100 TB, within one production session). The memo key is
  * (SparkSession, helper:dir): the helpers are deterministic
  * functions of (session, dir), so serving the cached frame is
  * semantically transparent — every consumer sees exactly the frame a
  * fresh run would compute, and Verify's per-query isolation is
  * preserved because the cached value IS the per-query value.
  *
  * Eviction is EXPLICIT, not weak-key: the cached values are Datasets
  * (or tuples of them) and every Dataset strongly references its
  * SparkSession, so a WeakHashMap's keys would never be collected
  * (the documented value→key-cycle caveat). Instead, every access
  * sweeps entries whose SparkContext has stopped — a stopped
  * session's entries (and the localCheckpoint blocks its frames pin)
  * are dropped at the next memo touch by ANY session. Values are
  * pinned for the session's lifetime — only frames that are
  * dup-/√n-/metadata-bounded belong here, never a corpus-sized frame.
  */
private[graft] object SessionMemo {
  private val maps =
    new java.util.HashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, AnyRef]]()

  /** Drop entries for sessions whose context has stopped. Caller must
    * hold `maps`' monitor. Cheap: |live sessions| is O(1) in every
    * real process. */
  private def evictStopped(): Unit = {
    val it = maps.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
  }

  /** The persisted-RDD ids backing this session's memoized frames.
    *
    * Bench's between-query hygiene unpersists every persistent RDD
    * (dead checkpoint blocks otherwise accumulate until late queries
    * pay eviction churn — its round-6 fix), but unpersisting a
    * checkpoint-backed MEMOIZED frame is fatal, not wasteful: the
    * lineage was truncated at checkpoint time, so the next consumer
    * dies with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND instead of
    * recomputing (observed: q178 at 100× after q179's run). Bench
    * therefore skips exactly these ids. Walking `analyzed` is
    * plan-only — nothing executes here. */
  def pinnedRddIds(s: SparkSession): Set[Int] = {
    import scala.jdk.CollectionConverters._
    val mm = maps.synchronized { evictStopped(); maps.get(s) }
    if (mm == null) Set.empty
    else mm.values.asScala.toSeq.flatMap(datasetsIn).flatMap { d =>
      d.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      }
    }.toSet
  }

  private def datasetsIn(v: AnyRef): Seq[org.apache.spark.sql.Dataset[_]] = v match {
    case d: org.apache.spark.sql.Dataset[_] => Seq(d)
    case p: Product =>
      p.productIterator.collect { case d: org.apache.spark.sql.Dataset[_] => d }.toSeq
    case _ => Nil
  }

  def get[T <: AnyRef](s: SparkSession, key: String)(compute: => T): T = {
    val m = maps.synchronized {
      evictStopped()
      var mm = maps.get(s)
      if (mm == null) {
        mm = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
        maps.put(s, mm)
      }
      mm
    }
    // computeIfAbsent would deadlock-risk recursive helper chains and
    // runs Spark jobs under the map's bin lock, so compute runs
    // unlocked. Under a true race two instances may be computed, but
    // putIfAbsent makes every caller converge on the SINGLE winning
    // instance — mandatory in the pinning context: a loser instance
    // held by its caller would not be in pinnedRddIds, and Bench's
    // unpersist sweep would kill its checkpoint blocks under the
    // caller (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    val cached = m.get(key)
    if (cached != null) cached.asInstanceOf[T]
    else {
      val v = compute
      val prev = m.putIfAbsent(key, v.asInstanceOf[AnyRef])
      if (prev != null) prev.asInstanceOf[T] else v
    }
  }
}
