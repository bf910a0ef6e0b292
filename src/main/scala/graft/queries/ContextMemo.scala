package graft.queries

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Per-SparkContext memo for checkpointed relations (the co-purchase /
  * perceptual-hash memos). Keyed WEAKLY by the SparkContext object
  * itself rather than `System.identityHashCode(sc)`: identity hashes
  * are not unique, so a stale entry from a stopped context could be
  * served to a new one, and integer-keyed entries for dead contexts
  * were never evicted — an unbounded memo in long-lived multi-session
  * JVMs (ADVICE r16). A WeakHashMap entry dies with its context; while
  * the context is alive the active session holds it strongly, so
  * nothing is evicted early. A checkpointed plan dies with its context,
  * which is exactly the lifetime this gives the cached DataFrames.
  */
private[queries] object ContextMemo {
  private val memos = new java.util.WeakHashMap[
    SparkContext, scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def getOrElseUpdate(sc: SparkContext, key: String)
      (build: => DataFrame): DataFrame = {
    val m = memos.synchronized {
      var t = memos.get(sc)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        memos.put(sc, t)
      }
      t
    }
    m.getOrElseUpdate(key, build)
  }
}
