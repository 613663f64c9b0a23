package graft

import scala.collection.concurrent.TrieMap

/** Named span timings recorded inside query closures that build
  * persisted indexes (v02/v05/v07/g12), so the bench can report
  * index-build vs probe time separately instead of one opaque
  * build-inclusive number. Recording is two nanoTime calls per span —
  * free next to an index build — so it is always on; Bench drains the
  * registry into the emitted JSON.
  *
  * HIERARCHY-AWARE (r17 VERDICT #1): spans may nest (s02 records its
  * ctas/drain1/insert/drain2 legs INSIDE its build span). A span that
  * starts while another span is active on the same thread is marked
  * `nested`; the bench's `probe = total − Σ(sub-spans)` residual must
  * subtract only TOP-LEVEL spans, or the nested legs are counted twice
  * and the residual goes negative (BENCH_FULL.json shipped
  * `s02_streaming_window.probe: -3.11`). Nesting is tracked per
  * thread — query closures run their spans on the calling thread.
  */
object BenchPhases {
  private val spans = TrieMap.empty[String, Double]
  private val nestedNames = TrieMap.empty[String, Unit]
  private val active = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  def timed[T](name: String)(f: => T): T = {
    val stack = active.get()
    if (stack.nonEmpty) nestedNames.put(name, ())
    active.set(name :: stack)
    val t0 = System.nanoTime()
    try f
    finally {
      spans.put(name, (System.nanoTime() - t0) / 1e9)
      active.set(active.get() match { case _ :: t => t; case Nil => Nil })
    }
  }

  def snapshot: Map[String, Double] = spans.toMap

  /** Names recorded while another span was active on the same thread —
    * informational in the artifact, excluded from probe residuals. */
  def nestedSnapshot: Set[String] = nestedNames.keySet.toSet

  def clear(): Unit = { spans.clear(); nestedNames.clear() }
}
