package graft

import scala.collection.concurrent.TrieMap

/** Named span timings recorded inside query closures that build
  * persisted indexes (v02/v05/v07/g12), so the bench can report
  * index-build vs probe time separately instead of one opaque
  * build-inclusive number. Recording is two nanoTime calls per span —
  * free next to an index build — so it is always on; Bench drains the
  * registry into the emitted JSON.
  */
object BenchPhases {
  private val spans = TrieMap.empty[String, Double]

  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally spans.put(name, (System.nanoTime() - t0) / 1e9)
  }

  def snapshot: Map[String, Double] = spans.toMap

  def clear(): Unit = spans.clear()
}
