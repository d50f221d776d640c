package graft.functions

import java.util.{TreeMap => JTreeMap}

/** Test-only bridge: re-exports KmvSketch's package-private buffer ops
  * for the ScalaCheck suite (which lives in `graft.props`).
  */
object KmvTestHooks {
  def offer(buf: JTreeMap[Long, Long], k: Int, v: Long): Unit =
    KmvSketch.offer(buf, k, v)
  def mergeInto(a: JTreeMap[Long, Long], k: Int, b: JTreeMap[Long, Long]): Unit =
    KmvSketch.mergeInto(a, k, b)
  def estimate(buf: JTreeMap[Long, Long], k: Int): Long =
    KmvSketch.estimate(buf, k)
}
