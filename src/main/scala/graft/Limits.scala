package graft

/** Shared clamps for bounded driver-side fetches: operators that collect a
  * capped result (blocklist grams, BPE word dictionaries) fetch cap+1 rows
  * through an Int-typed limit and `require` under the cap afterwards.
  */
object Limits {
  /** A long bound clamped into the Int range `limit(...)` accepts. */
  def toIntBound(n: Long): Int =
    math.min(n, (Int.MaxValue - 1).toLong).toInt
}
