package graft.fixtures

/** SplitMix64 PRNG (public-domain algorithm, Steele et al.). Used for all
  * fixture generation, keyed per row: `SplitMix64.forKey(seed, docId)` — no
  * shared RNG state across rows, so generation is order-independent and
  * byte-reproducible regardless of Spark partitioning (FIXTURES.md §2).
  */
final class SplitMix64(seed0: Long) {
  private var state: Long = seed0

  def nextLong(): Long = {
    state += 0x9E3779B97F4A7C15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, bound). */
  def nextInt(bound: Int): Int = {
    require(bound > 0)
    java.lang.Math.floorMod(nextLong(), bound.toLong).toInt
  }

  /** Uniform in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16

  /** Power-law-skewed index in [0, n): P(0) ≈ n^(-1/3) (hot head). */
  def nextZipfish(n: Int): Int = {
    val u = nextDouble()
    math.min(n - 1, (u * u * u * n).toInt)
  }

  def pick[A](xs: IndexedSeq[A]): A = xs(nextInt(xs.length))
}

object SplitMix64 {
  final val FixtureSeed = 42L

  /** Independent stream per (seed, key): mix the key through one splitmix
    * round so adjacent keys do not yield correlated streams. */
  def forKey(seed: Long, key: Long): SplitMix64 = {
    var z = seed ^ (key * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    new SplitMix64(z ^ (z >>> 31))
  }
}
