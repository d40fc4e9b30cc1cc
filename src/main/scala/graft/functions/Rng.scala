package graft.functions

/** Deterministic, order-free pseudo-randomness: every draw is a pure function
  * of (seed, stream, index), so a corpus row can be generated independently on
  * any executor in any order — no java.util.Random iteration-order dependence.
  * splitmix64 finalizer (public domain, Steele et al., "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA 2014).
  */
object Rng {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit draw for (seed, stream, i). */
  def draw(seed: Long, stream: Long, i: Long): Long =
    mix(mix(mix(seed) ^ stream) ^ i)

  /** Uniform int in [0, n). */
  def nextInt(seed: Long, stream: Long, i: Long, n: Int): Int = {
    val v = draw(seed, stream, i) >>> 1 // non-negative
    (v % n).toInt
  }

  /** Zipf-ish rank in [0, n): rank r with weight 1/(r+1); sampled by inverse
    * of the harmonic CDF approximation — deterministic integer-only variant:
    * draw u in [0, H) where H ~ sum 1/(r+1) scaled; linear scan is fine for
    * small n (host tables).
    */
  def zipf(seed: Long, stream: Long, i: Long, n: Int): Int = {
    // scaled weights: w(r) = K / (r+1); cumulative scan over n ranks
    val K = 100000L
    var total = 0L
    var r = 0
    while (r < n) { total += K / (r + 1); r += 1 }
    var u = (draw(seed, stream, i) >>> 1) % total
    r = 0
    while (r < n) {
      val w = K / (r + 1)
      if (u < w) return r
      u -= w
      r += 1
    }
    n - 1
  }
}
