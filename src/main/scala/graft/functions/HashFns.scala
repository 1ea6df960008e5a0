package graft.functions

/**
 * Self-contained 64-bit hashing used by the dedup/similarity layer
 * (MinHash, SimHash, document fingerprints).
 *
 * FNV-1a over UTF-8 bytes followed by a SplitMix64 finalizer, with the seed
 * mixed in — both public-domain constructions (FNV: Fowler/Noll/Vo;
 * SplitMix64: Steele et al., "Fast Splittable Pseudorandom Number
 * Generators", OOPSLA 2014). Deterministic across JVMs and partitions, which
 * is what matters for shuffle-key stability at scale.
 */
object HashFns {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over the raw bytes. */
  def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def fnv1a(bytes: Array[Byte]): Long = fnv1a(bytes, 0, bytes.length)

  /** SplitMix64 finalizer — full-avalanche 64→64 mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Seeded string hash: hash_seed(s) = mix64(fnv1a(s) ^ mix64(seed)).
    * One base FNV pass per string; per-seed cost is a single mix — this is
    * what makes H-seed MinHash O(shingles + H) instead of O(shingles × H). */
  def hashSeeded(base: Long, seed: Long): Long = mix64(base ^ mix64(seed))
}
