package graft.functions

/** Top-level object so Scala emits static forwarders — callable as
  * `graft.functions.GraftHash.fnv1a64(...)` from Janino-generated Java in
  * whole-stage codegen. */
object GraftHash {

  /** Standard FNV-1a 64-bit over raw bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer: full-avalanche mix of a 64-bit value. */
  def mix64(v: Long): Long = {
    var z = v
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  /** Seeded variant (MinHash permutation family). */
  def fnv1a64Seeded(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
