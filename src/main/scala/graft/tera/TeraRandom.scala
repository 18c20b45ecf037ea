package graft.tera

/** The sortbenchmark.org 128-bit linear congruential generator
  * X1 = (a*X0 + c) mod 2^128 with L'Ecuyer's multiplier — constants per
  * reference `apps/terasort/Random16.h:27-40`.
  *
  * `skipAhead` advances from seed 0 by `n` steps in O(log n) via function
  * composition: the n-fold application of f(x) = a*x + c is itself affine,
  * and composing/squaring affine maps needs only the (a, c) pair. This is
  * what makes per-partition parallel generation deterministic — each Spark
  * task seeds independently at its first record number.
  */
object TeraRandom {
  val A: U128 = U128(0x2360ed051fc65da4L, 0x4385df649fccf645L)
  val C: U128 = U128(0x4a696d4772617952L, 0x4950202020202001L)

  def next(x: U128): U128 = A * x + C

  /** State of the generator after `n` steps from seed 0 (n >= 0). */
  def skipAhead(n: Long): U128 = {
    // Accumulate the affine map g = f^n as (accA, accC); the answer is
    // g(0) = accC. stepA/stepC hold f^(2^k).
    var accA = U128.One
    var accC = U128.Zero
    var stepA = A
    var stepC = C
    var bits = n
    while (bits != 0L) {
      if ((bits & 1L) != 0L) {
        accA = stepA * accA
        accC = stepA * accC + stepC
      }
      stepC = (stepA + U128.One) * stepC
      stepA = stepA * stepA
      bits >>>= 1
    }
    accC
  }
}
