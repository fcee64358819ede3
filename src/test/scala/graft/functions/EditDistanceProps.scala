package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property fuzz of the banded thresholded kernel against a textbook full
  * Wagner-Fischer DP written independently of the production code. The
  * generators bias toward near-misses (small alphabets, mutated copies)
  * because uniformly random pairs are almost always far apart and would
  * never stress the band edges or the early exit.
  */
object EditDistanceProps extends Properties("EditDistanceWithin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  private def levRef(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var diag = prev(0)
      prev(0) = i
      for (j <- 1 to b.length) {
        val tmp = prev(j)
        prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
          diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        diag = tmp
      }
    }
    prev(b.length)
  }

  private def within(a: String, b: String, k: Int): Boolean =
    EditDistance.within(UTF8String.fromString(a), UTF8String.fromString(b), k)

  private val word = for {
    len <- Gen.choose(0, 24)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
  } yield cs.mkString

  /** (base, mutation-of-base) pairs: distances cluster around small k,
    * which is where a banding bug would hide.
    */
  private val nearPair = for {
    base <- word
    nEdits <- Gen.choose(0, 5)
    edits <- Gen.listOfN(nEdits, for {
      op <- Gen.oneOf(0, 1, 2)
      pos <- Gen.choose(0, 23)
      c <- Gen.oneOf('a', 'b', 'x')
    } yield (op, pos, c))
  } yield (base, edits.foldLeft(base) { case (s, (op, pos0, c)) =>
    if (s.isEmpty) s + c
    else {
      val pos = pos0 % s.length
      op match {
        case 0 => s.updated(pos, c)                // substitute
        case 1 => s.take(pos) + c + s.drop(pos)    // insert
        case 2 => s.take(pos) + s.drop(pos + 1)    // delete
      }
    }
  })

  property("agrees with full DP on random pairs, all k") =
    forAllNoShrink(word, word, Gen.choose(0, 6)) { (a, b, k) =>
      within(a, b, k) == (levRef(a, b) <= k)
    }

  property("agrees with full DP on mutated near-pairs, all k") =
    forAllNoShrink(nearPair, Gen.choose(0, 6)) { case ((a, b), k) =>
      within(a, b, k) == (levRef(a, b) <= k)
    }

  property("symmetry and identity") =
    forAllNoShrink(word, word, Gen.choose(0, 6)) { (a, b, k) =>
      within(a, b, k) == within(b, a, k) && within(a, a, 0)
    }
}
