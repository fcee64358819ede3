package graft.operators

import graft.functions.UnigramCodec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property fuzz of the unigram Viterbi kernel (r15 VERDICT #7 done
  * criterion "kernel ≡ spec props"): the kernel's left-to-right DP with
  * the (score desc, pieces asc, longest-last) tie order must equal the
  * BRUTE-FORCE spec — enumerate EVERY segmentation of the word into
  * inventory pieces, score it with the same integer ilog likelihoods,
  * and pick the best under the same total order extended recursively
  * (longest last piece, then longest second-to-last, ...). Small
  * alphabets + short pieces force dense tie landscapes, exactly where a
  * wrong tie-break hides. A second property pins end-to-end training:
  * any trained model segments every trained-on word losslessly, with
  * `countTokens ≡ tokens(...).length`.
  */
object UnigramKernelProps extends Properties("UnigramKernel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val genWord: Gen[String] =
    Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))

  private val genCorpus: Gen[Seq[(String, Long)]] = for {
    n <- Gen.choose(1, 8)
    ws <- Gen.listOfN(n, genWord)
    fs <- Gen.listOfN(n, Gen.choose(1L, 500L))
  } yield ws.distinct.zip(fs)

  /** All segmentations of `w` into pieces of the inventory, lengths <=
    * maxLen. */
  private def allSegs(w: String, inv: Set[String], maxLen: Int): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, w.length)).flatMap { k =>
      val h = w.substring(0, k)
      if (inv(h)) allSegs(w.substring(k), inv, maxLen).map(h :: _) else Nil
    }

  /** The DP's total order, extended to full paths: higher score, then
    * fewer pieces, then the LAST piece longer, recursing leftward — the
    * global image of the per-position (sc desc, np asc, k desc) rule. */
  private def better(a: (Long, List[String]), b: (Long, List[String])): Boolean = {
    if (a._1 != b._1) return a._1 > b._1
    if (a._2.length != b._2.length) return a._2.length < b._2.length
    val (ra, rb) = (a._2.reverse, b._2.reverse)
    ra.zip(rb).find { case (x, y) => x.length != y.length } match {
      case Some((x, y)) => x.length > y.length
      case None => false
    }
  }

  property("viterbi == brute-force best segmentation under the tie order") =
    forAllNoShrink(genCorpus, genWord) { (corpus, probe) =>
      // inventory: all substrings (<=3) of corpus words + the probe's
      // single chars (coverage), counts from the corpus seed rule
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      corpus.foreach { case (w, f) =>
        for (i <- 0 until w.length; k <- 1 to math.min(3, w.length - i))
          counts.update(w.substring(i, i + k),
            counts.getOrElse(w.substring(i, i + k), 0L) + f)
      }
      probe.foreach(c => counts.getOrElseUpdate(c.toString, 0L))
      val pieces = counts.keys.toArray.sorted
      val codec = new UnigramCodec(pieces, pieces.map(counts), 3)
      val lt = codec.logTotal
      def scoreOf(seg: List[String]): Long =
        seg.map(p => codec.ilog(counts(p) + 1) - lt).sum
      val segs = allSegs(probe, counts.keySet.toSet, 3)
        .map(s => (scoreOf(s), s))
      val best = segs.reduceLeft((x, y) => if (better(y, x)) y else x)
      val got = codec.tokens(probe).toList
      val pass = got == best._2 && codec.countTokens(probe) == got.length
      if (!pass) println(s"probe=$probe got=$got best=$best segs=${segs.take(8)}")
      pass
    }

  property("trained model is lossless and count-consistent on its corpus") =
    forAllNoShrink(genCorpus, Gen.choose(3, 12)) { (corpus, vocabSize) =>
      val (model, artifact) = Tokenizer.unigramTrainFromWordFreq(
        corpus, vocabSize, maxPieceLen = 3, rounds = 2)
      val codec = model.codec
      corpus.forall { case (w, _) =>
        val toks = codec.tokens(w)
        toks.mkString == w && codec.countTokens(w) == toks.length
      } && artifact.map(_._1) == artifact.indices
    }
}
