package graft.operators

import graft.SparkTestBase
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property fuzz of substring-level dedup against an independent in-memory
  * reference model. The generator uses a TINY word alphabet so duplicated
  * windows occur constantly (uniform long words would almost never
  * collide), which stresses the interesting machinery: island merging of
  * overlapping/adjacent windows, within-doc repeats, spans touching doc
  * boundaries, and whole-doc coverage in the scrub.
  *
  * The reference computes covered POSITIONS and takes maximal consecutive
  * runs — a deliberately different formulation from the operator's
  * window-start gaps-and-islands (starts p1 < p2 merge iff p2 <= p1 + k
  * ⟺ their coverage is contiguous), so a bug in either direction of that
  * equivalence fails the comparison.
  *
  * Case count is small: each case runs real Spark jobs.
  */
object SubstringDedupProps extends Properties("SubstringDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private def spark = SparkTestBase.session

  private val genDoc: Gen[List[String]] = for {
    len <- Gen.choose(0, 30)
    ws <- Gen.listOfN(len, Gen.oneOf("red", "blue", "green", "gold", "iron", "clay"))
  } yield ws

  private val genCorpus: Gen[List[List[String]]] =
    Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, genDoc))

  /** Reference: all dup-window-covered positions per doc → maximal
    * consecutive runs, with per-span site counts.
    */
  private def refModel(docs: Map[Long, List[String]], k: Int, minSites: Int)
  : (Map[Long, List[(Int, Int, Int)]], Map[Long, (Int, Int, String)]) = {
    val sites = for {
      (id, ws) <- docs.toList
      i <- 1 to ws.length - k + 1
    } yield (ws.slice(i - 1, i - 1 + k).mkString(" "), id, i)
    val counts = sites.groupBy(_._1).view.mapValues(_.size).toMap
    val dup = sites.filter(s => counts(s._1) >= minSites)
    val coveredByDoc = dup.groupBy(_._2).view
      .mapValues(_.flatMap(s => s._3 until s._3 + k).toSet).toMap
    val spans = coveredByDoc.map { case (id, cov) =>
      val sorted = cov.toList.sorted
      val runs = sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: tail, p) if p == e + 1 => (s, p) :: tail
        case (acc, p) => (p, p) :: acc
      }.reverse
      id -> runs.map { case (s, e) =>
        (s, e, dup.count(d => d._2 == id && d._3 >= s && d._3 + k - 1 <= e))
      }
    }
    val scrub = docs.map { case (id, ws) =>
      val cov = coveredByDoc.getOrElse(id, Set.empty)
      val kept = ws.zipWithIndex.collect { case (w, i) if !cov(i + 1) => w }
      id -> (ws.length, ws.length - kept.length, kept.mkString(" "))
    }
    (spans, scrub)
  }

  property("spans and scrub equal the coverage-run reference model") =
    forAllNoShrink(genCorpus, Gen.oneOf(2, 3, 4)) { (corpus, k) =>
      val s = spark
      import s.implicits._
      val docs = corpus.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val (refSpans, refScrub) = refModel(docs.toMap, k, minSites = 2)

      val gotSpans = Dedup.duplicatedSpans(df, "doc_id", "text", k = k)
        .collect()
        .map(r => (r.getLong(0), (r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toList).toMap
      val spansOk = refSpans.filter(_._2.nonEmpty).forall { case (id, expect) =>
        gotSpans.getOrElse(id, Nil).map(t => (t._1, t._2, t._3)) == expect &&
          gotSpans(id).forall { case (st, en, _, text) =>
            text == docs.toMap.apply(id).slice(st - 1, en).mkString(" ")
          }
      } && gotSpans.keySet == refSpans.filter(_._2.nonEmpty).keySet

      val gotScrub = Dedup.scrubDuplicatedSpans(df, "doc_id", "text", k = k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
        .toMap
      val scrubOk = refScrub.forall { case (id, expect) => gotScrub(id) == expect } &&
        gotScrub.keySet == refScrub.keySet

      spansOk && scrubOk
    }

  property("keepFirst scrub cuts every site EXCEPT each window's first") =
    forAllNoShrink(genCorpus, Gen.oneOf(2, 3)) { (corpus, k) =>
      val s = spark
      import s.implicits._
      val docs = corpus.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      // reference: per duplicated window, drop the (id, pos)-first site
      // from coverage; everything else is covered
      val sites = for {
        (id, ws) <- docs
        i <- 1 to ws.length - k + 1
      } yield (ws.slice(i - 1, i - 1 + k).mkString(" "), id, i)
      val scrubSites = sites.groupBy(_._1).toList.flatMap { case (_, ss) =>
        if (ss.size >= 2) ss.sortBy(x => (x._2, x._3)).drop(1) else Nil
      }
      val covered = scrubSites.groupBy(_._2).view
        .mapValues(_.flatMap(x => x._3 until x._3 + k).toSet).toMap
      val expect = docs.map { case (id, ws) =>
        val cov = covered.getOrElse(id, Set.empty)
        id -> ((ws.length, cov.size,
          ws.zipWithIndex.collect { case (w, i) if !cov(i + 1) => w }.mkString(" ")))
      }.toMap
      val got = Dedup.scrubDuplicatedSpans(df, "doc_id", "text", k = k,
          keepFirst = true)
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
        .toMap
      got == expect
    }
}
