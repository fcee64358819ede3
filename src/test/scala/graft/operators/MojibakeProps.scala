package graft.operators

import graft.SparkTestBase
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property fuzz of the mojibake repair: for any string over the
  * REPAIRABLE alphabet (the table's intended characters + printable
  * ASCII minus quote/backslash, which the SQL splice in the generator
  * path would escape differently), the JVM's own UTF-8→cp1252 round-trip
  * corruption must invert exactly — repair(corrupt(s)) == s — and the
  * detector must count exactly the non-ASCII characters (each target
  * corrupts to exactly one table sequence; ASCII is cp1252-invariant).
  *
  * The generator leans heavily on ADJACENT targets (runs of é’…—
  * back-to-back) because rule-order/nesting bugs only fire when
  * sequences abut.
  */
object MojibakeProps extends Properties("MojibakeRepair") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private def spark = SparkTestBase.session

  private val targets: Seq[Char] = TextAnalysis.mojibakeTable.map(_._2.head)
  private val ascii: Seq[Char] =
    (' ' to '~').filterNot(c => c == '\'' || c == '\\')

  private val genChar: Gen[Char] =
    Gen.frequency(1 -> Gen.oneOf(ascii), 2 -> Gen.oneOf(targets))

  private val genStr: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))

  private def corrupt(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      "windows-1252")

  property("repair inverts the round-trip; count = non-ASCII chars") =
    forAllNoShrink(Gen.listOfN(8, genStr)) { strs =>
      val s = spark
      import s.implicits._
      val rows = strs.zipWithIndex.map { case (orig, i) =>
        (i.toLong, corrupt(orig))
      }
      val got = rows.toDF("id", "t")
        .selectExpr("id",
          s"${TextAnalysis.mojibakeRepairExpr("t")} AS fixed",
          s"CAST(${TextAnalysis.mojibakeCountExpr("t")} AS BIGINT) AS n_bad")
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      strs.zipWithIndex.forall { case (orig, i) =>
        val (fixed, nBad) = got(i.toLong)
        fixed == orig && nBad == orig.count(_ > '\u007f').toLong
      }
    }
}
