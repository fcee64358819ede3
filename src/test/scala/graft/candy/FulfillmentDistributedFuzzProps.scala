package graft.candy

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import scala.util.Random

/** Distributed leg of the kernel fuzz: random multi-product scenarios run
  * through BOTH distributed kernels ([[Fulfillment.run]] and
  * [[Fulfillment.runWithHotSplit]] with a threshold tiny enough that
  * generated products actually split) and must equal the in-memory
  * reference model row-for-row. The input Dataset is fed in a RANDOM
  * permutation each case: the kernels' internal (product, day, seq)
  * ordering contract — not input order — must determine the fold, which is
  * exactly the permutation-invariance the 100 TB shuffle requires.
  *
  * Case count is deliberately small (each case is real Spark jobs); the
  * 1000+-case bulk runs in the pure suite (FulfillmentFuzzProps).
  */
object FulfillmentDistributedFuzzProps extends Properties("FulfillmentDistributed") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def spark = SparkTestBase.session

  val genProduct: Gen[(Long, Int, Double, List[ItemRow])] = for {
    pid <- Gen.choose(1L, 1000L)
    stock <- FulfillmentFuzzProps.genStock
    price <- FulfillmentFuzzProps.genPrice
    rows <- FulfillmentFuzzProps.genRows(pid)
  } yield (pid, stock, price, rows)

  val genScenario: Gen[(List[(Long, Int, Double, List[ItemRow])], Boolean, Long)] = for {
    nProducts <- Gen.choose(1, 5)
    prods0 <- Gen.listOfN(nProducts, genProduct)
    reset <- Gen.oneOf(false, true)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    // distinct pids, and re-key order_ids to be globally unique so outputs
    // compare as sets
    val prods = prods0.zipWithIndex.map { case ((pid, st, pr, rows), i) =>
      val p = pid * 10 + i
      (p, st, pr, rows.map(r => r.copy(product_id = p,
        order_id = p * 1000000L + r.seq)))
    }
    (prods, reset, seed)
  }

  property("run and runWithHotSplit match the in-memory model under input permutation") =
    forAllNoShrink(genScenario) { case (prods, reset, seed) =>
      val s = spark
      import s.implicits._
      val inventory = prods.map { case (pid, st, pr, _) =>
        pid -> InventoryEntry(st, pr) }.toMap
      val want = prods.flatMap { case (_, st, pr, rows) =>
        FulfillmentFuzzProps.Model.fold(st, pr, rows, reset) }.toSet
      val shuffled = new Random(seed).shuffle(prods.flatMap(_._4))
      val items = spark.createDataset(shuffled).repartition(4)
      val gotRun = Fulfillment.run(spark, items, inventory, reset)
        .collect().toSet
      val gotSplit = Fulfillment.runWithHotSplit(spark, items, inventory, reset,
        hotRowThreshold = 8L, subRanges = 2).collect().toSet
      (Prop(gotRun == want) :| s"run: missing=${(want -- gotRun).take(3)} extra=${(gotRun -- want).take(3)}") &&
        (Prop(gotSplit == want) :| s"hotSplit: missing=${(want -- gotSplit).take(3)} extra=${(gotSplit -- want).take(3)}")
    }
}
