package graft.plans

import graft.SparkTestBase
import graft.candy.{Fulfillment, InventoryEntry, ItemRow}

/** The custom-operator formulation must produce exactly the manual
  * repartition+sort kernel's results, with the planner (not the operator)
  * inserting the exchange and sort.
  */
class FulfillmentPlanSpec extends SparkTestBase {

  import spark.implicits._

  private def randomItems(n: Int): Seq[ItemRow] = {
    val rnd = new scala.util.Random(11)
    (1 to n).map { i =>
      ItemRow(rnd.nextInt(200).toLong,
        f"2024-02-${1 + rnd.nextInt(10)}%02dT0${rnd.nextInt(10)}:00:00.000000",
        rnd.nextInt(12).toLong, rnd.nextInt(15), i.toLong)
    }
  }

  private val inv: Map[Long, InventoryEntry] =
    (0L to 11L).map(p => p -> InventoryEntry(40 + (p * 5 % 30).toInt, 2.0 + p)).toMap

  test("custom operator equals the manual kernel in both modes") {
    val items = randomItems(800)
    Seq(false, true).foreach { reload =>
      val viaPlan = FulfillmentPlan.run(items.toDS(), inv, reload)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(5)))
        .sorted.toSeq
      val viaKernel = Fulfillment.run(spark, items.toDS(), inv, reload)
        .collect()
        .map(f => (f.order_id, f.product_id, f.quantity, f.order_date))
        .sorted.toSeq
      assert(viaPlan == viaKernel, s"reloadDaily=$reload")
    }
  }

  test("planner inserts the exchange and sort for the declared requirements") {
    val df = FulfillmentPlan.run(randomItems(100).toDS(), inv)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the "Exec" suffix in plan rendering
    assert(plan.contains("Fulfillment"), plan)
    assert(plan.contains("Exchange hashpartitioning(product_id"), s"planner-inserted exchange missing:\n$plan")
    assert(plan.contains("Sort [product_id"), s"planner-inserted sort missing:\n$plan")
  }

  test("output schema and price/line_total semantics match") {
    val items = Seq(ItemRow(1, "2024-02-01T00:00:00", 1, 4, 0))
    val row = FulfillmentPlan.run(items.toDS(), Map(1L -> InventoryEntry(10, 6.7))).head()
    assert(row.getDouble(3) == 6.7 && row.getDouble(4) == 26.8)
    assert(row.getString(5) == "2024-02-01")
  }
}
