package graft.plans

import graft.candy.{Fulfillment, InventoryEntry, ItemRow}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Literal, SortOrder, Substring, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.GraftDatasetBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The fulfillment kernel as a first-class Catalyst operator: a custom
  * LogicalPlan node planned by a SparkStrategy into a SparkPlan that
  * DECLARES its distribution and ordering requirements — the planner
  * inserts the hash exchange and the (product, day, seq) sort, instead of
  * the operator hand-rolling repartition + sortWithinPartitions as
  * graft.candy.Fulfillment.run does. Equivalent results (spec-checked);
  * this is the (c)-path of the custom-operator preference order, and the
  * formulation that lets Catalyst REUSE an existing partitioning when the
  * child is already clustered by product (e.g. bucketed input) — the manual
  * repartition always pays the shuffle.
  */
object FulfillmentPlan {

  val outputSchema: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("product_id", LongType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("unit_price", DoubleType, nullable = false),
    StructField("line_total", DoubleType, nullable = false),
    StructField("order_date", StringType, nullable = false)))

  /** Fresh output attributes for one node instance. Must be created ONCE
    * per node and carried as constructor state: a computed `output` val
    * would mint new exprIds on every tree copy, orphaning downstream
    * attribute references mid-optimization.
    */
  def newOutput(): Seq[Attribute] =
    outputSchema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())

  /** Plan fulfillment over cleaned items through the custom operator.
    * Requires GraftExtensions' strategy (registered here if absent).
    */
  def run(items: Dataset[ItemRow], inventory: Map[Long, InventoryEntry],
          reloadDaily: Boolean = false): DataFrame = {
    val spark = items.sparkSession
    GraftExtensions.registerStrategy(spark)
    GraftDatasetBridge.ofRows(spark,
      FulfillmentNode(items.queryExecution.analyzed, inventory, reloadDaily,
        newOutput()))
  }
}

/** Logical node: child must provide the ItemRow columns. Output attributes
  * are constructor state so tree copies preserve exprId identity.
  */
case class FulfillmentNode(child: LogicalPlan,
                           inventory: Map[Long, InventoryEntry],
                           reloadDaily: Boolean,
                           output: Seq[Attribute]) extends UnaryNode {
  // the node PRODUCES its output attributes (they are not derived from the
  // child), which CheckAnalysis requires to be declared explicitly
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def withNewChildInternal(newChild: LogicalPlan): FulfillmentNode =
    copy(child = newChild)
}

/** Strategy mapping the logical node to its physical operator. */
object FulfillmentStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case FulfillmentNode(child, inventory, reloadDaily, out) =>
      FulfillmentExec(planLater(child), inventory, reloadDaily, out) :: Nil
    case _ => Nil
  }
}

/** Physical operator: requires clustering by product and a per-partition
  * (product, day-prefix, seq) sort — Catalyst plans the exchange/sort —
  * then streams the per-run fold over InternalRows.
  */
case class FulfillmentExec(child: SparkPlan,
                           inventory: Map[Long, InventoryEntry],
                           reloadDaily: Boolean,
                           output: Seq[Attribute]) extends UnaryExecNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)

  private def childAttr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"fulfillment child must provide column '$name', got ${child.output.map(_.name)}"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(childAttr("product_id"))) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(Seq(
    SortOrder(childAttr("product_id"), Ascending),
    SortOrder(Substring(childAttr("order_datetime"), Literal(1), Literal(10)), Ascending),
    SortOrder(childAttr("seq"), Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val idxOrder = child.output.indexWhere(_.name == "order_id")
    val idxDt = child.output.indexWhere(_.name == "order_datetime")
    val idxPid = child.output.indexWhere(_.name == "product_id")
    val idxQty = child.output.indexWhere(_.name == "quantity")
    val inv = sparkContext.broadcast(inventory)
    val reload = reloadDaily
    child.execute().mapPartitions({ rows =>
      // downstream operators require UnsafeRow; project the generic rows
      val toUnsafe = UnsafeProjection.create(FulfillmentPlan.outputSchema)
      var currentPid = Long.MinValue
      var currentDay: UTF8String = null
      var available = 0
      var snapshotStock = 0
      var price = 0.0
      rows.map { r =>
        val pid = r.getLong(idxPid)
        val day = r.getUTF8String(idxDt).substring(0, 10)
        if (pid != currentPid) {
          currentPid = pid
          currentDay = day
          val e = inv.value.getOrElse(pid, InventoryEntry(0, 0.0))
          snapshotStock = e.stock
          available = e.stock
          price = e.price
        } else if (day != currentDay) {
          currentDay = day
          if (reload) available = snapshotStock
        }
        val qty = r.getInt(idxQty)
        val fulfilled =
          if (available > 0 && qty <= available) { available -= qty; qty }
          else 0
        toUnsafe(InternalRow(r.getLong(idxOrder), pid, fulfilled, price,
          Fulfillment.round2(fulfilled * price), day))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): FulfillmentExec =
    copy(child = newChild)
}
