package graft.candy

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins money-column rendering beyond the golden data's range. The goldens
  * never exceed 999 (SURVEY §1.2), so the thousands-separator behavior of
  * format_number was unexercised; the reference calls the SAME JVM
  * format_number through PySpark (reference src/data_processor.py:486-512),
  * so these pins are the contract scaled candy data would hit.
  */
class FormattingSpec extends SparkTestBase {

  test("format_number inserts grouping commas at >= 1000 and half-up rounds") {
    import spark.implicits._
    val got = Seq(1234.56, 999.99, 1000.0, 1234567.891, 0.005)
      .toDF("x")
      .select(format_number(col("x"), 2).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("1,234.56", "999.99", "1,000.00", "1,234,567.89", "0.01"))
  }

  test("format_string %.2f never inserts commas (forecast CSV contract)") {
    import spark.implicits._
    val got = Seq(43921.316, 20046.544).toDF("x")
      .select(format_string("%.2f", col("x")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("43921.32", "20046.54"))
  }
}
