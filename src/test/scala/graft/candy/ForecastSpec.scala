package graft.candy

import org.scalatest.funsuite.AnyFunSuite

/** Determinism and correctness of the OLS trend forecaster. */
class ForecastSpec extends AnyFunSuite {

  test("exactly recovers a linear series") {
    val m = new LinearTrendForecaster
    m.fit(Array(10.0, 12.0, 14.0, 16.0))
    val pred = m.predict(2)
    assert(math.abs(pred(0) - 18.0) < 1e-9 && math.abs(pred(1) - 20.0) < 1e-9)
    assert(m.metrics("mae") < 1e-9 && m.metrics("mse") < 1e-9)
  }

  test("constant series predicts the constant") {
    val m = new LinearTrendForecaster
    m.fit(Array(5.0, 5.0, 5.0))
    assert(math.abs(m.predict(1)(0) - 5.0) < 1e-9)
  }

  test("single point predicts itself") {
    val m = new LinearTrendForecaster
    m.fit(Array(7.5))
    assert(m.predict(3).forall(p => math.abs(p - 7.5) < 1e-9))
  }

  test("deterministic across runs") {
    val series = Array(3.0, 9.0, 4.0, 8.0, 6.0)
    val a = { val m = new LinearTrendForecaster; m.fit(series); m.predict(3).toSeq }
    val b = { val m = new LinearTrendForecaster; m.fit(series); m.predict(3).toSeq }
    assert(a == b)
  }
}
