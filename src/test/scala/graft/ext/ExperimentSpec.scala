package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkTestBase {
  import spark.implicits._

  test("cuped: perfect covariate removes all arm imbalance") {
    // y = 2x exactly; arm A holds the low-x units, B the high-x units.
    // theta = 2, rho^2 = 1, and both adjusted means land on the SAME value
    // (the covariate explains the entire between-arm difference):
    // A: ybar=3, xbar=1.5 -> 3 - 2*(1.5-2.5) = 5 ; B: 7 - 2*(3.5-2.5) = 5.
    val df = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0), ("B", 3.0, 6.0), ("B", 4.0, 8.0))
      .toDF("arm", "x", "y")
    val r = Experiment.cuped(df, "arm", "x", "y").orderBy(col("arm")).collect()
    assert(r.length == 2)
    val a = r(0); val b = r(1)
    assert(a.getString(0) == "A" && a.getLong(1) == 2L)
    assert(math.abs(a.getDouble(2) - 3.0) < 1e-9) // raw mean A
    assert(math.abs(b.getDouble(2) - 7.0) < 1e-9) // raw mean B
    assert(math.abs(a.getDouble(3) - 5.0) < 1e-9) // adjusted A
    assert(math.abs(b.getDouble(3) - 5.0) < 1e-9) // adjusted B
    assert(math.abs(a.getDouble(4) - 2.0) < 1e-9) // theta
    assert(math.abs(a.getDouble(5) - 1.0) < 1e-9) // var reduction = rho^2
  }

  test("cuped: uncorrelated covariate leaves means untouched, rho^2 ~ 0") {
    // x symmetric within each y level -> cov(x,y) = 0 -> theta = 0
    val df = Seq(("A", 1.0, 10.0), ("A", 3.0, 10.0),
      ("B", 1.0, 20.0), ("B", 3.0, 20.0)).toDF("arm", "x", "y")
    val r = Experiment.cuped(df, "arm", "x", "y").orderBy(col("arm")).collect()
    assert(math.abs(r(0).getDouble(4)) < 1e-9) // theta = 0
    assert(math.abs(r(0).getDouble(3) - r(0).getDouble(2)) < 1e-9)
    assert(math.abs(r(1).getDouble(3) - r(1).getDouble(2)) < 1e-9)
    assert(math.abs(r(0).getDouble(5)) < 1e-9)
  }

  test("cuped: zero covariate variance yields null theta, not a crash") {
    val df = Seq(("A", 1.0, 2.0), ("B", 1.0, 5.0)).toDF("arm", "x", "y")
    val r = Experiment.cuped(df, "arm", "x", "y").collect()
    assert(r.forall(_.isNullAt(4)))
    assert(r.forall(_.isNullAt(3))) // adjusted mean undefined without theta
  }

  test("srm: balanced arms give chi2 = 0, imbalance is flagged") {
    val ok = (1 to 50).map(i => (if (i % 2 == 0) "A" else "B")).toDF("arm")
    val rOk = Experiment.srm(ok, "arm").collect()
    assert(rOk.forall(_.getDouble(3) == 0.0))
    assert(rOk.forall(_.getLong(4) == 1L))
    // 90/10 on n=100: chi2 = (40^2/50)*2 = 64 — far past any alpha
    val bad = ((1 to 90).map(_ => "A") ++ (1 to 10).map(_ => "B")).toDF("arm")
    val rBad = Experiment.srm(bad, "arm").collect()
    assert(rBad.forall(r => math.abs(r.getDouble(3) - 64.0) < 1e-9))
    assert(rBad.forall(r => r.getDouble(2) == 50.0))
  }

  test("srm: generalizes to k arms with dof = k-1") {
    val df = ((1 to 30).map(_ => "A") ++ (1 to 30).map(_ => "B") ++
      (1 to 30).map(_ => "C")).toDF("arm")
    val r = Experiment.srm(df, "arm").collect()
    assert(r.length == 3)
    assert(r.forall(_.getLong(4) == 2L))
    assert(r.forall(_.getDouble(3) == 0.0))
  }

  test("cuped: plan is two aggregates, no window, no raw-row second pass") {
    val df = Seq(("A", 1.0, 2.0), ("B", 3.0, 4.0)).toDF("arm", "x", "y")
    val plan = Experiment.cuped(df, "arm", "x", "y")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("Aggregate"))
  }
}
