package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The r15 audit optimization contract: [[OpUtil.bagDiff]] must return
  * exactly `(a.count, a.exceptAll(b).count + b.exceptAll(a).count)` —
  * the numbers the maintained-index confluence audits used to compute
  * with four shuffled actions — on duplicates, empties, and nulls.
  */
class BagDiffSpec extends SparkSpec {
  import spark.implicits._

  private def reference(a: DataFrame, b: DataFrame): (Long, Long) =
    (a.count(), a.exceptAll(b).count() + b.exceptAll(a).count())

  private def check(a: DataFrame, b: DataFrame): Unit =
    assert(OpUtil.bagDiff(a, b) === reference(a, b))

  test("bagDiff equals exceptAll arithmetic on bags with duplicates") {
    val a = Seq((1L, "x"), (1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "y"), (2L, "y"), (4L, "w")).toDF("k", "v")
    // A\B = {(1,x),(3,z)}, B\A = {(2,y),(4,w)} → diff 4, |A| = 4
    assert(OpUtil.bagDiff(a, b) === (4L, 4L))
    check(a, b)
    check(b, a)
  }

  test("bagDiff on equal bags reports zero difference") {
    val a = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "v")
    check(a, a)
    assert(OpUtil.bagDiff(a, a)._2 === 0L)
  }

  test("bagDiff handles empty sides") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val e = a.limit(0)
    check(a, e)
    check(e, a)
    check(e, e)
    assert(OpUtil.bagDiff(e, e) === (0L, 0L))
  }

  test("bagDiff matches exceptAll's null-safe grouping") {
    val a = Seq((Some(1L), Option("x")), (None, None), (None, None),
      (Some(2L), None)).toDF("k", "v")
    val b = Seq((Some(1L), Option("x")), (None, None),
      (Some(2L), Option("y"))).toDF("k", "v")
    check(a, b)
    check(b, a)
  }
}
