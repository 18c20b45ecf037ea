package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

/** Morton interleave + layout locality (round 4). */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zorderIndex interleaves known vectors correctly") {
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (255L, 0L, 21845L), (0L, 255L, 43690L), (255L, 255L, 65535L),
      (0xF0L, 0x0FL, 0x55AAL)) // x fills even bits (0x5500), y odd (0x00AA)
    val out = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .select(col("x"), col("y"),
        PipelineOps.zorderIndex(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    cases.foreach { case (x, y, z) =>
      assert(out((x, y)) == z, s"z($x,$y) = ${out((x, y))}, want $z")
    }
  }

  test("z-buckets are 16x16 tiles: both dimensions stay local") {
    val rows = PipelineOps.zorderLayout(spark, sfDir)
      .select("z_bucket", "x_min", "x_max", "y_min", "y_max")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, xmn, xmx, ymn, ymx) =>
      assert(xmx - xmn <= 15, s"bucket $b x-span ${xmx - xmn}")
      assert(ymx - ymn <= 15, s"bucket $b y-span ${ymx - ymn}")
    }
  }

  test("unpivot preserves totals per measure") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val direct = li.agg(
      org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum(col("l_quantity")), 2))
      .as[Double].head()
    val melted = graft.queries.Relational.q33Unpivot(spark, sfDir)
      .filter(col("measure") === lit("l_quantity"))
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum(col("sum_value")), 2))
      .as[Double].head()
    assert(math.abs(direct - melted) < 0.05, s"$direct vs $melted")
    // every (flag, measure) cell exists: 4 measures x all flags
    val n = graft.queries.Relational.q33Unpivot(spark, sfDir).count()
    val flags = li.select("l_returnflag").distinct().count()
    assert(n == flags * 4)
  }
}
