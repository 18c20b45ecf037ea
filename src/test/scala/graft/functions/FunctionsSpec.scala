package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.ElfHash
import graft.ops.SkewJoin
import graft.tera.{ChecksumAggregator, TeraGen, TeraValidate}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot expression matches scala dot product and is codegen-safe") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val out = df.select(VectorOps.vec_dot(col("a"), col("b"))).as[Double].collect()
    assert(out.toSeq == Seq(32.0, 0.0))
    // null propagation
    val withNull = df.select(VectorOps.vec_dot(lit(null).cast("array<double>"), col("b")))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("elf_hash expression agrees with the scala implementation") {
    val keys = Seq("", "A", "AB", "hello world", "panda-mapreduce")
    val df = keys.toDF("s").select(GraftFunctions.elf_hash(col("s")).as("h"))
    val got = df.as[Long].collect().toSeq
    assert(got == keys.map(ElfHash(_)))
  }

  test("session-extension-injected SQL functions resolve without register()") {
    // SparkSpec builds the shared session .withExtensions(GraftExtensions)
    val row = spark.sql(
      "SELECT elf_hash(cast('AB' as binary)) AS h, " +
        "vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_sqdist(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS s, " +
        "no_pushdown(7) AS p")
      .first()
    assert(row.getLong(0) == 0x452L)
    assert(row.getDouble(1) == 11.0)
    assert(row.getDouble(2) == 8.0)
    assert(row.getInt(3) == 7)
  }

  test("registered SQL functions work end-to-end") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT elf_hash(cast('AB' as binary)) AS h, " +
        "vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .first()
    assert(row.getLong(0) == 0x452L)
    assert(row.getDouble(1) == 11.0)
  }

  test("checksum aggregator equals the mapPartitions checksum") {
    val recs = TeraGen.records(spark, 2000, 4)
    val viaAgg = recs.map(_._1)
      .select[String](new ChecksumAggregator().toColumn)
      .first()
    val viaPartitions = TeraValidate.checksum(recs.rdd)
    assert(viaAgg == viaPartitions)
  }

  test("salted join equals the plain join and spreads the hot key") {
    val probe = (1 to 10000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val build = Seq((1L, "hot"), (2L, "cold"), (5L, "mild")).toDF("k", "name")
    val plain = probe.join(build, "k").select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(probe, build, "k", 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 1001) // multiples of 10, plus i=1 itself
  }
}
