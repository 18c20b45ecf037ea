package graft.tera

import graft.SparkSpec

/** End-to-end generate → sort → validate, with goldens from an independent
  * Python big-int + zlib.crc32 implementation (FIXTURES.md §2/§6).
  */
class TeraSuiteSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("teragen produces the golden keys and checksum (1000 records)") {
    val recs = TeraGen.records(spark, 1000, 3).collect()
    assert(recs.length == 1000)
    assert(hex(recs.head._1) == "4a696d47726179524950")
    assert(hex(recs.last._1) == "4d15a82070c03ee39bf5")
    assert(recs.head._2.length == 90)
    // record number embedded as 32 hex digits at value offset 2..34
    assert(new String(recs(42)._2.slice(2, 34)) ==
      "0000000000000000000000000000002a")
    val sum = TeraValidate.checksum(TeraGen.records(spark, 1000, 3).rdd)
    assert(sum == "0000000000000000000001eea4a93bef")
  }

  test("generation is partition-count invariant") {
    val a = TeraGen.records(spark, 500, 1).collect().map(r => hex(r._1))
    val b = TeraGen.records(spark, 500, 7).collect().map(r => hex(r._1))
    assert(a.toSeq == b.toSeq)
  }

  test("RDD terasort: validate passes and checksum is preserved (20k)") {
    val sorted = TeraSort.generateAndSort(spark, 20000, 5)
    val res = TeraValidate.validate(sorted)
    assert(res.records == 20000)
    assert(res.partitionsSorted, "within-partition order")
    assert(res.boundariesOrdered, "global partition boundaries")
    assert(res.checksumHex == "0000000000000000000026f6274b25b3")
  }

  test("DataFrame terasort agrees with RDD path") {
    val df = TeraGen.dataframe(spark, 5000, 4)
    val sortedDf = TeraSort.sortDf(df, 4)
    import spark.implicits._
    val keys = sortedDf.select("key").as[Array[Byte]].collect()
    assert(keys.length == 5000)
    val sortedOk = keys.sliding(2).forall {
      case Array(a, b) => java.util.Arrays.compareUnsigned(a, b) <= 0
      case _ => true
    }
    assert(sortedOk, "DataFrame binary sort is unsigned lexicographic")
    val rddKeys = TeraSort.generateAndSort(spark, 5000, 4).map(_._1).collect()
    assert(keys.map(hex).toSeq == rddKeys.map(hex).toSeq)
  }

  test("prefix range partitioner is monotone and in-bounds") {
    val p = new TeraSort.PrefixRangePartitioner(13)
    val lo = Array.fill[Byte](10)(0)
    val hi = Array.fill[Byte](10)(-1)
    assert(p.getPartition(lo) == 0)
    assert(p.getPartition(hi) == 12)
    // random keys: partition index must be monotone in the key prefix
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(200)(Array.fill[Byte](10)(rnd.nextInt().toByte))
    val sorted = keys.sortWith((a, b) => java.util.Arrays.compareUnsigned(a, b) < 0)
    val parts = sorted.map(p.getPartition)
    assert(parts.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    assert(parts.forall(i => i >= 0 && i < 13))
  }

  test("pipeline reports the TPCx-HS-style metric: SF exact, HSph positive") {
    // sf0.001 → 10k records x 100 B = 1e6 bytes → SF = 1e6/1e10 = 0.0001
    val row = graft.queries.TeraQueries.teraPipeline(spark, "/nodir/sf0.001")
      .collect().head
    assert(row.getAs[Long]("records") == 10000)
    assert(row.getAs[Boolean]("partitions_sorted"))
    assert(row.getAs[Boolean]("boundaries_ordered"))
    assert(row.getAs[Double]("hs_sf") == 0.0001)
    // the reference run.sh (`for i in seq 1 2`) times TWO consecutive
    // gen+sort+validate runs; TPCx-HS designates the lower metric as
    // the performance run — the reported value must be that minimum
    val run1 = row.getAs[Double]("hsph_run1")
    val run2 = row.getAs[Double]("hsph_run2")
    assert(run1 > 0.0 && run2 > 0.0,
      "SF/total_hours over gen+sort+validate must be a positive rate")
    assert(row.getAs[Double]("hsph_at_sf") == math.min(run1, run2),
      "reported HSph@SF must come from the lower (performance) run")
  }

  test("Hadoop-API compat: newAPIHadoopFile[TeraInputFormat] reads, " +
      "saveAsNewAPIHadoopFile[TeraOutputFormat] writes") {
    val dir = java.nio.file.Files.createTempDirectory("tera").toString
    try {
      // the reference job's exact read surface over our written files
      TeraIO.write(TeraGen.records(spark, 1000, 2).rdd, s"$dir/in")
      val conf = new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration)
      // force splits that land mid-record (2,550 B) — the reader must
      // still claim every record exactly once
      conf.setLong("mapreduce.input.fileinputformat.split.maxsize", 2550L)
      val in = spark.sparkContext.newAPIHadoopFile(
        s"$dir/in", classOf[TeraInputFormat],
        classOf[Array[Byte]], classOf[Array[Byte]], conf)
      assert(in.getNumPartitions > 2, "split config must actually split")
      assert(in.count() == 1000)
      assert(TeraValidate.checksum(in) == "0000000000000000000001eea4a93bef")
      // the reference job's exact write surface, read back by our reader
      in.saveAsNewAPIHadoopFile(
        s"$dir/out", classOf[Array[Byte]], classOf[Array[Byte]],
        classOf[TeraOutputFormat])
      val back = TeraIO.read(spark, s"$dir/out")
      assert(back.count() == 1000)
      assert(TeraValidate.checksum(back) == "0000000000000000000001eea4a93bef")
    } finally TeraIO.delete(spark, dir)
  }

  test("raw 100-byte record files round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("tera").toString + "/out"
    try {
      TeraIO.write(TeraGen.records(spark, 1000, 2).rdd, dir)
      val back = TeraIO.read(spark, dir)
      assert(back.count() == 1000)
      assert(TeraValidate.checksum(back) == "0000000000000000000001eea4a93bef")
    } finally TeraIO.delete(spark, dir)
  }

  test("sorted output survives a file round-trip (partition order intact)") {
    val dir = java.nio.file.Files.createTempDirectory("tera").toString + "/sorted"
    try {
      // 12 part files: enough that an unsorted listing would permute them
      TeraIO.write(TeraSort.generateAndSort(spark, 6000, 12), dir)
      val res = TeraValidate.validate(TeraIO.read(spark, dir))
      assert(res.records == 6000)
      assert(res.partitionsSorted)
      assert(res.boundariesOrdered, "file listing must be path-sorted")
    } finally TeraIO.delete(spark, dir)
  }
}
