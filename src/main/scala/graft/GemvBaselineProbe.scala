package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GEMV at the reference paper's per-node weak-scaling shape (Fig. 6:
  * M = 35,000 rows x N = 10,000 cols per node — 2.8 GB of doubles): the
  * engine's row-distributed y = A·x with a broadcast x and the codegen'd
  * `vec_dot` kernel (the same plan as the `gemv` query). The paper
  * reports weak scaling as "~flat Gflops/node" without an absolute
  * table, so the single-node Gflops printed here IS the comparable
  * unit. 2 * M * N flops per multiply; input materialized outside the
  * timed region; median of `GEMV_REPS` (default 3) multiplies.
  *
  * Env: SPARK_GRAFT_CPUS (default 32), GEMV_M, GEMV_N, GEMV_REPS.
  */
object GemvBaselineProbe {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-gemv-baseline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = sys.env.getOrElse("GEMV_M", "35000").toInt
    val n = sys.env.getOrElse("GEMV_N", "10000").toInt
    val reps = sys.env.getOrElse("GEMV_REPS", "3").toInt

    import graft.functions.VectorOps.vec_dot

    // deterministic dense A (hash-derived doubles in [-1, 1)) — same
    // id-seeded determinism stance as teragen
    val rows = spark.range(m.toLong)
      .select(col("id"), expr(
        s"transform(sequence(1, $n), j -> " +
          "cast(pmod(xxhash64(id, j), 2000000) - 1000000 as double) / 1000000.0)")
        .as("row"))
      .repartition(cpus.toInt)
      .cache()
    rows.count() // materialize A outside the timed region
    val x = spark.range(1).select(expr(
      s"transform(sequence(1, $n), j -> " +
        "cast(pmod(xxhash64(j), 2000000) - 1000000 as double) / 1000000.0)").as("x"))

    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      rows.crossJoin(broadcast(x))
        .select(vec_dot(col("row"), col("x")).as("y"))
        .agg(sum(col("y"))).head // fold to one row: forces every dot
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = times(reps / 2)
    val gflops = 2.0 * m * n / med / 1e9
    println(f"gemv m=$m n=$n reps=$reps median=$med%6.3f s " +
      f"gflops=$gflops%7.2f (runs=${times.map(t => f"$t%.3f").mkString(",")})")

    // kernel floor: the same multiply over RDD-cached PRIMITIVE arrays —
    // no columnar cache decode in the loop, so this isolates the dot
    // kernel + JVM memory bandwidth (the shape §7.1 reserves RDDs for)
    import spark.implicits._
    val rddRows = rows.as[(Long, Array[Double])].rdd.map(_._2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    rddRows.count()
    val xArr = spark.sparkContext.broadcast(
      x.as[Array[Double]].head())
    val rddTimes = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      rddRows.map { row =>
        val xv = xArr.value
        var acc = 0.0
        var i = 0
        while (i < row.length) { acc += row(i) * xv(i); i += 1 }
        acc
      }.sum()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val rmed = rddTimes(reps / 2)
    println(f"gemv_rdd m=$m n=$n median=$rmed%6.3f s " +
      f"gflops=${2.0 * m * n / rmed / 1e9}%7.2f " +
      f"(runs=${rddTimes.map(t => f"$t%.3f").mkString(",")})")
    spark.stop()
  }
}
