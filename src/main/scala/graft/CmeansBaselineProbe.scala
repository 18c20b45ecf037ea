package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Direct head-to-head with the reference paper's C-means benchmark
  * (Table 3, see BASELINE.md / SURVEY §6): N = 200k / 400k / 800k
  * points, D = 100, M = 10 clusters — the exact shapes the paper times
  * on 4 GPU+CPU nodes. We synthesize well-separated seeded clusters
  * (deterministic: rand(seed) offsets around M fixed centers), run the
  * engine's cmeans path (MLlib KMeans, the same code behind
  * `cmeans_clusters`), and report wall seconds total and per Lloyd
  * iteration — the paper does not publish its iteration count, so the
  * per-iteration figure is the comparable unit; the total at
  * maxIter=10 is the conservative one.
  *
  * Env: SPARK_GRAFT_CPUS (default 32), CMEANS_NS (default
  * "200000,400000,800000"), CMEANS_ITERS (default 10).
  */
object CmeansBaselineProbe {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cmeans-baseline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ns = sys.env.getOrElse("CMEANS_NS", "200000,400000,800000")
      .split(",").map(_.trim.toInt).toSeq
    val iters = sys.env.getOrElse("CMEANS_ITERS", "10").toInt
    val (d, m) = (100, 10)

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    ns.foreach { n =>
      // point i belongs to center (i % m); centers sit at 10*c on every
      // coordinate, points jitter ±1 via a hash (deterministic — rand()
      // would re-draw per re-evaluation)
      val pts = spark.range(n.toLong)
        .select(col("id"),
          array_to_vector(expr(
            s"transform(sequence(1, $d), j -> " +
              s"cast(10 * (id % $m) as double) + " +
              s"(pmod(xxhash64(id, j), 2000) - 1000) / 1000.0)"))
            .as("features"))
        .cache()
      pts.count() // materialize input OUTSIDE the timed region
      val t0 = System.nanoTime()
      // tol=0 forces ALL `iters` Lloyd iterations — the synthetic
      // clusters are well separated, so default tolerance would converge
      // in 2-3 rounds and overstate per-iteration speed
      val model = new KMeans().setK(m).setSeed(42L).setMaxIter(iters)
        .setTol(0.0).setFeaturesCol("features").fit(pts)
      val assigned = model.transform(pts)
        .groupBy("prediction").count().count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"cmeans n=$n%7d d=$d m=$m iters=$iters " +
        f"total=$dt%6.2f s per_iter=${dt / iters}%5.2f s " +
        f"(clusters=$assigned)")
      pts.unpersist(blocking = false)
    }
    spark.stop()
  }
}
