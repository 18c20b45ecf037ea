package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (100 TB playbook, SURVEY.md §2.5
  * scale notes): a hot key that would pin one reducer is spread over
  * `salts` sub-partitions; the build side is replicated `salts` times.
  * AQE's skew-join handles moderate skew adaptively — explicit salting is
  * for the pathological hot-key case (one key >> one executor's memory)
  * where runtime splitting of a single map output isn't enough.
  *
  * The salt mixes a whole-row hash with the row's position
  * (`monotonically_increasing_id`), so even fully-duplicate probe rows —
  * the worst hot-key shape — spread across salts, while staying free of
  * `rand()`: ids are a pure function of (partition, row index), so
  * reruns and speculative tasks of the same partitioning agree. The salt
  * only routes rows; join OUTPUT is salt-independent either way.
  */
object SkewJoin {

  def saltedInnerJoin(
      probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedProbe = probe.withColumn(
      "__salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*),
        monotonically_increasing_id()), lit(salts.toLong)))
    val replicatedBuild = build.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedProbe
      .join(replicatedBuild, Seq(key, "__salt"))
      .drop("__salt")
  }
}
