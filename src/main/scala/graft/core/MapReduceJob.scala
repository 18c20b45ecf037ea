package graft.core

import scala.reflect.ClassTag

import org.apache.spark.{HashPartitioner, Partitioner}
import org.apache.spark.rdd.RDD

/** The reference's MapReduce contract (`include/PandaAPI.h:29-51` — user
  * supplies map / combine / reduce / compare / partitioner) rebuilt as a
  * typed builder over Spark RDD transformations.
  *
  * What the reference implements as ~6k lines of emit buffers, pthread
  * fan-out, O(n^2) grouping and MPI bucket exchange
  * (`src/PandaLib.cu`, `src/PandaSort.cu`, `src/panda/PandaMPIMessage.cpp`)
  * collapses here into one `flatMap` + one shuffle:
  *
  *  - `withCombiner` → map-side combine (`reduceByKey`): partial
  *    aggregation before the shuffle, which is what makes the pattern work
  *    at 100 TB — bytes on the wire scale with distinct keys, not records.
  *  - `withOrdering` → sort-based shuffle
  *    (`repartitionAndSortWithinPartitions`): reducers see keys in order,
  *    the reference's (unimplemented) "sort" semantics.
  *  - neither → hash shuffle + `groupByKey`.
  *
  * Output is whatever the reducer emits (0..n records per key), mirroring
  * `PandaEmitReduceOutput`.
  */
final class MapReduceJob[I, K: ClassTag, V: ClassTag] private (
    input: RDD[I],
    mapFn: I => IterableOnce[(K, V)],
    combineFn: Option[(V, V) => V],
    partitioner: Option[Partitioner],
    ordering: Option[Ordering[K]],
    grouping: Option[(K, K) => Boolean] = None) extends Serializable {

  def withCombiner(fn: (V, V) => V): MapReduceJob[I, K, V] =
    new MapReduceJob(input, mapFn, Some(fn), partitioner, ordering, grouping)

  def withPartitioner(p: Partitioner): MapReduceJob[I, K, V] =
    new MapReduceJob(input, mapFn, combineFn, Some(p), ordering, grouping)

  def withOrdering(ord: Ordering[K]): MapReduceJob[I, K, V] =
    new MapReduceJob(input, mapFn, combineFn, partitioner, Some(ord), grouping)

  /** Hadoop's GROUPING COMPARATOR — the secondary-sort contract: sort by
    * the full key, but cut reducer runs by a coarser equivalence (e.g.
    * key = (user, timestamp), group by user → each reducer call sees one
    * user's values in timestamp order). Only meaningful together with
    * [[withOrdering]]; the partitioner must agree with the grouping
    * (same group → same partition).
    */
  def withGrouping(equiv: (K, K) => Boolean): MapReduceJob[I, K, V] =
    new MapReduceJob(input, mapFn, combineFn, partitioner, ordering, Some(equiv))

  private def defaultPartitioner: Partitioner =
    partitioner.getOrElse(new HashPartitioner(input.sparkContext.defaultParallelism))

  /** Map + shuffle only — grouped values per key (no reduce). */
  def grouped(): RDD[(K, Iterable[V])] = {
    val mapped = input.flatMap(mapFn)
    combineFn match {
      case Some(c) => mapped.reduceByKey(defaultPartitioner, c).mapValues(Seq(_))
      case None => mapped.groupByKey(defaultPartitioner)
    }
  }

  /** Full pipeline: map → (combine) → partition → (sort) → reduce. */
  def reduce[O: ClassTag](reduceFn: (K, Iterator[V]) => IterableOnce[O]): RDD[O] = {
    val mapped = input.flatMap(mapFn)
    val part = defaultPartitioner
    (combineFn, ordering) match {
      case (Some(c), None) =>
        mapped.reduceByKey(part, c)
          .flatMap { case (k, v) => reduceFn(k, Iterator.single(v)) }
      case (Some(c), Some(ord)) =>
        // Hadoop's combiner+sort contract in ONE shuffle: map-side
        // combine, reduce-side combiner merge, then the shuffle reader's
        // ExternalSorter orders the keys — spilling to disk past memory,
        // so a partition never has to fit on the heap (the reference
        // buffers whole partitions in `keyvals_t`; Spark's sort shuffle
        // is the scale-safe version of the same plan).
        val combined = new org.apache.spark.rdd.ShuffledRDD[K, V, V](mapped, part)
          .setKeyOrdering(ord)
          .setAggregator(new org.apache.spark.Aggregator[K, V, V](
            (v: V) => v, c, c))
          .setMapSideCombine(true)
        combined.flatMap { case (k, v) => reduceFn(k, Iterator.single(v)) }
      case (None, Some(ord)) =>
        implicit val o: Ordering[K] = ord
        val sameRun = grouping.getOrElse(ord.equiv _)
        mapped.repartitionAndSortWithinPartitions(part)
          .mapPartitions(MapReduceJob.runsOf(_, sameRun).flatMap {
            case (k, vs) => reduceFn(k, vs.iterator).iterator
          })
      case (None, None) =>
        mapped.groupByKey(part)
          .flatMap { case (k, vs) => reduceFn(k, vs.iterator) }
    }
  }

  /** Classic MR reduce emitting exactly one (K, V) per key. */
  def reduceByKeyToRdd(merge: (V, V) => V): RDD[(K, V)] =
    input.flatMap(mapFn).reduceByKey(defaultPartitioner, merge)
}

object MapReduceJob {

  /** Start a job from any RDD with a map function (0..n emits per record,
    * like `panda_cpu_map` / `PandaEmitCPUMapOutput`).
    */
  def apply[I, K: ClassTag, V: ClassTag](
      input: RDD[I])(mapFn: I => IterableOnce[(K, V)]): MapReduceJob[I, K, V] =
    new MapReduceJob(input, mapFn, None, None, None)

  /** Group a sorted iterator into adjacent (key, values) runs, buffering
    * only one key's values at a time (values per key are assumed to fit a
    * task — same contract as the reference's `keyvals_t`).
    */
  private[core] def runsOf[K, V](
      it: Iterator[(K, V)], sameKey: (K, K) => Boolean): Iterator[(K, Seq[V])] =
    new Iterator[(K, Seq[V])] {
      private val in = it.buffered
      def hasNext: Boolean = in.hasNext
      def next(): (K, Seq[V]) = {
        val key = in.head._1
        val vals = scala.collection.mutable.ArrayBuffer.empty[V]
        while (in.hasNext && sameKey(in.head._1, key))
          vals += in.next()._2
        (key, vals.toSeq)
      }
    }
}
