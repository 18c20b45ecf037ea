package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Dedup

/** Scale probe for the dedup pipeline (the non-sort half of the 100 TB
  * story): synthesizes a corpus with planted exact and near duplicates,
  * runs exact dedup and the MinHash+LSH near-dup path end-to-end, and
  * checks that exactly the planted pairs are found. Env knobs:
  *  - SCALE_DOCS: number of documents (default 1,000,000 ≈ 0.4 GB text)
  *  - SCALE_P: partitions (default 64)
  *
  * Planting scheme (deterministic): doc ids ending in 50 are exact
  * copies of id-1; ids ending in 99 are near copies of id-1 (1 of ~60
  * tokens changed → Jaccard ≈ 0.90). Everything else is seeded word-salad
  * over a 1000-word vocabulary, which at 60 tokens/doc makes accidental
  * J >= 0.8 pairs vanishingly unlikely — so found == planted is exact.
  */
object DedupScaleProbe {

  private val Vocab: Array[String] = {
    val rnd = new java.util.SplittableRandom(0xD0C5L)
    Array.fill(1000)(
      (0 until 7).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
  }

  def docText(id: Long, tokens: Int = 60): String = {
    // near/exact copies derive from the previous id's base text
    val base = id % 100 match {
      case 50 => id - 1
      case 99 => id - 1
      case _ => id
    }
    // NOT golden-gamma: seeding consecutive ids with multiples of
    // SplittableRandom's own internal gamma makes doc i+1's draw stream a
    // shift-by-one of doc i's (seed_i + k*gamma == seed_{i+1} + (k-1)*gamma),
    // which silently turns the whole corpus into one near-dup chain
    val rnd = new java.util.SplittableRandom(base * 0xC2B2AE3D27D4EB4FL + 1L)
    val toks = Array.fill(tokens)(Vocab(rnd.nextInt(Vocab.length)))
    if (id % 100 == 99) { // near-dup: perturb ONE token.
      // One interior token changes 3 of ~58+3 shingles → J = 55/61 ≈ 0.90;
      // 16x4-band LSH miss probability ≈ (1 - 0.9^4)^16 ≈ 6e-13, so
      // found == planted holds deterministically in practice. (Two
      // changed tokens → J ≈ 0.81 → ~1e-4 per-pair misses, which made
      // the exact-count check flaky at 10k planted pairs.)
      toks(tokens / 2) = "changedone"
    }
    toks.mkString(" ")
  }

  def corpus(s: SparkSession, n: Long, parts: Int): DataFrame = {
    import s.implicits._
    s.range(0L, n, 1L, parts).map(id => (id, docText(id))).toDF("doc_id", "text")
  }

  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      // the synthetic corpus derives from spark.range → static size
      // estimates are bytes-of-longs, wildly under the generated text, and
      // the planner would broadcast a multi-GB shingle table. Disable
      // STATIC broadcast; AQE still broadcasts from true runtime sizes —
      // the right stance for any stats-less input at scale.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val n = sys.env.getOrElse("SCALE_DOCS", "1000000").toLong
    val p = sys.env.getOrElse("SCALE_P", "64").toInt

    val docs = corpus(s, n, p)
    val bytes = docs.rdd.map(_.getString(1).length.toLong).sum()
    println(f"docs=$n chars=${bytes / 1e9}%.2f GB")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-14s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val nExact = timed("exact") {
      Dedup.exactDocs(corpus(s, n, p)).count()
    }
    val planted = n / 100 // one exact-dup pair per 100 docs
    println(s"exact groups=$nExact (expect ${n - planted})")

    val pairs = timed("minhash+lsh") {
      Dedup.minhashLshDocs(corpus(s, n, p)).count()
    }
    println(s"near-dup pairs=$pairs (expect ${2 * planted}: " +
      s"$planted exact + $planted near planted)")
    s.stop()
  }
}
