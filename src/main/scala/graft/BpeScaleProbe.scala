package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Vocabulary-scale probe for the BPE APPLY pass: `text_bpe_encode`'s
  * gated table is 4 trained merges, but a production tokenizer ships
  * 1k–50k — this probe measures encode wall time as the merge table
  * grows to realistic size and as the corpus grows 10×, to back (or
  * refute) the scaladoc claim that apply cost is |vocab| × |merges|,
  * never corpus × |merges|.
  *
  * Merge tables are SYNTHESIZED deterministically (top-K adjacent
  * character bigrams of the corpus vocabulary by frequency, priority =
  * frequency order) — training 1k real rounds would take 1k corpus
  * passes and measure training, not apply. Synthetic merges exercise
  * the identical apply path: real strings, real hits.
  *
  * Arms: fold = chained codegen `replace` columns (the ≤64-merge gate
  * arm); scala = broadcast merge array + one mapPartitions over the
  * DISTINCT-word vocab (the production-size arm). Expected shape: fold
  * degrades superlinearly past ~100 merges (expression-tree/codegen
  * cost), scala stays linear in |merges| with a corpus-size-insensitive
  * slope.
  *
  * Env knobs: BPE_DIRS (default "/root/testdata/sf0.01,/root/testdata/
  * sf0.1"), BPE_SIZES (default "4,64,256,1024"), BPE_ARMS
  * ("fold,scala").
  */
object BpeScaleProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-bpe-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = sys.env.getOrElse("BPE_DIRS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1").split(",").toSeq
    val sizes = sys.env.getOrElse("BPE_SIZES", "4,64,256,1024")
      .split(",").map(_.toInt).toSeq
    val arms = sys.env.getOrElse("BPE_ARMS", "fold,scala").split(",").toSet

    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      // deterministic synthetic merge table: top-K character bigrams of
      // the vocabulary by frequency (count desc, bigram asc tiebreak)
      val maxK = sizes.max
      val bigrams = docs
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 1).distinct()
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), " +
            "i -> struct(substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r))"))
          .as("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("b").cast("string"))
        .limit(maxK)
        .collect()
        .map(r => {
          val b = r.getStruct(0); (b.getString(0), b.getString(1))
        }).toSeq
      val vocabSize = docs
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0).select("w").distinct().count()
      println(s"# dir=$dir vocab=$vocabSize bigrams=${bigrams.size}")

      sizes.foreach { k =>
        // the synthetic corpus has only ~82 real bigrams — pad the table
        // to the requested size with guaranteed-miss pairs (control-char
        // symbols no word contains): a miss pass costs the same
        // per-merge scan as a hit pass, so the padded table measures the
        // true per-merge loop cost at production table sizes
        val merges = bigrams.take(k) ++
          (bigrams.size until k).map(i => (s"$i", ""))
        def run(forceArm: String): Double = {
          val t0 = System.nanoTime()
          // route by threshold: pass the table through unchanged for the
          // fold arm (k <= BpeFoldMaxMerges means fold), or force the
          // scala arm by exceeding the threshold check via env of size
          val df =
            if (forceArm == "fold" && k <= TextAnalysis.BpeFoldMaxMerges)
              TextAnalysis.bpeEncodeWith(docs, merges)
            else if (forceArm == "fold") foldArm(docs, merges)
            else scalaArm(
              docs.select(explode(split(col("text"), " ", -1)).as("w"))
                .filter(length(col("w")) > 0).distinct(),
              merges)
          df.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sharedState.cacheManager.clearCache()
          dt
        }
        arms.toSeq.sorted.foreach { arm =>
          // the fold arm fails STRUCTURALLY at production table sizes:
          // ~1024 chained withColumns build a plan whose recursive
          // clone/transform overflows the JVM stack (StackOverflowError
          // in LogicalPlan.clone) before codegen even starts — the probe
          // records that as the measurement it is
          try {
            val t = run(arm)
            println(f"""{"probe":"bpe_apply","dir":"$dir","merges":$k,"arm":"$arm","sec":$t%.2f}""")
          } catch { case e: Throwable =>
            println(s"""{"probe":"bpe_apply","dir":"$dir","merges":$k,""" +
              s""""arm":"$arm","sec":-1,"failed":"${e.getClass.getSimpleName}"}""")
          }
        }
      }
    }

    // the |vocab| axis at realistic scale: a corpus at 100 TB carries a
    // multi-million-word vocabulary; encode cost must be |vocab| ×
    // |merges| with a tractable constant. Synthetic distinct words
    // (32-hex md5 strings — real bigram hits from the 256-pair hex
    // alphabet) decouple vocabulary size from the fixture corpus.
    val vocabSizes = sys.env.getOrElse("BPE_VOCABS", "10000,100000")
      .split(",").map(_.toInt).toSeq
    val hexMerges: Seq[(String, String)] = {
      val hex = "0123456789abcdef"
      (for (a <- hex; b <- hex) yield (a.toString, b.toString)) ++
        (256 until sizes.max).map(i => (s"$i", ""))
    }
    vocabSizes.foreach { n =>
      val words = spark.range(n.toLong)
        .select(md5(concat(lit("w|"), col("id"))).as("w"))
      sizes.filter(_ >= 256).foreach { k =>
        val t0 = System.nanoTime()
        scalaArm(words, hexMerges.take(k))
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"bpe_apply_vocab","vocab":$n,"merges":$k,"arm":"scala","sec":$dt%.2f}""")
      }
    }
    spark.stop()
  }

  // explicit arms (bypassing the size threshold) so the probe can
  // measure BOTH at every size
  private def foldArm(docs: org.apache.spark.sql.DataFrame,
      merges: Seq[(String, String)]) = {
    val k = merges.size
    // temporarily raise nothing: rebuild the fold inline
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
    val vocab0 = words.select("w").distinct()
      .select(col("w"), concat(rtrim(concat(lit(" "),
        regexp_replace(col("w"), "(.)", "$1  "))), lit(" ")).as("seq"))
    val encoded = merges.foldLeft(vocab0) { case (df, (l, r)) =>
      df.withColumn("seq",
        replace(col("seq"), lit(s" $l  $r "), lit(s" $l$r ")))
    }
    encoded.select(col("w"), size(split(trim(col("seq")), "  ")).as("n_sym"))
      .agg(sum(col("n_sym")).as("total_syms"), count(lit(1)).as("n_words"))
  }

  // vocab: a frame with one distinct word per row in column "w"
  private def scalaArm(vocab: org.apache.spark.sql.DataFrame,
      merges: Seq[(String, String)]) = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    vocab.select(col("w")).as[String]
      .mapPartitions { it =>
        val m = bc.value
        it.map(w => TextAnalysis.bpeApplyAll(w, m).length.toLong)
      }
      .toDF("n_sym")
      .agg(sum(col("n_sym")).as("total_syms"), count(lit(1)).as("n_words"))
  }
}
