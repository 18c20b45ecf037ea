package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.apps.WordCount
import graft.ops.TextAnalysis

/** Text-shaped queries over the documents table. */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount" -> (WordCount.documentsWordCount _),
    "wordcount_mr" -> (WordCount.documentsWordCountMR _),
    // postings stay an array inside the operator; the gate-facing
    // projection serializes them (comma-joined) because the gate's
    // pandas row-sort cannot canonicalize raw array cells
    "text_inverted_index" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.{array_join, col}
      TextAnalysis.invertedIndex(graft.Tables.documents(s, d), minDf = 5L)
        .withColumn("postings",
          array_join(col("postings").cast("array<string>"), ","))
    }),
    "text_tfidf" -> ((s: SparkSession, d: String) =>
      TextAnalysis.tfIdf(graft.Tables.documents(s, d), topK = 5)),
    "text_collocations" -> ((s: SparkSession, d: String) =>
      TextAnalysis.collocations(graft.Tables.documents(s, d))),
    "text_unigram_lm" -> (TextAnalysis.unigramLmQuery _),
    "text_bigram_lm" -> (TextAnalysis.bigramLmQuery _),
    "text_gopher_rules" -> (TextAnalysis.gopherRulesQuery _),
    "text_feature_hashing" -> (TextAnalysis.featureHashingQuery _),
    "text_ccnet_tiers" -> (TextAnalysis.ccnetTiersQuery _),
    "text_lm_gain" -> (TextAnalysis.lmGainFilterQuery _),
    "text_skipgrams" -> (TextAnalysis.skipgramsQuery _),
    "text_char_entropy" -> (TextAnalysis.charEntropyQuery _),
    // classifier evaluation: predicted vs labeled language, counted —
    // composes the oracle-checked classifier with the truth column
    "text_lang_confusion" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.{col, count, lit}
      val docs = graft.Tables.documents(s, d)
      TextAnalysis.langId(s, docs)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
    }),
    "text_normalize" -> (TextAnalysis.unicodeNormalizeQuery _),
    "text_bpe_pairs" -> (TextAnalysis.bpePairsQuery _),
    "text_bpe_merges" -> (TextAnalysis.bpeMergesQuery _),
    "text_bpe_encode" -> (TextAnalysis.bpeEncodeQuery _),
    "text_vocab_encode" -> ((s: SparkSession, d: String) =>
      TextAnalysis.vocabEncode(graft.Tables.documents(s, d))),
    // the reference's default partitioner (ELF hash of key bytes mod
    // buckets, `src/panda/Partitioner.cpp:7-18`) — bucket assignment
    // hash-checked against a bit-faithful DuckDB list_reduce oracle.
    // NOTE the oracle folds per-character code points, which equals the
    // UTF-8 bytes the Spark side hashes only for ASCII text — true of
    // this corpus; non-ASCII input would need encode() byte extraction
    "elf_buckets" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      import graft.functions.GraftFunctions.elf_hash
      graft.Tables.documents(s, d)
        .groupBy(pmod(elf_hash(col("text")), lit(32L)).as("bucket"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    })
  )

  private val wcOracle =
    """SELECT w AS word, count(*) AS cnt
      |FROM documents, unnest(string_split_regex(upper(text), '[^A-Z]+')) AS t(w)
      |WHERE length(w) >= 6
      |GROUP BY w""".stripMargin

  val oracles: Map[String, String] = Map(
    "wordcount" -> wcOracle,
    "wordcount_mr" -> wcOracle,
    // DuckDB recomputes the same synthetic decomposition (every 'a' →
    // 'a' + combining acute U+0301 = chr(769)), then its own
    // nfc_normalize / strip_accents stand in for the engine's
    // unicode_norm NFC / NFD+strip-marks — lengths agree codepoint for
    // codepoint
    "text_normalize" ->
      """WITH dec AS (
        |  SELECT lang,
        |         regexp_replace(substr(text, 1, 80), 'a',
        |                        'a' || chr(769), 'g') AS d
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |       sum(length(d))::BIGINT AS sum_decomposed_len,
        |       sum(length(nfc_normalize(d)))::BIGINT AS sum_nfc_len,
        |       sum(length(strip_accents(d)))::BIGINT AS sum_stripped_len
        |FROM dec GROUP BY lang""".stripMargin,
    "text_inverted_index" ->
      """WITH terms AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents)
        |SELECT term, count(*)::BIGINT AS df,
        |  array_to_string(list_sort(list(doc_id)), ',') AS postings
        |FROM terms WHERE length(term) > 0
        |GROUP BY term HAVING count(*) >= 5""".stripMargin,
    "text_vocab_encode" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(toks) AS w,
         |    generate_subscripts(toks, 1) AS pos
         |  FROM t),
         |cnt AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
         |vocab AS (
         |  SELECT w, row_number() OVER (ORDER BY c DESC, w) AS tok_id
         |  FROM cnt ORDER BY c DESC, w LIMIT ${TextAnalysis.VocabSize}),
         |enc AS (
         |  SELECT doc_id, pos, coalesce(tok_id, 0) AS tid
         |  FROM tok LEFT JOIN vocab USING (w))
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |  sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
         |  array_to_string(list(tid ORDER BY pos), ',') AS encoded
         |FROM enc GROUP BY doc_id""".stripMargin,
    // PMI expression mirrors the Spark division order exactly:
    // (c12/nb) / ((c1/n) * (c2/n)), all double, round-6
    "text_collocations" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |w AS (SELECT unnest(toks) AS w FROM t),
         |uni AS (SELECT w, count(*)::BIGINT AS c FROM w GROUP BY w),
         |n AS (SELECT sum(c)::BIGINT AS n FROM uni),
         |bgl AS (
         |  SELECT unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
         |  FROM t),
         |bgc AS (
         |  SELECT string_split(bigram, ' ')[1] AS w1,
         |    string_split(bigram, ' ')[2] AS w2,
         |    count(*)::BIGINT AS c12
         |  FROM bgl GROUP BY 1, 2)
         |SELECT w1, w2, c12,
         |  round(ln((c12::DOUBLE / nb.nb) /
         |    ((u1.c::DOUBLE / n.n) * (u2.c::DOUBLE / n.n))), 6) AS pmi
         |FROM bgc
         |JOIN uni u1 ON u1.w = w1
         |JOIN uni u2 ON u2.w = w2
         |CROSS JOIN n
         |CROSS JOIN (SELECT sum(c12)::BIGINT AS nb FROM bgc) nb
         |WHERE c12 >= ${TextAnalysis.CollocationMinCount}""".stripMargin,
    // the four merge rounds unrolled as chained CTEs: pair-count →
    // best-by-(count desc, pair asc) → two-space-separated replace,
    // identical arithmetic and tiebreak to the Spark loop
    "text_bpe_merges" -> {
      def round(i: Int): String =
        s"""p$i AS (
           |  SELECT sym[j] AS l, sym[j + 1] AS r, sum(c)::BIGINT AS pair_count
           |  FROM (
           |    SELECT sym, c, unnest(range(1, len(sym))) AS j
           |    FROM (SELECT string_split(trim(seq), '  ') AS sym, c FROM s$i))
           |  GROUP BY 1, 2),
           |b$i AS (
           |  SELECT l, r, pair_count FROM p$i
           |  ORDER BY pair_count DESC, l, r LIMIT 1),
           |s${i + 1} AS (
           |  SELECT replace(seq, ' ' || b.l || '  ' || b.r || ' ',
           |    ' ' || b.l || b.r || ' ') AS seq, c
           |  FROM s$i CROSS JOIN b$i b)""".stripMargin
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |wc AS (
         |  SELECT w, count(*)::BIGINT AS c FROM toks
         |  WHERE length(w) > 0 GROUP BY w),
         |s0 AS (
         |  SELECT rtrim(' ' || regexp_replace(w, '(.)', '\\1  ', 'g')) || ' '
         |    AS seq, c
         |  FROM wc),
         |""".stripMargin +
        (0 until TextAnalysis.BpeMergeRounds).map(round).mkString(",\n") +
        "\n" +
        (0 until TextAnalysis.BpeMergeRounds).map(i =>
          s"""SELECT ${i + 1} AS merge_rank, l AS "left", r AS "right",
             |  pair_count
             |FROM b$i""".stripMargin).mkString("\nUNION ALL\n")
    },
    // the merge training chain verbatim (same b0..b3 winners), then the
    // APPLY chain v0..v4 re-running the replaces with the word kept, a
    // dense-rank token-id vocabulary over the final symbols, and the
    // per-doc rollup — identical arithmetic to the Spark encode
    "text_bpe_encode" -> {
      def round(i: Int): String =
        s"""p$i AS (
           |  SELECT sym[j] AS l, sym[j + 1] AS r, sum(c)::BIGINT AS pair_count
           |  FROM (
           |    SELECT sym, c, unnest(range(1, len(sym))) AS j
           |    FROM (SELECT string_split(trim(seq), '  ') AS sym, c FROM s$i))
           |  GROUP BY 1, 2),
           |b$i AS (
           |  SELECT l, r FROM p$i
           |  ORDER BY pair_count DESC, l, r LIMIT 1),
           |s${i + 1} AS (
           |  SELECT replace(seq, ' ' || b.l || '  ' || b.r || ' ',
           |    ' ' || b.l || b.r || ' ') AS seq, c
           |  FROM s$i CROSS JOIN b$i b)""".stripMargin
      def applyRound(i: Int): String =
        s"""v${i + 1} AS (
           |  SELECT w, replace(seq, ' ' || b.l || '  ' || b.r || ' ',
           |    ' ' || b.l || b.r || ' ') AS seq
           |  FROM v$i CROSS JOIN b$i b)""".stripMargin
      val k = TextAnalysis.BpeMergeRounds
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |wc AS (
         |  SELECT w, count(*)::BIGINT AS c FROM toks
         |  WHERE length(w) > 0 GROUP BY w),
         |s0 AS (
         |  SELECT rtrim(' ' || regexp_replace(w, '(.)', '\\1  ', 'g')) || ' '
         |    AS seq, c
         |  FROM wc),
         |""".stripMargin +
        (0 until k).map(round).mkString(",\n") + ",\n" +
        // s-interpolated so \\1 collapses to the \1 DuckDB expects (the
        // plain-""" form would ship a double backslash)
        s"""v0 AS (
           |  SELECT w, rtrim(' ' || regexp_replace(w, '(.)', '\\1  ', 'g'))
           |    || ' ' AS seq
           |  FROM wc),
           |""".stripMargin +
        (0 until k).map(applyRound).mkString(",\n") + ",\n" +
        s"""wsym AS (
           |  SELECT w, unnest(string_split(trim(seq), '  ')) AS sym FROM v$k),
           |vocab AS (
           |  SELECT sym, dense_rank() OVER (ORDER BY sym)::BIGINT AS token_id
           |  FROM (SELECT DISTINCT sym FROM wsym)),
           |wstat AS (
           |  SELECT w, count(*)::BIGINT AS n_sym,
           |    sum(token_id)::BIGINT AS sum_id
           |  FROM wsym JOIN vocab USING (sym) GROUP BY w),
           |dw AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
           |  FROM documents)
           |SELECT doc_id, count(*)::BIGINT AS n_ws_tokens,
           |  sum(n_sym)::BIGINT AS n_tokens,
           |  sum(sum_id)::BIGINT AS sum_token_id
           |FROM dw JOIN wstat USING (w)
           |GROUP BY doc_id""".stripMargin
    },
    "text_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS c FROM w GROUP BY w),
        |p AS (
        |  SELECT substr(w, CAST(i AS INT), 1) AS "left",
        |    substr(w, CAST(i + 1 AS INT), 1) AS "right", c
        |  FROM (SELECT w, c, unnest(range(1, length(w))) AS i FROM c))
        |SELECT "left", "right", sum(c)::BIGINT AS pair_count
        |FROM p GROUP BY 1, 2""".stripMargin,
    // same division order as the Spark expression ((c12+1)/(c1+v), both
    // double), avg + round-4 absorbs accumulation-order ulps (the proven
    // unigram_lm pattern); docs with <2 tokens have no bigrams both sides
    "text_bigram_lm" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT unnest(toks) AS w1 FROM t),
        |uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM tok GROUP BY w1),
        |v AS (SELECT count(*)::BIGINT AS v FROM uni),
        |bgd AS (
        |  SELECT doc_id,
        |    string_split(bigram, ' ')[1] AS w1,
        |    string_split(bigram, ' ')[2] AS w2
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        |    FROM t)),
        |bgc AS (
        |  SELECT w1, w2, count(*)::BIGINT AS c12 FROM bgd GROUP BY 1, 2)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  round(avg(ln((c12 + 1)::DOUBLE / (c1 + v))), 4) AS avg_logprob
        |FROM bgd
        |JOIN bgc USING (w1, w2)
        |JOIN uni USING (w1)
        |CROSS JOIN v
        |GROUP BY doc_id""".stripMargin,
    // pure integer-band predicates — no float ratio crosses the engine
    // boundary; list_filter/list_sum mirror the Spark higher-order funcs
    "text_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    (CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::BIGINT
        |      AS n_tokens,
        |    coalesce(list_sum(list_transform(
        |      regexp_split_to_array(trim(text), '\s+'),
        |      t -> length(t))), 0)::BIGINT AS sum_tok_len,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      t -> regexp_matches(t, '[A-Za-z]')))::BIGINT AS n_alpha,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      t -> t IN ('-', '*', '•')))::BIGINT AS n_bullet,
        |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
        |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT
        |      AS n_ellipsis,
        |    len(regexp_extract_all(text,
        |      '(?i)\b(the|be|to|of|and|that|have|with)\b'))::BIGINT AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  (n_tokens >= 50 AND n_tokens <= 100000)::INT AS r_wordcount,
        |  (n_tokens > 0 AND sum_tok_len >= n_tokens * 3
        |    AND sum_tok_len <= n_tokens * 10)::INT AS r_meanlen,
        |  (n_tokens > 0 AND (n_hash + n_ellipsis) * 10 <= n_tokens)::INT
        |    AS r_symbol,
        |  (n_tokens > 0 AND n_bullet * 5 <= n_tokens)::INT AS r_bullet,
        |  (n_tokens > 0 AND n_alpha * 10 >= n_tokens * 8)::INT AS r_alpha,
        |  (n_stop >= 2)::INT AS r_stop,
        |  ((n_tokens >= 50 AND n_tokens <= 100000)
        |    AND (n_tokens > 0 AND sum_tok_len >= n_tokens * 3
        |         AND sum_tok_len <= n_tokens * 10)
        |    AND (n_tokens > 0 AND (n_hash + n_ellipsis) * 10 <= n_tokens)
        |    AND (n_tokens > 0 AND n_bullet * 5 <= n_tokens)
        |    AND (n_tokens > 0 AND n_alpha * 10 >= n_tokens * 8)
        |    AND (n_stop >= 2))::INT AS pass
        |FROM base""".stripMargin,
    // one-pass entropy identity H = log2(n) - (sum c*log2 c)/n; round-4
    // absorbs summation-order ulps (the multimodal entropy precedent)
    "text_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |hist AS (
        |  SELECT doc_id, ch, count(*)::BIGINT AS c FROM ch GROUP BY 1, 2)
        |SELECT doc_id, sum(c)::BIGINT AS n_chars,
        |  count(*)::BIGINT AS distinct_chars,
        |  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS char_entropy
        |FROM hist GROUP BY doc_id""".stripMargin,
    // offsets 1..window unioned via list_transform ranges
    "text_skipgrams" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |pairs AS (
         |  ${(1 to TextAnalysis.SkipgramWindow).map { d =>
              s"""SELECT string_split(p, chr(1))[1] AS center,
                 |    string_split(p, chr(1))[2] AS context
                 |  FROM (
                 |    SELECT unnest(list_transform(range(1, len(toks) + 1 - $d),
                 |      i -> toks[i] || chr(1) || toks[i + $d])) AS p
                 |    FROM t)""".stripMargin
            }.mkString("\n  UNION ALL\n  ")})
         |SELECT center, context, count(*)::BIGINT AS n_pairs
         |FROM pairs GROUP BY 1, 2
         |HAVING count(*) >= ${TextAnalysis.SkipgramMinCount}""".stripMargin,
    // both LM scores from one shared token CTE chain; gain = difference
    // of the two round-4 values, selection compares the rounded gain
    "text_lm_gain" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS w1 FROM t),
        |uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM tok GROUP BY w1),
        |tot AS (SELECT sum(c1)::BIGINT AS n FROM uni),
        |v AS (SELECT count(*)::BIGINT AS v FROM uni),
        |u AS (
        |  SELECT doc_id, round(avg(ln(c1::DOUBLE / n)), 4) AS uni_lp
        |  FROM tok JOIN uni USING (w1) CROSS JOIN tot GROUP BY doc_id),
        |bgd AS (
        |  SELECT doc_id,
        |    string_split(bigram, ' ')[1] AS w1,
        |    string_split(bigram, ' ')[2] AS w2
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        |    FROM t)),
        |bgc AS (
        |  SELECT w1, w2, count(*)::BIGINT AS c12 FROM bgd GROUP BY 1, 2),
        |b AS (
        |  SELECT doc_id, round(avg(ln((c12 + 1)::DOUBLE / (c1 + v))), 4)
        |    AS bi_lp
        |  FROM bgd JOIN bgc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
        |  GROUP BY doc_id)
        |SELECT u.doc_id, u.uni_lp, b.bi_lp,
        |  round(b.bi_lp - u.uni_lp, 4) AS lm_gain,
        |  (round(b.bi_lp - u.uni_lp, 4) > 0.0)::INT AS selected
        |FROM u JOIN b USING (doc_id)""".stripMargin,
    // the full langid oracle as a subquery, joined back to the labels
    "text_lang_confusion" ->
      s"""SELECT d.lang, p.lang_pred, count(*) AS n_docs
         |FROM (${TextAnalysis.langIdOracleSql}) p
         |JOIN documents d USING (doc_id)
         |GROUP BY 1, 2""".stripMargin,
    // ntile over (rounded score desc, doc_id) — both engines implement
    // standard ntile remainder-to-leading-buckets, and ranking on the
    // round-4 value makes the order identical
    "text_ccnet_tiers" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT sum(c)::BIGINT AS n FROM cnt),
        |scored AS (
        |  SELECT doc_id, round(avg(ln(c::DOUBLE / n)), 4) AS avg_logprob
        |  FROM toks JOIN cnt USING (tok) CROSS JOIN tot
        |  GROUP BY doc_id),
        |t AS (
        |  SELECT s.doc_id, d.lang, s.avg_logprob,
        |    ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY s.avg_logprob DESC, s.doc_id) AS b
        |  FROM scored s JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, avg_logprob,
        |  CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |    ELSE 'tail' END AS tier
        |FROM t""".stripMargin,
    // md5-derived bucket + sign (the 48-bit/nibble-parity idioms), all
    // integer sums — featurizer is exact cross-engine
    "text_feature_hashing" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |tk AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
         |hashed AS (
         |  SELECT doc_id,
         |    list_reduce(list_transform(
         |      string_split(substr(md5('f|' || tok), 1, 12), ''),
         |      c -> (strpos('0123456789abcdef', c) - 1)::BIGINT),
         |      (a, b) -> a * 16 + b) % ${TextAnalysis.FhDim} AS bucket,
         |    ((strpos('0123456789abcdef',
         |        substr(md5('s|' || tok), 1, 1)) - 1) % 2 * 2 - 1)::BIGINT AS sg
         |  FROM tk),
         |cells AS (
         |  SELECT doc_id, bucket, sum(sg)::BIGINT AS x, count(*)::BIGINT AS cnt
         |  FROM hashed GROUP BY 1, 2)
         |SELECT doc_id, sum(cnt)::BIGINT AS n_tokens,
         |  sum(CASE WHEN x != 0 THEN 1 ELSE 0 END)::BIGINT AS nnz,
         |  sum(x * x)::BIGINT AS l2sq
         |FROM cells GROUP BY doc_id""".stripMargin,
    "text_unigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT sum(c)::BIGINT AS n FROM cnt)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  round(avg(ln(c::DOUBLE / n)), 4) AS avg_logprob
        |FROM toks JOIN cnt USING (tok) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
        |  WHERE length(term) > 0 GROUP BY 1, 2),
        |d AS (SELECT term, count(*)::BIGINT AS df FROM t GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM documents),
        |w AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |    round(t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)), 4) AS weight
        |  FROM t JOIN d USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY weight DESC, term) AS rk FROM w)
        |SELECT doc_id, term, tf, df, weight, rk FROM r WHERE rk <= 5""".stripMargin,
    "elf_buckets" ->
      """WITH h AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
        |    (acc, x) -> CASE
        |      WHEN ((acc * 16 + x) & 4026531840) != 0 THEN
        |        xor(acc * 16 + x,
        |            ((acc * 16 + x) & 4026531840) // 16777216)
        |          - (xor(acc * 16 + x,
        |                 ((acc * 16 + x) & 4026531840) // 16777216)
        |             & ((acc * 16 + x) & 4026531840))
        |      ELSE acc * 16 + x END) AS eh
        |  FROM documents)
        |SELECT eh % 32 AS bucket, count(*) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM h GROUP BY 1""".stripMargin
  )
}
