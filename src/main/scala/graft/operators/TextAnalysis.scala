package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation at scale: language ID
  * (token-profile heuristic), quality scoring (length/stopword/shape
  * ratios), token counting (whitespace + regex), and winnowing-style
  * document fingerprinting. All pure per-row projections — codegen'd
  * array lambdas, no shuffle, no UDFs.
  */
object TextAnalysis {

  /** Marker-token profiles for the n-gram/stopword language-ID
    * heuristic. Profiles are configuration; these defaults exercise the
    * operator on the synthetic corpus vocabulary. */
  val DefaultProfiles: Seq[(String, Seq[String])] = Seq(
    "general" -> Seq("the", "a", "of", "and"),
    "query"   -> Seq("query", "table", "scan", "join", "filter"),
    "stream"  -> Seq("stream", "batch", "window", "event"))

  /** Per-profile score = |tokens ∩ markers| / |tokens|; predicted label
    * = argmax score with lexicographic tie-break. Adds
    * `pred_lang` and one score column per profile. */
  def withLanguageId(df: DataFrame, textCol: String,
                     profiles: Seq[(String, Seq[String])] = DefaultProfiles): DataFrame = {
    val toks = array_distinct(split(col(textCol), " "))
    val scored = profiles.foldLeft(df.withColumn("_toks", toks)) {
      case (d, (lang, markers)) =>
        val markerArr = array(markers.map(lit): _*)
        d.withColumn(s"score_$lang",
          size(array_intersect(col("_toks"), markerArr)).cast("double") /
            size(col("_toks")).cast("double"))
    }
    val langsSorted = profiles.map(_._1).sorted
    val maxScore = langsSorted.map(l => col(s"score_$l")).reduce(greatest(_, _))
    // first profile (in name order) reaching the max wins ties
    val predLang = langsSorted.reverse.foldLeft(lit(null).cast("string")) {
      (acc, l) => when(col(s"score_$l") === maxScore, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", predLang).drop("_toks")
  }

  /** Quality metrics: token count, average token length, stopword
    * ratio, and a fixed-order weighted score. All ratios are int/int
    * double divisions — bit-deterministic. */
  def withQuality(df: DataFrame, textCol: String,
                  stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")): DataFrame = {
    df.withColumn("_w", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("_w")).cast("long"))
      .withColumn("avg_token_len",
        (length(col(textCol)) - size(col("_w")) + 1).cast("double") /
          size(col("_w")).cast("double"))
      .withColumn("stopword_ratio",
        expr("size(filter(_w, t -> array_contains(" +
          stopwords.map(s => s"'$s'").mkString("array(", ",", ")") + ", t)))")
          .cast("double") / size(col("_w")).cast("double"))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.5 +
          col("stopword_ratio") * 0.3 +
          least(lit(1.0), col("avg_token_len") / 10.0) * 0.2)
      .drop("_w")
  }

  /** Token counts: whitespace tokens, regex word tokens, and a
    * chars/4 BPE-ish estimate. */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(col(textCol), lit("[a-z0-9]+"), lit(0))).cast("long"))
      .withColumn("est_bpe_tokens",
        ceil(length(col(textCol)).cast("double") / 4.0).cast("long"))

  /** Winnowing-style fingerprint: md5 each distinct word n-gram
    * shingle, keep hashes starting with '0' (1/16 sample, content-
    * keyed so near-identical docs select near-identical sets), sort,
    * concatenate, md5. Emits the selected-count for inspection. */
  def withFingerprint(df: DataFrame, shingleCol: String = "sh"): DataFrame =
    df.withColumn("_sel",
        expr(s"sort_array(filter(transform($shingleCol, t -> md5(t)), h -> substring(h, 1, 1) = '0'))"))
      .withColumn("n_selected", size(col("_sel")).cast("long"))
      .withColumn("fingerprint", md5(array_join(col("_sel"), "")))
      .drop("_sel")

  /** Gopher-style intra-document repetition signals — the quality
    * rules that catch boilerplate-by-repetition (crawler loops,
    * keyword stuffing, templated spam) which length/stopword ratios
    * miss:
    *
    *   - `top_bigram_frac`: tokens covered by the single most frequent
    *     bigram, / n_tokens (Gopher's "fraction in most common 2-gram"
    *     on whitespace tokens);
    *   - `dup_5gram_frac`: fraction of 5-gram INSTANCES that are
    *     repeats of an earlier instance, (total - distinct) / total;
    *   - `ttr`: type-token ratio, distinct / total tokens.
    *
    * All ratios are exact-integer-operand double divisions —
    * bit-stable across engines. Scale shape: the per-n-gram counts are
    * one explode + hash aggregation each, keyed by (doc, gram) with
    * map-side partial aggregation, then a per-doc rollup — never a
    * per-row O(n·distinct) array scan (the pure-projection alternative
    * goes quadratic on repetitive documents, exactly the ones this
    * operator exists to flag). Docs shorter than the n-gram window get
    * fraction 0 via the left joins. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .withColumn("_toks", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("ttr",
        size(array_distinct(col("_toks"))).cast("double") /
          size(col("_toks")).cast("double"))
    def grams(n: Int): DataFrame = {
      val concatParts = (0 until n).map(k => s"element_at(_toks, i + $k)").mkString(", ' ', ")
      // explode_outer + null filter: the non-outer Generate's pushed
      // size()>0 filter re-inlines the interpreted transform chain
      base.select(col(idCol),
          when(size(col("_toks")) >= n,
            expr(s"transform(sequence(1, size(_toks) - ${n - 1}), i -> concat($concatParts))"))
          .otherwise(array().cast("array<string>")).as("_g"))
        .select(col(idCol), explode_outer(col("_g")).as("gram"))
        .filter(col("gram").isNotNull)
    }
    val topBigram = grams(2)
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("max_bigram"))
    val dup5 = grams(5)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("t5"), countDistinct(col("gram")).as("d5"))
    base.drop("_toks")
      .join(topBigram, Seq(idCol), "left")
      .join(dup5, Seq(idCol), "left")
      .withColumn("top_bigram_frac",
        coalesce(col("max_bigram") * 2L, lit(0L)).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("dup_5gram_frac",
        coalesce((col("t5") - col("d5")).cast("double") / col("t5").cast("double"),
          lit(0.0)))
      .drop("max_bigram", "t5", "d5")
  }
}
