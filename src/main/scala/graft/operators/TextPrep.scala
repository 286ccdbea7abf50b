package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data preparation operators: document chunking, sequence
  * packing, and corpus balancing — the steps between a cleaned corpus
  * and a tokenizer at 100 TB (reference analog: the consumer's
  * document-shaping stage, artifacts.py:359-376, generalized from
  * per-message masking to per-corpus restructuring).
  *
  * Scale design: chunking is a pure per-row projection + posexplode
  * (no shuffle); packing shards the corpus by a deterministic hash and
  * runs the running-total window WITHIN each shard, so no global
  * single-partition window exists anywhere; balancing is one window
  * per group key. Everything is engine-deterministic (md5-derived
  * hashes, integer token counts) so the DuckDB oracle reproduces
  * results bit-exactly.
  */
object TextPrep {

  /** Fixed-window token chunking with overlap — the standard long-
    * document split for a context-bounded model. Chunk i covers
    * tokens [i·stride, i·stride + chunkTokens) with
    * stride = chunkTokens - overlap; every document yields at least
    * one chunk (short docs pass through whole). Pure projection +
    * posexplode: no shuffle, no state. */
  def withChunks(df: DataFrame, textCol: String,
      chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap < chunkTokens, "overlap must be smaller than the chunk")
    val stride = chunkTokens - overlap
    // a NULL text has no chunks: without the filter, size(NULL) = -1
    // routes to nc = 1 and posexplode_outer emits one phantom
    // NULL-chunk row per null doc (r17 nullify metamorphic sweep)
    val chunked = df.filter(col(textCol).isNotNull)
      .withColumn("_toks", split(col(textCol), " "))
      .withColumn("_nc",
        when(size(col("_toks")) <= chunkTokens, lit(1))
          .otherwise(expr(s"(size(_toks) - $chunkTokens + $stride - 1) div $stride + 1")))
      .withColumn("_chunks", expr(
        s"transform(sequence(0, _nc - 1), i -> array_join(slice(_toks, i * $stride + 1, $chunkTokens), ' '))"))
    // posexplode_outer, NOT posexplode: the non-outer Generate pushes a
    // `size(_chunks) > 0` filter below the projection, and predicate
    // pushdown re-inlines the whole interpreted transform(...) chain
    // into it (recomputing split(text) per element) — a quadratic
    // per-row blowup. _chunks is never empty (nc >= 1), so outer is
    // semantically identical and skips the poisoned filter.
    chunked
      .select(col("*"), posexplode_outer(col("_chunks")).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
      .withColumn("n_chunks", col("_nc").cast("long"))
      .withColumn("chunk_tokens", expr("size(split(chunk_text, ' '))").cast("long"))
      .drop("_toks", "_nc", "_chunks")
  }

  /** Concat-and-cut sequence packing: documents are laid out in
    * doc-id order within `nShards` hash shards, and a document's pack
    * is the training sequence its FIRST token falls into at the given
    * token budget — the standard "concatenate the corpus, cut every
    * `budget` tokens" batching. The running total is a window WITHIN
    * each shard (shards are the parallelism unit — no global-order
    * single-reducer window), so the layout is deterministic AND
    * distributed; a pack is globally identified by (shard, pack_idx).
    */
  def withPacks(df: DataFrame, idCol: String, tokensCol: String,
      budget: Int = 256, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sharded = df.withColumn("shard",
      pmod(Sketches.hash32(col(idCol)), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("_start", col("_cum") - col(tokensCol))
      .withColumn("pack_idx", expr(s"_start div $budget"))
      .withColumn("pack_offset", col("_start") % budget)
      .drop("_cum", "_start")
  }

  /** Per-group quota balancing: keep at most `quota` rows per value of
    * `groupCol`, chosen by deterministic hash rank (md5 of the id) so
    * the kept set is a uniform, reproducible sample of each group —
    * the "cap every source/domain at N documents" corpus-balancing
    * step. One window per group key; no global ordering. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
      quota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
  }

  /** Weighted systematic sampling: select ~k rows with probability
    * proportional to `weightCol` (PPS) — the corpus-mixing primitive
    * ("sample 100k documents weighted by length/quality from this
    * source"). Rows are laid on a deterministic hash order, weights
    * cumulated, and a row is selected iff its weight interval crosses
    * a multiple of total/k — all-integer arithmetic, so membership is
    * bit-reproducible on any engine (requires weight·k < 2^63; at
    * 100 TB of chars and k=10^4 that is ~10^18, inside the bound).
    *
    * Scale shape: the running sum is a DISTRIBUTED prefix sum, not a
    * global window — rows shard by the first hex digit of the hash
    * (a PREFIX of the global order, so shard cumsums + shard offsets
    * reconstruct the exact global running sum), the per-shard window
    * sorts only its shard, and the 16 shard totals cumulate in a
    * bounded 16-row window before broadcasting back. */
  def systematicWeightedSample(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sharded = df
      .withColumn("_m", md5(col(idCol).cast("string")))
      .withColumn("_shard", substring(col("_m"), 1, 1))
      .withColumn("_w", col(weightCol).cast("long"))
    val wLocal = Window.partitionBy(col("_shard"))
      .orderBy(col("_m"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sharded.withColumn("_cum_local", sum(col("_w")).over(wLocal))
    val wOff = Window.orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = local.groupBy(col("_shard")).agg(sum(col("_w")).as("_tot"))
      .withColumn("_off", coalesce(sum(col("_tot")).over(wOff), lit(0L)))
      .withColumn("_wtot", sum(col("_tot")).over(wAll))
      .select(col("_shard"), col("_off"), col("_wtot"))
    local.join(broadcast(offsets), "_shard")
      .withColumn("_cum", col("_off") + col("_cum_local"))
      .filter(expr(s"(_cum * $k) div _wtot > ((_cum - _w) * $k) div _wtot"))
      .drop("_m", "_shard", "_w", "_cum_local", "_off", "_wtot", "_cum")
  }

  /** Per-phrase document frequency over distinct word n-grams — the
    * detection half of C4-style boilerplate cleaning: a phrase
    * appearing in many distinct documents is template/boilerplate
    * mass, not content. One shuffle (on the phrase); per-doc distinct
    * first so a phrase repeated within one document counts once. */
  def ngramDocFreq(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame =
    // explode_outer + null filter, NOT explode: see withChunks — the
    // non-outer Generate's pushed `size(sh) > 0` filter re-inlines the
    // whole interpreted shingle expression (split per element_at)
    Dedup.withShingles(df.select(col(idCol), col(textCol)), textCol, n)
      .select(col(idCol), explode_outer(col("sh")).as("phrase"))
      .filter(col("phrase").isNotNull)
      .groupBy(col("phrase")).agg(count(lit(1)).as("ndocs"))

  /** Per-document boilerplate fraction: the share of a document's
    * distinct n-grams whose corpus doc-frequency reaches `minDocs` —
    * a quality-filter signal (drop or down-weight docs that are
    * mostly template). The doc-frequency is a count-over-window
    * partitioned by the phrase, NOT a groupBy + join back: the
    * (doc, phrase) rows are already distinct, so the window count IS
    * ndocs, and the corpus-sized explode is computed and shuffled
    * once (on the phrase) instead of twice plus a phrase-keyed join. */
  def boilerplateFraction(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Dedup.withShingles(df.select(col(idCol), col(textCol)), textCol, n)
      .select(col(idCol), explode_outer(col("sh")).as("phrase"))
      .filter(col("phrase").isNotNull)
      .withColumn("ndocs", count(lit(1)).over(Window.partitionBy(col("phrase"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_phrases"),
        sum(when(col("ndocs") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_phrases").cast("double"))
  }

  /** Deterministic stratified train/val/test split: EXACT per-stratum
    * proportions (not expected-value hash thresholds — small or skewed
    * strata would drift), assigned by hash rank within the stratum so
    * membership is reproducible and independent of row order. The
    * boundary test `rank·100 <= n·pct` is all-integer — no float
    * boundary can disagree across engines. One window per stratum; no
    * global ordering anywhere. */
  def stratifiedSplit(df: DataFrame, strataCol: String, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100, "split percentages exceed 100")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(strataCol))))
      .withColumn("split",
        when(col("_rk") * 100 <= col("_n") * trainPct, "train")
          .when(col("_rk") * 100 <= col("_n") * (trainPct + valPct), "val")
          .otherwise("test"))
      .drop("_rk", "_n")
  }

  /** Benchmark decontamination: flag training documents sharing any
    * word n-gram with an evaluation set — the standard n-gram-overlap
    * test-set leak check a training corpus must pass before a model
    * trains on it. Emits, per contaminated training doc, the count of
    * distinct shared n-grams and of distinct eval docs hit.
    *
    * Scale shape: both sides reduce to distinct (doc, shingle) rows;
    * the join key is the shingle. The eval side (benchmarks are
    * thousands of docs, the corpus billions) is tiny, so its distinct
    * shingle set broadcasts — the corpus side never shuffles, it
    * streams through a broadcast hash join and aggregates per doc
    * map-side first. `n` defaults to 8: long enough that chance
    * collisions vanish, short enough to survive light paraphrase
    * (the 13-gram convention needs longer documents than this
    * synthetic corpus). */
  private def shingledIds(df: DataFrame, idCol: String, textCol: String,
      n: Int, as: String): DataFrame =
    Dedup.withShingles(df.select(col(idCol), col(textCol)), textCol, n)
      .select(col(idCol).as(as), explode_outer(col("sh")).as("gram"))
      .filter(col("gram").isNotNull)

  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    shingledIds(train, idCol, textCol, n, "train_id")
      .join(broadcast(shingledIds(eval, idCol, textCol, n, "eval_id").distinct()),
        "gram")
      .groupBy(col("train_id"))
      .agg(countDistinct(col("gram")).as("n_shared_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))

  /** The eval-side rollup of [[decontaminate]]: per BENCHMARK item,
    * how compromised is it — how many of its n-grams leak into the
    * training corpus, and how many distinct training documents carry
    * them. The decision this feeds is the opposite one (drop the eval
    * item / discount its score, rather than scrub the training doc).
    * Same join shape: the eval shingle relation broadcasts, the
    * corpus relation streams past it, so the corpus is never
    * shuffled. */
  def evalLeakage(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    shingledIds(train, idCol, textCol, n, "train_id")
      .join(broadcast(shingledIds(eval, idCol, textCol, n, "eval_id").distinct()),
        "gram")
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("gram")).as("n_leaked_ngrams"),
        countDistinct(col("train_id")).as("n_train_docs"))

  /** Regex PII scrubbing: emails and phone-shaped digit runs replaced
    * with typed placeholders. Patterns restricted to character
    * classes + bounded quantifiers so Java regex (Spark) and RE2
    * (DuckDB oracle) agree byte-for-byte. Pure projection — no
    * shuffle, codegen'd. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  def redactPii(df: DataFrame, textCol: String, outCol: String = "redacted"): DataFrame =
    df.withColumn(outCol,
      regexp_replace(regexp_replace(col(textCol), EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"))

  /** Per-document TF-IDF keyword extraction (top `k` terms). The IDF
    * is kept as the exact rational tf·N/df — integer-valued operands
    * in one IEEE double division, so both engines produce identical
    * bits (a log-based IDF would rank identically but `ln` is not
    * cross-engine bit-stable). Plan: explode → per-(doc,term) count
    * (map-side combine) → per-term doc frequency via count-over-window
    * on the term → per-doc top-k window. */
  def topTfIdf(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    // doc frequency as count-over-window on the term: tf rows are
    // distinct per (doc, term), so the window count IS df — one
    // shuffle on the term instead of a groupBy plus a join back
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .drop("n_docs")
  }
}
