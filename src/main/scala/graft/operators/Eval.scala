package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset- and classifier-evaluation metrics in EXACT rational
  * arithmetic — the monitoring family a curation pipeline runs over
  * every corpus snapshot: ranking quality of a filter score (ROC AUC),
  * distribution drift between snapshots (two-sample Kolmogorov–
  * Smirnov), labeler agreement (Cohen's kappa), concentration /
  * inequality of a mass distribution (Gini), retrieval eval (rank of
  * first relevant), and clustering quality against gold labels
  * (purity). Counterpart to the filter/score producers elsewhere in
  * the catalog (quality, lang-ID, blocklists, k-means): those CREATE
  * signals, this family tells you whether the signals are any good —
  * the reference's world has nothing comparable (its pipeline is a
  * row-at-a-time forwarder, firebase/app/artifacts.py:302-327), so
  * this is pure capability extension for the training-data use case.
  *
  * Numeric posture: every metric here is a ratio of integer counting
  * statistics, so it is computed with integer/DECIMAL(38,0) arithmetic
  * end-to-end and emitted as truncated parts-per-million BIGINTs —
  * bit-identical on any engine, partition order, or fused-multiply
  * hardware. No transcendental ever enters a comparison.
  *
  * Scale posture: every operator below is (pre-aggregate on a compound
  * key) → (one partitioned window or bounded join) → (per-group
  * rollup). The only shuffles are keyed by the group column plus the
  * swept value; nothing is ever pairwise, nothing collects to the
  * driver, and window frames are running prefix sums (Spark streams
  * them through the sort — no whole-partition buffering).
  */
object Eval {

  private val D38 = "DECIMAL(38,0)"

  /** Grouped ROC AUC via the Mann–Whitney U statistic with exact tie
    * handling — the standard "is this filter score actually ranking
    * good docs above bad ones" check, computed without materializing a
    * single (pos, neg) pair.
    *
    * 2U = Σ_scores cp(s)·(2·cumNegBelow(s) + cn(s)): each positive
    * counts 2 per strictly-lower-scored negative and 1 per tied
    * negative, so AUC = U / (n_pos·n_neg) needs only a CDF sweep: one
    * aggregate on (group, score), one running-sum window per group,
    * one rollup. Groups with an empty class are dropped (AUC is
    * undefined there), mirroring the HAVING in the oracle.
    *
    * @param labelCol boolean column — the positive class
    * @param scoreCol any orderable column; ties handled exactly
    * @return (group, n_pos, n_neg, auc_ppm) with auc_ppm =
    *         ⌊10⁶·U/(n_pos·n_neg)⌋
    */
  def rocAuc(df: DataFrame, groupCol: String, labelCol: String,
             scoreCol: String): DataFrame = {
    val perScore = df.groupBy(col(groupCol), col(scoreCol))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("cp"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("cn"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val swept = perScore
      .withColumn("cum_neg_below", coalesce(sum(col("cn")).over(w), lit(0L)))
      // u2 term per distinct score; DECIMAL(38,0): cp·cumNeg is
      // count·count and overflows Long at ~3e9-row groups
      .withColumn("u2", expr(
        s"CAST(cp AS $D38) * (2 * cum_neg_below + cn)"))
    swept.groupBy(col(groupCol))
      .agg(sum(col("cp")).as("n_pos"), sum(col("cn")).as("n_neg"),
        sum(col("u2")).as("u2s"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        expr(s"CAST(u2s * 500000 div (CAST(n_pos AS $D38) * n_neg) " +
          "AS BIGINT)").as("auc_ppm"))
  }

  /** Grouped two-sample Kolmogorov–Smirnov statistic, exact:
    * D = max_x |F_a(x) − F_b(x)| over the pooled support, kept as the
    * integer |cumA·n_b − cumB·n_a| until the final ppm division — the
    * drift monitor between two corpus snapshots (chi-square covers
    * categorical drift elsewhere in the catalog; this is its
    * continuous-valued counterpart).
    *
    * Same CDF-sweep shape as [[rocAuc]]: aggregate on (group, value),
    * one running-sum window per group, max-rollup. Groups missing
    * either sample are dropped.
    *
    * @param inACol boolean — true = sample A, false = sample B
    * @return (group, n_a, n_b, d_ppm) with d_ppm = ⌊10⁶·D⌋
    */
  def ksStatistic(df: DataFrame, groupCol: String, inACol: String,
                  valueCol: String): DataFrame = {
    val perValue = df.groupBy(col(groupCol), col(valueCol))
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("ca"),
        sum(when(col(inACol), 0L).otherwise(1L)).as("cb"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val swept = perValue
      .withColumn("cum_a", sum(col("ca")).over(wCum))
      .withColumn("cum_b", sum(col("cb")).over(wCum))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .withColumn("d_num", expr(
        s"abs(CAST(cum_a AS $D38) * n_b - CAST(cum_b AS $D38) * n_a)"))
    swept.groupBy(col(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("d_num")).as("d_num"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col(groupCol), col("n_a"), col("n_b"),
        expr(s"CAST(d_num * 1000000 div (CAST(n_a AS $D38) * n_b) " +
          "AS BIGINT)").as("d_ppm"))
  }

  /** Grouped Gini coefficient of a count distribution — "how
    * concentrated is activity/token mass across units" (users,
    * sources, domains), the standard inequality summary for corpus
    * balance dashboards.
    *
    * For per-unit masses x₁≤…≤x_n:
    * G = (2·Σ i·x_i − (n+1)·S) / (n·S). Tie order is irrelevant
    * (within a tie block Σi is fixed and x constant), so the unit-id
    * tiebreak is for determinism of the sweep only, not the result.
    * One aggregate on (group, unit), one row_number window per group
    * over the (far smaller) per-unit relation, one rollup.
    *
    * @return (group, n_units, total, gini_ppm)
    */
  def giniConcentration(df: DataFrame, groupCol: String,
                        unitCol: String): DataFrame = {
    val perUnit = df.groupBy(col(groupCol), col(unitCol))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("x"), col(unitCol))
    perUnit
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("ix", expr(s"CAST(i AS $D38) * x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"), sum(col("x")).as("total"),
        sum(col("ix")).as("six"))
      .filter(col("total") > 0)
      .select(col(groupCol), col("n_units"), col("total"),
        expr(s"CAST((2 * six - (n_units + 1) * CAST(total AS $D38)) " +
          s"* 1000000 div (CAST(n_units AS $D38) * total) AS BIGINT)")
          .as("gini_ppm"))
  }

  /** Grouped Cohen's kappa — chance-corrected agreement between two
    * categorical labelers (annotators, or a new heuristic vs the
    * incumbent): κ = (N·agree − Σᵢ rᵢ·cᵢ) / (N² − Σᵢ rᵢ·cᵢ).
    *
    * The confusion matrix per group is k×k-bounded, so after the one
    * (group, a, b) aggregate everything runs on tiny relations; the
    * marginal product joins on the label value within the group.
    * Emits the integer numerator pieces alongside the ppm so a
    * negative-κ group (truncation direction differs per engine for
    * negatives) can be audited from the exact integers.
    *
    * @return (group, n, agree_n, chance_num, kappa_ppm) where
    *         chance_num = Σᵢ rᵢ·cᵢ and kappa_ppm =
    *         ⌊10⁶(N·agree−chance)/(N²−chance)⌋ (exact when κ ≥ 0)
    */
  def cohenKappa(df: DataFrame, groupCol: String, aCol: String,
                 bCol: String): DataFrame = {
    val m = df.groupBy(col(groupCol), col(aCol), col(bCol))
      .agg(count(lit(1)).as("nab"))
    // explicit renames on the column-marginal side: r and c share
    // lineage through m, so df-qualified references would lean on
    // Spark's self-join fixup (and warn) — renamed keys join plainly
    val r = m.groupBy(col(groupCol), col(aCol).as("lab"))
      .agg(sum(col("nab")).as("rn"))
    val c = m.groupBy(col(groupCol).as("g2"), col(bCol).as("lab2"))
      .agg(sum(col("nab")).as("cn"))
    val chance = r.join(c,
        col(groupCol) === col("g2") && col("lab") === col("lab2"))
      .groupBy(col(groupCol))
      .agg(sum(expr(s"CAST(rn AS $D38) * cn")).as("chance_num"))
    val agg = m.groupBy(col(groupCol))
      .agg(sum(col("nab")).as("n"),
        sum(when(col(aCol) === col(bCol), col("nab")).otherwise(0L))
          .as("agree_n"))
    agg.join(chance, Seq(groupCol))
      .select(col(groupCol), col("n"), col("agree_n"),
        col("chance_num").cast("long").as("chance_num"),
        expr(s"CAST((CAST(n AS $D38) * agree_n - chance_num) * 1000000" +
          s" div (CAST(n AS $D38) * n - chance_num) AS BIGINT)")
          .as("kappa_ppm"))
  }

  /** Rank of the first relevant item per group under a caller-supplied
    * deterministic ordering, plus its reciprocal in ppm — the
    * building block of MRR retrieval eval (mean the ppm column for the
    * headline number). One window per group; groups with no relevant
    * item drop out (their reciprocal rank is 0 by convention and they
    * carry no information here).
    *
    * @param orderCols total order within the group (must be unique for
    *                  cross-engine determinism)
    * @return (group, first_rank, rr_ppm)
    */
  def firstRelevantRank(df: DataFrame, groupCol: String,
                        orderCols: Seq[org.apache.spark.sql.Column],
                        relevantCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(orderCols: _*)
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col(relevantCol))
      .groupBy(col(groupCol))
      .agg(min(col("rnk")).as("first_rank"))
      .withColumn("rr_ppm", expr("1000000 div first_rank"))
  }

  /** Grouped precision/recall/F1/accuracy of a binary prediction at a
    * chosen operating point — the companion to [[rocAuc]] (which is
    * threshold-free): once a threshold ships, THIS is the number on
    * the dashboard. All four ratios are exact truncated ppm;
    * F1 = 2tp/(2tp+fp+fn) needs no intermediate precision/recall.
    * Degenerate groups emit NULL for the undefined ratio (no
    * predicted positives → precision NULL; no actual positives →
    * recall/F1 NULL) identically on any engine. One aggregate keyed
    * by the group — nothing else.
    *
    * @return (group, tp, fp, fn, tn, precision_ppm, recall_ppm,
    *         f1_ppm, accuracy_ppm)
    */
  def binaryPrf(df: DataFrame, groupCol: String, labelCol: String,
                predCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        sum(when(col(labelCol) && col(predCol), 1L).otherwise(0L)).as("tp"),
        sum(when(!col(labelCol) && col(predCol), 1L).otherwise(0L)).as("fp"),
        sum(when(col(labelCol) && !col(predCol), 1L).otherwise(0L)).as("fn"),
        sum(when(!col(labelCol) && !col(predCol), 1L).otherwise(0L)).as("tn"))
      .select(col(groupCol), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) END")
          .as("precision_ppm"),
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) END")
          .as("recall_ppm"),
        expr("CASE WHEN 2*tp + fp + fn > 0 THEN " +
          "2 * tp * 1000000 div (2*tp + fp + fn) END").as("f1_ppm"),
        expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)")
          .as("accuracy_ppm"))

  /** Grouped Spearman rank correlation with tie-robust DOUBLED
    * AVERAGE ranks: rows tied on the full (value, tiebreakCol) key
    * share the integer 2·avgrank, so the statistic is a total
    * function of the input multiset — duplicate rows (which make any
    * row_number-ranked statistic nondeterministic) cannot perturb it.
    * The classical closed form runs on the doubled ranks,
    * ρ = 1 − 6Σ(2Δ)²/(4·n(n²−1)), exact rational — no tie-corrected
    * Pearson (which would drag a √ into the comparison). This is the
    * monotone-association check between two heuristic scores before
    * one replaces the other. Two partitioned sorts + one aggregate.
    *
    * @return (group, n, sum_d2x4, rho_ppm); groups with n < 2 drop
    *         (ρ undefined). `sum_d2x4` = Σ(2Δ)² (4× the classical Σd²
    *         on tie-free input) is a DIAGNOSTIC column: its BIGINT
    *         emit wraps past ~10⁶-row groups (n³-bounded); `rho_ppm`
    *         itself rides the DECIMAL path and stays exact at any
    *         group size.
    */
  def spearmanRho(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String, tiebreakCol: String): DataFrame = {
    val wx = Window.partitionBy(col(groupCol))
      .orderBy(col(xCol), col(tiebreakCol))
    val wy = Window.partitionBy(col(groupCol))
      .orderBy(col(yCol), col(tiebreakCol))
    // DOUBLED AVERAGE ranks over peers of the full (value, tiebreak)
    // key: 2·avgrank = 2·rank + |peers| − 1, an integer. row_number
    // assigns fully-duplicated rows (same value AND tiebreak) an
    // arbitrary relative order, independently for the x and y sorts —
    // Σd² then varies run-to-run and engine-to-engine (r17 dup
    // metamorphic sweep). Average ranks give identical rows identical
    // ranks, so the statistic is total-function-of-the-multiset. On a
    // unique tiebreak, 2·avgrank = 2·rank exactly.
    val px = Window.partitionBy(col(groupCol), col(xCol), col(tiebreakCol))
    val py = Window.partitionBy(col(groupCol), col(yCol), col(tiebreakCol))
    df.withColumn("rx2",
        (rank().over(wx).cast("long") * 2 + count(lit(1)).over(px) - 1))
      .withColumn("ry2",
        (rank().over(wy).cast("long") * 2 + count(lit(1)).over(py) - 1))
      .withColumn("d2", expr(s"CAST(rx2 - ry2 AS $D38) * (rx2 - ry2)"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("sd4"))
      .filter(col("n") > 1)
      .select(col(groupCol), col("n"),
        // (2Δ)²-scaled diagnostic — 4× the classical Σd² on tie-free
        // input; named to make the scaling explicit
        col("sd4").cast("long").as("sum_d2x4"),
        // n(n²−1) built entirely in DECIMAL — a LONG n*n wraps past
        // ~3e9-row groups, inside the 100 TB envelope
        expr(s"1000000 - CAST(sd4 * 6000000 div ((CAST(n AS $D38) " +
          "* n * n - n) * 4) AS BIGINT)").as("rho_ppm"))
  }

  /** Grouped score-calibration bins: rank rows by (score, tiebreak)
    * within the group, cut into `bins` equal-count buckets with exact
    * integer arithmetic (bucket = (rank−1)·bins div n — no ntile
    * semantics to cross-check), and report per-bucket size, positive
    * rate, and score range. A monotone pos_rate over buckets is what
    * a well-calibrated filter score looks like; flat means the score
    * carries nothing in that group. One partitioned sort + one
    * aggregate on (group, bucket).
    *
    * @return (group, bucket, n, n_pos, pos_rate_ppm, score_lo,
    *         score_hi)
    */
  def calibrationBins(df: DataFrame, groupCol: String, scoreCol: String,
                      tiebreakCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(tiebreakCol))
    val wn = Window.partitionBy(col(groupCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nd", count(lit(1)).over(wn))
      .withColumn("bucket", expr(s"(rn - 1) * $bins div nd"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        min(col(scoreCol)).as("score_lo"),
        max(col(scoreCol)).as("score_hi"))
      .withColumn("pos_rate_ppm", expr("n_pos * 1000000 div n"))
  }

  /** Cluster purity against gold labels: per cluster, the majority
    * gold label (smallest label on ties), its count, and
    * purity_ppm = ⌊10⁶·majority/n⌋ — the "did k-means actually find
    * the label structure" check for SemDeDup-style semantic curation.
    * Input is (clusterCol, labelCol) assignment rows; both aggregates
    * are keyed by cluster(, label) — nothing pairwise.
    *
    * @return (cluster, n, majority_label, majority_n, purity_ppm)
    */
  def clusterPurity(assign: DataFrame, clusterCol: String,
                    labelCol: String): DataFrame = {
    val perLabel = assign.groupBy(col(clusterCol), col(labelCol))
      .agg(count(lit(1)).as("nl"))
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col("nl").desc, col(labelCol))
    perLabel
      .withColumn("rn", row_number().over(w))
      .withColumn("n", sum(col("nl")).over(
        Window.partitionBy(col(clusterCol))))
      .filter(col("rn") === 1)
      .select(col(clusterCol), col("n"),
        col(labelCol).cast("long").as("majority_label"),
        col("nl").as("majority_n"),
        expr("majority_n * 1000000 div n").as("purity_ppm"))
  }
}
