package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass column profiling: per-column null counts, exact distinct
  * counts, and min/max — the data-quality report run before committing a
  * corpus snapshot.
  *
  * All metrics come from ONE aggregation job (Spark plans the multiple
  * DISTINCT aggregates via Expand — logically one pass over the data),
  * then pivot to a long (column, metric...) frame driver-side-free via
  * explode. min/max are cast to string so heterogeneous column types
  * share one schema; string ordering is binary (memcmp) in both Spark
  * and DuckDB, keeping the oracle exact.
  *
  * For routine monitoring at 100 TB swap `countDistinct` for
  * `approx_count_distinct` (no Expand blowup); the exact form is the
  * audit/oracle path.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nulls"),
        countDistinct(col(c)).as(s"__${c}__distinct"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val metrics = array(cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__${c}__nulls").as("n_nulls"),
        col(s"__${c}__distinct").as("n_distinct"),
        col(s"__${c}__min").as("min_value"),
        col(s"__${c}__max").as("max_value"))
    }: _*)
    row.select(col("__n").as("n_rows"), explode(metrics).as("m"))
      .select(col("m.column"), col("n_rows"), col("m.n_nulls"),
        col("m.n_distinct"), col("m.min_value"), col("m.max_value"))
  }

  /** Snapshot profile DIFF — the schema/content drift report between
    * two versions of the same table: per column, both sides' row/null/
    * distinct counts, the null-rate delta, and whether the min/max
    * envelope moved. This is the pre-commit twin of the [[graft
    * .operators.Drift]] family: Drift scores a VALUE distribution,
    * profileDiff screens the whole table shape (a column suddenly 30%
    * null, a distinct-count collapse, an envelope jump — the three
    * upstream-breakage signatures). Two one-pass [[profile]] aggregates
    * joined on the column-count-sized name key; no data-to-data join. */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame,
      cols: Seq[String]): DataFrame = {
    val po = profile(oldDf, cols).select(col("column"),
      col("n_rows").as("n_old"), col("n_nulls").as("nulls_old"),
      col("n_distinct").as("distinct_old"),
      col("min_value").as("__mn_o"), col("max_value").as("__mx_o"))
    val pn = profile(newDf, cols).select(col("column"),
      col("n_rows").as("n_new"), col("n_nulls").as("nulls_new"),
      col("n_distinct").as("distinct_new"),
      col("min_value").as("__mn_n"), col("max_value").as("__mx_n"))
    po.join(pn, "column")
      .select(col("column"), col("n_old"), col("n_new"),
        col("nulls_old"), col("nulls_new"),
        col("distinct_old"), col("distinct_new"),
        round(col("nulls_new").cast("double") / col("n_new").cast("double")
          - col("nulls_old").cast("double") / col("n_old").cast("double"),
          6).as("null_rate_delta"),
        (!(col("__mn_n") <=> col("__mn_o")) ||
          !(col("__mx_n") <=> col("__mx_o"))).as("minmax_changed"))
  }

  /** Mutual information I(X;Y) in nats between two categorical columns
    * — the association/leakage screen beside chi² (`q_chi2_assoc`): MI
    * says HOW MANY BITS one column reveals about the other (feature
    * selection, "does `source` leak the label", redundant-column
    * detection), where chi² only says whether independence is rejected.
    * I = Σ_cells (c/n)·ln(c·n / (n_x·n_y)); exactly 0 iff the counts
    * factorize, and I(X;X) = H(X).
    *
    * Scale shape: the corpus reduces to the contingency CELL table
    * first (|X|·|Y| rows — categorical cardinality, never the corpus);
    * margins ride two cell-table windows. Per-cell transcendental terms
    * quantize onto the 1e-9 grid and sum order-free (the
    * q_source_entropy discipline). Returns one row:
    * (n_rows, n_cells, mi_nats rounded 6). */
  def mutualInformation(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val withM = cells
      .withColumn("nx", sum(col("c")).over(Window.partitionBy(col("x"))))
      .withColumn("ny", sum(col("c")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    val arg = (col("c").cast("double") * col("n").cast("double")) /
      (col("nx").cast("double") * col("ny").cast("double"))
    withM
      .withColumn("t",
        round((col("c").cast("double") / col("n").cast("double"))
          * log(arg) * lit(1e9)).cast("long"))
      .agg(max(col("n")).as("n_rows"), count(lit(1)).as("n_cells"),
        round(sum(col("t")).cast("double") / lit(1e9), 6).as("mi_nats"))
  }

  /** Welch's unequal-variance two-sample t-test between groups `a` and
    * `b` of `groupCol` — the A/B readout (treatment vs control metric
    * means) run without the equal-variance assumption Student's t
    * needs. Returns one row: (n_a, n_b, mean_a, mean_b, t_stat,
    * df_welch) with the Welch–Satterthwaite degrees of freedom.
    *
    * Cross-engine arithmetic: values quantize to exact integer cents
    * ([[graft.functions.Money.cents]] — the money-sum discipline), Σx
    * sums as long and Σx² in DECIMAL(38,0) (a long wraps once
    * rows × cents² passes ~9e18 — trillions of rows at typical
    * magnitudes), so the moments are order-free exact integers and
    * every derived double is deterministic. ONE map-side-combined
    * aggregate over the filtered scan — no shuffle beyond the 1-row
    * reduce, nothing corpus-shaped. */
  def welchTTest(df: DataFrame, valueCol: Column, groupCol: Column,
      a: String, b: String): DataFrame = {
    require(a != b, s"the two samples must differ, got '$a' twice")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val q = graft.functions.Money.cents(valueCol)
    def side(g: String) = Seq(
      sum(when(groupCol === g, 1L).otherwise(0L)),
      sum(when(groupCol === g, q).otherwise(0L)),
      sum(when(groupCol === g, dec(q) * dec(q)).otherwise(dec(lit(0)))))
    val Seq(naC, s1aC, s2aC) = side(a)
    val Seq(nbC, s1bC, s2bC) = side(b)
    // the isin prefilter reaches the scan (PushedFilters) — at scale
    // the two arms are usually a sliver of the event stream
    val agg = df.filter(groupCol.isin(a, b))
      .agg(naC.as("na"), s1aC.as("s1a"), s2aC.as("s2a"),
        nbC.as("nb"), s1bC.as("s1b"), s2bC.as("s2b"))
    def d(c: Column) = c.cast("double")
    def mean(s1: Column, n: Column) = d(s1) / d(n) / 100.0
    def variance(s2: Column, s1: Column, n: Column) =
      (d(s2) - d(s1) * d(s1) / d(n)) / (d(n) - 1.0) / 10000.0
    val (na, nb) = (col("na"), col("nb"))
    val ma = mean(col("s1a"), na)
    val mb = mean(col("s1b"), nb)
    val va = variance(col("s2a"), col("s1a"), na)
    val vb = variance(col("s2b"), col("s1b"), nb)
    val se2 = va / d(na) + vb / d(nb)
    val tStat = (ma - mb) / sqrt(se2)
    val dfw = se2 * se2 /
      ((va / d(na)) * (va / d(na)) / (d(na) - 1.0) +
        (vb / d(nb)) * (vb / d(nb)) / (d(nb) - 1.0))
    // degenerate-arm contract (the proportionZTest convention): an empty
    // or single-unit arm has no sample variance and zero pooled SE —
    // present NULL instead of leaking IEEE NaN/Inf (mirrored in
    // q_ab_welch so both engines agree on the degenerate row too)
    val ok = na > 1 && nb > 1 && se2 > 0.0
    agg.select(na.as("n_a"), nb.as("n_b"),
      when(na > 0, round(ma, 6)).as("mean_a"),
      when(nb > 0, round(mb, 6)).as("mean_b"),
      when(ok, round(tStat, 6)).as("t_stat"),
      when(ok, round(dfw, 6)).as("df_welch"))
  }

  /** Two-proportion z-test between arms `a` and `b`: unit-level
    * conversion rates compared under the pooled-variance normal
    * approximation — the A/B readout for BINARY outcomes ([[welchTTest]]
    * covers continuous metrics, [[cupedDiff]] their variance-reduced
    * form; this completes the trio). Returns one row: (n_a, n_b,
    * conv_a, conv_b, z_stat). Everything derives from four exact
    * integer counts (one unit-keyed reduce, then a 1-row aggregate), so
    * the statistic is deterministic by construction. */
  def proportionZTest(df: DataFrame, unit: Column, arm: Column,
      converted: Column, a: String, b: String): DataFrame = {
    require(a != b, s"the two arms must differ, got '$a' twice")
    val perUnit = df.filter(arm.isin(a, b))
      .groupBy(unit.as("u"), arm.as("g"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("c"))
    val m = perUnit.agg(
      sum(when(col("g") === a, 1L).otherwise(0L)).as("na"),
      sum(when(col("g") === a, col("c")).otherwise(0L)).as("ca"),
      sum(when(col("g") === b, 1L).otherwise(0L)).as("nb"),
      sum(when(col("g") === b, col("c")).otherwise(0L)).as("cb"))
    def d(c: Column) = c.cast("double")
    val pa = d(col("ca")) / d(col("na"))
    val pb = d(col("cb")) / d(col("nb"))
    val pp = (d(col("ca")) + d(col("cb"))) / (d(col("na")) + d(col("nb")))
    // a degenerate pooled rate (nobody or everybody converts) has zero
    // pooled variance and an undefined z — present NULL, not an ANSI
    // divide-by-zero from inside codegen
    val z = when(pp > 0.0 && pp < 1.0, (pa - pb) /
      sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / d(col("na")) +
        lit(1.0) / d(col("nb")))))
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(pa, 6).as("conv_a"), round(pb, 6).as("conv_b"),
      round(z, 6).as("z_stat"))
  }

  /** CUPED variance-reduced A/B difference (Deng et al., WSDM 2013):
    * adjust each unit's post-period metric Y by its pre-period
    * covariate X — Y′ = Y − θ·X with θ = cov(X,Y)/var(X) pooled across
    * arms — so pre-existing user-level variation stops inflating the
    * treatment-effect variance (the industry-standard experiment
    * sensitivity lift). Returns one row: (n_a, n_b, theta, diff_raw,
    * diff_cuped); the global E[X] term cancels in the between-arm
    * difference.
    *
    * Same exact-integer-moment discipline as [[welchTTest]]: per-unit
    * X/Y are exact cents sums (one unit-keyed shuffle), the pooled
    * second moments accumulate in DECIMAL(38,0), and every derived
    * double is deterministic. */
  def cupedDiff(df: DataFrame, unit: Column, arm: Column, isPre: Column,
      value: Column, a: String, b: String): DataFrame = {
    require(a != b, s"the two arms must differ, got '$a' twice")
    val cents = graft.functions.Money.cents(value)
    val perUnit = df.filter(arm.isin(a, b))
      .groupBy(unit.as("u"), arm.as("g"))
      .agg(sum(when(isPre, cents).otherwise(0L)).as("x"),
        sum(when(!isPre, cents).otherwise(0L)).as("y"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val m = perUnit.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"),
      sum(when(col("g") === a, 1L).otherwise(0L)).as("na"),
      sum(when(col("g") === a, col("x")).otherwise(0L)).as("sxa"),
      sum(when(col("g") === a, col("y")).otherwise(0L)).as("sya"),
      sum(when(col("g") === b, 1L).otherwise(0L)).as("nb"),
      sum(when(col("g") === b, col("x")).otherwise(0L)).as("sxb"),
      sum(when(col("g") === b, col("y")).otherwise(0L)).as("syb"))
    def d(c: Column) = c.cast("double")
    val theta =
      (d(col("sxy")) - d(col("sx")) * d(col("sy")) / d(col("n"))) /
        (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n")))
    def mean(s: Column, n: Column) = d(s) / d(n) / 100.0
    val diffRaw = mean(col("syb"), col("nb")) - mean(col("sya"), col("na"))
    val diffCuped = diffRaw - theta *
      (mean(col("sxb"), col("nb")) - mean(col("sxa"), col("na")))
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(theta, 6).as("theta"),
      round(diffRaw, 6).as("diff_raw"),
      round(diffCuped, 6).as("diff_cuped"))
  }

  /** Cohen's kappa — chance-corrected agreement between a truth label
    * and a prediction: κ = (p_o − p_e)/(1 − p_e) with p_e = Σ_k r_k·c_k
    * / n², the margin-product chance rate. The honesty companion to a
    * raw-accuracy readout (a 90%-majority-class predictor scores 0.9
    * accuracy and ~0 kappa). Returns one row: (n, po, pe, kappa).
    *
    * Scale shape: ONE corpus aggregate to class-pair cells; margins,
    * products, and the diagonal all derive from that contingency-sized
    * table (checkpointed so its lineage runs once). Margin products
    * accumulate in DECIMAL(38,0) — r·c reaches n², past a long at
    * ~3e9 rows — and every derived double comes from exact integers. */
  def cohensKappa(df: DataFrame, truthCol: String,
      predCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val cells = df.groupBy(col(truthCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("o")).localCheckpoint()
    val rm = cells.groupBy(col("t")).agg(sum(col("o")).as("r"))
    val cm = cells.groupBy(col("p")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      sum(when(col("t") === col("p"), col("o")).otherwise(0L)).as("agree"))
    val rc = rm.join(cm, col("t") === col("p"))
      .agg(coalesce(sum(dec(col("r")) * dec(col("c"))),
        dec(lit(0))).as("rc"))
    def d(c: Column) = c.cast("double")
    val po = d(col("agree")) / d(col("n"))
    val pe = d(col("rc")) / (d(col("n")) * d(col("n")))
    // degenerate contract: pe = 1 (a single class on both axes) makes
    // κ 0/0 — present NULL explicitly (the proportionZTest zero-variance
    // convention) instead of relying on both engines' NaN behavior
    tot.crossJoin(rc).select(col("n"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Zipf-law slope of the token frequency distribution — the corpus
    * health diagnostic LLM pipelines run on every ingest: natural text
    * follows freq ∝ rank^(−α) with α ≈ 1; a slope far from −1 flags
    * template spam (too steep — a few tokens dominate) or synthetic
    * noise (too flat). OLS of ln(freq) on ln(rank) over the top
    * `topK` tokens (ties rank by token ascending, so the fit is
    * deterministic): slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²).
    *
    * Cross-engine arithmetic: per-row transcendental terms (x, y, xy,
    * x²) quantize onto the 1e-9 grid and sum as exact integers (the
    * mutualInformation discipline — ln parity is the only float
    * dependence, shared with every NLL/BM25 mirror); the closing slope
    * division happens once in double. Scale shape: one wordcount
    * aggregate, top-K = TakeOrderedAndProject, the fit over K rows.
    * Returns one row: (n_tokens, slope rounded 6, intercept rounded 6). */
  def zipfSlope(docs: DataFrame, textCol: String = "text",
      topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 2, s"zipfSlope needs topK >= 2, got $topK")
    val counts = docs
      .select(explode(TokenOps.tokenize(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topK)
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token"))))
    def grid(c: Column) = round(c * lit(1e9)).cast("long")
    val x = log(col("rank").cast("double"))
    val y = log(col("freq").cast("double"))
    val terms = ranked.select(
      grid(x).as("gx"), grid(y).as("gy"),
      grid(x * y).as("gxy"), grid(x * x).as("gxx"))
    terms
      .agg(count(lit(1)).as("n"), sum(col("gx")).as("sx"),
        sum(col("gy")).as("sy"), sum(col("gxy")).as("sxy"),
        sum(col("gxx")).as("sxx"))
      .select(col("n").as("n_tokens"),
        round((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double") / lit(1e9)) /
          (col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") / lit(1e9)),
          6).as("slope"),
        // association pinned as slope * (sx/n) — the mirror's exact
        // IEEE tree (the long sums exceed 2^53 after multiplication,
        // so a 1-ulp association difference could flip the 6dp round)
        round((col("sy").cast("double") / col("n").cast("double") -
            ((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double") / lit(1e9)) /
             (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double") / lit(1e9)))
            * (col("sx").cast("double") / col("n").cast("double"))) / lit(1e9),
          6).as("intercept"))
  }

  /** Binned text-length histogram (the `preprocessing.py:78,137` chart
    * input, computed in-engine instead of sampling to pandas): ONE hash
    * aggregation to ≤ clampLen/binWidth + 1 rows at any corpus size —
    * lengths clamp into the last bin so a single outlier document can't
    * blow up the bin count. Null text is EXCLUDED (Spark's `least` skips
    * nulls, which would otherwise count null rows as clamp-length
    * documents). Oracle-checked as `q_length_histogram`. */
  /** k-anonymity audit over a quasi-identifier tuple: every QI group
    * with fewer than `k` members — the re-identification risk readout a
    * governance review runs before a corpus ships (a (lang, source,
    * length-band) combination held by one document can identify its
    * author even after PII redaction). One wordcount-shaped reduce to
    * QI-group cells, then a cell-sized filter; returns the violating
    * groups with their sizes, smallest first. */
  def kAnonymityViolations(df: DataFrame, quasiIds: Seq[Column],
      k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k-anonymity below 2 is vacuous, got $k")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  def lengthHistogram(df: DataFrame, textCol: String = "text",
      binWidth: Int = 5, clampLen: Int = 300): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(least(length(col(textCol)), lit(clampLen)).cast("int").as("len"))
      .groupBy((floor(col("len") / binWidth).cast("int") * binWidth)
        .as("bin_start"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bin_start"))

  /** Five-number text-length summary (`preprocessing.py:73,131`'s
    * boxplot input) — ONE aggregation row, quartiles via
    * percentile_approx (the sketch; exact quartiles would sort the
    * corpus). Empty input yields one all-null row (Spark global-agg
    * semantics) — callers collecting it must check. */
  def lengthSummary(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(length(col(textCol)).cast("double").as("len"))
      .agg(min(col("len")).as("min"),
        percentile_approx(col("len"), lit(0.25), lit(10000)).as("q1"),
        percentile_approx(col("len"), lit(0.5), lit(10000)).as("median"),
        percentile_approx(col("len"), lit(0.75), lit(10000)).as("q3"),
        max(col("len")).as("max"))

  /** Benford first-digit audit of a positive money column: observed vs
    * expected leading-digit frequency — the standard fabricated-data /
    * broken-ingest screen (synthetic or truncated amounts flatten the
    * log-law; natural multiplicative data follows it). The leading digit
    * comes from the EXACT cents integer's decimal string — never from
    * floor(log10(x)), whose 1-ulp libm wobble at exact powers of ten
    * flips the digit on one engine and not the other. One digit-keyed
    * aggregate (≤9 groups, map-side combined) plus a 9-row window for
    * the total; expected freq log10(1+1/d) is a 9-value table whose
    * round-6 images sit far from .5e-6 boundaries (verified), so the
    * in-engine log10 is cross-engine safe AFTER rounding. */
  def benfordDigits(df: DataFrame, amount: Column): DataFrame = {
    val c = graft.functions.Money.cents(amount)
    df.filter(c > 0)
      .groupBy(substring(c.cast("string"), 1, 1).cast("long").as("digit"))
      .agg(count(lit(1)).as("n"))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy()).cast("double"), 6)
          .as("obs_freq"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("exp_freq"))
  }
}
