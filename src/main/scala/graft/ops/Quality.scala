package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the pre-ingest gate every production
  * pipeline runs before admitting a batch (null keys, duplicate keys,
  * domain violations, broken foreign keys, out-of-range measures): each
  * constraint yields one row `(check_name, n_violations, n_checked)`,
  * and a batch is admitted iff every `n_violations` is 0.
  *
  * Scale shape: all ROW-LOCAL checks (not-null, range, set-membership,
  * arbitrary predicates) fuse into ONE aggregation pass over the table —
  * a single scan with map-side partials, however many checks ride on it.
  * Set-level checks cost what they must: uniqueness is one keyed
  * aggregation (count keys seen twice), a foreign key is one left-anti
  * join against the referenced keys (hash/broadcast by size, orphans
  * counted — never a full materialization). The result is a handful of
  * 1-to-few-row frames unioned driver-free.
  */
object Quality {

  /** A row-local constraint: `ok` must evaluate true for the row to
    * pass; NULL counts as a violation (three-valued logic is exactly the
    * trap these audits exist to catch). */
  final case class RowCheck(name: String, ok: Column)

  def notNull(name: String, c: Column): RowCheck = RowCheck(name, c.isNotNull)
  def inRange(name: String, c: Column, lo: Column, hi: Column): RowCheck =
    RowCheck(name, c.isNotNull && c >= lo && c <= hi)
  def inSet(name: String, c: Column, values: Seq[Any]): RowCheck =
    RowCheck(name, c.isin(values: _*))

  /** All row-local checks in ONE pass: each check contributes
    * `sum(ok fails → 1)` to the same aggregation. */
  def rowAudit(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowAudit needs at least one check")
    val total = count(lit(1))
    val aggs = checks.map(ch =>
      sum(when(coalesce(ch.ok, lit(false)), 0L).otherwise(1L)).as(ch.name)) :+
      total.as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single result row into (check_name, n_violations, n_checked)
    val stacked = checks.map(ch =>
      // backticks: check names are dotted (table.column.kind) and a bare
      // col() would parse the dots as nested-field access
      struct(lit(ch.name).as("check_name"),
        col("`" + ch.name + "`").as("n_violations"),
        col("__n").as("n_checked")))
    one.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check_name"), col("r.n_violations"), col("r.n_checked"))
  }

  /** Uniqueness of `keyCols`: n_violations = number of rows carrying a
    * key that occurs more than once (so a clean table scores 0 and a
    * fully-duplicated key of multiplicity m scores m). One keyed
    * aggregation + one tiny final aggregation. */
  def uniqueAudit(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame = {
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__m"))
      .agg(coalesce(sum(when(col("__m") > 1, col("__m")).otherwise(0L)),
        lit(0L)).as("n_violations"),
        coalesce(sum(col("__m")), lit(0L)).as("n_checked"))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))
  }

  /** Referential integrity: rows of `df` whose `fkCol` has no match in
    * `ref.refCol` (NULL fks are orphans too — use a separate notNull
    * check to distinguish). One left-anti join, strategy left to the
    * planner. */
  def fkAudit(df: DataFrame, name: String, fkCol: String, ref: DataFrame,
      refCol: String): DataFrame = {
    // n_checked rides as a broadcast 1-row aggregate (the q04 watermark
    // shape) — no driver action, the audit stays a lazy single plan
    val n = df.agg(count(lit(1)).as("n_checked"))
    df.join(ref.select(col(refCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .join(broadcast(n))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))
  }

  /** Union audit reports into the admission gate's single frame. */
  def report(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "report needs at least one audit")
    parts.reduce(_ unionAll _).orderBy("check_name")
  }

  // -- Fused audits: one pass per table, however many checks ------------

  /** ONE keyed pass over `df`: per-key multiplicity (`__m`) plus per-key
    * row-check violation partials — the shared input that fuses what
    * [[rowAudit]] + [[uniqueAudit]] + [[fkAudit]]'s reference side would
    * otherwise compute in three separate scans. Feed the SAME returned
    * frame to [[keyedReport]] and (as `refKeys`) to [[fkRowAudit]]:
    * identical subtrees let Catalyst reuse the keyed exchange across
    * the consumers, so the table is scanned and shuffled once
    * (tools/Q98Probe A/B: the four-branch q98 audit dropped 0.50 →
    * 0.11 s at sf0.1 under this fusion, byte-identical report). */
  def keyedPass(df: DataFrame, keyCols: Seq[String],
      checks: Seq[RowCheck]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("__m"),
      checks.map(ch => sum(when(coalesce(ch.ok, lit(false)), 0L)
        .otherwise(1L)).as(ch.name)): _*)

  /** Fold a [[keyedPass]] frame into report rows: one uniqueness row
    * (violations = rows carrying a key seen more than once — the
    * [[uniqueAudit]] contract) plus one row per row-local check. */
  def keyedReport(keyed: DataFrame, uniqueName: String,
      checks: Seq[RowCheck]): DataFrame = {
    val agg = keyed.agg(
      coalesce(sum(col("__m")), lit(0L)).as("__n"),
      (coalesce(sum(when(col("__m") > 1, col("__m")).otherwise(0L)), lit(0L))
        .as(uniqueName) +:
        checks.map(ch => coalesce(sum(col("`" + ch.name + "`")), lit(0L))
          .as(ch.name))): _*)
    val rows = (uniqueName +: checks.map(_.name)).map(n =>
      struct(lit(n).as("check_name"),
        col("`" + n + "`").as("n_violations"),
        col("__n").as("n_checked")))
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.n_violations"), col("r.n_checked"))
  }

  /** Referential integrity + row-local checks in ONE pass over `df`: a
    * left join against the (already-distinct) `refKeys` frame — pass a
    * [[keyedPass]] result to share its exchange — then every count in
    * the same conditional aggregation. Orphan semantics match
    * [[fkAudit]] exactly (NULL fks are orphans). */
  def fkRowAudit(df: DataFrame, fkName: String, fkCol: String,
      refKeys: DataFrame, refCol: String, checks: Seq[RowCheck]): DataFrame = {
    val ref = refKeys.select(col(refCol).as(fkCol), lit(true).as("__hit"))
    val agg = df.join(ref, Seq(fkCol), "left")
      .agg(count(lit(1)).as("__n"),
        (sum(when(col("__hit").isNull, 1L).otherwise(0L)).as(fkName) +:
          checks.map(ch => sum(when(coalesce(ch.ok, lit(false)), 0L)
            .otherwise(1L)).as(ch.name))): _*)
    val rows = (fkName +: checks.map(_.name)).map(n =>
      struct(lit(n).as("check_name"),
        col("`" + n + "`").as("n_violations"),
        col("__n").as("n_checked")))
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.n_violations"), col("r.n_checked"))
  }

  /** K-ANONYMITY audit over a quasi-identifier combination — the
    * re-identification risk histogram a privacy review runs before a
    * table (or a training corpus's metadata) is shared: group by the
    * quasi-identifiers, then histogram the GROUP SIZES. A row whose QI
    * group has fewer than `k` members is re-identifiable to within
    * that group; `at_risk` marks those size classes, and
    * `Σ group_n·n_groups` over at-risk rows is the exposed row count.
    * Returns (group_n, n_groups, at_risk), ordered by group_n.
    *
    * Scale shape: one keyed aggregation over the table (map-side
    * partials), then a second aggregation over the GROUP-size relation
    * (|groups| rows, shrinks by orders of magnitude) — the histogram
    * never touches base rows twice. Generalization loops (re-bucket a
    * QI until the audit passes) re-run only this. */
  def kAnonymity(df: DataFrame, qiCols: Seq[Column], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols: _*).agg(count(lit(1)).as("__m"))
      .groupBy(col("__m").as("group_n"))
      .agg(count(lit(1)).as("n_groups"))
      .withColumn("at_risk", col("group_n") < k)
      .select(col("group_n"), col("n_groups"), col("at_risk"))
  }

  /** BENFORD first-digit audit — the classic fabricated-data /
    * unit-mixing screen for naturally-occurring amounts (prices,
    * populations, transaction totals follow P(d) = log10(1 + 1/d);
    * uniform or hand-typed data does not): histogram the first
    * significant digit and report each digit's observed share against
    * the Benford expectation, everything in parts-per-million integer
    * arithmetic so the audit is bit-reproducible and SQL-replayable —
    * no floating logs at query time (the expectation is a fixed
    * 9-row constant table, ppm-rounded once here).
    *
    * First digit extraction is log-free too: the value is fixed to
    * cents (`floor(v·100 + 0.5)`, the q132 quantizer), and the
    * leading digit read off the integer's decimal rendering — exact
    * and engine-identical where `pow/log10` round trips are not.
    * Non-positive and NULL values are excluded (Benford is defined on
    * positive magnitudes). One aggregation over the data + a
    * broadcast 1-row total + a broadcast 9-row constant join. */
  def benfordAudit(df: DataFrame, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ppm-rounded log10(1 + 1/d), d = 1..9
    val expected = Seq((1L, 301030L), (2L, 176091L), (3L, 124939L),
      (4L, 96910L), (5L, 79181L), (6L, 66947L), (7L, 57992L),
      (8L, 51153L), (9L, 45757L)).toDF("digit", "benford_x1e6")
    val digits = df.select(floor(valueCol * 100 + 0.5).cast("long").as("c"))
      .filter(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
    val total = digits.agg(count(lit(1)).as("__n"))
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .join(broadcast(expected), "digit")
      .select(col("digit"), col("n"),
        expr("n * 1000000 div __n").as("pct_x1e6"),
        col("benford_x1e6"),
        abs(expr("n * 1000000 div __n") - col("benford_x1e6")).as("dev_x1e6"))
  }

  /** L-DIVERSITY audit — [[kAnonymity]]'s companion against homogeneity
    * attacks: a QI group can be large (k-anonymous) yet expose its
    * members anyway when every member shares the same SENSITIVE value
    * (group size 50, all 50 rows "diagnosis = X" → membership reveals
    * X). Distinct-l-diversity requires ≥ l distinct sensitive values
    * per group; this histograms the per-group distinct-sensitive
    * counts and flags classes below `l`. Returns
    * (sens_distinct, n_groups, at_risk), ordered.
    *
    * Scale shape: one (QI, sensitive) dedup aggregation (map-side
    * partials absorb repeats), one keyed count over the deduped frame,
    * one tiny histogram agg — base rows touched once, no Expand. */
  def lDiversity(df: DataFrame, qiCols: Seq[Column], sensitiveCol: Column,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "lDiversity needs at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    val named = qiCols.zipWithIndex.map { case (c, i) => c.as(s"__q$i") }
    df.select((named :+ sensitiveCol.as("__s")): _*)
      .dropDuplicates()
      .groupBy(named.indices.map(i => col(s"__q$i")): _*)
      .agg(count(lit(1)).as("__d"))
      .groupBy(col("__d").as("sens_distinct"))
      .agg(count(lit(1)).as("n_groups"))
      .withColumn("at_risk", col("sens_distinct") < l)
      .select(col("sens_distinct"), col("n_groups"), col("at_risk"))
  }

  /** Per-column PROFILING report (the Deequ/Glue-profiler shape — the
    * first pass every new data source gets before anyone writes
    * constraints against it): one row per column with row count, null
    * count, exact distinct count, typed min/max (rendered as strings so
    * heterogeneous columns share one schema), and the modal value with
    * its frequency. [[rowAudit]] answers "does the data satisfy known
    * rules"; profile answers "what rules should exist".
    *
    * Shape: TWO scans total, independent of column count —
    *  1. one fused scalar aggregation (count + per-column null-sum and
    *     TYPED min/max, so numeric columns get numeric extremes, not
    *     lexicographic ones — the cast to string happens AFTER the agg);
    *  2. one row-local stack (explode) of all columns into
    *     (col_name, value-as-string) rows feeding a single
    *     (col_name, value) aggregation with map-side partials — never a
    *     scan per column — then a per-column fold for distinct count and
    *     the mode.
    * Modal tie-break: highest count, then lexicographically LARGEST
    * value (`max(struct(cnt, v))` — deterministic and replayable on any
    * engine). All-NULL columns profile as n_distinct = 0 with a NULL
    * mode. A pathological column where every value is distinct costs
    * |rows| group keys in pass 2 — the same bound any exact distinct
    * count pays; swap in approx_count_distinct upstream if that regime
    * needs profiling at 100 TB. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val scalarAggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val scalarRows = df.agg(scalarAggs.head, scalarAggs.tail: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__min_$c").as("min_s"),
          col(s"__max_$c").as("max_s"))): _*)).as("r"))
      .select(col("r.col_name"), col("r.n_rows"), col("r.n_nulls"),
        col("r.min_s"), col("r.max_s"))
    val groups = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("r"))
      .select(col("r.c").as("col_name"), col("r.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
    val valueStats = groups.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"),
        max(struct(col("cnt"), col("v"))).as("__top"))
      .select(col("col_name"), col("n_distinct"),
        col("__top.v").as("top_value"), col("__top.cnt").as("top_n"))
    // left join: the per-column frame is |cols| rows — broadcast either
    // way; LEFT so an all-NULL column still reports
    scalarRows.join(valueStats, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_s"), col("max_s"), col("top_value"),
        coalesce(col("top_n"), lit(0L)).as("top_n"))
  }

  /** Distribution DRIFT audit between a reference and a current
    * snapshot (train/serve skew, yesterday-vs-today monitoring): per
    * numeric column, row counts, null counts, and an exact scale-free
    * histogram distance
    * `l1x = Σ_bins |c_ref[b]·n_cur − c_cur[b]·n_ref|` — the L1
    * distance of the two distributions cross-multiplied into integers
    * (0 = identical shapes, 2·n_ref·n_cur = disjoint; divide by that
    * to normalize), so the audit is bit-reproducible and
    * SQL-replayable where PSI/KL would drag in floating-point logs.
    * When EITHER snapshot has zero rows for a column (cutoff outside
    * the data range, empty reference) there is nothing to compare and
    * `l1x` is NULL — never 0, which would read as "identical shapes"
    * to an alerting consumer.
    * Bin edges are the q99 equi-width scheme over the JOINT span
    * (shared edges are what make the histograms comparable), with the
    * same degenerate-span and NULL (bin −1, so null-rate drift counts
    * as distribution drift) handling on both engines.
    *
    * Scale shape: columns are stacked row-locally (explode — no
    * per-column scans), ONE tiny min/max agg broadcast back, one
    * (column, bin) agg with map-side combine, one |cols|·(bins+1)-row
    * final fold. Products are accumulated in DECIMAL(38,0): long
    * arithmetic would wrap silently past ~3e9 rows per side. */
  def driftAudit(ref: DataFrame, cur: DataFrame, cols: Seq[String],
      bins: Int = 20): DataFrame = {
    require(cols.nonEmpty, "driftAudit needs at least one column")
    require(bins >= 2, s"need at least 2 bins, got $bins")
    def stack(df: DataFrame, src: Int) =
      df.select(explode(array(cols.map(c =>
          struct(lit(c).as("c"), col(c).cast("double").as("v"))): _*)).as("r"))
        .select(col("r.c").as("c"), col("r.v").as("v"), lit(src).as("src"))
    val u = stack(ref, 0).unionAll(stack(cur, 1))
    // joint spans from COLUMNAR 1-row aggs on each snapshot (not from
    // the stacked relation — that would scan+explode both inputs twice,
    // once for the spans and once for the binning; least/greatest skip
    // NULLs exactly like min/max over the union would)
    def spanAgg(df: DataFrame, tag: String) = {
      val aggs = cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"mn_${tag}_$c"),
        max(col(c).cast("double")).as(s"mx_${tag}_$c")))
      df.agg(aggs.head, aggs.tail: _*)
    }
    val mm = spanAgg(ref, "r").crossJoin(spanAgg(cur, "c"))
      .select(explode(array(cols.map(c => struct(lit(c).as("c"),
        least(col(s"mn_r_$c"), col(s"mn_c_$c")).as("vmin"),
        greatest(col(s"mx_r_$c"), col(s"mx_c_$c")).as("vmax"))): _*)).as("s"))
      .select(col("s.c").as("c"), col("s.vmin").as("vmin"),
        col("s.vmax").as("vmax"))
    val binned = u.join(broadcast(mm), "c")
      .withColumn("bin", when(col("v").isNull, lit(-1L))
        .when(col("vmax") === col("vmin"), lit(0L))
        .otherwise(least(floor((col("v") - col("vmin")) /
            ((col("vmax") - col("vmin")) / lit(bins.toDouble))),
          lit(bins - 1.0)).cast("long")))
    val cells = binned.groupBy(col("c"), col("bin"))
      .agg(sum(when(col("src") === 0, 1L).otherwise(0L)).as("cref"),
        sum(when(col("src") === 1, 1L).otherwise(0L)).as("ccur"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("c"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    cells
      .withColumn("nref", sum(col("cref")).over(w))
      .withColumn("ncur", sum(col("ccur")).over(w))
      .groupBy(col("c"))
      .agg(max(col("nref")).as("n_ref"), max(col("ncur")).as("n_cur"),
        sum(when(col("bin") === -1L, col("cref")).otherwise(0L)).as("nulls_ref"),
        sum(when(col("bin") === -1L, col("ccur")).otherwise(0L)).as("nulls_cur"),
        sum(abs(dec(col("cref")) * dec(col("ncur")) -
          dec(col("ccur")) * dec(col("nref")))).cast("decimal(38,0)").as("l1x"))
      // NULL l1x when either snapshot has zero rows for the column
      // (ADVICE r11): the cross-multiplied sum degenerates to 0 there —
      // every term carries a ×0 factor — and an alerting consumer
      // reading "l1x = 0 means identical shapes" would see no-drift
      // when there is actually nothing to compare. NULL is the honest
      // "incomparable" signal; both engines emit it identically.
      .withColumn("l1x", when(col("n_ref") === 0L || col("n_cur") === 0L,
        lit(null).cast("decimal(38,0)")).otherwise(col("l1x")))
      .select(col("c").as("col_name"), col("n_ref"), col("n_cur"),
        col("nulls_ref"), col("nulls_cur"), col("l1x"))
  }

  /** Key-skew audit — the shuffle-planning diagnostic every 100 TB
    * pipeline needs BEFORE the join/agg that dies on a hot key: the
    * key-count distribution summarized as (n_keys, n_rows,
    * max_share_ppm, Gini as an exact rational). Gini over ascending
    * counts c_1..c_n: G = (2·Σ i·c_i − (n+1)·T) / (n·T) — 0 = uniform,
    * →1 = one key owns everything; returned as (gini_num, gini_den)
    * DECIMAL(38,0), never divided. Tie order between equal counts does
    * not change Σ i·c_i, so the statistic is deterministic regardless
    * of the tie-break.
    *
    * Shape: one keyed count agg (map-side combined — the |rows|→|keys|
    * collapse), then a rank window + single-row fold over the KEYS
    * frame only. The global-order window sorts |keys| rows, not |rows|
    * — fine to ~10⁹ keys; past that, bin counts into a log-scale
    * histogram first (the q117 binning) and compute Gini over bins.
    * Empty input yields one row of NULL diagnostics. */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c"), col(keyCol))
    val agg = counts
      .withColumn("__i", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("__maxc"),
        sum(dec(col("__i")) * dec(col("__c"))).as("__ic"))
    agg.select(col("n_keys"), col("n_rows"),
      when(col("n_rows").isNull, lit(null))
        .otherwise(expr("__maxc * 1000000 div n_rows")).as("max_share_ppm"),
      when(col("n_rows").isNull, lit(null))
        .otherwise(lit(2) * col("__ic") -
          dec(col("n_keys") + 1) * dec(col("n_rows")))
        .cast("decimal(38,0)").as("gini_num"),
      when(col("n_rows").isNull, lit(null))
        .otherwise(dec(col("n_keys")) * dec(col("n_rows")))
        .cast("decimal(38,0)").as("gini_den"))
  }

  /** T-CLOSENESS audit — the third member of the release-readiness
    * family ([[kAnonymity]] group sizes, [[lDiversity]] sensitive
    * variety, HERE sensitive DISTRIBUTION): a group can be large AND
    * varied yet still leak — if its salary distribution skews far from
    * the table's, membership shifts an attacker's posterior. For an
    * ORDERED sensitive attribute the Li et al. distance is the earth
    * mover's distance with unit adjacent-step cost =
    * (1/(m−1))·Σᵢ|prefixᵢ(Q_g − P)| over the m sorted values; carried
    * CROSS-MULTIPLIED (|cum_g·N − cum·n_g| — every term integral, the
    * driftAudit convention) and reported as floor-divided ppm; groups
    * with t_x1e6 > `tX1e6` are flagged. A table with one sensitive
    * value (m = 1) is trivially 0-close.
    *
    * Scale shape: ONE exchange aggregates the fact table to
    * (QI, value) counts; the global distribution, group sizes, and N
    * all derive from that small frame (never a second fact scan); the
    * dense group×value grid is a broadcast cross of the m-row value
    * list (the q81 span-grid shape — linear, not quadratic), and the
    * prefix sums are a window over m rows per group. */
  def tCloseness(df: DataFrame, qiCols: Seq[(String, Column)],
      sensitiveCol: Column, tX1e6: Long): DataFrame = {
    require(qiCols.nonEmpty, "tCloseness needs at least one quasi-identifier")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val named = qiCols.map { case (n, c) => c.as(n) }
    val qis = qiCols.map { case (n, _) => col(n) }
    val counts = df.select((named :+ sensitiveCol.as("__v")): _*)
      .filter(col("__v").isNotNull)
      .groupBy((qis :+ col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // three small-frame consumers, one fact scan
    // N and m ride along the m-row global frame as unpartitioned window
    // aggregates (single-partition over m rows — cheap), so no 1-row
    // scalar frame ever needs a nested-loop cross into the grid
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val global = counts.groupBy(col("__v")).agg(sum(col("__c")).as("__cg"))
      .withColumn("__nn", sum(col("__cg")).over(wAll))
      .withColumn("__m", count(lit(1)).over(wAll))
    val groups = counts.groupBy(qis: _*).agg(sum(col("__c")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qis: _*).orderBy(col("__v"))
    val filled = groups.crossJoin(broadcast(global))
      .join(counts, qiCols.map(_._1) :+ "__v", "left")
      .na.fill(0L, Seq("__c"))
    // the m-th (full) prefix is identically 0 (cum_g·N − cum·n =
    // n·N − N·n), so no rk filter is needed — and an m = 1 table
    // yields __s = 0, i.e. trivially 0-close, in the same pass
    val terms = filled
      .withColumn("__cumg", sum(col("__c")).over(w))
      .withColumn("__cum", sum(col("__cg")).over(w))
      .groupBy((qis ++ Seq(col("n"), col("__nn"), col("__m"))): _*)
      .agg(sum(abs(dec(col("__cumg")) * dec(col("__nn")) -
        dec(col("__cum")) * dec(col("n")))).as("__s"))
    val scored = terms
      .withColumn("__den",
        dec(col("n")) * dec(col("__nn")) * (dec(col("__m")) - 1))
      .withColumn("t_x1e6", when(col("__m") === 1, lit(0L))
        .otherwise(expr("CAST((__s * 1000000) div __den AS BIGINT)")))
    scored.select((qis ++ Seq(col("n"), col("t_x1e6"))): _*)
      .withColumn("at_risk", col("t_x1e6") > tX1e6)
  }
}
