package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-pattern operators: the three shapes that keep a 100 TB pipeline
  * flat — mergeable sketches (pre-aggregate once, combine cheaply at read
  * time), salted two-phase aggregation (skewed keys), and the equi+range
  * interval join (time-proximity correlation without a cross product).
  *
  * Determinism contract as everywhere else: md5-derived integer hashes,
  * decimal accumulation for fractional sums, total ORDER BY — every query
  * here is bit-exact against its DuckDB oracle.
  */
object ScaleOps {

  /** KMV sketch MERGE (the algebra q41 only hints at): build a k-minimum-
    * values distinct-users sketch PER DAY, then derive the global distinct
    * estimate by merging the 30 tiny sketches — union their hash sets,
    * re-take the k minima — without rescanning the raw table. Output: one
    * row per day plus an 'ALL' row, each with the exact count to show the
    * estimate lands close.
    *
    * Scale shape: the raw scan is consumed exactly once by the distinct
    * (day, h) partial+final hash agg; everything after operates on
    * <= days*k sketch rows. At 100 TB this is the nightly pattern — store
    * per-partition sketches, answer "distinct over any date range" by
    * merging k-row sets, never re-reading data. (The exact counts shown
    * for comparison do cost a full distinct; a production rollup would
    * drop them.)
    */
  def q57KmvMerge(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = Queries.events(spark, dir)
      .select(expr(Queries.floorDivSql("ts_us", 86400000000L)).as("day"),
        Kmv.hash60(col("user_id")).as("h"))
      .distinct()
      .localCheckpoint(false)
    // per-day sketch: one map-side-combined ObjectHashAggregate — no window,
    // so a day's distinct set never lands on a single sorting reducer
    val daySk = d.groupBy(col("day"))
      .agg(count(lit(1)).as("nu"), Kmv.sketch(col("h")).as("sk"))
      .localCheckpoint(false)
    val dayRows = daySk
      .select(col("day").cast("string").as("scope"),
        col("nu").as("n_exact"), Kmv.estimate(col("nu"), Kmv.kth(col("sk"))).as("est_users"))
    // merge: re-aggregate the per-day k-min sets with the SAME aggregate —
    // union + re-take k minima is literally kmv_sketch over exploded
    // sketches, the algebra a 100 TB rollup would run over stored sketches
    val merged = daySk.select(explode(col("sk")).as("h"))
      .agg(Kmv.sketch(col("h")).as("sk"))
      .crossJoin(d.agg(countDistinct(col("h")).as("nu")))
      .select(lit("ALL").as("scope"),
        col("nu").as("n_exact"), Kmv.estimate(col("nu"), Kmv.kth(col("sk"))).as("est_users"))
    dayRows.unionByName(merged).orderBy(col("scope"))
  }

  /** Salt fan-out for the two-phase skewed aggregation. */
  private val Salts = 8

  /** Skew-salted two-phase aggregation: l_returnflag has only 3 values, so
    * a direct groupBy at scale lands each flag's entire data on one
    * reducer. Salting splits every flag into [[Salts]] sub-groups
    * (phase 1: partial per (flag, salt)), then combines the tiny partials
    * (phase 2: [[Salts]] rows per flag). The salt here is
    * l_orderkey % 8 — in production it would be pmod(hash(anything), n);
    * the key-derived salt keeps the DuckDB oracle able to replay the
    * identical two-phase plan, and plays the same role (spreading one hot
    * group across reducers). Decimal accumulation keeps both phases exact,
    * so salted == unsalted to the bit.
    */
  def q58SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val partials = Queries.t(spark, dir, "lineitem")
      .withColumn("salt", pmod(col("l_orderkey"), lit(Salts)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("pq"),
        count(lit(1)).as("pn"))
    partials.groupBy(col("l_returnflag"))
      .agg(sum(col("pq")).cast("double").as("sum_qty"),
        sum(col("pn")).as("n_items"),
        count(lit(1)).as("n_salts"))
      .orderBy(col("l_returnflag"))
  }

  /** Salt fanout for the replicated skew join (q84). */
  private val JoinSalts = 8

  /** Salt-replicated skew join (q84): per-nation event rollup through a
    * fact(events)-dim(customer) join executed as [[Skew.saltedJoin]] —
    * the join keys carry (user_id, salt) so a hot user's events spread
    * across [[JoinSalts]] tasks, with the customer side replicated 8x.
    * Results are provably identical to the plain join (every fact row
    * meets its dim match exactly once regardless of salt), which is
    * exactly what the oracle — a plain SQL join — checks. The nation
    * lookup is a true broadcast dim; the value sum is the exact-decimal
    * [[Queries.dsum]].
    */
  def q84SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = Queries.events(spark, dir)
      .select(col("user_id"), col("value"))
    val dim = Queries.t(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    val nation = Queries.t(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    Skew.saltedJoin(fact, dim, "user_id", JoinSalts)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        Queries.dsum(col("value")).as("sum_value"))
      .orderBy(col("n_name"))
  }

  /** Calendar gap-fill + forward-fill (q85): daily rollup of a sparse
    * series (errors of one user) joined onto the continuous day spine of
    * the whole corpus — missing days appear with zero counts and the last
    * known value carried forward. The time-series resampling every
    * metrics pipeline needs; Spark has no native gap-fill, so the spine
    * is `sequence(min_day, max_day)` exploded.
    *
    * Scale: the rollup is a hash-agg over the filtered series; the spine
    * and the ordered forward-fill window operate on DAY-cardinality rows
    * (bounded by the calendar — decades fit in thousands of rows), so the
    * one unpartitioned window is structurally safe at any corpus size.
    */
  def q85GapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Queries.events(spark, dir)
      .withColumn("day", expr(Queries.floorDivSql("ts_us", 86400000000L)))
    val daily = ev
      .filter(col("event_type") === "error" && col("user_id") === 7)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), Queries.dsum(col("value")).as("v"))
    val spine = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    spine.join(daily, Seq("day"), "left")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("filled_value",
        coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0.0)))
      .withColumn("is_gap", col("n").isNull)
      .select("day", "n_events", "filled_value", "is_gap")
      .orderBy(col("day"))
  }

  /** Cumulative distinct users per day (q86) via FIRST-TOUCH attribution:
    * a windowed count(DISTINCT) does not exist in any engine at scale, so
    * the running-distinct curve is computed as min(day) per user (one
    * hash-agg over the corpus) -> new users per day -> running sum over
    * the day-cardinality series. Daily actives come from the standard
    * per-day distinct agg. The only window again runs on calendar-bounded
    * rows.
    */
  def q86CumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Queries.events(spark, dir)
      .withColumn("day", expr(Queries.floorDivSql("ts_us", 86400000000L)))
      .select(col("day"), col("user_id"))
    val newPerDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val activePerDay = ev.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    activePerDay.join(newPerDay, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .select("day", "active_users", "new_users", "cum_users")
      .orderBy(col("day"))
  }

  /** Bin count for the value histogram (q89). */
  private val HistBins = 20

  /** Equal-width histogram of `events.value` (q89) — the profiling
    * primitive behind every "distribution looks wrong" check. Bin edges
    * derive from one global min/max aggregate (a 1-row broadcast); the
    * binning decision is a scan-local projection and the per-bin rollup a
    * [[HistBins]]-row hash-agg. Empty bins are filled from an exploded
    * bin spine so the histogram always has exactly [[HistBins]] rows.
    * All edge arithmetic happens in doubles derived identically in both
    * engines from the same min/width, so bin assignment cannot straddle.
    */
  def q89Histogram(spark: SparkSession, dir: String): DataFrame = {
    // NULL measurements are excluded up front: floor(NULL/width) is NULL
    // and least() SKIPS nulls, which would silently count them in the
    // top bin
    val ev = Queries.events(spark, dir)
      .select(col("value")).filter(col("value").isNotNull)
    val stats = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .withColumn("width", (col("hi") - col("lo")) / HistBins)
    val binned = ev.crossJoin(broadcast(stats))
      // width = 0 (constant column / single row) would make the division
      // NaN in Spark but an error in other engines — pin the degenerate
      // case to bin 0 explicitly
      .withColumn("bin",
        when(col("width") === 0.0, lit(0L))
          .otherwise(least(lit(HistBins - 1L),
            floor((col("value") - col("lo")) / col("width"))))
        .cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), Queries.dsum(col("value")).as("sum_value"))
    val spine = stats.select(explode(expr(s"sequence(0L, ${HistBins - 1}L)")).as("bin"),
      col("lo"), col("width"))
    spine.join(binned, Seq("bin"), "left")
      .select(col("bin"),
        (col("lo") + col("bin") * col("width")).as("bin_lo"),
        (col("lo") + (col("bin") + 1) * col("width")).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("bin"))
  }

  /** Pearson correlation of event value vs hour-of-day per event type
    * (q90) — computed from DECIMAL-EXACT moment sums (n, Σx, Σy, Σxy,
    * Σx², Σy²), not a streaming float accumulator: the built-in `corr`
    * sums doubles in partition order and its result differs between
    * engines (and between runs at different parallelism). Each moment is
    * exact integer/decimal arithmetic (value has 2 decimals, hour is an
    * integer), map-side combined; the one float step derives the
    * coefficient from six exact numbers — bit-identical anywhere.
    *
    * Degenerate groups (n < 2, or zero variance on either side) emit
    * NULL, not 0/0 = NaN. Caveat on the one float step: n·Σx² - (Σx)²
    * cancels catastrophically when the mean dwarfs the variance by more
    * than ~15 significant digits; a corpus in that regime needs the
    * centered two-pass formulation (compute means first, sum squared
    * deviations second) — the moment sums themselves stay the right
    * mergeable shape either way.
    */
  def q90CorrMoments(spark: SparkSession, dir: String): DataFrame = {
    val ev = Queries.events(spark, dir)
      .select(col("event_type"),
        col("value").cast("decimal(18,2)").as("x"),
        expr(s"(${Queries.floorDivSql("ts_us", 3600000000L)} % 24)").as("y"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("varx", expr(
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"))
      .withColumn("vary", expr(
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"))
      .withColumn("corr_xy", expr(
        """CASE WHEN n < 2 OR varx <= 0 OR vary <= 0 THEN NULL
          |ELSE CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |  / (sqrt(varx) * sqrt(vary)) AS DOUBLE) END""".stripMargin))
      .select(col("event_type"), col("n"),
        col("sx").cast("double").as("sum_x"),
        col("sy").cast("long").as("sum_y"),
        col("corr_xy"))
      .orderBy(col("event_type"))
  }

  /** PSI bin count and the week bucket in µs. */
  private val PsiBins = 10
  private val WeekUs = 7L * 86400L * 1000000L

  /** Week-over-week distribution drift per event type (q100): the
    * Population Stability Index between each week's `value` distribution
    * and the previous week's, over [[PsiBins]] fixed-width bins shared
    * across all weeks of a type (bin edges from the type's GLOBAL
    * min/max, the q89 binning). PSI = Σ_b (p_b - q_b)·ln(p_b/q_b) with
    * Laplace smoothing (+1 per bin), so empty bins never divide by zero
    * and a week's PSI is 0 iff its binned distribution matches the prior
    * week exactly. This is the drift monitor a production pipeline runs
    * continuously: PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 broken.
    *
    * Scale shape: one map-side-combined census to (type, week, bin) —
    * everything after is week-count-sized (a self-join of weekly totals
    * on week+1 and a 10-bin spine). Determinism: the per-bin PSI terms
    * round to integer NANO units before the bigint sum (q77/q95's
    * precedent), and the smoothed proportions are derived from integer
    * counts with the expression text mirrored verbatim in the oracle.
    */
  def q100DriftPsi(spark: SparkSession, dir: String): DataFrame = {
    val ev = Queries.events(spark, dir)
      .filter(col("value").isNotNull)
      .withColumn("week", expr(Queries.floorDivSql("ts_us", WeekUs)))
      .select("event_type", "week", "value")
    val stats = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .withColumn("width", (col("hi") - col("lo")) / PsiBins)
    // the census is the ONE corpus-sized pass and it has three consumers
    // (weekly totals, prev-week counts, current-week counts) — materialize
    // the post-agg (type, week, bin) frame (tiny: |types|·|weeks|·10 rows)
    // so the events scan runs once, not three times
    val binned = ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("bin",
        when(col("width") === 0.0, lit(0L))
          .otherwise(least(lit(PsiBins - 1L),
            floor((col("value") - col("lo")) / col("width"))))
          .cast("long"))
      .groupBy(col("event_type"), col("week"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val totals = binned.groupBy(col("event_type"), col("week")).agg(sum(col("c")).as("n"))
    val pairs = totals.as("a").join(totals.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.week") + 1 === col("b.week"))
      .select(col("a.event_type").as("event_type"), col("a.week").as("wprev"),
        col("b.week").as("week"), col("a.n").as("nq"), col("b.n").as("np"))
    val spine = pairs.select(col("event_type"), col("wprev"), col("week"),
      col("nq"), col("np"),
      explode(expr(s"sequence(0L, ${PsiBins - 1}L)")).as("bin"))
    val bq = binned.select(col("event_type"), col("week").as("wprev"),
      col("bin"), col("c").as("cq"))
    val bp = binned.select(col("event_type"), col("week"),
      col("bin"), col("c").as("cp"))
    spine.join(bq, Seq("event_type", "wprev", "bin"), "left")
      .join(bp, Seq("event_type", "week", "bin"), "left")
      .withColumn("nano", expr(
        s"""CAST(round(
           |  ((coalesce(cp, 0) + CAST(1 AS DOUBLE)) / (np + $PsiBins)
           |   - (coalesce(cq, 0) + CAST(1 AS DOUBLE)) / (nq + $PsiBins))
           |  * ln(((coalesce(cp, 0) + CAST(1 AS DOUBLE)) / (np + $PsiBins))
           |       / ((coalesce(cq, 0) + CAST(1 AS DOUBLE)) / (nq + $PsiBins)))
           |  * 1000000000) AS BIGINT)""".stripMargin))
      .groupBy(col("event_type"), col("week"))
      .agg(sum(col("nano")).as("nano"))
      .withColumn("psi", round(col("nano").cast("double") / 1e9, 6))
      .select("event_type", "week", "psi")
      .orderBy(col("event_type"), col("week"))
  }

  /** Session gap for explicit sessionization (30 minutes in µs). */
  private[graft] val SessionGapUs = 1800000000L

  /** Explicit session-id assignment (q91) — the event-level complement of
    * q16's session-window AGGREGATE: every event gets its user-relative
    * session sequence number (new session when the gap to the previous
    * event exceeds [[SessionGapUs]]), the label downstream joins hang off.
    * The lag + running-sum-of-boundaries pattern; both windows partition
    * by user and order by (ts, event_id) — per-user cardinality is
    * bounded by one user's activity, the standard analytic-window shape
    * (q07), never a global or per-corpus partition.
    */
  def q91SessionIds(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Queries.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("user_id", "event_id", "ts_us", "session_seq")
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  /** Sessionized conversion rates (q161): q91's session labeling rolled
    * into the product-analytics question it exists to answer — do longer
    * sessions convert more? Each (user, session) collapses to its event
    * count and a purchased-flag, then sessions roll up by power-of-two
    * length bucket (exact bit-length, the q155 recipe — never float
    * log2) with the conversion rate per bucket. The session window is
    * q91's per-user analytic shape (bounded by one user's activity);
    * everything after is two hash aggs, the second on <=7 keys.
    */
  def q161SessionConversion(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Queries.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      .withColumn("bucket", expr("CAST(length(bin(n_events)) - 1 AS BIGINT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("converted")).as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") / col("n_sessions"), 6))
      .orderBy(col("bucket"))
  }

  /** Conversion window for the interval join (10 minutes in µs). */
  private val ConvWindowUs = 600000000L

  /** Interval join (equi + time-range): for every click that converts,
    * the purchases by the same user within the next 10 minutes and the
    * time-to-first-purchase. The join key is the EQUALITY on user_id —
    * Spark plans a shuffle/sort-merge join on user with the range as a
    * residual predicate, never a cross product. At 100 TB both event
    * streams are bucketed by user_id, making this a co-located join; the
    * range residual filters within each user's (small) event list.
    */
  def q59IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Queries.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_ts_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_ts_us"))
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts_us") >= col("click_ts_us") &&
          col("p_ts_us") < col("click_ts_us") + ConvWindowUs)
      .groupBy(col("click_id"), col("user_id"), col("click_ts_us"))
      .agg(count(lit(1)).as("n_purchases"),
        min(col("p_ts_us") - col("click_ts_us")).as("min_gap_us"))
      .orderBy(col("click_id"))
  }

  /** Count-min sketch geometry: d hash rows x w counters. */
  private val CmsRows = 4
  private val CmsWidth = 1024

  /** Count-min heavy hitters: estimate token frequencies from a d x w
    * counter sketch and report the top-10 exact tokens with their CMS
    * estimates (est >= exact always; the gap is the collision noise the
    * epsilon-delta bound prices). Hash row r positions a token at
    * md5(token + '#' + r) % w — deterministic, so the DuckDB oracle builds
    * the identical sketch.
    *
    * Scale shape: the sketch is d*w integers REGARDLESS of corpus size and
    * merges by elementwise addition — per-partition/per-day sketches
    * combine without rescanning, the same store-sketches-not-data story as
    * q57. Building it is one narrow pass: explode -> (row, pos) hash-agg
    * with map-side combine; estimating is a broadcast lookup of d cells
    * per queried token.
    */
  def q60CountMin(spark: SparkSession, dir: String): DataFrame = {
    val counts = Queries.t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("exact"))
      .localCheckpoint(false)
    def pos(r: Int) =
      pmod(conv(substring(md5(concat_ws("#", col("token"), lit(r))), 1, 8), 16, 10)
        .cast("long"), lit(CmsWidth))
    val cells = counts.select((col("exact") +:
      (0 until CmsRows).map(r => pos(r).as(s"p$r"))): _*)
    val cms = cells.select(col("exact"),
        posexplode(array((0 until CmsRows).map(r => col(s"p$r")): _*)).as(Seq("r", "p")))
      .groupBy(col("r"), col("p")).agg(sum(col("exact")).as("cnt"))
    val top = counts
      .orderBy(col("exact").desc, col("token")).limit(10)
    top.select((col("token") +: col("exact") +:
        (0 until CmsRows).map(r => pos(r).as(s"p$r"))): _*)
      .select(col("token"), col("exact"),
        posexplode(array((0 until CmsRows).map(r => col(s"p$r")): _*)).as(Seq("r", "p")))
      .join(broadcast(cms), Seq("r", "p"))
      .groupBy(col("token"), col("exact"))
      .agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("exact").desc, col("token"))
  }

  /** Ordered-sequence funnel (MATCH_RECOGNIZE-lite): per user, the
    * click -> view -> purchase progression where each stage must happen
    * STRICTLY AFTER the previous one; reports how many users reach each
    * stage. One hash-agg computes every user's first-click ts, the
    * first view after that click, and the first purchase after that view
    * (conditional mins over the SAME pass — no joins, no window sort);
    * the tiny per-user stage table aggregates to three counters. At
    * 100 TB this is one shuffle on user_id with map-side combine —
    * the standard funnel shape.
    */
  def q65Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Queries.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_u"), col("ts_us").as("v_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_u"), col("ts_us").as("p_ts"))
    val stages = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click", col("ts_us"))).as("t1"))
      .join(views, col("v_u") === col("user_id") && col("v_ts") > col("t1"), "left")
      .groupBy(col("user_id"), col("t1"))
      .agg(min(col("v_ts")).as("t2"))
      .join(purchases, col("p_u") === col("user_id") && col("p_ts") > col("t2"), "left")
      .groupBy(col("user_id"), col("t1"), col("t2"))
      .agg(min(col("p_ts")).as("t3"))
    stages.agg(
        count(col("t1")).as("n_click"),
        count(col("t2")).as("n_click_view"),
        count(col("t3")).as("n_click_view_purchase"))
  }

  /** Cohort retention: users grouped by their FIRST-seen day; for each
    * cohort, how many return in any later day-window 1..3. First-seen day
    * is one hash-agg; retention flags are conditional maxes over the same
    * (user x day) activity set joined back to the cohort — the shuffle
    * unit is the distinct (user, day) pair, never raw events.
    */
  def q66Retention(spark: SparkSession, dir: String): DataFrame = {
    val act = Queries.events(spark, dir)
      .select(col("user_id"),
        expr(Queries.floorDivSql("ts_us", 86400000000L)).as("day"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    act.join(first, "user_id")
      .groupBy(col("user_id"), col("d0"))
      .agg(
        max(when(col("day") === col("d0") + 1, 1).otherwise(0)).as("r1"),
        max(when(col("day") === col("d0") + 2, 1).otherwise(0)).as("r2"),
        max(when(col("day") === col("d0") + 3, 1).otherwise(0)).as("r3"))
      .groupBy(col("d0").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r1")).as("retained_d1"),
        sum(col("r2")).as("retained_d2"),
        sum(col("r3")).as("retained_d3"))
      .orderBy(col("cohort_day"))
  }

  /** Bloom sizing for q74: m ≈ 10·n_keys bits (with 5 hashes ≈ 1% FP at
    * any SF), floored at 64 Kbit and capped at 1 Gbit (a 128 MB broadcast —
    * beyond that the filter should shard or the join should just shuffle).
    * Round 3 hardcoded 64 Kbit, which silently saturated — zero pruning,
    * pure overhead — once the build side grew ~100x past bench scale.
    */
  private[graft] def sizedBloomBits(nKeys: Long): Int = {
    val want = 10L * math.max(nKeys, 1L)
    val clamped = math.min(math.max(want, 1L << 16), 1L << 30)
    ((clamped + 7L) & ~7L).toInt
  }
  private[graft] val BloomHashes = 5

  /** Bloom-probe filter over `hash` with the one-row bitset aggregate
    * `bloomAgg` attached as a SCALAR SUBQUERY (Spark's own SPARK-32268
    * runtime-filter shape). The former `join(broadcast(bloomAgg))` form made
    * codegen fetch the bitset from the build-side row for EVERY probed row —
    * `UnsafeRow.getBinary` copies the array, so an m-bit filter cost m/8
    * bytes of memcpy per row (measured 2.0 s -> 0.5 s on q74 at sf0.1). As a
    * subquery result the bitset is a per-task constant reference.
    */
  private[graft] def bloomProbe(bloomAgg: DataFrame, hash: org.apache.spark.sql.Column,
      hashes: Int = BloomHashes): org.apache.spark.sql.Column =
    // the one-row bitset is pinned BEFORE .scalar(): constraint
    // propagation can host the subquery at several plan sites (3 in the
    // committed q74 plan) and ReuseSubquery does not always collapse
    // them — each copy would re-run the whole bloom-build pipeline
    // (advice finding). Checkpointed, every copy scans one cached row.
    call_function("bloom_might_contain",
      bloomAgg.localCheckpoint(true).scalar(), hash, lit(hashes))

  /** Explicit runtime-filter join (the 100 TB join-pruning pattern, made
    * first-class): build a [[graft.functions.BloomBuild]] filter over the
    * SELECTIVE dim side's join keys (urgent finished orders, ~2% of
    * orders), attach the one-row bitset as a scalar subquery, and prune the
    * fact scan with the codegen'd [[graft.functions.BloomMightContain]]
    * probe BEFORE the join's shuffle — so ~98% of lineitem never crosses
    * the wire. False
    * positives pass the probe but die in the exact join that follows, so
    * the result is identical to the plain join (which is exactly what the
    * oracle runs). Spark's `injectRuntimeFilter` applies this trick
    * opportunistically under AQE; owning the filter makes it deterministic,
    * reusable (the bytes can be persisted and shipped to OTHER jobs over
    * the same keys), and plan-testable ([[graft.PlanContractSpec]]).
    */
  def q74BloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // The filtered dim (~2% of orders) is materialized ONCE up front: the
    // filter width must be a plan-time literal, so sizing from the actual
    // build cardinality inherently costs one job at construction — but the
    // checkpoint means that single scan feeds the count, the bloom build,
    // AND the exact join, instead of re-scanning orders three times.
    // (Callers constructing-but-never-running this query still pay that
    // one dim-sized job; documented trade for a deterministic filter.)
    val dim = Queries.t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
      .localCheckpoint(true)
    val bloomBits = sizedBloomBits(dim.count())
    val bloom = dim.agg(
      expr(s"bloom_build(xxhash64(o_orderkey), $bloomBits, $BloomHashes)").as("bf"))
    val pruned = Queries.t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(bloomProbe(bloom, xxhash64(col("l_orderkey"))))
    pruned.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy(col("month"))
  }

  /** Event-transition matrix with per-state top-k: for each event type, the
    * 3 most common IMMEDIATELY-FOLLOWING event types (the Markov-chain view
    * of user journeys — "what do users do after a `click`").
    *
    * Two windows could do this; only one survives scale. The per-user
    * `lead` window is bounded by a single user's history — fine. The
    * per-prev-event ranking window is NOT (an event type's transition list
    * is corpus-sized), so the ranking runs as
    * [[graft.functions.TopKBy]] — the mergeable bounded-heap aggregate:
    * partials keep <= k entries per group per partition, the shuffle
    * carries k-entry buffers, no group ever sorts on one reducer. That is
    * the q55 two-phase top-k move packaged as a reusable one-call
    * primitive (and the same ObjectHashAggregate contract as `latest_row`
    * / `kmv_sketch`).
    */
  def q75Transitions(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Queries.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("next_event", lead(col("event_type"), 1).over(w))
      .filter(col("next_event").isNotNull)
      .groupBy(col("event_type").as("prev_event"), col("next_event"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("prev_event"))
      .agg(expr("top_k_by(next_event, cnt, 3)").as("top"))
      .select(col("prev_event"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("prev_event"), (col("pos") + 1).cast("long").as("rank"),
        col("e.v").as("next_event"), col("e.c").as("cnt"))
      .orderBy(col("prev_event"), col("rank"))
  }

  // ------------------------------------------------------------------
  // q106: bottom-k hash-sample quantiles (mergeable, oracle-exact)
  // ------------------------------------------------------------------

  /** Sample size for q106 — error is O(1/sqrt(k)) per quantile. */
  private val SampleK = 64

  /** Per-source length quantiles from a bottom-k-by-hash sample — the
    * quantile estimator that survives 100 TB. Exact per-group percentiles
    * (q27) materialize every value of a group on one reducer;
    * `approx_percentile`'s sketch is engine-internal (no cross-engine
    * oracle). The middle path: keep each group's k rows with the SMALLEST
    * md5(doc_id) — a uniform sample without replacement that is
    * deterministic, restart-stable, and MERGEABLE (the k smallest of a
    * union are the k smallest of the parts' k-smallest — the KMV synopsis
    * property, here carrying payload values), then read discrete quantiles
    * off the sorted sample.
    *
    * Scale shape: the sample rides [[graft.functions.TopKBy]] (key = -h),
    * so every partition reduces each group to <= k entries before the
    * shuffle and no group ever sorts its full row set on one reducer —
    * same contract as q75. The quantile extraction is array arithmetic on
    * k-element arrays, one row per group. Determinism: quantile values are
    * SELECTED sample elements (exact integers), never interpolated doubles;
    * the oracle reproduces the identical sample via row_number over the
    * same 60-bit hash.
    */
  def q106SampleQuantiles(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    def pick(q: Double) =
      expr(s"element_at(vals, greatest(1, CAST(ceil($q * size(vals)) AS INT)))")
    Queries.t(spark, dir, "documents")
      .select(col("source"), col("n_chars"),
        expr("md5_prefix64(CAST(doc_id AS STRING))").as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr(s"top_k_by(CAST(n_chars AS STRING), -h, $SampleK)").as("smp"))
      .withColumn("vals",
        expr("array_sort(transform(smp, x -> CAST(x.v AS BIGINT)))"))
      .select(col("source"), col("n_docs"),
        size(col("vals")).cast("long").as("sample_n"),
        pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------
  // Oracles
  // ------------------------------------------------------------------

  val oracles: Map[String, String] = Map(
    "q106_sample_quantiles" ->
      s"""WITH h AS (SELECT source, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |r AS (SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY h, CAST(n_chars AS VARCHAR)) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n_docs
        |  FROM h),
        |s AS (SELECT source, n_docs, count(*) AS sample_n,
        |    list(n_chars ORDER BY n_chars) AS vals
        |  FROM r WHERE rn <= $SampleK GROUP BY source, n_docs)
        |SELECT source, n_docs, sample_n,
        |  vals[greatest(1, CAST(ceil(0.5 * sample_n) AS INT))] AS p50,
        |  vals[greatest(1, CAST(ceil(0.9 * sample_n) AS INT))] AS p90,
        |  vals[greatest(1, CAST(ceil(0.99 * sample_n) AS INT))] AS p99
        |FROM s ORDER BY source""".stripMargin,

    "q75_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next_event
        |  FROM events),
        |p AS (SELECT event_type AS prev_event, next_event, count(*) AS cnt
        |  FROM s WHERE next_event IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY prev_event
        |    ORDER BY cnt DESC, next_event) AS BIGINT) AS rank FROM p)
        |SELECT prev_event, rank, next_event, cnt FROM r WHERE rank <= 3
        |ORDER BY prev_event, rank""".stripMargin,

    "q74_bloom_prune_join" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q57_kmv_merge" ->
      s"""WITH d AS (
         |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
         |    ${Kmv.hash60Sql("user_id")} AS h
         |  FROM events),
         |r AS (
         |  SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn,
         |    count(*) OVER (PARTITION BY day) AS nu
         |  FROM d),
         |sk AS (SELECT * FROM r WHERE rn <= ${Kmv.K}),
         |dayrows AS (
         |  SELECT CAST(day AS VARCHAR) AS scope, CAST(max(nu) AS BIGINT) AS n_exact,
         |    ${Kmv.estimateSql("max(nu)", s"max(CASE WHEN rn = ${Kmv.K} THEN h END)")}
         |      AS est_users
         |  FROM sk GROUP BY day),
         |mr AS (
         |  SELECT h, row_number() OVER (ORDER BY h) AS rn
         |  FROM (SELECT DISTINCT h FROM sk)),
         |merged AS (
         |  SELECT 'ALL' AS scope,
         |    CAST((SELECT count(DISTINCT h) FROM d) AS BIGINT) AS n_exact,
         |    ${Kmv.estimateSql("(SELECT count(DISTINCT h) FROM d)",
                s"(SELECT max(CASE WHEN rn = ${Kmv.K} THEN h END) FROM mr)")}
         |      AS est_users)
         |SELECT scope, n_exact, est_users FROM dayrows
         |UNION ALL SELECT scope, n_exact, est_users FROM merged
         |ORDER BY scope""".stripMargin,

    "q161_session_conversion" ->
      s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |            FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) AS prev_ts FROM ev),
        |s AS (SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > $SessionGapUs
        |                     THEN 1 ELSE 0 END AS is_new FROM l),
        |labeled AS (SELECT user_id, event_type,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM s),
        |sess AS (SELECT user_id, session_seq, count(*) AS n_events,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        |  FROM labeled GROUP BY user_id, session_seq)
        |SELECT CAST(length(bin(n_events)) - 1 AS BIGINT) AS bucket,
        |  count(*) AS n_sessions,
        |  CAST(sum(converted) AS BIGINT) AS n_converted,
        |  round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conv_rate
        |FROM sess GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q91_session_ids" ->
      s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) AS prev_ts FROM ev),
        |s AS (SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > $SessionGapUs
        |                     THEN 1 ELSE 0 END AS is_new FROM l)
        |SELECT user_id, event_id, ts_us,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |FROM s ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q89_histogram" ->
      s"""WITH ev AS (SELECT value FROM events WHERE value IS NOT NULL),
        |stats AS (SELECT min(value) AS lo, max(value) AS hi,
        |          (max(value) - min(value)) / $HistBins AS width FROM ev),
        |binned AS (
        |  SELECT CASE WHEN width = 0 THEN 0
        |         ELSE least(${HistBins - 1}, CAST(floor((value - lo) / width) AS BIGINT))
        |         END AS bin,
        |    count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM ev, stats GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(0, ${HistBins - 1})) AS bin, lo, width
        |          FROM stats)
        |SELECT s.bin, lo + s.bin * width AS bin_lo, lo + (s.bin + 1) * width AS bin_hi,
        |  coalesce(b.n, 0) AS n, coalesce(b.sum_value, 0.0) AS sum_value
        |FROM spine s LEFT JOIN binned b USING (bin) ORDER BY s.bin""".stripMargin,

    "q100_drift_psi" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) // $WeekUs AS week, value
        |            FROM events WHERE value IS NOT NULL),
        |stats AS (SELECT event_type, min(value) AS lo,
        |          (max(value) - min(value)) / $PsiBins AS width
        |          FROM ev GROUP BY event_type),
        |binned AS (SELECT ev.event_type, week,
        |    CASE WHEN width = 0 THEN 0
        |    ELSE least(${PsiBins - 1}, CAST(floor((value - lo) / width) AS BIGINT))
        |    END AS bin,
        |    count(*) AS c
        |  FROM ev JOIN stats USING (event_type) GROUP BY 1, 2, 3),
        |totals AS (SELECT event_type, week, CAST(sum(c) AS BIGINT) AS n
        |           FROM binned GROUP BY 1, 2),
        |pairs AS (SELECT a.event_type, a.week AS wprev, b.week AS week,
        |            a.n AS nq, b.n AS np
        |          FROM totals a JOIN totals b
        |            ON a.event_type = b.event_type AND a.week + 1 = b.week),
        |spine AS (SELECT event_type, wprev, week, nq, np,
        |            unnest(generate_series(0, ${PsiBins - 1})) AS bin FROM pairs),
        |scored AS (SELECT s.event_type, s.week,
        |    CAST(round(
        |      ((COALESCE(bp.c, 0) + CAST(1 AS DOUBLE)) / (np + $PsiBins)
        |       - (COALESCE(bq.c, 0) + CAST(1 AS DOUBLE)) / (nq + $PsiBins))
        |      * ln(((COALESCE(bp.c, 0) + CAST(1 AS DOUBLE)) / (np + $PsiBins))
        |           / ((COALESCE(bq.c, 0) + CAST(1 AS DOUBLE)) / (nq + $PsiBins)))
        |      * 1000000000) AS BIGINT) AS nano
        |  FROM spine s
        |  LEFT JOIN binned bq ON bq.event_type = s.event_type
        |    AND bq.week = s.wprev AND bq.bin = s.bin
        |  LEFT JOIN binned bp ON bp.event_type = s.event_type
        |    AND bp.week = s.week AND bp.bin = s.bin)
        |SELECT event_type, week, round(CAST(sum(nano) AS DOUBLE) / 1e9, 6) AS psi
        |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q90_corr_moments" ->
      """WITH ev AS (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS x,
        |            (epoch_us(ts) // 3600000000) % 24 AS y FROM events),
        |g AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |      sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |      FROM ev GROUP BY event_type),
        |v AS (SELECT *,
        |  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
        |  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
        |FROM g)
        |SELECT event_type, n, CAST(sx AS DOUBLE) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
        |  CASE WHEN n < 2 OR varx <= 0 OR vary <= 0 THEN NULL
        |  ELSE CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(varx) * sqrt(vary)) AS DOUBLE) END AS corr_xy
        |FROM v ORDER BY event_type""".stripMargin,

    "q85_gap_fill" ->
      """WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type, user_id, value
        |           FROM events),
        |daily AS (
        |  SELECT day, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM ev WHERE event_type = 'error' AND user_id = 7 GROUP BY day),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |spine AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b),
        |j AS (SELECT s.day, daily.n, daily.v FROM spine s LEFT JOIN daily USING (day))
        |SELECT day, coalesce(n, 0) AS n_events,
        |  coalesce(last_value(v IGNORE NULLS) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled_value,
        |  n IS NULL AS is_gap
        |FROM j ORDER BY day""".stripMargin,

    "q86_cumulative_users" ->
      """WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |firstday AS (SELECT user_id, min(day) AS day FROM ev GROUP BY user_id),
        |newu AS (SELECT day, count(*) AS new_users FROM firstday GROUP BY day),
        |act AS (SELECT day, count(DISTINCT user_id) AS active_users FROM ev GROUP BY day)
        |SELECT act.day, act.active_users,
        |  coalesce(newu.new_users, 0) AS new_users,
        |  CAST(sum(coalesce(newu.new_users, 0)) OVER (ORDER BY act.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM act LEFT JOIN newu USING (day) ORDER BY act.day""".stripMargin,

    "q84_salted_join" ->
      """SELECT n.n_name, count(*) AS n_events,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q58_salted_agg" ->
      s"""WITH partials AS (
         |  SELECT l_returnflag, l_orderkey % $Salts AS salt,
         |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS pq, count(*) AS pn
         |  FROM lineitem GROUP BY l_returnflag, l_orderkey % $Salts)
         |SELECT l_returnflag, CAST(sum(pq) AS DOUBLE) AS sum_qty,
         |  CAST(sum(pn) AS BIGINT) AS n_items, count(*) AS n_salts
         |FROM partials GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q59_interval_join" ->
      s"""WITH c AS (
         |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us
         |  FROM events WHERE event_type = 'click'),
         |p AS (
         |  SELECT user_id, epoch_us(ts) AS p_ts_us
         |  FROM events WHERE event_type = 'purchase')
         |SELECT click_id, c.user_id, click_ts_us,
         |  count(*) AS n_purchases,
         |  CAST(min(p_ts_us - click_ts_us) AS BIGINT) AS min_gap_us
         |FROM c JOIN p ON c.user_id = p.user_id
         |  AND p_ts_us >= click_ts_us AND p_ts_us < click_ts_us + $ConvWindowUs
         |GROUP BY click_id, c.user_id, click_ts_us
         |ORDER BY click_id""".stripMargin,

    "q65_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'click' THEN ts_us END) AS t1
        |  FROM e GROUP BY user_id),
        |s2 AS (
        |  SELECT s1.user_id, s1.t1, min(v.ts_us) AS t2
        |  FROM s1 LEFT JOIN e v ON v.user_id = s1.user_id
        |    AND v.event_type = 'view' AND v.ts_us > s1.t1
        |  GROUP BY s1.user_id, s1.t1),
        |s3 AS (
        |  SELECT s2.user_id, s2.t1, s2.t2, min(p.ts_us) AS t3
        |  FROM s2 LEFT JOIN e p ON p.user_id = s2.user_id
        |    AND p.event_type = 'purchase' AND p.ts_us > s2.t2
        |  GROUP BY s2.user_id, s2.t1, s2.t2)
        |SELECT count(t1) AS n_click, count(t2) AS n_click_view,
        |  count(t3) AS n_click_view_purchase
        |FROM s3""".stripMargin,

    "q66_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |first AS (SELECT user_id, min(day) AS d0 FROM act GROUP BY user_id),
        |flags AS (
        |  SELECT act.user_id, d0,
        |    max(CASE WHEN day = d0 + 1 THEN 1 ELSE 0 END) AS r1,
        |    max(CASE WHEN day = d0 + 2 THEN 1 ELSE 0 END) AS r2,
        |    max(CASE WHEN day = d0 + 3 THEN 1 ELSE 0 END) AS r3
        |  FROM act JOIN first ON act.user_id = first.user_id
        |  GROUP BY act.user_id, d0)
        |SELECT d0 AS cohort_day, count(*) AS n_users,
        |  CAST(sum(r1) AS BIGINT) AS retained_d1,
        |  CAST(sum(r2) AS BIGINT) AS retained_d2,
        |  CAST(sum(r3) AS BIGINT) AS retained_d3
        |FROM flags GROUP BY d0 ORDER BY cohort_day""".stripMargin,

    "q60_count_min" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |counts AS (SELECT token, count(*) AS exact FROM tok GROUP BY token),
         |rs AS (SELECT unnest([${(0 until CmsRows).mkString(",")}]) AS r),
         |cells AS (
         |  SELECT rs.r,
         |    ('0x' || substr(md5(counts.token || '#' || rs.r), 1, 8))::BIGINT
         |      % $CmsWidth AS p,
         |    sum(counts.exact) AS cnt
         |  FROM counts CROSS JOIN rs GROUP BY 1, 2),
         |top AS (SELECT token, exact FROM counts ORDER BY exact DESC, token LIMIT 10),
         |probe AS (
         |  SELECT top.token, top.exact, rs.r,
         |    ('0x' || substr(md5(top.token || '#' || rs.r), 1, 8))::BIGINT
         |      % $CmsWidth AS p
         |  FROM top CROSS JOIN rs)
         |SELECT probe.token, CAST(probe.exact AS BIGINT) AS exact,
         |  CAST(min(cells.cnt) AS BIGINT) AS cms_est
         |FROM probe JOIN cells ON cells.r = probe.r AND cells.p = probe.p
         |GROUP BY probe.token, probe.exact
         |ORDER BY exact DESC, token""".stripMargin,
  )

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_kmv_merge" -> (q57KmvMerge _),
    "q58_salted_agg" -> (q58SaltedAgg _),
    "q84_salted_join" -> (q84SaltedJoin _),
    "q85_gap_fill" -> (q85GapFill _),
    "q86_cumulative_users" -> (q86CumulativeUsers _),
    "q89_histogram" -> (q89Histogram _),
    "q90_corr_moments" -> (q90CorrMoments _),
    "q91_session_ids" -> (q91SessionIds _),
    "q161_session_conversion" -> (q161SessionConversion _),
    "q100_drift_psi" -> (q100DriftPsi _),
    "q59_interval_join" -> (q59IntervalJoin _),
    "q60_count_min" -> (q60CountMin _),
    "q65_funnel" -> (q65Funnel _),
    "q66_retention" -> (q66Retention _),
    "q74_bloom_prune_join" -> (q74BloomPruneJoin _),
    "q75_transitions" -> (q75Transitions _),
    "q106_sample_quantiles" -> (q106SampleQuantiles _),
  )
}
