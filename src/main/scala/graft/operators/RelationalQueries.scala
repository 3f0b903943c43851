package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish testdata tables:
  * scan-aggregate, multi-way joins (broadcast dims), semi/anti joins, union,
  * dedup-first-wins, rollup, window top-k, sessionization, percentiles and
  * constraint audits — the Spark-first re-expression of the reference's
  * aggregation/join/filter shapes (SURVEY.md §2.3–§2.6: A1–A5, F3–F5,
  * O1–O2, J1–J6).
  *
  * Conventions shared with the DuckDB oracle SQL:
  *  - every float aggregate is `round(...)`-ed so cross-engine summation
  *    order cannot flip the hash compare;
  *  - every top-k has a unique tiebreaker column;
  *  - timestamps in outputs are formatted to strings (second precision).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // A1/A2-shape: TPC-H Q1 pricing summary — scan + filter pushdown + hash agg
  // with map-side partial aggregation (genmock collectStats analog at scale,
  // cmd/genmock/main.go:204-226).
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  // O1/O2-shape: join + group + top-k with deterministic tiebreak.
  def q2TopCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(10)

  // Multi-way join: fact × three broadcast-able dimensions.
  def q3RevenueByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))

  // Semi-join shape (EXISTS).
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  // Join + two-dim grouping.
  def q5SegmentNationRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_mktsegment", "n_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))

  // F3/F4-shape: tight filter + single scalar aggregate (pushdown showcase).
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  // Distinct aggregation.
  def q7DistinctCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"))

  // J2-shape: anti join (customers with no recent orders), aggregated for
  // stability (validator cross-reference, cmd/validate/main.go:298-313).
  def q8CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      // DISTINCT custkeys first: the anti-join side collapses from the
      // orders fact to (a subset of) the customer-key DOMAIN — map-side
      // partial distinct reduces the shuffle to ~partitions × domain,
      // and the result stays broadcastable at ANY fact volume (measured
      // x30 without it: the raw orders side outgrew the broadcast
      // threshold and dragged 1.1M records through a shuffle join).
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))

  // Semi join against a filtered fact, dim-side aggregate.
  def q9SuppliersHeavyItems(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select("l_suppkey").distinct(),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"))

  // J1-shape: unionByName of two typed sources with a role tag.
  def q10PartyUnion(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey").cast("int").as("nationkey"), lit("customer").as("role"))
    val su = t(s, dir, "supplier")
      .select(col("s_nationkey").cast("int").as("nationkey"), lit("supplier").as("role"))
    c.unionByName(su)
      .join(broadcast(t(s, dir, "nation")), col("nationkey") === col("n_nationkey"))
      .groupBy("n_name", "role")
      .agg(count(lit(1)).as("n_parties"))
  }

  // J4-shape: dedup-first-wins with an explicit order (validator apiByID,
  // cmd/validate/main.go:357-391) — first order per customer.
  def q11FirstOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_orderdate"))
  }

  // Hierarchical aggregate: ROLLUP (subtotals + grand total).
  def q12StatusPriorityRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))

  // O2-shape: top-k per group via ranking window.
  def q13TopEventsPerType(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("event_type", "rn", "event_id", "value")
  }

  // P13-at-scale: hourly tumbling bucket aggregation over the event stream
  // table (deriveTimeBucket, reference transform.go:309-315).
  def q14HourlyEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))

  // Exact interpolated percentiles per group.
  def q15ValuePercentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))

  // The scale twin of q15: exact `percentile` keeps the full per-group
  // value multiset in aggregation state (a per-group sort at 100 TB);
  // `percentile_approx` is the GK-style mergeable sketch with bounded
  // state and a published rank guarantee — a single summary returns a
  // value whose rank is within eps*N of p*N for eps = 1/accuracy, and
  // Spark's distributed execution MERGES per-partition summaries, which
  // loosens the bound by up to another eps (merged GK summaries carry
  // the sum of their errors), so the checked bound is 2*eps*N plus one
  // rank of integer slack. DuckDB has no matching sketch, so the gate
  // row encodes the GUARANTEE, not the value: one boolean per
  // percentile, true iff the rank interval spanned by the approx value
  // ([count(<v)+1, count(<=v)]) overlaps [p*N - bound, p*N + bound].
  // The oracle emits literal TRUE per group, so the hash matches iff the
  // bound holds everywhere — a bound assertion routed through the hash
  // gate. n_events rides along as the exact cross-check.
  def q15ApproxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.5, 0.9, 0.99)
    val accuracy = 1000 // eps = 0.001
    // n_events (count(*)) is the exact cross-check column; the rank
    // bound is stated against n_vals = count(value), the non-null count
    // the sketch actually summarizes (percentile_approx ignores NULLs,
    // as do the lt/le rank counts below).
    val approx = t(s, dir, "events")
      .groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(ps.map(lit): _*), lit(accuracy)).as("ap"),
        count(lit(1)).as("n_events"),
        count(col("value")).as("n_vals"))
      .select(col("event_type") +: col("n_events") +: col("n_vals") +:
        ps.indices.map(i => element_at(col("ap"), i + 1).as(s"a$i")): _*)
    val checks = ps.indices.flatMap { i =>
      Seq(sum(when(col("value") < col(s"a$i"), 1L).otherwise(0L)).as(s"lt$i"),
        sum(when(col("value") <= col(s"a$i"), 1L).otherwise(0L)).as(s"le$i"))
    }
    t(s, dir, "events")
      .join(broadcast(approx), "event_type")
      .groupBy(col("event_type"), col("n_events"), col("n_vals"))
      .agg(checks.head, checks.tail: _*)
      .select(col("event_type") +: col("n_events") +:
        ps.zipWithIndex.map { case (p, i) =>
          val bound = lit(2.0 / accuracy) * col("n_vals") + 1
          val lo = lit(p) * col("n_vals") - bound
          val hi = lit(p) * col("n_vals") + bound
          ((col(s"lt$i") + 1 <= hi) && (col(s"le$i") >= lo))
            .as(s"ok${(p * 100).round}")
        }: _*)
  }

  // Sessionization: 30-minute inactivity gap, counted per user (lag window +
  // running flag sum — the classic gap-and-island shape).
  def q16Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  // F5-shape: constraint audit — single row of violation counts (validator
  // phases 2–4, cmd/validate/main.go:257-538). One conditional-aggregation
  // pass per table plus the anti-join count, cross-joined into the result
  // row: no driver-side actions, so the whole audit is a single Spark job
  // (three scans) instead of four.
  def q17Constraints(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val lineitem = t(s, dir, "lineitem")
    val orderAudit = orders.agg(
      coalesce(sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)), lit(0L))
        .as("bad_status"))
    // Pre-aggregate lineitem per orderkey BEFORE the referential
    // anti-join, then sum the per-key counts — row totals preserved.
    // An exact fact×fact referential audit cannot move fewer than
    // ∝|orderkeys| records once the key side outgrows the broadcast
    // threshold (measured: the x10 corpus still broadcasts, x30 key-
    // shuffles both sides once). The partial-count reduction pays off
    // in proportion to input clustering (neutral on the row-scattered
    // fixture, ~items-per-order× on an orderkey-clustered layout), and
    // bucketing both tables by orderkey removes the exchanges entirely
    // at 100 TB — the co-located plan `EventsLayoutSpec` locks for the
    // bucketed fact join.
    val orphanAudit = lineitem
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_items"))
      .join(orders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(coalesce(sum("n_items"), lit(0L)).cast("long")
        .as("orphan_lineitems"))
    val itemAudit = lineitem.agg(
      coalesce(sum(when(col("l_extendedprice") <= 0, 1L)), lit(0L)).as("bad_price"),
      coalesce(sum(when(!col("l_discount").between(0, 1), 1L)), lit(0L)).as("bad_discount"))
    orderAudit.crossJoin(orphanAudit).crossJoin(itemAudit)
      .select("bad_status", "orphan_lineitems", "bad_price", "bad_discount")
  }

  // Statistical aggregates: correlation + sample stddev per group.
  def q18Stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
        round(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"),
        round(avg(col("l_tax")), 4).as("avg_tax"))

  // Multi-dim CUBE over a fact×dimension join (grouping-set machinery),
  // expressed through the spark.sql surface (same semantics reachable from
  // SQL text and the DataFrame API).
  def q19BrandCube(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("graft_q19_lineitem")
    t(s, dir, "part").createOrReplaceTempView("graft_q19_part")
    s.sql(
      """SELECT p_brand, l_returnflag, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS total_price,
        |  round(avg(p_retailprice), 4) AS avg_retail
        |FROM graft_q19_lineitem
        |JOIN graft_q19_part ON l_partkey = p_partkey
        |GROUP BY CUBE (p_brand, l_returnflag)""".stripMargin)
  }

  // Semi-structured extraction: the events props column is a JSON string;
  // pull the "k" field, bucket it, aggregate (from_json-on-string shape).
  // Deliberately NOT Tables.parallel: avg() sums doubles, and a repartition
  // changes the summation order, which can flip the round(.,4) boundary
  // against the oracle (observed at sf0.001). The scan-side JSON parse
  // therefore stays single-task on the local single-row-group parquet; a
  // real multi-file corpus parallelizes by splits without reordering rows
  // within a partition.
  def q20EventProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy((col("k") % 10).as("k_mod"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))

  // Sliding (hopping) windows: 1-hour windows every 15 minutes — each event
  // lands in 4 overlapping buckets (the streaming window() shape, batch).
  def q21SlidingWindows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("w_start"), col("event_type"), col("n"), col("total_value"))

  // Rolling event-time range window: per user, count and mean value over
  // the trailing hour (inclusive bounds both engines).
  def q22RollingUserStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, 0L)
    t(s, dir, "events")
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("avg_1h", round(avg("value").over(w), 4))
      .select("event_id", "user_id", "n_1h", "avg_1h")
  }

  /** Pivot value list — explicit so the plan needs NO distinct-collect
    * pre-pass (`pivot(col)` without values runs a driver-side distinct
    * first; at 100 TB the fixed list keeps pivoting a single pass). */
  val OrderPriorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  // Pivot (wide crosstab): order counts by status × priority through the
  // DataFrame pivot surface; absent cells filled 0 to match the oracle's
  // FILTER counts.
  def q23StatusPriorityPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", OrderPriorities)
      .agg(count(lit(1)))
      .na.fill(0L, OrderPriorities)

  // Native session windows (the streaming-capable session_window operator,
  // batch mode): 30-minute inactivity gap per user, window end = last event
  // + gap. Same gap semantics as q16Sessionize's strict `>` — an event
  // exactly `gap` after its predecessor EXTENDS the session (the window is
  // closed at start+gap); only a strictly larger gap opens a new one —
  // pinned by PivotSessionProfileSpec's exact-gap boundary test
  // (1801 s apart => two sessions; exactly 1800 s => one).
  def q24SessionWindow(s: SparkSession, dir: String): DataFrame =
    sessionWindowAgg(t(s, dir, "events"))

  /** The q24 session aggregation over any (user_id, ts, value) relation —
    * factored out so the STREAMING twin
    * ([[graft.streaming.StreamSessionWindows]]) runs the identical
    * Column expressions over a watermarked stream: same gap semantics
    * (exactly-gap extends, strictly-greater splits), same projection,
    * provably stream ≡ batch in `StreamSessionWindowSpec`. */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("s_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("s_end"),
        col("n_events"), col("total_value"))

  /** Columns profiled by [[profileCategorical]] — the orders enums. */
  private val CatProfileCols = Seq("o_orderstatus", "o_orderpriority")

  /** Single-pass categorical column profiling — the string-column half of
    * the new-table quality sweep: per column, non-null count, distinct
    * count, and the modal value with its frequency. `stack` unpivots the
    * scan once (rows × n_cols, one shuffle by (column, value)); the mode
    * comes from a rank window over the small per-(column, value) rollup,
    * not the raw data. */
  def profileCategorical(s: SparkSession, dir: String): DataFrame = {
    val stacked = CatProfileCols.map(c => s"'$c', $c").mkString(", ")
    val vals = t(s, dir, "orders")
      .selectExpr(s"stack(${CatProfileCols.length}, $stacked) AS (column_name, v)")
      .filter(col("v").isNotNull)
      .groupBy("column_name", "v")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("column_name").orderBy(desc("n"), asc("v"))
    vals
      .withColumn("rk", row_number().over(w))
      .groupBy("column_name")
      .agg(sum("n").cast("long").as("n_nonnull"),
        count(lit(1)).as("n_distinct"),
        max(when(col("rk") === 1, col("v"))).as("top_value"),
        max(when(col("rk") === 1, col("n"))).cast("long").as("top_n"))
  }

  // Explicit GROUPING SETS (beyond q12's ROLLUP and q19's CUBE): two
  // independent one-dimensional rollups plus the grand total in ONE scan —
  // the Expand operator emits each row once per set, so three aggregations
  // cost one shuffle instead of three scans. grouping() flags disambiguate
  // the NULL-keyed rows. Measures are exact integers (count / distinct),
  // immune to summation order.
  def q25GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q25_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  cast(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  cast(grouping(o_orderpriority) AS BIGINT) AS g_priority,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_custs
        |FROM graft_q25_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
        .stripMargin)
  }

  /** [[valueHistogram]] geometry: 25 buckets of width 20 over [0, 500). */
  val HistBuckets = 25
  val HistWidth = 20.0

  /** Fixed-width histogram of events.value — the distribution sweep behind
    * every "does this column look right" check. Bucketing is a per-row
    * projection + one tiny-key aggregation (25 groups), so the map-side
    * partial handles 100 TB with a 25-row shuffle per task. Per-bucket sums
    * are integer cents (`round(value·100)`), not float sums, so the result
    * is independent of partition summation order — the property float
    * `sum()` loses the moment data moves. */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("bucket",
        least(floor(col("value") / HistWidth), lit(HistBuckets - 1.0))
          .cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).cast("long")
          .as("sum_cents"),
        round(min("value"), 2).as("min_v"),
        round(max("value"), 2).as("max_v"))

  /** Columns profiled by [[profileNumeric]] — the lineitem measures. */
  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Single-pass numeric column profiling — the data-quality sweep run
    * before any pipeline trusts a new table drop: per column, non-null
    * count, exact distinct count, min and max. `stack` unpivots to
    * (column_name, v) rows first, then ONE aggregation keyed by
    * column_name produces every statistic — at 100 TB this is one scan,
    * not one scan per column, and the distinct count partial-aggregates
    * on (column_name, v) across executors instead of funneling a
    * zero-key multi-countDistinct through a single reducer. (The
    * unpivot-first shape also keeps the physical plan rendering
    * deterministic: N parallel countDistincts go through
    * RewriteDistinctAggregates, whose Expand gid assignment follows
    * expression-ID map order and so varies with session history —
    * plans.lock needs one canonical plan per query.) */
  def profileNumeric(s: SparkSession, dir: String): DataFrame = {
    val stacked = ProfileCols
      .map(c => s"'$c', cast($c AS double)").mkString(", ")
    t(s, dir, "lineitem")
      .selectExpr(s"stack(${ProfileCols.length}, $stacked) AS (column_name, v)")
      .groupBy(col("column_name"))
      .agg(count(col("v")).as("n_nonnull"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_status_priority_pivot" -> q23StatusPriorityPivot,
    "q24_session_window" -> q24SessionWindow,
    "profile_categorical" -> profileCategorical,
    "value_histogram" -> valueHistogram,
    "q25_grouping_sets" -> q25GroupingSets,
    "profile_numeric" -> profileNumeric,
    "q22_rolling_user_stats" -> q22RollingUserStats,
    "q19_brand_cube" -> q19BrandCube,
    "q20_event_props" -> q20EventProps,
    "q21_sliding_windows" -> q21SlidingWindows,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_top_customers" -> q2TopCustomers,
    "q3_revenue_by_nation" -> q3RevenueByNation,
    "q4_order_priority" -> q4OrderPriority,
    "q5_segment_nation_revenue" -> q5SegmentNationRevenue,
    "q6_forecast" -> q6Forecast,
    "q7_distinct_customers" -> q7DistinctCustomers,
    "q8_customers_without_orders" -> q8CustomersWithoutOrders,
    "q9_suppliers_heavy_items" -> q9SuppliersHeavyItems,
    "q10_party_union" -> q10PartyUnion,
    "q11_first_order_per_customer" -> q11FirstOrderPerCustomer,
    "q12_status_priority_rollup" -> q12StatusPriorityRollup,
    "q13_top_events_per_type" -> q13TopEventsPerType,
    "q14_hourly_events" -> q14HourlyEvents,
    "q15_value_percentiles" -> q15ValuePercentiles,
    "q15_approx_percentiles" -> q15ApproxPercentiles,
    "q16_sessionize" -> q16Sessionize,
    "q17_constraints" -> q17Constraints,
    "q18_stats" -> q18Stats)

  val oracles: Map[String, String] = Map(
    "q25_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping(o_orderstatus)::BIGINT AS g_status,
        |  grouping(o_orderpriority)::BIGINT AS g_priority,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_custs
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
        .stripMargin,
    "value_histogram" ->
      s"""SELECT least(floor(value / $HistWidth), ${HistBuckets - 1}.0)::BIGINT
        |    AS bucket,
        |  count(*) AS n,
        |  sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents,
        |  round(min(value), 2) AS min_v, round(max(value), 2) AS max_v
        |FROM events GROUP BY 1""".stripMargin,
    "q23_status_priority_pivot" ->
      ("SELECT o_orderstatus,\n" +
        OrderPriorities.map(p =>
          s"""  count(*) FILTER (WHERE o_orderpriority = '$p') AS "$p"""")
          .mkString(",\n") +
        "\nFROM orders GROUP BY o_orderstatus"),
    "q24_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT *, sum(new_s) OVER (
        |        PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "profile_categorical" ->
      ("WITH v AS (\n" +
        CatProfileCols.map(c =>
          s"  SELECT '$c' AS column_name, $c AS v FROM orders")
          .mkString("\n  UNION ALL\n") +
        """),
          |c AS (SELECT column_name, v, count(*) AS n FROM v
          |      WHERE v IS NOT NULL GROUP BY 1, 2),
          |r AS (SELECT *, row_number() OVER (
          |        PARTITION BY column_name ORDER BY n DESC, v ASC) AS rk
          |      FROM c)
          |SELECT column_name, sum(n)::BIGINT AS n_nonnull,
          |  count(*) AS n_distinct,
          |  max(CASE WHEN rk = 1 THEN v END) AS top_value,
          |  max(CASE WHEN rk = 1 THEN n END)::BIGINT AS top_n
          |FROM r GROUP BY column_name""".stripMargin),
    "profile_numeric" ->
      ProfileCols.map(c =>
        s"""SELECT '$c' AS column_name, count($c)::BIGINT AS n_nonnull,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  min($c)::DOUBLE AS min_v, max($c)::DOUBLE AS max_v
           |FROM lineitem""".stripMargin)
        .mkString("\nUNION ALL\n"),
    "q22_rolling_user_stats" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  round(avg(value) OVER w, 4) AS avg_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
        .stripMargin,
    "q19_brand_cube" ->
      """SELECT p_brand, l_returnflag, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS total_price,
        |  round(avg(p_retailprice), 4) AS avg_retail
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY CUBE (p_brand, l_returnflag)""".stripMargin,
    "q20_event_props" ->
      """SELECT (json_extract(props, '$.k')::BIGINT) % 10 AS k_mod,
        |  event_type, count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q21_sliding_windows" ->
      """WITH e AS (SELECT epoch_us(ts) AS p, event_type, value FROM events),
        |w AS (SELECT strftime(make_timestamp(
        |         (p - p % 900000000) - k * 900000000::BIGINT),
        |         '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, value
        |  FROM e, unnest([0, 1, 2, 3]) AS u(k)
        |  WHERE p < ((p - p % 900000000) - k * 900000000::BIGINT) + 3600000000)
        |SELECT w_start, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_top_customers" ->
      """SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 10""".stripMargin,
    "q3_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin,
    "q5_segment_nation_revenue" ->
      """SELECT c_mktsegment, n_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY c_mktsegment, n_name""".stripMargin,
    "q6_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_distinct_customers" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q8_customers_without_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    "q9_suppliers_heavy_items" ->
      """SELECT n_name, count(*) AS n_suppliers
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
        |GROUP BY n_name""".stripMargin,
    "q10_party_union" ->
      """WITH parties AS (
        |  SELECT c_nationkey::INT AS nationkey, 'customer' AS role FROM customer
        |  UNION ALL
        |  SELECT s_nationkey::INT AS nationkey, 'supplier' AS role FROM supplier)
        |SELECT n_name, role, count(*) AS n_parties
        |FROM parties JOIN nation ON nationkey = n_nationkey
        |GROUP BY n_name, role""".stripMargin,
    "q11_first_order_per_customer" ->
      """SELECT o_custkey, o_orderkey AS first_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY o_custkey
        |        ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |      FROM orders)
        |WHERE rn = 1""".stripMargin,
    "q12_status_priority_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q13_top_events_per_type" ->
      """SELECT event_type, rn, event_id, value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY event_type
        |        ORDER BY value DESC, event_id ASC) AS rn
        |      FROM events)
        |WHERE rn <= 3""".stripMargin,
    "q14_hourly_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q15_value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type""".stripMargin,
    // bound assertion (see q15ApproxPercentiles): TRUE per group; the
    // hash matches iff Spark's sketch met its rank guarantee everywhere
    "q15_approx_percentiles" ->
      """SELECT event_type, count(*) AS n_events,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM events GROUP BY event_type""".stripMargin,
    "q16_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                            ORDER BY ts ASC, event_id ASC) AS prev_us
        |  FROM events)
        |SELECT user_id,
        |  sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |           THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q17_constraints" ->
      """SELECT
        |  (SELECT count(*) FROM orders
        |   WHERE o_orderstatus NOT IN ('O','F','P')) AS bad_status,
        |  (SELECT count(*) FROM lineitem WHERE NOT EXISTS
        |     (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |   AS orphan_lineitems,
        |  (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0) AS bad_price,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_discount NOT BETWEEN 0 AND 1) AS bad_discount""".stripMargin,
    "q18_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |  round(stddev_samp(l_extendedprice), 2) AS price_stddev,
        |  round(avg(l_tax), 4) AS avg_tax
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
