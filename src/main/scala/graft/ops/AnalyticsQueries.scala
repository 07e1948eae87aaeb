package graft.ops

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-level aggregation, pivot, window-function breadth, and
  * statistics aggregates — the OLAP analytics surface a reporting user
  * of the reference (report generation over ingestion logs,
  * processed_files_log summaries in reports_generation.py:21-96) would
  * reach for next. All are single-pass Catalyst plans:
  *
  *  - ROLLUP/CUBE/GROUPING SETS expand in the logical plan (Expand
  *    node) and aggregate with map-side partial combine — one shuffle on
  *    the grouping keys regardless of how many levels are requested;
  *  - PIVOT is a single groupBy with conditional aggregates — no
  *    per-pivot-value scan;
  *  - window breadth (ntile / percent_rank / cume_dist / lead / lag)
  *    shares one Window node per frame spec — one sort per partition
  *    spec, not per function;
  *  - percentile / corr / covar / stddev are built-in typed aggregates
  *    (partial+final, no collect).
  *
  * Cross-engine conventions (see RelationalQueries): grouping-null
  * sentinels via coalesce AFTER grouping_id disambiguation, counts CAST
  * to BIGINT, derived doubles rounded, deterministic ORDER BY with
  * unique tiebreaks, NULL-sensitive sorts avoided by sorting on
  * non-null derived columns.
  */
object AnalyticsQueries {

  private def tb(s: SparkSession, dir: String) = Tables(s, dir)

  val all: Map[String, Q] = Map(

    // ---- G1: ROLLUP — per (status, priority) with subtotals + total.
    // grouping_id() and DuckDB GROUPING(a,b) share the standard bitmask
    // (bit set = column rolled up), verified empirically.
    "q_g1_rollup" -> Q(
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin) { (s, dir) =>
      tb(s, dir).orders
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("gid"), col("n_orders"), col("revenue"))
        .orderBy("gid", "status", "priority")
    },

    // ---- G2: CUBE — all 4 grouping combinations in one Expand+agg ----
    "q_g2_cube" -> Q(
      """SELECT coalesce(l_returnflag, '(all)') AS rflag,
        |  coalesce(l_linestatus, '(all)') AS lstatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, rflag, lstatus""".stripMargin) { (s, dir) =>
      tb(s, dir).lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_items"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
          col("gid"), col("n_items"), col("sum_qty"))
        .orderBy("gid", "rflag", "lstatus")
    },

    // ---- G3: GROUPING SETS — exactly the requested levels, no cube
    // blow-up: (status), (priority), and the grand total ----
    "q_g3_grouping_sets" -> Q(
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin) { (s, dir) =>
      tb(s, dir).orders
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("gid"), col("n_orders"))
        .orderBy("gid", "status", "priority")
    },

    // ---- G4: PIVOT — linestatus values to columns, one conditional-agg
    // pass (Spark pivots with explicit values → no extra distinct scan) ----
    "q_g4_pivot" -> Q(
      """SELECT l_returnflag AS rflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
        |  CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
        |  CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY rflag""".stripMargin) { (s, dir) =>
      tb(s, dir).lineitem
        .groupBy(col("l_returnflag").as("rflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2).as("qty"),
          count(lit(1)).as("n"))
        .select(col("rflag"),
          col("F_qty").as("qty_f"), col("O_qty").as("qty_o"),
          col("F_n").as("n_f"), col("O_n").as("n_o"))
        .orderBy("rflag")
    },

    // ---- W2: window breadth — ntile / percent_rank / cume_dist over
    // one shared frame (one sort), unique orderkey tiebreak ----
    "q_w2_ntile_cume" -> Q(
      """SELECT o_orderkey, o_orderstatus AS status,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      tb(s, dir).orders
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("o_orderkey")
    },

    // ---- W3: lead/lag — per-customer order gaps in days (exact integer
    // datediff; first/last order per customer yield NULL lag/lead) ----
    "q_w3_lead_lag" -> Q(
      """SELECT o_orderkey, o_custkey,
        |  lag(o_orderkey) OVER w AS prev_order,
        |  lead(o_orderkey) OVER w AS next_order,
        |  CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
        |                 CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      tb(s, dir).orders
        .select(col("o_orderkey"), col("o_custkey"),
          lag("o_orderkey", 1).over(w).as("prev_order"),
          lead("o_orderkey", 1).over(w).as("next_order"),
          datediff(to_date(col("o_orderdate")),
            to_date(lag("o_orderdate", 1).over(w))).cast("long").as("days_since_prev"))
        .orderBy("o_orderkey")
    },

    // ---- A9: exact interpolated percentiles (Spark percentile ≡ DuckDB
    // quantile_cont: both linear-interpolate on the sorted values) ----
    "q_a9_percentiles" -> Q(
      """SELECT l_returnflag AS rflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
        |  round(quantile_cont(l_quantity, 0.95), 4) AS qty_p95,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
        |FROM lineitem GROUP BY l_returnflag ORDER BY rflag""".stripMargin) { (s, dir) =>
      tb(s, dir).lineitem
        .groupBy(col("l_returnflag").as("rflag"))
        .agg(round(percentile(col("l_quantity"), lit(0.25)), 4).as("qty_p25"),
          round(percentile(col("l_quantity"), lit(0.5)), 4).as("qty_p50"),
          round(percentile(col("l_quantity"), lit(0.95)), 4).as("qty_p95"),
          round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("price_p50"))
        .orderBy("rflag")
    },

    // ---- A10: statistics aggregates — Pearson corr, sample covariance /
    // stddev / variance (both engines use stable co-moment accumulation;
    // rounded to absorb merge-order last-ulp drift) ----
    "q_a10_stats" -> Q(
      """SELECT l_linestatus AS lstatus,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |  round(stddev_samp(l_quantity), 6) AS qty_stddev,
        |  round(var_samp(l_quantity), 4) AS qty_var,
        |  round(avg(l_discount), 6) AS avg_discount
        |FROM lineitem GROUP BY l_linestatus ORDER BY lstatus""".stripMargin) { (s, dir) =>
      tb(s, dir).lineitem
        .groupBy(col("l_linestatus").as("lstatus"))
        .agg(round(corr("l_quantity", "l_extendedprice"), 6).as("qty_price_corr"),
          round(covar_samp("l_quantity", "l_extendedprice"), 2).as("qty_price_covar"),
          round(stddev_samp("l_quantity"), 6).as("qty_stddev"),
          round(var_samp("l_quantity"), 4).as("qty_var"),
          round(avg("l_discount"), 6).as("avg_discount"))
        .orderBy("lstatus")
    },

    // ---- W4: rolling ROWS frame — per-user moving sum/avg/min over the
    // last 4 events (3 preceding + current). Incremental frame evaluation
    // in WindowExec: one sort per user partition, O(1) per-row update ----
    "q_w4_rolling_frame" -> Q(
      """SELECT event_id, user_id,
        |  round(sum(value) OVER w, 4) AS roll_sum,
        |  round(avg(value) OVER w, 6) AS roll_avg,
        |  round(min(value) OVER w, 4) AS roll_min,
        |  CAST(count(*) OVER w AS BIGINT) AS roll_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 0)
      tb(s, dir).events
        .select(col("event_id"), col("user_id"),
          round(sum("value").over(w), 4).as("roll_sum"),
          round(avg("value").over(w), 6).as("roll_avg"),
          round(min("value").over(w), 4).as("roll_min"),
          count(lit(1)).over(w).as("roll_n"))
        .orderBy("event_id")
    },

    // ---- W5: time-based RANGE frame — events per user in the trailing
    // hour. RANGE peers make this deterministic without a tiebreak; the
    // interval arithmetic is exact on micro-truncated timestamps ----
    "q_w5_range_frame" -> Q(
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_hour
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      tb(s, dir).events
        .withColumn("n_last_hour", expr(
          """count(*) OVER (PARTITION BY user_id ORDER BY ts
            |RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin))
        .select("event_id", "user_id", "n_last_hour")
        .orderBy("event_id")
    },

    // ---- W6: first/last/nth value — session bookends per user (full
    // partition frame for last/nth so the answer is frame-independent) ----
    "q_w6_first_last" -> Q(
      """SELECT event_id, user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      tb(s, dir).events
        .select(col("event_id"), col("user_id"),
          first_value(col("event_type")).over(w).as("first_type"),
          last_value(col("event_type")).over(w).as("last_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type"))
        .orderBy("event_id")
    },

    // ---- A12: fixed-width histogram — integer bucket arithmetic (floor
    // of one IEEE divide), capped top bucket; an aggregation-only plan
    // that scales as a single map-side-combined groupBy ----
    "q_a12_histogram" -> Q(
      """SELECT least(19, CAST(floor(o_totalprice / 30000) AS BIGINT)) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      tb(s, dir).orders
        .groupBy(least(lit(19), floor(col("o_totalprice") / 30000).cast("long")).as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 2).as("lo"),
          round(max("o_totalprice"), 2).as("hi"))
        .orderBy("bucket")
    },

    // ---- A13: HLL approximate distinct — the constant-memory face of
    // COUNT(DISTINCT) for 100 TB cardinality profiling. Estimates are
    // engine-specific (no cross-engine oracle); accuracy is property-
    // tested in AnalyticsSpec against the exact count (rsd 0.02) ----
    // HLL++ sketch can't hash-match an exact engine, so the oracle is a
    // TOLERANCE check made hash-exact: the query emits whether the
    // estimate lands within 3σ of the EXACT distinct (rsd 2% → 6%
    // bound; measured max rel-err 1.7% across sf0.001..sf1.0 — probe
    // ledgered r9) alongside the exact anchors, and DuckDB asserts the
    // bound always holds. Integer-exact comparison — no float drift.
    "q_a13_approx_distinct" -> Q(
      """SELECT o_orderstatus AS status,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       TRUE AS within_tol
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      tb(s, dir).orders
        .groupBy(col("o_orderstatus").as("status"))
        .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02).as("_approx"),
          countDistinct(col("o_custkey")).as("exact_customers"),
          count(lit(1)).as("n_orders"))
        .select(col("status"), col("exact_customers"), col("n_orders"),
          (abs(col("_approx") - col("exact_customers")) * 100 <=
            col("exact_customers") * 6).as("within_tol"))
        .orderBy("status")
    },

    // ---- A15: GK-sketch approximate percentiles — the mergeable
    // constant-memory face of exact quantiles for 100 TB profiling
    // (percentile_approx, accuracy 100 → rank error ≤ 1%). Same
    // tolerance-oracle shape as A13, but STRONGER than trusting the
    // sketch's self-report: the query joins the approx values back to
    // the data and checks their true ranks land within ±2% of the
    // targets (integer-exact arithmetic); DuckDB asserts the bound
    // plus the exact min/max/count anchors. ----
    "q_a15_approx_percentile" -> Q(
      """SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY 1 ORDER BY flag""".stripMargin) { (s, dir) =>
      val li = tb(s, dir).lineitem
        .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("x"))
      val ap = li.groupBy("flag").agg(
        expr("percentile_approx(x, array(0.5D, 0.99D), 100)").as("ap"),
        count(lit(1)).as("n"),
        round(min("x"), 2).as("lo"), round(max("x"), 2).as("hi"))
      val ranks = li
        .join(broadcast(ap.select(col("flag"), col("ap"))), Seq("flag"))
        .groupBy("flag").agg(
          sum(when(col("x") <= col("ap")(0), 1L).otherwise(0L)).as("r50"),
          sum(when(col("x") <= col("ap")(1), 1L).otherwise(0L)).as("r99"))
      ap.join(ranks, Seq("flag"))
        .select(col("flag"), col("n"), col("lo"), col("hi"),
          (col("r50") * 100 >= col("n") * 48 &&
            col("r50") * 100 <= col("n") * 52 &&
            col("r99") * 100 >= col("n") * 97).as("within_tol"))
        .orderBy("flag")
    },

    // ---- U2: INTERSECT (distinct) — customers with BOTH open and
    // finished orders. Spark plans a left-semi over distinct sets ----
    "q_u2_intersect" -> Q(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = tb(s, dir).orders
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- U3: EXCEPT (distinct) — open-only customers (anti over
    // distinct sets) ----
    "q_u3_except" -> Q(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = tb(s, dir).orders
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- F15: UNNEST WITH ORDINALITY — positional token explode
    // (posexplode ≡ unnest + generate_subscripts, 1-based both sides).
    // The generate is map-side; no shuffle before the output sort ----
    "q_f15_unnest_pos" -> Q(
      """SELECT doc_id, t.pos, t.tok FROM documents,
        |LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
        |         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos) t
        |WHERE doc_id % 50 = 0
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      tb(s, dir).documents
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("tok"))
        .orderBy("doc_id", "pos")
    },

    // ---- F16: JSON extraction — typed value out of the props JSON
    // string (get_json_object ≡ json_extract_string; no UDF, both
    // engines parse per row at scan speed) ----
    "q_f16_json_extract" -> Q(
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (s, dir) =>
      tb(s, dir).events
        .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    },

    // ---- F17: regexp capture-group extraction (same RE2-compatible
    // pattern + group index both engines) ----
    "q_f17_regexp_extract" -> Q(
      """SELECT regexp_extract(o_orderpriority, '^(\d+)-(\w+)', 2) AS prio_word,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY prio_word""".stripMargin) { (s, dir) =>
      tb(s, dir).orders
        .groupBy(regexp_extract(col("o_orderpriority"), "^(\\d+)-(\\w+)", 2).as("prio_word"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prio_word")
    },

    // ---- F18: calendar bucketing — monthly order volume/revenue.
    // The month travels as 'yyyy-MM' VARCHAR: engines disagree on
    // date_trunc's return type (DuckDB DATE vs Spark TIMESTAMP), and a
    // string bucket hashes identically everywhere ----
    "q_f18_date_trunc" -> Q(
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin) { (s, dir) =>
      tb(s, dir).orders
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("month")
    },

    // ---- A11: ordered string aggregation (LISTAGG) — deterministic via
    // in-aggregate ORDER BY / array_sort, distinct inputs ----
    "q_a11_listagg" -> Q(
      """SELECT o_orderstatus AS status,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin) { (s, dir) =>
      tb(s, dir).orders
        .groupBy(col("o_orderstatus").as("status"))
        .agg(array_join(array_sort(collect_set("o_orderpriority")), ",").as("priorities"),
          countDistinct("o_orderpriority").as("n_priorities"))
        .orderBy("status")
    },

    // ---- per-column dataset profile (reports/Profile.profileTable):
    //      rows / nulls / exact ndv / typed min-max, one aggregate over
    //      one scan, melted to a row per column. Numeric extremes stay
    //      DOUBLE (no engine-specific double→string formatting). ----
    "q_profile_table" -> Q(
      """SELECT * FROM (
        |  SELECT 'c_custkey' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(count(*) - count(c_custkey) AS BIGINT) AS n_nulls,
        |         CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |         CAST(min(c_custkey) AS DOUBLE) AS min_num, CAST(max(c_custkey) AS DOUBLE) AS max_num,
        |         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_name', CAST(count(*) AS BIGINT),
        |         CAST(count(*) - count(c_name) AS BIGINT),
        |         CAST(count(DISTINCT c_name) AS BIGINT),
        |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(c_name), max(c_name)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
        |         CAST(count(*) - count(c_acctbal) AS BIGINT),
        |         CAST(count(DISTINCT c_acctbal) AS BIGINT),
        |         CAST(min(c_acctbal) AS DOUBLE), CAST(max(c_acctbal) AS DOUBLE),
        |         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
        |         CAST(count(*) - count(c_mktsegment) AS BIGINT),
        |         CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |         min(c_mktsegment), max(c_mktsegment)
        |  FROM customer)
        |ORDER BY column_name""".stripMargin) { (s, dir) =>
      graft.reports.Profile.profileTable(tb(s, dir).customer,
          Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment"))
        .orderBy("column_name")
    },

    // ---- declarative data-quality rules (Profile.checkRules): the
    //      whole rule set is ONE conditional aggregate over ONE scan;
    //      NULL predicate results count as violations. ----
    "q_quality_rules" -> Q(
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN coalesce(c_acctbal >= 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
        |  CAST(sum(CASE WHEN coalesce(c_name IS NOT NULL AND len(c_name) > 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |  CAST(sum(CASE WHEN coalesce(c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'), false) THEN 0 ELSE 1 END) AS BIGINT) AS v3,
        |  CAST(sum(CASE WHEN coalesce(c_custkey > 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS v4
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT 'acctbal_nonneg' AS rule, n AS n_rows, v1 AS n_violations,
        |         round(v1 / CAST(n AS DOUBLE), 6) AS violation_rate FROM a
        |  UNION ALL
        |  SELECT 'name_present', n, v2, round(v2 / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL
        |  SELECT 'segment_known', n, v3, round(v3 / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL
        |  SELECT 'custkey_positive', n, v4, round(v4 / CAST(n AS DOUBLE), 6) FROM a)
        |ORDER BY rule""".stripMargin) { (s, dir) =>
      graft.reports.Profile.checkRules(tb(s, dir).customer, Seq(
          "acctbal_nonneg" -> (col("c_acctbal") >= 0),
          "name_present" -> (col("c_name").isNotNull && length(col("c_name")) > 0),
          "segment_known" -> col("c_mktsegment").isin(
            "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
          "custkey_positive" -> (col("c_custkey") > 0)))
        .orderBy("rule")
    },

    // ---- functional-dependency discovery (Profile.functionalDeps):
    //      which column pairs satisfy det → dep (key discovery /
    //      normalization candidates). One distinct aggregate per pair. ----
    "q_profile_fds" -> Q(
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS determinant, 'o_custkey' AS dependent,
        |         CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |         (sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) = 0) AS fd_holds
        |  FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS ndv
        |        FROM orders WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'o_custkey', 'o_orderstatus',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |         (sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) = 0)
        |  FROM (SELECT o_custkey, count(DISTINCT o_orderstatus) AS ndv
        |        FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey)
        |  UNION ALL
        |  SELECT 'o_orderstatus', 'o_orderpriority',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |         (sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) = 0)
        |  FROM (SELECT o_orderstatus, count(DISTINCT o_orderpriority) AS ndv
        |        FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY o_orderstatus))
        |ORDER BY determinant""".stripMargin) { (s, dir) =>
      graft.reports.Profile.functionalDeps(tb(s, dir).orders, Seq(
          "o_orderkey" -> "o_custkey",
          "o_custkey" -> "o_orderstatus",
          "o_orderstatus" -> "o_orderpriority"))
        .orderBy("determinant")
    },

    // ---- heavy-hitter skew diagnostic (core/Skew.heavyHitters): top
    //      composite keys by count with table share — groupBy +
    //      TakeOrderedAndProject, rank window only on the reduced
    //      top-n rows. ----
    "q_skew_heavy_hitters" -> Q(
      """WITH g AS (SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |           FROM orders GROUP BY 1, 2),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM orders),
        |top AS (SELECT * FROM g ORDER BY n DESC, o_orderstatus, o_orderpriority LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, o_orderstatus, o_orderpriority) AS BIGINT) AS "rank",
        |       o_orderstatus, o_orderpriority, n,
        |       round(n / CAST(t.total AS DOUBLE), 6) AS share
        |FROM top, t ORDER BY "rank"""".stripMargin) { (s, dir) =>
      graft.core.Skew.heavyHitters(tb(s, dir).orders,
          Seq("o_orderstatus", "o_orderpriority"), topN = 10)
        .orderBy("rank")
    },

    // ---- Z-order sort key (functions/ZOrder): Morton interleave of
    //      (custkey, epoch-day) via the native codegen'd z_interleave
    //      expression — the data-layout key behind multi-dimensional
    //      scan pruning (ZOrder.cluster range-partitions + sorts on
    //      it). The oracle replays the interleave bit-by-bit. ----
    "q_zorder_key" -> Q(
      """WITH b AS (SELECT o_orderkey,
        |                  o_custkey AS x,
        |                  CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS y
        |           FROM orders)
        |SELECT o_orderkey, x, y,
        |       CAST(sum(((x >> i) & 1) * (1::BIGINT << (2*i)) +
        |                ((y >> i) & 1) * (1::BIGINT << (2*i+1))) AS BIGINT) AS z
        |FROM b, generate_series(0, 30) AS g(i)
        |GROUP BY o_orderkey, x, y
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      tb(s, dir).orders
        .select(col("o_orderkey"),
          col("o_custkey").as("x"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast("long").as("y"))
        .withColumn("z", graft.functions.ZOrder.z(col("x"), col("y")))
        .orderBy("o_orderkey")
    },

    // ---- Benford first-digit audit (TextAnalysis.benfordProfile): the
    //      fabricated-data smell test. The synthetic uniform prices
    //      FAIL it loudly (digit-1 share ~15% vs the expected 30.1%) —
    //      which is exactly what the test detects. Digit from integer-
    //      to-string of cents, never double formatting. ----
    "q_quality_benford" -> Q(
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |           FROM lineitem WHERE floor(l_extendedprice * 100) >= 1),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),
        |n AS (SELECT digit, count(*) AS cnt FROM d GROUP BY 1),
        |e(digit, expected_bp) AS (VALUES (1,3010),(2,1761),(3,1249),(4,969),
        |                                 (5,792),(6,669),(7,580),(8,512),(9,458))
        |SELECT CAST(e.digit AS BIGINT) AS digit, CAST(coalesce(n.cnt, 0) AS BIGINT) AS n,
        |       CAST(coalesce(n.cnt, 0) * 10000 // (SELECT sum(cnt) FROM n) AS BIGINT) AS share_bp,
        |       CAST(e.expected_bp AS BIGINT) AS expected_bp
        |FROM e LEFT JOIN n USING (digit) ORDER BY digit""".stripMargin) { (s, dir) =>
      graft.llm.TextAnalysis.benfordProfile(tb(s, dir).lineitem, "l_extendedprice")
        .orderBy("digit")
    },

    // ---- per-group min-max scaling (TextAnalysis.minMaxScale): the
    //      bounded-range companion of z-scoring — one (group, lo, hi)
    //      aggregate broadcast back, codegen'd projection. ----
    "q_llm_minmax_scale" -> Q(
      """WITH s AS (SELECT l_returnflag AS flag, min(l_extendedprice) AS lo,
        |                  max(l_extendedprice) AS hi
        |           FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, s.flag,
        |       round((l.l_extendedprice - s.lo) / (s.hi - s.lo), 6) AS scaled
        |FROM lineitem l JOIN s ON s.flag = l.l_returnflag
        |WHERE l.l_orderkey % 500 = 0
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin) { (s, dir) =>
      graft.llm.TextAnalysis.minMaxScale(
          tb(s, dir).lineitem.withColumnRenamed("l_returnflag", "flag"),
          "flag", "l_extendedprice")
        .filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("flag"),
          round(col("l_extendedprice_mm"), 6).as("scaled"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- W7: top-k per group — the per-group face of ORDER BY/LIMIT
    //      (rank window inside each partition, never a global sort;
    //      deterministic tiebreak on the key). ----
    "q_w7_topk_per_group" -> Q(
      """SELECT status, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus AS status, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderstatus
        |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY status, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("status")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tb(s, dir).orders
        .select(col("o_orderstatus").as("status"), col("o_orderkey"),
          col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("status", "rn", "o_orderkey", "o_totalprice")
        .orderBy("status", "rn")
    },

    // ---- frequent-pair mining (core/Itemsets): co-occurrence support
    //      over (order, part) baskets — the A-Priori k=2 candidate pass
    //      as pure aggregation. Quadratic step is the within-basket
    //      explode, bounded by the basket cap (never binds here:
    //      baskets are ≤7 items, so the uncapped oracle agrees); pair
    //      volume is linear in baskets, counted with map-side combine.
    //      No all-pairs item join anywhere. ----
    "q_mine_pairs" -> Q(
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem)
        |SELECT a.item AS item_a, b.item AS item_b, CAST(count(*) AS BIGINT) AS support
        |FROM it a JOIN it b ON a.bk = b.bk AND a.item < b.item
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY support DESC, item_a, item_b""".stripMargin) { (s, dir) =>
      graft.core.Itemsets.frequentPairs(tb(s, dir).lineitem,
          "l_orderkey", "l_partkey", minSupport = 2)
        .orderBy(col("support").desc, col("item_a"), col("item_b"))
    },

    // ---- association rules over the frequent pairs: both directions'
    //      confidence and the symmetric lift, ALL integer-exact (basis
    //      points via integral division — bit-identical cross-engine).
    //      Item supports join back broadcast; the pair frame never
    //      reshuffles. ----
    "q_mine_assoc" -> Q(
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem),
        |nb AS (SELECT count(DISTINCT bk) AS n FROM it),
        |sup AS (SELECT item, count(*) AS s FROM it GROUP BY 1),
        |pr AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS s_ab
        |       FROM it a JOIN it b ON a.bk = b.bk AND a.item < b.item
        |       GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT pr.item_a, pr.item_b, CAST(pr.s_ab AS BIGINT) AS support,
        |       CAST(sa.s AS BIGINT) AS support_a, CAST(sb.s AS BIGINT) AS support_b,
        |       CAST(pr.s_ab * 10000 // sa.s AS BIGINT) AS conf_ab_bp,
        |       CAST(pr.s_ab * 10000 // sb.s AS BIGINT) AS conf_ba_bp,
        |       CAST((pr.s_ab * nb.n * 10000) // (sa.s * sb.s) AS BIGINT) AS lift_bp
        |FROM pr, nb
        |JOIN sup sa ON sa.item = pr.item_a
        |JOIN sup sb ON sb.item = pr.item_b
        |ORDER BY support DESC, item_a, item_b""".stripMargin) { (s, dir) =>
      graft.core.Itemsets.associationRules(tb(s, dir).lineitem,
          "l_orderkey", "l_partkey", minSupport = 3)
        .orderBy(col("support").desc, col("item_a"), col("item_b"))
    },

    // ---- G5: UNPIVOT / melt — wide measure columns to (measure, value)
    //      rows, the inverse of pivot. Map-side generate, no shuffle
    //      before the output sort; common type is the shared DOUBLE. ----
    "q_g5_unpivot" -> Q(
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |                  l_discount, l_tax
        |           FROM lineitem WHERE l_orderkey % 500 = 0)
        |  ON l_quantity, l_extendedprice, l_discount, l_tax
        |  INTO NAME measure VALUE value)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, dir) =>
      tb(s, dir).lineitem
        .filter(col("l_orderkey") % 500 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // ---- A14: weighted median — smallest value whose cumulative weight
    //      reaches half the group total (weights = integer quantities;
    //      the crossing test is exact integer cross-multiplication).
    //      Per-group RANGE window (default frame on both engines gives
    //      ties the whole tie-group's weight — deterministic), then one
    //      min per group. ----
    "q_a14_weighted_median" -> Q(
      """WITH w AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
        |                  CAST(l_quantity AS BIGINT) AS wt FROM lineitem),
        |c AS (SELECT flag, v, sum(wt) OVER (PARTITION BY flag ORDER BY v) AS cum,
        |             sum(wt) OVER (PARTITION BY flag) AS tot FROM w)
        |SELECT flag, round(min(v), 2) AS wmedian FROM c
        |WHERE cum * 2 >= tot GROUP BY flag ORDER BY flag""".stripMargin) { (s, dir) =>
      val w = tb(s, dir).lineitem.select(
        col("l_returnflag").as("flag"), col("l_extendedprice").as("v"),
        col("l_quantity").cast("long").as("wt"))
      val cum = Window.partitionBy("flag").orderBy("v")
      val tot = Window.partitionBy("flag")
      w.withColumn("cum", sum("wt").over(cum))
        .withColumn("tot", sum("wt").over(tot))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("flag").agg(round(min("v"), 2).as("wmedian"))
        .orderBy("flag")
    }
  )
}
