package graft.ops

import graft.core.Tables
import graft.llm.Bootstrap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals ([[graft.llm.Bootstrap]]),
  * each with a FULL DuckDB replay oracle: the oracle re-derives every
  * replicate weight from the same md5 buckets and the same integer
  * Poisson thresholds (interpolated from [[Bootstrap.poissonThresholds]]
  * so the two engines cannot drift), folds the same decimal-exact
  * weighted sums, and selects the same order statistics with the same
  * integer index rule — different plans, bit-identical intervals.
  */
object BootQueries {

  private def tb(s: SparkSession, dir: String) = Tables(s, dir)

  /** Shared oracle tail: rank→order-statistic selection over a `k`
    * CTE holding (grp?, rep, stat, rn, cnt). Integer index rule
    * ⌈p·cnt/2000⌉ = (p·cnt + 1999) // 2000 — the percentileCI contract.
    * `+ 0.0` normalizes DuckDB's −0.0 (Spark's BigDecimal round never
    * emits one — the r12 IEEE lesson).
    */
  private def ciSelect(loPermille: Int, hiPermille: Int,
                       grpSel: String = "", grpBy: String = ""): String =
    s"""SELECT ${grpSel}CAST(max(cnt) AS BIGINT) AS n_rep,
       |  round(max(CASE WHEN rn = (1000*cnt + 1999) // 2000 THEN stat END), 6) + 0.0 AS point,
       |  round(max(CASE WHEN rn = ($loPermille*cnt + 1999) // 2000 THEN stat END), 6) + 0.0 AS ci_lo,
       |  round(max(CASE WHEN rn = ($hiPermille*cnt + 1999) // 2000 THEN stat END), 6) + 0.0 AS ci_hi
       |FROM k$grpBy""".stripMargin

  val all: Map[String, Q] = Map(

    // ---- bootstrap CI for the corpus mean doc length
    //      (Bootstrap.meanCI): 200 deterministic Poisson replicates,
    //      95% percentile interval — the error bar the point mean in
    //      q_report_process_summary-style reports lacks ----
    "q_boot_mean_ci" -> Q(
      s"""WITH r AS (SELECT CAST(range AS BIGINT) AS rep FROM range(200)),
         |e AS (SELECT d.n_chars, r.rep,
         |        md5(CAST(d.doc_id AS VARCHAR) || '_' || CAST(r.rep AS VARCHAR)) AS hx
         |      FROM documents d CROSS JOIN r),
         |bk AS (SELECT rep, n_chars, ${OracleSql.bktFromHex("hx")} AS bkt FROM e),
         |wt AS (SELECT rep, n_chars,
         |         ${Bootstrap.poissonWeightSql("bkt")} AS w FROM bk),
         |m AS (SELECT rep, CAST(sum(w) AS BIGINT) AS n_eff,
         |        CAST(sum(CAST(w AS BIGINT) * n_chars) AS DOUBLE) AS ws
         |      FROM wt GROUP BY rep HAVING sum(w) > 0),
         |k AS (SELECT rep, ws / CAST(n_eff AS DOUBLE) AS stat,
         |        row_number() OVER (ORDER BY ws / CAST(n_eff AS DOUBLE), rep) AS rn,
         |        count(*) OVER () AS cnt
         |      FROM m)
         |${ciSelect(50, 1950)}""".stripMargin) { (s, dir) =>
      Bootstrap.meanCI(
        tb(s, dir).documents.select("doc_id", "n_chars"),
        "doc_id", "n_chars", b = 200)
    },

    // ---- per-language mean-length CI (grouped meanCI): which slice
    //      differences are real given each slice's sample size —
    //      small langs get visibly wider intervals ----
    "q_boot_group_ci" -> Q(groupCiOracle) { (s, dir) =>
      Bootstrap.meanCI(
          tb(s, dir).documents.select("doc_id", "lang", "n_chars"),
          "doc_id", "n_chars", b = 100, groupCols = Seq("lang"))
        .orderBy("lang")
    },

    // ---- streaming bootstrap state (BootStream): the SAME per-lang
    //      CI served from a state folded over three micro-batches —
    //      replicate weights are pure (id, rep) functions and the sums
    //      a commutative monoid, so the maintained state hash-matches
    //      the one-shot oracle bit for bit ----
    "q_stream_boot_ci" -> Q(groupCiOracle) { (s, dir) =>
      val tmp = Scratch.dir("graft_bootstream_")
      val statePath = s"${tmp.getPath}/boot_state"
      val docs = tb(s, dir).documents.select("doc_id", "lang", "n_chars")
      (0 to 2).foreach { i =>
        graft.streaming.BootStream.applyBatch(
          docs.filter(col("doc_id") % 3 === i), "doc_id", "n_chars",
          b = 100, statePath, groupCols = Seq("lang"))
      }
      graft.streaming.BootStream.readMeanCI(s, statePath, "n_chars",
          Seq("lang"))
        .orderBy("lang")
    },


    // ---- purchase-per-view rate CI (Bootstrap.ratioCI): a RATE's
    //      uncertainty needs joint resampling of numerator and
    //      denominator — resampling them independently (two meanCIs)
    //      overstates the variance ----
    "q_boot_ratio_ci" -> Q(
      s"""WITH r AS (SELECT CAST(range AS BIGINT) AS rep FROM range(200)),
         |v AS (SELECT event_id,
         |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS num,
         |        CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS den
         |      FROM events),
         |e AS (SELECT v.num, v.den, r.rep,
         |        md5(CAST(v.event_id AS VARCHAR) || '_' || CAST(r.rep AS VARCHAR)) AS hx
         |      FROM v CROSS JOIN r),
         |bk AS (SELECT rep, num, den, ${OracleSql.bktFromHex("hx")} AS bkt FROM e),
         |wt AS (SELECT rep, num, den,
         |         ${Bootstrap.poissonWeightSql("bkt")} AS w FROM bk),
         |m AS (SELECT rep,
         |        CAST(sum(CAST(w AS BIGINT) * num) AS DOUBLE) AS wn,
         |        CAST(sum(CAST(w AS BIGINT) * den) AS DOUBLE) AS wd
         |      FROM wt GROUP BY rep HAVING sum(CAST(w AS BIGINT) * den) > 0),
         |k AS (SELECT rep, wn / wd AS stat,
         |        row_number() OVER (ORDER BY wn / wd, rep) AS rn,
         |        count(*) OVER () AS cnt
         |      FROM m)
         |${ciSelect(50, 1950)}""".stripMargin) { (s, dir) =>
      Bootstrap.ratioCI(
        tb(s, dir).events.select(col("event_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("num"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("den")),
        "event_id", "num", "den", b = 200)
    },

    // ---- difference-of-means CI (Bootstrap.diffMeansCI): are English
    //      docs longer than German beyond resampling noise? The
    //      interval answers what q_stat_mann_whitney's rank z only
    //      ranks — both slices resampled under the SAME replicate
    //      index, weights independent because ids differ ----
    "q_boot_diff_ci" -> Q(
      s"""WITH r AS (SELECT CAST(range AS BIGINT) AS rep FROM range(200)),
         |d2 AS (SELECT doc_id, lang, n_chars FROM documents
         |       WHERE lang IN ('en', 'de')),
         |e AS (SELECT d2.lang, d2.n_chars, r.rep,
         |        md5(CAST(d2.doc_id AS VARCHAR) || '_' || CAST(r.rep AS VARCHAR)) AS hx
         |      FROM d2 CROSS JOIN r),
         |bk AS (SELECT lang, rep, n_chars, ${OracleSql.bktFromHex("hx")} AS bkt FROM e),
         |wt AS (SELECT lang, rep, n_chars,
         |         ${Bootstrap.poissonWeightSql("bkt")} AS w FROM bk),
         |m AS (SELECT lang, rep, CAST(sum(w) AS BIGINT) AS n_eff,
         |        CAST(sum(CAST(w AS BIGINT) * n_chars) AS DOUBLE) AS ws
         |      FROM wt GROUP BY lang, rep),
         |j AS (SELECT a.rep,
         |        a.ws / CAST(a.n_eff AS DOUBLE)
         |          - b.ws / CAST(b.n_eff AS DOUBLE) AS stat
         |      FROM m a JOIN m b ON a.rep = b.rep
         |      WHERE a.lang = 'en' AND b.lang = 'de'
         |        AND a.n_eff > 0 AND b.n_eff > 0),
         |k AS (SELECT rep, stat,
         |        row_number() OVER (ORDER BY stat, rep) AS rn,
         |        count(*) OVER () AS cnt
         |      FROM j)
         |${ciSelect(50, 1950)}""".stripMargin) { (s, dir) =>
      Bootstrap.diffMeansCI(
        tb(s, dir).documents.select("doc_id", "lang", "n_chars"),
        "doc_id", "n_chars", "lang", a = "en", bSlice = "de", b = 200)
    })

  /** The per-lang mean-length CI oracle (100 replicates), shared by
    * q_boot_group_ci and q_stream_boot_ci: the streaming fold is
    * bit-identical to the one-shot resample by the monoid contract,
    * so ONE SQL replay gates both faces.
    */
  private def groupCiOracle: String =
      s"""WITH r AS (SELECT CAST(range AS BIGINT) AS rep FROM range(100)),
         |e AS (SELECT d.lang, d.n_chars, r.rep,
         |        md5(CAST(d.doc_id AS VARCHAR) || '_' || CAST(r.rep AS VARCHAR)) AS hx
         |      FROM documents d CROSS JOIN r),
         |bk AS (SELECT lang, rep, n_chars, ${OracleSql.bktFromHex("hx")} AS bkt FROM e),
         |wt AS (SELECT lang, rep, n_chars,
         |         ${Bootstrap.poissonWeightSql("bkt")} AS w FROM bk),
         |m AS (SELECT lang, rep, CAST(sum(w) AS BIGINT) AS n_eff,
         |        CAST(sum(CAST(w AS BIGINT) * n_chars) AS DOUBLE) AS ws
         |      FROM wt GROUP BY lang, rep HAVING sum(w) > 0),
         |k AS (SELECT lang, rep, ws / CAST(n_eff AS DOUBLE) AS stat,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY ws / CAST(n_eff AS DOUBLE), rep) AS rn,
         |        count(*) OVER (PARTITION BY lang) AS cnt
         |      FROM m)
         |${ciSelect(50, 1950, grpSel = "lang, ",
                     grpBy = " GROUP BY lang ORDER BY lang")}""".stripMargin
}
