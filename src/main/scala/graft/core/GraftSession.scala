package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Replaces the reference's per-call connection factory
  * (`database_connection/db_connect.py:26-46` opens a fresh psycopg2
  * connection + SQLAlchemy engine per call) with a single shared session.
  *
  * Scale notes: shuffle partitions default to the local core count for
  * local[N] testing; on a real cluster the caller passes the cluster's
  * parallelism (or relies on AQE coalescing, which is enabled here).
  * AQE also handles skew-join splitting at scale, so skewed facility
  * fan-out (reference threads 20 facilities/batch) needs no manual salt
  * unless a single key dominates.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession =
    builder(appName, s"local[$cores]", shufflePartitions = math.max(cores, 4))
      .getOrCreate()

  def builder(appName: String, master: String,
              shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // driver testdata events.parquet stores TIMESTAMP(NANOS) which
      // vanilla Spark rejects; read as epoch-nanos long and convert in
      // Tables.events (DuckDB oracle side casts ts::TIMESTAMP).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Bloom.bloomAggBits sizes decontamination sketches at ~30
      // bits/item; the default 67 Mbit cap would silently clamp (and
      // degrade fpp) past ~2M benchmark shingles
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        (1L << 30).toString)
      .config("spark.ui.enabled", "false")

  /** Common post-create tuning applied by Verify/Bench mains. */
  def quiet(spark: SparkSession): SparkSession = {
    spark.sparkContext.setLogLevel("WARN")
    // the checkpoint-release lifecycle (DupGraph/releaseAll) triggers an
    // expected per-unpersist "lineage has been truncated" warning from
    // the concrete RDD class logger; 20+ of them per CC run is noise
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.CacheManager",
      org.apache.logging.log4j.Level.ERROR)
    // every no-partition window in this codebase is a deliberate,
    // per-site-documented aggregate-frame window (|domains|/buckets/
    // topN-sized — grep "deliberate global window"; the one full-table
    // case is q_zorder_skipping's oracle-shaped ntile). Spark 4's
    // EliminateWindowPartitions strips foldable partition keys, so the
    // lit(0) idiom can't mark them — mute the warning here so real
    // warnings stand out in application logs.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // reading a glob path (q_stream_incr_dedup's `batch=*` verdicts
    // read) makes FileStreamSink.hasMetadata probe the glob string as
    // a directory and WARN with a full FileNotFoundException stack
    // trace — benign ("assume no metadata directory"), but it makes
    // every bench/verify log look broken
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
      org.apache.logging.log4j.Level.ERROR)
    spark
  }

  /** Release EVERY cached DataFrame and persisted/locally-checkpointed
    * RDD in the session. Harness isolation: Bench/Verify call this
    * between queries so one query's working set (library-internal caches,
    * a returned checkpoint the caller can't release pre-materialization)
    * never distorts the next query's storage/execution-memory split —
    * the round-3 bench showed exactly that distortion (unchanged queries
    * 5-20× slower downstream of the LLM heavyweights).
    *
    * Safe only BETWEEN independent units of work: unpersisting a
    * locally-checkpointed RDD makes it unrecomputable (lineage is
    * truncated), so nothing may reference prior results across the call.
    */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
