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
      .config("spark.ui.enabled", "false")

  /** Common post-create tuning applied by Verify/Bench mains. */
  def quiet(spark: SparkSession): SparkSession = {
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
