package graft.sources

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** The reference's actual connector is Postgres over SQLAlchemy —
  * `SELECT * FROM sources` / `SELECT * FROM news` on the read side
  * (/root/reference/dags/Extract.py:32-38, Load.py:16-20) and
  * `to_sql(if_exists='append')` on the write side (Load.py:28). This
  * is that connector re-expressed through Spark's `jdbc` format, kept
  * behind the same interfaces as the parquet paths so a caller swaps
  * `Tables.read`/`Newsmaper.loadTo` for `Jdbc.read`/`Jdbc.loadTo` and
  * changes nothing else. The harness is parquet-only, so these paths
  * are exercised by spec against an embedded Derby (in-JVM JDBC, no
  * network) — the Postgres mapping is the same code with a
  * `jdbc:postgresql://` URL.
  *
  * Scale notes: a bare `jdbc` read is ONE connection pulling the whole
  * table through the driver — fine for a dimension like `sources`
  * (the reference's read is exactly that), fatal for a fact table.
  * [[readPartitioned]] is the scale path: Spark opens `numPartitions`
  * connections, each scanning a `WHERE partCol BETWEEN …` stripe, so
  * the read parallelizes like a file scan and predicate pushdown still
  * applies per stripe. Writes batch `batchsize` rows per INSERT per
  * partition — the writer is already distributed (one connection per
  * partition), the knob just amortizes round-trips.
  */
object Jdbc {

  /** Full-table read — the reference's `SELECT * FROM t` shape. One
    * connection; use for dimensions, see [[readPartitioned]] for
    * facts. */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options)
      .load()

  /** Stripe-parallel read: `numPartitions` concurrent connections each
    * scan `[lowerBound, upperBound]` stripes of `partCol` (numeric /
    * date / timestamp). Rows outside the bounds are still read (the
    * edge stripes are unbounded) — bounds shape parallelism, not a
    * filter. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(options)
      .load()

  /** K1, connector-faithful: `to_sql(if_exists='append')` ⟶ JDBC
    * append. Distributed — one connection per input partition,
    * `batchsize` rows per INSERT batch. */
  def append(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc").mode("append")
      .option("url", url).option("dbtable", table)
      .options(options)
      .save()

  /** The reference's full load step (Load.py:12-28) against a JDBC
    * base: anti-join the incoming batch on the natural key vs the
    * `news` table, append only the new rows, return how many. Twin of
    * `Newsmaper.loadTo` (same intra-batch dedup semantics, same
    * `load ∘ load ≡ load` idempotence) with the base read/written
    * through the connector instead of parquet.
    *
    * The fresh set is materialized (persist + count) BEFORE the append
    * starts: unlike a parquet read — whose file listing snapshots at
    * plan time — a JDBC scan is live, so an unmaterialized anti-join
    * re-reading the base mid-append would see its own writes. */
  def loadTo(incoming: DataFrame, url: String, table: String,
      keys: Seq[String], options: Map[String, String] = Map.empty): Long = {
    val base = read(incoming.sparkSession, url, table, options)
    val fresh = Dedup.newRows(incoming.dropDuplicates(keys), base, keys).persist()
    try {
      val appended = fresh.count()
      append(fresh, url, table, options)
      appended
    } finally { fresh.unpersist(); () }
  }
}
