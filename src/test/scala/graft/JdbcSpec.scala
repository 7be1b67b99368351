package graft

import graft.sources.Jdbc

/** The connector-faithful JDBC paths (reference's Postgres
  * source/sink, /root/reference/dags/Extract.py:32-38 + Load.py:16-28)
  * exercised against an embedded Derby — a real JDBC engine running
  * in-process, so the exact `.format("jdbc")` code that would hit
  * Postgres runs here with only the URL differing. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  // in-memory Derby database, created on first connect; derby.log
  // goes to the forked JVM's temp dir, not the repo
  System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  // Derby maps Spark StringType to CLOB by default, which Derby cannot
  // compare or GROUP — pin VARCHAR at table creation (the write-side
  // option the Postgres path would not need)
  private val opts = Map(
    "createTableColumnTypes" -> "id_source INT, id_date INT, title VARCHAR(256)")

  private def batch(rows: (Int, Int, String)*) =
    rows.toSeq.toDF("id_source", "id_date", "title")

  test("append creates the table on first write and read round-trips it") {
    Jdbc.append(batch((1, 10, "a"), (2, 20, "b")), url, "news", opts)
    val back = Jdbc.read(spark, url, "news")
    assert(back.columns.map(_.toLowerCase).toSet === Set("id_source", "id_date", "title"))
    assert(rows(back) === Set(Seq(1, 10, "a"), Seq(2, 20, "b")))
  }

  test("loadTo is the reference load step: anti-join on the natural key, append only new rows") {
    val keys = Seq("id_source", "id_date", "title") // Load.py:22 tested_columns
    // same batch again -> 0 appended (load ∘ load ≡ load)
    assert(Jdbc.loadTo(batch((1, 10, "a"), (2, 20, "b")), url, "news", keys, opts) === 0L)
    // one known row, one new row duplicated within the batch -> 1 appended
    val n = Jdbc.loadTo(
      batch((1, 10, "a"), (3, 30, "c"), (3, 30, "c")), url, "news", keys, opts)
    assert(n === 1L)
    assert(rows(Jdbc.read(spark, url, "news")) ===
      Set(Seq(1, 10, "a"), Seq(2, 20, "b"), Seq(3, 30, "c")))
  }

  test("readPartitioned stripes the scan across connections without dropping rows") {
    val striped = Jdbc.readPartitioned(spark, url, "news",
      partCol = "id_source", lowerBound = 0L, upperBound = 4L, numPartitions = 3)
    assert(striped.rdd.getNumPartitions === 3)
    assert(rows(striped) === rows(Jdbc.read(spark, url, "news")))
    // bounds shape parallelism, not a filter: rows outside [lower, upper)
    // still arrive through the unbounded edge stripes
    Jdbc.append(batch((99, 990, "edge")), url, "news", opts)
    val wide = Jdbc.readPartitioned(spark, url, "news",
      partCol = "id_source", lowerBound = 1L, upperBound = 3L, numPartitions = 2)
    assert(rows(wide).contains(Seq(99, 990, "edge")))
  }
}
