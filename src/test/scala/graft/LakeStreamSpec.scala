package graft

import graft.sources.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The lake-as-streaming-source: `format("graft-lake")` turns commits
  * into micro-batches with version-number offsets, so a table one
  * pipeline maintains feeds the next with checkpointed exactly-once
  * progress and no hand-rolled cursor. Restart tests use a
  * foreachBatch sink (the memory sink refuses checkpoint recovery). */
class LakeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def tmpTable(prefix: String): String =
    new java.io.File(tmpDir(prefix), "t").toString

  private def readLake(root: String, opts: Map[String, String] = Map.empty) =
    opts.foldLeft(
      spark.readStream.format("graft-lake").option("root", root)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** Run one AvailableNow pass into a row buffer, resuming `ckpt`. */
  private def drainOnce(df: DataFrame, ckpt: String,
      sink: scala.collection.mutable.ArrayBuffer[Seq[Any]]): Unit = {
    val q = df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val got = batch.collect().map(_.toSeq)
        sink.synchronized { sink ++= got }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("commits become micro-batches; a restarted checkpoint resumes, replay is exact") {
    val root = tmpTable("graft-lkstream")
    val ckpt = tmpDir("graft-lkstream-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root, retain = 8)

    // first run: the full snapshot is the first batch
    drainOnce(readLake(root), ckpt, sink)
    assert(sink.toSet === Set(Seq(1L, "a"), Seq(2L, "b")))

    // two more commits while the stream is down
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 8)
    Lake.commitAppend(Seq((4L, "d")).toDF("k", "t"), root, retain = 8)

    // restart from the checkpoint: ONLY the new versions' rows arrive
    sink.clear()
    drainOnce(readLake(root), ckpt, sink)
    assert(sink.toSet === Set(Seq(3L, "c"), Seq(4L, "d")))

    // nothing new: a third run emits nothing
    sink.clear()
    drainOnce(readLake(root), ckpt, sink)
    assert(sink.isEmpty)
  }

  test("startingVersion=latest skips history; a number starts mid-chain") {
    val root = tmpTable("graft-lkstream-sv")
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8) // v0
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8) // v1

    // latest: the existing snapshot is NOT replayed
    val qLatest = readLake(root, Map("startingVersion" -> "latest"))
      .writeStream.format("memory").queryName("lkstream_latest")
      .trigger(Trigger.AvailableNow()).start()
    qLatest.awaitTermination()
    assert(spark.table("lkstream_latest").count() === 0L)

    // from version 1 (inclusive): v0's rows skipped, v1's arrive
    val qFrom = readLake(root, Map("startingVersion" -> "1"))
      .writeStream.format("memory").queryName("lkstream_from1")
      .trigger(Trigger.AvailableNow()).start()
    qFrom.awaitTermination()
    assert(rows(spark.table("lkstream_from1")) === Set(Seq(2L, "b")))
  }

  test("startingTimestamp resolves through commit-marker times: stream what landed after the instant") {
    val root = tmpTable("graft-lkstream-sts")
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8) // v0
    Thread.sleep(1200) // marker mtimes have ms granularity
    val boundary = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    Thread.sleep(1200)
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8) // v1
    // between the commits: only what landed after the instant streams
    val qMid = readLake(root, Map("startingTimestamp" -> boundary))
      .writeStream.format("memory").queryName("lkstream_ts_mid")
      .trigger(Trigger.AvailableNow()).start()
    qMid.awaitTermination()
    assert(rows(spark.table("lkstream_ts_mid")) === Set(Seq(2L, "b")))
    // predating every commit: the full first snapshot streams
    val qPast = readLake(root,
      Map("startingTimestamp" -> "1990-01-01 00:00:00"))
      .writeStream.format("memory").queryName("lkstream_ts_past")
      .trigger(Trigger.AvailableNow()).start()
    qPast.awaitTermination()
    assert(rows(spark.table("lkstream_ts_past")) ===
      Set(Seq(1L, "a"), Seq(2L, "b")))
    // after every commit: nothing replays, only future commits would
    val qFut = readLake(root,
      Map("startingTimestamp" -> "9999-01-01 00:00:00"))
      .writeStream.format("memory").queryName("lkstream_ts_fut")
      .trigger(Trigger.AvailableNow()).start()
    qFut.awaitTermination()
    assert(spark.table("lkstream_ts_fut").count() === 0L)
    // the two start options are mutually exclusive (the refusal
    // surfaces wrapped in the streaming query's terminal exception)
    val both = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      readLake(root, Map("startingTimestamp" -> boundary,
        "startingVersion" -> "0"))
        .writeStream.format("memory").queryName("lkstream_ts_both")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(Iterator.iterate[Throwable](both)(_.getCause)
      .takeWhile(_ != null).take(5)
      .exists(t => Option(t.getMessage)
        .exists(_.contains("mutually exclusive"))))
  }

  test("startingVersion=latest is pinned at FIRST start, not re-resolved per restart") {
    val root = tmpTable("graft-lkstream-pin-latest")
    val ckpt = tmpDir("graft-lkstream-pin-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8) // v0

    // first start at latest: nothing emitted, NO offset checkpointed
    drainOnce(readLake(root, Map("startingVersion" -> "latest")), ckpt, sink)
    assert(sink.isEmpty)

    // table advances while the stream is down
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8) // v1

    // restart: "latest" must still mean v0 (the first start), so v1's
    // rows arrive — a per-restart re-resolution would skip them
    drainOnce(readLake(root, Map("startingVersion" -> "latest")), ckpt, sink)
    assert(sink.toSet === Set(Seq(2L, "b")))
  }

  test("a start version pruned past marker retention is refused, not duplicated") {
    val root = tmpTable("graft-lkstream-pruned")
    val ckpt = tmpDir("graft-lkstream-pruned-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8) // v0
    drainOnce(readLake(root), ckpt, sink) // checkpoint offset = 0

    // retain=0 commits prune _commit_0 while the stream is down
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 0)
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_commit_0")))

    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainOnce(readLake(root), ckpt, sink)
    }
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("pruned past retention"))))
  }

  test("a dir-removing commit is refused; ignoreDeletes streams only added dirs") {
    val root = tmpTable("graft-lkstream-rm")
    val ckpt = tmpDir("graft-lkstream-rm-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root, retain = 8)
    drainOnce(readLake(root), ckpt, sink)
    assert(sink.size === 2)

    // an overwrite removes v0's dir from the snapshot
    Lake.commitOverwrite(Seq((9L, "z")).toDF("k", "t"), root, retain = 8)

    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainOnce(readLake(root), ckpt, sink)
    }
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("ignoreDeletes"))))

    // the escape hatch: the overwrite's NEW dir streams through
    sink.clear()
    drainOnce(readLake(root, Map("ignoreDeletes" -> "true")), ckpt, sink)
    assert(sink.toSet === Set(Seq(9L, "z")))
  }

  test("row-preserving maintenance (compact/zorder) streams nothing — no refusal, no duplicates") {
    val root = tmpTable("graft-lkstream-compact")
    val ckpt = tmpDir("graft-lkstream-compact-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    drainOnce(readLake(root), ckpt, sink)
    assert(sink.size === 2)

    // compaction collapses the fragmented snapshot (removes + adds
    // dirs, rows identical), then a real append lands on top
    Lake.compactCommitted(spark, root, retain = 8)
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 8)

    sink.clear()
    drainOnce(readLake(root), ckpt, sink)
    assert(sink.toSet === Set(Seq(3L, "c")))
  }

  test("maxVersionsPerTrigger drains a backlog in bounded batches, AvailableNow to the end") {
    val root = tmpTable("graft-lkstream-throttle")
    val ckpt = tmpDir("graft-lkstream-throttle-ckpt")
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    (0 until 6).foreach { i =>
      Lake.commitAppend(Seq((i.toLong, s"t$i")).toDF("k", "t"), root, retain = 8)
      ()
    }
    val q = readLake(root, Map("startingVersion" -> "0",
        "maxVersionsPerTrigger" -> "2"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        batchSizes.synchronized { batchSizes += n }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // six single-row commits at 2 versions/trigger = three 2-row batches
    assert(batchSizes.toSeq === Seq(2L, 2L, 2L))
  }

  test("maxVersionsPerTrigger on pruned history anchors at a committed version, not a wedged offset") {
    val root = tmpTable("graft-lkstream-clamp")
    val ckpt = tmpDir("graft-lkstream-clamp-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8) // v0
    // retain=0 commits prune the early markers — the exact backlog
    // case the throttle targets (long history, narrow retention)
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 0) // v1
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 0) // v2
    // fresh stream from birth, 1 version/trigger: -1+1 = 0 is NOT a
    // committed version anymore — an unclamped cap would checkpoint
    // offset 0 and the next batch would wedge on the start-version
    // guard; the clamp anchors at the smallest surviving committed
    // version instead, and the drain completes
    drainOnce(readLake(root, Map("maxVersionsPerTrigger" -> "1")), ckpt, sink)
    assert(sink.toSet === Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // the checkpointed offset is reconstructible: a restart is clean
    sink.clear()
    drainOnce(readLake(root, Map("maxVersionsPerTrigger" -> "1")), ckpt, sink)
    assert(sink.isEmpty)
  }

  test("a lagging stream whose unread pre-compaction dir was swept gets the retention refusal") {
    val root = tmpTable("graft-lkstream-swept")
    val ckpt = tmpDir("graft-lkstream-swept-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8) // v0
    drainOnce(readLake(root), ckpt, sink) // checkpoint offset = 0
    // while the stream lags: an append it has not read, then a
    // compaction that un-references that dir
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8) // v1
    Lake.compactCommitted(spark, root, retain = 8)                     // v2
    // the dir the lagging range names is swept out-of-band (a
    // concurrent writer's prune racing this reader, or an
    // object-store lifecycle rule) while its manifest survives
    val d1 = (Lake.snapshotDirNames(spark, root, 1L).toSet --
      Lake.snapshotDirNames(spark, root, 0L)).head
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(root, d1), true))

    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainOnce(readLake(root), ckpt, sink)
    }
    // a curated refusal naming the retention fix, not a raw parquet
    // path-not-found from the scan
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("retention swept"))))
  }

  test("readChangeFeed composes with startingTimestamp: only post-instant changes stream") {
    import org.apache.spark.sql.functions.col
    val root = tmpTable("graft-lkstream-cdf-ts")
    val ckpt = tmpDir("graft-lkstream-cdf-ts-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root,
      retain = 8)                                              // v0
    Thread.sleep(1200)
    val boundary = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    Thread.sleep(1200)
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 8) // v1
    Lake.deleteWhere(spark, root, col("k") === 1L, retain = 8)         // v2 (DV)
    // the CDF stream anchored at the instant: v0 predates it and is
    // NOT replayed; the post-instant append and the DV delete arrive
    // as exact row-level changes with their commit versions
    drainOnce(readLake(root, Map("readChangeFeed" -> "true",
      "keyCols" -> "k", "startingTimestamp" -> boundary)), ckpt, sink)
    assert(sink.toSet === Set(
      Seq(3L, "c", "insert", 1L),
      Seq(1L, "a", "delete", 2L)))
  }

  test("readChangeFeed: merge-heavy history streams as exact row-level changes") {
    val root = tmpTable("graft-lkstream-cdf")
    val ckpt = tmpDir("graft-lkstream-cdf-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("k", "t", "ver"),
      root, retain = 8)
    def readCdf = readLake(root,
      Map("readChangeFeed" -> "true", "keyCols" -> "k"))

    // first batch: the bootstrap snapshot as inserts at version 0
    drainOnce(readCdf, ckpt, sink)
    assert(sink.toSet === Set(
      Seq(1L, "a", 0L, "insert", 0L), Seq(2L, "b", 0L, "insert", 0L)))

    // a merge (update k=2, delete k=1, insert k=3), a compaction
    // (layout-only: contributes NOTHING), and an append land while
    // the stream is down
    Lake.mergeCommitted(spark, root,
      Seq((2L, "B", 10L, false), (1L, "a", 11L, true), (3L, "c", 12L, false))
        .toDF("k", "t", "ver", "is_del"),
      Seq("k"), "ver", "is_del", retain = 8)                          // v1
    Lake.compactCommitted(spark, root, retain = 8)                    // v2
    Lake.commitAppend(Seq((4L, "d", 13L)).toDF("k", "t", "ver"), root,
      retain = 8)                                                      // v3

    sink.clear()
    drainOnce(readCdf, ckpt, sink)
    // the merge's images tag v1; the compaction is silent; the append
    // is a plain insert at v3
    assert(sink.toSet === Set(
      Seq(2L, "b", 0L, "update_preimage", 1L),
      Seq(2L, "B", 10L, "update_postimage", 1L),
      Seq(1L, "a", 0L, "delete", 1L),
      Seq(3L, "c", 12L, "insert", 1L),
      Seq(4L, "d", 13L, "insert", 3L)))

    // nothing new → nothing emitted
    sink.clear()
    drainOnce(readCdf, ckpt, sink)
    assert(sink.isEmpty)

    // option validation surfaces at start(): keys are required,
    // ignoreDeletes does not compose
    def startWith(opts: (String, String)*): Throwable =
      intercept[Exception] { // surfaces sync (analysis) or wrapped (run)
        val q = opts.foldLeft(
          spark.readStream.format("graft-lake").option("root", root)
        ) { case (r, (k, v)) => r.option(k, v) }.load()
          .writeStream.format("memory").queryName("lkstream_cdf_opts")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(startWith("readChangeFeed" -> "true")).exists(c =>
      Option(c.getMessage).exists(_.contains("keyCols"))))
    assert(causes(startWith("readChangeFeed" -> "true", "keyCols" -> "k",
        "ignoreDeletes" -> "true")).exists(c =>
      Option(c.getMessage).exists(_.contains("does not compose"))))
  }

  test("readChangeFeed E2E: a streamed MV fold equals the batch recompute at every version") {
    val root = tmpTable("graft-lkstream-cdf-mv")
    val replica = tmpTable("graft-lkstream-cdf-replica")
    val ckpt = tmpDir("graft-lkstream-cdf-mv-ckpt")
    Lake.commitAppend(Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("k", "t", "ver"),
      root, retain = 16)

    def drainFold(): Unit = {
      val q = readLake(root, Map("readChangeFeed" -> "true",
          "keyCols" -> "k", "maxVersionsPerTrigger" -> "1"))
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val vs = batch.agg(max(col("commit_version"))).collect().head
          if (!vs.isNullAt(0)) {
            val v = vs.getLong(0)
            val changes = batch
              .where(col("change_type") =!= "update_preimage")
              .withColumn("is_del", col("change_type") === "delete")
              .select("k", "t", "ver", "commit_version", "is_del")
            if (Lake.currentVersion(spark, replica).isEmpty)
              Lake.commitOverwrite(changes.where(!col("is_del"))
                .drop("is_del"), replica, retain = 16)
            else
              Lake.mergeCommitted(spark, replica, changes,
                Seq("k"), "commit_version", "is_del", retain = 16)
            // THE invariant: after folding version v's changes, the
            // replica equals the source's snapshot AT v — the MV fold
            // tracks the table exactly, version by version
            assert(rows(Lake.readCommitted(spark, replica)
                .select("k", "t")) ===
              rows(Lake.readCommittedAt(spark, root, v).select("k", "t")),
              s"replica diverged from source at version $v")
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drainFold() // bootstrap snapshot
    // merge-heavy history: upserts, deletes, maintenance, appends
    Lake.mergeCommitted(spark, root,
      Seq((2L, "B", 1L, false), (3L, "c", 2L, false))
        .toDF("k", "t", "ver", "is_del"), Seq("k"), "ver", "is_del",
      retain = 16)                                                     // v1
    Lake.mergeCommitted(spark, root,
      Seq((1L, "a", 3L, true)).toDF("k", "t", "ver", "is_del"),
      Seq("k"), "ver", "is_del", retain = 16)                          // v2
    Lake.compactCommitted(spark, root, retain = 16)                    // v3
    Lake.commitAppend(Seq((5L, "e", 4L)).toDF("k", "t", "ver"), root,
      retain = 16)                                                     // v4
    Lake.deleteWhere(spark, root, col("k") === 2L, retain = 16)        // v5
    drainFold() // resumes from the checkpoint, one version per batch

    // final state: fold == live table
    assert(rows(Lake.readCommitted(spark, replica).select("k", "t")) ===
      Set(Seq(3L, "c"), Seq(5L, "e")))
  }

  test("schema pinned at start: an evolved append streams under the start schema") {
    val root = tmpTable("graft-lkstream-evo")
    val ckpt = tmpDir("graft-lkstream-evo-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    drainOnce(readLake(root), ckpt, sink)

    Lake.commitAppend(Seq((2L, "b", 20L)).toDF("k", "t", "extra"), root, retain = 8)
    sink.clear()
    // a RESUMED stream re-resolves the source schema at start-up; the
    // checkpointed offsets still mean "version 0 done", so only the
    // evolved batch arrives — under whatever schema this run resolved
    drainOnce(readLake(root), ckpt, sink)
    assert(sink.map(_.take(2)).toSet === Set(Seq(2L, "b")))
  }

  test("a MID-STREAM schema widening refuses the batch naming the restart path; the restarted query picks it up") {
    val root = tmpTable("graft-lkstream-widen")
    val ckpt = tmpDir("graft-lkstream-widen-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    val q = readLake(root).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val got = batch.collect().map(_.toSeq)
        sink.synchronized { sink ++= got }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(sink.toSet === Set(Seq(1L, "a")))
      // the running query's schema is pinned; a widened append must
      // REFUSE its batch (silent column loss otherwise), telling the
      // operator to restart the query
      Lake.commitAppend(Seq((2L, "b", 20L)).toDF("k", "t", "extra"),
        root, retain = 8)
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.toString.contains("evolved past the stream") ||
        Option(e.getCause).exists(_.toString.contains("evolved past the stream")),
        s"expected the schema-evolution refusal, got: $e")
    } finally { scala.util.Try(q.stop()); () }
    // restart on the SAME checkpoint: the source re-pins the widened
    // schema, offsets continue — exactly the evolved batch arrives,
    // new column populated
    sink.clear()
    drainOnce(readLake(root), ckpt, sink)
    assert(sink.toSet === Set(Seq(2L, "b", 20L)))
  }

  test("CDF mode refuses a mid-stream widening too; the restarted feed carries the new column") {
    val root = tmpTable("graft-lkstream-widen-cdf")
    val ckpt = tmpDir("graft-lkstream-widen-cdf-ckpt")
    val opts = Map("readChangeFeed" -> "true", "keyCols" -> "k")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    val q = readLake(root, opts).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val got = batch.collect().map(_.toSeq)
        sink.synchronized { sink ++= got }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(sink.map(_.take(3)).toSet === Set(Seq(1L, "a", "insert")))
      Lake.commitAppend(Seq((2L, "b", 20L)).toDF("k", "t", "extra"),
        root, retain = 8)
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.toString.contains("evolved past the stream") ||
        Option(e.getCause).exists(_.toString.contains("evolved past the stream")),
        s"expected the schema-evolution refusal, got: $e")
    } finally { scala.util.Try(q.stop()); () }
    sink.clear()
    drainOnce(readLake(root, opts), ckpt, sink)
    assert(sink.map(_.take(4)).toSet === Set(Seq(2L, "b", 20L, "insert")))
  }

  test("writeStream sink: micro-batches append; checkpoint restart appends only new data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpTable("graft-lksink")
    val ckpt = tmpDir("graft-lksink-ckpt")
    val src = MemoryStream[(Long, String)]
    src.addData((1L, "a"), (2L, "b"))

    def runOnce(): java.util.UUID = {
      val q = src.toDF().toDF("k", "t").writeStream.format("graft-lake")
        .option("root", root).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.id
    }
    val id1 = runOnce()
    assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(1L, "a"), Seq(2L, "b")))

    src.addData((3L, "c"))
    val id2 = runOnce()
    // the query id is persisted in the checkpoint — both runs share it
    assert(id1 === id2)
    assert(rows(Lake.readCommitted(spark, root)) ===
      Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))

    // the commit provenance names the stream: the REAL persisted query
    // id (a "manual" fallback here would break the recreated-
    // checkpoint protection), plus the batch id
    val ops = Lake.describeHistory(spark, root).select("op")
      .collect().map(_.getString(0)).toSeq
    assert(ops.forall(_.startsWith(s"stream-append lineage=$id1 batch=")), ops)
  }

  test("sink replay skips within a lineage; a new lineage is never swallowed") {
    import graft.sources.LakeStreamSink
    val root = tmpTable("graft-lksink-replay")
    val sc = spark.sparkContext
    val sink = new LakeStreamSink(root, retain = 8, Nil, Nil)
    try {
      sc.setLocalProperty("sql.streaming.queryId", "lin-a")
      sink.addBatch(0, Seq((1L, "a")).toDF("k", "t"))
      // crash-replay of the SAME batch: commits nothing
      sink.addBatch(0, Seq((1L, "a")).toDF("k", "t"))
      assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(1L, "a")))
      sink.addBatch(1, Seq((2L, "b")).toDF("k", "t"))
      assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(1L, "a"), Seq(2L, "b")))

      // a RECREATED checkpoint restarts batch ids under a new query
      // id — the old lineage's high-water mark must not swallow it
      sc.setLocalProperty("sql.streaming.queryId", "lin-b")
      sink.addBatch(0, Seq((3L, "c")).toDF("k", "t"))
      assert(rows(Lake.readCommitted(spark, root)) ===
        Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))

      // empty batches commit nothing (no version churn per idle trigger)
      val before = Lake.currentVersion(spark, root)
      sink.addBatch(1, Seq.empty[(Long, String)].toDF("k", "t"))
      assert(Lake.currentVersion(spark, root) === before)

      // no query id on the thread → refused: a shared fallback
      // lineage would let independent writers swallow each other
      sc.setLocalProperty("sql.streaming.queryId", null)
      val err = intercept[IllegalStateException] {
        sink.addBatch(2, Seq((4L, "d")).toDF("k", "t"))
      }
      assert(err.getMessage.contains("sql.streaming.queryId"))
    } finally sc.setLocalProperty("sql.streaming.queryId", null)
  }

  test("OCC crosses the stream/batch boundary: a batch appender inside a sink commit is not lost") {
    import graft.sources.LakeStreamSink
    val root = tmpTable("graft-lksink-occ")
    val sc = spark.sparkContext
    val sink = new LakeStreamSink(root, retain = 8, Nil, Nil)
    try {
      sc.setLocalProperty("sql.streaming.queryId", "lin-occ")
      sink.addBatch(0, Seq((1L, "a")).toDF("k", "t")) // v0
      // a BATCH appender (a backfill job, a second pipeline) lands
      // inside the sink's next commit window — the sink's append must
      // lose the slot, rebase, and commit WITH the interloper's dir
      Lake.beforePublish = () => {
        Lake.beforePublish = () => ()
        Lake.commitAppend(Seq((9L, "batch")).toDF("k", "t"), root, retain = 8)
        ()
      }
      sink.addBatch(1, Seq((2L, "b")).toDF("k", "t"))
      assert(rows(Lake.readCommitted(spark, root)) ===
        Set(Seq(1L, "a"), Seq(9L, "batch"), Seq(2L, "b")))
      // the sink's effectively-once lineage survived the rebase: a
      // crash-replay of the same batch id still commits nothing
      val before = Lake.currentVersion(spark, root)
      sink.addBatch(1, Seq((2L, "b")).toDF("k", "t"))
      assert(Lake.currentVersion(spark, root) === before)
    } finally {
      Lake.beforePublish = () => ()
      sc.setLocalProperty("sql.streaming.queryId", null)
    }
  }

  test("randomized protocol: appends, compactions and drains in any interleaving stream each row exactly once") {
    // seeded — failures reproduce; the drain uses the SAME checkpoint
    // throughout, so every random prefix exercises restart-resume
    val rnd = new scala.util.Random(20260814L)
    val root = tmpTable("graft-lkstream-rand")
    val ckpt = tmpDir("graft-lkstream-rand-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val committed = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var nextK = 0L
    // seed commit so the source can resolve a schema at first drain
    Lake.commitAppend(Seq((nextK, s"t$nextK")).toDF("k", "t"), root, retain = 16)
    committed += ((nextK, s"t$nextK")); nextK += 1
    (1 to 30).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 | 1 => // append 1-3 rows
          val rows = (0 until (1 + rnd.nextInt(3))).map { _ =>
            val r = (nextK, s"t$nextK"); nextK += 1; r
          }
          Lake.commitAppend(rows.toDF("k", "t"), root, retain = 16)
          committed ++= rows.map { case (k, t) => (k, t) }
        case 2 => // layout-only maintenance: must stream NOTHING
          Lake.compactCommitted(spark, root, retain = 16)
          ()
        case 3 => // drain through the shared checkpoint
          drainOnce(readLake(root), ckpt, sink)
      }
    }
    drainOnce(readLake(root), ckpt, sink)
    // exactly once: multiset equality (duplicates would survive a Set)
    val streamed = sink.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[String]))
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = committed.groupBy(identity).view.mapValues(_.size).toMap
    assert(streamed === expected)
  }

  test("provider option validation: every bad knob is refused with its reason") {
    val root = tmpTable("graft-lkstream-opts")
    Lake.commitAppend(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    // missing root
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-lake").load()
    }
    // bad startingVersion / maxVersionsPerTrigger surface at start()
    def startWith(opts: (String, String)*): Throwable = {
      val q = opts.foldLeft(
        spark.readStream.format("graft-lake").option("root", root)
      ) { case (r, (k, v)) => r.option(k, v) }.load()
        .writeStream.format("memory").queryName("lkstream_opts")
        .trigger(Trigger.AvailableNow()).start()
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination()
      }
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(startWith("startingVersion" -> "nope"))
      .exists(c => Option(c.getMessage).exists(_.contains("startingVersion"))))
    assert(causes(startWith("maxVersionsPerTrigger" -> "0"))
      .exists(c => Option(c.getMessage).exists(_.contains("maxVersionsPerTrigger"))))
    // sink: aggregate output modes and partitionBy are refused up front
    val counts = readLake(root).groupBy("t").count()
    val e1 = intercept[Exception] {
      counts.writeStream.format("graft-lake").option("root", root)
        .outputMode("complete")
        .option("checkpointLocation", tmpDir("graft-lkstream-opts-c"))
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(causes(e1).exists(c =>
      Option(c.getMessage).exists(_.contains("append-only"))))
    val e2 = intercept[Exception] {
      readLake(root).writeStream.format("graft-lake").option("root", root)
        .partitionBy("t")
        .option("checkpointLocation", tmpDir("graft-lkstream-opts-p"))
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(causes(e2).exists(c =>
      Option(c.getMessage).exists(_.contains("partitionBy"))))
  }

  test("randomized E2E: lake -> stream transform -> lake stays exactly the batch transform") {
    // seeded random interleaving of ingest commits and ETL drains; the
    // invariant after every drain is the q133 contract — the derived
    // table equals the one-shot batch transform of everything ingested
    val rnd = new scala.util.Random(20260814L)
    val raw = tmpTable("graft-lkstream-e2e-raw")
    val out = tmpTable("graft-lkstream-e2e-out")
    val ckpt = tmpDir("graft-lkstream-e2e-ckpt")
    var nextK = 0L
    def ingest(n: Int): Unit = {
      val rows = (0 until n).map { _ =>
        val r = (nextK, if (nextK % 3 == 0) 100L + nextK else nextK)
        nextK += 1; r
      }
      Lake.commitAppend(rows.toDF("k", "v"), raw, retain = 16)
      ()
    }
    def drain(): Unit = {
      val q = readLake(raw)
        .where(col("v") >= 100L)
        .select(col("k"), (col("v") * 2L).as("v2"))
        .writeStream.format("graft-lake").option("root", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    ingest(3) // the source needs an existing table for its schema
    (1 to 24).foreach { _ =>
      if (rnd.nextBoolean()) ingest(1 + rnd.nextInt(3)) else drain()
    }
    drain()
    val expected = Lake.readCommitted(spark, raw)
      .where(col("v") >= 100L)
      .select(col("k"), (col("v") * 2L).as("v2"))
    assert(rows(Lake.readCommitted(spark, out)) === rows(expected))
  }

  test("composition: lake source feeds a downstream fold exactly once") {
    val root = tmpTable("graft-lkstream-fold")
    val ckpt = tmpDir("graft-lkstream-fold-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitAppend(
      Seq(("de", 10L), ("de", 20L), ("fr", 5L)).toDF("lang", "n"),
      root, retain = 8)
    drainOnce(readLake(root), ckpt, sink)
    Lake.commitAppend(Seq(("de", 30L)).toDF("lang", "n"), root, retain = 8)
    drainOnce(readLake(root), ckpt, sink)

    // every committed row arrived exactly once — the aggregate over
    // the streamed rows equals the aggregate over the live table
    val streamed = sink.map(r => (r(0).asInstanceOf[String], r(1).asInstanceOf[Long]))
      .toSeq.toDF("lang", "n")
      .groupBy("lang").agg(count(lit(1)).as("n_rows"), sum("n").as("sum_n"))
    val direct = Lake.readCommitted(spark, root).groupBy("lang")
      .agg(count(lit(1)).as("n_rows"), sum("n").as("sum_n"))
    assert(rows(streamed) === rows(direct))
  }

  test("readChangeFeed with NO keyCols: a row-tracked table streams the keyless feed") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = tmpTable("graft-lkstream-cdf-keyless")
    val ckpt = tmpDir("graft-lkstream-cdf-keyless-ckpt")
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    Lake.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root,
      retain = 8, rowTracking = true)                          // v0
    def readCdf = readLake(root, Map("readChangeFeed" -> "true"))
    // bootstrap: the snapshot as inserts; the hidden row id never leaks
    drainOnce(readCdf, ckpt, sink)
    assert(sink.toSet === Set(
      Seq(1L, "a", "insert", 0L), Seq(2L, "b", "insert", 0L)))
    sink.clear()
    // an UPDATE pairs on the stable row id — exact pre/postimages
    // with no key contract anywhere in the stream options
    Lake.updateWhere(spark, root, col("k") === 2L,
      Map("t" -> lit("B")), retain = 8)                        // v1
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 8) // v2
    drainOnce(readCdf, ckpt, sink)
    assert(sink.toSet === Set(
      Seq(2L, "b", "update_preimage", 1L),
      Seq(2L, "B", "update_postimage", 1L),
      Seq(3L, "c", "insert", 2L)))
    // an UNTRACKED table refuses the keyless spelling with the remedy
    val plain = tmpTable("graft-lkstream-cdf-plainrefuse")
    Lake.commitOverwrite(Seq((1L, "x")).toDF("k", "t"), plain, retain = 8)
    val e = intercept[IllegalArgumentException] {
      readLake(plain, Map("readChangeFeed" -> "true")).schema
    }
    assert(e.getMessage.contains("row id") ||
      e.getMessage.contains("keyCols"))
  }

  test("maxBytesPerTrigger splits a backlog at version-byte boundaries; an over-budget version still admits alone") {
    val root = tmpTable("graft-lkstream-bytecap")
    val ckpt = tmpDir("graft-lkstream-bytecap-ckpt")
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    // one LARGE version (5000 rows) then four tiny single-row commits —
    // the version-count throttle alone would happily take the big one
    // plus neighbors in one trigger
    Lake.commitAppend((1L to 5000L).map(k => (k, s"t$k")).toDF("k", "t"),
      root, retain = 8)
    (1 to 4).foreach { i =>
      Lake.commitAppend(Seq((10000L + i, s"s$i")).toDF("k", "t"), root,
        retain = 8)
      ()
    }
    // budget below the big version's size: it must still admit (alone —
    // the at-least-one progress rule), and the tiny commits then pack
    // together under the budget instead of one-per-trigger
    val q = readLake(root, Map("startingVersion" -> "0",
        "maxBytesPerTrigger" -> "4096"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        batchSizes.synchronized { batchSizes += n }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sizes = batchSizes.toSeq
    assert(sizes.head === 5000L,
      s"the over-budget version must admit alone, got $sizes")
    assert(sizes.sum === 5004L, s"every row must arrive exactly once: $sizes")
    assert(sizes.length >= 2 && sizes.tail.forall(_ <= 4L),
      s"later versions must respect the byte budget: $sizes")
  }

}
