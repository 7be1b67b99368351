package graft

import graft.sources.{HadoopLogStore, Lake, LakeLogStore}
import org.apache.spark.sql.functions._

/** The put-if-absent commit seam ([[graft.sources.LakeLogStore]]).
  * The OCC suite already proves winner/loser behavior through the
  * default store; this spec drives a lost race through an INJECTED
  * implementation — proving the protocol's concurrency outcomes are a
  * property of the seam's contract, not of the hard-link/rename
  * implementation detail (an S3 conditional-put store slots in the
  * same way). */
class LakeLogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  /** A store whose FIRST manifest publish races a real interloping
    * commit into the slot before delegating — the delegate then
    * reports the loss exactly as a concurrent writer would cause. */
  private final class RacingStore(interloper: () => Unit)
      extends LakeLogStore {
    @volatile var fired = false
    override def publishIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
        tmp: org.apache.hadoop.fs.Path,
        dest: org.apache.hadoop.fs.Path): Boolean = {
      if (!fired && dest.getName.startsWith("_commit_")) {
        fired = true // before the interloper commits: its own publish recurses here
        interloper()
      }
      HadoopLogStore.publishIfAbsent(fs, tmp, dest)
    }
  }

  test("append loses the injected race, rebases, and commits — no lost rows either side") {
    val root = tmpTable("graft-logstore-append")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.logStore = new RacingStore(() =>
      Lake.commitAppend(Seq((50L, "x")).toDF("k", "t"), root, retain = 8))
    try Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    finally Lake.logStore = HadoopLogStore
    assert(rows(Lake.readCommitted(spark, root)) ===
      Set(Seq(1L, "a"), Seq(50L, "x"), Seq(2L, "b")))
  }

  test("a maintenance commit loses its pinned slot through the injected store and refuses loudly; a clean retry works") {
    val root = tmpTable("graft-logstore-maint")
    Lake.commitOverwrite((1L to 30L).map(i => (i, s"r$i")).toDF("k", "t"),
      root, retain = 8)
    Lake.logStore = new RacingStore(() =>
      Lake.commitAppend(Seq((99L, "x")).toDF("k", "t"), root, retain = 8))
    try {
      intercept[java.util.ConcurrentModificationException] {
        Lake.deleteWhere(spark, root, col("k") <= 3L, retain = 8,
          dvMaxRows = 0L) // force the COW path: DV fast path not in scope
      }
    } finally Lake.logStore = HadoopLogStore
    // nothing lost: the interloper's row is live, the delete did NOT
    // half-apply
    assert(Lake.readCommitted(spark, root).count() === 31L)
    Lake.deleteWhere(spark, root, col("k") <= 3L, retain = 8)
    assert(Lake.readCommitted(spark, root).count() === 28L)
  }

  test("pinSlot: a dirs-lost marker's burned slot is skipped; the commit lands past it") {
    val root = tmpTable("graft-logstore-burned")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    // out-of-protocol damage: marker v2 exists but its data dir is
    // gone (a partial backup restore) — currentVersion resolves v1,
    // and the slot number 2 is burned forever
    val p = java.nio.file.Paths.get(root, "_commit_2")
    java.nio.file.Files.write(p, "vmissing-dir\n#op=append".getBytes("UTF-8"))
    assert(Lake.currentVersion(spark, root).get === 1L)
    // a metadata commit carrying v1 state must NOT pin slot 2 (it
    // would collide with the burned marker forever) — it lands at 3
    val v = Lake.setTableProperties(spark, root, Map("owner" -> "x"))
    assert(v === 3L)
    assert(Lake.currentVersion(spark, root).get === 3L)
    assert(Lake.tableProperties(spark, root)("owner") === "x")
    assert(Lake.readCommitted(spark, root).count() === 2L)
    // DML pins past it the same way
    Lake.deleteWhere(spark, root, col("k") === 1L, retain = 8)
    assert(Lake.currentVersion(spark, root).get === 4L)
    assert(Lake.readCommitted(spark, root).count() === 1L)
  }

  test("a torn publish (store threw) leaves no readable commit and the retry succeeds") {
    val root = tmpTable("graft-logstore-torn")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    val v0 = Lake.currentVersion(spark, root).get
    object ThrowingStore extends LakeLogStore {
      override def publishIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
          tmp: org.apache.hadoop.fs.Path,
          dest: org.apache.hadoop.fs.Path): Boolean =
        throw new java.io.IOException("injected store outage")
    }
    Lake.logStore = ThrowingStore
    try {
      intercept[java.io.IOException] {
        Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
      }
    } finally Lake.logStore = HadoopLogStore
    // the failed publish is not a commit: same live version, same rows
    assert(Lake.currentVersion(spark, root).get === v0)
    assert(Lake.readCommitted(spark, root).count() === 1L)
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    assert(Lake.readCommitted(spark, root).count() === 2L)
  }

  // -- ObjectStoreLogStore: the S3-conditional-put conformance impl --

  test("the whole protocol runs through conditional-put semantics (no rename, no link)") {
    val store = new graft.sources.ObjectStoreLogStore
    val root = tmpTable("graft-objstore-e2e")
    Lake.logStore = store
    try {
      // overwrite, appends, update, delete, compact, time travel,
      // properties, DV — every commit publishes as a conditional PUT
      Lake.commitOverwrite((1L to 20L).map(i => (i, s"r$i")).toDF("k", "t"),
        root, retain = 8)
      Lake.commitAppend(Seq((21L, "x")).toDF("k", "t"), root, retain = 8)
      Lake.updateWhere(spark, root, col("k") === 5L,
        Map("t" -> lit("upd")), retain = 8)
      Lake.deleteWhere(spark, root, col("k") === 7L, retain = 8)
      Lake.setTableProperties(spark, root, Map("owner" -> "obj"))
      Lake.compactCommitted(spark, root, minBytes = Long.MaxValue,
        retain = 8)
      assert(Lake.readCommitted(spark, root).count() === 20L)
      assert(rows(Lake.readCommitted(spark, root)
        .where(col("k") === 5L)) === Set(Seq(5L, "upd")))
      // time travel works through the store too (pre-compact snapshot;
      // the property commit ran at the table's default retention, so
      // the earliest versions are legitimately pruned)
      assert(Lake.readCommittedAt(spark, root,
        Lake.currentVersion(spark, root).get - 1).count() === 20L)
      assert(store.puts >= 6 && store.conflicts === 0)
    } finally Lake.logStore = graft.sources.HadoopLogStore
  }

  test("a contested slot surfaces as the 412 branch; the loser rebases like any OCC loss") {
    val store = new graft.sources.ObjectStoreLogStore
    val root = tmpTable("graft-objstore-race")
    Lake.logStore = store
    try {
      Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
      // interlope through the SAME store: the loser's publish hits
      // the existence check (the 412), reports false, and the append
      // rebases — identical protocol outcome to the rename/link store
      var fired = false
      val racing = new LakeLogStore {
        override def publishIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
            tmp: org.apache.hadoop.fs.Path,
            dest: org.apache.hadoop.fs.Path): Boolean = {
          if (!fired && dest.getName.startsWith("_commit_")) {
            fired = true
            Lake.commitAppend(Seq((50L, "x")).toDF("k", "t"), root,
              retain = 8)
          }
          store.publishIfAbsent(fs, tmp, dest)
        }
      }
      Lake.logStore = racing
      Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
      assert(rows(Lake.readCommitted(spark, root)) ===
        Set(Seq(1L, "a"), Seq(50L, "x"), Seq(2L, "b")))
      assert(store.conflicts === 1, "exactly one 412 loss expected")
    } finally Lake.logStore = graft.sources.HadoopLogStore
  }

  test("a torn conditional PUT raises, leaves dest absent, and never reads as a clean loss") {
    val store = new graft.sources.ObjectStoreLogStore
    val root = tmpTable("graft-objstore-torn")
    Lake.logStore = store
    try {
      Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
      val v0 = Lake.currentVersion(spark, root).get
      store.failNextPut = Some(() =>
        new java.io.IOException("simulated network tear mid-upload"))
      intercept[java.io.IOException] {
        Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
      }
      // nothing became visible; the table is intact and a retry wins
      assert(Lake.currentVersion(spark, root).get === v0)
      assert(Lake.readCommitted(spark, root).count() === 1L)
      Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
      assert(Lake.readCommitted(spark, root).count() === 2L)
    } finally Lake.logStore = graft.sources.HadoopLogStore
  }

  test("an append lands mid-compaction through the injected store: the compaction REBASES and both data sets are intact") {
    val root = tmpTable("graft-logstore-compact")
    (0 until 3).foreach { b =>
      Lake.commitAppend((1L to 20L).map(i => (b * 100L + i, s"r$i"))
        .toDF("k", "t"), root, retain = 8)
      ()
    }
    Lake.logStore = new RacingStore(() =>
      Lake.commitAppend(Seq((9001L, "mid")).toDF("k", "t"), root,
        retain = 8))
    try {
      // the compaction loses its pinned slot to the interloping append
      // through the store's 412 branch, re-reads the log, sees an
      // append-shaped (dir-disjoint) interloper, re-pins and publishes
      // — Delta's disjoint-file OPTIMIZE conflict rule
      val vc = Lake.compactCommitted(spark, root, targetBytes = 1L << 20,
        retain = 8)
      assert(Lake.currentVersion(spark, root) === Some(vc))
      assert(Lake.readCommitted(spark, root).count() === 61L)
      assert(Lake.readCommitted(spark, root)
        .where(col("k") === 9001L).count() === 1L)
      // replay: the interloper's own version serves its snapshot too
      assert(Lake.readCommittedAt(spark, root, vc - 1).count() === 61L)
    } finally Lake.logStore = HadoopLogStore
  }

}
