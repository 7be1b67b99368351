package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Lake

/** The round-19 memory-bound optimizations (guide §5 — the driver
  * should do almost no data work, and must not silently pin tens of
  * GB of metadata): every Lake metadata cache is bounded by WEIGHT
  * (retained lines / derived entries), not just entry count, and the
  * stream source's per-version byte memo evicts LRU instead of
  * clearing wholesale. */
class LakeCacheBudgetSpec extends AnyFunSuite {

  private def bigBody(id: Int, lines: Int): Seq[String] =
    (0 until lines).map(i => s"v${id}_dir_$i")

  test("MetaCache evicts by total weight, oldest-first, newest always admitted") {
    val c = new Lake.MetaCache[Seq[String]](maxEntries = 10, maxWeight = 100,
      _.size.toLong)
    c.put("a", 1, 1, bigBody(1, 40))
    c.put("b", 1, 1, bigBody(2, 40))
    assert(c.retainedWeight == 80 && c.entryCount == 2)
    // third 40-line entry crosses the 100-line budget: "a" (eldest) evicts
    c.put("c", 1, 1, bigBody(3, 40))
    assert(c.retainedWeight == 80 && c.entryCount == 2)
    assert(c.get("a", 1, 1).isEmpty, "eldest entry must have been evicted")
    assert(c.get("b", 1, 1).nonEmpty && c.get("c", 1, 1).nonEmpty)
    // access refreshes recency: touch "b", insert "d" — now "c" is eldest
    c.get("b", 1, 1)
    c.put("d", 1, 1, bigBody(4, 40))
    assert(c.get("c", 1, 1).isEmpty && c.get("b", 1, 1).nonEmpty)
    // an entry BIGGER than the whole budget is still admitted (the
    // cache must always hold the working snapshot) and evicts the rest
    c.put("huge", 1, 1, bigBody(5, 500))
    assert(c.get("huge", 1, 1).nonEmpty)
    assert(c.entryCount == 1 && c.retainedWeight == 500)
    // (modTime, len) validation still gates hits
    assert(c.get("huge", 2, 1).isEmpty)
    c.clear()
    assert(c.retainedWeight == 0 && c.entryCount == 0)
  }

  test("MetaCache replaces an entry's weight on re-put, no double count") {
    val c = new Lake.MetaCache[Seq[String]](10, 1000, _.size.toLong)
    c.put("k", 1, 1, bigBody(1, 300))
    c.put("k", 2, 2, bigBody(1, 100)) // re-written file: new stamp, new body
    assert(c.retainedWeight == 100 && c.entryCount == 1)
    assert(c.get("k", 2, 2).map(_.size).contains(100))
  }

  test("lake reads stay correct across cache eviction and clearing") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cache-budget").toString
    Lake.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root,
      retain = 1, statsCols = Seq("k"))
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 1)
    val before = Lake.readCommitted(spark, root).orderBy("k").collect().toSeq
    assert(Lake.manifestCache.retainedWeight > 0,
      "manifest reads must populate the weighted cache")
    Lake.clearMetaCaches()
    assert(Lake.manifestCache.retainedWeight == 0)
    val after = Lake.readCommitted(spark, root).orderBy("k").collect().toSeq
    assert(after == before, "a cold re-read must equal the cached read")
  }

  test("stream-source newBytes memo evicts LRU, never clears wholesale") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("nbc-lru").toString
    Lake.commitAppend(Seq((1L, "x")).toDF("k", "t"), root, retain = 0)
    val src = new graft.sources.LakeStreamSource(
      spark.sqlContext, root,
      Lake.readCommitted(spark, root).schema, None, false)
    val cache = src.newBytesCache
    val cap = src.newBytesCacheMax
    (0 until cap + 10).foreach(v => cache.put(v.toLong, java.lang.Long.valueOf(v.toLong)))
    assert(cache.size() == cap, "memo must stay at its cap, not clear to zero")
    // oldest-first eviction: the first 10 versions are gone, hot tail kept
    (0 until 10).foreach(v => assert(!cache.containsKey(v.toLong),
      s"cold head version $v should have been evicted"))
    assert(cache.containsKey((cap + 9).toLong) && cache.containsKey(10L))
    // access refreshes recency: touch the eldest survivor, add one more
    cache.get(10L)
    cache.put((cap + 10).toLong, java.lang.Long.valueOf(1L))
    assert(cache.containsKey(10L), "recently-read entry must survive")
    assert(!cache.containsKey(11L), "untouched eldest must be the evictee")
  }
}
