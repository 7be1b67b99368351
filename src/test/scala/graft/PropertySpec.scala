package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextFns
import graft.operators.{AudioCodec, Classify, Dedup, ImageCodec, Ranking}

/** Property-based invariants (SURVEY.md §5 item 2). Inputs are generated
  * with ScalaCheck generators at a fixed seed and run through Spark in
  * one batch per property (a per-sample Spark job would be minutes). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf(',', ';', '\'', '.')
  )).map(_.mkString)

  test("tokens: no empty tokens, no whitespace, no normalized-away chars") {
    val df = samples(textGen, 300).toDF("t")
      .select(explode(TextFns.tokens(TextFns.normalize(col("t")))).as("tok"))
    assert(df.where(length(col("tok")) === 0 ||
      col("tok").rlike("[\\s,;']")).count() === 0)
  }

  test("fingerprint is invariant under the ,;'-to-space normalization") {
    val df = samples(textGen, 300).toDF("t").select(
      (TextFns.fingerprint(col("t")) ===
        TextFns.fingerprint(translate(col("t"), ",;'", "   "))).as("eq"))
    assert(df.where(!col("eq")).count() === 0)
  }

  test("keepFirst: output keys are distinct and output ⊆ input") {
    val rows = samples(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 5L)), 400)
      .zipWithIndex.map { case ((k, g), i) => (i.toLong, s"k$k", s"g$g") }
    val df = rows.toDF("id", "a", "b")
    val out = Dedup.keepFirst(df, Seq("a", "b"), "id")
    assert(out.count() === out.select("a", "b").distinct().count())
    assert(out.except(df).count() === 0)
    // deterministic: re-running yields the same set
    assert(this.rows(out) === this.rows(Dedup.keepFirst(df, Seq("a", "b"), "id")))
  }

  test("newRows ⊎ semi-join partitions incoming for random key sets") {
    val gen = Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L))
    val incoming = samples(gen, 200).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
    val existing = samples(gen, 100).map { case (a, b) => (a, b) }.toDF("a", "b")
    val anti = Dedup.newRows(incoming, existing, Seq("a", "b"))
    val semi = incoming.join(existing.distinct(), Seq("a", "b"), "left_semi")
    assert(anti.count() + semi.count() === incoming.count())
  }

  test("hashSplit is total and stable: every row gets exactly one split, same on rerun") {
    val docs = samples(Gen.choose(0L, 100000L), 300).distinct.map(i => (i, s"d$i"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.hashSplit(docs, "doc_id")
    assert(out.where(col("split").isNull).count() === 0)
    assert(out.where(!col("split").isin("train", "valid", "test")).count() === 0)
    assert(out.where(col("bucket") < 0 || col("bucket") > 99).count() === 0)
    assert(rows(out) === rows(graft.operators.TextAnalysis.hashSplit(docs, "doc_id")))
  }

  test("minhash signatures are invariant under duplicate shingles (doc repetition)") {
    // duplicating a document's text cannot change its minhash bands:
    // min over a multiset equals min over its set
    val docs = samples(textGen.suchThat(_.length > 10), 50).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val once = docs.toDF("doc_id", "text")
    val doubled = docs.map { case (i, t) => (i, t + " " + t) }.toDF("doc_id", "text")
    // identical docs always land in the same bands as themselves →
    // pair (i, i+1000) for every doc duplicated under a shifted id
    val both = once.union(docs.map { case (i, t) => (i + 1000L, t) }.toDF("doc_id", "text"))
    val pairs = Dedup.minhashLsh(both, "doc_id", "text")
      .where(col("id_b") === col("id_a") + 1000L)
    assert(pairs.count() === docs.length.toLong)
    assert(pairs.where(col("n_common_bands") =!= 4).count() === 0)
  }

  test("saltedJoin equals the plain join for random keys, rows, and salt counts") {
    val gen = Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 1000L))
    val facts = samples(gen, 300).zipWithIndex
      .map { case ((k, v), i) => (i.toLong, k, v) }.toDF("row_id", "k", "v")
    val dim = (0L to 20L).map(k => (k, s"p$k")).toDF("k", "payload")
    for (salts <- Seq(1, 3, 16)) {
      val salted = graft.operators.Skew
        .saltedJoin(facts, dim, Seq("k"), salts, saltSource = col("row_id"))
        .select("row_id", "k", "v", "payload")
      val plain = facts.join(dim, Seq("k")).select("row_id", "k", "v", "payload")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salts=$salts must not change the join result")
    }
  }

  test("sequencePack: total, in-budget offsets, shard-stream starts are gap-free") {
    val docs = samples(textGen, 250).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val budget = 16
    val out = graft.operators.TextAnalysis
      .sequencePack(docs, "doc_id", "text", budget = budget, shards = 4)
    assert(out.count() === 250) // total: one row per doc
    assert(out.where(col("tok_offset") < 0 || col("tok_offset") >= budget).count() === 0)
    // within each shard (doc_id order), every doc starts exactly where
    // the previous doc's tokens ended: global position seq*budget/shards
    // arithmetic reconstructs the running sum
    val rows = out.orderBy("shard", "doc_id").collect()
      .map(r => (r.getInt(2), (r.getLong(3) - r.getInt(2)) / 4 * budget + r.getLong(4), r.getLong(1)))
    rows.groupBy(_._1).values.foreach { shardRows =>
      shardRows.sliding(2).foreach {
        case Array((_, start1, n1), (_, start2, _)) =>
          assert(start2 === start1 + n1, "packing must be contiguous")
        case _ => ()
      }
    }
  }

  test("chunkDocuments: chunks tile the token stream — cover every token, step by stride") {
    val docs = samples(textGen, 250).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (chunk, stride) = (5, 2)
    val out = graft.operators.TextAnalysis
      .chunkDocuments(docs, "doc_id", "text", chunk, stride)
    val nTokens = docs
      .select(col("doc_id"), size(TextFns.tokens(TextFns.normalize(col("text")))).as("n"))
      .where(col("n") >= 1).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = out.orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(byDoc.keySet === nTokens.keySet) // exactly the token-bearing docs chunk
    byDoc.foreach { case (id, chunks) =>
      val n = nTokens(id).toLong
      // starts step by exactly the stride from 1
      assert(chunks.map(_._3).toSeq === chunks.indices.map(k => 1L + k * stride))
      // every chunk stays within the doc and the last one reaches its end
      chunks.foreach { case (_, _, s, len) => assert(s + len - 1 <= n && len >= 1) }
      assert(chunks.map(c => c._3 + c._4 - 1).max === n, s"doc $id: tail uncovered")
    }
  }

  test("corpusGate ≡ quality ⋈ byKeywords on random corpora (fusion is exact)") {
    val docs = samples(textGen, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dict = graft.queries.Text.langDict.toDF("word", "label")
    val fused = graft.operators.TextAnalysis
      .corpusGate(docs, "doc_id", "text", dict, "und")
    val separate = graft.operators.TextAnalysis.quality(docs, "doc_id", "text")
      .join(Classify.byKeywords(docs, "doc_id", "text", dict, "und"), "doc_id")
    assert(this.rows(fused) === this.rows(separate))
  }

  test("nearDedupCorpus: survivors ⊆ input, one survivor per duplicated text group") {
    // force heavy duplication: sample from a SMALL pool of texts long
    // enough to shingle (5-char shingles need >= 5 chars)
    val pool = samples(textGen.suchThat(_.length >= 20), 12)
    val docs = samples(Gen.oneOf(pool), 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.operators.Dedup.nearDedupCorpus(docs, "doc_id", "text")
    assert(out.except(docs).count() === 0) // survivors ⊆ input
    // identical texts are guaranteed LSH collisions: at most one survives
    val dupGroups = out.groupBy(col("text")).count().where(col("count") > 1)
      .join(docs.groupBy(col("text")).count().where(col("count") > 1)
        .select(col("text")), Seq("text"), "left_semi")
    assert(dupGroups.count() === 0, "two identical docs both survived")
  }

  test("lake protocol model check: random commit/crash sequences keep readers on the model") {
    import graft.sources.Lake
    val root = java.nio.file.Files.createTempDirectory("graft-lake-model")
      .resolve("t").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val rnd = new scala.util.Random(20260813L)
    var model = Set.empty[Seq[Any]] // what a reader must see
    var nextRow = 0L
    def batch(k: Int): org.apache.spark.sql.DataFrame = {
      val rows = (0 until k).map { _ => nextRow += 1; (nextRow, s"r$nextRow") }
      rows.toDF("k", "t")
    }
    for (step <- 1 to 40) {
      rnd.nextInt(4) match {
        case 0 => // overwrite commit
          val b = batch(1 + rnd.nextInt(3))
          model = rows(b)
          Lake.commitOverwrite(b, root, retain = rnd.nextInt(2))
        case 1 => // append commit
          val b = batch(1 + rnd.nextInt(3))
          model = model ++ rows(b)
          Lake.commitAppend(b, root, retain = rnd.nextInt(2))
        case 2 => // crashed writer: orphan data dir, no manifest
          val v = Lake.currentVersion(spark, root).map(_ + 1 + rnd.nextInt(2)).getOrElse(0L)
          batch(2).write.mode("overwrite").parquet(s"$root/v$v")
        case 3 => // crashed writer: partial .tmp manifest
          val out = fs.create(
            new org.apache.hadoop.fs.Path(root, s"_commit_${step + 100}.tmp"), true)
          out.write("v0\nv".getBytes("UTF-8")); out.close()
      }
      // the reader's view must equal the model after EVERY step —
      // crashes are invisible, commits are atomic
      if (model.nonEmpty) assert(rows(Lake.readCommitted(spark, root)) === model,
        s"diverged at step $step")
      else assert(Lake.currentVersion(spark, root).isEmpty ||
        rows(Lake.readCommitted(spark, root)) === model)
    }
    // the root never accumulates unbounded garbage: versioned dirs are
    // bounded by live snapshot refs + retention + at most the orphans
    // injected since the last commit
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .count(f => f.isDirectory && f.getPath.getName.startsWith("v"))
    val live = Lake.resolve(spark, root).length
    assert(dirs <= live + 2 * 40, s"unbounded dir growth: $dirs dirs for $live live")
  }

  test("merge/compact model check: random op sequences keep readers on the CDC model") {
    import graft.sources.Lake
    val root = java.nio.file.Files.createTempDirectory("graft-merge-model")
      .resolve("t").toString
    val rnd = new scala.util.Random(20260814L)
    // key → (version, payload): the per-key-last-writer-wins model a
    // reader of the committed table must always see
    var model = Map.empty[Long, (Long, String)]
    var nextKey = 0L
    var nextVer = 0L
    def freshRows(k: Int): Seq[(Long, Long, String)] =
      (0 until k).map { _ =>
        nextKey += 1; nextVer += 1; (nextKey, nextVer, s"r$nextKey") }
    def modelRows: Set[Seq[Any]] =
      model.map { case (k, (v, t)) => Seq[Any](k, v, t) }.toSet
    for (step <- 1 to 30) {
      val op = if (model.isEmpty) 0 else rnd.nextInt(5)
      op match {
        case 0 => // append fresh keys
          val b = freshRows(1 + rnd.nextInt(3))
          b.foreach { case (k, v, t) => model += k -> (v, t) }
          Lake.commitAppend(b.toDF("k", "ver", "t"), root, retain = rnd.nextInt(2))
          ()
        case 1 => // MERGE: update + delete existing keys, insert new
          val existing = rnd.shuffle(model.keys.toSeq)
          val updates = existing.take(rnd.nextInt(3)).map { k =>
            nextVer += 1; (k, nextVer, s"u$k-$nextVer", false) }
          val deletes = existing.drop(updates.size).take(rnd.nextInt(2)).map { k =>
            nextVer += 1; (k, nextVer, "x", true) }
          val inserts = freshRows(rnd.nextInt(2)).map { case (k, v, t) => (k, v, t, false) }
          val batch = updates ++ deletes ++ inserts
          if (batch.nonEmpty) {
            updates.foreach { case (k, v, t, _) => model += k -> (v, t) }
            deletes.foreach { case (k, _, _, _) => model -= k }
            inserts.foreach { case (k, v, t, _) => model += k -> (v, t) }
            Lake.mergeCommitted(spark, root,
              batch.toDF("k", "ver", "t", "is_del"), Seq("k"), "ver", "is_del",
              guardVersions = rnd.nextBoolean())
            ()
          }
        case 2 => // STALE guarded merge: all changes older than stored → no-op
          val victims = rnd.shuffle(model.toSeq).take(1 + rnd.nextInt(2))
          val stale = victims.map { case (k, (v, _)) => (k, v - 1, "stale", rnd.nextBoolean()) }
          Lake.mergeCommitted(spark, root,
            stale.toDF("k", "ver", "t", "is_del"), Seq("k"), "ver", "is_del",
            guardVersions = true)
          ()
        case 3 => // compaction: layout-only, model unchanged
          Lake.compactCommitted(spark, root)
          ()
        case 4 => // crashed writer: orphan data dir past the live version
          val v = Lake.currentVersion(spark, root).map(_ + 1 + rnd.nextInt(2)).getOrElse(0L)
          freshRows(2).toDF("k", "ver", "t")
            .write.mode("overwrite").parquet(s"$root/v$v")
          // the orphan's rows never entered the model: nextKey moved,
          // but a reader must not see them
      }
      assert(rows(Lake.readCommitted(spark, root)) === modelRows,
        s"diverged at step $step (op $op)")
    }
  }

  test("segmentDedup equals the brute-force keep-first model on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("a", "b", "c", "d") // tiny vocab → frequent segment collisions
    for (trial <- 1 to 5) {
      val segTokens = 1 + rnd.nextInt(3)
      val docs = (0L until (5 + rnd.nextInt(10))).map { id =>
        id -> (0 until (1 + rnd.nextInt(12)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // brute-force model: segments in (doc_id, seg_idx) order, first
      // occurrence of each distinct segment text wins
      val seen = scala.collection.mutable.Set.empty[String]
      val model = docs.map { case (id, text) =>
        val segs = text.split(" ").grouped(segTokens).map(_.mkString(" ")).toSeq
        val kept = segs.filter(s => seen.add(s))
        (id, segs.size.toLong, kept.size.toLong,
          if (kept.isEmpty) null else kept.mkString(" "))
      }.toSet
      val out = graft.operators.TextAnalysis.segmentDedup(
          docs.toDF("doc_id", "text"), "doc_id", "text", segTokens)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3))).toSet
      assert(out === model, s"trial $trial segTokens=$segTokens")
    }
  }

  test("classification is total: one label per doc, default included") {
    val dict = Seq("alpha" -> "x", "beta" -> "y").toDF("word", "label")
    val docs = samples(textGen, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t + (if (i % 7 == 0) " alpha" else "")) }
      .toDF("doc_id", "text")
    val out = Classify.byKeywords(docs, "doc_id", "text", dict, "other")
    assert(out.count() === 200)
    assert(out.where(col("label").isNull).count() === 0)
  }

  test("stripBoilerplate: total, ordered-subsequence output, removals are cross-doc") {
    // duplication-heavy corpus: texts drawn from a small pool so many
    // segments recur across docs (plus unique suffixes so docs differ)
    val pool = samples(textGen.suchThat(_.trim.length >= 10), 8)
    val docs = samples(Gen.zip(Gen.oneOf(pool), Gen.choose(0, 99)), 150)
      .zipWithIndex
      .map { case ((t, suf), i) => (i.toLong, s"$t tail$suf") }
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .stripBoilerplate(docs, "doc_id", "text", segTokens = 2, minDocFreq = 2)
    // total: every doc keeps exactly one row
    assert(out.count() === docs.count())
    assert(out.where(col("n_kept") > col("n_seg")).count() === 0)
    // clean_text tokens are a subsequence of the normalized original
    // (reassembly preserved order and invented nothing): check via
    // positional containment — the joined clean text must equal the
    // original token stream with whole 2-token segments deleted, which
    // the (n_seg, n_kept) accounting plus per-token containment imply
    val both = out.join(docs, "doc_id")
      .select(col("doc_id"),
        TextFns.tokens(TextFns.normalize(col("text"))).as("orig"),
        TextFns.tokens(TextFns.normalize(col("clean_text"))).as("kept"))
    assert(both.where(size(col("kept")) > size(col("orig"))).count() === 0)
    assert(both.select(explode(col("kept")).as("tok"), col("orig"))
      .where(!array_contains(col("orig"), col("tok"))).count() === 0)
  }

  test("pageRank: rank mass bounded by SCALE, every node present, all ranks >= base") {
    val edges = samples(Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)), 300)
      .toDF("src", "dst")
    val ranks = graft.operators.Graph.pageRank(edges, iterations = 4)
    val nodes = edges.select(col("src").as("p"))
      .union(edges.select(col("dst").as("p"))).distinct()
    assert(ranks.count() === nodes.count())
    // floor-division leaks mass but never creates it
    val mass = ranks.agg(sum(col("rank"))).head.getLong(0)
    assert(mass <= 1000000000000L, s"rank mass exceeds SCALE: $mass")
    assert(ranks.where(col("rank") < 0L).count() === 0)
  }

  test("heavyNgrams equals the brute-force exact heavy-hitter set on random corpora") {
    val docs = samples(textGen.suchThat(_.trim.nonEmpty), 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sketched = graft.operators.TextAnalysis.heavyNgrams(docs, "text", 1, 1, 50)
    val stream = docs
      .select(explode(TextFns.tokens(TextFns.normalize(col("text")))).as("ngram"))
    val total = stream.count()
    val brute = stream.groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 50 > lit(total))
    assert(this.rows(sketched) === this.rows(brute))
  }

  test("shuffleShards is a total deterministic permutation: gap-free per-shard positions, stable rerun") {
    val ids = samples(Gen.choose(1L, 100000L), 500).distinct
    val df = ids.toDF("doc_id")
    val out = graft.operators.TextAnalysis.shuffleShards(df, "doc_id", nShards = 7)
    val collected = out.collect()
    assert(collected.length === ids.length) // total: every doc placed once
    // per shard: positions are exactly 1..count (gap-free permutation)
    collected.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to rows.length).toSeq)
    }
    val again = graft.operators.TextAnalysis.shuffleShards(df, "doc_id", nShards = 7)
    assert(this.rows(out) === this.rows(again)) // deterministic
    // a different salt yields a different permutation (independence knob)
    val salted = graft.operators.TextAnalysis.shuffleShards(df, "doc_id", 7, salt = "other")
    assert(this.rows(out) !== this.rows(salted))
  }

  test("ImageCodec: random (w, h, seed) BMPs decode to the closed-form pixel sum; re-encode is identity") {
    // JVM-local property (no Spark job): the codec is the per-row kernel
    val dims = Gen.zip(Gen.choose(1, 80), Gen.choose(1, 80), Gen.choose(0, 255))
    samples(dims, 60).foreach { case (w, h, seed) =>
      val bytes = ImageCodec.bmp(w, h, seed)
      val img = ImageCodec.decode(bytes).getOrElse(fail(s"reject ${w}x$h seed=$seed"))
      assert(img.getWidth === w && img.getHeight === h)
      var expect = 0L
      var y = 0
      while (y < h) { var x = 0; while (x < w) { expect += 3L * ((seed + x + y) % 256); x += 1 }; y += 1 }
      assert(ImageCodec.pixelSum(img) === expect)
      assert(java.util.Arrays.equals(ImageCodec.encodeBmp(img), bytes))
    }
  }

  test("AudioCodec: random (n, rate, seed) WAVs decode to exactly the generator samples") {
    val params = Gen.zip(Gen.choose(1, 3000), Gen.oneOf(8000, 11025, 16000, 44100),
      Gen.choose(0, 255))
    samples(params, 40).foreach { case (n, rate, seed) =>
      val d = AudioCodec.decode(AudioCodec.wav(n, rate, seed))
        .getOrElse(fail(s"reject $n@$rate seed=$seed"))
      assert(d.sampleRate === rate && d.samples.length === n)
      var i = 0
      while (i < n) { assert(d.samples(i) === AudioCodec.sample(seed, i)); i += 1 }
    }
  }

  test("rankByScore: any tieBucketWidth yields the identical ranking on random skewed data") {
    val rowGen = Gen.zip(Gen.choose(1L, 500L), Gen.oneOf("a", "b", "c"),
      Gen.frequency(6 -> Gen.const(9L), 4 -> Gen.choose(0L, 5L)))
    val data = samples(rowGen, 400).distinctBy(_._1).toDF("id", "g", "score")
    val plain = Ranking.rankByScore(data, Seq("g"), "score", "id", "rank")
    samples(Gen.choose(1L, 200L), 6).foreach { w =>
      val bucketed = Ranking.rankByScore(data, Seq("g"), "score", "id", "rank",
        tieBucketWidth = Some(w))
      assert(this.rows(bucketed) === this.rows(plain), s"width=$w diverged")
    }
  }

  test("triangleCounts equals the brute-force triple enumeration on random multigraphs") {
    // random edge lists over <=14 nodes WITH self-loops, duplicates and
    // reversed pairs — the operator must see through all three
    val edgeGen = Gen.zip(Gen.choose(0L, 13L), Gen.choose(0L, 13L))
    (0 until 6).foreach { trial =>
      val edges = samples(edgeGen, 40 + 10 * trial)
      val canon = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        ia <- nodes.indices; ib <- ia + 1 until nodes.length; ic <- ib + 1 until nodes.length
        a = nodes(ia); b = nodes(ib); c = nodes(ic)
        if canon((a, b)) && canon((b, c)) && canon((a, c))
      } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
      val out = graft.operators.Graph.triangleCounts(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === brute.toMap, s"trial $trial over ${edges.length} edges")
    }
  }

  test("applyBandFeed ≡ re-banding the post-feed corpus on random docs and random ops") {
    import graft.operators.Dedup
    val txt = Gen.listOfN(30, Gen.frequency(8 -> Gen.alphaLowerChar,
      2 -> Gen.const(' '))).map(_.mkString)
    (0 until 3).foreach { trial =>
      val baseDocs = samples(Gen.zip(Gen.choose(0L, 40L), txt), 40)
        .distinctBy(_._1)
      val opSeq = samples(Gen.oneOf("keep", "delete", "update"),
        baseDocs.length + trial).drop(trial) // vary assignment per trial
      val ops = baseDocs.zip(opSeq).map { case ((id, t), o) => (id, t, o) }
      val inserts = samples(Gen.zip(Gen.choose(100L, 140L), txt), 15).distinctBy(_._1)
      val feedRows =
        ops.collect { case (id, t, "delete") => (id, t, "delete") } ++
        ops.collect { case (id, t, "update") => Seq(
          (id, t, "update_preimage"),
          (id, t + " rewritten tail", "update_postimage")) }.flatten ++
        inserts.map { case (id, t) => (id, t, "insert") }
      val finalDocs =
        ops.collect { case (id, t, "keep") => (id, t) } ++
        ops.collect { case (id, t, "update") => (id, t + " rewritten tail") } ++
        inserts
      val maintained = Dedup.applyBandFeed(
        Dedup.bandedSignatures(baseDocs.toDF("doc_id", "text"), "doc_id", "text"),
        feedRows.toDF("doc_id", "text", "change_type"), "doc_id", "text")
      val reband = Dedup.bandedSignatures(
        finalDocs.toDF("doc_id", "text"), "doc_id", "text")
      assert(rows(maintained) === rows(reband), s"trial $trial diverged")
    }
  }

  test("labelPropagation equals the brute-force synchronous model on random graphs") {
    val edgeGen = Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L))
    (0 until 5).foreach { trial =>
      val edges = samples(edgeGen, 30 + 8 * trial)
      val canon = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val adj = canon.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
      val iters = 1 + trial % 4
      var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        labels = adj.map { case (n, nbrs) =>
          val votes = nbrs.groupBy(labels).map { case (l, xs) => l -> xs.size }
          // argmax count, tie -> smallest label (the operator's rule)
          n -> votes.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }
      val out = graft.operators.Graph
        .labelPropagation(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === labels, s"trial $trial iters $iters diverged")
    }
  }

  test("applyHistoryBatch ≡ full-log replay on random logs at random cut points") {
    import graft.operators.Cdc
    val rowGen = Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 60L),
      Gen.choose(0L, 99L), Gen.prob(0.25))
    (0 until 4).foreach { trial =>
      val log = samples(rowGen, 120 + 30 * trial)
        .distinctBy(r => (r._1, r._2)) // unique version per key
        .map { case (k, v, x, d) => (k, v, x, d) }
        .toDF("k", "v", "x", "is_delete")
      val full = Cdc.history(log, Seq("k"), "v", "is_delete")
      samples(Gen.choose(5L, 55L), 3).foreach { cut =>
        val inc = Cdc.applyHistoryBatch(
          Cdc.history(log.where(col("v") <= cut), Seq("k"), "v", "is_delete"),
          log.where(col("v") > cut), Seq("k"), "v", "is_delete")
        assert(rows(inc) === rows(full), s"trial $trial cut $cut diverged")
      }
    }
  }

  test("temporalJoin ≡ interval-containment LEFT JOIN on random histories and facts") {
    import graft.operators.{AsOf, Cdc}
    val logGen = Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 40L),
      Gen.choose(0L, 99L), Gen.prob(0.3))
    val factGen = Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 45L))
    (0 until 4).foreach { trial =>
      val log = samples(logGen, 60 + 20 * trial)
        .distinctBy(r => (r._1, r._2)).toDF("k", "v", "x", "is_delete")
      val hist = Cdc.history(log, Seq("k"), "v", "is_delete")
      val facts = samples(factGen, 80).zipWithIndex
        .map { case ((k, t), i) => (i.toLong + 1000 * trial, k, t) }
        .toDF("fid", "k", "t")
      val viaAsOf = AsOf.temporalJoin(facts, hist, "k", "k", "t", Seq("x"))
        .select("fid", "x", "valid_from")
      val h = hist.select(col("k").as("hk"), col("x").as("bx"),
        col("valid_from").as("bvf"), col("valid_to"))
      val brute = facts.join(h,
          col("k") === col("hk") && col("bvf") <= col("t") &&
            (col("valid_to").isNull || col("t") < col("valid_to")), "left")
        .select(col("fid"), col("bx").as("x"), col("bvf").as("valid_from"))
      assert(rows(viaAsOf) === rows(brute), s"trial $trial diverged")
    }
  }

  test("mp4Dib round-trips for random (w, h, seed, frames); truncation never throws") {
    val params = Gen.zip(Gen.choose(1, 40), Gen.choose(1, 40),
      Gen.choose(0, 255), Gen.choose(1, 7))
    samples(params, 40).foreach { case (w, h, seed, n) =>
      val payload = ImageCodec.mp4Dib(w, h, seed, n)
      val (pw, ph, fcc, frames) = ImageCodec.mp4Frames(payload)
        .getOrElse(fail(s"demux failed ${w}x$h seed=$seed n=$n"))
      assert(pw === w && ph === h && fcc === "DIB " && frames.length === n)
      frames.zipWithIndex.foreach { case (dib, f) =>
        val img = ImageCodec.dibFrameToImage(w, h, dib)
          .getOrElse(fail(s"decode failed ${w}x$h f=$f"))
        assert(ImageCodec.pixelSum(img) ===
          (for (y <- 0 until h; x <- 0 until w)
            yield 3L * ((seed + f + x + y) % 256)).sum)
      }
      // every truncation point degrades to None or fewer VALID frames,
      // never a throw — the NonFatal walk contract under fuzzing
      Seq(payload.length / 4, payload.length / 2, payload.length - 3)
        .filter(_ > 8).foreach { cut =>
          val r = ImageCodec.mp4Frames(payload.take(cut))
          assert(r.forall(_._4.length <= n))
        }
    }
  }

  test("bandFingerprint is gain-invariant and matches across slice-preserving rewrites") {
    val params = Gen.zip(Gen.choose(32, 2048), Gen.choose(0, 255))
    samples(params, 30).foreach { case (n, seed) =>
      val s = Array.tabulate(n)(AudioCodec.sample(seed, _))
      val fp = AudioCodec.bandFingerprint(s, 32)
      // uniform gain scales every slice energy by c^2 — sign profile intact
      assert(AudioCodec.bandFingerprint(s.map(_ * 2), 32) === fp, s"gain 2x n=$n")
      assert(AudioCodec.bandFingerprint(s.map(_ * -3), 32) === fp, s"gain -3x n=$n")
      // encode -> decode round trip preserves the fingerprint (real codec path)
      val rt = AudioCodec.decode(AudioCodec.wav(n, 16000, seed)).get.samples
      assert(AudioCodec.bandFingerprint(rt, 32) === fp, s"roundtrip n=$n")
    }
  }
}
