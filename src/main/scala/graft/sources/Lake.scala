package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operations for the parquet lake.
  *
  * The reference's only maintenance job is the dedup repair
  * (/root/reference/dags/Main.py:28-47, re-expressed as
  * `Newsmaper.maintenance` + `overwriteRetained`); at 100 TB the same
  * append-only sinks grow a second pathology the reference never
  * meets: SMALL FILES. Every `loadTo` batch appends its own files, so
  * a year of hourly loads leaves ~10⁴ files per table — each scan
  * then pays listing + open cost per file and the 128 MB split floor
  * stops mattering. Compaction rewrites the table into
  * size-targeted files through the same crash-safe staged swap the
  * dedup repair uses (write staging → keep `.bak` until live —
  * no crash point loses the table).
  *
  * The manifest-committed tables below additionally provide: TIME
  * TRAVEL ([[readCommittedAt]] — retention is the read horizon),
  * SCHEMA EVOLUTION (manifests carry the committed schema; appends
  * merge add-nullable-column changes), per-row copy-on-write MERGE
  * INTO ([[mergeCommitted]] — only dirs holding touched keys
  * rewrite), and committed-table compaction ([[compactCommitted]]).
  */
object Lake {

  // ---- manifest-committed tables -----------------------------------
  //
  // The staged-swap family (`Newsmaper.overwriteRetained`, the
  // streaming fold) renames DIRECTORIES, which leaves a momentary
  // window where `path` is absent between the two renames — honest,
  // documented, but real for a concurrent reader. The lakehouse
  // answer is to never move data at all: a table ROOT holds immutable
  // versioned data dirs `v<N>` plus empty commit markers
  // `_commit_<N>`, and the COMMIT POINT is the atomic creation of one
  // new marker file. Readers resolve max committed N and read
  // `v<N>`; at every crash point of the write protocol that
  // resolution finds a complete, readable table:
  //
  //   1. crash mid-write of `v<N+1>`  -> no marker, readers stay on N
  //   2. crash after `v<N+1>` done, before marker -> same
  //   3. crash after marker, before prune -> readers see N+1; the
  //      stale version is pruned by the NEXT commit
  //
  // This is HDFSMetadataLog's protocol (public Spark), with the
  // marker BODY carrying the snapshot: the newline-separated list of
  // data dirs that compose version N. An OVERWRITE commit lists only
  // its own new dir; an APPEND commit lists the previous snapshot's
  // dirs plus its new one — so at 100 TB an append writes O(batch)
  // data and never rewrites the table, while readers still flip
  // between immutable snapshots atomically. Content-bearing markers
  // are committed by writing `_commit_<N>.tmp` and RENAMING it into
  // place — single-file rename is the atomic primitive on HDFS and
  // POSIX, so no reader ever sees a half-written manifest. (An empty
  // marker body is read as `[v<N>]` for back-compat with the
  // body-less overwrite-only protocol.)
  //
  // CONCURRENT WRITERS (optimistic concurrency, the Delta/Iceberg
  // shape): append and overwrite stage their batch ONCE under a
  // writer-unique `z<nonce>` dir that no other writer ever contests,
  // then claim a version by publishing the manifest put-if-absent
  // ([[publishIfAbsent]]). A loser re-reads the log: an APPEND
  // rebases on the new live snapshot and retries as long as every
  // intervening commit was itself append-shaped (no dirs removed) —
  // two interleaved appenders both commit, serialized, no lost dirs;
  // across a dir-removing commit (overwrite/merge/delete/compact) it
  // refuses with `ConcurrentModificationException` (the world the
  // caller derived the batch against is gone — re-derive and retry).
  // An OVERWRITE loser always gets that refusal, as do MAINTENANCE
  // commits (merge/delete/update/compact/cluster) — they read a
  // snapshot, so ANY concurrent commit invalidates them, Delta's
  // OPTIMIZE conflict rule; their rewrites stage under writer-unique
  // dirs too, with the version slot pinned BEFORE the rewrite so an
  // interloper always forces the loud refusal, never a silently
  // dropped dir. Streaming folds keep version-named pre-written dirs
  // under their own single-writer checkpoint-lineage contract.
  // `retain` keeps that
  // many SUPERSEDED snapshots so an in-flight reader of the previous
  // version survives a concurrent commit — the same reader-retention
  // lever as any lakehouse VACUUM horizon — and pruning deletes only
  // data dirs no retained snapshot references.

  private def fsFor(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  /** Writer-unique staged data dir name. Staged dirs are fully
    * written BEFORE any commit attempt and are never contested — the
    * version slot is claimed by the manifest publish alone. The `z`
    * prefix keeps them outside the `v<version>` sweep grammar (an
    * in-flight writer's dir must never be swept by a concurrent
    * commit's retention prune — it has no version yet) while staying
    * visible to readers (no `_`/`.` prefix, which Hadoop listings
    * treat as hidden). Once committed they are swept by reference
    * like any dir; crash-ABANDONED ones are invisible to
    * reference-based sweeping and are reclaimed by
    * [[vacuumCommitted]]'s staleness horizon. */
  private def stagedDirName(): String =
    "z" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Atomically publish the fully-written `tmp` as `dest` IFF `dest`
    * does not exist — the put-if-absent primitive optimistic
    * concurrency rests on. HDFS `rename` is atomic and refuses an
    * existing destination; POSIX `rename(2)` silently OVERWRITES, so
    * on local filesystems the claim is a hard link (`link(2)`:
    * atomic, EEXIST on a taken slot). Either way the loser's tmp is
    * cleaned up and `false` returned; a reader never observes a
    * partially-written destination. */
  private def publishIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
      tmp: Path, dest: Path): Boolean = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dest.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        // carry the ChecksumFileSystem sidecar so the published
        // manifest keeps crc verification (missing crc would merely
        // skip it, but keeping it costs one more link)
        val crc = java.nio.file.Paths.get(
          new Path(tmp.getParent, "." + tmp.getName + ".crc").toUri.getPath)
        if (java.nio.file.Files.exists(crc)) {
          val dcrc = java.nio.file.Paths.get(
            new Path(dest.getParent, "." + dest.getName + ".crc").toUri.getPath)
          try java.nio.file.Files.createLink(dcrc, crc)
          catch { case _: java.nio.file.FileAlreadyExistsException => }
        }
        fs.delete(tmp, false); true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
      }
    case _ =>
      if (fs.rename(tmp, dest)) true
      else if (fs.exists(dest)) { fs.delete(tmp, false); false }
      else throw new java.io.IOException(s"manifest rename $tmp -> $dest failed")
  }

  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
      r: Path): Seq[Long] =
    if (!fs.exists(r)) Nil
    else fs.listStatus(r).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("_commit_") && !n.endsWith(".tmp") =>
        n.stripPrefix("_commit_").toLongOption }
      .flatten.toSeq.sorted

  /** Pin the OCC slot for a commit that carries state read from
    * snapshot `cur` — the version [[currentVersion]] actually
    * resolved. The slot is `cur + 1`, NOT `max(markers) + 1` from a
    * second listing: a commit landing between the snapshot read and
    * the listing would otherwise shift the pin past its own slot, and
    * the put-if-absent publish would SUCCEED while carrying dirs/props
    * read from the stale snapshot — silently dropping the interleaved
    * commit (the exact lost update the pin exists to prevent). Pinning
    * `cur + 1` makes that race collide at the interloper's marker and
    * refuse loudly instead.
    *
    * The only slots skipped are those owned by markers whose data dirs
    * are provably LOST (out-of-protocol damage: `currentVersion`
    * defensively ignored them, but their numbers are burned — a
    * publish there would conflict forever). A healthy newer marker is
    * an interleaved commit and the pin stops at it. A marker that
    * vanishes mid-check was retention-pruned; its slot is treated as
    * contested and the publish itself decides. */
  private def pinSlot(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      cur: Long): Long = {
    var next = cur + 1
    val newer = committedVersions(fs, r).filter(_ > cur)
    var halted = false
    newer.foreach { v =>
      if (!halted && v == next) {
        val defective =
          try !manifestDirs(fs, r, v).forall(d => fs.exists(new Path(r, d)))
          catch { case _: java.io.FileNotFoundException => false }
        if (defective) next = v + 1 else halted = true
      }
    }
    next
  }

  // Manifest body = newline-separated data-dir names, plus optional
  // `#`-prefixed metadata lines. `#schema=<DataType json>` records the
  // committed table schema: appends MERGE it (add-nullable-column
  // evolution) and readers pass it to the scan explicitly — which both
  // makes mixed-schema snapshots read correctly (files missing a
  // column yield NULLs) and skips footer-based schema inference
  // entirely (at 100 TB, one manifest read instead of a
  // list-and-read-footers job). Manifests written before this line
  // existed read as before (inferred schema).
  private val SchemaPrefix = "#schema="

  // A manifest (`_commit_<v>`) is IMMUTABLE once published — the
  // protocol renames it in atomically and only ever DELETES it — but
  // the accessors below each parse it independently, so one relation
  // assembly reads the same KB-sized file a dozen times: noise on a
  // local FS, a dozen GETs of planning latency per query on an object
  // store. This JVM-wide LRU collapses those to one read, VALIDATED by
  // (modTime, length) on every hit (one HEAD instead of one GET), so
  // even an out-of-protocol in-place rewrite (hand surgery, test
  // scenarios, a backup restored over a live root) reads correctly.
  private val manifestCacheMax = 256
  private val manifestCache =
    new java.util.LinkedHashMap[String, (Long, Long, Seq[String])](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long, Seq[String])]): Boolean =
        size() > manifestCacheMax
    }

  // ---- protocol feature gates (Delta's table-features contract) ----
  //
  // A semantics-bearing manifest line changes WHICH ROWS a snapshot
  // contains or HOW its bytes map to columns — a reader that merely
  // skipped it (the default for unknown `#` lines) would return wrong
  // answers silently: a pre-DV build would resurrect soft-deleted
  // rows, a pre-colmap build would read dropped columns' bytes back.
  // So every commit that writes such a construct stamps a
  // `#require=<feature,…>` line naming EXACTLY the features its
  // snapshot carries, and every manifest parse REFUSES a `#require=`
  // naming a feature this build does not recognize — loudly, before
  // any interpretation happens (read, commit-on-top, vacuum, history
  // — they all parse through [[manifestBody]]). Unknown `#` lines
  // WITHOUT a `#require=` entry keep reading as before: that is the
  // forward-compat channel for OPTIONAL metadata (stats, blooms,
  // props — losing them degrades performance, never correctness).
  // Legacy manifests have no `#require=` line and read unchanged.
  private[sources] val RequirePrefix = "#require="

  /** Reader/writer features this build understands: merge-on-read
    * deletion vectors, column mapping (rename/drop as metadata),
    * identity columns, generated partition columns, hash-bucketed
    * layout, and forward-only partition-spec evolution. */
  private[sources] val SupportedFeatures: Set[String] =
    Set("dv", "colmap", "identity", "genpart", "bucket", "partevo")

  private def checkRequiredFeatures(p: Path, lines: Seq[String]): Unit =
    lines.find(_.startsWith(RequirePrefix)).foreach { l =>
      val unknown = l.stripPrefix(RequirePrefix).split(",").iterator
        .map(_.trim).filter(_.nonEmpty).filterNot(SupportedFeatures).toSeq
      if (unknown.nonEmpty) throw new UnsupportedOperationException(
        s"the manifest $p requires table feature(s) " +
          unknown.sorted.mkString("[", ", ", "]") +
          " this build does not support — reading (or committing on " +
          "top) would silently misinterpret the snapshot, e.g. " +
          "resurrect soft-deleted rows or misread remapped columns; " +
          "upgrade the engine to one that lists them in " +
          "Lake.SupportedFeatures")
    }

  private def manifestBody(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Seq[String] = {
    val p = new Path(r, s"_commit_$v")
    // same FileNotFoundException contract as the direct open
    val st = fs.getFileStatus(p)
    val key = fs.getUri.toString + "::" + fs.makeQualified(p).toUri.getPath
    manifestCache.synchronized {
      val hit = manifestCache.get(key)
      if (hit != null && hit._1 == st.getModificationTime &&
          hit._2 == st.getLen) {
        checkRequiredFeatures(p, hit._3)
        return hit._3
      }
    }
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = body.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    manifestCache.synchronized {
      manifestCache.put(key, (st.getModificationTime, st.getLen, lines)); ()
    }
    checkRequiredFeatures(p, lines)
    lines
  }

  private def manifestDirs(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Seq[String] = {
    val dirs = manifestBody(fs, r, v).filterNot(_.startsWith("#"))
    if (dirs.isEmpty) Seq(s"v$v") else dirs // body-less back-compat
  }

  private def manifestSchema(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Option[org.apache.spark.sql.types.StructType] =
    manifestBody(fs, r, v).find(_.startsWith(SchemaPrefix))
      .map(l => org.apache.spark.sql.types.DataType
        .fromJson(l.stripPrefix(SchemaPrefix))
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  // ---- per-dir column statistics (data skipping) -------------------
  //
  // `#statscols=<c1,c2>` names the table's STAT COLUMNS (established by
  // the first commit passing `statsCols`, inherited by every later
  // commit), and one `#stats_<dir>=<json>` line per data dir carries
  // that dir's min/max per stat column. This is Delta/Iceberg-style
  // file-level data skipping at snapshot-dir granularity: a predicate
  // read ([[readCommittedWhere]]) drops every dir whose range provably
  // excludes the filter BEFORE the scan plans, so a time- or
  // key-ordered 100 TB table answers a range query from the dirs that
  // can match — manifest-read cost, zero data I/O for skipped dirs.
  // Stats are an OPTIMIZATION ONLY: the full predicate is still
  // applied to the surviving dirs, a dir without stats is always kept,
  // and a conjunct the pruner doesn't understand is ignored — so
  // correctness never depends on the stats being present or complete.
  //
  // Values normalize to two comparable kinds: NUMBERS (integrals,
  // float/double, decimal, and date/timestamp via their Catalyst
  // internal day/micros form) compared as BigDecimal, and STRINGS
  // compared in UTF8String binary order — the same order parquet
  // footers and Spark's min/max use, so driver-side pruning agrees
  // with executor-side semantics on non-ASCII data. NaN/Infinity
  // refuse normalization and simply drop that column's stats for the
  // dir (conservative, never wrong).
  private val StatsColsPrefix = "#statscols="
  private val StatsPrefix = "#stats_"

  private[graft] sealed trait NormVal
  private[graft] final case class NumV(v: BigDecimal) extends NormVal
  private[graft] final case class StrV(v: org.apache.spark.unsafe.types.UTF8String)
    extends NormVal

  private def cmpNorm(a: NormVal, b: NormVal): Option[Int] = (a, b) match {
    case (NumV(x), NumV(y)) => Some(x.compare(y))
    case (StrV(x), StrV(y)) => Some(x.compareTo(y))
    case _                  => None
  }

  /** Catalyst-INTERNAL literal value -> normalized, by declared type.
    * `functions.lit` converts external values eagerly, so dates arrive
    * as Int days and timestamps as Long micros already. */
  private def normLit(value: Any,
      dt: org.apache.spark.sql.types.DataType): Option[NormVal] = {
    import org.apache.spark.sql.types._
    if (value == null) None
    else dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType =>
        Some(NumV(BigDecimal(value.toString)))
      case FloatType | DoubleType =>
        scala.util.Try(BigDecimal(value.toString)).toOption.map(NumV)
      case _: DecimalType => value match {
        case d: Decimal => Some(NumV(BigDecimal(d.toJavaBigDecimal)))
        case other => scala.util.Try(BigDecimal(other.toString)).toOption.map(NumV)
      }
      case StringType => value match {
        case u: org.apache.spark.unsafe.types.UTF8String => Some(StrV(u))
        case s: String =>
          Some(StrV(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        case _ => None
      }
      case _ => None
    }
  }

  /** EXTERNAL value (from a collected stats row) -> normalized. */
  private def normExternal(value: Any): Option[NormVal] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    value match {
      case null => None
      case d: java.lang.Double =>
        scala.util.Try(BigDecimal(d.toString)).toOption.map(NumV)
      case f: java.lang.Float =>
        scala.util.Try(BigDecimal(f.toString)).toOption.map(NumV)
      case bd: java.math.BigDecimal => Some(NumV(BigDecimal(bd)))
      case n @ (_: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
                _: java.lang.Byte) => Some(NumV(BigDecimal(n.toString)))
      case s: String =>
        Some(StrV(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      case d: java.sql.Date => Some(NumV(BigDecimal(DateTimeUtils.fromJavaDate(d))))
      case t: java.sql.Timestamp =>
        Some(NumV(BigDecimal(DateTimeUtils.fromJavaTimestamp(t))))
      case d: java.time.LocalDate =>
        Some(NumV(BigDecimal(DateTimeUtils.localDateToDays(d))))
      case i: java.time.Instant => Some(NumV(BigDecimal(DateTimeUtils.instantToMicros(i))))
      case l: java.time.LocalDateTime =>
        Some(NumV(BigDecimal(DateTimeUtils.localDateTimeToMicros(l))))
      case _ => None
    }
  }

  // Long-string stat bounds TRUNCATE before they reach a manifest
  // line (Delta's rule): a user putting a document-sized text column
  // in statsCols must not bloat every manifest (and every planning
  // read) with full min/max strings. min -> its first
  // `StatsStringMaxLen` code points (a prefix is ≤ the original in
  // UTF8 binary order: valid lower bound); max -> the truncated
  // prefix's SUCCESSOR — last code point incremented (surrogate gap
  // jumped, max-code-point chars dropped), which upper-bounds every
  // string sharing the prefix because UTF-8 preserves code-point
  // order byte-wise. No successor derivable (all chars at the
  // maximum code point) -> the column's stats drop for that dir,
  // conservative as always. Pruning proofs stay sound either way:
  // the recorded range only ever WIDENS, and both predExcludes and
  // predIncludesAll are superset-range-safe.
  private val StatsStringMaxLen = 32

  private def truncPrefix(s: String): String =
    if (s.codePointCount(0, s.length) <= StatsStringMaxLen) s
    else s.substring(0, s.offsetByCodePoints(0, StatsStringMaxLen))

  /** Successor of a truncated prefix: smallest string-prefix bound
    * strictly above every string starting with `s`. */
  private def prefixSuccessor(s: String): Option[String] = {
    val cps = s.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) < 0x10FFFF) {
        val next0 = cps(i) + 1
        // the surrogate range is not encodable as a scalar value —
        // jump past it (0xE000 > every char below 0xD800 encodes
        // greater byte-wise too)
        val next = if (next0 >= 0xD800 && next0 <= 0xDFFF) 0xE000 else next0
        val out = new java.lang.StringBuilder()
        (0 until i).foreach(j => out.appendCodePoint(cps(j)))
        out.appendCodePoint(next)
        return Some(out.toString)
      }
      i -= 1 // max code point: drop it, increment the previous one
    }
    None
  }

  private def boundedStat(lo: NormVal, hi: NormVal):
      Option[(NormVal, NormVal)] = (lo, hi) match {
    case (StrV(a), StrV(b)) =>
      val as = a.toString; val bs = b.toString
      val aLong = as.codePointCount(0, as.length) > StatsStringMaxLen
      val bLong = bs.codePointCount(0, bs.length) > StatsStringMaxLen
      if (!aLong && !bLong) Some((lo, hi))
      else {
        val newLo =
          if (aLong) StrV(org.apache.spark.unsafe.types.UTF8String
            .fromString(truncPrefix(as)))
          else lo
        val newHi =
          if (bLong) prefixSuccessor(truncPrefix(bs)).map(up =>
            StrV(org.apache.spark.unsafe.types.UTF8String.fromString(up)))
          else Some(hi)
        newHi.map(h => (newLo, h))
      }
    case other => Some(other)
  }

  private def statsJson(m: Map[String, (NormVal, NormVal)]): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
      val arr = om.createArrayNode()
      val node = om.createObjectNode()
      (lo, hi) match {
        case (NumV(a), NumV(b)) =>
          arr.add(a.toString); arr.add(b.toString)
          node.set[com.fasterxml.jackson.databind.JsonNode]("n", arr)
        case (StrV(a), StrV(b)) =>
          arr.add(a.toString); arr.add(b.toString)
          node.set[com.fasterxml.jackson.databind.JsonNode]("s", arr)
        case _ => node // mixed kinds cannot arise from one column; drop
      }
      if (!node.isEmpty)
        root.set[com.fasterxml.jackson.databind.JsonNode](c, node)
      ()
    }
    om.writeValueAsString(root)
  }

  private def parseStatsJson(json: String): Map[String, (NormVal, NormVal)] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = scala.util.Try(om.readTree(json)).getOrElse(return Map.empty)
    val it = root.properties().iterator()
    val out = Map.newBuilder[String, (NormVal, NormVal)]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (v.has("n") && v.get("n").size == 2)
        scala.util.Try((
          NumV(BigDecimal(v.get("n").get(0).asText)),
          NumV(BigDecimal(v.get("n").get(1).asText))
        )).foreach(out += e.getKey -> _)
      else if (v.has("s") && v.get("s").size == 2)
        out += e.getKey -> ((
          StrV(org.apache.spark.unsafe.types.UTF8String.fromString(v.get("s").get(0).asText)),
          StrV(org.apache.spark.unsafe.types.UTF8String.fromString(v.get("s").get(1).asText))))
    }
    out.result()
  }

  /** Raw `#stats_<dir>=<json>` lines of a manifest, keyed by dir. */
  private def manifestStatsRaw(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Map[String, String] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(StatsPrefix) && !l.startsWith(FileStatsPrefix) &&
          l.indexOf('=') > StatsPrefix.length =>
        val i = l.indexOf('=')
        l.substring(StatsPrefix.length, i) -> l.substring(i + 1)
    }.toMap

  // `#fstats_<dir>/<file>=<json>` — FILE-level ranges inside a dir,
  // written by commits that can pay one column-pruned pass over their
  // fresh dir (notably [[clusterCommitted]], whose whole point is
  // tight per-file ranges). File skipping composes under dir skipping
  // in [[readCommittedWhere]]: surviving dirs with file stats read an
  // explicit pruned file list. A file on disk absent from the lines
  // is always kept (only zero-row files can be absent from a full
  // stats pass, but a reader must not have to trust that).
  private val FileStatsPrefix = "#fstats_"

  /** file-stats lines of a manifest: dir -> (file -> json). */
  private def manifestFileStatsRaw(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Map[String, Map[String, String]] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(FileStatsPrefix) && l.indexOf('=') > FileStatsPrefix.length =>
        val i = l.indexOf('=')
        val dirFile = l.substring(FileStatsPrefix.length, i)
        dirFile -> l.substring(i + 1)
    }.groupBy { case (df, _) => df.takeWhile(_ != '/') }
      .map { case (dir, entries) =>
        dir -> entries.collect {
          case (df, j) if df.startsWith(dir + "/") =>
            df.stripPrefix(dir + "/") -> j
        }.toMap
      }

  /** Per-FILE min/max of a freshly-written dir on `cols`, plus the
    * dir-level merge — ONE column-pruned pass over the dir
    * (`groupBy(input_file_name)`), O(this dir) like the write that
    * produced it. Returns (dirJson, fileName -> json). */
  /** Resolve a possibly-dotted NESTED path against `schema` — stats
    * and bloom columns accept struct-field paths (`meta.v`) so
    * struct-heavy event schemas skip like flat ones. An exact
    * top-level name wins first (a column literally named "a.b"). */
  private def resolveField(schema: org.apache.spark.sql.types.StructType,
      c: String): Option[org.apache.spark.sql.types.StructField] =
    schema.fields.find(_.name == c).orElse {
      val i = c.indexOf('.')
      if (i < 0) None
      else schema.fields.find(_.name == c.take(i)).flatMap(_.dataType match {
        case st: org.apache.spark.sql.types.StructType =>
          resolveField(st, c.drop(i + 1))
        case _ => None
      })
    }

  private def fileStatsJson(spark: SparkSession, dirPath: String,
      cols: Seq[String]): Option[(String, Map[String, String])] = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    if (cols.isEmpty) return None
    val df = spark.read.parquet(dirPath)
    val present = cols.filter(c => resolveField(df.schema, c).isDefined)
    if (present.isEmpty) return Some(("{}", Map.empty))
    val aggs = present.flatMap(c => Seq(min(df(c)), max(df(c))))
    val rows = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.drop(1): _*).collect()
    val perFile = rows.map { row =>
      val name = new Path(row.getString(0)).getName
      val m = present.zipWithIndex.flatMap { case (c, i) =>
        for {
          lo <- normExternal(row.get(1 + 2 * i))
          hi <- normExternal(row.get(2 + 2 * i))
          if cmpNorm(lo, hi).isDefined
          bounded <- boundedStat(lo, hi)
        } yield c -> bounded
      }.toMap
      name -> m
    }.toMap
    // dir range = merge of file ranges (min of lows, max of highs)
    val dirStats = perFile.values.flatten
      .groupBy(_._1)
      .collect { case (c, vs) if vs.size == perFile.size =>
        // only when EVERY rowful file carries the col's stats: a file
        // whose extreme refused normalization (NaN/∞) or was all-NULL
        // may still hold rows a predicate matches (NaN sorts greatest
        // in Spark), so a dir range built without it could prune
        // wrongly — drop the col at dir level, file level stays exact
        val los = vs.map(_._2._1); val his = vs.map(_._2._2)
        c -> ((los.reduce((a, b) => if (cmpNorm(a, b).exists(_ <= 0)) a else b),
               his.reduce((a, b) => if (cmpNorm(a, b).exists(_ >= 0)) a else b)))
      }.toMap
    Some((statsJson(dirStats), perFile.map { case (f, m) => f -> statsJson(m) }))
  }

  // ---- per-dir Bloom filters (point-lookup skipping) ---------------
  //
  // `#bloomcols=<c1,c2>` names the table's BLOOM COLUMNS (established
  // like stat columns, inherited by later commits), and one
  // `#bloom_<dir>=<json>` line per data dir carries a base64 Bloom
  // filter per column (Spark's public `org.apache.spark.util.sketch
  // .BloomFilter` — integral and string columns). Min/max ranges
  // cannot prune an EQUALITY lookup on a hash- or round-robin-
  // distributed key (every dir spans the full range); a Bloom filter
  // answers "definitely not in this dir" with zero false negatives,
  // so `readCommittedWhere(col("id") === x)` on a 100 TB table scans
  // only the dirs that might hold x. Like range stats, blooms are an
  // optimization only: an over-full filter degrades to higher
  // false-positive rate (more dirs kept), never to a wrong result,
  // and an absent filter always keeps the dir. Sizing is capped at
  // ~100k expected items (≈15 KB of bits at 2% FPP) per (dir, col) so
  // manifests stay planning-readable; beyond the cap the FPP rises
  // gracefully.
  private val BloomColsPrefix = "#bloomcols="
  private val BloomPrefix = "#bloom_"
  private val BloomMaxItems = 100000L
  private val BloomFpp = 0.02

  private def manifestBloomCols(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Seq[String] =
    manifestBody(fs, r, v).find(_.startsWith(BloomColsPrefix))
      .map(_.stripPrefix(BloomColsPrefix).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  private def effectiveBloomCols(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      bloomCols: Seq[String]): Seq[String] = {
    bloomCols.foreach(c => require(!c.exists("=,\n#".contains(_)),
      s"bloom column name '$c' may not contain '=', ',', '#', or newline"))
    if (bloomCols.nonEmpty) bloomCols
    else committedVersions(fs, r).lastOption
      .map(v => manifestBloomCols(fs, r, v)).getOrElse(Nil)
  }

  /** Raw `#bloom_<dir>=<json>` lines of a manifest, keyed by dir. */
  private def manifestBloomsRaw(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Map[String, String] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(BloomPrefix) && l.indexOf('=') > BloomPrefix.length =>
        val i = l.indexOf('=')
        l.substring(BloomPrefix.length, i) -> l.substring(i + 1)
    }.toMap

  /** Bloom filters of one dir's manifest line, deserialized. */
  private def parseBloomJson(json: String):
      Map[String, org.apache.spark.util.sketch.BloomFilter] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = scala.util.Try(om.readTree(json)).getOrElse(return Map.empty)
    val it = root.properties().iterator()
    val out = Map.newBuilder[String, org.apache.spark.util.sketch.BloomFilter]
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.has("b"))
        scala.util.Try(org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(
            java.util.Base64.getDecoder.decode(e.getValue.get("b").asText))))
          .foreach(out += e.getKey -> _)
    }
    out.result()
  }

  /** Bloom filters of a freshly-written dir on `cols`, as manifest
    * JSON — one scan per column (cols is almost always one key).
    * Integral/string columns only (the sketch's put/probe domain);
    * others drop out. O(this dir), like the write that produced it. */
  private def dirBloomJson(spark: SparkSession, dirPath: String,
      cols: Seq[String]): Option[String] = {
    import org.apache.spark.sql.types._
    if (cols.isEmpty) return None
    val df = spark.read.parquet(dirPath)
    val present = cols.filter(c => resolveField(df.schema, c)
      .exists(_.dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType => true
        case _ => false
      }))
    if (present.isEmpty) return Some("{}")
    val n = df.count()
    if (n == 0) return Some("{}")
    val expected = math.max(1L, math.min(n, BloomMaxItems))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    present.foreach { c =>
      scala.util.Try {
        val bf = df.stat.bloomFilter(c, expected, BloomFpp)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
      }.foreach { b64 =>
        val node = om.createObjectNode()
        node.put("b", b64)
        root.set[com.fasterxml.jackson.databind.JsonNode](c, node)
        ()
      }
    }
    Some(om.writeValueAsString(root))
  }

  /** Probe: can the dir's Bloom filter for `p.col` prove an equality
    * predicate matches nothing? True = provably absent (skip safe);
    * anything un-probeable keeps the dir. */
  private def bloomExcludes(
      blooms: Map[String, org.apache.spark.util.sketch.BloomFilter],
      p: Pred): Boolean =
    p.op == PEq && blooms.get(p.col).exists { bf =>
      p.values.forall {
        case NumV(v) =>
          v.isWhole && v.isValidLong && !bf.mightContainLong(v.toLongExact)
        case StrV(s) => !bf.mightContainString(s.toString)
      }
    }

  private def manifestStatsCols(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Seq[String] =
    manifestBody(fs, r, v).find(_.startsWith(StatsColsPrefix))
      .map(_.stripPrefix(StatsColsPrefix).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  /** The table's established stat columns: `statsCols` when the caller
    * names them on this commit, else inherited from the last committed
    * manifest. Simple column names only — the list rides a
    * comma-separated manifest line. */
  private def effectiveStatsCols(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      statsCols: Seq[String]): Seq[String] = {
    statsCols.foreach(c => require(!c.exists("=,\n#".contains(_)),
      s"stat column name '$c' may not contain '=', ',', '#', or newline"))
    if (statsCols.nonEmpty) statsCols
    else committedVersions(fs, r).lastOption
      .map(v => manifestStatsCols(fs, r, v)).getOrElse(Nil)
  }

  /** min/max stats of the freshly-written dir on `cols`, as the
    * manifest JSON. Cost is O(this dir): the read enables parquet
    * MIN/MAX aggregate pushdown, so on supported types it answers from
    * the footers the write just produced — metadata, not a re-scan.
    * Columns absent from the dir's schema, all-NULL, or with
    * un-normalizable extremes (NaN/Infinity) drop out (kept dirs are
    * the safe default). */
  private def dirStatsJson(spark: SparkSession, dirPath: String,
      cols: Seq[String]): Option[String] = {
    import org.apache.spark.sql.functions.{max, min}
    if (cols.isEmpty) return None
    val key = "spark.sql.parquet.aggregatePushDown"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.parquet(dirPath)
      val present = cols.filter(c => resolveField(df.schema, c).isDefined)
      if (present.isEmpty) return Some("{}")
      val aggs = present.flatMap(c => Seq(min(df(c)), max(df(c))))
      val row = df.agg(aggs.head, aggs.drop(1): _*).collect().head
      val m = present.zipWithIndex.flatMap { case (c, i) =>
        for {
          lo <- normExternal(row.get(2 * i))
          hi <- normExternal(row.get(2 * i + 1))
          if cmpNorm(lo, hi).isDefined
          bounded <- boundedStat(lo, hi)
        } yield c -> bounded
      }.toMap
      Some(statsJson(m))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  // ---- hive-style partition columns as first-class prune keys ------
  //
  // `#partcols=<c1,c2>` names the table's PARTITION COLUMNS
  // (established by the first commit passing `partitionBy`, inherited
  // by every later commit), and one `#part_<dir>=<json>` line per
  // partitioned data dir records the EXACT value tuple every row of
  // that dir carries. A partitioned commit stages one dir per
  // distinct partition-value tuple — the date-partitioned layout
  // every 100 TB fact table uses — and the values prune BEFORE
  // stats/bloom fire: `WHERE year = 1998` on a year-partitioned table
  // reads exactly the matching dirs, manifest-read planning cost.
  //
  // Differences from min/max stats that make partitions first-class:
  // the value is exact (min==max by construction, so equality,
  // ranges and IN prune precisely), and a NULL-valued partition dir
  // is PRUNED by any comparison predicate (NULL satisfies none) where
  // stats must conservatively keep it. Partition columns stay IN the
  // data files (dirs are self-contained; the manifest line is
  // metadata, not hive path encoding), so every reader — time travel,
  // clone, compaction, COW rewrites — composes unchanged: a rewrite's
  // fresh dir simply carries no #part_ line and is always scanned.
  private val PartColsPrefix = "#partcols="
  private val PartPrefix = "#part_"

  /** Per-BATCH distinct-partition-tuple cap for [[stageBatch]] (a dir
    * per tuple is the layout contract, so a batch staging thousands of
    * dirs wants a coarser key). `var` only as a test seam — specs
    * lower it to exercise the maintenance fallback without staging a
    * thousand real dirs. */
  private[graft] var stageTupleCap: Int = 1000

  // ---- hash-bucketed layout as a table property ---------------------
  //
  // `#bucketby=<n>:<c1,c2>` declares the table CO-LOCATION layout
  // (established by the first commit passing `bucketBy`, inherited by
  // every later commit and COW rewrite, divergent re-declaration
  // refused — one layout per table, like #partcols). Every data write
  // to a bucketed table stages through Spark's own bucketed writer, so
  // files carry the engine's bucket-id naming and the Murmur3 hash
  // Spark's HashPartitioning uses — which is what lets [[readBucketed]]
  // (and SQL reads through the catalog) expose
  // `outputPartitioning = HashPartitioning(cols, n)` on the scan:
  // joins and aggregations on the bucket key read the stored side with
  // ZERO exchanges. This closes the stored-index gap: a band index or
  // df multiset stored in a lake table now gets OCC, time travel and
  // the change feed AND shuffle-free probes — previously those lived
  // in catalog `bucketBy` tables only (sources/Bucketing.scala).
  //
  // Bucketing COMPOSES with hive-style partition columns (each
  // partition tuple's dir writes bucketed; bucket grouping is exact
  // across any pruned dir subset because key placement is global) —
  // the standard date-partitioned + key-bucketed fact layout. Z-order
  // refuses on bucketed tables (a clustered rewrite would destroy the
  // bucket naming the read contract depends on; compaction instead
  // preserves the layout by re-staging through the bucketed writer),
  // and an APPEND cannot introduce bucketing to an existing unbucketed
  // table (earlier dirs lack the naming — re-layout via overwrite).
  private val BucketByPrefix = "#bucketby="

  // ---- CHECK constraints as a table property -----------------------
  //
  // `#check=<name>:<sql expression>` lines (one per constraint,
  // inherited like every table-property line) are Delta's CHECK
  // constraints / DLT expectations: EVERY commit that introduces or
  // rewrites rows validates them in ONE extra aggregate job over the
  // batch (never the table) and refuses naming the violated
  // constraints and their violation counts. SQL NULL semantics: a row
  // passes when the expression is TRUE or NULL, violates only on
  // FALSE. Row-preserving maintenance (compact, z-order, restore) and
  // predicate DELETE skip validation — they cannot create a violating
  // row that did not already exist.
  private val CheckPrefix = "#check="

  private[graft] def manifestChecks(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Seq[(String, String)] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(CheckPrefix) &&
          l.indexOf(':', CheckPrefix.length) > CheckPrefix.length =>
        val i = l.indexOf(':', CheckPrefix.length)
        l.substring(CheckPrefix.length, i) -> l.substring(i + 1)
    }

  private def liveChecks(fs: org.apache.hadoop.fs.FileSystem,
      r: Path): Seq[(String, String)] =
    committedVersions(fs, r).lastOption
      .map(v => manifestChecks(fs, r, v)).getOrElse(Nil)

  /** ONE aggregate job over `df`: refuse (naming every violated
    * constraint and its row count) if any live CHECK constraint fails.
    * O(batch) — the validation scans what the commit was going to
    * write anyway, never the table. */
  private def validateChecks(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      df: org.apache.spark.sql.DataFrame, what: String,
      gens: Seq[(String, String)] = Nil): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, sum, when}
    // generated columns gate through the same machinery: a batch
    // SUPPLYING a generated column must agree with the expression
    // row-for-row (`<=>`: exact, never NULL), or the layout the
    // readers prune by would lie
    val effGens = if (gens.nonEmpty) gens
      else committedVersions(fs, r).lastOption
        .map(v => manifestGenParts(fs, r, v)).getOrElse(Nil)
    val genChecks = effGens.map { case (c, e) =>
      s"gen_$c" -> s"`$c` <=> ($e)" }
    val cs = liveChecks(fs, r) ++ genChecks
    if (cs.isEmpty) return
    // a batch OMITTING a committed column evolves it NULL-backfilled
    // (mergeSchemas marks it nullable, old readers see NULL) — so the
    // checks validate against that SAME view: the omitted column joins
    // the batch as a typed NULL and `c IS NOT NULL` refuses the
    // omission up front, instead of the constraint silently claiming
    // to hold over rows that read NULL. This IS the engine's NOT NULL
    // enforcement: declare `ADD CONSTRAINT … CHECK (c IS NOT NULL)`
    // and neither a NULL-carrying nor a column-omitting batch commits.
    val committed = committedVersions(fs, r).lastOption
      .flatMap(v => manifestSchema(fs, r, v))
    val widened = committed match {
      case Some(s) =>
        s.fields.filterNot(f => df.columns.contains(f.name))
          .foldLeft(df)((d, f) =>
            d.withColumn(f.name, lit(null).cast(f.dataType)))
      case None => df
    }
    val counts = widened.agg(
      sum(when(!coalesce(expr(cs.head._2), lit(true)), 1L).otherwise(0L))
        .as(cs.head._1),
      cs.tail.map { case (n, e) =>
        sum(when(!coalesce(expr(e), lit(true)), 1L).otherwise(0L)).as(n)
      }: _*).collect().head
    val violated = cs.zipWithIndex.collect {
      case ((n, e), i) if !counts.isNullAt(i) && counts.getLong(i) > 0 =>
        s"$n (${counts.getLong(i)} rows violate `$e`)"
    }
    if (violated.nonEmpty) throw new IllegalArgumentException(
      s"$what at $r violates CHECK constraint(s): " +
        violated.mkString("; ") + " — fix the rows or drop the constraint")
  }

  /** ADD a CHECK constraint (Delta's ALTER TABLE ADD CONSTRAINT):
    * validates the EXISTING table first (one aggregate job over the
    * live snapshot), then commits the property — same dirs, one
    * manifest write. Every later row-introducing commit validates its
    * batch against it. */
  def addCheckConstraint(spark: SparkSession, root: String,
      name: String, sqlExpr: String, retain: Int = -1): Long = {
    require(name.nonEmpty && !name.exists(":=,\n#".contains(_)),
      s"constraint name '$name' may not contain ':', '=', ',', '#', or newline")
    require(!sqlExpr.contains("\n"),
      "constraint expression must be a single manifest line")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root"))
    val prev = manifestChecks(fs, r, cur)
    require(!prev.exists(_._1 == name),
      s"constraint '$name' already exists on $root — drop it first")
    // the new constraint must hold on the existing rows
    import org.apache.spark.sql.functions.{coalesce, expr, lit, sum, when}
    val bad = readCommittedAt(spark, root, cur)
      .agg(sum(when(!coalesce(expr(sqlExpr), lit(true)), 1L).otherwise(0L)))
      .collect().head.getLong(0)
    require(bad == 0,
      s"cannot add constraint '$name': $bad existing rows violate " +
        s"`$sqlExpr` — clean the table first (Delta's ADD CONSTRAINT rule)")
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        manifestSchema(fs, r, cur), manifestRows(fs, r, cur),
        checks = Some(prev :+ (name -> sqlExpr)),
        op = s"add constraint $name"))
      throw new java.util.ConcurrentModificationException(
        s"adding constraint '$name' on $root lost version $next to a " +
          "concurrent commit — retry against the current table")
    next
  }

  /** DROP a CHECK constraint — same dirs, one manifest write. */
  def dropCheckConstraint(spark: SparkSession, root: String,
      name: String, retain: Int = -1): Long = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root"))
    val prev = manifestChecks(fs, r, cur)
    require(prev.exists(_._1 == name),
      s"no constraint '$name' on $root (have: " +
        prev.map(_._1).mkString("[", ", ", "]") + ")")
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        manifestSchema(fs, r, cur), manifestRows(fs, r, cur),
        checks = Some(prev.filterNot(_._1 == name)),
        op = s"drop constraint $name"))
      throw new java.util.ConcurrentModificationException(
        s"dropping constraint '$name' on $root lost version $next to a " +
          "concurrent commit — retry against the current table")
    next
  }

  /** The live CHECK constraints of a table: (name, sql expression). */
  def checkConstraints(spark: SparkSession, root: String): Seq[(String, String)] =
    liveChecks(fsFor(spark, root), new Path(root))

  // ---- durable table properties (#prop_<key>=<value>) --------------
  //
  // Delta's TBLPROPERTIES: arbitrary (key, value) strings stored AS
  // TABLE STATE in the manifest chain, inherited by every commit like
  // `#partcols`/`#statscols`, replaced only by the property DDL.
  // Engine-reserved keys parameterize behaviors that were per-call
  // arguments before round 14 — per-call args remain explicit
  // overrides, but the TABLE now owns the default, so two writers
  // that pass nothing cannot silently fight over the time-travel
  // horizon or the DV bound:
  //
  //   graft.retain     — retention horizon (superseded versions kept)
  //   graft.dvMaxRows  — deletion-vector bound for DELETE/UPDATE/MERGE
  //
  // Each manifest version carries its own map, so time travel and
  // RESTORE see every version under the properties it had.
  private val PropPrefix = "#prop_"
  final val PropRetain = "graft.retain"
  final val PropDvMaxRows = "graft.dvMaxRows"

  private[graft] def manifestProps(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Map[String, String] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(PropPrefix) &&
          l.indexOf('=', PropPrefix.length) > PropPrefix.length =>
        val i = l.indexOf('=', PropPrefix.length)
        l.substring(PropPrefix.length, i) -> l.substring(i + 1)
    }.toMap

  private def liveProps(fs: org.apache.hadoop.fs.FileSystem,
      r: Path): Map[String, String] =
    committedVersions(fs, r).lastOption
      .map(v => manifestProps(fs, r, v)).getOrElse(Map.empty)

  /** The live snapshot's table properties (empty when none set). */
  def tableProperties(spark: SparkSession, root: String): Map[String, String] =
    liveProps(fsFor(spark, root), new Path(root))

  /** Effective dvMaxRows: an explicit per-call value (>= 0) wins; the
    * omitted-arg sentinel -1 inherits the table's `graft.dvMaxRows`
    * property, defaulting to 10000. */
  private def effDvMaxRows(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      arg: Long): Long = {
    require(arg >= -1L,
      s"dvMaxRows must be >= 0 (or -1 = inherit $PropDvMaxRows), got $arg")
    val v =
      if (arg >= 0L) arg
      else liveProps(fs, r).get(PropDvMaxRows).map { s =>
        s.toLongOption.filter(_ >= 0L).getOrElse(
          throw new IllegalArgumentException(
            s"table property $PropDvMaxRows='$s' is not a non-negative long"))
      }.getOrElse(10000L)
    require(v < Int.MaxValue, s"dvMaxRows must fit an Int, got $v")
    v
  }

  /** Validate one property (key, value) against the manifest line
    * grammar and the reserved keys' value domains. */
  private def validateProp(k: String, v: String): Unit = {
    require(k.nonEmpty && !k.exists("=\n#".contains(_)),
      s"property key '$k' may not be empty or contain '=', '#', or newline")
    require(!v.contains("\n"), s"property $k value must be a single line")
    if (k == PropRetain) require(v.toIntOption.exists(_ >= 0),
      s"$PropRetain must be a non-negative integer, got '$v'")
    if (k == PropDvMaxRows) require(
      v.toLongOption.exists(n => n >= 0L && n < Int.MaxValue),
      s"$PropDvMaxRows must be a non-negative Int-ranged long, got '$v'")
  }

  /** `ALTER TABLE t SET TBLPROPERTIES (…)`: merge `props` into the
    * table's property map — same dirs, one manifest write, the
    * constraint-commit OCC discipline (lost slot refuses loudly;
    * concurrent property commits serialize by version, last writer
    * wins per key exactly as Delta's metadata conflict rule). */
  def setTableProperties(spark: SparkSession, root: String,
      props: Map[String, String], retain: Int = -1): Long = {
    require(props.nonEmpty, "SET TBLPROPERTIES needs at least one pair")
    props.foreach { case (k, v) => validateProp(k, v) }
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root"))
    val merged = manifestProps(fs, r, cur) ++ props
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        manifestSchema(fs, r, cur), manifestRows(fs, r, cur),
        props = Some(merged),
        op = "set tblproperties " + props.keys.toSeq.sorted.mkString(",")))
      throw new java.util.ConcurrentModificationException(
        s"SET TBLPROPERTIES on $root lost version $next to a concurrent " +
          "commit — retry against the current table")
    next
  }

  /** `ALTER TABLE t UNSET TBLPROPERTIES [IF EXISTS] (…)`. Absent keys
    * refuse unless `ifExists` (Spark's own UNSET semantics). */
  def unsetTableProperties(spark: SparkSession, root: String,
      keys: Seq[String], ifExists: Boolean = false,
      retain: Int = -1): Long = {
    require(keys.nonEmpty, "UNSET TBLPROPERTIES needs at least one key")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root"))
    val have = manifestProps(fs, r, cur)
    val missing = keys.filterNot(have.contains)
    if (!ifExists) require(missing.isEmpty,
      s"cannot UNSET absent table properties on $root: " +
        missing.sorted.mkString("[", ", ", "]") + " (use IF EXISTS)")
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        manifestSchema(fs, r, cur), manifestRows(fs, r, cur),
        props = Some(have -- keys),
        op = "unset tblproperties " + keys.sorted.mkString(",")))
      throw new java.util.ConcurrentModificationException(
        s"UNSET TBLPROPERTIES on $root lost version $next to a concurrent " +
          "commit — retry against the current table")
    next
  }

  // ---- generated columns (derived partition keys) ------------------
  //
  // `#genpart=<col>:<exprText>` declares a GENERATED column (Delta's
  // `GENERATED ALWAYS AS`): its value is a deterministic expression of
  // other columns, materialized into every batch the writer stages (a
  // batch omitting it gets it computed; a batch supplying it is
  // validated row-by-row through the same one-aggregate-job gate CHECK
  // constraints use — `p <=> expr` — so a stale copy refuses instead
  // of silently corrupting the layout). The payoff is at READ time: a
  // query filtering the SOURCE column prunes the GENERATED partition
  // column — `WHERE ts BETWEEN a AND b` on a `p = year(ts)`-partitioned
  // 100 TB fact derives `p BETWEEN year(a) AND year(b)` and reads only
  // the matching partition dirs, Delta's generated-column partition
  // filter rule. Range derivation is restricted to a MONOTONE
  // whitelist (year, to_date, date_trunc, cast-to-date); any
  // single-column deterministic expression derives equality and IS
  // NULL conjuncts. Expressions over TimestampType evaluate under the
  // session time zone, so the zone is recorded at establishment
  // (`#genparttz=`) and derivation quietly disables when a reading
  // session's zone differs — pruning weakens, never lies.
  private val GenPartPrefix = "#genpart="
  private val GenTzPrefix = "#genparttz="

  private[graft] def manifestGenParts(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Seq[(String, String)] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(GenPartPrefix) &&
          l.indexOf(':', GenPartPrefix.length) > GenPartPrefix.length =>
        val i = l.indexOf(':', GenPartPrefix.length)
        l.substring(GenPartPrefix.length, i) -> l.substring(i + 1)
    }

  private def manifestGenTz(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Option[String] =
    manifestBody(fs, r, v).find(_.startsWith(GenTzPrefix))
      .map(_.stripPrefix(GenTzPrefix))

  // ---- identity columns (GENERATED ALWAYS AS IDENTITY) -------------
  //
  // `#identity=<col>:<next>` declares a writer-materialized surrogate
  // key (the reference's `id SERIAL PRIMARY KEY`,
  // /root/reference/dags/sql/news.sql:2, at lake scale): batches MUST
  // omit the column (GENERATED ALWAYS — an explicit value could
  // collide with the allocator), each append allocates the contiguous
  // block [next, next + n) and advances the high-water mark IN THE
  // SAME manifest write, so the mark and the rows that consumed it
  // commit atomically. OCC composes: an append that loses its slot to
  // a concurrent allocator re-reads the mark, RE-STAGES its batch
  // under the new block, and retries — concurrent appends allocate
  // disjoint, gap-free-per-commit ranges with no coordinator beyond
  // the manifest slot itself.
  private val IdentityPrefix = "#identity="

  private[graft] def manifestIdentity(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Option[(String, Long)] =
    manifestBody(fs, r, v).find(_.startsWith(IdentityPrefix)).flatMap { l =>
      val body = l.stripPrefix(IdentityPrefix)
      val i = body.lastIndexOf(':')
      if (i <= 0) None
      else body.drop(i + 1).toLongOption.map(n => (body.take(i), n))
    }

  /** The live identity declaration: (column, next value to allocate). */
  def identityColumn(spark: SparkSession, root: String): Option[(String, Long)] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    committedVersions(fs, r).lastOption.flatMap(v => manifestIdentity(fs, r, v))
  }

  /** Declaration resolution (the [[effectiveGenParts]] discipline):
    * `want` on the first declaring commit, inherited afterwards,
    * divergence refused. */
  private def effectiveIdentityCol(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, want: Option[String]): Option[String] = {
    val prev = committedVersions(fs, r).lastOption
      .flatMap(v => manifestIdentity(fs, r, v)).map(_._1)
    want match {
      case None => prev
      case Some(c) =>
        require(c.nonEmpty && !c.exists("=,:\n#".contains(_)),
          s"identity column name '$c' may not contain '=', ',', ':', '#', or newline")
        require(prev.isEmpty || prev.contains(c),
          s"table at $r declares identity column '${prev.get}'; a commit " +
            s"cannot re-declare it as '$c' — one identity per table")
        Some(c)
    }
  }

  /** Materialize the contiguous id block [start, start + n) into
    * `idCol` (LongType, gap-free per commit by construction).
    * `zipWithIndex` is a distributed two-pass (per-partition counts,
    * then offset map) — O(batch), no single-partition shuffle, the
    * price of contiguity. Assignment order within the batch is
    * partition order (arbitrary but valid: identity guarantees
    * uniqueness + per-commit contiguity, not row affinity). */
  private def materializeIdentity(df: org.apache.spark.sql.DataFrame,
      idCol: String, start: Long): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val out = df.schema.add(idCol,
      org.apache.spark.sql.types.LongType, nullable = false)
    spark.createDataFrame(
      df.rdd.zipWithIndex.map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (start + i)) },
      out)
  }

  /** SQL `INSERT INTO t (named, cols)` pads every UNNAMED column with
    * NULL. For identity/generated columns an all-NULL padded copy
    * means "omitted" — drop it so the allocator/expression recomputes
    * (Delta's rule). One aggregate job probes every carried special
    * column at once; a copy with ANY real value stays (generated
    * copies then validate row-for-row; identity refuses upstream). */
  private def dropAllNullSpecials(df: org.apache.spark.sql.DataFrame,
      gens: Seq[(String, String)], ident: Option[(String, Long)]):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count}
    val carried = (gens.map(_._1) ++ ident.map(_._1).toSeq).distinct
      .filter(df.columns.contains)
    if (carried.isEmpty) return df
    val counts = df.agg(count(col(carried.head)),
      carried.tail.map(c => count(col(c))): _*).collect().head
    carried.zipWithIndex
      .filter { case (_, i) => counts.getLong(i) == 0L }
      .map(_._1).foldLeft(df)(_.drop(_))
  }

  /** The table's established generated columns: `want` on the first
    * declaring commit, inherited afterwards, divergence refused —
    * a generated column is a TABLE property like the partition
    * layout. */
  private def effectiveGenParts(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, want: Map[String, String]): Seq[(String, String)] = {
    want.foreach { case (c, e) =>
      require(c.nonEmpty && !c.exists("=,:\n#".contains(_)),
        s"generated column name '$c' may not contain '=', ',', ':', '#', or newline")
      require(!e.contains("\n"),
        s"generated column expression for '$c' must be a single manifest line")
    }
    val prev = committedVersions(fs, r).lastOption
      .map(v => manifestGenParts(fs, r, v)).getOrElse(Nil)
    if (want.isEmpty) prev
    else {
      val w = want.toSeq.sortBy(_._1)
      require(prev.isEmpty || prev.sortBy(_._1) == w,
        s"table at $r declares generated columns ${prev.toMap}; a commit " +
          s"cannot re-declare them as $want — one generation per table")
      w
    }
  }

  /** Materialize every declared generated column the batch omits. */
  private def materializeGenerated(df: org.apache.spark.sql.DataFrame,
      gens: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
    gens.foldLeft(df) { case (d, (c, e)) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, org.apache.spark.sql.functions.expr(e))
    }

  /** Monotone-or-equality classification of one generated-column
    * expression: Some((sourceColumn, rangeDerivable)). */
  private def classifyGenExpr(spark: SparkSession,
      text: String): Option[(String, Boolean)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal => CLit}
    val parsed = scala.util.Try(
      spark.sessionState.sqlParser.parseExpression(text)).toOption
      .getOrElse(return None)
    def attrOf(e: org.apache.spark.sql.catalyst.expressions.Expression):
        Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        Some(a.nameParts.head)
      case _ => None
    }
    def eqOnly: Option[(String, Boolean)] = {
      val attrs = parsed.collect {
        case a: UnresolvedAttribute => a.nameParts.mkString(".") }.distinct
      if (attrs.length == 1) Some((attrs.head, false)) else None
    }
    parsed match {
      case f: UnresolvedFunction =>
        (f.nameParts.last.toLowerCase(java.util.Locale.ROOT),
            f.arguments) match {
          case ("year", Seq(a)) if attrOf(a).isDefined =>
            Some((attrOf(a).get, true))
          case ("to_date", Seq(a)) if attrOf(a).isDefined =>
            Some((attrOf(a).get, true))
          case ("date_trunc", Seq(_: CLit, a)) if attrOf(a).isDefined =>
            Some((attrOf(a).get, true))
          case ("trunc", Seq(a, _: CLit)) if attrOf(a).isDefined =>
            Some((attrOf(a).get, true))
          case _ => eqOnly
        }
      case c: Cast if attrOf(c.child).isDefined &&
          c.dataType == org.apache.spark.sql.types.DateType =>
        Some((attrOf(c.child).get, true))
      case _ => eqOnly
    }
  }

  /** Evaluate generated expression `text` at the source-column literal
    * `v` (normalized) — one driver-local job over `range(1)` (the
    * select resolves functions and folds; no data is touched). None
    * when anything refuses: derivation then just doesn't happen. */
  private def evalGenAt(spark: SparkSession, text: String, srcCol: String,
      srcType: org.apache.spark.sql.types.DataType,
      v: NormVal): Option[NormVal] = scala.util.Try {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Literal => CLit}
    import org.apache.spark.sql.types._
    val internal: Any = (v, srcType) match {
      case (NumV(bd), ByteType)    => bd.toByteExact
      case (NumV(bd), ShortType)   => bd.toShortExact
      case (NumV(bd), IntegerType | DateType) => bd.toIntExact
      case (NumV(bd), LongType | TimestampType | TimestampNTZType) =>
        bd.toLongExact
      case (NumV(bd), FloatType)   => bd.toFloat
      case (NumV(bd), DoubleType)  => bd.toDouble
      case (NumV(bd), d: DecimalType) =>
        org.apache.spark.sql.types.Decimal(bd, d.precision, d.scale)
      case (StrV(u), StringType)   => u
      case _ => return None
    }
    val substituted = spark.sessionState.sqlParser.parseExpression(text)
      .transform {
        case a: UnresolvedAttribute if a.nameParts == Seq(srcCol) =>
          CLit(internal, srcType)
      }
    val out = spark.range(1)
      .select(org.apache.spark.sql.graft.Shim.column(substituted))
      .collect().head.get(0)
    normExternal(out)
  }.toOption.flatten

  /** Derivation-safety profile of a generated expression that is NOT
    * on the monotone whitelist: (deterministic, nullPreserving,
    * tzDependent).
    * Determinism is read off the ANALYZED tree (the unresolved one
    * reports children-only determinism, so `rand()` would lie) and
    * additionally refuses the query-time-anchored family
    * (current_date/now/…): those are Catalyst-"deterministic" within
    * one query but evaluate differently at read time than at the
    * establishing write, which would derive wrong equalities.
    * NULL-preservation is proven by EVALUATION at a NULL source
    * literal — the only exact check for arbitrary expressions
    * (`coalesce(x, 0)`, `isnull(x)`, `hash(x) % 16` all correctly
    * fail it, so `x IS NULL` never derives `p IS NULL` for them).
    * tzDependent is true when the ANALYZED tree contains any
    * session-zone-anchored node (`TimeZoneAwareExpression`, or a
    * `Cast` whose from/to pair needs a zone) — REGARDLESS of the
    * source column's type: `from_unixtime(x)` over a LongType x and
    * `date_trunc` over a DateType x both evaluate in the session
    * zone, so a cross-zone reader would map predicate values
    * differently than the writer materialized partition values and
    * prune dirs that contain matching rows. Callers refuse every
    * derivation of a tz-dependent expression unless the reading
    * session's zone matches the establishing writer's (`#gentz`).
    * None when the expression refuses to resolve. */
  private def genExprProfile(spark: SparkSession, text: String,
      srcCol: String, srcType: org.apache.spark.sql.types.DataType):
      Option[(Boolean, Boolean, Boolean)] = scala.util.Try {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Cast,
      TimeZoneAwareExpression, Literal => CLit}
    val substituted = spark.sessionState.sqlParser.parseExpression(text)
      .transform {
        case a: UnresolvedAttribute if a.nameParts == Seq(srcCol) =>
          CLit(null, srcType)
      }
    val df = spark.range(1)
      .select(org.apache.spark.sql.graft.Shim.column(substituted))
    val timeAnchored = Set("currentdate", "currenttimestamp", "now",
      "localtimestamp", "currenttimezone", "currenttime")
    val analyzed = df.queryExecution.analyzed.expressions
    val det = analyzed.forall(e =>
      e.deterministic && e.find(c => timeAnchored.contains(
        c.nodeName.toLowerCase(java.util.Locale.ROOT))).isEmpty)
    val tzDep = analyzed.exists(e => e.find {
      case c: Cast => Cast.needsTimeZone(c.child.dataType, c.dataType)
      case _: TimeZoneAwareExpression => true
      case _ => false
    }.isDefined)
    val nullAtNull = det && df.collect().head.isNullAt(0)
    (det, nullAtNull, tzDep)
  }.toOption

  /** Extra prunable conjuncts on GENERATED columns, derived from the
    * query's conjuncts on their source columns (all in LOGICAL names;
    * callers translate afterwards). Monotone expressions derive
    * ranges (strict bounds weaken to inclusive — f is non-strictly
    * monotone; temporal sources only), equality/IN derives when the
    * expression is proven deterministic, and IS NULL only when it is
    * additionally proven NULL-preserving (the whitelist is both by
    * construction; anything else proves it via [[genExprProfile]] or
    * doesn't derive). Purely an optimization: the
    * derived conjuncts are implied by the originals, so Keep AND
    * whole-dir-Drop proofs stay exact. */
  private def deriveGenPreds(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, r: Path, v: Long,
      preds: Seq[Pred]): Seq[Pred] = {
    val gens = manifestGenParts(fs, r, v)
    if (gens.isEmpty || preds.isEmpty) return Nil
    val schema = manifestSchema(fs, r, v).getOrElse(return Nil)
    val tzOk = manifestGenTz(fs, r, v).forall(
      _ == spark.sessionState.conf.sessionLocalTimeZone)
    gens.flatMap { case (p, text) =>
      classifyGenExpr(spark, text) match {
        case None => Nil
        case Some((src, monotone0)) =>
          val srcFieldOpt = schema.fields.find(_.name == src)
          if (srcFieldOpt.isEmpty) Nil
          // session-zone-dependent evaluation: derive only when the
          // reading session matches the establishing one
          else if (srcFieldOpt.get.dataType ==
              org.apache.spark.sql.types.TimestampType && !tzOk) Nil
          else {
          import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
          val srcType = srcFieldOpt.get.dataType
          // the monotone whitelist (year/to_date/date_trunc/trunc/
          // cast-to-date) is deterministic and NULL-preserving by
          // construction; an eqOnly-classified expression must PROVE
          // both before ANY derivation happens (PEq needs determinism,
          // PNull additionally needs f(NULL) = NULL)
          lazy val prof = genExprProfile(spark, text, src, srcType)
          // session-zone safety gates EVERY derivation, not just
          // timestamp sources: `from_unixtime(x)` over a long and
          // `date_trunc` over a date are both zone-anchored, so a
          // cross-zone reader maps values differently than the writer
          // did. Safe when the zones match (tzOk) or the analyzed tree
          // is proven zone-free; when the profile refuses to resolve,
          // refuse derivation under a mismatched zone.
          val tzSafe = tzOk || prof.exists(!_._3)
          // range derivation needs a TEMPORAL source (Delta's gate):
          // lexical string order is not monotone under date parsing
          // (' 2021-03-04' < '2020-1-5' lexically), so a string-typed
          // source falls back to equality-only derivation
          val monotone = monotone0 && tzSafe && (srcType == DateType ||
            srcType == TimestampType || srcType == TimestampNTZType)
          val detOk = tzSafe && (monotone0 || prof.exists(_._1))
          val nullOk = tzSafe && (monotone0 || prof.exists(p => p._1 && p._2))
          preds.filter(_.col == src).flatMap { pr =>
            def at(nv: NormVal): Option[NormVal] =
              evalGenAt(spark, text, src, srcFieldOpt.get.dataType, nv)
            // a DISCRETE source type tightens strict bounds by one
            // unit before mapping: `d < 1998-01-01` derives
            // `year <= year(1997-12-31) = 1997`, not the weak `<= 1998`
            def discreteStep(nv: NormVal, delta: Int): Option[NormVal] = {
              import org.apache.spark.sql.types._
              (nv, srcFieldOpt.get.dataType) match {
                case (NumV(bd), ByteType | ShortType | IntegerType |
                     LongType | DateType | TimestampType |
                     TimestampNTZType) => Some(NumV(bd + delta))
                case _ => None
              }
            }
            pr.op match {
              case PEq if detOk =>
                val mapped = pr.values.map(at)
                if (mapped.exists(_.isEmpty)) Nil
                else Seq(Pred(p, PEq, mapped.flatten))
              case PNull if nullOk => Seq(Pred(p, PNull, Nil))
              case PLt if monotone =>
                discreteStep(pr.values.head, -1).orElse(Some(pr.values.head))
                  .flatMap(at).map(d => Pred(p, PLe, Seq(d))).toSeq
              case PLe if monotone =>
                at(pr.values.head).map(d => Pred(p, PLe, Seq(d))).toSeq
              case PGt if monotone =>
                discreteStep(pr.values.head, 1).orElse(Some(pr.values.head))
                  .flatMap(at).map(d => Pred(p, PGe, Seq(d))).toSeq
              case PGe if monotone =>
                at(pr.values.head).map(d => Pred(p, PGe, Seq(d))).toSeq
              case _ => Nil
            }
          }
          }
      }
    }
  }

  // ---- COPY INTO (idempotent landing-zone ingestion) ----------------
  //
  // `#ingested=<fileName>:<len>` manifest lines record which landing
  // files a table has already loaded (Delta's COPY INTO file ledger):
  // re-running the same COPY commits NOTHING, so a crash-retried cron
  // never double-loads. Entries are SELF-BOUNDED: each COPY keeps only
  // the entries whose file still exists in the landing dir (a file
  // removed from the zone can never re-ingest, so its entry carries no
  // information) — the ledger is O(landing dir), not O(history).
  // Dedup keys on the NAME alone (Delta's rule): a landing file
  // rewritten in place is NOT reloaded — landing zones are
  // append-only by contract, and re-loading a mutated file would
  // double its rows.
  private val IngestedPrefix = "#ingested="

  private[graft] def manifestIngested(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Seq[String] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(IngestedPrefix) => l.stripPrefix(IngestedPrefix)
    }

  /** `COPY INTO <table> FROM '<dir>'`: append every parquet file of
    * the landing dir that is not yet in the table's ingestion ledger,
    * as ONE ordinary append commit (schema evolution, CHECK
    * constraints, partition/bucket layout, identity allocation — the
    * full staging choke point applies) that atomically records the
    * loaded file names. Idempotent: a re-run lists, finds every file
    * recorded, and commits nothing. Concurrency: the commit refuses
    * (loudly) if ANY commit interleaves — a lost race means the
    * ledger this COPY read may be stale, and the re-run the error
    * demands re-reads it, skipping whatever the winner loaded. At
    * 100 TB the cost model is O(new files): the listing is one
    * directory scan and the append stages only unrecorded files.
    * @return (committed version, files ingested this run) */
  def copyInto(spark: SparkSession, root: String, srcDir: String,
      retain: Int = -1, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): (Long, Long) = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root — COPY INTO loads into an " +
          "existing table; establish it with commitOverwrite/CREATE TABLE"))
    val sfs = fsFor(spark, srcDir)
    val sp = new Path(srcDir)
    require(sfs.exists(sp), s"COPY INTO source dir does not exist: $srcDir")
    require(sfs.makeQualified(sp) != fs.makeQualified(r),
      "COPY INTO source must not be the table root itself")
    val landing = sfs.listStatus(sp).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.getName, st.getLen))
      .toSeq.sortBy(_._1)
    landing.foreach { case (n, _) => require(!n.exists(":=,\n#".contains(_)),
      s"landing file name '$n' cannot ride the ingestion ledger") }
    val landingNames = landing.map(_._1).toSet
    val prevLedger = manifestIngested(fs, r, cur)
    val recordedNames = prevLedger.map(_.takeWhile(_ != ':')).toSet
    val newFiles = landing.filterNot { case (n, _) => recordedNames(n) }
    if (newFiles.isEmpty) return (cur, 0L)
    val keptLedger = prevLedger.filter(e =>
      landingNames(e.takeWhile(_ != ':')))
    val ledger = keptLedger ++ newFiles.map { case (n, l) => s"$n:$l" }
    val df = spark.read.parquet(
      newFiles.map { case (n, _) => new Path(sp, n).toString }: _*)
    val v = commitAppend(df, root, retain = retain, statsCols = statsCols,
      bloomCols = bloomCols, op = s"copy into from $srcDir",
      ingested = Some(ledger), requireBase = Some(cur))
    (v, newFiles.size.toLong)
  }

  // ---- column mapping (rename / drop as metadata) ------------------
  //
  // `#colmap=<logical>:<physical>,…` records — for the columns whose
  // names diverge — the PHYSICAL name under which the table's data
  // files store a committed (LOGICAL) column: Delta's column-mapping
  // 'name' mode. Physical names FREEZE at column birth, so a RENAME is
  // one manifest write (same dirs; the `#schema` field takes the new
  // logical name; the map entry re-points) and a DROP is one manifest
  // write that also RETIRES the physical name (`#colretired=…`) so a
  // later re-add of the same logical name allocates a fresh physical
  // name instead of resurrecting the dropped column's bytes from old
  // files. Readers scan under physical names and alias back to
  // logical at the user boundary; writers rename logical→physical
  // before staging; every other manifest line (`#partcols`,
  // `#statscols`, `#bucketby`, per-dir stat/bloom/part keys) is keyed
  // PHYSICALLY and therefore never rewrites on rename. Each manifest
  // version carries its own map, so time travel serves every version
  // under the names it had. Absent lines mean identity — pre-mapping
  // tables read and write exactly as before, at zero cost.
  private val ColMapPrefix = "#colmap="
  private val ColRetiredPrefix = "#colretired="

  private[sources] def manifestColMap(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Map[String, String] =
    manifestBody(fs, r, v).find(_.startsWith(ColMapPrefix))
      .map(_.stripPrefix(ColMapPrefix).split(",").iterator
        .map(_.trim).filter(_.nonEmpty).flatMap { e =>
          val i = e.indexOf(':')
          if (i <= 0) None else Some(e.take(i) -> e.drop(i + 1))
        }.toMap)
      .getOrElse(Map.empty)

  private def manifestRetired(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Seq[String] =
    manifestBody(fs, r, v).find(_.startsWith(ColRetiredPrefix))
      .map(_.stripPrefix(ColRetiredPrefix).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  /** The live snapshot's column map (empty = identity). */
  private def liveColMap(fs: org.apache.hadoop.fs.FileSystem,
      r: Path): Map[String, String] =
    committedVersions(fs, r).lastOption
      .map(v => manifestColMap(fs, r, v)).getOrElse(Map.empty)

  private[sources] def colMapAt(spark: SparkSession, root: String,
      version: Long): Map[String, String] =
    manifestColMap(fsFor(spark, root), new Path(root), version)

  /** The physical (file) name of logical column `c`. */
  private[sources] def physName(map: Map[String, String], c: String): String =
    map.getOrElse(c, {
      // nested paths map their HEAD segment (renaming re-points the
      // container; field names inside a struct never change) — an
      // exact-name hit wins first so a top-level column whose name
      // contains a literal dot still maps as itself
      val i = c.indexOf('.')
      if (i < 0) c
      else map.get(c.take(i)).map(_ + c.drop(i)).getOrElse(c)
    })

  /** Logical schema → the PHYSICAL schema its files store (field
    * renames only; order, types and nullability are shared). */
  private[sources] def physSchema(
      schema: org.apache.spark.sql.types.StructType,
      map: Map[String, String]): org.apache.spark.sql.types.StructType =
    if (map.isEmpty) schema
    else org.apache.spark.sql.types.StructType(
      schema.fields.map(f => f.copy(name = physName(map, f.name))))

  /** Batch with LOGICAL names → the PHYSICAL names staging writes. */
  private def toPhysicalDf(df: org.apache.spark.sql.DataFrame,
      map: Map[String, String]): org.apache.spark.sql.DataFrame =
    if (map.isEmpty) df else df.toDF(df.columns.map(physName(map, _)): _*)

  /** Prunable conjuncts re-keyed to physical names (per-dir stat /
    * bloom / partition / file-stat lines are keyed physically). */
  private def predsToPhysical(preds: Seq[Pred],
      map: Map[String, String]): Seq[Pred] =
    if (map.isEmpty) preds else preds.map(p => p.copy(col = physName(map, p.col)))

  /** Logical column names → physical, for user-supplied column lists
    * (statsCols / bloomCols / partitionBy / bucketBy / z-order). */
  private def colsToPhysical(cols: Seq[String],
      map: Map[String, String]): Seq[String] =
    if (map.isEmpty) cols else cols.map(physName(map, _))

  /** Names of `checks` whose expression references column `c`
    * (parsed, case-insensitive; an unparseable expression is
    * conservatively treated as referencing). */
  private def checksReferencing(spark: SparkSession,
      checks: Seq[(String, String)], c: String): Seq[String] =
    checks.collect { case (n, e) if
        scala.util.Try(spark.sessionState.sqlParser.parseExpression(e))
          .map(_.exists {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              u.nameParts.exists(_.equalsIgnoreCase(c))
            case _ => false
          }).getOrElse(true) => n }

  /** Extend `map` with physical-name assignments for the columns of
    * `schema` it does not cover: identity (no entry) unless the name
    * is already claimed as a mapped physical name or retired — then a
    * fresh `<name>_r<version>` allocates, so a column re-added after
    * a rename/drop can never read another column's bytes. */
  private def allocPhysical(schema: org.apache.spark.sql.types.StructType,
      map: Map[String, String], retired: Seq[String],
      version: Long): Map[String, String] = {
    if (map.isEmpty && retired.isEmpty) return map
    var out = map
    // ALL mapped physical names are claimed — including those of live
    // columns the batch omits — plus every retired name
    var used = map.values.toSet ++ retired
    schema.fieldNames.filterNot(out.contains).foreach { n =>
      if (!used(n)) used += n
      else {
        require(!n.exists("=,:\n#".contains(_)),
          s"column name '$n' needs a #colmap entry (its name collides " +
            "with a retired or mapped physical column) but contains " +
            "'=', ',', ':', '#', or newline — rename it in the batch")
        var cand = s"${n}_r$version"
        var i = 0
        while (used(cand)) { i += 1; cand = s"${n}_r${version}_$i" }
        out += n -> cand
        used += cand
      }
    }
    out
  }

  /** RENAME a column as METADATA (Delta's column mapping): one
    * manifest write, ZERO data I/O at any table size — the immutable
    * data files keep the column's physical name, the committed schema
    * takes the new logical one, and the `#colmap` line re-points.
    * Superseded versions keep their own names under time travel.
    * Refuses: unknown source, duplicate target, a manifest-hostile
    * target name, a column referenced by a CHECK constraint (the
    * stored expression text would silently stop binding — drop the
    * constraint, rename, re-add it under the new name), pre-schema
    * (legacy) tables, and fold-maintained tables (their sink writes
    * data dirs outside the staging choke point that applies the map).
    * Optimistically concurrent like every maintenance commit.
    * @return the committed version carrying the renamed schema */
  def renameColumn(spark: SparkSession, root: String,
      oldName: String, newName: String, retain: Int = -1): Long = {
    require(newName.nonEmpty && !newName.exists("=,:\n#".contains(_)),
      s"column name '$newName' may not contain '=', ',', ':', '#', or newline")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val schema = manifestSchema(fs, r, cur).getOrElse(
      throw new IllegalArgumentException(
        s"the table at $root predates carried schemas — commit once " +
          "(any append) to establish a #schema line, then rename"))
    require(schema.fieldNames.contains(oldName),
      s"no column '$oldName' at $root (have: " +
        schema.fieldNames.mkString("[", ", ", "]") + ")")
    require(!schema.fieldNames.contains(newName),
      s"column '$newName' already exists at $root")
    requireNotFoldTable(fs, r, "rename a column of")
    val refs = checksReferencing(spark, manifestChecks(fs, r, cur), oldName)
    require(refs.isEmpty,
      s"cannot rename '$oldName': CHECK constraint(s) " +
        refs.mkString("[", ", ", "]") + " reference it — drop them, " +
        "rename, and re-add them under the new name")
    val genRefs = manifestGenParts(fs, r, cur).collect {
      case (c, _) if c == oldName => c
    } ++ checksReferencing(spark, manifestGenParts(fs, r, cur), oldName)
    require(genRefs.isEmpty,
      s"cannot rename '$oldName': generated column(s) " +
        genRefs.distinct.mkString("[", ", ", "]") + " are (or derive " +
        "from) it — the stored generation expression would stop binding")
    val map = manifestColMap(fs, r, cur)
    val phys = physName(map, oldName)
    val newMap = (map - oldName) ++
      (if (phys == newName) Nil else Seq(newName -> phys))
    val newSchema = org.apache.spark.sql.types.StructType(schema.fields.map(
      f => if (f.name == oldName) f.copy(name = newName) else f))
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        Some(newSchema), manifestRows(fs, r, cur),
        colMap = Some(newMap),
        op = s"rename column $oldName -> $newName"))
      throw new java.util.ConcurrentModificationException(
        s"renaming '$oldName' on $root lost version $next to a " +
          "concurrent commit — retry against the current table")
    next
  }

  /** DROP a column as METADATA: one manifest write, zero data I/O —
    * the column leaves the committed schema (reads stop serving it),
    * its physical name RETIRES (a later re-add allocates fresh, never
    * resurrecting the dropped bytes), and its entries leave the
    * stats/bloom column lists. Old versions still serve it under time
    * travel. Refuses: the last column, a partition or bucket column
    * (the layout is a table property — rewrite to re-layout), a
    * column referenced by a CHECK constraint, legacy and
    * fold-maintained tables.
    * @return the committed version without the column */
  def dropColumn(spark: SparkSession, root: String,
      name: String, retain: Int = -1): Long = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val schema = manifestSchema(fs, r, cur).getOrElse(
      throw new IllegalArgumentException(
        s"the table at $root predates carried schemas — commit once " +
          "(any append) to establish a #schema line, then drop"))
    require(schema.fieldNames.contains(name),
      s"no column '$name' at $root (have: " +
        schema.fieldNames.mkString("[", ", ", "]") + ")")
    require(schema.length > 1, s"cannot drop the only column of $root")
    requireNotFoldTable(fs, r, "drop a column of")
    val map = manifestColMap(fs, r, cur)
    val phys = physName(map, name)
    require(!manifestPartCols(fs, r, cur).contains(phys),
      s"cannot drop partition column '$name' — the partition layout is " +
        "a table property; re-layout with commitOverwrite to change it")
    require(!manifestBucketBy(fs, r, cur).exists(_._2.contains(phys)),
      s"cannot drop bucket column '$name' — the bucket layout is a " +
        "table property; re-layout with commitOverwrite to change it")
    val refs = checksReferencing(spark, manifestChecks(fs, r, cur), name)
    require(refs.isEmpty,
      s"cannot drop '$name': CHECK constraint(s) " +
        refs.mkString("[", ", ", "]") + " reference it — drop them first")
    val genRefs = manifestGenParts(fs, r, cur).collect {
      case (c, _) if c == name => c
    } ++ checksReferencing(spark, manifestGenParts(fs, r, cur), name)
    require(genRefs.isEmpty,
      s"cannot drop '$name': generated column(s) " +
        genRefs.distinct.mkString("[", ", ", "]") + " are (or derive " +
        "from) it")
    require(!phys.exists("=,\n#".contains(_)),
      s"physical column name '$phys' cannot ride the #colretired line")
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == name))
    val retired = manifestRetired(fs, r, cur)
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        Some(newSchema), manifestRows(fs, r, cur),
        colMap = Some(map - name),
        retiredCols = Some((retired :+ phys).distinct),
        statsColsReplace =
          Some(manifestStatsCols(fs, r, cur).filterNot(_ == phys)),
        bloomColsReplace =
          Some(manifestBloomCols(fs, r, cur).filterNot(_ == phys)),
        op = s"drop column $name"))
      throw new java.util.ConcurrentModificationException(
        s"dropping '$name' on $root lost version $next to a " +
          "concurrent commit — retry against the current table")
    next
  }

  /** ADD nullable columns as METADATA: one manifest write, zero data
    * I/O — the committed schema gains the fields, every existing row
    * reads NULL (exactly what an evolving append would have done), and
    * later batches may supply them. New names that collide with a
    * mapped or retired physical name allocate fresh physical names.
    * Refuses duplicates, legacy (pre-schema) and fold tables.
    * @return the committed version carrying the widened schema */
  def addColumns(spark: SparkSession, root: String,
      cols: Seq[(String, org.apache.spark.sql.types.DataType)],
      retain: Int = -1): Long = {
    require(cols.nonEmpty, "addColumns needs at least one column")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val schema = manifestSchema(fs, r, cur).getOrElse(
      throw new IllegalArgumentException(
        s"the table at $root predates carried schemas — commit once " +
          "(any append) to establish a #schema line, then add columns"))
    cols.foreach { case (n, _) =>
      require(n.nonEmpty && !schema.fieldNames.contains(n),
        s"column '$n' already exists at $root (or is empty)")
    }
    require(cols.map(_._1).distinct.length == cols.length,
      "duplicate names in the added column list")
    requireNotFoldTable(fs, r, "add columns to")
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.fields ++ cols.map { case (n, dt) =>
        org.apache.spark.sql.types.StructField(n, dt, nullable = true) })
    val newMap = allocPhysical(newSchema, manifestColMap(fs, r, cur),
      manifestRetired(fs, r, cur), cur + 1)
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        Some(newSchema), manifestRows(fs, r, cur),
        colMap = Some(newMap),
        op = s"add columns ${cols.map(_._1).mkString(", ")}"))
      throw new java.util.ConcurrentModificationException(
        s"adding columns on $root lost version $next to a concurrent " +
          "commit — retry against the current table")
    next
  }

  /** Insert a nullable field named `path.last` into the struct at
    * `path.init` — the schema-surgery core of nested ADD COLUMN.
    * Refuses a missing/non-struct intermediate and an existing leaf;
    * array/map interiors refuse (a per-element add has no single
    * NULL-backfill story in old files). */
  private def addFieldAt(
      schema: org.apache.spark.sql.types.StructType, path: Seq[String],
      dt: org.apache.spark.sql.types.DataType):
      org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StructField, StructType}
    require(path.nonEmpty, "empty column path")
    if (path.length == 1) {
      require(!schema.fieldNames.contains(path.head),
        s"field '${path.head}' already exists")
      StructType(schema.fields :+
        StructField(path.head, dt, nullable = true))
    } else {
      val i = schema.fieldNames.indexOf(path.head)
      require(i >= 0, s"no field '${path.head}'")
      schema.fields(i).dataType match {
        case st: StructType =>
          val rebuilt = schema.fields.clone()
          rebuilt(i) = rebuilt(i).copy(
            dataType = addFieldAt(st, path.tail, dt))
          StructType(rebuilt)
        case other => throw new IllegalArgumentException(
          s"'${path.head}' is ${other.simpleString}, not a struct — " +
            "cannot add a field inside it")
      }
    }
  }

  /** `ALTER TABLE t ADD COLUMN meta.x <type>`: add a NULLABLE field
    * inside a struct column — one manifest schema commit, zero data
    * I/O. Old files lack the field and read it NULL (parquet schema
    * clipping), exactly like a top-level add; new files write it.
    * The container keeps its frozen physical name under column
    * mapping (nested names ride inside it verbatim), so stats,
    * blooms and pushdown on OTHER nested fields are untouched.
    * Identity / generated / bucket / constraint declarations are
    * top-level-only constructs, so a nested add can never collide
    * with them. */
  def addNestedColumn(spark: SparkSession, root: String,
      path: Seq[String], dt: org.apache.spark.sql.types.DataType,
      retain: Int = -1): Long = {
    require(path.length >= 2,
      s"addNestedColumn needs a nested path (got ${path.mkString(".")}) " +
        "— use addColumns for top-level columns")
    path.foreach(seg => require(
      seg.nonEmpty && !seg.exists("=,\n#:.".contains(_)),
      s"column path segment '$seg' may not be empty or contain " +
        "'=', ',', ':', '#', '.', or newline"))
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val schema = manifestSchema(fs, r, cur).getOrElse(
      throw new IllegalArgumentException(
        s"the table at $root predates carried schemas — commit once " +
          "(any append) to establish a #schema line, then add columns"))
    requireNotFoldTable(fs, r, "add columns to")
    val newSchema =
      try addFieldAt(schema, path, dt)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"cannot add ${path.mkString(".")} at $root: ${e.getMessage}")
      }
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        Some(newSchema), manifestRows(fs, r, cur),
        op = s"add nested column ${path.mkString(".")}"))
      throw new java.util.ConcurrentModificationException(
        s"adding a nested column on $root lost version $next to a " +
          "concurrent commit — retry against the current table")
    next
  }

  /** `ALTER TABLE t ALTER COLUMN c TYPE <wider>`: LOSSLESS type
    * widening as one manifest schema commit — zero data I/O. Old
    * files keep their narrower physical type and read UPCAST under
    * the widened `#schema` (the parquet reader's widening conversion,
    * the same machinery append/merge schema evolution already relies
    * on); new files write the wide type. Admissible widenings are
    * exactly [[widenedType]]'s (byte→short→int→long, float→double,
    * small-integral→double, recursively inside structs/arrays);
    * anything lossy — long→double above all — refuses with the
    * schema-evolution rule's message. Same-type is an idempotent
    * no-op.
    *
    * Refused for columns whose MATERIALIZED artifacts hash or derive
    * from the narrow type: bucket columns (bucket assignment hashes
    * the value's byte width — int 5 and long 5 land in different
    * buckets), generated partition columns and their sources (stored
    * dir tuples froze values computed at the narrow type; `hash(x)`
    * derivations would diverge), and the identity column (its domain
    * is fixed LongType). Range stats, blooms and partition tuples
    * survive widening: they compare through the width-independent
    * normalized domain (BigDecimal / putLong). */
  def alterColumnType(spark: SparkSession, root: String, name: String,
      newType: org.apache.spark.sql.types.DataType,
      retain: Int = -1): Long = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val schema = manifestSchema(fs, r, cur).getOrElse(
      throw new IllegalArgumentException(
        s"the table at $root predates carried schemas — commit once " +
          "(any append) to establish a #schema line, then alter types"))
    val field = schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$name' at $root (have: " +
          schema.fieldNames.mkString("[", ", ", "]") + ")"))
    require(!manifestIdentity(fs, r, cur).exists(_._1 == name),
      s"cannot alter the identity column '$name' — its domain is " +
        "fixed LongType")
    if (field.dataType == newType) return cur // idempotent no-op
    val widened = widenedType(field.dataType, newType)
    require(widened.contains(newType),
      s"ALTER COLUMN TYPE supports lossless widening only; '$name' " +
        s"cannot change ${field.dataType.simpleString} -> " +
        s"${newType.simpleString}. Rewrite the table (commitOverwrite) " +
        "to change a column's type.")
    requireNotFoldTable(fs, r, "alter a column type on")
    manifestBucketBy(fs, r, cur).foreach { case (_, cols) =>
      require(!cols.contains(name),
        s"cannot widen bucket column '$name': bucket assignment hashes " +
          "the stored width, so existing dirs would stop satisfying " +
          "the bucketed read contract — re-layout with commitOverwrite")
    }
    val gens = manifestGenParts(fs, r, cur)
    require(!gens.exists(_._1 == name),
      s"cannot alter generated column '$name' — its stored dir values " +
        "froze under the generation expression")
    // reference check parses the stored text directly (classification
    // may refuse an expression that still references the column)
    val genSrcRefs = gens.collect {
      case (c, text) if scala.util.Try(
          spark.sessionState.sqlParser.parseExpression(text).collect {
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              a.nameParts.head
          }).getOrElse(Seq(name)).contains(name) => c
    }
    require(genSrcRefs.isEmpty,
      s"cannot widen '$name': generated column(s) " +
        genSrcRefs.mkString("[", ", ", "]") + " derive from it and " +
        "their stored dir values froze at the narrow type")
    val newSchema = org.apache.spark.sql.types.StructType(schema.fields.map(
      f => if (f.name == name) f.copy(dataType = newType) else f))
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, manifestDirs(fs, r, cur), retain,
        Some(newSchema), manifestRows(fs, r, cur),
        op = s"alter column $name type ${newType.simpleString}"))
      throw new java.util.ConcurrentModificationException(
        s"altering column type on $root lost version $next to a " +
          "concurrent commit — retry against the current table")
    next
  }

  /** Fold-maintained tables write data dirs outside the staging choke
    * point that applies the column map — refuse mapping DDL on them. */
  private def requireNotFoldTable(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, what: String): Unit =
    committedVersions(fs, r).lastOption
      .flatMap(v => manifestOp(fs, r, v)).foreach(op =>
        require(!op.startsWith("fold"),
          s"cannot $what a fold-maintained table at $r — the fold sink " +
            "pre-writes data dirs under the stream's own column names"))

  private[graft] def manifestBucketBy(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Option[(Int, Seq[String])] =
    manifestBody(fs, r, v).find(_.startsWith(BucketByPrefix)).flatMap { l =>
      val body = l.stripPrefix(BucketByPrefix)
      val i = body.indexOf(':')
      if (i <= 0) None
      else body.take(i).toIntOption.map(n =>
        (n, body.drop(i + 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    }

  /** The table's established bucket layout: `want` when this commit
    * declares one, else inherited — a divergent re-declaration
    * refuses (re-bucket by writing a new root). */
  private def effectiveBucketBy(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      want: Option[(Int, Seq[String])]): Option[(Int, Seq[String])] = {
    want.foreach { case (n, cols) =>
      require(n >= 1, s"bucket count must be >= 1, got $n")
      require(cols.nonEmpty, "bucketBy needs at least one column")
      cols.foreach(c => require(!c.exists("=,\n#:".contains(_)),
        s"bucket column name '$c' may not contain '=', ',', ':', '#', or newline"))
    }
    val prev = committedVersions(fs, r).lastOption
      .flatMap(v => manifestBucketBy(fs, r, v))
    want match {
      case None => prev
      case Some(w) =>
        require(prev.isEmpty || prev.contains(w),
          s"table at $r is bucketed by $prev; a commit cannot re-bucket " +
            s"it as $w — one layout per table (write a new root to re-layout)")
        Some(w)
    }
  }

  private def manifestPartCols(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Seq[String] =
    manifestBody(fs, r, v).find(_.startsWith(PartColsPrefix))
      .map(_.stripPrefix(PartColsPrefix).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  /** Raw `#part_<dir>=<json>` lines of a manifest, keyed by dir. */
  private def manifestPartsRaw(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Map[String, String] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(PartPrefix) && l.indexOf('=') > PartPrefix.length =>
        val i = l.indexOf('=')
        l.substring(PartPrefix.length, i) -> l.substring(i + 1)
    }.toMap

  /** One dir's exact partition values: `{"c":{"n":"123"}}` numeric,
    * `{"c":{"s":"abc"}}` string, `{"c":{"z":true}}` NULL. */
  private def partJson(m: Seq[(String, Option[NormVal])]): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    m.sortBy(_._1).foreach { case (c, v) =>
      val node = om.createObjectNode()
      v match {
        case Some(NumV(n)) => node.put("n", n.toString)
        case Some(StrV(s)) => node.put("s", s.toString)
        case None          => node.put("z", true)
      }
      root.set[com.fasterxml.jackson.databind.JsonNode](c, node)
      ()
    }
    om.writeValueAsString(root)
  }

  /** Inverse of [[partJson]]: col -> Some(value) | None (= NULL). */
  private def parsePartJson(json: String): Map[String, Option[NormVal]] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = scala.util.Try(om.readTree(json)).getOrElse(return Map.empty)
    val it = root.properties().iterator()
    val out = Map.newBuilder[String, Option[NormVal]]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (v.has("n"))
        scala.util.Try(NumV(BigDecimal(v.get("n").asText())))
          .foreach(n => out += e.getKey -> Some(n))
      else if (v.has("s"))
        out += e.getKey -> Some(StrV(
          org.apache.spark.unsafe.types.UTF8String.fromString(v.get("s").asText())))
      else if (v.has("z"))
        out += e.getKey -> None
    }
    out.result()
  }

  /** Partition columns established for the table (inherited), with a
    * divergent re-declaration refused — one layout per table. */
  /** One recorded partition value as the CATALYST INTERNAL value of
    * `dt` (what a [[org.apache.spark.sql.execution.datasources
    * .PartitionDirectory]] row carries): `#part_` lines store dates /
    * timestamps in their internal day/micros form already, so this is
    * numeric narrowing plus UTF8String passthrough. None = the value
    * does not represent under `dt` (disables partition-schema reads
    * for the snapshot, conservative); Some(null) = a NULL partition. */
  private def partInternal(v: Option[NormVal],
      dt: org.apache.spark.sql.types.DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    v match {
      case None => Some(null)
      case Some(NumV(bd)) => dt match {
        case ByteType     => scala.util.Try(bd.toByteExact).toOption
        case ShortType    => scala.util.Try(bd.toShortExact).toOption
        case IntegerType | DateType => scala.util.Try(bd.toIntExact).toOption
        case LongType | TimestampType | TimestampNTZType =>
          scala.util.Try(bd.toLongExact).toOption
        case FloatType    => Some(bd.toFloat)
        case DoubleType   => Some(bd.toDouble)
        case d: DecimalType => scala.util.Try(
          org.apache.spark.sql.types.Decimal(bd, d.precision, d.scale)).toOption
        case _ => None
      }
      case Some(StrV(u)) => dt match {
        case StringType => Some(u)
        case _ => None
      }
    }
  }

  /** The PARTITION-SCHEMA read layout of one snapshot — what lets the
    * scan expose the partition columns as true Spark partition
    * columns, unlocking the engine's own static partition pruning AND
    * dynamic partition pruning (the star-join runtime prune) with no
    * special API: `Some((partition fields, dir -> tuple InternalRow))`
    * when EVERY live dir carries a `#part_` line whose values
    * represent under the committed types, the partition columns exist
    * in the schema (leaving a non-empty data schema), and no bucket
    * column doubles as a partition column. Any miss → None and reads
    * keep today's shape (a fold's fallback dir, a pre-layout table):
    * honest degradation, never wrong answers. */
  private[sources] def partitionLayoutAt(spark: SparkSession, root: String,
      version: Long, schema: org.apache.spark.sql.types.StructType):
      Option[(org.apache.spark.sql.types.StructType,
        Map[String, org.apache.spark.sql.catalyst.InternalRow])] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val partCols = manifestPartCols(fs, r, version)
    if (partCols.isEmpty) return None
    // #partcols and #part_ keys are PHYSICAL; `schema` (and the
    // partition schema this returns) is LOGICAL
    val inv = manifestColMap(fs, r, version).map(_.swap)
    val pairs = partCols.map(c => c -> inv.getOrElse(c, c))
    val fieldsOpt = pairs.map { case (phys, log) =>
      schema.fields.find(_.name == log).map(phys -> _) }
    if (fieldsOpt.exists(_.isEmpty)) return None
    val fields = fieldsOpt.flatten
    if (fields.length == schema.length) return None // no data columns left
    if (manifestBucketBy(fs, r, version)
        .exists(_._2.exists(partCols.contains))) return None
    val partsRaw = manifestPartsRaw(fs, r, version)
    val dirs = manifestDirs(fs, r, version)
    val tuples = Map.newBuilder[String, org.apache.spark.sql.catalyst.InternalRow]
    dirs.foreach { d =>
      val j = partsRaw.getOrElse(d, return None) // un-tupled dir: no layout
      val m = parsePartJson(j)
      val vals = fields.map { case (phys, f) =>
        if (!m.contains(phys)) return None
        partInternal(m(phys), f.dataType).getOrElse(return None)
      }
      tuples += d -> org.apache.spark.sql.catalyst.InternalRow.fromSeq(vals)
    }
    Some((org.apache.spark.sql.types.StructType(fields.map(_._2)),
      tuples.result()))
  }

  /** [[scanFilesAt]] grouped by manifest dir — the partition-schema
    * listing needs per-dir file sets to pair with per-dir tuples. */
  private[sources] def scanDirFilesAt(spark: SparkSession, root: String,
      version: Long,
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]):
      Seq[(String, Seq[org.apache.hadoop.fs.FileStatus])] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    // scan-planning filters reference the relation's LOGICAL columns;
    // every per-dir line is keyed physically. Conjuncts on generated
    // columns' SOURCES derive extra conjuncts on the generated
    // partition keys first (the ts-range-prunes-year-partitions rule).
    val logicalPreds = filters.flatMap(extractPreds)
    val preds = predsToPhysical(
      logicalPreds ++ deriveGenPreds(spark, fs, r, version, logicalPreds),
      manifestColMap(fs, r, version))
    val (keptDirs, _) = pruneDirsAt(spark, root, version, preds)
    val fstats = if (preds.isEmpty) Map.empty[String, Map[String, String]]
      else manifestFileStatsRaw(fs, r, version)
    keptDirs.map { d =>
      val files = fstats.get(d) match {
        case Some(byFile) if byFile.nonEmpty && preds.nonEmpty =>
          splitDirFiles(fs, r, d, byFile, preds)._1
        case _ =>
          fs.listStatus(new Path(r, d)).toSeq
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      }
      d -> files
    }
  }

  // ---- deletion vectors (merge-on-read row deletes) ----------------
  //
  // `#dv_<dir>=<json>` soft-deletes rows of an IMMUTABLE data dir by
  // parquet row position: json = {"<file>": [pos, …]} with positions
  // the deterministic `_metadata.row_index` the scan regenerates
  // (Delta's DV foundation — row indices are absolute file positions,
  // stable under row-group/page skipping). This is the first MUTABLE
  // per-dir manifest line: a later delete on the same dir REPLACES its
  // line with the merged position set, and RESTORE replaces the whole
  // line set with the target version's (`dvsReplace` — carry semantics
  // would resurrect or re-kill rows across the restore point).
  //
  // Readers conjoin `NOT DvContains(<dir-basename>/<file>, row_index)`
  // ([[dvReadFilter]] on index-planned reads, [[readDirsWithDv]] on
  // every raw-path COW/maintenance/diff read), so a soft-deleted row
  // can neither be served nor resurrect through a rewrite. Any rewrite
  // of a DV'd dir (update/merge/compact/z-order/COW delete) reads
  // through the filter and MATERIALIZES the deletes away — the
  // replacement dir carries no line. Bounded by construction: a delete
  // whose hit count exceeds its `dvMaxRows` falls back to copy-on-
  // write, so manifests stay planning-read-sized; at 100 TB the
  // CDC-delete workload commits manifest lines instead of rewriting
  // its hot dirs every batch, and the standing compaction cadence
  // folds the vectors into data.
  private val DvPrefix = "#dv_"

  /** Raw `#dv_<dir>=<json>` lines of a manifest, keyed by dir. */
  private[graft] def manifestDvsRaw(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Map[String, String] =
    manifestBody(fs, r, v).collect {
      case l if l.startsWith(DvPrefix) && l.indexOf('=') > DvPrefix.length =>
        val i = l.indexOf('=')
        l.substring(DvPrefix.length, i) -> l.substring(i + 1)
    }.toMap

  private[sources] def snapshotDvs(spark: SparkSession, root: String,
      version: Long): Map[String, String] =
    manifestDvsRaw(fsFor(spark, root), new Path(root), version)

  private def dvJson(m: Map[String, Seq[Long]]): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (f, ps) =>
      val arr = om.createArrayNode()
      ps.foreach(p => arr.add(p))
      root.set[com.fasterxml.jackson.databind.JsonNode](f, arr)
      ()
    }
    om.writeValueAsString(root)
  }

  private[graft] def parseDvJson(json: String): Map[String, Array[Long]] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = scala.util.Try(om.readTree(json)).getOrElse(return Map.empty)
    val it = root.properties().iterator()
    val out = Map.newBuilder[String, Array[Long]]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (v.isArray) {
        val buf = Array.newBuilder[Long]
        val ait = v.elements()
        while (ait.hasNext) buf += ait.next().asLong()
        out += e.getKey -> buf.result()
      }
    }
    out.result()
  }

  /** The DV read predicate for `dvs` (dir -> json line), or None when
    * nothing is soft-deleted. Keyed by `<dir-basename>/<file>` — the
    * last two `_metadata.file_path` segments — so relative and
    * absolute (clone-referenced) dir entries resolve alike. The
    * [[DvApplied]] marker rides along for the analyzer rule's
    * idempotence check and constant-folds away. */
  private def dvEntries(dvs: Map[String, String]): Option[DvSet] = {
    if (dvs.isEmpty) return None
    val entries: Map[String, Array[Long]] = dvs.toSeq.flatMap { case (dir, j) =>
      val base = new Path(dir).getName
      parseDvJson(j).map { case (f, ps) => (base + "/" + f) -> ps }
    }.toMap
    if (entries.forall(_._2.isEmpty)) None else Some(new DvSet(entries))
  }

  private def dvColumn(spark: SparkSession, dvs: Map[String, String],
      cacheKey: Option[(String, Long)] = None):
      Option[org.apache.spark.sql.Column] = dvEntries(dvs).map { set =>
    import org.apache.spark.sql.functions.{col, substring_index}
    import org.apache.spark.sql.graft.Shim
    val key = substring_index(col("_metadata.file_path"), "/", -2)
    Shim.column(DvApplied()) &&
      !Shim.column(DvContains(Shim.expression(key),
        Shim.expression(col("_metadata.row_index")),
        dvCarrier(spark, set, cacheKey)))
  }

  /** Ship threshold: position sets at or above this embed as an
    * executor BROADCAST instead of riding the serialized plan into
    * every task closure; below it the plan copy is cheaper than the
    * broadcast bookkeeping. */
  private[sources] final val DvBroadcastMinPositions = 4096L

  // One snapshot ships ONE broadcast: repeated reads of a DV-heavy
  // table reuse the (root, version) entry instead of re-broadcasting
  // the full position set per read assembly / analyzer-rule pass and
  // leaving the blocks to accumulate until ContextCleaner happens to
  // run. Hits VALIDATE structurally (manifests are immutable in
  // protocol, but test scenarios and hand surgery are not) and
  // evicted/invalidated entries unpersist their blocks eagerly.
  private val dvBcCacheMax = 32
  private val dvBcCache = new java.util.LinkedHashMap[
      (String, Long), org.apache.spark.broadcast.Broadcast[DvSet]](
      16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        (String, Long), org.apache.spark.broadcast.Broadcast[DvSet]]):
        Boolean = {
      val evict = size() > dvBcCacheMax
      if (evict) scala.util.Try(e.getValue.unpersist(blocking = false))
      evict
    }
  }

  private def sameDvSet(a: DvSet, b: DvSet): Boolean =
    a.entries.keySet == b.entries.keySet &&
      a.entries.forall { case (k, ps) => b.entries(k).sameElements(ps) }

  private[sources] def dvCarrier(spark: SparkSession, set: DvSet,
      cacheKey: Option[(String, Long)] = None): DvCarrier =
    if (set.totalPositions < DvBroadcastMinPositions) DvInline(set)
    else cacheKey match {
      case None => DvBroadcastRef(spark.sparkContext.broadcast(set))
      case Some(k) => dvBcCache.synchronized {
        val hit = dvBcCache.get(k)
        val valid = hit != null &&
          scala.util.Try(sameDvSet(hit.value, set)).getOrElse(false)
        val bc =
          if (valid) hit
          else {
            if (hit != null)
              scala.util.Try(hit.unpersist(blocking = false))
            val fresh = spark.sparkContext.broadcast(set)
            dvBcCache.put(k, fresh)
            fresh
          }
        DvBroadcastRef(bc)
      }
    }

  /** The live DV position index of one snapshot for index-planned
    * reads ([[LakeFileIndex.relation]] and [[GraftLakeDvRule]] build
    * the resolved filter plan from it); None when vector-free. */
  private[sources] def dvSetFor(spark: SparkSession, root: String,
      version: Long): Option[DvSet] =
    dvEntries(manifestDvsRaw(fsFor(spark, root), new Path(root), version))

  /** Raw-path read of `dirs` from snapshot `version` with that
    * snapshot's deletion vectors applied — EVERY maintenance / COW /
    * diff read goes through here, so a soft-deleted row can never
    * resurrect through a rewrite. */
  private def readDirsWithDv(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, r: Path, version: Long,
      dirs: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType]):
      org.apache.spark.sql.DataFrame = {
    val paths = dirs.map(d => new Path(r, d).toString)
    // files store PHYSICAL names; the returned view serves LOGICAL
    // ones (the DV filter runs below the rename — it reads only
    // `_metadata`, and metadata columns propagate through the alias)
    val map = manifestColMap(fs, r, version)
    val base = schema match {
      case Some(s) => spark.read.schema(physSchema(s, map)).parquet(paths: _*)
      case None    => spark.read.parquet(paths: _*)
    }
    val want = dirs.toSet
    val dvs = manifestDvsRaw(fs, r, version).filter { case (d, _) => want(d) }
    // dir-subset reads key the broadcast cache by subset too — a full
    // snapshot read at the same version keeps its own entry
    val subKey = r.toString + "#" + want.toSeq.sorted.mkString(",").hashCode
    val withDv = dvColumn(spark, dvs, Some((subKey, version)))
      .map(base.where).getOrElse(base)
    schema match {
      case Some(s) if map.nonEmpty => withDv.toDF(s.fieldNames: _*)
      case _ => withDv
    }
  }

  private def effectivePartCols(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      want: Seq[String]): Seq[String] = {
    // same grammar guard as stats/bloom columns: the list rides a
    // comma-separated manifest line, so these characters would write a
    // malformed #partcols line (a newline even injects a bogus body line)
    want.foreach(c => require(!c.exists("=,\n#".contains(_)),
      s"partition column name '$c' may not contain '=', ',', '#', or newline"))
    val prev = committedVersions(fs, r).lastOption
      .map(v => manifestPartCols(fs, r, v)).getOrElse(Nil)
    // FORWARD-ONLY partition evolution (Iceberg's spec evolution,
    // without a rewrite): a commit may RE-DECLARE the layout — the new
    // `#partcols` governs how THIS and future commits stage, while
    // every old dir keeps its recorded `#part_` tuple. Pruning is
    // per-dir-tuple (a predicate on a column a dir has no tuple for
    // keeps the dir — honest degradation to scan, never a wrong
    // prune), so BOTH generations keep pruning on their own keys; the
    // native partition-aware scan shape (partitionLayoutAt) requires a
    // uniformly-tupled snapshot and degrades the same way. OPTIMIZE
    // migrates old dirs: a compaction/z-order re-stages their rows
    // under the CURRENT declaration. Old builds read evolved tables
    // safely through the same keep-when-untupled rule, so evolution
    // stamps no `#require=` feature.
    if (want.isEmpty) prev else want
  }

  /** Types a partition value can normalize to (the [[normLit]] set) —
    * anything else refuses at write time, never at prune time. */
  private def partitionableType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | FloatType | DoubleType |
           StringType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** Stage a batch under writer-unique dirs: ONE dir when `partCols`
    * is empty, one dir PER distinct partition-value tuple otherwise.
    * Returns (dirs, stats, blooms, parts) ready for [[commitManifest]].
    * The distinct-tuple collect is partition-count-sized (metadata
    * scale, like the k-means centroid sync) and capped — a batch with
    * thousands of distinct values wants a coarser partition key.
    *
    * `maintenance = true` marks layout-PRESERVING re-staging (COW
    * rewrites, compaction): those re-stage whole-snapshot slices, so
    * the per-batch tuple cap would hard-fail any maintenance op on a
    * table whose accumulated partitions exceed it (~3 years of daily
    * partitions). Maintenance falls back to ONE unpartitioned dir
    * instead — no #part_ line, pruning degrades for the rewritten
    * slice, but the op succeeds and correctness is untouched (a dir
    * with no recorded values is always scanned). Appends keep the
    * refusal: a single BATCH with >1000 tuples is a layout-design
    * error, not an accumulation.
    *
    * Failure discipline: any throw after dirs were staged (a partition
    * value that does not normalize, a mid-loop write error) deletes
    * the already-staged dirs before rethrowing — matching the commit
    * paths' lost-race cleanup, so refusals never leave orphan data
    * dirs under the table root. */
  private def stageBatch(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, r: Path,
      df0: org.apache.spark.sql.DataFrame, effStats: Seq[String],
      effBloom: Seq[String], partCols: Seq[String],
      maintenance: Boolean = false,
      bucketBy: Option[(Int, Seq[String])] = None,
      colMap: Map[String, String] = Map.empty):
      (Seq[String], Map[String, String], Map[String, String], Map[String, String]) = {
    import org.apache.spark.sql.functions.{col, lit}
    // batches arrive under LOGICAL names; files (and therefore every
    // per-dir stat/bloom/part key, and the partCols/effStats/effBloom/
    // bucket args, which come from the manifest) are PHYSICAL
    val df = toPhysicalDf(df0, colMap)
    // partitioned AND bucketed compose: each partition tuple's dir is
    // written through the bucketed writer, and since every row of key
    // k lands in bucket hash(k) regardless of WHICH dir holds it, the
    // scan's bucket grouping stays exact across pruned dir subsets —
    // partition values prune dirs, buckets kill the join shuffle, the
    // standard composed 100 TB fact layout
    bucketBy.foreach { case (_, cols) =>
      cols.foreach(c => require(df.columns.contains(c),
        s"bucket column '$c' is not in the batch schema " +
          df.columns.mkString("[", ", ", "]")))
    }
    def stageOne(slice: org.apache.spark.sql.DataFrame): (String, Option[String], Option[String]) = {
      val staged = stagedDirName()
      bucketBy match {
        case Some((n, cols)) =>
          // Spark's OWN bucketed writer is the only public path that
          // produces the bucket-id file naming and Murmur3 placement
          // the bucketed read contract depends on — route through a
          // throwaway EXTERNAL catalog entry pointed at the staged dir
          // (dropping an external table keeps its files)
          val tmp = "graft_bucket_stage_" +
            staged.replaceAll("[^a-zA-Z0-9_]", "_")
          try {
            slice.write.mode("overwrite").format("parquet")
              .bucketBy(n, cols.head, cols.tail: _*)
              .sortBy(cols.head, cols.tail: _*)
              .option("path", new Path(r, staged).toString)
              .saveAsTable(tmp)
          } finally { spark.sql(s"DROP TABLE IF EXISTS `$tmp`"); () }
          // an empty bucketed batch writes NO data files (the plain
          // writer emits a schema-carrying empty file) — the stats
          // read cannot infer a schema there, and empty dirs carry no
          // ranges anyway
          if (!fs.listStatus(new Path(r, staged)).exists(f =>
              f.isFile && f.getPath.getName.endsWith(".parquet")))
            return (staged,
              if (effStats.isEmpty) None else Some("{}"),
              if (effBloom.isEmpty) None else Some("{}"))
        case None =>
          slice.write.mode("overwrite").parquet(new Path(r, staged).toString)
      }
      (staged,
        dirStatsJson(spark, new Path(r, staged).toString, effStats),
        dirBloomJson(spark, new Path(r, staged).toString, effBloom))
    }
    if (partCols.isEmpty) {
      val (d, st, bl) = stageOne(df)
      (Seq(d), st.map(d -> _).toMap, bl.map(d -> _).toMap, Map.empty)
    } else {
      partCols.foreach(c => require(df.columns.contains(c),
        s"partition column '$c' is not in the batch schema " +
          df.columns.mkString("[", ", ", "]") + " — every writer to a " +
          "partitioned table must supply its partition columns"))
      partCols.foreach { c =>
        val dt = df.schema(c).dataType
        require(partitionableType(dt),
          s"partition column '$c' has unsupported type ${dt.simpleString} — " +
            "integral, float/decimal, string, date and timestamp partition")
      }
      val batch = df.persist()
      try {
        val cap = stageTupleCap
        val tuples = batch.select(partCols.map(col): _*)
          .distinct().limit(cap + 1).collect()
        if (tuples.length > cap && maintenance) {
          // whole-snapshot rewrite over an accumulated layout: succeed
          // unpartitioned rather than refuse the maintenance op
          val (d, st, bl) = stageOne(batch)
          return (Seq(d), st.map(d -> _).toMap, bl.map(d -> _).toMap, Map.empty)
        }
        require(tuples.length <= cap,
          s"batch carries more than $cap distinct (${partCols.mkString(", ")}) " +
            "tuples — partition by a coarser key (a dir per tuple is the " +
            "layout contract)")
        if (tuples.isEmpty) { // empty batch: one empty dir keeps the
          val (d, st, bl) = stageOne(batch) // version/schema semantics
          (Seq(d), st.map(d -> _).toMap, bl.map(d -> _).toMap, Map.empty)
        } else {
          // validate every tuple BEFORE the first write: a value that
          // does not normalize refuses with zero dirs staged
          val tupleJsons = tuples.map { row =>
            partJson(partCols.zipWithIndex.map { case (c, i) =>
              c -> (if (row.isNullAt(i)) None
                else normExternal(row.get(i)) match {
                  case some @ Some(_) => some
                  case None => throw new IllegalArgumentException(
                    s"partition value ${row.get(i)} of column '$c' does not " +
                      "normalize — unsupported runtime type")
                })
            })
          }
          val dirs = Seq.newBuilder[String]
          val stats = Map.newBuilder[String, String]
          val blooms = Map.newBuilder[String, String]
          val parts = Map.newBuilder[String, String]
          val stagedSoFar = scala.collection.mutable.ArrayBuffer.empty[String]
          try {
            tuples.zip(tupleJsons).foreach { case (row, json) =>
              val slice = partCols.zipWithIndex.foldLeft(batch) {
                case (d0, (c, i)) => d0.where(col(c) <=> lit(row.get(i)))
              }
              val (d, st, bl) = stageOne(slice)
              stagedSoFar += d
              dirs += d
              st.foreach(j => stats += d -> j)
              bl.foreach(j => blooms += d -> j)
              parts += d -> json
            }
          } catch {
            case t: Throwable =>
              stagedSoFar.foreach(d =>
                scala.util.Try(fs.delete(new Path(r, d), true)))
              throw t
          }
          (dirs.result(), stats.result(), blooms.result(), parts.result())
        }
      } finally { batch.unpersist(); () }
    }
  }

  // -- predicate -> prunable conjuncts --------------------------------

  private sealed trait POp
  private case object PEq extends POp
  private case object PLt extends POp
  private case object PLe extends POp
  private case object PGt extends POp
  private case object PGe extends POp
  // NULL tests: min/max ranges describe NON-NULL values only, so
  // stats can never prove them either way — but a partition dir's
  // recorded value is exact (Some(v) = every row non-NULL, None =
  // every row NULL), so the partition pruner answers both precisely
  private case object PNull extends POp
  private case object PNotNull extends POp
  private final case class Pred(col: String, op: POp, values: Seq[NormVal])

  private def attrName(e: org.apache.spark.sql.catalyst.expressions.Expression):
      Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => Some(a.name)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(u.name)
    // nested struct fields prune like flat columns: the dotted path
    // is the stats/bloom key (`meta.v`), and the NULL semantics
    // match — a NULL container makes the field read NULL, which the
    // min/max range (computed over non-NULLs) never claims to bound
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      attrName(g.child).map(_ + "." + g.extractFieldName)
    case _ => None
  }

  /** The conjuncts of `e` this pruner understands: comparisons and IN
    * between a bare column and literals. Anything else (OR trees,
    * casts, function calls, IS NULL, subqueries) contributes no
    * conjunct — pruning quietly weakens, never strengthens. */
  private def extractPreds(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Pred] =
    extractPredsExact(e)._1

  /** [[extractPreds]] plus an EXACTNESS bit: true iff `e` is PRECISELY
    * the conjunction of the returned preds (every node understood).
    * Pruning only needs the conjuncts (an ignored conjunct can only
    * narrow the match, so "provably selects nothing" stays safe), but
    * [[deleteWhere]]'s metadata-only whole-dir drop needs the reverse
    * proof — "provably selects EVERYTHING" — which an ignored conjunct
    * would break: the real predicate could match fewer rows than the
    * understood part, and dropping the dir would delete too much. */
  private def extractPredsExact(
      e: org.apache.spark.sql.catalyst.expressions.Expression): (Seq[Pred], Boolean) = {
    import org.apache.spark.sql.catalyst.expressions._
    def lit1(x: Expression): Option[NormVal] = x match {
      case Literal(v, dt) => normLit(v, dt)
      case _ => None
    }
    def cmp(a: Expression, b: Expression, op: POp, flip: POp): (Seq[Pred], Boolean) =
      (attrName(a), lit1(b), attrName(b), lit1(a)) match {
        case (Some(c), Some(v), _, _) => (Seq(Pred(c, op, Seq(v))), true)
        case (_, _, Some(c), Some(v)) => (Seq(Pred(c, flip, Seq(v))), true)
        case _ => (Nil, false)
      }
    def inPred(a: Expression, vs: Seq[Expression]): (Seq[Pred], Boolean) =
      (attrName(a), vs.map(lit1)) match {
        case (Some(c), lits) if lits.nonEmpty && lits.forall(_.isDefined) =>
          (Seq(Pred(c, PEq, lits.flatten)), true)
        case _ => (Nil, false)
      }
    def both(a: Expression, b: Expression): (Seq[Pred], Boolean) = {
      val (pa, xa) = extractPredsExact(a)
      val (pb, xb) = extractPredsExact(b)
      (pa ++ pb, xa && xb)
    }
    e match {
      case And(a, b) => both(a, b)
      case EqualTo(a, b)            => cmp(a, b, PEq, PEq)
      case EqualNullSafe(a, b)      => cmp(a, b, PEq, PEq)
      case LessThan(a, b)           => cmp(a, b, PLt, PGt)
      case LessThanOrEqual(a, b)    => cmp(a, b, PLe, PGe)
      case GreaterThan(a, b)        => cmp(a, b, PGt, PLt)
      case GreaterThanOrEqual(a, b) => cmp(a, b, PGe, PLe)
      case In(a, vs) if vs.nonEmpty => inPred(a, vs)
      case IsNull(a) =>
        (attrName(a).map(c => Pred(c, PNull, Nil)).toSeq, attrName(a).isDefined)
      case IsNotNull(a) =>
        (attrName(a).map(c => Pred(c, PNotNull, Nil)).toSeq, attrName(a).isDefined)
      // sql-api Columns build operators as UNRESOLVED FUNCTION CALLS
      // ("=", "and", "in", …) — the shape the classic converter emits
      // for a `col("k") === 250` tree before analysis
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.lengthCompare(1) == 0 =>
        (f.nameParts.head.toLowerCase, f.arguments) match {
          case ("and", Seq(a, b))         => both(a, b)
          case ("=" | "==" | "<=>", Seq(a, b)) => cmp(a, b, PEq, PEq)
          case ("<", Seq(a, b))           => cmp(a, b, PLt, PGt)
          case ("<=", Seq(a, b))          => cmp(a, b, PLe, PGe)
          case (">", Seq(a, b))           => cmp(a, b, PGt, PLt)
          case (">=", Seq(a, b))          => cmp(a, b, PGe, PLe)
          case ("in", a +: vs)            => inPred(a, vs)
          case ("isnull", Seq(a)) =>
            (attrName(a).map(c => Pred(c, PNull, Nil)).toSeq, attrName(a).isDefined)
          case ("isnotnull", Seq(a)) =>
            (attrName(a).map(c => Pred(c, PNotNull, Nil)).toSeq, attrName(a).isDefined)
          case _ => (Nil, false)
        }
      case _ => (Nil, false)
    }
  }

  /** Can `p` provably select NOTHING from a dir whose stat range for
    * `p.col` is [lo, hi]? NULL rows never satisfy a comparison, so a
    * range over the non-NULL values is sufficient evidence. */
  private def predExcludes(lo: NormVal, hi: NormVal, p: Pred): Boolean = p.op match {
    case PEq => p.values.forall(v =>
      (for (a <- cmpNorm(v, lo); b <- cmpNorm(v, hi)) yield a < 0 || b > 0)
        .getOrElse(false))
    case PLt => cmpNorm(lo, p.values.head).exists(_ >= 0)
    case PLe => cmpNorm(lo, p.values.head).exists(_ > 0)
    case PGt => cmpNorm(hi, p.values.head).exists(_ <= 0)
    case PGe => cmpNorm(hi, p.values.head).exists(_ < 0)
    // a range over the non-NULL values proves nothing about NULLs
    case PNull | PNotNull => false
  }

  /** Does `p` provably select NOTHING from a dir whose partition
    * value for `p.col` is exactly `v` (None = every row NULL)? Unlike
    * stats ranges this is EXACT per-row knowledge: every row of the
    * dir carries the tuple, so NULL tests answer too. */
  private def partValueExcludes(v: Option[NormVal], p: Pred): Boolean = v match {
    case Some(x) => p.op match {
      case PNull    => true  // single non-NULL value: IS NULL matches nothing
      case PNotNull => false
      case _        => predExcludes(x, x, p)
    }
    case None => p.op match {
      case PNull => false    // the NULL partition IS the match
      case _     => true     // comparisons/IN/IS NOT NULL: nothing matches
    }
  }

  /** Does `p` provably select EVERY row of a dir whose partition value
    * for `p.col` is exactly `v`? No nullability gate needed — the
    * value IS each row's value. */
  private def partValueIncludesAll(v: Option[NormVal], p: Pred): Boolean = v match {
    case Some(x) => p.op match {
      case PNull    => false
      case PNotNull => true
      case _        => predIncludesAll(x, x, p)
    }
    case None => p.op == PNull
  }

  /** Can `p` provably select EVERY row of a dir whose NON-NULL value
    * range for `p.col` is [lo, hi]? Caller must separately prove the
    * column holds no NULLs in the dir (a NULL never satisfies a
    * comparison, so a dir with NULL rows is never all-match) — see
    * [[deleteWhere]]'s non-nullable-schema gate. */
  private def predIncludesAll(lo: NormVal, hi: NormVal, p: Pred): Boolean = p.op match {
    // every non-null value equals lo (=hi) and that value is in the set
    case PEq => cmpNorm(lo, hi).contains(0) &&
      p.values.exists(v => cmpNorm(v, lo).contains(0))
    case PLt => cmpNorm(hi, p.values.head).exists(_ < 0)
    case PLe => cmpNorm(hi, p.values.head).exists(_ <= 0)
    case PGt => cmpNorm(lo, p.values.head).exists(_ > 0)
    case PGe => cmpNorm(lo, p.values.head).exists(_ >= 0)
    // under the caller's no-NULLs proof, IS NOT NULL is everything
    // and IS NULL is nothing
    case PNotNull => true
    case PNull => false
  }

  /** (kept, skipped) dirs of the live snapshot under `predicate` —
    * the pruning decision [[readCommittedWhere]] acts on, exposed for
    * the spec to assert skipping actually happens. */
  private[graft] def pruneDirs(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column): (Seq[String], Seq[String]) = {
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    pruneDirsAt(spark, root, cur,
      extractPreds(org.apache.spark.sql.graft.Shim.catalystTree(predicate)))
  }

  private[sources] def pruneDirsAt(spark: SparkSession, root: String,
      version: Long, preds: Seq[Pred]): (Seq[String], Seq[String]) = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val dirs = manifestDirs(fs, r, version)
    val stats = manifestStatsRaw(fs, r, version)
    val bloomsRaw = manifestBloomsRaw(fs, r, version)
    val partsRaw = manifestPartsRaw(fs, r, version)
    if (preds.isEmpty) (dirs, Nil)
    else dirs.partition { d =>
      // partition values prune FIRST (exact, cheapest): a dir whose
      // recorded tuple fails a conjunct holds no matching row — and a
      // NULL-valued partition dir satisfies NO comparison/IN, which
      // min/max stats can never prove
      val partExcluded = partsRaw.get(d).map(parsePartJson).exists(pv =>
        preds.exists(p => pv.get(p.col).exists(partValueExcludes(_, p))))
      lazy val rangeExcluded = stats.get(d).map(parseStatsJson).exists(st =>
        preds.exists(p =>
          st.get(p.col).exists { case (lo, hi) => predExcludes(lo, hi, p) }))
      // ranges prune range predicates; blooms prune equality lookups
      // the ranges can't (hash-distributed keys overlap on every dir)
      lazy val bloomExcluded = bloomsRaw.get(d).map(parseBloomJson).exists(bfs =>
        preds.exists(p => bloomExcludes(bfs, p)))
      !partExcluded && !rangeExcluded && !bloomExcluded
    }
  }

  /** The scan set for a predicate read of the live snapshot:
    * (paths to read — dirs, or explicit files where file stats pruned
    * inside a kept dir; skipped dirs; skipped files). Exposed for the
    * spec to assert skipping actually happens. */
  /** Partition a kept dir's parquet files by its manifest file-level
    * stats: (kept, skipped). The actual listing is authoritative — a
    * file the manifest doesn't know is always kept (never trust stats
    * lines for absence). */
  private def splitDirFiles(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      d: String, byFile: Map[String, String], preds: Seq[Pred]):
      (Seq[org.apache.hadoop.fs.FileStatus], Seq[org.apache.hadoop.fs.FileStatus]) =
    fs.listStatus(new Path(r, d)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .partition { f =>
        byFile.get(f.getPath.getName).map(parseStatsJson) match {
          case Some(st) => !preds.exists(pr =>
            st.get(pr.col).exists { case (lo, hi) => predExcludes(lo, hi, pr) })
          case None => true
        }
      }

  private[graft] def resolveWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column):
      (Seq[String], Seq[String], Seq[String]) = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    // the user predicate names LOGICAL columns; every per-dir line is
    // keyed physically. Generated-column derivation first (see
    // scanDirFilesAt).
    val logicalPreds =
      extractPreds(org.apache.spark.sql.graft.Shim.catalystTree(predicate))
    val preds = predsToPhysical(
      logicalPreds ++ deriveGenPreds(spark, fs, r, cur, logicalPreds),
      manifestColMap(fs, r, cur))
    val (keptDirs, skippedDirs) = pruneDirsAt(spark, root, cur, preds)
    val fstats = if (preds.isEmpty) Map.empty[String, Map[String, String]]
      else manifestFileStatsRaw(fs, r, cur)
    val paths = Seq.newBuilder[String]
    val skippedFiles = Seq.newBuilder[String]
    keptDirs.foreach { d =>
      fstats.get(d) match {
        case Some(byFile) if byFile.nonEmpty && preds.nonEmpty =>
          val (keep, skip) = splitDirFiles(fs, r, d, byFile, preds)
          if (skip.isEmpty) paths += new Path(r, d).toString
          else {
            paths ++= keep.map(_.getPath.toString)
            skippedFiles ++= skip.map(f => d + "/" + f.getPath.getName)
          }
        case _ => paths += new Path(r, d).toString
      }
    }
    (paths.result(), skippedDirs, skippedFiles.result())
  }

  /** The pruned FILE set of snapshot `version` for catalyst predicate
    * conjuncts `filters` — the [[LakeFileIndex]] core. Dir-level
    * range/bloom pruning then file-level range pruning, identical
    * rules to [[resolveWhere]], but version-pinned and returning the
    * concrete `FileStatus`es Spark's scan planning consumes. With no
    * understood conjunct it degrades to the full snapshot listing. */
  private[sources] def scanFilesAt(spark: SparkSession, root: String,
      version: Long,
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]):
      Seq[org.apache.hadoop.fs.FileStatus] =
    scanDirFilesAt(spark, root, version, filters).flatMap(_._2)

  /** Predicate read with manifest-stats data skipping: scans only the
    * live snapshot's dirs — and, inside dirs carrying file-level
    * stats (see [[clusterCommitted]]), only the FILES — whose min/max
    * ranges can satisfy `predicate`, then applies the FULL predicate
    * to what it reads. Dirs/files without stats are kept and
    * non-understood conjuncts are ignored, so the result always
    * equals `readCommitted(...).where(predicate)`; only the I/O
    * shrinks. On a key- or time-ordered append table a selective
    * range read goes from O(table) to O(matching dirs/files) with one
    * manifest read of planning cost. */
  def readCommittedWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val (paths, _, _) = resolveWhere(spark, root, predicate)
    val schemaOpt = manifestSchema(fs, r, cur)
    val map = manifestColMap(fs, r, cur)
    if (paths.isEmpty) {
      val s = schemaOpt.getOrElse(spark.read.parquet(
        manifestDirs(fs, r, cur).map(d => new Path(r, d).toString): _*).schema)
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), s)
        .where(predicate)
    }
    val base = schemaOpt match {
      case Some(s) => spark.read.schema(physSchema(s, map)).parquet(paths: _*)
      case None    => spark.read.parquet(paths: _*)
    }
    // the snapshot's deletion vectors apply before the predicate
    // (paths may be pruned FILE paths — the vector keys by dir
    // basename + file, so the restriction to "whole snapshot" is
    // only ever a no-op lookup, never a wrong row)
    val withDv = dvColumn(spark, manifestDvsRaw(fs, r, cur),
        Some((r.toString, cur)))
      .map(base.where).getOrElse(base)
    val logical = schemaOpt match {
      case Some(s) if map.nonEmpty => withDv.toDF(s.fieldNames: _*)
      case _ => withDv
    }
    logical.where(predicate)
  }

  // `#rows=<n>` — the snapshot's exact row count, carried when the
  // writer knows it (a load counts its fresh rows anyway; an append
  // adds the batch to the previous snapshot's count; compaction is
  // row-preserving). Metadata-only `count(*)`: on a 100 TB table the
  // count answers from ONE manifest read instead of a full scan.
  // Absent when a writer could not know it cheaply (e.g. a merge with
  // deletes) — honesty over a counting job; the chain resumes at the
  // next counted commit.
  private val RowsPrefix = "#rows="
  private val OpPrefix = "#op="

  // `#ts=<epoch millis>` — the commit instant, stamped INTO the
  // manifest body at publish. `TIMESTAMP AS OF` / `startingTimestamp`
  // / DESCRIBE HISTORY resolve from this line, NOT from the marker
  // file's mtime: a table-root backup/restore, `cp -r` migration, or
  // object-store copy rewrites mtimes and would silently re-date the
  // whole history (re-resolving past time-travel queries to different
  // versions). The line travels with the bytes. Pre-existing manifests
  // without the line fall back to mtime — same answer they always gave.
  private val TsPrefix = "#ts="

  private[sources] def manifestTsMillis(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, v: Long): Long =
    manifestBody(fs, r, v).find(_.startsWith(TsPrefix))
      .flatMap(_.stripPrefix(TsPrefix).toLongOption)
      .getOrElse(fs.getFileStatus(new Path(r, s"_commit_$v")).getModificationTime)

  private def manifestRows(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Option[Long] =
    manifestBody(fs, r, v).find(_.startsWith(RowsPrefix))
      .flatMap(_.stripPrefix(RowsPrefix).toLongOption)

  /** Highest committed version at `root` whose snapshot is fully
    * present, if any. Manifests referencing lost data dirs are
    * ignored defensively (cannot arise from the protocol — the
    * manifest is renamed in strictly after the data job completes and
    * pruning never touches referenced dirs — but a half-vacuumed root
    * must degrade, not throw). Validation walks DOWN from the highest
    * manifest and stops at the first fully-present snapshot, so the
    * normal-path cost is one manifest read + the live snapshot's dir
    * checks — not O(all versions) metadata RPCs per resolve. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    committedVersions(fs, r).reverseIterator
      .find(v => manifestDirs(fs, r, v).forall(d => fs.exists(new Path(r, d))))
  }

  /** Data-dir paths of the live snapshot — what readers scan. */
  def resolve(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    currentVersion(spark, root)
      .map(v => manifestDirs(fs, r, v).map(d => new Path(r, d).toString))
      .getOrElse(throw new java.util.NoSuchElementException(
        s"no committed table at $root"))
  }

  /** Committed versions whose snapshots are fully present — the
    * TIME-TRAVEL horizon, oldest first. Its breadth is the `retain`
    * lever: each commit keeps `retain` superseded snapshots readable,
    * so `retain = 7` on a daily overwrite gives a week of history. */
  def readableVersions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    committedVersions(fs, r)
      .filter(v => manifestDirs(fs, r, v).forall(d => fs.exists(new Path(r, d))))
  }

  private def manifestOp(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Option[String] =
    manifestBody(fs, r, v).find(_.startsWith(OpPrefix))
      .map(_.stripPrefix(OpPrefix))

  /** DESCRIBE HISTORY: one row per readable version with the operation
    * that committed it (`#op=` manifest line: overwrite / append /
    * merge / delete / update / compact / zorder / fold), its snapshot
    * dir count, and the metadata row count where the writer carried
    * one. Pure manifest metadata — no data file is opened, so the
    * audit trail of a 100 TB table answers from a handful of KB-sized
    * reads (bounded by the retention horizon, which also bounds the
    * driver-side row list). Pre-op manifests (older tables) report a
    * NULL op; the history's reach is the same as [[readCommittedAt]]'s.
    * @return (version, op, n_dirs, row_count) ordered by version */
  def describeHistory(spark: SparkSession, root: String):
      org.apache.spark.sql.DataFrame = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val out = readableVersions(spark, root).map { v =>
      // the manifest's own `#ts=` line IS the commit instant (what
      // TIMESTAMP AS OF / startingTimestamp resolve against); older
      // manifests without one fall back to the marker file's mtime
      val ts = scala.util.Try(new java.sql.Timestamp(
        manifestTsMillis(fs, r, v))).getOrElse(null)
      // deletion-vector DEBT per version: dirs still carrying `#dv_`
      // lines and the total soft-deleted position count — what REORG
      // … APPLY (PURGE) exists to pay down; surfaced so the cost is
      // visible instead of silently taxing every read
      val dvs = manifestDvsRaw(fs, r, v)
      val dvRows = dvs.values.iterator
        .map(j => parseDvJson(j).values.iterator.map(_.length.toLong).sum)
        .sum
      org.apache.spark.sql.Row(v, ts, manifestOp(fs, r, v).orNull,
        manifestDirs(fs, r, v).size,
        manifestRows(fs, r, v).map(java.lang.Long.valueOf).orNull,
        dvs.size, dvRows)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("version",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("commit_ts",
        org.apache.spark.sql.types.TimestampType, nullable = true),
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("n_dirs",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("row_count",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("dv_dirs",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dv_rows",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava), schema)
  }

  /** `DESCRIBE DETAIL t` (Delta parity): ONE row describing the LIVE
    * snapshot — format, location, version, layout, properties and
    * deletion-vector debt. Everything except `num_files`/`size_bytes`
    * comes from the manifest alone; those two list each live dir once
    * (O(dirs) driver listings — an admin command, not a query-path
    * operation). */
  def describeDetail(spark: SparkSession, root: String):
      org.apache.spark.sql.DataFrame = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root"))
    val dirs = manifestDirs(fs, r, v)
    var files = 0L; var bytes = 0L
    dirs.foreach { d =>
      fs.listStatus(new Path(r, d)).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          files += 1L; bytes += st.getLen
        }
      }
    }
    val dvs = manifestDvsRaw(fs, r, v)
    val dvRows = dvs.values.iterator
      .map(j => parseDvJson(j).values.iterator.map(_.length.toLong).sum)
      .sum
    val props = manifestProps(fs, r, v)
    val ts = scala.util.Try(new java.sql.Timestamp(
      manifestTsMillis(fs, r, v))).getOrElse(null)
    val row = org.apache.spark.sql.Row(
      "graft-lake", root, v, ts,
      dirs.size, files, bytes,
      manifestRows(fs, r, v).map(java.lang.Long.valueOf).orNull,
      manifestPartCols(fs, r, v).mkString(","),
      manifestBucketBy(fs, r, v)
        .map { case (n, cs) => s"$n:${cs.mkString(",")}" }.orNull,
      props.toSeq.sortBy(_._1).map { case (k, pv) => s"$k=$pv" }
        .mkString(";"),
      dvs.size, dvRows)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("format",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("location",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("version",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("commit_ts",
        org.apache.spark.sql.types.TimestampType, nullable = true),
      org.apache.spark.sql.types.StructField("num_dirs",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("num_files",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("size_bytes",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("row_count",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("partition_columns",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("bucket_by",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("properties",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("dv_dirs",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dv_rows",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(Seq(row)).asJava),
      schema)
  }

  /** TIME TRAVEL: the table contents as of snapshot `version` —
    * exactly what `readCommitted` returned while that version was
    * live, byte-identical, because snapshots are immutable: a commit
    * only ever ADDS a version dir, and pruning deletes strictly
    * outside the retention horizon. Versions carry their OWN schema
    * (see [[SchemaPrefix]]), so a snapshot from before a schema
    * evolution reads back with its original columns.
    *
    * Fails fast with the readable horizon when `version` was pruned
    * (or never committed) — the fix is a larger `retain` at commit
    * time, the same reader-retention lever as any lakehouse VACUUM
    * horizon. */
  def readCommittedAt(spark: SparkSession, root: String,
      version: Long): org.apache.spark.sql.DataFrame = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    def horizon = readableVersions(spark, root).mkString("[", ", ", "]")
    if (!fs.exists(new Path(r, s"_commit_$version")))
      throw new java.util.NoSuchElementException(
        s"version $version is not committed at $root (readable: $horizon) — " +
          "pruned past the retention horizon? Commit with a larger `retain` " +
          "to keep more history readable")
    val dirs = manifestDirs(fs, r, version)
    val missing = dirs.filterNot(d => fs.exists(new Path(r, d)))
    if (missing.nonEmpty)
      throw new java.util.NoSuchElementException(
        s"version $version at $root references lost data dirs " +
          s"${missing.mkString(", ")} (readable: $horizon)")
    manifestSchema(fs, r, version) match {
      // index-planned read: the scan's file set resolves through the
      // LakeFileIndex at PLANNING time (lazily, with whatever filters
      // the query pushes), not through an eager spark.read listing of
      // every dir path — measured 30 s vs 0.4 s of driver time to
      // construct the read on a 10^4-dir append-heavy table, the
      // manifest-growth pathology (BENCH_NOTES round 11)
      case Some(s) => LakeFileIndex.relation(spark, root, version,
        org.apache.spark.sql.graft.Shim.asNullable(s))
      // legacy manifest without a schema line: footer inference needs
      // the eager listing anyway (deletion vectors still honored — a
      // pre-schema table can be DV-deleted like any other)
      case None =>
        val df = spark.read.parquet(dirs.map(d => new Path(r, d).toString): _*)
        dvColumn(spark, manifestDvsRaw(fs, r, version),
            Some((r.toString, version)))
          .map(df.where).getOrElse(df)
    }
  }

  /** The live table contents (union of the snapshot's data dirs),
    * under the snapshot's committed schema when the manifest carries
    * one (schema-evolved appends read merged; no footer inference). */
  def readCommitted(spark: SparkSession, root: String) =
    readCommittedAt(spark, root, currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root")))

  /** Newest batch id the given checkpoint lineage committed through
    * [[LakeStreamSink]], read from `#op=stream-append …` manifest
    * lines newest-first (marker files outlive their data dirs until
    * retention prunes them — the skip horizon IS the retain lever). */
  private[sources] def lastStreamBatch(spark: SparkSession, root: String,
      lineage: String): Option[Long] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val Parsed = """stream-append lineage=(\S+) batch=(\d+)""".r
    committedVersions(fs, r).reverseIterator
      .flatMap(v => manifestOp(fs, r, v))
      .collectFirst { case Parsed(l, b) if l == lineage => b.toLong }
  }

  // narrow manifest accessors for the in-package streaming source
  // ([[LakeStreamSource]]): dir NAMES, committed schema, and the raw
  // marker sequence of one snapshot, without widening the manifest
  // internals themselves
  private[graft] def snapshotDirNames(spark: SparkSession, root: String,
      version: Long): Seq[String] =
    manifestDirs(fsFor(spark, root), new Path(root), version)

  private[sources] def snapshotSchema(spark: SparkSession, root: String,
      version: Long): Option[org.apache.spark.sql.types.StructType] =
    manifestSchema(fsFor(spark, root), new Path(root), version)

  private[sources] def committedVersionList(spark: SparkSession,
      root: String): Seq[Long] =
    committedVersions(fsFor(spark, root), new Path(root))

  private[sources] def snapshotOp(spark: SparkSession, root: String,
      version: Long): Option[String] =
    manifestOp(fsFor(spark, root), new Path(root), version)

  /** ZERO-COPY SHALLOW CLONE: commit a NEW table at `dstRoot` whose
    * v0 manifest references snapshot `version` of `srcRoot` BY
    * ABSOLUTE PATH — no data moves, the clone of a 100 TB table costs
    * one manifest write. Version dirs are immutable, so the clone is
    * a consistent frozen snapshot: later source commits are invisible
    * to it, and clone appends write their own local dirs next to the
    * referenced ones (every reader resolves mixed absolute/relative
    * dir entries through the same `Path(root, dir)` rule). Dir-level
    * stats and bloom lines carry under the absolute names, so data
    * skipping keeps working on the clone; FILE-level `#fstats_` lines
    * are dropped (their key grammar is root-relative) — strictly
    * conservative, unknown files are always kept. The clone's
    * retention only ever sweeps dirs under ITS root, never the
    * source's.
    *
    * OWNERSHIP HAZARD (Delta's shallow-clone contract, stated not
    * hidden): the source still owns the referenced dirs — a source
    * retention prune or vacuum that drops the cloned snapshot's dirs
    * breaks the clone (readers then refuse, naming the lost dirs).
    * Clone from a snapshot the source retains, or deep-copy first.
    * @return the clone's committed version (always 0) */
  def cloneCommitted(spark: SparkSession, srcRoot: String, dstRoot: String,
      version: Option[Long] = None, retain: Int = -1): Long = {
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    require(!srcRoot.contains("=") && !srcRoot.contains("\n"),
      s"srcRoot must not contain '=' or newlines (manifest line grammar): $srcRoot")
    val fs = fsFor(spark, srcRoot)
    val sr = new Path(srcRoot)
    val v = version.getOrElse(currentVersion(spark, srcRoot).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $srcRoot")))
    def horizon = readableVersions(spark, srcRoot).mkString("[", ", ", "]")
    if (!fs.exists(new Path(sr, s"_commit_$v")))
      throw new java.util.NoSuchElementException(
        s"version $v is not committed at $srcRoot (readable: $horizon)")
    val dirs = manifestDirs(fs, sr, v)
    val missing = dirs.filterNot(d => fs.exists(new Path(sr, d)))
    if (missing.nonEmpty)
      throw new java.util.NoSuchElementException(
        s"version $v at $srcRoot references lost data dirs " +
          s"${missing.mkString(", ")} (readable: $horizon)")
    if (currentVersion(spark, dstRoot).isDefined)
      throw new IllegalStateException(
        s"committed table already exists at $dstRoot — clone bootstraps a " +
          "NEW table; pick an empty root")
    val dfs = fsFor(spark, dstRoot)
    // by-reference sharing only works within ONE filesystem: a
    // scheme-less absolute path written into the clone manifest would
    // resolve against the DESTINATION's filesystem and read nothing
    if (fs.getUri != dfs.getUri)
      throw new IllegalArgumentException(
        s"shallow clone references data by path — source (${fs.getUri}) and " +
          s"destination (${dfs.getUri}) must share a filesystem; deep-copy " +
          "across filesystems instead (readCommittedAt + commitOverwrite)")
    // makeQualified: a relative srcRoot must not re-resolve under the
    // clone root at read time
    val abs = dirs.map(d => fs.makeQualified(new Path(sr, d)).toString)
    val toAbs = dirs.zip(abs).toMap
    val srcStats = manifestStatsRaw(fs, sr, v)
    val srcBlooms = manifestBloomsRaw(fs, sr, v)
    val dr = new Path(dstRoot)
    dfs.mkdirs(dr)
    if (!commitManifest(dfs, dr, 0L, abs, retain,
        schema = manifestSchema(fs, sr, v),
        rows = manifestRows(fs, sr, v),
        newStats = srcStats.map { case (d, j) => toAbs.getOrElse(d, d) -> j },
        statsCols = manifestStatsCols(fs, sr, v),
        newBlooms = srcBlooms.map { case (d, j) => toAbs.getOrElse(d, d) -> j },
        bloomCols = manifestBloomCols(fs, sr, v),
        newParts = manifestPartsRaw(fs, sr, v)
          .map { case (d, j) => toAbs.getOrElse(d, d) -> j },
        partCols = manifestPartCols(fs, sr, v),
        // the bucket layout carries: the referenced dirs ARE
        // bucket-named (written through the bucketed writer), so the
        // clone keeps co-located probes and its own appends stage
        // bucketed under the inherited property
        bucketBy = manifestBucketBy(fs, sr, v),
        // the source snapshot's deletion vectors carry under the
        // absolute dir names (read-side keys are dir BASEnames, so
        // relative/absolute entries resolve alike)
        newDvs = manifestDvsRaw(fs, sr, v)
          .map { case (d, j) => toAbs.getOrElse(d, d) -> j },
        // the source's column map carries verbatim: the referenced
        // dirs store the SOURCE's physical names
        colMap = Some(manifestColMap(fs, sr, v)),
        retiredCols = Some(manifestRetired(fs, sr, v)),
        genParts = Some(manifestGenParts(fs, sr, v)),
        genTz = manifestGenTz(fs, sr, v),
        dvsReplace = true,
        op = s"clone $srcRoot@v$v"))
      throw new IllegalStateException(
        s"committed table already exists at $dstRoot — a concurrent writer " +
          "bootstrapped it during the clone; clone bootstraps a NEW table, " +
          "pick an empty root")
    0L
  }

  /** SQL-NATIVE read of a committed table: a DataFrame whose scan is
    * planned through a [[LakeFileIndex]], so data skipping fires on
    * whatever predicate the QUERY eventually applies — `spark.sql`
    * over a registered view, a joined-in filter, a `.where` added
    * three operators later — not just one passed up front the way
    * [[readCommittedWhere]] requires. Catalyst collects the scan's
    * data filters during planning and hands them to the index, which
    * prunes dirs (range + bloom) and files (clustered `#fstats_`)
    * with the SAME rules; Spark then applies the full predicate to
    * what is read, so the result never depends on pruning — only the
    * I/O shrinks. The relation keeps Spark's vectorized parquet
    * reader and whole-stage codegen, parquet footer pushdown
    * included; `sizeInBytes` reports the snapshot's true byte size so
    * a small lake table auto-broadcasts in joins.
    *
    * The handle is SNAPSHOT-PINNED at construction (explicit
    * `version` = time travel): every job over it — and every re-use
    * of a registered view — reads the same immutable snapshot even
    * across concurrent commits, the multi-job consistency a
    * live-resolving read cannot give. Re-call for the latest commit.
    * Schema is the snapshot's committed schema (old dirs read with
    * NULL backfill, same as [[readCommittedAt]]). */
  def sqlTable(spark: SparkSession, root: String,
      version: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val (v, schema) = resolveSnapshot(spark, root, version)
    LakeFileIndex.relation(spark, root, v, schema)
  }

  /** Validate-and-resolve one snapshot for index-planned reads: the
    * pinned (version, fully-nullable reading schema) pair behind
    * [[sqlTable]] and the `graft-lake` batch format. */
  private[sources] def resolveSnapshot(spark: SparkSession, root: String,
      version: Option[Long]): (Long, org.apache.spark.sql.types.StructType) = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val v = version.getOrElse(currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root")))
    def horizon = readableVersions(spark, root).mkString("[", ", ", "]")
    if (!fs.exists(new Path(r, s"_commit_$v")))
      throw new java.util.NoSuchElementException(
        s"version $v is not committed at $root (readable: $horizon)")
    val dirs = manifestDirs(fs, r, v)
    val missing = dirs.filterNot(d => fs.exists(new Path(r, d)))
    if (missing.nonEmpty)
      throw new java.util.NoSuchElementException(
        s"version $v at $root references lost data dirs " +
          s"${missing.mkString(", ")} (readable: $horizon)")
    // asNullable: files written before an overwrite-with-required
    // column may lack it; reading is always nullable, matching what
    // `spark.read.schema(...)` does on the readCommitted path
    val schema = org.apache.spark.sql.graft.Shim.asNullable(
      manifestSchema(fs, r, v).getOrElse(
        spark.read.parquet(dirs.map(d => new Path(r, d).toString): _*).schema))
    (v, schema)
  }

  /** [[sqlTable]] registered as a temp view: `spark.sql("… FROM
    * name …")` plans through the manifest with data skipping. The
    * view holds the registration-time snapshot (consistent reads);
    * re-register to follow new commits. */
  def registerSql(spark: SparkSession, name: String, root: String,
      version: Option[Long] = None): Unit =
    sqlTable(spark, root, version).createOrReplaceTempView(name)

  /** RESTORE — roll the LIVE table back to a retained snapshot
    * (Delta's `RESTORE TABLE … TO VERSION AS OF`): commit `version`'s
    * dir list as the NEXT version. One manifest write, ZERO data I/O
    * at any table size — version dirs are immutable and the restored
    * ones are still on disk (that is what retention retains), so the
    * restore references them exactly like a shallow clone references
    * its source. History is preserved, not rewritten: the bad commits
    * stay readable behind the restore point (auditable), the change
    * feed across the restore emits the exact rows it retracts/revives
    * (downstream MVs keep folding), and restoring is itself
    * time-travelable. The restored dirs bring their own stats / bloom
    * / file-stats / partition lines from their manifest (the previous
    * version may have dropped them). Refuses when `version` is no
    * longer readable (named horizon), when its data dirs were swept,
    * or when the bucket layout changed across the restore range (the
    * old dirs would not satisfy the current naming contract).
    * Optimistically concurrent like every maintenance commit.
    * @return the committed version holding the restored snapshot */
  def restoreCommitted(spark: SparkSession, root: String,
      version: Long, retain: Int = -1): Long = {
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root"))
    if (version == cur) return cur // restoring the live snapshot: no-op
    // validates the marker exists and every referenced dir survives
    val (_, schema) = resolveSnapshot(spark, root, Some(version))
    require(manifestBucketBy(fs, r, version) == manifestBucketBy(fs, r, cur),
      s"the bucket layout changed between v$version and the live " +
        s"v$cur — restored dirs would not satisfy the current bucketed " +
        "read contract; re-layout with commitOverwrite instead")
    val dirs = manifestDirs(fs, r, version)
    val next = pinSlot(fs, r, cur)
    if (!commitManifest(fs, r, next, dirs, retain,
        Some(schema), manifestRows(fs, r, version),
        newStats = manifestStatsRaw(fs, r, version),
        newFileStats = manifestFileStatsRaw(fs, r, version),
        newBlooms = manifestBloomsRaw(fs, r, version),
        newParts = manifestPartsRaw(fs, r, version),
        // CHECK constraints restore to the TARGET version's set (Delta
        // restores metadata with data): a constraint added after
        // `version` was never validated against these rows and must
        // not silently claim to hold over them
        checks = Some(manifestChecks(fs, r, version)),
        // deletion vectors restore AUTHORITATIVELY: carrying the live
        // version's vectors would re-kill rows the restore revives
        newDvs = manifestDvsRaw(fs, r, version), dvsReplace = true,
        // the column map (and retired set, and the stat/bloom column
        // lists a drop may have shrunk) restore to the TARGET's — the
        // restored dirs store the TARGET's physical names
        colMap = Some(manifestColMap(fs, r, version)),
        retiredCols = Some(manifestRetired(fs, r, version)),
        statsColsReplace = Some(manifestStatsCols(fs, r, version)),
        bloomColsReplace = Some(manifestBloomCols(fs, r, version)),
        genParts = Some(manifestGenParts(fs, r, version)),
        genTz = manifestGenTz(fs, r, version),
        partColsReplace = Some(manifestPartCols(fs, r, version)),
        // table properties and the identity mark restore to the
        // TARGET's (restored-away rows' ids become reusable exactly
        // because the rows that consumed them are gone)
        props = Some(manifestProps(fs, r, version)),
        identity = Some(manifestIdentity(fs, r, version)),
        op = s"restore v$version"))
      throw new java.util.ConcurrentModificationException(
        s"restore of $root to v$version lost version $next to a " +
          "concurrent commit — re-check the live table and retry")
    next
  }

  /** The declared bucket layout of one snapshot, as Spark's
    * [[org.apache.spark.sql.catalyst.catalog.BucketSpec]] — what the
    * relation assembly attaches so the scan exposes
    * `HashPartitioning(cols, n)`. Sort columns = bucket columns (the
    * staged writer sortBy's them). */
  private[sources] def bucketSpecAt(spark: SparkSession, root: String,
      version: Long): Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] = {
    val fs = fsFor(spark, root)
    // #bucketby stores PHYSICAL names; the relation's surface (and the
    // HashPartitioning its scan advertises) is LOGICAL
    val inv = manifestColMap(fs, new Path(root), version).map(_.swap)
    manifestBucketBy(fs, new Path(root), version).map { case (n, cols0) =>
      val cols = cols0.map(c => inv.getOrElse(c, c))
      org.apache.spark.sql.catalyst.catalog.BucketSpec(n, cols, cols)
    }
  }

  /** The live (or pinned) snapshot of a BUCKETED table as a DataFrame
    * whose scan carries the bucket layout: joins and aggregations on
    * the bucket key read this side with ZERO exchanges (the other side
    * shuffles to the bucket count; `spark.sql.shuffle.partitions` need
    * not match). Same pinned index-planned read as [[sqlTable]] — in
    * fact [[sqlTable]] and SQL catalog reads already carry the layout
    * when the manifest declares one; this entry point additionally
    * REFUSES when the table isn't bucketed, so a stored-index probe
    * can assert its co-location contract instead of silently
    * shuffling. */
  def readBucketed(spark: SparkSession, root: String,
      version: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val (v, schema) = resolveSnapshot(spark, root, version)
    require(bucketSpecAt(spark, root, v).isDefined,
      s"table at $root declares no bucket layout — commit with " +
        "bucketBy = Some((n, cols)) to establish one")
    LakeFileIndex.relation(spark, root, v, schema)
  }

  /** `TIMESTAMP AS OF` resolution: the LATEST version whose commit
    * landed at or before `tsMicros` (epoch micros) — Delta's
    * commit-timestamp semantics, answered from the manifests' own
    * `#ts=` lines (mtime fallback for pre-line manifests — see
    * [[TsPrefix]] for why mtimes alone are untrustworthy), no data
    * I/O. Refuses (with the readable horizon) when the timestamp
    * predates every retained commit. */
  def versionAsOf(spark: SparkSession, root: String, tsMicros: Long): Long = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val vs = committedVersions(fs, r)
    if (vs.isEmpty) throw new java.util.NoSuchElementException(
      s"no committed table at $root")
    vs.filter(v => manifestTsMillis(fs, r, v) * 1000L <= tsMicros)
      .maxOption.getOrElse(throw new java.util.NoSuchElementException(
        s"no version committed at or before timestamp $tsMicros micros at " +
          s"$root (readable: ${readableVersions(spark, root).mkString("[", ", ", "]")})"))
  }

  /** CHANGE FEED: the exact NET row-level changes that turn snapshot
    * `fromVersion` into snapshot `toVersion` — each output row is a
    * `toVersion`-schema row plus `change_type` ∈ `insert` / `delete`
    * (the old image) / `update_preimage` + `update_postimage` (BOTH
    * images of a changed row, the Delta-CDF convention: retractable
    * consumers subtract the preimage and add the postimage, so a sum
    * or count maintained off the feed stays exact — see
    * [[graft.operators.Incremental.applyFeed]]; replication-style
    * consumers filter preimages out). This is what an incremental
    * downstream (a stat fold, a stored index, a replica) consumes
    * instead of re-reading the table; composing `Cdc.applyChanges`
    * over the postimage feed replays one committed table into
    * another.
    *
    * Derivation rides the manifest protocol instead of write-time
    * change files: version dirs are IMMUTABLE, so every changed row
    * lives in a dir the two snapshots do NOT share. The diff reads
    * only `dirs(from) Δ dirs(to)` — O(touched dirs), never O(table),
    * for append chains (removed side empty: pure inserts, no join at
    * all), merges (the touched-dir rewrites), and compactions
    * (row-preserving: every carried row pairs up equal and drops
    * out). An OVERWRITE in the range degenerates to a full two-sided
    * diff — still exact, priced honestly at O(both snapshots).
    *
    * Contract (same as [[mergeCommitted]] / `Cdc.applyChanges`):
    * `keyCols` identify a row uniquely within each snapshot. Rows
    * pair by key; paired rows compare null-safely column by column
    * under the `toVersion` schema (evolution only ADDS nullable
    * columns, so old dirs read under it with NULL backfill; a column
    * an overwrite dropped is invisible to the diff by construction).
    * MapType columns are refused — Spark cannot compare maps; feed
    * tables carry exploded pairs instead. */
  /** [[changesBetween]] with WALL-CLOCK boundaries (Delta's
    * `table_changes(t, '2026-01-01', …)`): each instant resolves to
    * the snapshot that was LIVE at that moment ([[versionAsOf]] —
    * latest commit at-or-before, off the manifests' own `#ts=`
    * lines), so "changes between instant A and instant B" is exactly
    * the diff of the snapshots a reader saw at A and at B. An instant
    * before the first retained commit refuses fast, naming the
    * readable horizon — consumers know wall-clock windows, not
    * version numbers. */
  def changesBetweenInstants(spark: SparkSession, root: String,
      fromTs: java.sql.Timestamp, toTs: java.sql.Timestamp,
      keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(!toTs.before(fromTs), s"fromTs $fromTs must be <= toTs $toTs")
    val from = versionAsOf(spark, root, fromTs.getTime * 1000L)
    val to = versionAsOf(spark, root, toTs.getTime * 1000L)
    changesBetween(spark, root, from, to, keyCols)
  }

  def changesBetween(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    // both endpoints must be readable — reuse the time-travel
    // resolution (fails fast naming the horizon when pruned)
    val to = readCommittedAt(spark, root, toVersion)
    val toSchema = to.schema
    keyCols.foreach(k => require(toSchema.fieldNames.contains(k),
      s"key column '$k' not in the version-$toVersion schema " +
        toSchema.fieldNames.mkString("[", ", ", "]")))
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    toSchema.fields.foreach(f => require(!hasMap(f.dataType),
      s"changesBetween cannot compare MapType column '${f.name}' — " +
        "store exploded (key, value) pairs instead"))
    if (fromVersion == toVersion)
      return to.limit(0).withColumn("change_type", lit(""))
    readCommittedAt(spark, root, fromVersion) // horizon check only
    // the diff reads BOTH endpoints under toVersion's schema; a
    // column-mapping change inside the range (rename, drop+re-add)
    // makes the shared-schema read a lie for the old side — refuse
    // loudly instead of reporting every row as an update
    val fromMap = manifestColMap(fs, r, fromVersion)
    val toMap = manifestColMap(fs, r, toVersion)
    if (fromMap != toMap || manifestRetired(fs, r, fromVersion) !=
        manifestRetired(fs, r, toVersion)) {
      val fromNames = manifestSchema(fs, r, fromVersion)
        .map(_.fieldNames.toSet).getOrElse(Set.empty)
      val fromPhys = manifestSchema(fs, r, fromVersion)
        .map(s => physSchema(s, fromMap).fieldNames.toSet)
        .getOrElse(Set.empty)
      val crossed = toSchema.fieldNames.filter { n =>
        val pTo = physName(toMap, n)
        if (fromNames.contains(n)) physName(fromMap, n) != pTo
        else fromPhys.contains(pTo)
      }
      require(crossed.isEmpty,
        s"changesBetween v$fromVersion..v$toVersion crosses a column " +
          s"rename/re-add of ${crossed.mkString("[", ", ", "]")} — read " +
          "the feed in two spans, split at the mapping commit")
    }
    // the diff unit is (dir, deletion-vector line): version dirs are
    // immutable, but a DV delete changes a dir's LIVE rows without
    // renaming it — such a dir joins both sides (old rows under the
    // old vector, new rows under the new), unchanged rows pair up and
    // drop out, and the newly soft-deleted rows surface as deletes
    val fromDvs = manifestDvsRaw(fs, r, fromVersion)
    val toDvs = manifestDvsRaw(fs, r, toVersion)
    val fromPairs = manifestDirs(fs, r, fromVersion)
      .map(d => d -> fromDvs.getOrElse(d, "")).toSet
    val toPairs = manifestDirs(fs, r, toVersion)
      .map(d => d -> toDvs.getOrElse(d, "")).toSet
    val removed = (fromPairs -- toPairs).map(_._1).toSeq.sorted
    val added = (toPairs -- fromPairs).map(_._1).toSeq.sorted
    def readDirs(dirs: Seq[String], version: Long) =
      if (dirs.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), toSchema)
      else // shared superset schema (see contract), that version's DVs
        readDirsWithDv(spark, fs, r, version, dirs, Some(toSchema))
    val newSide = readDirs(added, toVersion)
    if (removed.isEmpty) // append-only fast path: every added row is an insert
      return newSide.withColumn("change_type", lit("insert"))
    val oldSide = readDirs(removed, fromVersion)
    val valueCols = toSchema.fieldNames.filterNot(keyCols.contains).toSeq
    val o = oldSide.select(
      struct(keyCols.map(col): _*).as("__k"),
      struct(toSchema.fieldNames.map(col).toSeq: _*).as("__old"))
    val n = newSide.select(
      struct(keyCols.map(col): _*).as("__k"),
      struct(toSchema.fieldNames.map(col).toSeq: _*).as("__new"))
    val sameRow = valueCols
      .map(c => col("__old").getField(c) <=> col("__new").getField(c))
      .foldLeft(lit(true))(_ && _)
    // one key-shuffle over the CHANGED dirs only; carried-over rows
    // (a merge rewrites whole touched dirs, a compaction rewrites the
    // snapshot) pair up equal and drop out here
    val joined = o.join(n, Seq("__k"), "full_outer")
    def tagged(img: org.apache.spark.sql.Column, t: String) =
      struct(img.as("r"), lit(t).as("t"))
    val changes = when(col("__old").isNull, array(tagged(col("__new"), "insert")))
      .when(col("__new").isNull, array(tagged(col("__old"), "delete")))
      .when(!sameRow, array(tagged(col("__old"), "update_preimage"),
        tagged(col("__new"), "update_postimage")))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("r", toSchema),
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.StringType))))))
    joined.select(explode(changes).as("__c"))
      .select(toSchema.fieldNames.map(f =>
        col("__c.r").getField(f).as(f)).toSeq :+
        col("__c.t").as("change_type"): _*)
  }

  /** Cursor pull for incremental consumers: the changes committed
    * after `lastSeen` (None = never read → the full live snapshot as
    * inserts), with the version the cursor should advance to. None
    * when there is nothing new. Poll + fold + persist the returned
    * version = an incremental reader of a committed table, the batch
    * dual of the streaming sinks (`Streams.statRefreshSink`). */
  def changesSince(spark: SparkSession, root: String, lastSeen: Option[Long],
      keyCols: Seq[String]): Option[(org.apache.spark.sql.DataFrame, Long)] = {
    import org.apache.spark.sql.functions._
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    lastSeen match {
      case None => Some((readCommitted(spark, root)
        .withColumn("change_type", lit("insert")), cur))
      case Some(v) if v >= cur => None
      case Some(v) => Some((changesBetween(spark, root, v, cur, keyCols), cur))
    }
  }

  /** Metadata-only exact `count(*)` of the live snapshot: one
    * manifest read, no scan — at 100 TB the difference between free
    * and a full-table job. None when the writer chain could not carry
    * the count (fall back to `readCommitted(...).count()`). */
  def countCommitted(spark: SparkSession, root: String): Option[Long] =
    currentVersion(spark, root)
      .flatMap(v => manifestRows(fsFor(spark, root), new Path(root), v))

  /** [[countCommitted]] for a time-travel version. */
  def countCommittedAt(spark: SparkSession, root: String, version: Long): Option[Long] = {
    val fs = fsFor(spark, root)
    if (!fs.exists(new Path(new Path(root), s"_commit_$version"))) None
    else manifestRows(fs, new Path(root), version)
  }

  /** Next safe version number: past EVERY committed marker, including
    * defensively-ignored ones whose data dirs are lost — such a
    * manifest still owns its number, and renaming a new manifest onto
    * an existing file fails on HDFS on every retry (a permanently
    * wedged writer). Same allocation rule as [[commitOverwrite]] /
    * [[commitAppend]]; package-private for the streaming fold. */
  private[graft] def nextVersion(spark: SparkSession, root: String): Long =
    committedVersions(fsFor(spark, root), new Path(root))
      .maxOption.map(_ + 1).getOrElse(0L)

  /** Re-create the `_applied_*` effectively-once markers found in
    * `fromDirs` inside `toDir` — maintenance ops (merge/compaction)
    * that REPLACE version dirs must carry the streaming folds'
    * replay-skip state forward, or a compacted stat table would
    * silently re-open to double-folds on the next checkpoint replay.
    * Markers are empty files; names are the state. */
  private def preserveMarkers(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      fromDirs: Seq[String], toDir: String): Unit =
    preserveMarkers(fs, r, fromDirs, Seq(toDir))

  /** Multi-dir form (partitioned rewrites stage several dirs): a
    * marker is a PRESENCE check over the live snapshot's dirs, so the
    * first replacement dir carrying them preserves the invariant. */
  private def preserveMarkers(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      fromDirs: Seq[String], toDirs: Seq[String]): Unit =
    toDirs.headOption.foreach { t =>
      fromDirs.map(d => new Path(r, d)).filter(fs.exists)
        .flatMap(d => fs.listStatus(d).toSeq)
        .map(_.getPath.getName).distinct
        .filter(_.startsWith("_applied_"))
        .foreach(n => fs.create(new Path(new Path(r, t), n)).close())
    }

  /** LOSSLESS type widening for schema evolution (Delta's
    * type-widening feature): `Some(wider)` when one side widens the
    * other with zero information loss AND the parquet reader upcasts
    * the narrower files under the wider schema (byte→short→int→long,
    * float→double, ≤int-integral→double — all probed on Spark 4.1's
    * vectorized reader). long→double and anything decimal/temporal is
    * NOT widening (lossy / representation-changing) and refuses. */
  private def widenedType(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType):
      Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    def rank(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(0); case ShortType => Some(1)
      case IntegerType => Some(2); case LongType => Some(3)
      case _ => None
    }
    def smallIntegral(dt: DataType): Boolean =
      dt == ByteType || dt == ShortType || dt == IntegerType
    if (a == b) Some(a)
    else (rank(a), rank(b)) match {
      case (Some(ra), Some(rb)) => Some(if (ra >= rb) a else b)
      case _ =>
        (a, b) match {
          case (FloatType, DoubleType) | (DoubleType, FloatType) =>
            Some(DoubleType)
          case (x, DoubleType) if smallIntegral(x) => Some(DoubleType)
          case (DoubleType, x) if smallIntegral(x) => Some(DoubleType)
          // NESTED evolution (Delta's autoMerge shape): structs merge
          // field-by-field under the SAME rules — add-nullable fields
          // and lossless widening inside the container; any
          // unmergeable nested field refuses through the None, and
          // the outer error names the top-level column. Old files
          // lacking a nested field read it NULL (parquet schema
          // clipping), exactly like a top-level add.
          case (sa: StructType, sb: StructType) =>
            scala.util.Try(mergeSchemas(sa, sb)).toOption
          case (ArrayType(ea, na), ArrayType(eb, nb)) =>
            widenedType(ea, eb).map(e => ArrayType(e, na || nb))
          case _ => None
        }
    }
  }

  /** Merge a committed table schema with an incoming batch's: the
    * ADD-NULLABLE-COLUMN evolution every lakehouse needs in week one,
    * plus LOSSLESS TYPE WIDENING ([[widenedType]] — the merged column
    * takes the wider type in EITHER direction: a long batch widens an
    * int column, and an int batch lands unchanged in a long column;
    * old files read upcast under the widened schema, new files are
    * whatever the batch wrote — both exact). New columns append
    * (nullable — old files lack them and read NULL); a column the
    * batch omits stays (nullable — the new files read NULL for it);
    * any NON-widening type change is refused loudly — silent coercion
    * corrupts every prior snapshot's reading of the shared files. */
  private[graft] def mergeSchemas(
      base: org.apache.spark.sql.types.StructType,
      incoming: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType = {
    val baseNames = base.fieldNames.toSet
    val kept = base.fields.map { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(g) =>
          val merged = widenedType(f.dataType, g.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"schema evolution supports adding nullable columns and " +
                s"lossless type widening only; '${f.name}' changes type " +
                s"${f.dataType.simpleString} -> ${g.dataType.simpleString}. " +
                "Rewrite the table (commitOverwrite) to change a " +
                "column's type."))
          f.copy(dataType = merged, nullable = f.nullable || g.nullable)
        case None => f.copy(nullable = true)
      }
    }
    val added = incoming.fields.filterNot(f => baseNames(f.name))
      .map(_.copy(nullable = true))
    org.apache.spark.sql.types.StructType(kept ++ added)
  }

  /** Commit `dirs` as snapshot `version` of `root`. Package-private:
    * the streaming fold pre-writes its own version dir (so its
    * applied-batch marker rides INSIDE the dir and commits atomically
    * with the data) and then calls this. */
  private[graft] def commitVersion(spark: SparkSession, root: String,
      version: Long, dirs: Seq[String], retain: Int,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    // fold sinks pre-write PLAIN version dirs (the applied-batch
    // marker rides inside the dir) — on a bucketed table those files
    // would violate the bucket-naming contract every bucketed scan
    // depends on, so refuse up front instead of corrupting reads
    val ffs = fsFor(spark, root)
    committedVersions(ffs, new Path(root)).lastOption.foreach { last =>
      require(manifestBucketBy(ffs, new Path(root), last).isEmpty,
        s"the table at $root declares a bucket layout — fold commits " +
          "pre-write plain version dirs and cannot preserve it; fold " +
          "into an unbucketed table (or use the append/CDC-merge sinks, " +
          "which stage through the bucketed writer)")
      require(manifestColMap(ffs, new Path(root), last).isEmpty,
        s"the table at $root carries a column mapping (renamed/dropped " +
          "columns) — fold commits pre-write data dirs under the " +
          "stream's own column names and cannot apply the map; fold " +
          "into an unmapped table")
    }
    if (!commitManifest(ffs, new Path(root), version, dirs,
        retain, schema, op = "fold"))
      throw new java.util.ConcurrentModificationException(
        s"fold commit of version $version at $root lost the slot to a " +
          "concurrent writer — fold tables have ONE streaming writer " +
          "(checkpoint lineage); a contested version means two writers " +
          "share this root")
  }

  /** TEST SEAM: runs between a manifest's build and its put-if-absent
    * publish — exactly the window a concurrent writer's commit can
    * occupy. Production value is a no-op; LakeSpec installs a
    * SELF-RESETTING closure (it must reset itself first, or the
    * concurrent commit it performs recurses forever) to exercise the
    * optimistic-concurrency loser paths deterministically. */
  private[graft] var beforePublish: () => Unit = () => ()

  /** TEST SEAM: runs right after a DML writer (delete/update/merge)
    * pins its commit slot and BEFORE any of its classify/probe/
    * staging jobs — the window where a concurrent commit must steal
    * the pinned slot and force a loud publish failure instead of
    * being silently clobbered by a stale-snapshot republish (the DV
    * fast paths' lost-update window before round 14). */
  private[graft] var afterSlotPin: () => Unit = () => ()

  /** Build and publish the version-`version` manifest put-if-absent.
    * Returns true when this writer won the version slot (retention
    * then pruned), false when a concurrent writer committed `version`
    * first — the caller decides whether to rebase-and-retry (append),
    * refuse (overwrite/maintenance), or treat it as a protocol
    * violation (single-writer folds). */
  private def commitManifest(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      version: Long, dirs: Seq[String], retain: Int,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      rows: Option[Long] = None,
      newStats: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil,
      newFileStats: Map[String, Map[String, String]] = Map.empty,
      newBlooms: Map[String, String] = Map.empty,
      bloomCols: Seq[String] = Nil,
      newParts: Map[String, String] = Map.empty,
      partCols: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None,
      checks: Option[Seq[(String, String)]] = None,
      newDvs: Map[String, String] = Map.empty,
      dvsReplace: Boolean = false,
      colMap: Option[Map[String, String]] = None,
      retiredCols: Option[Seq[String]] = None,
      genParts: Option[Seq[(String, String)]] = None,
      genTz: Option[String] = None,
      statsColsReplace: Option[Seq[String]] = None,
      bloomColsReplace: Option[Seq[String]] = None,
      partColsReplace: Option[Seq[String]] = None,
      props: Option[Map[String, String]] = None,
      identity: Option[Option[(String, Long)]] = None,
      ingested: Option[Seq[String]] = None,
      op: String = "commit"): Boolean = {
    // stats carry: a dir REUSED from the previous snapshot keeps its
    // stats line verbatim (immutable dir, immutable range); only dirs
    // this commit wrote get fresh lines. Resolved BEFORE the rename
    // makes this version the latest.
    val prevV = committedVersions(fs, r).lastOption
    val prevStats = prevV
      .map(v => manifestStatsRaw(fs, r, v)).getOrElse(Map.empty[String, String])
    val statsLines = dirs.flatMap(d =>
      newStats.get(d).orElse(prevStats.get(d)).map(j => StatsPrefix + d + "=" + j))
    val prevFileStats = prevV
      .map(v => manifestFileStatsRaw(fs, r, v))
      .getOrElse(Map.empty[String, Map[String, String]])
    val fileStatsLines = dirs.flatMap(d =>
      newFileStats.get(d).orElse(prevFileStats.get(d)).toSeq
        .flatMap(_.toSeq.sortBy(_._1)
          .map { case (f, j) => FileStatsPrefix + d + "/" + f + "=" + j }))
    // the stat-column line itself inherits too, so a commit path that
    // computes no stats (e.g. the streaming fold's commitVersion)
    // doesn't sever the chain — its new dir is merely unstat'd
    val effCols = statsColsReplace.getOrElse(
      if (statsCols.nonEmpty) statsCols
      else prevV.map(v => manifestStatsCols(fs, r, v)).getOrElse(Nil))
    // bloom lines carry exactly like stats lines: reused dirs keep
    // their serialized filters verbatim (immutable dir, immutable
    // membership), only dirs this commit wrote get fresh ones
    val prevBlooms = prevV
      .map(v => manifestBloomsRaw(fs, r, v)).getOrElse(Map.empty[String, String])
    val bloomLines = dirs.flatMap(d =>
      newBlooms.get(d).orElse(prevBlooms.get(d)).map(j => BloomPrefix + d + "=" + j))
    val effBloom = bloomColsReplace.getOrElse(
      if (bloomCols.nonEmpty) bloomCols
      else prevV.map(v => manifestBloomCols(fs, r, v)).getOrElse(Nil))
    // partition lines carry exactly like stats lines (immutable dir,
    // immutable values); the column line inherits so COW rewrites and
    // folds never sever the table's declared layout
    val prevParts = prevV
      .map(v => manifestPartsRaw(fs, r, v)).getOrElse(Map.empty[String, String])
    val partLines = dirs.flatMap(d =>
      newParts.get(d).orElse(prevParts.get(d)).map(j => PartPrefix + d + "=" + j))
    val effPart = partColsReplace.getOrElse(
      if (partCols.nonEmpty) partCols
      else prevV.map(v => manifestPartCols(fs, r, v)).getOrElse(Nil))
    // the bucket layout inherits like the other table-property lines
    val effBucket = bucketBy.orElse(prevV.flatMap(v => manifestBucketBy(fs, r, v)))
    // CHECK constraints inherit too; Some(…) replaces (add/drop)
    val effChecks = checks.getOrElse(
      prevV.map(v => manifestChecks(fs, r, v)).getOrElse(Nil))
    // the column map and retired-physical-name set inherit like every
    // table-property line; Some(…) replaces (rename/drop/evolution)
    val effColMap = colMap.getOrElse(
      prevV.map(v => manifestColMap(fs, r, v)).getOrElse(Map.empty))
    val effRetired = retiredCols.getOrElse(
      prevV.map(v => manifestRetired(fs, r, v)).getOrElse(Nil))
    // generated columns inherit like every table-property line
    val effGen = genParts.getOrElse(
      prevV.map(v => manifestGenParts(fs, r, v)).getOrElse(Nil))
    val effGenTz = genTz.orElse(prevV.flatMap(v => manifestGenTz(fs, r, v)))
    // user/table properties inherit; Some(…) replaces (the DDL)
    val effProps = props.getOrElse(
      prevV.map(v => manifestProps(fs, r, v)).getOrElse(Map.empty))
    // the identity declaration + high-water mark inherit; Some(…)
    // replaces (allocating commits advance the mark ATOMICALLY with
    // the rows that consumed it; restore re-points both)
    val effIdentity = identity.getOrElse(
      prevV.flatMap(v => manifestIdentity(fs, r, v)))
    // the COPY INTO file ledger inherits (a plain append between two
    // COPYs must not amnesia the loaded set); Some(…) replaces
    val effIngested = ingested.getOrElse(
      prevV.map(v => manifestIngested(fs, r, v)).getOrElse(Nil))
    // retention is TABLE state (graft.retain) unless this call passed
    // an explicit override — resolved against effProps, so a commit
    // that SETS the property is already governed by it
    val retainEff =
      if (retain >= 0) retain
      else effProps.get(PropRetain).flatMap(_.toIntOption)
        .filter(_ >= 0).getOrElse(1)
    // deletion vectors: the one MUTABLE per-dir line. Normal commits
    // carry a reused dir's vector (new deletes pass the merged set in
    // `newDvs`); rewritten dirs materialize theirs away by renaming.
    // RESTORE passes `dvsReplace` — the target version's vectors are
    // authoritative, carrying the live ones would re-kill rows the
    // restore revives (or keep alive rows it re-deletes).
    val prevDvs = prevV.map(v => manifestDvsRaw(fs, r, v))
      .getOrElse(Map.empty[String, String])
    val dvLines = dirs.flatMap(d =>
      (if (dvsReplace) newDvs.get(d)
       else newDvs.get(d).orElse(prevDvs.get(d)))
        .map(j => DvPrefix + d + "=" + j))
    // protocol gate: name EXACTLY the semantics-bearing features this
    // snapshot carries (derived from the effective lines, so a commit
    // that materializes a feature away — REORG purging the last DV,
    // say — drops the requirement with it). Readers that don't
    // recognize a named feature refuse the manifest instead of
    // misreading it; see RequirePrefix.
    val features =
      (if (dvLines.nonEmpty) Seq("dv") else Nil) ++
      (if (effColMap.nonEmpty || effRetired.nonEmpty) Seq("colmap") else Nil) ++
      (if (effIdentity.nonEmpty) Seq("identity") else Nil) ++
      (if (effGen.nonEmpty) Seq("genpart") else Nil) ++
      (if (effBucket.nonEmpty) Seq("bucket") else Nil)
    // writer-UNIQUE tmp: a shared `_commit_N.tmp` would let two
    // racing writers interleave create/write/publish on one file and
    // publish each other's bodies — the nonce makes every writer's
    // pre-publish state private (the `.tmp` suffix keeps it out of
    // committedVersions and readable-version listings)
    val tmp = new Path(r, s"_commit_$version." +
      java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    val out = fs.create(tmp, true)
    val body = dirs ++ Seq(OpPrefix + op) ++
      Seq(TsPrefix + System.currentTimeMillis()) ++
      schema.map(s => SchemaPrefix + s.json) ++
      rows.map(n => RowsPrefix + n) ++
      (if (effCols.nonEmpty) Seq(StatsColsPrefix + effCols.mkString(","))
       else Nil) ++
      (if (effBloom.nonEmpty) Seq(BloomColsPrefix + effBloom.mkString(","))
       else Nil) ++
      (if (effPart.nonEmpty) Seq(PartColsPrefix + effPart.mkString(","))
       else Nil) ++
      effBucket.map { case (n, cols) =>
        BucketByPrefix + n + ":" + cols.mkString(",")
      } ++
      effChecks.map { case (n, e) => CheckPrefix + n + ":" + e } ++
      (if (effColMap.nonEmpty)
        Seq(ColMapPrefix + effColMap.toSeq.sorted
          .map { case (l, p) => s"$l:$p" }.mkString(","))
       else Nil) ++
      (if (effRetired.nonEmpty) Seq(ColRetiredPrefix + effRetired.mkString(","))
       else Nil) ++
      effGen.map { case (c, e) => GenPartPrefix + c + ":" + e } ++
      (if (effGen.nonEmpty) effGenTz.map(GenTzPrefix + _).toSeq else Nil) ++
      effProps.toSeq.sortBy(_._1).map { case (k, v) => PropPrefix + k + "=" + v } ++
      effIdentity.map { case (c, n) => IdentityPrefix + c + ":" + n } ++
      effIngested.map(IngestedPrefix + _) ++
      (if (features.nonEmpty) Seq(RequirePrefix + features.mkString(","))
       else Nil) ++
      statsLines ++ fileStatsLines ++ bloomLines ++ partLines ++ dvLines
    try out.write(body.mkString("\n").getBytes("UTF-8")) finally out.close()
    // test seam: the window between manifest build and publish is
    // where a concurrent writer's commit lands — specs swap in a
    // self-resetting closure that commits here to force slot loss
    // DETERMINISTICALLY (thread-race tests would flake green)
    beforePublish()
    // THE commit point: atomic put-if-absent of the marker
    if (!publishIfAbsent(fs, tmp, new Path(r, s"_commit_$version")))
      return false
    pruneRetention(fs, r, retainEff)
    true
  }

  /** Layout-only maintenance OCC rebase (Delta's disjoint-file
    * conflict rule): a compaction / z-order / REORG purge that lost
    * its version slot may RETRY on top of the interleaved commits —
    * instead of discarding a rewrite that may have moved terabytes —
    * PROVIDED the race never touched what the rewrite read or froze:
    *
    *  - every SOURCE dir is still live (an interloper that removed or
    *    rewrote one superseded rows our output would resurrect);
    *  - the source dirs' deletion vectors are unchanged (the rewrite
    *    materialized the vector it READ);
    *  - the table-level metadata the staged files froze under is
    *    unchanged (column map / retired names / stat, bloom and
    *    partition column lists / bucket layout / generated columns).
    *
    * Anything else — plain appends above all, but also disjoint
    * maintenance — composes: the retry publishes (current live dirs −
    * source dirs) + the rewrite's output, under the CURRENT schema
    * and row count (an interloping append may have evolved/extended
    * both; the rewrite is row-preserving so they stay exact).
    * @return (next slot, current live dirs, current schema, rows) */
  private def maintenanceRebase(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, root: String, baseV: Long, srcDirs: Set[String],
      what: String):
      (Long, Seq[String], Option[org.apache.spark.sql.types.StructType],
        Option[Long]) = {
    def cme(msg: String) =
      new java.util.ConcurrentModificationException(s"$what of $root $msg")
    try {
      val curV = committedVersions(fs, r).maxOption.getOrElse(
        throw cme("raced the table's last manifest away mid-commit"))
      val live = manifestDirs(fs, r, curV)
      val missing = srcDirs -- live.toSet
      if (missing.nonEmpty) throw cme(
        "raced a commit that removed or rewrote its source dirs " +
          missing.toSeq.sorted.mkString("[", ", ", "]") +
          " — retrying would resurrect superseded rows; re-run against " +
          "the current table")
      def srcDvs(v: Long) = manifestDvsRaw(fs, r, v)
        .view.filterKeys(srcDirs).toMap
      if (srcDvs(curV) != srcDvs(baseV)) throw cme(
        "raced a deletion-vector commit on its source dirs — the " +
          "rewrite materialized a vector that is no longer current; " +
          "re-run against the current table")
      val metaSame =
        manifestColMap(fs, r, curV) == manifestColMap(fs, r, baseV) &&
          manifestRetired(fs, r, curV) == manifestRetired(fs, r, baseV) &&
          manifestStatsCols(fs, r, curV) == manifestStatsCols(fs, r, baseV) &&
          manifestBloomCols(fs, r, curV) == manifestBloomCols(fs, r, baseV) &&
          manifestPartCols(fs, r, curV) == manifestPartCols(fs, r, baseV) &&
          manifestBucketBy(fs, r, curV) == manifestBucketBy(fs, r, baseV) &&
          manifestGenParts(fs, r, curV) == manifestGenParts(fs, r, baseV)
      if (!metaSame) throw cme(
        "raced a metadata commit (mapping/layout DDL) — the staged " +
          "files froze under the previous metadata; re-run against the " +
          "current table")
      (curV + 1, live, manifestSchema(fs, r, curV), manifestRows(fs, r, curV))
    } catch {
      case _: java.io.FileNotFoundException => throw cme(
        "raced a retention prune past its base snapshot — the " +
          "interleaving cannot be proven safe; re-run against the " +
          "current table (or commit with a larger `retain`)")
    }
  }

  /** The retention prune every commit runs: keep the live snapshot
    * plus the newest `retain` superseded ones — markers first (a
    * crash mid-prune never leaves a committed manifest pointing at
    * deleted data — dirs go only after every manifest referencing
    * them), then sweep EVERY committed-range data dir no surviving
    * manifest references. Sweeping by reference, not by stale list,
    * also reclaims orphans from a PAST crash between a prune's
    * marker and dir deletions — they are referenced by no manifest
    * and could never be resurrected. A writer-in-progress dir is
    * never swept: a version-named (`v<N>`) one exceeds every
    * committed version, and a staged (`z<nonce>`) one is only ever
    * swept by reference from a manifest pruned in this very call —
    * an in-flight stage is referenced by nothing and untouchable
    * here (crash-abandoned stages age out via [[vacuumCommitted]]).
    * @return (pruned manifest versions, swept dir names) */
  private def pruneRetention(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      retain: Int, dryRun: Boolean = false): (Seq[Long], Seq[String]) = {
    val all = committedVersions(fs, r)
    if (all.isEmpty) return (Nil, Nil)
    val (stale, kept) = all.splitAt(Math.max(0, all.length - 1 - retain))
    // staged (`z`) dirs carry no version in their name, so they are
    // sweepable only by REFERENCE: record what the to-be-pruned
    // manifests referenced BEFORE deleting them
    val staleRefs = stale.flatMap(v => manifestDirs(fs, r, v)).toSet
    if (!dryRun)
      stale.foreach(v => fs.delete(new Path(r, s"_commit_$v"), false))
    val keptRefs = kept.flatMap(v => manifestDirs(fs, r, v)).toSet
    val maxV = all.last
    val swept = Seq.newBuilder[String]
    fs.listStatus(r).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .foreach { n =>
        if (!keptRefs.contains(n)) {
          if (n.startsWith("v"))
            n.stripPrefix("v").toLongOption.foreach { v =>
              if (v <= maxV) {
                if (!dryRun) fs.delete(new Path(r, n), true)
                swept += n
              }
            }
          // a staged dir whose last reference was just pruned is dead
          // (it WAS committed once, so it is not in-flight). A staged
          // dir referenced by NO manifest may belong to an in-flight
          // writer — only vacuumCommitted's staleness horizon touches
          // those.
          else if (n.startsWith("z") && staleRefs.contains(n)) {
            if (!dryRun) fs.delete(new Path(r, n), true)
            swept += n
          }
        }
      }
    (stale, swept.result())
  }

  /** VACUUM: enforce a retention horizon on a committed table WITHOUT
    * a data commit — every commit already prunes with its own
    * `retain`, but a table that stopped being WRITTEN never gets
    * another chance to reclaim its history; this is that chance (the
    * lakehouse VACUUM command). Keeps the live snapshot plus the
    * newest `retain` superseded readable versions; narrows the
    * [[readCommittedAt]] time-travel horizon accordingly (readers of
    * pruned versions fail fast naming the remaining horizon). Also
    * reclaims orphan dirs from past crashed writers below the live
    * version; an in-progress writer dir (above it) is never touched.
    *
    * `staleStagedMs` additionally reclaims crash-ABANDONED optimistic
    * writes: staged `z<nonce>` dirs referenced by no manifest, and
    * orphaned `_commit_*.tmp` marker files, older than the horizon.
    * Delta's VACUUM contract applies verbatim — never set the horizon
    * below your longest-running writer's staging time, or an
    * in-flight commit's data is swept from under it (the 7-day
    * default is Delta's own).
    * @return (pruned manifest versions, swept data dir names) */
  /** @param dryRun report what WOULD be reclaimed (pruned versions,
    *   swept dirs/markers) without deleting anything — Delta's
    *   `VACUUM … DRY RUN`, the audit step before enforcing a horizon. */
  def vacuumCommitted(spark: SparkSession, root: String,
      retain: Int = -1,
      staleStagedMs: Long = 7L * 24 * 60 * 60 * 1000,
      dryRun: Boolean = false): (Seq[Long], Seq[String]) = {
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    require(staleStagedMs >= 0, s"staleStagedMs must be >= 0, got $staleStagedMs")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    if (committedVersions(fs, r).isEmpty)
      throw new java.util.NoSuchElementException(s"no committed table at $root")
    // VACUUM prunes with the table's own horizon unless overridden —
    // the raw -1 sentinel must never reach the splitAt arithmetic
    val retainEff =
      if (retain >= 0) retain
      else liveProps(fs, r).get(PropRetain).flatMap(_.toIntOption)
        .filter(_ >= 0).getOrElse(1)
    val (pruned, swept) = pruneRetention(fs, r, retainEff, dryRun)
    val live = committedVersions(fs, r)
      .flatMap(v => manifestDirs(fs, r, v)).toSet
    val cutoff = System.currentTimeMillis() - staleStagedMs
    val aged = Seq.newBuilder[String]
    fs.listStatus(r).foreach { st =>
      val n = st.getPath.getName
      val abandoned =
        (st.isDirectory && n.startsWith("z") && !live.contains(n)) ||
          (st.isFile && n.startsWith("_commit_") && n.endsWith(".tmp"))
      if (abandoned && st.getModificationTime < cutoff) {
        if (!dryRun) fs.delete(st.getPath, true)
        aged += n
      }
    }
    (pruned, swept ++ aged.result())
  }

  /** Replace the table at `root` with `df`, committing via one atomic
    * manifest publish — no reader-visible gap at any crash point (see
    * protocol above). Optimistically concurrent: the batch stages
    * under a writer-unique dir, so concurrent writers never touch
    * each other's data; losing the version slot to ANY concurrent
    * commit is a refusal (`ConcurrentModificationException`) — an
    * overwrite replaces a snapshot its caller derived against, so
    * the caller must re-derive and retry, Delta's rule. Returns the
    * committed version. */
  def commitOverwrite(df0: org.apache.spark.sql.DataFrame, root: String,
      retain: Int = -1, rowCount: Option[Long] = None,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None,
      generatedColumns: Map[String, String] = Map.empty,
      identity: Option[String] = None): Long = {
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    val spark = df0.sparkSession
    val fs = fsFor(spark, root)
    val r = new Path(root)
    // IDENTITY: materialize FIRST (a generated/partition column may
    // derive from the key). An establishing batch may SEED the
    // sequence with its own unique values; afterwards the column is
    // GENERATED ALWAYS — batches omit it, the allocator owns it.
    val effIdCol = effectiveIdentityCol(fs, r, identity)
    val prevHwm = committedVersions(fs, r).lastOption
      .flatMap(v => manifestIdentity(fs, r, v)).map(_._2)
    val effGen0 = effectiveGenParts(fs, r, generatedColumns)
    // SQL INSERT OVERWRITE pads unnamed columns with NULL: an
    // all-NULL identity/generated copy means omitted (see
    // dropAllNullSpecials) — only an ESTABLISHING seed carries real
    // identity values past this point
    val dfPre = dropAllNullSpecials(df0, effGen0,
      effIdCol.map(c => (c, prevHwm.getOrElse(1L))))
    val (dfId, idNext): (org.apache.spark.sql.DataFrame, Option[Long]) =
      effIdCol match {
        case None => (dfPre, None)
        case Some(c) if dfPre.columns.contains(c) =>
          require(prevHwm.isEmpty,
            s"identity column '$c' is GENERATED ALWAYS — the batch must " +
              "omit it (an explicit value could collide with the allocator); " +
              "only the ESTABLISHING commit may seed existing keys")
          import org.apache.spark.sql.functions.{count, countDistinct, lit, max => fmax}
          val a = dfPre.agg(count(lit(1)), count(org.apache.spark.sql.functions.col(c)),
            countDistinct(org.apache.spark.sql.functions.col(c)),
            fmax(org.apache.spark.sql.functions.col(c).cast("long"))).collect().head
          require(a.getLong(0) == a.getLong(1) && a.getLong(1) == a.getLong(2),
            s"seeding identity column '$c' requires unique non-NULL values " +
              s"(${a.getLong(0)} rows, ${a.getLong(1)} non-null, " +
              s"${a.getLong(2)} distinct)")
          (dfPre, Some(if (a.isNullAt(3)) 1L else a.getLong(3) + 1L))
        case Some(c) =>
          val start = prevHwm.getOrElse(1L)
          val n = dfPre.count()
          (materializeIdentity(dfPre, c, start), Some(start + n))
      }
    val effGen = effGen0
    // the evaluation zone is pinned at ESTABLISHMENT — later commits
    // inherit it (a different writer session must not re-date it)
    val genTzEst =
      if (generatedColumns.nonEmpty && committedVersions(fs, r).lastOption
          .forall(v => manifestGenParts(fs, r, v).isEmpty))
        Some(spark.sessionState.conf.sessionLocalTimeZone)
      else None
    val df = materializeGenerated(dfId, effGen)
    // user column args name LOGICAL columns; the property lines (and
    // stageBatch's view of the batch) are physical. An overwrite keeps
    // the surviving columns' physical names (its fresh files must
    // agree with the inherited property lines) and drops map entries
    // whose logical column the new schema no longer carries.
    val liveMap = liveColMap(fs, r)
    val retired0 =
      committedVersions(fs, r).lastOption.map(v => manifestRetired(fs, r, v))
        .getOrElse(Nil)
    val effStats = effectiveStatsCols(fs, r, colsToPhysical(statsCols, liveMap))
    val effBloom = effectiveBloomCols(fs, r, colsToPhysical(bloomCols, liveMap))
    val effPart = effectivePartCols(fs, r, colsToPhysical(partitionBy, liveMap))
    val effBucket = effectiveBucketBy(fs, r,
      bucketBy.map { case (n, cs) => (n, colsToPhysical(cs, liveMap)) })
    // CHECK constraints gate every row-introducing commit: one
    // aggregate job over the batch, BEFORE anything stages
    validateChecks(fs, r, df, "overwrite", effGen)
    val allocV = committedVersions(fs, r).maxOption.map(_ + 1).getOrElse(0L)
    val newMap = allocPhysical(df.schema,
      liveMap.filter { case (l, _) => df.columns.contains(l) },
      retired0, allocV)
    // data first, completely, under dirs no other writer contests
    // (one per partition-value tuple when the table is partitioned)
    val (staged, stats, blooms, parts) =
      stageBatch(spark, fs, r, df, effStats, effBloom, effPart,
        bucketBy = effBucket, colMap = newMap)
    // allocate past EVERY committed marker, not just the live one: a
    // defensively-ignored manifest (data dirs lost) still owns its
    // number, and publishing onto it would conflict forever. An
    // overwrite REPLACES the table — it carries no prior-snapshot
    // state — so (unlike the pinSlot commits) a freshest-marker
    // allocation loses nothing to an interleaved commit it supersedes.
    val next = committedVersions(fs, r).maxOption.map(_ + 1).getOrElse(0L)
    if (!commitManifest(fs, r, next, staged, retain, Some(df.schema),
        rowCount, stats, effStats, newBlooms = blooms, bloomCols = effBloom,
        newParts = parts, partCols = effPart, bucketBy = effBucket,
        colMap = Some(newMap),
        genParts = Some(effGen), genTz = genTzEst,
        identity = effIdCol.map(c => Some((c, idNext.getOrElse(1L)))),
        op = "overwrite")) {
      staged.foreach(d => fs.delete(new Path(r, d), true))
      throw new java.util.ConcurrentModificationException(
        s"overwrite of $root lost version $next to a concurrent commit — " +
          "an overwrite replaces the snapshot its caller derived against; " +
          "re-derive against the current table and retry")
    }
    next
  }

  /** Append `df` to the table at `root` WITHOUT rewriting it: the new
    * snapshot = the previous snapshot's dirs + one new O(batch) dir.
    * This is the lake form of the K1 append sink — at 100 TB the
    * nightly load writes only its batch, and readers still swap
    * snapshots atomically. First commit on an empty root bootstraps
    * the table.
    *
    * Optimistically concurrent (Delta's blind-append rule): the batch
    * writes ONCE to a writer-unique staged dir; each commit attempt
    * only builds a manifest, so losing the version slot costs a
    * manifest read, never a re-run of the job. A loser REBASES on the
    * new live snapshot and retries as long as every intervening
    * commit was itself append-shaped — N interleaved appenders all
    * commit, serialized, no lost dirs. An intervening commit that
    * REMOVED dirs (overwrite/merge/delete/compact) changed rows this
    * append never saw: refused with `ConcurrentModificationException`
    * rather than guessed (re-derive the batch and retry).
    * Returns the committed version. */
  def commitAppend(df0: org.apache.spark.sql.DataFrame, root: String,
      retain: Int = -1, rowCount: Option[Long] = None,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      op: String = "append", partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, Seq[String])] = None,
      generatedColumns: Map[String, String] = Map.empty,
      ingested: Option[Seq[String]] = None,
      requireBase: Option[Long] = None): Long = {
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    require(!op.contains("\n"), "op must be a single manifest line")
    val spark = df0.sparkSession
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val effGen = effectiveGenParts(fs, r, generatedColumns)
    val genTzEst =
      if (generatedColumns.nonEmpty && committedVersions(fs, r).lastOption
          .forall(v => manifestGenParts(fs, r, v).isEmpty))
        Some(spark.sessionState.conf.sessionLocalTimeZone)
      else None
    // IDENTITY: a declared table allocates [mark, mark + n) here and
    // advances the mark in the SAME manifest write; the batch must
    // omit the column (GENERATED ALWAYS)
    val effId = committedVersions(fs, r).lastOption
      .flatMap(v => manifestIdentity(fs, r, v))
    // SQL `INSERT INTO t (named, cols)` pads every unnamed column
    // with NULL — an all-NULL identity/generated column therefore
    // means OMITTED (recompute/allocate, Delta's rule), while any
    // non-NULL identity value refuses (GENERATED ALWAYS). One probe
    // job covers all such columns the batch carries.
    val dfDropped = dropAllNullSpecials(df0, effGen, effId)
    effId.foreach { case (c, _) =>
      require(!dfDropped.columns.contains(c),
        s"identity column '$c' is GENERATED ALWAYS — the append batch " +
          "must omit it (keys allocate atomically at commit)")
    }
    val dfIn = dfDropped
    var idStart: Long = effId.map(_._2).getOrElse(0L)
    val idN: Long = if (effId.isDefined) dfIn.count() else 0L
    def withIds(start: Long): org.apache.spark.sql.DataFrame = effId match {
      case Some((c, _)) =>
        materializeGenerated(materializeIdentity(dfIn, c, start), effGen)
      case None => materializeGenerated(dfIn, effGen)
    }
    val df = withIds(idStart)
    // user column args name LOGICAL columns; property lines are
    // physical — and a batch adding NEW columns allocates them
    // physical names that can never collide with a mapped or retired
    // one (a re-add after rename/drop must not read old bytes)
    val liveMap = liveColMap(fs, r)
    val retired0 =
      committedVersions(fs, r).lastOption.map(v => manifestRetired(fs, r, v))
        .getOrElse(Nil)
    val newMap = allocPhysical(df.schema, liveMap, retired0,
      committedVersions(fs, r).maxOption.map(_ + 1).getOrElse(0L))
    val effStats = effectiveStatsCols(fs, r, colsToPhysical(statsCols, newMap))
    val effBloom = effectiveBloomCols(fs, r, colsToPhysical(bloomCols, newMap))
    // a partitioned table's layout is a TABLE property: appends
    // inherit it and stage one dir per partition-value tuple
    val effPart = effectivePartCols(fs, r, colsToPhysical(partitionBy, newMap))
    // the bucket layout is a table property too: appends inherit it
    // and stage through the bucketed writer. A NEW declaration on an
    // append to an existing UNBUCKETED table refuses: earlier dirs
    // lack the bucket file naming, so the declared layout would lie
    // to every bucketed scan — declare bucketBy on the table's first
    // commit, or re-layout the whole snapshot with commitOverwrite
    if (bucketBy.isDefined && committedVersions(fs, r).nonEmpty)
      require(committedVersions(fs, r).lastOption
          .flatMap(v => manifestBucketBy(fs, r, v)).isDefined,
        s"an append cannot declare a bucket layout on the existing " +
          s"unbucketed table at $root — earlier dirs lack bucket file " +
          "naming; re-layout with commitOverwrite(bucketBy = …)")
    val effBucket = effectiveBucketBy(fs, r,
      bucketBy.map { case (n, cs) => (n, colsToPhysical(cs, newMap)) })
    validateChecks(fs, r, df, "append", effGen)
    // O(batch): stats only for the new dirs; reused dirs' lines carry
    var (staged, stats, blooms, parts) =
      stageBatch(spark, fs, r, df, effStats, effBloom, effPart,
        bucketBy = effBucket, colMap = newMap)
    def dropStaged(): Unit = staged.foreach(d => fs.delete(new Path(r, d), true))
    // the snapshot this append staged against; every retry re-checks
    // that the commits landing after it were all append-shaped
    val base = committedVersions(fs, r).maxOption.getOrElse(-1L)
    var attempt = 0
    while (true) {
      attempt += 1
      val committed = committedVersions(fs, r)
      // ledger-carrying commits (COPY INTO) must extend EXACTLY the
      // snapshot whose ledger they read: any interleaved commit means
      // the merged `ingested` list may be stale, so refuse loudly and
      // let the re-run re-read it (idempotence skips the loaded files)
      requireBase.foreach { b =>
        if (committed.lastOption != Some(b)) {
          dropStaged()
          throw new java.util.ConcurrentModificationException(
            s"COPY INTO $root raced a concurrent commit past its base " +
              s"v$b — re-run; files the winner already recorded will " +
              "be skipped")
        }
      }
      if (base >= 0 && !committed.contains(base)) {
        dropStaged()
        throw new java.util.ConcurrentModificationException(
          s"append to $root: the base version $base this append staged " +
            "against was retention-pruned during the commit race — the " +
            "append-only interleaving cannot be proven; re-derive and retry " +
            "(or commit with a larger `retain`)")
      }
      // rebase validation: every commit that landed since `base` must
      // itself be append-shaped (dirs only added) for a blind rebase
      // to be sound. A concurrent winner's pruneRetention can delete a
      // manifest between the committedVersions listing above and these
      // per-version reads (TOCTOU) — that race IS the retention-pruned
      // case, so it gets the same refusal, not a raw FileNotFound.
      try {
        (base +: committed.filter(_ > base)).filter(_ >= 0)
          .sliding(2).foreach {
            case Seq(a, b) =>
              val removed = manifestDirs(fs, r, a).toSet -- manifestDirs(fs, r, b)
              // a ROW-PRESERVING layout commit (compaction / z-order /
              // REORG purge) removes dirs without changing contents:
              // the snapshot this batch was derived against is
              // semantically intact, so the blind rebase stays sound —
              // appends compose with the standing OPTIMIZE cadence
              // (Delta's rule) instead of failing for it. Anything
              // else that removed dirs (overwrite/merge/delete/
              // restore) changed ROWS this append may have derived
              // from: refuse.
              lazy val rowPreserving = manifestOp(fs, r, b).exists(o =>
                o.startsWith("compact") || o.startsWith("zorder") ||
                  o.startsWith("reorg"))
              if (removed.nonEmpty && !rowPreserving) {
                dropStaged()
                throw new java.util.ConcurrentModificationException(
                  s"append to $root: concurrent commit v$b removed dirs " +
                    s"${removed.toSeq.sorted.mkString(", ")} " +
                    "(overwrite/merge/delete/restore) while this append " +
                    "was staging — a blind-append rebase is only sound " +
                    "across appends and row-preserving maintenance; " +
                    "re-derive the batch against the current snapshot " +
                    "and retry")
              }
            case _ => // single element: nothing landed since base
          }
      } catch {
        case _: java.io.FileNotFoundException =>
          dropStaged()
          throw new java.util.ConcurrentModificationException(
            s"append to $root: a manifest in the rebase window was " +
              "retention-pruned by a concurrent commit mid-validation — " +
              "the append-only interleaving cannot be proven; re-derive " +
              "and retry (or commit with a larger `retain`)")
      }
      val cur = committed.lastOption
      // column-map rebase: this batch's file names froze under the map
      // read at staging time. A concurrent append that merely ADDED
      // entries merges; a concurrent rename/drop that moved a name
      // this batch staged under — or retired/claimed a physical name
      // this batch allocated — refuses (the staged bytes would lie).
      val curMap = cur.map(v => manifestColMap(fs, r, v)).getOrElse(Map.empty)
      val curRetired = cur.map(v => manifestRetired(fs, r, v)).getOrElse(Nil)
      val ourNew = newMap -- liveMap.keys
      val mergedMap = curMap ++ ourNew
      // every staged column's PHYSICAL name — including identity-
      // mapped ones — must still be OURS under the concurrent
      // snapshot: a first-ever rename of an identity column claims
      // our physical name for a DIFFERENT logical column (mergeSchemas
      // would re-add the old logical name over the same bytes), and a
      // first-ever drop retires it (a commit would resurrect the
      // dropped column's bytes). Both were invisible to the ourNew
      // checks alone because identity names never appear in the map.
      val stagedPhys = df.columns.toSeq.map(c => c -> physName(newMap, c))
      if (df.columns.exists(c => physName(mergedMap, c) != physName(newMap, c)) ||
          stagedPhys.exists { case (_, pc) => curRetired.contains(pc) } ||
          stagedPhys.exists { case (lc, pc) =>
            curMap.exists { case (clc, cpc) => cpc == pc && clc != lc } } ||
          ourNew.exists { case (lc, pc) => curMap.get(lc).exists(_ != pc) } ||
          ourNew.values.toSet.intersect(
            (curMap -- newMap.keys).values.toSet).nonEmpty) {
        dropStaged()
        throw new java.util.ConcurrentModificationException(
          s"append to $root: a concurrent commit changed the column " +
            "mapping while this append was staging — re-derive the batch " +
            "against the current table and retry")
      }
      // IDENTITY rebase: a concurrent allocator advanced the mark
      // past the block this batch staged under — the staged ids would
      // collide, so RE-STAGE the same rows under the new block (only
      // the key column moves; this is what makes concurrent appends
      // to an identity table allocate disjoint ranges instead of
      // refusing)
      val curMark = cur.flatMap(v => manifestIdentity(fs, r, v)).map(_._2)
      if (effId.isDefined && curMark.exists(_ != idStart)) {
        dropStaged()
        idStart = curMark.get
        val restaged = stageBatch(spark, fs, r, withIds(idStart),
          effStats, effBloom, effPart, bucketBy = effBucket, colMap = newMap)
        staged = restaged._1; stats = restaged._2
        blooms = restaged._3; parts = restaged._4
      }
      // number allocation vs committedVersions (see commitOverwrite);
      // the snapshot to extend is the LIVE one
      val next = cur.map(_ + 1).getOrElse(0L)
      val prevDirs = cur.map(v => manifestDirs(fs, r, v)).getOrElse(Nil)
      // the committed schema evolves by MERGE (add-nullable-column;
      // type changes refused — see mergeSchemas). A legacy manifest
      // without a schema line infers its schema once here, so its
      // first post-upgrade append migrates the table to
      // carried-schema reads.
      val prevSchema = cur.flatMap(v => manifestSchema(fs, r, v))
        .orElse(cur.map(v => spark.read.parquet(
          manifestDirs(fs, r, v).map(d => new Path(r, d).toString): _*).schema))
      val schema = prevSchema.map(mergeSchemas(_, df.schema)).getOrElse(df.schema)
      // the appended snapshot's count = previous + batch, when the
      // caller supplied the batch count AND the chain carried one
      // (bootstrap: the batch count alone)
      val rows = rowCount.flatMap { n =>
        cur match {
          case Some(v) => manifestRows(fs, r, v).map(_ + n)
          case None    => Some(n)
        }
      }
      if (commitManifest(fs, r, next, prevDirs ++ staged, retain, Some(schema),
          rows, stats, effStats, newBlooms = blooms, bloomCols = effBloom,
          newParts = parts, partCols = effPart,
          colMap = Some(mergedMap),
          genParts = Some(effGen), genTz = genTzEst,
          identity = effId.map { case (c, _) => Some((c, idStart + idN)) },
          ingested = ingested,
          op = op))
        return next
      // lost the slot: a concurrent writer committed `next` first.
      // Loop — the next pass validates what landed and rebases.
      if (attempt >= 100) {
        dropStaged()
        throw new java.util.ConcurrentModificationException(
          s"append to $root lost $attempt consecutive commit races — " +
            "pathological contention; back off and retry")
      }
    }
    -1L // unreachable
  }

  /** Distinct PARENT-DIR names behind a probe's `__file` column,
    * aggregated EXECUTOR-side before the collect: the driver sees
    * O(dirs), never O(files), so an uncompacted million-file snapshot
    * probes at dir scale. `input_file_name` yields a URI-ish path
    * whose last two segments are `<dir>/<file>`. */
  private[graft] def probeDirNames(
      withFile: org.apache.spark.sql.DataFrame): Set[String] = {
    import org.apache.spark.sql.functions.{col, substring_index}
    withFile
      .select(substring_index(substring_index(
        col("__file"), "/", -2), "/", 1).as("__dir"))
      .distinct().collect().map(_.getString(0)).toSet
  }

  /** Per-row MERGE INTO a committed table — the copy-on-write form of
    * [[graft.operators.Cdc.applyChanges]] (q99's oracle-checked
    * semantics), closing the reference's row-level DELETE/update gap
    * (/root/reference/dags/Main.py:44-47) at lake scale. Instead of
    * rewriting the whole table, the merge PROBES which snapshot dirs
    * actually hold touched keys (one map-only broadcast semi-join
    * over the base with `input_file_name` — the "find touched files"
    * pass every lakehouse MERGE runs) and rewrites ONLY those:
    *
    *   new snapshot = untouched dirs, REUSED BY REFERENCE
    *               + one new dir holding (touched dirs' surviving
    *                 rows) ∪ (the batch's winning upserts)
    *
    * At 100 TB under hourly append commits, a CDC batch touching
    * recent keys rewrites O(touched dirs), not the table; a
    * pure-insert batch touches nothing and degenerates to the
    * O(batch) append shape. Commit is the same one atomic manifest
    * rename — readers never see a half-merged table, retention keeps
    * the pre-merge snapshot for in-flight readers/time travel, and a
    * crash before the rename leaves only an orphan dir the retry
    * overwrites.
    *
    * `changes` = base schema + `deleteCol`; `guardVersions` as in
    * [[graft.operators.Cdc.applyChanges]]. Returns the committed
    * version (unchanged when the batch has no effective winners). */
  def mergeCommitted(spark: SparkSession, root: String,
      changes: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      versionCol: String, deleteCol: String,
      guardVersions: Boolean = false, retain: Int = -1,
      allowSchemaEvolution: Boolean = false,
      dvMaxRows: Long = -1L): Long = {
    import org.apache.spark.sql.functions._
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root — bootstrap with commitOverwrite/commitAppend"))
    val snapDirs = manifestDirs(fs, r, cur)
    // slot pinned before the probe/hits/staging jobs run (the COW
    // invariant, shared by the DV fast path): a concurrent commit
    // landing during those jobs takes this number and our publish —
    // which would otherwise republish the stale snapDirs over the
    // interloper's dirs and vectors — fails loudly instead
    val next = pinSlot(fs, r, cur)
    afterSlotPin()
    val dvEff = effDvMaxRows(fs, r, dvMaxRows)
    val base = readCommittedAt(spark, root, cur)
    val latest = graft.operators.Cdc.lastChanges(
      base, changes, keyCols, versionCol, deleteCol, guardVersions).persist()
    try {
      if (latest.isEmpty) return cur
      val touchedKeys = broadcast(latest.select(keyCols.map(col): _*))
      // one map-only probe: which files (→ dirs) hold touched keys.
      // Aggregated to dir granularity executor-side, so the collected
      // set is bounded by the snapshot's DIR count — an uncompacted
      // million-file table still probes at dir scale.
      val touchedDirNames: Set[String] = probeDirNames(base
        .withColumn("__file", input_file_name())
        .join(touchedKeys, keyCols, "left_semi")
        .select(col("__file")))
      val untouched = snapDirs.filterNot(touchedDirNames)
      val touchedDirs = snapDirs.filter(touchedDirNames)
      // no stored rows touched and nothing to insert → the table is
      // unchanged; skip the commit entirely. This is what makes a
      // crash-REPLAYED guarded batch version-stable: its upserts are
      // stale (guard-rejected) and its deletes find their keys
      // already gone (a delete of an absent key reaches here).
      if (touchedDirs.isEmpty &&
          latest.where(!coalesce(col(deleteCol), lit(false))).isEmpty)
        return cur
      val carried = manifestSchema(fs, r, cur)
      val touchedBase =
        if (touchedDirs.isEmpty) base.limit(0)
        // DV-aware: the rewrite materializes any existing vector
        else readDirsWithDv(spark, fs, r, cur, touchedDirs, carried)
      val upserts = latest.where(!coalesce(col(deleteCol), lit(false)))
        .drop(deleteCol)
      // CDC SCHEMA DRIFT (Delta's merge autoMerge, opt-in): a batch
      // carrying columns the table lacks evolves the committed schema
      // by the SAME rule appends use — add-nullable + lossless
      // widening, lossy changes refused loudly. Untouched dirs carry
      // by reference and read NULL-backfilled under the carried
      // schema, exactly like an evolving append. Without the opt-in a
      // drifted batch refuses (unionByName names the columns).
      val baseSchema = carried.getOrElse(touchedBase.schema)
      val evolved =
        if (allowSchemaEvolution) mergeSchemas(baseSchema, upserts.schema)
        else baseSchema
      def aligned(df: org.apache.spark.sql.DataFrame) =
        df.select(evolved.fields.toSeq.map(f =>
          (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)): _*)
      // MERGE-ON-READ fast path (deletion vectors): when the matched
      // base-row count stays under the bound, the touched dirs are NOT
      // rewritten — matched rows soft-delete via `#dv_` position lines
      // and the batch's winners append as one O(batch) dir. A CDC
      // batch touching one row per hot dir costs a small append + a
      // manifest write instead of rewriting every hot dir — the
      // at-scale shape of the continuous-upsert workload. Over-bound
      // (or dvMaxRows = 0) falls through to the dir rewrite.
      if (dvEff > 0 && touchedDirs.nonEmpty) {
        val prevDvs = manifestDvsRaw(fs, r, cur)
        // metadata columns do not survive a join — materialize first
        val hits = readDirsWithDv(spark, fs, r, cur, touchedDirs, carried)
          .withColumn("__dv_key",
            substring_index(col("_metadata.file_path"), "/", -2))
          .withColumn("__dv_pos", col("_metadata.row_index"))
          .join(touchedKeys, keyCols, "left_semi")
          .select(col("__dv_key"), col("__dv_pos"))
          .limit(dvEff.toInt + 1).collect()
        if (hits.length <= dvEff) {
          val bySeg = touchedDirs.map(d => new Path(d).getName -> d).toMap
          val fresh: Map[String, String] = hits.toSeq
            .map(h => (h.getString(0), h.getLong(1)))
            .groupBy { case (k, _) => bySeg(k.takeWhile(_ != '/')) }
            .map { case (dir, entries) =>
              val prev = prevDvs.get(dir).map(parseDvJson)
                .getOrElse(Map.empty[String, Array[Long]])
              val merged = entries.foldLeft(
                prev.view.mapValues(_.toSet).toMap) { case (acc, (k, pos)) =>
                val f = k.drop(k.indexOf('/') + 1)
                acc + (f -> (acc.getOrElse(f, Set.empty[Long]) + pos))
              }
              dir -> dvJson(merged.view.mapValues(_.toSeq.sorted).toMap)
            }
          // strict mode keeps the COW contract: a drifted batch
          // refuses by name instead of aligned() silently dropping it
          if (!allowSchemaEvolution) {
            val drift = upserts.columns.toSet
              .diff(baseSchema.fieldNames.toSet) ++
              baseSchema.fieldNames.toSet.diff(upserts.columns.toSet)
            require(drift.isEmpty,
              s"merge batch schema differs from the table on " +
                drift.toSeq.sorted.mkString("[", ", ", "]") +
                " — pass allowSchemaEvolution = true to evolve")
          }
          val winners = aligned(upserts)
          val effStats = effectiveStatsCols(fs, r, Nil)
          val effBloom = effectiveBloomCols(fs, r, Nil)
          val stageMap = allocPhysical(evolved, manifestColMap(fs, r, cur),
            manifestRetired(fs, r, cur), next)
          // a pure-delete batch appends nothing — only vectors commit
          val (newDirs, stats, blooms, parts) =
            if (winners.isEmpty)
              (Nil, Map.empty[String, String], Map.empty[String, String],
                Map.empty[String, String])
            else {
              validateChecks(fs, r, winners, "merge")
              stageBatch(spark, fs, r, winners, effStats, effBloom,
                manifestPartCols(fs, r, cur),
                bucketBy = manifestBucketBy(fs, r, cur), colMap = stageMap)
            }
          if (!commitManifest(fs, r, next, snapDirs ++ newDirs, retain,
              Some(evolved), None, stats, effStats,
              newBlooms = blooms, bloomCols = effBloom,
              newParts = parts, newDvs = fresh,
              colMap = Some(stageMap), op = "merge")) {
            newDirs.foreach(d => fs.delete(new Path(r, d), true))
            throw new java.util.ConcurrentModificationException(
              s"merge into $root lost version $next to a concurrent " +
                "commit — the merge read a snapshot that is no longer " +
                "live; re-run against the current table (maintenance " +
                "commits are one-writer-at-a-time, Delta's OPTIMIZE " +
                "conflict rule)")
          }
          return next
        }
        // over the bound: fall through to the dir rewrite
      }
      // the applyChanges fold, scoped to the touched dirs' rows
      val rewritten =
        if (allowSchemaEvolution)
          aligned(touchedBase.join(touchedKeys, keyCols, "left_anti"))
            .unionByName(aligned(upserts))
        else touchedBase
          .join(touchedKeys, keyCols, "left_anti")
          .unionByName(upserts)
      // the slot was pinned at entry, BEFORE the probe and the
      // rewrite: a concurrent commit landing during any of those jobs
      // takes the pinned number and our publish must then lose
      // (computing `next` later would let us publish a dirs list that
      // silently drops the interloper's data)
      val effStats = effectiveStatsCols(fs, r, Nil)
      // the rewrite stages under writer-unique dirs like every other
      // data write (one per partition tuple on a partitioned table —
      // COW maintenance preserves the declared layout): concurrent
      // writers never contest them, the version slot is claimed by the
      // manifest publish alone
      val effBloom = effectiveBloomCols(fs, r, Nil)
      val effPart = manifestPartCols(fs, r, cur)
      val effBucket = manifestBucketBy(fs, r, cur)
      validateChecks(fs, r, rewritten, "merge")
      // evolution may introduce columns whose names collide with a
      // mapped or retired physical name — allocate like appends do
      val stageMap = allocPhysical(evolved, manifestColMap(fs, r, cur),
        manifestRetired(fs, r, cur), next)
      val (newDirs, stats, blooms, parts) =
        stageBatch(spark, fs, r, rewritten, effStats, effBloom, effPart,
          maintenance = true, bucketBy = effBucket,
          colMap = stageMap)
      // replaced dirs may hold streaming-fold replay markers — carry
      // them into the replacement before the commit makes it live
      preserveMarkers(fs, r, touchedDirs, newDirs)
      if (!commitManifest(fs, r, next, untouched ++ newDirs, retain,
          Some(evolved), None, stats, effStats,
          newBlooms = blooms, bloomCols = effBloom,
          newParts = parts, colMap = Some(stageMap), op = "merge")) {
        newDirs.foreach(d => fs.delete(new Path(r, d), true))
        throw new java.util.ConcurrentModificationException(
          s"merge into $root lost version $next to a concurrent commit — " +
            "the merge read a snapshot that is no longer live; re-run " +
            "against the current table (maintenance commits are " +
            "one-writer-at-a-time, Delta's OPTIMIZE conflict rule)")
      }
      next
    } finally { latest.unpersist(); () }
  }

  /** Predicate DELETE on a committed table — `DELETE FROM t WHERE p`
    * as a copy-on-write commit, the set-based dual of the key-based
    * [[mergeCommitted]] (together they close the reference's row-level
    * DELETE gap, /root/reference/dags/Main.py:44-47, at lake scale).
    * Deletes rows where `predicate` is TRUE; NULL evaluates keep
    * (standard SQL DELETE semantics). Snapshot dirs classify
    * three ways off the manifest stats ALONE — no data is read to
    * decide:
    *
    *   - NO row can match ([[predExcludes]] on some conjunct)
    *     -> dir reused by reference, zero I/O;
    *   - EVERY row provably matches -> dir simply OMITTED from the
    *     new snapshot: a METADATA-ONLY partition drop. Needs the full
    *     proof chain: the predicate tree fully understood
    *     ([[extractPredsExact]]), every conjunct's range test
    *     ([[predIncludesAll]]), and the committed schema marking each
    *     predicate column non-nullable (min/max ranges ignore NULLs,
    *     and a NULL row must SURVIVE a delete — so a possibly-NULL
    *     column forfeits the drop and rewrites instead);
    *   - anything else -> rewritten with the full `!p` filter into one
    *     new dir.
    *
    * At 100 TB on a time-ordered append table, `DELETE WHERE ts <
    * retention_cutoff` is pure manifest surgery — the common
    * retention-expiry delete costs zero data I/O. Commit is the same
    * atomic manifest rename; retention keeps the pre-delete snapshot
    * for in-flight readers/time travel; the change feed derives the
    * deletes from the dir diff as usual. Streaming-fold replay markers
    * in replaced/dropped dirs are carried forward. Row count is not
    * carried (the drop path never counts what it drops); the
    * metadata-count chain resumes at the next counted commit. Returns
    * the committed version (unchanged when nothing can match). */
  /** @param dvMaxRows soft-delete bound (deletion vectors): when no
    *   whole-dir drop is in play and at most this many rows match, the
    *   delete commits `#dv_` position lines against the UNCHANGED dirs
    *   (merge-on-read) instead of rewriting them — the CDC-delete
    *   shape that at 100 TB turns per-batch dir-sized write
    *   amplification into a manifest line. Above the bound (or 0 to
    *   disable) the delete is the copy-on-write rewrite as before;
    *   compaction / z-order / any later rewrite of a DV'd dir
    *   materializes its vector away. */
  def deleteWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column, retain: Int = -1,
      dvMaxRows: Long = -1L): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val snapDirs = manifestDirs(fs, r, cur)
    // the slot is pinned HERE, before the classify/hits/staging jobs
    // run: a concurrent commit landing during those jobs takes this
    // number and our publish then fails loudly instead of silently
    // republishing the stale snapDirs over the interloper's commit
    // (lost update) — the COW invariant, shared by the DV fast path
    val next = pinSlot(fs, r, cur)
    afterSlotPin()
    val dvEff = effDvMaxRows(fs, r, dvMaxRows)
    val stats = manifestStatsRaw(fs, r, cur)
    val carried = manifestSchema(fs, r, cur)
    // user predicates name LOGICAL columns; per-dir lines are physical
    val cmap = manifestColMap(fs, r, cur)
    val (preds0, exact) = extractPredsExact(
      org.apache.spark.sql.graft.Shim.catalystTree(predicate))
    // generated-column derivation: the derived conjuncts are IMPLIED
    // by the originals, so both the Keep and the whole-dir Drop proofs
    // stay exact with them added
    val preds = predsToPhysical(
      preds0 ++ deriveGenPreds(spark, fs, r, cur, preds0), cmap)
    // the NULL gate for the metadata-only drop: every predicate column
    // declared non-nullable by the COMMITTED schema (a dir could
    // otherwise hide NULL rows the ranges don't see)
    val nonNullCols: Set[String] = carried
      .map(_.fields.collect {
        case f if !f.nullable => physName(cmap, f.name) }.toSet)
      .getOrElse(Set.empty)
    val allMatchProvable = exact && preds.nonEmpty &&
      preds.forall(p => nonNullCols.contains(p.col))
    val bloomsRaw = manifestBloomsRaw(fs, r, cur)
    val partsRaw = manifestPartsRaw(fs, r, cur)
    sealed trait C; case object Keep extends C; case object Drop extends C
    case object Rewrite extends C
    def classify(d: String): C = {
      // partition values decide FIRST and exactly: a dir whose tuple
      // fails a conjunct survives untouched, and a dir whose tuple
      // provably satisfies EVERY conjunct (the exact predicate, all on
      // partition columns) is the metadata-only WHOLE-PARTITION DROP —
      // `DELETE WHERE year = 1996` on a year-partitioned fact is
      // manifest surgery, zero data I/O, no nullability gate needed
      // (the tuple IS each row's value)
      val pv = partsRaw.get(d).map(parsePartJson)
      val partKeep = pv.exists(m =>
        preds.exists(p => m.get(p.col).exists(partValueExcludes(_, p))))
      if (partKeep) return Keep
      val partDrop = exact && preds.nonEmpty && pv.exists(m =>
        preds.forall(p => m.get(p.col).exists(partValueIncludesAll(_, p))))
      if (partDrop) return Drop
      // a bloom proving an equality conjunct absent is as good as a
      // range exclusion: no row can match, the dir survives untouched
      lazy val bloomKeep = bloomsRaw.get(d).map(parseBloomJson).exists(bfs =>
        preds.exists(p => bloomExcludes(bfs, p)))
      stats.get(d).map(parseStatsJson) match {
        case Some(st) if preds.exists(p =>
            st.get(p.col).exists { case (lo, hi) => predExcludes(lo, hi, p) }) =>
          Keep
        case Some(st) if allMatchProvable && preds.forall(p =>
            st.get(p.col).exists { case (lo, hi) => predIncludesAll(lo, hi, p) }) =>
          Drop
        case _ if bloomKeep => Keep
        case _ => Rewrite // unstat'd or straddling: read, filter, rewrite
      }
    }
    val byClass = snapDirs.groupBy(classify)
    val kept = byClass.getOrElse(Keep, Nil)
    val dropped = byClass.getOrElse(Drop, Nil)
    val rewrite = byClass.getOrElse(Rewrite, Nil)
    if (dropped.isEmpty && rewrite.isEmpty) return cur // nothing can match
    // MERGE-ON-READ fast path (deletion vectors): no whole-dir drop in
    // play → soft-delete the matching rows as `#dv_` position lines
    // against the UNCHANGED dir set. One metadata-cost commit; the
    // read filter and every rewrite path honor the vector. Falls back
    // to copy-on-write when the hit count exceeds the bound.
    if (rewrite.nonEmpty && dropped.isEmpty && dvEff > 0) {
      import org.apache.spark.sql.functions.{col, substring_index}
      val prevDvs = manifestDvsRaw(fs, r, cur)
      val hits = readDirsWithDv(spark, fs, r, cur, rewrite, carried)
        .where(coalesce(predicate, lit(false)))
        .select(
          substring_index(col("_metadata.file_path"), "/", -2).as("__dv_key"),
          col("_metadata.row_index").as("__dv_pos"))
        .limit(dvEff.toInt + 1).collect()
      if (hits.isEmpty) return cur // no row actually matches
      if (hits.length <= dvEff) {
        val bySeg = rewrite.map(d => new Path(d).getName -> d).toMap
        val fresh: Map[String, String] = hits.toSeq
          .map(h => (h.getString(0), h.getLong(1)))
          .groupBy { case (k, _) => bySeg(k.takeWhile(_ != '/')) }
          .map { case (dir, entries) =>
            val prev = prevDvs.get(dir).map(parseDvJson)
              .getOrElse(Map.empty[String, Array[Long]])
            val merged = entries.foldLeft(
              prev.view.mapValues(_.toSet).toMap) { case (acc, (k, p)) =>
              val f = k.drop(k.indexOf('/') + 1)
              acc + (f -> (acc.getOrElse(f, Set.empty[Long]) + p))
            }
            dir -> dvJson(merged.view.mapValues(_.toSeq.sorted).toMap)
          }
        // positions are NEW deletions (the read pre-filtered existing
        // vectors), so the metadata count stays exact through the chain
        if (!commitManifest(fs, r, next, snapDirs, retain, carried,
            manifestRows(fs, r, cur).map(_ - hits.length),
            newDvs = fresh, op = "delete"))
          throw new java.util.ConcurrentModificationException(
            s"delete on $root lost version $next to a concurrent " +
              "commit — the delete classified a snapshot that is no " +
              "longer live; re-run against the current table")
        return next
      }
      // over the bound: fall through to the copy-on-write rewrite
    }
    val effStats = effectiveStatsCols(fs, r, Nil)
    // a dropped dir may hold streaming-fold replay markers: they must
    // survive the delete or a checkpoint replay double-folds. A
    // rewrite dir gives them a home; a pure-drop commit writes an
    // empty carrier dir only when markers actually exist.
    def hasMarkers(dirs: Seq[String]): Boolean =
      dirs.map(d => new Path(r, d)).filter(fs.exists)
        .exists(d => fs.listStatus(d).exists(_.getPath.getName.startsWith("_applied_")))
    val effBloom = effectiveBloomCols(fs, r, Nil)
    // rewrites PRESERVE the table's declared partition layout: on a
    // partitioned table the surviving rows re-stage one dir per value
    // tuple with fresh #part_ lines, so partition pruning never
    // degrades under COW maintenance
    val effPart = manifestPartCols(fs, r, cur)
    // staged writer-unique dirs (see mergeCommitted): the slot is
    // claimed by the publish, never by the dir names
    val (newDirs, freshStats, freshBlooms, freshParts) =
      if (rewrite.nonEmpty) {
        // DV-aware read: a rewrite MATERIALIZES any existing vector
        // (soft-deleted rows excluded here never reach the new dir)
        val base = readDirsWithDv(spark, fs, r, cur, rewrite, carried)
        val surviving = base.where(!coalesce(predicate, lit(false)))
        val staged = stageBatch(spark, fs, r, surviving, effStats, effBloom, effPart,
          maintenance = true, bucketBy = manifestBucketBy(fs, r, cur),
          colMap = cmap)
        preserveMarkers(fs, r, rewrite ++ dropped, staged._1)
        staged
      } else if (hasMarkers(dropped) || kept.isEmpty) {
        // empty carrier dir: markers need a home, and a zero-dir
        // manifest is unrepresentable (an empty dirs body reads as the
        // body-less back-compat form [v<version>]) — deleting the
        // whole table still commits one readable empty snapshot
        val schema = carried.getOrElse(spark.read.parquet(
          dropped.map(d => new Path(r, d).toString): _*).schema)
        val empty = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        val staged = stageBatch(spark, fs, r, empty, effStats, effBloom, Nil,
          bucketBy = manifestBucketBy(fs, r, cur), colMap = cmap)
        preserveMarkers(fs, r, dropped, staged._1)
        staged
      } else // the metadata-only partition drop: no job at all
        (Nil, Map.empty[String, String], Map.empty[String, String],
          Map.empty[String, String])
    if (!commitManifest(fs, r, next, kept ++ newDirs, retain,
        carried, None, freshStats, effStats,
        newBlooms = freshBlooms, bloomCols = effBloom,
        newParts = freshParts, op = "delete")) {
      newDirs.foreach(d => fs.delete(new Path(r, d), true))
      throw new java.util.ConcurrentModificationException(
        s"delete on $root lost version $next to a concurrent commit — " +
          "the delete classified a snapshot that is no longer live; " +
          "re-run against the current table")
    }
    next
  }

  /** Predicate UPDATE on a committed table — `UPDATE t SET c = expr
    * WHERE p` as a copy-on-write commit. Dirs whose stats prove no row
    * matches are reused by reference; the rest rewrite with
    * `CASE WHEN p THEN expr ELSE c END` per assigned column (NULL
    * predicate keeps the row unchanged, standard SQL). Assignments
    * cast to the column's committed type, so the table schema is
    * invariant; caller contract: an assignment to a column the schema
    * marks non-nullable must not yield NULL (carried-schema reads
    * would lie). Row cardinality is preserved, so the
    * metadata `count(*)` chain carries through. Returns the committed
    * version (unchanged when nothing can match). */
  def updateWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column], retain: Int = -1,
      dvMaxRows: Long = -1L): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    require(set.nonEmpty, "updateWhere needs at least one SET assignment")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val snapDirs = manifestDirs(fs, r, cur)
    // slot pinned before any job runs — see deleteWhere: a concurrent
    // commit during the hits/staging jobs takes this number and our
    // publish fails loudly instead of clobbering it (DV and COW paths
    // share the invariant)
    val next = pinSlot(fs, r, cur)
    afterSlotPin()
    val dvEff = effDvMaxRows(fs, r, dvMaxRows)
    val stats = manifestStatsRaw(fs, r, cur)
    val carried = manifestSchema(fs, r, cur)
    val schema = carried.getOrElse(spark.read.parquet(
      snapDirs.map(d => new Path(r, d).toString): _*).schema)
    set.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"SET column '$c' is not in the table schema " +
        schema.fieldNames.mkString("[", ", ", "]")))
    manifestIdentity(fs, r, cur).foreach { case (idCol, _) =>
      require(!set.contains(idCol),
        s"identity column '$idCol' is GENERATED ALWAYS — UPDATE cannot " +
          "assign it (keys are allocator-owned)")
    }
    // user predicates name LOGICAL columns; per-dir lines are physical
    val cmap = manifestColMap(fs, r, cur)
    val updPreds0 =
      extractPreds(org.apache.spark.sql.graft.Shim.catalystTree(predicate))
    val preds = predsToPhysical(
      updPreds0 ++ deriveGenPreds(spark, fs, r, cur, updPreds0), cmap)
    val bloomsRaw = manifestBloomsRaw(fs, r, cur)
    val partsRaw = manifestPartsRaw(fs, r, cur)
    val (kept, touched) = snapDirs.partition { d =>
      // partition values exclude first (exact, incl. NULL tests)
      val partKeep = partsRaw.get(d).map(parsePartJson).exists(m =>
        preds.exists(p => m.get(p.col).exists(partValueExcludes(_, p))))
      lazy val rangeKeep = stats.get(d).map(parseStatsJson).exists(st =>
        preds.exists(p =>
          st.get(p.col).exists { case (lo, hi) => predExcludes(lo, hi, p) }))
      lazy val bloomKeep = bloomsRaw.get(d).map(parseBloomJson).exists(bfs =>
        preds.exists(p => bloomExcludes(bfs, p)))
      partKeep || rangeKeep || bloomKeep
    }
    if (touched.isEmpty) return cur
    // MERGE-ON-READ fast path (deletion vectors, Delta's DV update):
    // when the hit count stays under the bound, the matched rows
    // soft-delete via `#dv_` position lines against the UNCHANGED dir
    // set and their UPDATED copies append as one O(matched) dir — a
    // sparse UPDATE on a hot 100 TB table costs a small append plus a
    // manifest write, not dir-sized copy-on-write amplification. Two
    // passes read the predicate, so a nondeterministic one falls back
    // to the single-pass COW rewrite. The change feed needs no special
    // case: the key join pairs each killed row with its appended copy
    // into update_preimage/update_postimage.
    val deterministic = scala.util.Try(
      org.apache.spark.sql.graft.Shim.catalystTree(predicate).deterministic)
      .getOrElse(false)
    if (dvEff > 0 && deterministic) {
      import org.apache.spark.sql.functions.substring_index
      val prevDvs = manifestDvsRaw(fs, r, cur)
      val hits = readDirsWithDv(spark, fs, r, cur, touched, carried)
        .where(coalesce(predicate, lit(false)))
        .select(
          substring_index(col("_metadata.file_path"), "/", -2).as("__dv_key"),
          col("_metadata.row_index").as("__dv_pos"))
        .limit(dvEff.toInt + 1).collect()
      if (hits.isEmpty) return cur // no row actually matches
      if (hits.length <= dvEff) {
        val bySeg = touched.map(d => new Path(d).getName -> d).toMap
        val fresh: Map[String, String] = hits.toSeq
          .map(h => (h.getString(0), h.getLong(1)))
          .groupBy { case (k, _) => bySeg(k.takeWhile(_ != '/')) }
          .map { case (dir, entries) =>
            val prev = prevDvs.get(dir).map(parseDvJson)
              .getOrElse(Map.empty[String, Array[Long]])
            val merged = entries.foldLeft(
              prev.view.mapValues(_.toSet).toMap) { case (acc, (k, pos)) =>
              val f = k.drop(k.indexOf('/') + 1)
              acc + (f -> (acc.getOrElse(f, Set.empty[Long]) + pos))
            }
            dir -> dvJson(merged.view.mapValues(_.toSeq.sorted).toMap)
          }
        // the updated COPIES of the matched rows, computed
        // distributively and staged as one O(matched) dir (layout- and
        // bucket-preserving, like every staged write)
        val copies0 = readDirsWithDv(spark, fs, r, cur, touched, carried)
          .where(coalesce(predicate, lit(false)))
        val copies = set.foldLeft(copies0) { case (df, (c, expr)) =>
          df.withColumn(c, expr.cast(
            org.apache.spark.sql.graft.Shim.asNullableType(schema(c).dataType)))
        }
        validateChecks(fs, r, copies, "update")
        val effStatsDv = effectiveStatsCols(fs, r, Nil)
        val effBloomDv = effectiveBloomCols(fs, r, Nil)
        val (newDirs, freshStats, freshBlooms, freshParts) =
          stageBatch(spark, fs, r, copies, effStatsDv, effBloomDv,
            manifestPartCols(fs, r, cur),
            bucketBy = manifestBucketBy(fs, r, cur), colMap = cmap)
        // row-preserving: every killed row has exactly one live copy
        if (!commitManifest(fs, r, next, snapDirs ++ newDirs, retain,
            carried, manifestRows(fs, r, cur), freshStats, effStatsDv,
            newBlooms = freshBlooms, bloomCols = effBloomDv,
            newParts = freshParts, newDvs = fresh, op = "update")) {
          newDirs.foreach(d => fs.delete(new Path(r, d), true))
          throw new java.util.ConcurrentModificationException(
            s"update on $root lost version $next to a concurrent " +
              "commit — the update classified a snapshot that is no " +
              "longer live; re-run against the current table")
        }
        return next
      }
      // over the bound: fall through to the copy-on-write rewrite
    }
    // DV-aware read: the rewrite materializes any existing vector
    val base = readDirsWithDv(spark, fs, r, cur, touched, carried)
    val hit = coalesce(predicate, lit(false))
    val updated = set.foldLeft(base) { case (df, (c, expr)) =>
      val field = schema(c)
      df.withColumn(c, when(hit, expr.cast(
        org.apache.spark.sql.graft.Shim.asNullableType(field.dataType)))
        .otherwise(col(c)))
    }
    val effStats = effectiveStatsCols(fs, r, Nil)
    val effBloom = effectiveBloomCols(fs, r, Nil)
    // layout-preserving rewrite (see deleteWhere): note an UPDATE may
    // move rows BETWEEN partitions (SET on a partition column) — the
    // re-staging splits by the post-update values, so the layout stays
    // exact either way
    val effPart = manifestPartCols(fs, r, cur)
    validateChecks(fs, r, updated, "update")
    val (newDirs, freshStats, freshBlooms, freshParts) =
      stageBatch(spark, fs, r, updated, effStats, effBloom, effPart,
          maintenance = true, bucketBy = manifestBucketBy(fs, r, cur),
          colMap = cmap)
    preserveMarkers(fs, r, touched, newDirs)
    // updates are row-preserving: the metadata count carries over
    if (!commitManifest(fs, r, next, kept ++ newDirs, retain,
        carried, manifestRows(fs, r, cur), freshStats, effStats,
        newBlooms = freshBlooms, bloomCols = effBloom,
        newParts = freshParts, op = "update")) {
      newDirs.foreach(d => fs.delete(new Path(r, d), true))
      throw new java.util.ConcurrentModificationException(
        s"update on $root lost version $next to a concurrent commit — " +
          "the update rewrote a snapshot that is no longer live; re-run " +
          "against the current table")
    }
    next
  }

  /** General SQL-semantics MERGE INTO a committed table — the
    * copy-on-write executor behind `MERGE INTO` on lake catalog
    * tables (and a programmatic operator in its own right; the
    * CDC-shaped [[mergeCommitted]] remains the upsert-feed form).
    *
    * Clause semantics are ANSI MERGE: every (target row, source row)
    * pair matching the equi-`on` condition takes the FIRST `matched`
    * clause whose condition holds (UPDATE builds the new row, DELETE
    * drops it; no clause → row kept); target rows with no source
    * match take the first `notMatchedBySource` clause; source rows
    * with no target match take the first `notMatched` INSERT clause
    * (unassigned columns NULL). A target row matched by MORE than one
    * source row is a cardinality violation and fails the job (the
    * ambiguity every engine refuses), detected with a window over the
    * BATCH side only — never a corpus-sized shuffle.
    *
    * Column reference contract: target columns as `col("t.c")`,
    * source columns as `col("s.c")` in clause conditions/assignments;
    * `on` pairs are (target expr `t.`-qualified, source expr
    * UNqualified — it resolves against the bare source before the
    * join).
    *
    * Scale shape (the [[mergeCommitted]] discipline): one map-only
    * probe finds which snapshot dirs hold matched keys; untouched
    * dirs are reused BY REFERENCE and only touched dirs rewrite
    * through the clause fold. `notMatchedBySource` clauses see every
    * target row by definition, so they rewrite the full snapshot —
    * that is the semantics' cost, not the executor's. Optimistically
    * concurrent like every maintenance commit: the slot is pinned
    * before the rewrite, losing it deletes the staged dir and
    * refuses. Returns the committed version (unchanged if a no-op). */
  def mergeInto(spark: SparkSession, root: String,
      source: org.apache.spark.sql.DataFrame,
      on: Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)],
      matched: Seq[LakeMergeMatched] = Nil,
      notMatched: Seq[LakeMergeInsert] = Nil,
      notMatchedBySource: Seq[LakeMergeMatched] = Nil,
      retain: Int = -1): Long = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    require(on.nonEmpty, "MERGE needs at least one ON equality pair")
    require(matched.nonEmpty || notMatched.nonEmpty || notMatchedBySource.nonEmpty,
      "MERGE needs at least one WHEN clause")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root — bootstrap with commitOverwrite/commitAppend"))
    val snapDirs = manifestDirs(fs, r, cur)
    // slot pinned before the probe/rewrite jobs — see mergeCommitted
    val next = pinSlot(fs, r, cur)
    afterSlotPin()
    val carried = manifestSchema(fs, r, cur)
    val base = readCommittedAt(spark, root, cur)
    val schema = carried.getOrElse(base.schema)
    val needJoin = matched.nonEmpty || notMatchedBySource.nonEmpty
    // working columns are part of the executor's private vocabulary —
    // a user column under one of these names would be silently
    // overwritten mid-merge, so refuse up front
    (Seq("__nmatch", "__s_present") ++ on.indices.map(i => s"__sk_$i"))
      .foreach(n => require(!source.columns.contains(n),
        s"MERGE source must not carry reserved working column '$n'"))
    Seq("__file", "__del").foreach(n =>
      require(!schema.fieldNames.contains(n),
        s"MERGE target must not carry reserved working column '$n'"))
    // per-source-key match count, window over the BATCH side only —
    // joined rows carrying __nmatch > 1 are the cardinality violation
    val srcW = source
      .withColumn("__nmatch", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(on.map(_._2): _*)))
      .withColumn("__s_present", lit(true))
      .persist()
    try {
      val joinCond = on.zipWithIndex.map { case ((t, _), i) =>
        t === col(s"s.__sk_$i")
      }.reduce(_ && _)
      // materialize the source-side key exprs as columns BEFORE the
      // alias (they must resolve against the bare source, and stay
      // unambiguous under the join)
      val srcKeyed = on.zipWithIndex.foldLeft(srcW) { case (d, ((_, s), i)) =>
        d.withColumn(s"__sk_$i", s)
      }.alias("s")
      val touchedDirNames: Set[String] =
        if (notMatchedBySource.nonEmpty) snapDirs.toSet
        else if (matched.isEmpty) Set.empty
        else probeDirNames(base
          .withColumn("__file", input_file_name()).alias("t")
          .join(srcKeyed, joinCond, "left_semi")
          .select(col("__file")))
      val touchedDirs = snapDirs.filter(touchedDirNames)
      val untouched = snapDirs.filterNot(touchedDirNames)
      val cols = schema.fieldNames.toSeq
      val touchedBase =
        if (touchedDirs.isEmpty) base.limit(0)
        // DV-aware: the rewrite materializes any existing vector
        else readDirsWithDv(spark, fs, r, cur, touchedDirs, carried)
      val present = coalesce(col("s.__s_present"), lit(false))
      // ordered branch list: (guard, Some(assignments) = update /
      // None = delete). Matched and by-source groups are disjoint on
      // `present`, so group order cannot overlap.
      def branchesOf(clauses: Seq[LakeMergeMatched], guard: Column) =
        clauses.map {
          case LakeMergeUpdate(c, set) =>
            (guard && c.getOrElse(lit(true)), Some(set))
          case LakeMergeDelete(c) =>
            (guard && c.getOrElse(lit(true)), None)
        }
      val branches = branchesOf(matched, present) ++
        branchesOf(notMatchedBySource, !present)
      def colValue(c: String): Column = branches.foldRight(col(s"t.$c")) {
        case ((g, act), els) =>
          when(g, act.flatMap(_.get(c)).getOrElse(col(s"t.$c"))).otherwise(els)
      }.cast(schema(c).dataType)
      val plainDel = branches.foldRight(lit(false): Column) {
        case ((g, act), els) => when(g, lit(act.isEmpty)).otherwise(els)
      }
      // the cardinality raise rides the delete flag — it is evaluated
      // for every joined row before any branch can act. It applies
      // ONLY when matched clauses can act: a bySource-only merge keeps
      // matched rows verbatim, so duplicate source keys are legal
      // there (only key PRESENCE matters) and the join right side
      // dedupes to the distinct key set to keep the row multiset exact.
      val deleted =
        if (matched.isEmpty) plainDel
        else when(present && col("s.__nmatch") > 1,
            raise_error(concat(lit("MERGE cardinality violation on "),
              lit(root), lit(": a target row matched multiple source rows " +
                "— deduplicate the source on the ON keys"))).cast("boolean"))
          .otherwise(plainDel)
      val joinRight =
        if (matched.nonEmpty) srcKeyed
        else srcKeyed.select(
          (on.indices.map(i => col(s"__sk_$i")) :+ col("__s_present")): _*)
          .distinct().alias("s")
      val keptRewritten =
        if (!needJoin) touchedBase.limit(0)
        else touchedBase.alias("t").join(joinRight, joinCond, "left")
          .withColumn("__del", deleted)
          .where(!col("__del"))
          .select(cols.map(c => colValue(c).as(c)): _*)
      val inserts =
        if (notMatched.isEmpty) keptRewritten.limit(0)
        else {
          // every target row matching a source key lives in a touched
          // dir (that is what the probe computed), so the anti-join
          // against touched rows alone is the anti-join against the
          // full table. Insert-only merges probe nothing — anti-join
          // the full base.
          val antiRight = (if (needJoin) touchedBase else base).alias("t")
          val srcOnly = srcKeyed.join(antiRight, joinCond, "left_anti")
          val insBranches = notMatched.map(i =>
            (i.condition.getOrElse(lit(true)), i.values))
          def insValue(c: String): Column =
            insBranches.foldRight(lit(null): Column) { case ((g, vs), els) =>
              when(g, vs.getOrElse(c, lit(null))).otherwise(els)
            }.cast(schema(c).dataType)
          val insFlag = insBranches.foldRight(lit(false): Column) {
            case ((g, _), els) => when(g, lit(true)).otherwise(els)
          }
          srcOnly.where(insFlag)
            .select(cols.map(c => insValue(c).as(c)): _*)
        }
      val rewritten = keptRewritten.unionByName(inserts)
      // nothing matched, nothing to insert → the table is unchanged
      if (touchedDirs.isEmpty && rewritten.isEmpty) return cur
      val effStats = effectiveStatsCols(fs, r, Nil)
      val effBloom = effectiveBloomCols(fs, r, Nil)
      // layout-preserving (see deleteWhere): partitioned tables
      // re-stage the rewrite one dir per value tuple
      val effPart = manifestPartCols(fs, r, cur)
      val effBucket = manifestBucketBy(fs, r, cur)
      validateChecks(fs, r, rewritten, "merge")
      val (newDirs, stats, blooms, parts) =
        stageBatch(spark, fs, r, rewritten, effStats, effBloom, effPart,
          maintenance = true, bucketBy = effBucket,
          colMap = manifestColMap(fs, r, cur))
      preserveMarkers(fs, r, touchedDirs, newDirs)
      if (!commitManifest(fs, r, next, untouched ++ newDirs, retain,
          carried.orElse(Some(rewritten.schema)), None, stats, effStats,
          newBlooms = blooms, bloomCols = effBloom,
          newParts = parts, op = "merge")) {
        newDirs.foreach(d => fs.delete(new Path(r, d), true))
        throw new java.util.ConcurrentModificationException(
          s"merge into $root lost version $next to a concurrent commit — " +
            "the merge read a snapshot that is no longer live; re-run " +
            "against the current table (maintenance commits are " +
            "one-writer-at-a-time, Delta's OPTIMIZE conflict rule)")
      }
      next
    } finally { srcW.unpersist(); () }
  }

  /** DYNAMIC dir pruning for star joins — the lakehouse
    * dynamic-partition-pruning pattern as an explicit two-phase read:
    * the dimension side's distinct join keys (metadata-scale when the
    * join key is the fact's partition/date column — a filtered
    * calendar dim is a handful of rows) collect first, then the fact
    * reads through [[readCommittedWhere]] with the keys as an IN
    * predicate, so partition values, stats and blooms all prune dirs
    * BEFORE the join plans. At 100 TB this turns `fact ⋈ (filtered
    * dim)` from a full fact scan into O(matching partitions) I/O —
    * what Spark's built-in DPP does for hive-layout tables, expressed
    * through the manifest instead.
    *
    * The collected key set is capped: a dim whose filtered keys
    * exceed the cap would not have pruned meaningfully anyway — read
    * the full fact and let the join do the work.
    * @param dimKeys single-column DataFrame of join-key values
    * @return fact rows whose `factKeyCol` is in `dimKeys` (NULL keys
    *   never match, standard join semantics) */
  def readCommittedDimPruned(spark: SparkSession, root: String,
      factKeyCol: String, dimKeys: org.apache.spark.sql.DataFrame,
      maxKeys: Int = 10000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    require(dimKeys.columns.length == 1,
      s"dimKeys must be a single-column key set, got " +
        dimKeys.columns.mkString("[", ", ", "]"))
    require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
    val keys = dimKeys.distinct().limit(maxKeys + 1).collect()
      .map(_.get(0)).filter(_ != null)
    require(keys.length <= maxKeys,
      s"dim side carries more than $maxKeys distinct join keys — a key " +
        "set that large would not prune; read the fact with " +
        "readCommitted and join directly (or raise maxKeys)")
    if (keys.isEmpty) {
      val s = readCommitted(spark, root).schema
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), s)
    }
    readCommittedWhere(spark, root, col(factKeyCol).isin(keys.toSeq: _*))
  }

  /** `SHOW PARTITIONS` for a committed table: the live snapshot's
    * partition-value tuples with their dir counts, answered from ONE
    * manifest read — no data I/O, no listing (the values are exact
    * per-dir metadata, so this is how an operator inspects a 100 TB
    * fact's layout for free). Values decode to the committed schema's
    * column types; a NULL partition reports NULL. Dirs carrying no
    * recorded values (a z-ordered snapshot's global dir, pre-layout
    * legacy dirs) are not partitions and are not listed — the table's
    * declared layout is what this reports.
    * @return one row per distinct tuple: (partition cols…, n_dirs) */
  def partitionValues(spark: SparkSession, root: String,
      version: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val v = version.getOrElse(currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root")))
    val partCols = manifestPartCols(fs, r, v)
    require(partCols.nonEmpty,
      s"table at $root declares no partition columns — partitionValues " +
        "reports the #partcols layout; commit with partitionBy to establish one")
    val schema = manifestSchema(fs, r, v).getOrElse(
      throw new java.util.NoSuchElementException(
        s"version $v at $root carries no schema line (legacy manifest) — " +
          "partition values cannot be typed"))
    // #partcols and #part_ keys are PHYSICAL; the schema (and this
    // function's output columns) use the LOGICAL names
    val inv = manifestColMap(fs, r, v).map(_.swap)
    def logical(c: String): String = inv.getOrElse(c, c)
    def fieldOf(c: String) = schema(logical(c))
    def decode(c: String, nv: Option[NormVal]): Any = nv match {
      case None => null
      case Some(x) =>
        import org.apache.spark.sql.catalyst.util.DateTimeUtils
        (x, fieldOf(c).dataType) match {
          case (NumV(n), ByteType)    => n.toByte
          case (NumV(n), ShortType)   => n.toShort
          case (NumV(n), IntegerType) => n.toInt
          case (NumV(n), LongType)    => n.toLong
          case (NumV(n), FloatType)   => n.toFloat
          case (NumV(n), DoubleType)  => n.toDouble
          case (NumV(n), dt: DecimalType) =>
            new java.math.BigDecimal(n.bigDecimal.toPlainString)
              .setScale(dt.scale)
          case (NumV(n), DateType) => DateTimeUtils.toJavaDate(n.toInt)
          case (NumV(n), TimestampType) =>
            DateTimeUtils.toJavaTimestamp(n.toLong)
          // NTZ rows convert from LocalDateTime, not java.sql.Timestamp
          // — createDataFrame would refuse the latter at runtime
          case (NumV(n), TimestampNTZType) =>
            DateTimeUtils.microsToLocalDateTime(n.toLong)
          case (StrV(s), StringType) => s.toString
          case (other, dt) => throw new IllegalStateException(
            s"partition value $other of '$c' does not decode to " +
              dt.simpleString)
        }
    }
    val live = manifestDirs(fs, r, v).toSet
    val tuples = manifestPartsRaw(fs, r, v).toSeq
      .filter { case (d, _) => live.contains(d) }
      .map { case (_, json) =>
        val m = parsePartJson(json)
        partCols.map(c => decode(c, m.get(c).flatten))
      }
      .groupBy(identity).toSeq
      .map { case (vals, dirs) =>
        org.apache.spark.sql.Row.fromSeq(vals :+ dirs.size.toLong)
      }
    val outSchema = StructType(
      partCols.map(c => fieldOf(c).copy(nullable = true)) :+
        StructField("n_dirs", LongType, nullable = false))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(tuples).asJava, outSchema)
  }

  /** `REORG TABLE … APPLY (PURGE)` (Delta parity): rewrite EXACTLY
    * the dirs carrying deletion vectors — regardless of size —
    * materializing the soft-deleted rows away, so the per-read row
    * filter stops and the `#dv_` position JSON stops being carried in
    * every subsequent manifest. This is the explicit payoff lever for
    * DV debt: `compactCommitted(minBytes)` never selects a LARGE dir,
    * so without REORG a big dir's vector lives forever (the debt is
    * visible as `dv_dirs`/`dv_rows` in DESCRIBE HISTORY/DETAIL).
    * `where` scopes the rewrite to DV-carrying dirs the manifest
    * cannot prove clean of matching rows (the OPTIMIZE WHERE
    * discipline); vector-free dirs ALWAYS carry by reference. Row
    * multiset, schema, layout and bucketing are all preserved
    * (re-staged through stageBatch under the declared partition
    * columns), and the answer is byte-for-byte unchanged — only the
    * physical representation pays down. Returns the committed version
    * (unchanged when no vector is in scope). */
  def reorgCommitted(spark: SparkSession, root: String,
      where: Option[org.apache.spark.sql.Column] = None,
      retain: Int = -1): Long = {
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val snapDirs = manifestDirs(fs, r, cur)
    // maintenance OCC: slot pinned before any job (see deleteWhere)
    val next = pinSlot(fs, r, cur)
    afterSlotPin()
    val dvs = manifestDvsRaw(fs, r, cur)
    val cmap = manifestColMap(fs, r, cur)
    // the predicate SHAPE gate runs even on a vector-free table (a
    // statement that would silently widen must refuse consistently):
    // an un-prunable predicate scopes NOTHING out and purges every
    // vector — that is the where-less spelling (OPTIMIZE WHERE rule)
    val wherePreds = where.map { p =>
      val preds = extractPreds(org.apache.spark.sql.graft.Shim.catalystTree(p))
      require(preds.nonEmpty,
        "REORG WHERE predicate has no prunable conjunct " +
          "(column-vs-literal =, <, <=, >, >=, IN, IS [NOT] NULL, AND) " +
          "— omit WHERE to purge every deletion vector")
      preds
    }
    if (dvs.isEmpty) return cur // nothing to purge, version-stable
    val dvDirs = snapDirs.filter(dvs.contains)
    val scoped = wherePreds match {
      case None => dvDirs
      case Some(preds) =>
        val (mayMatch, _) = pruneDirsAt(spark, root, cur,
          predsToPhysical(preds ++ deriveGenPreds(spark, fs, r, cur, preds),
            cmap))
        val in = mayMatch.toSet
        dvDirs.filter(in)
    }
    if (scoped.isEmpty) return cur
    val carried = manifestSchema(fs, r, cur)
    // DV-aware read: the rewrite MATERIALIZES the vectors (this is
    // the whole point) and re-stages layout-preserving
    val base = readDirsWithDv(spark, fs, r, cur, scoped, carried)
    val effStats = effectiveStatsCols(fs, r, Nil)
    val effBloom = effectiveBloomCols(fs, r, Nil)
    val effPart = manifestPartCols(fs, r, cur)
    val (newDirs, stats, blooms, parts) =
      stageBatch(spark, fs, r, base, effStats, effBloom, effPart,
        maintenance = true, bucketBy = manifestBucketBy(fs, r, cur),
        colMap = cmap)
    preserveMarkers(fs, r, scoped, newDirs)
    // the purged dirs leave the dirs list, so their `#dv_` lines stop
    // carrying automatically; unscoped vectors keep theirs. Rows are
    // unchanged: the DV commit already decremented the count. Slot
    // loss rebases across disjoint interlopers (maintenanceRebase).
    val srcSet = scoped.toSet
    var nextV = next
    var pubDirs = snapDirs.filterNot(srcSet)
    var pubSchema = carried
    var pubRows = manifestRows(fs, r, cur)
    var attempt = 0
    while (!commitManifest(fs, r, nextV, pubDirs ++ newDirs, retain,
        pubSchema, pubRows, stats, effStats,
        newBlooms = blooms, bloomCols = effBloom, newParts = parts,
        op = "reorg purge")) {
      attempt += 1
      val rb =
        try maintenanceRebase(fs, r, root, cur, srcSet, "REORG purge")
        catch { case t: Throwable =>
          newDirs.foreach(d => fs.delete(new Path(r, d), true)); throw t
        }
      if (attempt >= 100) {
        newDirs.foreach(d => fs.delete(new Path(r, d), true))
        throw new java.util.ConcurrentModificationException(
          s"REORG on $root lost $attempt consecutive commit races — " +
            "pathological contention; back off and retry")
      }
      nextV = rb._1
      pubDirs = rb._2.filterNot(srcSet)
      pubSchema = rb._3.orElse(pubSchema)
      pubRows = rb._4
    }
    nextV
  }

  /** `CONVERT TO GRAFT` (Delta's CONVERT TO DELTA): adopt a plain
    * directory of parquet files as a committed lake table IN PLACE —
    * no data rewrite. The files MOVE (same-filesystem renames, pure
    * metadata) into the deterministic bootstrap dir `v0` and one
    * manifest publishes them as version 0 with the inferred schema
    * and optional stats/bloom lines; every lake capability (time
    * travel, DML, OCC, properties, maintenance) applies from that
    * moment. Crash-safe by CONVERGENCE: until the manifest publishes
    * nothing is a lake table, and a rerun moves whatever files remain
    * at the root into the same `v0` dir before committing — the
    * rename set only shrinks. Hive-partitioned layouts (subdirs)
    * refuse: convert flat parquet dirs, or read+commitOverwrite with
    * `partitionBy` to adopt the layout as manifest partitions. */
  def convertParquet(spark: SparkSession, root: String,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      retain: Int = -1): Long = {
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    require(committedVersions(fs, r).isEmpty,
      s"a committed lake table already exists at $root — CONVERT " +
        "bootstraps; this table needs no conversion")
    require(fs.exists(r), s"no directory at $root")
    val entries = fs.listStatus(r).toSeq
    val subdirs = entries.filter(e => e.isDirectory && e.getPath.getName != "v0")
    require(subdirs.isEmpty,
      s"directory at $root contains subdirectories " +
        subdirs.map(_.getPath.getName).sorted.mkString("[", ", ", "]") +
        " — CONVERT adopts FLAT parquet dirs only (for a hive-partitioned " +
        "layout, read it and commitOverwrite with partitionBy)")
    val loose = entries.filter(e =>
      e.isFile && e.getPath.getName.endsWith(".parquet"))
    val dir = new Path(r, "v0")
    val resumed = fs.exists(dir)
    require(loose.nonEmpty || resumed,
      s"no parquet files at $root — nothing to convert")
    if (!resumed) fs.mkdirs(dir)
    loose.foreach { f =>
      if (!fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
        throw new java.io.IOException(
          s"CONVERT could not move ${f.getPath.getName} into $dir")
    }
    val df = spark.read.parquet(dir.toString)
    val schema = org.apache.spark.sql.graft.Shim.asNullable(df.schema)
    val effStats = statsCols.map(_.trim).filter(_.nonEmpty)
    val effBloom = bloomCols.map(_.trim).filter(_.nonEmpty)
    val (dirJson, fileJsons) =
      if (effStats.isEmpty) ("{}", Map.empty[String, String])
      else fileStatsJson(spark, dir.toString, effStats)
        .getOrElse(("{}", Map.empty[String, String]))
    if (!commitManifest(fs, r, 0L, Seq("v0"), retain, Some(schema),
        None, Map("v0" -> dirJson), effStats,
        newFileStats = Map("v0" -> fileJsons),
        newBlooms = dirBloomJson(spark, dir.toString, effBloom)
          .map("v0" -> _).toMap,
        bloomCols = effBloom, op = "convert"))
      throw new java.util.ConcurrentModificationException(
        s"CONVERT of $root lost version 0 to a concurrent bootstrap — " +
          "the directory is already becoming a lake table; re-check it")
    0L
  }

  /** [[compact]] for a manifest-committed table: collapse the live
    * snapshot (append commits accumulate one dir per batch — the
    * small-files pathology in manifest form: readers pay listing +
    * open cost per dir) into ONE dir of size-targeted files,
    * committed through the same atomic rename. Row multiset and
    * carried schema unchanged; concurrent readers keep the pre-
    * compaction snapshot until retention passes. Converges like
    * [[compact]]: sizing uses current on-disk bytes. For a SCOPED
    * small-files cleanup (only the hot partition, cold history
    * untouched) use [[clusterCommitted]] with `where` — its
    * lexicographic fallback over the partition columns is a compact
    * that also records per-file ranges. Returns the committed
    * version. */
  /** @param minBytes INCREMENTAL compaction (Delta's OPTIMIZE
    *   bin-packing rule): only dirs SMALLER than `minBytes` collapse —
    *   already-compacted dirs carry into the new snapshot BY
    *   REFERENCE, untouched. At 100 TB this is the standing
    *   maintenance cadence: hourly appendlets fold into one
    *   size-targeted dir while the compacted history is never read.
    *   0 (the default) keeps the whole-snapshot collapse. Fewer than
    *   two small dirs is a version-stable no-op (collapsing one dir
    *   into one dir moves bytes for nothing). */
  def compactCommitted(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024, retain: Int = -1,
      minBytes: Long = 0L): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    require(minBytes >= 0, s"minBytes must be >= 0, got $minBytes")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val liveDirs = manifestDirs(fs, r, cur)
    def dirBytes(d: String): Long =
      fs.listStatus(new Path(r, d)).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    val (smallDirs, carriedDirs) =
      if (minBytes <= 0L) (liveDirs, Seq.empty[String])
      else liveDirs.partition(d => dirBytes(d) < minBytes)
    if (minBytes > 0L && smallDirs.lengthCompare(2) < 0)
      return cur // nothing to bin-pack: already compact
    val total = smallDirs.map(dirBytes).sum
    require(total > 0 || minBytes > 0L,
      s"no parquet data in the live snapshot at $root")
    if (total == 0L) return cur // only empty dirs in scope
    val n = Math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val carried = manifestSchema(fs, r, cur)
    val base =
      if (carriedDirs.isEmpty) readCommittedAt(spark, root, cur)
      // DV-aware: compaction materializes the collapsed dirs' vectors
      else readDirsWithDv(spark, fs, r, cur, smallDirs, carried)
    val df = base.repartition(n)
    val next = pinSlot(fs, r, cur)
    val effStats = effectiveStatsCols(fs, r, Nil)
    val effBloom = effectiveBloomCols(fs, r, Nil)
    // compaction PRESERVES the declared partition layout: on a
    // partitioned table the collapse is per-value-tuple (small-files
    // cleanup within each partition; a partition hotter than
    // targetBytes stays one dir — split it by re-partitioning the
    // table key, not by breaking the layout), so partition pruning
    // survives maintenance instead of degrading to a full scan
    val effPart = manifestPartCols(fs, r, cur)
    val (newDirs, stats, blooms, parts) =
      stageBatch(spark, fs, r, df, effStats, effBloom, effPart,
        maintenance = true, bucketBy = manifestBucketBy(fs, r, cur),
        colMap = manifestColMap(fs, r, cur))
    // the collapsed dirs hand their streaming-fold replay markers to
    // their replacements; carried dirs keep their own in place
    preserveMarkers(fs, r, smallDirs, newDirs)
    // compaction is row-preserving: the previous count carries over;
    // the collapsed dirs get fresh stats (footer-pushdown read of
    // what was just written) and carried dirs keep their lines.
    // Losing the slot REBASES across disjoint interlopers (appends,
    // other maintenance) instead of discarding the rewrite — see
    // maintenanceRebase; only a race that touched the collapsed dirs
    // (or table metadata) refuses.
    val srcSet = smallDirs.toSet
    var nextV = next
    var pubDirs = carriedDirs
    var pubSchema = carried.orElse(Some(df.schema))
    var pubRows = manifestRows(fs, r, cur)
    var attempt = 0
    while (!commitManifest(fs, r, nextV, pubDirs ++ newDirs, retain,
        pubSchema, pubRows, stats, effStats,
        newBlooms = blooms, bloomCols = effBloom,
        newParts = parts, op = "compact")) {
      attempt += 1
      val rb =
        try maintenanceRebase(fs, r, root, cur, srcSet, "compaction")
        catch { case t: Throwable =>
          newDirs.foreach(d => fs.delete(new Path(r, d), true)); throw t
        }
      if (attempt >= 100) {
        newDirs.foreach(d => fs.delete(new Path(r, d), true))
        throw new java.util.ConcurrentModificationException(
          s"compaction of $root lost $attempt consecutive commit races — " +
            "pathological contention; back off and retry")
      }
      nextV = rb._1
      pubDirs = rb._2.filterNot(srcSet)
      pubSchema = rb._3.orElse(pubSchema)
      pubRows = rb._4
    }
    nextV
  }

  /** CLUSTER the live snapshot for data skipping: rewrite it into one
    * dir of `ceil(bytes/targetBytes)` size-targeted files laid out so
    * that every file covers a TIGHT range of `cols`, then commit with
    * per-file min/max stats — after which [[readCommittedWhere]]
    * prunes at file granularity. This is the lakehouse
    * OPTIMIZE-ZORDER step: compaction alone round-robins rows (no
    * locality, stats ranges all overlap, nothing prunes); clustering
    * is what makes the stats BITE.
    *
    * Layout: 2–4 numeric columns get a true Z-ORDER — each value
    * scales to a 16-bit rank in its [min,max] span and the bits
    * interleave into one long, so range locality is shared across ALL
    * the columns instead of only the leading one (a query on either
    * column alone, or both, prunes; integer arithmetic, pure Column
    * ops, whole-stage codegen). One column, or any non-numeric mix,
    * falls back to lexicographic multi-column range layout (leading-
    * column pruning — exactly what ORDER BY gives, honestly less for
    * trailing columns). Like all maintenance commits: row multiset
    * and schema unchanged, same atomic manifest rename, retention
    * keeps the pre-cluster snapshot, markers carried. The cluster
    * columns join the table's established stat columns so later
    * appends stat them too. Returns the committed version. */
  /** @param where scope the rewrite (`OPTIMIZE … WHERE`): dirs the
    *   manifest PROVES can hold no matching row (partition values,
    *   stats, blooms — the readCommittedWhere pruner) carry into the
    *   new snapshot BY REFERENCE, untouched; every other dir rewrites
    *   clustered with ALL its rows (the predicate selects which FILES
    *   get optimized, never which rows survive — row multiset is
    *   always preserved). At 100 TB this is how OPTIMIZE actually
    *   runs: yesterday's fragmented partition rewrites, the cold
    *   history is never read. None = the whole snapshot. */
  def clusterCommitted(spark: SparkSession, root: String, cols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024, retain: Int = -1,
      where: Option[org.apache.spark.sql.Column] = None): Long = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // on a PARTITIONED table, clustering is PER PARTITION (Delta's
    // OPTIMIZE ZORDER BY semantics): each partition-value tuple
    // rewrites into its own size-targeted clustered dir carrying its
    // exact #part_ values, so partition-dir pruning SURVIVES the
    // rewrite and the cluster columns' per-file ranges prune INSIDE
    // kept dirs — both mechanisms on one scan, nothing traded away.
    // Per-slice z-spans are computed within each partition (tighter
    // ranks than a global span). A table whose accumulated tuples
    // exceed the stage cap falls back to ONE globally-clustered dir
    // (the maintenance-fallback discipline: pruning degrades, the op
    // succeeds).
    require(cols.nonEmpty, "cluster columns must be non-empty")
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(retain >= -1,
      s"retain must be >= 0 (or -1 = inherit $PropRetain), got $retain")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    require(manifestBucketBy(fs, r, cur).isEmpty,
      s"table at $root is hash-bucketed — a clustered rewrite would " +
        "destroy the bucket placement and file naming the co-located-join " +
        "contract depends on; bucketed tables compact with " +
        "compactCommitted (layout-preserving) instead of z-ordering")
    val liveDirs = manifestDirs(fs, r, cur)
    // predicate scope: dirs the manifest proves hold no matching row
    // carry by reference; the rest rewrite (with ALL their rows)
    val cmap = manifestColMap(fs, r, cur)
    val (rewriteDirs, carriedDirs) = where match {
      case None => (liveDirs, Seq.empty[String])
      case Some(p) =>
        val preds = extractPreds(org.apache.spark.sql.graft.Shim.catalystTree(p))
        // a typo'd column or an un-prunable predicate shape would
        // carry NOTHING and silently rewrite the whole table — refuse
        // loudly; whole-table optimize is the where-less spelling
        require(preds.nonEmpty,
          "OPTIMIZE WHERE predicate has no prunable conjunct " +
            "(column-vs-literal =, <, <=, >, >=, IN, IS [NOT] NULL, " +
            "AND) — it would rewrite the whole table; omit `where` for " +
            "a full rewrite")
        manifestSchema(fs, r, cur).map(_.fieldNames.toSet).foreach { sc =>
          preds.map(_.col).distinct.foreach(c => require(sc.contains(c),
            s"OPTIMIZE WHERE references column '$c' which is not in the " +
              "committed schema — nothing would be excluded and the whole " +
              "table would rewrite"))
        }
        pruneDirsAt(spark, root, cur,
          predsToPhysical(preds ++ deriveGenPreds(spark, fs, r, cur, preds),
            cmap))
    }
    def dirBytes(d: String): Long =
      fs.listStatus(new Path(r, d)).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    val bytesByDir = rewriteDirs.map(d => d -> dirBytes(d)).toMap
    val total = bytesByDir.values.sum
    if (where.isDefined && (rewriteDirs.isEmpty || total == 0))
      return cur // nothing in scope: the snapshot is already optimal
    require(total > 0, s"no parquet data in the live snapshot at $root")
    val carried = manifestSchema(fs, r, cur)
    val dfLogical =
      if (carriedDirs.isEmpty) readCommittedAt(spark, root, cur)
      // DV-aware: z-order materializes the rewritten dirs' vectors
      else readDirsWithDv(spark, fs, r, cur, rewriteDirs, carried)
    cols.foreach(c => require(dfLogical.columns.contains(c),
      s"cluster column '$c' not in the table schema"))
    // this function writes its clustered dirs DIRECTLY (not through
    // stageBatch), so the physical rename happens here: the df, the
    // user's cluster columns, and the committed schema it re-commits
    // all translate once, and everything below is physical
    val logicalSchema = dfLogical.schema
    val df = toPhysicalDf(dfLogical, cmap)
    val cols0 = colsToPhysical(cols, cmap)
    def isNumeric(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | DateType | TimestampType | TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
    val zOrderable = cols0.lengthCompare(2) >= 0 && cols0.lengthCompare(4) <= 0 &&
      cols0.forall(c => isNumeric(df.schema(c).dataType))
    /** `slice` laid out into `n` files tight on `cols` (z-order when
      * the column mix supports it, lexicographic range otherwise);
      * spans computed over THIS slice. */
    def clusterLayout(slice: org.apache.spark.sql.DataFrame, n: Int):
        org.apache.spark.sql.DataFrame =
      if (!zOrderable)
        slice.repartitionByRange(n, cols0.map(col): _*)
          .sortWithinPartitions(cols0.map(col): _*)
      else {
        // per-column spans for the 16-bit rank scaling — one tiny agg
        val mm = slice.agg(
          cols0.flatMap(c => Seq(min(col(c)).cast("double"),
            max(col(c)).cast("double"))).head,
          cols0.flatMap(c => Seq(min(col(c)).cast("double"),
            max(col(c)).cast("double"))).drop(1): _*).collect().head
        val k = cols0.length
        val buckets = cols0.zipWithIndex.map { case (c, j) =>
          val (lo, hi) = (mm.getDouble(2 * j), mm.getDouble(2 * j + 1))
          if (lo >= hi || lo.isNaN || hi.isNaN || hi.isInfinite || lo.isInfinite)
            lit(0L)
          else least(greatest(
            floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * 65535.0)
              .cast("long"), lit(0L)), lit(65535L))
        }.map(coalesce(_, lit(0L))) // NULLs cluster low
        // interleave: bit i of column j lands at position i*k + j
        val z = (0 until 16).flatMap(i => buckets.zipWithIndex.map { case (b, j) =>
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), i * k + j)
        }).reduce(_ bitwiseOR _)
        slice.withColumn("__graft_z", z)
          .repartitionByRange(n, col("__graft_z"))
          .sortWithinPartitions(col("__graft_z"))
          .drop("__graft_z")
      }
    val next = pinSlot(fs, r, cur)
    val effStats = (effectiveStatsCols(fs, r, Nil) ++ cols0).distinct
    val effBloom = effectiveBloomCols(fs, r, Nil)
    val effPart = manifestPartCols(fs, r, cur)
    /** Write one clustered dir for `slice`; returns its manifest
      * pieces. ONE column-pruned pass over the fresh dir yields
      * per-file AND dir ranges — the whole point of the rewrite. */
    def stageClustered(slice: org.apache.spark.sql.DataFrame, n: Int):
        (String, String, Map[String, String], Option[String]) = {
      val dir = stagedDirName() // writer-unique, see mergeCommitted
      clusterLayout(slice, n).write.mode("overwrite")
        .parquet(new Path(r, dir).toString)
      val (dirJson, fileJsons) =
        fileStatsJson(spark, new Path(r, dir).toString, effStats)
          .getOrElse(("{}", Map.empty[String, String]))
      (dir, dirJson, fileJsons,
        dirBloomJson(spark, new Path(r, dir).toString, effBloom))
    }
    def filesFor(bytes: Long): Int =
      Math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val cached = df.persist()
    val staged = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val tuples =
        if (effPart.isEmpty) Array.empty[org.apache.spark.sql.Row]
        else cached.select(effPart.map(col): _*)
          .distinct().limit(stageTupleCap + 1).collect()
      val (newDirs, dirStats, fileStats, blooms, parts) =
        if (effPart.isEmpty || tuples.isEmpty || tuples.length > stageTupleCap) {
          // unpartitioned table, or over-cap fallback: one global dir
          val (d, dj, fj, bl) = stageClustered(cached, filesFor(total))
          staged += d
          (Seq(d), Map(d -> dj), Map(d -> fj), bl.map(d -> _).toMap,
            Map.empty[String, String])
        } else {
          // per-partition clustering: byte budget per tuple = its own
          // recorded dirs' bytes + an even share of value-less dirs
          // (legacy/global dirs whose rows re-home to their tuples here)
          val partsRaw = manifestPartsRaw(fs, r, cur)
          val valueless = rewriteDirs.filterNot(partsRaw.contains)
            .map(bytesByDir).sum / tuples.length
          val bytesByJson = rewriteDirs.flatMap(d =>
            partsRaw.get(d).map(_ -> bytesByDir(d)))
            .groupBy(_._1).map { case (j, xs) => j -> xs.map(_._2).sum }
          val dirs = Seq.newBuilder[String]
          val ds = Map.newBuilder[String, String]
          val fjs = Map.newBuilder[String, Map[String, String]]
          val bls = Map.newBuilder[String, String]
          val pls = Map.newBuilder[String, String]
          tuples.foreach { row =>
            val slice = effPart.zipWithIndex.foldLeft(cached) {
              case (d0, (c, i)) => d0.where(col(c) <=> lit(row.get(i)))
            }
            val json = partJson(effPart.zipWithIndex.map { case (c, i) =>
              c -> (if (row.isNullAt(i)) None
                else normExternal(row.get(i)) match {
                  case some @ Some(_) => some
                  case None => throw new IllegalArgumentException(
                    s"partition value ${row.get(i)} of column '$c' does " +
                      "not normalize — unsupported runtime type")
                })
            })
            val (d, dj, fj, bl) = stageClustered(slice,
              filesFor(bytesByJson.getOrElse(json, 0L) + valueless))
            staged += d
            dirs += d
            ds += d -> dj
            fjs += d -> fj
            bl.foreach(b => bls += d -> b)
            pls += d -> json
          }
          (dirs.result(), ds.result(), fjs.result(), bls.result(),
            pls.result())
        }
      preserveMarkers(fs, r, rewriteDirs, newDirs)
      // slot loss rebases across disjoint interlopers instead of
      // discarding the clustered rewrite — see maintenanceRebase
      val srcSet = rewriteDirs.toSet
      var nextV = next
      var pubDirs = carriedDirs
      var pubSchema: Option[org.apache.spark.sql.types.StructType] =
        Some(logicalSchema)
      var pubRows = manifestRows(fs, r, cur)
      var attempt = 0
      while (!commitManifest(fs, r, nextV, pubDirs ++ newDirs, retain,
          pubSchema, pubRows, dirStats, effStats, fileStats,
          newBlooms = blooms, bloomCols = effBloom,
          newParts = parts, op = "zorder")) {
        attempt += 1
        val rb =
          try maintenanceRebase(fs, r, root, cur, srcSet, "clustering")
          catch { case t: Throwable =>
            newDirs.foreach(d => fs.delete(new Path(r, d), true)); throw t
          }
        if (attempt >= 100) {
          newDirs.foreach(d => fs.delete(new Path(r, d), true))
          throw new java.util.ConcurrentModificationException(
            s"clustering of $root lost $attempt consecutive commit races — " +
              "pathological contention; back off and retry")
        }
        nextV = rb._1
        pubDirs = rb._2.filterNot(srcSet)
        pubSchema = rb._3.orElse(pubSchema)
        pubRows = rb._4
      }
      nextV
    } catch {
      case t: Throwable if !t.isInstanceOf[java.util.ConcurrentModificationException] =>
        staged.foreach(d => scala.util.Try(fs.delete(new Path(r, d), true)))
        throw t
    } finally { cached.unpersist(); () }
  }

  /** Number of parquet data files currently under `path`. */
  def dataFileCount(spark: SparkSession, path: String): Int =
    listDataFiles(spark, path).length

  private def listDataFiles(spark: SparkSession, path: String) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    if (!fs.exists(p)) Array.empty[org.apache.hadoop.fs.FileStatus]
    else fs.listStatus(p).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite the table at `path` into `ceil(totalBytes / targetBytes)`
    * files (min 1) and swap the rewrite in. Row multiset is unchanged
    * — this is a layout-only operation. Returns the new file count.
    *
    * Sizing uses the CURRENT on-disk bytes, so compaction converges:
    * re-running on an already-compacted table plans the same file
    * count and rewrites nothing surprising. The repartition is
    * round-robin (no key): compaction must not assume a partition
    * column exists; co-location layouts belong to the bucketed-write
    * path, not the compactor. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val files = listDataFiles(spark, path)
    require(files.nonEmpty, s"no parquet table at $path")
    val total = files.map(_.getLen).sum
    val n = Math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    // the swap (staging write + .bak rename dance) is the SAME
    // crash-safety path the dedup repair uses — one definition
    graft.newsmaper.Newsmaper.overwriteRetained(
      spark.read.parquet(path).repartition(n), path)
    dataFileCount(spark, path)
  }
}
