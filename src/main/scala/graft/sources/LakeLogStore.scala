package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The PUT-IF-ABSENT commit seam — Delta's LogStore, extracted.
  *
  * Optimistic concurrency rests on exactly one storage primitive:
  * atomically publish a fully-written temp file as `dest` IFF `dest`
  * does not already exist, returning whether this writer won the
  * slot. Everything else in the protocol (staging, rebase, retention)
  * is built on ordinary writes and listings. Factoring the primitive
  * behind this trait keeps the protocol portable:
  *
  *  - local / HDFS filesystems ship in [[HadoopLogStore]] (hard-link
  *    on POSIX, atomic rename on HDFS — today's defaults, unchanged);
  *  - an S3-class object store implements `publishIfAbsent` with the
  *    store's CONDITIONAL PUT (`If-None-Match: *` on S3 since 2024-08,
  *    `x-ms-blob-if-none-match` on Azure, `ifGenerationMatch(0)` on
  *    GCS): upload the manifest bytes with the precondition, map a
  *    412/PreconditionFailed to `false`, anything else raised. The
  *    implementation MUST be atomic with respect to concurrent
  *    publishers of the same `dest` and MUST NOT leave a readable
  *    partial object on failure — readers treat the presence of
  *    `dest` as the commit point;
  *  - tests inject failure shapes (a contested slot, a crash between
  *    cleanup and return) without racing real threads.
  *
  * Contract details implementations must honor:
  *  - `tmp` is fully written and closed before the call;
  *  - on `true`, `dest` exists with `tmp`'s exact bytes and `tmp` is
  *    deleted;
  *  - on `false`, `dest` existed already (another writer's commit —
  *    its bytes untouched) and `tmp` is deleted;
  *  - any other outcome throws — a torn publish must never look like
  *    a clean loss.
  */
trait LakeLogStore {
  def publishIfAbsent(fs: FileSystem, tmp: Path, dest: Path): Boolean
}

/** Default store: HDFS-style atomic `rename` (refuses an existing
  * destination), except on LOCAL filesystems where POSIX `rename(2)`
  * silently OVERWRITES — there the claim is a hard link (`link(2)`:
  * atomic, EEXIST on a taken slot). Either way the loser's tmp is
  * cleaned up; a reader never observes a partially-written
  * destination. */
/** REFERENCE conditional-put store: publishes the way an S3-class
  * object-store client would, against the local filesystem standing
  * in for the bucket. This is the conformance implementation for the
  * trait's contract — it exists to PROVE the contract text is
  * sufficient for a real S3 implementation, by running the OCC
  * suite's critical races through the object-store semantics instead
  * of rename/link:
  *
  *  - the service-side atomicity of `PUT If-None-Match: *` is
  *    simulated by a JVM-global lock around (existence check, full
  *    byte upload): concurrent publishers of one `dest` serialize
  *    exactly like the store's conditional-write path;
  *  - a taken slot surfaces as the 412/PreconditionFailed branch →
  *    `false`, loser's tmp cleaned, winner's bytes untouched;
  *  - fault injection: `failNextPut` tears the next upload BEFORE the
  *    object becomes visible (the network-error shape) — the call
  *    RAISES, `dest` stays absent, and the protocol must surface the
  *    error rather than treat it as a clean loss (torn publish must
  *    never look like `false`).
  *
  * Counters are test-visible so specs can assert which branch fired. */
final class ObjectStoreLogStore extends LakeLogStore {
  private val lock = new java.util.concurrent.locks.ReentrantLock
  @volatile var puts = 0
  @volatile var conflicts = 0
  /** When set, the next manifest PUT throws this after the
    * precondition check and before any byte lands (self-clearing). */
  @volatile var failNextPut: Option[() => Throwable] = None

  override def publishIfAbsent(fs: FileSystem, tmp: Path,
      dest: Path): Boolean = {
    val bytes = {
      val in = fs.open(tmp)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024)
        out.toByteArray
      } finally in.close()
    }
    lock.lock()
    try {
      if (fs.exists(dest)) { // the store's 412 / PreconditionFailed
        conflicts += 1
        fs.delete(tmp, false)
        return false
      }
      failNextPut match {
        case Some(mk) =>
          failNextPut = None
          // torn upload: nothing became visible; tmp is LEFT — the
          // caller owns retry/cleanup, exactly like a network error
          throw mk()
        case None =>
      }
      // the conditional PUT: bytes become visible as one object (the
      // local stand-in exposes a brief partial-write window to
      // READERS that a real bucket does not — writers are fully
      // serialized by the lock, which is the property under test)
      val out = fs.create(dest, false)
      try out.write(bytes) finally out.close()
      puts += 1
      fs.delete(tmp, false)
      true
    } finally lock.unlock()
  }
}

object HadoopLogStore extends LakeLogStore {
  override def publishIfAbsent(fs: FileSystem, tmp: Path,
      dest: Path): Boolean = fs match {
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
}
