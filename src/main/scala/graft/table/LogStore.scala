package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit log's atomicity seam (Delta's `LogStore` analog): every
  * versioned-table commit funnels its publish through exactly one call
  * to [[LogStore.publishOnce]], so the filesystem-specific
  * "create-if-absent" primitive is swappable without touching commit
  * logic.
  *
  * THE CONTRACT. `publishOnce(fs, tmp, dest)` must
  *
  *  1. make `dest` exist with exactly `tmp`'s content, or throw;
  *  2. be MUTUALLY EXCLUSIVE: of N concurrent calls targeting the same
  *     `dest`, at most one succeeds and every loser throws
  *     [[Versioned.CommitRace]] — with no window in which a reader can
  *     observe a partially-written `dest`;
  *  3. clean up `tmp` on both success and failure (crashed callers may
  *     still leak temps; `Versioned.vacuum` sweeps them by age).
  *
  * Property 2 is what turns optimistic commits into a total order: the
  * version number is the CAS token and `dest` (`vNNNNNNNN.json`) is the
  * CAS cell.
  *
  * Implementations provided / required:
  *
  *  - `file://` — [[HadoopFsLogStore]] uses POSIX hard-link creation,
  *    a true atomic create-if-absent (fails EEXIST); local rename(2)
  *    alone could NOT detect the race, since it silently replaces an
  *    existing destination.
  *  - HDFS-like stores (atomic no-overwrite rename) —
  *    [[HadoopFsLogStore]] uses exists-check + rename; the rename
  *    itself refuses existing destinations, so the pre-check is only a
  *    fast path.
  *  - S3-class object stores — NOT safe with either primitive: their
  *    "rename" is copy+delete and unconditional PUT is
  *    last-writer-wins, so two committers can both believe they
  *    published the same version. A correct implementation needs a
  *    conditional-write primitive (S3 `If-None-Match` PUT, GCS
  *    generation preconditions, Azure ETags) or an external
  *    coordination service — exactly the constraint Delta documents
  *    for its S3 LogStore. None ships here (this build targets
  *    local/HDFS filesystems); the seam is where one would plug in.
  */
trait LogStore {

  /** Publish `tmp`'s content as `dest`, atomically and exactly once
    * per `dest`; throws [[Versioned.CommitRace]] when `dest` already
    * exists or a concurrent call won.
    */
  def publishOnce(fs: FileSystem, tmp: Path, dest: Path): Unit
}

/** Hadoop-filesystem [[LogStore]]: hard-link CAS on `file://`, atomic
  * no-overwrite rename elsewhere. See the trait scaladoc for why
  * object stores need a different implementation.
  */
object HadoopFsLogStore extends LogStore {

  override def publishOnce(fs: FileSystem, tmp: Path, dest: Path): Unit = {
    def race() = new Versioned.CommitRace(
      s"commit of $dest lost a race — a concurrent writer published this " +
        "version first; retry from the new log head")
    val destUri = fs.makeQualified(dest).toUri
    if (destUri.getScheme == "file") {
      val t = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
      val d = java.nio.file.Paths.get(destUri.getPath)
      try {
        java.nio.file.Files.createLink(d, t)
        fs.delete(tmp, false) // Hadoop delete also removes the .crc sidecar
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false)
          throw race()
      }
    } else {
      if (fs.exists(dest)) {
        fs.delete(tmp, false)
        throw race()
      }
      if (!fs.rename(tmp, dest)) {
        // clean up on BOTH failure paths — a crashed committer can
        // still leave a tmp behind, which vacuum sweeps by age
        fs.delete(tmp, false)
        throw race()
      }
    }
  }
}

/** Object-store-shaped [[LogStore]]: mutual exclusion comes ONLY from a
  * conditional-PUT primitive — no hard links, no no-overwrite rename.
  * This is the S3 `If-None-Match` / GCS generation-precondition shape
  * the trait scaladoc describes, with the conditional write emulated by
  * an in-process CAS cell per destination (standing in for the store's
  * server-side precondition; a real S3 implementation would replace
  * `claim` with the conditional PUT itself and nothing else).
  *
  * What running the commit machinery against this store PROVES: commit
  * logic never leans on filesystem-specific namespace atomicity — every
  * mutual-exclusion guarantee flows through [[publishOnce]]'s contract
  * alone. (The winner's content write uses a temp+rename purely to
  * emulate the object store's atomic-VISIBILITY guarantee — readers of
  * a PUT see all-or-nothing — not to decide the race, which the claim
  * already decided.)
  *
  * Scope: one JVM. The cell map lives in this instance, so all writers
  * of a table must share the instance — exactly the single-coordination-
  * point requirement a real conditional-write store satisfies globally.
  */
final class ConditionalPutLogStore extends LogStore {

  private val cells = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def publishOnce(fs: FileSystem, tmp: Path, dest: Path): Unit = {
    val key = fs.makeQualified(dest).toUri.toString
    def race() = new Versioned.CommitRace(
      s"conditional PUT of $dest refused — the object (or a concurrent " +
        "writer's claim) already exists; retry from the new log head")
    // the conditional PUT: of N concurrent claims exactly one succeeds;
    // a destination that already exists on disk (written outside this
    // store instance) also refuses, like If-None-Match's server-side
    // existence check
    if (!cells.add(key)) {
      fs.delete(tmp, false)
      throw race()
    }
    // claimed, but the destination pre-exists on disk (written outside
    // this store instance): refuse like If-None-Match's server-side
    // existence check — and RELEASE the claim, since the on-disk object
    // itself now guards the cell and a later legitimate writer (e.g.
    // after a manual log repair removes the object) must be able to
    // claim it again
    if (fs.exists(dest)) {
      cells.remove(key)
      fs.delete(tmp, false)
      throw race()
    }
    // a failed PUT may surface as `false` OR as an IOException
    // (RawLocalFileSystem throws FileNotFoundException for a missing
    // source) — both mean nothing was published
    val put = try fs.rename(tmp, dest)
      catch { case _: java.io.IOException => false }
    if (!put) {
      // nothing was published: release the cell so a retry — including
      // commitRetry's own attempts in this JVM — can claim it, as the
      // error message promises
      cells.remove(key)
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"winner's PUT of $dest failed after claiming the cell — log corrupt-free " +
          "but this version's commit must be retried by a new writer")
    }
  }
}
