package graft.format

import org.apache.hadoop.fs.{FileSystem, Path}

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** The atomicity point of a manifest commit: make `target` exist with
  * exactly `bytes` iff it does not already exist.
  *
  * Contract (what MVCC correctness rests on):
  *  - Atomic-if-absent: of N concurrent publishers of the same `target`,
  *    exactly one returns true; the others return false and leave the
  *    winner's content untouched (no replace, no partial overwrite).
  *  - All-or-nothing visibility: a concurrent reader either sees the
  *    complete manifest or no file at all — never a prefix.
  *
  * The reference's remote catalog throws on non-atomic stores
  * (`ref:table/LanceCatalog.java:508-514`); this seam instead picks the
  * store's native atomic-if-absent primitive, so conditional-put object
  * stores (S3 `If-None-Match`, GCS `ifGenerationMatch=0`) commit safely
  * without an external lock.
  */
trait ManifestPublisher {
  def publish(fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean
}

object ManifestPublisher {

  /** Local POSIX filesystems: write a temp file, then `link(2)` it to the
    * target. Hard link is the primitive because it is O(1), gives readers
    * full-content-or-nothing, and fails with EEXIST when the target exists
    * — plain `rename(2)` REPLACES an existing target, so two racing
    * committers could both "win" and one manifest would silently vanish.
    */
  object HardLink extends ManifestPublisher {
    override def publish(fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean = {
      val tmp = new Path(target.getParent, s".tmp-${UUID.randomUUID()}")
      writeTmp(fs, tmp, bytes)
      val local = (p: Path) => java.nio.file.Paths.get(
        Path.getPathWithoutSchemeAndAuthority(p).toString)
      val won =
        try { java.nio.file.Files.createLink(local(target), local(tmp)); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      fs.delete(tmp, false)
      won
    }
  }

  /** HDFS-style filesystems, whose `rename` contract is atomic
    * fail-if-destination-exists (unlike POSIX).
    */
  object RenameIfAbsent extends ManifestPublisher {
    override def publish(fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean = {
      val tmp = new Path(target.getParent, s".tmp-${UUID.randomUUID()}")
      writeTmp(fs, tmp, bytes)
      val won = fs.rename(tmp, target)
      if (!won) fs.delete(tmp, false)
      won
    }
  }

  /** Conditional-put object stores (S3 `If-None-Match: *`, GCS
    * `ifGenerationMatch=0`): a single `create(target, overwrite = false)`
    * PUT — no temp object, because object-store PUTs are already
    * all-or-nothing and a copy+delete "rename" would triple the request
    * cost. The precondition is checked when the PUT completes, so losing
    * the race surfaces as FileAlreadyExistsException at `create` OR at
    * `close` — both mean the other committer won.
    */
  object ConditionalPut extends ManifestPublisher {
    override def publish(fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean =
      try {
        val out = fs.create(target, false)
        try out.write(bytes)
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  /** Test/extension seam: force a publisher for a scheme (e.g. an
    * in-memory conditional-put store, or an interleaving wrapper in a
    * racing-committer spec).
    */
  private val overrides = new ConcurrentHashMap[String, ManifestPublisher]()
  def register(scheme: String, p: ManifestPublisher): Unit = overrides.put(scheme, p)
  def unregister(scheme: String): Unit = overrides.remove(scheme)

  private val conditionalPutSchemes =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos")

  def forScheme(scheme: String): ManifestPublisher =
    Option(overrides.get(scheme)).getOrElse {
      if (scheme == "file") HardLink
      else if (conditionalPutSchemes.contains(scheme)) ConditionalPut
      else RenameIfAbsent
    }

  def forFileSystem(fs: FileSystem): ManifestPublisher = forScheme(fs.getScheme)

  private def writeTmp(fs: FileSystem, tmp: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(tmp, false)
    try out.write(bytes)
    finally out.close()
  }
}
