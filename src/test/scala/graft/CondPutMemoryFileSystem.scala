package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import java.io.{ByteArrayOutputStream, FileNotFoundException}
import java.net.URI

/** In-memory object store with conditional-PUT create semantics, modeled
  * on S3 `If-None-Match: *` / GCS `ifGenerationMatch=0`:
  *
  *  - `create(f, overwrite = false)` does NOT fail at open time; the
  *    precondition is checked atomically when the stream CLOSES (that is
  *    when a real store completes the PUT), surfacing a loss as
  *    [[FileAlreadyExistsException]].
  *  - Objects appear whole-or-not-at-all (visibility flips at close).
  *  - `rename` always fails — object stores have no atomic rename, which
  *    is exactly why the conditional-put publisher exists.
  *
  * Loaded by Hadoop reflection via `fs.condmem.impl`; the backing map is
  * JVM-global so every instance (and every thread) sees one store.
  */
class CondPutMemoryFileSystem extends FileSystem {
  import CondPutMemoryFileSystem.store

  private var uri: URI = URI.create("condmem:///")
  private var wd: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
    setConf(conf)
  }

  override def getScheme: String = "condmem"
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = wd
  override def setWorkingDirectory(dir: Path): Unit = wd = dir

  private def keyOf(f: Path): String = {
    val u = makeQualified(f).toUri
    Option(u.getAuthority).getOrElse("") + u.getPath
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = true

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    val buf = new ByteArrayOutputStream() {
      private var completed = false
      override def close(): Unit = {
        if (completed) return
        completed = true
        val bytes = toByteArray
        if (overwrite) store.put(key, bytes)
        else if (store.putIfAbsent(key, bytes) != null)
          throw new FileAlreadyExistsException(
            s"conditional PUT failed, object exists: $key")
      }
    }
    new FSDataOutputStream(buf, null)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = Option(store.get(keyOf(f)))
      .getOrElse(throw new FileNotFoundException(keyOf(f)))
    new FSDataInputStream(new FSInputStream {
      private var pos = 0
      override def seek(p: Long): Unit = pos = p.toInt
      override def getPos: Long = pos.toLong
      override def seekToNewSource(targetPos: Long): Boolean = false
      override def read(): Int =
        if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        if (pos >= bytes.length) -1
        else {
          val n = math.min(len, bytes.length - pos)
          System.arraycopy(bytes, pos, b, off, n); pos += n; n
        }
    })
  }

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    val obj = store.get(key)
    if (obj != null)
      new FileStatus(obj.length.toLong, false, 1, 1L << 26, 0L, makeQualified(f))
    else {
      val prefix = if (key.endsWith("/")) key else key + "/"
      val isDir = key.isEmpty || key == "/" ||
        store.keySet().stream().anyMatch(_.startsWith(prefix))
      if (isDir) new FileStatus(0L, true, 1, 1L << 26, 0L, makeQualified(f))
      else throw new FileNotFoundException(key)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    val prefix = if (key.endsWith("/")) key else key + "/"
    val children = scala.collection.mutable.LinkedHashSet.empty[String]
    store.keySet().forEach { k =>
      if (k.startsWith(prefix)) children += k.substring(prefix.length).split('/').head
    }
    if (children.isEmpty && store.get(key) != null) Array(getFileStatus(f))
    else children.toArray.map(c => getFileStatus(new Path(f, c)))
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    if (store.remove(key) != null) true
    else if (recursive) {
      val prefix = if (key.endsWith("/")) key else key + "/"
      val doomed = new java.util.ArrayList[String]()
      store.keySet().forEach(k => if (k.startsWith(prefix)) doomed.add(k))
      doomed.forEach(store.remove(_))
      !doomed.isEmpty
    } else false
  }

  /** Object stores have no atomic rename; force callers onto the
    * conditional-put path.
    */
  override def rename(src: Path, dst: Path): Boolean = false

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("condmem does not support append")
}

object CondPutMemoryFileSystem {
  val store = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
}

/** The same conditional-PUT store surfaced under the REAL `s3a` scheme
  * (Hadoop-API-faithful S3 mock: overwrite=false checked at close, no
  * atomic rename) — so the publisher-resolution path
  * (`forFileSystem` → `forScheme("s3a")` → `ConditionalPut`) is driven
  * end-to-end by the contract tests, pinning the `conditionalPutSchemes`
  * table choice instead of bypassing it with a test-registered override.
  * If resolution ever picked RenameIfAbsent for s3a, commits here would
  * fail loudly (`rename` always returns false, like S3).
  */
class S3AMockFileSystem extends CondPutMemoryFileSystem {
  override def getScheme: String = "s3a"
}
