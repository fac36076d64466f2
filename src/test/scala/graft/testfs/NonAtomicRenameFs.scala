package graft.testfs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import java.net.URI
import java.nio.file.{Files, StandardCopyOption}

/** Test-only emulation of an object store's rename semantics on local
  * disk, registered under the `objstore:` scheme.
  *
  * Real object stores (S3/GCS-class) have no rename primitive — Hadoop
  * connectors emulate it as copy+delete, and rename-with-OVERWRITE at
  * the FileContext layer is delete-target-then-rename. Either way
  * there is a WINDOW in which the destination does not exist. This
  * shim keeps local-FS data operations intact but fires
  * [[ObjStoreHooks.onRename]] at the start of every rename — i.e.
  * inside that window (for FileContext's OVERWRITE path, after the
  * target delete, before the move) — so a spec can deterministically
  * observe what a racing reader would see.
  */
class NonAtomicLocalFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("objstore:///")
  override def getScheme: String = "objstore"
  override def rename(src: Path, dst: Path): Boolean = {
    ObjStoreHooks.onRename(src, dst)
    super.rename(src, dst)
  }

  /** Real object stores publish objects ATOMICALLY at PUT completion: a
    * key is never listable with partial bytes, and a conditional PUT
    * (If-None-Match) either lands the whole object or fails. The
    * delegated RawLocalFileSystem.create is neither: the file becomes
    * visible (size 0) at open with bytes streaming in afterwards, and
    * the exists check runs before open — so racing log committers could
    * (a) observe a TORN newest version and skip past a LIVE rival, or
    * (b) both pass the pre-check and open the same version file, one
    * silently overwriting the other. Both are shim artifacts no real
    * store exhibits; the racing-committers spec intermittently lost a
    * commit to them under load. Buffer writes and publish on close():
    * overwrite → atomic rename-over; exclusive → hard link, whose
    * POSIX link(2) fails atomically with EEXIST — a faithful
    * conditional PUT. (Rename stays delegated and non-atomic: that is
    * the object-store defect this shim exists to model.) */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val dst = pathToFile(f).toPath
    if (dst.getParent != null) Files.createDirectories(dst.getParent)
    val buf = new java.io.ByteArrayOutputStream()
    val publishOnClose = new java.io.OutputStream {
      private var closed = false
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        if (closed) return
        closed = true
        val tmp = Files.createTempFile(dst.getParent, s".${dst.getFileName}.put", ".tmp")
        Files.write(tmp, buf.toByteArray)
        if (overwrite)
          Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        else {
          try Files.createLink(dst, tmp)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
          } finally Files.deleteIfExists(tmp)
        }
      }
    }
    new FSDataOutputStream(publishOnClose, null)
  }
}

/** FileContext-side binding (fs.AbstractFileSystem.objstore.impl). */
class NonAtomicRenameFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NonAtomicLocalFileSystem, conf, "objstore", false)

object ObjStoreHooks {
  /** Fired inside every rename's non-atomic window. Reset per test. */
  @volatile var onRename: (Path, Path) => Unit = (_, _) => ()
}
