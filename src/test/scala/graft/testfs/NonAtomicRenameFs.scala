package graft.testfs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

import java.net.URI

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
}

/** FileContext-side binding (fs.AbstractFileSystem.objstore.impl). */
class NonAtomicRenameFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NonAtomicLocalFileSystem, conf, "objstore", false)

object ObjStoreHooks {
  /** Fired inside every rename's non-atomic window. Reset per test. */
  @volatile var onRename: (Path, Path) => Unit = (_, _) => ()
}
