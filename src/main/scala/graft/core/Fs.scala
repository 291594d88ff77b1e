package graft.core

/** Tiny local-filesystem helpers shared by the harness mains. */
object Fs {
  /** Recursive delete; tolerates races (listFiles may return null). */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(rmTree)
    }
    f.delete()
  }
}
