package graft.tools

/** Shared local-filesystem helpers for the engine's staging/state dirs
  * (the replay stagers and the stored-state sessionizer each deleted
  * trees with their own copy of this loop).
  */
object LocalFs {

  /** Recursive delete of a local directory tree; quietly no-ops on a
    * missing path (callers delete-then-recreate staging dirs).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
