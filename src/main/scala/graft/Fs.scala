package graft

/** Small filesystem helpers shared by the bench harness and the
  * streaming source stager (one recursive delete, not three drifting
  * copies).
  */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
    ()
  }
}
