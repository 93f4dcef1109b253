package graft.core

/** Memory figures comparable to the reference's per-run `mem` field
  * (make_graphs.py:48-56 charts it as "Memory Usage (KB)"; the engines
  * report peak resident KB — e.g. boost-std records 29 GB at the large
  * tier, an OS-level high-water mark, not an instantaneous heap).
  */
object Mem {

  /** Peak resident set size of this JVM in KB — `VmHWM` from
    * `/proc/self/status`, the same OS-level high-water mark the reference
    * engines' `mem` figures are (a /usr/bin/time -v "Maximum resident set
    * size" analog). Returns -1 where the procfs field is unavailable
    * (non-Linux), letting callers fall back to [[usedHeapKb]].
    */
  def peakRssKb(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/self/status")
      try src.getLines()
        .collectFirst { case l if l.startsWith("VmHWM:") =>
          l.stripPrefix("VmHWM:").trim.stripSuffix(" kB").trim.toLong
        }.getOrElse(-1L)
      finally src.close()
    } catch { case _: Throwable => -1L }

  /** Used JVM heap in KB after a forced GC — the steady-state live-set
    * figure (instantaneous used-heap without the GC overstates by whatever
    * garbage the last query left behind).
    */
  def usedHeapKb(forceGc: Boolean = true): Long = {
    if (forceGc) System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / 1024
  }

  /** The reference-comparable figure: peak RSS where procfs exists, else
    * forced-GC heap. Second element names which one it was (for the run
    * file's notes).
    */
  def reportKb(): (Long, String) = {
    val rss = peakRssKb()
    if (rss > 0) (rss, "peak RSS (VmHWM from /proc/self/status)")
    else (usedHeapKb(), "used JVM heap after forced GC (no procfs)")
  }
}
