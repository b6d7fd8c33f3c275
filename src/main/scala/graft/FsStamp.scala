package graft

/** Filesystem content stamp of a table directory — metadata only, no data
  * read. Used to key caches and memos (ResultCache entries, Olap's pivot
  * memo, the orders-fingerprint memo) so in-place fixture regeneration
  * invalidates them.
  *
  * The fold is ORDER-SENSITIVE over the name-sorted file list and mixes
  * the file NAME alongside mtime^length. A plain XOR fold (the original
  * form) self-cancels: appending two files with equal (mtime, length)
  * XORs to zero and leaves the stamp unchanged — a stale-serve hazard for
  * anything gating correctness on the stamp (r7 review finding). The
  * multiplicative chain breaks that algebra: length-count seed, position-
  * dependent mixing, and String.hashCode (specified, JVM-stable) for the
  * name.
  */
object FsStamp {
  def of(path: String): Long = {
    val root = new java.io.File(path)
    val files = Option(root.listFiles())
      .map(_.sortBy(_.getName)).getOrElse(Array(root))
    files.foldLeft(files.length.toLong) { (a, f) =>
      a * 1000003L +
        (f.getName.hashCode.toLong ^ f.lastModified() ^ f.length())
    }
  }
}
