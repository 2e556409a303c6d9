package graft

/** Cheap content signature for input-keyed caches (the staged pair-graph
  * relations in [[graft.llm.LlmQueries]] and the resolved-relation cache
  * in [[Tables]]). Both caches key on (length, mtime) plus this tag so a
  * regenerated input that lands with identical byte length inside the
  * filesystem's mtime granularity — invisible to a (length, mtime)-only
  * signature — still misses and re-resolves.
  *
  * For a FILE: CRC32 over the first and last 64 KB. The tail covers the
  * parquet footer, whose row counts and column statistics change with
  * any data change, so 128 KB of I/O (page-cache resident in practice)
  * stands in for a full-content hash.
  *
  * For a DIRECTORY (a multi-file parquet table): CRC32 over the sorted
  * recursive listing's (relative name, length, mtime) triples. A
  * directory's own length/mtime does NOT change when a file inside is
  * rewritten in place, so the flat file signature would silently go
  * stale — this folds every contained file into the tag instead. Scope
  * of the guarantee: any regeneration that changes a contained file's
  * NAME, length, or mtime tick is caught — which covers every
  * Spark-style rewrite (fresh randomized part-file names per job) —
  * but a byte-level in-place rewrite preserving all three per-file
  * attributes is not (per-file content CRC would cost I/O proportional
  * to the part count on every resolution; flat single-file inputs, the
  * only shape the driver generates today, get the real content CRC).
  *
  * An input that vanishes or truncates mid-read (a concurrent
  * regeneration) yields a unique never-cached sentinel instead of an
  * exception, so the caller takes a cache MISS and re-resolves — the
  * pre-content-tag behavior of a concurrent rewrite, not a new crash
  * surface on every query that resolves the table.
  */
object FileSig {
  /** Paths already reported unreadable — the sentinel makes a failing
    * input a recurring silent cache miss (rebuild-every-call for
    * staged(), sweep-pressure in Tables), so surface the first failure
    * per path on stderr instead of letting it hide as cost. */
  private val loggedUnreadable =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def contentTag(f: java.io.File): String =
    if (f.isDirectory) dirTag(f)
    else if (!f.isFile) "absent"
    else
      try {
        val crc = new java.util.zip.CRC32
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val n = raf.length()
          val head = new Array[Byte](math.min(65536L, n).toInt)
          raf.readFully(head); crc.update(head)
          if (n > 65536L) {
            raf.seek(math.max(0L, n - 65536L))
            val tail = new Array[Byte](65536)
            raf.readFully(tail); crc.update(tail)
          }
          java.lang.Long.toHexString(crc.getValue)
        } finally raf.close()
      } catch {
        case e: java.io.IOException =>
          if (loggedUnreadable.add(f.getPath))
            System.err.println(
              s"graft.FileSig: ${f.getPath} unreadable (${e.getMessage}); " +
                "callers will cache-miss and re-resolve on every access")
          s"unreadable-${System.nanoTime()}"
      }

  private def dirTag(d: java.io.File): String = {
    val crc = new java.util.zip.CRC32
    def walk(f: java.io.File, rel: String): Unit =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName)
          .foreach(c => walk(c, s"$rel/${c.getName}"))
      else
        crc.update(
          s"$rel:${f.length()}:${f.lastModified()}".getBytes("UTF-8"))
    walk(d, "")
    "d" + java.lang.Long.toHexString(crc.getValue)
  }
}
