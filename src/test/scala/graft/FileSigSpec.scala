package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** [[FileSig.contentTag]] is the content component of every input-keyed
  * cache signature (Tables' resolved-relation cache, LlmQueries'
  * staged pair graphs): a wrong tag either thrashes those caches or —
  * worse — serves a previous testdata generation to the oracle gate.
  * These tests pin the tag to an independent CRC32 reference across the
  * 64 KB head/tail boundaries and pin the DOCUMENTED scope: head and
  * tail bytes are covered, a middle-only change is not (that is what
  * the (length, mtime) components are for). */
class FileSigSpec extends AnyFunSuite {

  private def write(bytes: Array[Byte]): java.io.File = {
    val f = Files.createTempFile("filesig", ".bin").toFile
    Files.write(f.toPath, bytes)
    f.deleteOnExit()
    f
  }

  private def bytes(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 131) ^ (i >> 7)).toByte)

  /** Independent reference: CRC32 over the first 64 KB then the last
    * 64 KB (re-read, overlapping the head when n < 128 KB), matching
    * the scaladoc's contract rather than FileSig's code shape. */
  private def reference(b: Array[Byte]): String = {
    val crc = new java.util.zip.CRC32
    crc.update(b.take(65536))
    if (b.length > 65536) crc.update(b.drop(math.max(0, b.length - 65536)))
    java.lang.Long.toHexString(crc.getValue)
  }

  test("contentTag = head+tail CRC32 reference across the 64 KB boundaries") {
    for (n <- Seq(0, 1, 4096, 65535, 65536, 65537, 131071, 131072, 200000)) {
      val b = bytes(n)
      assert(FileSig.contentTag(write(b)) === reference(b),
        s"size $n must match the reference")
    }
  }

  test("first- and last-byte changes always change the tag") {
    val b = bytes(200000)
    val base = FileSig.contentTag(write(b))
    val headFlip = b.clone(); headFlip(0) = (headFlip(0) ^ 0x5a).toByte
    val tailFlip = b.clone()
    tailFlip(b.length - 1) = (tailFlip(b.length - 1) ^ 0x5a).toByte
    assert(FileSig.contentTag(write(headFlip)) !== base)
    assert(FileSig.contentTag(write(tailFlip)) !== base)
  }

  test("a middle-only change is outside the documented scope (tag equal)") {
    // Pins the scope statement: bytes strictly between the head and
    // tail windows are NOT read. If this starts failing, the scaladoc's
    // 128 KB-of-I/O contract changed and the cache-key docs must too.
    val b = bytes(300000)
    val mid = b.clone(); mid(150000) = (mid(150000) ^ 0x5a).toByte
    assert(FileSig.contentTag(write(mid)) === FileSig.contentTag(write(b)))
  }

  test("a missing path tags as absent") {
    assert(FileSig.contentTag(new java.io.File("/tmp/filesig_nope")) === "absent")
  }

  test("dirTag changes on rename, add, and mtime tick; stable otherwise") {
    val d = Files.createTempDirectory("filesig_dir").toFile
    val f = new java.io.File(d, "part-0.parquet")
    Files.write(f.toPath, bytes(100))
    f.setLastModified(1700000000000L)
    val base = FileSig.contentTag(d)
    assert(FileSig.contentTag(d) === base, "same listing must be stable")

    f.setLastModified(1700000001000L)
    val afterMtime = FileSig.contentTag(d)
    assert(afterMtime !== base, "an mtime tick must change the tag")

    val renamed = new java.io.File(d, "part-1.parquet")
    assert(f.renameTo(renamed))
    renamed.setLastModified(1700000001000L)
    val afterRename = FileSig.contentTag(d)
    assert(afterRename !== afterMtime, "a rename must change the tag")

    val extra = new java.io.File(d, "part-2.parquet")
    Files.write(extra.toPath, bytes(10))
    assert(FileSig.contentTag(d) !== afterRename, "a new file must change the tag")
    org.apache.commons.io.FileUtils.deleteDirectory(d)
  }
}
