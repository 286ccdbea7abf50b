package graft.tools

/** Deterministic fingerprint of a testdata directory (FIXTURES
  * measurement-record stamp, judge brief r17 #6).
  *
  * The r16 FIXTURES continuation found two measurements on SILENTLY
  * different data: a regenerated skew directory had a 199,484-item hot
  * basket where the earlier one had 10,000, and both records read as
  * "the sf1 skew dir". The id makes that impossible: every ScaleGen
  * generation and every Verify run prints `datagen_id=<12 hex>` for
  * the directory it read, and FIXTURES entries cite it.
  *
  * The id is an md5 over the sorted (relative-path, byte-length) set
  * of every parquet file under the directory — a footer-set proxy
  * that needs no parquet parsing: regenerating data virtually always
  * changes at least one file's length (row counts, dictionary sizes,
  * compression), while re-READING the same files is stable across
  * mtime changes and copies.
  */
object DataGenId {
  def of(dir: String): String = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return "missing-dir"
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".parquet") &&
          java.nio.file.Files.isRegularFile(p))
        entries += s"${root.relativize(p)}:${java.nio.file.Files.size(p)}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(entries.sorted.mkString("\n").getBytes("UTF-8"))
    md.digest().map(b => f"$b%02x").mkString.take(12)
  }
}
