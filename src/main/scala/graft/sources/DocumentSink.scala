package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Destination abstraction for the Firestore/RTDB write path
  * (reference A14/A15: micro-batched WriteBatch upserts,
  * firebase/app/artifacts.py:302-327, doc ref = {target_path}/{id},
  * helpers.py:98-103).
  *
  * Implementations must be idempotent upserts keyed by (targetPath,
  * docId) — `set` semantics — so at-least-once replays converge
  * (artifacts.py:405-406). A real Firestore implementation would wrap
  * the Admin SDK WriteBatch; tests and the oracle use the local
  * filesystem sink below. Instances are created executor-side (one per
  * partition) by the streaming pipeline — no driver funneling.
  */
trait DocumentSink extends Serializable {
  /** Max docs per commit batch (MAX_SUBMIT = 50, artifacts.py:304). */
  def maxSubmit: Int = 50

  /** Upsert one batch (≤ maxSubmit docs) atomically-ish. */
  def commitBatch(docs: Seq[DocumentSink.Doc]): Unit

  /** Connection test (reference A19: test_connection creates a ref and
    * maps failure to an error, artifacts.py:112-124). */
  def testConnection(): Either[String, Unit] = Right(())

  /** Stream of docs → batched commits, preserving iterator laziness. */
  final def upsertAll(docs: Iterator[DocumentSink.Doc]): Long = {
    var n = 0L
    docs.grouped(maxSubmit).foreach { g => commitBatch(g); n += g.size }
    n
  }
}

object DocumentSink {
  /** One document write: destination collection path, doc id, JSON body. */
  final case class Doc(targetPath: String, docId: String, json: String)
}

/** CFS read surface (reference A16: `read_cfs`, helpers.py:106-110 —
  * a single document's dict with a doc id, the whole collection's
  * dicts without one; `cfs_ref` alternation helpers.py:98-103). Read
  * APIs live on a separate trait so write-only sinks (a real
  * Firestore WriteBatch wrapper) aren't forced to implement reads. */
trait DocumentReader {
  /** read_cfs(path, doc_id): the document's JSON, None when absent. */
  def readDoc(targetPath: String, docId: String): Option[String]
  /** read_cfs(path): every (docId, json) in the collection. */
  def readCollection(targetPath: String): Seq[(String, String)]
}

/** Filesystem document store emulating Firestore's collection/document
  * layout: {root}/{target_path}/{doc_id}.json. Writes are atomic
  * (tmp + move) so replays/overwrites are safe; doc id is the file
  * name, making the upsert idempotent by construction. */
final class JsonFileSink(root: String) extends DocumentSink with DocumentReader {
  override def testConnection(): Either[String, Unit] = {
    val dir = new java.io.File(root)
    if ((dir.exists || dir.mkdirs()) && dir.canWrite) Right(())
    else Left(s"sink root not writable: $root")
  }

  /** Doc ids and path segments come from message content — encode
    * anything that could escape the layout ('/', '..', '\') so the
    * (targetPath, docId) key can't traverse outside the root. */
  private def sanitize(segment: String): String =
    segment.flatMap {
      case c if c.isLetterOrDigit || c == '-' || c == '_' || c == '.' => c.toString
      case c => f"%%${c.toInt}%02x"
    } match {
      case s if s == "." || s == ".." => s.replace(".", "%2e")
      case s => s
    }

  private def collectionDir(targetPath: String): java.nio.file.Path = {
    val rootPath = Paths.get(root).toAbsolutePath.normalize
    val dir = targetPath.split("/").filter(_.nonEmpty)
      .foldLeft(rootPath)((p, seg) => p.resolve(sanitize(seg))).normalize
    require(dir.startsWith(rootPath), s"path escapes sink root: $targetPath")
    dir
  }

  // Per-doc write cost discipline (r20): the old path paid FOUR
  // filesystem/entropy ops per document — createDirectories (even
  // when the dir existed), Files.createTempFile (a SecureRandom name
  // draw + create-retry loop, which CONTENDS across writer tasks:
  // the 32-task parallel store write burned 13× the CPU per doc of
  // the serial one, all in metadata ops), the data write, and the
  // atomic move. Now: the mkdir is memoized per collection (sink
  // instances are per-task), and the tmp name is a cheap unique
  // (pid, thread, counter) triple — unique per live writer by
  // construction, and a stale crash leftover with the same name is
  // simply truncated and re-moved, which the idempotent-upsert
  // contract already permits. Readers never see tmp files (they
  // filter on the .json suffix); the write remains tmp+ATOMIC_MOVE.
  @transient private lazy val mkdirSeen =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  @transient private lazy val tmpSeq =
    new java.util.concurrent.atomic.AtomicLong()
  @transient private lazy val pid = ProcessHandle.current().pid()

  override def commitBatch(docs: Seq[DocumentSink.Doc]): Unit =
    docs.foreach { d =>
      val dir = collectionDir(d.targetPath)
      if (mkdirSeen.add(dir.toString)) Files.createDirectories(dir)
      val tmp = dir.resolve(
        s".doc-$pid-${Thread.currentThread().getId}-${tmpSeq.incrementAndGet()}.tmp")
      Files.write(tmp, d.json.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(s"${sanitize(d.docId)}.json"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }

  override def readDoc(targetPath: String, docId: String): Option[String] = {
    val f = collectionDir(targetPath).resolve(s"${sanitize(docId)}.json")
    if (Files.exists(f)) Some(Files.readString(f)) else None
  }

  override def readCollection(targetPath: String): Seq[(String, String)] = {
    val dir = collectionDir(targetPath)
    if (!Files.isDirectory(dir)) Nil
    else {
      val files = Files.list(dir)
      try files.iterator().asScala
        .filter(f => f.getFileName.toString.endsWith(".json"))
        .map(f => f.getFileName.toString.stripSuffix(".json") -> Files.readString(f))
        .toSeq.sortBy(_._1)
      finally files.close()
    }
  }
}
