package graft

import java.nio.file.Files

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** Generic RTDB/CFS read-write surface (reference A15/A16,
  * helpers.py:69-114), mirroring firebase/tests/test_unit.py:53-85:
  * RTDB scalar/list/map round-trips, CFS doc set/get/delete, and the
  * collection/doc path alternation. */
class RtdbCfsSpec extends AnyFunSuite {

  private def tmp(): String = Files.createTempDirectory("graft-rtdb").toString

  test("rtdb: get of unset path is None; scalar/list/map values round-trip (test_unit.py:53-60)") {
    val db = new JsonTreeRtdb(s"${tmp()}/tree.json")
    assert(db.get("/some/path") == JNothing)
    val values: Seq[JValue] = Seq(
      JInt(1), JDouble(1.0), JString("a"),
      JArray(List(JInt(1), JInt(2), JInt(3))),
      JObject(List("a" -> JString("b"))))
    values.foreach { v =>
      db.set("/some/path", v)
      assert(db.get("/some/path") == v, v)
    }
  }

  test("rtdb: subtree get/set and delete prune correctly") {
    val db = new JsonTreeRtdb(s"${tmp()}/tree.json")
    db.set("a/b/c", JInt(1))
    db.set("a/b/d", JInt(2))
    assert(db.get("a/b") == JObject(List("c" -> JInt(1), "d" -> JInt(2))))
    db.set("a/b/c", JNothing) // delete
    assert(db.get("a/b/c") == JNothing)
    assert(db.get("a/b") == JObject(List("d" -> JInt(2))))
    // setting a subtree replaces, not merges (RTDB set semantics)
    db.set("a/b", JString("flat"))
    assert(db.get("a/b") == JString("flat"))
  }

  test("rtdb: persists across store instances (it is a file, not memory)") {
    val f = s"${tmp()}/tree.json"
    new JsonTreeRtdb(f).set("x/y", JInt(42))
    assert(new JsonTreeRtdb(f).get("x/y") == JInt(42))
  }

  test("rtdb helpers: hash get/set and intended needs-update semantics (helpers.py:49-67)") {
    val db = new JsonTreeRtdb(s"${tmp()}/tree.json")
    val hp = "_aether/hashes"
    assert(RtdbHelpers.getRemoteHash(db, hp, "e1").isEmpty)
    // no stored hash: needs update (helpers.py:63-64)
    assert(RtdbHelpers.remoteMsgNeedsUpdate(db, hp, "e1", "aaaa"))
    RtdbHelpers.setRemoteHash(db, hp, "e1", "aaaa")
    assert(RtdbHelpers.getRemoteHash(db, hp, "e1").contains("aaaa"))
    // same hash: no update (helpers.py:65-66)
    assert(!RtdbHelpers.remoteMsgNeedsUpdate(db, hp, "e1", "aaaa"))
    // changed hash: update (intended semantics; the reference's falsy
    // None here is the documented latent bug)
    assert(RtdbHelpers.remoteMsgNeedsUpdate(db, hp, "e1", "bbbb"))
  }

  test("cfs: doc set/get/delete-equivalent round-trip (test_unit.py:63-70)") {
    val root = tmp()
    val sink = new JsonFileSink(root)
    val doc = """{"key":"t_val"}"""
    sink.commitBatch(Seq(DocumentSink.Doc("test", "adoc", doc)))
    assert(sink.readDoc("test", "adoc").contains(doc))
    assert(sink.readDoc("test", "missing").isEmpty)
  }

  test("cfs: collection/doc alternation write + read back (test_unit.py:73-85)") {
    val root = tmp()
    val sink = new JsonFileSink(root)
    // c/d/c path + doc id, as the reference's read_write_path test
    val path = "_aether/entity/type-of-entity"
    val msg = """{"hello":"cfs!"}"""
    sink.commitBatch(Seq(DocumentSink.Doc(path, "some-id", msg)))
    assert(sink.readDoc(path, "some-id").contains(msg))
    // whole-collection read (read_cfs without doc_id, helpers.py:110)
    sink.commitBatch(Seq(DocumentSink.Doc(path, "other-id", """{"n":2}""")))
    assert(sink.readCollection(path) ==
      Seq("other-id" -> """{"n":2}""", "some-id" -> msg))
    assert(sink.readCollection("nope/x/y").isEmpty)
  }
}
