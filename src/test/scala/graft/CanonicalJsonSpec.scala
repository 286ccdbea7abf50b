package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, PyFloat}

/** Golden vectors recorded from CPython 3:
  *   repr(x) for floats, and
  *   (json.dumps(d, sort_keys=True), md5(s.encode()).hexdigest()[:16]).
  * The hash must match the reference byte-for-byte
  * (firebase/app/utils.py:29-33). */
class CanonicalJsonSpec extends AnyFunSuite with SparkTestBase {

  test("PyFloat.repr matches CPython repr golden vectors") {
    val golden = Seq(
      0.0 -> "0.0", -0.0 -> "-0.0", 1.0 -> "1.0", -1.5 -> "-1.5",
      0.1 -> "0.1", 185.22 -> "185.22", 1e-4 -> "0.0001",
      1.0000000000000002e-4 -> "0.00010000000000000002",
      1e-5 -> "1e-05", 123456789.123 -> "123456789.123",
      1e15 -> "1000000000000000.0", 1e16 -> "1e+16", 1.5e16 -> "1.5e+16",
      -2.5e-7 -> "-2.5e-07", 3.141592653589793 -> "3.141592653589793",
      2.2250738585072014e-308 -> "2.2250738585072014e-308",
      1.7976931348623157e308 -> "1.7976931348623157e+308",
      100.0 -> "100.0", 0.5 -> "0.5",
      0.3333333333333333 -> "0.3333333333333333")
    golden.foreach { case (d, want) =>
      assert(PyFloat.repr(d) == want, s"repr($d)")
    }
  }

  test("canonical_json + canonical_hash match CPython json.dumps golden vectors") {
    import spark.implicits._
    // {"a": 1, "b": "x"}
    val df1 = Seq((1L, "x")).toDF("a", "b")
      .select(GraftFunctions.canonical_json(struct($"a", $"b")).as("j"),
              GraftFunctions.canonical_hash(struct($"a", $"b")).as("h"))
    val r1 = df1.head()
    assert(r1.getString(0) == """{"a": 1, "b": "x"}""")
    assert(r1.getString(1) == "4f5f4713d180fb0c")

    // {"a": true, "m": false, "z": null} — key sort + bool + null
    val df2 = Seq((true, false, Option.empty[String])).toDF("a", "m", "z")
      .select(GraftFunctions.canonical_json(struct($"z", $"a", $"m")).as("j"),
              GraftFunctions.canonical_hash(struct($"z", $"a", $"m")).as("h"))
    val r2 = df2.head()
    assert(r2.getString(0) == """{"a": true, "m": false, "z": null}""")
    assert(r2.getString(1) == "48ee44e442efd1f0")

    // nested struct + array + non-ascii + escapes
    val df3 = Seq(("line\nbreak\t\"quote\" \\ back", "é中", 1L, 2.5, "s"))
      .toDF("t", "y", "q1", "q2", "q3")
      .select(GraftFunctions.canonical_json(struct(
        struct(struct($"y").as("p"),
               array($"q1".cast("double"), $"q2", lit(null).cast("double")).as("qn"))
          .as("nested"),
        $"t")).as("j"))
    // cross-check a simpler exact golden: {"f": 185.22, "g": -0.0, "h": 1e+16}
    val df4 = Seq((185.22, -0.0, 1e16)).toDF("f", "g", "h")
      .select(GraftFunctions.canonical_json(struct($"f", $"g", $"h")).as("j"),
              GraftFunctions.canonical_hash(struct($"f", $"g", $"h")).as("hh"))
    val r4 = df4.head()
    assert(r4.getString(0) == """{"f": 185.22, "g": -0.0, "h": 1e+16}""")
    assert(r4.getString(1) == "28d21b6fa226b9dd")

    // escapes + unicode golden: {"ctrl": "", "emoji": surrogate pair}
    val df5 = Seq(("\u0001\u001f", "😀")).toDF("ctrl", "emoji")
      .select(GraftFunctions.canonical_json(struct($"ctrl", $"emoji")).as("j"),
              GraftFunctions.canonical_hash(struct($"ctrl", $"emoji")).as("h"))
    val r5 = df5.head()
    assert(r5.getString(0) == "{\"ctrl\": \"\\u0001\\u001f\", \"emoji\": \"\\ud83d\\ude00\"}")
    assert(r5.getString(1) == "45663e74ee79aae4")

    // non-string map keys sort by NATIVE value like CPython sort_keys:
    // json.dumps({2:'b',10:'a'}) == '{"2": "b", "10": "a"}'
    val dfm = Seq(1).toDF("x").select(
      GraftFunctions.canonical_json(typedLit(Map(10 -> "a", 2 -> "b"))).as("ji"),
      GraftFunctions.canonical_hash(typedLit(Map(10 -> "a", 2 -> "b"))).as("hi"),
      GraftFunctions.canonical_json(typedLit(Map(10.25 -> "y", 2.5 -> "x"))).as("jf"),
      GraftFunctions.canonical_hash(typedLit(Map(10.25 -> "y", 2.5 -> "x"))).as("hf"))
    val rm = dfm.head()
    assert(rm.getString(0) == """{"2": "b", "10": "a"}""")
    assert(rm.getString(1) == "43e1ccd9d325d1c3")
    assert(rm.getString(2) == """{"2.5": "x", "10.25": "y"}""")
    assert(rm.getString(3) == "a27d89a9b614d08a")

    // full nested golden
    val r3 = df3.head()
    assert(r3.getString(0) ==
      "{\"nested\": {\"p\": {\"y\": \"\\u00e9\\u4e2d\"}, \"qn\": [1.0, 2.5, null]}, " +
      "\"t\": \"line\\nbreak\\t\\\"quote\\\" \\\\ back\"}")
  }
}
