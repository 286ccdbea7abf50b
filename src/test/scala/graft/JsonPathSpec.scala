package graft

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonPath

/** Golden vectors recorded from jsonpath-ng 1.8.0 (`jsonpath_ng.ext
  * .parse(path).find(doc)`) over the bookstore-style document below —
  * the same library family the reference pins for its filter paths
  * (conf/pip/requirements.txt:26,48). Matches are compared as sorted
  * strings (ints as str(int), floats as str(float), which equals
  * Spark's cast-to-string for these values). */
class JsonPathSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docJson =
    """{"store":{"book":[
      |{"category":"fiction","author":"A","price":8.95,"tags":["x","y"]},
      |{"category":"tech","author":"B","price":22.99,"tags":[]},
      |{"category":"fiction","author":"C","price":8.99},
      |{"category":"poetry","author":"D","price":5.0,"isbn":"i4"}],
      |"bicycle":{"color":"red","price":19.95}},
      |"expensive":10,
      |"meta":{"owner":{"id":7,"name":"zed"},"ids":[1,2,3]}}""".stripMargin.replace("\n", "")

  private val ddl =
    """store STRUCT<
      |  book: ARRAY<STRUCT<category: STRING, author: STRING, price: DOUBLE,
      |                     tags: ARRAY<STRING>, isbn: STRING>>,
      |  bicycle: STRUCT<color: STRING, price: DOUBLE>>,
      |expensive BIGINT,
      |meta STRUCT<owner: STRUCT<id: BIGINT, name: STRING>, ids: ARRAY<BIGINT>>""".stripMargin

  private lazy val df =
    spark.read.schema(StructType.fromDDL(ddl)).json(Seq(docJson).toDS)

  private val golden: Seq[(String, Seq[String])] = Seq(
    ("$.expensive", Seq("10")),
    ("$.store.bicycle.color", Seq("red")),
    ("store.bicycle.price", Seq("19.95")),
    ("$.store.book[0].author", Seq("A")),
    ("$.store.book[-1].author", Seq("D")),
    ("$.store.book[*].price", Seq("22.99", "5.0", "8.95", "8.99")),
    ("$.store.book[0].tags[*]", Seq("x", "y")),
    ("$.store.book[:2].author", Seq("A", "B")),
    ("$.store.book[2:].author", Seq("C", "D")),
    ("$.store.book[1:3].category", Seq("fiction", "tech")),
    ("$.meta.owner.*", Seq("7", "zed")),
    ("$.meta.ids[*]", Seq("1", "2", "3")),
    ("$.meta.ids[1]", Seq("2")),
    ("$..price", Seq("19.95", "22.99", "5.0", "8.95", "8.99")),
    ("$..id", Seq("7")),
    ("$..tags[0]", Seq("x")),
    ("$.store.book[?(@.price < 10)].author", Seq("A", "C", "D")),
    ("$.store.book[?(@.category == 'fiction')].price", Seq("8.95", "8.99")),
    ("$.store.book[?(@.isbn)].author", Seq("D")),
    ("$.store.book[?(@.price >= 8.99)].price", Seq("22.99", "8.99")),
    ("$.store.book[?(@.category != 'fiction')].author", Seq("B", "D")),
    ("$.nope.deeper", Seq()),
    ("$.store.book[9].author", Seq())
  )

  golden.foreach { case (path, expected) =>
    test(s"golden jsonpath-ng vector: $path") {
      val got = df.select(JsonPath.matchStrings(df.schema, path).as("m"))
        .as[Seq[String]].head().sorted
      assert(got == expected, s"path $path")
    }
  }

  test("passPredicate: membership over matched values, false on no match") {
    def pass(path: String, values: String*): Boolean =
      df.select(JsonPath.passPredicate(df.schema, path, values).as("p"))
        .as[Boolean].head()
    assert(pass("$.store.book[*].category", "poetry"))
    assert(!pass("$.store.book[*].category", "cooking"))
    assert(pass("$.meta.owner.id", "7"))
    assert(!pass("$.meta.owner.id", "8"))
    assert(!pass("$.absent.path", "anything"))
    assert(!pass("$.store.book[9].author", "A")) // out of range: false, not null
    // complex matches never equal a scalar pass value
    assert(!pass("$.store.bicycle", "red"))
  }

  test("map-typed fields: key lookup, wildcard values, recursive descent") {
    // Avro `map` payloads decode to MapType — jsonpath-ng matches dict
    // keys, so field steps must be key lookups, not silent no-matches
    val mapDdl = "doc_id BIGINT, attrs MAP<STRING, STRING>, " +
      "nested STRUCT<inner: MAP<STRING, BIGINT>>, " +
      "items ARRAY<MAP<STRING, STRING>>"
    val mdf = spark.read.schema(StructType.fromDDL(mapDdl)).json(Seq(
      """{"doc_id":1,"attrs":{"color":"red","size":"xl"},
        |"nested":{"inner":{"count":5}},
        |"items":[{"k":"a"},{"k":"b"},{"j":"c"}]}""".stripMargin.replace("\n", "")).toDS)
    def m(path: String): Seq[String] =
      mdf.select(JsonPath.matchStrings(mdf.schema, path).as("m"))
        .as[Seq[String]].head().sorted
    assert(m("$.attrs.color") == Seq("red"))
    assert(m("$.attrs.missing") == Seq()) // missing key: no match, not error
    assert(m("$.attrs.*") == Seq("red", "xl"))
    assert(m("$.nested.inner.count") == Seq("5"))
    assert(m("$..count") == Seq("5")) // recursive descent through map values
    assert(m("$.items[*].k") == Seq("a", "b"))
    assert(m("$.items[?(@.k == 'b')].k") == Seq("b")) // predicate over array of maps
    // passPredicate over a map path
    val p = mdf.select(JsonPath.passPredicate(mdf.schema, "$.attrs.color", Seq("red")).as("p"))
      .as[Boolean].head()
    assert(p)
  }

  test("quoted predicate literal containing an operator substring parses") {
    // the op scan must skip quoted regions: != here, not the == inside
    val got = df.select(
        JsonPath.matchStrings(df.schema, "$.store.book[?(@.category != 'a==b')].author").as("m"))
      .as[Seq[String]].head().sorted
    assert(got == Seq("A", "B", "C", "D"))
  }

  test("unsupported syntax fails at parse, not silently") {
    intercept[IllegalArgumentException](JsonPath.parse("$.a[0,1]"))
    intercept[IllegalArgumentException](JsonPath.parse("$.a[0:9:2]"))
    intercept[IllegalArgumentException](JsonPath.parse("$.a[?(price < 3)]")) // no @.
    intercept[IllegalArgumentException](JsonPath.parse("$.a..["))
  }

  test("dotted fast path collapses to a plain nested-field reference") {
    val pred = JsonPath.passPredicate(df.schema, "$.store.bicycle.color", Seq("red"))
    val plan = df.filter(pred).queryExecution.optimizedPlan.toString
    // the synthetic struct(...) root must be optimized away
    assert(!plan.contains("named_struct"), plan)
  }
}
