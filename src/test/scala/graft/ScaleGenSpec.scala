package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleGen contract: factor× rows (dimensions exempt), referential
  * integrity across the remapped keys, linear (not clique-forming)
  * document scaling, norm-preserving embedding rotation. */
class ScaleGenSpec extends AnyFunSuite with SparkTestBase {
  private val src = "/root/testdata/sf0.001"
  private val factor = 3

  private def gen(name: String) =
    ScaleGen.scaleTable(spark, name, spark.read.parquet(s"$src/$name.parquet"), factor)

  test("row counts scale by factor; fixed dimensions do not") {
    assert(gen("lineitem").count() == factor * 6000L)
    assert(gen("documents").count() == factor * 500L)
    assert(gen("region").count() == 5L)
    assert(gen("nation").count() == 25L)
  }

  test("referential integrity holds across remapped keys") {
    val o = gen("orders").cache()
    val l = gen("lineitem").cache()
    try {
      assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)
      assert(o.join(gen("customer"), o("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
      assert(l.join(gen("part"), l("l_partkey") === col("p_partkey"), "left_anti").count() == 0)
      assert(l.join(gen("supplier"), l("l_suppkey") === col("s_suppkey"), "left_anti").count() == 0)
    } finally { o.unpersist(); l.unpersist() }
  }

  test("keys stay unique after remapping") {
    val d = gen("documents")
    assert(d.select("doc_id").distinct().count() == d.count())
    val e = gen("events")
    assert(e.select("event_id").distinct().count() == e.count())
  }

  test("document copies tag the vocabulary: no cross-copy shingle overlap, same word counts") {
    val d = gen("documents").withColumn("c", (col("doc_id") % factor).cast("int"))
      .withColumn("wc", size(split(col("text"), " "))).cache()
    try {
      // word counts identical across the copies of each source doc
      val wcSpread = d.groupBy((col("doc_id") / factor).cast("long").as("orig"))
        .agg((max("wc") - min("wc")).as("spread"))
        .agg(max("spread")).head().getInt(0)
      assert(wcSpread == 0, "tagging changed token counts")
      // vocabularies of different copies are disjoint (c encoded in words)
      val vocab = d.select(col("c"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(countDistinct("c").as("nc"))
        .agg(max("nc")).head().getLong(0)
      assert(vocab == 1L, "a word appears in more than one copy's vocabulary")
      // n_chars matches the tagged text
      assert(d.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    } finally d.unpersist()
  }

  test("generated directory loads through Tables like driver data (no NTZ leak via Spark footer metadata)") {
    // Spark-written parquet embeds the catalyst schema in the footer;
    // an un-normalized TIMESTAMP_NTZ there would bypass the loader's
    // inference-off read and break every ts consumer (caught live on
    // the first sf1.0 sweep). generate() must produce a directory the
    // loader reads EXACTLY like pyarrow-written driver data.
    val out = java.nio.file.Files.createTempDirectory("graft-scalegen-out").toString
    ScaleGen.generate(spark, src, out, 2)
    val ev = Tables.events(spark, out)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    // instants preserved: same min epoch-nanos as the source (copies
    // share timestamps)
    val srcMin = Tables.events(spark, src).agg(min("ts")).head().getLong(0)
    assert(ev.agg(min("ts")).head().getLong(0) == srcMin)
    // date columns come back as plain TIMESTAMP, as with driver data
    assert(Tables.orders(spark, out).schema("o_orderdate").dataType
      == org.apache.spark.sql.types.TimestampType)
    assert(Tables.lineitem(spark, out).schema("l_shipdate").dataType
      == org.apache.spark.sql.types.TimestampType)
  }

  test("skew mode: one hot order/user carries ~pct of fact rows, FK + schema intact") {
    val out = java.nio.file.Files.createTempDirectory("graft-skewgen-out").toString
    ScaleGen.generate(spark, src, out, 2, skewPct = 20)
    val l = spark.read.parquet(s"$out/lineitem.parquet").cache()
    val e = spark.read.parquet(s"$out/events.parquet").cache()
    try {
      // the hot key's share is ~20% (hash Bernoulli: generous band)
      val n = l.count()
      val topShare = l.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0).toDouble / n
      assert(topShare > 0.15 && topShare < 0.25, f"hot order share $topShare%.3f")
      val ne = e.count()
      val topUser = e.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0).toDouble / ne
      assert(topUser > 0.15 && topUser < 0.25, f"hot user share $topUser%.3f")
      // referential integrity survives the remap (hot keys are real keys)
      val o = spark.read.parquet(s"$out/orders.parquet")
      assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)
      // loader-visible schema identical to unskewed generation
      assert(Tables.lineitem(spark, out).schema ==
        Tables.lineitem(spark, src).schema)
      assert(Tables.events(spark, out).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
    } finally { l.unpersist(); e.unpersist() }
  }

  test("embedding rotation preserves vector size and norm") {
    val e = gen("embeddings")
      .withColumn("c", (col("vec_id") % factor).cast("int"))
      .withColumn("sz", size(col("embedding")))
      .withColumn("norm", aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x))
    val base = e.filter(col("c") === 0)
      .select((col("vec_id") / factor).cast("long").as("orig"),
        col("sz").as("sz0"), col("norm").as("n0"))
    val rot = e.filter(col("c") =!= 0)
      .select((col("vec_id") / factor).cast("long").as("orig"), col("sz"), col("norm"))
    val bad = rot.join(base, "orig")
      .filter(col("sz") =!= col("sz0") ||
        abs(col("norm") - col("n0")) > lit(1e-3) * (col("n0") + lit(1e-9)))
      .count()
    assert(bad == 0, "rotation changed vector size or norm")
  }
}
