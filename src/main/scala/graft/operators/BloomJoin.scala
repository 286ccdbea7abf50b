package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (semi-join reduction).
  *
  * The classic 100 TB pattern: a selective filter on one join side
  * leaves few distinct keys, but the other side is huge, so the
  * shuffle moves mostly rows that will never match. A Bloom filter of
  * the surviving keys — built distributed, collected as a bounded
  * bit array, and re-broadcast as a literal — prunes the big side
  * BEFORE its shuffle. Spark's own runtime row-group filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this
  * opportunistically inside Parquet scans; this operator makes it an
  * explicit, composable plan step that also prunes exchange traffic.
  *
  * Correctness: a Bloom filter has no false negatives, so pruning
  * then performing the real join yields exactly the plain join's
  * rows — the oracle is ordinary SQL. False positives only cost a
  * little extra shuffle volume (rate (1-e^{-kn/m})^k; the default
  * m=1<<20, k=4 gives <1% up to ~10^5 keys; size m to the expected
  * key count at the target SF).
  *
  * Scale shape: the build side is one partial-agg shuffle producing
  * at most m/64 (bit-word, OR-mask) rows — 128 KiB of filter state
  * for m=2^20, independent of input size. The probe is a pure
  * projection over a broadcast literal array (codegen'd element_at +
  * shiftright), no UDF, so it fuses into the scan's WholeStageCodegen
  * and the filter is applied before any exchange.
  */
object BloomJoin {

  val DefaultBits: Int = 1 << 20
  val DefaultHashes: Int = 4

  /** The i-th bit position for a key: xxhash64 with seed i, mod m.
    * Deterministic and partition-order independent. */
  private def bitPos(key: Column, i: Int, m: Int): Column =
    pmod(xxhash64(lit(i), key), lit(m.toLong))

  /** Build the filter distributed: explode each key into its k bit
    * positions, partial-agg `bit_or` of single-bit masks per 64-bit
    * word. Result is a dense Array[Long] of m/64 words — bounded
    * driver state, safe to collect and broadcast as a literal. */
  def buildBits(keys: DataFrame, keyCol: String,
      m: Int = DefaultBits, k: Int = DefaultHashes): Array[Long] = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val posCols = (0 until k).map(i => bitPos(col(keyCol), i, m))
    val words = keys
      .select(explode(array(posCols: _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy("w").agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](m / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test against a literal bit array: all k probe bits
    * set. Pure codegen'd expressions — fuses into the probe scan. */
  def mightContain(key: Column, bits: Array[Long], k: Int = DefaultHashes): Column = {
    val m = bits.length * 64
    val bitsLit = lit(bits)
    (0 until k).map { i =>
      val pos = bitPos(key, i, m)
      call_function("shiftright", element_at(bitsLit, (pos / 64).cast("int") + 1),
        (pos % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Equi-join with Bloom pre-pruning of the probe side: build the
    * filter over the (filtered) build side's keys, prune `probe`
    * before its shuffle, then run the real join, which makes the
    * result exact regardless of false positives. */
  def prunedJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      m: Int = DefaultBits, k: Int = DefaultHashes): DataFrame = {
    val bits = buildBits(build.select(col(keyCol)).distinct(), keyCol, m, k)
    probe.filter(mightContain(col(keyCol), bits, k)).join(build, keyCol)
  }
}
