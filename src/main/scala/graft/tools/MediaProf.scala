package graft.tools

import graft.operators.MediaCodec

/** Single-thread micro-profile of the JPEG family's per-image
  * components (judge brief r19 #4): isolates where the banded query's
  * wall actually goes — encode (trig + AC-coefficient Huffman), decode
  * (Huffman/dequant/IDCT), raster copy, band compare — so the
  * constant-factor work targets the measured hot stage instead of a
  * guess. Usage: runMain graft.tools.MediaProf [nIds]
  */
object MediaProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val ids = (0L until n.toLong).toArray

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm-up for JIT on a prefix
    ids.take(2000).foreach { id =>
      val v = MediaCodec.encodeJpegVarying(id)
      MediaCodec.decodeJpegBanded(id, v)
      val c = MediaCodec.encodeJpeg(id)
      MediaCodec.decodeJpegFeatures(id, c)
    }

    val constant = time("encodeJpeg(const)") { ids.map(MediaCodec.encodeJpeg) }
    time("decodeFeatures(const)") {
      var i = 0; while (i < n) { MediaCodec.decodeJpegFeatures(ids(i), constant(i)); i += 1 }
    }
    val varying = time("encodeJpegVarying") { ids.map(MediaCodec.encodeJpegVarying) }
    time("decodeGrayRaster") {
      var i = 0; while (i < n) { MediaCodec.decodeGrayRaster(varying(i)); i += 1 }
    }
    time("decodeJpegBanded") {
      var i = 0; while (i < n) { MediaCodec.decodeJpegBanded(ids(i), varying(i)); i += 1 }
    }
    println(f"avg varying payload bytes: ${varying.map(_.length.toLong).sum / n}%d" +
      f"  const: ${constant.map(_.length.toLong).sum / n}%d")
  }
}
