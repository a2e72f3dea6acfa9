package graft.tools

import graft.core._

/** Standalone single-stream encode/decode CLI (the analog of the reference's
  * `encode`/`decode` file commands, /root/reference/src/main.rs:314-393):
  * reads whitespace-separated non-negative integers from a text file, encodes
  * them with the hybrid canonical-Huffman codec (context = token of previous
  * value), reports sizes, decodes back and checks equality.
  *
  * Usage: runMain graft.tools.CodecCli <input.txt> [maxBits=8] [numContexts=64]
  */
object CodecCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CodecCli <input.txt> [maxBits] [numContexts]")
    val numContexts = if (args.length > 2) args(2).toInt else 64
    require(numContexts >= 1 && numContexts <= Hybrid.MaxNumContexts, "numContexts in 1..256")

    val src = scala.io.Source.fromFile(args(0))
    val values =
      try src.mkString.split("\\s+").iterator.filter(_.nonEmpty).map(_.toLong).toArray
      finally src.close()
    require(values.forall(_ >= 0), "values must be non-negative")
    // raw mantissa width is bounded by BitReader's 57-bit read contract
    val maxValue = if (values.isEmpty) 0L else values.max
    require(
      Hybrid.tokenNBits(Hybrid.token(maxValue)) <= 57,
      s"value $maxValue needs more than 57 raw bits — beyond the bit reader's contract"
    )
    // derive the symbol-space width from the data unless explicitly given:
    // the default 8 only covers tokens of values < 2^34
    val maxBits =
      if (args.length > 1) args(1).toInt else Hybrid.requiredMaxBits(maxValue)
    require(
      (1 << maxBits) > Hybrid.maxTokenFor(maxValue),
      s"maxBits=$maxBits cannot express token ${Hybrid.maxTokenFor(maxValue)} (value $maxValue)"
    )

    val hist = new Histograms(numContexts, 1 << maxBits)
    var last = 0L
    values.foreach { v =>
      hist.add(Hybrid.chooseContext(last, numContexts), v); last = v
    }
    val tables = Huffman.buildTables(hist, maxBits)
    val w = new BitWriter()
    val headerBits = Huffman.writeHeader(tables, w)
    last = 0L
    values.foreach { v =>
      Huffman.writeValue(tables, Hybrid.chooseContext(last, numContexts), v, w); last = v
    }
    val bytes = w.toBytes

    val r = new BitReader(bytes)
    val parsed = Huffman.readHeader(r, maxBits, numContexts)
    val lut = Huffman.decoderLut(parsed)
    var mismatches = 0
    var lastDec = 0L
    values.foreach { v =>
      val d = Huffman.readValue(lut, maxBits, Hybrid.chooseContext(lastDec, numContexts), r)
      if (d != v) mismatches += 1
      lastDec = d
    }

    val payloadBits = w.bitsWritten - headerBits
    println(
      s"values=${values.length} headerBits=$headerBits payloadBits=$payloadBits " +
        s"bytes=${bytes.length} bitsPerValue=${if (values.isEmpty) 0.0 else payloadBits.toDouble / values.length} " +
        s"rawBits=${values.length * 64} ratio=${if (values.isEmpty) 0.0 else w.bitsWritten.toDouble / (values.length * 64)} " +
        s"tableHash=${parsed.tableHash} mismatches=$mismatches"
    )
    if (mismatches > 0) sys.exit(1)
  }
}
