package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class FsstSpec extends AnyFunSuite {

  def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  val docIds: IndexedSeq[Array[Byte]] =
    (0 until 2000).map(i => bytes(f"doc-web-$i%010d"))

  val words: IndexedSeq[Array[Byte]] = {
    val vocab = Array("the", "fast", "key", "order", "sort", "table", "scan", "merge")
    (0 until 500).map { i =>
      bytes((0 until 12).map(j => vocab((i * 7 + j * 13) % vocab.length)).mkString(" "))
    }
  }

  test("roundtrip on shared-prefix ids") {
    val table = Fsst.train(docIds)
    for (d <- docIds) {
      assert(new String(table.decode(table.encode(d)), UTF_8) == new String(d, UTF_8))
    }
  }

  test("roundtrip on word-like text") {
    val table = Fsst.train(words)
    for (w <- words) {
      assert(table.decode(table.encode(w)).sameElements(w))
    }
  }

  test("compresses shared-prefix ids well") {
    val table = Fsst.train(docIds)
    val raw = docIds.map(_.length).sum
    val enc = docIds.map(d => table.encodedLength(d)).sum + table.serializedLength
    assert(enc < raw / 2, s"fsst $enc vs raw $raw")
  }

  test("encodedLength matches actual encoding") {
    val table = Fsst.train(words)
    for (w <- words.take(50)) assert(table.encodedLength(w) == table.encode(w).length)
  }

  test("table serialization roundtrips") {
    val table = Fsst.train(docIds)
    val (loaded, consumed) = FsstTable.deserialize(table.serialize)
    assert(consumed == table.serializedLength)
    assert(loaded.symbols.length == table.symbols.length)
    for (d <- docIds.take(100))
      assert(loaded.decode(table.encode(d)).sameElements(d))
  }

  test("empty and binary-ish inputs survive") {
    val table = Fsst.train(IndexedSeq(bytes("abc")))
    assert(table.decode(table.encode(Array.emptyByteArray)).isEmpty)
    val bin = Array[Byte](-1, 0, 127, -128, 42)
    assert(table.decode(table.encode(bin)).sameElements(bin))
  }

  test("training is deterministic") {
    val t1 = Fsst.train(docIds)
    val t2 = Fsst.train(docIds)
    assert(t1.serialize.sameElements(t2.serialize))
  }
}
