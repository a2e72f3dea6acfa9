package graft

import graft.pipeline.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's t1 smoke gate: SparkEntry.entry must return rows. */
class EntrySmokeSpec extends AnyFunSuite {
  test("entry returns a non-empty flagship summary on sf0.001") {
    val df = SparkEntry.entry(SparkTestBase.spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the summary carries the roundtrip mismatch count — must be zero
    assert(rows.forall(_.getAs[Long]("n_mismatches") == 0L))
  }
}
