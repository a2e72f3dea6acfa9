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

  test("releaseCorpora unpersists every cached corpus (Verify teardown contract)") {
    val spark = SparkTestBase.spark
    SparkEntry.releaseCorpora(spark) // drop anything the entry test cached
    // other suites cache their own fixtures in the shared session, so
    // assert relative to a baseline rather than absolute emptiness
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.encodedCorpus(spark, "/root/testdata/sf0.001").blocks.count()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(baseline).nonEmpty)
    SparkEntry.releaseCorpora(spark)
    assert(spark.sparkContext.getPersistentRDDs.keySet == baseline)
  }
}
