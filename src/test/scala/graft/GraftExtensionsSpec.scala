package graft

import graft.core.Hybrid
import graft.pipeline.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface: the same builder list serves
  * SparkSessionExtensions injection and live-session registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("hie_token in SQL matches the codec core (incl. int widening)") {
    GraftExtensions.register(spark)
    val rows = spark
      .sql("""SELECT v, hie_token(v) AS t
              FROM VALUES (0), (15), (16), (17), (255), (65535), (2147483647) AS x(v)""")
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == Hybrid.token(r.getInt(0).toLong), s"v=${r.getInt(0)}")
    }
  }

  test("graft_pack_varint in SQL matches the codec kernel") {
    GraftExtensions.register(spark)
    val got = spark
      .sql("SELECT graft_pack_varint(array(0, 1, 127, 128, 65535, 2147483647)) AS b")
      .head()
      .getAs[Array[Byte]](0)
    val want = graft.codec.VarInt.pack(Array(0, 1, 127, 128, 65535, 2147483647))
    assert(got.toSeq == want.toSeq)
  }

  test("graft_token_sum in SQL: exact sums, null elements ignored, null array is null") {
    GraftExtensions.register(spark)
    val r = spark
      .sql(
        "SELECT graft_token_sum(array(1, 2, 3)) AS a, " +
          "graft_token_sum(array(2147483647, 2147483647, 5)) AS b, " + // past int overflow
          "graft_token_sum(array(1, cast(null AS int), 2)) AS c, " +
          "graft_token_sum(cast(null AS array<int>)) AS d"
      )
      .head()
    assert(r.getLong(0) == 6L)
    assert(r.getLong(1) == 2L * Int.MaxValue + 5L)
    assert(r.getLong(2) == 3L)
    assert(r.isNullAt(3))
    // parity with the HOF form on a seeded random array (interpreted eval
    // and codegen both covered by the two projections)
    val pair = spark
      .sql(
        "SELECT graft_token_sum(a) AS k, aggregate(a, 0L, (s, x) -> s + x) AS h FROM " +
          "(SELECT transform(sequence(1, 1000), i -> cast(hash(i, 7) AS int)) AS a)"
      )
      .head()
    assert(pair.getLong(0) == pair.getLong(1))
  }

  test("extension object injects the same builders without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder-time injection path
    assert(GraftExtensions.all.map(_._1.funcName).sorted ==
      Seq("graft_pack_varint", "graft_token_sum", "hie_token"))
  }
}
