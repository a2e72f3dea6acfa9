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

  test("graft_sample in SQL: same membership as the scan option's hash, nests, defaults seed") {
    GraftExtensions.register(spark)
    val rows = spark
      .sql(
        """SELECT id, graft_sample(id, 0.2, 7) AS k20, graft_sample(id, 0.05, 7) AS k5,
          |       graft_sample(id, 0.2) AS k20s0
          |FROM (SELECT cast(id AS string) AS id FROM range(0, 5000))""".stripMargin
      )
      .collect()
    // twin of sources.DocSample.keep: mix62(hashChars(id) ^ mix62(seed)) ppm test
    def keep(id: String, ppm: Int, seed: Long): Boolean =
      graft.ops.XHash.mix62(
        graft.ops.XHash.hashChars(id) ^ graft.ops.XHash.mix62(seed)) % 1000000L < ppm
    rows.foreach { r =>
      assert(r.getBoolean(1) == keep(r.getString(0), 200000, 7L), r.getString(0))
      assert(r.getBoolean(3) == keep(r.getString(0), 200000, 0L), r.getString(0))
      // nesting: 5% membership is a subset of 20%
      if (r.getBoolean(2)) assert(r.getBoolean(1), s"${r.getString(0)} kept at 5% but not 20%")
    }
    val kept = rows.count(_.getBoolean(1))
    assert(kept > 700 && kept < 1300, s"~20% of 5000 expected, got $kept")
    // integer doc_ids are cast to the same decimal-string hash domain
    val viaInt = spark
      .sql("SELECT count(*) FROM range(0, 5000) WHERE graft_sample(id, 0.2, 7)")
      .head().getLong(0)
    assert(viaInt == kept.toLong)
    // non-literal fraction is refused at analysis
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sample('x', rand(), 1)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("extension object injects the same builders without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder-time injection path
    assert(GraftExtensions.all.map(_._1.funcName).sorted ==
      Seq("graft_pack_varint", "graft_sample", "graft_token_fold", "graft_token_sum", "hie_token"))
  }
}
