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

  test("extension object injects the same builders without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder-time injection path
    assert(GraftExtensions.all.map(_._1.funcName).sorted ==
      Seq("graft_pack_varint", "hie_token"))
  }
}
