package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Builders for the `(doc_id, tokens, n_tok, source)` input table:
  * a deterministic synthetic corpus (seeded per-index, mirroring the
  * reference's seeded Zipf sampling at /root/reference/src/main.rs:424-447)
  * and a deterministic derivation from the driver's TPC-H-ish testdata for
  * the DuckDB-oracle queries.
  */
object TokenTables {

  /** splittable 64-bit mix (splitmix64 finalizer) — per-(seed,index,pos)
    * values independent of partitioning.
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Zipf-ish heavy-tailed token in [0, cap): pow-law tail with s≈1.5. */
  @inline def zipfToken(seed: Long, doc: Long, pos: Long, cap: Long): Int = {
    val x = mix64(seed ^ mix64(doc) ^ mix64(pos * 0x632be59bd9b4e019L))
    val u = math.max((x >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
    math.min(cap - 1, (1.0 / math.pow(u, 2.0)).toLong).toInt
  }

  val sources: Array[String] = Array("web", "code", "chat", "wiki")

  /** Deterministic synthetic corpus. Row lengths are log-normal-ish with a
    * deliberate heavy tail (one ~100k-token row per ~1000, exercising the
    * skew path). Token shape correlates with `source` — the realistic
    * locality that per-block codec auto-selection exploits: `web` (5/8 of
    * rows) is Zipf-ish (hybrid-friendly), `code` low-cardinality
    * (dict-friendly), `chat` runs (RLE-friendly), `wiki` a narrow dense
    * range (FOR/bitpack-friendly).
    */
  def synthetic(spark: SparkSession, nRows: Long, seed: Long = 42L): Dataset[TokenRow] = {
    import spark.implicits._
    spark.range(nRows).map(idx => syntheticRow(seed, idx))
  }

  /** One synthetic row — a pure function of (seed, idx), so local tools
    * (e.g. the blockIterator micro-profiler) can generate the exact bench
    * corpus rows without a Spark job.
    */
  def syntheticRow(seed: Long, idx: Long): TokenRow = {
    val h = mix64(seed ^ idx)
    val sourcePick = (h & 0x7L).toInt
    val source = sourcePick match {
      case 5 => "code"
      case 6 => "chat"
      case 7 => "wiki"
      case _ => "web"
    }
    val len =
      if (idx % 997 == 499) 100000 + (mix64(h) & 0x1ffffL).toInt // heavy tail
      else {
        val u = math.max(((h >>> 16).toDouble / (1L << 48).toDouble), 1e-12)
        math.min(2000, (25.0 * math.exp(2.2 * (u - 0.5) * 2)).toInt + 1)
      }
    val tokens = new Array[Int](len)
    var i = 0
    source match {
      case "chat" => // constant runs (RLE-friendly)
        val v = (h & 0xffffL).toInt
        while (i < len) { tokens(i) = v + (i / 64) % 3; i += 1 }
      case "wiki" => // narrow ascending range (FOR-friendly)
        val base = 1000000 + (h & 0xffffL).toInt
        while (i < len) { tokens(i) = base + i % 50; i += 1 }
      case "code" => // low cardinality (dict-friendly)
        while (i < len) { tokens(i) = ((mix64(h ^ i.toLong) & 0x7L) * 12345L).toInt; i += 1 }
      case _ => // Zipf-ish (hybrid-friendly) — the dominant shape
        while (i < len) { tokens(i) = zipfToken(seed, idx, i.toLong, 1000000000L); i += 1 }
    }
    TokenRow(f"doc-$source%s-$idx%010d", tokens, len, source)
  }

  /** Deterministic token table derived from the driver's lineitem parquet —
    * the shape used by the SQL-expressible oracle queries (see FIXTURES.md §2).
    * Must stay in lockstep with the DuckDB CTE in SparkEntry.oracleSql.
    */
  def fromLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the driver testdata; pick a
    // deterministic representative per key (min packed partkey/suppkey) so
    // doc_id is a true key in both engines.
    spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(
        min(col("l_partkey") * 100000 + col("l_suppkey")).as("pk"),
        min(col("l_returnflag")).as("source")
      )
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("doc_id"),
        expr(
          "transform(sequence(1, (l_linenumber*7) % 23 + 1), " +
            "i -> cast(((pk div 100000)*2654435761 + i*(pk % 100000)) % 65536 as bigint))"
        ).as("tokens"),
        ((col("l_linenumber") * 7) % 23 + 1).cast("int").as("n_tok"),
        col("source")
      )
  }

  /** The DuckDB-side equivalent of [[fromLineitem]], exploded to one row per
    * (doc, position, token) — prepended as a CTE to every oracle query.
    */
  val duckTokCte: String =
    """WITH lineitem_u AS (
      |  SELECT l_orderkey, l_linenumber,
      |         min(l_partkey*100000 + l_suppkey) AS pk,
      |         min(l_returnflag) AS source
      |  FROM lineitem GROUP BY 1, 2
      |), tok_base AS (
      |  SELECT l_orderkey*10 + l_linenumber AS doc_id,
      |         source,
      |         (l_linenumber*7) % 23 + 1 AS n_tok,
      |         unnest(generate_series(1, (l_linenumber*7) % 23 + 1)) AS pos,
      |         pk
      |  FROM lineitem_u
      |), tok AS (
      |  SELECT doc_id, source, n_tok, pos,
      |         ((pk // 100000)*2654435761 + pos*(pk % 100000)) % 65536 AS token
      |  FROM tok_base
      |)""".stripMargin

  /** Spark-side exploded view matching [[duckTokCte]]'s `tok`. */
  def tokExploded(spark: SparkSession, sfDir: String): DataFrame = {
    fromLineitem(spark, sfDir)
      .select(
        col("doc_id"),
        col("source"),
        col("n_tok"),
        posexplode(col("tokens")).as(Seq("pos0", "token"))
      )
      .withColumn("pos", col("pos0") + 1)
      .drop("pos0")
  }
}
