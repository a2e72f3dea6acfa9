package graft.ops
import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  test("plan audit: capped LSH bucket join exchanges") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s")).withColumn("n_chars", length($"text"))
    val plan = Dedup.minhashNearDups(docs, threshold = 0.2).queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val nSorts = "Sort ".r.findAllIn(plan).size
    info(s"minhash plan: $nExchanges hash exchanges, $nSorts sorts, ${plan.linesIterator.size} lines")
    println("PLANAUDIT minhash exchanges=" + nExchanges)
    // window partitioning (band,bucket) must be reused by the self-join:
    // each join side = window output, so expect no extra exchange layer
    // beyond the initial (band,bucket) partitioning of each side + the
    // jaccard doc joins
    assert(nExchanges <= 8, s"unexpected exchange count in:\n$plan")
  }
  test("plan audit: Dedup.exact's cap window reuses the group-by exchange") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val plan = Dedup.exact(docs).queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    println("PLANAUDIT dedup_exact exchanges=" + nExchanges)
    // the example-list cap ranks within the SAME content_hash partitioning
    // the aggregate shuffles on — bounding the list must cost zero extra
    // exchanges (window -> partial-free final aggregate on one shuffle)
    assert(nExchanges == 1, s"cap added an exchange:\n$plan")
  }

  test("plan audit: packSequences shuffles the payload once") {
    import spark.implicits._
    val docs = (0 until 50).map(i => (f"d$i%03d", Seq.tabulate(5)(_ + i))).toDF("doc_id", "tokens")
    val (out, release) = Packing.packSequencesWithHandle(docs, seqLen = 16, numPartitions = 4)
    val plan = out.queryExecution.executedPlan.toString
    val nRange = "Exchange rangepartitioning".r.findAllIn(plan).size
    val nHash = "Exchange hashpartitioning".r.findAllIn(plan).size
    println(s"PLANAUDIT pack rangeExchanges=$nRange hashExchanges=$nHash")
    // the payload moves in the ONE range exchange feeding the persisted
    // sort (shared by both downstream branches via InMemoryRelation);
    // everything else is O(partitions): the fragment-assembly aggregate's
    // exchange (+ its partial agg pair counted once). A second payload-wide
    // exchange here is the 100 TB regression this audit exists to catch.
    assert(nRange <= 1, s"payload shuffled more than once:\n$plan")
    assert(nHash <= 1, s"unexpected hash exchanges (fragments only expected):\n$plan")
    release()
  }

  test("plan audit: lookupDocs bin filter pushes to parquet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan-audit").toString
    val cfg = graft.pipeline.GraftPipeline.Config(numContexts = 16, numBins = 8)
    val input = graft.pipeline.TokenTables.synthetic(spark, 200L, seed = 3L)
    val tables = spark.sparkContext.broadcast(
      graft.pipeline.GraftPipeline.buildTables(graft.pipeline.GraftPipeline.analyze(input, cfg), cfg))
    graft.pipeline.GraftPipeline.encode(input, tables, cfg).write.parquet(s"$dir/blocks")
    val blocks = spark.read.parquet(s"$dir/blocks").as[graft.pipeline.EncodedBlock]
    val wanted = Set(input.head().doc_id)
    val lookup = graft.pipeline.GraftPipeline.lookupDocs(blocks, wanted, tables, cfg)
    val plan = lookup.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    println("PLANAUDIT lookup pushed=" + pushed)
    // the salted-hash bin predicate must reach the parquet scan (In for
    // many bins, EqualTo when the requested ids collapse to one bin)
    assert(
      pushed.contains("In(bin") || pushed.contains("EqualTo(bin"),
      s"bin filter not pushed:\n${plan.take(2000)}"
    )
  }

  test("plan audit: dedupExact hashes below every exchange; payload never shuffles") {
    import spark.implicits._
    // a range scan, not a local Seq: ConvertToLocalRelation would otherwise
    // constant-fold the projection and leave nothing to audit
    val docs = spark
      .range(40)
      .select(
        format_string("d%03d", $"id").as("doc_id"),
        expr("transform(sequence(0, 7), j -> CAST((id % 5) * 100 + j AS INT))").as("tokens")
      )
      .withColumn("n_tok", size($"tokens"))
    val (hashed, _, losers) = graft.pipeline.Maintenance.exactDedupPlan(docs)
    // unpersist FIRST: the audit must see the real dataflow, not an
    // InMemoryTableScan hiding the scan-side projection
    hashed.unpersist()
    locally {
      val plan = losers.queryExecution.executedPlan.toString
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      println("PLANAUDIT dedup_exact_corpus exchanges=" + nExchanges)
      // expected: the group-by's exchange + the join-side re-exchange of the
      // hashed stream (the aggregate side reuses its partitioning). More
      // means the ~30 B/doc key rows shuffled redundantly.
      assert(nExchanges <= 3, s"unexpected exchange count in:\n$plan")
      // every shuffle partitions on the hash key, never the token payload —
      // the 100 TB contract of the verb
      val partitionings =
        "Exchange hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(partitionings.nonEmpty, s"no hash exchange found:\n$plan")
      partitionings.foreach { p =>
        assert(p.contains("h1") && !p.contains("tokens"), s"exchange on '$p' in:\n$plan")
      }
      // and the keeper/count aggregate combines MAP-SIDE below the exchange
      // (partial_min on the already-hashed rows), so a boilerplate hot key
      // arrives pre-reduced
      assert(plan.contains("partial_min(doc_id"), s"no map-side combine in:\n$plan")
    }
  }
}
