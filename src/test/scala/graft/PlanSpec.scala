package graft

import org.apache.spark.sql.execution.SparkPlan

import graft.queries.{Events, Tpch, Tpch2, Windows}

/** Plan-shape regression tests — the 100 TB posture encoded as
  * assertions, so a refactor that silently loses a pushdown or turns a
  * broadcast into a shuffle fails CI, not a cluster bill. */
class PlanSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def shuffles(p: SparkPlan): Int =
    "Exchange (hash|range)partitioning".r.findAllIn(p.toString).size

  test("s1 scan: ts range filter and 5-column projection reach parquet") {
    val plan = executed(Events.scanRange(spark, sf001)).toString
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(ts"), plan)
    assert(plan.contains("LessThanOrEqual(ts"), plan)
    // ts is bigint when the file stores raw nanos (legacy), timestamp_ntz
    // when it stores µs — pushdown must hold in either physical shape
    assert("ReadSchema: struct<event_id:bigint,ts:(bigint|timestamp_ntz|timestamp),user_id:bigint,event_type:string,value:double"
      .r.findFirstIn(plan).isDefined, plan)
  }

  test("q3: dimension joins broadcast, no sort-merge join") {
    val plan = executed(Tpch.q3Shipping(spark, sf001)).toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q1: aggregation is partial (map-side combine before the exchange)") {
    val plan = executed(Tpch.q1Pricing(spark, sf001)).toString
    // two HashAggregates around one exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("as-of join shuffles exactly twice (key exchange + output sort)") {
    // one exchange hash-partitions the union by key for the window; the
    // second is only the deterministic ORDER BY for the oracle.
    val p = executed(Windows.asofJoin(spark, sf001))
    assert(shuffles(p) == 2, p.toString)
  }

  test("j11 tolerance rides j6's plan: still exactly two shuffles") {
    // the staleness bound is a per-row predicate on the found match —
    // it must not add an exchange (or, worse, become a range join)
    val p = executed(Windows.asofJoinTolerance(spark, sf001))
    assert(shuffles(p) == 2, p.toString)
    assert(!p.toString.contains("NestedLoop"), p.toString)
  }

  test("w6: the RANGE frame costs one key exchange, like any window") {
    val p = executed(Windows.trailingRange(spark, sf001))
    // hash exchange for the user_id partition + range for the output sort
    assert(shuffles(p) == 2, p.toString)
  }

  test("s2: NanosPushdownRule pushes derived-ts range onto the stored scan") {
    val plan = Events.scanDerived(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // 2024-01-10T00:00Z = 1704844800 s. Exact pushed bound in either
    // physical shape: raw-ns Long (legacy TIMESTAMP(NANOS) data) or µs
    // timestamp (current data, rule unwraps the NTZ→TZ cast).
    assert(plan.contains("GreaterThanOrEqual(ts,1704844800000000000)") ||
           plan.contains("GreaterThanOrEqual(ts,2024-01-10T00:00)"), plan)
    assert(plan.contains("LessThanOrEqual(ts,1705708800000000999)") ||
           plan.contains("LessThanOrEqual(ts,2024-01-20T00:00)"), plan)
  }

  test("nanos rule: UTC alias zones (Etc/UTC) keep the rewrite alive") {
    // pinning to an EQUIVALENT zone spelling must not silently disable
    // the shape-2 pushdown (utcCast normalizes via ZoneId, not string
    // equality against "UTC")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Etc/UTC")
      val plan = Events.scanDerived(spark, sf001).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("GreaterThanOrEqual(ts,1704844800000000000)") ||
             plan.contains("GreaterThanOrEqual(ts,2024-01-10T00:00)"), plan)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("nanos rule: near-max derived-ns upper bound skips the rewrite") {
    // ns < (Long.MaxValue - 5): ceil1000's v+999 would wrap negative and
    // the added conjunct (micros <= negative) would over-filter to ZERO
    // rows. The guard must skip the rewrite; the predicate keeps all rows.
    graft.plans.NanosPushdownRule.install(spark)
    import org.apache.spark.sql.functions._
    val raw = graft.Tables.eventsRawTs(spark, sf001)
    val total = raw.count()
    val bounded = raw.where(col("ts") < (Long.MaxValue - 5L)).count()
    assert(total > 0 && bounded == total)
  }

  test("nanos rule: far-future upper bound skips the rewrite instead of overflowing") {
    // ts <= TIMESTAMP '9999-12-31' as an open upper bound: micros*1000
    // overflows Long; the wrapped negative conjunct used to filter out
    // every row. The rule must skip the rewrite and keep all rows.
    graft.plans.NanosPushdownRule.install(spark)
    import org.apache.spark.sql.functions._
    val total = graft.Tables.events(spark, sf001).count()
    val bounded = graft.Tables.events(spark, sf001)
      .where(col("ts") <= lit("9999-12-31 00:00:00").cast("timestamp"))
      .count()
    assert(total > 0 && bounded == total)
  }

  test("q15: lineitem is scanned once (persisted diamond, not a second agg subtree)") {
    val plan = executed(Tpch2.q15TopSupplier(spark, sf001)).toString
    // both the rev and max(rev) subtrees read the persisted per-supplier
    // aggregate (textual FileScan mentions inside the printed cached plan
    // are cosmetic — the parquet is materialized once)
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 2, plan)
    // and the global max is a partial-agg tree, never an empty-frame
    // window funnelling all suppliers through one partition
    assert(!plan.contains("Window"), plan)
  }

  test("q7/q8: every dimension join broadcasts, facts never sort-merge") {
    for (q <- Seq(Tpch2.q7Volume _, Tpch2.q8Share _)) {
      val plan = executed(q(spark, sf001)).toString
      assert(plan.contains("BroadcastHashJoin"))
      assert(!plan.contains("SortMergeJoin"), plan)
    }
  }

  test("q6: all three predicates push down to the lineitem scan") {
    // simple-mode toString truncates PushedFilters; use formatted explain
    val plan = Tpch2.q6Forecast(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_discount"), plan)
    assert(plan.contains("LessThan(l_quantity"), plan)
  }

  test("q9/q21: new TPC-H shapes broadcast their dimensions, facts never sort-merge") {
    for (q <- Seq(graft.queries.Tpch3.q9Profit _, graft.queries.Tpch3.q21Waiting _)) {
      val plan = executed(q(spark, sf001)).toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("SortMergeJoin"), plan)
    }
  }

  test("d5: exact near-dup is a block-pair equi-join — no nested loop, no cartesian") {
    val plan = executed(graft.queries.SimilarityQueries.cosineNearDup(spark, sf001)).toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("d6: benchmark n-gram set broadcasts; corpus side never nested-loops") {
    val plan = executed(graft.queries.DedupQueries.decontaminate(spark, sf001)).toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sim3: IVF assignment is map-side (no Window exchange for the argmax)") {
    val plan = executed(graft.queries.SimilarityQueries.ivfAnn(spark, sf001)).toString
    assert(!plan.contains("Window"), plan)
  }

  test("sim2: LSH signing is codegen'd (no interpreted HOFs in the plan)") {
    val plan = executed(graft.queries.SimilarityQueries.lshAnn(spark, sf001)).toString
    assert(!plan.contains("zip_with"), plan)
    assert(!plan.contains("aggregate("), plan)
  }

  test("d11: span dedup is linear — partial-agg gram counting, no self-join blowup") {
    val p = executed(graft.queries.DedupQueries.dupSpans(spark, sf001))
    val plan = p.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // dup-gram detection is a map-side-combined count_distinct, so a
    // partial aggregate must sit BELOW the gram exchange
    assert(plan.contains("partial_count"), plan)
  }

  test("d13: span removal stays linear — hash-keyed joins, no nested loop, no cartesian") {
    val p = executed(graft.queries.DedupQueries.spanRemove(spark, sf001))
    val plan = p.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // ownership is a gram-space agg with map-side combine
    assert(plan.contains("partial_count") || plan.contains("partial_min"), plan)
  }

  test("ANN candidate joins carry ids+signatures, never the dim-width vectors") {
    // the replicated LSH bucket self-join must not ship the 64-double
    // vector arrays through its exchange — candidates join the vectors
    // back afterwards (candidates-then-verify)
    val emb = graft.Tables.embeddings(spark, sf001)
    val lsh = executed(graft.operators.Similarity.lshNeighborPairsMulti(
      emb, "vec_id", "embedding", numPlanes = 6, numTables = 12, threshold = 0.3,
      multiProbe = true)) match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // unwrap AQE: collect() does not cross its boundary
      case p => p
    }
    val joins = lsh.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    val bucketJoins = joins.filter(_.leftKeys.length == 2) // (tbl, bucket)
    assert(bucketJoins.nonEmpty, lsh.toString)
    bucketJoins.foreach { j =>
      val carried = (j.left.output ++ j.right.output).map(_.name)
      assert(!carried.exists(n => n == "v" || n.startsWith("va") || n.startsWith("vb")),
        s"bucket join carries vectors: $carried")
    }
  }

  test("sim8: projection top-k plans as two TakeOrdered + broadcasts, zero hash shuffles") {
    // Pins sim8's plan after the r6 driver-tail wobble (0.25→0.42 s):
    // the code hasn't changed since r5 and the sub-second spread is run
    // environment, not plan drift — this assertion makes any FUTURE
    // drift (a TakeOrdered degrading to global Sort+Limit, a broadcast
    // degrading to a shuffle join) fail CI instead of a bench ratio.
    val p = executed(graft.queries.SimilarityQueries.rpTopK(spark, sf001))
    val s = p.toString
    val takeOrdered = "TakeOrderedAndProject".r.findAllIn(s).size
    assert(takeOrdered >= 2, s"expected candidate+final TakeOrdered: $s")
    assert(shuffles(p) == 0, s"sim8 should not hash/range-shuffle: $s")
    assert("BroadcastExchange".r.findAllIn(s).size >= 2,
      s"query vector + candidate set should broadcast: $s")
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("ohlcv resample shuffles exactly once") {
    val p = executed(Events.ohlcvResample(spark, sf001))
    // partial agg -> single exchange on (window, type) -> final agg + sort
    assert(shuffles(p) <= 2, p.toString)
  }

  test("j10: keyless interval join plans as an equi join, never a nested loop") {
    val plan = executed(
      graft.queries.Relational.intervalOverlap(spark, sf001)).toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join") && plan.contains("__b"), plan)
  }

  test("t11: boilerplate df join keys on the 8-byte gram hash, not the gram string") {
    val p = executed(graft.queries.DedupQueries.boilerplate(spark, sf001)) match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    // the df->stream join keys must be the xxhash64 column (LongType)
    val hashJoin = joins.filter(j => j.leftKeys.exists(
      _.dataType == org.apache.spark.sql.types.LongType))
    assert(hashJoin.nonEmpty, p.toString)
    assert(!p.toString.contains("NestedLoop"), p.toString)
  }

  test("pipe12: shard order has no global sort before the per-shard windows") {
    val p = executed(graft.queries.PipelineQueries.orderShard(spark, sf001))
    // exactly one hash exchange (the shard partition); the only range
    // exchange is the final deterministic ORDER BY for the oracle
    val hash = "Exchange hashpartitioning".r.findAllIn(p.toString).size
    val range = "Exchange rangepartitioning".r.findAllIn(p.toString).size
    assert(hash == 1 && range == 1, p.toString)
    // the window must partition by shard, not run single-partition
    assert(!p.toString.contains("Window [") ||
      p.toString.contains("windowspecdefinition(shard"), p.toString)
  }

  test("sim12: SQ candidate generation is one TakeOrdered over the scan; rerank broadcasts") {
    val p = executed(graft.queries.SimilarityQueries.sqTopK(spark, sf001))
    val s = p.toString
    assert("TakeOrderedAndProject".r.findAllIn(s).size >= 1, s)
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("g3: each peel round is semi joins + a partial agg, never a nested loop") {
    val li = graft.Tables.lineitem(spark, sf001)
      .where(org.apache.spark.sql.functions.col("l_orderkey") % 200 === 0)
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_suppkey"))
    val e = li.as("x").join(li.as("y"),
        org.apache.spark.sql.functions.col("x.l_orderkey") ===
          org.apache.spark.sql.functions.col("y.l_orderkey") &&
          org.apache.spark.sql.functions.col("x.l_suppkey") <
            org.apache.spark.sql.functions.col("y.l_suppkey"))
      .select(org.apache.spark.sql.functions.col("x.l_suppkey").as("a"),
        org.apache.spark.sql.functions.col("y.l_suppkey").as("b"))
      .distinct()
    val p = executed(graft.operators.Graph.kcore(e, k = 5)).toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("dq4: fact-scale FK parents are never force-broadcast; dimensions are") {
    // lineitem→orders: parent grows with SF — a broadcast HINT here is
    // an OOM at 100 TB even if AQE would broadcast at this SF. The
    // logical plan must carry no ResolvedHint.
    val fact = graft.queries.Scalar.orphanJoin(
      graft.Tables.lineitem(spark, sf001), "l_orderkey",
      graft.Tables.orders(spark, sf001), "o_orderkey", smallParent = false)
    assert(!fact.queryExecution.analyzed.toString.contains("ResolvedHint"),
      fact.queryExecution.analyzed.toString)
    // supplier→nation: fixed-cardinality dimension — the hint belongs
    val dim = graft.queries.Scalar.orphanJoin(
      graft.Tables.supplier(spark, sf001), "s_nationkey",
      graft.Tables.nation(spark, sf001), "n_nationkey", smallParent = true)
    assert(dim.queryExecution.analyzed.toString.contains("ResolvedHint"),
      dim.queryExecution.analyzed.toString)
  }

  test("w3: daily rollup aggregates partially; one hash exchange feeds the global frame") {
    // r6→r7 driver tails wobbled 1.18-1.23× on this family with the code
    // untouched — pin the shape so a REAL drift (lost map-side combine,
    // an extra shuffle sneaking in) fails CI instead of a bench ratio
    val p = executed(Windows.windowMoving(spark, sf001))
    val s = p.toString
    assert("HashAggregate".r.findAllIn(s).size >= 2, s) // partial + final daily agg
    assert(shuffles(p) <= 2, s) // daily-agg key exchange + output ORDER BY
    assert(s.contains("Window"), s)
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
  }

  test("w4: overlapping windows expand map-side; one agg exchange + one output sort") {
    val p = executed(Windows.slidingWindow(spark, sf001))
    val s = p.toString
    // the 4-fold window overlap must be an Expand projection (map-side),
    // never a join against a generated window table
    assert(s.contains("Expand"), s)
    assert("HashAggregate".r.findAllIn(s).size >= 2, s)
    assert(shuffles(p) == 2, s)
    assert(!s.contains("NestedLoop") && !s.contains("CartesianProduct"), s)
  }

  test("z1b: clusterBy compaction is ONE staged exchange on the partition key + in-partition Morton sort") {
    // the rewrite plan lives inside ZTable.compact — capture it with a
    // QueryExecutionListener and pin the r13 single-file fast path: one
    // hash exchange on the PARTITION key (the staged partitionBy job
    // that replaced the per-directory range-sampling jobs), an
    // in-partition sort on the Morton interleave (CollapseProject
    // inlines the z__ alias into the Sort, so match the interleave's
    // bit-op signature), and no second exchange
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val path = java.nio.file.Files.createTempDirectory("graft_z1b_plan_").toString + "/t"
      val t = graft.sources.ZTable.create(spark, path,
        graft.sources.ZTableSpec(strictOrder = false))
      t.append(graft.Tables.events(spark, sf001))
      t.compact(clusterBy = Seq("user_id"))
      // listener delivery is async — poll for the rewrite plans
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      def rewritePlans(): Seq[String] = {
        import scala.jdk.CollectionConverters._
        // the staged rewrite is the only write into the compact stage root
        captured.asScala.toSeq.filter(_.contains(".compact-stage-"))
      }
      while (rewritePlans().isEmpty && System.nanoTime < deadline) Thread.sleep(100)
      val plans = rewritePlans()
      assert(plans.nonEmpty, s"no rewrite plan captured (${captured.size()} plans seen)")
      plans.foreach { full =>
        // AQE's toString repeats the tree under "== Initial Plan ==" —
        // pin only the final plan section
        val s = full.split("== Initial Plan ==").head
        // ONE exchange: the staged write's hash repartition on the
        // partition key (never a second shuffle, never a range-sampling
        // pass per directory)
        val exchanges = "Exchange (range|hash)partitioning|Exchange SinglePartition"
          .r.findAllIn(s).toSeq
        assert(exchanges.length == 1, s)
        assert(s.contains("Exchange hashpartitioning(p_date"), s)
        // the in-partition sort is (partition key, Morton key) — the
        // partition-column prefix keeps the dynamic-partition writer
        // from inserting its own sort and ELIMINATING the layout order
        // (the r13 finding this pin now guards), and the Morton
        // interleave (shiftleft chains) must still feed z__ below it
        assert("Sort \\[p_date#\\d+ ASC NULLS FIRST, z__#\\d+L? ASC NULLS FIRST\\], false"
          .r.findFirstIn(s).isDefined, s)
        assert(s.contains("shiftleft("), s)
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("d8: bloom probe filters map-side before the verify join; partial agg; no cartesian") {
    // this session's top drift row (1.33x min on an untouched query) —
    // pin the shape so a REAL regression (bloom pre-filter lost below
    // the join, the per-id count losing its map-side partial, a
    // cartesian sneaking into the verify) fails CI instead of being
    // argued from a bench ratio
    val p = executed(graft.queries.DedupQueries.bloomDecontaminate(spark, sf001))
    val s = p.toString
    // the bloom membership UDF must appear in a Filter node (map-side
    // pre-filter on the corpus gram stream), not only in a join
    // condition — anchored on the UDF's NAME so the pin cannot pass
    // vacuously on some other UDF filter after a refactor
    assert("Filter .*bloom_probe".r.findFirstIn(s).isDefined, s)
    // per-id count_distinct aggregates partially before its exchange
    assert("HashAggregate".r.findAllIn(s).size >= 2, s)
    assert(!s.contains("CartesianProduct") && !s.contains("NestedLoop"), s)
  }
}
