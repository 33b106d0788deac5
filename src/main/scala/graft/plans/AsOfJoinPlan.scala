package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NullsLast, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StructType

/** Tier-(c) custom operator: a native as-of join
  * (LogicalPlan + Strategy + SparkPlan), the machinery for operators
  * Spark cannot express as a composition.
  *
  * Semantics (identical to operators.AsOfJoin, which stays as the
  * composed reference implementation): for each left row, the right row
  * with the greatest (ts, tie) such that right.ts <= left.ts and
  * right.key == left.key; unmatched left rows are null-padded.
  *
  * Physical story: both children are hash-clustered on the key and
  * sorted within partitions — (key, ts) on the left, (key, ts, tie) on
  * the right — so Catalyst plans one exchange per side and the operator
  * itself is a streaming per-partition merge: O(|L|+|R|), no buffering
  * beyond one right row, no row explosion. Compared to the union+window
  * composition this skips the union materialization and the window's
  * running-last state, and it needs no null side-padding columns.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  /** Pin the partition count on BOTH sides: zipPartitions requires equal
    * counts, and AQE would otherwise coalesce the two shuffle stages
    * independently (an empty right side collapses to fewer partitions
    * than a populated left — found by the ScalaCheck property). */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey),
      requiredNumPartitions = Some(conf.numShufflePartitions)),
    ClusteredDistribution(Seq(rightKey),
      requiredNumPartitions = Some(conf.numShufflePartitions)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    // tie NULLS LAST, matching the composed AsOfJoin's asc_nulls_last:
    // among equal (key, ts) rows both implementations must elect the
    // same winner or j8's shared-oracle claim breaks on null ties
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending, NullsLast, Seq.empty)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  /** Rows stay exactly where the left child's exchange put them (the
    * merge is partition-local and emits one row per left row), so
    * advertise that: a downstream groupBy/window on the same key would
    * otherwise re-shuffle the joined rows for nothing. */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val keyType = leftKey.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKey = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val keyOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(keyType))
      val lTsBound = org.apache.spark.sql.catalyst.expressions
        .BindReferences.bindReference(lTsExpr, lOut)
      val rTsBound = org.apache.spark.sql.catalyst.expressions
        .BindReferences.bindReference(rTsExpr, rOut)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // Bind against nullability-RELAXED right attributes: binding to the
      // children's non-nullable output would make codegen skip the null
      // check and read a null-padded slot as 0/false.
      val out = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))

      // Buffered right cursor: lastMatch holds the best right row for the
      // current (key, ts-so-far); both sides arrive (key, ts)-sorted.
      // SQL null semantics: a null key or ts never matches — right rows
      // with one are dropped (a null ts would otherwise unbox to 0L and
      // act as epoch 0), left rows with one are emitted null-padded.
      // Nulls sort FIRST under Ascending, so dropping/padding them here
      // cannot desync the merge cursor.
      val rBuf = rIter.filter { r =>
        !rKey(r).isNullAt(0) && rTsBound.eval(r) != null
      }.buffered
      var lastKey: InternalRow = null
      var lastMatch: InternalRow = null

      lIter.map { lRow =>
        val k = lKey(lRow)
        val lTsVal = lTsBound.eval(lRow)
        if (k.isNullAt(0) || lTsVal == null) {
          out(joined(lRow, nullRight))
        } else {
          val ts = lTsVal.asInstanceOf[Long]
          // new key group -> drop stale match; copy the key row only on
          // group change (a per-row copy is a 10M-row allocation storm
          // over a 1K-key partition)
          if (lastKey == null || keyOrdering.compare(k, lastKey) != 0) {
            lastMatch = null
            lastKey = k.copy()
          }
          // advance right while its (key < k) or (key == k && ts <= left ts)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKey(rBuf.head)
            val cmp = keyOrdering.compare(rk, k)
            if (cmp < 0) { rBuf.next() ; lastMatch = null }
            else if (cmp == 0 &&
                rTsBound.eval(rBuf.head).asInstanceOf[Long] <= ts) {
              lastMatch = rBuf.next().copy()
            } else advancing = false
          }
          val r = if (lastMatch == null) nullRight else lastMatch
          out(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: builds the logical node and installs the strategy. */
object AsOfJoinNative {
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTie: String): DataFrame = {
    val spark = leftDf.sparkSession
    install(spark)
    val lPlan = ColumnBridge.logicalPlan(leftDf)
    val rPlan = ColumnBridge.logicalPlan(rightDf)
    // analyzer-style resolution: case per spark.sql.caseSensitive, and
    // a duplicate name errors instead of silently binding the first
    def resolve(p: LogicalPlan, n: String): Attribute = {
      val matches = p.output.filter(a => spark.sessionState.conf.resolver(a.name, n))
      require(matches.nonEmpty, s"no column $n")
      require(matches.size == 1, s"ambiguous column $n")
      matches.head
    }
    val (lk, rk) = (resolve(lPlan, leftKey), resolve(rPlan, rightKey))
    val (lts, rts) = (resolve(lPlan, leftTs), resolve(rPlan, rightTs))
    // fail at PLAN time, not mid-job: mismatched key types hash/compare
    // as raw bytes and silently miss every match; the merge unboxes ts
    // as Long, so only Long-backed ts types are sound
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsTypes = Set[org.apache.spark.sql.types.DataType](
      LongType, TimestampType, TimestampNTZType)
    require(tsTypes.contains(lts.dataType) && lts.dataType == rts.dataType,
      s"as-of ts columns must both be long/timestamp, got " +
        s"${lts.dataType} vs ${rts.dataType}")
    ColumnBridge.ofRows(spark, AsOfJoinNode(lPlan, rPlan,
      lk, rk, lts, rts, resolve(rPlan, rightTie)))
  }

  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
  }
}
