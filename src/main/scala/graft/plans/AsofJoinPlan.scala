package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** merge_asof as a first-class operator: custom LogicalPlan + Strategy +
  * physical exec (SURVEY §4 custom work #1 "optionally a custom
  * SparkStrategy for a true partitioned asof-merge at 100 TB";
  * reference kernels pandas/_libs/join.pyx:680-1020).
  *
  * Physical algorithm: both children hash-clustered on the `by` keys and
  * sorted (by, on) — EnsureRequirements inserts exactly the exchanges a
  * sort-merge join would get — then each co-partition pair is merged by
  * a single forward-only two-pointer pass with O(1) state per group: the
  * classic asof-merge, no union row doubling, no window machinery, no
  * per-group buffering. Scale behavior is SMJ-like: one shuffle + sort
  * per side; skewed `by` keys split by AQE like any clustered exchange.
  *
  * Semantics (direction='backward'): for each left row, the LAST right
  * row in the same group with on ≤ left.on (strict < when
  * allowExact=false), payload null when none qualifies or the match is
  * older than `toleranceMicros`.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftOn: Attribute,
    rightOn: Attribute,
    rightPayload: Seq[Attribute],
    allowExact: Boolean,
    toleranceMicros: Option[Long],
    forward: Boolean = false,
    nearest: Boolean = false) extends BinaryNode {
  override val output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lb, rb, lo, ro, pay, ae, tol, fwd, near) =>
      AsofJoinExec(planLater(l), planLater(r), lb, rb, lo, ro, pay, ae, tol,
        fwd, near) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftOn: Attribute,
    rightOn: Attribute,
    rightPayload: Seq[Attribute],
    allowExact: Boolean,
    toleranceMicros: Option[Long],
    forward: Boolean = false,
    nearest: Boolean = false) extends BinaryExecNode {

  require(!nearest || (allowExact && !forward),
    "nearest runs the ascending merge with exact matches allowed; " +
      "use the window composition for allow_exact=false nearest")

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def outputPartitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftBy.isEmpty) Seq(AllTuples, AllTuples)
    else Seq(ClusteredDistribution(leftBy), ClusteredDistribution(rightBy))

  private def onDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftBy.map(a => SortOrder(a, Ascending)) :+ SortOrder(leftOn, onDir),
    rightBy.map(a => SortOrder(a, Ascending)) :+ SortOrder(rightOn, onDir))

  override def outputOrdering: Seq[SortOrder] =
    leftBy.map(a => SortOrder(a, Ascending)) :+ SortOrder(leftOn, onDir)

  /** Preparation rules may rewrite the expression fields into bound
    * form; resolve every reference to a plain ordinal on the driver and
    * construct projections from explicit BoundReferences only. */
  private def ordinal(out: Seq[Attribute], e: Expression): Int = e match {
    case b: BoundReference => b.ordinal
    case a: Attribute =>
      val i = out.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"attribute $a not found in ${out.map(_.name)}")
      i
    case other => sys.error(s"unexpected reference shape: $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lByRefs = leftBy.map(e =>
      BoundReference(ordinal(lOut, e), e.dataType, e.nullable))
    val rByRefs = rightBy.map(e =>
      BoundReference(ordinal(rOut, e), e.dataType, e.nullable))
    val byTypes = leftBy.map(_.dataType)
    val lOnRef = BoundReference(ordinal(lOut, leftOn), leftOn.dataType, leftOn.nullable)
    val rOnRef = BoundReference(ordinal(rOut, rightOn), rightOn.dataType, rightOn.nullable)
    val payloadRefs = rightPayload.map(e =>
      BoundReference(ordinal(rOut, e), e.dataType, e.nullable))
    // output = identity over (left row ++ payload row), payload nullable
    val outRefs = lOut.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable)
    } ++ rightPayload.zipWithIndex.map { case (e, i) =>
      BoundReference(lOut.size + i, e.dataType, nullable = true)
    }
    val exact = allowExact
    val tol = toleranceMicros
    val fwd = forward
    val near = nearest

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lByRefs)
      val rKeyProj = UnsafeProjection.create(rByRefs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(byTypes)
      val lOnBound = lOnRef
      val rOnBound = rOnRef
      val payloadProj = UnsafeProjection.create(payloadRefs)
      val outProj = UnsafeProjection.create(outRefs)
      val nullPayload = new GenericInternalRow(payloadRefs.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rBuf: InternalRow =
          if (rIt.hasNext) rIt.next().copy() else null
        private var best: InternalRow = null
        private var bestOn: Long = 0L

        private def onOf(bound: org.apache.spark.sql.catalyst.expressions.Expression,
            row: InternalRow): Long =
          bound.eval(row).asInstanceOf[Number].longValue()

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lOnV = onOf(lOnBound, l)
          // 1. drop a buffered best from a previous (smaller) group
          if (best != null && keyOrd.compare(rKeyProj(best), lKeyProj(l)) != 0)
            best = null
          // 2. advance the right side through every row that is still
          //    eligible for this left row (smaller group, or same group
          //    with on within the frame); remember the last same-group one
          var advancing = true
          while (advancing && rBuf != null) {
            val c = keyOrd.compare(rKeyProj(rBuf), lKeyProj(l))
            val eligible =
              c < 0 || (c == 0 && {
                val rOnV = onOf(rOnBound, rBuf)
                if (fwd) { if (exact) rOnV >= lOnV else rOnV > lOnV }
                else { if (exact) rOnV <= lOnV else rOnV < lOnV }
              })
            if (eligible) {
              if (c == 0) { best = rBuf; bestOn = onOf(rOnBound, rBuf) }
              rBuf = if (rIt.hasNext) rIt.next().copy() else null
            } else advancing = false
          }
          // 3. emit
          val delta = if (fwd) bestOn - lOnV else lOnV - bestOn
          val matchedB = best != null && tol.forall(t => delta <= t)
          if (!near) {
            val payload = if (matchedB) payloadProj(best) else nullPayload
            outProj(joined(l, payload))
          } else {
            // nearest: the merge ran ascending, so the row the pointer
            // stopped on is the FIRST same-group row with on > lOn — the
            // forward candidate (exact matches were consumed as backward-
            // eligible; right is unique per (by, on), operator contract).
            // Closer side wins, backward wins ties (pandas semantics).
            val fwdOk = rBuf != null &&
              keyOrd.compare(rKeyProj(rBuf), lKeyProj(l)) == 0 && {
                val fDelta = onOf(rOnBound, rBuf) - lOnV
                fDelta > 0 && tol.forall(t => fDelta <= t)
              }
            val chosen =
              if (matchedB && fwdOk)
                if (delta <= onOf(rOnBound, rBuf) - lOnV) best else rBuf
              else if (matchedB) best
              else if (fwdOk) rBuf
              else null
            val payload = if (chosen != null) payloadProj(chosen) else nullPayload
            outProj(joined(l, payload))
          }
        }
      }
    }
  }

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinPlan {

  /** Register the strategy once per session (idempotent). The
    * deployment path is GraftExtensions (spark.sql.extensions); this is
    * the in-session form. */
  def register(spark: SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!ss.experimental.extraStrategies.contains(AsofJoinStrategy))
      ss.experimental.extraStrategies =
        ss.experimental.extraStrategies :+ AsofJoinStrategy
  }

  /** merge_asof(direction='backward'|'forward') through the custom
    * operator — forward is the same two-pointer merge over descending
    * on-order. `right` columns are re-aliased so a self-asof cannot
    * collide expression ids across the two children.
    *
    * A keyless merge_asof (no `by`) does NOT serialize to one partition:
    * both sides are range-bucketed on `on` with shared boundaries and the
    * merge runs per bucket, keyed on the bucket id (see asofKeyless). */
  def asof(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
      rightCols: Seq[String], allowExact: Boolean = true,
      toleranceMicros: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    if (by.isEmpty)
      return asofKeyless(left, right, on, rightCols, allowExact,
        toleranceMicros, direction)
    val spark = left.sparkSession
    register(spark)
    val rightFresh = right
      .select((by :+ on).map(c => col(c).as(c)) ++
        rightCols.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"column $n missing from ${p.output.map(_.name)}"))
    val node = AsofJoinNode(lPlan, rPlan,
      by.map(attr(lPlan, _)), by.map(attr(rPlan, _)),
      attr(lPlan, on), attr(rPlan, on),
      rightCols.map(attr(rPlan, _)), allowExact, toleranceMicros,
      forward = direction == "forward",
      nearest = direction == "nearest")
    Bridge.ofRows(spark, node)
  }

  /** Keyless merge_asof at scale (r2 verdict fix #8): instead of
    * `AllTuples` (single-partition merge), range-bucket BOTH sides on
    * `on` with boundaries sampled once from the left, inject per bucket
    * one carried "context" row — the nearest right row outside the
    * bucket in the match direction, cascaded across empty buckets — and
    * run the ordinary keyed asof with by = bucket id. Each bucket's
    * two-pointer merge then sees exactly the candidates a global merge
    * would: same-bucket rows plus the carried best. The edge collect is
    * ≤ buckets rows (cluster-core count), not data-sized.
    */
  private def asofKeyless(left: DataFrame, right: DataFrame, on: String,
      rightCols: Seq[String], allowExact: Boolean,
      toleranceMicros: Option[Long], direction: String,
      buckets: Int = 32): DataFrame = {
    import graft.operators.DistScan
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val spark = left.sparkSession
    val fwd = direction == "forward"
    val onNum = col(on).cast("double")
    val bs = DistScan.boundariesOf(left, onNum, buckets)
    val lB = DistScan.bucketedBy(left, onNum, bs)
    val rSlim = right.select((on +: rightCols).map(c => col(c).as(c)): _*)
    val rB = DistScan.bucketedBy(rSlim, onNum, bs)
    // Edge row per bucket: latest (backward) / earliest (forward) right
    // row — the only row a neighboring bucket can ever need. `nearest`
    // needs BOTH carries: its per-bucket merge may match either side.
    val near = direction == "nearest"
    val schema = rB.schema
    val pidIdx = schema.fieldIndex(DistScan.PidCol)
    val maxPid = bs.length
    val injected = Seq.newBuilder[Row]
    def carryPass(earliestEdge: Boolean): Unit = {
      val wEdge = Window.partitionBy(col(DistScan.PidCol))
        .orderBy(if (earliestEdge) onNum.asc else onNum.desc)
      val edges = rB.withColumn("__ern", row_number().over(wEdge))
        .filter(col("__ern") === 1).drop("__ern").collect()
      val byPid = edges.map(r => r.getInt(pidIdx) -> r).toMap
      var carry: Option[Row] = None
      val order = if (earliestEdge) maxPid to 0 by -1 else 0 to maxPid
      for (k <- order) {
        carry.foreach(r => injected += Row.fromSeq(r.toSeq.updated(pidIdx, k)))
        byPid.get(k).foreach(r => carry = Some(r))
      }
    }
    if (fwd || near) carryPass(earliestEdge = true)
    if (!fwd) carryPass(earliestEdge = false)
    val ctxDf = spark.createDataFrame(
      spark.sparkContext.parallelize(injected.result(), 1), schema)
    val res = asof(lB, rB.unionByName(ctxDf), on, Seq(DistScan.PidCol),
      rightCols, allowExact, toleranceMicros, direction)
    res.drop(DistScan.PidCol)
  }
}
