package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.LongType

/** Native AS-OF join: a whole-operator Catalyst extension — custom
  * `LogicalPlan` node, `SparkStrategy`, and physical merge operator —
  * the deepest extension tier from SURVEY.md §7 (compose > custom
  * Expression > custom plan), used where composition genuinely costs
  * more: the composed union+window AS-OF ([[graft.operators.AsOfJoin]])
  * materializes every right row through the window and carries the
  * left schema through a union; this operator streams both sides
  * through ONE co-partitioned merge pass.
  *
  * Semantics (backward as-of, matching DuckDB `ASOF LEFT JOIN` on
  * `l.key = r.key AND l.ts >= r.ts`): for every left row, the LATEST
  * right row of the same key with `rightTs <= leftTs`; left rows
  * without a match get nulls.
  *
  * Physical contract: both children hash-clustered on the key
  * (`requiredChildDistribution`) and sorted by (key, ts)
  * (`requiredChildOrdering`) — EnsureRequirements inserts the
  * exchanges/sorts exactly as it would for a sort-merge join, AQE
  * still re-plans around it. The merge itself is a single forward
  * pass, O(|L| + |R|) per partition with O(1) state (the last
  * matching right row) — no window buffers, no row multiplication.
  *
  * Scale: one shuffle per side on the join key, streaming merge, no
  * per-key memory growth. Skewed hot keys cost what any keyed shuffle
  * costs; AQE skew splitting cannot split a single key for a
  * merge-with-state operator (same limitation as sort-merge join).
  *
  * Keys and timestamps are constrained to LongType (convert timestamps
  * with `unix_micros` first) — the engine's portable integer-time
  * convention; see `Tables.events`. */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceUs: Long = -1L) extends BinaryNode {

  require(Seq(leftKey, rightKey, leftTs, rightTs).forall(_.dataType == LongType),
    "as-of join requires LongType keys and timestamps (use unix_micros)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean =
    childrenResolved && Seq(leftKey, leftTs).forall(_.references.subsetOf(left.outputSet)) &&
      Seq(rightKey, rightTs).forall(_.references.subsetOf(right.outputSet))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Column pruning THROUGH [[AsOfJoinNode]] — stock Catalyst cannot push
  * projections through a node it doesn't know, so without this rule a
  * `select` above the as-of join forces both children to materialize
  * every column (and the parquet scans to read them). When a Project
  * consumes only part of the join output, push per-side Projects into
  * the children, always retaining the key/ts columns the merge needs.
  * Registered alongside the strategy ([[NativeAsOf.ensureRegistered]] /
  * `GraftExtensions`). */
object PruneAsOfJoinColumns extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, aj: AsOfJoinNode) =>
      val needed = p.references ++ AttributeSet(
        Seq(aj.leftKey, aj.rightKey, aj.leftTs, aj.rightTs)
          .flatMap(_.references))
      if (aj.output.forall(needed.contains)) p // already minimal
      else p.copy(child = aj.copy(
        left = Project(aj.left.output.filter(needed.contains), aj.left),
        right = Project(aj.right.output.filter(needed.contains), aj.right)))
  }
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]. Registered per-session via
  * `spark.experimental.extraStrategies` ([[NativeAsOf.ensureRegistered]])
  * or cluster-wide via `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tol) :: Nil
    case _ => Nil
  }
}

/** Streaming merge AS-OF join executor. See [[AsOfJoinNode]] for the
  * contract. Row-based `doExecute` (no codegen): the operator runs once
  * per partition pair as a tight two-pointer loop — codegen would only
  * fuse the surrounding projections, and keeping it row-based keeps the
  * implementation auditable. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceUs: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  /** One output row per left row, emitted in left order — the (key, ts)
    * ordering the merge required of its left child survives the join, and
    * declaring it lets the planner elide downstream sorts on (key, ts)
    * (e.g. a chained as-of join or window over the same key). */
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lk = leftKey
    val rk = rightKey
    val lts = leftTs
    val rts = rightTs
    val tol = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, ts) extractors; the projections are bound per partition
      val lProj = UnsafeProjection.create(Seq(lk, lts), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rts), rOut)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // downstream operators (and SparkPlan.collect) require UnsafeRow;
      // a bare JoinedRow only survives when a Project happens to sit
      // above. Bound by POSITION with the output's nullability (right side
      // nullable) — BindReferences would take nullability from the child
      // attributes, eliding the null checks and turning unmatched-row
      // nulls into zeros
      val outProj = UnsafeProjection.create(outAttrs.zipWithIndex.map {
        case (a, i) => BoundReference(i, a.dataType, a.nullable)
      })

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _     // current right head (unconsumed)
        private var rKey = 0L
        private var rTs = 0L
        private var rValid = false
        private var lastMatch: InternalRow = _ // latest consumed right row …
        private var lastKey = 0L               // … its key …
        private var lastTs = 0L                // … and its ts (tolerance)
        private var haveMatch = false

        private def advanceRight(): Unit = {
          rValid = false
          while (!rValid && rIter.hasNext) {
            rRow = rIter.next()
            val kv = rProj(rRow)
            if (!kv.isNullAt(0) && !kv.isNullAt(1)) {
              rKey = kv.getLong(0); rTs = kv.getLong(1); rValid = true
            } // right rows with null key/ts can never match — skip
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val kv = lProj(lRow)
          numOutputRows += 1
          if (kv.isNullAt(0) || kv.isNullAt(1)) {
            outProj(joined(lRow, nullRight)) // null key/ts never matches
          } else {
            val k = kv.getLong(0)
            val ts = kv.getLong(1)
            // consume right rows at-or-before (k, ts); later left rows of
            // the same key have ts' >= ts (sorted), so consumption is safe
            while (rValid && (rKey < k || (rKey == k && rTs <= ts))) {
              if (rKey == k) {
                lastMatch = rRow.copy(); lastKey = k; lastTs = rTs
                haveMatch = true
              }
              advanceRight()
            }
            // tolerance (pandas merge_asof convention): the latest
            // at-or-before row is the ONLY candidate, so a staleness
            // bound just nulls it out when it is too old
            if (haveMatch && lastKey == k &&
                (tol < 0L || ts - lastTs <= tol)) {
              numMatchedRows += 1
              outProj(joined(lRow, lastMatch))
            } else outProj(joined(lRow, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over [[AsOfJoinNode]]. */
object NativeAsOf {

  /** Install [[AsOfJoinStrategy]] + [[PruneAsOfJoinColumns]] on the
    * session (idempotent). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PruneAsOfJoinColumns))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneAsOfJoinColumns
  }

  /** `left ASOF LEFT JOIN right ON key, leftTs >= rightTs` — columns are
    * named (must be unambiguous across the two sides; alias the right
    * side) and bound against each side's analyzed output. */
  def joinAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame =
    joinAsOf(left, right, leftKey, rightKey, leftTs, rightTs, -1L)

  /** [[joinAsOf]] with a STALENESS TOLERANCE (pandas
    * `merge_asof(tolerance=...)`): the latest at-or-before match is
    * kept only while `leftTs − rightTs ≤ toleranceUs`; staler matches
    * null out exactly like a missing one. Tolerance is a per-row O(1)
    * check inside the same single merge pass — no extra plan cost. */
  def joinAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, toleranceUs: Long): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    // fail loudly on ambiguous output: duplicate names make downstream
    // selects silently resolve to the left copy, and shared ExprIds
    // (both sides derived un-aliased from the same source) break
    // attribute resolution inside the node
    val dupNames = (lPlan.output.map(_.name) ++ rPlan.output.map(_.name))
      .groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    require(dupNames.isEmpty,
      s"as-of join output would be ambiguous; alias these columns on one " +
        s"side: ${dupNames.mkString(", ")}")
    val sharedIds = lPlan.outputSet.intersect(rPlan.outputSet)
    require(sharedIds.isEmpty,
      s"both sides carry the same attribute(s) ${sharedIds.mkString(", ")} " +
        "— re-alias one side (e.g. .select(col(\"x\").as(\"rx\")))")
    def bind(name: String, plan: LogicalPlan, side: String): Expression =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column '$name' not found on the $side side (${plan.output.map(_.name).mkString(", ")})"))
    graftshim.ofRows(spark, AsOfJoinNode(lPlan, rPlan,
      bind(leftKey, lPlan, "left"), bind(rightKey, rPlan, "right"),
      bind(leftTs, lPlan, "left"), bind(rightTs, rPlan, "right"),
      toleranceUs))
  }
}
