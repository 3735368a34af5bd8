package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL registration of graft's native Catalyst expressions.
  *
  * Two entry points over one builder table:
  *  - `new GraftExtensions` with `SparkSession.builder().withExtensions`
  *    (or `spark.sql.extensions=graft.GraftExtensions`) — cluster-wide,
  *  - [[GraftFunctions.register]] on an already-running session.
  *
  * {{{ spark.sql("SELECT explode(ngram_array(w, 2)) FROM words") }}}
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  // SQL fractional literals arrive as DECIMAL (0.5 → Decimal(1,1)), so a
  // double parameter must accept both representations
  private def doubleArg(e: Expression, fn: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal numeric argument, got $other")
  }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("ngram_array", classOf[NGramArray].getName,
      args => NGramArray(args.head, intArg(args(1), "ngram_array"))),
    ("word_shingles", classOf[WordShingles].getName,
      args => WordShingles(args.head, intArg(args(1), "word_shingles"))),
    ("cosine_similarity", classOf[CosineSimilarity].getName,
      args => CosineSimilarity(args.head, args(1))),
    ("lsh_buckets", classOf[LshBuckets].getName,
      args =>
        if (args.size >= 3)
          LshBuckets(args.head, intArg(args(1), "lsh_buckets"),
            intArg(args(2), "lsh_buckets"))
        else LshBuckets(args.head)),
    ("vector_norm", classOf[VectorNorm].getName,
      args => VectorNorm(args.head)),
    ("intvec_dot", classOf[IntVecDot].getName,
      args => IntVecDot(args.head, args(1))),
    ("intvec_sqdist", classOf[IntVecSqDist].getName,
      args => IntVecSqDist(args.head, args(1))),
    ("simhash_agg", classOf[SimHashAgg].getName,
      args => SimHashAgg(args.head).toAggregateExpression()),
    ("topk_agg", classOf[TopKAgg].getName,
      args => TopKAgg(args(0), args(1), intArg(args(2), "topk_agg"))
        .toAggregateExpression()),
    ("hist_quantile", classOf[HistQuantileAgg].getName,
      args => HistQuantileAgg(args(0),
        doubleArg(args(1), "hist_quantile"), doubleArg(args(2), "hist_quantile"),
        intArg(args(3), "hist_quantile"), doubleArg(args(4), "hist_quantile"))
        .toAggregateExpression()),
    ("cms_agg", classOf[CountMinAgg].getName,
      args => CountMinAgg(args.head,
        intArg(args(1), "cms_agg"), intArg(args(2), "cms_agg"))
        .toAggregateExpression()),
    ("bloom_agg", classOf[BloomAgg].getName,
      args => BloomAgg(args.head,
        intArg(args(1), "bloom_agg"), intArg(args(2), "bloom_agg"))
        .toAggregateExpression()),
    ("hll_reg_agg", classOf[HllRegAgg].getName,
      args => HllRegAgg(args.head, intArg(args(1), "hll_reg_agg"))
        .toAggregateExpression()))

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit = all.foreach {
    case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, className, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(className, name), builder))
    }
    // whole-operator extension: plans graft.plans.AsOfJoinNode, and
    // prunes columns through it (stock Catalyst can't see inside)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinColumns)
  }
}
