package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSignature, SimHashFromHashes, SortedLongIntersectCount, VectorCosine, VectorDot}

/** SparkSessionExtensions entry point: registers graft's native
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * graft_cosine(a, b) ...")` works anywhere the jar is on the
  * classpath:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions     // cluster conf, or
  * SparkSession.builder.withExtensions(new GraftExtensions)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator custom plan: top-k per key via bounded heaps
    // (graft.plans.TopKPerKey), planned by its own strategy
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // opt-in rewrite of the row_number-then-filter idiom onto that
    // plan (spark.graft.autoTopK=true)
    ext.injectOptimizerRule(_ => graft.plans.AutoTopKRule)

    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - fused cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => VectorCosine(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - fused dot product of two numeric arrays"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(tokenHashes, k) - k-wide MinHash signature of a long array"),
      (args: Seq[Expression]) => MinHashSignature(args(0),
        args(1).eval().asInstanceOf[Int])))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokenHashes) - 64-bit SimHash of a long array"),
      (args: Seq[Expression]) => SimHashFromHashes(args(0))))

    ext.injectFunction((
      FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count", "graft_intersect_count(a, b) - |a ∩ b| of two sorted long arrays"),
      (args: Seq[Expression]) => SortedLongIntersectCount(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk", "graft_topk(v, k) - aggregate: the k largest values, descending (ksqlDB TOPK)"),
      (args: Seq[Expression]) => graft.functions.BoundedTopK(args(0),
        args(1).eval().asInstanceOf[Int], distinct = false)
        .toAggregateExpression()))

    ext.injectFunction((
      FunctionIdentifier("graft_topk_distinct"),
      info("graft_topk_distinct", "graft_topk_distinct(v, k) - aggregate: the k largest distinct values, descending (ksqlDB TOPKDISTINCT)"),
      (args: Seq[Expression]) => graft.functions.BoundedTopK(args(0),
        args(1).eval().asInstanceOf[Int], distinct = true)
        .toAggregateExpression()))

    ext.injectFunction((
      FunctionIdentifier("graft_frequent_items"),
      info("graft_frequent_items", "graft_frequent_items(v, k) - aggregate: Misra-Gries heavy hitters, <= k bounded-state counters, array<struct<item,est>> est-desc"),
      (args: Seq[Expression]) => graft.functions.FrequentItems(args(0),
        args(1).eval().asInstanceOf[Int])
        .toAggregateExpression()))

    ext.injectFunction((
      FunctionIdentifier("graft_round"),
      info("graft_round", "graft_round(x, s) - engine-portable round-half-up: floor(x*10^s + 0.5)/10^s (graft.functions.Exact.roundAt)"),
      (args: Seq[Expression]) => {
        // built from resolved Catalyst nodes — a Column round-trip here
        // would leave unresolved column-node expressions in the plan
        import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Divide, Floor, Literal, Multiply}
        import org.apache.spark.sql.types.DoubleType
        val f = Literal(math.pow(10, args(1).eval().asInstanceOf[Int]))
        Divide(
          Cast(Floor(Add(Multiply(Cast(args(0), DoubleType), f), Literal(0.5))), DoubleType),
          f)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      info("graft_normalize", "graft_normalize(text) - lowercase, redact email/IP/phone PII, collapse whitespace, trim (graft.functions.Text.normalize)"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace, StringTrim}
        import graft.functions.Text
        def rr(e: Expression, pat: String, rep: String) =
          RegExpReplace(e, Literal(pat), Literal(rep))
        // collapse whitespace BEFORE redaction — same order as
        // Text.normalize (idempotence depends on it)
        rr(rr(rr(
          StringTrim(rr(Lower(args(0)), "\\s+", " ")),
          Text.emailPattern, "<email>"),
          Text.ipPattern, "<ip>"),
          Text.phonePattern, "<phone>")
      }))
  }
}
