package graft.api

import graft.SparkSpec

/** The cluster-deployment story (R9): one `spark.sql.extensions=
  * graft.api.GraftExtensions` conf must carry the WHOLE engine surface —
  * functions, planner strategies for the custom nodes, and the pushdown
  * rules — with no driver-code wiring. */
class ExtensionsSpec extends SparkSpec {

  test("extensions inject the custom operator strategies and rules") {
    val (strategies, rules) = org.apache.spark.sql.GraftPlanBridge
      .buildExtensionParts(new GraftExtensions, spark)
    assert(strategies.contains(graft.plans.TopKPerGroupStrategy))
    assert(strategies.contains(graft.plans.AsOfJoinStrategy))
    assert(rules.contains(graft.plans.PushFilterThroughTopKPerGroup))
    assert(rules.contains(graft.plans.PushFilterThroughAsOfJoin))
  }

  test("injected minhash_sig builder accepts BIGINT literals") {
    // SQL integer literals can resolve as BIGINT; the extension-path
    // builder must coerce like the temp-function path does
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    val expr = graft.functions.MinHashSig(
      Literal.create(Seq("a", "b")), 8)
    assert(expr.numHashes === 8) // direct construction sanity
    // and through SQL with a plain integer literal on a real session:
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(minhash_sig(array('a','b'), 8)) AS n").head().getInt(0)
    assert(n === 8)
  }
}
