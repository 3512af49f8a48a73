package graft

import org.apache.spark.sql.catalyst.expressions.Expression

/** Codegen/interpreted parity net over the WHOLE custom-expression
  * library.
  *
  * Every hand-written `doGenCode` is a second implementation of its
  * expression's semantics, and a divergence between the generated Java
  * and `nullSafeEval` is invisible to the DuckDB oracle gate (which
  * only ever sees whichever path the planner picked — in practice the
  * codegen one). The r12 centroid expressions were written with three
  * parity hazards live (IEEE op order, Double.compare total order,
  * null-field skips), which is exactly the class this net catches for
  * ALL families at once instead of per-expression ad-hoc tests.
  *
  * Mechanism: walk each catalog query's ANALYZED plan (cheap — no
  * execution) for expression nodes from `graft.functions`; for every
  * query that carries one, run it at sf0.001 under the default session
  * and again under `factoryMode=NO_CODEGEN` + `wholeStage=false` (the
  * pair that actually routes through the interpreted eval — wholeStage
  * alone still codegens projections), and require the sorted row sets
  * to be string-identical. Construction happens INSIDE each conf mode,
  * so eagerly-materializing queries (the localCheckpoint CC family)
  * exercise interpreted eval in their iteration loops too.
  *
  * The ≥ 20 floor is an anti-vacuity tripwire: if a refactor moved the
  * expression library out of `graft.functions` (or the walk broke),
  * this test must fail loudly rather than silently compare nothing.
  */
class EvalModeParitySpec extends SparkSpec {

  private def usesCustomExpression(name: String): Boolean = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    var found = false
    df.queryExecution.analyzed.foreach { plan =>
      plan.expressions.foreach { root =>
        root.foreach { e: Expression =>
          if (e.getClass.getName.startsWith("graft.functions.")) found = true
        }
      }
    }
    found
  }

  test("every catalog query touching a custom expression is codegen/interpreted identical") {
    // Detection pass builds analyzed plans only — except the eager
    // (localCheckpoint-iterating) queries, which also execute during
    // construction; that cost is paid once here and once per mode.
    val targets = SparkEntry.queries.keys.toSeq.sorted.filter(usesCustomExpression)
    assert(targets.size >= 20,
      s"parity net unexpectedly small (${targets.size}): ${targets.mkString(",")}")
    info(s"parity net: ${targets.size} queries carry custom expressions")

    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf0001)
        .collect().map(_.toString).sorted.toSeq

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    targets.foreach { name =>
      val codegen = rows(name)
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted =
        try rows(name)
        finally {
          spark.conf.set("spark.sql.codegen.wholeStage", "true")
          spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        }
      if (codegen != interpreted) {
        val diff = codegen.diff(interpreted).take(2) ++
          interpreted.diff(codegen).take(2)
        failures += s"$name: ${diff.mkString(" | ")}"
      }
      graft.core.CacheScope.releaseStragglers(spark)
    }
    assert(failures.isEmpty,
      s"codegen/interpreted divergence in:\n${failures.mkString("\n")}")
  }
}
