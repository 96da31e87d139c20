package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers graft's native Catalyst
  * expressions so they are callable from SQL text and `expr(...)` in
  * any session configured with
  * `spark.sql.extensions=graft.functions.GraftExtensions`
  * (GraftSession sets this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extensions: the native as-of and range joins'
    // planner strategies
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    // optimizer-side interval-join detection: the composable inner
    // spelling (key equi + strict lower + inclusive upper bound)
    // plans as the native merge exec without the explicit API
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinAutoStrategy)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_sim expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_i64"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_i64 expects 2 arguments, got ${children.length}")
        DotProductLong(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"nfc_normalize expects 1 argument, got ${children.length}")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"strip_accents expects 1 argument, got ${children.length}")
        StripAccents(children.head)
      }))
  }
}
