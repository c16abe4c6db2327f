package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector: makes the engine's codegen'd expressions
  * (graft_dot / graft_charfold / graft_shingles) available in any session
  * started with
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * — including plain `spark-sql` / `spark-submit` jobs and SQL-only users
  * who never touch the Scala API ([[VectorExpressions.register]] is the
  * programmatic equivalent for sessions already running).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_],
               build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), build))
    inject(VectorExpressions.DotName, classOf[DotProduct],
      exprs => DotProduct(exprs(0), exprs(1)))
    inject(VectorExpressions.CharFoldName, classOf[CharFold],
      exprs => CharFold(exprs(0), exprs(1)))
    inject(VectorExpressions.ShinglesName, classOf[ShingleSet],
      exprs => ShingleSet(exprs(0), exprs(1)))
    inject(VectorExpressions.ShingleListName, classOf[ShingleList],
      exprs => ShingleList(exprs(0), exprs(1)))
    inject(VectorExpressions.MinHashSigName, classOf[MinHashSig],
      exprs => MinHashSig(exprs(0), exprs(1)))
    inject(VectorExpressions.NgramStatsName, classOf[NgramStats],
      exprs => NgramStats(exprs(0), exprs(1)))
  }
}
