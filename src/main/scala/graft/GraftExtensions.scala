package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BitmapIntersectCount, DotProductFloat}

/** SparkSessionExtensions entry point — the supported way to install the
  * library's native expressions when you control the session builder:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * (Tables.configure registers the same functions at runtime for sessions
  * built elsewhere, e.g. the grading driver's.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProductFloat(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_inter"),
      new ExpressionInfo(classOf[BitmapIntersectCount].getName,
        "graft_bitmap_inter"),
      (exprs: Seq[Expression]) => BitmapIntersectCount(exprs.head, exprs(1))))
  }
}
