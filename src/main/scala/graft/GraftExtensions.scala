package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomMightContain, BottomK, DotProduct,
  GkQuantiles, GkSketchAgg, GkUnionAgg, HeavyHittersAgg,
  HeavyHittersMergeAgg}

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions at session build time, so both the Column API and plain
  * SQL can use them without per-DataFrame registration:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT vec_dot(a, b) FROM vectors")
  * }}}
  *
  * The operators in graft.operators also self-register lazily
  * (VectorFunctions.register) so they work on vanilla sessions — this
  * class is the front door for SQL-first users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    val vecDot: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      graft.functions.Builders.binary("vec_dot")(DotProduct.apply))
    ext.injectFunction(vecDot)
    val bloomContain: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      graft.functions.Builders.binary("bloom_might_contain")(
        BloomMightContain.apply))
    ext.injectFunction(bloomContain)
    val bottomK: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
      FunctionIdentifier("bottom_k"),
      new ExpressionInfo(classOf[BottomK].getName, "bottom_k"),
      { exprs =>
        require(exprs.size == 3,
          s"bottom_k expects exactly 3 arguments, got ${exprs.size}")
        BottomK(exprs(0), exprs(1), exprs(2))
      })
    ext.injectFunction(bottomK)
    val heavyHitters: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
      { exprs =>
        require(exprs.size == 2,
          s"heavy_hitters expects (item, capacity), got ${exprs.size} args")
        HeavyHittersAgg(exprs(0), exprs(1))
      })
    ext.injectFunction(heavyHitters)
    val heavyHittersMerge: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
      FunctionIdentifier("heavy_hitters_merge"),
      new ExpressionInfo(classOf[HeavyHittersMergeAgg].getName,
        "heavy_hitters_merge"),
      { exprs =>
        require(exprs.size == 2,
          s"heavy_hitters_merge expects (summary, capacity), got ${exprs.size} args")
        HeavyHittersMergeAgg(exprs(0), exprs(1))
      })
    ext.injectFunction(heavyHittersMerge)
    val gkSketch: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
      FunctionIdentifier("gk_sketch_agg"),
      new ExpressionInfo(classOf[GkSketchAgg].getName, "gk_sketch_agg"),
      { exprs =>
        require(exprs.size == 2,
          s"gk_sketch_agg expects (value, eps), got ${exprs.size} args")
        GkSketchAgg(exprs(0), exprs(1))
      })
    ext.injectFunction(gkSketch)
    val gkUnion: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
      FunctionIdentifier("gk_union_agg"),
      new ExpressionInfo(classOf[GkUnionAgg].getName, "gk_union_agg"),
      { exprs =>
        require(exprs.size == 1,
          s"gk_union_agg expects (sketch), got ${exprs.size} args")
        GkUnionAgg(exprs(0))
      })
    ext.injectFunction(gkUnion)
    val gkQuantiles: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
      FunctionIdentifier("gk_quantiles"),
      new ExpressionInfo(classOf[GkQuantiles].getName, "gk_quantiles"),
      { exprs =>
        require(exprs.size == 2,
          s"gk_quantiles expects (sketch, probs), got ${exprs.size} args")
        GkQuantiles(exprs(0), exprs(1))
      })
    ext.injectFunction(gkQuantiles)
  }
}
