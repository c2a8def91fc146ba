package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions for SQL
  * users: `SELECT haversine_m(lat1, lon1, lat2, lon2)`.
  *
  * Install via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.haversineDescriptor)
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    // radius-search filters gain sargable coordinate bands (GeoPruneRule)
    ext.injectOptimizerRule(_ => GeoPruneRule)
  }
}

object GraftExtensions {
  private def build(args: Seq[Expression]): Expression = {
    require(args.length == 4,
      s"haversine_m expects 4 arguments (lat1, lon1, lat2, lon2), got ${args.length}")
    Haversine(args(0), args(1), args(2), args(3))
  }

  private def buildCosine(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"cosine_sim expects 2 array arguments, got ${args.length}")
    CosineSimilarity(args(0), args(1))
  }

  val haversineDescriptor
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("haversine_m"),
      new ExpressionInfo(classOf[Haversine].getName, "haversine_m"),
      build)

  val cosineDescriptor
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      buildCosine)

  /** Imperative registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "haversine_m", build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", buildCosine, "scala_udf")
  }
}
