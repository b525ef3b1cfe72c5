package graft.exec

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * as SQL functions so the engine's primitives are usable from pure SQL
  * (`spark.sql.extensions=graft.exec.GraftExtensions`):
  *
  *   SELECT dp_noise(cnt, 'geometric', 2.0) FROM ...
  *
  * Mechanism names: geometric | laplace | gaussian | discrete_gaussian
  * (scale semantics as in [[NoiseMechanism]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dp_noise"),
      new ExpressionInfo(classOf[AddNoise].getName, "dp_noise"),
      GraftExtensions.dpNoiseBuilder))
  }
}

object GraftExtensions {

  /** Register the functions into an already-running session (for sessions
    * created without `spark.sql.extensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("dp_noise", dpNoiseBuilder, "built-in")

  private[exec] val dpNoiseBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.size == 3,
      "dp_noise(value, mechanism_name, scale) takes exactly 3 arguments")
    val name = exprs(1) match {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"dp_noise mechanism must be a string literal, got $other")
    }
    val scale = exprs(2) match {
      // SQL numeric literals arrive as Decimal (e.g. `2.0` is DECIMAL(2,1))
      case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
      case Literal(n: java.lang.Number, _)                   => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"dp_noise scale must be a numeric literal, got $other")
    }
    val mech = name match {
      case "geometric"         => NoiseMechanism.Geometric(scale)
      case "laplace"           => NoiseMechanism.Laplace(scale)
      case "gaussian"          => NoiseMechanism.Gaussian(scale)
      case "discrete_gaussian" => NoiseMechanism.DiscreteGaussian(scale)
      case other => throw new IllegalArgumentException(
        s"unknown noise mechanism '$other'")
    }
    if (mech.isNoiseless) exprs.head else AddNoise(exprs.head, mech)
  }
}
