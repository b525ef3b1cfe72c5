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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        // catalog metadata: point introspection at this registry, not at
        // any single expression class (most functions here are composed
        // Column trees, not one Expression)
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Lift a Column->Column function into an Expression builder. */
  private def lift1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 1, "expected exactly 1 argument")
    ColumnBridge.resolvedExpression(f(ColumnBridge.column(exprs.head)))
  }

  private def lift2(
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "expected exactly 2 arguments")
    ColumnBridge.resolvedExpression(
      f(ColumnBridge.column(exprs(0)), ColumnBridge.column(exprs(1))))
  }

  private def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(i: java.lang.Integer, _) => i.intValue
    case Literal(l: java.lang.Long, _)    => l.intValue
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** The engine primitives exposed to pure SQL (name -> builder). Lazy:
    * it references dpNoiseBuilder, which is defined further down the object.
    */
  private[exec] lazy val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dp_noise" -> dpNoiseBuilder,
    "token_count" -> lift1(graft.pipeline.TextAnalysis.tokenCount),
    "mean_word_length" -> lift1(graft.pipeline.TextAnalysis.meanWordLength),
    "quality_score" -> lift1(graft.pipeline.TextAnalysis.qualityScore),
    "language_id" -> lift1(graft.pipeline.TextAnalysis.languageId),
    "doc_fingerprint" -> lift1(graft.pipeline.TextAnalysis.fingerprint),
    "simhash64" -> lift1(graft.pipeline.Dedup.simhash64),
    "cosine_similarity" -> lift2(graft.pipeline.Similarity.cosine),
    "duplicate_line_fraction" ->
      lift1(graft.pipeline.TextAnalysis.duplicateLineFraction),
    "repeated_ngram_fraction" -> { exprs =>
      require(exprs.size == 2,
        "repeated_ngram_fraction(text, n) takes exactly 2 arguments")
      val n = intLiteral(exprs(1), "repeated_ngram_fraction n")
      ColumnBridge.resolvedExpression(
        graft.pipeline.TextAnalysis.repeatedNgramFraction(
          ColumnBridge.column(exprs(0)), n))
    },
    "ngram_jaccard" -> { exprs =>
      require(exprs.size == 3, "ngram_jaccard(a, b, n) takes exactly 3 arguments")
      val n = intLiteral(exprs(2), "ngram_jaccard n")
      ColumnBridge.resolvedExpression(graft.pipeline.Dedup.ngramJaccard(
        ColumnBridge.column(exprs(0)), ColumnBridge.column(exprs(1)), n))
    },
    "bounded_collect_list" -> { exprs =>
      require(exprs.size == 2,
        "bounded_collect_list(value, limit) takes exactly 2 arguments")
      BoundedCollectList(exprs.head, intLiteral(exprs(1), "bounded_collect_list limit"))
        .toAggregateExpression()
    },
    "compression_ratio" -> lift1(graft.pipeline.TextAnalysis.compressionRatio),
    "image_phash" -> lift1(c => graft.pipeline.Multimodal.pHash(c)),
    "audio_fingerprint" -> lift1(c =>
      graft.pipeline.Multimodal.audioFingerprintCol(c)),
    "z_value" -> { exprs =>
      require(exprs.size == 3, "z_value(x, y, bits) takes exactly 3 arguments")
      val bits = intLiteral(exprs(2), "z_value bits")
      ColumnBridge.resolvedExpression(graft.sources.ZOrder.zValue2(
        ColumnBridge.column(exprs(0)), ColumnBridge.column(exprs(1)), bits))
    },
    "space_saving_topk" -> { exprs =>
      require(exprs.size == 3,
        "space_saving_topk(key, capacity, k) takes exactly 3 arguments")
      SpaceSavingTopK(exprs.head,
        intLiteral(exprs(1), "space_saving_topk capacity"),
        intLiteral(exprs(2), "space_saving_topk k")).toAggregateExpression()
    },
    "kll_quantiles" -> { exprs =>
      require(exprs.size >= 3,
        "kll_quantiles(value, k, p...) takes the value, k, and at least " +
          "one percentile literal")
      KllQuantileAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head,
          org.apache.spark.sql.types.DoubleType),
        intLiteral(exprs(1), "kll_quantiles k"),
        exprs.drop(2).map(doubleLiteral(_, "kll_quantiles percentile")))
        .toAggregateExpression()
    },
    "kll_sketch" -> { exprs =>
      require(exprs.size == 2, "kll_sketch(value, k) takes exactly 2 arguments")
      KllSketchAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head,
          org.apache.spark.sql.types.DoubleType),
        intLiteral(exprs(1), "kll_sketch k")).toAggregateExpression()
    },
    "kll_union" -> { exprs =>
      require(exprs.size >= 3,
        "kll_union(sketch, k, p...) takes the sketch, k, and at least " +
          "one percentile literal")
      KllUnionAgg(exprs.head, intLiteral(exprs(1), "kll_union k"),
        exprs.drop(2).map(doubleLiteral(_, "kll_union percentile")))
        .toAggregateExpression()
    },
    "kmv_sketch" -> { exprs =>
      require(exprs.size == 2, "kmv_sketch(value, k) takes exactly 2 arguments")
      val k = intLiteral(exprs(1), "kmv_sketch k")
      ColumnBridge.resolvedExpression(
        Kmv.sketch(ColumnBridge.column(exprs.head), k))
    },
    "kmv_estimate" -> { exprs =>
      require(exprs.size == 2,
        "kmv_estimate(sketch, k) takes exactly 2 arguments")
      val k = intLiteral(exprs(1), "kmv_estimate k")
      ColumnBridge.resolvedExpression(
        Kmv.estimate(ColumnBridge.column(exprs.head), k))
    })

  private def doubleLiteral(e: Expression, what: String): Double = e match {
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(n: java.lang.Number, _)                   => n.doubleValue
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** Register the functions into an already-running session (for sessions
    * created without `spark.sql.extensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

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
