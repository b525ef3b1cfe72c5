package graft.exec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Codegen'd nearest-centroid argmin over a LITERAL centroid table: for an
  * `array<long>` vector, the `(squared-L2 distance, centroid index)` of the
  * nearest of `centroids`, ties to the smallest index — exactly the
  * lexicographic `array_min(array(struct(dist, id), ...))` rule of the
  * column-expression formulation it replaces in
  * [[graft.pipeline.Clustering.kMeansMicro]].
  *
  * Why an expression and not composed functions: the composed form builds k
  * separate `aggregate(zip_with(...))` sub-trees — Spark's higher-order
  * functions are `CodegenFallback`, so every candidate distance costs an
  * interpreted per-element lambda eval (boxing per element per centroid per
  * row), and past k in the hundreds the k-wide projection tree strains
  * Janino method limits and falls back to fully interpreted mode — a silent
  * ~10x on the hottest projection of the distributed k-means/IVF path. Here
  * the whole argmin is ONE tight primitive double loop over a `long[][]`
  * reference object: stays inside whole-stage codegen at any k the
  * driver-residency budget admits, no per-centroid sub-expression, no
  * boxing.
  *
  * Contract (enforced by the caller's validation pass): the input array has
  * no NULL elements and its length equals every centroid's length. The
  * caller also owns the overflow budget (see kMeansMicro's scaladoc):
  * per-dimension squared distances must fit a long.
  */
final case class NearestCentroid(child: Expression,
    centroids: Array[Array[Long]]) extends UnaryExpression {

  require(centroids.nonEmpty, "NearestCentroid needs at least one centroid")

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"NearestCentroid requires array<bigint> input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toLongArray()
    val row = new Array[Any](2)
    val out = NearestCentroid.argmin(centroids, v)
    row(0) = out._1
    row(1) = out._2
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tab = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("vec")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val cent = ctx.freshName("cent")
      s"""
         |long[] $v = $c.toLongArray();
         |long $bestD = Long.MAX_VALUE;
         |int $bestC = 0;
         |for (int $ci = 0; $ci < $tab.length; $ci++) {
         |  long[] $cent = $tab[$ci];
         |  long $d = 0L;
         |  for (int $j = 0; $j < $v.length; $j++) {
         |    long $t = $v[$j] - $cent[$j];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $bestC = $ci; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ java.lang.Long.valueOf($bestD), java.lang.Integer.valueOf($bestC) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Shared interpreted kernel (also the spec's ground truth). */
  private[graft] def argmin(tab: Array[Array[Long]], v: Array[Long]): (Long, Int) = {
    var bestD = Long.MaxValue
    var bestC = 0
    var ci = 0
    while (ci < tab.length) {
      val cent = tab(ci)
      var d = 0L
      var j = 0
      while (j < v.length) { val t = v(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; bestC = ci }
      ci += 1
    }
    (bestD, bestC)
  }
}
