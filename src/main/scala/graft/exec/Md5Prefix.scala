package graft.exec

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Codegen'd `md5-prefix-as-long`: the unsigned value of the first
  * `hexLen` hex characters of md5(bytes), as one tight digest-and-fold —
  * BIT-IDENTICAL to the composed form it replaces,
  * `conv(substring(md5(x), 1, hexLen), 16, 10) cast long`, which is the
  * repo's engine-portable deterministic draw hash (DuckDB:
  * `('0x' || substr(md5(x), 1, hexLen))::BIGINT`).
  *
  * Why an expression and not the composed built-ins (guide §4: expression
  * efficiency on the hot path): the composed form materializes the full
  * 32-character hex STRING of every digest, substrings it, and re-parses
  * the prefix back to a number — three short-lived allocations and a
  * character-wise parse per row, on kernels that run millions of times per
  * query (negative sampling draws, hash splits, table digests). Here the
  * digest's leading nibbles fold directly into a long; the only allocation
  * is the 16-byte digest itself, and the MessageDigest instance is
  * thread-local instead of per-call. `hexLen` <= 15 keeps the value
  * non-negative in a signed long (60 bits), matching the composed form's
  * range exactly.
  */
final case class Md5Prefix(child: Expression, hexLen: Int)
    extends UnaryExpression {

  require(hexLen >= 1 && hexLen <= 15,
    s"hexLen must be in [1, 15], got $hexLen")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"Md5Prefix requires binary input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.prefixLong(input.asInstanceOf[Array[Byte]], hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exec.Md5Prefix.prefixLong($c, $hexLen);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {
  private val tlDigest = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Unsigned value of the first `hexLen` hex chars of md5(bytes). */
  def prefixLong(bytes: Array[Byte], hexLen: Int): Long = {
    val md = tlDigest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val b = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib.toLong
      i += 1
    }
    v
  }
}
