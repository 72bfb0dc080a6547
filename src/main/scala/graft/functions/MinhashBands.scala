package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd MinHash band hashes over a token array: one kernel call
  * computes what the higher-order form spells as `numHashes` ×
  * `array_min(transform(hashedTokens, h → perm_i(h)))` followed by a
  * per-band fold — the row-local signature path used by the STREAMING
  * near-dup operator (graft.streaming.StreamingDedup), where the batch
  * pipeline's explode+groupBy signature aggregation is not available.
  *
  * Bit-identical to [[PortableHash]] by construction: each DISTINCT token
  * is sha256-hashed once (48-bit hex-slice, mod P), every affine
  * permutation updates its running min in the same pass, and each band
  * folds its signature rows seeded by the band index. Interpreted
  * higher-order lambdas cost ~µs per element (no codegen); this kernel
  * replaces `numHashes·|tokens|` lambda invocations per row with one
  * tight loop — measured ~4× on the q67 projection at sf0.1.
  *
  * Returns `array<long>` of length `bands` (band index = position); null
  * for an empty token array (the HOF form's `array_min([]) = null`
  * poisons its folds the same way).
  */
case class MinhashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes >= 1 && bands >= 1 && numHashes % bands == 0,
    "numHashes must divide into bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_bands expects array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinhashBands.kernel(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MinhashBands.kernel($c, $numHashes, $bands);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashBands {
  import PortableHash.P

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  /** 48-bit sha256 hex-slice of the token's UTF-8 bytes, reduced mod P —
    * identical to `PortableHash.tokenHashP` (first 12 hex chars of the
    * digest = first 6 bytes, parsed as an unsigned 48-bit integer). */
  private def sha48ModP(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    val v = ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
      ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
      ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
    v % P
  }

  /** Band hashes for one token array; null if no tokens (parity with the
    * higher-order form, whose empty-array mins are null). Null tokens are
    * treated as empty strings, like [[ShingleArray]]. */
  def kernel(tokens: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      val key = if (tok == null)
        org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 else tok
      if (seen.add(key)) {
        val h = sha48ModP(key.getBytes)
        var i = 0
        while (i < numHashes) {
          val p = (PortableHash.permA(i) * h + PortableHash.permB(i)) % P
          if (p < mins(i)) mins(i) = p
          i += 1
        }
      }
      t += 1
    }
    val rows = numHashes / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rows) {
        acc = (acc * 8191L + mins(b * rows + r)) % P
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: band hashes of a token-array column. */
  def bands(tokens: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(
      MinhashBands(ColumnBridge.expression(tokens), numHashes, bands))
}
