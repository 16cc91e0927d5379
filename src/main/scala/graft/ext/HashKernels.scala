package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels shared by interpreted eval and generated code.
  *
  * Semantics are locked to the md5-derived portable family used across the
  * engine and the DuckDB oracle:
  *   hash60(s)   = first 15 hex chars of md5(s) as a long
  *   h1(s)/h2(s) = hex chars [1,7] / [8,14] of md5(s) (28 bits each)
  *   minhash_i   = min over shingles of h1 + i*h2  (Kirsch-Mitzenmacher —
  *                 one md5 per shingle instead of one per (shingle, seed))
  *   simhash60 bit i = set iff >= half the token hashes have bit i set
  */
object HashKernels {

  private def md5Hex(s: UTF8String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  def hash60(s: UTF8String): Long = java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  val emptyArray: ArrayData = new GenericArrayData(Array.empty[Any])

  /** MinHash signature over shingle strings: k values h1 + i*h2, min-ed. */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val hex = md5Hex(shingles.getUTF8String(j))
      val h1 = java.lang.Long.parseLong(hex.substring(0, 7), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(7, 14), 16)
      var i = 0
      while (i < k) {
        val h = h1 + i * h2
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct word n-gram shingles (first-occurrence order); fewer than n
    * tokens collapse to one whole-text shingle — identical semantics to
    * [[graft.ops.TextFunctions.shingles]]. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m   = toks.numElements()
    val sep = UTF8String.fromString(" ")
    val out = new java.util.LinkedHashSet[UTF8String]
    if (m < n) {
      val parts = new Array[UTF8String](m)
      var i = 0
      while (i < m) { parts(i) = toks.getUTF8String(i); i += 1 }
      out.add(UTF8String.concatWs(sep, parts: _*))
    } else {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** 60-bit SimHash from precomputed token hashes. */
  def simhash60(th: ArrayData): Long = {
    val n = th.numElements()
    val counts = new Array[Int](60)
    var j = 0
    while (j < n) {
      val h = th.getLong(j)
      var i = 0
      while (i < 60) { if (((h >>> i) & 1L) != 0L) counts(i) += 1; i += 1 }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 60) { if (2 * counts(i) >= n) out |= (1L << i); i += 1 }
    out
  }
}

/** `graft_minhash_sig(shingles, k)`: MinHash signature as array<bigint>. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val arr = if (v == null) HashKernels.emptyArray else v.asInstanceOf[ArrayData]
    HashKernels.minhashSig(arr, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.ext.HashKernels.minhashSig(
            ${c.isNull} ? graft.ext.HashKernels.emptyArray() : ${c.value}, $k);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingles(tokens, n)`: distinct word n-grams as array<string>. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val arr = if (v == null) HashKernels.emptyArray else v.asInstanceOf[ArrayData]
    HashKernels.shingles(arr, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.ext.HashKernels.shingles(
            ${c.isNull} ? graft.ext.HashKernels.emptyArray() : ${c.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash60(token_hashes)`: 60-bit SimHash as bigint. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else HashKernels.simhash60(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L : graft.ext.HashKernels.simhash60(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
