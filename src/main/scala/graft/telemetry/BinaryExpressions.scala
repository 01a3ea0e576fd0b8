package graft.telemetry

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for fixed-width binary field decode/encode.
  *
  * Custom expressions (not UDFs) so the decode stays inside whole-stage
  * codegen: `doGenCode` emits a static call into [[BinaryFieldOps]], which
  * the JIT inlines. Arguments are ordinary child expressions, so the decom
  * operator can drive them from broadcast-joined MIB columns
  * (offset/width/type vary per row after the packet×definition fan-out).
  */
abstract class BinaryFieldExpression extends Expression {
  override def nullable: Boolean = true

  protected def staticCall: String // e.g. "graft.telemetry.BinaryFieldOps.readNumberBoxed"
  protected def boxedJavaType: String
  protected def unboxExpr(tmp: String): String

  protected def evalKernel(
      data: Array[Byte], off: Int, bits: Int, ptype: String, le: Boolean): Any

  override def eval(input: InternalRow): Any = {
    val d = children(0).eval(input)
    val o = children(1).eval(input)
    val b = children(2).eval(input)
    val t = children(3).eval(input)
    val l = children(4).eval(input)
    if (d == null || o == null || b == null || t == null || l == null) null
    else
      evalKernel(
        d.asInstanceOf[Array[Byte]],
        o.asInstanceOf[Int],
        b.asInstanceOf[Int],
        t.asInstanceOf[UTF8String].toString,
        l.asInstanceOf[Boolean])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val tmp = ctx.freshName("boxed")
    val anyChildNull = gens.map(g => s"${g.isNull}").mkString(" || ")
    val code =
      code"""
        ${gens.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = true;
        ${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!($anyChildNull)) {
          $boxedJavaType $tmp = $staticCall(
            ${gens(0).value}, ${gens(1).value}, ${gens(2).value},
            ${gens(3).value}.toString(), ${gens(4).value});
          if ($tmp != null) {
            ${ev.isNull} = false;
            ${ev.value} = ${unboxExpr(tmp)};
          }
        }
      """
    ev.copy(code = code)
  }

  private object CodeGenerator {
    def javaType(dt: DataType): String =
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dt)
    def defaultValue(dt: DataType): String =
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.defaultValue(dt)
  }
}

/** read_binary_number(data, byte_offset, bit_length, param_type, little_endian)
  * -> DOUBLE (null when out of bounds or non-numeric type).
  */
case class ReadBinaryNumber(children: Seq[Expression]) extends BinaryFieldExpression {
  require(children.size == 5, "read_binary_number takes 5 args")
  override def dataType: DataType = DoubleType
  override protected def staticCall = "graft.telemetry.BinaryFieldOps.readNumberBoxed"
  override protected def boxedJavaType = "java.lang.Double"
  override protected def unboxExpr(tmp: String): String = s"$tmp.doubleValue()"
  override protected def evalKernel(
      data: Array[Byte], off: Int, bits: Int, ptype: String, le: Boolean): Any =
    BinaryFieldOps.readNumberBoxed(data, off, bits, ptype, le)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** read_binary_string(data, byte_offset, bit_length, param_type, little_endian)
  * -> STRING (ASCII, errors replaced, trailing NULs stripped).
  * param_type/little_endian are accepted for signature uniformity.
  */
case class ReadBinaryString(children: Seq[Expression]) extends BinaryFieldExpression {
  require(children.size == 5, "read_binary_string takes 5 args")
  override def dataType: DataType = StringType
  override protected def staticCall = "graft.telemetry.BinaryExpressions.readStringKernel"
  override protected def boxedJavaType = "org.apache.spark.unsafe.types.UTF8String"
  override protected def unboxExpr(tmp: String): String = tmp
  override protected def evalKernel(
      data: Array[Byte], off: Int, bits: Int, ptype: String, le: Boolean): Any =
    BinaryFieldOps.readStringField(data, off, bits)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** pack_uint_be(value) -> BINARY: big-endian fixed-width pack, wrapping
  * mod 2^(8*nBytes). Direct byte write — replaces the
  * unhex(lpad(hex(...))) chain, which allocated three strings per field
  * per row on the packet-synthesis hot path.
  */
case class PackUintBE(child: Expression, nBytes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBytes >= 1 && nBytes <= 8, s"nBytes must be 1..8, got $nBytes")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    BinaryFieldOps.packUintBE(input.asInstanceOf[Long], nBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.telemetry.BinaryFieldOps.packUintBE($c, $nBytes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** read_uint_be(data) -> BIGINT: big-endian unsigned read of `nBytes`
  * at fixed `byteOffset`; a partially-out-of-bounds slice reads the
  * available bytes, an empty slice is null (the substring/hex/conv
  * semantics this replaces).
  */
case class ReadUintBE(child: Expression, byteOffset: Int, nBytes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBytes >= 1 && nBytes <= 8, s"nBytes must be 1..8, got $nBytes")
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def eval(input: InternalRow): Any = {
    val d = child.eval(input)
    if (d == null) null
    else BinaryFieldOps.readUintBEBoxed(d.asInstanceOf[Array[Byte]], byteOffset, nBytes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gen = child.genCode(ctx)
    val tmp = ctx.freshName("boxedUint")
    val code =
      code"""
        ${gen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${gen.isNull}) {
          java.lang.Long $tmp = graft.telemetry.BinaryFieldOps.readUintBEBoxed(
            ${gen.value}, $byteOffset, $nBytes);
          if ($tmp != null) {
            ${ev.isNull} = false;
            ${ev.value} = $tmp.longValue();
          }
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinaryExpressions {
  // Static shim with the uniform 5-arg shape for generated code.
  def readStringKernel(
      data: Array[Byte], off: Int, bits: Int, ptype: String, le: Boolean): UTF8String =
    BinaryFieldOps.readStringField(data, off, bits)

  // Spark 4.x: Column wraps a ColumnNode; GraftShims bridges the
  // sql-private conversion.
  import org.apache.spark.sql.GraftShims.{column, expression}

  def readBinaryNumber(
      data: Column, byteOffset: Column, bitLength: Column,
      paramType: Column, littleEndian: Column): Column =
    column(ReadBinaryNumber(Seq(
      expression(data), expression(byteOffset), expression(bitLength),
      expression(paramType), expression(littleEndian))))

  def readBinaryString(
      data: Column, byteOffset: Column, bitLength: Column,
      paramType: Column, littleEndian: Column): Column =
    column(ReadBinaryString(Seq(
      expression(data), expression(byteOffset), expression(bitLength),
      expression(paramType), expression(littleEndian))))

  def packUintBE(value: Column, nBytes: Int): Column =
    column(PackUintBE(expression(value), nBytes))

  def readUintBE(data: Column, byteOffset: Int, nBytes: Int): Column =
    column(ReadUintBE(expression(data), byteOffset, nBytes))
}
