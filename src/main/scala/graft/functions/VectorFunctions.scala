package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (dot product, cosine
  * similarity) over `array<float>` / `array<double>` columns.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions stay on
  * the interpreted path (each lambda call allocates), which is the hot
  * loop of ANN search over 10^9 vectors. These expressions generate a
  * tight primitive Java loop inside whole-stage codegen — no boxing,
  * no per-element lambda dispatch — and fall back to a primitive
  * `while` loop in interpreted eval. Accumulation is sequential
  * (index order), so results are deterministic and reproducible by the
  * DuckDB oracle's list kernels.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(
      s"vector function expects array inputs, got $other")
  }

  protected def getD(a: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType  => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType   => a.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  protected def javaGetter(arr: String, i: String, t: DataType): String = t match {
    case DoubleType  => s"$arr.getDouble($i)"
    case FloatType   => s"(double) $arr.getFloat($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
}

/** dot(a, b) = Σ a_i·b_i (sequential, computed in double). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += getD(a, i, ta) * getD(b, i, tb); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left), elemType(right))
      s"""
         |int vf_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double vf_dot = 0.0;
         |for (int vf_i = 0; vf_i < vf_n; vf_i++) {
         |  vf_dot += ${javaGetter(a, "vf_i", ta)} * ${javaGetter(b, "vf_i", tb)};
         |}
         |${ev.value} = vf_dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖); null when either norm is zero
  * (matching `corr`-style undefinedness rather than fabricating 0). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getD(a, i, ta); val y = getD(b, i, tb)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left), elemType(right))
      s"""
         |int vf_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double vf_dot = 0.0, vf_na = 0.0, vf_nb = 0.0;
         |for (int vf_i = 0; vf_i < vf_n; vf_i++) {
         |  double vf_x = ${javaGetter(a, "vf_i", ta)};
         |  double vf_y = ${javaGetter(b, "vf_i", tb)};
         |  vf_dot += vf_x * vf_y; vf_na += vf_x * vf_x; vf_nb += vf_y * vf_y;
         |}
         |double vf_denom = java.lang.Math.sqrt(vf_na) * java.lang.Math.sqrt(vf_nb);
         |if (vf_denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = vf_dot / vf_denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** Column-API entry points. */
  def vec_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** SQL registration: `SELECT cosine_sim(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
  }
}
