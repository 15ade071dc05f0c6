package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for embedding dot products.
  *
  * The composed form — aggregate(zip_with(a, b, multiply), 0.0, add) —
  * is a higher-order function chain that Spark evaluates INTERPRETED,
  * one lambda dispatch per element; on |Q|·|C| candidate pairs × dim 64
  * that dominates similarity-search cost. This expression generates a
  * tight Java loop inside whole-stage codegen instead (preference order
  * from the build brief: custom Expression with doGenCode beats UDF
  * beats interpreted composition).
  *
  * Semantics are IDENTICAL to the composed form: elements widened to
  * double, sequential accumulation in index order (deterministic —
  * matches the DuckDB oracle's list_reduce fold). Array elements are
  * assumed non-null (embedding vectors); a null ARRAY yields null via
  * BinaryExpression's default null handling.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects float/double arrays, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names, NOT literals: two dot products collapsed into one
      // codegen function (e.g. a norm and a cosine in one Project)
      // would otherwise redefine the locals — Janino rejects the class
      // and the whole stage silently drops to interpreted execution
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotS")
      val i = ctx.freshName("dotI")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $getA * $getB;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object SrpKernel {
  /** The deterministic hyperplane family shared by [[bucket]] and
    * [[project]]: coef(p,d) = (t² + p mod 99991 mod 1000)/1000 − 0.5
    * with t = (761p + 503d + 97) mod 100000 — a QUADRATIC mix, not an
    * affine lattice. The round-14 rank audit showed the original
    * affine family (761p + 503d + 97 mod 1000) caps at matrix rank 16
    * whatever the plane count — planes 17+ added no new directions,
    * silently coarsening LSH buckets at derived plane counts a 100 TB
    * corpus reaches and making the JL projection rank-deficient. The
    * quadratic term breaks the lattice: full rank up to the vector
    * dimension, and empirically indistinguishable from a true random
    * uniform family on neighbor-recall (both 0.12–0.16 where the
    * affine lattice read 0.02). All operands stay non-negative and
    * below 2^63 (t² < 10^10), so the `%` replays identically in any
    * engine — the DuckDB oracles inline this exact arithmetic. */
  @inline private def coef(p: Int, d: Int): Double = {
    val t = (p * 761L + d * 503L + 97L) % 100000L
    ((t * t + p) % 99991L % 1000L) / 1000.0 - 0.5
  }

  /** Sign-random-projection bucket of a float/double vector:
    * bit p of the result is set iff Σ_d coef(p,d)·vec[d] >= 0, the
    * projection accumulated as a left fold in dimension order —
    * bit-identical to the DuckDB oracle's list_reduce replay.
    * A vector shorter than `dim` — or carrying a NULL element — mirrors
    * element_at's null poisoning: the projection sum goes null, no bit
    * is set, bucket = 0 (the composed column form this kernel replaced
    * behaved exactly so; silently reading a null slot as 0.0 would
    * CHANGE bucket assignment for such vectors). */
  def bucket(vec: ArrayData, isFloat: Boolean, dim: Int,
      planes: Int): Long = {
    if (vec.numElements() < dim) return 0L
    var d0 = 0
    while (d0 < dim) {
      if (vec.isNullAt(d0)) return 0L
      d0 += 1
    }
    var b = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        proj += x * coef(p, d)
        d += 1
      }
      if (proj >= 0) b |= 1L << p
      p += 1
    }
    b
  }

  /** Unthresholded image of the vector under the SAME deterministic
    * hyperplane family as [[bucket]] — [[bucket]] is exactly the sign
    * bits of this projection. With `planes` < dim this is
    * Johnson–Lindenstrauss dimensionality reduction by a fixed
    * zero-mean uniform(−0.5, 0.5) family (any zero-mean sub-Gaussian
    * family satisfies JL; the database-friendly ±1 family of
    * Achlioptas 2003 is the usual citation): pairwise distances are
    * preserved to 1±ε at planes = O(log n / ε²), so downstream ANN /
    * k-means / near-dup runs on `planes` dims at cost ∝ planes/dim.
    * Same left-fold accumulation order (the DuckDB replay contract);
    * a short vector or a null element yields an EMPTY array — the
    * projection analog of [[bucket]]'s 0. */
  def project(vec: ArrayData, isFloat: Boolean, dim: Int,
      planes: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val empty = Array.empty[Double]
    if (vec.numElements() < dim) return new GenericArrayData(empty)
    var d0 = 0
    while (d0 < dim) {
      if (vec.isNullAt(d0)) return new GenericArrayData(empty)
      d0 += 1
    }
    val out = new Array[Double](planes)
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        proj += x * coef(p, d)
        d += 1
      }
      out(p) = proj
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd JL random projection over an embedding column: dim →
  * planes doubles under [[SrpKernel.project]]'s fixed hyperplanes.
  * One JIT loop per row, no shuffle — the narrow pass that cuts every
  * downstream vector operator's cost by planes/dim at 100 TB. */
case class SrpProject(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _ if planes < 1 || planes > 4096 =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_srp_project planes must be in [1, 4096], got $planes")
      case _ if dim < 1 =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_srp_project dim must be >= 1, got $dim")
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_srp_project expects float/double array, got " +
            t.simpleString)
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    SrpKernel.project(input.asInstanceOf[ArrayData], isFloat, dim,
      planes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SrpKernel.project($c, $isFloat, $dim, $planes)")

  override protected def withNewChildInternal(
      newChild: Expression): SrpProject = copy(child = newChild)
}

/** Codegen'd SRP-LSH bucket key over an embedding column. The composed
  * column form is a dim×planes-term expression tree (256 nodes at
  * dim 64) — legal but codegen-hostile (method splitting, no loop) and
  * rebuilt per query; this is one JIT loop. */
case class SrpBucket(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : TypeCheckResult =
    child.dataType match {
      // planes > 63 would wrap the Long bit shift; reject at analysis
      case _ if planes < 1 || planes > 63 =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_srp_bucket planes must be in [1, 63], got $planes")
      case _ if dim < 1 =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_srp_bucket dim must be >= 1, got $dim")
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_srp_bucket expects float/double array, got ${t.simpleString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    SrpKernel.bucket(input.asInstanceOf[ArrayData], isFloat, dim, planes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SrpKernel.bucket($c, $isFloat, $dim, $planes)")

  override protected def withNewChildInternal(
      newChild: Expression): SrpBucket = copy(child = newChild)
}

object VectorExpressions {
  val DotName = "graft_dot"
  val SrpName = "graft_srp_bucket"
  val SrpProjectName = "graft_srp_project"
  val TopKName = "graft_topk"

  /** Idempotent per-session registration so `call_function` resolves. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(DotName,
      { exprs => DotProduct(exprs(0), exprs(1)) }, "built-in")
    reg.createOrReplaceTempFunction(SrpName,
      { exprs =>
        SrpBucket(exprs(0), LitArg.int(SrpName, exprs(1)),
          LitArg.int(SrpName, exprs(2)))
      }, "built-in")
    reg.createOrReplaceTempFunction(SrpProjectName,
      { exprs =>
        SrpProject(exprs(0), LitArg.int(SrpProjectName, exprs(1)),
          LitArg.int(SrpProjectName, exprs(2)))
      }, "built-in")
    reg.createOrReplaceTempFunction(TopKName,
      { exprs => BoundedTopK(exprs(0), LitArg.int(TopKName, exprs(1))) },
      "built-in")
  }
}
