package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter membership probe as a codegen Catalyst expression.
  *
  * The scale path for set-membership filtering (benchmark
  * decontamination, blocklists): the build side is compacted into a
  * bloom filter ONCE (MBs for millions of entries at 1% fpp,
  * `DataFrameStat.bloomFilter` — a distributed treeAggregate), and the
  * probe ships to every task as part of the serialized expression —
  * no broadcast JOIN, no shuffle of the probe side at all, a plain
  * codegen'd Filter over the scan. False positives at the configured
  * fpp, never false negatives, so a downstream exact check only sees
  * fpp·|corpus| survivors.
  *
  * Input is the xxhash64 of the value (both sides hash with Spark's
  * codegen'd XxHash64, so build and probe agree); the sketch is
  * deserialized lazily once per executor.
  */
case class BloomContains(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects a LONG hash (xxhash64), got " +
          t.simpleString)
    }

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  def probe(h: Long): Boolean = filter.mightContainLong(h)

  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomContains].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override def prettyName: String = "graft_bloom_contains"

  override protected def withNewChildInternal(
      newChild: Expression): BloomContains = copy(child = newChild)
}

object SketchExpressions {
  val BloomContainsName = "graft_bloom_contains"

  private[graft] def bytesArg(fn: String, e: Expression): Array[Byte] =
    e match {
      case Literal(v: Array[Byte], BinaryType) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects a binary literal (serialized bloom filter), " +
          s"got $other")
    }

  /** Idempotent per-session registration so `call_function` resolves. */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomContainsName,
      { exprs =>
        BloomContains(exprs(0), bytesArg(BloomContainsName, exprs(1)))
      }, "built-in")
  }
}
