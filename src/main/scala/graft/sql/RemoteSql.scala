package graft.sql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.types.StructType

import graft.tables.RemoteTable

/** Remote tables on the SQL surface (reference:
  * samza-sql/.../translator/JoinTranslator.java:279-291 — stream ⋈
  * remote table plans a per-message lookup, not a scan; planner rule
  * SamzaSqlFilterRemoteJoinRule.java:51 pushes stream-side filters
  * below the lookup so unmatched traffic never pays a remote call).
  *
  * Spark shape: a registered remote table is a zero-row marker view
  * (so the statement ANALYZES against its schema — names, types,
  * resolution all Catalyst's), and after analysis a plan rewrite
  * replaces every Join against a marker with the
  * RemoteTable.lookupIterator mapPartitions stage, aliased back to the
  * join's original output attribute ids so the surrounding plan is
  * untouched. The filter-before-lookup rule runs first, at the plan
  * level, exactly like the reference's HEP rule.
  */
object RemoteSql {

  /** A remote table visible to SQL: `schema` is the full view schema
    * (key column included); `reader` returns the VALUE columns (schema
    * minus key, in schema order) for a key. */
  final case class RemoteTableDef(
      keyCol: String,
      schema: StructType,
      reader: RemoteTable.AsyncReader[Any, Row],
      cfg: RemoteTable.LookupConfig = RemoteTable.LookupConfig()) {
    require(schema.fieldNames.contains(keyCol),
      s"key column $keyCol missing from remote table schema")
  }

  private val registry =
    new ConcurrentHashMap[(SparkSession, String), RemoteTableDef]()

  /** Register `name` as a remote table for this session: SQL statements
    * may join it like any stream; scanning it yields zero rows (it is
    * lookup-only, as in the reference — remote tables have no
    * replayable scan). */
  def registerRemote(spark: SparkSession, name: String,
      d: RemoteTableDef): Unit = {
    registry.put((spark, name.toLowerCase), d)
    spark.createDataFrame(java.util.Collections.emptyList[Row](), d.schema)
      .createOrReplaceTempView(name)
  }

  private def remoteDef(spark: SparkSession, p: LogicalPlan)
      : Option[RemoteTableDef] = p match {
    case SubqueryAlias(id, child) =>
      Option(registry.get((spark, id.name.toLowerCase)))
        .orElse(remoteDef(spark, child))
    case v: View => remoteDef(spark, v.child)
    case _ => None
  }

  private def hasRemotes(spark: SparkSession): Boolean = {
    val it = registry.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) return true
    false
  }

  /** Run a SELECT, rewriting remote-table joins into lookup stages.
    * Falls through to plain spark.sql when the session has no remote
    * tables registered. */
  def select(spark: SparkSession, sql: String): DataFrame = {
    if (!hasRemotes(spark)) return spark.sql(sql)
    val analyzed = spark.sql(sql).queryExecution.analyzed

    // 1. filter-before-lookup (SamzaSqlFilterRemoteJoinRule.java:244-257):
    // a filter over only stream-side columns moves below the join, so
    // the lookup stage sees post-filter traffic
    val filtered = analyzed.transformUp {
      case Filter(cond, j @ Join(l, r, _, _, _))
          if remoteDef(spark, r).isDefined &&
            cond.references.subsetOf(l.outputSet) =>
        j.copy(left = Filter(cond, l))
    }

    // 2. remote joins → mapPartitions lookup stages
    val rewritten = filtered.transformUp {
      case j @ Join(l, r, joinType, cond, _)
          if remoteDef(spark, r).isDefined =>
        val d = remoteDef(spark, r).get
        val inner = joinType match {
          case Inner => true
          case LeftOuter => false
          case other => throw new IllegalArgumentException(
            s"remote table joins support INNER and LEFT OUTER with the " +
              s"remote table on the right, got $other")
        }
        val rKeyAttr = r.output.find(_.name.equalsIgnoreCase(d.keyCol)).get
        val streamKey = cond match {
          case Some(EqualTo(a: AttributeReference, b: AttributeReference))
              if b.exprId == rKeyAttr.exprId && l.outputSet.contains(a) => a
          case Some(EqualTo(a: AttributeReference, b: AttributeReference))
              if a.exprId == rKeyAttr.exprId && l.outputSet.contains(b) => b
          case other => throw new IllegalArgumentException(
            "remote table joins require a single equi-condition " +
              s"<stream col> = <remote key ${d.keyCol}>, got $other")
        }
        val keyIdx = l.output.indexWhere(_.exprId == streamKey.exprId)
        val leftDf = org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, l)
        val repl = lookupStage(leftDf, keyIdx, d, inner)
          .queryExecution.analyzed
        // graft the stage in under the join's original attribute ids
        Project(j.output.zip(repl.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId) }, repl)
    }
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, rewritten)
  }

  /** The physical lookup: stream rows in, stream ++ remote columns out.
    * Matched rows carry the stream key in the remote key column (the
    * lookup IS the equi-join); misses are dropped (inner) or
    * null-extended (left outer). */
  /** Stand-in key for SQL NULL: a null join key matches nothing and
    * must not reach the reader (or the lookup cache, which rejects
    * null keys). */
  private case object NullKey

  private def lookupStage(df: DataFrame, keyIdx: Int, d: RemoteTableDef,
      inner: Boolean): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ d.schema.fields)
    val remoteFields = d.schema.fields
    val keyCol = d.keyCol
    val (reader, cfg) = (d.reader, d.cfg)
    val nullSafeReader = new RemoteTable.AsyncReader[Any, Row] {
      def getAsync(key: Any)(
          implicit ec: scala.concurrent.ExecutionContext) = key match {
        case NullKey => scala.concurrent.Future.successful(None)
        case k => reader.getAsync(k)
      }
    }
    df.mapPartitions { rows =>
      RemoteTable.lookupIterator[Row, Any, Row](
        rows,
        r => if (r.isNullAt(keyIdx)) NullKey else r.get(keyIdx),
        nullSafeReader, cfg).flatMap {
        case (row, Some(value)) =>
          // value holds the non-key columns in schema order
          var vi = 0
          val remote = remoteFields.map { f =>
            if (f.name == keyCol) row.get(keyIdx)
            else { val x = value.get(vi); vi += 1; x }
          }
          Some(Row.fromSeq(row.toSeq ++ remote))
        case (row, None) =>
          if (inner) None
          else Some(Row.fromSeq(row.toSeq ++ remoteFields.map(_ => null)))
      }
    }(Encoders.row(outSchema))
  }
}
