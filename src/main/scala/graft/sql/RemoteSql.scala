package graft.sql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
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

  /** Weak session keys: a stopped/collected session releases its
    * entries instead of pinning the session (and every reader closure)
    * for the life of the JVM. WeakHashMap requires external sync. */
  private val registry: java.util.Map[
      SparkSession, ConcurrentHashMap[String, RemoteTableDef]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[
        SparkSession, ConcurrentHashMap[String, RemoteTableDef]]())

  private def tables(spark: SparkSession)
      : Option[ConcurrentHashMap[String, RemoteTableDef]] =
    Option(registry.get(spark))

  /** Register `name` as a remote table for this session: SQL statements
    * may join it like any stream. It is lookup-only, as in the
    * reference — remote tables have no replayable scan, so any
    * statement that would SCAN the marker (remote table outside a
    * supported join shape) is rejected loudly at plan time by
    * [[select]] rather than silently returning zero rows. */
  def registerRemote(spark: SparkSession, name: String,
      d: RemoteTableDef): Unit = {
    registry.synchronized {
      var m = registry.get(spark)
      if (m == null) { m = new ConcurrentHashMap(); registry.put(spark, m) }
      m.put(name.toLowerCase, d)
    }
    spark.createDataFrame(java.util.Collections.emptyList[Row](), d.schema)
      .createOrReplaceTempView(name)
  }

  /** Drop one remote table: releases the registry entry (and the
    * reader closure it pins) and the marker view. */
  def unregisterRemote(spark: SparkSession, name: String): Unit = {
    registry.synchronized {
      val m = registry.get(spark)
      if (m != null) { m.remove(name.toLowerCase)
        if (m.isEmpty) registry.remove(spark) }
    }
    spark.catalog.dropTempView(name)
  }

  /** Drop every remote table registered for this session; subsequent
    * [[select]] calls take the plain spark.sql fast path again. */
  def clearRemotes(spark: SparkSession): Unit = {
    val names = registry.synchronized {
      val m = registry.remove(spark)
      if (m == null) Nil
      else { val ks = new scala.collection.mutable.ArrayBuffer[String]
        m.keySet.forEach(k => ks += k); ks.toList }
    }
    names.foreach(spark.catalog.dropTempView)
  }

  private def remoteDef(spark: SparkSession, p: LogicalPlan)
      : Option[RemoteTableDef] = p match {
    case SubqueryAlias(id, child) =>
      tables(spark).flatMap(m => Option(m.get(id.name.toLowerCase)))
        .orElse(remoteDef(spark, child))
    case v: View => remoteDef(spark, v.child)
    case _ => None
  }

  private def hasRemotes(spark: SparkSession): Boolean =
    tables(spark).exists(!_.isEmpty)

  /** Run a SELECT, rewriting remote-table joins into lookup stages.
    * Falls through to plain spark.sql when the session has no remote
    * tables registered. */
  def select(spark: SparkSession, sql: String): DataFrame = {
    if (!hasRemotes(spark)) return spark.sql(sql)
    val analyzed = spark.sql(sql).queryExecution.analyzed

    // 0. normalize remote-on-LEFT joins to remote-on-right (inner is
    // symmetric; `remote RIGHT JOIN stream` ≡ `stream LEFT JOIN remote`),
    // with a Project restoring the original column order. Two remote
    // sides can't lookup-join each other — reject loudly, as the
    // reference does for unsupported shapes
    // (JoinTranslator.validateJoinQuery, JoinTranslator.java:198-245).
    val normalized = analyzed.transformUp {
      case Join(l, r, _, _, _)
          if remoteDef(spark, l).isDefined && remoteDef(spark, r).isDefined =>
        throw new IllegalArgumentException(
          "joining two remote tables is not supported: remote tables are " +
            "lookup-only; one side of the join must be a stream")
      case j @ Join(l, r, joinType, cond, hint)
          if remoteDef(spark, l).isDefined =>
        val swappedType = joinType match {
          case Inner => Inner
          case RightOuter => LeftOuter
          case other => throw new IllegalArgumentException(
            s"remote table on the LEFT of a $other join is not supported; " +
              "supported shapes: INNER (either side), stream LEFT JOIN " +
              "remote, remote RIGHT JOIN stream")
        }
        Project(j.output, Join(r, l, swappedType, cond, hint))
    }

    // 1. filter-before-lookup (SamzaSqlFilterRemoteJoinRule.java:244-257):
    // a filter over only stream-side columns moves below the join, so
    // the lookup stage sees post-filter traffic
    val filtered = normalized.transformUp {
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

    // 3. marker-survival check: any registered remote relation still in
    // the plan means a shape the rewrite didn't cover (remote wrapped in
    // a subquery/Project/Filter, scanned outside a join, …). Executing
    // it would silently join/scan the zero-row marker view — the exact
    // wrong-answer class the reference rejects loudly
    // (JoinTranslator.validateJoinQuery), so we do too.
    val survivors = rewritten.collect {
      case SubqueryAlias(id, _)
          if tables(spark).exists(_.containsKey(id.name.toLowerCase)) =>
        id.name
    }.distinct
    if (survivors.nonEmpty) throw new IllegalArgumentException(
      s"remote table(s) ${survivors.mkString(", ")} used in an " +
        "unsupported shape: remote tables are lookup-only and must " +
        "appear directly as one side of an equi-join with a stream " +
        "(INNER either side, stream LEFT JOIN remote, remote RIGHT JOIN " +
        "stream). Wrapping the remote table in a subquery/SELECT, " +
        "scanning it outside a join, or non-equi conditions are not " +
        "supported.")
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
