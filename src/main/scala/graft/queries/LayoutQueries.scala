package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Layout
import QHelp._

/** Data-layout passes: z-order clustered writes. The oracle contract
  * for a layout op is CONTENT IDENTITY — clustering may reorder rows
  * and re-split files but must not change a single value; the
  * driver's sorted-rows compare is exactly that check. The layout
  * BENEFIT (tight per-file min/max on every clustered column) is
  * asserted in LayoutSpec, where file boundaries are inspectable. */
object LayoutQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(

    // Z-order lineitem on a numeric + a string column and read the
    // clustered copy back. The write runs eagerly at build (bounds
    // agg + range exchange + sorted sized files); the returned plan
    // scans ONLY the written layout, so the compare proves the
    // cluster pass lost or mutated nothing. Mixed column types on
    // purpose: l_partkey takes the linear min-max rank (range
    // pruning), l_returnflag the hash rank (equality pruning).
    "q_layout_zorder" -> Q(
      (s, d) => {
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_zorder_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        val li = t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
          col("l_quantity"))
        Layout.zorderWrite(li, dir,
          cols = Seq("l_partkey", "l_returnflag"),
          targetFileBytes = 4L << 20)
        s.read.parquet(dir)
      },
      Some("""SELECT l_orderkey, l_partkey, l_returnflag, l_quantity
             |FROM lineitem
             |""".stripMargin))
  )
}
