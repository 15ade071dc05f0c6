package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Literal, RLike}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{DotProduct, IntersectCountSorted, LitArg, MinHashSig, ShingleSet, SimHashSig, SrpBucket}

/** Cluster-wide registration: set
  * `spark.sql.extensions=graft.GraftExtensions` and every session —
  * including thrift/connect sessions with no driver code — gets the
  * engine's function surface: the reference UDF set and the codegen'd
  * vector expressions. (Session-scoped registration for library use
  * lives in graft.functions.Udfs / graft.plans.VectorExpressions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name),
        (exprs: Seq[Expression]) => builder(exprs)))

    // reference UDFs (samza-sql/.../fn/) — regex-first arg order
    inject("regexmatch") { case Seq(regex, str) => RLike(str, regex) }
    inject("converttostring") { case Seq(e) => Cast(e, StringType) }
    inject("buildoutputrecord") { exprs => CreateNamedStruct(exprs) }
    inject("getnestedfield") { case Seq(rec, pathExpr) =>
      val path = pathExpr match {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"GetNestedField path must be a string literal, got $other")
      }
      path.split('.').foldLeft(rec) { (e, f) =>
        UnresolvedExtractValue(e, Literal(f))
      }
    }
    // engine vector/text expressions
    inject("graft_dot") { case Seq(a, b) => DotProduct(a, b) }
    inject("graft_minhash_sig") { case Seq(arr, k, seed, bits) =>
      MinHashSig(arr, LitArg.int("graft_minhash_sig", k),
        LitArg.int("graft_minhash_sig", seed),
        LitArg.int("graft_minhash_sig", bits))
    }
    inject("graft_shingle_set") { case Seq(arr, n) =>
      ShingleSet(arr, LitArg.int("graft_shingle_set", n))
    }
    inject("graft_intersect_count") { case Seq(a, b) =>
      IntersectCountSorted(a, b)
    }
    inject("graft_simhash") { case Seq(arr, seed, bits) =>
      SimHashSig(arr, LitArg.int("graft_simhash", seed),
        LitArg.int("graft_simhash", bits))
    }
    inject("graft_srp_bucket") { case Seq(vec, d, p) =>
      SrpBucket(vec, LitArg.int("graft_srp_bucket", d),
        LitArg.int("graft_srp_bucket", p))
    }
    inject("graft_bloom_contains") { case Seq(h, bytes) =>
      graft.plans.BloomContains(h,
        graft.plans.SketchExpressions.bytesArg("graft_bloom_contains",
          bytes))
    }
  }
}
