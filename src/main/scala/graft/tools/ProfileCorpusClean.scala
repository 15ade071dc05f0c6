package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._

/** Dev tool: A/B the q_pipeline_corpus_clean survivor-pick forms —
  * the round-7 rewrite replaced a row_number window with
  * `operators/Latest.latestBy` (bounded-heap k=1 aggregate) and its
  * sf0.1 bar was never re-recorded on an idle box; this pins that the
  * rewrite is neutral-or-better at gate scale (it is 2x better at
  * sf10, ProfileLatest). Both forms run the FULL pipeline (normalize →
  * fingerprint → survivor pick → quality/lang gates → projection) so
  * the comparison covers what the benched query actually pays.
  * Usage: runMain graft.tools.ProfileCorpusClean <sfDir> [reps]
  */
object ProfileCorpusClean {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-corpusclean-profile",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import spark.implicits._

    def fingerprinted() =
      graft.sources.Tables.load(spark, sfDir, "documents")
        .withColumn("ntext", normalizeText($"text"))
        .withColumn("fp", md5($"ntext"))

    def gates(deduped: org.apache.spark.sql.DataFrame) =
      deduped
        .withColumn("alpha", alphaRatio($"ntext"))
        .withColumn("n_tok", tokenCount($"ntext"))
        .withColumn("lang_pred", langIdHeuristic($"ntext"))
        .filter($"alpha" >= 0.7 && $"n_tok" >= 8 && $"lang_pred" === "en")
        .select($"doc_id", $"lang_pred", $"n_tok", $"alpha")

    // the pre-round-7 form: min-id survivor via row_number window
    def windowForm() = {
      val w = Window.partitionBy($"fp").orderBy($"doc_id".asc)
      gates(fingerprinted()
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .drop("rn"))
    }
    // the benched form: bounded-heap latest (negated id = earliest)
    def latestForm() =
      gates(graft.operators.Latest.latestBy(
        fingerprinted(), Seq("fp"), Seq(-$"doc_id"), Seq("doc_id", "ntext")))

    for (r <- 1 to reps; (name, f) <- Seq(
        "window" -> (() => windowForm()), "latest" -> (() => latestForm()))) {
      val t0 = System.nanoTime()
      val n = f().count()
      println(f"[corpusclean] rep=$r form=$name rows=$n " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
