package graft.tools
import org.apache.spark.sql.functions._
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession("recall", master = Some("local[8]"), shufflePartitions = Some(8))
    import spark.implicits._
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.filter($"vec_id" % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val exact = pairs(graft.operators.Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5))
    for (r <- Seq(0, 1, 2); np <- Seq(4, 8)) {
      val approx = pairs(graft.operators.Similarity.ivfTopK(queries, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = np, refine = r))
      println(f"[recall] refine=$r nprobe=$np recall=${(exact & approx).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
