package graft
// Temporary profiling harness — not part of the library surface.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    Tables.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    // warm
    t("warm")(SparkEntry.queries("q_text_tokencount")(spark, d).count())
    val bigram =
      """zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
        |         slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
        |         (a, b) -> concat(a, ' ', b))""".stripMargin
    t("bg_vocab")(println("bg vocab: " +
      operators.TokenBitmap.vocab(spark, d, bigram)._2 * 64))
    t("bg_bitmaps")(operators.TokenBitmap.bitmaps(spark, d, bigram).count())
    val cand = operators.DedupOps.bandedCandidates(spark, d, bigram)
    t("bg_cand_1st")(println("bg cand rows: " + cand.count()))
    t("bg_cand_2nd")(cand.count())
    val full = SparkEntry.queries("q_dedup_ngram")(spark, d)
    t("bg_full_1st")(println("ngram rows: " + full.count()))
    t("bg_full_2nd")(full.count())
    spark.stop()
  }
}
