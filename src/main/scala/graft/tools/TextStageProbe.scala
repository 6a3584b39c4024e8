package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Focused A/B probe for the per-document text stages on the
  * CorpusBuildSmoke word-soup corpus: times each formulation of the
  * Gopher rules (native [[graft.functions.GopherCounts]] vs the
  * builtin-HOF spelling) and the language-ID stage at a given doc count,
  * printing seconds per stage. Dev tool for BASELINE.md stage
  * attribution — run at two sizes to expose any super-linear behavior
  * (`runMain graft.tools.TextStageProbe 1000000 [cores]`). */
object TextStageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.local(cores = cores)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    // same word-soup shape as CorpusBuildSmoke (40 tokens, 5000-word vocab)
    val toks = transform(sequence(lit(0), lit(39)), p =>
      concat(lit("w"), pmod(xxhash64(lit(7), col("id"), p), lit(5000))))
    val corpus = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"), concat_ws(" ", toks).as("text"))
      .persist()
    time(s"materialize ($n docs, $cores cores)")(corpus.count())

    time("gopher native")(
      TextAnalysis.gopherQualityRules(corpus, "text", minWords = 20)
        .agg(sum(when(col("gopher_pass"), 1L).otherwise(0L))).head())
    time("gopher HOF")(
      TextAnalysis.gopherQualityRulesHof(corpus, "text", minWords = 20)
        .agg(sum(when(col("gopher_pass"), 1L).otherwise(0L))).head())
    time("langid")(
      TextAnalysis.languageId(corpus)
        .agg(count(when(col("predicted_lang") === "unknown", 1))).head())
    time("char entropy (reference point)")(
      TextAnalysis.charEntropyProfile(corpus, "doc_id", "text")
        .agg(sum(when(col("low_entropy"), 1L).otherwise(0L))).head())

    spark.stop()
  }
}
