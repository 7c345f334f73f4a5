package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.queries.VectorsDedup

/** Ad-hoc stage-level profiler for the heavy bench queries (dev tool, not
  * part of the driver contract). Times each phase of a pipeline twice —
  * first pass warms codegen, second is reported. */
object Profile {
  private def time(name: String)(f: => Long): Unit = {
    f // warm
    val t0 = System.nanoTime()
    val n = f
    println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, dir).documents
    val hash = graft.functions.Hash64.hash60 _

    time("scan only") {
      docs.select(col("doc_id"), length(col("text"))).count()
    }
    time("tokens only") {
      docs.select(col("doc_id"),
        graft.text.TextAnalysis.tokens(col("text")).as("t")).count()
    }
    time("explode tokens") {
      docs.select(col("doc_id"),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("t")).count()
    }
    time("shingles no distinct") {
      docs.select(col("doc_id"),
        explode(NearDup.shingles(
          graft.text.TextAnalysis.tokens(col("text")), 3)).as("sh")).count()
    }
    time("shingles pre-projected") {
      docs.select(col("doc_id"),
          graft.text.TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(NearDup.shingles(col("toks"), 3))).as("sh"))
        .count()
    }
    time("scan+tokenize+shingle") {
      docs.select(col("doc_id"),
        explode(array_distinct(NearDup.shingles(
          graft.text.TextAnalysis.tokens(col("text")), 3))).as("sh")).count()
    }
    time("  +hash") {
      docs.select(col("doc_id"),
        explode(array_distinct(NearDup.shingles(
          graft.text.TextAnalysis.tokens(col("text")), 3))).as("sh"))
        .select(col("doc_id"), hash(col("sh")).as("h")).count()
    }
    time("signatures (agg)") {
      NearDup.minhashSignatures(docs, "doc_id", "text").count()
    }
    val sig = NearDup.minhashSignatures(docs, "doc_id", "text").persist()
    sig.count()
    time("banding candidates") {
      NearDup.lshCandidatePairs(sig, "doc_id", "sig").count()
    }
    time("verify joins") {
      NearDup.lshCandidatePairs(sig, "doc_id", "sig")
        .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
        .withColumn("est_jaccard",
          size(filter(zip_with(col("s1.sig"), col("s2.sig"), (x, y) => x === y),
            b => b)).cast("double") / lit(16.0))
        .count()
    }
    sig.unpersist()
    time("q27 full") {
      VectorsDedup.minhashLshPipeline(spark, dir, hash).count()
    }
    spark.catalog.clearCache()
    time("q37 full") {
      SparkEntry.queries("q37_dedup_clusters")(spark, dir).count()
    }
    spark.catalog.clearCache()
    time("q34 full") {
      SparkEntry.queries("q34_ngram_jaccard")(spark, dir).count()
    }
    spark.catalog.clearCache()
    time("q54 full") {
      SparkEntry.queries("q54_repetition")(spark, dir).count()
    }
    spark.catalog.clearCache()
    time("q28 full") {
      SparkEntry.queries("q28_simhash")(spark, dir).count()
    }
    spark.stop()
  }
}
