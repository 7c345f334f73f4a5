package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction with Adamic–Adar weighting — "who
  * should be connected that isn't": candidate (node, node) pairs scored
  * by Σ_z 1/log deg(z) over their shared neighbors z, so a RARE shared
  * neighbor certifies similarity far more than a ubiquitous one (the
  * property plain common-neighbor counting lacks). Standard on bipartite
  * interaction graphs: customers sharing suppliers, users sharing items,
  * docs sharing rare terms.
  *
  * Engine-exact arithmetic: the 1/log weight is `scale div blog(deg)`
  * with `blog(x) = length(bin(x)) = floor(log2 x) + 1` — the integer
  * bit-length quantization of q116's LM scoring, so scores are exact
  * longs and hash-match the oracle (a double Σ1/ln(d) would diverge by
  * addition order).
  *
  * Scale shape: the pair generation is the wedge join at each shared
  * neighbor — Σ deg² rows — bounded by `maxDeg`: a hub neighbor both
  * blows up C(deg, 2) AND carries ≈ zero Adamic–Adar signal, so cutting
  * it is the df-cut of near-dup pairs (`NearDup.jaccardPairs`) wearing
  * graph clothes. Everything else is keyed aggregation.
  */
object LinkPredict {

  /** Scored candidate pairs over a bipartite edge list (`srcCol` nodes
    * linked through shared `nbrCol` neighbors). Parallel edges collapse;
    * neighbors with degree > `maxDeg` are cut BEFORE pair generation.
    *
    * @return (c1, c2, common, aa_score) — c1 < c2, common ≥ minCommon;
    *         aa_score = Σ_z scale div blog(deg z), an exact long */
  def adamicAdar(edges: DataFrame, srcCol: String, nbrCol: String,
      minCommon: Long, maxDeg: Long = Long.MaxValue,
      scale: Long = 1000000L): DataFrame = {
    require(minCommon >= 1 && maxDeg >= 1 && scale >= 1)
    val e = edges.select(col(srcCol).as("c"), col(nbrCol).as("z")).distinct()
    val w = e.groupBy(col("z")).agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxDeg)
      .select(col("z"), expr(s"$scale div length(bin(d))").as("w"))
    val ew = e.join(w, Seq("z"))
    ew.as("a").join(ew.as("b"),
        col("a.z") === col("b.z") && col("a.c") < col("b.c"))
      .groupBy(col("a.c").as("c1"), col("b.c").as("c2"))
      .agg(count(lit(1)).as("common"), sum(col("a.w")).as("aa_score"))
      .filter(col("common") >= minCommon)
  }
}
