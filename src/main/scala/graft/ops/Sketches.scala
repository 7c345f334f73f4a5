package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.ops.{Sampling => S}

/** Frequency sketching — the third leg of the sketch suite (HLL++ distinct
  * counts in [[Rollups.hourlyRollupApprox]], KLL-style quantiles in
  * [[Quantiles.approx]], count-min frequencies here).
  *
  * A count-min sketch answers "how often does key X occur in 100 TB?" from
  * a KILOBYTE-scale summary built in one pass with map-side merging — no
  * groupBy shuffle over all keys, no driver-side key explosion. Estimates
  * only OVER-count (est ≥ true, error ≤ eps·n with prob ≥ confidence), so
  * a heavy-hitter screen has no false negatives by construction.
  *
  * Like the other sketches, internals are engine-specific (no SQL oracle);
  * SketchesSpec bounds the estimates against exact counts.
  */
object Sketches {

  /** One-pass mergeable count-min sketch of `c` (collected to the driver —
    * the sketch is model-scale: width 2/eps × depth ln(1/δ) longs). */
  def countMin(df: DataFrame, c: Column, eps: Double = 0.0001,
      confidence: Double = 0.99, seed: Int = 42): CountMinSketch = {
    val bytes = df
      .select(count_min_sketch(c, lit(eps), lit(confidence), lit(seed)).as("s"))
      .head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Heavy hitters: keys with frequency ≥ `minFrac` of the corpus.
    * Discovery uses a deterministic ROW sample for CANDIDATES — a key at
    * row-frequency f appears in a size-k uniform row sample with prob
    * 1−(1−f)^k (for f ≥ 1% and k = 2000 that is 1 − 2e-9) — then the
    * sketch supplies the counts. The sample hashes the FULL row content
    * (hashing only the key would sample keys uniformly, giving hot keys
    * no discovery advantage; byte-identical duplicate rows collapse, so
    * keys whose rows are all identical need a row-unique column in `df`).
    * Two passes over the data (sketch + sample), shuffle-free except the
    * candidate distinct; candidate probing is driver-side over a sample-sized key
    * set. Output (key, est) with est ≥ true count — no false negatives
    * from the sketch, only from sampling. */
  def heavyHitters(df: DataFrame, key: Column, minFrac: Double,
      sampleSize: Int = 2000, eps: Double = 0.0001): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // sketch over the STRING form of the key: probing happens with string
    // candidates below, and CountMinSketch hashes a long and its string
    // rendering differently — building on the native type would silently
    // estimate ~0 for every candidate of a non-string key column
    val sketch = countMin(df, key.cast("string"), eps)
    val total = sketch.totalCount() // row count for free — no extra pass
    val rowHash = concat_ws("", df.columns.map(c => col(c).cast("string")): _*)
    val frac = math.min(1.0, sampleSize.toDouble / math.max(total, 1L))
    val candidates = df
      .filter(S.hashBucket(rowHash, "hh", 1000000) < (frac * 1000000).round)
      .select(key.cast("string").as("k")).distinct()
      .as[String].collect()
    val floor = (minFrac * total).toLong
    val hits = candidates.toSeq
      .map(k => k -> sketch.estimateCount(k))
      .filter(_._2 >= floor)
      .sortBy(-_._2)
    hits.toDF("key", "est")
  }

  /** Pre-aggregated rollup with a MERGEABLE distinct-count column: each
    * group row carries a Datasketches HLL sketch (binary), so the table
    * re-aggregates to coarser grains WITHOUT rescanning the facts —
    * `approx_count_distinct` can't do that (its result is a number;
    * re-summing numbers double-counts users active in several groups).
    * This is the materialized-rollup workflow: build once at fine grain,
    * answer every coarser grain by `hll_union_agg` over sketch bytes.
    *
    * Both steps are one hash aggregation; sketches are fixed-size
    * (lgConfigK buckets) and map-side combinable. Sketch bytes are
    * engine-specific — SketchesSpec bounds the estimates against exact
    * distinct counts instead of a SQL oracle. */
  def hllRollup(df: DataFrame, grp: Seq[Column], c: Column,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(grp: _*)
      .agg(count(lit(1)).as("n"),
        hll_sketch_agg(c, lit(lgConfigK)).as("dv_sketch"))

  /** Re-aggregate a [[hllRollup]] table to a coarser grain: union the
    * sketches, then read the estimate. */
  def hllReRollup(rollup: DataFrame, grp: Seq[Column]): DataFrame =
    rollup.groupBy(grp: _*)
      .agg(sum(col("n")).as("n"),
        hll_sketch_estimate(hll_union_agg(col("dv_sketch"))).as("est_distinct"))

  /** KMV (k-minimum-values) distinct-count sketch — the ORACLE-ABLE
    * approximate distinct counter: unlike the HLL path above (opaque
    * engine-specific sketch bytes, spec-bounded only), the KMV estimate
    * `(k−1)·2⁶⁰ div h_k` is pure integer arithmetic over the portable
    * [[graft.functions.Hash64.hash60]] order statistics, so it
    * hash-matches a DuckDB replay exactly AND is mergeable (union =
    * merge the k-smallest sets). Standard error ~1/√(k−2). The readout
    * `(k−1)·(2⁶⁰/h_k)` is two fixed IEEE steps over exact integers
    * (2⁶⁰ is a power of two — exactly representable; an all-integer
    * `(k−1)·2⁶⁰ div h_k` would overflow past k = 8).
    *
    * Groups with fewer than k distinct values return the EXACT count
    * (the sketch holds every value — no estimation error to accept).
    *
    * Scale shape: one distinct aggregation, one keyed window bounded to
    * the k smallest per group (rank ≤ k survives; see
    * [[Sampling.capPerKeyIds]] for the bounded-buffer form if a single
    * group's distinct set dwarfs memory).
    *
    * @return (grpCol, n_kept, kth_hash, est_distinct)
    */
  def kmvDistinct(df: DataFrame, grpCol: String, v: Column, k: Int)
      : DataFrame = {
    require(k >= 3)
    val hashed = df.select(col(grpCol),
        graft.functions.Hash64.hash60(v.cast("string")).as("__h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(grpCol)).orderBy(col("__h"))
    hashed
      .withColumn("__rn", row_number().over(w).cast("long"))
      .filter(col("__rn") <= k)
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) *
            (lit(1152921504606846976.0) / col("kth_hash").cast("double"))))
  }

  /** KMV set ALGEBRA — Jaccard/union/intersection estimates between two
    * sets from their k-minimum-value sketches (Beyer et al. 2007): take
    * the k smallest hashes of the UNION; the fraction of those present
    * in both sets estimates Jaccard directly, the kth smallest
    * estimates |A∪B|, and their product |A∩B|. All from two
    * sketch-sized frames — never materializing the union — and fully
    * oracle-able (vs the HLL path's opaque bytes).
    *
    * @return one row: (k_used, n_both, union_kth, jaccard_est,
    *         union_est, inter_est) — exact smalls when the union has
    *         fewer than k distinct values
    */
  def kmvJaccard(a: DataFrame, b: DataFrame, v: Column, k: Int = 256)
      : DataFrame = {
    require(k >= 8)
    def hashes(df: DataFrame) = df
      .select(graft.functions.Hash64.hash60(v.cast("string")).as("h"))
      .distinct()
    val ha = hashes(a)
    val hb = hashes(b)
    val kU = ha.unionAll(hb).distinct()
      .orderBy(col("h")).limit(k)
    val flagged = kU
      .join(ha.withColumn("__ina", lit(1L)), Seq("h"), "left")
      .join(hb.withColumn("__inb", lit(1L)), Seq("h"), "left")
    flagged.agg(count(lit(1)).as("k_used"),
        sum(when(col("__ina") === 1L && col("__inb") === 1L, 1L)
          .otherwise(0L)).as("n_both"),
        max(col("h")).as("union_kth"))
      .withColumn("jaccard_est",
        col("n_both").cast("double") / col("k_used"))
      .withColumn("union_est",
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) *
            (lit(1152921504606846976.0) /
              col("union_kth").cast("double"))))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
  }

  /** DuckDB oracle for [[kmvJaccard]]: `aSql`/`bSql` yield one `v`
    * VARCHAR column. */
  def kmvJaccardOracleSql(aSql: String, bSql: String, k: Int = 256)
      : String = {
    val h = graft.functions.Hash64.duckSql("v")
    s"""WITH ha AS (SELECT DISTINCT $h AS h FROM ($aSql)),
       |hb AS (SELECT DISTINCT $h AS h FROM ($bSql)),
       |ku AS (
       |  SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
       |  ORDER BY h LIMIT $k
       |), f AS (
       |  SELECT ku.h,
       |         CASE WHEN ha.h IS NOT NULL AND hb.h IS NOT NULL
       |           THEN 1 ELSE 0 END AS bothin
       |  FROM ku LEFT JOIN ha ON ku.h = ha.h
       |          LEFT JOIN hb ON ku.h = hb.h
       |), g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k_used,
       |         CAST(sum(bothin) AS BIGINT) AS n_both,
       |         CAST(max(h) AS BIGINT) AS union_kth
       |  FROM f
       |)
       |SELECT k_used, n_both, union_kth,
       |       CAST(n_both AS DOUBLE) / k_used AS jaccard_est,
       |       CASE WHEN k_used < $k THEN CAST(k_used AS DOUBLE)
       |         ELSE CAST(${(k - 1).toDouble} AS DOUBLE)
       |           * (1152921504606846976.0 / CAST(union_kth AS DOUBLE))
       |       END AS union_est,
       |       (CAST(n_both AS DOUBLE) / k_used)
       |         * (CASE WHEN k_used < $k THEN CAST(k_used AS DOUBLE)
       |             ELSE CAST(${(k - 1).toDouble} AS DOUBLE)
       |               * (1152921504606846976.0
       |                  / CAST(union_kth AS DOUBLE)) END) AS inter_est
       |FROM g""".stripMargin
  }

  /** DuckDB oracle for [[kmvDistinct]]: `innerSql` yields
    * (`grpName`, v) with v already rendered as VARCHAR. */
  def kmvOracleSql(innerSql: String, grpName: String, k: Int): String =
    s"""WITH h AS (
       |  SELECT DISTINCT $grpName,
       |         ${graft.functions.Hash64.duckSql("v")} AS hh
       |  FROM ($innerSql)
       |), r AS (
       |  SELECT $grpName, hh,
       |         row_number() OVER (PARTITION BY $grpName ORDER BY hh)
       |           AS rn
       |  FROM h
       |), g AS (
       |  SELECT $grpName, CAST(count(*) AS BIGINT) AS n_kept,
       |         CAST(max(hh) AS BIGINT) AS kth_hash
       |  FROM r WHERE rn <= $k GROUP BY 1
       |)
       |SELECT $grpName, n_kept, kth_hash,
       |       CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
       |         ELSE CAST(${(k - 1).toDouble} AS DOUBLE)
       |           * (1152921504606846976.0 / CAST(kth_hash AS DOUBLE))
       |       END AS est_distinct
       |FROM g""".stripMargin
}
