package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Local differential privacy mechanisms — the RELEASE side of the
  * privacy family (q122's k-anonymity / l-diversity audit the data;
  * this perturbs it): Warner's randomized response (1965), the
  * canonical ε-LDP frequency mechanism. Each row reports its sensitive
  * bit truthfully with probability p and flipped with probability 1−p;
  * the per-key count of reported ones then debiases to an unbiased
  * estimate of the true count. ε = ln(p / (1−p)) — p = 3/4 gives
  * ε ≈ 1.1.
  *
  * Determinism contract: the "coin" is [[Hash64.hash60]] over
  * (salt, row id) reduced mod pDen — reproducible, engine-portable
  * (the q43 salted-sampling idiom), so the perturbed release is
  * hash-exact against the DuckDB oracle. A production deployment
  * wanting non-reproducible coins swaps the salt per release; the
  * mechanism's privacy argument is about the coin's independence from
  * the data, which a keyed hash with a secret salt provides.
  *
  * All arithmetic is integer until the final division: the estimator
  * `(ones·pDen − n·(pDen−pNum)) / (2·pNum − pDen)` keeps numerator and
  * denominator exact (both engines divide the same two integers).
  * Estimates may fall below 0 or above n — standard RR behavior at
  * small n, left visible rather than clamped.
  *
  * Scale shape: one scan-projection (hash + flip) and ONE keyed
  * aggregation — the mechanism adds nothing to the plan a plain count
  * would have.
  */
object Privacy {

  /** Per-key randomized-response release + debiased estimate.
    *
    * @param bit  the sensitive predicate (0/1 per row)
    * @param id   per-row identity the coin hashes (stable across runs)
    * @param pNum/pDen truth probability p = pNum/pDen; requires
    *             2·pNum ≠ pDen (p = 1/2 carries no signal)
    * @return (keyCols*, n, reported_ones, est_true_ones) */
  def randomizedResponseCounts(df: DataFrame, keyCols: Seq[String],
      bit: Column, id: Column, pNum: Long, pDen: Long,
      salt: String): DataFrame = {
    require(pNum > 0 && pNum < pDen && 2 * pNum != pDen,
      s"need 0 < p < 1, p != 1/2; got $pNum/$pDen")
    val coin = Hash64.hash60(
      concat_ws(":", lit(salt), id.cast("string"))) % pDen
    val b = bit.cast("long")
    val reported = when(coin < pNum, b).otherwise(lit(1L) - b)
    df.select(keyCols.map(col) :+ reported.as("__r"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__r")).as("reported_ones"))
      .withColumn("est_true_ones",
        (col("reported_ones") * pDen - col("n") * (pDen - pNum))
          .cast("double") / lit((2 * pNum - pDen).toDouble))
  }

  /** DuckDB oracle for [[randomizedResponseCounts]]: `table` must
    * expose the key columns plus `bitSql` (0/1) and `idSql`. */
  /** k-ANONYMITY GENERALIZATION — the enforcing transform next to the
    * q122 audit: coarsen a numeric quasi-identifier up a fixed band
    * ladder (band = value div (base·2^g), g = 0..maxG) until EVERY
    * (categorical, band) group reaches size ≥ k; groups still below k
    * at the coarsest level are SUPPRESSED (flagged — the standard
    * generalize-then-suppress recipe). The ladder is evaluated in ONE
    * pass: a bounded (maxG+1)-way explode per row, one (g, cat, band)
    * count, one per-g min, and the chosen level is a 1-row frame joined
    * back — fully relational, no driver branch.
    *
    * @return one row per input row: (idCol, catCol, band, g, group_n,
    *         suppressed) at the chosen level */
  def generalizeToK(df: DataFrame, idCol: String, catCol: String,
      value: Column, k: Long, base: Long = 100L,
      maxG: Int = 6): DataFrame = {
    require(k >= 1 && base >= 1 && maxG >= 0 && maxG <= 20)
    val W = org.apache.spark.sql.expressions.Window
    val leveled = df
      .select(col(idCol), col(catCol), value.cast("long").as("__v"))
      .select(col(idCol), col(catCol), col("__v"),
        explode(sequence(lit(0), lit(maxG))).as("g"))
      .withColumn("band", expr(s"__v div ($base * shiftleft(1L, g))"))
    val counts = leveled.groupBy(col("g"), col(catCol), col("band"))
      .agg(count(lit(1)).as("group_n"))
    val chosen = counts.groupBy(col("g"))
      .agg(min(col("group_n")).as("__mn"))
      .agg(coalesce(min(when(col("__mn") >= k, col("g"))), lit(maxG))
        .as("__gc"))
    leveled
      .join(broadcast(chosen), col("g") === col("__gc"))
      .join(counts, Seq("g", catCol, "band"))
      .select(col(idCol), col(catCol), col("band"), col("g").cast("long")
        .as("g"), col("group_n"), (col("group_n") < k).as("suppressed"))
  }

  /** DuckDB oracle for [[generalizeToK]] — identical ladder, counts,
    * level choice, and suppression flags. `innerSql` yields
    * (id, cat, v BIGINT). */
  def generalizeToKOracleSql(innerSql: String, idName: String,
      catName: String, k: Long, base: Long = 100L,
      maxG: Int = 6): String =
    s"""WITH src AS ($innerSql), lv AS (
       |  SELECT $idName, $catName, v,
       |         unnest(generate_series(0, $maxG)) AS g
       |  FROM src
       |), bands AS (
       |  SELECT $idName, $catName, g, v // ($base * (1 << g)) AS band
       |  FROM lv
       |), counts AS (
       |  SELECT g, $catName, band, CAST(count(*) AS BIGINT) AS group_n
       |  FROM bands GROUP BY 1, 2, 3
       |), mins AS (
       |  SELECT g, min(group_n) AS mn FROM counts GROUP BY 1
       |), chosen AS (
       |  SELECT CAST(coalesce(min(CASE WHEN mn >= $k THEN g END), $maxG)
       |           AS BIGINT) AS gc
       |  FROM mins
       |)
       |SELECT b.$idName, b.$catName, b.band, CAST(b.g AS BIGINT) AS g,
       |       c.group_n, c.group_n < $k AS suppressed
       |FROM bands b
       |JOIN chosen ON b.g = chosen.gc
       |JOIN counts c ON c.g = b.g AND c.$catName = b.$catName
       |             AND c.band = b.band""".stripMargin

  def randomizedResponseOracleSql(table: String, keyCols: Seq[String],
      bitSql: String, idSql: String, pNum: Long, pDen: Long,
      salt: String): String = {
    val keys = keyCols.mkString(", ")
    val coin = Hash64.duckSql(s"'$salt' || ':' || CAST($idSql AS VARCHAR)")
    s"""WITH r AS (
       |  SELECT $keys,
       |         CASE WHEN $coin % $pDen < $pNum THEN CAST(($bitSql) AS BIGINT)
       |              ELSE 1 - CAST(($bitSql) AS BIGINT) END AS rep
       |  FROM $table
       |)
       |SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(rep) AS BIGINT) AS reported_ones,
       |       CAST(sum(rep) * $pDen - count(*) * ${pDen - pNum} AS DOUBLE)
       |         / ${(2 * pNum - pDen).toDouble} AS est_true_ones
       |FROM r GROUP BY $keys""".stripMargin
  }

  /** Exact integer cumulative-weight table for the truncated geometric
    * mechanism: entries (k, c_k·2⁶⁰) for k = −K..K where
    * w_k = aNum^|k|·aDen^(K−|k|) and c_k = Σ_{j ≤ k} w_j — computed in
    * BigInt HERE and inlined as literals on both engines (the rboWeights
    * device: no pow/exp/ln at query time, the q369 libm lesson). Also
    * returns T = c_K. */
  private[ops] def geomCumTable(aNum: Long, aDen: Long, maxShift: Int)
      : (Seq[(Int, BigInt)], BigInt) = {
    require(aNum > 0 && aDen > aNum, "alpha = aNum/aDen must be in (0,1)")
    require(maxShift >= 1 && maxShift <= 30)
    val w = (-maxShift to maxShift).map { k =>
      k -> (BigInt(aNum).pow(math.abs(k)) *
        BigInt(aDen).pow(maxShift - math.abs(k)))
    }
    val t = w.map(_._2).sum
    require(t < BigInt(2).pow(62), "weight table must fit a 62-bit total")
    val cums = w.scanLeft(BigInt(0))(_ + _._2).tail
    (w.map(_._1).zip(cums.map(_ << 60)), t)
  }

  /** Central-DP histogram release by the TRUNCATED GEOMETRIC mechanism
    * (the discrete Laplace): per key cell, the exact count plus integer
    * noise k ∈ [−K, K] with P(k) ∝ α^|k| — for sensitivity-1 counting
    * queries this is ε-DP with ε = ln(aDen/aNum), up to the truncation
    * tail's δ = α^(K+1)·2/(1+α) mass (α = 1/2, K = 16 → δ ≈ 10⁻⁵;
    * Ghosh–Roughgarden–Sundararajan's universally-optimal mechanism,
    * truncated so the noise table is finite and exact).
    *
    * PORTABILITY (why no exp/ln/random at query time): the inverse CDF
    * runs over exact integer cumulative weights inlined as literals;
    * the "uniform" is [[Hash64.hash60]] over (salt, cell) — so the draw
    * is u = h·T ∈ [0, T·2⁶⁰) compared against c_k·2⁶⁰ bounds in
    * DECIMAL(38,0)/HUGEINT (h < 2⁶⁰, T < 2⁶² → products < 2¹²², exact
    * on both engines, identical k). A production release swaps the salt
    * per publication; the privacy argument needs the coin independent
    * of the data, which a keyed hash with a secret salt provides (the
    * [[randomizedResponseCounts]] contract).
    *
    * Cell encoding: each key value is LENGTH-PREFIXED (`|len:value`) so
    * delimiter-bearing values can't make distinct cells draw correlated
    * noise (`a:b`,`c` vs `a`,`b:c`), and the concat NULL-PROPAGATES on
    * both engines (Spark `concat` = SQL `||`, the [[graft.ops.Sampling
    * .hashBucket]] convention) so a NULL-keyed cell takes the ladder's
    * ELSE branch (+maxShift) identically on Spark and DuckDB —
    * `concat_ws` would silently collapse (a,NULL) and (NULL,a) to the
    * same cell string while the oracle's `||` chain diverged.
    *
    * Scale shape: ONE keyed count aggregation + a literal-table CASE
    * per cell — the mechanism adds zero shuffles to the plain count.
    *
    * @return (keyCols*, n, noise, noisy_n, released_n) — released_n
    *         clamps at 0 (counts are non-negative; the clamp is the
    *         published convention), noisy_n stays visible for audit */
  def geometricNoisyCounts(df: DataFrame, keyCols: Seq[String],
      salt: String, aNum: Long = 1L, aDen: Long = 2L,
      maxShift: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val (cum, t) = geomCumTable(aNum, aDen, maxShift)
    val dec = DecimalType(38, 0)
    val cell = concat(lit(salt) +: keyCols.flatMap { k =>
      val s = col(k).cast("string")
      Seq(lit("|"), length(s).cast("string"), lit(":"), s)
    }: _*)
    val v = Hash64.hash60(cell).cast(dec) * lit(new java.math.BigDecimal(t.bigInteger)).cast(dec)
    val noise = cum.init.foldRight(lit(cum.last._1)) {
      case ((k, bound), acc) =>
        when(v < lit(new java.math.BigDecimal(bound.bigInteger)).cast(dec),
          lit(k)).otherwise(acc)
    }.cast("long")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", noise)
      .withColumn("noisy_n", col("n") + col("noise"))
      .withColumn("released_n", greatest(col("noisy_n"), lit(0L)))
  }

  /** DuckDB oracle for [[geometricNoisyCounts]] — the identical literal
    * table, hash, and ladder. */
  def geometricNoisyCountsOracleSql(table: String, keyCols: Seq[String],
      salt: String, aNum: Long = 1L, aDen: Long = 2L,
      maxShift: Int = 16): String = {
    val (cum, t) = geomCumTable(aNum, aDen, maxShift)
    val keys = keyCols.mkString(", ")
    val cellSql = (s"'$salt'" +: keyCols.map { k =>
      val s = s"CAST($k AS VARCHAR)"
      s"'|' || CAST(length($s) AS VARCHAR) || ':' || $s"
    }).mkString(" || ")
    val h = Hash64.duckSql(cellSql)
    val ladder = cum.init
      .map { case (k, b) => s"WHEN v < CAST('$b' AS HUGEINT) THEN $k" }
      .mkString("\n         ")
    s"""WITH g AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST($h AS HUGEINT) * CAST('$t' AS HUGEINT) AS v
       |  FROM $table GROUP BY $keys
       |), z AS (
       |  SELECT $keys, n,
       |         CAST(CASE $ladder
       |         ELSE ${cum.last._1} END AS BIGINT) AS noise
       |  FROM g
       |)
       |SELECT $keys, n, noise, n + noise AS noisy_n,
       |       greatest(n + noise, 0) AS released_n
       |FROM z""".stripMargin
  }
}
