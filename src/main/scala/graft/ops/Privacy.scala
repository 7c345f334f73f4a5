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
      maxShift: Int = 16): DataFrame =
    geometricNoisyCountsOver(
      df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n")),
      keyCols, salt, aNum, aDen, maxShift)

  /** [[geometricNoisyCounts]] over a PRE-AGGREGATED (keyCols*, n)
    * frame — the form a STREAMING release takes: the noise draw
    * depends only on (salt, cell), never on n or the epoch, so
    * releasing an epoch-merged count state (e.g.
    * [[graft.streaming.StateSinks.incrementalRollupSink]]'s snapshot)
    * equals the batch release over every epoch's rows. Publishing
    * MULTIPLE evolving releases from a growing stream is a sequence of
    * correlated mechanisms — swap the salt per publication (the class
    * contract) or account ε across releases. */
  def geometricNoisyCountsOver(agg: DataFrame, keyCols: Seq[String],
      salt: String, aNum: Long = 1L, aDen: Long = 2L,
      maxShift: Int = 16): DataFrame = {
    val noise = geomNoiseCol(cellCol(salt, keyCols), aNum, aDen, maxShift)
    agg.select(keyCols.map(col) :+ col("n"): _*)
      .withColumn("noise", noise)
      .withColumn("noisy_n", col("n") + col("noise"))
      .withColumn("released_n", greatest(col("noisy_n"), lit(0L)))
  }

  /** The length-prefixed, NULL-propagating cell string for a key tuple
    * (the [[geometricNoisyCounts]] encoding contract, shared by every
    * geometric-noise release so their draws never collide by format). */
  private[ops] def cellCol(salt: String, keyCols: Seq[String]): Column =
    concat(lit(salt) +: keyCols.flatMap { k =>
      val s = col(k).cast("string")
      Seq(lit("|"), length(s).cast("string"), lit(":"), s)
    }: _*)

  /** DuckDB fragment for [[cellCol]]. */
  private[ops] def cellSqlOf(salt: String, keyCols: Seq[String]): String =
    (s"'$salt'" +: keyCols.map { k =>
      val s = s"CAST($k AS VARCHAR)"
      s"'|' || CAST(length($s) AS VARCHAR) || ':' || $s"
    }).mkString(" || ")

  /** One truncated-geometric draw k ∈ [−K, K] from the portable keyed
    * hash of `cell` — the inverse-CDF ladder over [[geomCumTable]]'s
    * exact BigInt literals in DECIMAL(38,0) (no exp/ln/RNG at query
    * time; NULL cell → ladder ELSE → +maxShift, identically on both
    * engines). */
  private[ops] def geomNoiseCol(cell: Column, aNum: Long, aDen: Long,
      maxShift: Int): Column = {
    import org.apache.spark.sql.types.DecimalType
    val (cum, t) = geomCumTable(aNum, aDen, maxShift)
    val dec = DecimalType(38, 0)
    val v = Hash64.hash60(cell).cast(dec) *
      lit(new java.math.BigDecimal(t.bigInteger)).cast(dec)
    cum.init.foldRight(lit(cum.last._1)) {
      case ((k, bound), acc) =>
        when(v < lit(new java.math.BigDecimal(bound.bigInteger)).cast(dec),
          lit(k)).otherwise(acc)
    }.cast("long")
  }

  /** DuckDB fragment computing [[geomNoiseCol]] over hash value column
    * `vCol` (caller computes it as `hash·T` in HUGEINT). */
  private[ops] def geomNoiseSql(aNum: Long, aDen: Long,
      maxShift: Int, vCol: String = "v"): String = {
    val (cum, _) = geomCumTable(aNum, aDen, maxShift)
    val ladder = cum.init
      .map { case (k, b) => s"WHEN $vCol < CAST('$b' AS HUGEINT) THEN $k" }
      .mkString("\n         ")
    s"CAST(CASE $ladder\n         ELSE ${cum.last._1} END AS BIGINT)"
  }

  /** DuckDB oracle for [[geometricNoisyCounts]] — the identical literal
    * table, hash, and ladder. */
  def geometricNoisyCountsOracleSql(table: String, keyCols: Seq[String],
      salt: String, aNum: Long = 1L, aDen: Long = 2L,
      maxShift: Int = 16): String = {
    val (_, t) = geomCumTable(aNum, aDen, maxShift)
    val keys = keyCols.mkString(", ")
    val h = Hash64.duckSql(cellSqlOf(salt, keyCols))
    s"""WITH g AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST($h AS HUGEINT) * CAST('$t' AS HUGEINT) AS v
       |  FROM $table GROUP BY $keys
       |), z AS (
       |  SELECT $keys, n,
       |         ${geomNoiseSql(aNum, aDen, maxShift)} AS noise
       |  FROM g
       |)
       |SELECT $keys, n, noise, n + noise AS noisy_n,
       |       greatest(n + noise, 0) AS released_n
       |FROM z""".stripMargin
  }

  /** Central-DP SUM + MEAN release — the numeric sibling of
    * [[geometricNoisyCounts]], by QUANTIZE-THEN-NOISE: each row's
    * contribution is CLAMPED to [0, clampHi], the per-cell clamped sum
    * is floor-divided by clampHi BEFORE noising (one person moves the
    * sum by ≤ clampHi, so the quantized statistic
    * `clamped_sum div clampHi` has sensitivity 1), UNIT geometric noise
    * lands on the quantized value, and the release re-scales by
    * clampHi. The count draws its own independent unit noise (a
    * distinct `#n`/`#s` cell suffix — two sensitivity-1 mechanisms,
    * ε = ln(aDen/aNum) each); the released mean is ONE IEEE division of
    * the two released integers (count floored at 1 so the division is
    * total; quantized sum floored at 0 — clamped values are
    * non-negative).
    *
    * Why not noise the raw sum? Scaling a UNIT draw by clampHi (the
    * naive form) puts the noise on the lattice clampHi·ℤ, so the
    * release stays ≡ clamped_sum (mod clampHi) — the exact residue of
    * the true sum leaks, and one individual's contribution is
    * perfectly distinguishable through it. Quantizing FIRST makes the
    * published lattice value a post-processing of a sensitivity-1
    * ε-DP release: no residue survives. (The other repair —
    * re-calibrating the ladder to ratio α^(1/clampHi) for
    * unit-granularity noise on the raw sum — needs a CASE ladder of
    * O(clampHi·K) rungs to keep the truncation tail small, infeasible
    * as an inlined literal table for realistic clampHi.) The cost is
    * deterministic rounding error ≤ clampHi/2 on the released sum,
    * below the noise scale itself. As everywhere in this family, the
    * hash coin is a SIMULATION device for the oracle replay: a
    * production release swaps in a secret per-publication salt — the
    * privacy argument needs the coin independent of the data (the
    * [[randomizedResponseCounts]] contract).
    *
    * Scale shape: one projection + ONE keyed aggregation, the
    * [[geometricNoisyCounts]] contract — zero shuffles beyond the
    * plain (count, sum).
    *
    * @return (keyCols*, n, clamped_sum, noise_n, noise_sum,
    *         released_n, released_sum, released_mean) — noise_sum is
    *         the unit draw × clampHi for audit visibility;
    *         released_sum = max(clamped_sum div clampHi + draw, 0) ·
    *         clampHi */
  def geometricNoisySumMean(df: DataFrame, keyCols: Seq[String],
      value: Column, clampHi: Long, salt: String, aNum: Long = 1L,
      aDen: Long = 2L, maxShift: Int = 16): DataFrame = {
    require(clampHi >= 1, s"clampHi must be >= 1, got $clampHi")
    val clamped =
      least(greatest(value.cast("long"), lit(0L)), lit(clampHi))
    val nN = geomNoiseCol(cellCol(s"$salt#n", keyCols),
      aNum, aDen, maxShift)
    val nS = geomNoiseCol(cellCol(s"$salt#s", keyCols),
      aNum, aDen, maxShift)
    df.select(keyCols.map(col) :+ clamped.as("__cv"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__cv")).as("clamped_sum"))
      .withColumn("noise_n", nN)
      .withColumn("__ns_u", nS)
      .withColumn("noise_sum", col("__ns_u") * lit(clampHi))
      .withColumn("released_n",
        greatest(col("n") + col("noise_n"), lit(1L)))
      .withColumn("released_sum",
        greatest(expr(s"clamped_sum div $clampHi") + col("__ns_u"),
          lit(0L)) * lit(clampHi))
      .withColumn("released_mean",
        col("released_sum").cast("double") /
          col("released_n").cast("double"))
      .drop("__ns_u")
  }

  /** DuckDB oracle for [[geometricNoisySumMean]]. `valueSql` is the
    * raw (pre-clamp) BIGINT expression over `table`'s columns. */
  def geometricNoisySumMeanOracleSql(table: String,
      keyCols: Seq[String], valueSql: String, clampHi: Long,
      salt: String, aNum: Long = 1L, aDen: Long = 2L,
      maxShift: Int = 16): String = {
    val (_, t) = geomCumTable(aNum, aDen, maxShift)
    val keys = keyCols.mkString(", ")
    val hN = Hash64.duckSql(cellSqlOf(s"$salt#n", keyCols))
    val hS = Hash64.duckSql(cellSqlOf(s"$salt#s", keyCols))
    s"""WITH g AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(least(greatest(CAST(($valueSql) AS BIGINT), 0),
       |           $clampHi)) AS BIGINT) AS clamped_sum,
       |         CAST($hN AS HUGEINT) * CAST('$t' AS HUGEINT) AS vn,
       |         CAST($hS AS HUGEINT) * CAST('$t' AS HUGEINT) AS vs
       |  FROM $table GROUP BY $keys
       |), z AS (
       |  SELECT $keys, n, clamped_sum,
       |         ${geomNoiseSql(aNum, aDen, maxShift, "vn")} AS noise_n,
       |         ${geomNoiseSql(aNum, aDen, maxShift, "vs")} AS ns_u
       |  FROM g
       |)
       |SELECT $keys, n, clamped_sum, noise_n,
       |       ns_u * $clampHi AS noise_sum,
       |       greatest(n + noise_n, 1) AS released_n,
       |       greatest(clamped_sum // $clampHi + ns_u, 0) * $clampHi
       |         AS released_sum,
       |       CAST(greatest(clamped_sum // $clampHi + ns_u, 0)
       |           * $clampHi AS DOUBLE)
       |         / CAST(greatest(n + noise_n, 1) AS DOUBLE)
       |         AS released_mean
       |FROM z""".stripMargin
  }

  /** DP TOP-K SELECTION (report-noisy-max, iterated): rank cells by
    * count + truncated-geometric noise and release only the top k
    * (noisy score and rank — the TRUE counts stay unpublished; pair
    * with [[geometricNoisyCounts]] when counts must also ship). The
    * discrete-noise cousin of the exponential mechanism for the
    * "which categories are the biggest" question, where releasing the
    * whole noisy histogram would spend budget on cells nobody asked
    * about. Ties (same noisy score) break by cell string — a total,
    * data-independent order.
    *
    * Scale shape: ONE keyed count aggregation, then a rank + limit
    * over the |cells|-row aggregate frame (the post-agg top-k idiom —
    * never a row-level sort).
    *
    * @return k rows: (keyCols*, noisy_n, rank) */
  def noisyTopK(df: DataFrame, keyCols: Seq[String], k: Int,
      salt: String, aNum: Long = 1L, aDen: Long = 2L,
      maxShift: Int = 16): DataFrame = {
    require(k >= 1)
    val cell = cellCol(salt, keyCols)
    val noise = geomNoiseCol(cell, aNum, aDen, maxShift)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__noisy").desc, col("__cell"))
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("__cell", cell)
      .withColumn("__noisy", col("n") + noise)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(keyCols.map(col) ++
        Seq(col("__noisy").as("noisy_n"), col("rank")): _*)
  }

  /** DuckDB oracle for [[noisyTopK]]. */
  def noisyTopKOracleSql(table: String, keyCols: Seq[String], k: Int,
      salt: String, aNum: Long = 1L, aDen: Long = 2L,
      maxShift: Int = 16): String = {
    val (_, t) = geomCumTable(aNum, aDen, maxShift)
    val keys = keyCols.mkString(", ")
    val cellSql = cellSqlOf(salt, keyCols)
    val h = Hash64.duckSql(cellSql)
    s"""WITH g AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n, $cellSql AS cell,
       |         CAST($h AS HUGEINT) * CAST('$t' AS HUGEINT) AS v
       |  FROM $table GROUP BY $keys
       |), z AS (
       |  SELECT $keys, cell,
       |         n + ${geomNoiseSql(aNum, aDen, maxShift)} AS noisy_n
       |  FROM g
       |), r AS (
       |  SELECT $keys, noisy_n,
       |         CAST(row_number() OVER (ORDER BY noisy_n DESC, cell)
       |           AS BIGINT) AS rank
       |  FROM z
       |)
       |SELECT $keys, noisy_n, rank FROM r WHERE rank <= $k""".stripMargin
  }
}
