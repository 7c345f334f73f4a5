package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-INTEGRITY and release-audit operators, split from [[Profiling]]
  * (which keeps column statistics, drift, and distribution-distance
  * tests): the k-anonymity / l-diversity / t-closeness privacy-audit
  * ladder with its enforcing suppression transform, referential-
  * integrity (foreign-key) audits, functional-dependency violations,
  * and header/detail aggregate-consistency checks — the constraints a
  * warehouse asserts about a table rather than statistics it computes
  * from one. All are one-or-two-keyed-aggregation plans with exact
  * integer ledgers and DuckDB oracle mirrors; scale shapes are
  * documented per operator.
  */
object Integrity {

  /** k-anonymity AUDIT: quasi-identifier combinations shared by fewer
    * than `k` rows — each is a re-identification risk (the released
    * combination singles out < k individuals). The compliance check a
    * training-data pipeline runs before publishing anything derived
    * from user-linked records. One map-side-combinable aggregation;
    * NULL quasi-identifier values group together, exactly as SQL
    * GROUP BY does, so both engines see the same cells.
    *
    * @return (qidCols..., group_n) for every violating combination */
  def kAnonymityViolations(df: DataFrame, qidCols: Seq[String],
      k: Long): DataFrame =
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .filter(col("group_n") < k)


  /** Cross-table AGGREGATE consistency audit: does a header total equal
    * the sum of its detail lines? Per header key the exact cent
    * difference, rolled into relative-error ppm buckets — the
    * reconciliation report between [[fkAudit]]'s "does the key exist"
    * and business truth ("does the money add up"). Headers with no
    * detail rows land in their own bucket (a 100 % miss, not a zero
    * diff).
    *
    * One keyed detail aggregation + one left join from headers + one
    * bucket rollup. Buckets are integer ppm CASE arms — exact.
    *
    * @return per bucket: (bucket, n, sum_abs_diff_cents) with bucket ∈
    *         exact | le_1000ppm | le_10000ppm | gt_10000ppm | no_detail
    */
  def aggConsistency(headers: DataFrame, details: DataFrame,
      keyCols: Seq[String], headerTotal: Column,
      detailAmount: Column): DataFrame = {
    val h = headers.select(keyCols.map(col) :+
      headerTotal.as("__ht"): _*)
    val d = details
      .select(keyCols.map(col) :+ detailAmount.as("__da"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__da")).as("__ds"))
    val joined = h.join(d, keyCols, "left")
      .withColumn("__diff", col("__ht") - col("__ds"))
      .withColumn("__ppm",
        expr("abs(__diff) * 1000000 div greatest(abs(__ht), 1L)"))
      .withColumn("bucket",
        when(col("__ds").isNull, "no_detail")
          .when(col("__diff") === 0L, "exact")
          .when(col("__ppm") <= 1000L, "le_1000ppm")
          .when(col("__ppm") <= 10000L, "le_10000ppm")
          .otherwise("gt_10000ppm"))
    joined.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(abs(col("__diff")), abs(col("__ht"))))
          .as("sum_abs_diff_cents"))
  }

  /** DuckDB oracle for [[aggConsistency]]: `headerSql` yields
    * (keys..., ht), `detailSql` yields (keys..., da). */
  def aggConsistencyOracleSql(headerSql: String, detailSql: String,
      keyCols: Seq[String]): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH h AS ($headerSql), d AS (
       |  SELECT $keys, CAST(sum(da) AS BIGINT) AS ds
       |  FROM ($detailSql) GROUP BY $keys
       |), j AS (
       |  SELECT h.ht, d.ds, h.ht - d.ds AS diff,
       |         abs(h.ht - d.ds) * 1000000 // greatest(abs(h.ht), 1)
       |           AS ppm
       |  FROM h LEFT JOIN d USING ($keys)
       |)
       |SELECT CASE WHEN ds IS NULL THEN 'no_detail'
       |            WHEN diff = 0 THEN 'exact'
       |            WHEN ppm <= 1000 THEN 'le_1000ppm'
       |            WHEN ppm <= 10000 THEN 'le_10000ppm'
       |            ELSE 'gt_10000ppm' END AS bucket,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(coalesce(abs(diff), abs(ht))) AS BIGINT)
       |         AS sum_abs_diff_cents
       |FROM j GROUP BY 1""".stripMargin
  }


  /** l-diversity audit — the attack [[kAnonymityViolations]] misses:
    * a quasi-identifier group can hide k rows yet still leak if they
    * all share ONE sensitive value (homogeneity attack — "every
    * 35-year-old in 94305 has the same diagnosis"). Flags groups whose
    * sensitive column carries fewer than `l` DISTINCT values.
    *
    * One keyed aggregation with an exact distinct count (the audit is a
    * correctness gate — approximate HLL counting would certify leaking
    * groups; see [[graft.ops.Sketches]] for when approx is fine).
    *
    * @return violating groups: (qidCols..., group_n, n_sensitive)
    */
  def lDiversityViolations(df: DataFrame, qidCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame =
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("n_sensitive") < l)

  /** t-CLOSENESS audit (Li–Li–Venkatasubramanian 2007) — the third rung
    * of the release-audit ladder: k-anonymity bounds group SIZE
    * ([[kAnonymityViolations]]), l-diversity bounds sensitive-value
    * CARDINALITY ([[lDiversityViolations]]), t-closeness bounds the
    * sensitive-value DISTRIBUTION — a group whose balance-band mix
    * differs sharply from the table-wide mix leaks even when it is
    * large and diverse (the skewness attack l-diversity cannot see).
    *
    * Distance = Earth Mover's over the ORDERED sensitive domain
    * (the paper's numeric-attribute form): with the m global values
    * v₁<…<v_m, EMD = Σᵢ |P̂cum(vᵢ) − Q̂cum(vᵢ)| / (m−1). Exactness: the
    * cumulative difference is the cross-multiplied integer
    * |cumG·N − cumGlob·n| (the [[ksTest]] device), so
    * emd_num = Σ|·| and emd_den = n·N·(m−1) are exact longs and t_emd
    * is ONE IEEE division — hash-exact against the DuckDB replay.
    * Contract: n·N·(m−1) < 2⁶³ (at 10¹² rows move the ledger to
    * DECIMAL(38,0), the [[graft.ops.ABTest]] convention). A
    * single-value sensitive domain (m = 1) leaves emd_den = 0 and, by
    * definition, every group at distance zero — t_emd is GUARDED to
    * 0.0 there (never 0/0 = NaN, which a downstream `t_emd >= t`
    * filter would silently drop instead of reporting), identically on
    * both engines.
    *
    * Scale shape: one (qi, v) keyed count, two dimension-sized
    * aggregates derived from it (global histogram m rows, group sizes
    * |QI| rows), a |QI|×m dense grid built from those DIMENSION frames
    * (never the data), per-group cumulative windows over m-row
    * partitions, one final fold. The fact table is scanned once.
    *
    * @return one row per QI group: (qidCols..., n, m, emd_num,
    *         emd_den, t_emd), every group reported (filter ≥ t to
    *         gate) */
  def tClosenessAudit(df: DataFrame, qidCols: Seq[String],
      sensitive: Column): DataFrame = {
    val qs = qidCols.map(col)
    val cell = df.select(qs :+ sensitive.cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy(qs :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
    val glob = cell.groupBy(col("__v")).agg(sum(col("__c")).as("__gc"))
    val grp = cell.groupBy(qs: _*).agg(sum(col("__c")).as("n"))
    val tot = glob.agg(sum(col("__gc")).as("__N"))
    val dense = grp.crossJoin(broadcast(glob))
      .join(cell, qidCols :+ "__v", "left")
      .na.fill(0L, Seq("__c"))
      .crossJoin(broadcast(tot))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(qs: _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    dense
      .withColumn("__cum_c", sum(col("__c")).over(wCum))
      .withColumn("__cum_g", sum(col("__gc")).over(wCum))
      .withColumn("__r",
        abs(col("__cum_c") * col("__N") - col("__cum_g") * col("n")))
      .groupBy(qs :+ col("n") :+ col("__N"): _*)
      .agg(sum(col("__r")).as("emd_num"), count(lit(1)).as("m"))
      .withColumn("emd_den", col("n") * col("__N") * (col("m") - 1))
      .withColumn("t_emd",
        when(col("m") > 1,
          col("emd_num").cast("double") / col("emd_den").cast("double"))
          .otherwise(lit(0.0)))
      .select(qs ++ Seq(col("n"), col("m"), col("emd_num"),
        col("emd_den"), col("t_emd")): _*)
  }

  /** DuckDB oracle for [[tClosenessAudit]] — identical grid, windows,
    * and division. `innerSql` yields (qidCols..., v BIGINT). */
  def tClosenessOracleSql(innerSql: String, qidCols: Seq[String])
      : String = {
    val q = qidCols.mkString(", ")
    val qg = qidCols.map(c => s"g.$c").mkString(", ")
    s"""WITH base AS ($innerSql),
       |cell AS (
       |  SELECT $q, v, CAST(count(*) AS BIGINT) AS c
       |  FROM base WHERE v IS NOT NULL GROUP BY ALL
       |), ghist AS (
       |  SELECT v, CAST(sum(c) AS BIGINT) AS gc FROM cell GROUP BY 1
       |), grp AS (
       |  SELECT $q, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY ALL
       |), tot AS (
       |  SELECT CAST(sum(gc) AS BIGINT) AS nn FROM ghist
       |), dense AS (
       |  SELECT $qg, g.n, gl.v, gl.gc, coalesce(c.c, 0) AS c, tot.nn
       |  FROM grp g CROSS JOIN ghist gl
       |  LEFT JOIN cell c USING ($q, v)
       |  CROSS JOIN tot
       |), cums AS (
       |  SELECT $q, n, nn, v, gc,
       |         CAST(sum(c)  OVER (PARTITION BY $q ORDER BY v)
       |           AS BIGINT) AS cg,
       |         CAST(sum(gc) OVER (PARTITION BY $q ORDER BY v)
       |           AS BIGINT) AS cgl
       |  FROM dense
       |)
       |SELECT $q, n, CAST(count(*) AS BIGINT) AS m,
       |       CAST(sum(abs(cg * nn - cgl * n)) AS BIGINT) AS emd_num,
       |       n * nn * (CAST(count(*) AS BIGINT) - 1) AS emd_den,
       |       CASE WHEN count(*) > 1 THEN
       |         CAST(CAST(sum(abs(cg * nn - cgl * n)) AS BIGINT) AS DOUBLE)
       |           / CAST(n * nn * (CAST(count(*) AS BIGINT) - 1) AS DOUBLE)
       |       ELSE CAST(0.0 AS DOUBLE) END AS t_emd
       |FROM cums GROUP BY $q, n, nn""".stripMargin
  }

  /** k-anonymity SUPPRESSION: the enforcing transform — drop every row
    * whose quasi-identifier combination has fewer than `k` occurrences,
    * so each surviving row hides among ≥ k−1 identical-looking others.
    * One keyed window (partitioned by the quasi-identifiers — a single
    * shuffle, no join-back, no global ordering), schema preserved. */
  def kAnonymize(df: DataFrame, qidCols: Seq[String], k: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCols.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") >= k)
      .drop("__n")
  }

  /** Referential-integrity audit: for each declared foreign key, how many
    * child rows point at a parent key that does not exist. The
    * load-order / partial-load detector a warehouse runs after ingest
    * (facts landing before their dimension, CDC deletes orphaning
    * children).
    *
    * SQL-standard FK semantics: a NULL foreign key does not violate the
    * constraint — nulls are counted separately, never as orphans.
    *
    * Scale shape: the child side is aggregated to DISTINCT keys (with
    * multiplicities) BEFORE the existence probe, so the anti-join
    * shuffles |distinct child keys| rows, not |child| — for a fact table
    * with thousands of rows per key that is the difference between
    * shuffling the key directory and shuffling the corpus. The probe
    * itself is a left-anti equi-join that distributes by key.
    *
    * @param fks (name, child, childKeyCol, parent, parentKeyCol)
    * @return (fk, n_child, n_null_keys, n_orphans, pass) per declared FK
    */
  def fkAudit(fks: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(fks.nonEmpty, "need at least one foreign key to audit")
    fks.map { case (name, child, ck, parent, pk) =>
      val keyed = child.groupBy(col(ck).as("__k"))
        .agg(count(lit(1)).as("__n"))
      val stats = keyed.agg(
        coalesce(sum("__n"), lit(0L)).as("n_child"),
        coalesce(sum(when(col("__k").isNull, col("__n"))), lit(0L))
          .as("n_null_keys"))
      val orphans = keyed.filter(col("__k").isNotNull)
        .join(parent.select(col(pk).as("__k")).distinct(),
          Seq("__k"), "left_anti")
        .agg(coalesce(sum("__n"), lit(0L)).as("n_orphans"))
      stats.crossJoin(orphans)   // two one-row frames
        .select(lit(name).as("fk"), col("n_child"), col("n_null_keys"),
          col("n_orphans"), (col("n_orphans") === 0L).as("pass"))
    }.reduce(_.unionByName(_))
  }

  /** DuckDB oracle for [[fkAudit]]: same distinct-key anti-join counts,
    * from `(name, childTable, childKey, parentTable, parentKey)`. */
  def fkAuditOracleSql(fks: Seq[(String, String, String, String, String)])
      : String =
    fks.map { case (name, ct, ck, pt, pk) =>
      s"""SELECT '$name' AS fk,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $ct) AS n_child,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $ct WHERE $ck IS NULL)
         |    AS n_null_keys,
         |  (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM (
         |     SELECT k.$ck, k.n FROM (
         |       SELECT $ck, count(*) AS n FROM $ct
         |       WHERE $ck IS NOT NULL GROUP BY 1) k
         |     WHERE NOT EXISTS (SELECT 1 FROM $pt p WHERE p.$pk = k.$ck)))
         |    AS n_orphans,
         |  (SELECT coalesce(sum(n), 0) FROM (
         |     SELECT k.$ck, k.n FROM (
         |       SELECT $ck, count(*) AS n FROM $ct
         |       WHERE $ck IS NOT NULL GROUP BY 1) k
         |     WHERE NOT EXISTS (SELECT 1 FROM $pt p WHERE p.$pk = k.$ck)))
         |    = 0 AS pass""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Functional-dependency audit: does `lhs` determine `rhsCol`? Lists
    * every violating LHS value (more than one distinct RHS) with its
    * cardinality — the schema-inference / key-discovery primitive
    * ("can part_key serve as the lookup key for supplier"), and the
    * data-quality check behind "one customer, one segment" claims.
    * One aggregation; the violation frame is LHS-cardinality-bounded.
    *
    * NULL RHS values count as one distinct value (the SQL GROUP BY
    * convention the engines share): an LHS mapping to {x, NULL} IS a
    * violation.
    *
    * @return (lhs..., n_rows, n_rhs_values) per violating LHS value
    */
  def fdViolations(df: DataFrame, lhs: Seq[String], rhsCol: String)
      : DataFrame = {
    require(lhs.nonEmpty)
    df.groupBy(lhs.map(col) :+ col(rhsCol).as("__r"): _*)
      .agg(count(lit(1)).as("__k"))
      .groupBy(lhs.map(col): _*)
      .agg(sum(col("__k")).as("n_rows"),
        count(lit(1)).as("n_rhs_values"))
      .filter(col("n_rhs_values") > 1)
  }

  /** DuckDB oracle for [[fdViolations]]. */
  def fdViolationsOracleSql(table: String, lhs: Seq[String],
      rhsCol: String): String = {
    val keys = lhs.mkString(", ")
    s"""WITH g AS (
       |  SELECT $keys, $rhsCol AS r, CAST(count(*) AS BIGINT) AS k
       |  FROM $table GROUP BY $keys, $rhsCol
       |)
       |SELECT $keys, CAST(sum(k) AS BIGINT) AS n_rows,
       |       CAST(count(*) AS BIGINT) AS n_rhs_values
       |FROM g GROUP BY $keys HAVING count(*) > 1""".stripMargin
  }
}
