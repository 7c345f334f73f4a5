package graft

import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSuite {

  /** Reference xy2d (the classic bit loop). */
  private def xy2d(order: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert: matches the reference fold on a grid sweep and " +
      "masks wide inputs mod 2^order") {
    import spark.implicits._
    val pts = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)) ++
      Seq((65535L, 65535L), (40000L, 12345L), (1L << 20, 77L))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.Hilbert.hilbert(col("x"), col("y")).as("h"),
        graft.functions.Hilbert.hilbertFold(col("x"), col("y")).as("hf"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    pts.foreach { case (x, y) =>
      val exp = xy2d(16, x % 65536, y % 65536)
      assert(out((x, y)) == ((exp, exp)), s"($x, $y)") // native == fold
    }
    // SQL registration resolves to the same codegen'd expression
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT hilbert_key(CAST(40000 AS LONG), CAST(12345 AS LONG))")
      .head().getLong(0)
    assert(viaSql == xy2d(16, 40000, 12345))
  }

  test("hilbert: locality — every consecutive index pair is grid-" +
      "adjacent (Manhattan 1), while Morton jumps; mean |Δ| smaller") {
    import spark.implicits._
    // full 16x16 grid at order 4 behavior comes free from the order-16
    // fold because low coordinates live entirely in the low planes
    val n = 32
    val pts = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.Hilbert.hilbert(col("x"), col("y")).as("h"),
        graft.functions.Morton.morton(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byH = rows.sortBy(_._3)
    // consecutive Hilbert indices within the n*n block are adjacent
    byH.sliding(2).foreach { case Array(a, b) =>
      if (b._3 == a._3 + 1) {
        val manhattan = math.abs(a._1 - b._1) + math.abs(a._2 - b._2)
        assert(manhattan == 1L, s"$a -> $b")
      }
    }
    def meanJump(sorted: Seq[(Long, Long)]): Double =
      sorted.sliding(2).map { case Seq(a, b) =>
        (math.abs(a._1 - b._1) + math.abs(a._2 - b._2)).toDouble
      }.sum / (sorted.size - 1)
    val hJump = meanJump(byH.map(r => (r._1, r._2)).toSeq)
    val zJump = meanJump(rows.sortBy(_._4).map(r => (r._1, r._2)).toSeq)
    assert(hJump < zJump,
      s"hilbert mean jump $hJump should beat morton $zJump")
    assert(hJump == 1.0) // the curve is a true Hamiltonian grid path
  }
}
