package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Integer-exact spectral primitives over embedding columns — the
  * linear-algebra tier of the embedding pipeline (PCA/whitening/top
  * component drift), built so the results are HASH-EXACT cross-engine:
  * every step is integer arithmetic on floor(x·1000)-quantized values,
  * so DuckDB reproduces the full iteration bit-for-bit (the oracle is
  * a recursive CTE, not a tolerance check).
  *
  * Shape: the Gram matrix is the only distributed computation (one
  * partial+final aggregation, dims² output rows — driver-sized by
  * construction, the kmeans-centroid pattern); the power iteration
  * itself runs on the collected dims×dims matrix, where it belongs.
  */
object Spectral {

  /** Dominant eigenvector of the integer Gram matrix Qᵀ·Q over the
    * first `dims` quantized embedding dimensions, by `iters` rounds of
    * integer power iteration. Each round: w = G·v, then renormalize to
    * max|v| = 1000 via truncating division with the sign factored out
    * (`sign(x)·((|x|·1000) div max|w|)` — Spark's `div` truncates
    * toward zero, DuckDB's `//` floors; factoring the sign makes both
    * compute the identical value).
    *
    * Output: (dim, v_q) — the direction at 1/1000 resolution; the
    * quantization bounds attainable precision (the spec measures
    * cosine vs a double-precision iteration).
    *
    * Overflow bound (all exact Longs): |G| ≤ rows·10⁶, |w| ≤
    * dims·|G|·1000, renorm multiplies by 1000 — safe while
    * rows · 10¹² · dims < 2⁶³, i.e. ~5·10⁸ rows at dims = 16; past
    * that, shard the Gram by row-range and sum (the bound is per
    * aggregate, not fundamental).
    */
  /** The catalog's shared quantization: first `dims` dims at
    * floor(x·1000) as array<bigint> — every spectral query and its
    * DuckDB oracle mirror THIS expression; change it in one place.
    */
  def quantized(vecCol: String, dims: Int): Column =
    expr(s"transform(slice($vecCol, 1, $dims), " +
      "x -> CAST(floor(x * 1000) AS BIGINT))")

  /** [[dominantEigenvector]]'s core, returning the raw driver-side
    * vector (callers that immediately fold it back into expressions —
    * q_spectral_scores — skip the DataFrame round trip).
    */
  def dominantEigenvectorArray(df: DataFrame, vecCol: String, dims: Int,
                               iters: Int): Array[Long] = {
    val last = dims - 1
    val gramRows = df
      .select(quantized(vecCol, dims).as("q"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, $last), i ->
           |  transform(sequence(0, $last), j ->
           |    named_struct('i', i, 'j', j,
           |      'p', element_at(q, i + 1) * element_at(q, j + 1)))))""".stripMargin))
        .as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).as("g"))
      .collect() // dims^2 rows: the driver-sized aggregate, not data
    val G = Array.ofDim[Long](dims, dims)
    gramRows.foreach(r => G(r.getInt(0))(r.getInt(1)) = r.getLong(2))

    var v = Array.fill(dims)(1000L)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dims) { i =>
        var s = 0L
        var j = 0
        while (j < dims) { s += G(i)(j) * v(j); j += 1 }
        s
      }
      val mx = w.map(math.abs).max
      if (mx > 0) v = w.map(x => math.signum(x) * (math.abs(x) * 1000L / mx))
      it += 1
    }
    v
  }

  def dominantEigenvector(df: DataFrame, vecCol: String, dims: Int,
                          iters: Int): DataFrame = {
    val spark = df.sparkSession
    val v = dominantEigenvectorArray(df, vecCol, dims, iters)
    val out = v.zipWithIndex.map { case (x, i) => Row(i.toLong, x) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField("dim", LongType, nullable = false),
        StructField("v_q", LongType, nullable = false))))
  }
}
