package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch with PORTABLE state: d affine row hashes
  * `((a_j·(key mod p) + b_j) mod p) mod w` over an integral key — every
  * cell value is reproducible by any engine (the q_heavy_hitters DuckDB
  * oracle recomputes the whole sketch), unlike HLL/GK whose states are
  * engine-internal.
  *
  * The cell table is ONE commutative groupBy over the hashed stream, so
  * the identical code is both the batch sketch and the streaming sketch
  * (a streaming aggregation in Update/Complete mode — CmsStreamSpec
  * pins stream cells ≡ batch cells across micro-batch boundaries).
  * Pre-aggregated (key, n) inputs give the same cells as the raw stream
  * because cell sums commute with per-key pre-aggregation — which is
  * what lets q_heavy_hitters keep the ×d explode at |keys| scale.
  */
object Sketches {

  private val P = 1000000007L
  private val A = Seq(2654435761L, 2246822519L, 3266489917L)
  private val B = Seq(104729L, 130363L, 15485863L)

  /** Sketch depth (number of hash rows). */
  val depth: Int = A.length

  /** j-th CMS row hash of an integral key: the key is reduced below p
    * BEFORE the multiply so a·x stays under 2^63 for any id domain.
    */
  def cmsHash(key: Column, j: Int, w: Int): Column = {
    val x = pmod(key, lit(P))
    pmod(pmod(lit(A(j)) * x + lit(B(j)), lit(P)), lit(w))
  }

  /** (r, c, cell) sums from weighted (key, n) rows — batch or streaming
    * input (one commutative groupBy).
    */
  def cmsCellsFromCounts(counts: DataFrame, keyCol: String, nCol: String,
      w: Int): DataFrame =
    counts.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("r"), cmsHash(col(keyCol), j, w).as("c"),
          col(nCol).cast("long").as("n"))): _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.c").as("c"))
      .agg(sum(col("e.n")).as("cell"))

  /** Raw-stream variant: one count per row. */
  def cmsCells(events: DataFrame, keyCol: String, w: Int): DataFrame =
    cmsCellsFromCounts(events.select(col(keyCol), lit(1L).as("n")),
      keyCol, "n", w)

  /** Streaming (or batch) per-group KMV sketch + distinct estimate.
    *
    * Works unchanged under `readStream` in complete/update mode: the
    * TypedImperativeAggregate's serialize/merge IS the state-store
    * contract, so the running sketch state is O(k) longs per group —
    * the streaming distinct-count that never stores the key set. The
    * union algebra being LOSSLESS (KmvSpec) gives the strongest twin
    * property in the streaming catalog: the stream's final sketch is
    * BIT-IDENTICAL to the batch sketch of the same rows, however the
    * micro-batches split them (KmvStreamSpec pins this).
    */
  def kmvDistinct(rows: DataFrame, groupCol: String, hash: Column,
      k: Int): DataFrame =
    rows.groupBy(col(groupCol))
      .agg(graft.functions.Kmv.kmvSketch(hash, k).as("sk"))
      .select(col(groupCol), col("sk"),
        graft.functions.Kmv.estDistinct(col("sk"), k).as("est_distinct"))
}
