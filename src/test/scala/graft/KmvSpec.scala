package graft

import org.apache.spark.sql.functions._
import graft.functions.{Kmv, KmvBuffer, KmvSketchAgg}

/** KMV sketch (functions/KmvExpressions.scala): exactness below k,
  * lossless union rollup, spill-path serialization, and intersection
  * estimation accuracy on sets with engineered overlap.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  test("below k the sketch IS the set: estimate is exact") {
    val df = (1L to 40L).toDF("v")
      .agg(Kmv.kmvSketch(xxhash64(col("v")), K).as("sk"))
      .select(size(col("sk")).as("n"),
        Kmv.estDistinct(col("sk"), K).as("est"))
    val r = df.head()
    assert(r.getInt(0) == 40)
    assert(r.getDouble(1) == 40.0)
  }

  test("duplicates are absorbed without a pre-distinct") {
    val dup = ((1L to 40L) ++ (1L to 40L) ++ (1L to 40L)).toDF("v")
      .agg(Kmv.kmvSketch(xxhash64(col("v")), K).as("sk"))
      .select(col("sk")).head().getSeq[Long](0)
    val one = (1L to 40L).toDF("v")
      .agg(Kmv.kmvSketch(xxhash64(col("v")), K).as("sk"))
      .select(col("sk")).head().getSeq[Long](0)
    assert(dup == one)
  }

  test("union rollup is lossless: merged part-sketches == direct sketch") {
    val vals = (1L to 5000L).toDF("v")
      .withColumn("part", pmod(col("v"), lit(7)))
    val direct = vals
      .agg(Kmv.kmvSketch(xxhash64(col("v")), K).as("sk"))
      .select(col("sk")).head().getSeq[Long](0)
    val rolled = vals.groupBy(col("part"))
      .agg(Kmv.kmvSketch(xxhash64(col("v")), K).as("sk"))
      .agg(Kmv.kmvUnion(col("sk"), K).as("sk"))
      .select(col("sk")).head().getSeq[Long](0)
    assert(rolled == direct)
  }

  test("estimate above k is within 3 standard errors") {
    val n = 20000
    val est = (1L to n.toLong).toDF("v")
      .agg(Kmv.kmvSketch(xxhash64(col("v")), K).as("sk"))
      .select(Kmv.estDistinct(col("sk"), K).as("est"))
      .head().getDouble(0)
    // KMV relative std error ~ 1/sqrt(k-2)
    val tol = 3.0 / math.sqrt(K - 2.0)
    assert(math.abs(est - n) <= tol * n, s"est $est vs $n (tol ±${tol * n})")
  }

  test("intersection estimate on engineered 50% overlap") {
    val k = 512
    // A = [1, 20000], B = [10001, 30000] → |A∩B| = 10000
    val a = (1L to 20000L).toDF("v")
      .agg(Kmv.kmvSketch(xxhash64(col("v")), k).as("sk")).head().getSeq[Long](0)
    val b = (10001L to 30000L).toDF("v")
      .agg(Kmv.kmvSketch(xxhash64(col("v")), k).as("sk")).head().getSeq[Long](0)
    val est = Seq((a, b)).toDF("sk_a", "sk_b")
      .select(Kmv.estIntersect(col("sk_a"), col("sk_b"), k).as("est"))
      .head().getDouble(0)
    assert(math.abs(est - 10000) <= 2000, s"intersection est $est vs 10000")
  }

  test("empty-set algebra: empty sketch, zero intersection") {
    val empty = spark.emptyDataset[Long].toDF("v")
      .agg(Kmv.kmvSketch(xxhash64(col("v")), K).as("sk")).head().getSeq[Long](0)
    assert(empty.isEmpty)
    val some = (1L to 10L).toDF("v")
      .agg(Kmv.kmvSketch(xxhash64(col("v")), K).as("sk")).head().getSeq[Long](0)
    val est = Seq((empty, some)).toDF("sk_a", "sk_b")
      .select(Kmv.estIntersect(col("sk_a"), col("sk_b"), K).as("est"))
      .head().getDouble(0)
    assert(est == 0.0)
  }

  test("serialize/deserialize roundtrip preserves the buffer (spill path)") {
    val agg = KmvSketchAgg(org.apache.spark.sql.graft.ColumnBridge
      .expression(xxhash64(lit(1L))), k = 8)
    val buf = new KmvBuffer(8)
    Seq(42L, -1L, 7L, Long.MaxValue, Long.MinValue, 0L, 99L, -500L, 12L, 3L)
      .foreach(h => buf.add(h ^ Long.MinValue))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.set == buf.set)
    assert(back.set.size == 8)
  }

  test("buffer keeps the k smallest rank keys under unsigned hash order") {
    val buf = new KmvBuffer(3)
    // rank keys directly (already shifted domain)
    Seq(5L, 1L, 9L, 3L, 7L, 1L).foreach(buf.add)
    val kept = {
      val it = buf.set.iterator(); Iterator.continually(it)
        .takeWhile(_.hasNext).map(_.next().longValue()).toList
    }
    assert(kept == List(1L, 3L, 5L))
  }
}
