package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import graft.functions._

/** Catalyst extension wiring: registers the library's ENTIRE native
  * expression surface into the session's FunctionRegistry so plain SQL
  * text can use it (`SELECT pcm_stats(payload), kmv_sketch(h, 1024)
  * ...`), in addition to the Column API. Aggregate registrations
  * return the bare AggregateFunction — the analyzer wraps it, exactly
  * as for built-in aggregates.
  *
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Also injects the library's plan-level surface: the optimizer rules
  * [[RangeJoinRewrite]] (opt-in via `spark.graft.rangeJoin.binWidth`;
  * a no-op otherwise) and [[DecodePruneRule]], plus
  * [[AsOfJoinStrategy]], the planner strategy for the custom
  * [[AsOfJoinPlan]] sorted-merge as-of join. The reference surface
  * itself needs none of these (SURVEY.md §4): every rewrite it relies
  * on is built-in Catalyst behavior.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => new RangeJoinRewrite)
    e.injectOptimizerRule(_ => DecodePruneRule)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectTableFunction(
      (AsOfSqlFunction.ident, AsOfSqlFunction.info, AsOfSqlFunction.builder _))
  }
}

object GraftExtensions {

  private type Entry =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def entry(name: String, clazz: Class[_], arity: Int)(
      build: Seq[Expression] => Expression): Entry = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getCanonicalName, name),
    (children: Seq[Expression]) => {
      require(children.length == arity,
        s"$name takes exactly $arity arguments, got ${children.length}")
      build(children)
    })

  /** SQL-literal int parameter (e.g. the k in `kmv_sketch(h, 1024)`) —
    * structural parameters must be foldable at registration time.
    */
  private def litInt(e: Expression, fn: String, pos: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $pos must be an INTEGER literal, got $other")
  }

  val all: Seq[Entry] = Seq(
    entry("vec_dot", classOf[DotProduct], 2)(c => DotProduct(c(0), c(1))),
    entry("vec_dot_long", classOf[LongDotProduct], 2)(c =>
      LongDotProduct(c(0), c(1))),
    entry("rolling_hash", classOf[RollingHash], 1)(c => RollingHash(c(0))),
    entry("jaro_winkler", classOf[JaroWinkler], 2)(c =>
      JaroWinkler(c(0), c(1))),
    entry("jw_best_match", classOf[JwBestMatch], 3)(c =>
      JwBestMatch(c(0), c(1), c(2))),
    entry("jw_matches", classOf[JwMatches], 4)(c =>
      JwMatches(c(0), c(1), c(2), c(3))),
    entry("char_entropy_stats", classOf[CharEntropyStats], 1)(c =>
      CharEntropyStats(c(0))),
    entry("ngram_rep_profile", classOf[NgramRepProfile], 1)(c =>
      NgramRepProfile(c(0))),
    entry("zero_mod_windows", classOf[ZeroModWindows], 3)(c =>
      ZeroModWindows(c(0), litInt(c(1), "zero_mod_windows", "k"),
        litInt(c(2), "zero_mod_windows", "p"))),
    entry("char_minhash_profile", classOf[CharMinHashProfile], 3)(c =>
      CharMinHashProfile(c(0), litInt(c(1), "char_minhash_profile", "k"),
        litInt(c(2), "char_minhash_profile", "numDigests"))),
    entry("word_minhash_profile", classOf[WordMinHashProfile], 3)(c =>
      WordMinHashProfile(c(0), litInt(c(1), "word_minhash_profile", "n"),
        litInt(c(2), "word_minhash_profile", "numDigests"))),
    entry("min_ticket_key", classOf[MinTicketKey], 2)(c =>
      MinTicketKey(c(0), c(1))),
    entry("pcm_stats", classOf[PcmStats], 1)(c => PcmStats(c(0))),
    entry("bmp_pixel_stats", classOf[BmpPixelStats], 1)(c =>
      BmpPixelStats(c(0))),
    entry("png_pixel_stats", classOf[PngPixelStats], 1)(c =>
      PngPixelStats(c(0))),
    entry("gif_pixel_stats", classOf[GifPixelStats], 1)(c =>
      GifPixelStats(c(0))),
    entry("jpeg_pixel_stats", classOf[JpegPixelStats], 1)(c =>
      JpegPixelStats(c(0))),
    entry("magic_kind", classOf[MagicKind], 1)(c => MagicKind(c(0))),
    entry("image_dhash", classOf[ImageDHash], 1)(c => ImageDHash(c(0))),
    entry("nfc_norm", classOf[NfcNormalize], 1)(c => NfcNormalize(c(0))),
    entry("vec_sqdist_long", classOf[LongSqDist], 2)(c =>
      LongSqDist(c(0), c(1))),
    entry("extractive_fragments", classOf[ExtractiveFragments], 2)(c =>
      ExtractiveFragments(c(0), c(1))),
    entry("winnow_fingerprints", classOf[WinnowFingerprints], 3)(c =>
      WinnowFingerprints(c(0), litInt(c(1), "winnow_fingerprints", "k"),
        litInt(c(2), "winnow_fingerprints", "w"))),
    // variadic: blocklist_hits(text, 'phrase1', 'phrase2', ...)
    (FunctionIdentifier("blocklist_hits"),
      new ExpressionInfo(classOf[BlocklistHits].getCanonicalName,
        "blocklist_hits"),
      (children: Seq[Expression]) => {
        require(children.length >= 2,
          "blocklist_hits takes the text column plus at least one phrase")
        val phrases = children.tail.map {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"blocklist_hits: phrases must be STRING literals, got $other")
        }
        BlocklistHits(children.head, phrases)
      }),
    entry("kmv_sketch", classOf[KmvSketchAgg], 2)(c =>
      KmvSketchAgg(c(0), litInt(c(1), "kmv_sketch", "k"))),
    entry("kmv_union_agg", classOf[KmvUnionAgg], 2)(c =>
      KmvUnionAgg(c(0), litInt(c(1), "kmv_union_agg", "k"))))
}
