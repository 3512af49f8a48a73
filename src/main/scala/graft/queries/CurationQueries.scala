package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Annotation, Clustering, Dedup, Mixture, Packing, Sampling, Skyline, TextAnalysis}

/** Training-data curation queries: TF-IDF term weighting, PII
  * redaction, stratified corpus rebalancing, repetition (boilerplate)
  * profiling, benchmark-contamination detection, and k-means document
  * clustering. Each is a thin wrapper over a library operator, with a
  * full DuckDB oracle.
  */
object CurationQueries {

  /** Per-language keep fractions for the stratified-sample query:
    * downsample the dominant English hard, keep a quarter of Chinese,
    * a tenth of everything else.
    */
  private val strata = Seq("en" -> 0.5, "zh" -> 0.25)
  private val defaultFraction = 0.1

  /** Blocklist for q_blocklist. Every phrase is BORDER-FREE (no proper
    * prefix equals a suffix), so occurrences cannot overlap and the
    * oracle's non-overlapping replace-count is exactly the automaton's
    * all-occurrences count; the overlapping general case is pinned by
    * BlocklistSpec instead. "drop table" is the deliberate zero-hit
    * phrase.
    */
  private val blockPhrases =
    Seq("slow join", "big data", "spark stream", "merge line", "drop table")

  val queries: Map[String, Q] = Map(
    // Content-policy screen: one Aho-Corasick pass counts every
    // blocklist phrase per document (k phrases, ONE text scan — the
    // 100 TB shape), rolled up per (source, phrase). posexplode keeps
    // phrase identity by index into the same literal array.
    "q_blocklist" -> ((s, d) => {
      val hits = Tables.documents(s, d)
        .select(col("source"),
          posexplode(graft.functions.AhoCorasick.blocklistHits(
            lower(col("text")), blockPhrases)).as(Seq("pid", "cnt")))
      hits
        .withColumn("phrase",
          element_at(array(blockPhrases.map(lit): _*), col("pid") + 1))
        .groupBy(col("source"), col("phrase"))
        .agg(count(lit(1)).as("docs_screened"),
          sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("docs_hit"),
          sum(col("cnt")).as("total_hits"))
    }),

    // DPO preference-pair construction: prompt = doc_id mod 40,
    // reward = n_chars — per prompt pair the max-reward response with
    // the min-reward one (ties to the smaller doc_id), skipping
    // prompts with no strict preference. One prompt-keyed aggregation
    // carrying two struct-ordered extremes.
    "q_dpo_pairs" -> ((s, d) =>
      Annotation.dpoPairs(
        Tables.documents(s, d)
          .select(expr("doc_id % 40").as("prompt_id"), col("doc_id"),
            col("n_chars")),
        "prompt_id", "doc_id", "n_chars")),

    // Exact ECE reliability bins per source: confidence and verdict
    // are deterministic modular fixtures (engine-portable integer
    // arithmetic, no hash-hex conversion divergence); the gap algebra
    // |10000·n_correct − Σconf| / (10000·n) is what's being proven.
    "q_ece" -> ((s, d) =>
      Annotation.calibrationBins(
        Tables.documents(s, d)
          .select(col("source"),
            expr("(doc_id % 10001) * 6271 % 10001").as("conf_bp"),
            expr("((doc_id * 7919) % 97) % 2 = 0").as("ok")),
        "source", "conf_bp", "ok", nBins = 10)),

    // Exact per-source ROC-AUC of a length "classifier" predicting
    // English (Mann-Whitney U with midranks): does n_chars rank en
    // docs above the rest? Emitted as the undivided (2U, 2·n⁺·n⁻)
    // pair; ties are abundant at ~300 distinct lengths, so the
    // midrank branch carries real mass. Pre-aggregated by (source,
    // score) — the cumulative window runs over distinct scores, never
    // rows.
    "q_auc" -> ((s, d) =>
      Annotation.aucStats(
        Tables.documents(s, d)
          .select(col("source"), col("n_chars"),
            (col("lang") === "en").as("is_en")),
        "source", "n_chars", "is_en")),

    // Group-relative advantage (GRPO data prep): the same prompt
    // grouping as q_dpo_pairs, but EVERY response gets a signal —
    // reward centered on the group mean, emitted as the exact
    // undivided (n·r − Σr, n) pair with the group variance numerator
    // riding along — DECIMAL(38,0) math, canonical-decimal-string out
    // (pandas flattens DECIMAL results to float64, so a decimal OUTPUT
    // column is a cross-engine hash hazard). One window exchange.
    "q_grpo_advantage" -> ((s, d) =>
      Annotation.grpoAdvantage(
        Tables.documents(s, d)
          .select(expr("doc_id % 40").as("prompt_id"), col("doc_id"),
            col("n_chars")),
        "prompt_id", "doc_id", "n_chars")),

    // Unbiased pass@k over a deterministic verdict: task = doc_id mod
    // 50, first 32 samples per task in doc_id order, "passes" =
    // n_chars divisible by 3 (the engine-portable stand-in for a unit
    // test verdict). Exact integer combinatorics — see
    // Annotation.passAtK.
    "q_pass_at_k" -> ((s, d) =>
      Annotation.passAtK(
        Tables.documents(s, d)
          .select(expr("doc_id % 50").as("task_id"), col("doc_id"),
            (col("n_chars") % 3 === 0).as("ok")),
        "task_id", "doc_id", "ok", ks = Seq(1, 5, 10), maxN = 32)),

    // Top-3 TF-IDF terms per document (rational idf — see operator doc).
    "q_tfidf" -> ((s, d) =>
      TextAnalysis.tfIdfTopK(Tables.documents(s, d), "text", "doc_id", 3)),

    // Preference-data label aggregation: events re-read as an
    // annotation log (item = event_id mod 3000, rater vote =
    // event_type) → per-item majority label, vote totals, and
    // integer-basis-point agreement. The consensus pick rides the
    // bounded-heap TopKStruct aggregate (k=1), so the item-keyed
    // exchange carries one candidate per item per task, not the label
    // histogram.
    "q_label_vote" -> ((s, d) =>
      Annotation.majorityVote(
        Tables.events(s, d)
          .select(expr("event_id % 3000").as("item_id"),
            col("event_type").as("label")),
        "item_id", "label")),

    // Inter-annotator agreement (Cohen's κ): the same annotation log
    // as q_label_vote, read as TWO raters per item — rater A is the
    // earliest event's type, rater B the latest's (ties broken by
    // event_id; items need ≥ 2 events). κ is emitted as its exact
    // integer numerator/denominator — never divided, because κ can be
    // negative and truncation direction differs across engines.
    "q_kappa" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(expr("event_id % 3000").as("item_id"),
          expr("unix_micros(ts)").as("t_us"), col("event_id"), col("event_type"))
      val pairs = ev.groupBy(col("item_id"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("t_us"), col("event_id"), col("event_type"))).as("fst"),
          max(struct(col("t_us"), col("event_id"), col("event_type"))).as("lst"))
        .filter(col("n") >= 2)
        .select(col("item_id"),
          col("fst.event_type").as("label_a"), col("lst.event_type").as("label_b"))
      Annotation.cohenKappa(pairs, "label_a", "label_b")
    }),

    // Krippendorff's α over the same annotation log read as a
    // MULTI-rater campaign (item = event_id div 8 → up to 8 ratings
    // per item, variable at the tail): the agreement coefficient κ
    // cannot express. Exact integers via the bounded-rater lcm
    // (L = 420 clears every per-item (m−1) denominator); α emitted as
    // the never-divided num/den pair, same convention as q_kappa.
    "q_kripp_alpha" -> ((s, d) =>
      Annotation.krippendorffAlpha(
        Tables.events(s, d)
          .select(expr("event_id div 8").as("item_id"), col("event_type")),
        "item_id", "event_type", maxRaters = 8)),

    // Budgeted domain-mixture waterfill: per-source char counts, a
    // 3-epoch repetition cap, and a budget of 1.5× the corpus — small
    // sources cap out, the rest split the remainder to the token
    // (exact integers; Σ alloc == budget is asserted in MixtureSpec).
    "q_mix_budget" -> ((s, d) =>
      Mixture.waterfill(
        Tables.documents(s, d).groupBy(col("source"))
          .agg(sum(col("n_chars")).as("toks")),
        "source", "toks", repCap = 3, budgetNum = 3, budgetDen = 2)),

    // Temperature-sampled mixture at α = 1/2: exact integer-√ weights +
    // largest-remainder apportionment of a 1M-token budget over
    // per-source doc counts — the low-resource upsampling rule next to
    // q_mix_budget's repetition-capped waterfill. Σ alloc == budget.
    "q_temperature_mix" -> ((s, d) =>
      Mixture.temperatureAllocation(
        Tables.documents(s, d).groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs")),
        "source", "n_docs", budget = 1000000L)),

    // Close the mixture loop: apply the waterfill plan as a per-source
    // integer hash cut and audit realized vs planned token mass.
    "q_mix_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val plan = Mixture.waterfill(
        docs.groupBy(col("source")).agg(sum(col("n_chars")).as("toks")),
        "source", "toks", repCap = 3, budgetNum = 3, budgetDen = 2)
      Mixture.applyPlan(docs, plan, "source", "doc_id", "n_chars")
    }),

    // PII scrubbing over synthesized log lines (the fixture corpus has
    // no emails/digit runs, so the query builds a deterministic PII-rich
    // text from events columns first — integer concat only; doubles
    // don't format identically across engines).
    "q_pii_redact" -> ((s, d) => {
      val lines = Tables.events(s, d).select(col("event_id"),
        concat(lit("user u"), col("user_id").cast("string"),
          lit(" contact u"), col("user_id").cast("string"),
          lit("@example.com ref "), (col("event_id") * 7919).cast("string"),
          lit(" done")).as("text"))
      TextAnalysis.redactPii(lines, "text", "event_id")
        .select(col("event_id"), col("n_emails"), col("n_digit_runs"),
          md5(col("redacted")).as("redacted_fp"))
    }),

    // Stratified rebalancing + per-language accounting of what's kept.
    "q_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedSample(Tables.documents(s, d), "lang", "doc_id",
        strata.toMap, defaultFraction)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))),

    // Balanced mixture downsample: cap every language to ~the smallest
    // language's share with data-dependent integer hash cuts — the
    // dataset-mixing accounting row per stratum (see
    // Sampling.balancedMixture for the widened-hex threshold trick).
    "q_mixture_sample" -> ((s, d) =>
      Sampling.balancedMixture(Tables.documents(s, d), "lang", "doc_id")),

    // Balanced eval set: exactly 40 docs per language in hash order.
    "q_quota_sample" -> ((s, d) =>
      Sampling.quotaSample(Tables.documents(s, d), "lang", "doc_id", 40)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))),

    // Length-weighted corpus sample: 100 docs drawn ∝ size (in 200-char
    // ticket units) via the integer-ticket minimum-draw scheme — the
    // float-free weighted sampler (see Sampling.weightedSample: the
    // E-S exponential key would hang cross-engine determinism on libm
    // ln(); integer tickets cannot disagree).
    "q_weighted_sample" -> ((s, d) =>
      Sampling.weightedSample(
        Tables.documents(s, d)
          .select(col("doc_id"), greatest(lit(1L),
            (col("n_chars") / 200).cast("long")).as("w")),
        "doc_id", "w", k = 100)),

    // Dominant-token repetition profile (boilerplate/spam signal).
    "q_repetition" -> ((s, d) =>
      TextAnalysis.repetitionProfile(Tables.documents(s, d), "text", "doc_id")),

    // Gopher-style within-doc n-gram repetition: top-{2,3,4}-gram char
    // share + duplicated-5-gram char share per document (boilerplate /
    // degenerate-generation screen; see operator doc for exact
    // integer semantics).
    "q_gopher_rep" -> ((s, d) =>
      TextAnalysis.ngramRepetition(Tables.documents(s, d), "text", "doc_id")),

    // Eval-set leakage: train-split docs sharing any word 5-gram with
    // the val split (the benchmark stand-in).
    "q_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("split", Sampling.splitTag(col("doc_id"), 0.9))
      Dedup.contaminationReport(
        docs.filter(col("split") === "train"),
        docs.filter(col("split") === "val"),
        "text", "doc_id", n = 5)
    }),

    // One integer-exact k-means refinement over the embedding corpus.
    "q_kmeans" -> ((s, d) =>
      Clustering.kmeansRefine(Tables.embeddings(s, d), k = 4)),

    // Sequence packing: documents laid end-to-end in id order, cut into
    // 2048-token training bins via the two-level distributed prefix sum
    // (never a global single-partition window — see Packing).
    "q_seq_pack" -> ((s, d) =>
      Packing.packReport(
        Tables.documents(s, d).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")),
        "doc_id", "n_tok", capacity = 2048, bucketWidth = 512)),

    // Context-window chunking: 64-token windows every 48 tokens
    // (16-token overlap) — the pre-packing chunk step for long docs.
    "q_text_chunks" -> ((s, d) =>
      TextAnalysis.chunkTokens(Tables.documents(s, d), "text", "doc_id",
        window = 64, stride = 48)),

    // Padding-waste audit of power-of-two length bucketing — the batch
    // strategy packReport's bin packing competes against.
    "q_padding_waste" -> ((s, d) =>
      Packing.paddingWaste(
        Tables.documents(s, d)
          .select(TextAnalysis.tokenCount(col("text")).as("n_tokens")),
        "n_tokens")),

    // Pareto-frontier curation: the documents not dominated on
    // (n_chars minimized, classifier logit maximized) — every dropped
    // doc has a strictly better-or-equal alternative at equal-or-lower
    // cost. Distributed running-max skyline (see Skyline), never the
    // oracle's O(n²) NOT EXISTS.
    "q_skyline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pts = docs.select(col("doc_id"), col("n_chars"))
        .join(TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
          .select(col("doc_id"), col("logit")), Seq("doc_id"))
      Skyline.paretoFrontier2D(pts, "n_chars", "logit", bucketWidth = 256)
    }),

    // Classifier calibration curve: bucket the hash-classifier logit
    // into fixed-width bins and measure, per bin, how often the
    // independent heuristic quality label is positive (≠ low). The
    // reliability diagram every production quality filter needs before
    // its threshold is trusted. The 2⁴⁰ offset keeps the binned
    // numerator positive so `div`'s truncation direction can never
    // disagree across engines.
    "q_calibration" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lg = TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
        .select(col("doc_id"), col("logit"))
      val lab = TextAnalysis.qualityScore(docs, "text", "doc_id")
        .select(col("doc_id"),
          (col("quality") =!= "low").cast("long").as("pos"))
      lg.join(lab, Seq("doc_id"))
        .withColumn("bin", expr("(logit + 1099511627776) div 2000"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"),
          min(col("logit")).as("min_logit"), max(col("logit")).as("max_logit"))
        .withColumn("pos_permille", expr("n_pos * 1000 div n_docs"))
    })
  )

  private val toksSql = """string_split_regex(lower(trim(text)), '\s+')"""

  /** Word-5-gram distinct shingles with the hash-split tag. */
  private val gram5Sql =
    s"""t AS (SELECT doc_id, $toksSql AS toks,
       |        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
       |             THEN 'train' ELSE 'val' END AS split
       |      FROM documents),
       |gs AS (SELECT doc_id, split, toks, unnest(generate_series(1, len(toks)-4)) AS g
       |       FROM t WHERE len(toks) >= 5),
       |sh AS (SELECT DISTINCT doc_id, split,
       |         toks[g]||' '||toks[g+1]||' '||toks[g+2]||' '||toks[g+3]||' '||toks[g+4]
       |           AS shingle
       |       FROM gs)""".stripMargin

  private val stratCase = {
    val whens = strata.map { case (lang, f) =>
      s"WHEN lang = '$lang' THEN h < '${Sampling.cutHex(f)}'" }.mkString("\n         ")
    s"CASE $whens\n         ELSE h < '${Sampling.cutHex(defaultFraction)}' END"
  }

  /** Waterfill-plan mirror shared by q_mix_budget and (as a nested
    * subquery) q_mix_apply.
    */
  private val mixPlanSql: String =
    """WITH t0 AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS toks
        |  FROM documents GROUP BY source
        |), t AS (SELECT * FROM t0 WHERE toks > 0),
        |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS T FROM t),
        |r AS (
        |  SELECT source, toks, toks * 3 AS cap, (3 * T) // 2 AS budget,
        |    CAST(row_number() OVER (ORDER BY toks * 3, source) AS BIGINT) AS k,
        |    CAST(SUM(toks * 3) OVER (ORDER BY toks * 3, source) AS BIGINT) AS pfx,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM t CROSS JOIN tot
        |), f AS (
        |  SELECT *, (pfx - cap) + cap * (n - k + 1) <= budget AS capped FROM r
        |), s1 AS (
        |  SELECT *, COALESCE(MAX(CASE WHEN capped THEN k END) OVER (), 0) AS kstar FROM f
        |), s2 AS (
        |  SELECT *, COALESCE(MAX(CASE WHEN k = kstar THEN pfx END) OVER (), 0) AS pks FROM s1
        |), s3 AS (
        |  SELECT *,
        |    CASE WHEN n > kstar THEN (budget - pks) // (n - kstar) ELSE 0 END AS level,
        |    CASE WHEN n > kstar THEN (budget - pks) % (n - kstar) ELSE 0 END AS rem
        |  FROM s2
        |), a AS (
        |  SELECT source, toks, cap,
        |    CASE WHEN k <= kstar THEN cap
        |         ELSE level + CASE WHEN k - kstar <= rem THEN 1 ELSE 0 END END AS alloc
        |  FROM s3
        |)
        |SELECT source, toks, cap, alloc, (alloc * 10000) // toks AS epochs_bp
        |FROM a""".stripMargin

  val oracles: Map[String, String] = Map(
    // Border-free phrases make the replace-trick count exact (no
    // overlapping occurrences possible) — see blockPhrases.
    "q_blocklist" ->
      """WITH p AS (
        |  SELECT * FROM (VALUES ('slow join'), ('big data'),
        |    ('spark stream'), ('merge line'), ('drop table')) AS t(phrase)
        |), occ AS (
        |  SELECT d.source, p.phrase,
        |    (len(lower(d.text)) - len(replace(lower(d.text), p.phrase, '')))
        |      // len(p.phrase) AS cnt
        |  FROM documents d CROSS JOIN p
        |)
        |SELECT source, phrase,
        |  CAST(COUNT(*) AS BIGINT) AS docs_screened,
        |  CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
        |  CAST(SUM(cnt) AS BIGINT) AS total_hits
        |FROM occ GROUP BY 1, 2""".stripMargin,

    "q_dpo_pairs" ->
      """WITH r AS (
        |  SELECT doc_id % 40 AS prompt, doc_id AS rid, n_chars AS reward
        |  FROM documents
        |), w AS (
        |  SELECT prompt, rid, reward,
        |    row_number() OVER (PARTITION BY prompt
        |      ORDER BY reward DESC, rid ASC) AS rc,
        |    row_number() OVER (PARTITION BY prompt
        |      ORDER BY reward ASC, rid ASC) AS rr,
        |    COUNT(*) OVER (PARTITION BY prompt) AS n
        |  FROM r
        |), c AS (
        |  SELECT prompt, n, rid AS chosen_id, reward AS chosen_reward
        |  FROM w WHERE rc = 1
        |), j AS (
        |  SELECT prompt, rid AS rejected_id, reward AS rejected_reward
        |  FROM w WHERE rr = 1
        |)
        |SELECT c.prompt, CAST(c.n AS BIGINT) AS n_responses,
        |  CAST(chosen_id AS BIGINT) AS chosen_id,
        |  CAST(chosen_reward AS BIGINT) AS chosen_reward,
        |  CAST(rejected_id AS BIGINT) AS rejected_id,
        |  CAST(rejected_reward AS BIGINT) AS rejected_reward,
        |  CAST(chosen_reward - rejected_reward AS BIGINT) AS margin
        |FROM c JOIN j USING (prompt)
        |WHERE c.n >= 2 AND chosen_reward > rejected_reward""".stripMargin,

    // Same modular fixtures, same one-scaling gap algebra; HUGEINT
    // sums cast back at every emission point.
    "q_ece" ->
      """WITH r AS (
        |  SELECT source, (doc_id % 10001) * 6271 % 10001 AS conf_bp,
        |    ((doc_id * 7919) % 97) % 2 = 0 AS ok
        |  FROM documents
        |), g AS (
        |  SELECT source, LEAST(conf_bp * 10 // 10000, 9) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n_bin,
        |    CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |    CAST(SUM(conf_bp) AS BIGINT) AS sum_conf_bp
        |  FROM r GROUP BY source, LEAST(conf_bp * 10 // 10000, 9)
        |), w AS (
        |  SELECT source, bin, n_bin, n_correct, sum_conf_bp,
        |    abs(10000 * n_correct - sum_conf_bp) AS gap_num
        |  FROM g
        |)
        |SELECT source, bin, n_bin, n_correct, sum_conf_bp, gap_num,
        |  CAST(SUM(gap_num) OVER (PARTITION BY source) AS BIGINT) AS ece_num,
        |  CAST(10000 * SUM(n_bin) OVER (PARTITION BY source) AS BIGINT)
        |    AS ece_den
        |FROM w""".stripMargin,

    // The pairwise count collapsed the same way: per-(source, score)
    // class counts, one cumulative-negatives window over distinct
    // scores, Σ np·(2·cumBelow + nn). HUGEINT internally; the two
    // unbounded moments leave as canonical decimal VARCHAR (matching
    // the Spark side's string emission — see Annotation.aucStats).
    "q_auc" ->
      """WITH r AS (
        |  SELECT source, n_chars AS s, (lang = 'en') AS pos FROM documents
        |), g AS (
        |  SELECT source, s,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS nn
        |  FROM r GROUP BY source, s
        |), c AS (
        |  SELECT source, s, np, nn,
        |    COALESCE(SUM(nn) OVER (PARTITION BY source ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM g
        |)
        |SELECT source,
        |  CAST(SUM(np) AS BIGINT) AS n_pos,
        |  CAST(SUM(nn) AS BIGINT) AS n_neg,
        |  CAST(CAST(SUM(CAST(np AS HUGEINT) * (2 * cb + nn))
        |    AS DECIMAL(38,0)) AS VARCHAR) AS auc_num,
        |  CAST(CAST(2 * SUM(CAST(np AS HUGEINT)) * SUM(nn) AS DECIMAL(38,0))
        |    AS VARCHAR) AS auc_den
        |FROM c GROUP BY source""".stripMargin,

    // Moments replayed as HUGEINT window sums (Σr² × n exceeds BIGINT
    // long before it exceeds 38 digits), final casts to the Spark
    // types (BIGINT n; adv/var numerators as canonical decimal
    // VARCHAR — see Annotation.grpoAdvantage).
    "q_grpo_advantage" ->
      """WITH r AS (
        |  SELECT doc_id % 40 AS prompt, doc_id AS rid, n_chars AS reward
        |  FROM documents
        |), w AS (
        |  SELECT prompt, rid, reward,
        |    COUNT(*) OVER (PARTITION BY prompt) AS n_h,
        |    SUM(CAST(reward AS HUGEINT)) OVER (PARTITION BY prompt) AS sum_r,
        |    SUM(CAST(reward AS HUGEINT) * reward)
        |      OVER (PARTITION BY prompt) AS sum_r2
        |  FROM r
        |)
        |SELECT prompt, rid, reward, CAST(n_h AS BIGINT) AS n,
        |  CAST(CAST(n_h * reward - sum_r AS DECIMAL(38,0)) AS VARCHAR)
        |    AS adv_num,
        |  CAST(CAST(n_h * sum_r2 - sum_r * sum_r AS DECIMAL(38,0)) AS VARCHAR)
        |    AS var_num
        |FROM w""".stripMargin,

    "q_pass_at_k" ->
      """WITH capped AS (
        |  SELECT doc_id % 50 AS task_id, n_chars % 3 = 0 AS ok,
        |    row_number() OVER (PARTITION BY doc_id % 50 ORDER BY doc_id) AS rn
        |  FROM documents
        |), t AS (
        |  SELECT task_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM capped WHERE rn <= 32 GROUP BY 1
        |), e AS (
        |  SELECT task_id, n, c, k.k
        |  FROM t CROSS JOIN (VALUES (1), (5), (10)) AS k(k)
        |  WHERE k.k <= n
        |), s AS (
        |  SELECT k, n, c,
        |    CASE WHEN n - c < k THEN 0 ELSE list_reduce(
        |      list_transform(generate_series(0, k - 1), i -> n - c - i),
        |      (acc, x) -> acc * x) END AS num,
        |    list_reduce(
        |      list_transform(generate_series(0, k - 1), i -> n - i),
        |      (acc, x) -> acc * x) AS den
        |  FROM e
        |)
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_tasks,
        |  CAST(SUM(CAST(den - num AS HUGEINT) * 1000000 // den) AS BIGINT)
        |    AS sum_ppm,
        |  CAST(SUM(CAST(den - num AS HUGEINT) * 1000000 // den)
        |    // COUNT(*) AS BIGINT) AS mean_pass_ppm
        |FROM s GROUP BY 1""".stripMargin,

    "q_label_vote" ->
      """WITH c AS (
        |  SELECT event_id % 3000 AS item_id, event_type AS label,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT item_id, label, cnt,
        |    row_number() OVER (PARTITION BY item_id ORDER BY cnt DESC, label ASC) AS rk
        |  FROM c
        |), t AS (
        |  SELECT item_id, CAST(SUM(cnt) AS BIGINT) AS n_votes,
        |    CAST(COUNT(*) AS BIGINT) AS n_labels
        |  FROM c GROUP BY 1
        |)
        |SELECT t.item_id, r.label AS majority_label, r.cnt AS majority_n,
        |  t.n_votes, t.n_labels, (r.cnt * 10000) // t.n_votes AS agreement_bp
        |FROM t JOIN r ON r.item_id = t.item_id AND r.rk = 1""".stripMargin,

    // Mirrors q_kappa's rater construction (row_number twins of the
    // struct min/max) and the exact-rational κ ingredients.
    "q_kappa" ->
      """WITH ev AS (
        |  SELECT event_id % 3000 AS item_id, epoch_us(ts) AS t_us,
        |    event_id, event_type
        |  FROM events
        |), r AS (
        |  SELECT item_id, event_type,
        |    row_number() OVER (PARTITION BY item_id ORDER BY t_us, event_id) AS rk_a,
        |    row_number() OVER (PARTITION BY item_id ORDER BY t_us DESC, event_id DESC) AS rk_b,
        |    COUNT(*) OVER (PARTITION BY item_id) AS n
        |  FROM ev
        |), p AS (
        |  SELECT item_id,
        |    MAX(CASE WHEN rk_a = 1 THEN event_type END) AS label_a,
        |    MAX(CASE WHEN rk_b = 1 THEN event_type END) AS label_b
        |  FROM r WHERE n >= 2 GROUP BY item_id
        |), t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(COUNT(*) FILTER (label_a = label_b) AS BIGINT) AS agree_n
        |  FROM p
        |), ma AS (SELECT label_a AS l, CAST(COUNT(*) AS BIGINT) AS na FROM p GROUP BY 1),
        |mb AS (SELECT label_b AS l, CAST(COUNT(*) AS BIGINT) AS nb FROM p GROUP BY 1),
        |pe AS (
        |  SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS pe_num
        |  FROM ma JOIN mb USING (l)
        |)
        |SELECT n_items, agree_n, pe_num,
        |  agree_n * n_items - pe_num AS kappa_num,
        |  n_items * n_items - pe_num AS kappa_den
        |FROM t CROSS JOIN pe""".stripMargin,

    "q_kripp_alpha" ->
      """WITH r AS (SELECT event_id // 8 AS item_id, event_type FROM events),
        |cnt AS (SELECT item_id, event_type, CAST(COUNT(*) AS BIGINT) AS nic
        |        FROM r GROUP BY item_id, event_type),
        |items AS (SELECT item_id, CAST(SUM(nic) AS BIGINT) AS m,
        |            CAST(SUM(nic * nic) AS BIGINT) AS s2
        |          FROM cnt GROUP BY item_id),
        |kept AS (SELECT * FROM items WHERE m >= 2 AND m <= 8),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |          CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_values,
        |          CAST(COALESCE(SUM((m * m - s2) * (420 // (m - 1))), 0)
        |            AS BIGINT) AS do_scaled
        |        FROM kept),
        |drp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items_dropped
        |        FROM items WHERE m < 2 OR m > 8),
        |marg AS (SELECT CAST(COALESCE(SUM(nc * nc), 0) AS BIGINT) AS sc2
        |         FROM (SELECT c.event_type, CAST(SUM(c.nic) AS BIGINT) AS nc
        |               FROM cnt c JOIN kept k USING (item_id)
        |               GROUP BY c.event_type))
        |SELECT n_items, n_items_dropped, n_values, do_scaled,
        |  n_values * n_values - sc2 AS de_num,
        |  420 * (n_values * n_values - sc2) - do_scaled * (n_values - 1)
        |    AS alpha_num,
        |  420 * (n_values * n_values - sc2) AS alpha_den
        |FROM tot CROSS JOIN drp CROSS JOIN marg""".stripMargin,

    // Step-for-step mirror of Mixture.waterfill (same rank order, same
    // prefix frame, same CASE guards); every column CAST BIGINT because
    // DuckDB widens SUM to HUGEINT.
    "q_mix_budget" -> mixPlanSql,

    // Integer-√ weights with the one-step correction, HUGEINT quotient/
    // remainder (≡ Spark's DECIMAL(38,0) div/%), largest-remainder
    // ranked (rem desc, source asc).
    "q_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY source),
        |w0 AS (SELECT source, n_docs,
        |         CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s0
        |       FROM c),
        |w1 AS (SELECT source, n_docs,
        |         CASE WHEN s0 * s0 > n_docs THEN s0 - 1
        |              WHEN (s0 + 1) * (s0 + 1) <= n_docs THEN s0 + 1
        |              ELSE s0 END AS w
        |       FROM w0),
        |w2 AS (SELECT * FROM w1 WHERE w > 0),
        |t AS (SELECT *, SUM(w) OVER () AS wsum FROM w2),
        |q AS (SELECT source, n_docs, w,
        |        CAST(CAST(w AS HUGEINT) * 1000000 // wsum AS BIGINT) AS quota,
        |        CAST(CAST(w AS HUGEINT) * 1000000 % wsum AS BIGINT) AS rem
        |      FROM t),
        |l AS (SELECT *, 1000000 - SUM(quota) OVER () AS leftover,
        |        row_number() OVER (ORDER BY rem DESC, source ASC) AS rr
        |      FROM q)
        |SELECT source, n_docs, w,
        |  CAST(quota + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM l""".stripMargin,

    // Plan applied as the per-source integer hash cut (printf('%04x')
    // == Spark's format_string — both C-style lowercase), fully-capped
    // sources kept wholesale, realization audited in basis points.
    "q_mix_apply" ->
      s"""WITH plan AS ($mixPlanSql),
         |k AS (
         |  SELECT d.source, d.n_chars, p.alloc, p.cap, p.toks
         |  FROM documents d JOIN plan p USING (source)
         |  WHERE p.alloc = p.cap
         |     OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
         |        < printf('%04x', (p.alloc * 65536) // p.cap)
         |)
         |SELECT source, CAST(MIN(alloc) AS BIGINT) AS alloc,
         |  COUNT(*) AS n_kept,
         |  CAST(SUM(n_chars) AS BIGINT) AS kept_toks,
         |  CAST(SUM(n_chars) AS BIGINT) * 10000 // CAST(MIN(toks) AS BIGINT)
         |    AS realized_bp
         |FROM k GROUP BY source""".stripMargin,

    "q_tfidf" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk WHERE tok <> ''
         |       GROUP BY doc_id, tok),
         |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         |nn AS (SELECT COUNT(*) AS n_docs FROM documents),
         |s AS (SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
         |        CAST(tf.tf * nn.n_docs AS DOUBLE) / dfreq.df AS score
         |      FROM tf JOIN dfreq USING (tok) CROSS JOIN nn),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |                ORDER BY score DESC, tok ASC) AS rk FROM s)
         |SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         |  score, rk FROM r WHERE rk <= 3""".stripMargin,

    "q_pii_redact" ->
      s"""WITH l AS (
         |  SELECT event_id,
         |    'user u' || CAST(user_id AS VARCHAR) || ' contact u' ||
         |    CAST(user_id AS VARCHAR) || '@example.com ref ' ||
         |    CAST(event_id * 7919 AS VARCHAR) || ' done' AS text
         |  FROM events
         |)
         |SELECT event_id,
         |  len(regexp_extract_all(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
         |  len(regexp_extract_all(text, '[0-9]{4,}')) AS n_digit_runs,
         |  md5(regexp_replace(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '[0-9]{4,}', '<NUM>', 'g')) AS redacted_fp
         |FROM l""".stripMargin,

    "q_stratified_sample" ->
      s"""WITH k AS (
         |  SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h FROM documents
         |), kept AS (
         |  SELECT * FROM k
         |  WHERE $stratCase
         |)
         |SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_id,
         |  MAX(doc_id) AS max_id
         |FROM kept GROUP BY lang""".stripMargin,

    // Mirrors balancedMixture: same md5 key, same integer threshold
    // rendered as 5-char lowercase hex, same widened string compare.
    "q_mixture_sample" ->
      """WITH c AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang
        |), m AS (SELECT MIN(n_docs) AS min_n FROM c),
        |k AS (
        |  SELECT d.lang, c.n_docs,
        |    ('0' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
        |      < lpad(lower(to_hex(m.min_n * 65536 // c.n_docs)), 5, '0')
        |      AS keep
        |  FROM documents d
        |  JOIN c USING (lang)
        |  CROSS JOIN m
        |)
        |SELECT lang, MAX(n_docs) AS n_docs,
        |  CAST(COUNT(*) FILTER (keep) AS BIGINT) AS n_kept
        |FROM k GROUP BY lang""".stripMargin,

    "q_quota_sample" ->
      """WITH k AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
        |  FROM documents
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |                               ORDER BY h, doc_id) AS rn
        |  FROM k
        |)
        |SELECT doc_id, lang, source, n_chars FROM r WHERE rn <= 40""".stripMargin,

    "q_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, greatest(1, n_chars // 200) AS w FROM documents
        |), t AS (
        |  SELECT doc_id, w, unnest(generate_series(0, w - 1)) AS j FROM w
        |), d AS (
        |  SELECT doc_id, CAST(MAX(w) AS BIGINT) AS weight,
        |    MIN(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(j AS VARCHAR))) AS draw_key
        |  FROM t GROUP BY doc_id
        |)
        |SELECT doc_id, weight, draw_key FROM d
        |ORDER BY draw_key, doc_id LIMIT 100""".stripMargin,

    "q_repetition" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tk WHERE tok <> ''
         |      GROUP BY doc_id, tok),
         |r AS (SELECT doc_id, tok, cnt,
         |        SUM(cnt) OVER (PARTITION BY doc_id) AS n_tokens,
         |        COUNT(*) OVER (PARTITION BY doc_id) AS n_distinct_tokens,
         |        row_number() OVER (PARTITION BY doc_id
         |          ORDER BY cnt DESC, tok ASC) AS rk
         |      FROM c)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
         |  tok AS top_tok, cnt AS top_cnt,
         |  CAST(cnt AS DOUBLE) / n_tokens AS top_ratio
         |FROM r WHERE rk = 1""".stripMargin,

    "q_gopher_rep" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter($toksSql, x -> x <> '') AS tk
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, tk,
         |    CAST(length(array_to_string(tk, ' ')) AS BIGINT) AS den
         |  FROM t WHERE length(array_to_string(tk, ' ')) > 0),
         |g AS (
         |  SELECT doc_id, den, n, array_to_string(tk[i:i+n-1], ' ') AS gram
         |  FROM d
         |  CROSS JOIN (VALUES (2),(3),(4),(5)) AS v(n)
         |  CROSS JOIN UNNEST(CASE WHEN len(tk) >= n
         |    THEN generate_series(1, len(tk)-n+1)
         |    ELSE CAST([] AS BIGINT[]) END) AS u(i)),
         |c AS (
         |  SELECT doc_id, den, n, gram, COUNT(*) AS cnt,
         |    COUNT(*) * length(gram) AS chars
         |  FROM g GROUP BY doc_id, den, n, gram),
         |p AS (
         |  SELECT doc_id, den, n, chars, cnt,
         |    row_number() OVER (PARTITION BY doc_id, n
         |      ORDER BY cnt DESC, gram ASC) AS rk,
         |    SUM(CASE WHEN cnt >= 2 THEN chars ELSE 0 END)
         |      OVER (PARTITION BY doc_id, n) AS dupc
         |  FROM c),
         |agg AS (
         |  SELECT doc_id,
         |    MAX(CASE WHEN n = 2 AND rk = 1 THEN chars END) AS p2,
         |    MAX(CASE WHEN n = 3 AND rk = 1 THEN chars END) AS p3,
         |    MAX(CASE WHEN n = 4 AND rk = 1 THEN chars END) AS p4,
         |    MAX(CASE WHEN n = 5 THEN dupc END) AS p5
         |  FROM p GROUP BY doc_id)
         |SELECT d.doc_id, d.den,
         |  CAST(COALESCE(p2, 0) AS BIGINT) AS top2_chars,
         |  CAST(COALESCE(p3, 0) AS BIGINT) AS top3_chars,
         |  CAST(COALESCE(p4, 0) AS BIGINT) AS top4_chars,
         |  CAST(COALESCE(p5, 0) AS BIGINT) AS dup5_chars,
         |  CAST(COALESCE(p2, 0) AS DOUBLE) / d.den AS top2_ratio,
         |  CAST(COALESCE(p5, 0) AS DOUBLE) / d.den AS dup5_ratio
         |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin,

    "q_contamination" ->
      s"""WITH $gram5Sql
         |SELECT a.doc_id,
         |  COUNT(DISTINCT a.shingle) AS n_shared_grams,
         |  COUNT(DISTINCT b.doc_id) AS n_bench_docs
         |FROM (SELECT * FROM sh WHERE split = 'train') a
         |JOIN (SELECT * FROM sh WHERE split = 'val') b ON a.shingle = b.shingle
         |GROUP BY a.doc_id""".stripMargin,

    "q_seq_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents
         |), c AS (
         |  SELECT doc_id, n_tok,
         |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_off
         |  FROM t
         |)
         |SELECT start_off // 2048 AS bin, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         |FROM c GROUP BY 1""".stripMargin,

    "q_text_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents
         |), n AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks FROM t
         |), x AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(0,
         |      CAST(greatest(0, (n_toks - 64 + 47) // 48) AS BIGINT))) AS chunk_id
         |  FROM n
         |)
         |SELECT doc_id, chunk_id,
         |  CAST(len(toks[(chunk_id*48+1):(chunk_id*48+64)]) AS BIGINT)
         |    AS n_chunk_toks,
         |  md5(array_to_string(toks[(chunk_id*48+1):(chunk_id*48+64)], ' '))
         |    AS chunk_fp
         |FROM x""".stripMargin,

    // Same integer bit tricks as the Spark side: ceiling power of two
    // via 1 << length(bin(n-1)), utilization in integer basis points.
    "q_padding_waste" ->
      s"""WITH n0 AS (
         |  SELECT CAST(len($toksSql) AS BIGINT) AS n FROM documents
         |), b AS (
         |  SELECT n, CASE WHEN n <= 16 THEN CAST(16 AS BIGINT)
         |    ELSE (CAST(1 AS BIGINT) << length(bin(n - 1))) END AS bucket
         |  FROM n0
         |)
         |SELECT bucket, COUNT(*) AS n_seqs,
         |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
         |  CAST(SUM(bucket - n) AS BIGINT) AS sum_padding,
         |  (CAST(SUM(n) AS BIGINT) * 10000) // (COUNT(*) * bucket)
         |    AS utilization_bp
         |FROM b GROUP BY bucket""".stripMargin,

    "q_kmeans" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id, i - 1 AS pos,
        |        CAST(floor(v[i] * 1000) AS BIGINT) AS qv
        |      FROM (SELECT vec_id, v, unnest(generate_series(1, 64)) AS i FROM e)),
        |seed_ids AS (SELECT vec_id AS cid FROM embeddings ORDER BY vec_id LIMIT 4),
        |cq AS (SELECT s.cid, q.pos, q.qv AS qc FROM seed_ids s
        |       JOIN q ON q.vec_id = s.cid),
        |a1 AS (SELECT v.vec_id, c.cid,
        |         SUM((v.qv - c.qc) * (v.qv - c.qc)) AS dist
        |       FROM q v JOIN cq c USING (pos) GROUP BY v.vec_id, c.cid),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |         ORDER BY dist ASC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id, cid FROM r1 WHERE rn = 1),
        |sums AS (SELECT a.cid, v.pos, CAST(SUM(v.qv) AS BIGINT) AS s,
        |           COUNT(*) AS n
        |         FROM q v JOIN asg1 a USING (vec_id) GROUP BY a.cid, v.pos),
        |a2 AS (SELECT v.vec_id, s.cid,
        |         CAST(SUM((s.n * v.qv - s.s) * (s.n * v.qv - s.s)) AS DOUBLE)
        |           / (MAX(s.n) * MAX(s.n)) AS dist
        |       FROM q v JOIN sums s USING (pos) GROUP BY v.vec_id, s.cid),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |         ORDER BY dist ASC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id, cid FROM r2 WHERE rn = 1)
        |SELECT cid AS cluster_id, COUNT(*) AS n_members,
        |  MIN(vec_id) AS min_id, MAX(vec_id) AS max_id
        |FROM asg2 GROUP BY cid""".stripMargin,

    // Independent formulation on purpose: the oracle states skyline as
    // the O(n²) NOT EXISTS dominance definition, so it checks the
    // distributed running-max plan against the SEMANTICS, not against a
    // mirror of the plan. Logit CTE = q_quality_logit's (TextQueries).
    "q_skyline" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter($toksSql, t -> t <> '') AS toks
         |  FROM documents
         |), w AS (
         |  SELECT doc_id,
         |    list_transform(toks, t ->
         |      ((list_reduce(list_transform(generate_series(1, length(t)),
         |            i -> CAST(ascii(substr(t, i, 1)) AS BIGINT)),
         |          (acc, c) -> (acc * 31 + c) % 1000000007) % 256)
         |        * 2654435761) % 2003 - 1001) AS ws
         |  FROM t
         |), lg AS (
         |  SELECT doc_id, CAST(COALESCE(list_sum(ws), 0) AS BIGINT) AS logit
         |  FROM w
         |), pts AS (
         |  SELECT d.doc_id, d.n_chars, lg.logit
         |  FROM documents d JOIN lg USING (doc_id)
         |)
         |SELECT p.doc_id, p.n_chars, p.logit FROM pts p
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM pts o
         |  WHERE o.n_chars <= p.n_chars AND o.logit >= p.logit
         |    AND (o.n_chars < p.n_chars OR o.logit > p.logit))""".stripMargin,

    // Logit CTE from q_quality_logit + label CTE from q_corpus_curation,
    // binned with the positive-offset integer div.
    "q_calibration" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter($toksSql, t -> t <> '') AS toks
         |  FROM documents
         |), w AS (
         |  SELECT doc_id,
         |    list_transform(toks, t ->
         |      ((list_reduce(list_transform(generate_series(1, length(t)),
         |            i -> CAST(ascii(substr(t, i, 1)) AS BIGINT)),
         |          (acc, c) -> (acc * 31 + c) % 1000000007) % 256)
         |        * 2654435761) % 2003 - 1001) AS ws
         |  FROM t
         |), lg AS (
         |  SELECT doc_id, CAST(COALESCE(list_sum(ws), 0) AS BIGINT) AS logit
         |  FROM w
         |), st AS (
         |  SELECT doc_id,
         |    length(text) AS n_chars,
         |    len($toksSql) AS n_tokens,
         |    len(list_distinct($toksSql)) AS n_distinct_tokens,
         |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
         |  FROM documents
         |), lab AS (
         |  SELECT doc_id,
         |    CASE WHEN quality <> 'low' THEN 1 ELSE 0 END AS pos
         |  FROM (SELECT doc_id,
         |          CASE WHEN n_distinct_tokens / n_tokens >= 0.5
         |                 AND n_chars / n_tokens >= 3
         |                 AND n_punct / n_chars < 0.1 THEN 'high'
         |               WHEN n_distinct_tokens / n_tokens >= 0.25 THEN 'medium'
         |               ELSE 'low' END AS quality
         |        FROM st WHERE n_tokens > 0)
         |), b AS (
         |  SELECT (lg.logit + 1099511627776) // 2000 AS bin, lg.logit, lab.pos
         |  FROM lg JOIN lab USING (doc_id)
         |)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(pos) AS BIGINT) AS n_pos,
         |  MIN(logit) AS min_logit, MAX(logit) AS max_logit,
         |  CAST(SUM(pos) AS BIGINT) * 1000 // COUNT(*) AS pos_permille
         |FROM b GROUP BY bin""".stripMargin
  )
}
