package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Deduplication queries (SURVEY.md §2.3 E1/E2) over `documents`, each
  * with a full DuckDB oracle — including MinHash+LSH and SimHash, whose
  * md5-based hashing was chosen precisely so an ANSI-SQL oracle can
  * reproduce them bit-for-bit.
  */
object DedupQueries {

  val queries: Map[String, Q] = Map(
    // E1 exact hash-dedup. The fixture texts are all distinct, so the
    // input is the table unioned with itself — every group must collapse
    // to n_copies=2, proving the collapse actually happened.
    "q_dedup_exact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.exactByContent(docs.unionByName(docs), "text", "doc_id")
    }),

    // E2 MinHash → LSH banding → exact-Jaccard verify (8 bands × 2 rows,
    // word 3-gram shingles, threshold 0.5).
    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashNearDuplicates(Tables.documents(s, d), "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)),

    // E2 SimHash signatures (32-bit, token votes).
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhash(Tables.documents(s, d), "text", "doc_id")),

    // E2 char-12-gram Jaccard near-dup: character shingles catch
    // within-word edits the word pipeline misses. Shingle length and
    // band sharpness matter at scale: 5-grams over a small shared
    // vocabulary made EVERY doc pair an LSH candidate (measured: the
    // sf0.1 candidate set went quadratic); 12-gram shingles (~2 words)
    // with 8×2 bands keep baseline collision near zero while true
    // near-dups (Jaccard ≥ 0.8) still agree on whole bands.
    "q_ngram_jaccard" -> ((s, d) => {
      // native single-loop profile (CharMinHashProfile) — value-identical
      // to dedupProfiles(rawCharShingles(…)) but without materializing
      // the ~|text|-rows-per-doc shingle explode (MinHashProfileSpec
      // pins the equality; the oracle below still mirrors the
      // compositional form)
      val profiles = Dedup.charDedupProfiles(
        Tables.documents(s, d), "text", "doc_id", 12,
        bands = 8, rowsPerBand = 2).persist()
      val cands = Dedup.profileCandidatePairs(profiles, "doc_id")
      // broadcastCandidates: the pair list is bounded by duplicate
      // structure (banding keeps baseline collisions near zero — the
      // 12-gram/8×2 sizing above), so pinning the joins' build side
      // removes the measured AQE borderline flip (r13: 0 vs 18 MB
      // shuffle, 4× CPU, pass-to-pass on identical code) instead of
      // gambling on stage-completion order each run.
      // FAILURE MODE if the bound is ever wrong (r13 ADVICE): the
      // second pin broadcasts candidates ALREADY JOINED with set_a —
      // pair rows carrying full shingle-set arrays — so a corpus whose
      // banding degenerates (tiny shared vocabulary, see the sizing
      // note above) surfaces as a broadcast-size/OOM error on THIS
      // query's second join, not anywhere near jaccardFromProfiles.
      // A count()-based runtime guard would add a full extra job to
      // the hot path per run; the bound is instead auditable offline
      // via q_lsh_bucket_audit (bucket sizes) and q_minhash_error.
      graft.core.CacheScope.releaseAfterUse(
        Dedup.jaccardFromProfiles(profiles, cands, "doc_id",
          broadcastCandidates = true)
          .filter(col("jaccard") >= 0.8),
        profiles)
    }),

    // E2 EXACT similarity join (PPJoin-family prefix filtering):
    // provably ALL pairs with char-12-gram Jaccard ≥ 0.8 — the
    // zero-false-negative counterpart to q_ngram_jaccard's LSH (whose
    // banding can miss true pairs). The oracle is the brute
    // all-co-occurring-pairs join, so a hash match PROVES the prefix
    // pruning (100× fewer candidates at sf0.1) lost nothing.
    "q_prefix_join" -> ((s, d) =>
      Dedup.prefixJaccardJoin(Tables.documents(s, d), "text", "doc_id",
        shingleSize = 12, tNum = 8, tDen = 10)),

    // Recall accounting for the prefix join's hot-bucket cap: per-doc
    // prefix length, cap events at maxPrefixDf = 1 (any shingle shared
    // by >= 2 docs is "hot" — the fixture's duplicated docs trip it),
    // and the fully_capped verdict naming docs the capped candidate
    // index can no longer see. The cap trades provable recall for skew
    // safety; this query is the observability side of that trade.
    "q_prefix_cap_audit" -> ((s, d) =>
      Dedup.prefixJoinCapAudit(Tables.documents(s, d), "text", "doc_id",
          shingleSize = 12, tNum = 8, tDen = 10, maxPrefixDf = 1L)
        .filter(col("n_capped") > 0)),

    // Similarity-coefficient suite over the exact (prefix-filtered)
    // pair set at a looser 0.7 cut: Jaccard, Dice and overlap
    // (containment-of-the-smaller) from the same (n_inter, n_a, n_b)
    // integers — one pass, three coefficients, each a single
    // deterministic division. The practical read: overlap >> jaccard
    // flags subset/quotation pairs that a symmetric threshold hides.
    // Runs on the even-doc half-corpus: the full-corpus exactness
    // proof is q_prefix_join's job; this query's contract is the
    // coefficient algebra, and the slice keeps the second run of the
    // shared prefix pipeline off the bench's critical path.
    "q_sim_coeffs" -> ((s, d) =>
      Dedup.prefixJaccardJoin(
          Tables.documents(s, d).filter(col("doc_id") % 2 === 0),
          "text", "doc_id", shingleSize = 12, tNum = 7, tDen = 10)
        .select(col("id_a"), col("id_b"), col("n_inter"),
          col("jaccard"),
          (col("n_inter") * 2 / (col("n_a") + col("n_b"))).as("dice"),
          (col("n_inter") / least(col("n_a"), col("n_b"))).as("overlap"))),

    // E2 SimHash near-dup pairs: byte-band bucketing (pigeonhole-exact
    // for hamming ≤ 3) + hamming verify.
    "q_simhash_pairs" -> ((s, d) =>
      Dedup.simhashNearDuplicates(Tables.documents(s, d), "text", "doc_id",
        maxHamming = 3)),

    // Pairs → CLUSTERS: transitive closure over the verified near-dup
    // graph (a~b, b~c collapse into one component even when a~c never
    // became a candidate), label-propagated to fixpoint; per-cluster
    // membership rollup. Oracle = recursive CTE reachability.
    "q_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.minhashNearDuplicates(Tables.documents(s, d), "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      Dedup.connectedComponents(pairs, "doc_id")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_id"))
    }),

    // WEIGHTED (generalized) Jaccard at 0.5: multiplicity-aware
    // near-dup detection — Σ min(tf)/Σ max(tf) separates true
    // near-dups from topic siblings that share a vocabulary at
    // different proportions. Candidates via the df ≤ 100 token join
    // (stopword cap), verify over ALL common tokens.
    "q_weighted_jaccard" -> ((s, d) =>
      Dedup.weightedJaccardPairs(Tables.documents(s, d), "text", "doc_id",
        maxDf = 100L, tNum = 1, tDen = 2)),

    // PERCEPTUAL image dedup: 9×8 grayscale BMPs built per document
    // (4-member classes around doc_id/4, each member perturbing one
    // deterministic cell), dHashed through the REAL encode→decode→hash
    // path by the native expression, then paired by the EXACT 4-band
    // Hamming join (pigeonhole: distance ≤ 3 ⇒ some 16-bit band
    // matches). The oracle replays the hash from the raw pixel
    // FORMULAS — a hash match proves decode∘encode is the identity
    // all the way through the gradient bits.
    "q_phash_dedup" -> ((s, d) => {
      import s.implicits._
      // spreadByKey before the opaque Dataset.map (r15): the BMP
      // synthesis + dHash decode is per-row CPU the optimizer cannot
      // see; on the single-split scan it all ran in one task.
      val imgs = graft.operators.spreadByKey(
          Tables.documents(s, d).select(col("doc_id")), col("doc_id"))
        .as[Long]
        .map { id =>
          val base = id / 4
          val m = (id % 4).toInt
          val px = Array.tabulate(72) { p =>
            val r = p / 9
            val c = p % 9
            val g0 = ((base * 31 + r * 13 + c * 29) % 256).toInt
            val g = if (p == (m * 17) % 72) ((g0 + m * 40) % 256) else g0
            (g, g, g) // gray pixel: ITU-R 601 luma of (g,g,g) is g
          }
          (id, graft.functions.BmpPixelStats.bmpBytes(9, 8, px))
        }.toDF("doc_id", "payload")
      val hashed = imgs.select(col("doc_id"),
          graft.functions.ImageDHash.imageDHash(col("payload")).as("h"))
        .select(col("doc_id"), col("h.hash_hi").as("hash_hi"),
          col("h.hash_lo").as("hash_lo"))
      Dedup.hammingNearDuplicates(hashed, "doc_id", "hash_hi", "hash_lo",
        maxHamming = 3)
    }),

    // INCREMENTAL closure: the LSH pair set split into two hash
    // batches; batch A is closed into components, then batch B's pairs
    // fold into those LABELS (not A's raw pairs) via
    // incrementalComponents. The oracle is the recursive CTE over the
    // FULL pair set — a hash match PROVES incremental ≡ from-scratch.
    "q_cc_incremental" -> ((s, d) => {
      val pairs = Dedup.minhashNearDuplicates(Tables.documents(s, d), "text",
        "doc_id", shingleSize = 3, bands = 8, rowsPerBand = 2,
        threshold = 0.5).persist()
      val oldBatch = pairs.filter((col("id_a") + col("id_b")) % 2 === 0)
      val newBatch = pairs.filter((col("id_a") + col("id_b")) % 2 === 1)
      val oldLabels = Dedup.connectedComponents(oldBatch, "doc_id")
      val out = Dedup.incrementalComponents(oldLabels, newBatch, "doc_id")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_id"))
      graft.core.CacheScope.releaseAfterUse(out, pairs)
    }),

    // Chaining audit: exact Jaccard of EVERY member pair inside each
    // CC cluster (zero-overlap pairs included — they ARE the chained
    // evidence), min + verdict per cluster. The measurement that
    // decides whether transitive closure can be trusted at the chosen
    // threshold/banding; see Dedup.chainAudit.
    "q_chain_audit" -> ((s, d) =>
      Dedup.chainAudit(Tables.documents(s, d), "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5,
        thresholdBp = 5000L)),

    // Same clusters via the alternating large-star/small-star
    // contraction (the O(log d) high-diameter path) — identical output
    // contract to q_dedup_clusters, so the two CC algorithms are
    // cross-checked against one oracle through the driver gate, not
    // just in-process specs.
    "q_dedup_clusters_star" -> ((s, d) => {
      val pairs = Dedup.minhashNearDuplicates(Tables.documents(s, d), "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      Dedup.connectedComponentsStar(pairs, "doc_id")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_id"))
    }),

    // The hot-bucket recall audit: the (band, sig) LSH buckets a
    // maxBucketSize cap of 1 would silence, with their widths — what a
    // pipeline operator inspects BEFORE trading recall for the
    // quadratic-blowup bound (every bucket here is a candidate
    // generator; a capped run drops exactly these).
    "q_lsh_bucket_audit" -> ((s, d) => {
      // persist is NOT for multi-consumption here (one consumer): it is
      // the barrier that stops InferFiltersFromGenerate's size(...)>0
      // filter from being pushdown-substituted below the projection —
      // without it the inferred filter evaluates word_minhash_profile
      // 16× per row at the scan (measured 9× wall: 1.1s → 10.3s).
      val profiles = Dedup.wordDedupProfiles(
        Tables.documents(s, d), "text", "doc_id", 3, bands = 8, rowsPerBand = 2)
        .persist()
      val sigs = profiles.select(col("doc_id"), explode(col("band_sigs")).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      graft.core.CacheScope.releaseAfterUse(
        Dedup.oversizedBuckets(sigs, cap = 1)
          .select(col("band").cast("long").as("band"), col("sig"), col("bucket_n")),
        profiles)
    }),

    // End of the near-dup pipeline: materialize the cleaned corpus via
    // anti-join against the verified pairs (smallest id survives).
    // Sketch-accuracy audit: signature-estimated similarity vs exact
    // Jaccard ingredients per LSH candidate pair, all integers (the
    // q_ann_recall twin for the text pipeline).
    "q_minhash_error" -> ((s, d) =>
      Dedup.minhashErrorAudit(Tables.documents(s, d), "text", "doc_id",
        n = 3, bands = 8, rowsPerBand = 2)),

    // Sketch-threshold tuning curve: the same audit rolled up by
    // signature-agreement level — per est_slots, how many candidate
    // pairs exist and how many exactly clear Jaccard 0.5/0.7/0.8
    // (integer cross-multiplied, never a float division). This is the
    // table an operator reads to PICK the dedup threshold: precision
    // per sketch level, before committing a 100 TB pass to it. Cost:
    // one |pairs|-keyed aggregate over the audit frame — the LSH
    // pipeline itself is the dominant (and already banded) term.
    "q_threshold_sweep" -> ((s, d) =>
      Dedup.minhashErrorAudit(Tables.documents(s, d), "text", "doc_id",
          n = 3, bands = 8, rowsPerBand = 2)
        .groupBy(col("est_slots"))
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("n_inter") * 2 >= col("n_union"), 1)).as("pass_050"),
          count(when(col("n_inter") * 10 >= col("n_union") * 7, 1)).as("pass_070"),
          count(when(col("n_inter") * 5 >= col("n_union") * 4, 1)).as("pass_080"))),

    "q_dedup_materialize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      Dedup.dropNearDuplicates(docs, pairs, "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),

    // Cluster-exact materialization: one survivor per connected
    // component (vs q_dedup_materialize's pairwise id_b drop — the two
    // differ on transitive shapes like (a,c),(b,c)).
    "q_cluster_reps" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      Dedup.clusterRepresentatives(docs, pairs, "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),

    // Quality-aware survivorship: per cluster keep the LONGEST member
    // (ties → least id), the policy real curation uses instead of
    // "first crawled wins".
    "q_cluster_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      Dedup.clusterSurvivors(docs, pairs, "doc_id", "n_chars")
    }),

    // Leakage-safe train/val split: the split unit is the near-dup
    // CLUSTER, not the document — hash-splitting doc ids sends
    // near-duplicates across the boundary and the val set stops
    // measuring generalization. Singleton docs are their own cluster
    // (left join + coalesce). The naive_leak_pairs column quantifies
    // exactly the damage the doc-level split would have done: verified
    // near-dup pairs whose endpoints hash to different splits.
    "q_leakage_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // the pair pipeline (shingle → LSH → verify) feeds THREE readers
      // (CC's edge build, the naive-leak audit) — persist it once or
      // the whole LSH stack re-executes per reader
      val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5).persist()
      val cc = Dedup.connectedComponents(pairs, "doc_id")
      val tagged = docs.select(col("doc_id"))
        .join(cc, Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
        .withColumn("split",
          graft.operators.Sampling.splitTag(col("component"), 0.9))
      val naiveLeaks = pairs
        .filter(graft.operators.Sampling.splitTag(col("id_a"), 0.9) =!=
          graft.operators.Sampling.splitTag(col("id_b"), 0.9))
        .agg(count(lit(1)).as("naive_leak_pairs"))
      graft.core.CacheScope.releaseAfterUse(
        tagged.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            count_distinct(col("component")).as("n_clusters"))
          .crossJoin(broadcast(naiveLeaks)),
        pairs)
    }),

    // Asymmetric containment over LSH candidates: catches short-doc-
    // quoted-in-long-doc shapes whose Jaccard stays low. Keep pairs
    // where either side is ≥70% contained in the other.
    "q_containment" -> ((s, d) => {
      val profiles = Dedup.wordDedupProfiles(
        Tables.documents(s, d), "text", "doc_id", 3, bands = 8, rowsPerBand = 2).persist()
      val cands = Dedup.profileCandidatePairs(profiles, "doc_id")
      graft.core.CacheScope.releaseAfterUse(
        Dedup.containmentFromProfiles(profiles, cands, "doc_id")
          .filter(greatest(col("containment_a"), col("containment_b")) >= 0.7),
        profiles)
    }),

    // Incremental dedup: LSH the 10% "new batch" (hash split) against
    // the 90% reference corpus — cross-corpus candidates only, Jaccard
    // verify. The production shape: reference signatures are computed
    // once at ingest; each arriving batch pays only its own shingling.
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("split", graft.operators.Sampling.splitTag(col("doc_id"), 0.9))
      val profiles = Dedup.wordDedupProfiles(
        docs, "text", "doc_id", 3, bands = 8, rowsPerBand = 2)
        .join(docs.select(col("doc_id"), col("split")), Seq("doc_id"))
        .persist()
      val cands = Dedup.crossCorpusCandidates(
        profiles.filter(col("split") === "val"),
        profiles.filter(col("split") === "train"), "doc_id")
      graft.core.CacheScope.releaseAfterUse(
        Dedup.jaccardFromProfiles(profiles, cands, "doc_id")
          .filter(col("jaccard") >= 0.5)
          .select(col("id_a").as("new_id"), col("id_b").as("ref_id"),
            col("jaccard")),
        profiles)
    }),

    // Duplicate-n-gram coverage: per-doc share of distinct word 5-grams
    // that some OTHER document also contains — the corpus-overlap
    // quality signal exact-substring dedup reports. Two linear shuffles,
    // no pairs; see Dedup.dupNgramCoverage for the md5-compressed
    // shingle identity that keeps shuffle bytes bounded.
    // Temporal novelty: share of each doc's 5-grams NOT already carried
    // by an earlier-arriving doc (id order = arrival) — the
    // diminishing-returns curve for a crawl source. No joins: one
    // gram-keyed window min + doc rollup; see Dedup.ngramNovelty.
    "q_ngram_novelty" -> ((s, d) =>
      Dedup.ngramNovelty(Tables.documents(s, d), "text", "doc_id", n = 5)),

    "q_dup_ngram_coverage" -> ((s, d) =>
      Dedup.dupNgramCoverage(Tables.documents(s, d), "text", "doc_id", n = 5)),

    // Cross-source overlap matrix: exact pairwise shingle-set Jaccard
    // between provenance sources — the "do I already have this corpus?"
    // acquisition dashboard. Shingle-keyed self-join, |sources|²-bounded
    // pair aggregate; see Dedup.sourceOverlapMatrix.
    "q_source_overlap" -> ((s, d) =>
      Dedup.sourceOverlapMatrix(Tables.documents(s, d), "text", "doc_id",
        "source", n = 3)),

    // Exact-substring duplicate spans: alignment-free 0-mod-p window
    // fingerprinting (content-selected 40-char windows, poly-hash
    // thinning ×8, match = the window STRING itself) — catches copied
    // paragraphs the whole-doc MinHash family cannot see. See
    // Dedup.exactSubstringPairs for the survival-probability argument.
    "q_substring_dup" -> ((s, d) =>
      Dedup.exactSubstringPairs(Tables.documents(s, d), "text", "doc_id",
        k = 40, p = 8, maxDf = 50)),

    // Winnowing-fingerprint duplicate pairs (Schleimer et al.
    // SIGMOD'03): rightmost-min selection over 8-char window hashes in
    // windows of 4 — the GUARANTEED-gap alternative to q_substring_dup's
    // 0-mod-p thinning (any shared substring ≥ 11 chars yields a shared
    // fingerprint). Selection happens inside the native expression, so
    // only the ~2/(w+1) density survives to the exchange.
    "q_winnow_dup" -> ((s, d) =>
      Dedup.winnowDuplicates(Tables.documents(s, d), "text", "doc_id",
        k = 8, w = 4, maxDf = 20L, minShared = 2L)),

    // Soft dedup: keep every document, weight it by 1/|near-dup cluster|
    // in exact integer ppm — the reweight-instead-of-drop alternative a
    // training pipeline uses when duplicates carry signal. Same
    // MinHash/LSH + CC closure as q_dedup_clusters, so this also
    // cross-checks that machinery through a second output contract.
    "q_dedup_weights" -> ((s, d) =>
      Dedup.softDedupWeights(Tables.documents(s, d), "text", "doc_id",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)),

    // Bloom-filter incremental dedup screen: the batch (doc_id % 10 = 7)
    // probes a corpus-built k=2 Bloom filter (4096 bits) before the
    // exact verify; the summary row carries the full screen accounting
    // including exact false-positive counts and the structurally-zero
    // miss count — see Dedup.bloomScreenStats for the portable-bits
    // construction that lets DuckDB mirror the filter itself.
    "q_bloom_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.bloomScreenStats(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7),
        "text", "doc_id", mBits = 4096)
    }),

    // Heaps-law growth of the SHINGLE space by corpus prefix — the
    // capacity question behind every LSH deployment: how does the
    // distinct-shingle table (the dedup index's key domain) grow as
    // the corpus grows? Prefixes at 10/25/50/75/100% of the doc_id
    // range; per prefix the doc count, shingle-occurrence count and
    // distinct-shingle count, all exact integers. Cost: first-seen doc
    // per shingle (one shingle-keyed aggregate) + a 5-row broadcast —
    // the sublinearity (or not) of the last column against the middle
    // one IS the Heaps exponent a planner reads off this table.
    "q_heaps" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // persist: the shingle explode feeds two differently-keyed
      // aggregates (by shingle, by doc) with no exchange reuse between
      // them — uncached it runs twice. Cost-neutral at fixture scale
      // (measured 1.17 vs 1.20 s), decisive at corpus scale where the
      // explode dominates; scoped release via CacheScope.
      val sh = Dedup.wordShingles(docs, "text", "doc_id", 3).persist()
      val pcts = docs
        .agg(min(col("doc_id")).as("lo"),
          (max(col("doc_id")) - min(col("doc_id")) + 1).as("span"))
        .select(explode(array(Seq(10, 25, 50, 75, 100).map(lit): _*)).as("pct"),
          col("lo"), col("span"))
        .select(col("pct"), (col("lo") + expr("span * pct div 100")).as("cut"))
      val vocab = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("fd"))
        .crossJoin(broadcast(pcts))
        .filter(col("fd") < col("cut"))
        .groupBy(col("pct")).agg(count(lit(1)).as("distinct_shingles"))
      val result = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
        .crossJoin(broadcast(pcts))
        .filter(col("doc_id") < col("cut"))
        .groupBy(col("pct"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nsh")).as("n_occurrences"))
        .join(vocab, Seq("pct"))
        .select(col("pct").cast("long").as("pct"), col("n_docs"),
          col("n_occurrences"), col("distinct_shingles"))
      graft.core.CacheScope.releaseAfterUse(result, sh)
    }),

    // Edit-distance verification of LSH candidates — the fuzzy-dedup
    // complement to Jaccard (within-word edits vs set overlap). Both
    // engines compare the ASCII projection so byte-wise and
    // codepoint-wise Levenshtein implementations cannot disagree, and
    // the relative-distance cut is integer arithmetic (no division).
    "q_edit_distance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val profiles = Dedup.wordDedupProfiles(
        docs, "text", "doc_id", 3, bands = 8, rowsPerBand = 2).persist()
      val ascii = docs.select(col("doc_id"),
        regexp_replace(col("text"), "[^ -~]", "").as("atext"))
      graft.core.CacheScope.releaseAfterUse(
        Dedup.profileCandidatePairs(profiles, "doc_id")
          .join(ascii.select(col("doc_id").as("id_a"), col("atext").as("text_a")), Seq("id_a"))
          .join(ascii.select(col("doc_id").as("id_b"), col("atext").as("text_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_dist"),
            greatest(length(col("text_a")), length(col("text_b")))
              .cast("long").as("max_len"))
          .filter(col("edit_dist") * 10 <= col("max_len") * 3),
        profiles)
    })
  )

  /** Shared oracle fragments (tokenization must mirror Dedup.tokens). */
  private val toksSql = """string_split_regex(lower(trim(text)), '\s+')"""

  private val shinglesSql =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |gs AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-2)) AS g
       |       FROM t WHERE len(toks) >= 3),
       |sh AS (SELECT DISTINCT doc_id, toks[g]||' '||toks[g+1]||' '||toks[g+2] AS shingle
       |       FROM gs)""".stripMargin

  /** Word-shingle MinHash band signatures (shared prefix of every LSH
    * oracle: within-corpus pairs, edit-distance verify, incremental).
    */
  private val sigSql =
    s"""$shinglesSql,
       |hx AS (SELECT doc_id, shingle, unnest(generate_series(0, 15)) AS h FROM sh),
       |mh AS (SELECT doc_id, h,
       |         MIN(substr(md5((h // 4)||'|'||shingle), (h % 4) * 8 + 1, 8)) AS mh
       |       FROM hx GROUP BY doc_id, h),
       |sig AS (SELECT doc_id, h // 2 AS band,
       |          md5(string_agg(mh, '' ORDER BY h)) AS sig
       |        FROM mh GROUP BY doc_id, h // 2)""".stripMargin

  private val candSql =
    s"""$sigSql,
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM sig a JOIN sig b
       |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  /** Sketch-error audit body (candidate pairs with signature-agreement
    * slots and exact shingle intersection/union), shared by
    * q_minhash_error and its q_threshold_sweep rollup.
    */
  private val minhashErrorBodySql =
    s"""$candSql,
       |agree AS (SELECT c.id_a, c.id_b,
       |            CAST(COUNT(*) FILTER (x.mh = y.mh) AS BIGINT) AS est_slots
       |          FROM cand c
       |          JOIN mh x ON x.doc_id = c.id_a
       |          JOIN mh y ON y.doc_id = c.id_b AND y.h = x.h
       |          GROUP BY c.id_a, c.id_b),
       |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
       |          FROM cand c
       |          JOIN sh x ON x.doc_id = c.id_a
       |          JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
       |          GROUP BY c.id_a, c.id_b),
       |err AS (SELECT a.id_a, a.id_b, a.est_slots,
       |          COALESCE(i.n_inter, 0) AS n_inter,
       |          sx.n + sy.n - COALESCE(i.n_inter, 0) AS n_union
       |        FROM agree a
       |        LEFT JOIN inter i ON i.id_a = a.id_a AND i.id_b = a.id_b
       |        JOIN sz sx ON sx.doc_id = a.id_a
       |        JOIN sz sy ON sy.doc_id = a.id_b)""".stripMargin

  /** Full MinHash→LSH→Jaccard pair pipeline as a reusable WITH body. */
  private val minhashPairsSql =
    s"""$candSql,
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
       |          FROM cand c
       |          JOIN sh x ON x.doc_id = c.id_a
       |          JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
       |          GROUP BY c.id_a, c.id_b),
       |pairs AS (SELECT i.id_a, i.id_b,
       |            i.n_inter / (sx.n + sy.n - i.n_inter) AS jaccard
       |          FROM inter i
       |          JOIN sz sx ON sx.doc_id = i.id_a
       |          JOIN sz sy ON sy.doc_id = i.id_b
       |          WHERE i.n_inter / (sx.n + sy.n - i.n_inter) >= 0.5)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Mirrors ngramNovelty: distinct (doc, 5-gram), gram-level first
    // carrier, doc rollup; a gram is seen iff first_id < doc_id.
    "q_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |gs AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-4)) AS g
         |       FROM t WHERE len(toks) >= 5),
         |shs AS (SELECT DISTINCT doc_id,
         |          toks[g]||' '||toks[g+1]||' '||toks[g+2]||' '||
         |          toks[g+3]||' '||toks[g+4] AS sh
         |        FROM gs),
         |f AS (SELECT sh, MIN(doc_id) AS first_id FROM shs GROUP BY sh)
         |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(COUNT(*) FILTER (f.first_id < s.doc_id) AS BIGINT) AS n_seen,
         |  (CAST(COUNT(*) AS BIGINT)
         |    - CAST(COUNT(*) FILTER (f.first_id < s.doc_id) AS BIGINT)) * 10000
         |    // CAST(COUNT(*) AS BIGINT) AS novelty_bp
         |FROM shs s JOIN f USING (sh)
         |GROUP BY s.doc_id""".stripMargin,

    "q_dup_ngram_coverage" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |gs AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-4)) AS g
         |       FROM t WHERE len(toks) >= 5),
         |shs AS (SELECT DISTINCT doc_id,
         |          substr(md5(toks[g]||' '||toks[g+1]||' '||toks[g+2]||' '||
         |                     toks[g+3]||' '||toks[g+4]), 1, 16) AS h
         |        FROM gs),
         |f AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_docs FROM shs GROUP BY h)
         |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(COUNT(*) FILTER (f.n_docs > 1) AS BIGINT) AS n_dup_grams,
         |  CAST(COUNT(*) FILTER (f.n_docs > 1) AS BIGINT) * 1000 // COUNT(*)
         |    AS dup_permille
         |FROM shs s JOIN f USING (h)
         |GROUP BY s.doc_id""".stripMargin,

    // Mirrors sourceOverlapMatrix: distinct (source, 3-gram-md5) sets,
    // self-join on the shingle hash, integer-exact Jaccard in bp.
    "q_source_overlap" ->
      s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
         |gs AS (SELECT source, toks, unnest(generate_series(1, len(toks)-2)) AS g
         |       FROM t WHERE len(toks) >= 3),
         |shs AS (SELECT DISTINCT source,
         |          substr(md5(toks[g]||' '||toks[g+1]||' '||toks[g+2]), 1, 16) AS h
         |        FROM gs),
         |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_g FROM shs GROUP BY source),
         |i AS (SELECT a.source AS source_a, b.source AS source_b,
         |        CAST(COUNT(*) AS BIGINT) AS n_inter
         |      FROM shs a JOIN shs b USING (h)
         |      WHERE a.source < b.source GROUP BY 1, 2)
         |SELECT i.source_a, i.source_b, ca.n_g AS n_a, cb.n_g AS n_b, i.n_inter,
         |  ca.n_g + cb.n_g - i.n_inter AS n_union,
         |  i.n_inter * 10000 // (ca.n_g + cb.n_g - i.n_inter) AS jaccard_bp
         |FROM i JOIN c ca ON ca.source = i.source_a
         |       JOIN c cb ON cb.source = i.source_b""".stripMargin,

    // Mirrors exactSubstringPairs: same normalized text, same k=40
    // windows, same (acc·31+code) mod 1e9+7 selection fold, same
    // maxDf=50 hot-window cap; the join key is the window string.
    "q_substring_dup" ->
      raw"""WITH n AS (
         |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
         |  FROM documents),
         |w AS (
         |  SELECT doc_id, i, substr(t, CAST(i AS INT), 40) AS w
         |  FROM n CROSS JOIN UNNEST(CASE WHEN length(t) >= 40
         |      THEN generate_series(1, length(t) - 39)
         |      ELSE CAST([] AS BIGINT[]) END) AS u(i)),
         |f AS (
         |  SELECT doc_id, CAST(MIN(i) AS BIGINT) AS pos, w
         |  FROM w
         |  WHERE list_reduce(
         |    list_transform(generate_series(1, 40),
         |      j -> CAST(ascii(substr(w, CAST(j AS INT), 1)) AS BIGINT)),
         |    (acc, c) -> (acc * 31 + c) % 1000000007) % 8 = 0
         |  GROUP BY doc_id, w),
         |hot AS (SELECT w FROM f GROUP BY w HAVING COUNT(*) <= 50),
         |keep AS (SELECT f.* FROM f JOIN hot USING (w))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  COUNT(*) AS n_shared,
         |  MIN(a.pos) AS first_a, MIN(b.pos) AS first_b
         |FROM keep a JOIN keep b USING (w)
         |WHERE a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id""".stripMargin,

    // Replays the winnowing selection arithmetically: the mod-free
    // k=8 hash as one 8-term polynomial (int64-safe by the k <= 8
    // bound), the rightmost-min-per-window rule as a windowed MIN over
    // the HUGEINT encoding h·2²¹ + (2²¹−1−pos) — minimizing h then
    // maximizing pos — over frame [i, i+3], full windows only.
    "q_winnow_dup" ->
      raw"""WITH d AS (
         |  SELECT doc_id, text, length(text) - 7 AS p
         |  FROM documents WHERE length(text) >= 11),
         |h AS (
         |  SELECT doc_id, p, i,
         |    CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT) * 27512614111
         |    + CAST(unicode(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT) * 887503681
         |    + CAST(unicode(substr(text, CAST(i + 2 AS INT), 1)) AS BIGINT) * 28629151
         |    + CAST(unicode(substr(text, CAST(i + 3 AS INT), 1)) AS BIGINT) * 923521
         |    + CAST(unicode(substr(text, CAST(i + 4 AS INT), 1)) AS BIGINT) * 29791
         |    + CAST(unicode(substr(text, CAST(i + 5 AS INT), 1)) AS BIGINT) * 961
         |    + CAST(unicode(substr(text, CAST(i + 6 AS INT), 1)) AS BIGINT) * 31
         |    + CAST(unicode(substr(text, CAST(i + 7 AS INT), 1)) AS BIGINT) AS hv
         |  FROM d CROSS JOIN UNNEST(generate_series(1, p)) AS u(i)),
         |sel AS (
         |  SELECT doc_id, p, i,
         |    MIN(CAST(hv AS HUGEINT) * 2097152 + (2097151 - i))
         |      OVER (PARTITION BY doc_id ORDER BY i
         |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS key
         |  FROM h),
         |fp AS (
         |  SELECT DISTINCT doc_id, CAST(key // 2097152 AS BIGINT) AS hsel
         |  FROM sel WHERE i <= p - 3),
         |fr AS (SELECT hsel FROM fp GROUP BY hsel HAVING COUNT(*) <= 20),
         |k2 AS (SELECT fp.doc_id, fp.hsel FROM fp JOIN fr USING (hsel))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  COUNT(*) AS n_shared
         |FROM k2 a JOIN k2 b ON a.hsel = b.hsel AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin,

    // Same reach/comp closure as q_dedup_clusters; docs outside every
    // pair default to cluster_size 1 via the left joins.
    "q_dedup_weights" ->
      s"""WITH RECURSIVE $minhashPairsSql,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node
         |),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
         |csz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |        FROM comp GROUP BY component)
         |SELECT d.doc_id,
         |  COALESCE(csz.cluster_size, CAST(1 AS BIGINT)) AS cluster_size,
         |  CAST(1000000 // COALESCE(csz.cluster_size, CAST(1 AS BIGINT)) AS BIGINT)
         |    AS weight_ppm
         |FROM documents d
         |LEFT JOIN comp ON comp.node = d.doc_id
         |LEFT JOIN csz ON csz.component = comp.component""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |GROUP BY md5(text)""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $minhashPairsSql
         |SELECT id_a, id_b, jaccard FROM pairs""".stripMargin,

    "q_dedup_materialize" ->
      s"""WITH $minhashPairsSql
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id_b FROM pairs)""".stripMargin,

    // Slot agreement from the same mh table the band signatures are
    // built from; exact set counts from sh. LEFT JOIN + COALESCE keeps
    // zero-overlap candidate pairs (Spark's array_intersect gives 0).
    // The sh CTE is DISTINCT (doc_id, shingle) — exactly the
    // Dedup.wordShingles set the Spark side counts.
    "q_heaps" ->
      s"""WITH $shinglesSql,
         |p AS (SELECT pct, lo + span * pct // 100 AS cut
         |      FROM (SELECT CAST(MIN(doc_id) AS BIGINT) AS lo,
         |              CAST(MAX(doc_id) - MIN(doc_id) + 1 AS BIGINT) AS span
         |            FROM documents),
         |           (SELECT unnest([10, 25, 50, 75, 100]) AS pct)),
         |fs AS (SELECT shingle, MIN(doc_id) AS fd FROM sh GROUP BY shingle),
         |v AS (SELECT pct, CAST(COUNT(*) AS BIGINT) AS distinct_shingles
         |      FROM fs JOIN p ON fd < cut GROUP BY pct),
         |o AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh
         |      FROM sh GROUP BY doc_id),
         |a AS (SELECT pct, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |        CAST(SUM(nsh) AS BIGINT) AS n_occurrences
         |      FROM o JOIN p ON doc_id < cut GROUP BY pct)
         |SELECT CAST(a.pct AS BIGINT) AS pct, n_docs, n_occurrences,
         |  distinct_shingles
         |FROM a JOIN v ON a.pct = v.pct""".stripMargin,

    "q_minhash_error" ->
      s"""WITH $minhashErrorBodySql
         |SELECT id_a, id_b, est_slots, n_inter, n_union,
         |  est_slots * n_union - 16 * n_inter AS err_units
         |FROM err""".stripMargin,

    // Outer rollup of the SAME audit body: the sketch-threshold tuning
    // curve (pairs and exact-pass precision per agreement level).
    "q_threshold_sweep" ->
      s"""WITH $minhashErrorBodySql
         |SELECT est_slots, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(COUNT(*) FILTER (n_inter * 2 >= n_union) AS BIGINT) AS pass_050,
         |  CAST(COUNT(*) FILTER (n_inter * 10 >= n_union * 7) AS BIGINT) AS pass_070,
         |  CAST(COUNT(*) FILTER (n_inter * 5 >= n_union * 4) AS BIGINT) AS pass_080
         |FROM err GROUP BY est_slots""".stripMargin,

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPairsSql,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node
         |),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
         |SELECT component, COUNT(*) AS n_members, MAX(node) AS max_id
         |FROM comp GROUP BY component""".stripMargin,

    // dHash replayed from the raw pixel FORMULAS (never touching the
    // BMP bytes the Spark side encodes and decodes), same 4-band
    // candidate join, exact popcount verify. Shifts stay < 2^32 so
    // every value is BIGINT-portable.
    "q_phash_dedup" ->
      """WITH px AS (
        |  SELECT d.doc_id, r.r, c.c,
        |    ((d.doc_id // 4) * 31 + r.r * 13 + c.c * 29) % 256 AS g0,
        |    CASE WHEN r.r * 9 + c.c = ((d.doc_id % 4) * 17) % 72
        |         THEN (d.doc_id % 4) * 40 ELSE 0 END AS dp
        |  FROM documents d, range(8) r(r), range(9) c(c)),
        |g AS (SELECT doc_id, r, c, (g0 + dp) % 256 AS gray FROM px),
        |b AS (SELECT a.doc_id, a.r * 8 + a.c AS idx,
        |        CASE WHEN a.gray < n.gray THEN 1 ELSE 0 END AS bit
        |      FROM g a JOIN g n ON n.doc_id = a.doc_id AND n.r = a.r
        |        AND n.c = a.c + 1
        |      WHERE a.c < 8),
        |h AS (SELECT doc_id,
        |        CAST(COALESCE(SUM(CASE WHEN idx >= 32
        |          THEN bit * (1::BIGINT << CAST(idx - 32 AS INT))
        |          ELSE 0 END), 0) AS BIGINT) AS hash_hi,
        |        CAST(COALESCE(SUM(CASE WHEN idx < 32
        |          THEN bit * (1::BIGINT << CAST(idx AS INT))
        |          ELSE 0 END), 0) AS BIGINT) AS hash_lo
        |      FROM b GROUP BY doc_id),
        |bd AS (SELECT doc_id, hash_hi, hash_lo,
        |         unnest([hash_lo & 65535, hash_lo >> 16,
        |                 hash_hi & 65535, hash_hi >> 16]) AS band_val,
        |         unnest([0, 1, 2, 3]) AS band_idx
        |       FROM h),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM bd a JOIN bd b ON b.band_idx = a.band_idx
        |           AND b.band_val = a.band_val AND a.doc_id < b.doc_id)
        |SELECT c.id_a, c.id_b,
        |  CAST(bit_count(xor(x.hash_hi, y.hash_hi))
        |     + bit_count(xor(x.hash_lo, y.hash_lo)) AS BIGINT) AS hamming
        |FROM cand c JOIN h x ON x.doc_id = c.id_a
        |            JOIN h y ON y.doc_id = c.id_b
        |WHERE bit_count(xor(x.hash_hi, y.hash_hi))
        |    + bit_count(xor(x.hash_lo, y.hash_lo)) <= 3""".stripMargin,

    // Same closure over the FULL pair set: agreement proves the
    // incremental (labels ∪ new pairs) path loses/merges nothing.
    "q_cc_incremental" ->
      s"""WITH RECURSIVE $minhashPairsSql,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node
         |),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
         |SELECT component, COUNT(*) AS n_members, MAX(node) AS max_id
         |FROM comp GROUP BY component""".stripMargin,

    "q_weighted_jaccard" ->
      s"""WITH tk0 AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tk AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM tk0 WHERE tok <> '' GROUP BY doc_id, tok),
         |tot AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tot
         |        FROM tk GROUP BY doc_id),
         |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS dfr
         |        FROM tk GROUP BY tok),
         |live AS (SELECT tk.doc_id, tk.tok FROM tk
         |         JOIN dfq ON dfq.tok = tk.tok WHERE dfq.dfr <= 100),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM live a JOIN live b
         |           ON a.tok = b.tok AND a.doc_id < b.doc_id),
         |cm AS (SELECT c.id_a, c.id_b,
         |         CAST(SUM(LEAST(x.tf, y.tf)) AS BIGINT) AS smin
         |       FROM cand c JOIN tk x ON x.doc_id = c.id_a
         |                   JOIN tk y ON y.doc_id = c.id_b AND y.tok = x.tok
         |       GROUP BY c.id_a, c.id_b)
         |SELECT cm.id_a, cm.id_b, cm.smin, ta.tot AS tot_a, tb.tot AS tot_b,
         |  CAST(cm.smin * 1000 // (ta.tot + tb.tot - cm.smin) AS BIGINT)
         |    AS jw_permille
         |FROM cm JOIN tot ta ON ta.doc_id = cm.id_a
         |        JOIN tot tb ON tb.doc_id = cm.id_b
         |WHERE cm.smin * 2 >= (ta.tot + tb.tot - cm.smin) * 1""".stripMargin,

    // Mirrors chainAudit: same recursive closure, then ALL member
    // pairs per component (left-join the shingle intersection so
    // zero-overlap pairs keep jbp 0), integer-bp Jaccard, per-cluster
    // rollup.
    "q_chain_audit" ->
      s"""WITH RECURSIVE $minhashPairsSql,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node
         |),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
         |mp AS (SELECT ca.component, ca.node AS id_a, cb.node AS id_b
         |       FROM comp ca JOIN comp cb
         |         ON ca.component = cb.component AND ca.node < cb.node),
         |pi AS (SELECT m.id_a, m.id_b, CAST(COUNT(*) AS BIGINT) AS ni
         |       FROM mp m
         |       JOIN sh x ON x.doc_id = m.id_a
         |       JOIN sh y ON y.doc_id = m.id_b AND y.shingle = x.shingle
         |       GROUP BY m.id_a, m.id_b),
         |pj AS (SELECT m.component,
         |         CAST(COALESCE(pi.ni, 0) * 10000 AS BIGINT)
         |           // (sa.n + sb.n - COALESCE(pi.ni, 0)) AS jbp
         |       FROM mp m
         |       LEFT JOIN pi ON pi.id_a = m.id_a AND pi.id_b = m.id_b
         |       JOIN sz sa ON sa.doc_id = m.id_a
         |       JOIN sz sb ON sb.doc_id = m.id_b),
         |ag AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |         MIN(jbp) AS min_jbp, CAST(SUM(jbp) AS BIGINT) AS sum_jbp
         |       FROM pj GROUP BY component),
         |nm AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
         |       FROM comp GROUP BY component)
         |SELECT nm.component, nm.n_members, ag.n_pairs, ag.min_jbp,
         |  ag.sum_jbp, ag.min_jbp < 5000 AS chained
         |FROM nm JOIN ag USING (component)""".stripMargin,

    // Cluster-keyed split mirror: same recursive closure as
    // q_dedup_clusters, singletons coalesced to their own id, then the
    // exact md5-prefix cut of Sampling.splitTag (cutHex(0.9) = 'e666').
    "q_leakage_split" ->
      s"""WITH RECURSIVE $minhashPairsSql,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node
         |),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
         |tagged AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
         |), s AS (
         |  SELECT doc_id, component,
         |    CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 4) < 'e666'
         |         THEN 'train' ELSE 'val' END AS split
         |  FROM tagged
         |), leaks AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS naive_leak_pairs FROM pairs
         |  WHERE (substr(md5(CAST(id_a AS VARCHAR)), 1, 4) < 'e666')
         |     <> (substr(md5(CAST(id_b AS VARCHAR)), 1, 4) < 'e666')
         |)
         |SELECT split, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT component) AS n_clusters, naive_leak_pairs
         |FROM s CROSS JOIN leaks
         |GROUP BY split, naive_leak_pairs""".stripMargin,

    // identical result contract to q_dedup_clusters — the Spark sides
    // differ only in the closure algorithm (label propagation vs star
    // contraction), which the oracle is agnostic to
    "q_dedup_clusters_star" ->
      s"""WITH RECURSIVE $minhashPairsSql,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node
         |),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
         |SELECT component, COUNT(*) AS n_members, MAX(node) AS max_id
         |FROM comp GROUP BY component""".stripMargin,

    "q_lsh_bucket_audit" ->
      s"""WITH $sigSql
         |SELECT band, sig, COUNT(*) AS bucket_n
         |FROM sig GROUP BY band, sig HAVING COUNT(*) > 1""".stripMargin,

    "q_cluster_reps" ->
      s"""WITH RECURSIVE $minhashPairsSql,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node
         |),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)"""
        .stripMargin,

    "q_cluster_best" ->
      s"""WITH RECURSIVE $minhashPairsSql,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node
         |),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
         |m AS (SELECT c.node, c.component, d.n_chars
         |      FROM comp c JOIN documents d ON d.doc_id = c.node),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY component
         |          ORDER BY n_chars DESC, node ASC) AS rk,
         |        COUNT(*) OVER (PARTITION BY component) AS n_members
         |      FROM m)
         |SELECT component, n_members, node AS survivor_id, n_chars
         |FROM r WHERE rk = 1""".stripMargin,

    "q_containment" ->
      s"""WITH $candSql,
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.id_a
         |          JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
         |          GROUP BY c.id_a, c.id_b)
         |SELECT i.id_a, i.id_b, CAST(i.n_inter AS BIGINT) AS n_inter,
         |  i.n_inter / sx.n AS containment_a,
         |  i.n_inter / sy.n AS containment_b
         |FROM inter i
         |JOIN sz sx ON sx.doc_id = i.id_a
         |JOIN sz sy ON sy.doc_id = i.id_b
         |WHERE greatest(i.n_inter / sx.n, i.n_inter / sy.n) >= 0.7""".stripMargin,

    "q_dedup_incremental" ->
      s"""WITH $sigSql,
         |sp AS (SELECT doc_id,
         |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
         |              THEN 'train' ELSE 'val' END AS split
         |       FROM documents),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM sig a
         |         JOIN sp pa ON pa.doc_id = a.doc_id AND pa.split = 'val'
         |         JOIN sig b ON a.band = b.band AND a.sig = b.sig
         |         JOIN sp pb ON pb.doc_id = b.doc_id AND pb.split = 'train'),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.id_a
         |          JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
         |          GROUP BY c.id_a, c.id_b)
         |SELECT i.id_a AS new_id, i.id_b AS ref_id,
         |  i.n_inter / (sx.n + sy.n - i.n_inter) AS jaccard
         |FROM inter i
         |JOIN sz sx ON sx.doc_id = i.id_a
         |JOIN sz sy ON sy.doc_id = i.id_b
         |WHERE i.n_inter / (sx.n + sy.n - i.n_inter) >= 0.5""".stripMargin,

    // Mirrors bloomScreenStats including the filter itself: same
    // rolling-hash fingerprint, same two affine bit positions mod 4096,
    // same distinct-bit set — the FP counts are part of the hash gate.
    "q_bloom_dedup" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM documents
        |), fp AS (
        |  SELECT doc_id,
        |    CAST(list_reduce(
        |      list_transform(generate_series(1, length(t)),
        |        i -> CAST(ascii(substr(t, i, 1)) AS BIGINT)),
        |      (acc, c) -> (acc * 31 + c) % 1000000007) AS BIGINT) AS h
        |  FROM n
        |), pos AS (
        |  SELECT doc_id, h,
        |    (h * 2654435761 + 104729) % 4096 AS p1,
        |    (h * 2246822519 + 130363) % 4096 AS p2
        |  FROM fp
        |), corpus AS (SELECT * FROM pos WHERE doc_id % 10 <> 7),
        |batch AS (SELECT * FROM pos WHERE doc_id % 10 = 7),
        |bits AS (
        |  SELECT DISTINCT p FROM (
        |    SELECT p1 AS p FROM corpus UNION ALL SELECT p2 AS p FROM corpus) t
        |), ch AS (SELECT DISTINCT h AS chh FROM corpus),
        |probe AS (
        |  SELECT b.doc_id,
        |    (b1.p IS NOT NULL AND b2.p IS NOT NULL) AS cand,
        |    (c.chh IS NOT NULL) AS dup
        |  FROM batch b
        |  LEFT JOIN bits b1 ON b.p1 = b1.p
        |  LEFT JOIN bits b2 ON b.p2 = b2.p
        |  LEFT JOIN ch c ON b.h = c.chh
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
        |  CAST(COUNT(*) FILTER (cand) AS BIGINT) AS n_candidates,
        |  CAST(COUNT(*) FILTER (NOT cand) AS BIGINT) AS n_definitely_new,
        |  CAST(COUNT(*) FILTER (dup) AS BIGINT) AS n_true_dup,
        |  CAST(COUNT(*) FILTER (cand AND NOT dup) AS BIGINT) AS n_false_pos,
        |  CAST(COUNT(*) FILTER (dup AND NOT cand) AS BIGINT) AS n_missed
        |FROM probe""".stripMargin,

    "q_edit_distance" ->
      s"""WITH $candSql,
         |a AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS atext
         |      FROM documents)
         |SELECT c.id_a, c.id_b,
         |  CAST(levenshtein(x.atext, y.atext) AS BIGINT) AS edit_dist,
         |  CAST(greatest(len(x.atext), len(y.atext)) AS BIGINT) AS max_len
         |FROM cand c
         |JOIN a x ON x.doc_id = c.id_a
         |JOIN a y ON y.doc_id = c.id_b
         |WHERE levenshtein(x.atext, y.atext) * 10
         |      <= greatest(len(x.atext), len(y.atext)) * 3""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, lower(trim(text)) AS t FROM documents
        |           WHERE length(trim(text)) >= 12),
        |gs AS (SELECT doc_id, t, unnest(generate_series(1, length(t)-11)) AS g FROM t),
        |sh AS (SELECT DISTINCT doc_id, substr(t, g, 12) AS shingle FROM gs),
        |hx AS (SELECT doc_id, shingle, unnest(generate_series(0, 15)) AS h FROM sh),
        |mh AS (SELECT doc_id, h,
        |         MIN(substr(md5((h // 4)||'|'||shingle), (h % 4) * 8 + 1, 8)) AS mh
        |       FROM hx GROUP BY doc_id, h),
        |sig AS (SELECT doc_id, h // 2 AS band,
        |          md5(string_agg(mh, '' ORDER BY h)) AS sig
        |        FROM mh GROUP BY doc_id, h // 2),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM sig a JOIN sig b
        |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
        |          FROM cand c
        |          JOIN sh x ON x.doc_id = c.id_a
        |          JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
        |          GROUP BY c.id_a, c.id_b)
        |SELECT i.id_a, i.id_b, i.n_inter / (sx.n + sy.n - i.n_inter) AS jaccard
        |FROM inter i
        |JOIN sz sx ON sx.doc_id = i.id_a
        |JOIN sz sy ON sy.doc_id = i.id_b
        |WHERE i.n_inter / (sx.n + sy.n - i.n_inter) >= 0.8""".stripMargin,

    // Same all-pairs body at the 0.7 cut, coefficients as the same
    // single divisions.
    "q_sim_coeffs" ->
      """WITH t AS (SELECT doc_id, lower(trim(text)) AS t FROM documents
        |           WHERE length(trim(text)) >= 12 AND doc_id % 2 = 0),
        |gs AS (SELECT doc_id, t, unnest(generate_series(1, length(t)-11)) AS g FROM t),
        |sh AS (SELECT DISTINCT doc_id, substr(t, g, 12) AS shingle FROM gs),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
        |p AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_inter
        |      FROM sh x JOIN sh y
        |        ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |      GROUP BY x.doc_id, y.doc_id)
        |SELECT p.id_a, p.id_b, p.n_inter,
        |  p.n_inter / (sx.n + sy.n - p.n_inter) AS jaccard,
        |  p.n_inter * 2 / (sx.n + sy.n) AS dice,
        |  p.n_inter / LEAST(sx.n, sy.n) AS overlap
        |FROM p
        |JOIN sz sx ON sx.doc_id = p.id_a
        |JOIN sz sy ON sy.doc_id = p.id_b
        |WHERE p.n_inter * 10 >= (sx.n + sy.n - p.n_inter) * 7""".stripMargin,

    // Brute-force twin of the prefix-filtered join: EVERY co-occurring
    // pair (no pruning), intersection counts, integer cross-multiplied
    // threshold. Agreement proves the prefix filter's exactness.
    "q_prefix_join" ->
      """WITH t AS (SELECT doc_id, lower(trim(text)) AS t FROM documents
        |           WHERE length(trim(text)) >= 12),
        |gs AS (SELECT doc_id, t, unnest(generate_series(1, length(t)-11)) AS g FROM t),
        |sh AS (SELECT DISTINCT doc_id, substr(t, g, 12) AS shingle FROM gs),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
        |p AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_inter
        |      FROM sh x JOIN sh y
        |        ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |      GROUP BY x.doc_id, y.doc_id)
        |SELECT p.id_a, p.id_b, p.n_inter, sx.n AS n_a, sy.n AS n_b,
        |  p.n_inter / (sx.n + sy.n - p.n_inter) AS jaccard
        |FROM p
        |JOIN sz sx ON sx.doc_id = p.id_a
        |JOIN sz sy ON sy.doc_id = p.id_b
        |WHERE p.n_inter * 10 >= (sx.n + sy.n - p.n_inter) * 8""".stripMargin,

    // Replays the rarest-first prefix selection (row_number over
    // (df, shingle) — a total order per doc since shingles are
    // distinct, so the prefix SET is engine-deterministic) and counts
    // the entries a df-cap of 1 would drop from the candidate index.
    "q_prefix_cap_audit" ->
      """WITH t AS (SELECT doc_id, lower(trim(text)) AS t FROM documents
        |           WHERE length(trim(text)) >= 12),
        |gs AS (SELECT doc_id, t, unnest(generate_series(1, length(t)-11)) AS g FROM t),
        |sh AS (SELECT DISTINCT doc_id, substr(t, g, 12) AS shingle FROM gs),
        |df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS dfr FROM sh GROUP BY shingle),
        |o AS (SELECT sh.doc_id, df.dfr,
        |        ROW_NUMBER() OVER (PARTITION BY sh.doc_id
        |          ORDER BY df.dfr, sh.shingle) AS r,
        |        COUNT(*) OVER (PARTITION BY sh.doc_id) AS n
        |      FROM sh JOIN df USING (shingle)),
        |p AS (SELECT doc_id, dfr FROM o
        |      WHERE r <= n - ((n * 8 + 9) // 10) + 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_prefix,
        |  CAST(SUM(CASE WHEN dfr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
        |  COUNT(*) = SUM(CASE WHEN dfr > 1 THEN 1 ELSE 0 END) AS fully_capped
        |FROM p GROUP BY doc_id
        |HAVING SUM(CASE WHEN dfr > 1 THEN 1 ELSE 0 END) > 0""".stripMargin,

    "q_simhash_pairs" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |th AS (SELECT doc_id, md5(tok) AS th FROM tk WHERE tok <> ''),
         |bb AS (SELECT doc_id, th, unnest(generate_series(0, 31)) AS b FROM th),
         |bits AS (SELECT doc_id, b,
         |    (instr('0123456789abcdef', substring(th, CAST(b // 4 AS INT) + 1, 1)) - 1)
         |      // CAST(power(2, b % 4) AS INT) % 2 AS bit
         |  FROM bb),
         |votes AS (SELECT doc_id, b, SUM(bit * 2 - 1) AS votes
         |          FROM bits GROUP BY doc_id, b),
         |s AS (SELECT doc_id,
         |        CAST(SUM(CASE WHEN votes > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT)
         |          AS simhash
         |      FROM votes GROUP BY doc_id),
         |bands AS (SELECT doc_id, simhash, unnest(generate_series(0, 3)) AS b FROM s),
         |bv AS (SELECT doc_id, simhash, b,
         |         (simhash // CAST(power(2, b * 8) AS BIGINT)) % 256 AS band_val
         |       FROM bands),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         |           a.simhash AS sa, b2.simhash AS sb
         |         FROM bv a JOIN bv b2
         |           ON a.b = b2.b AND a.band_val = b2.band_val AND a.doc_id < b2.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |th AS (SELECT doc_id, md5(tok) AS th FROM tk WHERE tok <> ''),
         |bb AS (SELECT doc_id, th, unnest(generate_series(0, 31)) AS b FROM th),
         |bits AS (SELECT doc_id, b,
         |    (instr('0123456789abcdef', substring(th, CAST(b // 4 AS INT) + 1, 1)) - 1)
         |      // CAST(power(2, b % 4) AS INT) % 2 AS bit
         |  FROM bb),
         |votes AS (SELECT doc_id, b, SUM(bit * 2 - 1) AS votes
         |          FROM bits GROUP BY doc_id, b)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN votes > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT)
         |    AS simhash
         |FROM votes GROUP BY doc_id""".stripMargin
  )
}
