package graft.core

import org.apache.spark.sql.SparkSession

/** The library's recommended local SparkSession, shared by the three
  * driver-facing mains (Bench / Verify / Explain) so the measured, the
  * verified, and the inspected configuration can never drift apart.
  */
object GraftSession {

  /** `local[cpus]` session with the catalog's documented knobs:
    *
    *  - `shuffle.partitions = cpus`: the fixture-scale analogue of
    *    sizing partitions to the cluster (the default 200 would run
    *    32-row tasks);
    *  - `adaptive.enabled`: AQE picks broadcast/skew plans at runtime
    *    from real sizes — the 100 TB posture, kept identical locally;
    *  - `files.maxPartitionBytes = 8m`: fixture tables are single
    *    ~30 MB parquet files; the default 128 MB split would scan each
    *    on ONE core (the same knob, pointed the other way at scale);
    *  - `objectHashAggregate.sortBased.fallbackThreshold = 16384`:
    *    collect_set/TypedImperative profiles degrade to sort-based
    *    aggregation at the default 128 keys/partition on any real
    *    corpus slice — state here is ~KB per key, so raise it;
    *  - `codegen.cache.maxEntries = 10000` (static conf): the default
    *    100-entry generated-class cache thrashes once a session runs
    *    more than a handful of distinct wide plans, so heavyweight
    *    codegen (e.g. the 16-column MinHash band projection) recompiles
    *    on every re-execution — measured as q_dedup_weights paying a
    *    recurring ~4.5 s janino compile per bench pass at the 228-query
    *    catalog. Any long-lived cluster session (notebook, Thrift
    *    server, streaming driver) wants the same headroom; entries are
    *    class bytecode, driver-side only, ~KB each;
    *  - UTC session timezone: every timestamp oracle assumes it;
    *  - UI off: headless harness.
    */
  def local(cpus: String, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "16384")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
