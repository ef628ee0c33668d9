package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Cdc, Dedup, Eval, Events, Graph, Linkage, Multimodal, Privacy, Quality, Reco, Sampling, Similarity, Skew, Sketches, TextAnalysis, Web}
import graft.orchestrate.{BlueGreen, Snapshots}
import graft.sources.{BloomIndex, GraphFrames, Ingest, ZOrder}

/** Driver contract — see /root/repo/SURVEY.md §2 for the row each query
  * covers. Every oracle-able query aliases its columns identically on both
  * sides and carries an explicit ORDER BY.
  */
object SparkEntry {

  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Events scan with `ts` normalized to NANOSECOND LONGS no matter how
    * the file encodes time. The generator has shipped both TIMESTAMP
    * (NANOS) (reads as raw INT64 under `nanosAsLong`) and plain
    * timestamp[us] (reads as TIMESTAMP_NTZ, where `nanosAsLong` is a
    * no-op) across rounds; every downstream formula and every DuckDB
    * oracle (`epoch_us(ts)`) assumes the nanos-long form, so the scan is
    * the one place the difference is allowed to exist. The NTZ branch
    * pins the session timezone to UTC before the cast so the naive
    * timestamp maps to the same instant DuckDB's `epoch_us` assumes.
    */
  private def rdEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = rd(s, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        s.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", expr("unix_micros(cast(ts AS timestamp)) * 1000L"))
    }
  }

  /** Canonical (u, it) = (customer, part) purchase frame behind the
    * reco family — orders ⋈ lineitem projected to the two keys.
    */
  private def recoPurch(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("it"))

  /** Stage the item-item neighbor index ONCE per (session, dir) as a
    * bucketed table and hand every reco query its name — the
    * writeChecksumIndex pattern applied to the suite's heaviest shared
    * chain (VERDICT r14 #4: reco_itemcf + reco_coverage each re-ran
    * the full co-occurrence self-join). The index is a deterministic
    * function of the interactions, so composing over the staged table
    * is output-identical to the fused chain; reco_eval keeps its own
    * retrain (leave-last-out semantics REQUIRE refitting on the held-
    * out-free train set). Keyed per session+dir: a fresh JVM rebuilds,
    * so regenerated testdata can never serve a stale index.
    */
  private val recoIdxStaged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def recoIndexTable(s: SparkSession, dir: String): String =
    recoIdxStaged.computeIfAbsent(
      System.identityHashCode(s) + "|" + dir, _ => {
        val tbl = "graft_reco_idx_" +
          java.lang.Integer.toHexString(dir.hashCode)
        // a previous JVM may have left the managed-table directory
        // behind without a catalog entry — saveAsTable(Overwrite) then
        // fails LOCATION_ALREADY_EXISTS; drop both catalog row and dir
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), tbl)
        loc.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(loc, true)
        Reco.writeItemIndex(
          recoPurch(s, dir).distinct(), tbl,
          maxBasket = 100, minCo = 3L, simTopM = 20)
        tbl
      })

  /** Flagship: the end-to-end training-data assembly pipeline over
    * sf0.001 documents — exact dedup (keep one copy per checksum) →
    * deterministic mixture resampling → fixed-length sequence packing.
    * Built-in expressions only: this runs in the DRIVER's own session,
    * which does not register the graft_* extensions.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = rd(spark, "/root/testdata/sf0.001", "documents")
    val survivors = docs.join(
      Dedup.exact(docs).select(col("doc_id")), Seq("doc_id"))
    val resampled = Sampling.mixtureResample(
      survivors, Seq("src0" -> 0.5, "src1" -> 0.75), 1.0)
    Sampling.packSequences(resampled, 256L).orderBy("doc_id")
  }

  /** Two deterministic snapshot generations of the orders table for the
    * CDC queries: the "old" generation misses keys ending in 9, the "new"
    * one misses keys ending in 0 and rewrites the priority of every key
    * divisible by 7 — so all three change types occur. String-only value
    * drift keeps the diff free of cross-engine float formatting.
    */
  private def cdcSnaps(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = rd(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val oldSnap = o.filter(col("o_orderkey") % 10 =!= 9)
    val newSnap = o.filter(col("o_orderkey") % 10 =!= 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 7 === 0, lit("CHANGED"))
          .otherwise(col("o_orderpriority")))
    (oldSnap, newSnap)
  }

  /** Embeddings corpus with an exact copy of each of the first 10 vectors
    * planted at vec_id+100000, plus those 10 originals as the query set —
    * the provable-top-1 construction the approximate ANN queries oracle
    * against (see the ann_lsh/ann_ivf/ann_pq registration comment).
    */
  private def plantedAnnInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = rd(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corpus = e.unionAll(e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    (corpus, q)
  }

  /** Recursive delete for query-staged temp layouts (index builds that
    * must reset between bench repetitions). Local-FS only by design —
    * staged dirs live under /tmp.
    */
  private def rmTree(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.delete)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- CDC between snapshot generations (snapshot watcher's data twin)
    "cdc_diff" -> ((s, dir) => {
      val (oldSnap, newSnap) = cdcSnaps(s, dir)
      Cdc.snapshotDiff(oldSnap, newSnap, "o_orderkey",
        Seq("o_orderpriority", "o_totalprice")).orderBy("o_orderkey")
    }),
    // applying the diff-derived changeset to the old snapshot must
    // reproduce the new snapshot exactly — the oracle IS the new snapshot
    "cdc_apply" -> ((s, dir) => {
      val (oldSnap, newSnap) = cdcSnaps(s, dir)
      val diff = Cdc.snapshotDiff(oldSnap, newSnap, "o_orderkey",
        Seq("o_orderpriority", "o_totalprice"))
      val changes = diff.join(newSnap, Seq("o_orderkey"), "left")
        .withColumn("op", when(col("change_type") === "delete", lit("delete"))
          .otherwise(lit("upsert")))
        .drop("change_type")
      Cdc.applyChanges(oldSnap, changes, "o_orderkey").orderBy("o_orderkey")
    }),
    // --- SCD Type-2 dimension history: each customer's order-priority
    // observations (ordered by orderkey) collapse into validity intervals
    "cdc_scd2" -> ((s, dir) => {
      val log = rd(s, dir, "orders").select(
        col("o_custkey"), col("o_orderpriority"), col("o_orderkey"))
      Cdc.scd2(log, "o_custkey", "o_orderpriority", "o_orderkey",
        "o_orderkey").orderBy("o_custkey", "version")
    }),
    // --- incremental view maintenance: a per-returnflag (n, total)
    // rollup absorbs an md5-staged delta stream (deletes h<2 of the
    // base, inserts h>=8) — the ORACLE recomputes the aggregate from
    // the post-change snapshot from scratch, so the IVM identity
    // maintain(agg(S), Δ) == agg(S') is exactly what the hash checks
    "cdc_ivm" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("pk"),
        col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("v"))
        .withColumn("h", conv(substring(md5(col("pk").cast("string")),
          1, 8), 16, 10).cast("long") % 10)
      val base = li.filter(col("h") < 8)
      val agg0 = base.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      val changes = base.filter(col("h") < 2)
        .select(col("grp"), lit("delete").as("op"), col("v"))
        .unionByName(li.filter(col("h") >= 8)
          .select(col("grp"), lit("insert").as("op"), col("v")))
      Cdc.maintainAggregate(agg0, changes).orderBy("grp")
    }),
    // --- incremental JOIN view maintenance: the bilinear delta rule;
    // the oracle recomputes the full join, so the hash check IS the
    // maintain == recompute identity
    "cdc_ivm_join" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey"))
      val l = rd(s, dir, "lineitem").select(col("l_orderkey").as("k"),
        col("l_partkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"))
      val a0 = o.filter(col("k") % 10 =!= 0)
      val dA = o.filter(col("k") % 10 === 0)
      val b0 = l.filter(col("l_linenumber") < 4)
      val dB = l.filter(col("l_linenumber") >= 4)
      Cdc.maintainJoin(a0.join(b0, "k"), a0, b0, dA, dB, "k")
        .orderBy("k", "o_custkey", "l_partkey", "l_linenumber")
    }),
    // --- bitemporal as-of read: corrections log (valid_from, sys_from),
    // "what did we believe at S about the state at V" — one keyed
    // partial-agg struct election after the two range filters
    "cdc_bitemporal" -> ((s, dir) => {
      val log = rd(s, dir, "orders").select(
        col("o_custkey").as("key"),
        unix_timestamp(col("o_orderdate")).as("valid_from"),
        (unix_timestamp(col("o_orderdate")) +
          (col("o_orderkey") % 3) * 86400L).as("sys_from"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("value"))
      Cdc.bitemporalAsOf(log, "key", validTime = 836179200L,
        sysTime = 836179200L + 86400L).orderBy("key")
    }),
    // --- order-preserving compaction packing plan over a synthetic
    // manifest: bin = cum-bytes-before div target (metadata-sized)
    "compaction_plan" -> ((s, dir) => {
      val manifest = rd(s, dir, "lineitem")
        .groupBy(expr("l_orderkey div 1024").as("f"))
        .agg((count(lit(1)) * 100L).as("bytes"))
        .select(concat(lit("part-"), lpad(col("f").cast("string"), 5, "0"))
          .as("file"), col("bytes"))
      graft.sources.Compaction.packingPlan(manifest, "file", "bytes",
        targetBytes = 500000L).orderBy("bin")
    }),
    // --- changed-partition work-list: order-free (n, sum, xor) md5
    // digests per partition, full-outer diff names the recompute set
    "cdc_partition_diff" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").select(
        expr("l_orderkey div 4096").as("p"), col("l_orderkey"),
        col("l_linenumber"),
        expr("CAST(floor(l_quantity * 100) AS BIGINT)").as("q_c"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("e_c"))
      val oldSnap = li.filter(
        !(col("l_linenumber") === 7 && col("l_orderkey") % 5 === 0))
      val newSnap = li.withColumn("q_c",
        when(col("l_orderkey") % 97 === 0, col("q_c") + 100L)
          .otherwise(col("q_c")))
      val cols = Seq("l_orderkey", "l_linenumber", "q_c", "e_c")
      Cdc.changedPartitions(
        Cdc.partitionChecksums(oldSnap, "p", cols),
        Cdc.partitionChecksums(newSnap, "p", cols))
        .orderBy("part")
    }),
    // --- entity resolution: blocked fuzzy self-match over customer names
    // (planted single-typo variants of the first 50 names; blocks are the
    // 17-char name prefix, so natural last-digit neighbors match too)
    "entity_match" -> ((s, dir) => {
      val c = rd(s, dir, "customer").select(
        col("c_custkey").cast("long").as("rec_id"), col("c_name").as("name"))
      val planted = c.filter(col("rec_id") < 50)
        .select((col("rec_id") + 1000000L).as("rec_id"),
          concat(substring(col("name"), 1, 17), lit("X")).as("name"))
      val recs = c.unionByName(planted)
        .withColumn("block", substring(col("name"), 1, 17))
      Linkage.blockedMatch(recs, maxDist = 1).orderBy("a_id", "b_id")
    }),
    // --- Fellegi–Sunter EM: learn per-feature (m, u) and prevalence p
    // from blocked customer pairs with NO labels — planted 1-edit
    // variants (same phone/nation/segment/balance) are the latent match
    // class the EM must separate; all-integer ppm E/M steps
    "linkage_em" -> ((s, dir) => {
      val base = rd(s, dir, "customer").select(
        col("c_custkey").cast("long").as("rec_id"), col("c_name").as("name"),
        col("c_nationkey").as("nation"), col("c_mktsegment").as("seg"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
          .as("bal"))
      val planted = base.filter(col("rec_id") < 50)
        .select((col("rec_id") + 1000000L).as("rec_id"),
          concat(substring(col("name"), 1, 17), lit("X")).as("name"),
          col("nation"), col("seg"), col("bal"))
      val recs = base.unionByName(planted)
        .withColumn("block", substring(col("name"), 1, 17))
      def side(p: String) = recs.select(col("block"),
        col("rec_id").as(s"${p}_id"), col("name").as(s"${p}_name"),
        col("nation").as(s"${p}_nation"),
        col("seg").as(s"${p}_seg"), col("bal").as(s"${p}_bal"))
      val pairs = side("a").join(side("b"), "block")
        .filter(col("a_id") < col("b_id"))
        .select(
          (col("a_bal") === col("b_bal")).as("f_bal_exact"),
          (col("a_nation") === col("b_nation")).as("f_nation"),
          (col("a_seg") === col("b_seg")).as("f_seg"),
          expr("((a_bal + 1000000L) div 10000L) =" +
            " ((b_bal + 1000000L) div 10000L)").as("f_band"))
      Linkage.emLinkage(pairs,
        Seq("f_bal_exact", "f_nation", "f_seg", "f_band"), rounds = 2)
    }),
    // --- golden-record survivorship: match pairs (blocked levenshtein
    // over full-name blocks, planted X/Y append-variants) -> star
    // components -> partial-aggregable merge rules (min id, most
    // frequent name w/ lexicographic tie, max balance)
    "entity_golden" -> ((s, dir) => {
      val c = rd(s, dir, "customer").select(
        col("c_custkey").cast("long").as("rec_id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
      val xv = c.filter(col("rec_id") < 50)
        .select((col("rec_id") + 1000000L).as("rec_id"),
          concat(col("name"), lit("X")).as("name"),
          (col("acctbal") + lit(100.0)).as("acctbal"))
      val yv = c.filter(col("rec_id") < 25)
        .select((col("rec_id") + 2000000L).as("rec_id"),
          concat(col("name"), lit("Y")).as("name"),
          (col("acctbal") + lit(200.0)).as("acctbal"))
      val recs = c.unionByName(xv).unionByName(yv)
      val pairs = Linkage.blockedMatch(
        recs.withColumn("block", substring(col("name"), 1, 18)), maxDist = 1)
        .select(col("a_id"), col("b_id"))
      Linkage.goldenRecords(recs, pairs).orderBy("cluster_id")
    }),
    // --- deletion-neighborhood fuzzy join: customers with a planted
    // md5-positioned typo (substitute 'x' or delete one char — both
    // exactly distance 1; names have no literal 'x') matched back to the
    // clean roster via SymSpell variant equi-join + levenshtein verify
    "linkage_fuzzy" -> ((s, dir) => {
      val c = rd(s, dir, "customer").select(
        col("c_custkey").cast("long").as("rec_id"), col("c_name").as("name"))
      val h = conv(substring(md5(concat(col("rec_id").cast("string"),
        lit(":pos"))), 1, 8), 16, 10).cast("long")
      val o = conv(substring(md5(concat(col("rec_id").cast("string"),
        lit(":op"))), 1, 8), 16, 10).cast("long")
      val dirty = c.filter(col("rec_id") % 5 === 0)
        .withColumn("pos", (h % length(col("name"))) + 1)
        .withColumn("op", o % 2)
        .select((col("rec_id") + 2000000L).as("rec_id"),
          when(col("op") === 0, concat(
            col("name").substr(lit(1), col("pos") - 1), lit("x"),
            col("name").substr(col("pos") + 1, lit(1000000))))
          .otherwise(concat(
            col("name").substr(lit(1), col("pos") - 1),
            col("name").substr(col("pos") + 1, lit(1000000)))).as("name"))
      Linkage.symspellJoin(dirty, c).orderBy("a_id", "b_id")
    }),
    // --- phonetic blocking: one portable soundex SQL text serves both
    // engines; code-keyed equi-join + levenshtein<=2 verify
    "linkage_phonetic" -> ((s, dir) => {
      val toks = rd(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("t"))
      Linkage.phoneticBlocking(toks, "t", maxLev = 2)
        .orderBy("code", "tok_a", "tok_b")
    }),
    // --- greedy maximal matching (Israeli–Itai local-minimum rule)
    // over the order–customer graph: fixed md5 edge priorities, 4
    // rounds, leftovers undecided — the one-to-one pairing primitive
    "graph_matching" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      Graph.maximalMatching(e, rounds = 4).orderBy("lo", "hi")
    }),
    // --- Luby maximal independent set over the order–customer graph:
    // fixed md5 priorities make it the unique greedy MIS; fixed 4 rounds
    // keep it oracle-exact (leftovers reported undecided, never guessed)
    "graph_mis" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      Graph.maximalIndependentSet(e, rounds = 4).orderBy("id")
    }),
    // --- hop-limited BFS over the order–customer graph
    "graph_bfs" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val seeds = rd(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey").as("id"))
      Graph.bfs(e, seeds, 3).orderBy("id")
    }),
    // --- sampled-pivot harmonic closeness over the same order–customer
    // graph: exact integer 12/d terms, one double division at the end
    "graph_harmonic" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val seeds = rd(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey").as("id"))
      Graph.harmonicCloseness(e, seeds, 3).orderBy("id")
    }),
    // --- daily gap-fill + running totals per user
    "events_gapfill" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      Events.gapFillDaily(ev).orderBy("user_id", "day")
    }),
    // --- keyword retrieval: first-5-token queries from the first 5 docs
    "text_search" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      TextAnalysis.searchTopK(docs, qs, 5).orderBy("query_id", "rank")
    }),
    // --- BM25 retrieval: same first-5-token queries, scored with tf
    // saturation + doc-length normalization (all-BIGINT, see bm25TopK)
    "text_bm25" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      TextAnalysis.bm25TopK(docs, qs, 5).orderBy("query_id", "rank")
    }),
    // --- persisted-inverted-index retrieval: stage the index, then the
    // query path reads ONLY the md5 buckets the terms hash to
    "search_indexed" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val staged = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_searchidx").toString
      TextAnalysis.writeSearchIndex(docs, staged)
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      TextAnalysis.bm25TopKIndexed(s, staged, qs, 5)
        .orderBy("query_id", "rank")
    }),
    // --- retrieval eval card: bm25 vs the all-terms-present gold set
    "eval_retrieval" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      TextAnalysis.retrievalEval(docs, qs, 5)
    }),
    // --- late-interaction passage retrieval: per-term max pooling over
    // 32-token chunks, idf-weighted exact-integer scores, same queries
    "search_maxsim" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      TextAnalysis.maxSimTopK(docs, qs, 5).orderBy("query_id", "rank")
    }),
    // --- two-stage retrieval: BM25 top-10 shortlist re-ranked by exact
    // embedding cosine (vec_id == doc_id id space, as in search_hybrid)
    "search_rerank" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      val e = rd(s, dir, "embeddings")
      TextAnalysis.retrieveRerank(docs, qs,
          e.select(col("vec_id").as("doc_id"), col("embedding")),
          e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("q_emb")),
          kRetrieve = 10, k = 5)
        .orderBy("query_id", "rank")
    }),
    // --- MMR diversified retrieval: BM25 top-10 shortlist, rank-based
    // integer relevance, all-integer λ=0.7 marginal-relevance selection
    // of 5 (floored-cosine redundancy term) — deterministic RAG top-k
    "search_mmr" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      val e = rd(s, dir, "embeddings")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))
      val sl = TextAnalysis.bm25TopK(docs, qs, 10)
        .withColumn("rank", row_number().over(w))
        .withColumn("rel", (lit(10L) - col("rank")).cast("long"))
        .join(e.select(col("vec_id").as("doc_id"),
          col("embedding").as("d_emb")), Seq("doc_id"))
        .select(col("query_id"), col("doc_id"), col("rel"), col("d_emb"))
      Similarity.mmrSelect(sl, k = 5).orderBy("query_id", "pick")
    }),
    // --- hard negatives: BM25 top-10 docs whose embedding cosine to the
    // query falls under 0.5 — lexically plausible, semantically wrong
    "search_hard_negatives" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      val e = rd(s, dir, "embeddings")
      TextAnalysis.hardNegatives(docs, qs,
          e.select(col("vec_id").as("doc_id"), col("embedding")),
          e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("q_emb")),
          kRetrieve = 10, maxCos = 0.5)
        .orderBy("query_id", "bm25_rank", "doc_id")
    }),
    // --- hybrid retrieval: BM25 lexical + embedding-cosine rankings
    // fused by integer-scaled reciprocal-rank fusion (vec_id == doc_id
    // in the testdata, so the two systems rank the same id space)
    "search_hybrid" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      val lex = TextAnalysis.bm25TopK(docs, qs, 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val e = rd(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val sem = Similarity.bruteTopK(
        e.select(col("vec_id"), col("embedding")), q, 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      TextAnalysis.rrfFuse(Seq(lex, sem)).orderBy("query_id", "rank")
    }),
    // --- dedup quality harness: exact-hash dedup evaluated against a
    // planted truth set (10 byte-identical copies it must catch, 40
    // near copies it must miss) — tp/fp/fn + ppm precision/recall/F1
    "dedup_eval" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val near = docs.filter(col("doc_id") < 40).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 3)"), lit("XXX"))
          .as("text"))
      val exact = docs.filter(col("doc_id") < 10).select(
        (col("doc_id") + 200000L).as("doc_id"), col("text"))
      val hashed = docs.unionByName(near).unionByName(exact)
        .withColumn("h", sha2(col("text"), 256))
      val pred = hashed.select(col("h"), col("doc_id").as("a_id"))
        .join(hashed.select(col("h"), col("doc_id").as("b_id")), "h")
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
      val truth = docs.filter(col("doc_id") < 40)
        .select(col("doc_id").as("a_id"),
          (col("doc_id") + 100000L).as("b_id"))
        .unionByName(docs.filter(col("doc_id") < 10)
          .select(col("doc_id").as("a_id"),
            (col("doc_id") + 200000L).as("b_id")))
      Dedup.evalPairs(pred, truth)
    }),
    // --- k-means corpus clustering. The registered query plants k=16
    // well-separated blocks (dim 0 shifted by 1000·g,
    // g = (vec_id·16 + 15) div n — the exact inverse of kmeansFit's
    // evenly-spaced init indices ⌊i·n/16⌋, so block(⌊i·n/16⌋) = i and
    // each block gets exactly one initial centroid) making the
    // assignment PROVABLY exact: every point is ≥ ~988 from any other
    // block's centroid vs ≤ ~25 from its own, so Lloyd's assignments
    // equal the blocks at every iteration and centroids stay in-block —
    // the final cluster id IS g, which DuckDB computes arithmetically.
    // Requires corpus ≤ trainSample (500/2000 at the verify/bench SFs)
    // so the sample covers all blocks. SimilaritySpec keeps the purity
    // invariant on the unplanted operator.
    "embed_cluster" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val n = e.count()
      val planted = e.select(col("vec_id"),
        expr(s"transform(embedding, (x, i) -> CASE WHEN i = 0 THEN " +
          s"cast(x + cast((vec_id * 16 + 15) div $n as double) * 1000.0d as float) " +
          "ELSE x END)").as("embedding"))
      Similarity.kmeansCluster(planted, 16).orderBy("vec_id")
    }),
    // --- fully distributed Lloyd's (no driver sample): zero-shuffle
    // literal-centroid argmin per round + one k·dim integer-cell
    // shuffle; integer-exact updates make the whole FIT oracle-exact —
    // the DuckDB twin unrolls the same 3 rounds over the raw corpus
    // (no planted structure needed, unlike embed_cluster's shortcut)
    "embed_cluster_dist" -> ((s, dir) =>
      Similarity.kmeansClusterDistributed(
        rd(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        k = 8, iters = 3).orderBy("vec_id")),
    // --- greedy k-center coreset: 4 farthest-point rounds, coverage
    // radius emitted as floored integers only
    "embed_coreset" -> ((s, dir) =>
      Similarity.kCenterCoreset(
        rd(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        k = 5).orderBy("rank")),
    // --- cluster-quality card on the same fit: integer squared-distance
    // tightness + worst k² centroid-separation ratio (DB-index shape)
    "embed_cluster_eval" -> ((s, dir) =>
      Similarity.clusterQualityCard(
        rd(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        k = 8, iters = 3).orderBy("cluster")),
    // --- reference surface: graph source normalization (SURVEY §2 rows 1-4)
    "normalize_nodes" -> ((s, dir) => {
      val nodes = rd(s, dir, "customer").select(
        col("c_custkey"),
        concat_ws(",", col("c_mktsegment"), lit("Customer")).as("labels_raw"),
        col("c_name"), col("c_acctbal"))
      // The operator emits labels as array<string> (GraphFramesSpec covers
      // that); the registered query re-joins them to a scalar because the
      // driver's pandas row-sort cannot order array cells.
      GraphFrames.normalizeNodes(nodes)
        .withColumn("labels", array_join(col("labels"), "|"))
        .orderBy("nodeId")
    }),
    "normalize_edges" -> ((s, dir) => {
      val edges = rd(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice"))
      GraphFrames.normalizeEdges(edges).orderBy("sourceNodeId")
    }),
    // --- snapshot / blue-green orchestration as data ops (rows 13-14)
    "latest_snapshot" -> ((s, dir) => {
      val snaps = rd(s, dir, "orders").select(
        col("o_custkey").as("customer_id"),
        unix_timestamp(col("o_orderdate")).as("snapshot_ts"))
      Snapshots.latestPerCustomer(snaps).orderBy("customer_id")
    }),
    // --- graph analytics over the normalized edge list (order -> customer;
    // customer ids offset so the two key spaces cannot collide as nodes)
    "graph_degrees" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      Graph.degreeStats(e).orderBy("id")
    }),
    "graph_pagerank" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      Graph.pageRank(e, 5).orderBy("id")
    }),
    // --- incremental PageRank: 3 rounds on yesterday's graph (10% of
    // orders held out), then a 2-round warm-start resume on the FULL
    // graph — the daily-maintenance path: new/changed mass settles in
    // O(delta-diameter) rounds instead of a full cold rerun
    "graph_pagerank_incremental" -> ((s, dir) => {
      val full = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val warm = Graph.pageRank(full.filter(col("src") % 10 =!= 0), 3)
        .select(col("id"), col("rank_scaled").as("r"))
      Graph.pageRank(full, 2, init = Some(warm)).orderBy("id")
    }),
    // --- weighted PageRank over the order-part graph with lineitem
    // multiplicity as the edge weight: mass splits proportional to w via
    // the exact overflow-free floor(r*w/W) decomposition
    "graph_pagerank_weighted" -> ((s, dir) => {
      val e = rd(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst"))
        .agg(count(lit(1)).as("w"))
      Graph.weightedPageRank(e, 5).orderBy("id")
    }),
    // strongly connected components over a staged 400-node graph of
    // 4-cycles with one cross link: min-label FW-BW peel, 2 rounds of
    // 4 hops resolves everything (block {4..7} needs the second peel
    // once block 0's smaller ids stop shadowing its backward minimum)
    "graph_scc" -> ((s, dir) => {
      val ids = rd(s, dir, "customer")
        .select((col("c_custkey") % 400).as("id")).distinct()
      val ring = ids.select(col("id").as("src"),
        when(col("id") % 4 === 3, col("id") - 3)
          .otherwise(col("id") + 1).as("dst"))
      val cross = ids.filter(col("id") === 0)
        .select(col("id").as("src"), (col("id") + 4).as("dst"))
      Graph.scc(ring.union(cross), peels = 2, hops = 4).orderBy("id")
    }),
    // HITS on the bipartite order→customer graph: orders are hubs,
    // customers authorities; fixed-point L1 normalization, 3 rounds
    "graph_hits" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      Graph.hits(e, 3).orderBy("id")
    }),
    // --- Newman degree assortativity of the order/customer graph: one
    // exact-moment Pearson row (strongly negative — hub-and-spoke)
    "graph_assortativity" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      Graph.assortativity(e).orderBy("n_endpoints")
    }),
    // triangle counts over the part co-occurrence graph (parts sharing an
    // order); Spark enumerates degree-ordered, the oracle id-ordered —
    // the triangle set is orientation-independent. The registered query
    // counts on a deterministic 1-in-4 node sample's induced subgraph
    // (Doulion-style sampling): the full order-level co-occurrence graph
    // has avg degree ~90 at every SF, so exact global counting costs
    // E^1.5 wedges (~300M at sf0.1) — sampled counting is how dense
    // co-occurrence graphs are profiled in practice, and the operator
    // itself stays exact on whatever graph it is fed.
    // --- 4-truss peel over the same sampled part co-occurrence graph:
    // monotone-sound edge removal (dropped edges are provably outside
    // the truss at any budget), early-converged survivors labeled
    // truss, budget-exhausted ones candidate
    "graph_ktruss" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      val co = Graph.coOccurrence(li, "l_orderkey", "l_partkey")
      Graph.kTruss(co, k = 4, rounds = 3).orderBy("lo", "hi")
    }),
    // --- time-respecting earliest arrival over the order–part contact
    // graph (edge ts = shipdate): which parts/orders could a
    // contamination starting at orders < 100 reach, and when — a
    // static BFS overcounts by using edges that fired too early
    "graph_temporal_reach" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").select(col("l_orderkey").as("o"),
        (col("l_partkey") + 20000000L).as("p"),
        unix_timestamp(col("l_shipdate")).as("ts"))
      val e = li.select(col("o").as("src"), col("p").as("dst"), col("ts"))
        .unionByName(
          li.select(col("p").as("src"), col("o").as("dst"), col("ts")))
      val seeds = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("id")).filter(col("id") < 100)
      Graph.temporalReachability(e, seeds, maxHops = 4).orderBy("id")
    }),
    // --- Borůvka minimum spanning forest over the co-occurrence
    // SIMILARITY graph (w = 1e6 − pair count, so the min-w forest is
    // the single-linkage dendrogram's merge order); every chosen edge
    // is certified in the unique MST at any round budget
    "graph_mst" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      val b = li.select(col("l_orderkey").as("g"), col("l_partkey").as("item"))
        .distinct()
        .withColumn("gsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")))
        .filter(col("gsz") <= 100).drop("gsz")
      val ew = b.as("l")
        .join(b.as("r"), col("l.g") === col("r.g") &&
          col("l.item") < col("r.item"))
        .groupBy(col("l.item").as("src"), col("r.item").as("dst"))
        .agg((lit(1000000L) - count(lit(1))).as("w"))
        .filter(col("w") <= 999998L) // pair count >= 2
      // mergeCap 16 with pointer jumping reaches chains of ~2^16; the
      // oracle keeps its 6 single-hop unrolled steps — both sides stop
      // at the SAME converged min-label fixed point (extra steps are
      // no-ops), so the twin is unchanged (the sf10 graph_mst lesson)
      Graph.boruvkaForest(ew, rounds = 3, mergeCap = 16)
        .orderBy("round", "lo", "hi")
    }),
    // --- Jones–Plassmann greedy coloring over the same sampled part
    // co-occurrence graph: md5-priority local maxima take the mex of
    // their colored neighbourhood each round; budget leftovers NULL
    "graph_coloring" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      Graph.greedyColoring(
        Graph.coOccurrence(li, "l_orderkey", "l_partkey"), rounds = 6)
        .orderBy("id")
    }),
    "graph_triangles" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      Graph.triangleCounts(
        Graph.coOccurrence(li, "l_orderkey", "l_partkey")).orderBy("id")
    }),
    // --- community conductance over the same co-occurrence graph with
    // brand communities: cut share of each community's edge volume
    "graph_conductance" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      val e = Graph.coOccurrence(li, "l_orderkey", "l_partkey")
      val labels = rd(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_brand").as("c"))
      Graph.conductance(e, labels).orderBy("c")
    }),
    // --- length-3 sequential patterns: two lead() steps, bounded
    // type³ frame, support filter, pinned top-20
    "events_seq3" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.seqTriples(ev, minSupport = 5L, topK = 20).orderBy("rank")
    }),
    // --- embedding drift between the two vec_id-parity generations:
    // exact per-dim fixed-point means, L1 drift + worst dimension
    "embed_drift" -> ((s, dir) =>
      Similarity.embeddingDrift(rd(s, dir, "embeddings"),
        col("vec_id") % 2 === 0)),
    // --- per-node clustering coefficient over the same graph
    "graph_clustering" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      Graph.clusteringCoefficient(
        Graph.coOccurrence(li, "l_orderkey", "l_partkey")).orderBy("id")
    }),
    // --- link prediction (common-neighbor + resource-allocation) over
    // the same sampled part co-occurrence graph: top-5 NEW part-part
    // links per node, hub centers capped at deg 100 (oracle replicates)
    "graph_linkpred" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      val co = Graph.coOccurrence(li, "l_orderkey", "l_partkey")
      Graph.linkPredict(co, topK = 5, maxDeg = 100).orderBy("src", "rank")
    }),
    // --- end-to-end blue/green load (row 33): the reference's headline
    // path (load_with_aliases.py:216-249) as ONE verified query — stage a
    // snapshot layout from the sf tables, run abort→create→node fan-out→
    // edge fan-out→alias switch→keep-2 cleanup through the in-memory
    // transport, and emit counts-by-stage + the system-statement plan.
    // Counts come back through executor-side accumulators; statements are
    // fully determined by the (existingDbs, aliases) scenario.
    // --- text-format ingestion round trips: the oracle reads the SAME
    // rows straight from parquet, so a hash match proves the
    // serializer/parser pair preserves quotes, newlines, and unicode
    // exactly (md5 over the round-tripped text vs the original)
    // fixed staging dirs (load_e2e pattern): the round trip writes with
    // mode overwrite, so repeat invocations reuse one directory instead
    // of leaking a fresh tempdir copy of the corpus per Verify/Bench rep
    "load_jsonl" -> ((s, dir) => {
      val staged = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_jsonl").toString
      Ingest.jsonlRoundTrip(rd(s, dir, "documents"), staged)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    "load_csv" -> ((s, dir) => {
      val staged = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_csv").toString
      Ingest.csvRoundTrip(rd(s, dir, "documents"), staged)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    // --- binaryFile media ingestion: staged raw payload files read back
    // as (id, length, content) rows; md5 over raw bytes == md5 of the
    // UTF-8 string, so the integrity check has an exact DuckDB twin
    "load_binary" -> ((s, dir) => {
      val staged = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_bin").toString
      Ingest.binaryRoundTrip(rd(s, dir, "documents"), staged)
        .orderBy("doc_id")
    }),
    "load_e2e" -> ((s, dir) => {
      import java.nio.file.Paths
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_load_e2e")
      rd(s, dir, "customer").select(
        col("c_custkey"),
        concat_ws(",", col("c_mktsegment"), lit("Customer")).as("labels"),
        col("c_name"), col("c_acctbal"))
        .write.mode("overwrite")
        .parquet(base.resolve("acme/20240301/nodes/customer").toString)
      rd(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"))
        .write.mode("overwrite")
        .parquet(base.resolve("acme/20240301/relationships/orders").toString)
      E2eTransport.reset()
      val r = LoadPipeline.loadAndSwitch(s, "acme", 20240301L, base,
        E2eTransport.factory,
        existingDbs = Seq("acme-20240101", "acme-20240201"),
        currentAliases = Map("acme" -> "acme-20240201"),
        system = _ => ())
      val rows = Seq(
        (1L, "nodes", r.database, r.nodeCount),
        (2L, "relationships", r.database, r.relationshipCount)) ++
        r.aliasStatements.zipWithIndex.map { case (st, i) =>
          (i + 3L, "statement", st, 0L)
        }
      import s.implicits._
      rows.toDF("step", "stage", "detail", "n").orderBy("step")
    }),
    "bluegreen_keep2" -> ((s, dir) => {
      val deps = rd(s, dir, "orders").select(
        col("o_custkey").as("customer_id"),
        unix_timestamp(col("o_orderdate")).as("snapshot_ts"),
        col("o_orderkey").as("entity_id"))
      BlueGreen.keepNewestK(deps, 2).orderBy("customer_id", "drop_rank")
    }),
    // --- dedup family (rows 17-21)
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(rd(s, dir, "documents")).orderBy("doc_id")),
    // --- soft dedup: every copy kept at weight 1/n_copies
    "dedup_weights" -> ((s, dir) =>
      Dedup.duplicationWeights(rd(s, dir, "documents")).orderBy("doc_id")),
    // --- target-mix sampling rates (no-upsampling scale election)
    "mix_rates" -> ((s, dir) =>
      Sampling.ratesForTarget(rd(s, dir, "documents"),
        Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .orderBy("source")),
    // --- per-source duplication profile (drives sampling weights)
    "dedup_report" -> ((s, dir) =>
      Dedup.dedupReport(rd(s, dir, "documents"), "source")
        .orderBy("source")),
    "dedup_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(rd(s, dir, "documents")).orderBy("a_id", "b_id")),
    // --- TF-weighted jaccard: Σmin/Σmax over 3-gram multiplicities,
    // closed by the one posting join (Σmax = a+b−Σmin), integer ppm
    "dedup_jaccard_weighted" -> ((s, dir) =>
      Dedup.weightedJaccard(rd(s, dir, "documents"))
        .orderBy("a_id", "b_id")),
    // --- exact duplicated-substring spans (relational ExactSubstr)
    "dedup_spans" -> ((s, dir) =>
      Dedup.duplicatedSpans(rd(s, dir, "documents"), 5)
        .orderBy("doc_id", "span_id")),
    // --- prefix-filtered shingle-set join: lossless candidate pruning
    // (3-gram sets — see tokenJaccardPrefix scaladoc for why word sets
    // defeat the filter on this vocabulary)
    "dedup_jaccard_prefix" -> ((s, dir) =>
      Dedup.tokenJaccardPrefix(rd(s, dir, "documents"), 0.8, ngram = 3)
        .orderBy("a_id", "b_id")),
    // directional containment over the same 3-gram shingle space — the
    // quote/subset pairs jaccard's union denominator suppresses
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentJoin(rd(s, dir, "documents"), 0.8, ngram = 3)
        .orderBy("a_id", "b_id")),
    // --- block-hash perceptual near-dup over binary payloads: planted
    // copies perturb only the last 3 bytes, flipping one 4-bit block
    "multimodal_phash" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 40).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 3)"), lit("XXX"))
          .as("text"))
      Multimodal.mediaNearDup(Multimodal.asMedia(docs.unionByName(planted)))
        .orderBy("a_id", "b_id")
    }),
    // --- media dedup END-TO-END: block-hash pairs → connected
    // components → representative election (exact + perturbed copies
    // planted; every copy family must collapse to one representative)
    "multimodal_dedup" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = docs.filter(col("doc_id") < 40).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 3)"), lit("XXX"))
          .as("text"))
      val exact = docs.filter(col("doc_id") < 10).select(
        (col("doc_id") + 200000L).as("doc_id"), col("text"))
      val media = Multimodal.asMedia(
        docs.unionByName(perturbed).unionByName(exact))
      val pairs = Multimodal.mediaNearDup(media)
        .select(col("a_id"), col("b_id"))
      val clusters = Dedup.resolveClusters(pairs)
        .select(col("doc_id").as("media_id"), col("cluster_id"))
      media.select(col("media_id"))
        .join(clusters, Seq("media_id"), "left")
        .withColumn("cluster_id",
          coalesce(col("cluster_id"), col("media_id")))
        .withColumn("is_representative",
          col("media_id") === col("cluster_id"))
        .orderBy("media_id")
    }),
    // --- temperature-flattened mixture rates (iterated-sqrt weights)
    "mix_temperature" -> ((s, dir) =>
      Sampling.temperatureRates(rd(s, dir, "documents"), 4)
        .orderBy("source")),
    // rolling ingestion: docs >= 250 are "today's batch", the rest are
    // the already-ingested corpus whose checksums form the index
    "dedup_incremental" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      Dedup.incrementalExact(
        docs.filter(col("doc_id") >= 250),
        Dedup.exact(docs.filter(col("doc_id") < 250)).select("checksum"))
        .orderBy("doc_id")
    }),
    // Registered projection drops est_jaccard (signature arithmetic is
    // engine-specific) and keeps the PAIR SET, which does have an exact
    // oracle on this corpus: near-dup pairs sit at true J >= 0.9 and
    // everything else below 0.25 (verified at sf0.01), so at 8 bands x 4
    // rows a true pair misses every band with p < 2e-4 and no borderline
    // pair exists for the estimate to flip — the fixed-seed LSH pair set
    // equals the exact unpruned-jaccard pair set at tau.
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLsh(rd(s, dir, "documents"))
        .select("a_id", "b_id").orderBy("a_id", "b_id")),
    // --- incremental LSH: docs with id % 5 == 0 play the day's crawl,
    // the rest the already-ingested index; pair set == full LSH
    // restricted to pairs touching the batch (invariant + oracle)
    "dedup_minhash_incremental" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      Dedup.incrementalMinHash(docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0))
        .select(col("a_id"), col("b_id"), col("via"))
        .orderBy("a_id", "b_id")
    }),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simHash(rd(s, dir, "documents")).orderBy("a_id", "b_id")),
    "dedup_winnow" -> ((s, dir) =>
      Dedup.winnowNearDup(rd(s, dir, "documents")).orderBy("a_id", "b_id")),
    "dedup_clusters" -> ((s, dir) =>
      Dedup.resolveClusters(
        Dedup.ngramJaccard(rd(s, dir, "documents")).select("a_id", "b_id"))
        .orderBy("doc_id")),
    // --- incremental CC: md5-split the jaccard pairs into an "old" half
    // (resolved to labels) and a "new" batch merged via label edges —
    // labels must come out row-identical to resolving everything at once
    // (same oracle as dedup_clusters)
    "dedup_clusters_incremental" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccard(rd(s, dir, "documents"))
        .select(col("a_id"), col("b_id"))
        .withColumn("p", conv(substring(md5(concat(
          col("a_id").cast("string"), lit(":"),
          col("b_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2)
        .localCheckpoint(true) // referenced by both halves: compute once
      val labels = Dedup.resolveClustersStar(
        pairs.filter(col("p") === 0).select(col("a_id"), col("b_id")))
      Dedup.mergeClusters(labels,
        pairs.filter(col("p") === 1).select(col("a_id"), col("b_id")))
        .orderBy("doc_id")
    }),
    // --- leakage-safe split: near-dup clusters (same pair graph as
    // dedup_clusters) assigned to train/val atomically by cluster-id md5
    "split_leakage_safe" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      Sampling.leakageSafeSplit(docs,
          Dedup.ngramJaccard(docs).select("a_id", "b_id"))
        .orderBy("doc_id")
    }),
    // same pair graph through the O(log n) large-star/small-star path —
    // must produce the identical component table (same oracle SQL)
    "dedup_clusters_star" -> ((s, dir) =>
      Dedup.resolveClustersStar(
        Dedup.ngramJaccard(rd(s, dir, "documents")).select("a_id", "b_id"))
        .orderBy("doc_id")),
    // --- paragraph-level exact dedup (C4-style repeated-span removal).
    // The corpus has no natural repeated spans (random word soup), so the
    // query segments docs into 10-token windows and PLANTS a copied
    // passage: each doc_id < 25 also carries the first window of doc
    // doc_id+100 (appended at para_idx 1e6). The planted copy is the
    // lexicographic keeper, so the donor's first paragraph is dropped —
    // both the construction and the keeper rule are plain SQL, making the
    // oracle exact.
    // --- CROSS-doc repeated-substring spans (dedup_spans counts any
    // repetition incl. within-doc; this df counts DISTINCT docs — the
    // leakage/contamination flavor): docs < 30 get the first 20 tokens
    // of doc_id+200 appended — both sides of each copy must surface as
    // ONE maximal span (interval-union islands), plus whatever 8-grams
    // the corpus shares coincidentally
    "dedup_spans_xdoc" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val donors = docs.filter(col("doc_id") >= 200 && col("doc_id") < 230)
        .select((col("doc_id") - 200).as("doc_id"),
          expr("array_join(slice(split(trim(text), '\\\\s+'), 1, 20), ' ')")
            .as("passage"))
      val planted = docs.join(donors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("passage").isNotNull,
            concat(col("text"), lit(" "), col("passage")))
            .otherwise(col("text")).as("text"))
      Dedup.repeatedSpans(planted).orderBy("doc_id", "span_start")
    }),
    // --- the removal TRANSFORM over the same planted corpus: cut every
    // cross-doc repeated span, return cleaned text + kept/dropped counts
    "dedup_spans_remove" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val donors = docs.filter(col("doc_id") >= 200 && col("doc_id") < 230)
        .select((col("doc_id") - 200).as("doc_id"),
          expr("array_join(slice(split(trim(text), '\\\\s+'), 1, 20), ' ')")
            .as("passage"))
      val planted = docs.join(donors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("passage").isNotNull,
            concat(col("text"), lit(" "), col("passage")))
            .otherwise(col("text")).as("text"))
      Dedup.removeRepeatedSpans(planted).orderBy("doc_id")
    }),
    "dedup_paragraph" -> ((s, dir) => {
      val toks = rd(s, dir, "documents").select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("t"))
      val own = toks
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, cast(ceil(size(t)/10.0) as int)), " +
            "i -> array_join(slice(t, (i-1)*10+1, 10), ' '))"))
          .as(Seq("pos", "para")))
        .select(col("doc_id"), (col("pos") + 1L).as("para_idx"), col("para"))
      val planted = toks
        .filter(col("doc_id") >= 100 && col("doc_id") < 125)
        .select((col("doc_id") - 100).as("doc_id"),
          lit(1000000L).as("para_idx"),
          array_join(slice(col("t"), 1, 10), " ").as("para"))
      Dedup.paragraphDedup(own.unionAll(planted)).orderBy("doc_id")
    }),
    // --- C4 boilerplate rule: every doc carries the same planted header
    // paragraph (df = corpus size >= the threshold), which must vanish
    // from ALL docs while ordinary paragraphs keep their first occurrence.
    "dedup_boilerplate" -> ((s, dir) => {
      val toks = rd(s, dir, "documents").select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("t"))
      val own = toks
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, cast(ceil(size(t)/10.0) as int)), " +
            "i -> array_join(slice(t, (i-1)*10+1, 10), ' '))"))
          .as(Seq("pos", "para")))
        .select(col("doc_id"), (col("pos") + 1L).as("para_idx"), col("para"))
      val header = toks.select(col("doc_id"), lit(0L).as("para_idx"),
        lit("copyright license terms apply to this document").as("para"))
      Dedup.paragraphDedup(own.unionAll(header), boilerplateDf = 100L)
        .orderBy("doc_id")
    }),
    // --- SemDeDup-style semantic dedup. Planted-copy oracle (the
    // dedup_embedding argument): identical vectors land in the same
    // k-means cluster (identical distances, same deterministic tiebreak)
    // and share every LSH bucket, cosine exactly 1.0 >= tau; no natural
    // pair reaches tau (max natural cosine ~0.51). Survivors are
    // therefore provably the original ids; the copy always drops. The
    // cluster column is kmeans-internal and excluded from the compare.
    "dedup_semantic" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = e.filter(col("vec_id") < 25)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      Dedup.semanticDedup(e.unionAll(planted), 16, 0.95)
        .select("vec_id").orderBy("vec_id")
    }),
    "dedup_embedding" -> ((s, dir) => {
      // The corpus has no natural pairs above tau (max cosine ~0.51 at
      // sf0.01), so the query plants exact duplicates of the first 25
      // vectors under shifted ids. Identical vectors share every LSH band
      // bucket, so the bucketed path provably finds all of them — which
      // makes the brute-force DuckDB pair scan an exact oracle.
      val e = rd(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = e.filter(col("vec_id") < 25)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      Dedup.embeddingNearDup(e.unionAll(planted), 0.95)
        .orderBy("a_id", "b_id")
    }),
    // --- similarity search (rows 22-23)
    "ann_brute" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      Similarity.bruteTopK(e.select(col("vec_id"), col("embedding")), q, 10)
        .orderBy("query_id", "rank")
    }),
    // --- hubness audit: k-occurrence distribution over a deterministic
    // id-sample probe of the corpus against itself
    "embed_hubness" -> ((s, dir) =>
      Similarity.hubnessCard(rd(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding")))),
    // --- margin-based pair mining: even-id vectors play the source
    // language, odd-id the target; integer-scaled ratio margin
    "embed_align" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Similarity.marginAlign(
        e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1))
        .orderBy("src_id", "tgt_id")
    }),
    // The approximate ANN paths (lsh/ivf/pq) register their PLANTED
    // top-1 form for an exact oracle (the dedup_embedding pattern): the
    // corpus gains an identical copy of each query at vec_id+100000.
    // Identical vectors share every sign bucket (same dot products →
    // same signs), the same nearest IVF list (same centroid distances,
    // same deterministic tie-break), and the block-wise-minimal PQ codes
    // (ADC(q, copy) = Σ_b min_c ‖q_b−c‖² — the global ADC minimum), so
    // each path provably surfaces the copy as a candidate; exact cosine
    // re-rank then makes it rank 1 (cosine ≈1 vs a natural max ~0.51).
    // Full-top-k behavior keeps its recall gates in SimilaritySpec.
    "ann_ivf" -> ((s, dir) => {
      val (corpus, q) = plantedAnnInputs(s, dir)
      Similarity.ivfTopK(corpus, q, 10)
        .filter(col("rank") === 1).select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),
    "ann_lsh" -> ((s, dir) => {
      val (corpus, q) = plantedAnnInputs(s, dir)
      Similarity.lshTopK(corpus, q, 10)
        .filter(col("rank") === 1).select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),
    "ann_pq" -> ((s, dir) => {
      val (corpus, q) = plantedAnnInputs(s, dir)
      Similarity.pqTopK(corpus, q, 10)
        .filter(col("rank") === 1).select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),
    // IVF+PQ composite: the copy shares the query's nearest list (same
    // centroid distances, same deterministic tie-break) so it IS among
    // the probed candidates, where its code is the blockwise-minimal ADC
    // (the ann_pq argument) — rank 1 after the exact re-rank
    "ann_ivfpq" -> ((s, dir) => {
      val (corpus, q) = plantedAnnInputs(s, dir)
      Similarity.ivfPqTopK(corpus, q, 10)
        .filter(col("rank") === 1).select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),
    // Incremental IVF maintenance e2e: build the index from the BASE
    // corpus only, ivfAppend the planted copies as a later batch (no
    // corpus re-shuffle — only the batch is assigned), query the
    // appended layout. Centroids come from the base fit, but the planted
    // argument is unchanged: copy ≡ query vector, so the copy's n=1
    // assignment list IS the query's top probe list under the same
    // deterministic tie-break, the copy is a candidate, and exact
    // re-ranking puts it at rank 1. The index dir is reset per run so a
    // bench x3 re-run can't double-append.
    "ann_ivf_incremental" -> ((s, dir) => {
      val (corpus, q) = plantedAnnInputs(s, dir)
      val base = corpus.filter(col("vec_id") < 100000L)
      val batch = corpus.filter(col("vec_id") >= 100000L)
      val path = "/tmp/graft_ann_ivf_inc"
      rmTree(path)
      Similarity.writeIvfIndex(base, path)
      Similarity.ivfAppend(s, batch, path)
      Similarity.ivfTopKIndexed(s, q, path, 10)
        .filter(col("rank") === 1).select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),
    // --- text analysis (rows 25-28)
    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokens(rd(s, dir, "documents")).orderBy("doc_id")),
    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(rd(s, dir, "documents")).orderBy("doc_id")),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(rd(s, dir, "documents")).orderBy("doc_id")),
    // --- unicode-script/charset profile: writing-system card
    "text_scripts" -> ((s, dir) =>
      TextAnalysis.scriptProfile(rd(s, dir, "documents"))
        .orderBy("doc_id")),
    // --- langid confusion matrix vs the labeled lang column
    "text_langid_eval" -> ((s, dir) =>
      TextAnalysis.langIdEval(rd(s, dir, "documents"))
        .orderBy("lang", "predicted_lang")),
    // --- degree-distribution power-law card over the order-part graph
    "graph_degree_dist" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst")).distinct()
      Graph.degreeDistribution(ed).orderBy("deg_bucket")
    }),
    // --- embedding anisotropy via the sum identity (no pair scan)
    "embed_isotropy" -> ((s, dir) =>
      Similarity.isotropyCard(rd(s, dir, "embeddings"))),
    // --- tokenizer bytes-per-token efficiency by source
    "text_compression" -> ((s, dir) =>
      TextAnalysis.compressionCard(rd(s, dir, "documents"))
        .orderBy("source")),
    // --- half-life-decayed popularity: exact bit-shift weights
    "events_decay" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.decayedPopularity(ev).orderBy("event_type")
    }),
    // --- GraphSAGE-style 2-layer neighborhood aggregation over the
    // mirrored order-part graph with degree as the node feature
    "graph_neighbor_agg" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst")).distinct()
      val e = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      val feats = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("f"))
      Graph.neighborAgg(e, feats).orderBy("id")
    }),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(rd(s, dir, "documents")).orderBy("doc_id")),
    "text_ngrams" -> ((s, dir) =>
      TextAnalysis.ngramFreq(rd(s, dir, "documents"))
        .orderBy(desc("doc_freq"), asc("ngram"))),
    // --- n-gram novelty: share of the odd-id side's distinct bigrams
    // unseen on the even-id side — the memorization complement of the
    // contamination check
    "text_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(rd(s, dir, "documents"),
        col("doc_id") % 2 === 0)),
    "text_winnow" -> ((s, dir) =>
      TextAnalysis.winnowFingerprints(rd(s, dir, "documents"))
        .orderBy("doc_id", "fp")),
    "text_bpe" -> ((s, dir) =>
      TextAnalysis.bpeTokens(rd(s, dir, "documents")).orderBy("doc_id")),
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(rd(s, dir, "documents")).orderBy("doc_id")),
    "text_pii" -> ((s, dir) => {
      // the corpus carries no natural PII, so the query plants a
      // deterministic contact line per doc (same construction in the
      // oracle) — redaction counts and the scrubbed-text hash stay exact
      val docs = rd(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-0123 from 10.0.0."),
          (col("doc_id") % 256).cast("string")).as("text"))
      TextAnalysis.redactPii(docs).orderBy("doc_id")
    }),
    "text_contamination" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      TextAnalysis.contamination(docs, docs.filter(col("doc_id") < 20))
        .orderBy("doc_id")
    }),
    "quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(rd(s, dir, "documents")).orderBy("doc_id")),
    "text_rarity" -> ((s, dir) =>
      TextAnalysis.tokenRarity(rd(s, dir, "documents")).orderBy("doc_id")),
    "text_topterms" -> ((s, dir) =>
      TextAnalysis.topTerms(rd(s, dir, "documents"))
        .orderBy("doc_id", "term_rank")),
    "source_mix" -> ((s, dir) =>
      Sampling.sourceMix(rd(s, dir, "documents")).orderBy("source", "lang")),
    "corpus_stats" -> ((s, dir) =>
      Sampling.corpusStats(rd(s, dir, "documents")).orderBy("lang")),
    // --- sentence segmentation over staged punctuated text (the corpus
    // ships punctuation-free, so the splitter is exercised on
    // deterministically rebuilt 8-token sentences — the web_extract /
    // dedup_paragraph staging precedent)
    "docs_sentences" -> ((s, dir) => {
      val toks = rd(s, dir, "documents").select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("t"))
      val staged = toks.select(col("doc_id"), expr(
        "concat(array_join(transform(sequence(1, " +
          "cast(ceil(size(t)/8.0) as int)), " +
          "i -> array_join(slice(t, (i-1)*8+1, 8), ' ')), '. '), '.')")
        .as("text"))
      TextAnalysis.sentences(staged).orderBy("doc_id", "sent_idx")
    }),
    // --- skip-gram PMI-ratio association pairs (±2 window): equi-joins
    // on (doc_id, pos+k), integer ratio (log-free PMI twin), top-40
    "text_pmi" -> ((s, dir) =>
      TextAnalysis.skipgramStats(rd(s, dir, "documents"), window = 2,
        topK = 40).orderBy(desc("ratio_ppm"), asc("tok_a"), asc("tok_b"))),
    // --- Heaps-law vocabulary growth per 10-doc checkpoint: the
    // first-occurrence formulation (a type is new at the bucket of its
    // min doc_id), window only over the bounded checkpoint frame
    "corpus_heaps" -> ((s, dir) =>
      TextAnalysis.heapsGrowth(rd(s, dir, "documents"), 10L)
        .orderBy("bucket")),
    // --- Zipf rank-frequency card: log2 buckets via portable bit-length,
    // slope from four integer sums with ONE final double division
    "corpus_zipf" -> ((s, dir) =>
      TextAnalysis.zipfProfile(rd(s, dir, "documents"))
        .orderBy("rank_bucket")),
    // --- TextRank keywords: pageRank's fixed-point BIGINT rounds over
    // the window-2 word co-occurrence graph, top-20 by centrality
    "text_textrank" -> ((s, dir) =>
      TextAnalysis.textRank(rd(s, dir, "documents")).orderBy("rk")),
    // --- preference-pair mining: best-vs-worst alpha-ratio-scored doc
    // per source, partial-aggregable argmin/argmax extremes (no rank
    // window over group members), integer-ppm scores
    "pref_pairs" -> ((s, dir) => {
      val scored = rd(s, dir, "documents")
        .withColumn("alpha",
          length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"))
        .withColumn("score",
          expr("alpha * 1000000L div greatest(length(text), 1)"))
        .select(col("source"), col("doc_id"), col("score"))
      Sampling.preferencePairs(scored, "source", "doc_id", "score", 1L)
        .orderBy("source")
    }),
    // --- training-set assembly
    "split_assign" -> ((s, dir) =>
      Sampling.splitAssign(
        rd(s, dir, "documents").select(col("doc_id")), "doc_id")
        .orderBy("doc_id")),
    "label_balance" -> ((s, dir) =>
      Sampling.labelBalance(rd(s, dir, "embeddings"), "label")
        .orderBy("label")),
    "label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(rd(s, dir, "embeddings"))
        .orderBy("label", "dim")),
    // --- embedding QC: integer-exact distance-to-centroid outlier sweep
    "embed_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(rd(s, dir, "embeddings"))
        .orderBy("vec_id")),
    "mixture_resample" -> ((s, dir) =>
      Sampling.mixtureResample(
        rd(s, dir, "documents").select(col("doc_id"), col("source")),
        Seq("src0" -> 0.0, "src1" -> 0.25, "src2" -> 0.5), 1.0)
        .orderBy("doc_id")),
    "pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(rd(s, dir, "documents"), 256L)
        .orderBy("doc_id")),
    // --- length-bucketed inference batches: per-shard descending-length
    // fill, per-batch padding economics
    "pack_batches" -> ((s, dir) =>
      Sampling.lengthBatches(rd(s, dir, "documents"), 512L)
        .orderBy("shard", "batch_id")),
    // --- content-defined chunking: hash-determined boundaries, chunk
    // checksums stable under early insertions
    "dedup_chunks" -> ((s, dir) =>
      Dedup.cdcChunks(rd(s, dir, "documents"), 32)
        .orderBy("doc_id", "chunk_idx")),
    // --- multimodal plumbing (row 24)
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.payloadMeta(rd(s, dir, "documents")).orderBy("media_id")),
    // --- events + analytics (rows 29-30)
    "events_window" -> ((s, dir) => {
      // events.ts is parquet TIMESTAMP(NANOS); Spark's TimestampType is
      // micros-based, so read nanos as raw longs (see Events.scaladoc).
      Events.hourlyRollup(rdEvents(s, dir)).orderBy("hour_ts", "event_type")
    }),
    "events_sessions" -> ((s, dir) => {
      Events.sessionize(rdEvents(s, dir))
        .orderBy("user_id", "session_idx")
    }),
    // per-event rolling features: same-user activity in the trailing day
    "events_trailing" -> ((s, dir) => {
      val dayUs = 86400000000L
      val ev = rdEvents(s, dir).withColumn("ts", expr("ts div 1000"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      Events.trailingActivity(ev, dayUs)
        .select(col("event_id"), col("user_id"), col("trailing_events"),
          col("trailing_value"))
        .orderBy("event_id")
    }),
    // post-purchase attribution: count each user's events inside the hour
    // after each of their purchases — a keyed interval-containment join
    // that stays an equi-join on (time cell, user)
    "events_range" -> ((s, dir) => {
      val hourUs = 3600000000L
      val ev = rdEvents(s, dir).withColumn("ts", expr("ts div 1000"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("interval_id"), col("user_id"),
          col("ts").as("start_ts"), (col("ts") + hourUs).as("end_ts"))
      val probe = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts"))
      Events.rangeJoin(probe, windows, Seq("user_id"), hourUs)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .orderBy("interval_id")
    }),
    // state-at-event-time: each non-purchase event gets the user's latest
    // preceding purchase; the oracle is DuckDB's NATIVE ASOF JOIN, so the
    // union-tag composition is checked against a first-class
    // implementation of the semantics. Times truncate to MICROseconds on
    // both sides: DuckDB reads parquet TIMESTAMP(NANOS) at us precision,
    // and us epochs stay under 2^53 so the driver compare's nullable-int
    // float coercion is lossless too.
    "events_asof" -> ((s, dir) => {
      val ev = rdEvents(s, dir)
        .withColumn("ts", expr("ts div 1000"))
      val probe = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val state = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      Events.joinAsOf(probe, state, "user_id", "ts", Seq("value"))
        .orderBy("event_id")
    }),
    // --- forward as-of: each non-purchase event enriched with the NEXT
    // purchase state at or after it (time-to-next-state / leakage audit)
    "events_asof_forward" -> ((s, dir) => {
      val ev = rdEvents(s, dir)
        .withColumn("ts", expr("ts div 1000"))
      val probe = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val state = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      Events.joinAsOfForward(probe, state, "user_id", "ts", Seq("value"))
        .orderBy("event_id")
    }),
    // --- feature-store point-in-time join: purchases enriched with the
    // latest prior view value AND the cumulative click count as-of the
    // purchase — two composed joinAsOf passes over (user,ts)-unique
    // pre-aggregated feature states (no leakage from future rows)
    "features_pit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = rdEvents(s, dir).withColumn("ts", expr("ts div 1000"))
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val viewState = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
      val clickCum = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(count(lit(1)).as("c"))
        .withColumn("clicks_so_far", sum(col("c")).over(
          Window.partitionBy("user_id").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("user_id"), col("ts"), col("clicks_so_far"))
      val f1 = Events.joinAsOf(probe, viewState, "user_id", "ts",
          Seq("view_value"))
        .withColumnRenamed("asof_time", "view_time")
      Events.joinAsOf(f1, clickCum, "user_id", "ts", Seq("clicks_so_far"))
        .withColumnRenamed("asof_time", "click_time")
        .orderBy("event_id")
    }),
    // --- SCD2 point-in-time enrichment: a tier change-log staged from
    // signup events → Cdc.scd2 history → purchases pick up the version
    // valid at their event time via joinAsOf (no leakage from later
    // versions). The warehouse-standard "dimension as of the fact".
    "events_scd2_join" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      val log = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("seq"),
          col("event_id").as("tie"),
          concat(lit("tier"), (conv(substring(md5(concat(
            col("user_id").cast("string"), lit(":"),
            col("ts").cast("string"))), 1, 8), 16, 10).cast("long") % 3)
            .cast("string")).as("tier"))
      val hist = Cdc.scd2(log, "user_id", "tier", "seq", "tie")
        .select(col("user_id"), col("valid_from").as("ts"), col("tier"),
          col("version"))
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Events.joinAsOf(probe, hist, "user_id", "ts", Seq("tier", "version"))
        .orderBy("event_id")
    }),
    // --- 3-day-windowed funnel: greedy earliest-match, each step within
    // 3 days of the previous step's match
    "events_funnel_windowed" -> ((s, dir) => {
      val ev = rdEvents(s, dir).withColumn("ts", expr("ts div 1000"))
        .select(col("user_id"), col("event_type"), col("ts"))
      Events.funnelWindowed(ev, Seq("signup", "view", "click", "purchase"),
        windowSize = 3L * 86400000000L).orderBy("step_idx")
    }),
    // ordered funnel over the event stream; micro-truncated times so both
    // engines compare identical integers
    "events_funnel" -> ((s, dir) => {
      val ev = rdEvents(s, dir).withColumn("ts", expr("ts div 1000"))
        .select(col("user_id"), col("event_type"), col("ts"))
      Events.funnel(ev, Seq("signup", "view", "click", "purchase"))
        .orderBy("step_idx")
    }),
    "events_retention" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.retention(ev).orderBy("cohort_day", "day_offset")
    }),
    // --- A/B readout: md5-parity variant split, conversion = purchase,
    // engine-exact two-proportion z-score (integer counts -> IEEE chain)
    "events_ab" -> ((s, dir) => {
      val ev = rdEvents(s, dir)
        .select(col("user_id"), col("event_type"), col("value"))
      // conversion = a high-value purchase (plain comparison, portable);
      // bare event presence converts EVERY user at these SFs (zero
      // pooled variance -> NULL z), so threshold on value
      Events.abTest(ev, col("event_type") === "purchase" && col("value") > 180)
    }),
    // --- distribution-free permutation test on the same split: 200
    // md5-relabeled nulls, cross-multiplied integer stat, add-one p
    "events_permutation" -> ((s, dir) => {
      val ev = rdEvents(s, dir)
        .select(col("user_id"), col("event_type"), col("value"))
      Events.permutationTest(ev,
        col("event_type") === "purchase" && col("value") > 180, reps = 200)
    }),
    // --- per-type daily OLS trend: exact integer sufficient statistics,
    // slope/intercept each one double division
    "events_trend" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.trendSlope(ev).orderBy("event_type")
    }),
    // --- per-user integer EWMA (alpha = 1/8); ts truncated to micros so
    // the sort order matches DuckDB's microsecond view of the parquet
    "events_ewma" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("ts div 1000").as("ts"), col("event_id"), col("value"))
      Events.ewma(ev, 3).orderBy("user_id")
    }),
    // --- trending rollup: top-3 event types per day, deterministic ties
    "events_daily_topk" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(
        expr("(ts div 1000) div 86400000000").as("day"), col("event_type"))
      Events.dailyTopK(ev, 3).orderBy("day", "rank")
    }),
    "events_anomaly" -> ((s, dir) => {
      Events.anomalies(rdEvents(s, dir)).orderBy("event_id")
    }),
    // --- multi-touch attribution: purchases credited to click/view
    // touches in a 7-day lookback under first/last/linear models
    "events_attribution" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.attribution(ev).orderBy("touch_type")
    }),
    // --- OHLC bar downsampling per (user, day), fixed-point exact
    "events_ohlc" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"), col("value"))
      Events.ohlcBars(ev).orderBy("user_id", "day")
    }),
    // --- robust MAD outliers; doubled integers clear the interpolated
    // median's half-fractions so the flag test is pure BIGINT
    "events_outliers_mad" -> ((s, dir) => {
      Events.madOutliers(rdEvents(s, dir)).orderBy("event_id")
    }),
    // --- correlation-aware 2-D Mahalanobis outliers: exact integer
    // adjugate form, one moment row broadcast, top-5 TakeOrdered
    "events_mahalanobis" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"), col("value"))
      Events.mahalanobisOutliers(ev, topK = 5)
    }),
    // --- row-level quarantine split: reasons joined in rule order,
    // pass/fail route counts (zero shuffles on the fact stream)
    "dq_quarantine" -> ((s, dir) => {
      Quality.quarantine(rd(s, dir, "lineitem"), Seq(
        Quality.InRange("l_quantity", 1, 40),
        Quality.InRange("l_discount", 0, 0.05)))
        .groupBy(col("quarantined"), col("reasons"))
        .agg(count(lit(1)).as("n"))
        .orderBy("quarantined", "reasons")
    }),
    // --- referential integrity: staged orphan/NULL foreign keys on
    // the lineitem->orders relationship, one-row audit card
    "dq_orphans" -> ((s, dir) => {
      val fact = rd(s, dir, "lineitem").select(
        expr("CASE WHEN l_linenumber = 7 THEN l_orderkey + 100000000 " +
          "WHEN l_linenumber = 6 THEN NULL ELSE l_orderkey END").as("fk"))
      Quality.orphans(fact, "fk", rd(s, dir, "orders"), "o_orderkey")
    }),
    // --- functional-dependency audit: nationkey -> mktsegment is
    // violated for every nation; per-violating-key profile card
    "dq_fd" -> ((s, dir) =>
      Quality.fdViolations(rd(s, dir, "customer"),
        "c_nationkey", "c_mktsegment").orderBy("k")),
    // --- funnel timing: first-signup -> first-subsequent-purchase
    // latency, one-row rollup with doubled-exact median
    "events_conversion_lag" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.conversionLatency(ev)
    }),
    // --- Poisson-style daily burst flags, square-cleared to integers
    "events_bursts" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.burstDays(ev, 2).orderBy("event_type", "day")
    }),
    // --- CUSUM change-point per type over the integer deviation walk
    "events_changepoint" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.changePoint(ev).orderBy("event_type")
    }),
    // --- deterministic half-sample bootstrap CI for the per-type mean
    "value_bootstrap" -> ((s, dir) => {
      val v = rdEvents(s, dir).select(col("event_type").as("group"),
        col("event_id").as("id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v100"))
      Sampling.bootstrapMean(v).orderBy("group")
    }),
    // --- RFM segmentation: ntile quantile bins over the aggregated
    // per-user frame, reference instant = corpus max timestamp
    "events_rfm" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("ts div 1000").as("ts"), col("value"))
      Events.rfm(ev).orderBy("user_id")
    }),
    // --- Markov next-event baseline: argmax transition model + top-1
    // accuracy straight off the |types|² count frame (one lead window)
    "events_markov_eval" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.markovEval(ev).orderBy("prev_type")
    }),
    // --- Warner randomized response over a sensitive high-spend bit:
    // md5-coin flip with p=1/4 (deterministic per event id — RAPPOR
    // memoization), debiased per-type estimate vs the true rate
    "privacy_rr" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("event_type"),
        (col("value") > 50.0).cast("long").as("bit"))
      val priv = Privacy.randomizedResponse(ev, "event_id", "bit")
      val est = Privacy.rrEstimate(priv, Seq("event_type"))
      val truth = ev.groupBy(col("event_type"))
        .agg(expr("sum(bit) * 1000000L div count(1)").as("true_yes_ppm"))
      est.join(truth, Seq("event_type")).orderBy("event_type")
    }),
    // --- discrete-time churn lifetime table: exact KM numerators /
    // denominators as integers, at-risk window over the bounded
    // lifetime frame, 1-row driver pull for the horizon
    "events_hazard" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.hazardTable(ev, censorDays = 7L).orderBy("lifetime")
    }),
    // --- Kaplan–Meier survival over the same lifetime table: exact
    // integer cumulative-product recursion, recursive-CTE twin
    "events_km" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.kaplanMeier(ev, censorDays = 7L)
    }),
    // --- session co-visitation with integer-ppm lift vs independence
    "events_covisit" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.covisitation(ev).orderBy("type_a", "type_b")
    }),
    "events_props" -> ((s, dir) => {
      Events.propsRollup(rdEvents(s, dir)).orderBy("prop")
    }),
    "events_quantiles" -> ((s, dir) => {
      Events.valueQuantiles(rdEvents(s, dir))
        .orderBy("event_type", "quantile")
    }),
    // GDS-style node similarity over the supplier→part bipartite edges
    "graph_nodesim" -> ((s, dir) => {
      val e = rd(s, dir, "lineitem").select(
        col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      Graph.nodeSimilarity(e).orderBy("id", "rank")
    }),
    // exact integer gram matrix — the second-moment table PCA whitening
    // starts from; per-cell floor-scaling keeps the sums order-free so
    // DuckDB's identical IEEE arithmetic hash-matches
    "embed_gram" -> ((s, dir) =>
      Similarity.gramMatrix(rd(s, dir, "embeddings")).orderBy("i", "j")),
    // --- Matryoshka truncation profile: per-prefix squared-norm share,
    // per-cell floor-scaled (order-free BIGINT, engine-exact)
    "embed_truncation" -> ((s, dir) =>
      Similarity.truncationEval(rd(s, dir, "embeddings")).orderBy("dim")),
    // JL sign random projection 64 -> 16: stateless md5-derived signs,
    // exact BIGINT cell sums, one portable division (10^6*sqrt(16))
    "embed_rp" -> ((s, dir) =>
      Similarity.randomProject(rd(s, dir, "embeddings"), 16)
        .orderBy("vec_id", "dim")),
    // int8 quantization: integer roll-ups (sum/min/max are order-free) +
    // the head of the quantized vector joined to a scalar for the compare
    "embed_quantize" -> ((s, dir) =>
      Similarity.quantizeInt8(rd(s, dir, "embeddings"))
        .select(col("vec_id"),
          floor(col("scale") * 1000000.0).cast("long").as("scale_e6"),
          expr("aggregate(q, cast(0 as long), (a, x) -> a + x)").as("q_sum"),
          expr("array_min(q)").as("q_min"), expr("array_max(q)").as("q_max"),
          array_join(slice(col("q"), 1, 6), ",").as("q_head"))
        .orderBy("vec_id")),
    // kNN labeling: first 20 vectors play the unlabeled set, the rest vote
    "label_knn" -> ((s, dir) => {
      val e = rd(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      Similarity.knnClassify(
        e.filter(col("vec_id") >= 20)
          .select(col("vec_id"), col("embedding"), col("label")), q, 5)
        .orderBy("query_id")
    }),
    "sample_per_key" -> ((s, dir) =>
      Sampling.samplePerKey(rd(s, dir, "documents"), "source", 20)
        .select(col("doc_id"), col("source"), col("sample_rank"))
        .orderBy("source", "sample_rank")),
    "table_profile" -> ((s, dir) =>
      Analytics.profile(rd(s, dir, "lineitem"),
        Seq("l_partkey", "l_quantity", "l_extendedprice"))
        .orderBy("column")),
    "part_stats" -> ((s, dir) =>
      rd(s, dir, "part").groupBy(col("p_brand")).agg(
        count(lit(1)).as("n_parts"),
        Analytics.exactSum(col("p_retailprice")).as("sum_price"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"),
        (sum(col("p_size")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_size"))
        .orderBy("p_brand")),
    "supplier_nation" -> ((s, dir) =>
      rd(s, dir, "supplier")
        .join(broadcast(rd(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(
          count(lit(1)).as("n_suppliers"),
          Analytics.exactSum(col("s_acctbal")).as("total_bal"))
        .orderBy("n_name")),
    "part_best_supplier" -> ((s, dir) =>
      Analytics.bestSupplier(rd(s, dir, "lineitem")).orderBy("l_partkey")),
    "basket_rules" -> ((s, dir) =>
      Analytics.basketRules(rd(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minPairCount = 2L).orderBy("item_a", "item_b")),
    // --- TPC-H Q17 shape: correlated avg decorrelated to one join
    "q17_small_qty" -> ((s, dir) =>
      Analytics.q17(rd(s, dir, "lineitem"))),
    // --- TPC-H Q18 shape: HAVING survivors drive keyed joins back
    "q18_big_orders" -> ((s, dir) =>
      Analytics.q18(rd(s, dir, "lineitem"), rd(s, dir, "orders"),
        rd(s, dir, "customer"))),
    // --- TPC-H Q21 shape: double-correlated EXISTS decorrelated to
    // per-order supplier aggregates (sole late shipper blame)
    "q21_blame" -> ((s, dir) =>
      Analytics.q21(rd(s, dir, "lineitem"), rd(s, dir, "orders"))),
    // --- TPC-H Q13 shape: pre-aggregated fact side, outer join, double agg
    "q13_custdist" -> ((s, dir) =>
      Analytics.q13(rd(s, dir, "customer"), rd(s, dir, "orders"))),
    // --- TPC-H Q22 shape: one-row scalar-avg broadcast + keyed anti join
    "q22_idle" -> ((s, dir) =>
      Analytics.q22(rd(s, dir, "customer"), rd(s, dir, "orders"))),
    // --- TPC-H Q15 shape: exact-integer revenue view + scalar MAX equi-join
    "q15_top_supplier" -> ((s, dir) =>
      Analytics.q15(rd(s, dir, "lineitem"), rd(s, dir, "supplier"))),
    // --- TPC-H Q14 shape: conditional-aggregation promo share
    "q14_promo" -> ((s, dir) =>
      Analytics.q14(rd(s, dir, "lineitem"), rd(s, dir, "part"))),
    // --- TPC-H Q10 shape: returned-item top-k with scan-side filters
    "q10_returns" -> ((s, dir) =>
      Analytics.q10(rd(s, dir, "customer"), rd(s, dir, "orders"),
        rd(s, dir, "lineitem"), rd(s, dir, "nation"))),
    // --- TPC-H Q19 shape: OR-of-ANDs with explicit scan envelope
    "q19_disjunctive" -> ((s, dir) =>
      Analytics.q19(rd(s, dir, "lineitem"), rd(s, dir, "part"))),
    // --- TPC-H Q4 shape: the canonical LEFT SEMI (EXISTS) probe
    "q4_semi" -> ((s, dir) =>
      Analytics.q4(rd(s, dir, "orders"), rd(s, dir, "lineitem"))),
    // --- double-sweep diameter estimate over the order–customer graph
    "graph_diameter" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      Graph.diameterSweep(e, 4)
    }),
    // --- Louvain one-level: deterministic exact-gain local moves over
    // the order-part graph (labelprop spreads labels; this one OPTIMIZES
    // modularity — the integer 2m²-scaled gain with JP-scheduled moves)
    "graph_louvain" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 20000000L).as("dst"))
      Graph.louvainOneLevel(ed, rounds = 6).orderBy("id")
    }),
    // --- Louvain phase 2: coarsen phase-1 communities to super-nodes,
    // re-run weighted exact-gain moves on the community graph — the
    // whole-community move the one-level pass can never make, at
    // community-graph (not node-graph) cost per round
    "graph_louvain2" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 20000000L).as("dst"))
      Graph.louvainTwoLevel(ed, rounds1 = 6, rounds2 = 4).orderBy("id")
    }),
    // --- landmark distance oracle over the order–part graph: exact BFS
    // from 4 md5-bottom landmark parts, min(du+dv) estimates for 32
    // md5-bottom consecutive order pairs; no-common-landmark pairs NULL
    "graph_landmark_dist" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = rd(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 20000000L).as("dst")).distinct()
      val lm = e.select(col("dst").as("id")).distinct()
        .withColumn("h", md5(col("id").cast("string")))
        .orderBy("h", "id").limit(4).select("id")
      // bounded: rank runs AFTER the top-64 take, never corpus-wide
      val ords = e.select(col("src").as("id")).distinct()
        .withColumn("h", md5(col("id").cast("string")))
        .orderBy("h", "id").limit(64)
        .withColumn("rn", row_number().over(Window.orderBy("h", "id")))
      val pairs = ords.filter(col("rn") % 2 === 1)
        .select((col("rn") + 1).as("rn2"), col("id").as("u"))
        .join(ords.filter(col("rn") % 2 === 0)
          .select(col("rn").as("rn2"), col("id").as("v")), "rn2")
        .select(col("u"), col("v"))
      Graph.landmarkDistances(e, lm, pairs, maxHops = 4).orderBy("u", "v")
    }),
    // --- HyperANF ball-growth card over the mirrored order-part graph:
    // per-node HLL reachability estimates at hops 0..2, every register
    // and scaled sum an exact md5-derived BIGINT (the sketch_hll_users
    // arithmetic propagated along edges)
    "graph_anf" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 20000000L).as("dst")).distinct()
      val e = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      Graph.hyperAnf(e, maxHops = 2, b = 6).orderBy("hop", "id")
    }),
    // --- per-node coreness via the distributed h-index iteration
    // (kCore filters at one k; this is the full decomposition number)
    "graph_coreness" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 20000000L).as("dst"))
      Graph.coreness(ed, rounds = 6).orderBy("id")
    }),
    // --- effective-radius histogram from the same ANF chain: per node
    // the smallest hop holding >= 90% of the final ball (exact integer
    // predicate on the scaled sums), counted per radius
    "graph_anf_radius" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 20000000L).as("dst")).distinct()
      val e = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      Graph.effectiveRadius(e, maxHops = 2, b = 6).orderBy("eff_hops")
    }),
    // --- TPC-H Q7 shape: bilateral nation volume, pre-filtered dims
    "q7_volume" -> ((s, dir) =>
      Analytics.q7(rd(s, dir, "lineitem"), rd(s, dir, "orders"),
        rd(s, dir, "customer"), rd(s, dir, "supplier"),
        rd(s, dir, "nation"))),
    // --- TPC-H Q8 shape: share-of-group via one conditional agg
    "q8_share" -> ((s, dir) =>
      Analytics.q8(rd(s, dir, "lineitem"), rd(s, dir, "orders"),
        rd(s, dir, "customer"), rd(s, dir, "supplier"),
        rd(s, dir, "nation"), rd(s, dir, "region"), rd(s, dir, "part"))),
    // --- exact ROC AUC (Mann–Whitney identity): does length predict EN?
    "eval_auc" -> ((s, dir) =>
      Eval.aucExact(rd(s, dir, "documents")
        .select(col("n_chars").as("score"),
          (col("lang") === "en").as("label")))),
    // --- threshold confusion card over the same scored corpus
    "eval_confusion" -> ((s, dir) =>
      Eval.confusionCard(rd(s, dir, "documents")
        .select(col("n_chars").as("score"),
          (col("lang") === "en").as("label")), 300L)),
    // --- per-source exact AUC: the partitioned (scale-safe) AUC form
    "eval_auc_by_source" -> ((s, dir) =>
      Eval.aucByGroup(rd(s, dir, "documents")
        .select(col("source"), col("n_chars").as("score"),
          (col("lang") === "en").as("label")), "source")),
    // --- binned reliability (calibration) card over the same score
    "eval_calibration" -> ((s, dir) =>
      Eval.calibrationCard(rd(s, dir, "documents")
        .select(col("n_chars").as("score"),
          (col("lang") === "en").as("label")))),
    // --- precision-recall curve over the same score bins: descending
    // threshold sweep, cumulative TP / predicted-positive, exact ppm
    "eval_pr" -> ((s, dir) =>
      Eval.prCurve(rd(s, dir, "documents")
        .select(col("n_chars").as("score"),
          (col("lang") === "en").as("label")))),
    // --- Murphy decomposition of the Brier score: exact ppm² REL /
    // RES / UNC plus the exact unbinned Brier, one-row card
    "eval_brier" -> ((s, dir) =>
      Eval.brierDecomposition(rd(s, dir, "documents")
        .select(col("n_chars").as("score"),
          (col("lang") === "en").as("label")))),
    // --- rich-club sweep over the order–part graph: does the
    // high-degree core wire to itself; all thresholds in one pass
    "graph_richclub" -> ((s, dir) => {
      val e = rd(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 10000000L).as("dst"))
      Graph.richClub(e).orderBy("k")
    }),
    // --- 2-D skyline: cheapest-and-smallest Pareto front over parts
    "part_skyline" -> ((s, dir) =>
      Analytics.skyline2d(rd(s, dir, "part")
        .select(col("p_partkey"),
          (col("p_retailprice").cast("decimal(18,2)") * 100)
            .cast("long").as("price_c"), col("p_size")),
        "p_partkey", "price_c", "p_size")),
    // --- two-sample KS distance between click and view value dists
    "events_ks" -> ((s, dir) =>
      Eval.ksTest(rdEvents(s, dir), "click", "view")),
    // --- daily-count autocorrelation per event type, lags 0..7
    "events_acf" -> ((s, dir) =>
      Eval.acf(rdEvents(s, dir))),
    // --- CUPED variance-reduced A/B over the md5 user split
    "events_cuped" -> ((s, dir) =>
      Events.cuped(rdEvents(s, dir))),
    // --- interval-stacking peak concurrency (capacity-planning sweep)
    "events_concurrency" -> ((s, dir) =>
      Events.peakConcurrency(rdEvents(s, dir))),
    // --- Benford first-digit audit over order totals
    "dq_benford" -> ((s, dir) =>
      Quality.benford(rd(s, dir, "orders"), "o_totalprice")),
    // --- positional phrase search: exact consecutive-token lookup
    "search_phrase" -> ((s, dir) =>
      TextAnalysis.phraseSearch(rd(s, dir, "documents"),
        Seq("table", "hash"))),
    // --- gazetteer multi-word phrase tagger: broadcast first-token
    // index + codegen'd array-slice verify; zero-hit terms stay listed
    "text_gazetteer" -> ((s, dir) =>
      TextAnalysis.gazetteerMatch(rd(s, dir, "documents"),
        Seq("hash join", "table scan", "sort merge join",
          "spark window", "query plan"))),
    // --- train/eval vocabulary coverage card (even/odd doc split)
    "vocab_overlap" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      TextAnalysis.vocabOverlap(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    }),
    // --- TPC-H Q12 shape: fact-fact join + conditional priority split
    "q12_shipmode" -> ((s, dir) =>
      Analytics.q12(rd(s, dir, "lineitem"), rd(s, dir, "orders"))),
    // --- cumulative gains / lift deciles over the doc quality score
    "eval_gains" -> ((s, dir) =>
      Eval.gainsCard(rd(s, dir, "documents")
        .select(col("n_chars").as("score"),
          (col("lang") === "en").as("label")))),
    // --- chi-square independence: event mix vs day-of-week
    "events_chi2" -> ((s, dir) =>
      Eval.chi2Independence(rdEvents(s, dir)
        .select(col("event_type"),
          expr("ts div 86400000000000 % 7").as("dow")),
        "event_type", "dow")),
    // --- exact weighted k-sample without replacement (A-ES via
    // replica min-hash; weight = 1 + chars/64)
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(rd(s, dir, "documents")
        .withColumn("w", expr("1L + n_chars div 64")),
        "doc_id", "w", 64)),
    // --- word2vec-style negative sampling: unigram^(3/4) smoothing via
    // portable sqrt(f*sqrt(f)), cumulative-range categorical draws,
    // cell-binned containment (never a BNLJ), collisions flagged
    "sample_negatives" -> ((s, dir) =>
      Sampling.negativeSamples(rd(s, dir, "documents"))),
    // --- leave-one-out target encoding of source against the EN label
    "docs_target_encode" -> ((s, dir) =>
      Sampling.targetEncodeLOO(rd(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          (col("lang") === "en").as("y_lab")),
        "source", "y_lab", "doc_id")
        .orderBy("doc_id")),
    // --- binomial-mechanism DP count release per event type
    "privacy_dp_counts" -> ((s, dir) =>
      Privacy.dpCounts(rdEvents(s, dir).select(col("event_type")),
        Seq("event_type")).orderBy("event_type")),
    // --- TPC-H Q9 shape: signed profit star over a name-filtered slice
    "q9_profit" -> ((s, dir) =>
      Analytics.q9(rd(s, dir, "lineitem"), rd(s, dir, "orders"),
        rd(s, dir, "supplier"), rd(s, dir, "nation"),
        rd(s, dir, "part"))),
    // --- Poisson overdispersion (variance-to-mean) card per event type
    "events_dispersion" -> ((s, dir) =>
      Events.dispersionCard(rdEvents(s, dir))),
    // --- Theil–Sen robust daily-trend slope per event type
    // --- per-type OLS trend card: slope/intercept/r2 in exact ppm from
    // five DECIMAL(38,0) moments over the zero-filled daily grid; the
    // dashboard complement to the robust theilsen slope
    "events_ols" -> ((s, dir) =>
      Events.olsTrend(rdEvents(s, dir)).orderBy("event_type")),
    // --- lead–lag cross-correlation of the click and purchase daily
    // series: exact integer moments per lag, corrMatrix double close
    "events_xcorr" -> ((s, dir) =>
      Events.crossCorrelation(rdEvents(s, dir), "click", "purchase",
        maxLag = 3)),
    "events_theilsen" -> ((s, dir) =>
      Events.theilSen(rdEvents(s, dir))),
    // --- Simpson user-concentration / effective-user card per type
    "events_simpson" -> ((s, dir) =>
      Events.simpsonCard(rdEvents(s, dir))),
    // --- ORC ingestion round trip (fixed staging dir, load_jsonl rules)
    "load_orc" -> ((s, dir) => {
      val staged = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_orc").toString
      Ingest.orcRoundTrip(rd(s, dir, "documents"), staged)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    // --- A-priori level 3: frequent triples with downward-closure prune
    "basket_triples" -> ((s, dir) =>
      Analytics.basketTriples(rd(s, dir, "lineitem"), "l_orderkey",
        "l_partkey", minCount = 2L)
        .orderBy("item_a", "item_b", "item_c")),
    "value_histogram" -> ((s, dir) =>
      Analytics.histogram(rd(s, dir, "lineitem"), "l_extendedprice", 5000.0)
        .orderBy("bin")),
    // --- exact-moment correlation matrix over the lineitem numerics:
    // one scan, integerized cells, pure-double Pearson close
    "value_corr" -> ((s, dir) =>
      Analytics.corrMatrix(rd(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_x", "col_y")),
    "value_winsorize" -> ((s, dir) => {
      Analytics.winsorize(
        rdEvents(s, dir).select(col("event_id"), col("event_type"),
          col("value")), "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("p_lo"), col("p_hi"), col("clamped"))
        .orderBy("event_id")
    }),
    "sales_rollup" -> ((s, dir) =>
      Analytics.rollupAgg(rd(s, dir, "lineitem"), "l_returnflag",
        "l_linestatus", "l_extendedprice")
        .orderBy("lvl", "l_returnflag", "l_linestatus")),
    "events_pivot" -> ((s, dir) => {
      Events.pivotDaily(rdEvents(s, dir),
        Seq("click", "error", "purchase", "signup", "view")).orderBy("day")
    }),
    "events_interarrival" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"))
      Events.interarrival(ev).orderBy("event_id")
    }),
    "q1_agg" -> ((s, dir) =>
      Analytics.q1(rd(s, dir, "lineitem")).orderBy("l_returnflag", "l_linestatus")),
    "q3_topk" -> ((s, dir) =>
      Analytics.q3(rd(s, dir, "customer"), rd(s, dir, "orders"),
        rd(s, dir, "lineitem")).orderBy(desc("revenue"), asc("o_orderkey"))),
    "q5_join" -> ((s, dir) =>
      Analytics.q5(rd(s, dir, "region"), rd(s, dir, "nation"),
        rd(s, dir, "customer"), rd(s, dir, "orders"), rd(s, dir, "lineitem"))
        .orderBy("r_name", "n_name")),
    // --- personalized PageRank seeded on the first five customer nodes
    "graph_ppr" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val seeds = e.select(col("dst").as("id")).distinct()
        .filter(col("id") <= 10000005L)
      Graph.personalizedPageRank(e, seeds, 5).orderBy("id")
    }),
    // --- document chunking: 64-token windows, 16-token overlap
    "docs_chunk" -> ((s, dir) =>
      TextAnalysis.chunk(rd(s, dir, "documents"), 64, 16)
        .orderBy("doc_id", "chunk_id")),
    // --- per-user time-weighted average event value
    "events_twap" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"), col("value"))
      Events.twap(ev).orderBy("user_id")
    }),
    // --- per-dimension embedding standardization (z-scores, long form)
    "embed_standardize" -> ((s, dir) =>
      Similarity.standardize(rd(s, dir, "embeddings"))
        .orderBy("vec_id", "dim")),
    // --- Morton z-values over the (partkey, suppkey) plane
    "zorder_index" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .select(col("l_partkey").as("x"), col("l_suppkey").as("y")).distinct()
        .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 20).as("z"))
        .orderBy("x", "y")),
    // --- Hilbert layout index: native per-row state machine (a column
    // form would 2^bits the expression tree through CollapseProject);
    // perfect step locality where the z-curve jumps at pow2 seams
    "hilbert_index" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .select(col("l_partkey").as("x"), col("l_suppkey").as("y")).distinct()
        .select(col("x"), col("y"),
          expr("graft_hilbert(CAST(x AS BIGINT), CAST(y AS BIGINT), 20)")
            .as("h"))
        .orderBy("x", "y")),
    // --- declarative data-quality gate: range rules catch real rows
    // (quantities over 40, discounts over 5%), unique/ref rules cover
    // the key checks — the clean ref rule proving zeros report as zeros
    "dq_violations" -> ((s, dir) => {
      val li = Quality.violations(rd(s, dir, "lineitem"), Seq(
        Quality.NotNull("l_quantity"),
        Quality.InRange("l_quantity", 1, 40),
        Quality.InRange("l_discount", 0, 0.05)))
      val ord = Quality.violations(rd(s, dir, "orders"), Seq(
        Quality.Unique(Seq("o_custkey")),
        Quality.RefIntegrity("o_custkey", rd(s, dir, "customer"),
          "c_custkey")))
      li.unionByName(ord).orderBy("rule_id")
    }),
    // --- cross-corpus decontamination: benchmark = docs 0-9; planted
    // exact copies (ids +500000) guarantee hits with identical
    // signatures, and the corpus similarity gap (near-dups at J >= 0.9,
    // rest < 0.25) makes the exact cross-jaccard DuckDB scan an oracle
    // for the fixed-seed LSH pair set — the dedup_minhash argument
    // applied across two frames
    "dedup_cross" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val ref = docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") >= 10)
        .select(col("doc_id"), col("text"))
        .unionByName(ref.select((col("doc_id") + 500000L).as("doc_id"),
          col("text")))
      Dedup.crossMinHash(ref, corpus)
        .select("ref_id", "doc_id").orderBy("ref_id", "doc_id")
    }),
    // --- weighted hop-bounded shortest paths over the mirrored
    // order<->customer graph, deterministic integer weights
    "graph_sssp" -> ((s, dir) => {
      val e0 = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"),
        (col("o_orderkey") % 7 + 1).as("w"))
      val e = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      val seeds = e0.filter(col("src") < 100)
        .select(col("src").as("id")).distinct()
      Graph.shortestPaths(e, seeds, 4).orderBy("id")
    }),
    // --- GraphSAGE-style 2-hop neighbor sampling: md5-ranked fanouts
    // (3, 2) from the sub-100 seeds — derandomized minibatch subgraph
    "graph_sample_neighbors" -> ((s, dir) => {
      val e0 = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val e = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = e0.filter(col("src") < 100)
        .select(col("src").as("id")).distinct()
      Graph.sampleNeighbors(e, seeds, Seq(3, 2))
        .orderBy("hop", "src", "dst")
    }),
    // --- frequency-cap audit: the batch twin of streamingRateLimit —
    // daily capped users + suppressed-event share
    "events_freqcap" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("ts div 1000").as("ts"))
      Events.frequencyCapAudit(ev, cap = 10L).orderBy("day")
    }),
    // --- widest (max-min bottleneck) paths over the same graph:
    // the (max, min) semiring twin of graph_sssp, seeds at Long.Max
    "graph_widest" -> ((s, dir) => {
      val e0 = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"),
        (col("o_orderkey") % 7 + 1).as("w"))
      val e = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      val seeds = e0.filter(col("src") < 100)
        .select(col("src").as("id")).distinct()
      Graph.widestPaths(e, seeds, 4).orderBy("id")
    }),
    // --- CUBE subtotals (all four grouping sets in one Expand)
    "sales_cube" -> ((s, dir) =>
      Analytics.cubeAgg(rd(s, dir, "lineitem"), "l_returnflag",
        "l_linestatus", "l_extendedprice")
        .orderBy("lvl", "l_returnflag", "l_linestatus")),
    // --- key-distribution profile: the decide-before-salting query
    "skew_profile" -> ((s, dir) =>
      Skew.keyProfile(rd(s, dir, "lineitem"), "l_partkey", 20)),
    // --- cost-based join-order election: EXACT intermediate sizes from
    // key-count frames (never the joins themselves), smaller-first pick
    "join_plan_card" -> ((s, dir) =>
      Analytics.joinOrderCard(
        rd(s, dir, "customer"), "c_custkey",
        rd(s, dir, "orders"), "o_custkey", "o_orderkey",
        rd(s, dir, "lineitem"), "l_orderkey")),
    // --- difference-in-differences: md5 treat split, day-19738 pivot,
    // four exact ppm-cent cell means + the DiD contrast
    "events_did" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("ts div 1000").as("ts"), col("value"))
      Analytics.didCard(ev, pivotDay = 19738L)
    }),
    // --- stratified treatment effect: per-event-type treat-control
    // gaps, size-weighted positive-offset combine
    "events_ate_adjusted" -> ((s, dir) => {
      val ev = rdEvents(s, dir)
        .select(col("user_id"), col("event_type"), col("value"))
      Analytics.adjustedAteCard(ev)
    }),
    // --- t-closeness audit over (nation, segment) classes: ordered
    // balance bins, closed-form EMD as exact ppm cumulative gaps
    "privacy_tcloseness" -> ((s, dir) => {
      val c = rd(s, dir, "customer").select(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        expr("greatest(0L, least(9L, CAST(floor((c_acctbal + 1000.0d)" +
          " / 1100.0d) AS BIGINT)))").as("bal_bin"))
      Privacy.tClosenessAudit(c, Seq("nation", "segment"), "bal_bin",
        bins = 10, tPpm = 150000L).orderBy("qid")
    }),
    // --- pre-flight exact join-output-size guard for the partkey
    // self-join (the nodesim/itemcf dry run): top contributors + bill
    "join_guard" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
      Skew.joinCardinality(li, "l_partkey", li, "l_partkey")
        .orderBy("kind", "k")
    }),
    // --- rolling 7-day distinct users (sliding distinct via explode)
    "events_rolling_users" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.rollingActiveUsers(ev, 7).orderBy("day")
    }),
    // --- percentile-rank normalization of doc length within language
    "docs_chars_rank" -> ((s, dir) =>
      Analytics.percentileRank(rd(s, dir, "documents"),
        "doc_id", "lang", "n_chars").orderBy("doc_id")),
    // --- k-fold CV assignment (md5-stable, engine-portable)
    "fold_assign" -> ((s, dir) =>
      Sampling.kFoldAssign(rd(s, dir, "documents")
        .select(col("doc_id")), "doc_id", 5).orderBy("doc_id")),
    // --- Pareto: cumulative revenue share by part
    "sales_pareto" -> ((s, dir) =>
      Analytics.paretoShare(rd(s, dir, "lineitem"),
        "l_partkey", "l_extendedprice").orderBy("rank")),
    // --- first-order Markov transitions between event types
    "events_transitions" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.transitionMatrix(ev).orderBy("from_type", "to_type")
    }),
    // --- flow symmetry: reciprocity of the transition graph (funnel vs
    // back-and-forth), exact integer ppm over the bounded type² frame
    "events_flow_symmetry" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.flowSymmetry(ev)
    }),
    // --- bigram LM: top-5 continuations per head token
    "text_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLm(rd(s, dir, "documents"), 5)
        .orderBy("w1", "rank")),
    // --- Kneser-Ney smoothed bigram LM: integer-exact scaled rational
    // (one final double division), top-5 continuations per context
    "text_kneser_ney" -> ((s, dir) =>
      TextAnalysis.kneserNey(rd(s, dir, "documents"), 5)
        .orderBy("w1", "rank")),
    // --- feature-hashing vectorizer: md5 buckets are engine-portable
    "text_hashtf" -> ((s, dir) =>
      TextAnalysis.hashTf(rd(s, dir, "documents"), 64)
        .orderBy("doc_id", "bucket")),
    // --- distributed perceptron training over hashed features: labels
    // planted by doc_id parity, 3 fixed full-batch integer rounds
    // (learning rate 1 — no division, no floats); oracle = the same
    // rounds unrolled as materialized CTEs
    "text_train_lr" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
        .withColumn("label",
          when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))
      TextAnalysis.trainPerceptron(docs, 64, 3).orderBy("bucket")
    }),
    // --- vocabulary construction: top-50 tokens with cumulative coverage
    "vocab_top" -> ((s, dir) =>
      TextAnalysis.buildVocab(rd(s, dir, "documents"), 50).orderBy("rank")),
    // --- typeahead index: every <=4-char prefix -> pinned top-3
    // completions; built once, queried as point lookups
    "search_autocomplete" -> ((s, dir) =>
      TextAnalysis.autocompleteIndex(rd(s, dir, "documents"))
        .orderBy("prefix", "rank")),
    // --- canonicalization pass (lowercase/strip/collapse), zero shuffles
    "text_normalize" -> ((s, dir) =>
      TextAnalysis.normalize(rd(s, dir, "documents")).orderBy("doc_id")),
    // --- Flesch-style readability from three exact regex counts
    "text_readability" -> ((s, dir) =>
      TextAnalysis.readability(rd(s, dir, "documents")).orderBy("doc_id")),
    // --- T5 span-corruption pair generation: md5-deterministic masking,
    // run-collapse to numbered sentinels, targets close with a final
    // sentinel. One doc-keyed shuffle (windows + groupBy share the key).
    "text_span_mask" -> ((s, dir) =>
      TextAnalysis.spanMask(
        rd(s, dir, "documents").select(col("doc_id"), col("text")),
        ratePct = 15).orderBy("doc_id")),
    // --- URL hygiene end-to-end: stage deterministic messy URLs from the
    // doc table (mixed-case scheme/host, default ports, tracking params,
    // fragments, trailing slashes), canonicalize, drop two blocklisted
    // domains, roll up per-domain inventory
    "web_domains" -> ((s, dir) => {
      import s.implicits._
      val urls = rd(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("h", expr(
          """concat(CASE WHEN doc_id % 7 IN (1, 3, 5) THEN 'www.' ELSE '' END,
            |source, '.',
            |CASE CAST((doc_id div 4) % 4 AS INT) WHEN 0 THEN 'com'
            |  WHEN 1 THEN 'org' WHEN 2 THEN 'net' ELSE 'io' END)""".stripMargin))
        .withColumn("url", expr(
          """concat(
            |CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END, '://',
            |CASE WHEN doc_id % 7 = 0 THEN upper(h) ELSE h END,
            |CASE WHEN doc_id % 5 = 0 THEN
            |  (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END)
            |  ELSE '' END,
            |'/', lang, '/p', CAST(doc_id % 40 AS STRING),
            |CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END,
            |CASE WHEN doc_id % 3 = 0 THEN
            |  concat('?utm_source=feed&utm_medium=rss&id=',
            |         CAST(doc_id % 9 AS STRING))
            |  WHEN doc_id % 3 = 1 THEN concat('?id=', CAST(doc_id % 9 AS STRING))
            |  ELSE '' END,
            |CASE WHEN doc_id % 5 = 0 THEN '#sec2' ELSE '' END)""".stripMargin))
        .drop("h")
      val blocked = Seq("src3.io", "src6.net").toDF("domain")
      Web.domainStats(Web.filterBlocked(Web.normalizeUrls(urls), blocked))
        .orderBy("domain")
    }),
    // --- HTML main-content extraction: stage deterministic crawl HTML
    // from the doc table (comment, script/style blocks, nav bar, head
    // title, short footer, entities), extract; only the real paragraph
    // survives the block heuristics
    "web_extract" -> ((s, dir) => {
      val pages = rd(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("html", expr(
          """concat('<html><!-- id ', CAST(doc_id AS STRING), ' -->',
            |'<head><title>Doc ', CAST(doc_id AS STRING), ' &amp; co</title>',
            |'<script type="text/javascript">var x = 1; if (x < 2) { x = 3; }</script>',
            |'<style>.nav { color: red; }</style></head>',
            |'<body><div class="nav">Home | About | Contact</div>',
            |'<h1>Doc ', CAST(doc_id AS STRING), '</h1>',
            |'<p>', substring(text, 1, 240), '</p>',
            |'<p>Short.</p>',
            |'<div class="footer">Copyright 2026</div>',
            |'</body></html>')""".stripMargin))
      Web.extractMainContent(pages)
        .select(col("doc_id"), col("title"), col("content"), col("n_blocks"))
        .orderBy("doc_id")
    }),
    // --- right-to-be-forgotten audit: deletion list = every ninth user,
    // broadcast-flagged, per-type before/removed/after + survivor checksum
    "privacy_purge" -> ((s, dir) => {
      val ev = rdEvents(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val del = ev.select(col("user_id")).distinct()
        .filter(col("user_id") % 9 === 0)
      Privacy.purgeAudit(ev, del).orderBy("event_type")
    }),
    // --- k-anonymity / l-diversity release audit over customer quasi-
    // identifiers (nation, segment, 2000-wide balance band); sensitive =
    // a staged md5-digit attribute (the table ships no sensitive column;
    // the digit is deterministic in both engines). Class-space output,
    // one partial-agg shuffle.
    "privacy_kanon" -> ((s, dir) => {
      val c = rd(s, dir, "customer").select(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / lit(2000.0)).cast("long").as("bal_band"),
        (conv(substring(md5(col("c_custkey").cast("string")), 1, 8), 16, 10)
          .cast("long") % 5).as("sens"))
      Privacy.kAnonymityAudit(c, Seq("nation", "segment", "bal_band"),
        "sens", k = 5, l = 2)
        .orderBy("nation", "segment", "bal_band")
    }),
    // --- k-anonymity ENFORCEMENT: minimal full-domain generalization
    // over the fixed 5-level (nation, segment, balance-band) ladder;
    // releases the class table at the first level with no class < k
    "privacy_generalize" -> ((s, dir) => {
      val base = rd(s, dir, "customer").select(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("seg"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
          .as("bal"))
      val levels = Seq(
        expr("concat(CAST(nation AS STRING), '|', seg, '|'," +
          " CAST((bal + 1000000L) div 10000L AS STRING))"),
        expr("concat(CAST(nation AS STRING), '|', seg, '|'," +
          " CAST((bal + 1000000L) div 100000L AS STRING))"),
        expr("concat(CAST(nation AS STRING), '|*|'," +
          " CAST((bal + 1000000L) div 100000L AS STRING))"),
        expr("concat(CAST(nation div 5L AS STRING), '|*|'," +
          " CAST((bal + 1000000L) div 1000000L AS STRING))"),
        lit("*|*|*"))
      Privacy.generalizeKAnon(base, levels, k = 10L)
    }),
    // --- salted md5-prefix pseudonymization; output keyed on the
    // pseudonym only (the point), counts + checksum prove the mapping
    "privacy_pseudo" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"))
      Privacy.pseudonymize(ev, "s42")
        .groupBy(col("pseudo_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("checksum"))
        .orderBy("pseudo_id")
    }),
    // --- linear-model corpus scoring: hashTf features x broadcast weight
    // vector. The registered weights derive from the bucket id's md5 (an
    // arbitrary-but-fixed integer model both engines can rebuild).
    "text_score_lr" -> ((s, dir) => {
      val w = s.range(64).select(col("id").as("bucket"),
        (conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2001 - 1000).as("w"))
      TextAnalysis.scoreLinear(rd(s, dir, "documents"), w).orderBy("doc_id")
    }),
    // --- RAKE keyphrases: stopword-delimited candidate runs, exact
    // integer deg/freq scoring, per-doc deterministic top-5
    "text_keyphrases" -> ((s, dir) =>
      TextAnalysis.keyphrases(rd(s, dir, "documents"))
        .orderBy("doc_id", "rank")),
    // --- DSIR-style importance selection: hashed-feature target/raw
    // ratio weights (src0 = target domain), corpus scored per token
    "text_dsir" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val w = TextAnalysis.importanceWeights(docs,
        docs.filter(col("source") === "src0"))
      TextAnalysis.importanceScore(docs, w).orderBy("doc_id")
    }),
    // --- distributed BPE tokenizer training: top-8 merges from corpus
    // word frequencies, deterministic tie-break, unrolled-round oracle
    "text_bpe_train" -> ((s, dir) =>
      TextAnalysis.bpeTrain(rd(s, dir, "documents"), 8).orderBy("round")),
    // --- BPE encode: train 8 merges and encode the SAME corpus from the
    // final training state (no re-applied merge rounds — bpeTrainEncode);
    // bpeEncode(docs, merges) remains the new-corpus path
    "text_bpe_encode" -> ((s, dir) =>
      TextAnalysis.bpeTrainEncode(rd(s, dir, "documents"), 8)
        .orderBy("doc_id")),
    // --- domain-affinity LM scoring: bigram LM trained on src0 docs,
    // every doc scored by mean in-model bigram probability (ln-free
    // perplexity stand-in; floor-scaled exact contributions)
    "text_lm_affinity" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val lm = TextAnalysis.bigramLm(docs.filter(col("source") === "src0"), 5)
      TextAnalysis.scoreBigramLm(docs, lm).orderBy("doc_id")
    }),
    // --- out-of-order arrival profile: how far the per-user event-time
    // high-water mark had passed each event, bucketed by power-of-two
    // milliseconds — the watermark-choice table. The generator emits
    // events already time-ordered by event_id, so the staged arrival
    // order is an md5 permutation of the id (deterministic in both
    // engines) — the shuffled-ingest shape the profile exists for.
    "events_lateness" -> ((s, dir) => {
      // unique arrival key: 32-bit md5 prefix above the original id
      // (ids stay < 2^24 at every sf) — hash ties can't make the
      // running-max frame order ambiguous
      val ev = rdEvents(s, dir).select(
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") * 16777216L + col("event_id")).as("event_id"),
        col("user_id"), col("event_type"), col("ts"))
      Events.latenessProfile(ev).orderBy("event_type", "late_bucket")
    }),
    // --- zone-map pruning audit: the same column under a hash layout vs
    // a range layout; parts_scanned per probe quantifies what the
    // range/z rewrite buys before paying for it
    "zonemap_audit" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").select(col("l_orderkey"))
      val probes = li.filter(col("l_orderkey") % 6000 === 0)
        .select(col("l_orderkey").as("probe")).distinct()
      val hash = li.withColumn("part",
        conv(substring(md5(col("l_orderkey").cast("string")), 1, 8), 16, 10)
          .cast("long") % 32)
      val range = li.withColumn("part", expr("l_orderkey div 2000"))
      ZOrder.zoneMapAudit(hash, "part", "l_orderkey", probes)
        .withColumn("layout", lit("hash"))
        .unionByName(ZOrder.zoneMapAudit(range, "part", "l_orderkey", probes)
          .withColumn("layout", lit("range")))
        .orderBy("layout", "probe")
    }),
    // --- file-level bloom skipping index over an orderkey-clustered
    // layout: md5-salted per-part filters, 6 present + 2 absent probes,
    // truth join shows pruning power and false-positive overhead
    "bloom_index_audit" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
        .select(col("l_orderkey"), expr("l_orderkey div 4096").as("part"))
      val idx = BloomIndex.build(li, "part", "l_orderkey",
        m = 16384, k = 3)
      val present = li.select(col("l_orderkey").as("probe"))
        .distinct().orderBy("probe").limit(6)
      val absent = s.range(1).select(lit(999999999L).as("probe"))
        .unionByName(s.range(1).select(lit(888888888L).as("probe")))
      val truth = li.select(col("l_orderkey").as("probe"), col("part"))
        .distinct()
        .groupBy(col("probe")).agg(count(lit(1)).as("parts_true"))
      BloomIndex.audit(idx, present.unionByName(absent),
        m = 16384, k = 3)
        .join(truth, Seq("probe"), "left")
        .select(col("probe"), col("parts_scanned"), col("parts_total"),
          coalesce(col("parts_true"), lit(0L)).as("parts_true"))
        .orderBy("probe")
    }),
    // --- training-shard manifest: stable md5 assignment + order-free
    // integer checksums per shard
    "shard_manifest" -> ((s, dir) =>
      graft.sources.Shards.manifest(rd(s, dir, "documents"),
        "doc_id", "text", 16).orderBy("shard")),
    // --- incremental shard export: docs with doc_id%3==0 arrive AFTER
    // the initial export; the delta anti-joins the exported keys and the
    // stored manifest merges with the delta manifest by shard-keyed sum.
    // Oracle = the FULL-corpus manifest: additivity is the property
    // under test (merged == recomputed-from-scratch, byte for byte).
    "shard_incremental" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val exported = docs.filter(col("doc_id") % 3 =!= 0)
      val stored = graft.sources.Shards.manifest(exported, "doc_id", "text", 16)
      val dl = graft.sources.Shards.delta(docs, "doc_id",
        exported.select(col("doc_id")))
      graft.sources.Shards.mergeManifests(stored,
        graft.sources.Shards.manifest(dl, "doc_id", "text", 16))
        .orderBy("shard")
    }),
    // --- range-partitioned (total-order) shard plan: boundaries from
    // the md5-derandomized bottom-k sketch at i/16 quantiles, assignment
    // by boundary count, manifest with per-shard (lo, hi] + observed
    // zone map. Same cents+rid integerization as sketch_quantiles (the
    // value folds into the row id so sample ties are full duplicates).
    "shard_range" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").select(
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("""concat(CAST(l_orderkey AS STRING), ':',
          |CAST(l_linenumber AS STRING), ':',
          |CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS STRING))"""
          .stripMargin).as("rid"))
      val bs = graft.sources.Shards.rangeBoundaries(li, "cents", "rid", 16)
      graft.sources.Shards.rangeManifest(li, "cents", bs).orderBy("shard")
    }),
    // --- the WHOLE training-data pipeline as one verified composition:
    // quality gate -> exact dedup -> benchmark decontamination -> train
    // split -> shard manifest. Every stage is an already-oracled operator;
    // the composite proves they compose exactly (the benchmark docs
    // themselves enter the pipeline and are dropped at decontamination
    // with contamination = 1.0).
    "pipeline_e2e" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val kept = docs.join(TextAnalysis.qualityFilter(docs)
        .filter(col("keep")).select("doc_id"), "doc_id")
      val survivors = kept.join(Dedup.exact(kept).select("doc_id"), "doc_id")
      val contaminated = TextAnalysis.contamination(
        survivors, docs.filter(col("doc_id") < 20))
        .filter(col("contamination") >= 0.5).select("doc_id")
      val clean = survivors.join(contaminated, Seq("doc_id"), "left_anti")
      val train = Sampling.splitAssign(clean, "doc_id")
        .filter(col("split") === "train")
      graft.sources.Shards.manifest(train, "doc_id", "text", 8)
        .orderBy("shard")
    }),
    // --- pipeline v2 (VERDICT r10 item #5): the SOFT-dedup variant of
    // the crawl->training-shards composition at the full-pipeline
    // grain. quality gate -> benchmark decontamination -> near-dup
    // cluster resolution feeding a leakage-safe train/val split (no
    // near-dup pair may straddle the boundary) -> duplication weights
    // (copies kept at mass 1/n instead of hard-dropped) -> curriculum
    // staging -> sharded export. The per-(stage, shard) close binds
    // every stage into one hash: row/byte/checksum prove the export,
    // weight_mass_ppm proves soft dedup, n_clusters proves the
    // component resolution, sum_pos proves the within-stage curriculum
    // rank. clean and train feed 3+ consumers each (jaccard self-join
    // doubles one of them) -> localCheckpoint both (the reco lesson:
    // checkpoint the frame whose re-derivation multiplies past an
    // exchange).
    "pipeline_e2e_v2" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val kept = docs.join(TextAnalysis.qualityFilter(docs)
        .filter(col("keep")).select("doc_id"), "doc_id")
      val contaminated = TextAnalysis.contamination(
        kept, docs.filter(col("doc_id") < 20))
        .filter(col("contamination") >= 0.5).select("doc_id")
      val clean = kept.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      val pairs = Dedup.ngramJaccard(clean).select("a_id", "b_id")
      val split = Sampling.leakageSafeSplit(clean, pairs)
      val train = clean
        .join(split.filter(col("split") === "train")
          .select(col("doc_id"), col("cluster_id")), "doc_id")
        .localCheckpoint(true)
      val weights = Dedup.duplicationWeights(train)
        .select(col("doc_id"), col("weight_ppm"))
      val cur = Sampling.curriculumOrder(
        train.select(col("doc_id"), col("n_chars")), "n_chars", 4)
        .select(col("doc_id"), col("stage"), col("pos"))
      graft.sources.Shards.assign(
        train.select(col("doc_id"), col("text"), col("cluster_id")),
        "doc_id", 8)
        .join(weights, "doc_id").join(cur, "doc_id")
        .groupBy(col("stage"), col("shard"))
        .agg(count(lit(1)).as("n_rows"),
          sum(length(col("text")).cast("long")).as("n_bytes"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10)
            .cast("long")).as("checksum"),
          sum(col("weight_ppm")).as("weight_mass_ppm"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(col("pos")).as("sum_pos"))
        .orderBy("stage", "shard")
    }),
    // --- gaps-and-islands: consecutive same-type event runs per user
    "events_runs" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.runs(ev).orderBy("user_id", "run_id")
    }),
    // --- deterministic label-propagation communities on the order–part
    // graph: 3 synchronous rounds, min-label tie-break -> unrolled oracle
    "graph_labelprop" -> ((s, dir) => {
      val e = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst")).distinct()
      Graph.labelPropagation(e, rounds = 3).orderBy("id")
    }),
    // --- modularity of the labelprop communities over the same graph:
    // exact integer q_num/q_den + ONE portable double division
    "graph_modularity" -> ((s, dir) => {
      val e = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst")).distinct()
      Graph.modularity(e, Graph.labelPropagation(e, rounds = 3))
        .orderBy("m_edges")
    }),
    // --- deterministic random walks over the mirrored order-part graph:
    // the DeepWalk/node2vec training-corpus generator. One walk per seed
    // (every 100th orderkey), 4 md5-argmin steps -> unrolled-CTE oracle.
    "graph_walks" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst")).distinct()
      val e = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = ed.select(col("src").as("id")).distinct()
        .filter(col("id") % 100 === 0)
      Graph.randomWalks(e, seeds, steps = 4).orderBy("walk_id")
    }),
    // --- node2vec-biased walks over the same graph: 2nd-order
    // return/in-out weighting via replica-min-hash (min of w iid
    // md5 hashes == exact categorical ∝ w), unrolled-CTE oracle with
    // UNNEST(range(w)) replica twins
    "graph_walks_biased" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst")).distinct()
      val e = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = ed.select(col("src").as("id")).distinct()
        .filter(col("id") % 100 === 0)
      Graph.biasedWalks(e, seeds, steps = 4).orderBy("walk_id")
    }),
    // --- the DeepWalk training corpus end to end: walks -> skip-gram
    // (center, context) pair counts over walk positions
    "graph_walk_corpus" -> ((s, dir) => {
      val ed = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst")).distinct()
      val e = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = ed.select(col("src").as("id")).distinct()
        .filter(col("id") % 100 === 0)
      Graph.walkCorpus(e, seeds, steps = 4, window = 2).orderBy("a", "b")
    }),
    // --- mergeable-histogram quantiles over lineitem prices: the
    // bounded-memory 100 TB alternative to exact percentile
    // --- EXACT distributed order-statistic selection over price cents:
    // <= 4 bucket-count scans regardless of row count, no value
    // buffering — the exact answer next to the binned and sampled
    // approximations
    "value_exact_select" -> ((s, dir) =>
      Analytics.exactSelect(rd(s, dir, "lineitem")
        .select(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
          .as("cents")), "cents").orderBy("q_ppm")),
    // --- EXACT WEIGHTED order statistics: price cents weighted by
    // quantity — the duplication-weighted corpus median primitive
    "value_weighted_select" -> ((s, dir) =>
      Analytics.exactSelectWeighted(rd(s, dir, "lineitem")
        .select(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
          .as("cents"),
          col("l_quantity").cast("long").as("qty")),
        "cents", "qty").orderBy("q_ppm")),
    "value_quantile_bins" -> ((s, dir) =>
      Analytics.binQuantiles(rd(s, dir, "lineitem"), "l_extendedprice",
        bins = 64, qs = Seq(0.5, 0.9, 0.99)).orderBy("q")),
    // --- chi-square category drift between the even/odd event-id
    // snapshots (floor-scaled contributions: order-free + engine-exact)
    "events_drift" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_id"), col("event_type"))
      Quality.drift(ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1), "event_type").orderBy("cat")
    }),
    // --- k-core of the order–part bipartite graph (parts offset into a
    // disjoint id space). Fixed 5 peel rounds -> unrolled-CTE oracle.
    "graph_kcore" -> ((s, dir) => {
      val e = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst")).distinct()
      Graph.kCore(e, k = 4, rounds = 5).orderBy("id")
    }),
    // --- HyperLogLog distinct-user sketch per event type. Registers and
    // the scaled harmonic sum are exact integers (md5-prefix hashes +
    // integer 2^(maxRho-M) terms); the estimate is one double division
    // of a literal — engine-exact end to end.
    "sketch_hll_users" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_type"), col("user_id"))
      Sketches.hllCount(ev, "user_id", Seq("event_type"), b = 8)
        .orderBy("event_type")
    }),
    // --- rolling 7-day distinct users from merged daily HLL sketches:
    // one <=256-row register table per day answers every window
    "events_rolling_hll" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(
        expr("(ts div 1000) div 86400000000").as("day"), col("user_id"))
      Sketches.rollingDistinctHll(ev, "user_id", "day", windowDays = 7)
        .orderBy("day")
    }),
    // --- pairwise audience overlap between event types from KMV
    // k-minima sketches (jaccard/union/intersection estimates)
    "events_audience_overlap" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_type"), col("user_id"))
      val sk = Sketches.kmvSketch(ev, "event_type", "user_id", 256)
      Sketches.kmvOverlapPairs(sk, 256).orderBy("set_a", "set_b")
    }),
    // --- count-min token frequencies: fixed 4x1024 sketch, top-20
    // estimates over the distinct-token candidate set (est >= truth).
    "sketch_cms_tokens" -> ((s, dir) => {
      // aggregate to (token, tf) ONCE: the depth-fold explode then runs
      // over the vocabulary, not the corpus token stream
      val tf = rd(s, dir, "documents")
        .select(explode(TextAnalysis.tokensCol(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("w"))
      val sketch = Sketches.cmsSketchWeighted(tf, "tok", "w", 4, 1024)
      Sketches.cmsEstimate(sketch, tf, "tok", 4, 1024)
        .orderBy(desc("est"), asc("item")).limit(20)
    }),
    // --- AMS F2 sketch over event user_ids: 7 md5-sign sums estimate the
    // self-join size Σf² in one pass; labeled-row union (per-salt est,
    // exact order-statistic median, exact F2 for reference) avoids any
    // one-row-total join. The 7-row global window is post-aggregation.
    // --- mergeable bottom-k quantile sketch over exact price cents:
    // md5-derandomized sample membership makes the estimates
    // engine-exact where approxQuantile's GK merge is order-dependent.
    // The synthetic lineitem repeats (orderkey, linenumber), so the
    // cents fold into the row id — remaining id ties are full-row
    // duplicates, interchangeable under every order the sketch takes
    "sketch_quantiles" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").select(
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("""concat(CAST(l_orderkey AS STRING), ':',
          |CAST(l_linenumber AS STRING), ':',
          |CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS STRING))"""
          .stripMargin).as("rid"))
      Sketches.quantileSketch(li, "cents", "rid", k = 1024)
        .orderBy("q_ppm")
    }),
    // --- power-of-two DDSketch: relative-error quantiles from ~64
    // mergeable bit_length bucket counts (the latency-histogram shape)
    "value_ddsketch" -> ((s, dir) => {
      val v = rd(s, dir, "lineitem").select(
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"))
      Sketches.ddSketch(v, "cents").orderBy("q_ppm")
    }),
    "sketch_f2" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"))
      val sk = Sketches.amsF2(ev, "user_id", depth = 7)
      val salts = sk.select(
        concat(lit("est:"), col("salt").cast("string")).as("stat"),
        col("est").as("value"))
      val med = sk.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("est"), col("salt"))))
        .filter(col("rn") === 4)
        .select(lit("f2_est_median").as("stat"), col("est").as("value"))
      val exact = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n")).as("value"))
        .select(lit("f2_exact").as("stat"), col("value"))
      salts.unionByName(med).unionByName(exact).orderBy("stat")
    }),
    // --- AMS inner-product join-size estimate for orders ⋈ lineitem:
    // same signs on both sides make E[S_A·S_B] the exact equi-join
    // output size; labeled rows as in sketch_f2
    "sketch_joinsize" -> ((s, dir) => {
      val o = rd(s, dir, "orders").select(col("o_orderkey").as("k"))
      val l = rd(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      val sk = Sketches.amsJoinSize(o, "k", l, "k", depth = 7)
      val salts = sk.select(
        concat(lit("est:"), col("salt").cast("string")).as("stat"),
        col("est").as("value"))
      val med = sk.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("est"), col("salt"))))
        .filter(col("rn") === 4)
        .select(lit("join_est_median").as("stat"), col("est").as("value"))
      val exact = o.groupBy(col("k")).agg(count(lit(1)).as("na"))
        .join(l.groupBy(col("k")).agg(count(lit(1)).as("nb")), Seq("k"))
        .agg(sum(col("na") * col("nb")).as("value"))
        .select(lit("join_exact").as("stat"), col("value"))
      salts.unionByName(med).unionByName(exact).orderBy("stat")
    }),
    // --- Bloom runtime filter: urgent-order keys -> 3x65536-bit filter,
    // probe the distinct lineitem keys through broadcast semi-joins
    // (probe side never shuffles); summary counts incl. false positives.
    "bloom_prune" -> ((s, dir) => {
      // urgent feeds the bit build AND the truth tag; bits feeds all 3
      // broadcast semi-joins; probeKeys feeds the probe AND the n_keys
      // card — materialize each once (r15: 12 source scans composed)
      val urgent = rd(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
        .localCheckpoint(true)
      val bits = Sketches.bloomBits(urgent, "o_orderkey", 3, 65536)
        .localCheckpoint(true)
      val probeKeys = rd(s, dir, "lineitem")
        .select(col("l_orderkey")).distinct()
        .localCheckpoint(true)
      val pass = Sketches.bloomFilter(probeKeys, "l_orderkey", bits, 3, 65536)
      val tagged = pass.join(
        urgent.withColumnRenamed("o_orderkey", "l_orderkey")
          .withColumn("is_true", lit(1L)),
        Seq("l_orderkey"), "left")
      val stats = tagged.agg(count(lit(1)).as("n_pass"),
        sum(coalesce(col("is_true"), lit(0L))).as("n_true_pass"))
      probeKeys.agg(count(lit(1)).as("n_keys")).crossJoin(stats)
        .withColumn("n_false_pos", col("n_pass") - col("n_true_pass"))
    }),
    // --- burst-compression debounce: rapid-fire same-(user, type) chains
    // collapse to a leader event + size/span; window and rollup share one
    // (user, type) shuffle
    "events_debounce" -> ((s, dir) =>
      Events.debounceBursts(rdEvents(s, dir), 300L)
        .orderBy("user_id", "event_type", "burst_idx")),
    // --- session journey mining: top-20 session-opening paths (first 5
    // event types per session in pinned arrival order)
    "events_paths" -> ((s, dir) =>
      Events.sessionPaths(rdEvents(s, dir)).orderBy("rank")),
    // --- corpus concentration card: exact Gini + top-category share
    // (integer ppm) over the source and lang mixture dimensions
    "source_gini" -> ((s, dir) =>
      Analytics.concentration(rd(s, dir, "documents"), Seq("source", "lang"))
        .orderBy("dim")),
    // --- code-vs-prose detection: four integer structural counts, one
    // weighted ppm score, fixed threshold; zero shuffles
    "text_code_detect" -> ((s, dir) =>
      TextAnalysis.codeDetect(rd(s, dir, "documents")).orderBy("doc_id")),
    // --- mojibake repair audit: the corpus passes through unchanged,
    // the staged rows exercise every family of the replace chain
    "text_mojibake" -> ((s, dir) => {
      import s.implicits._
      val staged = mojibakeStaged.toDF("doc_id", "text")
      TextAnalysis.mojibakeRepair(
        rd(s, dir, "documents").select(col("doc_id"), col("text"))
          .unionByName(staged))
        .orderBy("doc_id")
    }),
    // --- SFT chat-turn parsing: conversations constructed
    // deterministically from the corpus (role lines + multi-line
    // continuations from embedded newlines), parsed back into turns
    "docs_sft_turns" -> ((s, dir) => {
      val convs = rd(s, dir, "documents").filter(col("n_chars") >= 300)
        .select(col("doc_id"), concat(
          lit("system: be concise"), expr("chr(10)"),
          lit("user: "), expr("substring(text, 1, 60)"), expr("chr(10)"),
          lit("assistant: "), expr("substring(text, 61, 120)"),
          expr("chr(10)"),
          lit("user: continue"), expr("chr(10)"),
          lit("assistant: "), expr("substring(text, 181, 80)")).as("conv"))
      TextAnalysis.parseChatTurns(convs).orderBy("doc_id", "turn_idx")
    }),
    // --- WARC-record parsing: header/payload framing at the first
    // CRLFCRLF, prefix-matched fields, declared-vs-actual length audit
    // (docs over 200 chars are deliberately truncated -> len_ok = 0)
    "web_warc" -> ((s, dir) => {
      val crlf = "\r\n"
      val recs = rd(s, dir, "documents").select(col("doc_id"), concat(
        lit("WARC/1.0" + crlf),
        lit("WARC-Type: response" + crlf),
        lit("WARC-Target-URI: https://corpus.local/"), col("source"),
        lit("/"), col("doc_id").cast("string"), lit(crlf),
        lit("Content-Length: "), col("n_chars").cast("string"),
        lit(crlf + crlf),
        expr("substring(text, 1, 200)")).as("record"))
      Web.parseWarc(recs).orderBy("doc_id")
    }),
    // --- curriculum staging: ntile difficulty tiers over the pinned
    // (n_chars, doc_id) order + md5 within-stage shuffle rank
    "sample_curriculum" -> ((s, dir) =>
      Sampling.curriculumOrder(
        rd(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", 4).orderBy("stage", "pos")),
    // --- item-based collaborative filtering over customer->part
    // purchases: integer path-count scores, owned items anti-joined out
    "reco_itemcf" -> ((s, dir) =>
      // served from the staged bucketed index (built once per
      // session+dir, shared with reco_coverage) — output-identical to
      // the fused Reco.itemCf chain with the same params
      Reco.itemCfIndexed(s, recoIndexTable(s, dir), recoPurch(s, dir),
        topK = 3, maxBasket = 100).orderBy("u", "rank")),
    // --- leave-last-out recommender backtest: hold out each customer's
    // most recent part, retrain, exact integer hit@10 / MRR ppm
    "reco_eval" -> ((s, dir) => {
      val inter = rd(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        .join(rd(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("it"),
          col("o_orderdate").as("t"))
      Reco.leaveLastOutEval(inter, topK = 10, maxBasket = 100,
        minCo = 3L)
    }),
    // --- seasonal-naive forecast backtest: day d predicted by day d-7,
    // exact integer MAE/bias per type, ancestor by keyed join (never a
    // row-offset lag across day gaps)
    "events_snaive" -> ((s, dir) =>
      Events.seasonalNaiveBacktest(rdEvents(s, dir), 7)
        .orderBy("event_type")),
    // --- day-of-week seasonal lift per type vs the independence
    // expectation, exact integer ppm over the (type × 7) cell table
    "events_seasonal" -> ((s, dir) =>
      Events.seasonalProfile(rdEvents(s, dir))
        .orderBy("event_type", "dow")),
    // --- classical trend/seasonal/remainder decomposition of the
    // daily count series, exact integer ppm throughout
    "events_decompose" -> ((s, dir) =>
      Events.seasonalDecompose(rdEvents(s, dir)).orderBy("day")),
    // --- Welch means test on value over the md5 A/B split (the t next
    // to events_ab's conversion z): exact cent moments, double close
    "events_welch" -> ((s, dir) =>
      Events.welchTTest(rdEvents(s, dir)).orderBy("n_a")),
    // --- TPC-H Q6 selective revenue probe: every predicate pushed to
    // the scan (date epoch range, integer-cent discount, qty bound)
    "q6_selective" -> ((s, dir) =>
      Analytics.q6(rd(s, dir, "lineitem")).orderBy("n_rows")),
    // --- per-source freshness audit: staleness vs the globally
    // freshest source + final-active-day volume share
    "dq_freshness" -> ((s, dir) =>
      Events.freshness(rdEvents(s, dir)).orderBy("event_type")),
    // --- isotonic calibration via the minimax (PAVA closed-form)
    // identity over quantized score bins: floor commutes with min/max,
    // so the ppm fit is exact; bounded bins² broadcast pair frame
    "eval_isotonic" -> ((s, dir) =>
      Eval.isotonicCard(rd(s, dir, "documents")
        .select(col("n_chars").as("score"),
          (col("lang") === "en").as("label")))),
    // --- Holt level+trend smoothing (α=β=½ bit-shift recursion with
    // positive-offset floors) over the daily grid; recursive-CTE twin
    "events_holt" -> ((s, dir) =>
      Events.holtForecast(rdEvents(s, dir))),
    // --- uplift-by-decile (Qini curve): pre-period-spend score deciles,
    // treated/control conversion rates + running cumulative uplift
    "events_uplift" -> ((s, dir) =>
      Events.upliftDeciles(rdEvents(s, dir))),
    // --- Holt–Winters additive: the holt recursion plus 7 weekly
    // seasonal cells, slot (i−1) mod 7, same bit-shift halvings
    "events_holt_winters" -> ((s, dir) =>
      Events.holtWintersForecast(rdEvents(s, dir), period = 7)),
    // --- sequential rules A-before-B per user: first(A) < last(B)
    // decides existence, exact ppm confidence
    "events_seqrules" -> ((s, dir) =>
      Events.seqRules(rdEvents(s, dir))),
    // --- Holt-vs-naive one-step backtest: the model gate next to the
    // fit, same bit-shift recursion scoring before each update
    "events_holt_eval" -> ((s, dir) =>
      Events.holtBacktest(rdEvents(s, dir))),
    // --- rendezvous-hash resharding audit: the 8 → 9 move matrix
    // (only the new shard gains rows; stability is the point)
    "shard_rebalance" -> ((s, dir) =>
      graft.sources.Shards.rebalancePlan(rd(s, dir, "documents"),
        "doc_id", 8, 9)),
    // --- TPC-H Q16 shape: distinct suppliers per surviving part class
    // through the lineitem bridge, bad suppliers anti-joined out
    "q16_parts" -> ((s, dir) =>
      Analytics.q16(rd(s, dir, "lineitem"), rd(s, dir, "part"),
        rd(s, dir, "supplier"))),
    // --- Neyman stratified allocation of a 1000-row budget by source
    // (weights floored to integers so the cross-stratum sum is
    // order-free; per-stratum sqrt is one IEEE op off exact moments)
    "sample_neyman" -> ((s, dir) =>
      Sampling.neymanAllocation(rd(s, dir, "documents"),
        "source", "n_chars", 1000L)),
    // --- leave-one-source-out ablation: corpus metrics recomputed
    // without each source from one set of sums
    "docs_ablation" -> ((s, dir) =>
      Sampling.sourceAblation(rd(s, dir, "documents"))),
    // --- off-policy bandit replay: md5-coin split, greedy per-dow
    // policy from train rewards, replay-matched eval means
    "eval_policy_replay" -> ((s, dir) =>
      Eval.policyReplay(rdEvents(s, dir))),
    // --- per-user behavioral fingerprint: median gap + gap VMR along
    // the deterministic (ts, event_id) order
    "events_bots" -> ((s, dir) =>
      Events.botCard(rdEvents(s, dir))),
    // --- Markov removal-effect attribution: bounded transition table,
    // 12 fixed e6 absorption rounds, one scenario per channel
    "events_attrib_markov" -> ((s, dir) =>
      Events.markovAttribution(rdEvents(s, dir))),
    // --- exact Shapley attribution: one (user, day) coalition-bitmask
    // shuffle, <=2^c cell collect, factorial-scaled integer credits
    "events_shapley" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
      Events.shapleyAttribution(ev)
    }),
    // --- TPC-H Q11 shape: parts above 7 bp of total revenue, the
    // HAVING-vs-scalar-subquery probe (cross-multiplied, no division)
    "q11_important" -> ((s, dir) =>
      Analytics.q11(rd(s, dir, "lineitem"))),
    // --- time-travel snapshot election: newest snapshot at-or-before
    // 1996-07-01, customers born later drop out
    "snapshot_asof" -> ((s, dir) => {
      val snaps = rd(s, dir, "orders").select(
        col("o_custkey").as("customer_id"),
        unix_timestamp(col("o_orderdate")).as("snapshot_ts"))
      Snapshots.asOfPerCustomer(snaps, 836179200L).orderBy("customer_id")
    }),
    // --- k-source Brandes betweenness over the order–customer graph:
    // exact BIGINT path counts forward, e6 dependency floors backward
    "graph_betweenness" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val seeds = rd(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey").as("id"))
      Graph.betweenness(e, seeds, 3)
    }),
    // --- TPC-H Q20 shape: suppliers shipping >half of a red part's
    // 1996 volume — nested semi-join + decorrelated correlated agg
    "q20_dominant" -> ((s, dir) =>
      Analytics.q20(rd(s, dir, "lineitem"), rd(s, dir, "part"),
        rd(s, dir, "supplier"))),
    // --- interval-union coverage per user: merge [ts, ts+value s)
    // islands, report covered/span/utilization in exact µs
    "events_coverage" -> ((s, dir) =>
      Events.intervalCoverage(rdEvents(s, dir))),
    // --- cohort LTV matrix: first-event-week cohorts × week-age,
    // cumulative cents and per-member read, exact end to end
    "events_cohort_ltv" -> ((s, dir) =>
      Events.cohortLtv(rdEvents(s, dir))),
    // --- candidate-key audit over events: which combos are usable
    // upsert/CDC identities (distinct == rows, no null components)
    "dq_keys" -> ((s, dir) =>
      Quality.keyAudit(rdEvents(s, dir), Seq(
        Seq("event_id"), Seq("user_id"),
        Seq("user_id", "ts"), Seq("event_type", "ts")))),
    // --- dedup threshold calibration: planted perturbed copies with
    // id-varying damage, exact-jaccard scored pairs, all-integer F1
    // sweep with a deterministic best election
    "dedup_threshold_sweep" -> ((s, dir) => {
      val base = rd(s, dir, "documents").filter(col("doc_id") < 2000)
        .select(col("doc_id"), col("text"))
      val planted = base.filter(col("doc_id") < 40).select(
        (col("doc_id") + 100000L).as("doc_id"),
        expr("""concat(substring(text, 1,
          |greatest(length(text) - (CAST(doc_id % 12 AS INT) * 15 + 3),
          |  0)), 'XXX')""".stripMargin).as("text"))
      val scored = Dedup.tokenJaccardPrefix(base.unionByName(planted),
        tau = 0.3, ngram = 3)
      val truth = base.filter(col("doc_id") < 40)
        .select(col("doc_id").as("a_id"),
          (col("doc_id") + 100000L).as("b_id"))
      Dedup.thresholdSweep(scored, truth)
    }),
    // --- robots-style longest-prefix path rules over synthetic paths;
    // allow beats deny on equal length, default-allow unmatched
    "web_robots" -> ((s, dir) => {
      import s.implicits._
      val urls = rd(s, dir, "documents").select(
        col("doc_id").as("url_id"),
        expr("""concat('/',
          |CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'public'
          |  WHEN 1 THEN 'private' WHEN 2 THEN 'tmp' ELSE 'data' END,
          |'/',
          |CASE WHEN doc_id % 8 = 1 THEN 'share/' ELSE '' END,
          |CAST(doc_id % 16 AS STRING))""".stripMargin).as("path"))
      val rules = Seq(("/", true), ("/private/", false),
        ("/tmp/", false), ("/private/share/", true))
        .toDF("prefix", "allow")
      Web.robotsFilter(urls, rules)
    }),
    // --- BPE decode round trip: train 8 merges, decode every vocab
    // word back from its subwords — encode∘decode == identity audit
    "text_bpe_decode" -> ((s, dir) =>
      TextAnalysis.bpeTrainDecode(rd(s, dir, "documents"), 8)
        .orderBy("word")),
    // --- deterministic global-shuffle export manifest: md5 total order
    // cut into 16 contiguous h-ranges; offsets give the batch plan
    "shard_shuffled" -> ((s, dir) =>
      graft.sources.Shards.shuffleManifest(rd(s, dir, "documents"),
        "doc_id", "text", "r13", 16).orderBy("shard")),
    // --- canonical-doc survivorship: prefix families (perturbed
    // replicas share 40-char prefixes), richest doc wins, min-id ties
    "dedup_keep_best" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val clusters = docs
        .withColumn("fam", md5(substring(col("text"), 1, 40)))
        .withColumn("cluster_id",
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("fam")))
        .select(col("doc_id"), col("cluster_id"))
      Dedup.keepBest(docs, clusters, "n_chars")
        .orderBy("cluster_id", "doc_id")
    }),
    // --- Cohen's kappa: chance-corrected agreement of the n-gram
    // langid heuristic against the dataset lang label (multi-class)
    "eval_kappa" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pred = TextAnalysis.langId(docs)
        .select(col("doc_id"), col("predicted_lang"))
      Eval.kappaCard(docs.join(pred, "doc_id")
        .select(col("predicted_lang").as("label_a"),
          col("lang").as("label_b")))
    }),
    // --- McNemar paired test: length-gate vs token-count-gate quality
    // classifiers judged on their disagreement cells only
    "eval_mcnemar" -> ((s, dir) =>
      Eval.mcnemarCard(rd(s, dir, "documents").select(
        (col("lang") === "en").as("label"),
        (col("n_chars") >= 300).as("pred_a"),
        (size(split(trim(col("text")), "\\s+")) >= 50).as("pred_b")))),
    // --- pairwise total-variation distance between per-source unigram
    // distributions: the libm-free corpus-divergence card
    "corpus_tvd" -> ((s, dir) =>
      TextAnalysis.sourceTvd(rd(s, dir, "documents"))
        .orderBy("source_a", "source_b")),
    // --- DAU/MAU stickiness over fixed 28-day periods, exact ppm
    "events_stickiness" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      Events.stickiness(ev, 28).orderBy("period")
    }),
    // --- bipartite butterfly census over the order–part graph (the
    // bipartite triangle analogue; wedge fan from the bounded side)
    "graph_butterflies" -> ((s, dir) =>
      Graph.butterflyCensus(rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")))),
    // --- frame-sampling plan: stub-decoder frame counts, every-10th
    // stride, engine-portable frame fingerprints
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.framePlan(
        Multimodal.asMediaMixed(rd(s, dir, "documents")), 10)
        .orderBy("media_id", "frame_idx")),
    // --- ROUGE-1/2 card: clipped n-gram overlap of a perturbed
    // candidate against its reference, exact ppm (the log-free BLEU)
    "eval_rouge" -> ((s, dir) => {
      val refs = rd(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id").as("pair_id"), col("text").as("ref"))
      val both = refs.withColumn("cand", expr(
        """concat(substring(ref, 1,
          |greatest(length(ref) - (CAST(pair_id % 7 AS INT) * 20), 40)),
          |' extra tail tokens')""".stripMargin))
      TextAnalysis.rougeN(both, 1)
        .unionByName(TextAnalysis.rougeN(both, 2))
        .orderBy("n", "pair_id")
    }),
    // --- Croston intermittent-demand forecast per event type: z/p
    // EWMAs on demand days only, bit-shift alpha=1/2, exact fixed-point
    "events_croston" -> ((s, dir) => {
      val ev = rdEvents(s, dir).select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"), col("value"))
      Events.croston(ev)
    }),
    // --- incremental (append-only segment) inverted index: two
    // disjoint batches appended, BM25 read equals the baked index
    "search_indexed_incremental" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val staged = java.nio.file.Files
        .createTempDirectory("graft_sidx_inc").toString
      TextAnalysis.appendSearchIndex(docs.filter(col("doc_id") >= 1000),
        staged)
      TextAnalysis.appendSearchIndex(docs.filter(col("doc_id") < 1000),
        staged)
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      TextAnalysis.bm25TopKIndexedInc(s, staged, qs, 5)
        .orderBy("query_id", "rank")
    }),
    // --- extractive summarization: top-2 sentences per doc by summed
    // inverse-df token weight (log-free idf), earlier sentence on ties
    "docs_summary" -> ((s, dir) => {
      val toks = rd(s, dir, "documents").select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("t"))
      val staged = toks.select(col("doc_id"), expr(
        "concat(array_join(transform(sequence(1, " +
          "cast(ceil(size(t)/8.0) as int)), " +
          "i -> array_join(slice(t, (i-1)*8+1, 8), ' ')), '. '), '.')")
        .as("text"))
      TextAnalysis.extractiveSummary(staged, 2).orderBy("doc_id", "rank")
    }),
    // --- recommender catalog-coverage / popularity-bias card over the
    // itemCF top-3 recs: head-collapse detector, exact ppm
    "reco_coverage" -> ((s, dir) => {
      val purch = recoPurch(s, dir)
      // same staged index as reco_itemcf: the co-occurrence self-join
      // is paid once per suite run, not once per reco query
      val recs = Reco.itemCfIndexed(s, recoIndexTable(s, dir), purch,
        topK = 3, maxBasket = 100)
      Reco.coverageCard(recs, purch)
    }),
    // --- SFT transcript quality gate: alternation / terminal-role /
    // short-assistant lint over parsed turns; staged violations planted
    "sft_quality" -> ((s, dir) => {
      val base = rd(s, dir, "documents").filter(col("n_chars") >= 300)
        .select(col("doc_id"), concat(
          lit("system: be concise"), expr("chr(10)"),
          lit("user: "), expr("substring(text, 1, 60)"), expr("chr(10)"),
          lit("assistant: "), expr("substring(text, 61, 120)"),
          expr("chr(10)"),
          lit("user: continue"), expr("chr(10)"),
          lit("assistant: "), expr("substring(text, 181, 80)")).as("conv"))
      val convs = base.withColumn("conv",
        when(col("doc_id") % 3 === 0, concat(col("conv"),
          expr("chr(10)"), lit("user: trailing question")))
          .when(col("doc_id") % 5 === 0, concat(col("conv"),
            expr("chr(10)"), lit("assistant: ok")))
          .otherwise(col("conv")))
      TextAnalysis.sftQuality(TextAnalysis.parseChatTurns(convs))
        .orderBy("doc_id")
    }),
    // --- crawl-frontier politeness schedule: per-domain budget rounds,
    // sort-key order (never a global row_number), overflow visible
    "web_frontier" -> ((s, dir) => {
      val urls = rd(s, dir, "documents").select(
        col("doc_id").as("url_id"),
        concat(lit("host"), (col("doc_id") % 20).cast("string"))
          .as("domain"),
        col("n_chars").as("priority"))
      Web.crawlFrontier(urls, 3, 5).orderBy("domain", "domain_rank")
    }),
    // --- URL-canonical dedup: the web_domains staging normalized, then
    // one canonical survivor per url_norm family (min url_id)
    "dedup_urls" -> ((s, dir) => {
      val urls = rd(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("h", expr(
          """concat(CASE WHEN doc_id % 7 IN (1, 3, 5) THEN 'www.' ELSE '' END,
            |source, '.',
            |CASE CAST((doc_id div 4) % 4 AS INT) WHEN 0 THEN 'com'
            |  WHEN 1 THEN 'org' WHEN 2 THEN 'net' ELSE 'io' END)""".stripMargin))
        .withColumn("url", expr(
          """concat(
            |CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END, '://',
            |CASE WHEN doc_id % 7 = 0 THEN upper(h) ELSE h END,
            |CASE WHEN doc_id % 5 = 0 THEN
            |  (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END)
            |  ELSE '' END,
            |'/', lang, '/p', CAST(doc_id % 40 AS STRING),
            |CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END,
            |CASE WHEN doc_id % 3 = 0 THEN
            |  concat('?utm_source=feed&utm_medium=rss&id=',
            |         CAST(doc_id % 9 AS STRING))
            |  WHEN doc_id % 3 = 1 THEN concat('?id=', CAST(doc_id % 9 AS STRING))
            |  ELSE '' END,
            |CASE WHEN doc_id % 5 = 0 THEN '#sec2' ELSE '' END)""".stripMargin))
        .drop("h")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("url_norm")
      Web.normalizeUrls(urls)
        .select(col("doc_id").as("url_id"), col("url_norm"))
        .withColumn("n_variants", count(lit(1)).over(w).cast("long"))
        .withColumn("keep", row_number().over(
          w.orderBy("url_id")) === 1)
        .orderBy("url_id")
    }),
    // --- derandomized independent-cascade spread over the order–part
    // graph: md5-threshold edge trials, hop-3 reach per trial
    "graph_cascade" -> ((s, dir) => {
      val e = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + 20000000L).as("dst"))
      val e2 = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = rd(s, dir, "orders").filter(col("o_orderkey") < 10)
        .select(col("o_orderkey").as("id"))
      Graph.independentCascade(e2, seeds, pPpm = 300000L, trials = 3,
        maxHops = 3).orderBy("trial")
    }),
    // --- seasonality-aware anomaly flags: STL-style remainder gated by
    // the doubled-order-statistic MAD, all integers
    "events_anomaly_seasonal" -> ((s, dir) =>
      Events.seasonalAnomalies(rdEvents(s, dir), 3).orderBy("day")),
    // --- exact Shapley data valuation of sources on vocabulary
    // coverage: top-5 sources individually, long tail pooled
    "docs_shapley_sources" -> ((s, dir) =>
      Sampling.shapleyVocabValue(rd(s, dir, "documents"), 5)),
    // --- tokenizer fertility by language: subwords-per-token of the
    // trained BPE per lang — the "which languages does this tokenizer
    // tax" card (fertility drives real training cost per document)
    "text_fertility" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val enc = TextAnalysis.bpeTrainEncode(docs, 8)
        .select(col("doc_id"), col("n_tokens"), col("n_subwords"))
      docs.select(col("doc_id"), col("lang"))
        .join(enc, "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_subwords")).as("n_subwords"))
        .withColumn("fertility_ppm",
          expr("1000000L * n_subwords div n_tokens"))
        .orderBy("lang")
    }),
    // --- PII-detector eval: planted gold per class (real email/IP
    // caught, obfuscated forms honestly missed), per-class recall
    "pii_eval" -> ((s, dir) => {
      val staged = rd(s, dir, "documents").select(col("doc_id"),
        expr("""concat(text, ' ',
          |CASE CAST(doc_id % 4 AS INT)
          |  WHEN 0 THEN concat('user', CAST(doc_id AS STRING),
          |    '@example.com')
          |  WHEN 1 THEN concat('user', CAST(doc_id AS STRING),
          |    ' at example dot com')
          |  WHEN 2 THEN concat('10.1.0.', CAST(doc_id % 256 AS STRING))
          |  ELSE 'five five five 0123' END)""".stripMargin).as("text"),
        expr("""CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'email'
          |  WHEN 1 THEN 'email_obfuscated' WHEN 2 THEN 'ip'
          |  ELSE 'phone_obfuscated' END""".stripMargin).as("planted"))
      staged.select(col("doc_id"), col("planted"))
        .join(TextAnalysis.redactPii(staged), "doc_id")
        .groupBy(col("planted"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_emails") + col("n_phones") + col("n_ips") > 0,
            1L).otherwise(0L)).as("n_flagged"))
        .withColumn("recall_ppm", expr("1000000L * n_flagged div n_docs"))
        .orderBy("planted")
    }),
    // --- LWW conflict audit: planted concurrent writers (same key,
    // same instant, different value) surface as conflict instants
    "cdc_lww_audit" -> ((s, dir) => {
      val base = rdEvents(s, dir).select(col("user_id").as("k"),
        expr("ts div 1000").as("t"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v"))
      val planted = base.filter(col("k") < 50)
        .groupBy("k").agg(min(col("t")).as("t"))
        .withColumn("v", lit(-1L))
      Cdc.lwwAudit(base.unionByName(planted), "k", "t", "v")
        .orderBy("k")
    }),
    // --- class-balanced batch assembly over labeled embeddings:
    // md5-shuffled slots, ragged trailing batches flagged
    "pack_balanced" -> ((s, dir) =>
      Sampling.balancedBatches(rd(s, dir, "embeddings"), "label",
        "vec_id", 4).orderBy("id")),
    // --- duplicate-family census: component-size histogram over the
    // jaccard pair graph, singletons included as size-1 families
    "dedup_family_sizes" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val clusters = Dedup.resolveClustersStar(
        Dedup.ngramJaccard(docs).select("a_id", "b_id"))
      docs.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cid", coalesce(col("cluster_id"), col("doc_id")))
        .groupBy(col("cid")).agg(count(lit(1)).as("family_size"))
        .groupBy(col("family_size"))
        .agg(count(lit(1)).as("n_families"))
        .withColumn("n_docs", col("family_size") * col("n_families"))
        .orderBy("family_size")
    }),
    // --- multi-class F1 card: per-class precision/recall/F1 for the
    // langid heuristic vs the dataset label, plus the __macro__ row
    "eval_f1_macro" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val pred = TextAnalysis.langId(docs)
        .select(col("doc_id"), col("predicted_lang"))
      Eval.macroF1Card(docs.join(pred, "doc_id")
          .select(col("lang").as("label"),
            col("predicted_lang").as("pred")))
        .orderBy("cls")
    }),
    // --- exact Spearman rho between doc length in chars and in
    // whitespace tokens: doubled-midrank Pearson, IEEE-sqrt portable
    "eval_spearman" -> ((s, dir) =>
      Eval.spearmanCard(rd(s, dir, "documents")
        .select(col("n_chars").cast("long").as("x"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("y")),
        "x", "y")),
    // --- rank-biased overlap between the chars-ranked and tokens-ranked
    // per-source top-10: per-depth floored ppm terms, p = 9/10
    "eval_rbo" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
        .withColumn("toks",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("n_chars"), asc("doc_id"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("toks"), asc("doc_id"))
      val rankA = docs.select(col("source").as("query_id"), col("doc_id"),
        row_number().over(wA).cast("long").as("rnk"))
      val rankB = docs.select(col("source").as("query_id"), col("doc_id"),
        row_number().over(wB).cast("long").as("rnk"))
      Eval.rboCard(rankA, rankB, 10).orderBy("query_id")
    }),
    // --- split-conformal coverage: |n_chars - 5·tokens| nonconformity,
    // md5-parity calibration split, exact order-statistic threshold
    "eval_conformal" -> ((s, dir) =>
      Eval.conformalCard(rd(s, dir, "documents")
          .withColumn("yhat",
            lit(5L) * size(split(trim(col("text")), "\\s+")).cast("long")),
        "n_chars", "yhat", "doc_id", 10)),
    // --- decision-stump election: the n_chars threshold best splitting
    // English from non-English, exact weighted-Gini cost in ppm
    "eval_best_split" -> ((s, dir) =>
      Eval.bestSplitCard(rd(s, dir, "documents")
          .select(col("n_chars").cast("long").as("score"),
            (col("lang") === "en").as("label")),
        "score", "label")),
    // --- group-fairness audit of the length-gate classifier across
    // sources: selection/TPR/FPR gaps vs the overall rates, exact ppm
    "eval_fairness" -> ((s, dir) =>
      Eval.fairnessCard(rd(s, dir, "documents")
          .select(col("source").as("grp"),
            (col("lang") === "en").as("label"),
            (col("n_chars") >= 300).as("pred")))
        .orderBy("grp")),
    // --- session-path edit distance to the modal journey: letter-coded
    // event types, levenshtein DP identical in both engines
    "events_path_distance" -> ((s, dir) =>
      Events.pathEditDistance(rdEvents(s, dir)).orderBy("path")),
    // --- ArticleRank: PageRank with hub damping via the mean out-degree
    // in every divisor (the GDS variant) — unrolled-CTE exact oracle
    "graph_articlerank" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      Graph.articleRank(e, 5).orderBy("id")
    }),
    // --- eigenvector centrality: 5 power-iteration rounds with integer
    // L-inf normalization over the MIRRORED order-customer graph
    "graph_eigenvector" -> ((s, dir) => {
      val d = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val e = d.unionByName(
        d.select(col("dst").as("src"), col("src").as("dst")))
      Graph.eigenvectorCentrality(e, 5).orderBy("id")
    }),
    // --- two-phase exact heavy hitters over document tokens: pigeonhole
    // candidate pass (rows bucketed by md5 of doc:pos) + broadcast
    // recount — items with count strictly > n/100
    "sketch_heavy_hitters" -> ((s, dir) => {
      val toks = rd(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")))
        .select(col("col").as("item"),
          concat(col("doc_id").cast("string"), lit(":"),
            col("pos").cast("string")).as("row_key"))
      Sketches.heavyHitters(toks, "item", "row_key", c = 100, buckets = 32)
        .orderBy("item")
    }),
    // --- DoReMi-shaped domain reweighting: multiplicative weights over
    // per-source excess mean length, 5 unrolled integer rounds
    "mix_doremi" -> ((s, dir) =>
      Sampling.doremiWeights(rd(s, dir, "documents"), 5)
        .orderBy("source")),
    // --- BLEU-2 card on the rouge fixture pairs: clipped ppm
    // precisions, exp-free product transform, brevity operands
    "eval_bleu" -> ((s, dir) => {
      val refs = rd(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id").as("pair_id"), col("text").as("ref"))
      val both = refs.withColumn("cand", expr(
        """concat(substring(ref, 1,
          |greatest(length(ref) - (CAST(pair_id % 7 AS INT) * 20), 40)),
          |' extra tail tokens')""".stripMargin))
      TextAnalysis.bleuCard(both).orderBy("pair_id")
    }),
    // --- trailing 7-day rolling MEDIAN (doubled-exact) of daily event
    // counts per type — the robust alerting baseline
    "events_rolling_median" -> ((s, dir) => {
      val perDay = rdEvents(s, dir)
        .groupBy(col("event_type").as("key"),
          expr("(ts div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("v"))
      Events.rollingMedian(perDay, 7)
        .select(col("key").as("event_type"), col("day"), col("n_days"),
          col("med2"), col("mean_ppm"))
        .orderBy("event_type", "day")
    }),
    // --- cross-modal alignment card: stub md5 media encoder x int8
    // text embedding, exact BIGINT dot, keep-gate at 0
    "multimodal_align" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        rd(s, dir, "documents").select(col("doc_id"), col("text")))
      Multimodal.alignScore(media, rd(s, dir, "embeddings"), 16)
        .orderBy("media_id")
    }),
    // --- Wasserman-Faust closeness from the harmonic pivot seeds:
    // 1e6*r^2 div (|seeds| * sum(d)), DECIMAL cross-multiply
    "graph_closeness" -> ((s, dir) => {
      val e = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val seeds = rd(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey").as("id"))
      Graph.closenessCentrality(e, seeds, 3).orderBy("id")
    }),
    // --- cross-batch novelty curve: batches by doc_id % 4 plus two
    // planted re-ingestions (full copies at batch 4, doc_id < 60; and
    // at batch 2, doc_id < 20) — prior-dup iff checksum seen earlier
    "corpus_novelty" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val staged = docs.select((col("doc_id") % 4).as("batch"),
          col("text"))
        .unionByName(docs.filter(col("doc_id") < 60)
          .select(lit(4L).as("batch"), col("text")))
        .unionByName(docs.filter(col("doc_id") < 20)
          .select(lit(2L).as("batch"), col("text")))
      Dedup.noveltyCurve(staged).orderBy("batch")
    }),
    // --- Cohen's d / Hedges' g effect size on the welch arm split
    "events_effect_size" -> ((s, dir) =>
      Events.effectSizeCard(rdEvents(s, dir))),
    // --- pseudo-relevance-feedback expansion terms for the bm25
    // first-5-token queries: feedback tf x integer idf, top-5 per query
    "search_prf" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      TextAnalysis.prfExpandTerms(docs, qs, 5, 5)
        .orderBy("query_id", "rank")
    }),
    // --- kNN label-noise audit over the labeled embeddings: sampled
    // probes, majority-of-5 exact-cosine neighbors vs own label
    "embed_label_noise" -> ((s, dir) =>
      Similarity.labelNoiseAudit(rd(s, dir, "embeddings"), 5, 17)
        .orderBy("query_id")),
    // --- Kahn topological layers over the decimal-digit part tree
    // (p -> p div 10): layer = longest path from a leaf, NULL leftovers
    "graph_toposort" -> ((s, dir) => {
      val e = rd(s, dir, "part").filter(col("p_partkey") >= 10)
        .select(col("p_partkey").as("src"),
          expr("p_partkey div 10").as("dst"))
      Graph.kahnLayers(e, 8).orderBy("id")
    }),
    // --- DP noisy top-k token release: binomial md5 noise, suppression
    // threshold, TakeOrdered top-20 by noisy count
    "privacy_dp_topk" -> ((s, dir) => {
      val toks = rd(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      Privacy.dpTopK(toks, "token", 20, 10L).orderBy("rank")
    }),
    // --- Katz-attenuated centrality on the order-customer bipartite
    // graph: unit base mass + beta=1/2 bit-shift damping per round,
    // integer L-inf rescale (the eigenvector recipe, better-conditioned)
    "graph_katz" -> ((s, dir) => {
      val d = rd(s, dir, "orders").select(col("o_orderkey").as("src"),
        (col("o_custkey") + 10000000L).as("dst"))
      val e = d.unionByName(d.select(col("dst").as("src"),
        col("src").as("dst")))
      Graph.katzCentrality(e, 5).orderBy("id")
    }),
    // --- global transitivity census over the sampled part
    // co-occurrence graph: 3*triangles/wedges, one-row card
    "graph_transitivity" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      Graph.transitivityCard(
        Graph.coOccurrence(li, "l_orderkey", "l_partkey"))
        .orderBy("n_nodes")
    }),
    // --- per-edge embeddedness (common-neighbor count) over the same
    // graph: zero-support rows are the local bridges
    "graph_embeddedness" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      Graph.edgeEmbeddedness(
        Graph.coOccurrence(li, "l_orderkey", "l_partkey"))
        .orderBy("a", "b")
    }),
    // --- Matthews correlation over the eval_confusion staging:
    // DECIMAL(38,0) numerator, factored-sqrt portable double close
    "eval_mcc" -> ((s, dir) =>
      Eval.mccCard(rd(s, dir, "documents")
        .select(col("n_chars").as("score"),
          (col("lang") === "en").as("label")), 300L)),
    // --- NDCG@5 over the eval_retrieval framing: build-time integer
    // log2-discount table shared verbatim with the oracle
    "eval_ndcg" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5).select(
        col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
          .as("query_text"))
      TextAnalysis.ndcgCard(docs, qs, 5)
    }),
    // --- Kendall tau-a between click and view daily counts: exact
    // concordant/discordant pair census on the shared gap-filled grid
    "events_kendall" -> ((s, dir) =>
      Events.kendallDaily(rdEvents(s, dir), "click", "view")),
    // --- Mann-Kendall trend test per type: exact S, integer variance
    // numerator, continuity-corrected portable-double z
    "events_mannkendall" -> ((s, dir) =>
      Events.mannKendall(rdEvents(s, dir)).orderBy("event_type")),
    // --- trailing 14-day rolling Pearson r between click and view
    // daily counts: integer window moments, fixed IEEE close
    "events_rolling_corr" -> ((s, dir) =>
      Events.rollingCorrelation(rdEvents(s, dir), "click", "view", 14)
        .orderBy("day")),
    // --- SAX symbolic discretization: 7-day integer PAA, exact x4
    // quartile cut-points, a-d alphabet
    "events_sax" -> ((s, dir) =>
      Events.saxSymbols(rdEvents(s, dir), 7)
        .orderBy("event_type", "win")),
    // --- cross-doc sentence duplication census over the 8-token block
    // sentence staging (the docs_sentences fixture): top repeated
    // sentences with doc counts + earliest carrier
    "dedup_sentences" -> ((s, dir) => {
      val toks = rd(s, dir, "documents").select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("t"))
      val sents = toks.select(col("doc_id"), explode(expr(
        "transform(sequence(1, cast(ceil(size(t)/8.0) as int)), " +
          "i -> array_join(slice(t, (i-1)*8+1, 8), ' '))")).as("sentence"))
      Dedup.sentenceDuplication(sents, 2L, 100).orderBy("rank")
    }),
    // --- salted skew join vs its plain twin: identical rows by
    // construction, only the partitioning changes (SURVEY row 35's
    // spec gate upgraded to a value-level oracle)
    "skew_join_salted" -> ((s, dir) => {
      val large = rd(s, dir, "lineitem").select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("price_c"))
      val small = rd(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Skew.saltedJoin(large, small, "l_suppkey")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("revenue_c"))
        .orderBy("s_nationkey")
    }),
    // --- hot-bucket star fallback on planted 8-copy families with
    // SYNTHESIZED per-family vocabularies (zero cross-family shingle
    // overlap, so tau kills any bucket-collision edge): with
    // hotBucket=1 every bucket stars and the output collapses to the
    // O(D) (family min, member) set — derivable from the construction
    // alone (SURVEY row 18a's spec gate upgraded to a value oracle)
    "dedup_minhash_star" -> ((s, dir) => {
      val fam = rd(s, dir, "documents").filter(col("doc_id") < 30)
        .select(col("doc_id"), explode(sequence(lit(0L), lit(7L))).as("r"))
        .select((col("doc_id") * 1000L + col("r")).as("doc_id"),
          expr("""concat_ws(' ', transform(sequence(1, 10),
                  i -> concat('w', CAST(doc_id AS STRING), '_',
                    CAST(i AS STRING))))""").as("text"))
      Dedup.minHashLshStar(fam, hotBucket = 1)
        .select(col("a_id"), col("b_id"))
        .orderBy("a_id", "b_id")
    })
  )

  /** Staged mojibake rows shared by the `text_mojibake` query and its
    * oracle VALUES list: one row per corruption family plus a clean
    * control. Ids sit far above the corpus doc_id range.
    */
  private val mojibakeStaged: Seq[(Long, String)] = Seq(
    (9000001L, "The cafÃ© opened â€“ " +
      "itâ€™s niceâ€¦"),
    (9000002L, "Â SeÃ±or said " +
      "â€œholaâ€"),
    (9000003L, "MÃ¼ller â€” garÃ§on " +
      "Ã¨ Ã¡ Ã³ Ãº " +
      "Ã¶ Ã¤"),
    (9000004L, "a clean ascii control row"))

  /** Shared BPE oracle fragments: the symbol init and one unrolled
    * train/apply round (argmax pair + greedy-leftmost application via
    * islands parity), used by both `text_bpe_train` and
    * `text_bpe_encode`.
    */
  private val bpePrefixSql: String =
    """WITH wf AS (
      |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+'))
      |          AS tok FROM documents)
      |  WHERE length(tok) > 0 GROUP BY 1
      |), s0 AS (
      |  SELECT word, freq, pos,
      |    substr(word, CAST(pos AS INTEGER), 1) AS sym
      |  FROM (SELECT word, freq,
      |          unnest(generate_series(1, length(word))) AS pos
      |        FROM wf)
      |)""".stripMargin

  private def bpeRoundSql(i: Int): String =
    s"""p$i AS (
       |  SELECT word, freq, pos, sym,
       |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       |  FROM s$i
       |), b$i AS (
       |  SELECT sym AS a, nxt AS b, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM p$i WHERE nxt IS NOT NULL GROUP BY sym, nxt
       |  ORDER BY cnt DESC, a, b LIMIT 1
       |), f$i AS (
       |  SELECT p.word, p.freq, p.pos, p.sym, p.nxt,
       |    CASE WHEN p.sym = b.a AND p.nxt = b.b THEN 1 ELSE 0 END AS m
       |  FROM p$i p, b$i b
       |), g$i AS (
       |  SELECT *, pos - row_number()
       |    OVER (PARTITION BY word, m ORDER BY pos) AS grp
       |  FROM f$i
       |), h$i AS (
       |  SELECT *, CASE WHEN m = 1 AND row_number()
       |      OVER (PARTITION BY word, m, grp ORDER BY pos) % 2 = 1
       |    THEN 1 ELSE 0 END AS sel
       |  FROM g$i
       |), r$i AS (
       |  SELECT word, freq, pos, sym, nxt, sel,
       |    lag(sel) OVER (PARTITION BY word ORDER BY pos) AS prev_sel
       |  FROM h$i
       |), s${i + 1} AS (
       |  SELECT word, freq,
       |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
       |    CASE WHEN sel = 1 THEN sym || nxt ELSE sym END AS sym
       |  FROM r$i WHERE coalesce(prev_sel, 0) = 0
       |)""".stripMargin

  /** Generated DuckDB twin of [[graft.ops.Graph.boruvkaForest]] over the
    * weighted co-occurrence graph: per unrolled round, the component
    * election is a row_number over the (w, lo, hi) total order under a
    * lateral UNNEST([la, lb]) fan (the twin of Spark's explode +
    * min(struct)), and the merge is `mergeCap` fixed min-label steps —
    * Spark stops at convergence, the extra SQL steps are no-ops (the
    * fixed-round recipe), and Spark's require(converged) bounds the cap.
    */
  /** Holt–Winters twin: the holt LINEAR recursive CTE carrying the
    * `period` seasonal cells as columns — same positive-offset
    * bit-shift halvings, slot j = (i−1) mod period, one-step forecast
    * from the next slot's cell.
    */
  private val bm25OracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
      |), lens AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
      |), tot AS (
      |  SELECT CAST(sum(dl) AS BIGINT) AS corpus_len, count(*) AS n_docs FROM lens
      |), q AS (
      |  SELECT DISTINCT query_id, token FROM (
      |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
      |    FROM toks WHERE doc_id < 5)
      |), tfa AS (
      |  SELECT doc_id, token, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(t) AS token FROM toks)
      |  GROUP BY 1, 2
      |), d AS (
      |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
      |), sc AS (
      |  SELECT q.query_id, d.doc_id,
      |    CAST(sum(((1000000 // df) * 2200 * corpus_len * tf)
      |      // (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))
      |      AS BIGINT) AS score,
      |    count(*) AS n_terms
      |  FROM d JOIN q ON d.token = q.token
      |  JOIN lens ON d.doc_id = lens.doc_id
      |  CROSS JOIN tot
      |  GROUP BY 1, 2
      |), rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS "rank"
      |  FROM sc
      |)
      |SELECT query_id, CAST("rank" AS BIGINT) AS "rank", doc_id, score, n_terms
      |FROM rk WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  private def holtWintersOracleSql(period: Int): String = {
    val OFF = "2251799813685248"
    val OF2 = "1125899906842624"
    val sSel = (0 until period).map(k => s"WHEN $k THEN r.s$k")
      .mkString(s"(CASE CAST((g.i - 1) % $period AS INT) ", " ", " END)")
    val lp = s"(((g.x * 1000000 - $sSel) + r.l + r.t + $OFF) // 2 - $OF2)"
    val tp = s"((r.t + $lp - r.l + $OFF) // 2 - $OF2)"
    val sUpd = (0 until period).map(k =>
      s"CASE WHEN (g.i - 1) % $period = $k THEN ((r.s$k +" +
        s" (g.x * 1000000 - $lp) + $OFF) // 2 - $OF2)" +
        s" ELSE r.s$k END AS s$k").mkString(",\n        |    ")
      .replace("\n        |", "\n")
    val sInit = (0 until period).map(k => s"CAST(0 AS BIGINT) AS s$k")
      .mkString(", ")
    val sOut = (0 until period).map(k => s"CAST(s$k AS BIGINT) AS s${k}_e6")
      .mkString(", ")
    val fcSel = (0 until period).map(k => s"WHEN $k THEN s$k")
      .mkString(s"(CASE CAST(n % $period AS INT) ", " ", " END)")
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2
       |), span AS (
       |  SELECT event_type, min(day) AS d0, max(day) AS d1
       |  FROM daily GROUP BY 1
       |), grid AS (
       |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x,
       |    CAST(row_number() OVER (PARTITION BY g.event_type
       |      ORDER BY g.day) AS BIGINT) AS i,
       |    CAST(count(*) OVER (PARTITION BY g.event_type) AS BIGINT) AS n
       |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
       |        FROM span s,
       |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
       |  LEFT JOIN daily d
       |    ON d.event_type = g.event_type AND d.day = g.day
       |), rec AS (
       |  SELECT event_type, i, n, x * 1000000 AS l,
       |    CAST(0 AS BIGINT) AS t, $sInit
       |  FROM grid WHERE i = 1
       |  UNION ALL
       |  SELECT g.event_type, g.i, g.n, $lp AS l, $tp AS t,
       |    $sUpd
       |  FROM rec r JOIN grid g
       |    ON g.event_type = r.event_type AND g.i = r.i + 1
       |)
       |SELECT event_type, n AS n_days, CAST(l AS BIGINT) AS level_e6,
       |  CAST(t AS BIGINT) AS trend_e6, $sOut,
       |  CAST(l + t + $fcSel AS BIGINT) AS fc1_e6
       |FROM rec WHERE i = n ORDER BY event_type""".stripMargin
  }

  /** Fellegi–Sunter EM twin: replay the fixed EM rounds — the ppm
    * E-step product fold `(acc·term) // 10^6` per feature, the guarded
    * posterior, HUGEINT M-step sums, the [1000, 999000] clamps — as
    * generated unrolled CTEs over the blocked customer candidate pairs
    * (pairs MATERIALIZED: referenced once per round plus the final
    * classification pass).
    */
  private def emLinkageOracleSql(rounds: Int, feats: Seq[String]): String = {
    val M = "1000000"
    def fold(start: String, pc: Int => String): String =
      feats.zipWithIndex.foldLeft(start) { case (acc, (f, i)) =>
        s"(($acc * (CASE WHEN $f THEN ${pc(i)}" +
          s" ELSE ($M - ${pc(i)}) END)) // $M)"
      }
    def wSelect(paramsCte: String): String = {
      val num = fold("p", i => s"m$i")
      val den = fold(s"($M - p)", i => s"u$i")
      s"""SELECT q.*, ($M * $num) // GREATEST(1, ($num) + ($den)) AS w
         |  FROM (SELECT pp.*, pr.* FROM pairs pp
         |        CROSS JOIN $paramsCte pr) q""".stripMargin
    }
    val params0 =
      s"""params0 AS (
         |  SELECT CAST(500000 AS HUGEINT) AS p,
         |    ${feats.indices.map(i =>
        s"CAST(900000 AS HUGEINT) AS m$i").mkString(", ")},
         |    ${feats.indices.map(i =>
        s"CAST(100000 AS HUGEINT) AS u$i").mkString(", ")},
         |    CAST(0 AS HUGEINT) AS n
         |)""".stripMargin
    val roundSql = (0 until rounds).map { r =>
      val swgs = feats.zipWithIndex.map { case (f, i) =>
        s"CAST(SUM(CASE WHEN $f THEN w ELSE 0 END) AS HUGEINT) AS swg$i," +
          s" CAST(SUM(CASE WHEN $f THEN $M - w ELSE 0 END) AS HUGEINT)" +
          s" AS sug$i"
      }.mkString(",\n      ")
      val ms = feats.indices.map(i =>
        s"LEAST(999000, GREATEST(1000, ($M * swg$i)" +
          s" // GREATEST(1, sw))) AS m$i").mkString(",\n    ")
      val us = feats.indices.map(i =>
        s"LEAST(999000, GREATEST(1000, ($M * sug$i)" +
          s" // GREATEST(1, $M * n - sw))) AS u$i").mkString(",\n    ")
      s"""w$r AS MATERIALIZED (
         |  ${wSelect(s"params$r")}
         |), params${r + 1} AS (
         |  SELECT LEAST(999000, GREATEST(1000, sw // GREATEST(1, n))) AS p,
         |    $ms,
         |    $us,
         |    n
         |  FROM (
         |    SELECT CAST(count(*) AS HUGEINT) AS n,
         |      CAST(SUM(w) AS HUGEINT) AS sw,
         |      $swgs
         |    FROM w$r)
         |)""".stripMargin
    }.mkString(",\n")
    val featRows = feats.zipWithIndex.map { case (f, i) =>
      s"""SELECT '$f' AS feature, CAST(pr.m$i AS BIGINT) AS m_ppm,
         |    CAST(pr.u$i AS BIGINT) AS u_ppm,
         |    CAST(pr.p AS BIGINT) AS p_ppm,
         |    CAST(pr.n AS BIGINT) AS n_pairs, mt.n_matched
         |  FROM params$rounds pr, mt""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH recs AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name AS name,
       |    c_nationkey AS nation, c_mktsegment AS seg,
       |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
       |  FROM customer
       |  UNION ALL
       |  SELECT c_custkey + 1000000, substring(c_name, 1, 17) || 'X',
       |    c_nationkey, c_mktsegment,
       |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
       |  FROM customer WHERE c_custkey < 50
       |), pairs AS MATERIALIZED (
       |  SELECT a.bal = b.bal AS f_bal_exact,
       |    a.nation = b.nation AS f_nation,
       |    a.seg = b.seg AS f_seg,
       |    ((a.bal + $M) // 10000) = ((b.bal + $M) // 10000) AS f_band
       |  FROM recs a JOIN recs b
       |    ON substring(a.name, 1, 17) = substring(b.name, 1, 17)
       |   AND a.rec_id < b.rec_id
       |), $params0,
       |$roundSql,
       |wf AS (
       |  ${wSelect(s"params$rounds")}
       |), mt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_matched
       |  FROM wf WHERE w >= 500000
       |)
       |SELECT feature, m_ppm, u_ppm, p_ppm, n_pairs, n_matched FROM (
       |  $featRows
       |) ORDER BY feature""".stripMargin
  }

  /** Louvain one-level twin: replay the deterministic local-move rounds
    * — per round, the community-mass agg, neighbor-community counts,
    * the integer gain score s(c) = 2m·e(i,c) − k·(tot_c − [c=own]·k)
    * with the stay-then-min-c tie-break, and the strict-local-max md5
    * priority schedule (hex strings compare identically) — as unrolled
    * MATERIALIZED CTEs over the mirrored order-part graph.
    */
  private def louvainOracleSql(rounds: Int): String = {
    val roundSql = (0 until rounds).map { r =>
      s"""t$r AS (
         |  SELECT l.lbl AS c, CAST(sum(d.k) AS BIGINT) AS tot
         |  FROM l$r l JOIN deg d ON l.id = d.id GROUP BY l.lbl
         |), ei$r AS (
         |  SELECT e.src AS id, l.lbl AS c, CAST(count(*) AS BIGINT) AS eic
         |  FROM e JOIN l$r l ON e.dst = l.id GROUP BY e.src, l.lbl
         |), cd$r AS (
         |  SELECT id, c, CAST(max(eic) AS BIGINT) AS eic FROM (
         |    SELECT id, c, eic FROM ei$r
         |    UNION ALL SELECT id, lbl AS c, 0 AS eic FROM l$r
         |  ) GROUP BY id, c
         |), sc$r AS (
         |  SELECT cd.id, cd.c,
         |    mm.m2 * cd.eic - d.k *
         |      (t.tot - CASE WHEN cd.c = o.lbl THEN d.k ELSE 0 END) AS s,
         |    CASE WHEN cd.c = o.lbl THEN 0 ELSE 1 END AS stay
         |  FROM cd$r cd
         |  JOIN l$r o ON cd.id = o.id
         |  JOIN deg d ON cd.id = d.id
         |  JOIN t$r t ON cd.c = t.c
         |  CROSS JOIN mm
         |), b$r AS (
         |  SELECT id, c FROM (
         |    SELECT id, c, row_number() OVER (PARTITION BY id
         |      ORDER BY s DESC, stay, c) AS rn
         |    FROM sc$r) z
         |  WHERE rn = 1
         |), p$r AS (
         |  SELECT id, md5('lv$r:' || CAST(id AS VARCHAR)) AS p FROM deg
         |), nm$r AS (
         |  SELECT e.src AS id, max(pd.p) AS pmax
         |  FROM e JOIN p$r pd ON e.dst = pd.id GROUP BY e.src
         |), mv$r AS (
         |  SELECT p.id FROM p$r p JOIN nm$r n ON p.id = n.id
         |  WHERE p.p > n.pmax
         |), l${r + 1} AS MATERIALIZED (
         |  SELECT l.id,
         |    CASE WHEN m.id IS NOT NULL THEN coalesce(b.c, l.lbl)
         |         ELSE l.lbl END AS lbl
         |  FROM l$r l
         |  LEFT JOIN b$r b ON l.id = b.id
         |  LEFT JOIN mv$r m ON l.id = m.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH und AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS lo, l_partkey + 20000000 AS hi
       |  FROM lineitem
       |), e AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst FROM und
       |  UNION ALL SELECT hi, lo FROM und
       |), deg AS MATERIALIZED (
       |  SELECT src AS id, CAST(count(*) AS BIGINT) AS k FROM e GROUP BY src
       |), mm AS (SELECT 2 * CAST(count(*) AS BIGINT) AS m2 FROM und),
       |l0 AS MATERIALIZED (SELECT id, id AS lbl FROM deg),
       |$roundSql
       |SELECT id, lbl FROM l$rounds ORDER BY id""".stripMargin
  }

  /** One weighted Louvain round as CTE text — the [[louvainOracleSql]]
    * template generalized to (a) sum edge weights instead of counting
    * rows and (b) namespaced CTE/salt names so two levels coexist in
    * one WITH chain. `lp` prefixes every CTE (labels are `${lp}$r` →
    * `${lp}${r+1}`); `eCte`/`degCte` name the weighted symmetric edge
    * frame (src, dst, w) and degree frame (id, k) of the level.
    */
  private def louvainRoundSql(lp: String, r: Int, eCte: String,
                              degCte: String, salt: String): String =
    s"""${lp}t$r AS (
       |  SELECT l.lbl AS c, CAST(sum(d.k) AS BIGINT) AS tot
       |  FROM ${lp}$r l JOIN $degCte d ON l.id = d.id GROUP BY l.lbl
       |), ${lp}ei$r AS (
       |  SELECT e.src AS id, l.lbl AS c, CAST(sum(e.w) AS BIGINT) AS eic
       |  FROM $eCte e JOIN ${lp}$r l ON e.dst = l.id GROUP BY e.src, l.lbl
       |), ${lp}cd$r AS (
       |  SELECT id, c, CAST(max(eic) AS BIGINT) AS eic FROM (
       |    SELECT id, c, eic FROM ${lp}ei$r
       |    UNION ALL SELECT id, lbl AS c, 0 AS eic FROM ${lp}$r
       |  ) GROUP BY id, c
       |), ${lp}sc$r AS (
       |  SELECT cd.id, cd.c,
       |    mm.m2 * cd.eic - d.k *
       |      (t.tot - CASE WHEN cd.c = o.lbl THEN d.k ELSE 0 END) AS s,
       |    CASE WHEN cd.c = o.lbl THEN 0 ELSE 1 END AS stay
       |  FROM ${lp}cd$r cd
       |  JOIN ${lp}$r o ON cd.id = o.id
       |  JOIN $degCte d ON cd.id = d.id
       |  JOIN ${lp}t$r t ON cd.c = t.c
       |  CROSS JOIN mm
       |), ${lp}b$r AS (
       |  SELECT id, c FROM (
       |    SELECT id, c, row_number() OVER (PARTITION BY id
       |      ORDER BY s DESC, stay, c) AS rn
       |    FROM ${lp}sc$r) z
       |  WHERE rn = 1
       |), ${lp}p$r AS (
       |  SELECT id, md5('$salt$r:' || CAST(id AS VARCHAR)) AS p
       |  FROM $degCte
       |), ${lp}nm$r AS (
       |  SELECT e.src AS id, max(pd.p) AS pmax
       |  FROM $eCte e JOIN ${lp}p$r pd ON e.dst = pd.id GROUP BY e.src
       |), ${lp}mv$r AS (
       |  SELECT p.id FROM ${lp}p$r p JOIN ${lp}nm$r n ON p.id = n.id
       |  WHERE p.p > n.pmax
       |), ${lp}${r + 1} AS MATERIALIZED (
       |  SELECT l.id,
       |    CASE WHEN m.id IS NOT NULL THEN coalesce(b.c, l.lbl)
       |         ELSE l.lbl END AS lbl
       |  FROM ${lp}$r l
       |  LEFT JOIN ${lp}b$r b ON l.id = b.id
       |  LEFT JOIN ${lp}mv$r m ON l.id = m.id
       |)""".stripMargin

  /** Two-level Louvain twin: phase-1 rounds on the unit-weight
    * order-part graph, community coarsening (inter-community summed
    * weights; intra mass into deg2 only — it cancels in every ΔQ),
    * phase-2 weighted rounds, labels composed through the phase-1
    * community. Mirrors [[graft.ops.Graph.louvainTwoLevel]] exactly.
    */
  private def louvainTwoLevelOracleSql(rounds1: Int, rounds2: Int): String = {
    val p1 = (0 until rounds1)
      .map(r => louvainRoundSql("l", r, "e", "deg", "lv")).mkString(",\n")
    val p2 = (0 until rounds2)
      .map(r => louvainRoundSql("g", r, "e2", "deg2", "lw")).mkString(",\n")
    s"""WITH und AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS lo, l_partkey + 20000000 AS hi
       |  FROM lineitem
       |), e AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst, CAST(1 AS BIGINT) AS w FROM und
       |  UNION ALL SELECT hi, lo, CAST(1 AS BIGINT) FROM und
       |), deg AS MATERIALIZED (
       |  SELECT src AS id, CAST(sum(w) AS BIGINT) AS k FROM e GROUP BY src
       |), mm AS (SELECT 2 * CAST(count(*) AS BIGINT) AS m2 FROM und),
       |l0 AS MATERIALIZED (SELECT id, id AS lbl FROM deg),
       |$p1,
       |ce AS MATERIALIZED (
       |  SELECT least(a.lbl, b.lbl) AS lo, greatest(a.lbl, b.lbl) AS hi,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM und u
       |  JOIN l$rounds1 a ON u.lo = a.id
       |  JOIN l$rounds1 b ON u.hi = b.id
       |  WHERE a.lbl <> b.lbl
       |  GROUP BY 1, 2
       |), e2 AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst, w FROM ce
       |  UNION ALL SELECT hi, lo, w FROM ce
       |), deg2 AS MATERIALIZED (
       |  SELECT l.lbl AS id, CAST(sum(d.k) AS BIGINT) AS k
       |  FROM l$rounds1 l JOIN deg d ON l.id = d.id GROUP BY l.lbl
       |),
       |g0 AS MATERIALIZED (SELECT id, id AS lbl FROM deg2),
       |$p2
       |SELECT l.id, g.lbl
       |FROM l$rounds1 l JOIN g$rounds2 g ON l.lbl = g.id
       |ORDER BY l.id""".stripMargin
  }

  /** HyperANF twin: rebuild the md5 HLL registers per node, propagate
    * them along the mirrored order-part edges for `maxHops` max-merge
    * rounds (MATERIALIZED — each round references the previous twice),
    * and emit the per-(hop, node) engine-exact register aggregates plus
    * the one-division estimate (Scala-folded alpha literal).
    */
  /** Shared ANF register-propagation WITH chain: mirrored order-part
    * edges, md5 register init, `maxHops` MATERIALIZED max-merge rounds.
    */
  private def anfStateCtes(maxHops: Int, b: Int): String = {
    val payloadMod = 1L << (60 - b)
    val maxRho = 60 - b + 1
    val rounds = (1 to maxHops).map { r =>
      s"""s$r AS MATERIALIZED (
         |  SELECT id, bucket, CAST(max(rho_max) AS BIGINT) AS rho_max FROM (
         |    SELECT e.src AS id, s.bucket, s.rho_max
         |    FROM e JOIN s${r - 1} s ON e.dst = s.id
         |    UNION ALL
         |    SELECT id, bucket, rho_max FROM s${r - 1}
         |  ) GROUP BY id, bucket
         |)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
       |  SELECT l_orderkey AS src, l_partkey + 20000000 AS dst FROM lineitem
       |  UNION
       |  SELECT l_partkey + 20000000, l_orderkey FROM lineitem
       |), n AS (SELECT DISTINCT src AS id FROM e),
       |h AS (
       |  SELECT id, CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15)
       |    AS BIGINT) AS h
       |  FROM n
       |), s0 AS MATERIALIZED (
       |  SELECT id, h // $payloadMod AS bucket,
       |    CAST($maxRho - length(ltrim(bin(h % $payloadMod), '0'))
       |      AS BIGINT) AS rho_max
       |  FROM h
       |),
       |$rounds""".stripMargin
  }

  /** Per-(hop, id) card select over s$r: exact register aggregates. */
  private def anfCardSelects(maxHops: Int, b: Int): String = {
    val maxRho = 60 - b + 1
    val m = 1 << b
    val alphaScaled =
      0.7213 / (1.0 + 1.079 / m) * m * m * math.pow(2.0, maxRho)
    (0 to maxHops).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS hop, id,
         |  CAST(count(*) AS BIGINT) AS n_registers,
         |  CAST(sum(1::BIGINT << CAST($maxRho - rho_max AS INTEGER)) +
         |    ($m - count(*)) * (1::BIGINT << $maxRho) AS BIGINT)
         |    AS sum_scaled,
         |  CAST('$alphaScaled' AS DOUBLE) /
         |    CAST(sum(1::BIGINT << CAST($maxRho - rho_max AS INTEGER)) +
         |      ($m - count(*)) * (1::BIGINT << $maxRho) AS DOUBLE) AS est
         |FROM s$r GROUP BY id""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  private def anfOracleSql(maxHops: Int, b: Int): String =
    s"""WITH ${anfStateCtes(maxHops, b)}
       |SELECT * FROM (
       |${anfCardSelects(maxHops, b)}
       |) ORDER BY hop, id""".stripMargin

  /** Coreness twin: unrolled h-index rounds from the degree init over
    * the mirrored order-part graph — the ranking needs NO tie-break
    * (the h-index depends only on the sorted multiset).
    */
  private def corenessOracleSql(rounds: Int): String = {
    val roundSql = (0 until rounds).map { r =>
      s"""h$r AS (
         |  SELECT id, CAST(max(least(rn, val)) AS BIGINT) AS h FROM (
         |    SELECT e.src AS id, c.val,
         |      row_number() OVER (PARTITION BY e.src ORDER BY c.val DESC)
         |        AS rn
         |    FROM e JOIN c$r c ON e.dst = c.id
         |  ) GROUP BY id
         |), c${r + 1} AS MATERIALIZED (
         |  SELECT c.id, CAST(least(c.val, h.h) AS BIGINT) AS val
         |  FROM c$r c JOIN h$r h ON c.id = h.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT l_orderkey AS src, l_partkey + 20000000 AS dst FROM lineitem
       |  UNION
       |  SELECT l_partkey + 20000000, l_orderkey FROM lineitem
       |), c0 AS MATERIALIZED (
       |  SELECT src AS id, CAST(count(*) AS BIGINT) AS val
       |  FROM e GROUP BY src
       |),
       |$roundSql
       |SELECT id, val AS core_ub FROM c$rounds ORDER BY id""".stripMargin
  }

  /** Effective-radius twin: same propagation chain, the exact integer
    * 90%-of-final-ball predicate (d <= sum(h) // 10), min hop per node,
    * node counts per radius.
    */
  private def anfRadiusOracleSql(maxHops: Int, b: Int): String =
    s"""WITH ${anfStateCtes(maxHops, b)},
       |allhops AS (
       |  SELECT hop, id, sum_scaled FROM (
       |${anfCardSelects(maxHops, b)}
       |  )
       |), fin AS (
       |  SELECT id, sum_scaled AS sf FROM allhops WHERE hop = $maxHops
       |), eff AS (
       |  SELECT a.id, CAST(min(a.hop) AS BIGINT) AS eff_hops
       |  FROM allhops a JOIN fin f ON a.id = f.id
       |  WHERE a.sum_scaled - f.sf <= a.sum_scaled // 10
       |  GROUP BY a.id
       |)
       |SELECT eff_hops, CAST(count(*) AS BIGINT) AS n_nodes
       |FROM eff GROUP BY eff_hops ORDER BY eff_hops""".stripMargin

  private def boruvkaOracleSql(rounds: Int, mergeCap: Int): String = {
    // each step = one neighbor-min hop + one pointer jump
    // (root := root(root)), matching the Spark side's doubling reach:
    // mergeCap steps cover chains of ~2^mergeCap, not mergeCap (ADVICE
    // r14 — a regenerated fixture with deeper chosen-edge chains would
    // otherwise flip the oracle, not Spark). Post-convergence steps are
    // no-ops, so the converged output is unchanged.
    def mergeStep(r: Int, t: Int): String =
      s"""p${r}_$t AS MATERIALIZED (
         |  SELECT m.c, least(min(m.root), min(n.root)) AS root
         |  FROM m${r}_$t m
         |  LEFT JOIN mg$r g ON g.a = m.c
         |  LEFT JOIN m${r}_$t n ON n.c = g.b
         |  GROUP BY m.c
         |), m${r}_${t + 1} AS MATERIALIZED (
         |  SELECT p.c, coalesce(r2.root, p.root) AS root
         |  FROM p${r}_$t p LEFT JOIN p${r}_$t r2 ON r2.c = p.root
         |)""".stripMargin
    def round(r: Int): String =
      s"""st$r AS (
         |  SELECT e.lo, e.hi, e.w, a.lab AS la, b.lab AS lb
         |  FROM ew e JOIN l$r a ON e.lo = a.id JOIN l$r b ON e.hi = b.id
         |  WHERE a.lab <> b.lab
         |), ch$r AS MATERIALIZED (
         |  SELECT DISTINCT w, lo, hi, la, lb FROM (
         |    SELECT u.c, e.w, e.lo, e.hi, e.la, e.lb,
         |      row_number() OVER (PARTITION BY u.c
         |        ORDER BY e.w, e.lo, e.hi) AS rn
         |    FROM st$r e, UNNEST([e.la, e.lb]) AS u(c)) z
         |  WHERE rn = 1
         |), mg$r AS (
         |  SELECT la AS a, lb AS b FROM ch$r
         |  UNION ALL SELECT lb, la FROM ch$r
         |), m${r}_0 AS (
         |  SELECT DISTINCT lab AS c, lab AS root FROM l$r
         |), ${(0 until mergeCap).map(mergeStep(r, _)).mkString(",\n")},
         |l${r + 1} AS MATERIALIZED (
         |  SELECT l.id, m.root AS lab
         |  FROM l$r l JOIN m${r}_$mergeCap m ON l.lab = m.c
         |)""".stripMargin
    val finalSel = (0 until rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, lo, hi, w FROM ch$r")
      .mkString("\nUNION ALL\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
       |  WHERE l_partkey % 4 = 0
       |), sized AS (
       |  SELECT g, item FROM (
       |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz
       |    FROM pairs) z
       |  WHERE gsz <= 100
       |), ew AS MATERIALIZED (
       |  SELECT l.item AS lo, r.item AS hi,
       |    CAST(1000000 - count(*) AS BIGINT) AS w
       |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |), l0 AS MATERIALIZED (
       |  SELECT id, id AS lab FROM (
       |    SELECT lo AS id FROM ew UNION SELECT hi FROM ew)
       |), ${(0 until rounds).map(round).mkString(",\n")}
       |$finalSel
       |ORDER BY round, lo, hi""".stripMargin
  }

  /** Generated DuckDB twin of [[graft.ops.Graph.greedyColoring]] over
    * the sampled part co-occurrence graph: per unrolled round, the
    * uncolored-local-max election is a correlated NOT EXISTS on
    * (priority, id) — the relational form of Spark's
    * `max(struct(pri, id))` comparison — and the mex is the bounded
    * `UNNEST(range(0, m+1))` candidate anti-join (pigeonhole: mex ≤
    * #used colors). Budget leftovers stay NULL on both sides.
    */
  private def coloringOracleSql(rounds: Int): String = {
    def round(r: Int): String =
      s"""nb$r AS MATERIALIZED (
         |  SELECT u.a AS id, u.b AS nbr, s.pri AS n_pri, s.color AS n_color
         |  FROM und u JOIN s$r s ON u.b = s.id
         |), win$r AS (
         |  SELECT s.id FROM s$r s WHERE s.color IS NULL AND NOT EXISTS (
         |    SELECT 1 FROM nb$r n WHERE n.id = s.id AND n.n_color IS NULL
         |      AND (n.n_pri > s.pri OR (n.n_pri = s.pri AND n.nbr > s.id)))
         |), used$r AS MATERIALIZED (
         |  SELECT DISTINCT id, n_color AS c FROM nb$r
         |  WHERE n_color IS NOT NULL
         |), mex$r AS (
         |  SELECT c.id, CAST(min(c.k) AS BIGINT) AS mex FROM (
         |    SELECT m.id, u.k FROM (
         |      SELECT id, count(*) AS m FROM used$r GROUP BY id) m,
         |      UNNEST(range(0, m.m + 1)) AS u(k)) c
         |  LEFT JOIN used$r u ON c.id = u.id AND c.k = u.c
         |  WHERE u.c IS NULL GROUP BY c.id
         |), s${r + 1} AS MATERIALIZED (
         |  SELECT s.id, s.pri,
         |    CASE WHEN s.color IS NOT NULL THEN s.color
         |         WHEN w.id IS NOT NULL THEN coalesce(m.mex, 0) END AS color
         |  FROM s$r s LEFT JOIN win$r w ON s.id = w.id
         |  LEFT JOIN mex$r m ON s.id = m.id
         |)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
       |  WHERE l_partkey % 4 = 0
       |), sized AS (
       |  SELECT g, item FROM (
       |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz
       |    FROM pairs) z
       |  WHERE gsz <= 100
       |), e0 AS (
       |  SELECT DISTINCT l.item AS lo, r.item AS hi
       |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
       |), und AS MATERIALIZED (
       |  SELECT lo AS a, hi AS b FROM e0 UNION ALL SELECT hi, lo FROM e0
       |), s0 AS MATERIALIZED (
       |  SELECT id,
       |    CAST('0x' || substr(md5('col:' || CAST(id AS VARCHAR)), 1, 8)
       |      AS BIGINT) AS pri,
       |    CAST(NULL AS BIGINT) AS color
       |  FROM (SELECT DISTINCT a AS id FROM und)
       |), ${(0 until rounds).map(round).mkString(",\n")}
       |SELECT id, CAST(color AS BIGINT) AS color
       |FROM s$rounds ORDER BY id""".stripMargin
  }

  /** Generated DuckDB twin of [[graft.ops.Similarity.kmeansClusterDistributed]]
    * (the markov/pageRank build-the-unroll-with-a-loop recipe): init =
    * the k evenly-spaced vectors over the vec_id order, then per round
    * an assignment (row_number over (dist, cluster) — the twin of
    * Spark's least(struct)) and the integer centroid update
    * (`floor(x·1e6)` BIGINT sums, `(Σ + K·n) // n − K` positive-offset
    * floor mean, ONE double division per cell). Distances close as
    * `dot(c,c) − 2·dot(e,c)` with `list_dot_product` == the
    * `graft_dot` sequential fold (the ann_brute recipe); Spark's
    * centroid literals are Double.toString round-trips, so both
    * engines assign against bit-identical centroids.
    */
  private def kmeansDistOracleSql(k: Int, iters: Int, dim: Int): String =
    kmeansCtePrefix(k, iters, dim) + "\n" +
      s"""SELECT a.vec_id, a.cluster, z.cluster_size
         |FROM aF a JOIN (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM aF GROUP BY cluster) z USING (cluster)
         |ORDER BY vec_id""".stripMargin

  /** Shared CTE chain of the distributed-Lloyd oracles: init c0 →
    * `iters` assignment+update rounds → final assignments `aF`
    * (vec_id, cluster), with `emb` and the fitted `c{iters}` centroid
    * frame still in scope for downstream readouts. */
  private def kmeansCtePrefix(k: Int, iters: Int, dim: Int): String = {
    val off = "10000000"
    def round(r: Int): String =
      s"""d$r AS (
         |  SELECT e.vec_id, e.emb, c.cluster,
         |    list_dot_product(c.cen, c.cen)
         |      - 2 * list_dot_product(e.emb, c.cen) AS dist
         |  FROM emb e, c$r c
         |), a$r AS MATERIALIZED (
         |  SELECT vec_id, emb, cluster FROM (
         |    SELECT vec_id, emb, cluster,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster)
         |        AS rn FROM d$r) WHERE rn = 1
         |), u$r AS (
         |  SELECT cluster, g.d,
         |    CAST(sum(CAST(floor(emb[g.d] * CAST('1e6' AS DOUBLE)) AS BIGINT))
         |      AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM a$r, generate_series(1, $dim) AS g(d)
         |  GROUP BY cluster, g.d
         |), c${r + 1} AS MATERIALIZED (
         |  SELECT p.cluster, coalesce(u.cen, p.cen) AS cen
         |  FROM c$r p LEFT JOIN (
         |    SELECT cluster, list(CAST((s + $off * n) // n - $off AS DOUBLE)
         |      / CAST('1e6' AS DOUBLE) ORDER BY d) AS cen
         |    FROM u$r GROUP BY cluster) u ON p.cluster = u.cluster
         |)""".stripMargin
    val rounds = (0 until iters).map(round).mkString(", ", ", ", "")
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM emb),
       |ord AS (
       |  SELECT vec_id, emb, row_number() OVER (ORDER BY vec_id) - 1 AS rn
       |  FROM emb
       |), c0 AS MATERIALIZED (
       |  SELECT t.c AS cluster, o.emb AS cen
       |  FROM (SELECT unnest(generate_series(0, ${k - 1})) AS c) t
       |  CROSS JOIN nn
       |  JOIN ord o ON o.rn = (t.c * nn.n) // $k
       |)$rounds, dF AS (
       |  SELECT e.vec_id, c.cluster,
       |    list_dot_product(c.cen, c.cen)
       |      - 2 * list_dot_product(e.emb, c.cen) AS dist
       |  FROM emb e, c$iters c
       |), aF AS MATERIALIZED (
       |  SELECT vec_id, cluster FROM (
       |    SELECT vec_id, cluster,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster)
       |        AS rn FROM dF) WHERE rn = 1
       |)""".stripMargin
  }

  /** Generated DuckDB twin of [[graft.ops.Similarity.kCenterCoreset]]:
    * k−1 unrolled greedy rounds — (dmin DESC, vec_id DESC) election,
    * center row join, least() dmin merge — with every dot product the
    * sequential list_dot_product fold graft_dot shares; floats are
    * ranked on, only floor(dmin·10⁶) integers are emitted. */
  private def coresetOracleSql(k: Int): String = {
    def dexpr(df: String, c: String) =
      s"list_dot_product($c.e, $c.e) - 2 * list_dot_product($df.e, $c.e)" +
        s" + $df.xx"
    val rounds = (2 to k).map { r =>
      val prev = s"d${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT vec_id, dmin FROM $prev
         |  ORDER BY dmin DESC, vec_id DESC LIMIT 1
         |), c$r AS MATERIALIZED (
         |  SELECT emb.vec_id, emb.e FROM emb
         |  JOIN p$r ON p$r.vec_id = emb.vec_id
         |), d$r AS MATERIALIZED (
         |  SELECT p.vec_id, p.e, p.xx,
         |    least(p.dmin, ${dexpr("p", "c")}) AS dmin
         |  FROM $prev p, c$r c
         |)""".stripMargin
    }.mkString(",\n")
    val finals = (2 to k).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS "rank", vec_id,
         |  CAST(floor(dmin * 1000000) AS BIGINT) AS dmin_scaled
         |  FROM p$r""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[])) AS xx
       |  FROM embeddings
       |), c1 AS MATERIALIZED (
       |  SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT 1
       |), d1 AS MATERIALIZED (
       |  SELECT emb.vec_id, emb.e, emb.xx,
       |    ${dexpr("emb", "c")} AS dmin
       |  FROM emb, c1 c
       |),
       |$rounds
       |SELECT "rank", vec_id, dmin_scaled FROM (
       |  SELECT CAST(1 AS BIGINT) AS "rank", vec_id,
       |    CAST(NULL AS BIGINT) AS dmin_scaled
       |  FROM c1
       |  UNION ALL $finals)
       |ORDER BY "rank"""".stripMargin
  }

  /** Generated DuckDB twin of [[graft.functions.HilbertIndex]]: the
    * per-level flip/swap state machine unrolled as MATERIALIZED CTEs
    * (row-wise materialization sidesteps the expression-tree blowup
    * that forced the Spark side native). */
  private def hilbertOracleSql(bits: Int): String = {
    val mask = (1L << bits) - 1
    val rounds = (0 until bits).map { r =>
      val st = 1L << (bits - 1 - r)
      s"""h${r + 1} AS MATERIALIZED (
         |  SELECT ox, oy,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
         |      THEN $st - 1 - y ELSE y END ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
         |      THEN $st - 1 - x ELSE x END ELSE y END AS y,
         |    d + ${st * st} * xor(3 * rx, ry) AS d
         |  FROM (
         |    SELECT ox, oy, x, y, d,
         |      CASE WHEN (x & $st) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (y & $st) > 0 THEN 1 ELSE 0 END AS ry
         |    FROM h$r)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT DISTINCT l_partkey AS ox, l_suppkey AS oy FROM lineitem
       |), h0 AS (
       |  SELECT ox, oy, ox & $mask AS x, oy & $mask AS y,
       |    CAST(0 AS BIGINT) AS d
       |  FROM base
       |),
       |$rounds
       |SELECT ox AS x, oy AS y, CAST(d AS BIGINT) AS h
       |FROM h$bits ORDER BY x, y""".stripMargin
  }

  /** Generated DuckDB twin of [[graft.ops.Similarity.clusterQualityCard]]:
    * the Lloyd prefix, then per-cluster floored squared-distance cells
    * (identical IEEE (x−c)² on the shared centroid frame), integer-div
    * means, and the k² worst-separation ratio join. */
  private def clusterEvalOracleSql(k: Int, iters: Int, dim: Int): String =
    kmeansCtePrefix(k, iters, dim) +
      s""", sz AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS size
         |  FROM aF GROUP BY 1
         |), cells AS (
         |  SELECT a.cluster,
         |    CAST(sum(CAST(floor((e.emb[g.d] - c.cen[g.d])
         |      * (e.emb[g.d] - c.cen[g.d])
         |      * CAST('1e6' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS ss
         |  FROM aF a JOIN emb e USING (vec_id)
         |  JOIN c$iters c ON c.cluster = a.cluster
         |  CROSS JOIN generate_series(1, $dim) AS g(d)
         |  GROUP BY 1
         |), s2 AS MATERIALIZED (
         |  SELECT z.cluster, z.size, c.ss // z.size AS s2_scaled
         |  FROM sz z JOIN cells c USING (cluster)
         |), cd AS (
         |  SELECT i.cluster AS ci, j.cluster AS cj,
         |    CAST(sum(CAST(floor((i.cen[g.d] - j.cen[g.d])
         |      * (i.cen[g.d] - j.cen[g.d])
         |      * CAST('1e6' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS d2
         |  FROM c$iters i JOIN c$iters j ON i.cluster <> j.cluster
         |  CROSS JOIN generate_series(1, $dim) AS g(d)
         |  GROUP BY 1, 2
         |), ratio AS (
         |  SELECT si.cluster,
         |    CAST(max((si.s2_scaled + sj.s2_scaled) * 1000000
         |      // greatest(cd.d2, 1)) AS BIGINT) AS worst_ratio_ppm
         |  FROM s2 si JOIN cd ON cd.ci = si.cluster
         |  JOIN s2 sj ON sj.cluster = cd.cj
         |  GROUP BY 1
         |)
         |SELECT s2.cluster, s2.size, s2.s2_scaled, r.worst_ratio_ppm
         |FROM s2 JOIN ratio r USING (cluster) ORDER BY cluster""".stripMargin

  /** DuckDB oracle SQL. Hash-seeded ops (minhash/simhash/LSH) are
    * intentionally absent → driver records a rows-only check; their
    * invariants are covered by ScalaTest suites instead.
    */
  /** Duplicate-cluster oracle: df-pruned 3-shingle Jaccard pairs, then
    * min-label connected components via a recursive CTE — shared verbatim
    * by `dedup_clusters` (hash-min) and `dedup_clusters_star`
    * (large-star/small-star), which must agree row-for-row.
    */
  /** Block-hash signature CTE chain (to `s(media_id, sig)`) — the DuckDB
    * twin of [[graft.ops.Multimodal.blockHashSignature]] over the planted
    * media corpus: 14 per-block md5 nibbles packed into one BIGINT.
    * `withExactCopies` adds the verbatim doc_id<10 copies that
    * `multimodal_dedup` plants on top of the perturbed doc_id<40 ones.
    */
  private def phashSigCtes(withExactCopies: Boolean): String = {
    val sigTerms = (0 until 14).map { b =>
      s"CAST('0x' || substr(md5(substr(text, $b * blkw + 1, blkw)), 1, 1) AS BIGINT) * ${math.pow(16, b).toLong}"
    }.mkString("\n    + ")
    val exact =
      if (withExactCopies)
        "\n  UNION ALL\n  SELECT doc_id + 200000, text FROM documents WHERE doc_id < 10"
      else ""
    s"""d AS (
       |  SELECT doc_id AS media_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, substr(text, 1, length(text) - 3) || 'XXX'
       |  FROM documents WHERE doc_id < 40$exact
       |), blk AS (
       |  SELECT media_id, text, (length(text) + 13) // 14 AS blkw FROM d
       |), s AS (
       |  SELECT media_id, $sigTerms AS sig FROM blk
       |)""".stripMargin
  }

  // shared CTE chain to `walk(id, label)` — the recursive transitive
  // closure over the df-pruned exact-jaccard pair graph; consumed by the
  // clusters oracles and the leakage-safe split oracle
  private val clustersCteSql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    list_transform(generate_series(1, len(t) - 2),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      |  FROM toks WHERE len(t) >= 3
      |), pruned AS (
      |  SELECT doc_id, shingle FROM (
      |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
      |    FROM sh) WHERE df <= 25
      |), sizes AS (
      |  SELECT doc_id, count(*) AS set_size FROM pruned GROUP BY doc_id
      |), cand AS (
      |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS common
      |  FROM pruned l JOIN pruned r
      |    ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      |  GROUP BY 1, 2
      |), p AS (
      |  SELECT a_id, b_id FROM cand
      |  JOIN sizes sa ON cand.a_id = sa.doc_id
      |  JOIN sizes sb ON cand.b_id = sb.doc_id
      |  WHERE CAST(common AS DOUBLE)
      |    / CAST(sa.set_size + sb.set_size - common AS DOUBLE) >= 0.5
      |), nodes AS (
      |  SELECT a_id AS id FROM p UNION SELECT b_id FROM p
      |), edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM p
      |  UNION ALL SELECT b_id, a_id FROM p
      |), walk(id, label) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id
      |)""".stripMargin

  private val clustersOracleSql: String = clustersCteSql +
    """
      |SELECT id AS doc_id, min(label) AS cluster_id
      |FROM walk GROUP BY id ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprint CTE chain (to `fps(doc_id, fp)`) — the exact
    * DuckDB twin of `graft_winnow(text, 3, 4)`: md5-prefix-32 hashes of
    * word 3-grams, window-of-4 sliding minimum, distinct selected values.
    * Shared by `text_winnow` (raw fingerprints) and `dedup_winnow`
    * (df-pruned shared-fingerprint pairs).
    */
  private val winnowFpsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
      |), grams AS (
      |  SELECT doc_id, unnest(generate_series(1, len(t) - 2)) AS i, t,
      |    len(t) - 2 AS g
      |  FROM toks WHERE len(t) >= 3
      |), gh AS (
      |  SELECT doc_id, i, g,
      |    CAST('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8)
      |      AS BIGINT) AS h
      |  FROM grams
      |), wins AS (
      |  SELECT doc_id, i, g,
      |    min(h) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
      |  FROM gh
      |), fps AS (
      |  SELECT DISTINCT doc_id, m AS fp FROM wins
      |  WHERE i <= greatest(g - 4, 0) + 1
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "cdc_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |), old AS (
        |  SELECT * FROM o WHERE o_orderkey % 10 <> 9
        |), new AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'CHANGED' ELSE o_orderpriority END AS o_orderpriority,
        |    o_totalprice
        |  FROM o WHERE o_orderkey % 10 <> 0
        |), d AS (
        |  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
        |    CASE WHEN old.o_orderkey IS NULL THEN 'insert'
        |         WHEN new.o_orderkey IS NULL THEN 'delete'
        |         WHEN old.o_orderpriority <> new.o_orderpriority
        |           OR old.o_totalprice <> new.o_totalprice THEN 'update'
        |    END AS change_type
        |  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
        |)
        |SELECT o_orderkey, change_type FROM d
        |WHERE change_type IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    "cdc_apply" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'CHANGED' ELSE o_orderpriority END AS o_orderpriority,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 10 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    // IVM twin: recompute the aggregate from the post-change snapshot
    // from scratch — the identity the maintained view must hash-match
    // bitemporal twin: same two range filters + (valid, sys, value)
    // row_number election; epoch() floors to integer seconds
    "cdc_bitemporal" ->
      """WITH log AS (
        |  SELECT o_custkey AS key,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS valid_from,
        |    CAST(epoch(o_orderdate) AS BIGINT)
        |      + (o_orderkey % 3) * 86400 AS sys_from,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS value
        |  FROM orders
        |), eligible AS (
        |  SELECT * FROM log
        |  WHERE sys_from <= 836179200 + 86400
        |    AND valid_from <= 836179200
        |)
        |SELECT key, valid_from, sys_from, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY key
        |    ORDER BY valid_from DESC, sys_from DESC, value DESC) AS rn
        |  FROM eligible)
        |WHERE rn = 1 ORDER BY key""".stripMargin,
    // packing-plan twin: identical cumulative window and integer bins
    "compaction_plan" ->
      """WITH manifest AS (
        |  SELECT 'part-' || lpad(CAST(l_orderkey // 1024 AS VARCHAR),
        |      5, '0') AS file,
        |    CAST(count(*) * 100 AS BIGINT) AS bytes
        |  FROM lineitem GROUP BY 1
        |), cum AS (
        |  SELECT file, bytes,
        |    CAST(coalesce(sum(bytes) OVER (ORDER BY file
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM manifest
        |)
        |SELECT cum_before // 500000 AS bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |  min(file) AS first_file, max(file) AS last_file
        |FROM cum GROUP BY 1 ORDER BY bin""".stripMargin,
    // ivm-join twin: the oracle RECOMPUTES the full join — the hash
    // check is the maintain(view, delta) == recompute identity
    "cdc_ivm_join" ->
      """SELECT o.o_orderkey AS k, o.o_custkey, l.l_partkey,
        |  CAST(l.l_linenumber AS BIGINT) AS l_linenumber
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |ORDER BY k, o_custkey, l_partkey, l_linenumber""".stripMargin,
    // partition-diff twin: identical md5-prefix row digests, (n, sum,
    // xor) partition folds, full-outer status election
    "cdc_partition_diff" ->
      """WITH li AS (
        |  SELECT l_orderkey // 4096 AS p, l_orderkey, l_linenumber,
        |    CAST(floor(l_quantity * 100) AS BIGINT) AS q_c,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS e_c
        |  FROM lineitem
        |), olds AS (
        |  SELECT * FROM li
        |  WHERE NOT (l_linenumber = 7 AND l_orderkey % 5 = 0)
        |), news AS (
        |  SELECT p, l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 97 = 0 THEN q_c + 100 ELSE q_c END
        |      AS q_c, e_c
        |  FROM li
        |), ho AS (
        |  SELECT p AS part,
        |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
        |      || CAST(l_linenumber AS VARCHAR) || '|'
        |      || CAST(q_c AS VARCHAR) || '|' || CAST(e_c AS VARCHAR)),
        |      1, 8) AS BIGINT) AS h
        |  FROM olds
        |), hn AS (
        |  SELECT p AS part,
        |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
        |      || CAST(l_linenumber AS VARCHAR) || '|'
        |      || CAST(q_c AS VARCHAR) || '|' || CAST(e_c AS VARCHAR)),
        |      1, 8) AS BIGINT) AS h
        |  FROM news
        |), co AS (
        |  SELECT part, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(h) AS BIGINT) AS sum_ck, bit_xor(h) AS xor_ck
        |  FROM ho GROUP BY 1
        |), cn AS (
        |  SELECT part, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(h) AS BIGINT) AS sum_ck, bit_xor(h) AS xor_ck
        |  FROM hn GROUP BY 1
        |)
        |SELECT coalesce(co.part, cn.part) AS part,
        |  CASE WHEN co.part IS NULL THEN 'added'
        |       WHEN cn.part IS NULL THEN 'removed'
        |       WHEN co.n_rows <> cn.n_rows OR co.sum_ck <> cn.sum_ck
        |         OR co.xor_ck <> cn.xor_ck THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  coalesce(co.n_rows, 0) AS old_rows,
        |  coalesce(cn.n_rows, 0) AS new_rows
        |FROM co FULL OUTER JOIN cn ON co.part = cn.part
        |ORDER BY part""".stripMargin,
    "cdc_ivm" ->
      """WITH li AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS pk,
        |    l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem
        |), h AS (
        |  SELECT grp, v,
        |    CAST('0x' || substr(md5(CAST(pk AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 10 AS h
        |  FROM li
        |)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS total
        |FROM h WHERE h >= 2 GROUP BY grp ORDER BY grp""".stripMargin,
    "cdc_scd2" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderpriority, o_orderkey,
        |    lag(o_orderpriority) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev
        |  FROM orders
        |), f AS (
        |  SELECT o_custkey, o_orderpriority, o_orderkey FROM ch
        |  WHERE prev IS NULL OR prev <> o_orderpriority
        |)
        |SELECT o_custkey, o_orderpriority,
        |  o_orderkey AS valid_from,
        |  lead(o_orderkey) OVER w AS valid_to,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  lead(o_orderkey) OVER w IS NULL AS is_current
        |FROM f WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "entity_match" ->
      """WITH c AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, substr(c_name, 1, 17) || 'X'
        |  FROM customer WHERE c_custkey < 50
        |), b AS (
        |  SELECT rec_id, name, substr(name, 1, 17) AS block,
        |    count(*) OVER (PARTITION BY substr(name, 1, 17)) AS bsz
        |  FROM c
        |), k AS (
        |  SELECT * FROM b WHERE bsz <= 100
        |)
        |SELECT l.rec_id AS a_id, r.rec_id AS b_id,
        |  CAST(levenshtein(l.name, r.name) AS BIGINT) AS dist
        |FROM k l JOIN k r ON l.block = r.block AND l.rec_id < r.rec_id
        |WHERE levenshtein(l.name, r.name) <= 1
        |ORDER BY a_id, b_id""".stripMargin,
    // survivorship twin: recursive component walk over the blocked
    // pairs, row_number-over-aggregate argmax for the name vote
    "entity_golden" ->
      """WITH RECURSIVE c AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name AS name,
        |    c_acctbal AS acctbal
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name || 'X',
        |    c_acctbal + CAST('100' AS DOUBLE)
        |  FROM customer WHERE c_custkey < 50
        |  UNION ALL
        |  SELECT c_custkey + 2000000, c_name || 'Y',
        |    c_acctbal + CAST('200' AS DOUBLE)
        |  FROM customer WHERE c_custkey < 25
        |), b AS (
        |  SELECT rec_id, name, acctbal, substr(name, 1, 18) AS block,
        |    count(*) OVER (PARTITION BY substr(name, 1, 18)) AS bsz
        |  FROM c
        |), k AS (
        |  SELECT * FROM b WHERE bsz <= 100
        |), p AS (
        |  SELECT l.rec_id AS a_id, r.rec_id AS b_id
        |  FROM k l JOIN k r ON l.block = r.block AND l.rec_id < r.rec_id
        |  WHERE levenshtein(l.name, r.name) <= 1
        |), nodes AS (
        |  SELECT a_id AS id FROM p UNION SELECT b_id FROM p
        |), edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM p
        |  UNION ALL SELECT b_id, a_id FROM p
        |), walk(id, label) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
        |), comp AS (
        |  SELECT id, min(label) AS cluster_id FROM walk GROUP BY id
        |), wc AS (
        |  SELECT c.rec_id, coalesce(comp.cluster_id, c.rec_id) AS cluster_id,
        |    c.name, c.acctbal
        |  FROM c LEFT JOIN comp ON c.rec_id = comp.id
        |), votes AS (
        |  SELECT cluster_id, name FROM (
        |    SELECT cluster_id, name, row_number() OVER (
        |      PARTITION BY cluster_id ORDER BY count(*) DESC, name) AS rn
        |    FROM wc GROUP BY cluster_id, name
        |  ) v WHERE rn = 1
        |)
        |SELECT w.cluster_id AS cluster_id, min(w.rec_id) AS canonical_id,
        |  min(v.name) AS canonical_name, max(w.acctbal) AS max_acctbal,
        |  CAST(count(*) AS BIGINT) AS n_members
        |FROM wc w JOIN votes v ON w.cluster_id = v.cluster_id
        |GROUP BY w.cluster_id ORDER BY cluster_id""".stripMargin,
    // matching twin: per-round materialized CTEs, rn=1 per-vertex min
    // edge, an edge matches when it IS the min at both endpoints
    "graph_matching" -> {
      val round = (e: String, i: Int) => {
        val (vm, m, en) = (s"vm$i", s"m$i", s"e${i + 1}")
        s"""$vm AS MATERIALIZED (
           |  SELECT v, h, lo, hi FROM (
           |    SELECT v, h, lo, hi, row_number() OVER (
           |      PARTITION BY v ORDER BY h, lo, hi) AS rn
           |    FROM (
           |      SELECT lo AS v, h, lo, hi FROM $e
           |      UNION ALL SELECT hi, h, lo, hi FROM $e
           |    ) i
           |  ) w WHERE rn = 1
           |), $m AS MATERIALIZED (
           |  SELECT e.lo, e.hi FROM $e e
           |  JOIN $vm a ON a.v = e.lo AND a.h = e.h
           |    AND a.lo = e.lo AND a.hi = e.hi
           |  JOIN $vm b ON b.v = e.hi AND b.h = e.h
           |    AND b.lo = e.lo AND b.hi = e.hi
           |), $en AS MATERIALIZED (
           |  SELECT lo, hi, h FROM $e
           |  WHERE lo NOT IN (SELECT lo FROM $m UNION SELECT hi FROM $m)
           |    AND hi NOT IN (SELECT lo FROM $m UNION SELECT hi FROM $m)
           |)""".stripMargin
      }
      s"""WITH ed AS (
         |  SELECT o_orderkey AS a, o_custkey + 10000000 AS b FROM orders
         |), e0 AS (
         |  SELECT lo, hi,
         |    CAST('0x' || substr(md5(CAST(lo AS VARCHAR) || ':' ||
         |      CAST(hi AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM (
         |    SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
         |    FROM ed WHERE a <> b
         |  ) c
         |),
         |${round("e0", 0)},
         |${round("e1", 1)},
         |${round("e2", 2)},
         |${round("e3", 3)}
         |SELECT lo, hi, status FROM (
         |  SELECT lo, hi, 'matched' AS status FROM m0
         |  UNION ALL SELECT lo, hi, 'matched' FROM m1
         |  UNION ALL SELECT lo, hi, 'matched' FROM m2
         |  UNION ALL SELECT lo, hi, 'matched' FROM m3
         |  UNION ALL SELECT lo, hi, 'undecided' FROM e4
         |) u ORDER BY lo, hi""".stripMargin
    },
    // Luby twin: per-round materialized CTEs (the scc lesson — DuckDB
    // inlines plain CTEs per reference), rn=1 window picks each node's
    // min active-neighbor priority, explicit (h, id) tuple compare
    "graph_mis" -> {
      val round = (a: String, i: Int) => {
        val (e, n, c, rm, an) = (s"e$i", s"n$i", s"c$i", s"rm$i", s"a${i + 1}")
        s"""$e AS MATERIALIZED (
           |  SELECT u.a, u.b FROM und u
           |  WHERE u.a IN (SELECT id FROM $a)
           |    AND u.b IN (SELECT id FROM $a)
           |), $n AS MATERIALIZED (
           |  SELECT id, nh, nid FROM (
           |    SELECT e.a AS id, p.h AS nh, e.b AS nid,
           |      row_number() OVER (PARTITION BY e.a ORDER BY p.h, e.b) AS rn
           |    FROM $e e JOIN pri p ON p.id = e.b
           |  ) w WHERE rn = 1
           |), $c AS MATERIALIZED (
           |  SELECT x.id FROM $a x JOIN pri p ON p.id = x.id
           |  LEFT JOIN $n n ON n.id = x.id
           |  WHERE n.id IS NULL OR p.h < n.nh OR (p.h = n.nh AND x.id < n.nid)
           |), $rm AS MATERIALIZED (
           |  SELECT DISTINCT b AS id FROM $e WHERE a IN (SELECT id FROM $c)
           |), $an AS MATERIALIZED (
           |  SELECT id FROM $a WHERE id NOT IN (SELECT id FROM $c)
           |    AND id NOT IN (SELECT id FROM $rm)
           |)""".stripMargin
      }
      s"""WITH ed AS (
         |  SELECT o_orderkey AS a, o_custkey + 10000000 AS b FROM orders
         |), und AS (
         |  SELECT DISTINCT a, b FROM (
         |    SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed
         |  ) t WHERE a <> b
         |), pri AS (
         |  SELECT id,
         |    CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS BIGINT)
         |      AS h
         |  FROM (SELECT DISTINCT a AS id FROM und) s
         |), a0 AS (SELECT id FROM pri),
         |${round("a0", 0)},
         |${round("a1", 1)},
         |${round("a2", 2)},
         |${round("a3", 3)}
         |SELECT id, status FROM (
         |  SELECT id, 'mis' AS status FROM c0
         |  UNION ALL SELECT id, 'mis' FROM c1
         |  UNION ALL SELECT id, 'mis' FROM c2
         |  UNION ALL SELECT id, 'mis' FROM c3
         |  UNION ALL SELECT id, 'out' FROM rm0
         |  UNION ALL SELECT id, 'out' FROM rm1
         |  UNION ALL SELECT id, 'out' FROM rm2
         |  UNION ALL SELECT id, 'out' FROM rm3
         |  UNION ALL SELECT id, 'undecided' FROM a4
         |) u ORDER BY id""".stripMargin
    },
    // SymSpell twin: same md5-planted typos, deletion variants via a
    // correlated range unnest, distinct candidates, levenshtein verify
    // phonetic twin: the SAME generated soundex SQL text (portable by
    // construction), DuckDB string_split for the token explode
    "linkage_phonetic" -> {
      s"""WITH tok AS (
         |  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS t
         |  FROM part
         |), c AS (
         |  SELECT t, ${graft.ops.Linkage.soundexSql("t")} AS code
         |  FROM tok
         |)
         |SELECT a.code AS code, a.t AS tok_a, b.t AS tok_b,
         |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS lev
         |FROM c a JOIN c b ON a.code = b.code AND a.t < b.t
         |WHERE levenshtein(a.t, b.t) <= 2
         |ORDER BY code, tok_a, tok_b""".stripMargin
    },
    "linkage_fuzzy" ->
      """WITH c AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name AS name
        |  FROM customer
        |), d0 AS (
        |  SELECT rec_id, name,
        |    CAST('0x' || substr(md5(CAST(rec_id AS VARCHAR) || ':pos'), 1, 8)
        |      AS BIGINT) % length(name) + 1 AS pos,
        |    CAST('0x' || substr(md5(CAST(rec_id AS VARCHAR) || ':op'), 1, 8)
        |      AS BIGINT) % 2 AS op
        |  FROM c WHERE rec_id % 5 = 0
        |), dirty AS (
        |  SELECT rec_id + 2000000 AS rec_id,
        |    CASE WHEN op = 0
        |      THEN substr(name, 1, pos - 1) || 'x' || substr(name, pos + 1)
        |      ELSE substr(name, 1, pos - 1) || substr(name, pos + 1)
        |    END AS name
        |  FROM d0
        |), lv AS (
        |  SELECT rec_id AS a_id, name AS a_name,
        |    CASE WHEN i = length(name) THEN name
        |         ELSE substr(name, 1, i) || substr(name, i + 2) END AS v
        |  FROM dirty, UNNEST(range(0, length(name) + 1)) AS u(i)
        |), rv AS (
        |  SELECT rec_id AS b_id, name AS b_name,
        |    CASE WHEN i = length(name) THEN name
        |         ELSE substr(name, 1, i) || substr(name, i + 2) END AS v
        |  FROM c, UNNEST(range(0, length(name) + 1)) AS u(i)
        |), cand AS (
        |  SELECT DISTINCT l.a_id, l.a_name, r.b_id, r.b_name
        |  FROM lv l JOIN rv r ON l.v = r.v
        |)
        |SELECT a_id, b_id,
        |  CAST(levenshtein(a_name, b_name) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(a_name, b_name) <= 1
        |ORDER BY a_id, b_id""".stripMargin,
    // bounded recursive CTE: UNION dedups (id, d) pairs and d < 3 caps the
    // depth, so the walk terminates; min(d) per id is the BFS distance
    "graph_bfs" ->
      """WITH RECURSIVE e AS (
        |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
        |), u AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION ALL SELECT dst, src FROM e
        |), walk(id, d) AS (
        |  SELECT o_orderkey, 0 FROM orders WHERE o_orderkey < 100
        |  UNION
        |  SELECT u.v, w.d + 1 FROM walk w JOIN u ON u.u = w.id WHERE w.d < 3
        |)
        |SELECT id, CAST(min(d) AS BIGINT) AS dist
        |FROM walk GROUP BY id ORDER BY id""".stripMargin,
    // same bounded walk keyed per seed; 12/d is an exact integer for
    // d in 1..3 so the per-node sum is order-free BIGINT, one final
    // double division (CAST '12' to dodge DuckDB's decimal literals)
    "graph_harmonic" ->
      """WITH RECURSIVE e AS (
        |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
        |), u AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION ALL SELECT dst, src FROM e
        |), walk(seed, id, d) AS (
        |  SELECT o_orderkey, o_orderkey, 0 FROM orders WHERE o_orderkey < 100
        |  UNION
        |  SELECT w.seed, u.v, w.d + 1 FROM walk w JOIN u ON u.u = w.id
        |  WHERE w.d < 3
        |), dist AS (
        |  SELECT seed, id, min(d) AS dist FROM walk GROUP BY 1, 2
        |)
        |SELECT id, CAST(sum(12 // dist) AS BIGINT) AS h_scaled,
        |  CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST(CAST(sum(12 // dist) AS BIGINT) AS DOUBLE)
        |    / CAST('12' AS DOUBLE) AS harmonic
        |FROM dist WHERE dist > 0 GROUP BY id ORDER BY id""".stripMargin,
    // landmarkDistances twin: same seed-keyed bounded walk from the 4
    // md5-bottom landmark parts, min(du+dv) over common landmarks per
    // md5-consecutive order pair, LEFT JOIN keeps uncovered pairs NULL
    "graph_landmark_dist" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT l_orderkey AS src, l_partkey + 20000000 AS dst
        |  FROM lineitem
        |), u AS (
        |  SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e
        |), lm AS (
        |  SELECT id FROM (SELECT DISTINCT dst AS id FROM e)
        |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 4
        |), ordk AS (
        |  SELECT id, CAST(row_number() OVER (
        |      ORDER BY md5(CAST(id AS VARCHAR)), id) AS BIGINT) AS rn
        |  FROM (SELECT DISTINCT src AS id FROM e)
        |), pairs AS (
        |  SELECT a.id AS u, b.id AS v
        |  FROM ordk a JOIN ordk b ON b.rn = a.rn + 1
        |  WHERE a.rn % 2 = 1 AND b.rn <= 64
        |), walk(seed, id, d) AS (
        |  SELECT id, id, 0 FROM lm
        |  UNION
        |  SELECT w.seed, u.v, w.d + 1 FROM walk w JOIN u ON u.u = w.id
        |  WHERE w.d < 4
        |), dist AS (
        |  SELECT seed, id, CAST(min(d) AS BIGINT) AS dist
        |  FROM walk GROUP BY 1, 2
        |), est AS (
        |  SELECT p.u AS u, p.v AS v,
        |    CAST(min(d1.dist + d2.dist) AS BIGINT) AS est_dist,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM pairs p
        |  JOIN dist d1 ON d1.id = p.u
        |  JOIN dist d2 ON d2.id = p.v AND d2.seed = d1.seed
        |  GROUP BY 1, 2
        |)
        |SELECT p.u AS u, p.v AS v, est.est_dist,
        |  COALESCE(est.n_common, 0) AS n_common
        |FROM pairs p LEFT JOIN est ON est.u = p.u AND est.v = p.v
        |ORDER BY u, v""".stripMargin,
    "events_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, value FROM events
        |), span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1
        |), grid AS (
        |  SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM span
        |), per AS (
        |  SELECT user_id, day, count(*) AS n_events,
        |    sum(CAST(value AS DECIMAL(18,4))) AS dv
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT g.user_id, g.day,
        |  COALESCE(n_events, 0) AS n_events,
        |  CAST(COALESCE(dv, 0) AS DOUBLE) AS day_value,
        |  CAST(sum(COALESCE(dv, 0)) OVER (PARTITION BY g.user_id ORDER BY g.day
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value
        |FROM grid g LEFT JOIN per ON g.user_id = per.user_id AND g.day = per.day
        |ORDER BY g.user_id, g.day""".stripMargin,
    "text_search" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), q AS (
        |  SELECT DISTINCT query_id, token FROM (
        |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
        |    FROM toks WHERE doc_id < 5)
        |), tfa AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS token FROM toks)
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
        |), sc AS (
        |  SELECT q.query_id, d.doc_id,
        |    CAST(sum(tf * (1000000 // df)) AS BIGINT) AS score,
        |    count(*) AS n_terms
        |  FROM d JOIN q ON d.token = q.token GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS "rank"
        |  FROM sc
        |)
        |SELECT query_id, CAST("rank" AS BIGINT) AS "rank", doc_id, score, n_terms
        |FROM rk WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,
    // BM25 twin: identical integer arithmetic — the one scaled division
    // per term ((idf·2200·L·tf) // (10·L·tf + 3·L + 9·dl·N)) is pure
    // BIGINT in both engines, so the summed scores hash-match exactly
    // both rankings rebuilt in SQL (the text_bm25 and ann_brute chains
    // at k=10), then fused: 1e9 // (60 + rank) summed per (query, doc)
    "search_hybrid" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), lens AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
        |), tot AS (
        |  SELECT CAST(sum(dl) AS BIGINT) AS corpus_len, count(*) AS n_docs FROM lens
        |), q AS (
        |  SELECT DISTINCT query_id, token FROM (
        |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
        |    FROM toks WHERE doc_id < 5)
        |), tfa AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS token FROM toks)
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
        |), sc AS (
        |  SELECT q.query_id, d.doc_id,
        |    CAST(sum(((1000000 // df) * 2200 * corpus_len * tf)
        |      // (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))
        |      AS BIGINT) AS score
        |  FROM d JOIN q ON d.token = q.token
        |  JOIN lens ON d.doc_id = lens.doc_id
        |  CROSS JOIN tot
        |  GROUP BY 1, 2
        |), lex AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS r
        |  FROM sc
        |), aq AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5
        |), ac AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings
        |), ascored AS (
        |  SELECT aq.query_id, ac.vec_id,
        |    list_dot_product(ce, qe) /
        |      (sqrt(list_dot_product(ce, ce)) * sqrt(list_dot_product(qe, qe))) AS cosine
        |  FROM ac, aq WHERE ac.vec_id <> aq.query_id
        |), sem AS (
        |  SELECT query_id, vec_id AS doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id ASC) AS r
        |  FROM ascored
        |), fused AS (
        |  SELECT query_id, doc_id,
        |    CAST(sum(1000000000 // (60 + r)) AS BIGINT) AS rrf_scaled,
        |    CAST(count(*) AS BIGINT) AS n_lists
        |  FROM (
        |    SELECT query_id, doc_id, r FROM lex WHERE r <= 10
        |    UNION ALL
        |    SELECT query_id, doc_id, r FROM sem WHERE r <= 10
        |  ) GROUP BY 1, 2
        |), frk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_scaled DESC, doc_id) AS "rank"
        |  FROM fused
        |)
        |SELECT query_id, CAST("rank" AS BIGINT) AS "rank", doc_id,
        |  rrf_scaled, n_lists
        |FROM frk WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,
    "dedup_eval" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |), corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    substr(text, 1, length(text) - 3) || 'XXX'
        |  FROM base WHERE doc_id < 40
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM base WHERE doc_id < 10
        |), hashed AS (
        |  SELECT doc_id, sha256(text) AS h FROM corpus
        |), pred AS (
        |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM hashed a JOIN hashed b
        |    ON a.h = b.h AND a.doc_id < b.doc_id
        |), truth AS (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT doc_id AS a, doc_id + 100000 AS b FROM base
        |    WHERE doc_id < 40
        |    UNION ALL
        |    SELECT doc_id, doc_id + 200000 FROM base WHERE doc_id < 10)
        |), j AS (
        |  SELECT COALESCE(p.one, 0) AS in_p, COALESCE(t.one, 0) AS in_t
        |  FROM (SELECT a, b, 1 AS one FROM pred) p
        |  FULL OUTER JOIN (SELECT a, b, 1 AS one FROM truth) t
        |    USING (a, b)
        |), agg AS (
        |  SELECT CAST(sum(in_p) AS BIGINT) AS n_predicted,
        |    CAST(sum(in_t) AS BIGINT) AS n_truth,
        |    CAST(sum(in_p * in_t) AS BIGINT) AS tp
        |  FROM j
        |), pr AS (
        |  SELECT *,
        |    CASE WHEN n_predicted = 0 THEN 0
        |      ELSE 1000000 * tp // n_predicted END AS precision_ppm,
        |    CASE WHEN n_truth = 0 THEN 0
        |      ELSE 1000000 * tp // n_truth END AS recall_ppm
        |  FROM agg
        |)
        |SELECT n_predicted, n_truth, tp,
        |  n_predicted - tp AS fp, n_truth - tp AS fn,
        |  CAST(precision_ppm AS BIGINT) AS precision_ppm,
        |  CAST(recall_ppm AS BIGINT) AS recall_ppm,
        |  CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
        |    ELSE 2 * precision_ppm * recall_ppm
        |      // (precision_ppm + recall_ppm) END AS BIGINT) AS f1_ppm
        |FROM pr""".stripMargin,
    "text_bm25" -> bm25OracleSql,
    // the indexed path returns the SAME rows (index-time df == on-the-fly
    // df: df is a property of the token, not the query filter)
    "search_indexed" -> bm25OracleSql,
    // retrieval-eval twin: the bm25 scoring chain + the all-terms gold
    // set (HAVING count == per-query term count) + integer ppm metrics
    "eval_retrieval" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), lens AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
        |), tot AS (
        |  SELECT CAST(sum(dl) AS BIGINT) AS corpus_len, count(*) AS n_docs
        |  FROM lens
        |), q AS (
        |  SELECT DISTINCT query_id, token FROM (
        |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
        |    FROM toks WHERE doc_id < 5)
        |), nq AS (
        |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_q_terms
        |  FROM q GROUP BY 1
        |), tfa AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS token FROM toks)
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
        |), sc AS (
        |  SELECT q.query_id, d.doc_id,
        |    CAST(sum(((1000000 // df) * 2200 * corpus_len * tf)
        |      // (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))
        |      AS BIGINT) AS score
        |  FROM d JOIN q ON d.token = q.token
        |  JOIN lens ON d.doc_id = lens.doc_id
        |  CROSS JOIN tot
        |  GROUP BY 1, 2
        |), pred AS (
        |  SELECT query_id, doc_id, CAST(r AS BIGINT) AS r FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS r
        |    FROM sc) WHERE r <= 5
        |), post AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(t) AS token FROM toks)
        |), gold AS (
        |  SELECT q.query_id, p.doc_id
        |  FROM post p
        |  JOIN q ON q.token = p.token
        |  JOIN nq ON nq.query_id = q.query_id
        |  GROUP BY 1, 2
        |  HAVING CAST(count(*) AS BIGINT) = min(nq.n_q_terms)
        |), ng AS (
        |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_gold
        |  FROM gold GROUP BY 1
        |), h AS (
        |  SELECT p.query_id, CAST(count(*) AS BIGINT) AS n_hits,
        |    CAST(min(p.r) AS BIGINT) AS first_rank
        |  FROM pred p JOIN gold g
        |    ON g.query_id = p.query_id AND g.doc_id = p.doc_id
        |  GROUP BY 1
        |)
        |SELECT ng.query_id, ng.n_gold,
        |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(1000000 * COALESCE(h.n_hits, 0) // 5 AS BIGINT)
        |    AS precision_ppm,
        |  CAST(1000000 * COALESCE(h.n_hits, 0) // ng.n_gold AS BIGINT)
        |    AS recall_ppm,
        |  CAST(CASE WHEN h.first_rank IS NULL THEN 0
        |    ELSE 1000000 // h.first_rank END AS BIGINT) AS mrr_ppm
        |FROM ng LEFT JOIN h ON h.query_id = ng.query_id
        |ORDER BY ng.query_id""".stripMargin,
    // maxsim twin: chunk = (i-1) // 32 over the 1-indexed UNNEST
    // positions == Spark's 0-based pos div 32; max pooling then the
    // keyword-score close
    "search_maxsim" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), q AS (
        |  SELECT DISTINCT query_id, token FROM (
        |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
        |    FROM toks WHERE doc_id < 5) z
        |), pos AS (
        |  SELECT doc_id, (i - 1) // 32 AS chunk, t[i] AS token
        |  FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
        |), ctf AS (
        |  SELECT doc_id, chunk, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM pos WHERE token IN (SELECT token FROM q)
        |  GROUP BY 1, 2, 3
        |), best AS (
        |  SELECT doc_id, token, max(tf) AS max_tf FROM ctf GROUP BY 1, 2
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM best
        |), sc AS (
        |  SELECT q.query_id, d.doc_id,
        |    CAST(sum((1000000 // df) * max_tf) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_terms
        |  FROM d JOIN q ON d.token = q.token
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS "rank"
        |  FROM sc
        |)
        |SELECT query_id, CAST("rank" AS BIGINT) AS "rank", doc_id, score,
        |  n_terms
        |FROM rk WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,
    // bm25 chain to a top-10 shortlist, then exact cosine re-rank — the
    // ann_brute float recipe (list_dot_product == graft_dot fold)
    "search_rerank" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), lens AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
        |), tot AS (
        |  SELECT CAST(sum(dl) AS BIGINT) AS corpus_len, count(*) AS n_docs FROM lens
        |), q AS (
        |  SELECT DISTINCT query_id, token FROM (
        |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
        |    FROM toks WHERE doc_id < 5)
        |), tfa AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS token FROM toks)
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
        |), sc AS (
        |  SELECT q.query_id, d.doc_id,
        |    CAST(sum(((1000000 // df) * 2200 * corpus_len * tf)
        |      // (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))
        |      AS BIGINT) AS score
        |  FROM d JOIN q ON d.token = q.token
        |  JOIN lens ON d.doc_id = lens.doc_id
        |  CROSS JOIN tot
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS "rank"
        |  FROM sc
        |), short AS (
        |  SELECT query_id, doc_id FROM rk WHERE "rank" <= 10
        |), de AS (
        |  SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), qe AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id < 5
        |), resc AS (
        |  SELECT s.query_id, s.doc_id,
        |    list_dot_product(de.e, qe.e) /
        |      (sqrt(list_dot_product(de.e, de.e)) *
        |       sqrt(list_dot_product(qe.e, qe.e))) AS cosine
        |  FROM short s
        |  JOIN de ON s.doc_id = de.doc_id
        |  JOIN qe ON s.query_id = qe.query_id
        |), rr AS (
        |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, doc_id) AS "rank"
        |  FROM resc
        |)
        |SELECT query_id, CAST("rank" AS BIGINT) AS "rank", doc_id
        |FROM rr WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,
    // MMR twin: same bm25 shortlist + rank relevance, floored-cosine
    // pairwise sims, five unrolled materialized selection steps with
    // identical integer scores and min-doc-id ties
    "search_mmr" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), lens AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
        |), tot AS (
        |  SELECT CAST(sum(dl) AS BIGINT) AS corpus_len, count(*) AS n_docs FROM lens
        |), q AS (
        |  SELECT DISTINCT query_id, token FROM (
        |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
        |    FROM toks WHERE doc_id < 5) uq
        |), tfa AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS token FROM toks) ut
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
        |), sc AS (
        |  SELECT q.query_id, d.doc_id,
        |    CAST(sum(((1000000 // df) * 2200 * corpus_len * tf)
        |      // (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))
        |      AS BIGINT) AS score
        |  FROM d JOIN q ON d.token = q.token
        |  JOIN lens ON d.doc_id = lens.doc_id
        |  CROSS JOIN tot
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS "rank"
        |  FROM sc
        |), de AS (
        |  SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), sh AS (
        |  SELECT rk.query_id, rk.doc_id, CAST(10 - rk."rank" AS BIGINT) AS rel
        |  FROM rk JOIN de ON de.doc_id = rk.doc_id
        |  WHERE rk."rank" <= 10
        |), sims AS (
        |  SELECT a.query_id, a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(floor((list_dot_product(ea.e, eb.e) /
        |      (sqrt(list_dot_product(ea.e, ea.e)) *
        |       sqrt(list_dot_product(eb.e, eb.e)))) * 1000000) AS BIGINT)
        |      AS sim
        |  FROM sh a JOIN sh b
        |    ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
        |  JOIN de ea ON ea.doc_id = a.doc_id
        |  JOIN de eb ON eb.doc_id = b.doc_id
        |), sel0 AS (
        |  SELECT CAST(NULL AS BIGINT) AS query_id,
        |    CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS pick
        |  WHERE false
        |), m1 AS MATERIALIZED (
        |  SELECT s.query_id, s.b_id AS doc_id, max(s.sim) AS maxsim
        |  FROM sims s JOIN sel0 x
        |    ON x.query_id = s.query_id AND x.doc_id = s.a_id
        |  GROUP BY 1, 2
        |), c1 AS MATERIALIZED (
        |  SELECT sh.* FROM sh WHERE NOT EXISTS (
        |    SELECT 1 FROM sel0 x
        |    WHERE x.query_id = sh.query_id AND x.doc_id = sh.doc_id)
        |), p1 AS MATERIALIZED (
        |  SELECT query_id, doc_id, CAST(1 AS BIGINT) AS pick FROM (
        |    SELECT c.query_id, c.doc_id, row_number() OVER (
        |      PARTITION BY c.query_id
        |      ORDER BY c.rel * 7 * 1000000 - 3 * coalesce(m.maxsim, 0)
        |        DESC, c.doc_id) AS rn
        |    FROM c1 c LEFT JOIN m1 m
        |      ON m.query_id = c.query_id AND m.doc_id = c.doc_id
        |  ) z WHERE rn = 1
        |), sel1 AS MATERIALIZED (
        |  SELECT * FROM sel0 UNION ALL SELECT * FROM p1
        |),
        |m2 AS MATERIALIZED (
        |  SELECT s.query_id, s.b_id AS doc_id, max(s.sim) AS maxsim
        |  FROM sims s JOIN sel1 x
        |    ON x.query_id = s.query_id AND x.doc_id = s.a_id
        |  GROUP BY 1, 2
        |), c2 AS MATERIALIZED (
        |  SELECT sh.* FROM sh WHERE NOT EXISTS (
        |    SELECT 1 FROM sel1 x
        |    WHERE x.query_id = sh.query_id AND x.doc_id = sh.doc_id)
        |), p2 AS MATERIALIZED (
        |  SELECT query_id, doc_id, CAST(2 AS BIGINT) AS pick FROM (
        |    SELECT c.query_id, c.doc_id, row_number() OVER (
        |      PARTITION BY c.query_id
        |      ORDER BY c.rel * 7 * 1000000 - 3 * coalesce(m.maxsim, 0)
        |        DESC, c.doc_id) AS rn
        |    FROM c2 c LEFT JOIN m2 m
        |      ON m.query_id = c.query_id AND m.doc_id = c.doc_id
        |  ) z WHERE rn = 1
        |), sel2 AS MATERIALIZED (
        |  SELECT * FROM sel1 UNION ALL SELECT * FROM p2
        |),
        |m3 AS MATERIALIZED (
        |  SELECT s.query_id, s.b_id AS doc_id, max(s.sim) AS maxsim
        |  FROM sims s JOIN sel2 x
        |    ON x.query_id = s.query_id AND x.doc_id = s.a_id
        |  GROUP BY 1, 2
        |), c3 AS MATERIALIZED (
        |  SELECT sh.* FROM sh WHERE NOT EXISTS (
        |    SELECT 1 FROM sel2 x
        |    WHERE x.query_id = sh.query_id AND x.doc_id = sh.doc_id)
        |), p3 AS MATERIALIZED (
        |  SELECT query_id, doc_id, CAST(3 AS BIGINT) AS pick FROM (
        |    SELECT c.query_id, c.doc_id, row_number() OVER (
        |      PARTITION BY c.query_id
        |      ORDER BY c.rel * 7 * 1000000 - 3 * coalesce(m.maxsim, 0)
        |        DESC, c.doc_id) AS rn
        |    FROM c3 c LEFT JOIN m3 m
        |      ON m.query_id = c.query_id AND m.doc_id = c.doc_id
        |  ) z WHERE rn = 1
        |), sel3 AS MATERIALIZED (
        |  SELECT * FROM sel2 UNION ALL SELECT * FROM p3
        |),
        |m4 AS MATERIALIZED (
        |  SELECT s.query_id, s.b_id AS doc_id, max(s.sim) AS maxsim
        |  FROM sims s JOIN sel3 x
        |    ON x.query_id = s.query_id AND x.doc_id = s.a_id
        |  GROUP BY 1, 2
        |), c4 AS MATERIALIZED (
        |  SELECT sh.* FROM sh WHERE NOT EXISTS (
        |    SELECT 1 FROM sel3 x
        |    WHERE x.query_id = sh.query_id AND x.doc_id = sh.doc_id)
        |), p4 AS MATERIALIZED (
        |  SELECT query_id, doc_id, CAST(4 AS BIGINT) AS pick FROM (
        |    SELECT c.query_id, c.doc_id, row_number() OVER (
        |      PARTITION BY c.query_id
        |      ORDER BY c.rel * 7 * 1000000 - 3 * coalesce(m.maxsim, 0)
        |        DESC, c.doc_id) AS rn
        |    FROM c4 c LEFT JOIN m4 m
        |      ON m.query_id = c.query_id AND m.doc_id = c.doc_id
        |  ) z WHERE rn = 1
        |), sel4 AS MATERIALIZED (
        |  SELECT * FROM sel3 UNION ALL SELECT * FROM p4
        |),
        |m5 AS MATERIALIZED (
        |  SELECT s.query_id, s.b_id AS doc_id, max(s.sim) AS maxsim
        |  FROM sims s JOIN sel4 x
        |    ON x.query_id = s.query_id AND x.doc_id = s.a_id
        |  GROUP BY 1, 2
        |), c5 AS MATERIALIZED (
        |  SELECT sh.* FROM sh WHERE NOT EXISTS (
        |    SELECT 1 FROM sel4 x
        |    WHERE x.query_id = sh.query_id AND x.doc_id = sh.doc_id)
        |), p5 AS MATERIALIZED (
        |  SELECT query_id, doc_id, CAST(5 AS BIGINT) AS pick FROM (
        |    SELECT c.query_id, c.doc_id, row_number() OVER (
        |      PARTITION BY c.query_id
        |      ORDER BY c.rel * 7 * 1000000 - 3 * coalesce(m.maxsim, 0)
        |        DESC, c.doc_id) AS rn
        |    FROM c5 c LEFT JOIN m5 m
        |      ON m.query_id = c.query_id AND m.doc_id = c.doc_id
        |  ) z WHERE rn = 1
        |), sel5 AS MATERIALIZED (
        |  SELECT * FROM sel4 UNION ALL SELECT * FROM p5
        |)
        |SELECT query_id, pick, doc_id FROM sel5
        |ORDER BY query_id, pick""".stripMargin,
    // same bm25 shortlist; keep docs whose cosine < 0.5 (forced DOUBLE —
    // a bare 0.5 parses DECIMAL in DuckDB and diverges from Spark)
    "search_hard_negatives" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), lens AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
        |), tot AS (
        |  SELECT CAST(sum(dl) AS BIGINT) AS corpus_len, count(*) AS n_docs FROM lens
        |), q AS (
        |  SELECT DISTINCT query_id, token FROM (
        |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
        |    FROM toks WHERE doc_id < 5)
        |), tfa AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS token FROM toks)
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
        |), sc AS (
        |  SELECT q.query_id, d.doc_id,
        |    CAST(sum(((1000000 // df) * 2200 * corpus_len * tf)
        |      // (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))
        |      AS BIGINT) AS score
        |  FROM d JOIN q ON d.token = q.token
        |  JOIN lens ON d.doc_id = lens.doc_id
        |  CROSS JOIN tot
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS "rank"
        |  FROM sc
        |), short AS (
        |  SELECT query_id, doc_id, CAST("rank" AS BIGINT) AS bm25_rank
        |  FROM rk WHERE "rank" <= 10
        |), de AS (
        |  SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), qe AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id < 5
        |)
        |SELECT s.query_id AS query_id, s.doc_id AS doc_id, s.bm25_rank
        |FROM short s
        |JOIN de ON s.doc_id = de.doc_id
        |JOIN qe ON s.query_id = qe.query_id
        |WHERE list_dot_product(de.e, qe.e) /
        |    (sqrt(list_dot_product(de.e, de.e)) *
        |     sqrt(list_dot_product(qe.e, qe.e))) < CAST('0.5' AS DOUBLE)
        |ORDER BY s.query_id, s.bm25_rank, s.doc_id""".stripMargin,
    "normalize_nodes" ->
      """SELECT c_custkey AS nodeId,
        | array_to_string(string_split(concat(c_mktsegment, ',', 'Customer'), ','), '|') AS labels,
        | c_name, c_acctbal
        |FROM customer ORDER BY nodeId""".stripMargin,
    "normalize_edges" ->
      """SELECT o_orderkey AS sourceNodeId, o_custkey AS targetNodeId,
        | o_orderpriority AS relationshipType, o_totalprice
        |FROM orders ORDER BY sourceNodeId""".stripMargin,
    "latest_snapshot" ->
      """SELECT o_custkey AS customer_id,
        | max(CAST(epoch(o_orderdate) AS BIGINT)) AS latest_ts,
        | count(*) AS n_snapshots
        |FROM orders GROUP BY 1 ORDER BY customer_id""".stripMargin,
    "graph_degrees" ->
      """WITH e AS (
        |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
        |), o AS (
        |  SELECT src AS id, count(*) AS out_deg FROM e GROUP BY 1
        |), i AS (
        |  SELECT dst AS id, count(*) AS in_deg FROM e GROUP BY 1
        |)
        |SELECT COALESCE(o.id, i.id) AS id,
        |  COALESCE(out_deg, 0) AS out_deg,
        |  COALESCE(in_deg, 0) AS in_deg,
        |  COALESCE(out_deg, 0) + COALESCE(in_deg, 0) AS total_deg
        |FROM o FULL OUTER JOIN i ON o.id = i.id ORDER BY id""".stripMargin,
    // fixed-point integer PageRank: 5 unrolled rounds of
    // r' = (15S)//100 + (85 * sum(r//outdeg over in-edges))//100 at
    // S = 10^12 — identical BIGINT arithmetic to the Spark operator, so
    // the hashes match exactly (double accumulation would drift with
    // reduction order)
    // scc: two unrolled FW-BW peels; least() skips the NULL a
    // neighborless node produces in BOTH engines, so each propagation
    // round is the exact twin of the Spark sccStep
    "graph_scc" -> {
      val step = (prev: String, cur: String, eTab: String, fwd: Boolean) => {
        val (near, far) = if (fwd) ("src", "dst") else ("dst", "src")
        s"""$cur AS MATERIALIZED (
           |  SELECT p.id, least(p.lbl, x.m) AS lbl
           |  FROM $prev p LEFT JOIN (
           |    SELECT e.$near AS id, min(q.lbl) AS m
           |    FROM $eTab e JOIN $prev q ON q.id = e.$far GROUP BY 1
           |  ) x ON x.id = p.id
           |)""".stripMargin
      }
      val peel = (n: Int) => (1 to 4).map(i =>
        step(s"f$n${i - 1}", s"f$n$i", s"e$n", true) + ",\n" +
          step(s"b$n${i - 1}", s"b$n$i", s"e$n", false)).mkString(",\n")
      s"""WITH ids AS (
         |  SELECT DISTINCT c_custkey % 400 AS id FROM customer
         |), e1 AS MATERIALIZED (
         |  SELECT id AS src,
         |    CASE WHEN id % 4 = 3 THEN id - 3 ELSE id + 1 END AS dst
         |  FROM ids
         |  UNION ALL SELECT id, id + 4 FROM ids WHERE id = 0
         |), n1 AS MATERIALIZED (
         |  SELECT src AS id FROM e1 UNION SELECT dst FROM e1
         |), f10 AS (SELECT id, id AS lbl FROM n1),
         |b10 AS (SELECT id, id AS lbl FROM n1),
         |${peel(1)},
         |a1 AS MATERIALIZED (
         |  SELECT f.id, f.lbl AS scc_id
         |  FROM f14 f JOIN b14 b ON b.id = f.id AND b.lbl = f.lbl
         |), e2 AS MATERIALIZED (
         |  SELECT src, dst FROM e1
         |  WHERE src NOT IN (SELECT id FROM a1)
         |    AND dst NOT IN (SELECT id FROM a1)
         |), n2 AS MATERIALIZED (
         |  SELECT id FROM n1 WHERE id NOT IN (SELECT id FROM a1)
         |), f20 AS (SELECT id, id AS lbl FROM n2),
         |b20 AS (SELECT id, id AS lbl FROM n2),
         |${peel(2)},
         |a2 AS (
         |  SELECT f.id, f.lbl AS scc_id
         |  FROM f24 f JOIN b24 b ON b.id = f.id AND b.lbl = f.lbl
         |)
         |SELECT id, scc_id FROM (
         |  SELECT * FROM a1 UNION ALL SELECT * FROM a2
         |) ORDER BY id""".stripMargin
    },
    // hits: 3 unrolled rounds; each half-round aggregates the opposite
    // score along the edges then L1-normalizes by the integer total —
    // v div greatest(1, total div Scale), exactly the Spark arithmetic
    "graph_hits" -> {
      val round = (i: Int) =>
        s"""araw$i AS (
           |  SELECT n.id, COALESCE(x.s, CAST(0 AS BIGINT)) AS raw
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS id, CAST(sum(h.r) AS BIGINT) AS s
           |    FROM e JOIN h${i - 1} h ON h.id = e.src GROUP BY 1
           |  ) x ON n.id = x.id
           |), at$i AS (
           |  SELECT greatest(CAST(1 AS BIGINT),
           |    CAST(sum(raw) AS BIGINT) // 1000000000000) AS t FROM araw$i
           |), a$i AS (
           |  SELECT id, raw // (SELECT t FROM at$i) AS r FROM araw$i
           |), hraw$i AS (
           |  SELECT n.id, COALESCE(x.s, CAST(0 AS BIGINT)) AS raw
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.src AS id, CAST(sum(a.r) AS BIGINT) AS s
           |    FROM e JOIN a$i a ON a.id = e.dst GROUP BY 1
           |  ) x ON n.id = x.id
           |), ht$i AS (
           |  SELECT greatest(CAST(1 AS BIGINT),
           |    CAST(sum(raw) AS BIGINT) // 1000000000000) AS t FROM hraw$i
           |), h$i AS (
           |  SELECT id, raw // (SELECT t FROM ht$i) AS r FROM hraw$i
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
         |), nodes AS (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), h0 AS (
         |  SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM nodes
         |), ${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT h3.id, h3.r AS hub_scaled, a3.r AS auth_scaled,
         |  CAST(h3.r AS DOUBLE) / 1000000000000.0 AS hub,
         |  CAST(a3.r AS DOUBLE) / 1000000000000.0 AS auth
         |FROM h3 JOIN a3 USING (id) ORDER BY id""".stripMargin
    },
    "graph_pagerank" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT n.id, 150000000000 + (85 * COALESCE(c.cin, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT ed.dst, CAST(SUM(p.r // ed.outdeg) AS BIGINT) AS cin
           |    FROM ed JOIN $prev p ON p.id = ed.src GROUP BY ed.dst
           |  ) c ON n.id = c.dst
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
         |), nodes AS (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), deg AS (
         |  SELECT src, count(*) AS outdeg FROM e GROUP BY 1
         |), ed AS (
         |  SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)
         |), r0 AS (
         |  SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM nodes
         |), ${round("r0", "r1")},
         |${round("r1", "r2")},
         |${round("r2", "r3")},
         |${round("r3", "r4")},
         |${round("r4", "r5")}
         |SELECT id, r AS rank_scaled,
         |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
         |FROM r5 ORDER BY id""".stripMargin
    },
    // incremental twin: phase-1 rounds over the held-out base graph
    // (own node/degree frames), then the warm seed COALESCEs new nodes
    // to Scale and phase-2 rounds run over the full frames — linear
    // lineage per phase, no MATERIALIZED needed (one ref per round)
    "graph_pagerank_incremental" -> {
      val round = (prev: String, cur: String, nodes: String, ed: String) =>
        s"""$cur AS (
           |  SELECT n.id, 150000000000 + (85 * COALESCE(c.cin, 0)) // 100 AS r
           |  FROM $nodes n LEFT JOIN (
           |    SELECT $ed.dst, CAST(SUM(p.r // $ed.outdeg) AS BIGINT) AS cin
           |    FROM $ed JOIN $prev p ON p.id = $ed.src GROUP BY $ed.dst
           |  ) c ON n.id = c.dst
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
         |), eb AS (
         |  SELECT src, dst FROM e WHERE src % 10 <> 0
         |), nodesb AS (
         |  SELECT src AS id FROM eb UNION SELECT dst FROM eb
         |), degb AS (
         |  SELECT src, count(*) AS outdeg FROM eb GROUP BY 1
         |), edb AS (
         |  SELECT eb.src, eb.dst, degb.outdeg FROM eb JOIN degb USING (src)
         |), b0 AS (
         |  SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM nodesb
         |), ${round("b0", "b1", "nodesb", "edb")},
         |${round("b1", "b2", "nodesb", "edb")},
         |${round("b2", "b3", "nodesb", "edb")},
         |nodes AS (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), deg AS (
         |  SELECT src, count(*) AS outdeg FROM e GROUP BY 1
         |), ed AS (
         |  SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)
         |), r0 AS (
         |  SELECT n.id, COALESCE(w.r, CAST(1000000000000 AS BIGINT)) AS r
         |  FROM nodes n LEFT JOIN b3 w ON w.id = n.id
         |), ${round("r0", "r1", "nodes", "ed")},
         |${round("r1", "r2", "nodes", "ed")}
         |SELECT id, r AS rank_scaled,
         |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
         |FROM r2 ORDER BY id""".stripMargin
    },
    // weighted pagerank twin: same unrolled rounds with the exact
    // overflow-free contribution w*(r//W) + ((r%W)*w)//W — identical
    // positive-operand floor semantics in both engines
    "graph_pagerank_weighted" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT n.id, 150000000000 + (85 * COALESCE(c.cin, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT ed.dst, CAST(SUM(ed.w * (p.r // ed.wout) +
           |      ((p.r % ed.wout) * ed.w) // ed.wout) AS BIGINT) AS cin
           |    FROM ed JOIN $prev p ON p.id = ed.src GROUP BY ed.dst
           |  ) c ON n.id = c.dst
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT l_orderkey AS src, l_partkey + 20000000 AS dst,
         |    CAST(count(*) AS BIGINT) AS w
         |  FROM lineitem GROUP BY 1, 2
         |), nodes AS (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), wo AS (
         |  SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e GROUP BY 1
         |), ed AS (
         |  SELECT e.src, e.dst, e.w, wo.wout FROM e JOIN wo USING (src)
         |), r0 AS (
         |  SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM nodes
         |), ${round("r0", "r1")},
         |${round("r1", "r2")},
         |${round("r2", "r3")},
         |${round("r3", "r4")},
         |${round("r4", "r5")}
         |SELECT id, r AS rank_scaled,
         |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
         |FROM r5 ORDER BY id""".stripMargin
    },
    // truss twin: unrolled peel rounds, id-ordered common-neighbor
    // support (support values are orientation-independent), final
    // status via a scalar emptiness check on the last drop set
    "graph_ktruss" -> {
      val round = (i: Int) => {
        val (e, u, sp, d, en) = (s"e$i", s"u$i", s"s$i", s"d$i", s"e${i + 1}")
        s"""$u AS MATERIALIZED (
           |  SELECT lo AS a, hi AS b FROM $e
           |  UNION ALL SELECT hi, lo FROM $e
           |), $sp AS MATERIALIZED (
           |  SELECT e.lo, e.hi, count(*) AS s FROM $e e
           |  JOIN $u x ON x.a = e.lo
           |  JOIN $u y ON y.a = e.hi AND y.b = x.b
           |  GROUP BY e.lo, e.hi
           |), $d AS MATERIALIZED (
           |  SELECT e.lo, e.hi FROM $e e
           |  LEFT JOIN $sp s ON s.lo = e.lo AND s.hi = e.hi
           |  WHERE coalesce(s.s, 0) < 2
           |), $en AS MATERIALIZED (
           |  SELECT e.lo, e.hi FROM $e e
           |  WHERE NOT EXISTS (
           |    SELECT 1 FROM $d d WHERE d.lo = e.lo AND d.hi = e.hi)
           |)""".stripMargin
      }
      s"""WITH pairs AS (
         |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
         |  WHERE l_partkey % 4 = 0
         |), sized AS (
         |  SELECT g, item FROM (
         |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz
         |    FROM pairs) z
         |  WHERE gsz <= 100
         |), e0 AS (
         |  SELECT DISTINCT l.item AS lo, r.item AS hi
         |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
         |),
         |${round(0)},
         |${round(1)},
         |${round(2)}
         |SELECT lo, hi, status FROM (
         |  SELECT lo, hi, 'removed_1' AS status FROM d0
         |  UNION ALL SELECT lo, hi, 'removed_2' FROM d1
         |  UNION ALL SELECT lo, hi, 'removed_3' FROM d2
         |  UNION ALL SELECT lo, hi,
         |    CASE WHEN (SELECT count(*) FROM d2) = 0
         |      THEN 'truss' ELSE 'candidate' END
         |  FROM e3
         |) z ORDER BY lo, hi""".stripMargin
    },
    // conductance twin: the triangles pairs CTE + label stamps,
    // single-emit internal / both-endpoint cut folds, one-row volume
    "graph_conductance" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
        |  WHERE l_partkey % 4 = 0
        |), sized AS (
        |  SELECT g, item FROM (
        |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz FROM pairs)
        |  WHERE gsz <= 100
        |), e AS (
        |  SELECT DISTINCT l.item AS a, r.item AS b
        |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
        |), lab AS (
        |  SELECT p_partkey AS id, p_brand AS c FROM part
        |), st AS MATERIALIZED (
        |  SELECT la.c AS ca, lb.c AS cb
        |  FROM e JOIN lab la ON la.id = e.a JOIN lab lb ON lb.id = e.b
        |), perc AS (
        |  SELECT c, CAST(sum(internal) AS BIGINT) AS internal,
        |    CAST(sum(cut) AS BIGINT) AS cut
        |  FROM (
        |    SELECT ca AS c,
        |      CASE WHEN ca = cb THEN 1 ELSE 0 END AS internal,
        |      CASE WHEN ca <> cb THEN 1 ELSE 0 END AS cut
        |    FROM st
        |    UNION ALL
        |    SELECT cb AS c, 0 AS internal, 1 AS cut FROM st
        |    WHERE ca <> cb)
        |  GROUP BY 1
        |), nn AS (
        |  SELECT lab.c, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM (SELECT a AS id FROM e UNION SELECT b FROM e) nd
        |  JOIN lab ON lab.id = nd.id GROUP BY 1
        |), tot AS (
        |  SELECT CAST(count(*) * 2 AS BIGINT) AS total_vol FROM st
        |)
        |SELECT nn.c AS c, nn.n_nodes, p.internal, p.cut,
        |  2 * p.internal + p.cut AS vol,
        |  1000000 * p.cut // greatest(least(2 * p.internal + p.cut,
        |    tot.total_vol - (2 * p.internal + p.cut)), 1) AS phi_ppm
        |FROM nn JOIN perc p ON p.c = nn.c CROSS JOIN tot
        |ORDER BY c""".stripMargin,
    // seq3 twin: identical double-lead window, HAVING support, pinned
    // rank over the bounded triple frame
    "events_seq3" ->
      """WITH o AS (
        |  SELECT event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), tri AS (
        |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
        |  FROM o WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 5
        |)
        |SELECT rank, t1, t2, t3, n FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY n DESC, t1, t2, t3)
        |    AS BIGINT) AS rank, t1, t2, t3, n
        |  FROM tri)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // drift twin: identical floored cells, positive-offset means,
    // (adiff, d) DESC argmax
    "embed_drift" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings
        |), cells AS (
        |  SELECT g.d AS d, vec_id % 2 = 0 AS old,
        |    CAST(floor(e[g.d] * CAST('1e6' AS DOUBLE)) AS BIGINT) AS cell
        |  FROM emb CROSS JOIN generate_series(1, 64) AS g(d)
        |), pd AS MATERIALIZED (
        |  SELECT d, abs(
        |    ((sum(CASE WHEN NOT old THEN cell ELSE 0 END)
        |      + 10000000 * sum(CASE WHEN NOT old THEN 1 ELSE 0 END))
        |      // sum(CASE WHEN NOT old THEN 1 ELSE 0 END) - 10000000)
        |    - ((sum(CASE WHEN old THEN cell ELSE 0 END)
        |      + 10000000 * sum(CASE WHEN old THEN 1 ELSE 0 END))
        |      // sum(CASE WHEN old THEN 1 ELSE 0 END) - 10000000))
        |    AS adiff
        |  FROM cells GROUP BY 1
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_dims,
        |  CAST(sum(adiff) AS BIGINT) AS l1_drift_scaled,
        |  CAST(max(adiff) AS BIGINT) AS max_dim_drift,
        |  CAST((SELECT d FROM pd ORDER BY adiff DESC, d DESC LIMIT 1)
        |    AS BIGINT) AS worst_dim
        |FROM pd""".stripMargin,
    "graph_triangles" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
        |  WHERE l_partkey % 4 = 0
        |), sized AS (
        |  SELECT g, item FROM (
        |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz FROM pairs)
        |  WHERE gsz <= 100
        |), e AS (
        |  SELECT DISTINCT l.item AS a, r.item AS b
        |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
        |), tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |  SELECT x AS id FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri
        |) GROUP BY id ORDER BY id""".stripMargin,
    // clustering twin: id-ordered triangle enumeration (the set is
    // orientation-independent) + canonical degrees + integer ppm close
    "graph_clustering" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
        |  WHERE l_partkey % 4 = 0
        |), sized AS (
        |  SELECT g, item FROM (
        |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz FROM pairs)
        |  WHERE gsz <= 100
        |), e AS MATERIALIZED (
        |  SELECT DISTINCT l.item AS a, r.item AS b
        |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
        |), deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1
        |), tri AS MATERIALIZED (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |), tc AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |    SELECT x AS id FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri) GROUP BY 1
        |)
        |SELECT d.id, d.deg,
        |  COALESCE(tc.n_triangles, 0) AS n_triangles,
        |  CAST(CASE WHEN d.deg >= 2 THEN 2000000 *
        |    COALESCE(tc.n_triangles, 0) // (d.deg * (d.deg - 1))
        |    ELSE 0 END AS BIGINT) AS cc_ppm
        |FROM deg d LEFT JOIN tc ON tc.id = d.id
        |ORDER BY d.id""".stripMargin,
    // join-guard twin: identical key-count join + deterministic top-k
    // joinOrderCard twin: the same Σ cnt·cnt folds over key-count
    // frames, smaller intermediate recommended
    "join_plan_card" ->
      """WITH ca AS (
        |  SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1
        |), ob1 AS (
        |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1
        |), ob2 AS (
        |  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1
        |), lc AS (
        |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1
        |), ab AS (
        |  SELECT CAST(sum(CAST(ca.n AS HUGEINT) * ob1.n) AS BIGINT)
        |    AS ab_rows
        |  FROM ca JOIN ob1 ON ca.k = ob1.k
        |), bc AS (
        |  SELECT CAST(sum(CAST(ob2.n AS HUGEINT) * lc.n) AS BIGINT)
        |    AS bc_rows
        |  FROM ob2 JOIN lc ON ob2.k = lc.k
        |)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_a,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_b,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_c,
        |  ab.ab_rows, bc.bc_rows,
        |  CASE WHEN ab.ab_rows <= bc.bc_rows THEN 'ab_first'
        |    ELSE 'bc_first' END AS recommended
        |FROM ab, bc""".stripMargin,
    // adjusted-ATE twin: identical stratum cells, both-arms filter,
    // positive-offset weighted combine
    "events_ate_adjusted" ->
      """WITH cells AS (
        |  SELECT event_type AS stratum,
        |    CAST(count(*) AS BIGINT) AS n_s,
        |    CAST(sum(CASE WHEN CAST('0x' ||
        |      substr(md5(CAST(user_id AS VARCHAR)), 1, 1) AS BIGINT) < 8
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN CAST('0x' ||
        |      substr(md5(CAST(user_id AS VARCHAR)), 1, 1) AS BIGINT) < 8
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS sum_t,
        |    CAST(sum(CASE WHEN CAST('0x' ||
        |      substr(md5(CAST(user_id AS VARCHAR)), 1, 1) AS BIGINT) >= 8
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS sum_c
        |  FROM events GROUP BY 1
        |), used AS (
        |  SELECT n_s,
        |    1000000 * sum_t // n_t - 1000000 * sum_c // (n_s - n_t)
        |      AS diff_ppm
        |  FROM cells WHERE n_t > 0 AND n_s - n_t > 0
        |)
        |SELECT CAST(sum(n_s) AS BIGINT) AS n_used,
        |  CAST(count(*) AS BIGINT) AS n_strata,
        |  CAST((sum(n_s * diff_ppm) + 100000000000 * sum(n_s))
        |    // sum(n_s) - 100000000000 AS BIGINT) AS ate_ppm_cents
        |FROM used""".stripMargin,
    // t-closeness twin: densified per-class cumulative shares vs the
    // global distribution, closed-form ordered EMD
    "privacy_tcloseness" ->
      """WITH src AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
        |      AS qid,
        |    greatest(0, least(9, CAST(floor((c_acctbal + 1000.0)
        |      / 1100.0) AS BIGINT))) AS b
        |  FROM customer
        |), cells AS (
        |  SELECT qid, b, CAST(count(*) AS BIGINT) AS n
        |  FROM src GROUP BY 1, 2
        |), dense AS (
        |  SELECT q.qid, g.b, coalesce(c.n, 0) AS n
        |  FROM (SELECT DISTINCT qid FROM cells) q
        |  CROSS JOIN (SELECT unnest(range(0, 10)) AS b) g
        |  LEFT JOIN cells c ON c.qid = q.qid AND c.b = g.b
        |), bc AS (
        |  SELECT qid, b,
        |    CAST(sum(n) OVER (PARTITION BY qid) AS BIGINT) AS n_class,
        |    CAST(sum(n) OVER (PARTITION BY qid ORDER BY b
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM dense
        |), byc AS (
        |  SELECT qid, b, n_class,
        |    1000000 * cum // n_class AS cum_ppm
        |  FROM bc
        |), gt AS (SELECT CAST(count(*) AS BIGINT) AS gt FROM src),
        |gcd AS (
        |  SELECT g.b,
        |    1000000 * CAST(sum(coalesce(gn.gn, 0)) OVER (ORDER BY g.b
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) // gt.gt AS gcum_ppm
        |  FROM (SELECT unnest(range(0, 10)) AS b) g
        |  LEFT JOIN (SELECT b, CAST(count(*) AS BIGINT) AS gn
        |    FROM src GROUP BY 1) gn ON gn.b = g.b
        |  CROSS JOIN gt
        |)
        |SELECT byc.qid, max(byc.n_class) AS class_size,
        |  CAST(sum(abs(byc.cum_ppm - gcd.gcum_ppm)) // 9 AS BIGINT)
        |    AS emd_ppm,
        |  CAST(sum(abs(byc.cum_ppm - gcd.gcum_ppm)) // 9 AS BIGINT)
        |    > 150000 AS breaches_t
        |FROM byc JOIN gcd ON gcd.b = byc.b
        |GROUP BY 1 ORDER BY qid""".stripMargin,
    // didCard twin: identical md5 split, pivot-day period, four
    // truncating ppm-cent means, integer contrast
    "events_did" ->
      """WITH cells AS (
        |  SELECT
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |      1, 1) AS BIGINT) < 8 THEN 'T' ELSE 'C' END AS grp,
        |    CASE WHEN epoch_us(ts) // 86400000000 >= 19738
        |      THEN 'post' ELSE 'pre' END AS period,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), agg AS (
        |  SELECT grp, period, CAST(count(*) AS BIGINT) AS n,
        |    1000000 * CAST(sum(cents) AS BIGINT)
        |      // CAST(count(*) AS BIGINT) AS mean_ppm
        |  FROM cells GROUP BY 1, 2
        |)
        |SELECT CAST(sum(n) AS BIGINT) AS n_obs,
        |  CAST(sum(CASE WHEN grp = 'T' AND period = 'pre'
        |    THEN mean_ppm ELSE 0 END) AS BIGINT) AS t_pre,
        |  CAST(sum(CASE WHEN grp = 'T' AND period = 'post'
        |    THEN mean_ppm ELSE 0 END) AS BIGINT) AS t_post,
        |  CAST(sum(CASE WHEN grp = 'C' AND period = 'pre'
        |    THEN mean_ppm ELSE 0 END) AS BIGINT) AS c_pre,
        |  CAST(sum(CASE WHEN grp = 'C' AND period = 'post'
        |    THEN mean_ppm ELSE 0 END) AS BIGINT) AS c_post,
        |  CAST((sum(CASE WHEN grp = 'T' AND period = 'post'
        |      THEN mean_ppm ELSE 0 END)
        |    - sum(CASE WHEN grp = 'T' AND period = 'pre'
        |      THEN mean_ppm ELSE 0 END))
        |  - (sum(CASE WHEN grp = 'C' AND period = 'post'
        |      THEN mean_ppm ELSE 0 END)
        |    - sum(CASE WHEN grp = 'C' AND period = 'pre'
        |      THEN mean_ppm ELSE 0 END)) AS BIGINT) AS did_ppm_cents
        |FROM agg""".stripMargin,
    "join_guard" ->
      """WITH la AS (
        |  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n_left
        |  FROM lineitem GROUP BY 1
        |), ra AS (
        |  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n_right
        |  FROM lineitem GROUP BY 1
        |), j AS MATERIALIZED (
        |  SELECT la.k, la.n_left, ra.n_right,
        |    la.n_left * ra.n_right AS contrib
        |  FROM la JOIN ra ON ra.k = la.k
        |), top AS (
        |  SELECT 'key' AS kind, k, n_left, n_right, contrib
        |  FROM j ORDER BY contrib DESC, k LIMIT 10
        |), tot AS (
        |  SELECT 'total' AS kind, CAST(NULL AS BIGINT) AS k,
        |    CAST(sum(n_left) AS BIGINT) AS n_left,
        |    CAST(sum(n_right) AS BIGINT) AS n_right,
        |    CAST(sum(contrib) AS BIGINT) AS contrib
        |  FROM j
        |)
        |SELECT * FROM top UNION ALL SELECT * FROM tot
        |ORDER BY kind, k""".stripMargin,
    // q21 twin: identical decorrelation — per-(order, supplier) any-late
    // cells, per-order counts, plain-filter blame predicate
    "q21_blame" ->
      """WITH cells AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    CAST(max(CASE WHEN epoch_us(l.l_shipdate) // 86400000000
        |      - epoch_us(o.o_orderdate) // 86400000000 > 90
        |      THEN 1 ELSE 0 END) AS BIGINT) AS supp_late
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2
        |), per_order AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
        |    CAST(sum(supp_late) AS BIGINT) AS n_late
        |  FROM cells GROUP BY 1
        |)
        |SELECT c.l_suppkey, CAST(count(*) AS BIGINT) AS n_blamed_orders
        |FROM cells c JOIN per_order p ON p.l_orderkey = c.l_orderkey
        |WHERE c.supp_late = 1 AND p.n_supp >= 2 AND p.n_late = 1
        |GROUP BY 1 ORDER BY n_blamed_orders DESC, l_suppkey
        |LIMIT 50""".stripMargin,
    // cuped twin: same midpoint split, md5 variant, HUGEINT moments,
    // sign-split floor divisions for θ and every mean
    "events_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), span AS (
        |  SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev
        |), pu AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN day < mid THEN cents ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN day >= mid THEN cents ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM ev CROSS JOIN span GROUP BY 1
        |), v AS (
        |  SELECT x, y,
        |    CASE WHEN CAST('0x' ||
        |      substr(md5(CAST(user_id AS VARCHAR)), 1, 1) AS BIGINT) < 8
        |      THEN 'A' ELSE 'B' END AS variant
        |  FROM pu
        |), mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
        |  FROM v
        |), th AS (
        |  SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0
        |    WHEN n * sxy - sx * sy >= 0
        |      THEN CAST((n * sxy - sx * sy) * 1000000
        |        // (n * sxx - sx * sx) AS BIGINT)
        |    ELSE -CAST((-(n * sxy - sx * sy)) * 1000000
        |      // (n * sxx - sx * sx) AS BIGINT)
        |    END AS theta_ppm
        |  FROM mom
        |), adj AS (
        |  SELECT variant, 1000000 * y - theta_ppm * x AS adj_e6, y
        |  FROM v CROSS JOIN th
        |), w AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    sum(CASE WHEN variant = 'A' THEN adj_e6 ELSE 0 END)
        |      AS s_adj_a,
        |    sum(CASE WHEN variant = 'B' THEN adj_e6 ELSE 0 END)
        |      AS s_adj_b,
        |    CAST(sum(CASE WHEN variant = 'A' THEN y ELSE 0 END)
        |      AS BIGINT) AS s_y_a,
        |    CAST(sum(CASE WHEN variant = 'B' THEN y ELSE 0 END)
        |      AS BIGINT) AS s_y_b
        |  FROM adj
        |), m AS (
        |  SELECT th.theta_ppm, w.n_a, w.n_b,
        |    CASE WHEN w.n_a = 0 THEN NULL
        |      WHEN w.s_adj_a >= 0 THEN CAST(w.s_adj_a // w.n_a AS BIGINT)
        |      ELSE -CAST((-w.s_adj_a) // w.n_a AS BIGINT)
        |      END AS mean_adj_a_e6,
        |    CASE WHEN w.n_b = 0 THEN NULL
        |      WHEN w.s_adj_b >= 0 THEN CAST(w.s_adj_b // w.n_b AS BIGINT)
        |      ELSE -CAST((-w.s_adj_b) // w.n_b AS BIGINT)
        |      END AS mean_adj_b_e6,
        |    CASE WHEN w.n_a = 0 THEN NULL
        |      ELSE CAST(w.s_y_a // w.n_a AS BIGINT) END AS mean_y_a_c,
        |    CASE WHEN w.n_b = 0 THEN NULL
        |      ELSE CAST(w.s_y_b // w.n_b AS BIGINT) END AS mean_y_b_c
        |  FROM w CROSS JOIN th
        |)
        |SELECT theta_ppm, n_a, n_b, mean_adj_a_e6, mean_adj_b_e6,
        |  mean_adj_a_e6 - mean_adj_b_e6 AS adj_lift_e6,
        |  mean_y_a_c, mean_y_b_c,
        |  mean_y_a_c - mean_y_b_c AS raw_lift_c
        |FROM m""".stripMargin,
    // concurrency twin: identical +1/−1 boundary sweep with the same
    // pinned unique ordering and explicit ROWS frame
    "events_concurrency" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(min(epoch_us(ts)) AS BIGINT) AS s,
        |    CAST(max(epoch_us(ts)) AS BIGINT) AS e
        |  FROM events GROUP BY 1, 2
        |), b AS (
        |  SELECT day, s AS t, CAST(1 AS BIGINT) AS delta, user_id FROM iv
        |  UNION ALL
        |  SELECT day, e + 1 AS t, CAST(-1 AS BIGINT) AS delta, user_id
        |  FROM iv
        |), r AS (
        |  SELECT day, t,
        |    sum(delta) OVER (PARTITION BY day
        |      ORDER BY t ASC, delta DESC, user_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM b
        |), p AS (
        |  SELECT day, t, running,
        |    max(running) OVER (PARTITION BY day) AS peak
        |  FROM r
        |)
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(max(peak) AS BIGINT) AS peak_concurrent,
        |  CAST(min(t) AS BIGINT) AS peak_at_us
        |FROM p WHERE running = peak GROUP BY 1 ORDER BY 1""".stripMargin,
    // benford twin: same cents integerization, first-digit ladder, and
    // ppm integer shares; expected ppm from the shared integer constants
    "dq_benford" -> {
      val ladder = (1 to 16).map { k =>
        val b = math.pow(10, k).toLong
        s"WHEN cents < $b THEN cents // ${b / 10}"
      }.mkString("CASE ", " ", " END")
      val expCase = graft.ops.Quality.benfordPpm.zipWithIndex
        .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }
        .mkString("CASE digit ", " ", " END")
      s"""WITH v AS (
         |  SELECT abs(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT)) AS cents
         |  FROM orders
         |), d AS (
         |  SELECT $ladder AS digit FROM v WHERE cents > 0
         |), g AS (
         |  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1
         |), t AS (
         |  SELECT digit, n_obs,
         |    CAST(sum(n_obs) OVER () AS BIGINT) AS total
         |  FROM g
         |)
         |SELECT CAST(digit AS BIGINT) AS digit, n_obs,
         |  CAST(1000000 * n_obs // total AS BIGINT) AS obs_ppm,
         |  CAST($expCase AS BIGINT) AS exp_ppm,
         |  CAST(1000000 * n_obs // total - $expCase AS BIGINT) AS dev_ppm
         |FROM t ORDER BY digit""".stripMargin
    },
    // phrase twin: 1-indexed positions via the correlated UNNEST(range)
    // recipe; adjacency as position arithmetic on the join
    "search_phrase" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS a
        |  FROM documents
        |), pos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, a[i] AS tok
        |  FROM toks, UNNEST(range(1, len(a) + 1)) AS u(i)
        |  WHERE a[i] IN ('table', 'hash')
        |)
        |SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_matches
        |FROM pos x JOIN pos y
        |  ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
        |WHERE x.tok = 'table' AND y.tok = 'hash'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // gazetteerMatch twin: 1-based list-slice window equality per
    // first-token hit (Spark posexplode is 0-based; slice starts align
    // at pos+1 == p.pos), LEFT JOIN keeps zero-hit dictionary rows
    "text_gazetteer" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents
        |), dict AS (
        |  SELECT * FROM (VALUES
        |    ('hash join', ['hash', 'join'], 2),
        |    ('table scan', ['table', 'scan'], 2),
        |    ('sort merge join', ['sort', 'merge', 'join'], 3),
        |    ('spark window', ['spark', 'window'], 2),
        |    ('query plan', ['query', 'plan'], 2)
        |  ) AS v(phrase, ptoks, plen)
        |), pos AS (
        |  SELECT doc_id, t, CAST(i AS BIGINT) AS pos
        |  FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
        |), hits AS (
        |  SELECT d.phrase AS phrase, p.doc_id AS doc_id
        |  FROM pos p JOIN dict d ON p.t[p.pos] = d.ptoks[1]
        |  WHERE p.pos + d.plen - 1 <= len(p.t)
        |    AND p.t[p.pos : p.pos + d.plen - 1] = d.ptoks
        |), agg AS (
        |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_matches,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
        |  FROM hits GROUP BY 1
        |)
        |SELECT d.phrase AS phrase, CAST(d.plen AS BIGINT) AS plen,
        |  COALESCE(a.n_matches, 0) AS n_matches,
        |  COALESCE(a.nd, 0) AS n_docs
        |FROM dict d LEFT JOIN agg a ON a.phrase = d.phrase
        |ORDER BY phrase""".stripMargin,
    // q13 twin: same decorrelated form — per-customer counts first,
    // then the outer join and the distribution rollup
    "q13_custdist" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1
        |)
        |SELECT CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS c_count,
        |  CAST(count(*) AS BIGINT) AS custdist
        |FROM customer c LEFT JOIN per p ON p.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // q22 twin: integer cross-multiply vs the one-row positive-balance
    // moments; NOT EXISTS on the recent-order set
    "q22_idle" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
        |  FROM customer
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pos,
        |    CAST(sum(bal_c) AS BIGINT) AS sum_pos
        |  FROM c WHERE bal_c > 0
        |), recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE epoch_us(o_orderdate) // 86400000000 >=
        |    epoch_us(TIMESTAMP '2001-01-01') // 86400000000
        |)
        |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(c.bal_c) AS BIGINT) AS total_bal_c
        |FROM c CROSS JOIN g
        |WHERE c.bal_c * g.n_pos > g.sum_pos
        |  AND NOT EXISTS (SELECT 1 FROM recent r
        |    WHERE r.o_custkey = c.c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q15 twin: identical exact-e4 revenue view, scalar MAX subquery
    "q15_top_supplier" ->
      """WITH per AS MATERIALIZED (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |        AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(9,2)) * 100
        |        AS BIGINT))) AS BIGINT) AS total_rev_e4
        |  FROM lineitem
        |  WHERE epoch_us(l_shipdate) // 86400000000 >=
        |      epoch_us(TIMESTAMP '1996-01-01') // 86400000000
        |    AND epoch_us(l_shipdate) // 86400000000 <
        |      epoch_us(TIMESTAMP '1996-04-01') // 86400000000
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name, p.total_rev_e4
        |FROM per p JOIN supplier s ON s.s_suppkey = p.l_suppkey
        |WHERE p.total_rev_e4 = (SELECT max(total_rev_e4) FROM per)
        |ORDER BY s_suppkey""".stripMargin,
    // q14 twin: same one-pass conditional aggregation + exact ppm share
    "q14_promo" ->
      """WITH l AS (
        |  SELECT l_partkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(9,2)) * 100
        |        AS BIGINT)) AS rev
        |  FROM lineitem
        |  WHERE epoch_us(l_shipdate) // 86400000000 >=
        |      epoch_us(TIMESTAMP '1996-03-01') // 86400000000
        |    AND epoch_us(l_shipdate) // 86400000000 <
        |      epoch_us(TIMESTAMP '1996-04-01') // 86400000000
        |)
        |SELECT
        |  CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN l.rev ELSE 0 END)
        |    AS BIGINT) AS promo_rev_e4,
        |  CAST(sum(l.rev) AS BIGINT) AS total_rev_e4,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(1000000 * sum(CASE WHEN p.p_type = 'PROMO' THEN l.rev
        |    ELSE 0 END) // sum(l.rev) AS BIGINT) AS promo_ppm
        |FROM l JOIN part p ON p.p_partkey = l.l_partkey""".stripMargin,
    // q10 twin: identical scan-side filters, dims joined after the
    // orderkey join, deterministic top-k tie-break
    "q10_returns" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey FROM orders
        |  WHERE epoch_us(o_orderdate) // 86400000000 >=
        |      epoch_us(TIMESTAMP '1996-01-01') // 86400000000
        |    AND epoch_us(o_orderdate) // 86400000000 <
        |      epoch_us(TIMESTAMP '1996-04-01') // 86400000000
        |)
        |SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)
        |    * (100 - CAST(CAST(l_discount AS DECIMAL(9,2)) * 100
        |      AS BIGINT))) AS BIGINT) AS lost_rev_e4,
        |  CAST(count(*) AS BIGINT) AS n_returns
        |FROM lineitem l
        |JOIN o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY lost_rev_e4 DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // q19 twin: the raw OR-of-ANDs — the envelope the Spark side pushes
    // is semantically implied, so both forms agree
    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)
        |    * (100 - CAST(CAST(l_discount AS DECIMAL(9,2)) * 100
        |      AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // q4 twin: the literal EXISTS form — DuckDB plans the same semi join
    "q4_semi" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE epoch_us(o_orderdate) // 86400000000 >=
        |    epoch_us(TIMESTAMP '1996-01-01') // 86400000000
        |  AND epoch_us(o_orderdate) // 86400000000 <
        |    epoch_us(TIMESTAMP '1996-04-01') // 86400000000
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // diameter twin: two chained bounded recursive walks; both argmax
    // elections pinned by (dist DESC, id) LIMIT 1
    "graph_diameter" ->
      """WITH RECURSIVE e AS (
        |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst
        |  FROM orders
        |), u AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION ALL SELECT dst, src FROM e
        |), seed AS (
        |  SELECT min(n) AS id FROM (
        |    SELECT src AS n FROM e UNION ALL SELECT dst FROM e) t
        |), walk1(id, d) AS (
        |  SELECT id, 0 FROM seed
        |  UNION
        |  SELECT u.v, w.d + 1 FROM walk1 w JOIN u ON u.u = w.id
        |  WHERE w.d < 4
        |), dist1 AS MATERIALIZED (
        |  SELECT id, min(d) AS dist FROM walk1 GROUP BY 1
        |), far1 AS (
        |  SELECT id FROM dist1 ORDER BY dist DESC, id LIMIT 1
        |), walk2(id, d) AS (
        |  SELECT id, 0 FROM far1
        |  UNION
        |  SELECT u.v, w.d + 1 FROM walk2 w JOIN u ON u.u = w.id
        |  WHERE w.d < 4
        |), dist2 AS MATERIALIZED (
        |  SELECT id, min(d) AS dist FROM walk2 GROUP BY 1
        |), far2 AS (
        |  SELECT id, dist FROM dist2 ORDER BY dist DESC, id LIMIT 1
        |)
        |SELECT (SELECT id FROM seed) AS seed_id,
        |  (SELECT id FROM far1) AS u_id,
        |  (SELECT id FROM far2) AS v_id,
        |  CAST((SELECT dist FROM far2) AS BIGINT) AS diameter_lb,
        |  (SELECT CAST(count(*) AS BIGINT) FROM dist2) AS n_reached_u"""
        .stripMargin,
    // q7 twin: nation-filtered dim CTEs, the same direction disjunction
    "q7_volume" ->
      """WITH supp AS (
        |  SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  WHERE n.n_name IN ('NATION_1', 'NATION_2')
        |), cust AS (
        |  SELECT c_custkey, n_name AS cust_nation
        |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  WHERE n.n_name IN ('NATION_1', 'NATION_2')
        |)
        |SELECT supp.supp_nation, cust.cust_nation,
        |  CAST(year(CAST(l.l_shipdate AS TIMESTAMP)) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)
        |    * (100 - CAST(CAST(l_discount AS DECIMAL(9,2)) * 100
        |      AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |JOIN supp ON supp.s_suppkey = l.l_suppkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN cust ON cust.c_custkey = o.o_custkey
        |WHERE supp.supp_nation <> cust.cust_nation
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // q8 twin: one conditional aggregation over the star, exact ppm
    "q8_share" ->
      """WITH pt AS (
        |  SELECT p_partkey FROM part WHERE p_type = 'PROMO'
        |), supp AS (
        |  SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |), cust AS (
        |  SELECT c_custkey
        |  FROM customer c
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  WHERE r.r_name = 'EUROPE'
        |), j AS (
        |  SELECT year(CAST(o.o_orderdate AS TIMESTAMP)) AS o_year,
        |    supp.supp_nation,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(9,2)) * 100
        |        AS BIGINT)) AS rev
        |  FROM lineitem l
        |  JOIN pt ON pt.p_partkey = l.l_partkey
        |  JOIN supp ON supp.s_suppkey = l.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN cust ON cust.c_custkey = o.o_custkey
        |)
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)
        |    AS BIGINT) AS nation_rev_e4,
        |  CAST(sum(rev) AS BIGINT) AS total_rev_e4,
        |  CAST(1000000 * sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
        |    ELSE 0 END) // sum(rev) AS BIGINT) AS share_ppm
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // auc twin: identical per-score compression + rank-sum identity
    "eval_auc" ->
      """WITH pers AS (
        |  SELECT n_chars AS s,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p_s,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_s
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT p_s, n_s,
        |    COALESCE(sum(n_s) OVER (ORDER BY s ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS neg_below
        |  FROM pers
        |)
        |SELECT CAST(sum(p_s) AS BIGINT) AS n_pos,
        |  CAST(sum(n_s) AS BIGINT) AS n_neg,
        |  CAST(count(*) AS BIGINT) AS n_scores,
        |  CAST(sum(p_s * (2 * neg_below + n_s)) * 1000000
        |    // (2 * sum(p_s) * sum(n_s)) AS BIGINT) AS auc_ppm
        |FROM w""".stripMargin,
    // confusion twin: one conditional aggregation, guarded ppm divisions
    "eval_confusion" ->
      """WITH t AS (
        |  SELECT
        |    CAST(sum(CASE WHEN lang = 'en' AND n_chars >= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars >= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN lang = 'en' AND n_chars < 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars < 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM documents
        |)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN tp + fp = 0 THEN NULL
        |    ELSE CAST(1000000 * tp // (tp + fp) AS BIGINT)
        |    END AS precision_ppm,
        |  CASE WHEN tp + fn = 0 THEN NULL
        |    ELSE CAST(1000000 * tp // (tp + fn) AS BIGINT)
        |    END AS recall_ppm,
        |  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
        |    ELSE CAST(1000000 * 2 * tp // (2 * tp + fp + fn) AS BIGINT)
        |    END AS f1_ppm,
        |  CAST(1000000 * (tp + tn) // (tp + fp + fn + tn) AS BIGINT)
        |    AS accuracy_ppm
        |FROM t""".stripMargin,
    // grouped-auc twin: every window partitioned by source
    "eval_auc_by_source" ->
      """WITH pers AS (
        |  SELECT source AS g, n_chars AS s,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p_s,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_s
        |  FROM documents GROUP BY 1, 2
        |), w AS (
        |  SELECT g, p_s, n_s,
        |    COALESCE(sum(n_s) OVER (PARTITION BY g ORDER BY s ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS neg_below
        |  FROM pers
        |)
        |SELECT g AS source, CAST(sum(p_s) AS BIGINT) AS n_pos,
        |  CAST(sum(n_s) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(p_s) = 0 OR sum(n_s) = 0 THEN NULL
        |    ELSE CAST(sum(p_s * (2 * neg_below + n_s)) * 1000000
        |      // (2 * sum(p_s) * sum(n_s)) AS BIGINT) END AS auc_ppm
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // calibration twin: identical one-row span + integer bin id
    "eval_calibration" ->
      """WITH src AS (
        |  SELECT n_chars AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), span AS (
        |  SELECT CAST(min(s) AS BIGINT) AS s_min,
        |    CAST(max(s) AS BIGINT) AS s_max
        |  FROM src
        |), b AS (
        |  SELECT (s - s_min) * 10 // (s_max - s_min + 1) AS bin, s, y
        |  FROM src CROSS JOIN span
        |)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  CAST(1000000 * sum(y) // count(*) AS BIGINT) AS pos_rate_ppm,
        |  CAST(sum(s) // count(*) AS BIGINT) AS mean_score,
        |  CAST(min(s) AS BIGINT) AS s_lo, CAST(max(s) AS BIGINT) AS s_hi
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // prCurve twin: same bins, descending cumulative TP/pred-positive,
    // one-row positive total, exact ppm divisions
    // brier twin: HUGEINT squares == the Spark DECIMAL(38,0) sums;
    // identical min-max ppm map, bins, and truncating divisions
    "eval_brier" ->
      """WITH src AS (
        |  SELECT n_chars AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), span AS (
        |  SELECT min(s) AS s_min, max(s) AS s_max FROM src
        |), scored AS (
        |  SELECT 1000000 * (s - s_min) // (s_max - s_min + 1) AS p_ppm, y
        |  FROM src, span
        |), bins AS MATERIALIZED (
        |  SELECT p_ppm * 10 // 1000000 AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(p_ppm) AS BIGINT) AS p_sum,
        |    CAST(sum(CAST(p_ppm - 1000000 * y AS HUGEINT)
        |      * (p_ppm - 1000000 * y)) AS HUGEINT) AS se
        |  FROM scored GROUP BY 1
        |), bm AS (
        |  SELECT bin, n, n_pos, se, p_sum // n AS p_bar,
        |    1000000 * n_pos // n AS o_bar
        |  FROM bins
        |), t2 AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_total,
        |    CAST(sum(se) AS HUGEINT) AS se_total,
        |    1000000 * CAST(sum(n_pos) AS BIGINT)
        |      // CAST(sum(n) AS BIGINT) AS o_ppm
        |  FROM bm
        |)
        |SELECT t2.n_total AS n, t2.o_ppm AS base_rate_ppm,
        |  CAST(t2.se_total // t2.n_total AS BIGINT) AS brier_ppm2,
        |  CAST(sum(CAST(bm.n AS HUGEINT) * (bm.p_bar - bm.o_bar)
        |    * (bm.p_bar - bm.o_bar)) // t2.n_total AS BIGINT) AS rel_ppm2,
        |  CAST(sum(CAST(bm.n AS HUGEINT) * (bm.o_bar - t2.o_ppm)
        |    * (bm.o_bar - t2.o_ppm)) // t2.n_total AS BIGINT) AS res_ppm2,
        |  t2.o_ppm * (1000000 - t2.o_ppm) AS unc_ppm2
        |FROM bm, t2
        |GROUP BY 1, 2, 3, 6""".stripMargin,
    // richClub twin: identical canonical edges, FILTER threshold
    // sweeps over the bounded ks frame
    "graph_richclub" ->
      """WITH und AS (
        |  SELECT DISTINCT least(l_orderkey, l_partkey + 10000000) AS a,
        |    greatest(l_orderkey, l_partkey + 10000000) AS b
        |  FROM lineitem WHERE l_orderkey <> l_partkey + 10000000
        |), deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS id FROM und UNION ALL SELECT b FROM und)
        |  GROUP BY 1
        |), st AS (
        |  SELECT least(da.deg, db.deg) AS dmin
        |  FROM und JOIN deg da ON da.id = und.a
        |  JOIN deg db ON db.id = und.b
        |), ks AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k)
        |, nk AS (
        |  SELECT ks.k,
        |    CAST(count(*) FILTER (WHERE deg.deg > ks.k) AS BIGINT)
        |      AS n_nodes
        |  FROM ks CROSS JOIN deg GROUP BY 1
        |), ek AS (
        |  SELECT ks.k,
        |    CAST(count(*) FILTER (WHERE st.dmin > ks.k) AS BIGINT)
        |      AS n_edges
        |  FROM ks CROSS JOIN st GROUP BY 1
        |)
        |SELECT CAST(nk.k AS BIGINT) AS k, nk.n_nodes, ek.n_edges,
        |  CASE WHEN nk.n_nodes >= 2
        |    THEN 2000000 * ek.n_edges // (nk.n_nodes * (nk.n_nodes - 1))
        |    ELSE NULL END AS phi_ppm
        |FROM nk JOIN ek ON nk.k = ek.k ORDER BY k""".stripMargin,
    "eval_pr" ->
      """WITH src AS (
        |  SELECT n_chars AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), span AS (
        |  SELECT CAST(min(s) AS BIGINT) AS s_min,
        |    CAST(max(s) AS BIGINT) AS s_max
        |  FROM src
        |), b AS (
        |  SELECT (s - s_min) * 10 // (s_max - s_min + 1) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM src CROSS JOIN span GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n_pos) AS BIGINT) AS total_pos FROM b
        |), c AS (
        |  SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
        |    CAST(sum(n_pos) OVER (ORDER BY bin DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp_cum,
        |    CAST(sum(n) OVER (ORDER BY bin DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pred_pos
        |  FROM b
        |)
        |SELECT bin, n, n_pos, tp_cum, pred_pos,
        |  1000000 * tp_cum // pred_pos AS precision_ppm,
        |  CASE WHEN total_pos = 0 THEN NULL
        |    ELSE 1000000 * tp_cum // total_pos END AS recall_ppm
        |FROM c, tot ORDER BY bin DESC""".stripMargin,
    // skyline twin: the literal O(n²) NOT-EXISTS dominance definition —
    // the semantic ground truth the grid-pruned sweep must reproduce
    "part_skyline" ->
      """WITH pts AS (
        |  SELECT p_partkey AS pkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS x,
        |    CAST(p_size AS BIGINT) AS y
        |  FROM part
        |)
        |SELECT q.pkey, q.x, q.y FROM pts q
        |WHERE NOT EXISTS (SELECT 1 FROM pts p
        |  WHERE p.x <= q.x AND p.y <= q.y
        |    AND (p.x < q.x OR p.y < q.y))
        |ORDER BY q.x, q.y, q.pkey""".stripMargin,
    // ks twin: same quantization, cumulative windows over the distinct-
    // value domain, smallest-argmax location
    "events_ks" ->
      """WITH perv AS (
        |  SELECT CAST(floor(value * 1e6) AS BIGINT) AS v6,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
        |), c AS (
        |  SELECT v6,
        |    sum(a) OVER w AS ca, sum(b) OVER w AS cb,
        |    sum(a) OVER () AS n1, sum(b) OVER () AS n2
        |  FROM perv
        |  WINDOW w AS (ORDER BY v6 ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), d AS (
        |  SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |    abs(ca * n2 - cb * n1) AS dev, v6,
        |    max(abs(ca * n2 - cb * n1)) OVER () AS mx
        |  FROM c
        |)
        |SELECT n1, n2, CAST(max(dev) AS BIGINT) AS d_num,
        |  CAST(max(dev) * 1000000 // (n1 * n2) AS BIGINT) AS d_ppm,
        |  CAST(min(v6) AS BIGINT) AS ks_at_v6
        |FROM d WHERE dev = mx GROUP BY 1, 2""".stripMargin,
    // acf twin: gap-filled grid via generate_series, the same n²-scaled
    // integer moments, lag pairing as the (type, day+lag) equi-join,
    // positive-offset floor division
    "events_acf" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), mom AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s
        |  FROM grid GROUP BY 1
        |), c AS (
        |  SELECT g.event_type, g.day, m.n * g.x - m.s AS c, m.n
        |  FROM grid g JOIN mom m ON m.event_type = g.event_type
        |), den AS (
        |  SELECT event_type, sum(c * c) AS den,
        |    CAST(max(n) AS BIGINT) AS n_days
        |  FROM c GROUP BY 1
        |), gl AS (
        |  SELECT c.event_type, c.day, c.c, CAST(l.lag AS BIGINT) AS lag
        |  FROM c, UNNEST(range(0, 8)) AS l(lag)
        |), pairs AS (
        |  SELECT a.event_type, a.lag, sum(a.c * b.c) AS num,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM gl a JOIN gl b
        |    ON b.event_type = a.event_type AND b.lag = a.lag
        |      AND b.day = a.day + a.lag
        |  GROUP BY 1, 2
        |)
        |SELECT p.event_type, p.lag, d.n_days, p.n_pairs,
        |  CAST((p.num * 1000000 + d.den * 1000000) // d.den - 1000000
        |    AS BIGINT) AS acf_ppm
        |FROM pairs p JOIN den d ON d.event_type = p.event_type
        |ORDER BY 1, 2""".stripMargin,
    // vocab-overlap twin: the same vocab sets + occurrence anti-join
    "vocab_overlap" ->
      """WITH tr AS (
        |  SELECT DISTINCT unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 0
        |), ev AS (
        |  SELECT DISTINCT unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 1
        |), evt AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS token
        |  FROM documents WHERE doc_id % 2 = 1
        |), trv AS (SELECT token FROM tr WHERE token <> ''),
        |evv AS (SELECT token FROM ev WHERE token <> ''),
        |evo AS (SELECT token FROM evt WHERE token <> ''),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_train_types FROM trv),
        |b AS (SELECT CAST(count(*) AS BIGINT) AS n_eval_types FROM evv),
        |i AS (SELECT CAST(count(*) AS BIGINT) AS n_shared_types
        |  FROM evv JOIN trv USING (token)),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_eval_tokens FROM evo),
        |o AS (SELECT CAST(count(*) AS BIGINT) AS n_oov_tokens
        |  FROM evo WHERE NOT EXISTS (
        |    SELECT 1 FROM trv WHERE trv.token = evo.token))
        |SELECT n_train_types, n_eval_types, n_shared_types,
        |  n_eval_tokens, n_oov_tokens,
        |  CAST(1000000 * n_shared_types // greatest(1,
        |    n_train_types + n_eval_types - n_shared_types) AS BIGINT)
        |    AS type_jaccard_ppm,
        |  CAST(1000000 * (n_eval_types - n_shared_types)
        |    // greatest(1, n_eval_types) AS BIGINT) AS oov_type_ppm,
        |  CAST(1000000 * n_oov_tokens // greatest(1, n_eval_tokens)
        |    AS BIGINT) AS oov_token_ppm
        |FROM a CROSS JOIN b CROSS JOIN i CROSS JOIN t CROSS JOIN o""".stripMargin,
    // q18 twin: same HAVING-then-join shape; deterministic top-k order
    // reproduced via the same (qty DESC, orderkey) sort + LIMIT
    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) >= 250
        |)
        |SELECT o.o_custkey AS c_custkey, c.c_name,
        |  b.l_orderkey AS o_orderkey, b.total_qty, o.o_totalprice
        |FROM big b
        |JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY b.total_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    // q17 twin: the same explicit decorrelation + integer comparison
    "q17_small_qty" ->
      """WITH pp AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_li,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(7 AS DOUBLE) AS avg_yearly
        |FROM lineitem l JOIN pp ON pp.l_partkey = l.l_partkey
        |WHERE CAST(l.l_quantity AS BIGINT) * 10 * pp.n_li
        |  < 2 * pp.sum_qty""".stripMargin,
    // triples twin: same downward-closure prune as EXISTS semi-joins
    "basket_triples" ->
      """WITH p0 AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
        |), b AS MATERIALIZED (
        |  SELECT g, item FROM (
        |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz FROM p0)
        |  WHERE gsz <= 100
        |), fpairs AS MATERIALIZED (
        |  SELECT l.item AS pa, r.item AS pb
        |  FROM b l JOIN b r ON l.g = r.g AND l.item < r.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), freq AS (
        |  SELECT pa AS item FROM fpairs UNION SELECT pb FROM fpairs
        |), pb2 AS MATERIALIZED (
        |  SELECT b.g, b.item FROM b JOIN freq USING (item)
        |)
        |SELECT x.item AS item_a, y.item AS item_b, z.item AS item_c,
        |  CAST(count(*) AS BIGINT) AS n_support
        |FROM pb2 x
        |JOIN pb2 y ON x.g = y.g AND x.item < y.item
        |JOIN pb2 z ON x.g = z.g AND y.item < z.item
        |WHERE EXISTS (SELECT 1 FROM fpairs
        |  WHERE pa = x.item AND pb = y.item)
        |  AND EXISTS (SELECT 1 FROM fpairs
        |  WHERE pa = y.item AND pb = z.item)
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY item_a, item_b, item_c""".stripMargin,
    // assortativity twin: endpoint-degree Pearson with the corrMatrix
    // close — each exact HUGEINT moment casts to DOUBLE first, then the
    // identical IEEE formula
    "graph_assortativity" ->
      """WITH base AS (
        |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
        |), adj AS (
        |  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        |  FROM base WHERE src <> dst
        |), und AS (
        |  SELECT lo AS src, hi AS dst FROM adj
        |  UNION ALL SELECT hi, lo FROM adj
        |), deg AS (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
        |  FROM und GROUP BY 1
        |), ep AS (
        |  SELECT ds.deg AS x, dd.deg AS y
        |  FROM und JOIN deg ds ON und.src = ds.id
        |  JOIN deg dd ON und.dst = dd.id
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nn,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM ep
        |)
        |SELECT nn AS n_endpoints,
        |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx)
        |    * sqrt(n * syy - sy * sy)) AS assortativity
        |FROM m ORDER BY n_endpoints""".stripMargin,
    // link-prediction twin: same co-occurrence graph, same hub cap, same
    // integer RA weights (1000000 // deg == Spark div on positives)
    "graph_linkpred" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
        |  WHERE l_partkey % 4 = 0
        |), sized AS (
        |  SELECT g, item FROM (
        |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz FROM pairs)
        |  WHERE gsz <= 100
        |), e AS (
        |  SELECT DISTINCT l.item AS lo, r.item AS hi
        |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
        |), und AS (
        |  SELECT lo AS z, hi AS n FROM e
        |  UNION ALL SELECT hi, lo FROM e
        |), cent AS (
        |  SELECT z, n, 1000000 // deg AS w FROM (
        |    SELECT z, n, count(*) OVER (PARTITION BY z) AS deg FROM und)
        |  WHERE deg <= 100
        |), sc AS (
        |  SELECT l.n AS src, r.n AS dst,
        |    CAST(count(*) AS BIGINT) AS common_neighbors,
        |    CAST(sum(l.w) AS BIGINT) AS ra_ppm
        |  FROM cent l JOIN cent r ON l.z = r.z AND l.n < r.n
        |  GROUP BY 1, 2
        |), nonadj AS (
        |  SELECT * FROM sc WHERE NOT EXISTS (
        |    SELECT 1 FROM e WHERE e.lo = sc.src AND e.hi = sc.dst)
        |), rk AS (
        |  SELECT src, dst, CAST(row_number() OVER (PARTITION BY src
        |    ORDER BY ra_ppm DESC, common_neighbors DESC, dst) AS BIGINT)
        |    AS rank, common_neighbors, ra_ppm
        |  FROM nonadj
        |)
        |SELECT src, dst, rank, common_neighbors, ra_ppm FROM rk
        |WHERE rank <= 5 ORDER BY src, rank""".stripMargin,
    // round-trip twins: the oracle never sees the staged files — a hash
    // match IS the lossless-serialization proof
    "load_jsonl" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "load_csv" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "load_orc" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // binaryRoundTrip twin: file length == strlen (UTF-8 bytes), md5 of
    // the raw payload == md5 of the string
    "load_binary" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS length,
        |  md5(text) AS payload_md5
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // q12 twin: same date band, same conditional priority split
    "q12_shipmode" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000 >=
        |    epoch_us(TIMESTAMP '1996-01-01') // 86400000000
        |  AND epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000 <
        |    epoch_us(TIMESTAMP '1996-07-01') // 86400000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // gains twin: same per-score compression, same group-edge bins
    "eval_gains" ->
      """WITH pers AS (
        |  SELECT n_chars AS s, CAST(count(*) AS BIGINT) AS n_s,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p_s
        |  FROM documents GROUP BY 1
        |), c AS (
        |  SELECT sum(n_s) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |    sum(p_s) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
        |    sum(n_s) OVER () AS tot_n,
        |    sum(p_s) OVER () AS tot_pos
        |  FROM pers
        |), b AS (
        |  SELECT (cum_n * 10 + tot_n - 1) // tot_n AS bin,
        |    max(cum_n) AS rows_cum, max(cum_pos) AS pos_cum,
        |    max(tot_n) AS n, max(tot_pos) AS n_pos
        |  FROM c GROUP BY 1
        |)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(rows_cum AS BIGINT) AS rows_cum,
        |  CAST(pos_cum AS BIGINT) AS pos_cum,
        |  CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(CAST(pos_cum AS HUGEINT) * 1000000 // n_pos AS BIGINT)
        |    AS capture_ppm,
        |  CAST(CAST(pos_cum AS HUGEINT) * 1000000 * n
        |    // (CAST(n_pos AS HUGEINT) * rows_cum) AS BIGINT) AS lift_ppm
        |FROM b ORDER BY bin""".stripMargin,
    // chi2 twin: identical cell/margin windows + HUGEINT residuals
    "events_chi2" ->
      """WITH src AS (
        |  SELECT event_type AS a,
        |    epoch_us(ts) // 86400000000 % 7 AS b
        |  FROM events
        |), cells AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM src GROUP BY 1, 2
        |), m AS (
        |  SELECT o,
        |    sum(o) OVER (PARTITION BY a) AS r,
        |    sum(o) OVER (PARTITION BY b) AS c,
        |    sum(o) OVER () AS n, a, b
        |  FROM cells
        |), con AS (
        |  SELECT a, b, n,
        |    CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |        * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |        * 1000000
        |      // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS contrib_e6
        |  FROM m
        |), agg AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS ra,
        |    CAST(count(DISTINCT b) AS BIGINT) AS cb,
        |    CAST(sum(contrib_e6) AS BIGINT) AS chi2_e6
        |  FROM con
        |)
        |SELECT n, ra, cb, chi2_e6,
        |  CAST((ra - 1) * (cb - 1) AS BIGINT) AS dof,
        |  CAST(floor(sqrt((CAST(chi2_e6 AS DOUBLE)
        |      / CAST('1000000' AS DOUBLE))
        |      / CAST(n * (least(ra, cb) - 1) AS DOUBLE))
        |    * CAST('1000000' AS DOUBLE)) AS BIGINT) AS cramer_ppm
        |FROM agg""".stripMargin,
    // A-ES twin: UNNEST(range(w)) replicas, same md5 minima, same top-k
    // negativeSamples twin: same smoothed integer weights and md5 draw
    // points; the oracle skips the cell routing (it only ROUTES — the
    // matched range is identical) and joins the containment directly
    "sample_negatives" ->
      """WITH counts AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS f FROM (
        |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |      AS token FROM documents)
        |  WHERE length(token) > 0 GROUP BY 1
        |), top AS (
        |  SELECT token, f FROM counts ORDER BY f DESC, token LIMIT 20
        |), mx AS (
        |  SELECT max(sqrt(CAST(f AS DOUBLE) * sqrt(CAST(f AS DOUBLE))))
        |    AS m FROM top
        |), w AS (
        |  SELECT token,
        |    GREATEST(1, CAST(floor(CAST('1000' AS DOUBLE)
        |      * sqrt(CAST(f AS DOUBLE) * sqrt(CAST(f AS DOUBLE))) / m)
        |      AS BIGINT)) AS w
        |  FROM top, mx
        |), ranges AS (
        |  SELECT token, w, CAST(SUM(w) OVER (ORDER BY token
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS hi
        |  FROM w
        |), r2 AS (
        |  SELECT token, hi - w AS lo, hi FROM ranges
        |), tot AS (
        |  SELECT max(hi) AS wsum FROM r2
        |), pairs AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS center,
        |    t[i + 1] AS context
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(lower(text)), '\s+') AS t
        |        FROM documents WHERE doc_id < 50),
        |    UNNEST(range(1, len(t) + 1)) AS u(i)
        |  WHERE i < len(t)
        |), probes AS (
        |  SELECT p.doc_id, p.pos, p.center, p.context,
        |    CAST(u.j AS BIGINT) AS j,
        |    CAST('0x' || substr(md5('neg:' || CAST(p.doc_id AS VARCHAR)
        |      || ':' || CAST(p.pos AS VARCHAR) || ':'
        |      || CAST(u.j AS VARCHAR)), 1, 12) AS BIGINT) % t.wsum AS uu
        |  FROM pairs p, UNNEST(range(0, 3)) AS u(j), tot t
        |)
        |SELECT p.doc_id AS doc_id, p.pos AS pos, p.center AS center,
        |  p.context AS context, p.j AS j, r.token AS neg_token,
        |  r.token = p.context AS is_collision
        |FROM probes p JOIN r2 r ON p.uu >= r.lo AND p.uu < r.hi
        |ORDER BY doc_id, pos, j""".stripMargin,
    "sample_weighted" ->
      """WITH w AS (
        |  SELECT doc_id, 1 + n_chars // 64 AS w FROM documents
        |), reps AS (
        |  SELECT doc_id, w,
        |    min(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(t.r AS VARCHAR))) AS h
        |  FROM w, UNNEST(range(w.w)) AS t(r)
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT doc_id, w, h FROM reps ORDER BY h, doc_id LIMIT 64
        |)
        |SELECT CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT)
        |    AS draw,
        |  doc_id AS id, CAST(w AS BIGINT) AS w, h
        |FROM top ORDER BY draw""".stripMargin,
    // LOO twin: same per-category totals, same ppm residual mean
    "docs_target_encode" ->
      """WITH y AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
        |  FROM documents
        |), k AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_k,
        |    CAST(sum(y) AS BIGINT) AS sum_k
        |  FROM y GROUP BY 1
        |)
        |SELECT y.doc_id AS doc_id, y.source AS source, y.y AS y, k.n_k,
        |  CAST(CASE WHEN n_k <= 1 THEN NULL
        |    ELSE 1000000 * (sum_k - y.y) // (n_k - 1) END AS BIGINT)
        |    AS loo_ppm
        |FROM y JOIN k ON k.source = y.source
        |ORDER BY doc_id""".stripMargin,
    // q9 twin: same cents cost stand-in, same signed e4 amounts
    "q9_profit" ->
      """WITH pt AS (
        |  SELECT p_partkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      // 5 AS cost_c
        |  FROM part WHERE p_name LIKE '%red%'
        |), supp AS (
        |  SELECT s_suppkey, n_name AS nation
        |  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |)
        |SELECT supp.nation AS nation,
        |  CAST(year(CAST(o.o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(9,2)) * 100
        |        AS BIGINT))
        |      - pt.cost_c * 100 * CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS profit_e4,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |JOIN pt ON pt.p_partkey = l.l_partkey
        |JOIN supp ON supp.s_suppkey = l.l_suppkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // dispersion twin: same gap-filled grid, same HUGEINT moments
    "events_dispersion" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS n_events,
        |    sum(CAST(x AS HUGEINT) * x) AS s2
        |  FROM grid GROUP BY 1
        |)
        |SELECT event_type, n_days, n_events,
        |  CAST(100 * n_events // n_days AS BIGINT) AS mean_e2,
        |  CAST((CAST(n_days AS HUGEINT) * s2
        |      - CAST(n_events AS HUGEINT) * n_events) * 1000000
        |    // (CAST(n_days - 1 AS HUGEINT) * n_events) AS BIGINT)
        |    AS dispersion_ppm
        |FROM agg ORDER BY event_type""".stripMargin,
    // theil-sen twin: same grid, same IEEE-slope order + lower median
    // olsTrend twin: HUGEINT moments over the same zero-filled grid,
    // sign-split floor-ppm slope/intercept (positive numerators before
    // // so truncate == floor on both engines), all-positive r2 terms
    "events_ols" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), wx AS (
        |  SELECT g.event_type, g.day - s.d0 AS xd, g.x AS y
        |  FROM grid g JOIN span s ON g.event_type = s.event_type
        |), m AS (
        |  SELECT event_type,
        |    CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(xd) AS HUGEINT) AS sx,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(xd * y) AS HUGEINT) AS sxy,
        |    CAST(sum(xd * xd) AS HUGEINT) AS sxx,
        |    CAST(sum(y * y) AS HUGEINT) AS syy
        |  FROM wx GROUP BY 1
        |), dd AS (
        |  SELECT event_type, n, sx, sy,
        |    n * sxy - sx * sy AS dxy,
        |    n * sxx - sx * sx AS dxx,
        |    n * syy - sy * sy AS dyy
        |  FROM m
        |), sl AS (
        |  SELECT *, CASE WHEN dxx = 0 THEN NULL
        |    WHEN dxy >= 0 THEN CAST(1000000 * dxy // dxx AS BIGINT)
        |    ELSE CAST(-((1000000 * -dxy) // dxx) AS BIGINT) END
        |    AS slope_ppm
        |  FROM dd
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, slope_ppm,
        |  CASE WHEN dxx = 0 THEN NULL
        |    WHEN 1000000 * sy - CAST(slope_ppm AS HUGEINT) * sx >= 0
        |      THEN CAST((1000000 * sy - CAST(slope_ppm AS HUGEINT) * sx)
        |        // n AS BIGINT)
        |    ELSE CAST(-((-(1000000 * sy - CAST(slope_ppm AS HUGEINT)
        |      * sx)) // n) AS BIGINT)
        |  END AS intercept_ppm,
        |  CASE WHEN dxx = 0 OR dyy = 0 THEN NULL
        |    ELSE CAST(1000000 * dxy * dxy // (dxx * dyy) AS BIGINT)
        |  END AS r2_ppm
        |FROM sl ORDER BY event_type""".stripMargin,
    // crossCorrelation twin: joint zero-filled grid, per-lag shifted
    // day join, moments cast to DOUBLE before any arithmetic (the
    // value_corr close: IEEE ·,−,/,sqrt over exact integers)
    "events_xcorr" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2
        |), span AS (
        |  SELECT min(day) AS d0, max(day) AS d1 FROM daily
        |), grid AS (
        |  SELECT CAST(u.day AS BIGINT) AS day
        |  FROM span s, UNNEST(generate_series(s.d0, s.d1)) AS u(day)
        |), a AS (
        |  SELECT g.day, COALESCE(d.x, 0) AS a FROM grid g
        |  LEFT JOIN (SELECT day, x FROM daily
        |             WHERE event_type = 'click') d ON d.day = g.day
        |), b AS (
        |  SELECT g.day, COALESCE(d.x, 0) AS b FROM grid g
        |  LEFT JOIN (SELECT day, x FROM daily
        |             WHERE event_type = 'purchase') d ON d.day = g.day
        |), lg AS (
        |  SELECT CAST(u.lag AS BIGINT) AS lag
        |  FROM UNNEST(generate_series(-3, 3)) AS u(lag)
        |), st AS (
        |  SELECT lg.lag AS lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a.a) AS BIGINT) AS sa_b,
        |    CAST(sum(b.b) AS BIGINT) AS sb_b,
        |    CAST(count(*) AS DOUBLE) AS nd,
        |    CAST(sum(a.a) AS DOUBLE) AS sa,
        |    CAST(sum(b.b) AS DOUBLE) AS sb,
        |    CAST(sum(a.a * b.b) AS DOUBLE) AS sab,
        |    CAST(sum(a.a * a.a) AS DOUBLE) AS saa,
        |    CAST(sum(b.b * b.b) AS DOUBLE) AS sbb
        |  FROM a CROSS JOIN lg JOIN b ON b.day = a.day + lg.lag
        |  GROUP BY 1
        |)
        |SELECT lag, n AS n_days, sa_b AS n_a_events, sb_b AS n_b_events,
        |  CASE WHEN nd * saa - sa * sa = 0
        |         OR nd * sbb - sb * sb = 0 THEN NULL
        |    ELSE (nd * sab - sa * sb)
        |      / (sqrt(nd * saa - sa * sa) * sqrt(nd * sbb - sb * sb))
        |  END AS corr
        |FROM st ORDER BY lag""".stripMargin,
    "events_theilsen" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), pairs AS (
        |  SELECT a.event_type, a.day AS d1, b.day AS d2,
        |    b.x - a.x AS dy, b.day - a.day AS dx
        |  FROM grid a
        |  JOIN grid b ON b.event_type = a.event_type AND b.day > a.day
        |), r AS (
        |  SELECT event_type, d1, d2, dy, dx,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_pairs,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE), d1, d2)
        |      AS BIGINT) AS rn
        |  FROM pairs
        |)
        |SELECT event_type, n_pairs, CAST(dy AS BIGINT) AS dy,
        |  CAST(dx AS BIGINT) AS dx,
        |  CAST(CASE WHEN dy >= 0 THEN 1000000 * dy // dx
        |    ELSE -((1000000 * -dy) // dx) END AS BIGINT) AS slope_ppm
        |FROM r WHERE rn = (n_pairs + 1) // 2
        |ORDER BY event_type""".stripMargin,
    // simpson twin: same per-user compression, same HUGEINT ratios
    "events_simpson" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_u
        |  FROM events GROUP BY 1, 2
        |), agg AS (
        |  SELECT event_type, CAST(sum(n_u) AS BIGINT) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    sum(CAST(n_u AS HUGEINT) * n_u) AS s2
        |  FROM pu GROUP BY 1
        |)
        |SELECT event_type, n_events, n_users,
        |  CAST(s2 * 1000000 // (CAST(n_events AS HUGEINT) * n_events)
        |    AS BIGINT) AS simpson_ppm,
        |  CAST(CAST(n_events AS HUGEINT) * n_events * 100 // s2
        |    AS BIGINT) AS eff_users_e2
        |FROM agg ORDER BY event_type""".stripMargin,
    // binomial-mechanism twin: same md5 coins, same clamped release
    "privacy_dp_counts" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
        |  FROM events GROUP BY 1
        |), h AS (
        |  SELECT event_type, n_true, md5('dp:' || event_type) AS h FROM g
        |)
        |SELECT event_type,
        |  CAST(greatest(n_true
        |    + bit_count(CAST('0x' || substr(h, 1, 8) AS BIGINT))
        |    + bit_count(CAST('0x' || substr(h, 9, 8) AS BIGINT))
        |    - 32, 0) AS BIGINT) AS released
        |FROM h ORDER BY event_type""".stripMargin,
    "bluegreen_keep2" ->
      """WITH d AS (
        |  SELECT o_custkey AS customer_id,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS snapshot_ts,
        |    o_orderkey AS entity_id
        |  FROM orders
        |), r AS (
        |  SELECT customer_id, snapshot_ts,
        |    CAST(row_number() OVER (PARTITION BY customer_id
        |      ORDER BY snapshot_ts DESC, entity_id DESC) AS BIGINT) AS drop_rank
        |  FROM d
        |)
        |SELECT customer_id,
        |  concat(CAST(customer_id AS VARCHAR), '-', CAST(snapshot_ts AS VARCHAR)) AS db_name,
        |  drop_rank
        |FROM r WHERE drop_rank > 2 ORDER BY customer_id, drop_rank""".stripMargin,
    // load_e2e: counts are the staged tables' cardinalities; the
    // statement plan is fully determined by the registered scenario
    // (new latest snapshot over two older dbs, alias on the middle one →
    // switch + drop the oldest)
    "load_e2e" ->
      """SELECT CAST(1 AS BIGINT) AS step, 'nodes' AS stage,
        |  'acme-20240301' AS detail,
        |  (SELECT count(*) FROM customer) AS n
        |UNION ALL SELECT 2, 'relationships', 'acme-20240301',
        |  (SELECT count(*) FROM orders)
        |UNION ALL SELECT 3, 'statement', 'DROP ALIAS acme FOR DATABASE', 0
        |UNION ALL SELECT 4, 'statement',
        |  'CREATE ALIAS acme FOR DATABASE `acme-20240301`', 0
        |UNION ALL SELECT 5, 'statement',
        |  'DROP DATABASE `acme-20240101` IF EXISTS', 0
        |ORDER BY step""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, sha256(text) AS checksum,
        | count(*) AS n_copies
        |FROM documents GROUP BY sha256(text) ORDER BY doc_id""".stripMargin,
    "dedup_weights" ->
      """SELECT doc_id,
        |  count(*) OVER (PARTITION BY sha256(text)) AS n_copies,
        |  CAST(1000000 // count(*) OVER (PARTITION BY sha256(text))
        |    AS BIGINT) AS weight_ppm
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mix_rates twin: shares forced to DOUBLE (bare decimals parse as
    // DECIMAL in DuckDB and the min/divide chain would diverge)
    "mix_rates" ->
      """WITH tgt(source, share) AS (
        |  VALUES ('src0', CAST('0.5' AS DOUBLE)),
        |    ('src1', CAST('0.3' AS DOUBLE)),
        |    ('src2', CAST('0.2' AS DOUBLE))
        |), counts AS (
        |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, t.share
        |  FROM documents d JOIN tgt t ON d.source = t.source
        |  GROUP BY 1, 3
        |), sc AS (
        |  SELECT min(CAST(n_docs AS DOUBLE) / share) AS scale FROM counts
        |)
        |SELECT source, n_docs, share,
        |  share * scale / CAST(n_docs AS DOUBLE) AS rate
        |FROM counts, sc ORDER BY source""".stripMargin,
    // T=4 → two iterated sqrts (IEEE-exact in both engines); normalizer
    // is a min, so no order-dependent float sum anywhere
    "mix_temperature" ->
      """WITH counts AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT source, n_docs,
        |    sqrt(sqrt(CAST(n_docs AS DOUBLE))) AS weight
        |  FROM counts
        |), sc AS (
        |  SELECT min(CAST(n_docs AS DOUBLE) / weight) AS scale FROM w
        |)
        |SELECT source, n_docs, weight,
        |  weight * scale / CAST(n_docs AS DOUBLE) AS rate
        |FROM w, sc ORDER BY source""".stripMargin,
    "dedup_report" ->
      """WITH per AS (
        |  SELECT source, sha256(text) AS checksum,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2
        |)
        |SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_unique,
        |  CAST(sum(n) - count(*) AS BIGINT) AS n_dup,
        |  CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
        |    AS dup_rate
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    "dedup_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        |  FROM toks WHERE len(t) >= 3
        |), pruned AS (
        |  SELECT doc_id, shingle FROM (
        |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
        |    FROM sh) WHERE df <= 25
        |), sizes AS (
        |  SELECT doc_id, count(*) AS set_size FROM pruned GROUP BY doc_id
        |), pairs AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS common
        |  FROM pruned l JOIN pruned r
        |    ON l.shingle = r.shingle AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id,
        |  CAST(common AS DOUBLE) / CAST(sa.set_size + sb.set_size - common AS DOUBLE) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON pairs.a_id = sa.doc_id
        |JOIN sizes sb ON pairs.b_id = sb.doc_id
        |WHERE CAST(common AS DOUBLE) / CAST(sa.set_size + sb.set_size - common AS DOUBLE) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    // weightedJaccard twin: same grams WITHOUT list_distinct (tf keeps
    // multiplicity), Σ least(tf, tf) per pair, integer ppm close
    "dedup_jaccard_weighted" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS token
        |  FROM toks WHERE len(t) >= 3
        |), tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM sh GROUP BY 1, 2
        |), pruned AS (
        |  SELECT doc_id, token, tf FROM (
        |    SELECT doc_id, token, tf,
        |      count(*) OVER (PARTITION BY token) AS df
        |    FROM tf) WHERE df <= 25
        |), sizes AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS w_size
        |  FROM pruned GROUP BY 1
        |), pairs AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id,
        |    CAST(sum(least(l.tf, r.tf)) AS BIGINT) AS common_w
        |  FROM pruned l JOIN pruned r
        |    ON l.token = r.token AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT p.a_id AS a_id, p.b_id AS b_id, p.common_w AS common_w,
        |  sa.w_size AS a_w, sb.w_size AS b_w,
        |  CAST(1000000 * p.common_w
        |    // (sa.w_size + sb.w_size - p.common_w) AS BIGINT) AS jw_ppm
        |FROM pairs p
        |JOIN sizes sa ON sa.doc_id = p.a_id
        |JOIN sizes sb ON sb.doc_id = p.b_id
        |WHERE 1000000 * p.common_w
        |    // (sa.w_size + sb.w_size - p.common_w) >= 300000
        |ORDER BY a_id, b_id""".stripMargin,
    // duplicated 5-gram positions → interval union per doc (same island
    // windows as the Spark side — all-integer, hash-exact)
    "dedup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), g0 AS (
        |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
        |  FROM toks WHERE len(t) >= 5
        |), g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |      || ' ' || t[i+4] AS gram
        |  FROM g0
        |), d AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS occ
        |    FROM g) WHERE occ > 1
        |), isl AS (
        |  SELECT doc_id, pos,
        |    max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM d
        |), sp AS (
        |  SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR prev_end + 1 < pos
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |  FROM isl
        |)
        |SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
        |  CAST(min(pos) AS BIGINT) AS start_pos,
        |  CAST(max(pos) + 4 AS BIGINT) AS end_pos,
        |  CAST(max(pos) + 4 - min(pos) + 1 AS BIGINT) AS span_tokens
        |FROM sp GROUP BY 1, 2 ORDER BY doc_id, span_id""".stripMargin,
    // oracle is the UNFILTERED exact shingle-jaccard pair set — the
    // prefix filter must be lossless, so the hashes agree only if it is
    "dedup_jaccard_prefix" ->
      """WITH raw AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS tok
        |  FROM raw WHERE len(t) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1
        |), pairs AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS common
        |  FROM toks l JOIN toks r ON l.tok = r.tok AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id,
        |  CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON pairs.a_id = sa.doc_id
        |JOIN sizes sb ON pairs.b_id = sb.doc_id
        |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE)
        |  >= CAST('0.8' AS DOUBLE)
        |ORDER BY a_id, b_id""".stripMargin,
    // directional containment C(a→b) = common / |A| over the same 3-gram
    // space; the prefix filter is candidate pruning only, so the oracle
    // is the plain posting join over ordered pairs
    "dedup_containment" ->
      """WITH raw AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS tok
        |  FROM raw WHERE len(t) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1
        |), pairs AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS common
        |  FROM toks l JOIN toks r ON l.tok = r.tok AND l.doc_id <> r.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id,
        |  CAST(common AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS containment
        |FROM pairs
        |JOIN sizes sa ON pairs.a_id = sa.doc_id
        |WHERE CAST(common AS DOUBLE) / CAST(sa.sz AS DOUBLE)
        |  >= CAST('0.8' AS DOUBLE)
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_incremental" ->
      """WITH batch AS (
        |  SELECT sha256(text) AS checksum, min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS n_copies
        |  FROM documents WHERE doc_id >= 250 GROUP BY 1
        |), known AS (
        |  SELECT DISTINCT sha256(text) AS checksum FROM documents WHERE doc_id < 250
        |)
        |SELECT doc_id, checksum, n_copies FROM batch
        |WHERE checksum NOT IN (SELECT checksum FROM known)
        |ORDER BY doc_id""".stripMargin,
    // minhash oracle: exact jaccard over UNPRUNED shingle sets (minhash
    // signatures estimate full-set similarity; df-pruning is jaccard's
    // inverted-index optimization, not part of the estimated quantity)
    "dedup_minhash" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        |  FROM toks WHERE len(t) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id
        |), pairs AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS common
        |  FROM sh l JOIN sh r
        |    ON l.shingle = r.shingle AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id FROM pairs
        |JOIN sizes sa ON pairs.a_id = sa.doc_id
        |JOIN sizes sb ON pairs.b_id = sb.doc_id
        |WHERE CAST(common AS DOUBLE) / CAST(sa.set_size + sb.set_size - common AS DOUBLE) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    // incremental = the same pair set restricted to pairs touching the
    // id % 5 == 0 batch, with provenance derived from the split rule
    "dedup_minhash_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        |  FROM toks WHERE len(t) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id
        |), pairs AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS common
        |  FROM sh l JOIN sh r
        |    ON l.shingle = r.shingle AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id,
        |  CASE WHEN a_id % 5 = 0 AND b_id % 5 = 0 THEN 'batch'
        |       ELSE 'index' END AS via
        |FROM pairs
        |JOIN sizes sa ON pairs.a_id = sa.doc_id
        |JOIN sizes sb ON pairs.b_id = sb.doc_id
        |WHERE CAST(common AS DOUBLE) / CAST(sa.set_size + sb.set_size - common AS DOUBLE) >= 0.5
        |  AND (a_id % 5 = 0 OR b_id % 5 = 0)
        |ORDER BY a_id, b_id""".stripMargin,
    // simhash oracle is EXACT: graft_simhash uses md5-prefix token hashes
    // (first 8 md5 bytes as hi/lo 32-bit halves), so DuckDB rebuilds the
    // identical 64 signature bits; and with 4 chunks vs maxHamming=3 the
    // chunk-agreement candidate join is exhaustive by pigeonhole — the
    // Spark pair set IS the set of all pairs at hamming <= 3
    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |    FROM documents)
        |), th AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS hi,
        |    CAST('0x' || substr(md5(t), 9, 8) AS BIGINT) AS lo
        |  FROM tok
        |), bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN sum(CASE WHEN ((CASE WHEN b < 32 THEN lo >> b
        |                              ELSE hi >> (b - 32) END) & 1) = 1
        |                      THEN 1 ELSE -1 END) > 0
        |         THEN 1 ELSE 0 END AS bit
        |  FROM th, (SELECT unnest(generate_series(0, 63)) AS b) bs
        |  GROUP BY doc_id, b
        |), ham AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id,
        |    CAST(sum(CASE WHEN l.bit <> r.bit THEN 1 ELSE 0 END) AS BIGINT)
        |      AS hamming
        |  FROM bits l JOIN bits r ON l.b = r.b AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id, hamming FROM ham WHERE hamming <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // winnow fingerprints are md5-prefix hashes of word 3-grams with a
    // w=4 sliding window min; rightmost-on-ties never changes the selected
    // VALUE, so the distinct window-min set below is exact
    "text_winnow" -> (winnowFpsSql +
      """
        |SELECT doc_id, fp FROM fps ORDER BY doc_id, fp""".stripMargin),
    "dedup_winnow" -> (winnowFpsSql +
      """
        |, pruned AS (
        |  SELECT doc_id, fp FROM (
        |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM fps)
        |  WHERE df <= 25
        |)
        |SELECT l.doc_id AS a_id, r.doc_id AS b_id,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM pruned l JOIN pruned r ON l.fp = r.fp AND l.doc_id < r.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY a_id, b_id""".stripMargin),
    // repeatedSpans twin: same planted passages, correlated
    // UNNEST(range) 1-indexed gram positions, distinct-doc gram df,
    // running-max-end interval-union islands — identical span algebra
    "dedup_spans_xdoc" ->
      """WITH don AS (
        |  SELECT doc_id - 200 AS doc_id,
        |    array_to_string((string_split_regex(trim(text), '\s+'))[1:20],
        |      ' ') AS passage
        |  FROM documents WHERE doc_id >= 200 AND doc_id < 230
        |), t AS (
        |  SELECT r.doc_id, string_split_regex(trim(
        |    CASE WHEN d.passage IS NOT NULL THEN r.text || ' ' || d.passage
        |         ELSE r.text END), '\s+') AS t
        |  FROM documents r LEFT JOIN don d USING (doc_id)
        |), g AS MATERIALIZED (
        |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
        |    array_to_string(t[u.i:u.i + 7], ' ') AS gram
        |  FROM t, UNNEST(range(1, len(t) - 6)) AS u(i)
        |  WHERE len(t) >= 8
        |), rg AS (
        |  SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM g)
        |  GROUP BY gram HAVING count(*) >= 2
        |), rp AS (
        |  SELECT doc_id, pos,
        |    max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM g JOIN rg USING (gram)
        |), sp AS (
        |  SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR prev_end + 1 < pos
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM rp
        |)
        |SELECT doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 7 AS BIGINT) AS span_end,
        |  CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS n_tokens
        |FROM sp GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin,
    // removeRepeatedSpans twin: same planted corpus and gram df, then
    // the union-tag coverage sweep (gram rows carry interval ends, a
    // token is dropped iff the running max end reaches it) and a
    // FILTERed ordered list rebuild (DuckDB list() keeps NULLs where
    // Spark collect_list skips them — FILTER makes them agree)
    "dedup_spans_remove" ->
      """WITH don AS (
        |  SELECT doc_id - 200 AS doc_id,
        |    array_to_string((string_split_regex(trim(text), '\s+'))[1:20],
        |      ' ') AS passage
        |  FROM documents WHERE doc_id >= 200 AND doc_id < 230
        |), t AS MATERIALIZED (
        |  SELECT r.doc_id, string_split_regex(trim(
        |    CASE WHEN d.passage IS NOT NULL THEN r.text || ' ' || d.passage
        |         ELSE r.text END), '\s+') AS t
        |  FROM documents r LEFT JOIN don d USING (doc_id)
        |), toks AS (
        |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, t[u.i] AS tok
        |  FROM t, UNNEST(range(1, len(t) + 1)) AS u(i)
        |), g AS MATERIALIZED (
        |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
        |    array_to_string(t[u.i:u.i + 7], ' ') AS gram
        |  FROM t, UNNEST(range(1, len(t) - 6)) AS u(i)
        |  WHERE len(t) >= 8
        |), rg AS (
        |  SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM g)
        |  GROUP BY gram HAVING count(*) >= 2
        |), uni AS (
        |  SELECT doc_id, pos, 1 AS tag, CAST(NULL AS BIGINT) AS e, tok
        |  FROM toks
        |  UNION ALL
        |  SELECT g.doc_id, g.pos, 0, g.pos + 7, NULL
        |  FROM g JOIN rg USING (gram)
        |), sw AS (
        |  SELECT doc_id, pos, tag, tok,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY pos, tag
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cov_end
        |  FROM uni
        |), k AS (
        |  SELECT doc_id, pos, tok,
        |    (cov_end IS NULL OR cov_end < pos) AS kept
        |  FROM sw WHERE tag = 1
        |)
        |SELECT doc_id,
        |  coalesce(array_to_string(
        |    list(tok ORDER BY pos) FILTER (WHERE kept), ' '), '')
        |    AS clean_text,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dropped
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_paragraph" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), own AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, CAST(ceil(len(t)/10.0) AS BIGINT)))
        |      AS para_idx, t
        |  FROM toks
        |), ownp AS (
        |  SELECT doc_id, para_idx,
        |    array_to_string(t[(para_idx-1)*10+1:(para_idx-1)*10+10], ' ') AS para
        |  FROM own
        |), planted AS (
        |  SELECT doc_id - 100 AS doc_id, CAST(1000000 AS BIGINT) AS para_idx,
        |    array_to_string(t[1:10], ' ') AS para
        |  FROM toks WHERE doc_id >= 100 AND doc_id < 125
        |), paras AS (
        |  SELECT * FROM ownp UNION ALL SELECT * FROM planted
        |), flag AS (
        |  SELECT doc_id, para_idx, para,
        |    row_number() OVER (PARTITION BY md5(para)
        |      ORDER BY doc_id, para_idx) AS rn
        |  FROM paras
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' '
        |    ORDER BY para_idx), '') AS clean_text
        |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), own AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, CAST(ceil(len(t)/10.0) AS BIGINT)))
        |      AS para_idx, t
        |  FROM toks
        |), ownp AS (
        |  SELECT doc_id, para_idx,
        |    array_to_string(t[(para_idx-1)*10+1:(para_idx-1)*10+10], ' ') AS para
        |  FROM own
        |), header AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS para_idx,
        |    'copyright license terms apply to this document' AS para
        |  FROM toks
        |), paras AS (
        |  SELECT * FROM ownp UNION ALL SELECT * FROM header
        |), dfs AS (
        |  SELECT md5(para) AS ph, count(DISTINCT doc_id) AS df
        |  FROM paras GROUP BY 1
        |), flag AS (
        |  SELECT p.doc_id, p.para_idx, p.para, d.df,
        |    row_number() OVER (PARTITION BY md5(p.para)
        |      ORDER BY p.doc_id, p.para_idx) AS rn
        |  FROM paras p JOIN dfs d ON md5(p.para) = d.ph
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        |  CAST(sum(CASE WHEN rn = 1 AND df < 100 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(CASE WHEN rn = 1 AND df < 100 THEN para END,
        |    ' ' ORDER BY para_idx), '') AS clean_text
        |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // survivors = every original id; each planted copy (vec_id+100000,
    // identical vector) pairs with its original and loses the min-id
    // representative election
    "dedup_semantic" ->
      """SELECT vec_id FROM embeddings ORDER BY vec_id""".stripMargin,
    "dedup_embedding" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings
        |  WHERE vec_id < 25
        |), pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    list_dot_product(a.e, b.e) /
        |      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cosine
        |  FROM base a JOIN base b ON a.vec_id < b.vec_id
        |)
        |SELECT a_id, b_id, cosine FROM pairs WHERE cosine >= 0.95
        |ORDER BY a_id, b_id""".stripMargin,
    // shared by dedup_clusters (hash-min) and dedup_clusters_star
    // (large-star/small-star): both must produce the identical
    // min-labelled component table
    "dedup_clusters" -> clustersOracleSql,
    "dedup_clusters_star" -> clustersOracleSql,
    // incremental merge must be row-identical to the from-scratch closure
    "dedup_clusters_incremental" -> clustersOracleSql,
    // same components; split decided by the first md5 BYTE of the
    // cluster id (< 64 of 256 = 25% val), singletons = own id
    "split_leakage_safe" -> (clustersCteSql +
      """
        |, comp AS (
        |  SELECT id, min(label) AS cluster_id FROM walk GROUP BY id
        |)
        |SELECT d.doc_id,
        |  coalesce(comp.cluster_id, d.doc_id) AS cluster_id,
        |  CASE WHEN CAST('0x' || substr(md5(
        |      CAST(coalesce(comp.cluster_id, d.doc_id) AS VARCHAR)), 1, 2)
        |      AS BIGINT) < 64 THEN 'val' ELSE 'train' END AS split
        |FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
        |ORDER BY doc_id""".stripMargin),
    "ann_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 10
        |), c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings
        |), scored AS (
        |  SELECT q.query_id, c.vec_id,
        |    list_dot_product(ce, qe) /
        |      (sqrt(list_dot_product(ce, ce)) * sqrt(list_dot_product(qe, qe))) AS cosine
        |  FROM c, q WHERE c.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id ASC) AS "rank"
        |  FROM scored
        |)
        |SELECT query_id, "rank", vec_id AS neighbor_id
        |FROM ranked WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,
    // hubness twin: the ann_brute scoring chain (sequential-fold dot ==
    // list_dot_product, IEEE sqrt/div, rank-only emission) + the
    // k-occurrence rollup and the two-total zero row
    "embed_hubness" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id % 17 = 0
        |), c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings
        |), scored AS (
        |  SELECT q.query_id, c.vec_id,
        |    list_dot_product(ce, qe) /
        |      (sqrt(list_dot_product(ce, ce)) *
        |       sqrt(list_dot_product(qe, qe))) AS cosine
        |  FROM c, q WHERE c.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id ASC) AS r
        |  FROM scored
        |), occ AS (
        |  SELECT vec_id, CAST(count(*) AS BIGINT) AS k_occ
        |  FROM ranked WHERE r <= 10 GROUP BY 1
        |), hist AS (
        |  SELECT k_occ, CAST(count(*) AS BIGINT) AS n_vectors
        |  FROM occ GROUP BY 1
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM embeddings
        |), hit AS (SELECT CAST(count(*) AS BIGINT) AS n_hit FROM occ)
        |SELECT CAST(0 AS BIGINT) AS k_occ,
        |  n_corpus - n_hit AS n_vectors
        |FROM tot, hit
        |UNION ALL SELECT k_occ, n_vectors FROM hist
        |ORDER BY k_occ""".stripMargin,
    // per-cell floor(cos*1e6) before any sum (gram-matrix recipe) makes
    // the neighborhood sums order-free BIGINTs; margin multiplied through
    // by 2k instead of divided — no floats emitted or compared inexactly
    "embed_align" ->
      """WITH s AS (
        |  SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id % 2 = 0
        |), t AS (
        |  SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id % 2 = 1
        |), scored AS (
        |  SELECT src_id, tgt_id,
        |    CAST(floor(list_dot_product(s.e, t.e) /
        |      (sqrt(list_dot_product(s.e, s.e)) *
        |       sqrt(list_dot_product(t.e, t.e))) * 1000000) AS BIGINT)
        |      AS icos
        |  FROM s, t
        |), fwdk AS (
        |  SELECT src_id, tgt_id, icos FROM (
        |    SELECT *, row_number() OVER (PARTITION BY src_id
        |      ORDER BY icos DESC, tgt_id) AS r FROM scored)
        |  WHERE r <= 4
        |), bwdk AS (
        |  SELECT src_id, tgt_id, icos FROM (
        |    SELECT *, row_number() OVER (PARTITION BY tgt_id
        |      ORDER BY icos DESC, src_id) AS r FROM scored)
        |  WHERE r <= 4
        |), fs AS (
        |  SELECT src_id, CAST(sum(icos) AS BIGINT) AS fsum
        |  FROM fwdk GROUP BY src_id
        |), bs AS (
        |  SELECT tgt_id, CAST(sum(icos) AS BIGINT) AS bsum
        |  FROM bwdk GROUP BY tgt_id
        |), cand AS (
        |  SELECT DISTINCT src_id, tgt_id, icos FROM (
        |    SELECT * FROM fwdk UNION ALL SELECT * FROM bwdk)
        |)
        |SELECT c.src_id AS src_id, c.tgt_id AS tgt_id, c.icos AS icos,
        |  8 * c.icos - fs.fsum - bs.bsum AS margin_x2k
        |FROM cand c
        |JOIN fs ON c.src_id = fs.src_id
        |JOIN bs ON c.tgt_id = bs.tgt_id
        |WHERE 8 * c.icos - fs.fsum - bs.bsum >= 0
        |ORDER BY src_id, tgt_id""".stripMargin,
    // planted-copy provable top-1 (see the registration comment): each
    // query's rank-1 neighbor is its identical copy at vec_id+100000
    "ann_lsh" ->
      """SELECT vec_id AS query_id, vec_id + 100000 AS neighbor_id
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    "ann_ivf" ->
      """SELECT vec_id AS query_id, vec_id + 100000 AS neighbor_id
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    "ann_pq" ->
      """SELECT vec_id AS query_id, vec_id + 100000 AS neighbor_id
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    "ann_ivfpq" ->
      """SELECT vec_id AS query_id, vec_id + 100000 AS neighbor_id
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    // append-path IVF: same planted-copy provable top-1 (centroids fit
    // on the base corpus; the copy still shares the query's probe list)
    "ann_ivf_incremental" ->
      """SELECT vec_id AS query_id, vec_id + 100000 AS neighbor_id
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    // planted-block k-means (see registration comment): the provably
    // exact assignment is the block id g = (vec_id·16 + 15) div n
    "embed_cluster_dist" -> kmeansDistOracleSql(k = 8, iters = 3, dim = 64),
    "embed_coreset" -> coresetOracleSql(k = 5),
    "embed_cluster_eval" -> clusterEvalOracleSql(k = 8, iters = 3, dim = 64),
    "graph_coloring" -> coloringOracleSql(rounds = 6),
    "graph_anf" -> anfOracleSql(maxHops = 2, b = 6),
    "graph_anf_radius" -> anfRadiusOracleSql(maxHops = 2, b = 6),
    "events_holt_winters" -> holtWintersOracleSql(period = 7),
    // upliftDeciles twin: same midpoint split, md5-nibble treatment,
    // pinned-order ntile, ppm rate differences over the decile frame
    "events_uplift" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), span AS (
        |  SELECT min(day) AS d0, max(day) AS d1 FROM ev
        |), pu AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN day < (d0 + d1 + 1) // 2
        |      THEN cents ELSE 0 END) AS BIGINT) AS score,
        |    CAST(MAX(CASE WHEN day >= (d0 + d1 + 1) // 2
        |      AND event_type = 'purchase' AND cents > 18000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |  FROM ev, span GROUP BY user_id
        |), t AS (
        |  SELECT *,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      AS BIGINT) >= 8 AS treated,
        |    CAST(ntile(10) OVER (ORDER BY score DESC, user_id)
        |      AS BIGINT) AS decile
        |  FROM pu
        |), d AS (
        |  SELECT decile,
        |    CAST(COALESCE(SUM(CASE WHEN treated THEN 1 END), 0)
        |      AS BIGINT) AS n_treated,
        |    CAST(COALESCE(SUM(CASE WHEN NOT treated THEN 1 END), 0)
        |      AS BIGINT) AS n_control,
        |    CAST(COALESCE(SUM(CASE WHEN treated THEN converted END), 0)
        |      AS BIGINT) AS conv_treated,
        |    CAST(COALESCE(SUM(CASE WHEN NOT treated THEN converted END),
        |      0) AS BIGINT) AS conv_control
        |  FROM t GROUP BY 1
        |), c AS (
        |  SELECT *,
        |    CAST(SUM(conv_treated) OVER w AS BIGINT) AS ct,
        |    CAST(SUM(conv_control) OVER w AS BIGINT) AS cc,
        |    CAST(SUM(n_treated) OVER w AS BIGINT) AS nt,
        |    CAST(SUM(n_control) OVER w AS BIGINT) AS nc
        |  FROM d WINDOW w AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT decile, n_treated, n_control, conv_treated, conv_control,
        |  (CASE WHEN n_treated = 0 THEN NULL
        |     ELSE 1000000 * conv_treated // n_treated END)
        |  - (CASE WHEN n_control = 0 THEN NULL
        |     ELSE 1000000 * conv_control // n_control END) AS uplift_ppm,
        |  (CASE WHEN nt = 0 THEN NULL ELSE 1000000 * ct // nt END)
        |  - (CASE WHEN nc = 0 THEN NULL ELSE 1000000 * cc // nc END)
        |    AS cum_uplift_ppm
        |FROM c ORDER BY decile""".stripMargin,
    "graph_coreness" -> corenessOracleSql(rounds = 6),
    "graph_louvain" -> louvainOracleSql(rounds = 6),
    "graph_louvain2" -> louvainTwoLevelOracleSql(rounds1 = 6, rounds2 = 4),
    "linkage_em" -> emLinkageOracleSql(rounds = 2,
      feats = Seq("f_bal_exact", "f_nation", "f_seg", "f_band")),
    "graph_mst" -> boruvkaOracleSql(rounds = 3, mergeCap = 6),
    // temporalReachability twin: unrolled hops, each a usable-edge min
    // relax (e.ts >= p.ea residual on the src equi-join) + a FULL OUTER
    // least() merge — least skips NULLs identically in both engines
    "graph_temporal_reach" -> {
      val hop = (r: Int) =>
        s"""x$r AS (
           |  SELECT e.dst AS id, CAST(min(e.ts) AS BIGINT) AS cand
           |  FROM e JOIN s$r p ON e.src = p.id AND e.ts >= p.ea
           |  GROUP BY e.dst
           |), s${r + 1} AS MATERIALIZED (
           |  SELECT coalesce(s.id, x.id) AS id,
           |    CAST(least(s.ea, x.cand) AS BIGINT) AS ea
           |  FROM s$r s FULL OUTER JOIN x$r x ON s.id = x.id
           |)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT l_orderkey AS src, l_partkey + 20000000 AS dst,
         |    CAST(epoch(l_shipdate) AS BIGINT) AS ts
         |  FROM lineitem
         |  UNION
         |  SELECT l_partkey + 20000000, l_orderkey,
         |    CAST(epoch(l_shipdate) AS BIGINT)
         |  FROM lineitem
         |), s0 AS (
         |  SELECT DISTINCT l_orderkey AS id, CAST(0 AS BIGINT) AS ea
         |  FROM lineitem WHERE l_orderkey < 100
         |), ${(0 until 4).map(hop).mkString(",\n")}
         |SELECT id, ea FROM s4 ORDER BY id""".stripMargin
    },
    "embed_cluster" ->
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings)
        |SELECT vec_id,
        |  CAST((vec_id * 16 + 15) // cnt AS BIGINT) AS cluster,
        |  count(*) OVER (PARTITION BY (vec_id * 16 + 15) // cnt) AS cluster_size
        |FROM embeddings, n ORDER BY vec_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        | CAST(length(text) AS BIGINT) AS n_chars_m,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_distinct,
        | CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
        |   / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS type_token_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS DOUBLE) AS nc,
        |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS np,
        |    CAST(length(text) - length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS ns,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE) AS sh,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS nt
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(nc AS BIGINT) AS n_chars_m,
        |  np / nc AS punct_ratio,
        |  ns / nc AS space_ratio,
        |  sh / nt AS stopword_ratio,
        |  least(nc / 500.0, 1.0) * 0.5 + least(sh / nt * 5.0, 1.0) * 0.3
        |    + (1.0 - least(np / nc * 10.0, 1.0)) * 0.2 AS quality_score
        |FROM b ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS BIGINT) AS hits_en,
        |    CAST(len(list_filter(toks, x -> list_contains(['der','und','die','das','ist'], x))) AS BIGINT) AS hits_de,
        |    CAST(len(list_filter(toks, x -> list_contains(['el','los','que','es','una'], x))) AS BIGINT) AS hits_es,
        |    CAST(len(list_filter(toks, x -> list_contains(['le','les','des','est','une'], x))) AS BIGINT) AS hits_fr,
        |    CAST(len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS BIGINT) AS hits_zh
        |  FROM t
        |), g AS (
        |  SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr, hits_zh) AS best FROM h
        |)
        |SELECT doc_id, hits_en, hits_de, hits_es, hits_fr, hits_zh,
        |  CASE WHEN hits_en = best AND best > 0 THEN 'en'
        |       WHEN hits_de = best AND best > 0 THEN 'de'
        |       WHEN hits_es = best AND best > 0 THEN 'es'
        |       WHEN hits_fr = best AND best > 0 THEN 'fr'
        |       WHEN hits_zh = best AND best > 0 THEN 'zh'
        |       ELSE 'und' END AS predicted_lang
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // langid-eval twin: the langid CTE joined back to truth labels,
    // window over the bounded confusion cells
    "text_langid_eval" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS BIGINT) AS hits_en,
        |    CAST(len(list_filter(toks, x -> list_contains(['der','und','die','das','ist'], x))) AS BIGINT) AS hits_de,
        |    CAST(len(list_filter(toks, x -> list_contains(['el','los','que','es','una'], x))) AS BIGINT) AS hits_es,
        |    CAST(len(list_filter(toks, x -> list_contains(['le','les','des','est','une'], x))) AS BIGINT) AS hits_fr,
        |    CAST(len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS BIGINT) AS hits_zh
        |  FROM t
        |), g AS (
        |  SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr, hits_zh) AS best FROM h
        |), pred AS (
        |  SELECT doc_id,
        |    CASE WHEN hits_en = best AND best > 0 THEN 'en'
        |         WHEN hits_de = best AND best > 0 THEN 'de'
        |         WHEN hits_es = best AND best > 0 THEN 'es'
        |         WHEN hits_fr = best AND best > 0 THEN 'fr'
        |         WHEN hits_zh = best AND best > 0 THEN 'zh'
        |         ELSE 'und' END AS predicted_lang
        |  FROM g
        |), cells AS (
        |  SELECT d.lang, p.predicted_lang, CAST(count(*) AS BIGINT) AS n
        |  FROM pred p JOIN documents d ON d.doc_id = p.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT lang, predicted_lang, n,
        |  CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
        |  CAST(1000000 * n // sum(n) OVER (PARTITION BY lang) AS BIGINT)
        |    AS cell_ppm
        |FROM cells ORDER BY lang, predicted_lang""".stripMargin,
    // degree-dist twin: same bit-length log2 axes, four integer sums,
    // ONE double division (NULL slope when degenerate)
    "graph_degree_dist" ->
      """WITH ed AS (
        |  SELECT DISTINCT l_orderkey AS src, l_partkey + 20000000 AS dst
        |  FROM lineitem
        |), deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT src AS id FROM ed UNION ALL SELECT dst FROM ed)
        |  GROUP BY 1
        |), buckets AS MATERIALIZED (
        |  SELECT CAST(length(ltrim(bin(deg), '0')) AS BIGINT) AS deg_bucket,
        |    CAST(count(*) AS BIGINT) AS n_nodes,
        |    min(deg) AS min_deg, max(deg) AS max_deg
        |  FROM deg GROUP BY 1
        |), pts AS (
        |  SELECT deg_bucket AS x,
        |    CAST(length(ltrim(bin(n_nodes), '0')) AS BIGINT) AS y
        |  FROM buckets
        |), sl AS (
        |  SELECT CASE WHEN count(*) * sum(x * x) - sum(x) * sum(x) <> 0
        |    THEN CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE) /
        |      CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
        |    END AS powerlaw_slope
        |  FROM pts
        |)
        |SELECT b.deg_bucket, b.n_nodes, b.min_deg, b.max_deg,
        |  sl.powerlaw_slope
        |FROM buckets b CROSS JOIN sl ORDER BY b.deg_bucket""".stripMargin,
    // isotropy twin: HUGEINT sums, identical cast-then-divide chain
    "embed_isotropy" ->
      """WITH comps AS (
        |  SELECT vec_id,
        |    CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS v6,
        |    dim
        |  FROM (
        |    SELECT vec_id,
        |      unnest(generate_series(1, len(embedding))) AS dim,
        |      unnest(embedding) AS v
        |    FROM embeddings)
        |), perdim AS (
        |  SELECT dim, sum(v6) AS s FROM comps GROUP BY 1
        |), a AS (
        |  SELECT sum(s * s) AS ssum FROM perdim
        |), b AS (
        |  SELECT sum(CAST(v6 AS HUGEINT) * v6) AS sq FROM comps
        |), c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
        |)
        |SELECT n,
        |  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1e12 AS mean_norm2,
        |  CASE WHEN n > 1 THEN
        |    CAST(ssum - sq AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 1e12
        |  END AS mean_dot,
        |  CASE WHEN CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1e12 > 0 THEN
        |    (CAST(ssum - sq AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 1e12) /
        |    (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1e12)
        |  END AS anisotropy
        |FROM c CROSS JOIN a CROSS JOIN b""".stripMargin,
    // scripts twin: identical codepoint intervals in RE2 \x{...}
    // spelling; length() counts codepoints in both engines
    "text_scripts" ->
      """WITH c AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS BIGINT) AS n_latin,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]',
        |      '', 'g')) AS BIGINT) AS n_cjk,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[0-9]', '', 'g')) AS BIGINT) AS n_digit
        |  FROM documents
        |)
        |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_cjk, n_digit,
        |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk
        |         AND n_latin > 0 THEN 'latin'
        |       WHEN n_cyrillic >= n_cjk AND n_cyrillic > 0 THEN 'cyrillic'
        |       WHEN n_cjk > 0 THEN 'cjk' ELSE 'none' END AS script,
        |  CAST(CASE WHEN n_latin > 0 THEN 1 ELSE 0 END +
        |    CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END +
        |    CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_scripts,
        |  (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END +
        |    CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END +
        |    CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END) > 1 AS mixed
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), ng AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1])) AS gram
        |  FROM toks WHERE len(t) >= 2
        |), per AS (
        |  SELECT doc_id, gram, count(*) AS c FROM ng GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_ngrams,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_ngram_frac,
        |  CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS distinct_ngram_ratio
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_pii" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or 555-0123 from 10.0.0.'
        |      || CAST(doc_id % 256 AS VARCHAR) AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\d{3}[-.]\d{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '[IP]', 'g'),
        |    '\d{3}[-.]\d{4}', '[PHONE]', 'g')) AS redacted_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    "text_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
        |  FROM toks WHERE len(t) >= 3
        |), bench AS (
        |  SELECT DISTINCT gram FROM sh WHERE doc_id < 20
        |)
        |SELECT s.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS contamination
        |FROM sh s LEFT JOIN bench b ON s.gram = b.gram
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), base AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
        |    CAST(len(list_distinct(toks)) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS type_token_ratio
        |  FROM t
        |), ng AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM t WHERE len(toks) >= 2
        |), per AS (
        |  SELECT doc_id, gram, count(*) AS c FROM ng GROUP BY 1, 2
        |), rep AS (
        |  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_ngram_frac
        |  FROM per GROUP BY 1
        |), j AS (
        |  SELECT b.doc_id, n_tokens, stopword_ratio, type_token_ratio,
        |    coalesce(r.top_ngram_frac, 0.0) AS top_ngram_frac
        |  FROM base b LEFT JOIN rep r ON b.doc_id = r.doc_id
        |), decided AS (
        |  SELECT *, CASE WHEN n_tokens < 10 THEN 'too_short'
        |       WHEN n_tokens > 1000 THEN 'too_long'
        |       WHEN stopword_ratio < 0.02 THEN 'low_stopword'
        |       WHEN top_ngram_frac > 0.20 THEN 'repetitive'
        |       WHEN type_token_ratio < 0.30 THEN 'low_diversity'
        |       ELSE 'ok' END AS reason
        |  FROM j
        |)
        |SELECT doc_id, n_tokens, stopword_ratio, type_token_ratio,
        |  top_ngram_frac, (reason = 'ok') AS keep, reason
        |FROM decided ORDER BY doc_id""".stripMargin,
    "text_topterms" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |    FROM documents)
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT doc_id, token, tf,
        |    count(*) OVER (PARTITION BY token) AS df,
        |    CAST(tf AS DOUBLE) / CAST(count(*) OVER (PARTITION BY token) AS DOUBLE) AS score
        |  FROM tf
        |), ranked AS (
        |  SELECT doc_id, token, tf, df, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, token) AS BIGINT) AS term_rank
        |  FROM scored
        |)
        |SELECT doc_id, term_rank, token, tf, df, score FROM ranked
        |WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,
    "text_rarity" ->
      """WITH posting AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |), counted AS (
        |  SELECT doc_id, count(*) OVER (PARTITION BY token) AS cnt FROM posting
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(cnt) AS BIGINT) AS sum_cnt, min(cnt) AS min_cnt,
        |  CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_cnt
        |FROM counted GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "corpus_stats" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(nt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tokens,
        |  CAST(quantile_cont(nt, 0.5) AS DOUBLE) AS p50_tokens,
        |  CAST(quantile_cont(nt, 0.9) AS DOUBLE) AS p90_tokens,
        |  min(nt) AS min_tokens, max(nt) AS max_tokens
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "source_mix" ->
      """WITH per AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2
        |)
        |SELECT source, lang, n_docs, n_tokens,
        |  CAST(n_tokens AS DOUBLE) /
        |    CAST((SELECT sum(n_tokens) FROM per) AS DOUBLE) AS token_share
        |FROM per ORDER BY source, lang""".stripMargin,
    // segmentation twin: same staged 8-token sentences, marker insert
    // via RE2 '\1' backreference + chr(1) split, 1-indexed positions
    "docs_sentences" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), blocks AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, CAST(ceil(len(t)/8.0) AS BIGINT)))
        |      AS i, t
        |  FROM toks
        |), bp AS (
        |  SELECT doc_id, i,
        |    array_to_string(t[(i-1)*8+1:(i-1)*8+8], ' ') AS blk
        |  FROM blocks
        |), staged AS (
        |  SELECT doc_id, string_agg(blk, '. ' ORDER BY i) || '.' AS text
        |  FROM bp GROUP BY doc_id
        |), sp AS (
        |  SELECT doc_id, string_split(regexp_replace(text,
        |    '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)) AS l
        |  FROM staged
        |), se AS (
        |  SELECT doc_id, i - 1 AS sent_idx, l[i] AS s
        |  FROM sp, UNNEST(range(1, len(l) + 1)) AS u(i)
        |)
        |SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, s AS sentence,
        |  CAST(length(s) AS BIGINT) AS n_chars
        |FROM se WHERE length(trim(s)) > 0
        |ORDER BY doc_id, sent_idx""".stripMargin,
    // skip-gram twin: 1-indexed list positions (offsets are engine-local,
    // never emitted), same support floors, integer ratio via //
    "text_pmi" ->
      """WITH dl AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, i AS pos, l[i] AS token
        |  FROM dl, UNNEST(range(1, len(l) + 1)) AS u(i)
        |  WHERE length(l[i]) > 0
        |), pairs AS (
        |  SELECT a.token AS tok_a, b.token AS tok_b
        |  FROM tok a JOIN tok b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  UNION ALL
        |  SELECT a.token, b.token
        |  FROM tok a JOIN tok b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 2
        |), pc AS (
        |  SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS n_pair
        |  FROM pairs GROUP BY 1, 2
        |), uni AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS n_tok FROM tok GROUP BY 1
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM tok
        |)
        |SELECT tok_a, tok_b, n_pair, ua.n_tok AS n_a, ub.n_tok AS n_b,
        |  n_pair * (SELECT n FROM tot) * 1000000 // (ua.n_tok * ub.n_tok)
        |    AS ratio_ppm
        |FROM pc
        |JOIN uni ua ON pc.tok_a = ua.token
        |JOIN uni ub ON pc.tok_b = ub.token
        |WHERE n_pair >= 3 AND ua.n_tok >= 5 AND ub.n_tok >= 5
        |ORDER BY ratio_ppm DESC, tok_a, tok_b LIMIT 40""".stripMargin,
    // TextRank twin: the graph_pagerank round macro over the word
    // co-occurrence edge list; MATERIALIZED on the per-round inputs so
    // DuckDB's per-reference CTE inlining cannot recompute the token
    // self-join every round
    "text_textrank" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT n.id, 150000000000 + (85 * COALESCE(c.cin, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT ed.dst, CAST(SUM(p.r // ed.outdeg) AS BIGINT) AS cin
           |    FROM ed JOIN $prev p ON p.id = ed.src GROUP BY ed.dst
           |  ) c ON n.id = c.dst
           |)""".stripMargin
      s"""WITH dl AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS l
         |  FROM documents
         |), tok AS (
         |  SELECT doc_id, i AS pos, l[i] AS token
         |  FROM dl, UNNEST(range(1, len(l) + 1)) AS u(i)
         |  WHERE length(l[i]) > 0
         |), co AS (
         |  SELECT a.token AS src, b.token AS dst FROM tok a JOIN tok b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  UNION ALL
         |  SELECT a.token, b.token FROM tok a JOIN tok b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 2
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM co WHERE src <> dst
         |    UNION ALL SELECT dst, src FROM co WHERE src <> dst) z
         |), nodes AS MATERIALIZED (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), deg AS (
         |  SELECT src, count(*) AS outdeg FROM e GROUP BY 1
         |), ed AS MATERIALIZED (
         |  SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)
         |), r0 AS (
         |  SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM nodes
         |), ${round("r0", "r1")},
         |${round("r1", "r2")},
         |${round("r2", "r3")}
         |SELECT rk, term, rank_scaled FROM (
         |  SELECT CAST(row_number() OVER (ORDER BY r DESC, id) AS BIGINT)
         |    AS rk, id AS term, r AS rank_scaled
         |  FROM r3) z
         |WHERE rk <= 20 ORDER BY rk""".stripMargin
    },
    // Heaps twin: same first-occurrence formulation; // is DuckDB
    // integer division (both floor on non-negative doc ids)
    "corpus_heaps" ->
      """WITH tok AS (
        |  SELECT doc_id, t AS token FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |    FROM documents
        |  ) u WHERE length(t) > 0
        |), pb AS (
        |  SELECT doc_id // 10 AS bucket, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM tok GROUP BY 1
        |), nt AS (
        |  SELECT first_doc // 10 AS bucket,
        |    CAST(count(*) AS BIGINT) AS new_types
        |  FROM (SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY 1) f
        |  GROUP BY 1
        |), j AS (
        |  SELECT CAST(pb.bucket AS BIGINT) AS bucket, n_tokens,
        |    CAST(coalesce(new_types, 0) AS BIGINT) AS new_types
        |  FROM pb LEFT JOIN nt ON pb.bucket = nt.bucket
        |)
        |SELECT bucket, n_tokens, new_types,
        |  CAST(sum(n_tokens) OVER (ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |  CAST(sum(new_types) OVER (ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
        |FROM j ORDER BY bucket""".stripMargin,
    // Zipf twin: bit-length log2 on both axes (portable unpadded form),
    // exact integer regression sums, one final double division
    "corpus_zipf" ->
      """WITH freqs AS (
        |  SELECT t AS token, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS t
        |    FROM documents
        |  ) u WHERE length(t) > 0 GROUP BY 1
        |), ranked AS (
        |  SELECT CAST(length(ltrim(bin(CAST(row_number() OVER (
        |      ORDER BY freq DESC, token) AS BIGINT)), '0')) AS BIGINT) AS lr,
        |    CAST(length(ltrim(bin(freq), '0')) AS BIGINT) AS lf, freq
        |  FROM freqs
        |), sl AS (
        |  SELECT CAST(count(*) * sum(lr * lf) - sum(lr) * sum(lf) AS DOUBLE)
        |    / CAST(count(*) * sum(lr * lr) - sum(lr) * sum(lr) AS DOUBLE)
        |    AS zipf_slope
        |  FROM ranked
        |)
        |SELECT lr AS rank_bucket, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(freq) AS BIGINT) AS sum_freq, max(freq) AS max_freq,
        |  min(freq) AS min_freq, zipf_slope
        |FROM ranked, sl GROUP BY lr, zipf_slope
        |ORDER BY rank_bucket""".stripMargin,
    // best-vs-worst twin: rank windows are fine in the oracle (it does
    // not need the partial-agg trick); tie-breaks match the struct
    // argmin/argmax (score then smaller doc_id on both ends)
    "pref_pairs" ->
      """WITH scored AS (
        |  SELECT source, doc_id,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |      AS BIGINT) * 1000000 // greatest(length(text), 1) AS score
        |  FROM documents
        |), r AS (
        |  SELECT source, doc_id, score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS rb,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score ASC, doc_id) AS rw
        |  FROM scored
        |)
        |SELECT b.source AS source, b.doc_id AS chosen_id,
        |  b.score AS chosen_score, w.doc_id AS rejected_id,
        |  w.score AS rejected_score, b.score - w.score AS margin
        |FROM r b JOIN r w ON b.source = w.source AND b.rb = 1 AND w.rw = 1
        |WHERE b.score - w.score >= 1 AND b.doc_id <> w.doc_id
        |ORDER BY source""".stripMargin,
    // novelty twin: the ng CTE's list_distinct bigrams split by parity,
    // NULL-extended anti join, one-row counts
    "text_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), ng AS (
        |  SELECT doc_id % 2 = 0 AS train, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1]))) AS g
        |  FROM toks WHERE len(t) >= 2
        |), tr AS MATERIALIZED (
        |  SELECT DISTINCT g FROM ng WHERE train
        |), te AS MATERIALIZED (
        |  SELECT DISTINCT g FROM ng WHERE NOT train
        |), nov AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_novel
        |  FROM te LEFT JOIN tr ON tr.g = te.g WHERE tr.g IS NULL
        |)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_train_grams,
        |  (SELECT CAST(count(*) AS BIGINT) FROM te) AS n_test_grams,
        |  nov.n_novel,
        |  1000000 * nov.n_novel
        |    // (SELECT CAST(count(*) AS BIGINT) FROM te) AS novelty_ppm
        |FROM nov""".stripMargin,
    "text_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), ng AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1]))) AS ngram
        |  FROM toks WHERE len(t) >= 2
        |)
        |SELECT ngram, count(*) AS doc_freq FROM ng
        |GROUP BY 1 ORDER BY doc_freq DESC, ngram LIMIT 100""".stripMargin,
    "text_bpe" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '\p{L}+')) AS BIGINT) AS n_word_toks,
        | CAST(len(regexp_extract_all(text, '\p{N}+')) AS BIGINT) AS n_num_toks,
        | CAST(len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS BIGINT) AS n_other_toks,
        | CAST(len(regexp_extract_all(text, '\p{L}+')) + len(regexp_extract_all(text, '\p{N}+'))
        |   + len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS BIGINT) AS n_bpe_toks
        |FROM documents ORDER BY doc_id""".stripMargin,
    "split_assign" ->
      """SELECT doc_id,
        | CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'valid'
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test'
        |      ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "label_balance" ->
      """SELECT label, count(*) AS n,
        | CAST(count(*) AS DOUBLE) / (SELECT CAST(count(*) AS DOUBLE) FROM embeddings) AS fraction
        |FROM embeddings GROUP BY 1 ORDER BY label""".stripMargin,
    // fixed-point centroid sums: floor(v*1e6) BIGINT per element, so the
    // aggregation is reduction-order-free in both engines; DuckDB zips
    // parallel unnests for the (value, position) pairing
    "label_centroids" ->
      """WITH cells AS (
        |  SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    unnest(embedding) AS v
        |  FROM embeddings
        |)
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  CAST(CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |    / (CAST(count(*) AS DOUBLE) * 1000000.0) AS centroid
        |FROM cells GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    // compression twin: strlen == octet length for VARCHAR in DuckDB
    "text_compression" ->
      """WITH t AS (
        |  SELECT source, CAST(strlen(text) AS BIGINT) AS b,
        |    CAST(len(regexp_extract_all(text, '\p{L}+')) +
        |      len(regexp_extract_all(text, '\p{N}+')) +
        |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]'))
        |      AS BIGINT) AS t
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(b) AS BIGINT) AS n_bytes,
        |  CAST(sum(t) AS BIGINT) AS n_tokens,
        |  CAST(1000000 * sum(b) // greatest(1, sum(t)) AS BIGINT)
        |    AS bytes_per_token_ppm
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // decay twin: identical bit-shift weight, window over bounded cells
    "events_decay" ->
      """WITH cells AS (
        |  SELECT event_type, (epoch_us(ts) // 1000000) // 86400 AS day0,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), aged AS (
        |  SELECT event_type, n,
        |    least(max(day0) OVER () - day0, 19) AS age
        |  FROM cells
        |)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(n * (1000000 // (1 << CAST(age AS INT)))) AS BIGINT)
        |    AS decayed_e6
        |FROM aged GROUP BY event_type ORDER BY event_type""".stripMargin,
    // neighbor-agg twin: hop-2 composes on the MATERIALIZED hop-1 frame
    // (referenced twice: output + the hop-2 join)
    "graph_neighbor_agg" ->
      """WITH ed AS (
        |  SELECT DISTINCT l_orderkey AS src, l_partkey + 20000000 AS dst
        |  FROM lineitem
        |), e0 AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed
        |), feats AS (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS f
        |  FROM e0 GROUP BY 1
        |), h1 AS MATERIALIZED (
        |  SELECT e.src AS id, CAST(count(*) AS BIGINT) AS deg,
        |    CAST(sum(f.f) AS BIGINT) AS h1_sum,
        |    min(f.f) AS h1_min, max(f.f) AS h1_max
        |  FROM e0 e JOIN feats f ON f.id = e.dst GROUP BY 1
        |), h2 AS (
        |  SELECT e.src AS id, CAST(sum(h.h1_sum) AS BIGINT) AS h2_sum
        |  FROM e0 e JOIN h1 h ON h.id = e.dst GROUP BY 1
        |)
        |SELECT h1.id, h1.deg, h1.h1_sum, h1.h1_min, h1.h1_max, h2.h2_sum
        |FROM h1 LEFT JOIN h2 ON h2.id = h1.id
        |ORDER BY h1.id""".stripMargin,
    // outlier twin: same integer surrogates (floor(v*1e6) components,
    // floored integer centroid, exact integer d2); the outlier product
    // lifts to HUGEINT where Spark compares through DECIMAL(38,0) —
    // both exact integers, identical verdicts
    "embed_outliers" ->
      """WITH comps AS (
        |  SELECT vec_id, label, CAST(dim AS BIGINT) AS dim,
        |    CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS v6
        |  FROM (
        |    SELECT vec_id, label,
        |      unnest(generate_series(1, len(embedding))) AS dim,
        |      unnest(embedding) AS v
        |    FROM embeddings)
        |), cent AS (
        |  SELECT label, dim, CAST((sum(v6) + 1000000000 * count(*))
        |    // count(*) - 1000000000 AS BIGINT) AS c6
        |  FROM comps GROUP BY 1, 2
        |), d AS (
        |  SELECT c.vec_id, c.label,
        |    CAST(sum((c.v6 - t.c6) * (c.v6 - t.c6)) AS BIGINT) AS d2
        |  FROM comps c JOIN cent t USING (label, dim)
        |  GROUP BY 1, 2
        |), stats AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n, sum(d2) AS sum_d2
        |  FROM d GROUP BY 1
        |)
        |SELECT d.vec_id, d.label, d.d2,
        |  CAST(d.d2 AS HUGEINT) * s.n > 4 * CAST(s.sum_d2 AS HUGEINT)
        |    AS is_outlier
        |FROM d JOIN stats s USING (label) ORDER BY vec_id""".stripMargin,
    // thresholds are the registered rates mapped to 8 hex digits:
    // 0.0 -> 00000000 (keeps none under strict <), 0.25 -> 40000000,
    // 0.5 -> 80000000; default rate 1.0 keeps everything
    "mixture_resample" ->
      """SELECT doc_id, source FROM documents
        |WHERE CASE
        |  WHEN source = 'src0' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '00000000'
        |  WHEN source = 'src1' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
        |  WHEN source = 'src2' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
        |  ELSE TRUE END
        |ORDER BY doc_id""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source AS shard,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, shard, n_toks,
        |    COALESCE(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks, 0) AS start_off
        |  FROM t
        |)
        |SELECT doc_id, shard, n_toks,
        |  CAST(start_off // 256 AS BIGINT) AS seq_id,
        |  CAST(start_off % 256 AS BIGINT) AS seq_offset,
        |  (n_toks > 0 AND (start_off // 256) <> ((start_off + n_toks - 1) // 256))
        |    AS crosses_boundary
        |FROM c ORDER BY doc_id""".stripMargin,
    // (n_toks DESC, doc_id) is a total order, so the default RANGE frame
    // == ROWS in both engines (no peer rows); div/`//` truncation agrees
    "pack_batches" ->
      """WITH t AS (
        |  SELECT doc_id, source AS shard,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, shard, n_toks,
        |    CAST((sum(n_toks) OVER (PARTITION BY shard
        |      ORDER BY n_toks DESC, doc_id) - n_toks) // 512 AS BIGINT)
        |      AS batch_id
        |  FROM t
        |), b AS (
        |  SELECT shard, batch_id, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS batch_tokens,
        |    CAST(max(n_toks) AS BIGINT) AS max_len
        |  FROM c GROUP BY shard, batch_id
        |)
        |SELECT shard, batch_id, n_docs, batch_tokens, max_len,
        |  max_len * n_docs AS padded_tokens,
        |  CASE WHEN max_len * n_docs = 0 THEN 0
        |    ELSE (max_len * n_docs - batch_tokens) * 1000000
        |      // (max_len * n_docs) END AS waste_ppm
        |FROM b ORDER BY shard, batch_id""".stripMargin,
    // the text_keyphrases generate_series ordinality pattern; boundary
    // cuts AFTER its token, so chunk_idx counts boundaries strictly
    // before the position (1-PRECEDING window frame)
    "dedup_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t))) AS p, t FROM t
        |), tok AS (
        |  SELECT doc_id, p - 1 AS pos, t[p] AS tok FROM p
        |), b AS (
        |  SELECT doc_id, pos, tok,
        |    CASE WHEN CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 32 = 0
        |      THEN 1 ELSE 0 END AS boundary
        |  FROM tok
        |), c AS (
        |  SELECT doc_id, pos, tok,
        |    COALESCE(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk_idx
        |  FROM b
        |)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(count(*) AS BIGINT) AS n_toks,
        |  md5(string_agg(tok, ' ' ORDER BY pos)) AS checksum
        |FROM c GROUP BY doc_id, chunk_idx
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text/plain' AS mime,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,
    // block-hash twin: DuckDB's md5 is VARCHAR-only, but the corpus is
    // ASCII so byte slices == char slices and the text-side signature is
    // bit-identical to Spark's binary-side one (14 nibble terms are
    // generated to mirror Multimodal.blockHashSignature exactly)
    "multimodal_phash" ->
      s"""WITH ${phashSigCtes(withExactCopies = false)}
         |SELECT a.media_id AS a_id, b.media_id AS b_id,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM s a JOIN s b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 4
         |ORDER BY a_id, b_id""".stripMargin,
    // same signature CTEs + the recursive-CC walk of clustersOracleSql:
    // pair edges → components → min-id representative per component
    "multimodal_dedup" ->
      s"""WITH RECURSIVE ${phashSigCtes(withExactCopies = true)}
         |, p AS (
         |  SELECT a.media_id AS a_id, b.media_id AS b_id
         |  FROM s a JOIN s b ON a.media_id < b.media_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 4
         |), nodes AS (
         |  SELECT a_id AS id FROM p UNION SELECT b_id FROM p
         |), edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM p
         |  UNION ALL SELECT b_id, a_id FROM p
         |), walk(id, label) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id
         |), cc AS (
         |  SELECT id, min(label) AS cluster_id FROM walk GROUP BY id
         |)
         |SELECT m.media_id,
         |  COALESCE(cc.cluster_id, m.media_id) AS cluster_id,
         |  m.media_id = COALESCE(cc.cluster_id, m.media_id) AS is_representative
         |FROM s m LEFT JOIN cc ON m.media_id = cc.id
         |ORDER BY media_id""".stripMargin,
    "events_sessions" ->
      """WITH e AS (
        |  -- floor, not CAST: epoch() is a fractional DOUBLE on sub-second
        |  -- timestamps and CAST rounds while Spark's integer div floors
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events
        |), l AS (
        |  SELECT *, lag(secs) OVER (PARTITION BY user_id ORDER BY secs, event_id) AS prev
        |  FROM e
        |), s AS (
        |  SELECT *, CASE WHEN prev IS NULL OR secs - prev > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM l
        |), t AS (
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY secs, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(secs) AS session_start, max(secs) AS session_end
        |FROM t GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
    "part_stats" ->
      """SELECT p_brand, count(*) AS n_parts,
        | CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | min(p_retailprice) AS min_price,
        | max(p_retailprice) AS max_price,
        | CAST(sum(p_size) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_size
        |FROM part GROUP BY 1 ORDER BY p_brand""".stripMargin,
    "supplier_nation" ->
      """SELECT n_name, count(*) AS n_suppliers,
        | CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY n_name""".stripMargin,
    "events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
        | event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin,
    "events_trailing" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts, value FROM events
        |)
        |SELECT event_id, user_id,
        |  count(*) OVER w AS trailing_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trailing_value
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "events_range" ->
      """WITH w AS (
        |  SELECT event_id AS interval_id, user_id, epoch_us(ts) AS start_ts,
        |    epoch_us(ts) + 3600000000 AS end_ts
        |  FROM events WHERE event_type = 'purchase'
        |), p AS (
        |  SELECT user_id, epoch_us(ts) AS ts FROM events
        |  WHERE event_type <> 'purchase'
        |)
        |SELECT interval_id, count(*) AS n_events,
        |  min(p.ts) AS first_ts, max(p.ts) AS last_ts
        |FROM w JOIN p ON w.user_id = p.user_id
        |  AND p.ts >= w.start_ts AND p.ts <= w.end_ts
        |GROUP BY interval_id ORDER BY interval_id""".stripMargin,
    "events_asof" ->
      """WITH probe AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts FROM events
        |  WHERE event_type <> 'purchase'
        |), state AS (
        |  SELECT user_id, epoch_us(ts) AS ts, value FROM events
        |  WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.ts,
        |  s.ts AS asof_time, s.value AS asof_value
        |FROM probe p ASOF LEFT JOIN state s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts
        |ORDER BY event_id""".stripMargin,
    // forward twin: DuckDB ASOF accepts the >= direction natively
    // (nearest FOLLOWING state, inclusive at equal timestamps)
    "events_asof_forward" ->
      """WITH probe AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts FROM events
        |  WHERE event_type <> 'purchase'
        |), state AS (
        |  SELECT user_id, epoch_us(ts) AS ts, value FROM events
        |  WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.ts,
        |  s.ts AS next_time, s.value AS next_value
        |FROM probe p ASOF LEFT JOIN state s
        |  ON p.user_id = s.user_id AND s.ts >= p.ts
        |ORDER BY event_id""".stripMargin,
    // SCD2-PIT twin: identical change-log staging + collapse, ASOF LEFT
    // JOIN against version valid_from (intervals partition time, so
    // as-of == containment)
    "events_scd2_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts, event_type
        |  FROM events
        |), log AS (
        |  SELECT user_id, ts AS seq, event_id AS tie,
        |    'tier' || CAST(CAST('0x' || substr(md5(
        |      CAST(user_id AS VARCHAR) || ':' || CAST(ts AS VARCHAR)),
        |      1, 8) AS BIGINT) % 3 AS VARCHAR) AS tier
        |  FROM ev WHERE event_type = 'signup'
        |), chg AS (
        |  SELECT user_id, tier, seq FROM (
        |    SELECT user_id, tier, seq,
        |      lag(tier) OVER (PARTITION BY user_id ORDER BY seq, tie) AS p
        |    FROM log
        |  ) x WHERE p IS NULL OR p <> tier
        |), hist AS (
        |  SELECT user_id, tier, seq AS ts,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq)
        |      AS BIGINT) AS version
        |  FROM chg
        |), probe AS (
        |  SELECT event_id, user_id, ts FROM ev
        |  WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
        |  h.ts AS asof_time, h.tier AS asof_tier, h.version AS asof_version
        |FROM probe p
        |ASOF LEFT JOIN hist h ON p.user_id = h.user_id AND h.ts <= p.ts
        |ORDER BY event_id""".stripMargin,
    // point-in-time twin: two chained ASOF LEFT JOINs against the same
    // (user,ts)-unique pre-aggregated states; <= matches joinAsOf's
    // state-sorts-first tag ordering
    "features_pit" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts, event_type, value
        |  FROM events
        |), probe AS (
        |  SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
        |), vs AS (
        |  SELECT user_id, ts, max(value) AS view_value
        |  FROM ev WHERE event_type = 'view' GROUP BY 1, 2
        |), cc AS (
        |  SELECT user_id, ts,
        |    CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS clicks_so_far
        |  FROM (
        |    SELECT user_id, ts, CAST(count(*) AS BIGINT) AS c
        |    FROM ev WHERE event_type = 'click' GROUP BY 1, 2
        |  ) t
        |)
        |SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
        |  v.ts AS view_time, v.view_value AS asof_view_value,
        |  c.ts AS click_time, c.clicks_so_far AS asof_clicks_so_far
        |FROM probe p
        |ASOF LEFT JOIN vs v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ASOF LEFT JOIN cc c ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY event_id""".stripMargin,
    // windowed twin: same greedy join chain with the <= prev + W bound
    "events_funnel_windowed" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts) AS step_ts FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS step_ts FROM ev e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.step_ts
        |    AND e.ts <= s1.step_ts + 259200000000 GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS step_ts FROM ev e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s2.step_ts
        |    AND e.ts <= s2.step_ts + 259200000000 GROUP BY 1
        |), s4 AS (
        |  SELECT e.user_id, min(e.ts) AS step_ts FROM ev e
        |  JOIN s3 ON e.user_id = s3.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.step_ts
        |    AND e.ts <= s3.step_ts + 259200000000 GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step_name,
        |    count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'view', count(*) FROM s2
        |  UNION ALL SELECT 3, 'click', count(*) FROM s3
        |  UNION ALL SELECT 4, 'purchase', count(*) FROM s4
        |) u ORDER BY step_idx""".stripMargin,
    "events_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts) AS step_ts FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS step_ts FROM ev e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.step_ts GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS step_ts FROM ev e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s2.step_ts GROUP BY 1
        |), s4 AS (
        |  SELECT e.user_id, min(e.ts) AS step_ts FROM ev e
        |  JOIN s3 ON e.user_id = s3.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.step_ts GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step_name, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'view', count(*) FROM s2
        |  UNION ALL SELECT 3, 'click', count(*) FROM s3
        |  UNION ALL SELECT 4, 'purchase', count(*) FROM s4
        |) ORDER BY step_idx""".stripMargin,
    "events_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), cohorts AS (
        |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1
        |)
        |SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM ev e JOIN cohorts c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    // md5-parity variant split (independent md5 per engine); the z-score
    // float chain starts from exact BIGINTs and every op is
    // correctly-rounded, so even the doubles hash-match
    "events_ab" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 180
        |      THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1
        |), v AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      AS BIGINT) < 8 THEN 'A' ELSE 'B' END AS variant, converted
        |  FROM pu
        |), w AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM v
        |)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        |  CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        |  (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |     * (CAST('1' AS DOUBLE)
        |        - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |     * (CAST('1' AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        + CAST('1' AS DOUBLE) / CAST(n_b AS DOUBLE))) AS z_score
        |FROM w""".stripMargin,
    // permutation twin: identical md5 relabels over generate_series,
    // identical integer stat and add-one p
    "events_permutation" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 180
        |      THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1
        |), w AS (
        |  SELECT
        |    CAST(sum(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN va THEN converted ELSE 0 END) AS BIGINT)
        |      AS conv_a,
        |    CAST(sum(CASE WHEN va THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN va THEN 0 ELSE converted END) AS BIGINT)
        |      AS conv_b
        |  FROM (SELECT converted,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      AS BIGINT) < 8 AS va FROM pu)
        |), ob AS (
        |  SELECT n_a, conv_a, n_b, conv_b,
        |    conv_a * n_b - conv_b * n_a AS t_obs FROM w
        |), pw AS (
        |  SELECT r,
        |    CAST(sum(CASE WHEN va THEN conv ELSE 0 END) AS BIGINT)
        |      * CAST(sum(CASE WHEN va THEN 0 ELSE 1 END) AS BIGINT)
        |    - CAST(sum(CASE WHEN va THEN 0 ELSE conv END) AS BIGINT)
        |      * CAST(sum(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS t_r
        |  FROM (
        |    SELECT g.r, u.converted AS conv,
        |      CAST('0x' || substr(md5('perm' || CAST(g.r AS VARCHAR)
        |        || ':' || CAST(u.user_id AS VARCHAR)), 1, 1)
        |        AS BIGINT) < 8 AS va
        |    FROM pu u CROSS JOIN generate_series(1, 200) AS g(r))
        |  GROUP BY r
        |)
        |SELECT ob.n_a, ob.conv_a, ob.n_b, ob.conv_b, ob.t_obs,
        |  CAST(sum(CASE WHEN abs(pw.t_r) >= abs(ob.t_obs)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
        |  CAST(1000000 * (sum(CASE WHEN abs(pw.t_r) >= abs(ob.t_obs)
        |    THEN 1 ELSE 0 END) + 1) // 201 AS BIGINT) AS p_ppm
        |FROM pw, ob
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    // Welch twin: identical cent moments (HUGEINT sums == the Spark
    // DECIMAL(28,0) sums), identical double expression tree
    "events_welch" ->
      """WITH r0 AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      AS BIGINT) < 8 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(floor(value * 100) AS BIGINT) AS x
        |  FROM events
        |), cells AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS n, sum(x) AS s,
        |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS ss
        |  FROM r0 GROUP BY 1
        |), w AS (
        |  SELECT
        |    CAST(coalesce(sum(CASE WHEN variant = 'A' THEN n END), 0)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 'A' THEN s END) AS DOUBLE) AS sa,
        |    CAST(sum(CASE WHEN variant = 'A' THEN ss END) AS DOUBLE) AS ssa,
        |    CAST(coalesce(sum(CASE WHEN variant = 'B' THEN n END), 0)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 'B' THEN s END) AS DOUBLE) AS sb,
        |    CAST(sum(CASE WHEN variant = 'B' THEN ss END) AS DOUBLE) AS ssb
        |  FROM cells
        |), c1 AS (
        |  SELECT n_a, n_b, sa, sb,
        |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        |    (CAST(n_a AS DOUBLE) * ssa - sa * sa)
        |      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1)) AS va,
        |    (CAST(n_b AS DOUBLE) * ssb - sb * sb)
        |      / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1)) AS vb
        |  FROM w
        |), c2 AS (
        |  SELECT n_a, n_b, sa, sb, na, nb,
        |    va / na AS sea, vb / nb AS seb
        |  FROM c1
        |)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN sa / na END AS mean_a_cents,
        |  CASE WHEN n_b > 0 THEN sb / nb END AS mean_b_cents,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND (sea + seb) > 0
        |    THEN (sa / na - sb / nb) / sqrt(sea + seb) END AS t_welch,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND (sea + seb) > 0
        |    THEN (sea + seb) * (sea + seb)
        |      / (sea * sea / (na - 1) + seb * seb / (nb - 1)) END
        |    AS df_welch
        |FROM c2 ORDER BY n_a""".stripMargin,
    // Q6 twin: identical predicate set; revenue through the same
    // DECIMAL(18,4) exact-sum recipe as q1's disc price
    "q6_selective" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND floor(l_discount * 100) BETWEEN 5 AND 7
        |  AND l_quantity < 24
        |ORDER BY n_rows""".stripMargin,
    // exact OLS sufficient statistics; x centered on the type's first day
    "events_trend" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events
        |), daily AS (
        |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS y FROM ev GROUP BY 1, 2
        |), xd AS (
        |  SELECT event_type, day - min(day) OVER (PARTITION BY event_type) AS x, y
        |  FROM daily
        |), st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM xd GROUP BY 1
        |)
        |SELECT event_type, n_days, sy AS n_events,
        |  CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
        |    ELSE CAST(n_days * sxy - sx * sy AS DOUBLE)
        |      / CAST(n_days * sxx - sx * sx AS DOUBLE) END AS slope,
        |  CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
        |    ELSE CAST(sy * sxx - sx * sxy AS DOUBLE)
        |      / CAST(n_days * sxx - sx * sx AS DOUBLE) END AS intercept
        |FROM st ORDER BY event_type""".stripMargin,
    // the sequential integer fold as a recursive CTE; // matches Spark's
    // div (truncation toward zero) including on negative deltas
    "events_ewma" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, CAST(floor(value * 100) AS BIGINT) * 1000000 AS x,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events
        |), cnt AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM seq GROUP BY 1
        |), r AS (
        |  SELECT user_id, x AS s, CAST(1 AS BIGINT) AS i FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.s + (seq.x - r.s) // 8, r.i + 1
        |  FROM r JOIN seq ON seq.user_id = r.user_id AND seq.rn = r.i + 1
        |)
        |SELECT r.user_id, cnt.n AS n_events, r.s AS ewma_scaled,
        |  CAST(r.s AS DOUBLE) / CAST(100000000 AS DOUBLE) AS ewma
        |FROM r JOIN cnt USING (user_id)
        |WHERE r.i = cnt.n ORDER BY user_id""".stripMargin,
    "events_daily_topk" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events
        |), cells AS (
        |  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY 1, 2
        |), rk AS (
        |  SELECT day, event_type, n,
        |    CAST(row_number() OVER (PARTITION BY day
        |      ORDER BY n DESC, event_type) AS BIGINT) AS rank
        |  FROM cells
        |)
        |SELECT day, event_type, n, rank FROM rk
        |WHERE rank <= 3 ORDER BY day, rank""".stripMargin,
    // first/last election is the row_number twin of min/max(struct);
    // linear ppm is integer 1e6 // n (truncation identical to Spark div)
    "events_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts, event_type
        |  FROM events
        |), convs AS (
        |  SELECT user_id, event_id AS conv_id, ts AS conv_ts
        |  FROM ev WHERE event_type = 'purchase'
        |), touches AS (
        |  SELECT user_id, event_id AS touch_id, ts AS touch_ts,
        |    event_type AS touch_type
        |  FROM ev WHERE event_type IN ('click', 'view')
        |), pairs AS (
        |  SELECT c.conv_id, t.touch_id, t.touch_ts, t.touch_type
        |  FROM convs c JOIN touches t ON c.user_id = t.user_id
        |    AND t.touch_ts <= c.conv_ts
        |    AND t.touch_ts > c.conv_ts - 604800000000
        |), rk AS (
        |  SELECT conv_id, touch_id, touch_type,
        |    CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT)
        |      AS n_touches,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY touch_ts, touch_id) AS rf,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY touch_ts DESC, touch_id DESC) AS rl
        |  FROM pairs
        |)
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
        |  CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS first_touch_wins,
        |  CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS last_touch_wins,
        |  CAST(sum(1000000 // n_touches) AS BIGINT) AS linear_credit_ppm
        |FROM rk GROUP BY 1 ORDER BY touch_type""".stripMargin,
    "events_ohlc" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    epoch_us(ts) AS ts, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
        |  FROM events
        |), rk AS (
        |  SELECT user_id, day, v100,
        |    row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY ts, event_id) AS rf,
        |    row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM ev
        |)
        |SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN rf = 1 THEN v100 ELSE 0 END) AS BIGINT)
        |    AS open_c,
        |  CAST(max(v100) AS BIGINT) AS high_c,
        |  CAST(min(v100) AS BIGINT) AS low_c,
        |  CAST(sum(CASE WHEN rl = 1 THEN v100 ELSE 0 END) AS BIGINT)
        |    AS close_c,
        |  CAST(sum(v100) AS BIGINT) AS sum_c
        |FROM rk GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,
    // quarantine twin: concat_ws skips non-violated NULL slots in
    // declaration order identically
    "dq_quarantine" ->
      """WITH tagged AS (
        |  SELECT concat_ws(',',
        |    CASE WHEN l_quantity IS NOT NULL
        |      AND (l_quantity < 1 OR l_quantity > 40)
        |      THEN 'in_range:l_quantity' END,
        |    CASE WHEN l_discount IS NOT NULL
        |      AND (l_discount < 0 OR l_discount > 0.05)
        |      THEN 'in_range:l_discount' END) AS reasons
        |  FROM lineitem
        |)
        |SELECT reasons <> '' AS quarantined, reasons,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM tagged GROUP BY 1, 2
        |ORDER BY quarantined, reasons""".stripMargin,
    "dq_orphans" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_linenumber = 7 THEN l_orderkey + 100000000
        |    WHEN l_linenumber = 6 THEN NULL ELSE l_orderkey END AS fk
        |  FROM lineitem
        |), keys AS (
        |  SELECT DISTINCT o_orderkey AS fk FROM orders
        |), o AS (
        |  SELECT CAST(count(*) AS BIGINT) AS orphan_rows,
        |    CAST(count(DISTINCT f.fk) AS BIGINT) AS orphan_keys
        |  FROM fact f LEFT JOIN keys k ON f.fk = k.fk
        |  WHERE f.fk IS NOT NULL AND k.fk IS NULL
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS fact_rows,
        |    CAST(sum(CASE WHEN fk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS null_keys
        |  FROM fact
        |)
        |SELECT fact_rows, null_keys, orphan_rows, orphan_keys,
        |  CAST(1000000 * orphan_rows // greatest(1, fact_rows) AS BIGINT)
        |    AS orphan_ppm
        |FROM t CROSS JOIN o""".stripMargin,
    // fd twin: the two-level exact-distinct plan verbatim
    "dq_fd" ->
      """WITH kv AS (
        |  SELECT c_nationkey AS k, c_mktsegment AS v,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2
        |)
        |SELECT k, CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_values,
        |  min(v) AS v_min, max(v) AS v_max
        |FROM kv GROUP BY k HAVING count(*) > 1
        |ORDER BY k""".stripMargin,
    "events_conversion_lag" ->
      """WITH f AS (
        |  SELECT user_id, min(epoch_us(ts)) AS from_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(epoch_us(e.ts) - f.from_ts) AS lat
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f.from_ts
        |  GROUP BY 1
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_started,
        |  CAST(count(lat) AS BIGINT) AS n_converted,
        |  CAST(min(lat) AS BIGINT) AS min_us,
        |  CAST(round(2 * quantile_cont(lat, 0.5)) AS BIGINT) AS p50_x2_us,
        |  CAST(sum(lat) AS BIGINT) AS sum_us,
        |  CAST(CASE WHEN count(lat) = 0 THEN NULL
        |    ELSE sum(lat) // count(lat) END AS BIGINT) AS mean_us,
        |  CAST(max(lat) AS BIGINT) AS max_us
        |FROM f LEFT JOIN c USING (user_id)""".stripMargin,
    // argmax via row_number (abs desc, day) — the min(struct) twin
    "events_changepoint" ->
      """WITH cells AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), base AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS d,
        |    CAST(sum(x) AS BIGINT) AS s
        |  FROM cells GROUP BY 1
        |), walk AS (
        |  SELECT c.event_type, c.day, b.d, b.s,
        |    sum(c.x * b.d - b.s) OVER (PARTITION BY c.event_type
        |      ORDER BY c.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cells c JOIN base b USING (event_type)
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(cum) DESC, day) AS rn
        |  FROM walk
        |)
        |SELECT event_type, day AS change_day,
        |  CAST(abs(cum) AS BIGINT) AS peak_abs_dev,
        |  CAST(cum AS BIGINT) AS peak_dev, d AS n_days, s AS n_events
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // the md5-threshold Bernoulli(1/2) replica membership is rebuilt
    // verbatim; replica means are truncated integer division twins
    "value_bootstrap" ->
      """WITH v AS (
        |  SELECT event_type AS "group", event_id AS id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
        |  FROM events
        |), reps AS (
        |  SELECT "group", r.range AS r,
        |    CAST(sum(v100) AS BIGINT) // CAST(count(*) AS BIGINT)
        |      AS mean_c
        |  FROM v CROSS JOIN range(0, 32) r
        |  WHERE CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
        |    CAST(r.range AS VARCHAR)), 1, 1) AS BIGINT) < 8
        |  GROUP BY 1, 2
        |), point AS (
        |  SELECT "group",
        |    CAST(sum(v100) AS BIGINT) // CAST(count(*) AS BIGINT)
        |      AS point_c,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM v GROUP BY 1
        |)
        |SELECT p."group", n_rows, point_c,
        |  CAST(count(*) AS BIGINT) AS n_replicas,
        |  CAST(min(mean_c) AS BIGINT) AS ci_lo_c,
        |  CAST(round(2 * quantile_cont(mean_c, 0.5)) AS BIGINT)
        |    AS median_x2_c,
        |  CAST(max(mean_c) AS BIGINT) AS ci_hi_c
        |FROM reps JOIN point p USING ("group")
        |GROUP BY 1, 2, 3
        |ORDER BY p."group"""".stripMargin,
    "events_bursts" ->
      """WITH cells AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), base AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS d,
        |    CAST(sum(x) AS BIGINT) AS s
        |  FROM cells GROUP BY 1
        |)
        |SELECT c.event_type, c.day, c.x, b.d, b.s
        |FROM cells c JOIN base b USING (event_type)
        |WHERE c.x * b.d - b.s > 0
        |  AND (c.x * b.d - b.s) * (c.x * b.d - b.s) > 4 * b.d * b.s
        |ORDER BY event_type, day""".stripMargin,
    // ntile's bucket-split rule (earlier buckets take the extras) is
    // identical in DuckDB; the (metric, user_id) total order pins ties
    // Markov-baseline twin: same lead ordering, rn=1 argmax model,
    // accuracy folded from the count table
    "events_markov_eval" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts, event_type
        |  FROM events
        |), tr AS (
        |  SELECT event_type AS prev_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM ev
        |), counts AS (
        |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        |  FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2
        |), model AS (
        |  SELECT prev_type, next_type AS predicted FROM (
        |    SELECT prev_type, next_type,
        |      row_number() OVER (PARTITION BY prev_type
        |        ORDER BY n DESC, next_type) AS rn
        |    FROM counts
        |  ) r WHERE rn = 1
        |)
        |SELECT c.prev_type AS prev_type, m.predicted AS predicted,
        |  CAST(sum(CASE WHEN c.next_type = m.predicted THEN c.n ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  CAST(sum(c.n) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN c.next_type = m.predicted THEN c.n ELSE 0 END)
        |    AS BIGINT) * 1000000 // CAST(sum(c.n) AS BIGINT) AS acc_ppm
        |FROM counts c JOIN model m ON c.prev_type = m.prev_type
        |GROUP BY 1, 2 ORDER BY prev_type""".stripMargin,
    // randomized-response twin: identical md5 coin, clamped debias
    // numerator keeps // and div in their agreeing non-negative range
    "privacy_rr" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS bit
        |  FROM events
        |), priv AS (
        |  SELECT event_type, bit,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':rr'), 1, 8) AS BIGINT) % 4 = 0
        |      THEN 1 - bit ELSE bit END AS reported
        |  FROM ev
        |), est AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(reported) AS BIGINT) AS obs_yes
        |  FROM priv GROUP BY 1
        |), tr AS (
        |  SELECT event_type, CAST(sum(bit) AS BIGINT) * 1000000
        |    // CAST(count(*) AS BIGINT) AS true_yes_ppm
        |  FROM ev GROUP BY 1
        |)
        |SELECT e.event_type AS event_type, n, obs_yes,
        |  greatest(4 * obs_yes - n, 0) * 1000000 // (2 * n) AS est_yes_ppm,
        |  true_yes_ppm
        |FROM est e JOIN tr t ON e.event_type = t.event_type
        |ORDER BY event_type""".stripMargin,
    // lifetime-table twin: scalar-subquery horizon, at-risk as a
    // descending cumulative over the bounded lifetime frame, integer
    // hazard ppm (// matches Spark div on non-negative operands)
    "events_hazard" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), pu AS (
        |  SELECT user_id, min(day) AS first_day, max(day) AS last_day
        |  FROM ev GROUP BY 1
        |), lt AS (
        |  SELECT last_day - first_day AS lifetime,
        |    CASE WHEN last_day >= (SELECT max(last_day) FROM pu) - 6
        |      THEN 1 ELSE 0 END AS cens
        |  FROM pu
        |), tbl AS (
        |  SELECT lifetime, CAST(sum(1 - cens) AS BIGINT) AS churned,
        |    CAST(sum(cens) AS BIGINT) AS censored
        |  FROM lt GROUP BY 1
        |), risk AS (
        |  SELECT CAST(lifetime AS BIGINT) AS lifetime, churned, censored,
        |    CAST(sum(churned + censored) OVER (ORDER BY lifetime DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        |  FROM tbl
        |)
        |SELECT lifetime, n_risk, churned, censored,
        |  churned * 1000000 // n_risk AS hazard_ppm
        |FROM risk ORDER BY lifetime""".stripMargin,
    // kaplanMeier twin: the hazard chain + a LINEAR recursive CTE
    // folding s' = (s·(n_risk−churned)) // n_risk down the lifetimes
    "events_km" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), pu AS (
        |  SELECT user_id, min(day) AS first_day, max(day) AS last_day
        |  FROM ev GROUP BY 1
        |), lt AS (
        |  SELECT last_day - first_day AS lifetime,
        |    CASE WHEN last_day >= (SELECT max(last_day) FROM pu) - 6
        |      THEN 1 ELSE 0 END AS cens
        |  FROM pu
        |), tbl AS (
        |  SELECT lifetime, CAST(sum(1 - cens) AS BIGINT) AS churned,
        |    CAST(sum(cens) AS BIGINT) AS censored
        |  FROM lt GROUP BY 1
        |), risk AS (
        |  SELECT CAST(lifetime AS BIGINT) AS lifetime, churned, censored,
        |    CAST(sum(churned + censored) OVER (ORDER BY lifetime DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        |  FROM tbl
        |), tb AS (
        |  SELECT lifetime, n_risk, churned, censored,
        |    CAST(row_number() OVER (ORDER BY lifetime) AS BIGINT) AS rn
        |  FROM risk
        |), r AS (
        |  SELECT rn, lifetime, n_risk, churned, censored,
        |    CAST((1000000 * (n_risk - churned)) // n_risk AS BIGINT) AS s
        |  FROM tb WHERE rn = 1
        |  UNION ALL
        |  SELECT tb.rn, tb.lifetime, tb.n_risk, tb.churned, tb.censored,
        |    CAST((r.s * (tb.n_risk - tb.churned)) // tb.n_risk AS BIGINT)
        |  FROM r JOIN tb ON tb.rn = r.rn + 1
        |)
        |SELECT lifetime, n_risk, churned, censored, s AS survival_ppm
        |FROM r ORDER BY lifetime""".stripMargin,
    "events_rfm" ->
      """WITH pu AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_ts,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS monetary_c
        |  FROM events GROUP BY 1
        |), nw AS (
        |  SELECT max(last_ts) AS now_ts FROM pu
        |), b AS (
        |  SELECT user_id,
        |    (now_ts - last_ts) // 86400000000 AS recency_days,
        |    frequency, monetary_c,
        |    CAST(ntile(5) OVER (ORDER BY (now_ts - last_ts) // 86400000000,
        |      user_id) AS BIGINT) AS r_bin,
        |    CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS BIGINT)
        |      AS f_bin,
        |    CAST(ntile(5) OVER (ORDER BY monetary_c, user_id) AS BIGINT)
        |      AS m_bin
        |  FROM pu CROSS JOIN nw
        |)
        |SELECT user_id, recency_days, frequency, monetary_c,
        |  r_bin, f_bin, m_bin,
        |  CAST(r_bin AS VARCHAR) || '-' || CAST(f_bin AS VARCHAR) || '-' ||
        |    CAST(m_bin AS VARCHAR) AS segment
        |FROM b ORDER BY user_id""".stripMargin,
    // session partition is tie-order-independent (equal timestamps gap 0
    // -> same session either way), so the ts-only window is deterministic
    "events_covisit" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts, event_type FROM events
        |), s1 AS (
        |  SELECT user_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s2 AS (
        |  SELECT user_id, event_type,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS sess_idx
        |  FROM s1
        |), sess AS (
        |  SELECT DISTINCT user_id, sess_idx, event_type FROM s2
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM (SELECT DISTINCT user_id, sess_idx FROM sess)
        |), pt AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM sess GROUP BY 1
        |), pairs AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS c_ab
        |  FROM sess x JOIN sess y
        |    ON x.user_id = y.user_id AND x.sess_idx = y.sess_idx
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT type_a, type_b, c_ab, a.c AS c_a, b.c AS c_b, n_sessions,
        |  CAST(1000000 * n_sessions * c_ab // (a.c * b.c) AS BIGINT)
        |    AS lift_ppm
        |FROM pairs
        |JOIN pt a ON a.event_type = type_a
        |JOIN pt b ON b.event_type = type_b
        |CROSS JOIN tot
        |ORDER BY type_a, type_b""".stripMargin,
    // mahalanobis twin: HUGEINT centered moments == the Spark
    // DECIMAL(38,0) sums; same adjugate quadratic form and one final
    // truncating division; DESC puts NULLs last in both engines
    "events_mahalanobis" ->
      """WITH f AS (
        |  SELECT user_id, CAST(count(*) AS HUGEINT) AS f1,
        |    CAST(sum(CAST(floor(value) AS BIGINT)) AS HUGEINT) AS f2
        |  FROM events GROUP BY 1
        |), m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(f1) AS HUGEINT) AS s1,
        |    CAST(sum(f2) AS HUGEINT) AS s2,
        |    CAST(sum(f1 * f1) AS HUGEINT) AS s11,
        |    CAST(sum(f1 * f2) AS HUGEINT) AS s12,
        |    CAST(sum(f2 * f2) AS HUGEINT) AS s22
        |  FROM f
        |), sm AS (
        |  SELECT n, s1, s2,
        |    n * s11 - s1 * s1 AS sxx,
        |    n * s12 - s1 * s2 AS sxy,
        |    n * s22 - s2 * s2 AS syy
        |  FROM m
        |), smd AS (
        |  SELECT *, sxx * syy - sxy * sxy AS det FROM sm
        |)
        |SELECT user_id, CAST(f1 AS BIGINT) AS f1,
        |  CAST(f2 AS BIGINT) AS f2,
        |  CASE WHEN det > 0 THEN CAST(
        |    1000000 * (syy * (n * f1 - s1) * (n * f1 - s1)
        |      - 2 * sxy * (n * f1 - s1) * (n * f2 - s2)
        |      + sxx * (n * f2 - s2) * (n * f2 - s2)) // det AS BIGINT)
        |  ELSE NULL END AS md2_ppm
        |FROM f, smd
        |ORDER BY md2_ppm DESC, user_id LIMIT 5""".stripMargin,
    // quantile_cont == Spark exact percentile (same p*(n-1) interpolation);
    // doubling before round() keeps every compared term an exact integer
    "events_outliers_mad" ->
      """WITH v AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100 FROM events
        |), med AS (
        |  SELECT event_type,
        |    CAST(round(2 * quantile_cont(v100, 0.5)) AS BIGINT) AS med2
        |  FROM v GROUP BY 1
        |), dev AS (
        |  SELECT v.event_id, v.event_type, v.v100, med.med2,
        |    abs(2 * v.v100 - med.med2) AS dev2
        |  FROM v JOIN med USING (event_type)
        |), mad AS (
        |  SELECT event_type,
        |    CAST(round(2 * quantile_cont(dev2, 0.5)) AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1
        |)
        |SELECT d.event_id, d.event_type, d.v100, d.med2,
        |  CAST(d.dev2 AS BIGINT) AS dev2, mad.mad4
        |FROM dev d JOIN mad USING (event_type)
        |WHERE 2 * d.dev2 > 3 * mad.mad4 ORDER BY event_id""".stripMargin,
    "events_anomaly" ->
      """WITH v AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100,
        |    count(*) OVER w AS n,
        |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS s,
        |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT) *
        |        CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS ss
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id, event_type)
        |)
        |SELECT event_id, user_id, event_type, v100, n AS group_n FROM v
        |WHERE n >= 3 AND (n * v100 - s) * (n * v100 - s) > 4 * (n * ss - s * s)
        |ORDER BY event_id""".stripMargin,
    "events_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY prop""".stripMargin,
    "events_quantiles" ->
      """WITH q AS (
        |  SELECT event_type, quantile_cont(value, [0.5, 0.9, 0.99]) AS qv
        |  FROM events GROUP BY 1
        |)
        |SELECT event_type, unnest([0.5, 0.9, 0.99]) AS quantile,
        |  unnest(qv) AS qvalue
        |FROM q ORDER BY event_type, quantile""".stripMargin,
    "graph_nodesim" ->
      """WITH adj AS (
        |  SELECT DISTINCT l_suppkey AS id, l_partkey AS nbr FROM lineitem
        |), deg AS (
        |  SELECT id, count(*) AS deg FROM adj GROUP BY 1
        |), pruned AS (
        |  SELECT id, nbr FROM (
        |    SELECT id, nbr, count(*) OVER (PARTITION BY nbr) AS ndeg FROM adj
        |  ) WHERE ndeg <= 100
        |), inter AS (
        |  SELECT l.id AS a, r.id AS b, count(*) AS n_inter
        |  FROM pruned l JOIN pruned r ON l.nbr = r.nbr AND l.id < r.id
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT a, b, n_inter, da.deg + db.deg - n_inter AS n_union,
        |    CAST(n_inter AS DOUBLE) / CAST(da.deg + db.deg - n_inter AS DOUBLE) AS score
        |  FROM inter JOIN deg da ON inter.a = da.id JOIN deg db ON inter.b = db.id
        |), sym AS (
        |  SELECT a AS id, b AS other, n_inter, n_union, score FROM scored
        |  UNION ALL
        |  SELECT b AS id, a AS other, n_inter, n_union, score FROM scored
        |), ranked AS (
        |  SELECT id, other, n_inter, n_union, score,
        |    row_number() OVER (PARTITION BY id ORDER BY score DESC, other ASC) AS "rank"
        |  FROM sym
        |)
        |SELECT id, "rank", other, n_inter, n_union, score
        |FROM ranked WHERE "rank" <= 10 ORDER BY id, "rank"""".stripMargin,
    "embed_gram" ->
      """WITH e AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), cells AS (
        |  SELECT bi.i, bj.j,
        |    CAST(floor(v[bi.i + 1] * v[bj.j + 1] * 1000000.0) AS BIGINT) AS c
        |  FROM e,
        |    (SELECT unnest(generate_series(0, 63)) AS i) bi,
        |    (SELECT unnest(generate_series(0, 63)) AS j) bj
        |  WHERE bj.j >= bi.i
        |)
        |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
        |  CAST(sum(c) AS BIGINT) AS s
        |FROM cells GROUP BY i, j ORDER BY i, j""".stripMargin,
    // per-cell floor before summing (the gram recipe); DuckDB lists are
    // 1-indexed like Spark's posexplode index + 1
    "embed_truncation" ->
      """WITH cells AS (
        |  SELECT r.range AS pos,
        |    CAST(floor(ce[r.range] * ce[r.range] * 1000000) AS BIGINT) AS e
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS ce FROM embeddings)
        |  CROSS JOIN range(1, 65) r
        |), byp AS (
        |  SELECT pos, CAST(sum(e) AS BIGINT) AS pe FROM cells GROUP BY 1
        |), pref AS (
        |  SELECT pos, CAST(sum(pe) OVER (ORDER BY pos) AS BIGINT) AS cum
        |  FROM byp
        |), tot AS (
        |  SELECT max(cum) AS total_scaled FROM pref
        |)
        |SELECT pos AS dim, cum AS energy_scaled, total_scaled,
        |  CAST(1000000 * cum // total_scaled AS BIGINT) AS energy_ppm
        |FROM pref CROSS JOIN tot
        |WHERE pos IN (8, 16, 32, 64) ORDER BY dim""".stripMargin,
    // JL twin: DuckDB derives the SAME sign matrix from its own md5()
    // (independent implementation, same recipe) and replays the signed
    // floor-scaled BIGINT sums; the one division is CAST-forced DOUBLE
    // (bare 4000000.0 would be DECIMAL — the r5-late literal trap)
    "embed_rp" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), cells AS (
        |  SELECT vec_id, jj.j, ii.i,
        |    (CASE WHEN CAST('0x' || substr(md5('rp:' || jj.j || ':' || ii.i), 1, 1)
        |        AS BIGINT) < 8 THEN 1 ELSE -1 END)
        |      * CAST(floor(v[ii.i + 1] * 1000000.0) AS BIGINT) AS c
        |  FROM e,
        |    (SELECT unnest(generate_series(0, 15)) AS j) jj,
        |    (SELECT unnest(generate_series(0, 63)) AS i) ii
        |), s AS (
        |  SELECT vec_id, j, CAST(sum(c) AS BIGINT) AS s_e6
        |  FROM cells GROUP BY 1, 2
        |)
        |SELECT vec_id, CAST(j AS BIGINT) AS dim, s_e6,
        |  s_e6 / CAST('4000000' AS DOUBLE) AS value
        |FROM s ORDER BY vec_id, dim""".stripMargin,
    "embed_quantize" ->
      """WITH sc AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS scale
        |  FROM embeddings
        |), qq AS (
        |  SELECT vec_id, scale,
        |    list_transform(e, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(floor(x * 127.0 / scale) AS BIGINT) END) AS q
        |  FROM sc
        |)
        |SELECT vec_id, CAST(floor(scale * 1000000.0) AS BIGINT) AS scale_e6,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  list_min(q) AS q_min, list_max(q) AS q_max,
        |  array_to_string(q[1:6], ',') AS q_head
        |FROM qq ORDER BY vec_id""".stripMargin,
    "label_knn" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 20
        |), c AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ce
        |  FROM embeddings WHERE vec_id >= 20
        |), scored AS (
        |  SELECT q.query_id, c.vec_id, c.label,
        |    list_dot_product(ce, qe) /
        |      (sqrt(list_dot_product(ce, ce)) * sqrt(list_dot_product(qe, qe))) AS cosine
        |  FROM c, q
        |), ranked AS (
        |  SELECT query_id, label,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id ASC) AS r
        |  FROM scored
        |), votes AS (
        |  SELECT query_id, label, count(*) AS votes FROM ranked
        |  WHERE r <= 5 GROUP BY 1, 2
        |), best AS (
        |  SELECT query_id, label, votes,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, label ASC) AS vr
        |  FROM votes
        |)
        |SELECT query_id, label AS pred_label, votes FROM best
        |WHERE vr = 1 ORDER BY query_id""".stripMargin,
    "sample_per_key" ->
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        |  FROM documents
        |) WHERE sample_rank <= 20 ORDER BY source, sample_rank""".stripMargin,
    "table_profile" -> {
      val one = (c: String) =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
           |FROM lineitem""".stripMargin
      Seq("l_partkey", "l_quantity", "l_extendedprice").map(one)
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "part_best_supplier" ->
      """WITH agg AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_cost,
        |    count(*) AS n_items
        |  FROM lineitem GROUP BY 1, 2
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY total_cost ASC, l_suppkey ASC) AS rk FROM agg
        |)
        |SELECT l_partkey, l_suppkey, total_cost, n_items FROM ranked
        |WHERE rk = 1 ORDER BY l_partkey""".stripMargin,
    "basket_rules" ->
      """WITH b AS (
        |  SELECT g, item FROM (
        |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz FROM (
        |      SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
        |    )
        |  ) WHERE gsz <= 100
        |), ic AS (
        |  SELECT item, count(*) AS n_item FROM b GROUP BY 1
        |), pc AS (
        |  SELECT l.item AS item_a, r.item AS item_b, count(*) AS n_pair
        |  FROM b l JOIN b r ON l.g = r.g AND l.item < r.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT item_a, item_b, n_pair, a.n_item AS n_a, bb.n_item AS n_b,
        |  CAST(n_pair AS DOUBLE) / CAST(a.n_item AS DOUBLE) AS conf_a_to_b,
        |  CAST(n_pair AS DOUBLE) / CAST(bb.n_item AS DOUBLE) AS conf_b_to_a
        |FROM pc JOIN ic a ON pc.item_a = a.item
        |JOIN ic bb ON pc.item_b = bb.item
        |ORDER BY item_a, item_b""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
        |  count(*) AS n_rows,
        |  min(l_extendedprice) AS min_v, max(l_extendedprice) AS max_v
        |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin,
    // corr twin: identical integerized cells (floor(x·100) BIGINT), exact
    // integer moments (DuckDB sums to HUGEINT — same exact integers as the
    // Spark DECIMAL(28,0) sums), then the identical pure-double Pearson:
    // each moment casts to DOUBLE FIRST, so every ·,−,/,sqrt is the same
    // IEEE op on the same operands
    "value_corr" ->
      """WITH c AS (
        |  SELECT CAST(floor(l_quantity * 100) AS BIGINT) AS xq,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS xp,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS xd,
        |    CAST(floor(l_tax * 100) AS BIGINT) AS xt
        |  FROM lineitem
        |), m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(xq) AS DOUBLE) AS sq, CAST(sum(xp) AS DOUBLE) AS sp,
        |    CAST(sum(xd) AS DOUBLE) AS sd, CAST(sum(xt) AS DOUBLE) AS st,
        |    CAST(sum(xq * xq) AS DOUBLE) AS pqq,
        |    CAST(sum(xq * xp) AS DOUBLE) AS pqp,
        |    CAST(sum(xq * xd) AS DOUBLE) AS pqd,
        |    CAST(sum(xq * xt) AS DOUBLE) AS pqt,
        |    CAST(sum(xp * xp) AS DOUBLE) AS ppp,
        |    CAST(sum(xp * xd) AS DOUBLE) AS ppd,
        |    CAST(sum(xp * xt) AS DOUBLE) AS ppt,
        |    CAST(sum(xd * xd) AS DOUBLE) AS pdd,
        |    CAST(sum(xd * xt) AS DOUBLE) AS pdt,
        |    CAST(sum(xt * xt) AS DOUBLE) AS ptt
        |  FROM c
        |)
        |SELECT col_x, col_y, n, corr FROM (
        |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, nn AS n,
        |    (n * pqp - sq * sp) / (sqrt(n * pqq - sq * sq)
        |      * sqrt(n * ppp - sp * sp)) AS corr FROM m
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount', nn,
        |    (n * pqd - sq * sd) / (sqrt(n * pqq - sq * sq)
        |      * sqrt(n * pdd - sd * sd)) FROM m
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_tax', nn,
        |    (n * pqt - sq * st) / (sqrt(n * pqq - sq * sq)
        |      * sqrt(n * ptt - st * st)) FROM m
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', nn,
        |    (n * ppd - sp * sd) / (sqrt(n * ppp - sp * sp)
        |      * sqrt(n * pdd - sd * sd)) FROM m
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_tax', nn,
        |    (n * ppt - sp * st) / (sqrt(n * ppp - sp * sp)
        |      * sqrt(n * ptt - st * st)) FROM m
        |  UNION ALL
        |  SELECT 'l_discount', 'l_tax', nn,
        |    (n * pdt - sd * st) / (sqrt(n * pdd - sd * sd)
        |      * sqrt(n * ptt - st * st)) FROM m
        |) ORDER BY col_x, col_y""".stripMargin,
    "value_winsorize" ->
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.01) AS p_lo,
        |    quantile_cont(value, 0.99) AS p_hi
        |  FROM events GROUP BY 1
        |)
        |SELECT event_id, e.event_type, value, p_lo, p_hi,
        |  least(greatest(value, p_lo), p_hi) AS clamped
        |FROM events e JOIN b ON e.event_type = b.event_type
        |ORDER BY event_id""".stripMargin,
    "sales_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY lvl, l_returnflag, l_linestatus""".stripMargin,
    "events_pivot" ->
      """SELECT epoch_us(ts) // 86400000000 AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "events_interarrival" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts FROM events
        |)
        |SELECT event_id, user_id, ts,
        |  CAST(row_number() OVER w - 1 AS BIGINT) AS seq_idx,
        |  lag(ts) OVER w AS prev_ts,
        |  ts - lag(ts) OVER w AS gap_us
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderkey, o_orderpriority,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY r_name, n_name""".stripMargin,
    // seeded teleport term: identical unrolled integer rounds to
    // graph_pagerank, with the reset mass conditioned on the seed flag
    "graph_ppr" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT n.id, n.is_seed * 150000000000 +
           |    (85 * COALESCE(c.cin, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT ed.dst, CAST(SUM(p.r // ed.outdeg) AS BIGINT) AS cin
           |    FROM ed JOIN $prev p ON p.id = ed.src GROUP BY ed.dst
           |  ) c ON n.id = c.dst
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
         |), nodes AS (
         |  SELECT id, CASE WHEN id BETWEEN 10000000 AND 10000005
         |    THEN 1 ELSE 0 END AS is_seed
         |  FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)
         |), deg AS (
         |  SELECT src, count(*) AS outdeg FROM e GROUP BY 1
         |), ed AS (
         |  SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)
         |), r0 AS (
         |  SELECT id, CAST(is_seed * 1000000000000 AS BIGINT) AS r FROM nodes
         |), ${round("r0", "r1")},
         |${round("r1", "r2")},
         |${round("r2", "r3")},
         |${round("r3", "r4")},
         |${round("r4", "r5")}
         |SELECT id, r AS rank_scaled,
         |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
         |FROM r5 ORDER BY id""".stripMargin
    },
    // chunk i covers tokens [i*48, i*48+64): step = 64 - 16
    "docs_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id, t,
        |    unnest(generate_series(0, (len(t) - 1) // 48)) AS chunk_id
        |  FROM toks
        |)
        |SELECT doc_id, chunk_id, chunk_id * 48 AS chunk_start,
        |  CAST(least(64, len(t) - chunk_id * 48) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(t, chunk_id * 48 + 1,
        |    least(len(t), chunk_id * 48 + 64)), ' ') AS chunk_text
        |FROM ex ORDER BY doc_id, chunk_id""".stripMargin,
    // decimal(18,2) value x decimal(19,0) microsecond gap: exact product
    // and sum in both engines; twap is one double division at the end
    "events_twap" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts, value FROM events
        |), seg AS (
        |  SELECT user_id,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) - ts
        |      AS gap_us,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM ev
        |)
        |SELECT user_id, count(*) AS n_segments,
        |  CAST(sum(gap_us) AS BIGINT) AS span_us,
        |  CAST(CAST(sum(v * CAST(gap_us AS DECIMAL(19,0))) * 100 AS BIGINT)
        |      AS DOUBLE)
        |    / CAST(CAST(sum(gap_us) AS BIGINT) * 100 AS DOUBLE) AS twap
        |FROM seg WHERE gap_us IS NOT NULL
        |GROUP BY user_id HAVING sum(gap_us) > 0
        |ORDER BY user_id""".stripMargin,
    // z = (n*v - s)/sqrt(n*ss - s^2): numerator and radicand exact
    // integers (HUGEINT here, decimal(38,0) in Spark); sqrt and the
    // division are IEEE-correctly-rounded in both engines
    "embed_standardize" ->
      """WITH comps AS (
        |  SELECT vec_id,
        |    CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) AS dim,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
        |      AS HUGEINT) AS v6
        |  FROM embeddings
        |), stats AS (
        |  SELECT dim, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(v6) AS HUGEINT) AS s,
        |    CAST(sum(v6 * v6) AS HUGEINT) AS ss
        |  FROM comps GROUP BY dim
        |)
        |SELECT c.vec_id, c.dim,
        |  CASE WHEN st.n * st.ss - st.s * st.s = 0 THEN 0.0
        |       ELSE CAST(st.n * c.v6 - st.s AS DOUBLE)
        |         / sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE))
        |  END AS z
        |FROM comps c JOIN stats st USING (dim)
        |ORDER BY c.vec_id, c.dim""".stripMargin,
    // the five dilation rounds are unrolled textually: each level
    // substitutes the previous expression twice (shift-or) then masks
    "hilbert_index" -> hilbertOracleSql(bits = 20),
    "zorder_index" -> {
      def dilate(e: String): String =
        Seq(0x0000FFFF0000FFFFL -> 16, 0x00FF00FF00FF00FFL -> 8,
          0x0F0F0F0F0F0F0F0FL -> 4, 0x3333333333333333L -> 2,
          0x5555555555555555L -> 1)
          .foldLeft(e) { case (acc, (m, sh)) =>
            s"((($acc) | (($acc) << $sh)) & $m)"
          }
      val zx = dilate("(CAST(x AS BIGINT) & 1048575)")
      val zy = dilate("(CAST(y AS BIGINT) & 1048575)")
      s"""WITH xy AS (
         |  SELECT DISTINCT l_partkey AS x, l_suppkey AS y FROM lineitem
         |)
         |SELECT x, y, ($zx) | (($zy) << 1) AS z
         |FROM xy ORDER BY x, y""".stripMargin
    },
    "dq_violations" ->
      """WITH r AS (
        |  SELECT 'not_null:l_quantity' AS rule_id,
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_violations FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_quantity',
        |    CAST(sum(CASE WHEN l_quantity IS NOT NULL
        |      AND (l_quantity < 1 OR l_quantity > 40) THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_discount',
        |    CAST(sum(CASE WHEN l_discount IS NOT NULL
        |      AND (l_discount < 0 OR l_discount > 0.05) THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'unique:o_custkey',
        |    CAST(COALESCE(sum(n - 1), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS n FROM orders GROUP BY o_custkey)
        |  UNION ALL
        |  SELECT 'ref:o_custkey', CAST(count(*) AS BIGINT)
        |  FROM orders o
        |  WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |)
        |SELECT rule_id, n_violations FROM r ORDER BY rule_id""".stripMargin,
    // cross oracle: exact jaccard over unpruned shingle sets between the
    // reference slice and the planted corpus (same J >= tau cut as
    // dedup_minhash's oracle; the similarity gap closes the estimator)
    "dedup_cross" ->
      """WITH ref AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 10
        |), corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 10
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM documents WHERE doc_id < 10
        |), rsh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |        FROM ref) rt WHERE len(t) >= 3
        |), csh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |        FROM corpus) ct WHERE len(t) >= 3
        |), rsz AS (
        |  SELECT doc_id, count(*) AS n FROM rsh GROUP BY doc_id
        |), csz AS (
        |  SELECT doc_id, count(*) AS n FROM csh GROUP BY doc_id
        |), pairs AS (
        |  SELECT r.doc_id AS ref_id, c.doc_id AS doc_id, count(*) AS common
        |  FROM rsh r JOIN csh c ON r.shingle = c.shingle
        |  GROUP BY 1, 2
        |)
        |SELECT ref_id, pairs.doc_id AS doc_id FROM pairs
        |JOIN rsz ON pairs.ref_id = rsz.doc_id
        |JOIN csz ON pairs.doc_id = csz.doc_id
        |WHERE CAST(common AS DOUBLE)
        |  / CAST(rsz.n + csz.n - common AS DOUBLE) >= 0.5
        |ORDER BY ref_id, doc_id""".stripMargin,
    // bounded Bellman-Ford: identical unrolled integer relaxations;
    // least() skips NULLs in both engines, so unreached stays NULL
    "graph_sssp" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT d.id, least(d.dist, c.nd) AS dist
           |  FROM $prev d LEFT JOIN (
           |    SELECT e.dst AS id, CAST(min(p.dist + e.w) AS BIGINT) AS nd
           |    FROM e JOIN $prev p ON p.id = e.src
           |    WHERE p.dist IS NOT NULL GROUP BY e.dst
           |  ) c ON d.id = c.id
           |)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst,
         |    (o_orderkey % 7) + 1 AS w
         |  FROM orders
         |), e AS (
         |  SELECT src, dst, w FROM e0
         |  UNION ALL SELECT dst, src, w FROM e0
         |), nodes AS (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), d0 AS (
         |  SELECT id, CASE WHEN id < 100 THEN CAST(0 AS BIGINT)
         |    ELSE NULL END AS dist FROM nodes
         |), ${round("d0", "d1")},
         |${round("d1", "d2")},
         |${round("d2", "d3")},
         |${round("d3", "d4")}
         |SELECT id, dist FROM d4 WHERE dist IS NOT NULL
         |ORDER BY id""".stripMargin
    },
    // sampleNeighbors twin: same md5 neighbor ranks per hop, frontier
    // chained through MATERIALIZED CTEs
    "graph_sample_neighbors" ->
      """WITH e0 AS (
        |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst
        |  FROM orders
        |), e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM e0
        |    UNION ALL SELECT dst AS src, src AS dst FROM e0)
        |), f0 AS (
        |  SELECT DISTINCT src AS id FROM e0 WHERE src < 100
        |), h0 AS MATERIALIZED (
        |  SELECT 0 AS hop, src, dst FROM (
        |    SELECT e.src, e.dst, row_number() OVER (PARTITION BY e.src
        |      ORDER BY md5('nbr:0:' || CAST(e.src AS VARCHAR) || ':'
        |        || CAST(e.dst AS VARCHAR)), e.dst) AS r
        |    FROM e JOIN f0 ON f0.id = e.src)
        |  WHERE r <= 3
        |), f1 AS (
        |  SELECT DISTINCT dst AS id FROM h0
        |), h1 AS MATERIALIZED (
        |  SELECT 1 AS hop, src, dst FROM (
        |    SELECT e.src, e.dst, row_number() OVER (PARTITION BY e.src
        |      ORDER BY md5('nbr:1:' || CAST(e.src AS VARCHAR) || ':'
        |        || CAST(e.dst AS VARCHAR)), e.dst) AS r
        |    FROM e JOIN f1 ON f1.id = e.src)
        |  WHERE r <= 2
        |)
        |SELECT CAST(hop AS BIGINT) AS hop, src, dst FROM (
        |  SELECT * FROM h0 UNION ALL SELECT * FROM h1)
        |ORDER BY hop, src, dst""".stripMargin,
    // freq-cap twin: identical (user, day) cells and greatest() excess
    "events_freqcap" ->
      """WITH ud AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT day, CAST(count(*) AS BIGINT) AS active_users,
        |  CAST(sum(CASE WHEN n > 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS capped_users,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(greatest(n - 10, 0)) AS BIGINT) AS suppressed_events,
        |  1000000 * CAST(sum(greatest(n - 10, 0)) AS BIGINT)
        |    // CAST(sum(n) AS BIGINT) AS suppressed_ppm
        |FROM ud GROUP BY 1 ORDER BY day""".stripMargin,
    "graph_widest" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT d.id, greatest(d.cap, c.nc) AS cap
           |  FROM $prev d LEFT JOIN (
           |    SELECT e.dst AS id, CAST(max(least(p.cap, e.w)) AS BIGINT)
           |      AS nc
           |    FROM e JOIN $prev p ON p.id = e.src
           |    WHERE p.cap IS NOT NULL GROUP BY e.dst
           |  ) c ON d.id = c.id
           |)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst,
         |    (o_orderkey % 7) + 1 AS w
         |  FROM orders
         |), e AS (
         |  SELECT src, dst, w FROM e0
         |  UNION ALL SELECT dst, src, w FROM e0
         |), nodes AS (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), d0 AS (
         |  SELECT id, CASE WHEN id < 100
         |    THEN CAST(9223372036854775807 AS BIGINT)
         |    ELSE NULL END AS cap FROM nodes
         |), ${round("d0", "d1")},
         |${round("d1", "d2")},
         |${round("d2", "d3")},
         |${round("d3", "d4")}
         |SELECT id, cap FROM d4 WHERE cap IS NOT NULL
         |ORDER BY id""".stripMargin
    },
    "sales_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY lvl, l_returnflag, l_linestatus""".stripMargin,
    "skew_profile" ->
      """WITH c AS (
        |  SELECT l_partkey, count(*) AS n_rows FROM lineitem GROUP BY 1
        |), t AS (
        |  SELECT count(*) AS total FROM lineitem
        |)
        |SELECT l_partkey, n_rows, total,
        |  CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM c, t ORDER BY n_rows DESC, l_partkey LIMIT 20""".stripMargin,
    "events_rolling_users" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events
        |), days AS (
        |  SELECT DISTINCT day FROM du
        |), contrib AS (
        |  SELECT du.user_id, du.day + t.g AS day_w
        |  FROM du, generate_series(0, 6) AS t(g)
        |)
        |SELECT c.day_w AS day,
        |  count(DISTINCT c.user_id) AS active_users
        |FROM contrib c JOIN days d ON c.day_w = d.day
        |GROUP BY 1 ORDER BY day""".stripMargin,
    // unique order key (value, id) -> no ties -> percent_rank is one
    // exact-integer division in both engines
    "docs_chars_rank" ->
      """SELECT doc_id, lang, n_chars,
        |  percent_rank() OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id) AS pct_rank
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fold_assign" ->
      """SELECT doc_id,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |    AS BIGINT) % 5 AS fold
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sales_pareto" ->
      """WITH agg AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1
        |), tot AS (
        |  SELECT sum(rev) AS total FROM agg
        |), r AS (
        |  SELECT l_partkey, rev,
        |    row_number() OVER (ORDER BY rev DESC, l_partkey) AS rank,
        |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM agg
        |)
        |SELECT l_partkey, CAST(rank AS BIGINT) AS rank,
        |  CAST(rev * 100 AS BIGINT) AS rev_cents,
        |  CAST(CAST(cum * 100 AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(t.total * 100 AS BIGINT) AS DOUBLE) AS cum_share
        |FROM r, tot t ORDER BY rank""".stripMargin,
    "events_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts, event_type
        |  FROM events
        |), pr AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM ev
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n_pairs
        |  FROM pr WHERE from_type IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT from_type, CAST(sum(n_pairs) AS BIGINT) AS n_from
        |  FROM c GROUP BY 1
        |)
        |SELECT c.from_type, c.to_type, c.n_pairs, t.n_from,
        |  CAST(c.n_pairs AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
        |FROM c JOIN tot t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    // flowSymmetry twin: same lag pairs folded to unordered type pairs,
    // 2·Σmin over Σ both directions, integer ppm
    "events_flow_symmetry" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts, event_type
        |  FROM events
        |), pr AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM ev
        |), c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM pr WHERE from_type IS NOT NULL AND from_type <> to_type
        |  GROUP BY 1, 2
        |), und AS (
        |  SELECT least(from_type, to_type) AS type_a,
        |    greatest(from_type, to_type) AS type_b,
        |    CAST(SUM(CASE WHEN from_type < to_type
        |      THEN n_pairs ELSE 0 END) AS BIGINT) AS n_ab,
        |    CAST(SUM(CASE WHEN from_type > to_type
        |      THEN n_pairs ELSE 0 END) AS BIGINT) AS n_ba
        |  FROM c GROUP BY 1, 2
        |), u2 AS (
        |  SELECT *, least(n_ab, n_ba) AS reciprocated FROM und
        |), gt AS (
        |  SELECT CAST(2 * sum(reciprocated) AS BIGINT) AS recip_mass,
        |    CAST(sum(n_ab + n_ba) AS BIGINT) AS total_mass
        |  FROM u2
        |)
        |SELECT type_a, type_b, n_ab, n_ba, reciprocated,
        |  1000000 * recip_mass // total_mass AS reciprocity_ppm
        |FROM u2, gt ORDER BY type_a, type_b""".stripMargin,
    // BPE twin: 8 unrolled rounds. Greedy leftmost application via
    // gaps-and-islands parity (odd-indexed pairs within a flagged run
    // merge); each round's argmax is ORDER BY cnt DESC, pair LIMIT 1.
    "text_bpe_train" -> {
      val unions = (0 until 8)
        .map(i => s"SELECT CAST($i AS BIGINT) AS round, a, b, cnt FROM b$i")
        .mkString("\nUNION ALL ")
      s"""$bpePrefixSql,
         |${(0 until 8).map(bpeRoundSql).mkString(",\n")}
         |$unions
         |ORDER BY round""".stripMargin
    },
    // encode twin: the SAME 8 unrolled rounds leave s8 as the encoded
    // vocabulary; join the corpus tokens and hash each doc's ordered
    // subword sequence
    "text_bpe_encode" ->
      s"""$bpePrefixSql,
         |${(0 until 8).map(bpeRoundSql).mkString(",\n")},
         |enc AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS n_sub,
         |    string_agg(sym, ' ' ORDER BY pos) AS enc
         |  FROM s8 GROUP BY word
         |), dtoks AS (
         |  SELECT doc_id, unnest(generate_series(1, len(t))) AS tpos, t
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
         |        FROM documents)
         |), dt AS (
         |  SELECT doc_id, tpos, t[tpos] AS word
         |  FROM dtoks WHERE length(t[tpos]) > 0
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(e.n_sub) AS BIGINT) AS n_subwords,
         |  md5(string_agg(e.enc, ' ' ORDER BY tpos)) AS enc_hash
         |FROM dt JOIN enc e USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_lm_affinity" ->
      """WITH tgt AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE source = 'src0'
        |), bgT AS (
        |  SELECT unnest(generate_series(1, len(t) - 1)) AS i, t
        |  FROM tgt WHERE len(t) >= 2
        |), cT AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bgT GROUP BY 1, 2
        |), lm AS (
        |  SELECT w1, w2, c12,
        |    CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
        |    row_number() OVER (PARTITION BY w1 ORDER BY c12 DESC, w2) AS rn
        |  FROM cT
        |), lmk AS (
        |  SELECT w1, w2, c12, c1 FROM lm WHERE rn <= 5
        |), dt AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), bgD AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t) - 1)) AS i, t
        |  FROM dt WHERE len(t) >= 2
        |), pairs AS (
        |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM bgD
        |), agg AS (
        |  SELECT p.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(CASE WHEN l.c12 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_matched,
        |    CAST(sum(coalesce(floor(CAST(l.c12 AS DOUBLE)
        |      / CAST(l.c1 AS DOUBLE) * CAST('1e6' AS DOUBLE)), 0))
        |      AS BIGINT) AS score_scaled
        |  FROM pairs p LEFT JOIN lmk l ON p.w1 = l.w1 AND p.w2 = l.w2
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams, n_matched, score_scaled,
        |  CAST(score_scaled AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |    / CAST('1e6' AS DOUBLE) AS score
        |FROM agg ORDER BY doc_id""".stripMargin,
    // kneserNey twin: same scaled-rational BIGINT arithmetic; the only
    // float is the final p_num/p_den division (IEEE-identical)
    "text_kneser_ney" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents
        |), bg AS (
        |  SELECT unnest(generate_series(1, len(t) - 1)) AS i, t
        |  FROM toks WHERE len(t) >= 2
        |), c AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg GROUP BY 1, 2
        |), nr AS (
        |  SELECT w2, CAST(count(*) AS BIGINT) AS n1r FROM c GROUP BY w2
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS tt FROM c
        |), st AS (
        |  SELECT c.w1, c.w2, c.c12, nr.n1r, tot.tt,
        |    CAST(sum(c.c12) OVER (PARTITION BY c.w1) AS BIGINT) AS c1,
        |    CAST(count(*) OVER (PARTITION BY c.w1) AS BIGINT) AS n1l
        |  FROM c JOIN nr USING (w2), tot
        |), sc AS (
        |  SELECT w1, w2, c12, n1l, n1r,
        |    greatest(CAST(0 AS BIGINT), c12 * 4 - 3) * tt
        |      + 3 * n1l * n1r AS p_num,
        |    4 * c1 * tt AS p_den
        |  FROM st
        |), r AS (
        |  SELECT sc.*, row_number() OVER (PARTITION BY w1
        |    ORDER BY p_num DESC, w2) AS rank
        |  FROM sc
        |)
        |SELECT w1, CAST(rank AS BIGINT) AS rank, w2, c12, n1l, n1r,
        |  p_num, p_den,
        |  CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS p_kn
        |FROM r WHERE rank <= 5 ORDER BY w1, rank""".stripMargin,
    "text_bigram_lm" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents
        |), bg AS (
        |  SELECT unnest(generate_series(1, len(t) - 1)) AS i, t
        |  FROM toks WHERE len(t) >= 2
        |), c AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c12
        |  FROM bg GROUP BY 1, 2
        |), r AS (
        |  SELECT w1, w2, c12,
        |    CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
        |    row_number() OVER (PARTITION BY w1
        |      ORDER BY c12 DESC, w2) AS rank
        |  FROM c
        |)
        |SELECT w1, CAST(rank AS BIGINT) AS rank, w2, c12, c1,
        |  CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
        |FROM r WHERE rank <= 5 ORDER BY w1, rank""".stripMargin,
    // identical md5-prefix bucket + sign-digit arithmetic; DuckDB casts
    // '0x...' strings to integers natively
    // autocomplete twin: same whitespace tokens, UNNEST(range) prefix
    // explode, pinned per-prefix rank
    "search_autocomplete" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |), f AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS freq
        |  FROM tok GROUP BY 1
        |), pre AS (
        |  SELECT substr(token, 1, CAST(g.l AS INTEGER)) AS prefix,
        |    token, freq
        |  FROM f CROSS JOIN generate_series(1, 4) AS g(l)
        |  WHERE g.l <= length(token)
        |)
        |SELECT prefix,
        |  CAST(row_number() OVER (PARTITION BY prefix
        |    ORDER BY freq DESC, token) AS BIGINT) AS "rank",
        |  token, freq
        |FROM pre
        |QUALIFY "rank" <= 3
        |ORDER BY prefix, "rank"""".stripMargin,
    "vocab_top" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |), f AS (
        |  SELECT token, count(*) AS freq FROM tok GROUP BY 1
        |), r AS (
        |  SELECT token, freq,
        |    CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
        |      AS "rank",
        |    sum(freq) OVER (ORDER BY freq DESC, token
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(freq) OVER () AS total
        |  FROM f
        |)
        |SELECT "rank", token, freq,
        |  CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
        |FROM r WHERE "rank" <= 50 ORDER BY "rank"""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
        |    '\s', ' ', 'g'), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
        |    AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // spanMask twin: string_agg ignores NULL pieces exactly like
    // collect_list, so the run-collapse needs no FILTER; lag/sum windows
    // and the md5-prefix mask decision are shared recipes
    "text_span_mask" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t))) AS p, t FROM t
        |), tok AS (
        |  SELECT doc_id, p - 1 AS pos, t[p] AS tok FROM p
        |), mm AS (
        |  SELECT doc_id, pos, tok,
        |    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(pos AS VARCHAR)), 1, 8) AS BIGINT) % 100) < 15 AS m
        |  FROM tok
        |), rr AS (
        |  SELECT doc_id, pos, tok, m,
        |    m AND NOT COALESCE(lag(m) OVER (PARTITION BY doc_id
        |      ORDER BY pos), false) AS rs
        |  FROM mm
        |), kk AS (
        |  SELECT doc_id, pos, tok, m, rs,
        |    sum(CASE WHEN rs THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
        |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
        |      ROW) - 1 AS k
        |  FROM rr
        |), pieces AS (
        |  SELECT doc_id, pos, m, rs,
        |    CASE WHEN NOT m THEN tok
        |         WHEN rs THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
        |    END AS inp,
        |    CASE WHEN rs THEN '<extra_id_' || CAST(k AS VARCHAR) || '> '
        |           || tok
        |         WHEN m THEN tok END AS tgt
        |  FROM kk
        |), agg AS (
        |  SELECT doc_id,
        |    string_agg(inp, ' ' ORDER BY pos) AS input_text,
        |    string_agg(tgt, ' ' ORDER BY pos) AS tgt0,
        |    CAST(sum(CASE WHEN rs THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |    CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
        |  FROM pieces GROUP BY doc_id
        |)
        |SELECT doc_id, input_text,
        |  CASE WHEN n_spans > 0 THEN tgt0 || ' <extra_id_' ||
        |    CAST(n_spans AS VARCHAR) || '>' ELSE '' END AS targets,
        |  n_spans, n_masked
        |FROM agg ORDER BY doc_id""".stripMargin,
    // three exact regex counts; constants forced to DOUBLE (a bare
    // decimal literal parses as DECIMAL in DuckDB and rounds differently)
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    greatest(CAST(1 AS BIGINT), CAST(length(
        |      regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)) AS n_words,
        |    greatest(CAST(1 AS BIGINT), CAST(length(
        |      regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
        |    CAST(length(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents
        |)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST('206.835' AS DOUBLE)
        |  - CAST('1.015' AS DOUBLE)
        |    * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |  - CAST('84.6' AS DOUBLE)
        |    * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,
    // same staging expressions, then the same portable normalization
    // chain (no group refs in replacements: Spark $1 vs DuckDB \1)
    "web_domains" ->
      """WITH raw AS (
        |  SELECT
        |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END) ||
        |    '://' ||
        |    (CASE WHEN doc_id % 7 = 0 THEN upper(h) ELSE h END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN
        |       (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END)
        |     ELSE '' END) ||
        |    '/' || lang || '/p' || CAST(doc_id % 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN
        |       '?utm_source=feed&utm_medium=rss&id=' ||
        |       CAST(doc_id % 9 AS VARCHAR)
        |     WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 9 AS VARCHAR)
        |     ELSE '' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '#sec2' ELSE '' END) AS url
        |  FROM (SELECT doc_id, lang,
        |        (CASE WHEN doc_id % 7 IN (1, 3, 5) THEN 'www.' ELSE '' END)
        |        || source || '.' ||
        |        (CASE CAST((doc_id // 4) % 4 AS INT) WHEN 0 THEN 'com'
        |          WHEN 1 THEN 'org' WHEN 2 THEN 'net' ELSE 'io' END) AS h
        |        FROM documents)
        |), step1 AS (
        |  SELECT regexp_replace(regexp_replace(regexp_replace(url,
        |    '#.*', '', 'g'),
        |    '(utm_[a-zA-Z]+|gclid|fbclid)=[^&]*&?', '', 'g'),
        |    '[?&]+$', '', 'g') AS u
        |  FROM raw
        |), parts AS (
        |  SELECT u,
        |    regexp_replace(lower(regexp_extract(u,
        |      '^[A-Za-z]+://([^/?#]+)', 1)), ':(80|443)$', '', 'g') AS host,
        |    regexp_replace(replace(regexp_extract(u,
        |      '^[A-Za-z]+://[^/?#]+(.*)', 1), '/?', '?'),
        |      '/+$', '', 'g') AS path
        |  FROM step1
        |), norm AS (
        |  SELECT host,
        |    lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) || '://' ||
        |      host || path AS url_norm,
        |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM parts
        |), kept AS (
        |  SELECT * FROM norm WHERE domain NOT IN ('src3.io', 'src6.net')
        |)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(DISTINCT url_norm) AS BIGINT) AS n_unique_urls,
        |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
        |FROM kept GROUP BY 1 ORDER BY domain""".stripMargin,
    // same staged HTML, same RE2-safe strip chain; inline (?is) flags work
    // in both engines, 'g' is DuckDB's replace-all (Spark's default)
    "web_extract" ->
      """WITH pages AS (
        |  SELECT doc_id,
        |    '<html><!-- id ' || CAST(doc_id AS VARCHAR) || ' -->' ||
        |    '<head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |    ' &amp; co</title>' ||
        |    '<script type="text/javascript">var x = 1; if (x < 2) { x = 3; }</script>' ||
        |    '<style>.nav { color: red; }</style></head>' ||
        |    '<body><div class="nav">Home | About | Contact</div>' ||
        |    '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
        |    '<p>' || substring(text, 1, 240) || '</p>' ||
        |    '<p>Short.</p>' ||
        |    '<div class="footer">Copyright 2026</div>' ||
        |    '</body></html>' AS html
        |  FROM documents
        |), stripped AS (
        |  SELECT doc_id,
        |    trim(regexp_extract(html,
        |      '(?is)<title[^>]*>(.*?)</title>', 1)) AS title,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(html,
        |      '(?s)<!--.*?-->', '', 'g'),
        |      '(?is)<script[^>]*>.*?</script>', '', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', '', 'g'),
        |      '(?i)</(p|div|h1|h2|h3|h4|h5|h6|li|tr|table|ul|ol|blockquote|title|head)>',
        |      chr(10), 'g'),
        |      '(?i)<(br|hr)[^>]*>', chr(10), 'g') AS blocked
        |  FROM pages
        |), cleaned AS (
        |  SELECT doc_id, title,
        |    regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(blocked, '(?s)<[^>]*>', ' ', 'g'),
        |        '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
        |        '&quot;', '"'), '&#39;', ''''),
        |      '[ \t\r]+', ' ', 'g') AS clean
        |  FROM stripped
        |), kept AS (
        |  SELECT doc_id, title,
        |    list_filter(list_transform(string_split(clean, chr(10)),
        |        x -> trim(x)),
        |      x -> length(x) >= 30 AND len(string_split(x, ' ')) >= 5)
        |      AS blocks
        |  FROM cleaned
        |)
        |SELECT doc_id, title,
        |  array_to_string(blocks, chr(10)) AS content,
        |  CAST(len(blocks) AS BIGINT) AS n_blocks
        |FROM kept ORDER BY doc_id""".stripMargin,
    "privacy_purge" ->
      """WITH del AS (
        |  SELECT DISTINCT user_id FROM events WHERE user_id % 9 = 0
        |), f AS (
        |  SELECT e.event_id, e.event_type, e.user_id,
        |    CASE WHEN d.user_id IS NULL THEN 0 ELSE 1 END AS dl
        |  FROM events e LEFT JOIN del d ON e.user_id = d.user_id
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS rows_before,
        |  CAST(sum(dl) AS BIGINT) AS rows_removed,
        |  CAST(sum(1 - dl) AS BIGINT) AS rows_after,
        |  CAST(count(DISTINCT CASE WHEN dl = 1 THEN user_id END)
        |    AS BIGINT) AS users_removed,
        |  CAST(sum(CASE WHEN dl = 0 THEN event_id ELSE 0 END)
        |    AS BIGINT) AS checksum_after
        |FROM f GROUP BY 1 ORDER BY event_type""".stripMargin,
    // the md5-prefix pseudonym recipe: 15 leading hex chars == first 60
    // digest bits, positive and inside BIGINT in both engines
    "privacy_pseudo" ->
      """WITH p AS (
        |  SELECT CAST('0x' || substr(md5('s42:' || CAST(user_id AS VARCHAR)),
        |    1, 15) AS BIGINT) AS pseudo_id, event_id
        |  FROM events
        |)
        |SELECT pseudo_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS checksum
        |FROM p GROUP BY 1 ORDER BY pseudo_id""".stripMargin,
    "text_keyphrases" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents
        |), pos AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t))) AS p, t
        |  FROM toks
        |), flagged AS (
        |  SELECT doc_id, p,
        |    regexp_replace(t[p], '[^a-z0-9]', '', 'g') AS w
        |  FROM pos
        |), grped AS (
        |  SELECT doc_id, p, w,
        |    CASE WHEN w = '' OR w IN ('the','a','an','and','or','of','to',
        |      'in','is','on','for','with','as','at','by','from','it',
        |      'this','that','are','was','be') THEN 1 ELSE 0 END AS st
        |  FROM flagged
        |), isl AS (
        |  SELECT doc_id, p, w, st,
        |    sum(st) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM grped
        |), ph0 AS (
        |  SELECT doc_id, grp, p, w FROM isl WHERE st = 0
        |), ph AS (
        |  SELECT *, count(*) OVER (PARTITION BY doc_id, grp) AS len
        |  FROM ph0
        |), phx AS (
        |  SELECT * FROM ph WHERE len <= 4
        |), wsc AS (
        |  SELECT doc_id, w,
        |    CAST(sum(len) AS BIGINT) * 1000000
        |      // CAST(count(*) AS BIGINT) AS wscore
        |  FROM phx GROUP BY 1, 2
        |), scored AS (
        |  SELECT x.doc_id, x.grp,
        |    CAST(sum(s.wscore) AS BIGINT) AS score_scaled,
        |    string_agg(x.w, ' ' ORDER BY x.p) AS phrase
        |  FROM phx x JOIN wsc s ON s.doc_id = x.doc_id AND s.w = x.w
        |  GROUP BY 1, 2
        |), dd AS (
        |  SELECT doc_id, phrase, max(score_scaled) AS score_scaled,
        |    CAST(count(*) AS BIGINT) AS n_occurrences
        |  FROM scored GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_scaled DESC, phrase) AS "rank"
        |  FROM dd
        |)
        |SELECT doc_id, CAST("rank" AS BIGINT) AS "rank", phrase,
        |  score_scaled, n_occurrences
        |FROM rk WHERE "rank" <= 5 ORDER BY doc_id, "rank"""".stripMargin,
    // add-1-smoothed integer ratio weights over all 64 buckets (range
    // join fills untouched ones); // is Spark's div twin on positives
    "text_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, source,
        |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64 AS bucket
        |  FROM toks
        |), rawc AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_raw
        |  FROM b GROUP BY 1
        |), tgtc AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_tgt
        |  FROM b WHERE source = 'src0' GROUP BY 1
        |), w AS (
        |  SELECT r.range AS bucket,
        |    (COALESCE(n_tgt, 0) + 1) * 1000000 // (COALESCE(n_raw, 0) + 1)
        |      AS w
        |  FROM range(64) r
        |  LEFT JOIN rawc ON rawc.bucket = r.range
        |  LEFT JOIN tgtc ON tgtc.bucket = r.range
        |), tf AS (
        |  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
        |  FROM b GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(tf * w) AS BIGINT) AS importance_scaled,
        |  CAST(sum(tf * w) // sum(tf) AS BIGINT) AS importance_ppm
        |FROM tf JOIN w USING (bucket)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "text_score_lr" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), tfs AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64 AS bucket,
        |    count(*) AS tf
        |  FROM toks GROUP BY 1, 2
        |), w AS (
        |  SELECT i AS bucket,
        |    CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 2001 - 1000 AS w
        |  FROM (SELECT unnest(generate_series(0, 63)) AS i)
        |)
        |SELECT doc_id, CAST(sum(tf * w) AS BIGINT) AS score_milli
        |FROM tfs JOIN w USING (bucket)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "pipeline_e2e" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), base AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
        |    CAST(len(list_distinct(toks)) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS type_token_ratio
        |  FROM t
        |), ng AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM t WHERE len(toks) >= 2
        |), per AS (
        |  SELECT doc_id, gram, count(*) AS c FROM ng GROUP BY 1, 2
        |), rep AS (
        |  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
        |    AS top_ngram_frac
        |  FROM per GROUP BY 1
        |), keepers AS (
        |  SELECT b.doc_id FROM base b
        |  LEFT JOIN rep r ON b.doc_id = r.doc_id
        |  WHERE b.n_tokens >= 10 AND b.n_tokens <= 1000
        |    AND b.stopword_ratio >= 0.02
        |    AND coalesce(r.top_ngram_frac, 0.0) <= 0.20
        |    AND b.type_token_ratio >= 0.30
        |), kept AS (
        |  SELECT t.doc_id, t.text, t.toks FROM t JOIN keepers USING (doc_id)
        |), dd AS (
        |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY text
        |), surv AS (
        |  SELECT k.doc_id, k.text, k.toks FROM kept k JOIN dd USING (doc_id)
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
        |  FROM surv WHERE len(toks) >= 3
        |), bench AS (
        |  SELECT DISTINCT unnest(list_distinct(
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
        |  FROM t WHERE doc_id < 20 AND len(toks) >= 3
        |), cont AS (
        |  SELECT s.doc_id FROM sh s LEFT JOIN bench b ON s.gram = b.gram
        |  GROUP BY s.doc_id
        |  HAVING CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE) >= 0.5
        |), train AS (
        |  SELECT doc_id, text FROM surv
        |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
        |    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |      NOT IN ('c', 'd', 'e', 'f')
        |), a AS (
        |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |    AS BIGINT) % 8 AS shard, text
        |  FROM train
        |)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(length(text)) AS BIGINT) AS n_bytes,
        |  CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
        |    AS BIGINT) AS checksum
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    // pipeline v2 twin: the v1 quality-gate CTEs, contamination over the
    // KEPT slice, the clusters walk sourced from `clean`, the
    // leakage-safe cluster-md5 split, soft-dedup 1e6 // n_copies
    // weights, the pinned-order ntile curriculum and the shard-md5
    // export close. Multiply-referenced frames are MATERIALIZED (the r6
    // inlining-blowup rule — `walk` references `clean` through two CTE
    // layers and DuckDB would otherwise recompute the quality gate per
    // reference).
    "pipeline_e2e_v2" ->
      """WITH RECURSIVE t AS MATERIALIZED (
        |  SELECT doc_id, text, n_chars,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), base AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
        |    CAST(len(list_distinct(toks)) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS type_token_ratio
        |  FROM t
        |), ng AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM t WHERE len(toks) >= 2
        |), per AS (
        |  SELECT doc_id, gram, count(*) AS c FROM ng GROUP BY 1, 2
        |), rep AS (
        |  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
        |    AS top_ngram_frac
        |  FROM per GROUP BY 1
        |), keepers AS (
        |  SELECT b.doc_id FROM base b
        |  LEFT JOIN rep r ON b.doc_id = r.doc_id
        |  WHERE b.n_tokens >= 10 AND b.n_tokens <= 1000
        |    AND b.stopword_ratio >= 0.02
        |    AND coalesce(r.top_ngram_frac, 0.0) <= 0.20
        |    AND b.type_token_ratio >= 0.30
        |), kept AS MATERIALIZED (
        |  SELECT t.doc_id, t.text, t.n_chars, t.toks
        |  FROM t JOIN keepers USING (doc_id)
        |), sh3 AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
        |  FROM kept WHERE len(toks) >= 3
        |), bench AS (
        |  SELECT DISTINCT unnest(list_distinct(
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
        |  FROM t WHERE doc_id < 20 AND len(toks) >= 3
        |), cont AS (
        |  SELECT s.doc_id FROM sh3 s LEFT JOIN bench b ON s.gram = b.gram
        |  GROUP BY s.doc_id
        |  HAVING CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE) >= 0.5
        |), clean AS MATERIALIZED (
        |  SELECT doc_id, text, n_chars, toks FROM kept
        |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
        |), shc AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
        |  FROM clean WHERE len(toks) >= 3
        |), pruned AS MATERIALIZED (
        |  SELECT doc_id, shingle FROM (
        |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
        |    FROM shc) WHERE df <= 25
        |), sizes AS (
        |  SELECT doc_id, count(*) AS set_size FROM pruned GROUP BY doc_id
        |), cand AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS common
        |  FROM pruned l JOIN pruned r
        |    ON l.shingle = r.shingle AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |), p AS (
        |  SELECT a_id, b_id FROM cand
        |  JOIN sizes sa ON cand.a_id = sa.doc_id
        |  JOIN sizes sb ON cand.b_id = sb.doc_id
        |  WHERE CAST(common AS DOUBLE)
        |    / CAST(sa.set_size + sb.set_size - common AS DOUBLE) >= 0.5
        |), nodes AS (
        |  SELECT a_id AS id FROM p UNION SELECT b_id FROM p
        |), edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM p
        |  UNION ALL SELECT b_id, a_id FROM p
        |), walk(id, label) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id
        |), comp AS (
        |  SELECT id, min(label) AS cluster_id FROM walk GROUP BY id
        |), train AS MATERIALIZED (
        |  SELECT c.doc_id, c.text, c.n_chars,
        |    coalesce(comp.cluster_id, c.doc_id) AS cluster_id
        |  FROM clean c LEFT JOIN comp ON c.doc_id = comp.id
        |  WHERE CAST('0x' || substr(md5(
        |      CAST(coalesce(comp.cluster_id, c.doc_id) AS VARCHAR)), 1, 2)
        |    AS BIGINT) >= 64
        |), w AS (
        |  SELECT doc_id, CAST(1000000 // count(*)
        |    OVER (PARTITION BY sha256(text)) AS BIGINT) AS weight_ppm
        |  FROM train
        |), cur AS (
        |  SELECT doc_id, stage,
        |    CAST(row_number() OVER (PARTITION BY stage
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS pos
        |  FROM (SELECT doc_id,
        |          CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
        |            AS stage
        |        FROM train)
        |), a AS (
        |  SELECT tr.doc_id, tr.text, tr.cluster_id,
        |    CAST('0x' || substr(md5(CAST(tr.doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 8 AS shard
        |  FROM train tr
        |)
        |SELECT cur.stage, a.shard,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(length(a.text)) AS BIGINT) AS n_bytes,
        |  CAST(sum(CAST('0x' || substr(md5(a.text), 1, 8) AS BIGINT))
        |    AS BIGINT) AS checksum,
        |  CAST(sum(w.weight_ppm) AS BIGINT) AS weight_mass_ppm,
        |  CAST(count(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
        |  CAST(sum(cur.pos) AS BIGINT) AS sum_pos
        |FROM a JOIN w ON a.doc_id = w.doc_id
        |JOIN cur ON a.doc_id = cur.doc_id
        |GROUP BY 1, 2 ORDER BY stage, shard""".stripMargin,
    // latenessProfile twin: events at MICROsecond precision, so the
    // nanos-side `div 1000000` becomes `// 1000` (Δns = Δus·1000 —
    // identical truncation); bit-length via the portable
    // length(ltrim(bin(x),'0')) with zero falling out as bucket 0
    "events_lateness" ->
      """WITH ev AS (
        |  SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) * 16777216 + event_id AS event_id,
        |    user_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |), hw AS (
        |  SELECT event_type,
        |    greatest(CAST(0 AS BIGINT),
        |      (COALESCE(max(us) OVER (PARTITION BY user_id ORDER BY
        |        event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1
        |        PRECEDING), us) - us) // 1000) AS late_ms
        |  FROM ev
        |), b AS (
        |  SELECT event_type,
        |    CAST(length(ltrim(bin(late_ms), '0')) AS BIGINT) AS late_bucket,
        |    late_ms
        |  FROM hw
        |)
        |SELECT event_type, late_bucket,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(late_ms) AS BIGINT) AS max_late_ms
        |FROM b GROUP BY event_type, late_bucket
        |ORDER BY event_type, late_bucket""".stripMargin,
    // zoneMapAudit twin: zone maps + probe membership counts per layout
    // bloom-index twin: identical md5-salted bits on both the build and
    // probe sides, all-bits conjunction via the per-probe distinct count
    "bloom_index_audit" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_orderkey // 4096 AS part FROM lineitem
        |), idx AS MATERIALIZED (
        |  SELECT DISTINCT part,
        |    CAST('0x' || substr(md5(CAST(g.h AS VARCHAR) || ':' ||
        |      CAST(l_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 16384 AS bit
        |  FROM li CROSS JOIN generate_series(1, 3) AS g(h)
        |), probes AS (
        |  SELECT probe FROM (
        |    SELECT DISTINCT l_orderkey AS probe FROM li
        |    ORDER BY probe LIMIT 6)
        |  UNION ALL SELECT 999999999 UNION ALL SELECT 888888888
        |), pb AS (
        |  SELECT DISTINCT probe,
        |    CAST('0x' || substr(md5(CAST(g.h AS VARCHAR) || ':' ||
        |      CAST(probe AS VARCHAR)), 1, 8) AS BIGINT) % 16384 AS bit
        |  FROM probes CROSS JOIN generate_series(1, 3) AS g(h)
        |), nreq AS (
        |  SELECT probe, CAST(count(*) AS BIGINT) AS nreq
        |  FROM pb GROUP BY 1
        |), tot AS (
        |  SELECT CAST(count(DISTINCT part) AS BIGINT) AS parts_total
        |  FROM idx
        |), sc AS (
        |  SELECT j.probe, CAST(count(*) AS BIGINT) AS parts_scanned
        |  FROM (
        |    SELECT pb.probe, idx.part, count(*) AS nbits
        |    FROM pb JOIN idx USING (bit) GROUP BY 1, 2
        |  ) j JOIN nreq ON nreq.probe = j.probe
        |  WHERE j.nbits = nreq.nreq GROUP BY 1
        |), truth AS (
        |  SELECT l_orderkey AS probe,
        |    CAST(count(DISTINCT part) AS BIGINT) AS parts_true
        |  FROM li GROUP BY 1
        |)
        |SELECT p.probe, coalesce(sc.parts_scanned, 0) AS parts_scanned,
        |  tot.parts_total, coalesce(t.parts_true, 0) AS parts_true
        |FROM (SELECT DISTINCT probe FROM probes) p
        |LEFT JOIN sc ON sc.probe = p.probe
        |LEFT JOIN truth t ON t.probe = p.probe
        |CROSS JOIN tot
        |ORDER BY p.probe""".stripMargin,
    "zonemap_audit" ->
      """WITH probes AS (
        |  SELECT DISTINCT l_orderkey AS probe FROM lineitem
        |  WHERE l_orderkey % 6000 = 0
        |), hz AS (
        |  SELECT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
        |      1, 8) AS BIGINT) % 32 AS part,
        |    min(l_orderkey) AS zmin, max(l_orderkey) AS zmax
        |  FROM lineitem GROUP BY 1
        |), rz AS (
        |  SELECT l_orderkey // 2000 AS part,
        |    min(l_orderkey) AS zmin, max(l_orderkey) AS zmax
        |  FROM lineitem GROUP BY 1
        |), audits AS (
        |  SELECT 'hash' AS layout, probe,
        |    CAST(sum(CASE WHEN probe >= zmin AND probe <= zmax
        |      THEN 1 ELSE 0 END) AS BIGINT) AS parts_scanned,
        |    (SELECT CAST(count(*) AS BIGINT) FROM hz) AS parts_total
        |  FROM probes, hz GROUP BY probe
        |  UNION ALL
        |  SELECT 'range' AS layout, probe,
        |    CAST(sum(CASE WHEN probe >= zmin AND probe <= zmax
        |      THEN 1 ELSE 0 END) AS BIGINT) AS parts_scanned,
        |    (SELECT CAST(count(*) AS BIGINT) FROM rz) AS parts_total
        |  FROM probes, rz GROUP BY probe
        |)
        |SELECT layout, probe, parts_scanned, parts_total FROM audits
        |ORDER BY layout, probe""".stripMargin,
    // mergeManifests twin: additivity means the merged manifest IS the
    // full-corpus manifest — the oracle recomputes from scratch
    "shard_incremental" ->
      """WITH a AS (
        |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |    AS BIGINT) % 16 AS shard, text
        |  FROM documents
        |)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(length(text)) AS BIGINT) AS n_bytes,
        |  CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
        |    AS BIGINT) AS checksum
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    // range-shard twin: rebuild the md5 bottom-k sample, cut it at the
    // i/16 quantile ranks, assign by boundary count, join the bounds
    "shard_range" ->
      """WITH li AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_orderkey AS VARCHAR) || ':' ||
        |      CAST(l_linenumber AS VARCHAR) || ':' ||
        |      CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |        AS VARCHAR) AS id
        |  FROM lineitem
        |), s AS (
        |  SELECT v, id FROM li
        |  ORDER BY md5('qs:' || id) ASC, id ASC
        |  LIMIT 1024
        |), r AS MATERIALIZED (
        |  SELECT v, row_number() OVER (ORDER BY v, id) AS r FROM s
        |), ns AS (SELECT CAST(max(r) AS BIGINT) AS n_sample FROM r),
        |bq AS (SELECT CAST(unnest(range(1, 16)) AS BIGINT) AS i),
        |b AS MATERIALIZED (
        |  SELECT bq.i, CAST(r.v AS BIGINT) AS est
        |  FROM bq CROSS JOIN ns
        |  JOIN r ON r.r = greatest(1,
        |    (((bq.i * 1000000) // 16) * ns.n_sample + 999999) // 1000000)
        |), a AS (
        |  SELECT li.v,
        |    (SELECT count(*) FROM b WHERE b.est <= li.v) AS shard
        |  FROM li
        |), g AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(min(v) AS BIGINT) AS min_v, CAST(max(v) AS BIGINT) AS max_v
        |  FROM a GROUP BY shard
        |)
        |SELECT g.shard,
        |  (SELECT est FROM b WHERE b.i = g.shard) AS lo,
        |  (SELECT est FROM b WHERE b.i = g.shard + 1) AS hi,
        |  g.n_rows, g.min_v, g.max_v
        |FROM g ORDER BY shard""".stripMargin,
    "privacy_kanon" ->
      """WITH c AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    c_mktsegment AS segment,
        |    CAST(floor(c_acctbal / CAST('2000' AS DOUBLE)) AS BIGINT)
        |      AS bal_band,
        |    CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 5 AS sens
        |  FROM customer
        |)
        |SELECT nation, segment, bal_band,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  CAST(count(DISTINCT sens) AS BIGINT) AS l_diversity,
        |  count(*) < 5 AS violates_k,
        |  count(DISTINCT sens) < 2 AS violates_l
        |FROM c GROUP BY nation, segment, bal_band
        |ORDER BY nation, segment, bal_band""".stripMargin,
    // generalizeKAnon twin: same 5 serialized ladder levels, per-level
    // violation mass, COALESCE(first clean level, coarsest), class
    // rollup at the chosen level via the same CASE pick
    "privacy_generalize" ->
      """WITH base AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    c_mktsegment AS seg,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
        |  FROM customer
        |), keyed AS (
        |  SELECT
        |    CAST(nation AS VARCHAR) || '|' || seg || '|' ||
        |      CAST((bal + 1000000) // 10000 AS VARCHAR) AS q0,
        |    CAST(nation AS VARCHAR) || '|' || seg || '|' ||
        |      CAST((bal + 1000000) // 100000 AS VARCHAR) AS q1,
        |    CAST(nation AS VARCHAR) || '|*|' ||
        |      CAST((bal + 1000000) // 100000 AS VARCHAR) AS q2,
        |    CAST(nation // 5 AS VARCHAR) || '|*|' ||
        |      CAST((bal + 1000000) // 1000000 AS VARCHAR) AS q3,
        |    '*|*|*' AS q4
        |  FROM base
        |), s0 AS (
        |  SELECT CAST(0 AS BIGINT) AS lvl,
        |    CAST(COALESCE(SUM(CASE WHEN n < 10 THEN n END), 0) AS BIGINT)
        |      AS viol
        |  FROM (SELECT q0, CAST(count(*) AS BIGINT) AS n
        |        FROM keyed GROUP BY 1)
        |), s1 AS (
        |  SELECT CAST(1 AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 10 THEN n END), 0) AS BIGINT)
        |  FROM (SELECT q1, CAST(count(*) AS BIGINT) AS n
        |        FROM keyed GROUP BY 1)
        |), s2 AS (
        |  SELECT CAST(2 AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 10 THEN n END), 0) AS BIGINT)
        |  FROM (SELECT q2, CAST(count(*) AS BIGINT) AS n
        |        FROM keyed GROUP BY 1)
        |), s3 AS (
        |  SELECT CAST(3 AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 10 THEN n END), 0) AS BIGINT)
        |  FROM (SELECT q3, CAST(count(*) AS BIGINT) AS n
        |        FROM keyed GROUP BY 1)
        |), s4 AS (
        |  SELECT CAST(4 AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 10 THEN n END), 0) AS BIGINT)
        |  FROM (SELECT q4, CAST(count(*) AS BIGINT) AS n
        |        FROM keyed GROUP BY 1)
        |), stats AS (
        |  SELECT * FROM s0 UNION ALL SELECT * FROM s1
        |  UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
        |  UNION ALL SELECT * FROM s4
        |), chosen AS (
        |  SELECT COALESCE(min(CASE WHEN viol = 0 THEN lvl END), max(lvl))
        |    AS lvl
        |  FROM stats
        |)
        |SELECT c.lvl AS lvl,
        |  CASE c.lvl WHEN 0 THEN q0 WHEN 1 THEN q1 WHEN 2 THEN q2
        |    WHEN 3 THEN q3 WHEN 4 THEN q4 END AS qid,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  count(*) < 10 AS suppressed
        |FROM keyed, chosen c
        |GROUP BY 1, 2 ORDER BY qid""".stripMargin,
    "shard_manifest" ->
      """WITH a AS (
        |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |    AS BIGINT) % 16 AS shard, text
        |  FROM documents
        |)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(length(text)) AS BIGINT) AS n_bytes,
        |  CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
        |    AS BIGINT) AS checksum
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    "text_hashtf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), b AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64 AS bucket,
        |    CASE WHEN CAST('0x' || substr(md5(tok), 9, 1) AS BIGINT) < 8
        |      THEN 1 ELSE -1 END AS sign
        |  FROM toks
        |)
        |SELECT doc_id, bucket, count(*) AS tf,
        |  CAST(sum(sign) AS BIGINT) AS signed_tf
        |FROM b GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,
    // the perceptron rounds unrolled; every per-round CTE that later
    // rounds reference twice is MATERIALIZED (DuckDB inlines plain CTEs
    // per reference — the graph_scc 2^rounds lesson). Round 1 from w=0
    // marks every doc misclassified, so w1 folds to one aggregation.
    "text_train_lr" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), feats AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS tf,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS label
        |  FROM toks
        |  GROUP BY doc_id, bucket, label
        |), w1 AS MATERIALIZED (
        |  SELECT bucket, CAST(sum(label * tf) AS BIGINT) AS w
        |  FROM feats GROUP BY bucket
        |), m2 AS MATERIALIZED (
        |  SELECT f.doc_id FROM feats f
        |  LEFT JOIN w1 ON f.bucket = w1.bucket
        |  GROUP BY f.doc_id, f.label
        |  HAVING f.label * sum(f.tf * coalesce(w1.w, 0)) <= 0
        |), u2 AS (
        |  SELECT bucket, CAST(sum(label * tf) AS BIGINT) AS d
        |  FROM feats WHERE doc_id IN (SELECT doc_id FROM m2)
        |  GROUP BY bucket
        |), w2 AS MATERIALIZED (
        |  SELECT w1.bucket, CAST(w1.w + coalesce(u2.d, 0) AS BIGINT) AS w
        |  FROM w1 LEFT JOIN u2 ON w1.bucket = u2.bucket
        |), m3 AS MATERIALIZED (
        |  SELECT f.doc_id FROM feats f
        |  LEFT JOIN w2 ON f.bucket = w2.bucket
        |  GROUP BY f.doc_id, f.label
        |  HAVING f.label * sum(f.tf * coalesce(w2.w, 0)) <= 0
        |), u3 AS (
        |  SELECT bucket, CAST(sum(label * tf) AS BIGINT) AS d
        |  FROM feats WHERE doc_id IN (SELECT doc_id FROM m3)
        |  GROUP BY bucket
        |), w3 AS MATERIALIZED (
        |  SELECT w2.bucket, CAST(w2.w + coalesce(u3.d, 0) AS BIGINT) AS w
        |  FROM w2 LEFT JOIN u3 ON w2.bucket = u3.bucket
        |)
        |SELECT r.range AS bucket, CAST(coalesce(w3.w, 0) AS BIGINT) AS w
        |FROM range(64) r LEFT JOIN w3 ON r.range = w3.bucket
        |ORDER BY bucket""".stripMargin,
    "events_runs" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts, event_type
        |  FROM events
        |), fl AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END
        |      AS chg
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), rn AS (
        |  SELECT user_id, event_type, ts,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS run_id
        |  FROM fl
        |)
        |SELECT user_id, run_id, min(event_type) AS event_type,
        |  count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts
        |FROM rn GROUP BY user_id, run_id
        |ORDER BY user_id, run_id""".stripMargin,
    // label-propagation twin: identical synchronous rounds; the Spark
    // side's min(struct(MaxValue - n, lbl)) argmax == ORDER BY n DESC,
    // lbl ASC row_number = 1
    // randomWalks twin: per step, row_number over the md5-prefix hash
    // (dst tiebreak) == Spark's min(struct(hash, dst)) argmin; a LEFT
    // JOIN's null-extension row is the only row for a sink, so rn=1
    // freezes the walk. Each step CTE is referenced once -> inlining
    // stays linear.
    "graph_walks" -> {
      val step = (prev: String, cur: String, t: Int) =>
        s"""$cur AS (
           |  SELECT walk_id,
           |    CASE WHEN dst IS NULL THEN cur ELSE dst END AS cur,
           |    CASE WHEN dst IS NULL THEN path
           |         ELSE path || '->' || CAST(dst AS VARCHAR) END AS path
           |  FROM (
           |    SELECT s.walk_id, s.cur, s.path, e.dst,
           |      row_number() OVER (PARTITION BY s.walk_id ORDER BY
           |        CAST('0x' || substr(md5(CAST(s.walk_id AS VARCHAR) ||
           |          ':' || '$t' || ':' || CAST(e.dst AS VARCHAR)),
           |          1, 8) AS BIGINT), e.dst) AS rn
           |    FROM $prev s LEFT JOIN e0 e ON e.src = s.cur
           |  ) WHERE rn = 1
           |)""".stripMargin
      s"""WITH ed AS (
         |  SELECT DISTINCT l_orderkey AS src, l_partkey + 20000000 AS dst
         |  FROM lineitem
         |), e0 AS (
         |  SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed
         |), s0 AS (
         |  SELECT DISTINCT src AS walk_id, src AS cur,
         |    CAST(src AS VARCHAR) AS path
         |  FROM ed WHERE src % 100 = 0
         |), ${step("s0", "s1", 1)},
         |${step("s1", "s2", 2)},
         |${step("s2", "s3", 3)},
         |${step("s3", "s4", 4)}
         |SELECT walk_id, cur AS end_node, path FROM s4
         |ORDER BY walk_id""".stripMargin
    },
    // walkCorpus twin: the graph_walks step CTEs, then positions from the
    // zipped dual-UNNEST (string_split tokens + range(len) — equal-length
    // UNNESTs zip positionally), per-offset pair join, pair-count close.
    // toks MUST be MATERIALIZED: it is referenced twice (both join
    // sides), and inlining it would duplicate the whole walk chain per
    // side (the graph_scc 2^n lesson).
    "graph_walk_corpus" -> {
      val step = (prev: String, cur: String, t: Int) =>
        s"""$cur AS (
           |  SELECT walk_id,
           |    CASE WHEN dst IS NULL THEN cur ELSE dst END AS cur,
           |    CASE WHEN dst IS NULL THEN path
           |         ELSE path || '->' || CAST(dst AS VARCHAR) END AS path
           |  FROM (
           |    SELECT s.walk_id, s.cur, s.path, e.dst,
           |      row_number() OVER (PARTITION BY s.walk_id ORDER BY
           |        CAST('0x' || substr(md5(CAST(s.walk_id AS VARCHAR) ||
           |          ':' || '$t' || ':' || CAST(e.dst AS VARCHAR)),
           |          1, 8) AS BIGINT), e.dst) AS rn
           |    FROM $prev s LEFT JOIN e0 e ON e.src = s.cur
           |  ) WHERE rn = 1
           |)""".stripMargin
      s"""WITH ed AS (
         |  SELECT DISTINCT l_orderkey AS src, l_partkey + 20000000 AS dst
         |  FROM lineitem
         |), e0 AS (
         |  SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed
         |), s0 AS (
         |  SELECT DISTINCT src AS walk_id, src AS cur,
         |    CAST(src AS VARCHAR) AS path
         |  FROM ed WHERE src % 100 = 0
         |), ${step("s0", "s1", 1)},
         |${step("s1", "s2", 2)},
         |${step("s2", "s3", 3)},
         |${step("s3", "s4", 4)},
         |toks AS MATERIALIZED (
         |  SELECT walk_id, CAST(tok AS BIGINT) AS node, pos FROM (
         |    SELECT walk_id,
         |      UNNEST(string_split(path, '->')) AS tok,
         |      UNNEST(range(len(string_split(path, '->')))) AS pos
         |    FROM s4)
         |)
         |SELECT a.node AS a, b.node AS b, CAST(count(*) AS BIGINT) AS n
         |FROM toks a JOIN toks b ON b.walk_id = a.walk_id
         |  AND (b.pos = a.pos + 1 OR b.pos = a.pos + 2)
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin
    },
    // biasedWalks twin: candidates replicate via UNNEST(range(w)) (w from
    // the return/near/far CASE; the near flag is a keyed LEFT JOIN on
    // (prev, dst)), then the per-walk rank over (md5-prefix hash, dst)
    // picks the winner — min of w iid hashes == categorical ∝ w, salt
    // excluded from the tie-break exactly like Spark's min(struct).
    // Each step references its predecessor TWICE (outer frozen-walk
    // extension + inner candidate source) → AS MATERIALIZED or DuckDB
    // inlines 2^steps copies (the graph_scc lesson).
    "graph_walks_biased" -> {
      val step = (prev: String, cur: String, t: Int) =>
        s"""$cur AS MATERIALIZED (
           |  SELECT walk_id,
           |    CASE WHEN dst IS NULL THEN prev ELSE cur END AS prev,
           |    CASE WHEN dst IS NULL THEN cur ELSE dst END AS cur,
           |    CASE WHEN dst IS NULL THEN path
           |         ELSE path || '->' || CAST(dst AS VARCHAR) END AS path
           |  FROM (
           |    SELECT s.walk_id, s.prev, s.cur, s.path, c.dst,
           |      row_number() OVER (PARTITION BY s.walk_id
           |        ORDER BY c.h, c.dst) AS rn
           |    FROM $prev s LEFT JOIN (
           |      SELECT walk_id, dst,
           |        CAST('0x' || substr(md5(CAST(walk_id AS VARCHAR) ||
           |          ':' || '$t' || ':' || CAST(dst AS VARCHAR) || ':' ||
           |          CAST(salt AS VARCHAR)), 1, 8) AS BIGINT) AS h
           |      FROM (
           |        SELECT s2.walk_id, e.dst,
           |          UNNEST(range(CASE WHEN e.dst = s2.prev THEN 1
           |            WHEN n.src IS NOT NULL THEN 2 ELSE 4 END)) AS salt
           |        FROM $prev s2 JOIN e0 e ON e.src = s2.cur
           |        LEFT JOIN e0 n ON n.src = s2.prev AND n.dst = e.dst
           |      )
           |    ) c ON c.walk_id = s.walk_id
           |  ) WHERE rn = 1
           |)""".stripMargin
      s"""WITH ed AS (
         |  SELECT DISTINCT l_orderkey AS src, l_partkey + 20000000 AS dst
         |  FROM lineitem
         |), e0 AS (
         |  SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed
         |), s0 AS MATERIALIZED (
         |  SELECT DISTINCT src AS walk_id, CAST(NULL AS BIGINT) AS prev,
         |    src AS cur, CAST(src AS VARCHAR) AS path
         |  FROM ed WHERE src % 100 = 0
         |), ${step("s0", "s1", 1)},
         |${step("s1", "s2", 2)},
         |${step("s2", "s3", 3)},
         |${step("s3", "s4", 4)}
         |SELECT walk_id, cur AS end_node, path FROM s4
         |ORDER BY walk_id""".stripMargin
    },
    "graph_labelprop" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT a AS id, lbl FROM (
           |    SELECT e.a, l.lbl, count(*) AS n,
           |      row_number() OVER (PARTITION BY e.a
           |        ORDER BY count(*) DESC, l.lbl) AS rn
           |    FROM e0 e JOIN $prev l ON e.b = l.id
           |    GROUP BY e.a, l.lbl
           |  ) WHERE rn = 1
           |)""".stripMargin
      s"""WITH ed AS (
         |  SELECT DISTINCT l_orderkey AS a, l_partkey + 20000000 AS b
         |  FROM lineitem
         |), e0 AS (
         |  SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed
         |), l0 AS (
         |  SELECT DISTINCT a AS id, a AS lbl FROM e0
         |), ${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")}
         |SELECT id, lbl FROM l3 ORDER BY id""".stripMargin
    },
    // modularity twin: the same unrolled labelprop rounds (MATERIALIZED —
    // the close references l3 three times and DuckDB inlines per
    // reference), then the exact integer Q close
    "graph_modularity" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS MATERIALIZED (
           |  SELECT a AS id, lbl FROM (
           |    SELECT e.a, l.lbl, count(*) AS n,
           |      row_number() OVER (PARTITION BY e.a
           |        ORDER BY count(*) DESC, l.lbl) AS rn
           |    FROM e0 e JOIN $prev l ON e.b = l.id
           |    GROUP BY e.a, l.lbl
           |  ) WHERE rn = 1
           |)""".stripMargin
      s"""WITH ed AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS a, l_partkey + 20000000 AS b
         |  FROM lineitem
         |), e0 AS MATERIALIZED (
         |  SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed
         |), l0 AS (
         |  SELECT DISTINCT a AS id, a AS lbl FROM e0
         |), ${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")},
         |adj AS MATERIALIZED (
         |  SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM ed
         |), mm AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m FROM adj
         |), intra AS (
         |  SELECT la.lbl, CAST(count(*) AS BIGINT) AS e_in
         |  FROM adj JOIN l3 la ON adj.lo = la.id
         |  JOIN l3 lb ON adj.hi = lb.id
         |  WHERE la.lbl = lb.lbl GROUP BY 1
         |), deg AS (
         |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT lo AS id FROM adj UNION ALL SELECT hi FROM adj) z
         |  GROUP BY 1
         |), dc AS (
         |  SELECT l3.lbl, CAST(sum(deg) AS BIGINT) AS d_c
         |  FROM l3 JOIN deg ON l3.id = deg.id GROUP BY 1
         |), cell AS (
         |  SELECT dc.lbl, dc.d_c, coalesce(intra.e_in, 0) AS e_in
         |  FROM dc LEFT JOIN intra ON dc.lbl = intra.lbl
         |)
         |SELECT CAST(min(m) AS BIGINT) AS m_edges,
         |  CAST(count(*) AS BIGINT) AS n_communities,
         |  CAST(sum(4 * m * e_in - d_c * d_c) AS BIGINT) AS q_num,
         |  CAST(min(4 * m * m) AS BIGINT) AS q_den,
         |  CAST(sum(4 * m * e_in - d_c * d_c) AS DOUBLE)
         |    / CAST(min(4 * m * m) AS DOUBLE) AS modularity
         |FROM cell, mm ORDER BY m_edges""".stripMargin
    },
    // binQuantiles twin: identical IEEE divide chains; quantile literals
    // exactSelect twin: the k-th smallest (selection — a value FROM the
    // data, no interpolation) via one ranked pass; same ceil(q·n) rank
    "value_exact_select" ->
      """WITH v AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |q AS (SELECT CAST(unnest([500000, 900000]) AS BIGINT) AS q_ppm),
        |r AS (
        |  SELECT q.q_ppm,
        |    greatest(1, (q.q_ppm * nn.n + 999999) // 1000000) AS k, nn.n
        |  FROM q CROSS JOIN nn
        |), o AS (
        |  SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v
        |)
        |SELECT r.q_ppm, CAST(o.v AS BIGINT) AS value, r.n
        |FROM r JOIN o ON o.rn = r.k ORDER BY q_ppm""".stripMargin,
    // weighted-selection twin: cumulative weight over ORDER BY v with
    // RANGE peers (ties carry their full group weight), smallest v
    // whose cumweight reaches the weighted rank
    "value_weighted_select" ->
      """WITH v AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem
        |), ww AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM v),
        |q AS (SELECT CAST(unnest([500000, 900000]) AS BIGINT) AS q_ppm),
        |r AS (
        |  SELECT q.q_ppm,
        |    greatest(1, (q.q_ppm * ww.wt + 999999) // 1000000) AS k, ww.wt
        |  FROM q CROSS JOIN ww
        |), c AS (
        |  SELECT v, CAST(sum(w) OVER (ORDER BY v) AS BIGINT) AS cw FROM v
        |)
        |SELECT r.q_ppm,
        |  (SELECT CAST(min(c.v) AS BIGINT) FROM c WHERE c.cw >= r.k)
        |    AS value,
        |  r.wt AS w_total
        |FROM r ORDER BY q_ppm""".stripMargin,
    // forced to DOUBLE (bare 0.9 parses as DECIMAL in DuckDB, and
    // decimal ceil(q*n) would diverge from the double path)
    "value_quantile_bins" ->
      """WITH bounds AS (
        |  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
        |    CAST(max(l_extendedprice) AS DOUBLE) AS hi,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem
        |), binned AS (
        |  SELECT CASE WHEN hi = lo THEN 0 ELSE
        |    least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo)
        |      / ((hi - lo) / CAST(64 AS DOUBLE))) AS BIGINT), 63) END AS bin,
        |    lo, hi, n
        |  FROM lineitem, bounds
        |), counts AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n_bin, min(lo) AS lo,
        |    min(hi) AS hi, min(n) AS n
        |  FROM binned GROUP BY bin
        |), cum AS (
        |  SELECT bin, n_bin, lo, hi, n,
        |    CAST(sum(n_bin) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS n_le
        |  FROM counts
        |), qrows AS (
        |  SELECT cum.*, q FROM cum, (SELECT unnest([
        |    CAST('0.5' AS DOUBLE), CAST('0.9' AS DOUBLE),
        |    CAST('0.99' AS DOUBLE)]) AS q) qs
        |)
        |SELECT q, bin,
        |  lo + CAST(bin AS DOUBLE) * ((hi - lo) / CAST(64 AS DOUBLE)) AS est,
        |  n_le
        |FROM qrows
        |WHERE n_le >= ceil(q * CAST(n AS DOUBLE))
        |  AND n_le - n_bin < ceil(q * CAST(n AS DOUBLE))
        |ORDER BY q""".stripMargin,
    "events_drift" ->
      """WITH a AS (
        |  SELECT event_type AS cat, CAST(count(*) AS BIGINT) AS n_a
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1
        |), b AS (
        |  SELECT event_type AS cat, CAST(count(*) AS BIGINT) AS n_b
        |  FROM events WHERE event_id % 2 = 1 GROUP BY 1
        |), merged AS (
        |  SELECT cat, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |  FROM a FULL OUTER JOIN b USING (cat)
        |), tot AS (
        |  SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |    CAST(sum(n_b) AS BIGINT) AS tb
        |  FROM merged
        |), ex AS (
        |  SELECT cat, n_a, n_b,
        |    CAST(n_a + n_b AS DOUBLE) * CAST(ta AS DOUBLE)
        |      / CAST(ta + tb AS DOUBLE) AS e_a,
        |    CAST(n_a + n_b AS DOUBLE) * CAST(tb AS DOUBLE)
        |      / CAST(ta + tb AS DOUBLE) AS e_b
        |  FROM merged, tot
        |)
        |SELECT cat, n_a, n_b,
        |  CAST(floor((CAST(n_a AS DOUBLE) - e_a) * (CAST(n_a AS DOUBLE) - e_a)
        |      / e_a * CAST('1e6' AS DOUBLE))
        |    + floor((CAST(n_b AS DOUBLE) - e_b) * (CAST(n_b AS DOUBLE) - e_b)
        |      / e_b * CAST('1e6' AS DOUBLE)) AS BIGINT) AS chi2_scaled
        |FROM ex ORDER BY cat""".stripMargin,
    // k-core twin: the same fixed 5 peel rounds unrolled as CTEs (the
    // pagerank bounded-iteration recipe); converged rounds are no-ops.
    "graph_kcore" -> {
      val round = (prev: String, cur: String, keep: String) =>
        s"""$keep AS (
           |  SELECT a FROM $prev GROUP BY a HAVING count(*) >= 4
           |), $cur AS (
           |  SELECT e.a, e.b FROM $prev e
           |  WHERE e.a IN (SELECT a FROM $keep)
           |    AND e.b IN (SELECT a FROM $keep)
           |)""".stripMargin
      s"""WITH ed AS (
         |  SELECT DISTINCT l_orderkey AS a, l_partkey + 20000000 AS b
         |  FROM lineitem
         |), e0 AS (
         |  SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed
         |), ${round("e0", "e1", "k0")},
         |${round("e1", "e2", "k1")},
         |${round("e2", "e3", "k2")},
         |${round("e3", "e4", "k3")},
         |${round("e4", "e5", "k4")}
         |SELECT a AS id, CAST(count(*) AS BIGINT) AS deg
         |FROM e5 GROUP BY a ORDER BY id""".stripMargin
    },
    // HLL twin: identical 60-bit md5-prefix hash split 8/52, rho via
    // bin+ltrim (both engines print unpadded binary; zero payload ->
    // empty string -> rho 53 with no special case); the alpha*m^2*2^53
    // literal is the Scala-folded double, round-tripped verbatim.
    "sketch_hll_users" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events
        |), r AS (
        |  SELECT event_type, h // 4503599627370496 AS bucket,
        |    53 - length(ltrim(bin(h % 4503599627370496), '0')) AS rho
        |  FROM h
        |), reg AS (
        |  SELECT event_type, bucket, CAST(max(rho) AS BIGINT) AS rho_max
        |  FROM r GROUP BY 1, 2
        |), agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_registers,
        |    CAST(sum(1::BIGINT << CAST(53 - rho_max AS INTEGER))
        |      AS BIGINT) AS present_scaled
        |  FROM reg GROUP BY 1
        |)
        |SELECT event_type, n_registers,
        |  present_scaled + (256 - n_registers) * (1::BIGINT << 53)
        |    AS sum_scaled,
        |  CAST('4.2399330249068963e+20' AS DOUBLE)
        |    / CAST(present_scaled + (256 - n_registers) * (1::BIGINT << 53)
        |        AS DOUBLE) AS est
        |FROM agg ORDER BY event_type""".stripMargin,
    "events_rolling_hll" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events
        |), h AS (
        |  SELECT day,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM ev
        |), r AS (
        |  SELECT day, h // 4503599627370496 AS bucket,
        |    53 - length(ltrim(bin(h % 4503599627370496), '0')) AS rho
        |  FROM h
        |), reg AS (
        |  SELECT day, bucket, CAST(max(rho) AS BIGINT) AS rho_max
        |  FROM r GROUP BY 1, 2
        |), days AS (
        |  SELECT DISTINCT day FROM ev
        |), contrib AS (
        |  SELECT reg.day + g.g AS cday, bucket, rho_max
        |  FROM reg, (SELECT unnest(generate_series(0, 6)) AS g) g
        |), merged AS (
        |  SELECT cday AS day, bucket, CAST(max(rho_max) AS BIGINT)
        |    AS rho_max
        |  FROM contrib JOIN days ON contrib.cday = days.day
        |  GROUP BY 1, 2
        |), agg AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS n_registers,
        |    CAST(sum(1::BIGINT << CAST(53 - rho_max AS INTEGER))
        |      AS BIGINT) AS present_scaled
        |  FROM merged GROUP BY 1
        |)
        |SELECT day, n_registers,
        |  present_scaled + (256 - n_registers) * (1::BIGINT << 53)
        |    AS sum_scaled,
        |  CAST('4.2399330249068963e+20' AS DOUBLE)
        |    / CAST(present_scaled + (256 - n_registers) * (1::BIGINT << 53)
        |        AS DOUBLE) AS est
        |FROM agg ORDER BY day""".stripMargin,
    // KMV twin: identical 60-bit hashes; Spark's folded (k-1)*2^60
    // literal == the SQL product of 255.0 and the exact 2^60 double
    "events_audience_overlap" ->
      """WITH hashed AS (
        |  SELECT DISTINCT event_type AS set_id,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events
        |), sk AS (
        |  SELECT set_id, h FROM (
        |    SELECT set_id, h,
        |      row_number() OVER (PARTITION BY set_id ORDER BY h) AS rn
        |    FROM hashed) WHERE rn <= 256
        |), sets AS (
        |  SELECT DISTINCT set_id FROM sk
        |), pairs AS (
        |  SELECT a.set_id AS set_a, b.set_id AS set_b
        |  FROM sets a, sets b WHERE a.set_id < b.set_id
        |), contrib AS (
        |  SELECT p.set_a, p.set_b, s.h, 'a' AS side
        |  FROM sk s JOIN pairs p ON s.set_id = p.set_a
        |  UNION ALL
        |  SELECT p.set_a, p.set_b, s.h, 'b' AS side
        |  FROM sk s JOIN pairs p ON s.set_id = p.set_b
        |), uniq AS (
        |  SELECT set_a, set_b, h, count(DISTINCT side) AS sides
        |  FROM contrib GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT * FROM (
        |    SELECT set_a, set_b, h, sides,
        |      row_number() OVER (PARTITION BY set_a, set_b ORDER BY h)
        |        AS rn
        |    FROM uniq) WHERE rn <= 256
        |), agg AS (
        |  SELECT set_a, set_b, CAST(max(h) AS BIGINT) AS theta,
        |    CAST(count(*) AS BIGINT) AS n_union,
        |    CAST(sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_common
        |  FROM ranked GROUP BY 1, 2
        |)
        |SELECT set_a, set_b, theta, n_union, n_common,
        |  CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE)
        |    AS jaccard_est,
        |  CASE WHEN n_union < 256 THEN CAST(n_union AS DOUBLE)
        |    ELSE CAST(255 AS DOUBLE)
        |      * CAST('1.152921504606846976e18' AS DOUBLE)
        |      / CAST(theta AS DOUBLE) END AS union_est,
        |  CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE)
        |    * (CASE WHEN n_union < 256 THEN CAST(n_union AS DOUBLE)
        |        ELSE CAST(255 AS DOUBLE)
        |          * CAST('1.152921504606846976e18' AS DOUBLE)
        |          / CAST(theta AS DOUBLE) END) AS inter_est
        |FROM agg ORDER BY set_a, set_b""".stripMargin,
    "sketch_cms_tokens" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), depths AS (
        |  SELECT unnest(generate_series(0, 3)) AS depth
        |), cells AS (
        |  SELECT depth,
        |    CAST('0x' || substr(md5(CAST(depth AS VARCHAR) || ':' || tok),
        |      1, 8) AS BIGINT) % 1024 AS cell
        |  FROM toks, depths
        |), sk AS (
        |  SELECT depth, cell, CAST(count(*) AS BIGINT) AS cnt
        |  FROM cells GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT tok FROM toks
        |), probe AS (
        |  SELECT tok AS item, depth,
        |    CAST('0x' || substr(md5(CAST(depth AS VARCHAR) || ':' || tok),
        |      1, 8) AS BIGINT) % 1024 AS cell
        |  FROM cand, depths
        |)
        |SELECT item, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
        |FROM probe LEFT JOIN sk USING (depth, cell)
        |GROUP BY item ORDER BY est DESC, item LIMIT 20""".stripMargin,
    // ddSketch twin: identical bit_length buckets (the portable
    // ltrim-bin form), ceil cumulative walk, midpoint via <<
    "value_ddsketch" ->
      """WITH v AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), b AS MATERIALIZED (
        |  SELECT length(ltrim(bin(cents), '0')) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM v GROUP BY 1
        |), w AS (
        |  SELECT bucket, n,
        |    CAST(sum(n) OVER (ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(n) OVER () AS BIGINT) AS n_total
        |  FROM b
        |), q AS (SELECT CAST(unnest([500000, 900000, 990000]) AS BIGINT)
        |  AS q_ppm)
        |SELECT q.q_ppm, CAST(min(w.bucket) AS BIGINT) AS bucket,
        |  CASE WHEN min(w.bucket) >= 2
        |    THEN 3 * (CAST(1 AS BIGINT) << (min(w.bucket) - 2))
        |    ELSE CAST(min(w.bucket) AS BIGINT) END AS est_mid,
        |  CAST(max(w.n_total) AS BIGINT) AS n_total
        |FROM q JOIN w
        |  ON w.cum >= (q.q_ppm * w.n_total + 999999) // 1000000
        |GROUP BY 1 ORDER BY q_ppm""".stripMargin,
    // quantileSketch twin: identical md5 bottom-k membership, (value,
    // id) rank order, ceil(q·k') rank election; cents via floor(p*100)
    // on the DOUBLE column (integer 100 — never a bare decimal literal)
    "sketch_quantiles" ->
      """WITH li AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_orderkey AS VARCHAR) || ':' ||
        |      CAST(l_linenumber AS VARCHAR) || ':' ||
        |      CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |        AS VARCHAR) AS id
        |  FROM lineitem
        |), s AS (
        |  SELECT v, id FROM li
        |  ORDER BY md5('qs:' || id) ASC, id ASC
        |  LIMIT 1024
        |), r AS MATERIALIZED (
        |  SELECT v, row_number() OVER (ORDER BY v, id) AS r FROM s
        |), ns AS (SELECT CAST(max(r) AS BIGINT) AS n_sample FROM r),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lineitem),
        |q AS (SELECT CAST(unnest([100000, 250000, 500000, 750000,
        |  900000]) AS BIGINT) AS q_ppm)
        |SELECT q.q_ppm, CAST(r.v AS BIGINT) AS est, ns.n_sample,
        |  nt.n_total
        |FROM q CROSS JOIN ns CROSS JOIN nt
        |JOIN r ON r.r = greatest(1,
        |  (q.q_ppm * ns.n_sample + 999999) // 1000000)
        |ORDER BY q_ppm""".stripMargin,
    // AMS twin: identical md5 ±1 signs rebuilt over the (key, n)
    // vocabulary; integer sums throughout (DuckDB sum(BIGINT) is HUGEINT
    // — cast back), median as the rn=4 order statistic of 7
    "sketch_f2" ->
      """WITH counts AS (
        |  SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |), expanded AS (
        |  SELECT k, n, i AS salt FROM counts, UNNEST(range(0, 7)) AS u(i)
        |), signs AS (
        |  SELECT salt, n,
        |    1 - 2 * (CAST('0x' || substr(md5(k || ':' ||
        |      CAST(salt AS VARCHAR)), 1, 8) AS BIGINT) % 2) AS sign
        |  FROM expanded
        |), sk AS (
        |  SELECT CAST(salt AS BIGINT) AS salt,
        |    CAST(sum(n * sign) AS BIGINT) AS s_sum
        |  FROM signs GROUP BY 1
        |), ests AS (
        |  SELECT salt, s_sum * s_sum AS est FROM sk
        |), med AS (
        |  SELECT est AS value FROM (
        |    SELECT est, row_number() OVER (ORDER BY est, salt) AS rn
        |    FROM ests
        |  ) WHERE rn = 4
        |)
        |SELECT 'est:' || CAST(salt AS VARCHAR) AS stat, est AS value
        |FROM ests
        |UNION ALL SELECT 'f2_est_median' AS stat, value FROM med
        |UNION ALL SELECT 'f2_exact' AS stat,
        |  CAST(sum(n * n) AS BIGINT) AS value FROM counts
        |ORDER BY stat""".stripMargin,
    // inner-product twin: identical sign derivation on both key
    // vocabularies, per-salt product, rn=4 median, exact Σ fA·fB row
    "sketch_joinsize" ->
      """WITH ca AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS k,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1
        |), cb AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS k,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1
        |), sa AS (
        |  SELECT CAST(salt AS BIGINT) AS salt,
        |    CAST(sum(n * (1 - 2 * (CAST('0x' || substr(md5(k || ':' ||
        |      CAST(salt AS VARCHAR)), 1, 8) AS BIGINT) % 2)))
        |      AS BIGINT) AS s_a
        |  FROM (SELECT k, n, i AS salt FROM ca, UNNEST(range(0, 7)) AS u(i)) e
        |  GROUP BY 1
        |), sb AS (
        |  SELECT CAST(salt AS BIGINT) AS salt,
        |    CAST(sum(n * (1 - 2 * (CAST('0x' || substr(md5(k || ':' ||
        |      CAST(salt AS VARCHAR)), 1, 8) AS BIGINT) % 2)))
        |      AS BIGINT) AS s_b
        |  FROM (SELECT k, n, i AS salt FROM cb, UNNEST(range(0, 7)) AS u(i)) e
        |  GROUP BY 1
        |), ests AS (
        |  SELECT sa.salt AS salt, s_a * s_b AS est
        |  FROM sa JOIN sb ON sa.salt = sb.salt
        |), med AS (
        |  SELECT est AS value FROM (
        |    SELECT est, row_number() OVER (ORDER BY est, salt) AS rn
        |    FROM ests
        |  ) w WHERE rn = 4
        |)
        |SELECT 'est:' || CAST(salt AS VARCHAR) AS stat, est AS value
        |FROM ests
        |UNION ALL SELECT 'join_est_median' AS stat, value FROM med
        |UNION ALL SELECT 'join_exact' AS stat,
        |  CAST((SELECT sum(ca.n * cb.n) FROM ca JOIN cb ON ca.k = cb.k)
        |    AS BIGINT) AS value
        |ORDER BY stat""".stripMargin,
    "bloom_prune" ->
      """WITH urgent AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |), salts AS (
        |  SELECT unnest(generate_series(0, 2)) AS salt
        |), bits AS (
        |  SELECT DISTINCT
        |    CAST('0x' || substr(md5(CAST(salt AS VARCHAR) || ':'
        |      || CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 65536
        |      AS pos
        |  FROM urgent, salts
        |), keys AS (
        |  SELECT DISTINCT l_orderkey FROM lineitem
        |), probe AS (
        |  SELECT l_orderkey,
        |    CAST('0x' || substr(md5(CAST(salt AS VARCHAR) || ':'
        |      || CAST(l_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 65536
        |      AS pos
        |  FROM keys, salts
        |), hit AS (
        |  SELECT l_orderkey, CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END AS ok
        |  FROM probe p LEFT JOIN bits b USING (pos)
        |), pass AS (
        |  SELECT l_orderkey FROM hit GROUP BY 1 HAVING min(ok) = 1
        |), agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pass,
        |    CAST(sum(CASE WHEN u.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_true_pass
        |  FROM pass LEFT JOIN urgent u ON pass.l_orderkey = u.o_orderkey
        |)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM keys) AS n_keys,
        |  n_pass, n_true_pass, n_pass - n_true_pass AS n_false_pos
        |FROM agg""".stripMargin,
    // debounceBursts twin: lag-gap burst boundaries per (user, type), the
    // single new-burst row supplies the leader id as a conditional min
    "events_debounce" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events
        |), l AS (
        |  SELECT *, lag(secs) OVER (PARTITION BY user_id, event_type
        |    ORDER BY secs, event_id) AS prev FROM e
        |), s AS (
        |  SELECT *, CASE WHEN prev IS NULL OR secs - prev > 300
        |    THEN 1 ELSE 0 END AS nb FROM l
        |), t AS (
        |  SELECT *, CAST(sum(nb) OVER (PARTITION BY user_id, event_type
        |    ORDER BY secs, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS burst_idx
        |  FROM s
        |)
        |SELECT user_id, event_type, burst_idx,
        |  min(CASE WHEN nb = 1 THEN event_id END) AS leader_event_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  max(secs) - min(secs) AS span_secs
        |FROM t GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, burst_idx""".stripMargin,
    // sessionPaths twin: the sessions CTE chain, then an ordered list()
    // slice mirrors array_sort+slice+transform, rank pinned on
    // (n_sessions DESC, path)
    "events_paths" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events
        |), l AS (
        |  SELECT *, lag(secs) OVER (PARTITION BY user_id
        |    ORDER BY secs, event_id) AS prev FROM e
        |), s AS (
        |  SELECT *, CASE WHEN prev IS NULL OR secs - prev > 1800
        |    THEN 1 ELSE 0 END AS ns FROM l
        |), t AS (
        |  SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
        |    ORDER BY secs, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_idx
        |  FROM s
        |), p AS (
        |  SELECT user_id, session_idx,
        |    array_to_string((list(event_type ORDER BY secs, event_id))[1:5],
        |      '>') AS path
        |  FROM t GROUP BY 1, 2
        |), c AS (
        |  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p
        |  GROUP BY 1
        |)
        |SELECT path, n_sessions, rank FROM (
        |  SELECT path, n_sessions, CAST(row_number() OVER (
        |    ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
        |  FROM c
        |) WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // concentration twin: per-dimension category counts, rank-weighted
    // Gini numerator 2·Σ(i·x) − (n+1)·Σx, integer-ppm divisions
    "source_gini" ->
      """WITH d AS (
        |  SELECT dim, cat, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT 'source' AS dim,
        |      coalesce(CAST(source AS VARCHAR), '') AS cat FROM documents
        |    UNION ALL
        |    SELECT 'lang' AS dim,
        |      coalesce(CAST(lang AS VARCHAR), '') AS cat FROM documents
        |  ) GROUP BY 1, 2
        |), r AS (
        |  SELECT dim, n, CAST(row_number() OVER (PARTITION BY dim
        |    ORDER BY n, cat) AS BIGINT) AS i
        |  FROM d
        |), a AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n_categories,
        |    CAST(sum(n) AS BIGINT) AS total,
        |    CAST(sum(i * n) AS BIGINT) AS sum_in,
        |    max(n) AS top_n
        |  FROM r GROUP BY 1
        |)
        |SELECT dim, n_categories, total,
        |  (2 * sum_in - (n_categories + 1) * total) * 1000000
        |    // (n_categories * total) AS gini_ppm,
        |  top_n * 1000000 // total AS top_share_ppm
        |FROM a ORDER BY dim""".stripMargin,
    // codeDetect twin: list_filter/string_split_regex mirror the HOF
    // lambdas; the keyword check is token-set membership, never \b
    "text_code_detect" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[{}\[\]();]', '', 'g')) AS BIGINT) AS n_punct,
        |    CAST(len(list_filter(string_split_regex(text,
        |      '[^A-Za-z0-9_]+'),
        |      t -> t IN ('def', 'function', 'var', 'const', 'void',
        |                 'elif', 'lambda', 'struct', 'enum', 'printf',
        |                 'self', 'typedef'))) AS BIGINT) AS n_kw,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> ends_with(rtrim(l), ';'))) AS BIGINT) AS n_semi_lines,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> starts_with(l, '  ') OR starts_with(l, chr(9))))
        |      AS BIGINT) AS n_indent_lines
        |  FROM documents WHERE length(text) > 0
        |), sc AS (
        |  SELECT *, (3 * n_punct + 10 * n_kw + 4 * n_semi_lines
        |    + n_indent_lines) * 1000000 // n_chars AS code_score_ppm
        |  FROM c
        |)
        |SELECT doc_id, n_chars, n_punct, n_kw, n_semi_lines,
        |  n_indent_lines, code_score_ppm,
        |  CAST(CASE WHEN code_score_ppm >= 20000 THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_code
        |FROM sc ORDER BY doc_id""".stripMargin,
    // mojibakeRepair twin: the identical replace() chain and staged
    // VALUES rows, generated from the same pair table
    "text_mojibake" -> {
      val chain = graft.ops.TextAnalysis.mojibakePairs.foldLeft("text") {
        case (acc, (bad, good)) => s"replace($acc, '$bad', '$good')"
      }
      val values = mojibakeStaged.map { case (id, t) =>
        s"(CAST($id AS BIGINT), '${t.replace("'", "''")}')"
      }.mkString(",\n    ")
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    $values) v(doc_id, text)
         |), f AS (
         |  SELECT doc_id, text, $chain AS fixed FROM src
         |)
         |SELECT doc_id,
         |  CAST(CASE WHEN text <> fixed THEN 1 ELSE 0 END AS BIGINT)
         |    AS changed,
         |  CAST(length(fixed) AS BIGINT) AS n_chars_fixed,
         |  md5(fixed) AS fixed_md5
         |FROM f ORDER BY doc_id""".stripMargin
    },
    // parseChatTurns twin: identical conv construction, unnest with
    // positions, starts_with role flags, running-sum turn boundaries,
    // ordered string_agg reassembly
    "docs_sft_turns" ->
      """WITH convs AS (
        |  SELECT doc_id, 'system: be concise' || chr(10) ||
        |    'user: ' || substr(text, 1, 60) || chr(10) ||
        |    'assistant: ' || substr(text, 61, 120) || chr(10) ||
        |    'user: continue' || chr(10) ||
        |    'assistant: ' || substr(text, 181, 80) AS conv
        |  FROM documents WHERE n_chars >= 300
        |), ls AS (
        |  SELECT doc_id, string_split(conv, chr(10)) AS l FROM convs
        |), lines AS (
        |  SELECT doc_id, unnest(generate_series(1, len(l))) - 1 AS pos, l
        |  FROM ls
        |), r AS (
        |  SELECT doc_id, pos, l[pos + 1] AS line FROM lines
        |), rr AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN starts_with(line, 'system: ') THEN 'system'
        |         WHEN starts_with(line, 'user: ') THEN 'user'
        |         WHEN starts_with(line, 'assistant: ') THEN 'assistant'
        |    END AS role,
        |    CASE WHEN starts_with(line, 'system: ') THEN substr(line, 9)
        |         WHEN starts_with(line, 'user: ') THEN substr(line, 7)
        |         WHEN starts_with(line, 'assistant: ')
        |           THEN substr(line, 12)
        |         ELSE line END AS piece
        |  FROM r
        |), t AS (
        |  SELECT *, CAST(sum(CASE WHEN role IS NOT NULL THEN 1 ELSE 0
        |    END) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS turn_idx
        |  FROM rr
        |)
        |SELECT doc_id, turn_idx, max(role) AS role,
        |  CAST(length(string_agg(piece, chr(10) ORDER BY pos))
        |    AS BIGINT) AS n_chars
        |FROM t WHERE turn_idx > 0 GROUP BY 1, 2
        |ORDER BY doc_id, turn_idx""".stripMargin,
    // parseWarc twin: identical record construction, first-CRLFCRLF
    // framing, prefix-matched header fields
    "web_warc" ->
      """WITH recs AS (
        |  SELECT doc_id, 'WARC/1.0' || chr(13) || chr(10) ||
        |    'WARC-Type: response' || chr(13) || chr(10) ||
        |    'WARC-Target-URI: https://corpus.local/' || source || '/' ||
        |    CAST(doc_id AS VARCHAR) || chr(13) || chr(10) ||
        |    'Content-Length: ' || CAST(n_chars AS VARCHAR) ||
        |    chr(13) || chr(10) || chr(13) || chr(10) ||
        |    substr(text, 1, 200) AS record
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, record,
        |    instr(record, chr(13) || chr(10) || chr(13) || chr(10)) AS cut
        |  FROM recs
        |), p AS (
        |  SELECT doc_id, substr(record, 1, cut - 1) AS hdr,
        |    substr(record, cut + 4) AS payload
        |  FROM c WHERE cut > 0
        |), h AS (
        |  SELECT doc_id,
        |    substr(list_filter(string_split(hdr, chr(13) || chr(10)),
        |      l -> starts_with(l, 'WARC-Type: '))[1], 12) AS warc_type,
        |    substr(list_filter(string_split(hdr, chr(13) || chr(10)),
        |      l -> starts_with(l, 'WARC-Target-URI: '))[1], 18) AS uri,
        |    CAST(substr(list_filter(string_split(hdr,
        |      chr(13) || chr(10)),
        |      l -> starts_with(l, 'Content-Length: '))[1], 17)
        |      AS BIGINT) AS declared_len,
        |    CAST(length(payload) AS BIGINT) AS payload_len
        |  FROM p
        |)
        |SELECT doc_id, warc_type, uri, declared_len, payload_len,
        |  CAST(CASE WHEN declared_len = payload_len THEN 1 ELSE 0 END
        |    AS BIGINT) AS len_ok
        |FROM h ORDER BY doc_id""".stripMargin,
    // curriculumOrder twin: ntile over the pinned total order (the r6
    // bucket-split recipe), md5 within-stage shuffle
    "sample_curriculum" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |    CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
        |      AS stage
        |  FROM documents
        |)
        |SELECT doc_id, n_chars, stage,
        |  CAST(row_number() OVER (PARTITION BY stage
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |    AS pos
        |FROM s ORDER BY stage, pos""".stripMargin,
    // itemCf twin: the same basket prune / half-matrix co-count /
    // candidate fan / anti-join / pinned top-k chain
    "reco_itemcf" ->
      """WITH purch AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS it
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), pruned AS (
        |  SELECT u, it FROM (
        |    SELECT u, it, count(*) OVER (PARTITION BY u) AS bsize
        |    FROM purch)
        |  WHERE bsize <= 100
        |), sim AS (
        |  SELECT l.it AS a, r.it AS b, CAST(count(*) AS BIGINT) AS n_co
        |  FROM pruned l JOIN pruned r ON l.u = r.u AND l.it < r.it
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |), simall AS (
        |  SELECT a AS owned, b AS cand, n_co FROM sim
        |  UNION ALL SELECT b AS owned, a AS cand, n_co FROM sim
        |), simboth AS (
        |  SELECT owned, cand, n_co FROM (
        |    SELECT *, row_number() OVER (PARTITION BY owned
        |      ORDER BY n_co DESC, cand) AS nrank
        |    FROM simall)
        |  WHERE nrank <= 20
        |), scored AS (
        |  SELECT p.u AS u, s.cand AS cand,
        |    CAST(sum(n_co) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_via
        |  FROM pruned p JOIN simboth s ON p.it = s.owned
        |  GROUP BY 1, 2
        |), fresh AS (
        |  SELECT sc.u, sc.cand, sc.score, sc.n_via
        |  FROM scored sc LEFT JOIN purch pu
        |    ON sc.u = pu.u AND sc.cand = pu.it
        |  WHERE pu.it IS NULL
        |)
        |SELECT u, rank, cand, score, n_via FROM (
        |  SELECT u, cand, score, n_via,
        |    CAST(row_number() OVER (PARTITION BY u
        |      ORDER BY score DESC, n_via DESC, cand) AS BIGINT) AS rank
        |  FROM fresh)
        |WHERE rank <= 3 ORDER BY u, rank""".stripMargin,
    // leaveLastOutEval twin: last-pair election via (t DESC, it DESC)
    // rank, held-out pair removed from train, the itemcf chain at k=10,
    // integer hit/MRR ppm close
    "reco_eval" ->
      """WITH inter AS (
        |  SELECT o_custkey AS u, l_partkey AS it, o_orderdate AS t
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), test AS MATERIALIZED (
        |  SELECT u, it AS test_it FROM (
        |    SELECT u, it,
        |      row_number() OVER (PARTITION BY u
        |        ORDER BY t DESC, it DESC) AS rn,
        |      count(DISTINCT it) OVER (PARTITION BY u) AS n_items
        |    FROM inter)
        |  WHERE rn = 1 AND n_items >= 2
        |), purch AS MATERIALIZED (
        |  SELECT DISTINCT i.u, i.it
        |  FROM inter i LEFT JOIN test tt ON i.u = tt.u
        |  WHERE tt.test_it IS NULL OR i.it <> tt.test_it
        |), pruned AS (
        |  SELECT u, it FROM (
        |    SELECT u, it, count(*) OVER (PARTITION BY u) AS bsize
        |    FROM purch)
        |  WHERE bsize <= 100
        |), sim AS (
        |  SELECT l.it AS a, r.it AS b, CAST(count(*) AS BIGINT) AS n_co
        |  FROM pruned l JOIN pruned r ON l.u = r.u AND l.it < r.it
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |), simall AS (
        |  SELECT a AS owned, b AS cand, n_co FROM sim
        |  UNION ALL SELECT b AS owned, a AS cand, n_co FROM sim
        |), simboth AS (
        |  SELECT owned, cand, n_co FROM (
        |    SELECT *, row_number() OVER (PARTITION BY owned
        |      ORDER BY n_co DESC, cand) AS nrank
        |    FROM simall)
        |  WHERE nrank <= 20
        |), scored AS (
        |  SELECT p.u AS u, s.cand AS cand,
        |    CAST(sum(n_co) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_via
        |  FROM pruned p JOIN simboth s ON p.it = s.owned
        |  GROUP BY 1, 2
        |), fresh AS (
        |  SELECT sc.u, sc.cand, sc.score, sc.n_via
        |  FROM scored sc LEFT JOIN purch pu
        |    ON sc.u = pu.u AND sc.cand = pu.it
        |  WHERE pu.it IS NULL
        |), recs AS (
        |  SELECT u, cand, rank FROM (
        |    SELECT u, cand,
        |      CAST(row_number() OVER (PARTITION BY u
        |        ORDER BY score DESC, n_via DESC, cand) AS BIGINT) AS rank
        |    FROM fresh)
        |  WHERE rank <= 10
        |), hits AS (
        |  SELECT t.u, r.rank
        |  FROM test t LEFT JOIN recs r
        |    ON r.u = t.u AND r.cand = t.test_it
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_users_eval,
        |  CAST(sum(CASE WHEN rank IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  CAST(1000000 * sum(CASE WHEN rank IS NOT NULL THEN 1 ELSE 0 END)
        |    // count(*) AS BIGINT) AS hit_ppm,
        |  CAST(sum(CASE WHEN rank IS NOT NULL THEN 1000000 // rank
        |    ELSE 0 END) AS BIGINT) // count(*) AS mrr_ppm
        |FROM hits""".stripMargin,
    // seasonalNaiveBacktest twin: daily cells, (type, day - 7) ancestor
    // join, integer MAE/bias rollup
    "events_snaive" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), prior AS (
        |  SELECT event_type, day + 7 AS day, n AS n_pred FROM daily
        |), j AS (
        |  SELECT d.event_type, d.n, p.n_pred
        |  FROM daily d JOIN prior p
        |    ON d.event_type = p.event_type AND d.day = p.day
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_scored,
        |  CAST(sum(abs(n - n_pred)) AS BIGINT) AS mae_sum,
        |  CAST(sum(n - n_pred) AS BIGINT) AS bias_sum,
        |  CAST(sum(n) AS BIGINT) AS actual_sum,
        |  CAST(sum(abs(n - n_pred)) AS BIGINT) * 1000000
        |    // CAST(sum(n) AS BIGINT) AS mae_ppm
        |FROM j GROUP BY 1 ORDER BY event_type""".stripMargin,
    // seasonalProfile twin: dow from epoch days (+3 pins Monday = 0),
    // marginals as windows over the bounded cell table, all-integer lift
    "events_seasonal" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, dow, n_events,
        |    sum(n_events) OVER (PARTITION BY event_type) AS type_total,
        |    sum(n_events) OVER (PARTITION BY dow) AS dow_total,
        |    sum(n_events) OVER () AS overall
        |  FROM cells
        |)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow, n_events,
        |  CAST(1000000 * n_events * overall
        |    // (type_total * dow_total) AS BIGINT) AS lift_ppm
        |FROM m ORDER BY event_type, dow""".stripMargin,
    // decompose twin: centered 7-row moving sum on the daily frame,
    // positive-offset day-of-week integer mean of the detrended series
    // (detrended goes negative; the offset keeps // == div)
    "events_decompose" ->
      s"""WITH d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |), t AS (
        |  SELECT day, n,
        |    count(*) OVER w AS n7,
        |    CAST(sum(n) OVER w AS BIGINT) AS sum7
        |  FROM d
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), t2 AS (
        |  SELECT day, n,
        |    CASE WHEN n7 = 7
        |      THEN CAST(1000000 * sum7 // 7 AS BIGINT) END AS trend_ppm
        |  FROM t
        |), t3 AS (
        |  SELECT day, n, trend_ppm,
        |    1000000 * n - trend_ppm AS detr_ppm
        |  FROM t2
        |), seas AS (
        |  SELECT day % 7 AS dow,
        |    CAST((sum(detr_ppm) + ${1L << 50} * count(*)) // count(*)
        |      - ${1L << 50} AS BIGINT) AS seasonal_ppm
        |  FROM t3 WHERE detr_ppm IS NOT NULL GROUP BY 1
        |)
        |SELECT t3.day, t3.n, t3.trend_ppm, seas.seasonal_ppm,
        |  CAST(t3.detr_ppm - seas.seasonal_ppm AS BIGINT) AS remainder_ppm
        |FROM t3 LEFT JOIN seas ON t3.day % 7 = seas.dow
        |ORDER BY day""".stripMargin,
    // freshness twin: per-type max window + rollup, global-max window
    // over the aggregated frame
    "dq_freshness" ->
      """WITH e AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |  FROM events
        |), w AS (
        |  SELECT event_type, secs,
        |    max(secs) OVER (PARTITION BY event_type) AS tmax
        |  FROM e
        |), a AS (
        |  SELECT event_type, max(secs) AS last_secs,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN secs > tmax - 86400 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_last_day
        |  FROM w GROUP BY 1
        |)
        |SELECT event_type, last_secs, n_events, n_last_day,
        |  max(last_secs) OVER () - last_secs AS staleness_secs
        |FROM a ORDER BY event_type""".stripMargin,
    // isotonic minimax: bins² pair frame, suffix-min over k within j,
    // max over j at each i — floor-ppm means commute with min/max
    "eval_isotonic" ->
      """WITH bins AS (
        |  SELECT n_chars // 16 AS s, CAST(count(*) AS BIGINT) AS n_s,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p_s
        |  FROM documents GROUP BY 1
        |), idx AS (
        |  SELECT s, n_s, p_s,
        |    CAST(sum(n_s) OVER (ORDER BY s) AS BIGINT) AS cum_n,
        |    CAST(sum(p_s) OVER (ORDER BY s) AS BIGINT) AS cum_p
        |  FROM bins
        |), pairs AS (
        |  SELECT l.s AS j, r.s AS k,
        |    1000000 * (r.cum_p - (l.cum_p - l.p_s))
        |      // (r.cum_n - (l.cum_n - l.n_s)) AS mean_ppm
        |  FROM idx l JOIN idx r ON l.s <= r.s
        |), sm AS (
        |  SELECT j, k,
        |    min(mean_ppm) OVER (PARTITION BY j ORDER BY k DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS minmean
        |  FROM pairs
        |), iso AS (
        |  SELECT k AS s, CAST(max(minmean) AS BIGINT) AS iso_ppm
        |  FROM sm GROUP BY 1
        |)
        |SELECT b.s AS s, b.n_s AS n_s, b.p_s AS p_s, i.iso_ppm AS iso_ppm
        |FROM bins b JOIN iso i ON b.s = i.s ORDER BY s""".stripMargin,
    // holt twin: gap-filled grid + LINEAR recursive CTE (each round
    // references the previous once — no blowup); the positive-offset
    // halvings floor identically in both engines
    "events_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x,
        |    CAST(row_number() OVER (PARTITION BY g.event_type
        |      ORDER BY g.day) AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY g.event_type) AS BIGINT) AS n
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), rec AS (
        |  SELECT event_type, i, n, x * 1000000 AS l,
        |    CAST(0 AS BIGINT) AS t
        |  FROM grid WHERE i = 1
        |  UNION ALL
        |  SELECT g.event_type, g.i, g.n,
        |    (g.x * 1000000 + r.l + r.t + 2251799813685248) // 2
        |      - 1125899906842624 AS l,
        |    (r.t + ((g.x * 1000000 + r.l + r.t + 2251799813685248) // 2
        |        - 1125899906842624) - r.l + 2251799813685248) // 2
        |      - 1125899906842624 AS t
        |  FROM rec r JOIN grid g
        |    ON g.event_type = r.event_type AND g.i = r.i + 1
        |)
        |SELECT event_type, n AS n_days, CAST(l AS BIGINT) AS level_e6,
        |  CAST(t AS BIGINT) AS trend_e6,
        |  CAST(l + 7 * t AS BIGINT) AS fc7_e6
        |FROM rec WHERE i = n ORDER BY event_type""".stripMargin,
    // the holt recursion with three backtest registers (prev x, abs
    // one-step error sums for holt and the naive baseline)
    "events_holt_eval" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x,
        |    CAST(row_number() OVER (PARTITION BY g.event_type
        |      ORDER BY g.day) AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY g.event_type) AS BIGINT) AS n
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), rec AS (
        |  SELECT event_type, i, n, x * 1000000 AS l,
        |    CAST(0 AS BIGINT) AS t, x AS px,
        |    CAST(0 AS BIGINT) AS sh, CAST(0 AS BIGINT) AS sn
        |  FROM grid WHERE i = 1
        |  UNION ALL
        |  SELECT g.event_type, g.i, g.n,
        |    (g.x * 1000000 + r.l + r.t + 2251799813685248) // 2
        |      - 1125899906842624 AS l,
        |    (r.t + ((g.x * 1000000 + r.l + r.t + 2251799813685248) // 2
        |        - 1125899906842624) - r.l + 2251799813685248) // 2
        |      - 1125899906842624 AS t,
        |    g.x AS px,
        |    r.sh + abs(g.x * 1000000 - (r.l + r.t)) AS sh,
        |    r.sn + abs(g.x - r.px) * 1000000 AS sn
        |  FROM rec r JOIN grid g
        |    ON g.event_type = r.event_type AND g.i = r.i + 1
        |)
        |SELECT event_type, n AS n_days,
        |  CAST(sh // (n - 1) AS BIGINT) AS mae_holt_e6,
        |  CAST(sn // (n - 1) AS BIGINT) AS mae_naive_e6,
        |  CASE WHEN sh < sn THEN 'holt' WHEN sn < sh THEN 'naive'
        |    ELSE 'tie' END AS winner
        |FROM rec WHERE i = n AND n >= 2
        |ORDER BY event_type""".stripMargin,
    // sequential rules: one (first, last) span per (user, type) decides
    // existence; microsecond strictness == nanosecond strictness
    "events_seqrules" ->
      """WITH spans AS (
        |  SELECT user_id, event_type, min(ts) AS f, max(ts) AS l
        |  FROM events GROUP BY 1, 2
        |), nu AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS nu
        |  FROM spans GROUP BY 1
        |), rules AS (
        |  SELECT a.event_type AS a, b.event_type AS b,
        |    CAST(count(*) AS BIGINT) AS support
        |  FROM spans a JOIN spans b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type AND a.f < b.l
        |  GROUP BY 1, 2
        |)
        |SELECT r.a AS a, r.b AS b, r.support AS support,
        |  na.nu AS users_a, nb.nu AS users_b,
        |  CAST(1000000 * r.support // na.nu AS BIGINT) AS confidence_ppm
        |FROM rules r
        |JOIN nu na ON na.event_type = r.a
        |JOIN nu nb ON nb.event_type = r.b
        |ORDER BY a, b""".stripMargin,
    // rendezvous twin: UNNEST(range(n)) salted hashes, min-hash winner
    // re-derived by equality (md5 collisions impossible in practice;
    // the min(shard) tie-break mirrors the struct least)
    "shard_rebalance" ->
      """WITH oldh AS (
        |  SELECT doc_id, t.s AS shard,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(t.s AS VARCHAR))
        |      AS h
        |  FROM documents, UNNEST(range(8)) AS t(s)
        |), oldpick AS (
        |  SELECT a.doc_id, CAST(min(a.shard) AS BIGINT) AS old_shard
        |  FROM oldh a
        |  JOIN (SELECT doc_id, min(h) AS mh FROM oldh GROUP BY 1) m
        |    ON a.doc_id = m.doc_id AND a.h = m.mh
        |  GROUP BY 1
        |), newh AS (
        |  SELECT doc_id, t.s AS shard,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(t.s AS VARCHAR))
        |      AS h
        |  FROM documents, UNNEST(range(9)) AS t(s)
        |), newpick AS (
        |  SELECT a.doc_id, CAST(min(a.shard) AS BIGINT) AS new_shard
        |  FROM newh a
        |  JOIN (SELECT doc_id, min(h) AS mh FROM newh GROUP BY 1) m
        |    ON a.doc_id = m.doc_id AND a.h = m.mh
        |  GROUP BY 1
        |), cells AS (
        |  SELECT o.old_shard, n.new_shard,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM oldpick o JOIN newpick n ON o.doc_id = n.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT old_shard, new_shard, old_shard <> new_shard AS moved,
        |  n_rows,
        |  CAST(1000000 * n_rows // sum(n_rows) OVER () AS BIGINT)
        |    AS share_ppm
        |FROM cells ORDER BY old_shard, new_shard""".stripMargin,
    "q16_parts" ->
      """SELECT p.p_brand AS p_brand, p.p_type AS p_type,
        |  CAST(p.p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // integer weights before the cross-stratum sum; HUGEINT→DOUBLE and
    // DECIMAL(38,0)→DOUBLE round the same integer value identically
    "sample_neyman" ->
      """WITH stats AS (
        |  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_h,
        |    CAST(sum(n_chars) AS BIGINT) AS s1,
        |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT stratum, n_h,
        |    CASE WHEN n_h <= 1 THEN 0 ELSE
        |      CAST(floor(n_h * sqrt(
        |        CAST(CAST(n_h AS HUGEINT) * s2
        |             - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |        / CAST(CAST(n_h AS HUGEINT) * (n_h - 1) AS DOUBLE)))
        |      AS BIGINT) END AS w_h
        |  FROM stats
        |)
        |SELECT stratum, n_h, w_h,
        |  CASE WHEN sum(w_h) OVER () = 0 THEN 0
        |    ELSE CAST(1000 * w_h // sum(w_h) OVER () AS BIGINT) END
        |    AS alloc
        |FROM w ORDER BY stratum""".stripMargin,
    "docs_ablation" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS sen
        |  FROM documents GROUP BY 1
        |), t AS (
        |  SELECT source, n_docs, sx, sen,
        |    CAST(sum(n_docs) OVER () AS BIGINT) AS tot_n,
        |    CAST(sum(sx) OVER () AS BIGINT) AS tot_x,
        |    CAST(sum(sen) OVER () AS BIGINT) AS tot_en
        |  FROM per
        |)
        |SELECT source, n_docs,
        |  CAST(100 * tot_x // tot_n AS BIGINT) AS mean_chars_e2,
        |  CASE WHEN tot_n = n_docs THEN NULL
        |    ELSE CAST(100 * (tot_x - sx) // (tot_n - n_docs) AS BIGINT)
        |    END AS mean_without_e2,
        |  CASE WHEN tot_n = n_docs THEN NULL
        |    ELSE CAST(1000000 * (tot_en - sen) // (tot_n - n_docs)
        |      AS BIGINT) END AS en_ppm_without,
        |  CASE WHEN tot_n = n_docs THEN NULL
        |    ELSE CAST(100 * (tot_x - sx) // (tot_n - n_docs)
        |      - 100 * tot_x // tot_n AS BIGINT) END AS delta_mean_e2
        |FROM t ORDER BY source""".stripMargin,
    // replay twin: row_number argmax == the complement-struct-min
    "eval_policy_replay" ->
      """WITH base AS (
        |  SELECT epoch_us(ts) // 86400000000 % 7 AS dow, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
        |      AS is_train
        |  FROM events
        |), arms AS (
        |  SELECT dow, event_type, CAST(sum(cents) AS BIGINT) AS r
        |  FROM base WHERE is_train GROUP BY 1, 2
        |), pol AS (
        |  SELECT dow, event_type AS chosen_type
        |  FROM (SELECT dow, event_type,
        |          row_number() OVER (PARTITION BY dow
        |            ORDER BY r DESC, event_type) AS rn
        |        FROM arms) WHERE rn = 1
        |), ev AS (
        |  SELECT b.dow AS dow, p.chosen_type AS chosen_type,
        |    CAST(count(*) AS BIGINT) AS n_eval,
        |    CAST(sum(CASE WHEN b.event_type = p.chosen_type
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |    CAST(sum(CASE WHEN b.event_type = p.chosen_type
        |      THEN b.cents ELSE 0 END) AS BIGINT) AS matched_c,
        |    CAST(sum(b.cents) AS BIGINT) AS all_c
        |  FROM base b JOIN pol p ON p.dow = b.dow
        |  WHERE NOT b.is_train GROUP BY 1, 2
        |)
        |SELECT dow, chosen_type, n_eval, n_matched,
        |  CAST(1000000 * n_matched // n_eval AS BIGINT) AS match_ppm,
        |  CASE WHEN n_matched = 0 THEN NULL
        |    ELSE CAST(matched_c // n_matched AS BIGINT) END
        |    AS replay_mean_e2,
        |  CAST(all_c // n_eval AS BIGINT) AS base_mean_e2
        |FROM ev ORDER BY dow""".stripMargin,
    // bot fingerprint twin: identical (ts, event_id) gap order, lower
    // median by rank, dispersion identity over per-user gaps
    "events_bots" ->
      """WITH d AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS t,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      AS d
        |  FROM events
        |), agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |    CAST(max(t) - min(t) AS BIGINT) AS span_us,
        |    CAST(count(d) AS BIGINT) AS n_d,
        |    CAST(sum(d) AS BIGINT) AS sd,
        |    sum(CAST(d AS HUGEINT) * d) AS sd2
        |  FROM d GROUP BY 1
        |), med AS (
        |  SELECT user_id, d AS median_gap_us FROM (
        |    SELECT user_id, d,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY d, event_id) AS rn,
        |      count(*) OVER (PARTITION BY user_id) AS nd
        |    FROM d WHERE d IS NOT NULL)
        |  WHERE rn = (nd + 1) // 2
        |)
        |SELECT a.user_id AS user_id, a.n_events AS n_events,
        |  a.n_types AS n_types, a.span_us AS span_us,
        |  m.median_gap_us AS median_gap_us,
        |  CASE WHEN a.n_d <= 1 OR a.sd = 0 THEN NULL ELSE
        |    CAST((CAST(a.n_d AS HUGEINT) * a.sd2
        |        - CAST(a.sd AS HUGEINT) * a.sd) * 1000000
        |      // (CAST(a.n_d - 1 AS HUGEINT) * a.sd) AS BIGINT) END
        |    AS gap_vmr_ppm
        |FROM agg a LEFT JOIN med m ON m.user_id = a.user_id
        |WHERE a.n_events >= 3
        |ORDER BY user_id""".stripMargin,
    "events_attrib_markov" -> markovOracle,
    "events_shapley" ->
      shapleyOracle(Seq("click", "signup", "view"), "purchase"),
    "graph_betweenness" -> betweennessOracle,
    "q20_dominant" ->
      """WITH sp AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sp
        |  FROM lineitem
        |  WHERE epoch_us(l_shipdate) // 86400000000 >=
        |      epoch_us(TIMESTAMP '1996-01-01') // 86400000000
        |    AND epoch_us(l_shipdate) // 86400000000 <
        |      epoch_us(TIMESTAMP '1997-01-01') // 86400000000
        |    AND l_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
        |  GROUP BY 1, 2
        |), tot AS (
        |  SELECT l_partkey, CAST(sum(qty_sp) AS BIGINT) AS qty_p
        |  FROM sp GROUP BY 1
        |), dom AS (
        |  SELECT sp.l_suppkey, CAST(count(*) AS BIGINT) AS n_dominated
        |  FROM sp JOIN tot ON tot.l_partkey = sp.l_partkey
        |  WHERE sp.qty_sp * 2 > tot.qty_p
        |  GROUP BY 1
        |)
        |SELECT d.l_suppkey AS s_suppkey, s.s_name AS s_name,
        |  d.n_dominated AS n_dominated
        |FROM dom d JOIN supplier s ON s.s_suppkey = d.l_suppkey
        |ORDER BY n_dominated DESC, s_suppkey""".stripMargin,
    "events_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv
        |), g AS (
        |  SELECT user_id, s, e,
        |    CAST(sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS island
        |  FROM f
        |), isl AS (
        |  SELECT user_id, island, min(s) AS i_start, max(e) AS i_end,
        |    CAST(count(*) AS BIGINT) AS n_iv
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(i_end - i_start) AS BIGINT) AS covered_us,
        |  CAST(max(i_end) - min(i_start) AS BIGINT) AS span_us,
        |  CAST(1000000 * sum(i_end - i_start)
        |    // (max(i_end) - min(i_start)) AS BIGINT) AS utilization_ppm
        |FROM isl GROUP BY 1 ORDER BY user_id""".stripMargin,
    "dq_keys" ->
      """SELECT combo, n_rows, n_distinct, n_null_rows,
        |  n_distinct = n_rows AND n_null_rows = 0 AS is_key
        |FROM (
        |  SELECT 'event_id' AS combo, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_rows
        |  FROM events
        |  UNION ALL
        |  SELECT 'user_id', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT user_id) AS BIGINT),
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'user_id+ts', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT (user_id, ts)) AS BIGINT),
        |    CAST(sum(CASE WHEN user_id IS NULL OR ts IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'event_type+ts', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT (event_type, ts)) AS BIGINT),
        |    CAST(sum(CASE WHEN event_type IS NULL OR ts IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events
        |) t ORDER BY combo""".stripMargin,
    "events_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS week,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1
        |), sz AS (
        |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM c GROUP BY 1
        |), cells AS (
        |  SELECT c.cohort_week, e.week - c.cohort_week AS age_weeks,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
        |    CAST(sum(e.cents) AS BIGINT) AS rev_c
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  GROUP BY 1, 2
        |), cum AS (
        |  SELECT cohort_week, age_weeks, n_active, rev_c,
        |    CAST(sum(rev_c) OVER (PARTITION BY cohort_week
        |      ORDER BY age_weeks) AS BIGINT) AS cum_rev_c
        |  FROM cells
        |)
        |SELECT k.cohort_week AS cohort_week, k.age_weeks AS age_weeks,
        |  s.cohort_size AS cohort_size, k.n_active AS n_active,
        |  k.rev_c AS rev_c, k.cum_rev_c AS cum_rev_c,
        |  CAST(k.cum_rev_c // s.cohort_size AS BIGINT)
        |    AS ltv_per_user_e2
        |FROM cum k JOIN sz s ON s.cohort_week = k.cohort_week
        |ORDER BY cohort_week, age_weeks""".stripMargin,
    "dedup_threshold_sweep" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |), corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    substr(text, 1, greatest(length(text)
        |      - (CAST(doc_id % 12 AS INT) * 15 + 3), 0)) || 'XXX'
        |  FROM base WHERE doc_id < 40
        |), raw AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM corpus
        |), toks AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS tok
        |  FROM raw WHERE len(t) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1
        |), pairs AS (
        |  SELECT l.doc_id AS a_id, r.doc_id AS b_id, count(*) AS common
        |  FROM toks l JOIN toks r ON l.tok = r.tok AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT a_id, b_id,
        |    CAST(common AS DOUBLE)
        |      / CAST(sa.sz + sb.sz - common AS DOUBLE) AS j
        |  FROM pairs JOIN sizes sa ON pairs.a_id = sa.doc_id
        |  JOIN sizes sb ON pairs.b_id = sb.doc_id
        |  WHERE CAST(common AS DOUBLE)
        |    / CAST(sa.sz + sb.sz - common AS DOUBLE)
        |    >= CAST('0.3' AS DOUBLE)
        |), truth AS (
        |  SELECT doc_id AS a_id, doc_id + 100000 AS b_id
        |  FROM base WHERE doc_id < 40
        |), fj AS (
        |  SELECT s.j, t.a_id IS NOT NULL AS is_true
        |  FROM scored s FULL JOIN truth t
        |    ON s.a_id = t.a_id AND s.b_id = t.b_id
        |), sweep AS (
        |  SELECT CAST(u.thr AS BIGINT) AS thr_e2,
        |    CAST(sum(CASE WHEN f.j IS NOT NULL AND f.j >= u.thr / 100.0
        |      AND f.is_true THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN f.j IS NOT NULL AND f.j >= u.thr / 100.0
        |      AND NOT f.is_true THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN (f.j IS NULL OR f.j < u.thr / 100.0)
        |      AND f.is_true THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM fj f, UNNEST([30, 40, 50, 60, 70, 80, 90]) AS u(thr)
        |  GROUP BY 1
        |)
        |SELECT thr_e2, tp, fp, fn,
        |  CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(2000000 * tp // (2 * tp + fp + fn) AS BIGINT) END
        |    AS f1_ppm,
        |  rank() OVER (ORDER BY CASE WHEN 2 * tp + fp + fn = 0 THEN 0
        |    ELSE 2000000 * tp // (2 * tp + fp + fn) END DESC, thr_e2)
        |    = 1 AS is_best
        |FROM sweep ORDER BY thr_e2""".stripMargin,
    "web_robots" ->
      """WITH urls AS (
        |  SELECT doc_id AS url_id,
        |    '/' || CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'public'
        |      WHEN 1 THEN 'private' WHEN 2 THEN 'tmp' ELSE 'data' END
        |    || '/' || CASE WHEN doc_id % 8 = 1 THEN 'share/' ELSE '' END
        |    || CAST(doc_id % 16 AS VARCHAR) AS path
        |  FROM documents
        |), rules AS (
        |  SELECT * FROM (VALUES ('/', true), ('/private/', false),
        |    ('/tmp/', false), ('/private/share/', true))
        |    r(prefix, allow)
        |), m AS (
        |  SELECT u.url_id, u.path, r.prefix, r.allow,
        |    row_number() OVER (PARTITION BY u.url_id
        |      ORDER BY length(r.prefix) DESC, r.allow DESC, r.prefix)
        |      AS rk
        |  FROM urls u LEFT JOIN rules r ON starts_with(u.path, r.prefix)
        |)
        |SELECT url_id, path, COALESCE(prefix, '') AS rule_prefix,
        |  COALESCE(allow, true) AS allowed
        |FROM m WHERE rk = 1 ORDER BY url_id""".stripMargin,
    "q11_important" ->
      """WITH per AS MATERIALIZED (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |        AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(9,2)) * 100
        |        AS BIGINT))) AS BIGINT) AS rev_e4
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l_partkey, rev_e4 FROM per
        |WHERE CAST(rev_e4 AS HUGEINT) * 10000
        |  > (SELECT CAST(sum(rev_e4) AS HUGEINT) FROM per) * 7
        |ORDER BY rev_e4 DESC, l_partkey""".stripMargin,
    "snapshot_asof" ->
      """SELECT o_custkey AS customer_id,
        |  max(CASE WHEN epoch(o_orderdate) <= 836179200
        |    THEN CAST(epoch(o_orderdate) AS BIGINT) END) AS asof_ts,
        |  CAST(sum(CASE WHEN epoch(o_orderdate) <= 836179200
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_at_asof,
        |  CAST(sum(CASE WHEN epoch(o_orderdate) > 836179200
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_after
        |FROM orders GROUP BY 1
        |HAVING max(CASE WHEN epoch(o_orderdate) <= 836179200
        |  THEN CAST(epoch(o_orderdate) AS BIGINT) END) IS NOT NULL
        |ORDER BY customer_id""".stripMargin,
    // BPE decode twin: the SAME 8 unrolled rounds leave s8 as the
    // merged vocabulary; concatenating subwords in position order must
    // reproduce every word (merges only ever concatenate)
    "text_bpe_decode" ->
      s"""$bpePrefixSql,
         |${(0 until 8).map(bpeRoundSql).mkString(",\n")}
         |SELECT word, CAST(count(*) AS BIGINT) AS n_sub,
         |  string_agg(sym, '' ORDER BY pos) AS decoded,
         |  string_agg(sym, '' ORDER BY pos) = word AS roundtrip_ok
         |FROM s8 GROUP BY word ORDER BY word""".stripMargin,
    // shuffled-export twin: same md5 total order, 16 equi-width
    // h-ranges (h // 2^28), running offsets over the 16-row manifest
    "shard_shuffled" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r13'),
        |      1, 8) AS BIGINT) AS h,
        |    CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS ph
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, h, ph, h // 268435456 AS shard FROM h
        |), m AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |    min(h) AS min_h, max(h) AS max_h,
        |    CAST(sum(ph) AS BIGINT) AS checksum
        |  FROM s GROUP BY shard
        |), fk AS (
        |  SELECT shard, doc_id AS first_key FROM (
        |    SELECT shard, doc_id, row_number()
        |      OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn FROM s)
        |  WHERE rn = 1
        |)
        |SELECT m.shard, n_rows,
        |  CAST(COALESCE(sum(n_rows) OVER (ORDER BY m.shard
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS global_offset,
        |  min_h, max_h, first_key, checksum
        |FROM m JOIN fk ON m.shard = fk.shard
        |ORDER BY m.shard""".stripMargin,
    // survivorship twin: prefix families, quality-desc/min-id election
    "dedup_keep_best" ->
      """WITH cl AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS quality,
        |    min(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40)))
        |      AS cluster_id
        |  FROM documents
        |)
        |SELECT cluster_id, doc_id, quality,
        |  row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY quality DESC, doc_id) = 1 AS keep,
        |  first_value(doc_id) OVER (PARTITION BY cluster_id
        |    ORDER BY quality DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS canonical_id
        |FROM cl ORDER BY cluster_id, doc_id""".stripMargin,
    // kappa twin: the langid CTE (text_langid oracle) × the dataset
    // label; po/pe/kappa in exact floored ppm via HUGEINT products
    "eval_kappa" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS BIGINT) AS hits_en,
        |    CAST(len(list_filter(toks, x -> list_contains(['der','und','die','das','ist'], x))) AS BIGINT) AS hits_de,
        |    CAST(len(list_filter(toks, x -> list_contains(['el','los','que','es','una'], x))) AS BIGINT) AS hits_es,
        |    CAST(len(list_filter(toks, x -> list_contains(['le','les','des','est','une'], x))) AS BIGINT) AS hits_fr,
        |    CAST(len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS BIGINT) AS hits_zh
        |  FROM t
        |), g AS (
        |  SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr, hits_zh) AS best FROM h
        |), pred AS (
        |  SELECT doc_id,
        |    CASE WHEN hits_en = best AND best > 0 THEN 'en'
        |         WHEN hits_de = best AND best > 0 THEN 'de'
        |         WHEN hits_es = best AND best > 0 THEN 'es'
        |         WHEN hits_fr = best AND best > 0 THEN 'fr'
        |         WHEN hits_zh = best AND best > 0 THEN 'zh'
        |         ELSE 'und' END AS la
        |  FROM g
        |), cells AS (
        |  SELECT p.la, d.lang AS lb, CAST(count(*) AS BIGINT) AS c
        |  FROM pred p JOIN documents d USING (doc_id) GROUP BY 1, 2
        |), marg AS (
        |  SELECT CAST(sum(CAST(r.row_n AS HUGEINT) * c.col_n) AS HUGEINT)
        |    AS pe_num
        |  FROM (SELECT la, sum(c) AS row_n FROM cells GROUP BY 1) r
        |  JOIN (SELECT lb, sum(c) AS col_n FROM cells GROUP BY 1) c
        |    ON r.la = c.lb
        |), tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT)
        |      AS n_agree
        |  FROM cells
        |)
        |SELECT n, n_agree,
        |  CAST(1000000 * n_agree // n AS BIGINT) AS po_ppm,
        |  CAST(pe_num * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT)
        |    AS pe_ppm,
        |  CAST(CASE WHEN CAST(n AS HUGEINT) * n = pe_num THEN NULL
        |    ELSE (CAST(n AS HUGEINT) * n_agree - pe_num) * 1000000
        |    // (CAST(n AS HUGEINT) * n - pe_num) END AS BIGINT) AS kappa_ppm
        |FROM tot, marg""".stripMargin,
    // McNemar twin: one conditional aggregation over disagreement cells
    "eval_mcnemar" ->
      """WITH s AS (
        |  SELECT (lang = 'en') AS label,
        |    (n_chars >= 300) AS pred_a,
        |    (len(string_split_regex(trim(text), '\s+')) >= 50) AS pred_b
        |  FROM documents
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN pred_a = label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS a_correct,
        |  CAST(sum(CASE WHEN pred_b = label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS b_correct,
        |  CAST(sum(CASE WHEN pred_a = label AND pred_b <> label
        |    THEN 1 ELSE 0 END) AS BIGINT) AS b_cell,
        |  CAST(sum(CASE WHEN pred_a <> label AND pred_b = label
        |    THEN 1 ELSE 0 END) AS BIGINT) AS c_cell,
        |  CAST(CASE WHEN sum(CASE WHEN pred_a = label AND pred_b <> label
        |      THEN 1 ELSE 0 END) + sum(CASE WHEN pred_a <> label
        |      AND pred_b = label THEN 1 ELSE 0 END) = 0 THEN NULL
        |    ELSE 1000000 * CAST(sum(CASE WHEN pred_a = label AND pred_b <> label
        |      THEN 1 ELSE 0 END) - sum(CASE WHEN pred_a <> label
        |      AND pred_b = label THEN 1 ELSE 0 END) AS HUGEINT)
        |      * (sum(CASE WHEN pred_a = label AND pred_b <> label
        |      THEN 1 ELSE 0 END) - sum(CASE WHEN pred_a <> label
        |      AND pred_b = label THEN 1 ELSE 0 END))
        |      // (sum(CASE WHEN pred_a = label AND pred_b <> label
        |      THEN 1 ELSE 0 END) + sum(CASE WHEN pred_a <> label
        |      AND pred_b = label THEN 1 ELSE 0 END)) END AS BIGINT)
        |    AS chi2_ppm
        |FROM s""".stripMargin,
    // TVD twin: vocab inner join + one-sided tails folded in closed form
    "corpus_tvd" ->
      """WITH wc AS (
        |  SELECT source, tok AS word, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source,
        |          unnest(string_split_regex(trim(text), '\s+')) AS tok
        |        FROM documents)
        |  WHERE length(tok) > 0 GROUP BY 1, 2
        |), t AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY 1
        |)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_common_words,
        |  CAST((sum(abs(CAST(a.c AS HUGEINT) * tb.n
        |          - CAST(b.c AS HUGEINT) * ta.n))
        |        + (CAST(ta.n AS HUGEINT) - sum(a.c)) * tb.n
        |        + (CAST(tb.n AS HUGEINT) - sum(b.c)) * ta.n) * 500000
        |    // (CAST(ta.n AS HUGEINT) * tb.n) AS BIGINT) AS tvd_ppm
        |FROM wc a JOIN wc b ON a.word = b.word AND a.source < b.source
        |JOIN t ta ON ta.source = a.source
        |JOIN t tb ON tb.source = b.source
        |GROUP BY a.source, b.source, ta.n, tb.n
        |ORDER BY source_a, source_b""".stripMargin,
    // stickiness twin: dedupe → per-day distinct → 28-day period rollup
    "events_stickiness" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT)
        |      AS day
        |  FROM events
        |), p AS (
        |  SELECT user_id, day, day // 28 AS period FROM du
        |), daily AS (
        |  SELECT period, CAST(count(DISTINCT day) AS BIGINT)
        |      AS active_days,
        |    CAST(count(*) AS BIGINT) AS dau_sum
        |  FROM p GROUP BY 1
        |), mau AS (
        |  SELECT period, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |  FROM p GROUP BY 1
        |)
        |SELECT period, active_days, mau, dau_sum,
        |  CAST(1000000 * dau_sum // (active_days * mau) AS BIGINT)
        |    AS stickiness_ppm
        |FROM daily JOIN mau USING (period) ORDER BY period""".stripMargin,
    // butterfly twin: left-keyed wedge join, C(c,2) per right pair
    "graph_butterflies" ->
      """WITH e AS (
        |  SELECT DISTINCT l_orderkey AS l, l_partkey AS r FROM lineitem
        |), p AS (
        |  SELECT x.r AS r1, y.r AS r2, CAST(count(*) AS BIGINT) AS c
        |  FROM e x JOIN e y ON x.l = y.l AND x.r < y.r GROUP BY 1, 2
        |), cen AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_wedges,
        |    CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cosupported_pairs,
        |    CAST(sum(CAST(c AS HUGEINT) * (c - 1) // 2) AS BIGINT)
        |      AS n_butterflies
        |  FROM p
        |), sz AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |    CAST(count(DISTINCT l) AS BIGINT) AS n_left,
        |    CAST(count(DISTINCT r) AS BIGINT) AS n_right
        |  FROM e
        |)
        |SELECT n_edges, n_left, n_right,
        |  coalesce(n_wedges, 0) AS n_wedges,
        |  coalesce(n_cosupported_pairs, 0) AS n_cosupported_pairs,
        |  coalesce(n_butterflies, 0) AS n_butterflies,
        |  CASE WHEN coalesce(n_wedges, 0) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(CAST(n_butterflies AS HUGEINT) * 4000000
        |      // n_wedges AS BIGINT) END AS coherence_ppm
        |FROM sz, cen""".stripMargin,
    // frame-plan twin: stub frame counts, every-10th stride via range()
    "multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'video/mp4'
        |      ELSE 'image/png' END AS mime,
        |    text
        |  FROM documents
        |), f AS (
        |  SELECT media_id, mime, text,
        |    CAST(CASE WHEN mime = 'video/mp4'
        |      THEN 1 + octet_length(encode(text)) % 30
        |      ELSE 1 END AS BIGINT) AS n_frames
        |  FROM m
        |)
        |SELECT media_id, mime, n_frames,
        |  CAST(u.idx AS BIGINT) AS frame_idx,
        |  md5(CAST(media_id AS VARCHAR) || ':' || CAST(u.idx AS VARCHAR)
        |    || ':' || md5(text)) AS frame_hash
        |FROM f, UNNEST(range(0, CAST(n_frames AS INTEGER), 10)) AS u(idx)
        |ORDER BY media_id, frame_idx""".stripMargin,
    // ROUGE twin: positional n-grams per side, clipped-min join per n
    "eval_rouge" -> {
      def leg(n: Int): String = {
        val gramExpr =
          if (n == 1) "t[i]"
          else (0 until n).map(j => s"t[i+$j]").mkString(" || ' ' || ")
        s"""cg$n AS (
           |  SELECT pair_id, $gramExpr AS g, CAST(count(*) AS BIGINT) AS cc
           |  FROM (SELECT pair_id, t,
           |          unnest(generate_series(1, len(t) - ${n - 1})) AS i
           |        FROM (SELECT pair_id,
           |                string_split_regex(trim(cand), '\\s+') AS t
           |              FROM base) WHERE len(t) >= $n)
           |  GROUP BY 1, 2
           |), rg$n AS (
           |  SELECT pair_id, $gramExpr AS g, CAST(count(*) AS BIGINT) AS cr
           |  FROM (SELECT pair_id, t,
           |          unnest(generate_series(1, len(t) - ${n - 1})) AS i
           |        FROM (SELECT pair_id,
           |                string_split_regex(trim(ref), '\\s+') AS t
           |              FROM base) WHERE len(t) >= $n)
           |  GROUP BY 1, 2
           |), m$n AS (
           |  SELECT pair_id, CAST(sum(least(cc, cr)) AS BIGINT) AS n_match
           |  FROM cg$n JOIN rg$n USING (pair_id, g) GROUP BY 1
           |), leg$n AS (
           |  SELECT COALESCE(c.pair_id, r.pair_id) AS pair_id,
           |    CAST($n AS BIGINT) AS n, c.n_cand, r.n_ref,
           |    CASE WHEN c.n_cand IS NULL OR r.n_ref IS NULL THEN NULL
           |      ELSE COALESCE(m.n_match, 0) END AS n_match
           |  FROM (SELECT pair_id, CAST(sum(cc) AS BIGINT) AS n_cand
           |        FROM cg$n GROUP BY 1) c
           |  FULL JOIN (SELECT pair_id, CAST(sum(cr) AS BIGINT) AS n_ref
           |        FROM rg$n GROUP BY 1) r ON c.pair_id = r.pair_id
           |  LEFT JOIN m$n m ON COALESCE(c.pair_id, r.pair_id) = m.pair_id
           |)""".stripMargin
      }
      s"""WITH base AS (
         |  SELECT doc_id AS pair_id, text AS ref,
         |    substr(text, 1,
         |      greatest(length(text) - (CAST(doc_id % 7 AS INT) * 20), 40))
         |      || ' extra tail tokens' AS cand
         |  FROM documents WHERE doc_id < 200
         |),
         |${leg(1)},
         |${leg(2)}
         |SELECT pair_id, n, n_cand, n_ref, n_match,
         |  CAST(1000000 * n_match // n_cand AS BIGINT) AS precision_ppm,
         |  CAST(1000000 * n_match // n_ref AS BIGINT) AS recall_ppm,
         |  CAST(2000000 * n_match // (n_cand + n_ref) AS BIGINT) AS f1_ppm
         |FROM (SELECT * FROM leg1 UNION ALL SELECT * FROM leg2)
         |ORDER BY n, pair_id""".stripMargin
    },
    // Croston twin: per-type LINEAR recursive CTE over demand-day index
    "events_croston" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS d_c
        |  FROM events GROUP BY 1, 2
        |  HAVING sum(CAST(floor(value * 100) AS BIGINT)) > 0
        |), d AS (
        |  SELECT event_type, day, d_c * 1000000 AS de6,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS idx,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily
        |), rec AS (
        |  SELECT event_type, idx, day, de6 AS z,
        |    CAST(1000000 AS BIGINT) AS p, n
        |  FROM d WHERE idx = 1
        |  UNION ALL
        |  SELECT d.event_type, d.idx, d.day, (r.z + d.de6) // 2,
        |    (r.p + (d.day - r.day) * 1000000) // 2, r.n
        |  FROM rec r JOIN d
        |    ON d.event_type = r.event_type AND d.idx = r.idx + 1
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_demand_days,
        |  CAST(z AS BIGINT) AS z_e6, CAST(p AS BIGINT) AS p_e6,
        |  CAST(CAST(z AS HUGEINT) * 1000000 // p AS BIGINT)
        |    AS forecast_ppm
        |FROM rec WHERE idx = n ORDER BY event_type""".stripMargin,
    // incremental index twin: scores are df/total-identical, so the
    // baked-index BM25 oracle serves unchanged
    "search_indexed_incremental" -> bm25OracleSql,
    // extractive-summary twin: the docs_sentences staging chain, then
    // distinct-token idf scoring and a per-doc rank election
    "docs_summary" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), blocks AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, CAST(ceil(len(t)/8.0) AS BIGINT)))
        |      AS i, t
        |  FROM toks
        |), bp AS (
        |  SELECT doc_id, i,
        |    array_to_string(t[(i-1)*8+1:(i-1)*8+8], ' ') AS blk
        |  FROM blocks
        |), staged AS (
        |  SELECT doc_id, string_agg(blk, '. ' ORDER BY i) || '.' AS text
        |  FROM bp GROUP BY doc_id
        |), sp AS (
        |  SELECT doc_id, string_split(regexp_replace(text,
        |    '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)) AS l
        |  FROM staged
        |), se AS (
        |  SELECT doc_id, i - 1 AS sent_idx, l[i] AS s
        |  FROM sp, UNNEST(range(1, len(l) + 1)) AS u(i)
        |), sgood AS (
        |  SELECT doc_id, sent_idx, s FROM se WHERE length(trim(s)) > 0
        |), stok AS (
        |  SELECT doc_id, sent_idx, tok FROM (
        |    SELECT doc_id, sent_idx, unnest(list_distinct(
        |      string_split_regex(trim(lower(s)), '\s+'))) AS tok
        |    FROM sgood)
        |  WHERE length(tok) > 0
        |), dft AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM (
        |    SELECT doc_id, unnest(list_distinct(
        |      string_split_regex(trim(lower(text)), '\s+'))) AS tok
        |    FROM staged)
        |  WHERE length(tok) > 0 GROUP BY 1
        |), nd AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM staged
        |), sc AS (
        |  SELECT doc_id, sent_idx,
        |    CAST(sum(1000000 * nd.n // df) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_terms
        |  FROM stok JOIN dft USING (tok), nd
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id, rank, sent_idx, n_terms, score, n_chars FROM (
        |  SELECT g.doc_id, g.sent_idx,
        |    CAST(length(g.s) AS BIGINT) AS n_chars,
        |    COALESCE(sc.score, 0) AS score,
        |    COALESCE(sc.n_terms, 0) AS n_terms,
        |    CAST(row_number() OVER (PARTITION BY g.doc_id
        |      ORDER BY COALESCE(sc.score, 0) DESC, g.sent_idx)
        |      AS BIGINT) AS rank
        |  FROM sgood g LEFT JOIN sc
        |    ON g.doc_id = sc.doc_id AND g.sent_idx = sc.sent_idx)
        |WHERE rank <= 2 ORDER BY doc_id, rank""".stripMargin,
    // coverage twin: the itemcf chain's top-3 recs closed with the
    // popularity-mass / coverage card
    "reco_coverage" ->
      """WITH purch AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS it
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), pruned AS (
        |  SELECT u, it FROM (
        |    SELECT u, it, count(*) OVER (PARTITION BY u) AS bsize
        |    FROM purch)
        |  WHERE bsize <= 100
        |), sim AS (
        |  SELECT l.it AS a, r.it AS b, CAST(count(*) AS BIGINT) AS n_co
        |  FROM pruned l JOIN pruned r ON l.u = r.u AND l.it < r.it
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |), simall AS (
        |  SELECT a AS owned, b AS cand, n_co FROM sim
        |  UNION ALL SELECT b AS owned, a AS cand, n_co FROM sim
        |), simboth AS (
        |  SELECT owned, cand, n_co FROM (
        |    SELECT *, row_number() OVER (PARTITION BY owned
        |      ORDER BY n_co DESC, cand) AS nrank
        |    FROM simall)
        |  WHERE nrank <= 20
        |), scored AS (
        |  SELECT p.u AS u, s.cand AS cand,
        |    CAST(sum(n_co) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_via
        |  FROM pruned p JOIN simboth s ON p.it = s.owned
        |  GROUP BY 1, 2
        |), fresh AS (
        |  SELECT sc.u, sc.cand, sc.score, sc.n_via
        |  FROM scored sc LEFT JOIN purch pu
        |    ON sc.u = pu.u AND sc.cand = pu.it
        |  WHERE pu.it IS NULL
        |), recs AS (
        |  SELECT u, cand FROM (
        |    SELECT u, cand,
        |      row_number() OVER (PARTITION BY u
        |        ORDER BY score DESC, n_via DESC, cand) AS rank
        |    FROM fresh)
        |  WHERE rank <= 3
        |), pop AS (
        |  SELECT it, CAST(count(*) AS BIGINT) AS n_u
        |  FROM purch GROUP BY 1
        |), cat AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_catalog_items,
        |    CAST(max(n_u) AS BIGINT) AS max_pop
        |  FROM pop
        |), ra AS (
        |  SELECT CAST(count(DISTINCT r.u) AS BIGINT) AS n_users,
        |    CAST(count(*) AS BIGINT) AS n_rec_rows,
        |    CAST(count(DISTINCT r.cand) AS BIGINT) AS n_rec_items,
        |    CAST(sum(p.n_u) AS BIGINT) AS pop_sum
        |  FROM recs r JOIN pop p ON r.cand = p.it
        |)
        |SELECT n_users, n_rec_rows, n_rec_items, n_catalog_items,
        |  CAST(1000000 * n_rec_items // n_catalog_items AS BIGINT)
        |    AS coverage_ppm,
        |  CAST(CAST(pop_sum AS HUGEINT) * 1000000
        |    // (CAST(n_rec_rows AS HUGEINT) * max_pop) AS BIGINT)
        |    AS mean_pop_ppm
        |FROM ra, cat""".stripMargin,
    // SFT-gate twin: the docs_sft_turns parse chain over the perturbed
    // staging, closed with the per-transcript lint rollup
    "sft_quality" ->
      """WITH base AS (
        |  SELECT doc_id, 'system: be concise' || chr(10) ||
        |    'user: ' || substr(text, 1, 60) || chr(10) ||
        |    'assistant: ' || substr(text, 61, 120) || chr(10) ||
        |    'user: continue' || chr(10) ||
        |    'assistant: ' || substr(text, 181, 80) AS conv
        |  FROM documents WHERE n_chars >= 300
        |), convs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |        THEN conv || chr(10) || 'user: trailing question'
        |      WHEN doc_id % 5 = 0
        |        THEN conv || chr(10) || 'assistant: ok'
        |      ELSE conv END AS conv
        |  FROM base
        |), ls AS (
        |  SELECT doc_id, string_split(conv, chr(10)) AS l FROM convs
        |), lines AS (
        |  SELECT doc_id, unnest(generate_series(1, len(l))) - 1 AS pos, l
        |  FROM ls
        |), r AS (
        |  SELECT doc_id, pos, l[pos + 1] AS line FROM lines
        |), rr AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN starts_with(line, 'system: ') THEN 'system'
        |         WHEN starts_with(line, 'user: ') THEN 'user'
        |         WHEN starts_with(line, 'assistant: ') THEN 'assistant'
        |    END AS role,
        |    CASE WHEN starts_with(line, 'system: ') THEN substr(line, 9)
        |         WHEN starts_with(line, 'user: ') THEN substr(line, 7)
        |         WHEN starts_with(line, 'assistant: ')
        |           THEN substr(line, 12)
        |         ELSE line END AS piece
        |  FROM r
        |), t AS (
        |  SELECT *, CAST(sum(CASE WHEN role IS NOT NULL THEN 1 ELSE 0
        |    END) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS turn_idx
        |  FROM rr
        |), g AS (
        |  SELECT doc_id, turn_idx, max(role) AS role,
        |    CAST(length(string_agg(piece, chr(10) ORDER BY pos))
        |      AS BIGINT) AS n_chars
        |  FROM t WHERE turn_idx > 0 GROUP BY 1, 2
        |), h AS (
        |  SELECT *,
        |    lag(role) OVER (PARTITION BY doc_id ORDER BY turn_idx)
        |      AS prev_role,
        |    max(turn_idx) OVER (PARTITION BY doc_id) AS max_ti
        |  FROM g
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_user,
        |  CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_assistant,
        |  CAST(sum(CASE WHEN role <> 'system' AND prev_role = role
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_alternation_violations,
        |  CAST(sum(CASE WHEN role = 'system' AND turn_idx > 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_misplaced_system,
        |  max(CASE WHEN turn_idx = max_ti THEN role END) AS last_role,
        |  CAST(min(CASE WHEN role = 'assistant' THEN n_chars END)
        |    AS BIGINT) AS min_assistant_chars,
        |  (sum(CASE WHEN role <> 'system' AND prev_role = role
        |      THEN 1 ELSE 0 END) = 0
        |    AND sum(CASE WHEN role = 'system' AND turn_idx > 1
        |      THEN 1 ELSE 0 END) = 0
        |    AND max(CASE WHEN turn_idx = max_ti THEN role END)
        |      = 'assistant'
        |    AND sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) >= 1
        |    AND COALESCE(min(CASE WHEN role = 'assistant' THEN n_chars
        |      END), 0) >= 10) AS keep
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // frontier twin: per-domain rank window, integer round math
    "web_frontier" ->
      """WITH urls AS (
        |  SELECT doc_id AS url_id,
        |    'host' || CAST(doc_id % 20 AS VARCHAR) AS domain,
        |    CAST(n_chars AS BIGINT) AS priority
        |  FROM documents
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY domain
        |    ORDER BY priority DESC, url_id) AS BIGINT) AS domain_rank
        |  FROM urls
        |)
        |SELECT url_id, domain, priority, domain_rank,
        |  CAST((domain_rank - 1) // 3 AS BIGINT) AS round,
        |  ((domain_rank - 1) // 3) < 5 AS scheduled
        |FROM r ORDER BY domain, domain_rank""".stripMargin,
    // URL-dedup twin: the web_domains normalize chain carrying doc_id,
    // closed with the per-url_norm canonical election
    "dedup_urls" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END) ||
        |    '://' ||
        |    (CASE WHEN doc_id % 7 = 0 THEN upper(h) ELSE h END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN
        |       (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END)
        |     ELSE '' END) ||
        |    '/' || lang || '/p' || CAST(doc_id % 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN
        |       '?utm_source=feed&utm_medium=rss&id=' ||
        |       CAST(doc_id % 9 AS VARCHAR)
        |     WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 9 AS VARCHAR)
        |     ELSE '' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '#sec2' ELSE '' END) AS url
        |  FROM (SELECT doc_id, lang,
        |        (CASE WHEN doc_id % 7 IN (1, 3, 5) THEN 'www.' ELSE '' END)
        |        || source || '.' ||
        |        (CASE CAST((doc_id // 4) % 4 AS INT) WHEN 0 THEN 'com'
        |          WHEN 1 THEN 'org' WHEN 2 THEN 'net' ELSE 'io' END) AS h
        |        FROM documents)
        |), step1 AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(url,
        |    '#.*', '', 'g'),
        |    '(utm_[a-zA-Z]+|gclid|fbclid)=[^&]*&?', '', 'g'),
        |    '[?&]+$', '', 'g') AS u
        |  FROM raw
        |), parts AS (
        |  SELECT doc_id, u,
        |    regexp_replace(lower(regexp_extract(u,
        |      '^[A-Za-z]+://([^/?#]+)', 1)), ':(80|443)$', '', 'g') AS host,
        |    regexp_replace(replace(regexp_extract(u,
        |      '^[A-Za-z]+://[^/?#]+(.*)', 1), '/?', '?'),
        |      '/+$', '', 'g') AS path
        |  FROM step1
        |), norm AS (
        |  SELECT doc_id AS url_id,
        |    lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) || '://' ||
        |      host || path AS url_norm
        |  FROM parts
        |)
        |SELECT url_id, url_norm,
        |  CAST(count(*) OVER (PARTITION BY url_norm) AS BIGINT)
        |    AS n_variants,
        |  row_number() OVER (PARTITION BY url_norm ORDER BY url_id) = 1
        |    AS keep
        |FROM norm ORDER BY url_id""".stripMargin,
    // cascade twin: md5-threshold trial subgraphs, 3 unrolled
    // MATERIALIZED reach hops (each r referenced twice)
    "graph_cascade" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT l_orderkey AS src, l_partkey + 20000000 AS dst
        |    FROM lineitem
        |    UNION ALL
        |    SELECT l_partkey + 20000000 AS src, l_orderkey AS dst
        |    FROM lineitem)
        |), act AS MATERIALIZED (
        |  SELECT t.trial, e.src, e.dst
        |  FROM e, UNNEST(range(0, 3)) AS t(trial)
        |  WHERE CAST('0x' || substr(md5(CAST(src AS VARCHAR) || ':' ||
        |    CAST(dst AS VARCHAR) || ':' || CAST(t.trial AS VARCHAR)),
        |    1, 8) AS BIGINT) % 1000000 < 300000
        |), r0 AS MATERIALIZED (
        |  SELECT t.trial, o_orderkey AS id
        |  FROM orders, UNNEST(range(0, 3)) AS t(trial)
        |  WHERE o_orderkey < 10
        |), r1 AS MATERIALIZED (
        |  SELECT DISTINCT trial, id FROM (
        |    SELECT trial, id FROM r0
        |    UNION ALL
        |    SELECT a.trial, a.dst AS id FROM r0 r
        |    JOIN act a ON a.trial = r.trial AND a.src = r.id)
        |), r2 AS MATERIALIZED (
        |  SELECT DISTINCT trial, id FROM (
        |    SELECT trial, id FROM r1
        |    UNION ALL
        |    SELECT a.trial, a.dst AS id FROM r1 r
        |    JOIN act a ON a.trial = r.trial AND a.src = r.id)
        |), r3 AS MATERIALIZED (
        |  SELECT DISTINCT trial, id FROM (
        |    SELECT trial, id FROM r2
        |    UNION ALL
        |    SELECT a.trial, a.dst AS id FROM r2 r
        |    JOIN act a ON a.trial = r.trial AND a.src = r.id)
        |)
        |SELECT trial,
        |  CAST(COALESCE(ae.n, 0) AS BIGINT) AS n_active_edges,
        |  CAST(COALESCE(rr.n, 0) AS BIGINT) AS n_reached
        |FROM (SELECT trial, count(*) AS n FROM act GROUP BY 1) ae
        |FULL JOIN (SELECT trial, count(*) AS n FROM r3 GROUP BY 1) rr
        |  USING (trial)
        |ORDER BY trial""".stripMargin,
    // seasonal-anomaly twin: the decompose chain + doubled-order-
    // statistic median/MAD gate (quantile_cont is percentile's twin)
    "events_anomaly_seasonal" ->
      s"""WITH d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |), t AS (
        |  SELECT day, n,
        |    count(*) OVER w AS n7,
        |    CAST(sum(n) OVER w AS BIGINT) AS sum7
        |  FROM d
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), t2 AS (
        |  SELECT day, n,
        |    CASE WHEN n7 = 7
        |      THEN CAST(1000000 * sum7 // 7 AS BIGINT) END AS trend_ppm
        |  FROM t
        |), t3 AS (
        |  SELECT day, n, trend_ppm,
        |    1000000 * n - trend_ppm AS detr_ppm
        |  FROM t2
        |), seas AS (
        |  SELECT day % 7 AS dow,
        |    CAST(2 * quantile_cont(detr_ppm, 0.5) AS BIGINT) AS seas2
        |  FROM t3 WHERE detr_ppm IS NOT NULL GROUP BY 1
        |), rem AS (
        |  SELECT t3.day, t3.n,
        |    CAST(2 * t3.detr_ppm - seas.seas2 AS BIGINT) AS r2
        |  FROM t3 JOIN seas ON t3.day % 7 = seas.dow
        |  WHERE t3.detr_ppm IS NOT NULL
        |), m AS (
        |  SELECT CAST(2 * quantile_cont(r2, 0.5) AS BIGINT) AS med4
        |  FROM rem
        |), dev AS (
        |  SELECT rem.*, m.med4, abs(2 * r2 - med4) AS dev4
        |  FROM rem, m
        |), md AS (
        |  SELECT CAST(2 * quantile_cont(dev4, 0.5) AS BIGINT) AS mad8
        |  FROM dev
        |)
        |SELECT day, n, r2 AS remainder2_ppm, med4,
        |  CAST(mad8 AS BIGINT) AS mad8,
        |  (2 * dev4 > 3 * mad8) AS is_anomaly
        |FROM dev, md ORDER BY day""".stripMargin,
    // fertility twin: the bpe encode chain's per-doc token/subword
    // counts rolled up per language
    "text_fertility" ->
      s"""$bpePrefixSql,
         |${(0 until 8).map(bpeRoundSql).mkString(",\n")},
         |enc AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS n_sub
         |  FROM s8 GROUP BY word
         |), dtoks AS (
         |  SELECT doc_id, unnest(generate_series(1, len(t))) AS tpos, t
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
         |        FROM documents)
         |), dt AS (
         |  SELECT doc_id, t[tpos] AS word
         |  FROM dtoks WHERE length(t[tpos]) > 0
         |), perdoc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(e.n_sub) AS BIGINT) AS n_subwords
         |  FROM dt JOIN enc e USING (word) GROUP BY doc_id
         |)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(p.n_subwords) AS BIGINT) AS n_subwords,
         |  CAST(1000000 * sum(p.n_subwords) // sum(p.n_tokens) AS BIGINT)
         |    AS fertility_ppm
         |FROM perdoc p JOIN documents d USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // PII-eval twin: same planted staging, same regex counts, recall
    // rollup per planted class
    "pii_eval" ->
      """WITH staged AS (
        |  SELECT doc_id,
        |    text || ' ' ||
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN 'user' || CAST(doc_id AS VARCHAR)
        |        || '@example.com'
        |      WHEN 1 THEN 'user' || CAST(doc_id AS VARCHAR)
        |        || ' at example dot com'
        |      WHEN 2 THEN '10.1.0.' || CAST(doc_id % 256 AS VARCHAR)
        |      ELSE 'five five five 0123' END AS text,
        |    CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'email'
        |      WHEN 1 THEN 'email_obfuscated' WHEN 2 THEN 'ip'
        |      ELSE 'phone_obfuscated' END AS planted
        |  FROM documents
        |), det AS (
        |  SELECT doc_id, planted,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(text, '\d{3}[-.]\d{4}'))
        |    + len(regexp_extract_all(text,
        |      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS hits
        |  FROM staged
        |)
        |SELECT planted, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(1000000 * sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END)
        |    // count(*) AS BIGINT) AS recall_ppm
        |FROM det GROUP BY 1 ORDER BY planted""".stripMargin,
    // LWW-audit twin: per-instant max collapses ties, k-keyed rollup,
    // LWW election via (t DESC, v DESC) rank over the instant frame
    "cdc_lww_audit" ->
      """WITH base AS (
        |  SELECT user_id AS k, epoch_us(ts) AS t,
        |    CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events
        |), planted AS (
        |  SELECT k, min(t) AS t, CAST(-1 AS BIGINT) AS v
        |  FROM base WHERE k < 50 GROUP BY k
        |), log AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM planted
        |), pi AS (
        |  SELECT k, t, CAST(count(DISTINCT v) AS BIGINT) AS nv,
        |    max(v) AS v
        |  FROM log GROUP BY 1, 2
        |), lww AS (
        |  SELECT k, v AS lww_value FROM (
        |    SELECT k, v, row_number() OVER (PARTITION BY k
        |      ORDER BY t DESC, v DESC) AS rn FROM pi)
        |  WHERE rn = 1
        |)
        |SELECT pi.k, CAST(count(*) AS BIGINT) AS n_instants,
        |  CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_conflict_instants,
        |  CAST(max(t) AS BIGINT) AS latest_ts,
        |  CAST(max(lww_value) AS BIGINT) AS lww_value,
        |  (sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) = 0) AS is_clean
        |FROM pi JOIN lww ON pi.k = lww.k
        |GROUP BY pi.k ORDER BY pi.k""".stripMargin,
    // balanced-batch twin: per-class md5 rank, integer slot math,
    // bounded (batch, class) completeness rollup
    "pack_balanced" ->
      """WITH r AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS cls,
        |    CAST(row_number() OVER (PARTITION BY label
        |      ORDER BY md5('bb:' || CAST(vec_id AS VARCHAR)), vec_id)
        |      AS BIGINT) AS r
        |  FROM embeddings
        |), b AS (
        |  SELECT id, cls, (r - 1) // 4 AS batch, (r - 1) % 4 AS slot
        |  FROM r
        |), pc AS (
        |  SELECT batch, cls, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2
        |), f AS (
        |  SELECT batch,
        |    (count(*) = (SELECT count(DISTINCT cls) FROM b)
        |      AND min(n) = 4) AS complete
        |  FROM pc GROUP BY 1
        |)
        |SELECT b.id, b.cls, CAST(b.batch AS BIGINT) AS batch,
        |  CAST(b.slot AS BIGINT) AS slot, f.complete
        |FROM b JOIN f USING (batch) ORDER BY id""".stripMargin,
    // vocabulary-coverage Shapley twin: generated coalition table over
    // the 2^(topK+1) mask cells (the events_shapley machinery)
    "docs_shapley_sources" -> shapleyVocabOracle(5),
    // family-census twin: the clusters closure + size histogram with
    // unclustered docs as their own size-1 families
    "dedup_family_sizes" -> (clustersCteSql +
      """
        |, comp AS (
        |  SELECT id, min(label) AS cluster_id FROM walk GROUP BY id
        |), fam AS (
        |  SELECT coalesce(comp.cluster_id, d.doc_id) AS cid,
        |    CAST(count(*) AS BIGINT) AS family_size
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
        |  GROUP BY 1
        |)
        |SELECT family_size, CAST(count(*) AS BIGINT) AS n_families,
        |  CAST(family_size * count(*) AS BIGINT) AS n_docs
        |FROM fam GROUP BY 1 ORDER BY family_size""".stripMargin),
    // multi-class F1 twin: the eval_kappa langid prediction CTE, then
    // bounded (label, pred) cells + the single-division F1 identity
    "eval_f1_macro" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS BIGINT) AS hits_en,
        |    CAST(len(list_filter(toks, x -> list_contains(['der','und','die','das','ist'], x))) AS BIGINT) AS hits_de,
        |    CAST(len(list_filter(toks, x -> list_contains(['el','los','que','es','una'], x))) AS BIGINT) AS hits_es,
        |    CAST(len(list_filter(toks, x -> list_contains(['le','les','des','est','une'], x))) AS BIGINT) AS hits_fr,
        |    CAST(len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS BIGINT) AS hits_zh
        |  FROM t
        |), g AS (
        |  SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr, hits_zh) AS best FROM h
        |), pred AS (
        |  SELECT doc_id,
        |    CASE WHEN hits_en = best AND best > 0 THEN 'en'
        |         WHEN hits_de = best AND best > 0 THEN 'de'
        |         WHEN hits_es = best AND best > 0 THEN 'es'
        |         WHEN hits_fr = best AND best > 0 THEN 'fr'
        |         WHEN hits_zh = best AND best > 0 THEN 'zh'
        |         ELSE 'und' END AS la
        |  FROM g
        |), cells AS (
        |  SELECT d.lang AS lab, p.la AS prd, CAST(count(*) AS BIGINT) AS c
        |  FROM pred p JOIN documents d USING (doc_id) GROUP BY 1, 2
        |), cls AS (
        |  SELECT lab AS cls FROM cells UNION SELECT prd FROM cells
        |), tpc AS (
        |  SELECT lab AS cls, c AS tp FROM cells WHERE lab = prd
        |), nt AS (
        |  SELECT lab AS cls, CAST(sum(c) AS BIGINT) AS n_true
        |  FROM cells GROUP BY 1
        |), np AS (
        |  SELECT prd AS cls, CAST(sum(c) AS BIGINT) AS n_pred
        |  FROM cells GROUP BY 1
        |), pc AS (
        |  SELECT cls, coalesce(n_true, 0) AS n_true,
        |    coalesce(n_pred, 0) AS n_pred, coalesce(tp, 0) AS tp
        |  FROM cls LEFT JOIN tpc USING (cls) LEFT JOIN nt USING (cls)
        |    LEFT JOIN np USING (cls)
        |), pcm AS (
        |  SELECT cls, n_true, n_pred, tp,
        |    CASE WHEN n_pred = 0 THEN NULL
        |      ELSE CAST(1000000 * tp // n_pred AS BIGINT) END AS precision_ppm,
        |    CASE WHEN n_true = 0 THEN NULL
        |      ELSE CAST(1000000 * tp // n_true AS BIGINT) END AS recall_ppm,
        |    CASE WHEN n_pred + n_true = 0 THEN NULL
        |      ELSE CAST(1000000 * 2 * tp // (n_pred + n_true) AS BIGINT) END
        |      AS f1_ppm
        |  FROM pc
        |)
        |SELECT * FROM (
        |  SELECT cls, n_true, n_pred, tp, precision_ppm, recall_ppm, f1_ppm
        |  FROM pcm
        |  UNION ALL
        |  SELECT '__macro__', CAST(sum(n_true) AS BIGINT),
        |    CAST(sum(n_pred) AS BIGINT), CAST(sum(tp) AS BIGINT),
        |    CAST(1000000 * sum(tp) // sum(n_true) AS BIGINT),
        |    CAST(1000000 * sum(tp) // sum(n_true) AS BIGINT),
        |    CAST(sum(coalesce(f1_ppm, 0)) // count(*) AS BIGINT)
        |  FROM pcm
        |) ORDER BY cls""".stripMargin,
    // Spearman twin: doubled midranks over grouped value counts, HUGEINT
    // co-moments, two separate IEEE sqrts (never decimal -> double)
    "eval_spearman" ->
      """WITH t AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS y
        |  FROM documents
        |), rx AS (
        |  SELECT x, 2 * coalesce(sum(cnt) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + cnt + 1 AS r2x
        |  FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1)
        |), ry AS (
        |  SELECT y, 2 * coalesce(sum(cnt) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + cnt + 1 AS r2y
        |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1)
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r2x) AS HUGEINT) AS sx, CAST(sum(r2y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(r2x AS HUGEINT) * r2x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(r2y AS HUGEINT) * r2y) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(r2x AS HUGEINT) * r2y) AS HUGEINT) AS sxy
        |  FROM t JOIN rx USING (x) JOIN ry USING (y)
        |), c AS (
        |  SELECT n, CAST(n * sxy - sx * sy AS BIGINT) AS num,
        |    CAST(n * sxx - sx * sx AS BIGINT) AS d1,
        |    CAST(n * syy - sy * sy AS BIGINT) AS d2
        |  FROM a
        |)
        |SELECT n, num, d1, d2,
        |  CASE WHEN d1 = 0 OR d2 = 0 THEN NULL
        |    ELSE CAST(floor(CAST('1000000' AS DOUBLE) * num /
        |      (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))))
        |      AS BIGINT) END AS rho_ppm
        |FROM c""".stripMargin,
    // RBO twin: per-source top-10 rankings, greatest-rank cells, the
    // depth grid via correlated UNNEST(range), per-term floored ppm
    "eval_rbo" ->
      """WITH d0 AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS nc,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS toks
        |  FROM documents
        |), ta AS (
        |  SELECT source AS query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY nc DESC, doc_id) AS BIGINT) AS ra
        |  FROM d0
        |), tb AS (
        |  SELECT source AS query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY toks DESC, doc_id) AS BIGINT) AS rb
        |  FROM d0
        |), j AS (
        |  SELECT a.query_id AS query_id, greatest(a.ra, b.rb) AS m
        |  FROM ta a JOIN tb b ON a.query_id = b.query_id
        |    AND a.doc_id = b.doc_id
        |  WHERE a.ra <= 10 AND b.rb <= 10
        |), cm AS (
        |  SELECT query_id, m, CAST(count(*) AS BIGINT) AS cm FROM j
        |  GROUP BY 1, 2
        |), xd AS (
        |  SELECT query_id, d, CAST(sum(cm) AS BIGINT) AS x_d FROM (
        |    SELECT query_id, UNNEST(range(m, 11)) AS d, cm FROM cm
        |  ) GROUP BY 1, 2
        |), co AS (
        |  SELECT * FROM (VALUES
        |    (1, 1000000, 10), (2, 9000000, 200), (3, 81000000, 3000),
        |    (4, 729000000, 40000), (5, 6561000000, 500000),
        |    (6, 59049000000, 6000000), (7, 531441000000, 70000000),
        |    (8, 4782969000000, 800000000), (9, 43046721000000, 9000000000),
        |    (10, 387420489000000, 100000000000)) AS t(d, w_num, w_den)
        |), terms AS (
        |  SELECT query_id,
        |    CAST(CAST(x_d AS HUGEINT) * w_num // w_den AS BIGINT)
        |      AS term_ppm,
        |    x_d, d
        |  FROM xd JOIN co USING (d)
        |), per AS (
        |  SELECT query_id, CAST(sum(term_ppm) AS BIGINT) AS rbo_ppm,
        |    CAST(max(CASE WHEN d = 10 THEN x_d END) AS BIGINT) AS n_common
        |  FROM terms GROUP BY 1
        |)
        |SELECT q.query_id AS query_id,
        |  coalesce(n_common, 0) AS n_common,
        |  coalesce(rbo_ppm, 0) AS rbo_ppm
        |FROM (SELECT DISTINCT source AS query_id FROM documents) q
        |LEFT JOIN per USING (query_id)
        |ORDER BY query_id""".stripMargin,
    // conformal twin: md5-parity split, exact ceil order statistic,
    // one-row threshold cross join for the coverage count
    "eval_conformal" ->
      """WITH sc AS (
        |  SELECT abs(CAST(n_chars AS BIGINT)
        |      - 5 * CAST(len(string_split_regex(trim(text), '\s+'))
        |        AS BIGINT)) AS s,
        |    (CAST('0x' || substr(md5('conf:' || CAST(doc_id AS VARCHAR)),
        |      1, 8) AS BIGINT) % 2 = 0) AS is_cal
        |  FROM documents
        |), nc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_cal FROM sc WHERE is_cal
        |), cum AS (
        |  SELECT s, sum(cnt) OVER (ORDER BY s) AS cum FROM (
        |    SELECT s, CAST(count(*) AS BIGINT) AS cnt FROM sc
        |    WHERE is_cal GROUP BY 1)
        |), qq AS (
        |  SELECT CAST(min(s) AS BIGINT) AS q FROM cum, nc
        |  WHERE cum >= (90 * (n_cal + 1) + 99) // 100
        |), te AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN s <= q THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_covered,
        |    max(q) AS q
        |  FROM sc, qq WHERE NOT is_cal
        |)
        |SELECT n_cal, n_test, q,
        |  CASE WHEN n_test = 0 THEN NULL
        |    ELSE CAST(1000000 * n_covered // n_test AS BIGINT) END
        |    AS coverage_ppm,
        |  CAST(900000 AS BIGINT) AS target_ppm
        |FROM te, nc""".stripMargin,
    // stump twin: cumulative class counts over the distinct-score
    // domain, cross-multiplied weighted-Gini cost, min-(cost, v) election
    "eval_best_split" ->
      """WITH ps AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS p,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM documents GROUP BY 1
        |), cum AS (
        |  SELECT v, CAST(sum(p) OVER w AS BIGINT) AS pl,
        |    CAST(sum(m) OVER w AS BIGINT) AS nl
        |  FROM ps WINDOW w AS (ORDER BY v)
        |), tot AS (
        |  SELECT CAST(sum(p) AS BIGINT) AS pt, CAST(sum(m) AS BIGINT) AS nt
        |  FROM ps
        |), sp AS (
        |  SELECT v, pl, nl,
        |    CAST(1000000 * 2 * (CAST(pl AS HUGEINT) * (nl - pl) * (nt - nl)
        |        + CAST(pt - pl AS HUGEINT) * ((nt - nl) - (pt - pl)) * nl)
        |      // (CAST(nl AS HUGEINT) * (nt - nl) * nt) AS BIGINT)
        |      AS cost_ppm
        |  FROM cum, tot WHERE nl < nt
        |), best AS (
        |  SELECT v, pl, nl, cost_ppm,
        |    row_number() OVER (ORDER BY cost_ppm, v) AS rn
        |  FROM sp
        |)
        |SELECT b.v AS split_value, b.nl AS n_left, t.nt - b.nl AS n_right,
        |  b.pl AS pos_left, b.cost_ppm AS cost_ppm,
        |  CAST(1000000 * 2 * CAST(t.pt AS HUGEINT) * (t.nt - t.pt)
        |    // (CAST(t.nt AS HUGEINT) * t.nt) AS BIGINT) AS base_ppm,
        |  CAST(1000000 * 2 * CAST(t.pt AS HUGEINT) * (t.nt - t.pt)
        |    // (CAST(t.nt AS HUGEINT) * t.nt) AS BIGINT) - b.cost_ppm
        |    AS gain_ppm
        |FROM best b, tot t WHERE rn = 1""".stripMargin,
    // fairness twin: per-group conditional aggregation + one-row overall
    "eval_fairness" ->
      """WITH s AS (
        |  SELECT source AS grp, (lang = 'en') AS label,
        |    (n_chars >= 300) AS pred
        |  FROM documents
        |), per AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos_pred,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos_true,
        |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp,
        |    CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp
        |  FROM s GROUP BY 1
        |), pr AS (
        |  SELECT grp, n,
        |    CAST(1000000 * n_pos_pred // n AS BIGINT) AS sel_ppm,
        |    CASE WHEN n_pos_true = 0 THEN NULL
        |      ELSE CAST(1000000 * tp // n_pos_true AS BIGINT) END AS tpr_ppm,
        |    CASE WHEN n - n_pos_true = 0 THEN NULL
        |      ELSE CAST(1000000 * fp // (n - n_pos_true) AS BIGINT) END
        |      AS fpr_ppm
        |  FROM per
        |), ov AS (
        |  SELECT
        |    CAST(1000000 * sum(CASE WHEN pred THEN 1 ELSE 0 END)
        |      // count(*) AS BIGINT) AS o_sel,
        |    CASE WHEN sum(CASE WHEN label THEN 1 ELSE 0 END) = 0 THEN NULL
        |      ELSE CAST(1000000 * sum(CASE WHEN pred AND label
        |        THEN 1 ELSE 0 END)
        |        // sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) END
        |      AS o_tpr,
        |    CASE WHEN sum(CASE WHEN NOT label THEN 1 ELSE 0 END) = 0
        |      THEN NULL
        |      ELSE CAST(1000000 * sum(CASE WHEN pred AND NOT label
        |        THEN 1 ELSE 0 END)
        |        // sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS BIGINT) END
        |      AS o_fpr
        |  FROM s
        |)
        |SELECT grp, n, sel_ppm, tpr_ppm, fpr_ppm,
        |  sel_ppm - o_sel AS dp_gap_ppm,
        |  tpr_ppm - o_tpr AS tpr_gap_ppm,
        |  fpr_ppm - o_fpr AS fpr_gap_ppm
        |FROM pr, ov ORDER BY grp""".stripMargin,
    // path-distance twin: the events_paths session CTE with letter
    // coding, modal election by (n desc, path), levenshtein per path
    "events_path_distance" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events
        |), lt AS (
        |  SELECT event_type,
        |    chr(64 + CAST(dense_rank() OVER (ORDER BY event_type) AS INT))
        |      AS letter
        |  FROM (SELECT DISTINCT event_type FROM events)
        |), l AS (
        |  SELECT e.event_id, e.user_id, e.secs, lt.letter
        |  FROM e JOIN lt USING (event_type)
        |), lg AS (
        |  SELECT *, lag(secs) OVER (PARTITION BY user_id
        |    ORDER BY secs, event_id) AS prev FROM l
        |), s AS (
        |  SELECT *, CASE WHEN prev IS NULL OR secs - prev > 1800
        |    THEN 1 ELSE 0 END AS ns FROM lg
        |), t AS (
        |  SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
        |    ORDER BY secs, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_idx
        |  FROM s
        |), p AS (
        |  SELECT user_id, session_idx,
        |    array_to_string((list(letter ORDER BY secs, event_id))[1:8], '')
        |      AS path
        |  FROM t GROUP BY 1, 2
        |), c AS (
        |  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p
        |  GROUP BY 1
        |), md AS (
        |  SELECT path AS modal_path FROM c
        |  ORDER BY n_sessions DESC, path LIMIT 1
        |)
        |SELECT path, n_sessions, modal_path,
        |  CAST(levenshtein(path, modal_path) AS BIGINT) AS dist_to_modal
        |FROM c, md ORDER BY path""".stripMargin,
    // ArticleRank twin: the pagerank unroll with (outdeg + avgdeg)
    // divisors; avgdeg is one floored scalar CTE
    "graph_articlerank" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT n.id, 150000000000 + (85 * COALESCE(c.cin, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT ed.dst, CAST(SUM(p.r // ed.den) AS BIGINT) AS cin
           |    FROM ed JOIN $prev p ON p.id = ed.src GROUP BY ed.dst
           |  ) c ON n.id = c.dst
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
         |), nodes AS (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), deg AS (
         |  SELECT src, count(*) AS outdeg FROM e GROUP BY 1
         |), ad AS (
         |  SELECT CAST(sum(outdeg) // count(*) AS BIGINT) AS avgdeg FROM deg
         |), ed AS (
         |  SELECT e.src, e.dst, deg.outdeg + ad.avgdeg AS den
         |  FROM e JOIN deg USING (src) CROSS JOIN ad
         |), r0 AS (
         |  SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM nodes
         |), ${round("r0", "r1")},
         |${round("r1", "r2")},
         |${round("r2", "r3")},
         |${round("r3", "r4")},
         |${round("r4", "r5")}
         |SELECT id, r AS rank_scaled,
         |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
         |FROM r5 ORDER BY id""".stripMargin
    },
    // Eigenvector twin: per unrolled round the raw-sum CTE is referenced
    // twice (its own max + the rescale) -> MATERIALIZED (the r6 inlining
    // rule); integer L-inf normalization, zero-max guard
    "graph_eigenvector" -> {
      val round = (i: Int) =>
        s"""y$i AS MATERIALIZED (
           |  SELECT n.id, COALESCE(s.y, 0) AS y
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS id, CAST(SUM(p.x) AS BIGINT) AS y
           |    FROM e JOIN x${i - 1} p ON p.id = e.src GROUP BY e.dst
           |  ) s ON n.id = s.id
           |), x$i AS MATERIALIZED (
           |  SELECT y$i.id,
           |    CASE WHEN m.m <= 0 THEN CAST(0 AS BIGINT)
           |      ELSE CAST((CAST(y AS HUGEINT) * 1000000) // m.m AS BIGINT)
           |      END AS x
           |  FROM y$i CROSS JOIN (SELECT max(y) AS m FROM y$i) m
           |)""".stripMargin
      s"""WITH d AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
         |), e AS MATERIALIZED (
         |  SELECT src, dst FROM d UNION ALL SELECT dst, src FROM d
         |), nodes AS MATERIALIZED (
         |  SELECT DISTINCT src AS id FROM e
         |), x0 AS (
         |  SELECT id, CAST(1000000 AS BIGINT) AS x FROM nodes
         |), ${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)},
         |${round(5)}
         |SELECT id, x AS x_scaled FROM x5 ORDER BY id""".stripMargin
    },
    // Heavy-hitters twin: identical two-phase count algebra — md5
    // row-bucket cells, pigeonhole candidate cut, exact global recount
    "sketch_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), items AS (
        |  SELECT t[i] AS item,
        |    CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)
        |      AS row_key
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t))) AS i FROM toks)
        |), b AS (
        |  SELECT item,
        |    CAST('0x' || substr(md5(row_key), 1, 8) AS BIGINT) % 32
        |      AS bucket
        |  FROM items
        |), pb AS (
        |  SELECT bucket, item, CAST(count(*) AS BIGINT) AS cnt_b
        |  FROM b GROUP BY 1, 2
        |), bt AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_b FROM b GROUP BY 1
        |), cand AS (
        |  SELECT DISTINCT item FROM pb JOIN bt USING (bucket)
        |  WHERE cnt_b * 100 > n_b
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM items
        |)
        |SELECT i.item, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(*) * 1000000 // n_total AS BIGINT) AS share_ppm
        |FROM items i JOIN cand USING (item) CROSS JOIN tot
        |GROUP BY i.item, n_total
        |HAVING count(*) * 100 > n_total
        |ORDER BY item""".stripMargin,
    // DoReMi twin: bounded per-source frame, 5 unrolled multiplicative
    // rounds; raw{i} referenced twice (sum + rescale) -> MATERIALIZED
    "mix_doremi" -> {
      val round = (i: Int) =>
        s"""raw$i AS MATERIALIZED (
           |  SELECT source, n_docs, signal_e6, excess_e6,
           |    CASE WHEN mx.max_e6 <= 0 THEN w
           |      ELSE w + (w * excess_e6) // mx.max_e6 END AS w_raw
           |  FROM w${i - 1} CROSS JOIN mx
           |), w$i AS MATERIALIZED (
           |  SELECT source, n_docs, signal_e6, excess_e6,
           |    (w_raw * 1000000) // t.w_tot AS w
           |  FROM raw$i CROSS JOIN (
           |    SELECT CAST(sum(w_raw) AS BIGINT) AS w_tot FROM raw$i) t
           |)""".stripMargin
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_chars) AS HUGEINT) AS chars
         |  FROM documents GROUP BY 1
         |), per2 AS (
         |  SELECT source, n_docs,
         |    CAST(chars * 1000000 // n_docs AS BIGINT) AS signal_e6
         |  FROM per
         |), ref AS (
         |  SELECT CAST(sum(chars) * 1000000 // sum(n_docs) AS BIGINT)
         |    AS ref_e6
         |  FROM per
         |), dom AS (
         |  SELECT source, n_docs, signal_e6,
         |    greatest(signal_e6 - ref_e6, 0) AS excess_e6
         |  FROM per2 CROSS JOIN ref
         |), mx AS (
         |  SELECT max(excess_e6) AS max_e6 FROM dom
         |), w0 AS (
         |  SELECT source, n_docs, signal_e6, excess_e6,
         |    CAST(1000000 AS BIGINT) AS w
         |  FROM dom
         |), ${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)},
         |${round(5)}
         |SELECT source, n_docs, signal_e6, excess_e6, w AS weight_ppm
         |FROM w5 ORDER BY source""".stripMargin
    },
    // BLEU twin: the rouge gram legs (n = 1, 2) reduced to clipped
    // precision operands; p2 NULL-guarded exactly like the Spark side
    "eval_bleu" -> {
      def leg(n: Int): String = {
        val gramExpr =
          if (n == 1) "t[i]"
          else (0 until n).map(j => s"t[i+$j]").mkString(" || ' ' || ")
        s"""cg$n AS (
           |  SELECT pair_id, $gramExpr AS g, CAST(count(*) AS BIGINT) AS cc
           |  FROM (SELECT pair_id, t,
           |          unnest(generate_series(1, len(t) - ${n - 1})) AS i
           |        FROM (SELECT pair_id,
           |                string_split_regex(trim(cand), '\\s+') AS t
           |              FROM base) WHERE len(t) >= $n)
           |  GROUP BY 1, 2
           |), rg$n AS (
           |  SELECT pair_id, $gramExpr AS g, CAST(count(*) AS BIGINT) AS cr
           |  FROM (SELECT pair_id, t,
           |          unnest(generate_series(1, len(t) - ${n - 1})) AS i
           |        FROM (SELECT pair_id,
           |                string_split_regex(trim(ref), '\\s+') AS t
           |              FROM base) WHERE len(t) >= $n)
           |  GROUP BY 1, 2
           |), mm$n AS (
           |  SELECT pair_id, CAST(sum(least(cc, cr)) AS BIGINT) AS n_match
           |  FROM cg$n JOIN rg$n USING (pair_id, g) GROUP BY 1
           |)""".stripMargin
      }
      s"""WITH base AS (
         |  SELECT doc_id AS pair_id, text AS ref,
         |    substr(text, 1,
         |      greatest(length(text) - (CAST(doc_id % 7 AS INT) * 20), 40))
         |      || ' extra tail tokens' AS cand
         |  FROM documents WHERE doc_id < 200
         |),
         |${leg(1)},
         |${leg(2)},
         |s1 AS (
         |  SELECT pair_id, CAST(sum(cc) AS BIGINT) AS c1 FROM cg1 GROUP BY 1
         |), s2 AS (
         |  SELECT pair_id, CAST(sum(cc) AS BIGINT) AS c2 FROM cg2 GROUP BY 1
         |), rl AS (
         |  SELECT pair_id, CAST(sum(cr) AS BIGINT) AS n_ref FROM rg1
         |  GROUP BY 1
         |), j AS (
         |  SELECT s1.pair_id, s1.c1, COALESCE(a.n_match, 0) AS m1,
         |    s2.c2,
         |    CASE WHEN s2.c2 IS NULL THEN NULL
         |      ELSE COALESCE(b.n_match, 0) END AS m2,
         |    rl.n_ref
         |  FROM s1 JOIN rl USING (pair_id)
         |  LEFT JOIN s2 ON s1.pair_id = s2.pair_id
         |  LEFT JOIN mm1 a ON s1.pair_id = a.pair_id
         |  LEFT JOIN mm2 b ON s1.pair_id = b.pair_id
         |), k AS (
         |  SELECT pair_id, c1 AS n_cand, n_ref, m1, m2,
         |    CAST(1000000 * m1 // c1 AS BIGINT) AS p1_ppm,
         |    CASE WHEN c2 IS NULL OR c2 = 0 THEN NULL
         |      ELSE CAST(1000000 * m2 // c2 AS BIGINT) END AS p2_ppm,
         |    CAST(1000000 * c1 // n_ref AS BIGINT) AS len_ratio_ppm,
         |    c1 < n_ref AS bp_applied
         |  FROM j
         |)
         |SELECT pair_id, n_cand, n_ref, m1, m2, p1_ppm, p2_ppm,
         |  p1_ppm * p2_ppm AS bleu2_sq_e12, len_ratio_ppm, bp_applied
         |FROM k ORDER BY pair_id""".stripMargin
    },
    // Rolling-median twin: forward-contribution window cells, doubled
    // quantile_cont (exact integer), HUGEINT mean numerator
    "events_rolling_median" ->
      """WITH perday AS (
        |  SELECT event_type AS key,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2
        |), days AS (
        |  SELECT DISTINCT day FROM perday
        |), contrib AS (
        |  SELECT key, v, day + t.g AS day_w
        |  FROM perday, generate_series(0, 6) AS t(g)
        |)
        |SELECT c.key AS event_type, c.day_w AS day,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2,
        |  CAST(CAST(sum(v) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
        |    AS mean_ppm
        |FROM contrib c JOIN days d ON c.day_w = d.day
        |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    // Cross-modal alignment twin: embed_quantize's int8 CTE x the md5
    // stub features recomputed from the text form of the payload
    "multimodal_align" -> {
      val terms = (0 until 16).map { j =>
        s"(q[${j + 1}] * ((CAST('0x' || substr(md5(text || ':$j'), 1, 8)" +
          s" AS BIGINT) % 255) - 127))"
      }.mkString("\n         |    + ")
      s"""WITH sc AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |    list_max(list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> abs(x))) AS scale
         |  FROM embeddings
         |), qq AS (
         |  SELECT vec_id,
         |    list_transform(e, x -> CASE WHEN scale = 0
         |      THEN CAST(0 AS BIGINT)
         |      ELSE CAST(floor(x * 127.0 / scale) AS BIGINT) END) AS q
         |  FROM sc
         |), m AS (
         |  SELECT doc_id AS media_id, text FROM documents
         |), s AS (
         |  SELECT m.media_id,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |    CAST($terms AS BIGINT) AS align_score
         |  FROM m JOIN qq ON m.media_id = qq.vec_id
         |)
         |SELECT media_id, n_bytes, align_score, align_score >= 0 AS keep
         |FROM s ORDER BY media_id""".stripMargin
    },
    // Closeness twin: the harmonic walk CTEs with the Wasserman-Faust
    // readout — HUGEINT cross-multiply, one floored division
    "graph_closeness" ->
      """WITH RECURSIVE e AS (
        |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
        |), u AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION ALL SELECT dst, src FROM e
        |), walk(seed, id, d) AS (
        |  SELECT o_orderkey, o_orderkey, 0 FROM orders WHERE o_orderkey < 100
        |  UNION
        |  SELECT w.seed, u.v, w.d + 1 FROM walk w JOIN u ON u.u = w.id
        |  WHERE w.d < 3
        |), dist AS (
        |  SELECT seed, id, min(d) AS dist FROM walk GROUP BY 1, 2
        |), ns AS (
        |  SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_seeds
        |  FROM orders WHERE o_orderkey < 100
        |)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST(sum(dist) AS BIGINT) AS dist_sum,
        |  CAST(CAST(count(*) AS HUGEINT) * count(*) * 1000000
        |    // (CAST(n_seeds AS HUGEINT) * sum(dist)) AS BIGINT)
        |    AS closeness_ppm
        |FROM dist CROSS JOIN ns WHERE dist > 0
        |GROUP BY id, n_seeds ORDER BY id""".stripMargin,
    // Novelty-curve twin: identical staged batches, checksum ->
    // min(batch), strictly-earlier dup rule
    "corpus_novelty" ->
      """WITH d AS (
        |  SELECT doc_id % 4 AS batch, text FROM documents
        |  UNION ALL
        |  SELECT 4, text FROM documents WHERE doc_id < 60
        |  UNION ALL
        |  SELECT 2, text FROM documents WHERE doc_id < 20
        |), b AS (
        |  SELECT CAST(batch AS BIGINT) AS batch, md5(text) AS ck FROM d
        |), fs AS (
        |  SELECT ck, min(batch) AS first_batch FROM b GROUP BY 1
        |)
        |SELECT batch, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN batch > first_batch THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup_prior,
        |  CAST(1000000 * (count(*) -
        |    sum(CASE WHEN batch > first_batch THEN 1 ELSE 0 END))
        |    // count(*) AS BIGINT) AS novelty_ppm
        |FROM b JOIN fs USING (ck) GROUP BY batch ORDER BY batch""".stripMargin,
    // Effect-size twin: the welch staging with the pooled-variance
    // fixed IEEE tree; degenerate arms NULL
    "events_effect_size" ->
      """WITH r0 AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      AS BIGINT) < 8 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(floor(value * 100) AS BIGINT) AS x
        |  FROM events
        |), cells AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS n, sum(x) AS s,
        |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS ss
        |  FROM r0 GROUP BY 1
        |), w AS (
        |  SELECT
        |    CAST(coalesce(sum(CASE WHEN variant = 'A' THEN n END), 0)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 'A' THEN s END) AS DOUBLE) AS sa,
        |    CAST(sum(CASE WHEN variant = 'A' THEN ss END) AS DOUBLE) AS ssa,
        |    CAST(coalesce(sum(CASE WHEN variant = 'B' THEN n END), 0)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 'B' THEN s END) AS DOUBLE) AS sb,
        |    CAST(sum(CASE WHEN variant = 'B' THEN ss END) AS DOUBLE) AS ssb
        |  FROM cells
        |), c1 AS (
        |  SELECT n_a, n_b, sa, sb, ssa, ssb,
        |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb
        |  FROM w
        |), c2 AS (
        |  SELECT n_a, n_b, sa, sb, na, nb,
        |    ((na * ssa - sa * sa) / na + (nb * ssb - sb * sb) / nb)
        |      / (na + nb - 2) AS sp2
        |  FROM c1
        |), c3 AS (
        |  SELECT n_a, n_b, sa, sb, na, nb,
        |    CASE WHEN n_a > 1 AND n_b > 1 AND sp2 > 0
        |      THEN (sa / na - sb / nb) / sqrt(sp2) END AS cohen_d
        |  FROM c2
        |)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN sa / na END AS mean_a_cents,
        |  CASE WHEN n_b > 0 THEN sb / nb END AS mean_b_cents,
        |  cohen_d,
        |  cohen_d * (1 - 3 / (4 * (na + nb) - 9)) AS hedges_g
        |FROM c3 ORDER BY n_a""".stripMargin,
    // PRF twin: the bm25 chain to a feedback set, then feedback tf x
    // integer idf over the corpus-wide df of the feedback vocabulary
    "search_prf" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), lens AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
        |), tot AS (
        |  SELECT CAST(sum(dl) AS BIGINT) AS corpus_len, count(*) AS n_docs
        |  FROM lens
        |), q AS (
        |  SELECT DISTINCT query_id, token FROM (
        |    SELECT doc_id AS query_id, unnest(t[1:5]) AS token
        |    FROM toks WHERE doc_id < 5)
        |), tfa AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS token FROM toks)
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
        |), sc AS (
        |  SELECT q.query_id, d.doc_id,
        |    CAST(sum(((1000000 // df) * 2200 * corpus_len * tf)
        |      // (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))
        |      AS BIGINT) AS score
        |  FROM d JOIN q ON d.token = q.token
        |  JOIN lens ON d.doc_id = lens.doc_id
        |  CROSS JOIN tot
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS r
        |  FROM sc
        |), fb AS (
        |  SELECT query_id, doc_id FROM rk WHERE r <= 5
        |), ftf AS (
        |  SELECT fb.query_id, x.token, CAST(count(*) AS BIGINT) AS fb_tf
        |  FROM fb JOIN (SELECT doc_id, unnest(t) AS token FROM toks) x
        |    ON fb.doc_id = x.doc_id
        |  GROUP BY 1, 2
        |), dfv AS (
        |  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM (SELECT doc_id, unnest(t) AS token FROM toks)
        |  WHERE token IN (SELECT DISTINCT token FROM ftf)
        |  GROUP BY 1
        |), ex AS (
        |  SELECT f.query_id, f.token, f.fb_tf, dfv.df,
        |    f.fb_tf * (1000000 // dfv.df) AS weight
        |  FROM ftf f JOIN dfv USING (token)
        |  WHERE NOT EXISTS (SELECT 1 FROM q
        |    WHERE q.query_id = f.query_id AND q.token = f.token)
        |), rk2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY weight DESC, token) AS rnk
        |  FROM ex
        |)
        |SELECT query_id, CAST(rnk AS BIGINT) AS "rank", token, fb_tf,
        |  df, weight
        |FROM rk2 WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin,
    // Label-noise twin: label_knn's scored/ranked/votes chain with
    // self-exclusion and the (votes DESC, label ASC) majority election
    "embed_label_noise" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(label AS BIGINT) AS own_label,
        |    CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id % 17 = 0
        |), c AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS n_label,
        |    CAST(embedding AS DOUBLE[]) AS ce
        |  FROM embeddings
        |), scored AS (
        |  SELECT q.query_id, c.vec_id, c.n_label,
        |    list_dot_product(ce, qe) /
        |      (sqrt(list_dot_product(ce, ce)) * sqrt(list_dot_product(qe, qe)))
        |      AS cosine
        |  FROM c, q WHERE c.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, n_label,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id ASC) AS r
        |  FROM scored
        |), votes AS (
        |  SELECT query_id, n_label, CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked WHERE r <= 5 GROUP BY 1, 2
        |), best AS (
        |  SELECT query_id, n_label AS knn_label,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, n_label ASC) AS vr
        |  FROM votes
        |)
        |SELECT q.query_id, q.own_label, b.knn_label,
        |  CAST(coalesce(v.votes, 0) AS BIGINT) AS n_agree,
        |  b.knn_label <> q.own_label AS flagged
        |FROM q JOIN best b ON b.query_id = q.query_id AND b.vr = 1
        |LEFT JOIN votes v
        |  ON v.query_id = q.query_id AND v.n_label = q.own_label
        |ORDER BY q.query_id""".stripMargin,
    // Kahn-layers twin: unrolled peel rounds (extra rounds are no-ops
    // past exhaustion); f/u/rem MATERIALIZED (each referenced 2-3x)
    "graph_toposort" -> {
      val round = (r: Int) =>
        s"""f$r AS MATERIALIZED (
           |  SELECT u.id, CAST(${r - 1} AS BIGINT) AS layer FROM u${r - 1} u
           |  WHERE NOT EXISTS (SELECT 1 FROM rem${r - 1} e WHERE e.dst = u.id)
           |), u$r AS MATERIALIZED (
           |  SELECT id FROM u${r - 1}
           |  WHERE id NOT IN (SELECT id FROM f$r)
           |), rem$r AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM rem${r - 1} e
           |  WHERE e.src NOT IN (SELECT id FROM f$r)
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT p_partkey AS src, p_partkey // 10 AS dst FROM part
         |  WHERE p_partkey >= 10
         |), nodes AS (
         |  SELECT src AS id FROM e UNION SELECT dst FROM e
         |), u0 AS MATERIALIZED (
         |  SELECT id FROM nodes
         |), rem0 AS MATERIALIZED (
         |  SELECT src, dst FROM e
         |), ${(1 to 8).map(round).mkString(",\n")},
         |layers AS (
         |  ${(1 to 8).map(r => s"SELECT id, layer FROM f$r")
              .mkString("\n  UNION ALL ")}
         |)
         |SELECT n.id, l.layer FROM nodes n LEFT JOIN layers l
         |  ON n.id = l.id
         |ORDER BY n.id""".stripMargin
    },
    // DP top-k twin: identical binomial bit-count noise, suppression,
    // and (released DESC, token) total order over the survivors
    "privacy_dp_topk" ->
      """WITH items AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |), c AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS n_true
        |  FROM items GROUP BY 1
        |), n AS (
        |  SELECT token, CAST(greatest(n_true +
        |    (bit_count(CAST('0x' || substr(md5('dptopk:' || token), 1, 8)
        |       AS BIGINT))
        |     + bit_count(CAST('0x' || substr(md5('dptopk:' || token), 9, 8)
        |       AS BIGINT)) - 32), 0) AS BIGINT) AS released
        |  FROM c
        |), t AS (
        |  SELECT token, released FROM n WHERE released >= 10
        |  ORDER BY released DESC, token LIMIT 20
        |)
        |SELECT CAST(row_number() OVER (ORDER BY released DESC, token)
        |    AS BIGINT) AS "rank",
        |  token, released
        |FROM t ORDER BY "rank"""".stripMargin,
    // Katz twin: the eigenvector unroll with the damped-offset round
    // y = 1e6 + (sum-in // 2); HUGEINT rescale numerator
    "graph_katz" -> {
      val round = (i: Int) =>
        s"""y$i AS MATERIALIZED (
           |  SELECT n.id, CAST(1000000 + COALESCE(s.y, 0) // 2 AS BIGINT)
           |    AS y
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS id, sum(p.x) AS y
           |    FROM e JOIN x${i - 1} p ON p.id = e.src GROUP BY e.dst
           |  ) s ON n.id = s.id
           |), x$i AS MATERIALIZED (
           |  SELECT y$i.id,
           |    CASE WHEN m.m <= 0 THEN CAST(0 AS BIGINT)
           |      ELSE CAST((CAST(y AS HUGEINT) * 1000000) // m.m AS BIGINT)
           |      END AS x
           |  FROM y$i CROSS JOIN (SELECT max(y) AS m FROM y$i) m
           |)""".stripMargin
      s"""WITH d AS (
         |  SELECT o_orderkey AS src, o_custkey + 10000000 AS dst FROM orders
         |), e AS MATERIALIZED (
         |  SELECT src, dst FROM d UNION ALL SELECT dst, src FROM d
         |), nodes AS MATERIALIZED (
         |  SELECT DISTINCT src AS id FROM e
         |), x0 AS (
         |  SELECT id, CAST(1000000 AS BIGINT) AS x FROM nodes
         |), ${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)},
         |${round(5)}
         |SELECT id, x AS x_scaled FROM x5 ORDER BY id""".stripMargin
    },
    // transitivity twin: same co-occurrence graph CTEs as
    // graph_clustering; wedges fold per node through HUGEINT
    "graph_transitivity" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
        |  WHERE l_partkey % 4 = 0
        |), sized AS (
        |  SELECT g, item FROM (
        |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz FROM pairs)
        |  WHERE gsz <= 100
        |), e AS MATERIALIZED (
        |  SELECT DISTINCT l.item AS a, r.item AS b
        |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
        |), deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1
        |), base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    sum(CAST(deg AS HUGEINT) * (deg - 1) // 2) AS wedges
        |  FROM deg
        |), tri AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |    SELECT e1.a, e1.b, e2.b AS c
        |    FROM e e1
        |    JOIN e e2 ON e1.b = e2.a
        |    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |), en AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e
        |)
        |SELECT n_nodes, n_edges, CAST(wedges AS BIGINT) AS n_wedges,
        |  n_triangles,
        |  CASE WHEN wedges = 0 THEN NULL
        |    ELSE CAST(CAST(n_triangles AS HUGEINT) * 3000000 // wedges
        |      AS BIGINT) END AS transitivity_ppm
        |FROM base, tri, en ORDER BY n_nodes""".stripMargin,
    // embeddedness twin: id-ordered triangles (x<y<z) vote for their
    // three canonical edges; left join keeps zero-support bridges
    "graph_embeddedness" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
        |  WHERE l_partkey % 4 = 0
        |), sized AS (
        |  SELECT g, item FROM (
        |    SELECT g, item, count(*) OVER (PARTITION BY g) AS gsz FROM pairs)
        |  WHERE gsz <= 100
        |), e AS MATERIALIZED (
        |  SELECT DISTINCT l.item AS a, r.item AS b
        |  FROM sized l JOIN sized r ON l.g = r.g AND l.item < r.item
        |), tri AS MATERIALIZED (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |), sup AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS n_common FROM (
        |    SELECT x AS a, y AS b FROM tri
        |    UNION ALL SELECT x, z FROM tri
        |    UNION ALL SELECT y, z FROM tri) GROUP BY 1, 2
        |)
        |SELECT e.a, e.b, COALESCE(s.n_common, 0) AS n_common
        |FROM e LEFT JOIN sup s ON s.a = e.a AND s.b = e.b
        |ORDER BY e.a, e.b""".stripMargin,
    // MCC twin: same conditional-agg cells, HUGEINT products, the
    // identical factored-sqrt double tree
    "eval_mcc" ->
      """WITH c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN lang = 'en' AND n_chars >= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars >= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN lang = 'en' AND n_chars < 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars < 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM documents
        |)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN tp + fp = 0 OR tp + fn = 0
        |         OR tn + fp = 0 OR tn + fn = 0 THEN NULL
        |  ELSE CAST(CAST(tp AS HUGEINT) * tn
        |          - CAST(fp AS HUGEINT) * fn AS DOUBLE)
        |    / (sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) AS DOUBLE))
        |     * sqrt(CAST(CAST(tn + fp AS HUGEINT) * (tn + fn) AS DOUBLE)))
        |  END AS mcc
        |FROM c ORDER BY tp""".stripMargin,
    "eval_ndcg" -> ndcgOracleSql(5),
    // Kendall twin: per-type gap-filled grids, shared-day wide frame,
    // exact C(n,2) sign census, positive-offset tau floor
    "events_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), wide AS (
        |  SELECT day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN x ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN x ELSE 0 END)
        |      AS BIGINT) AS b
        |  FROM grid GROUP BY 1
        |), p AS (
        |  SELECT r.a - l.a AS da, r.b - l.b AS db
        |  FROM wide l JOIN wide r ON l.day < r.day
        |), agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN (da > 0 AND db > 0) OR (da < 0 AND db < 0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_concordant,
        |    CAST(sum(CASE WHEN (da > 0 AND db < 0) OR (da < 0 AND db > 0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_discordant
        |  FROM p
        |)
        |SELECT n_pairs, n_concordant, n_discordant,
        |  n_pairs - n_concordant - n_discordant AS n_ties,
        |  CASE WHEN n_pairs = 0 THEN NULL
        |    ELSE CAST(((n_concordant - n_discordant) * 1000000
        |      + n_pairs * 1000000) // n_pairs - 1000000 AS BIGINT)
        |  END AS tau_a_ppm
        |FROM agg ORDER BY n_pairs""".stripMargin,
    // Mann-Kendall twin: identical pair sign sums, integer variance
    // numerator, the same continuity-corrected double tree
    "events_mannkendall" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), p AS (
        |  SELECT l.event_type,
        |    CAST(sum(sign(r.x - l.x)) AS BIGINT) AS s_stat,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM grid l JOIN grid r
        |    ON r.event_type = l.event_type AND l.day < r.day
        |  GROUP BY 1
        |), n AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |  FROM grid GROUP BY 1
        |), j AS (
        |  SELECT p.event_type, n.n_days, p.n_pairs, p.s_stat,
        |    n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) AS var_s_x18
        |  FROM p JOIN n ON n.event_type = p.event_type
        |)
        |SELECT event_type, n_days, n_pairs, s_stat, var_s_x18,
        |  CASE WHEN n_days < 2 OR var_s_x18 = 0 THEN NULL
        |    WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
        |      / sqrt(CAST(var_s_x18 AS DOUBLE) / 18.0)
        |    WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
        |      / sqrt(CAST(var_s_x18 AS DOUBLE) / 18.0)
        |    ELSE 0.0 END AS z_mk
        |FROM j ORDER BY event_type""".stripMargin,
    // rolling-corr twin: identical trailing window moments (BIGINT
    // products, HUGEINT sums) and the same fixed IEEE r tree
    "events_rolling_corr" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT s.event_type, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), wide AS (
        |  SELECT day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN x ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN x ELSE 0 END)
        |      AS BIGINT) AS b
        |  FROM grid GROUP BY 1
        |), win AS (
        |  SELECT day,
        |    row_number() OVER (ORDER BY day) AS pos,
        |    sum(a) OVER w AS sa, sum(b) OVER w AS sb,
        |    sum(a * b) OVER w AS sab,
        |    sum(a * a) OVER w AS saa,
        |    sum(b * b) OVER w AS sbb
        |  FROM wide
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
        |    AND CURRENT ROW)
        |)
        |SELECT day, CAST(sa AS BIGINT) AS sa, CAST(sb AS BIGINT) AS sb,
        |  CASE WHEN 14 * saa - CAST(sa AS HUGEINT) * sa = 0
        |         OR 14 * sbb - CAST(sb AS HUGEINT) * sb = 0 THEN NULL
        |  ELSE CAST(14 * sab - CAST(sa AS HUGEINT) * sb AS DOUBLE)
        |    / (sqrt(CAST(14 * saa - CAST(sa AS HUGEINT) * sa AS DOUBLE))
        |     * sqrt(CAST(14 * sbb - CAST(sb AS HUGEINT) * sb AS DOUBLE)))
        |  END AS r_trailing
        |FROM win WHERE pos >= 14 ORDER BY day""".stripMargin,
    // SAX twin: per-type grids, integer PAA means, x4 quartile
    // cut-points (quarter-fraction interpolation is exact in binary)
    "events_sax" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT g.event_type, g.day, g.d0, COALESCE(d.x, 0) AS x
        |  FROM (SELECT s.event_type, s.d0, CAST(u.day AS BIGINT) AS day
        |        FROM span s,
        |          UNNEST(generate_series(s.d0, s.d1)) AS u(day)) g
        |  LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day
        |), paa AS MATERIALIZED (
        |  SELECT event_type, (day - d0) // 7 AS win,
        |    CAST(sum(x) // count(*) AS BIGINT) AS paa
        |  FROM grid GROUP BY 1, 2
        |), cuts AS (
        |  SELECT
        |    CAST(quantile_cont(paa, CAST('0.25' AS DOUBLE)) * 4 AS BIGINT)
        |      AS q1x4,
        |    CAST(quantile_cont(paa, CAST('0.5' AS DOUBLE)) * 4 AS BIGINT)
        |      AS q2x4,
        |    CAST(quantile_cont(paa, CAST('0.75' AS DOUBLE)) * 4 AS BIGINT)
        |      AS q3x4
        |  FROM paa
        |)
        |SELECT event_type, CAST(win AS BIGINT) AS win, paa,
        |  CASE WHEN 4 * paa <= q1x4 THEN 'a'
        |       WHEN 4 * paa <= q2x4 THEN 'b'
        |       WHEN 4 * paa <= q3x4 THEN 'c'
        |       ELSE 'd' END AS symbol
        |FROM paa CROSS JOIN cuts
        |ORDER BY event_type, win""".stripMargin,
    // sentence-dup twin: the docs_sentences 8-token block staging,
    // cross-doc census, deterministic top-100
    "dedup_sentences" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), blocks AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, CAST(ceil(len(t)/8.0) AS BIGINT)))
        |      AS i, t
        |  FROM toks
        |), bp AS (
        |  SELECT doc_id,
        |    array_to_string(t[(i-1)*8+1:(i-1)*8+8], ' ') AS sentence
        |  FROM blocks
        |), d AS (
        |  SELECT sentence,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_occurrences,
        |    CAST(min(doc_id) AS BIGINT) AS first_doc
        |  FROM bp GROUP BY 1
        |  HAVING count(DISTINCT doc_id) >= 2
        |), t AS (
        |  SELECT * FROM d
        |  ORDER BY n_occurrences DESC, n_docs DESC, sentence LIMIT 100
        |)
        |SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC,
        |    n_docs DESC, sentence) AS BIGINT) AS "rank",
        |  sentence, n_docs, n_occurrences, first_doc
        |FROM t ORDER BY "rank"""".stripMargin,
    // salted-join twin: the PLAIN join — salted output rows are
    // identical by construction, only partitioning differs
    "skew_join_salted" ->
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // star-fence twin: planted 8-copy exact families (synthesized
    // disjoint vocabularies) share every band bucket, so star edges
    // collapse to (family min, member) — the O(D) edge set is
    // derivable from the construction alone
    "dedup_minhash_star" ->
      """WITH base AS (
        |  SELECT DISTINCT doc_id FROM documents WHERE doc_id < 30
        |), fam AS (
        |  SELECT doc_id * 1000 AS a_id, doc_id * 1000 + r AS b_id
        |  FROM base, UNNEST(range(1, 8)) AS u(r)
        |)
        |SELECT a_id, b_id FROM fam ORDER BY a_id, b_id""".stripMargin
  )

  /** Generated DuckDB twin of [[graft.ops.Sampling.shapleyVocabValue]]:
    * the same top-`topK` source election (count desc, name asc), bit
    * masks per token via distinct (group, token) bit sums, the 2^c
    * coalition coverage table (v(T) = tokens whose mask intersects T),
    * and factorial-weighted marginal sums unrolled per group.
    */
  private def shapleyVocabOracle(topK: Int): String = {
    val c = topK + 1
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val full = (1L << c) - 1
    val phiRows = (0 until c).map { i =>
      val bit = 1L << i
      val terms = (0L to full).filter(t => (t & bit) == 0L).map { t =>
        val w = fact(java.lang.Long.bitCount(t)) *
          fact(c - 1 - java.lang.Long.bitCount(t))
        s"$w*((SELECT vv FROM v WHERE t=${t | bit})" +
          s"-(SELECT vv FROM v WHERE t=$t))"
      }.mkString("\n    + ")
      val label =
        if (i < topK) s"(SELECT source FROM top WHERE grp = $i)"
        else "'other'"
      s"  SELECT CAST($i AS BIGINT) AS grp, $label AS source,\n" +
        s"    CAST(coalesce((SELECT n FROM cells WHERE mask = $bit), 0)" +
        s" AS BIGINT) AS n_exclusive_tokens,\n" +
        s"    CAST(\n    $terms AS BIGINT) AS phi_scaled"
    }.mkString("\n  UNION ALL\n")
    s"""WITH sc AS (
       |  SELECT source, count(*) AS n FROM documents GROUP BY 1
       |), top AS (
       |  SELECT source,
       |    row_number() OVER (ORDER BY n DESC, source) - 1 AS grp
       |  FROM sc
       |), g AS (
       |  SELECT source, CASE WHEN grp < $topK THEN grp ELSE $topK END
       |    AS grp
       |  FROM top
       |), dt AS (
       |  SELECT DISTINCT g.grp, tok FROM (
       |    SELECT source, unnest(list_distinct(
       |      string_split_regex(trim(lower(text)), '\\s+'))) AS tok
       |    FROM documents) d
       |  JOIN g ON d.source = g.source WHERE length(tok) > 0
       |), tm AS (
       |  SELECT tok, CAST(sum(1 << CAST(grp AS INT)) AS BIGINT) AS mask
       |  FROM dt GROUP BY 1
       |), cells AS MATERIALIZED (
       |  SELECT mask, CAST(count(*) AS BIGINT) AS n FROM tm GROUP BY 1
       |), v AS MATERIALIZED (
       |  SELECT t.m AS t, CAST(coalesce(sum(c.n), 0) AS BIGINT) AS vv
       |  FROM (SELECT UNNEST(range(0, ${full + 1})) AS m) t
       |  LEFT JOIN cells c ON (c.mask & t.m) <> 0
       |  GROUP BY 1
       |), phi AS (
       |$phiRows
       |)
       |SELECT grp, source, n_exclusive_tokens, phi_scaled,
       |  CAST(phi_scaled * 1000000 // greatest(${fact(c)} *
       |    (SELECT vv FROM v WHERE t = $full), 1) AS BIGINT) AS phi_ppm
       |FROM phi ORDER BY grp""".stripMargin
  }

  /** Unrolled-CTE twin of [[graft.ops.Graph.betweenness]] at maxHops=3:
    * forward level-BFS hops f1..f3 (σ summed over depth-(h−1) parents,
    * NOT EXISTS against the accumulated known set), backward dependency
    * frames b3..b1 (per-edge e6 floor terms), endpoint depth-0 rows
    * excluded by construction.
    */
  private def betweennessOracle: String = {
    val head =
      """WITH ed AS MATERIALIZED (
        |  SELECT u, v FROM (
        |    SELECT o_orderkey AS u, o_custkey + 10000000 AS v FROM orders
        |    UNION
        |    SELECT o_custkey + 10000000 AS u, o_orderkey AS v
        |    FROM orders) t
        |), f0 AS MATERIALIZED (
        |  SELECT DISTINCT o_orderkey AS s, o_orderkey AS v,
        |    CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sig
        |  FROM orders WHERE o_orderkey < 100
        |), kn0 AS (SELECT s, v FROM f0)""".stripMargin
    val fwd = (1 to 3).map { h =>
      s"""f$h AS MATERIALIZED (
         |  SELECT f.s AS s, e.v AS v, CAST($h AS BIGINT) AS dist,
         |    CAST(sum(f.sig) AS BIGINT) AS sig
         |  FROM f${h - 1} f JOIN ed e ON e.u = f.v
         |  WHERE NOT EXISTS (SELECT 1 FROM kn${h - 1} k
         |    WHERE k.s = f.s AND k.v = e.v)
         |  GROUP BY 1, 2
         |), kn$h AS MATERIALIZED (
         |  SELECT s, v FROM kn${h - 1} UNION ALL SELECT s, v FROM f$h
         |)""".stripMargin
    }.mkString(", ")
    val b3 = """b3 AS MATERIALIZED (
        |  SELECT s, v, dist, sig, CAST(0 AS BIGINT) AS delta FROM f3
        |)""".stripMargin
    val bwd = (2 to 1 by -1).map { h =>
      s"""b$h AS MATERIALIZED (
         |  SELECT f.s, f.v, f.dist, f.sig,
         |    CAST(COALESCE(c.delta, 0) AS BIGINT) AS delta
         |  FROM f$h f LEFT JOIN (
         |    SELECT f2.s, f2.v,
         |      CAST(sum(f2.sig * (1000000 + ch.delta) // ch.sig)
         |        AS BIGINT) AS delta
         |    FROM f$h f2 JOIN ed e ON e.u = f2.v
         |    JOIN b${h + 1} ch ON ch.s = f2.s AND ch.v = e.v
         |    GROUP BY 1, 2
         |  ) c ON c.s = f.s AND c.v = f.v
         |)""".stripMargin
    }.mkString(", ")
    val tail =
      """SELECT v AS id, CAST(sum(delta) AS BIGINT) AS betweenness_e6,
        |  CAST(count(*) AS BIGINT) AS n_sources
        |FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2
        |      UNION ALL SELECT * FROM b3) t
        |GROUP BY 1 HAVING sum(delta) > 0
        |ORDER BY betweenness_e6 DESC, id""".stripMargin
    s"$head, $fwd, $b3, $bwd\n$tail"
  }

  /** Unrolled-CTE twin of [[graft.ops.Events.markovAttribution]]: the
    * bounded transition table, one redirected copy per scenario, and 12
    * FIXED absorption rounds (v1..v12, each MATERIALIZED — the pageRank
    * fixed-round recipe: extra rounds past convergence are no-ops, so
    * the unroll matches the Scala loop register for register).
    */
  /** Generated Shapley oracle: per-(user, day) coalition bitmasks, the
    * zeta transform v(T) = Σ_{mask ⊆ T} convs(mask) over all 2^c
    * coalition masks (bitwise-AND subset join against UNNEST(range)),
    * then the unrolled factorial-weighted marginal sums — every term
    * an exact BIGINT, matching the driver-side arithmetic cell for
    * cell. */
  private def shapleyOracle(channels: Seq[String], conv: String): String = {
    val c = channels.length
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val maskSum = channels.zipWithIndex.map { case (ch, i) =>
      s"max(CASE WHEN event_type='$ch' THEN 1 ELSE 0 END) * ${1L << i}"
    }.mkString("\n    + ")
    val full = (1L << c) - 1
    val phiRows = channels.zipWithIndex.map { case (ch, i) =>
      val bit = 1L << i
      val terms = (0L to full).filter(t => (t & bit) == 0L).map { t =>
        val w = fact(java.lang.Long.bitCount(t)) *
          fact(c - 1 - java.lang.Long.bitCount(t))
        s"$w*((SELECT vv FROM v WHERE t=${t | bit})" +
          s"-(SELECT vv FROM v WHERE t=$t))"
      }.mkString("\n    + ")
      s"  SELECT '$ch' AS channel, CAST(\n    $terms AS BIGINT)" +
        " AS phi_scaled"
    }.mkString("\n  UNION ALL\n")
    s"""WITH u AS (
       |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
       |    $maskSum AS mask,
       |    max(CASE WHEN event_type='$conv' THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY 1, 2
       |), cells AS MATERIALIZED (
       |  SELECT mask, CAST(sum(conv) AS BIGINT) AS convs FROM u GROUP BY 1
       |), v AS MATERIALIZED (
       |  SELECT t.m AS t, CAST(coalesce(sum(c.convs), 0) AS BIGINT) AS vv
       |  FROM (SELECT UNNEST(range(0, ${full + 1})) AS m) t
       |  LEFT JOIN cells c ON (c.mask & t.m) = c.mask
       |  GROUP BY 1
       |), phi AS (
       |$phiRows
       |)
       |SELECT channel, phi_scaled,
       |  phi_scaled * 1000000 // greatest(${fact(c)} *
       |    ((SELECT vv FROM v WHERE t=$full) -
       |     (SELECT vv FROM v WHERE t=0)), 1) AS phi_ppm
       |FROM phi ORDER BY channel""".stripMargin
  }

  private def markovOracle: String = {
    val head =
      """WITH ranked AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 'conv'
        |         ELSE event_type END AS state,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events
        |), fc AS (
        |  SELECT user_id, min(rn) AS conv_rn FROM ranked
        |  WHERE state = 'conv' GROUP BY 1
        |), journey AS (
        |  SELECT r.user_id, r.state, r.rn
        |  FROM ranked r LEFT JOIN fc ON fc.user_id = r.user_id
        |  WHERE fc.conv_rn IS NULL OR r.rn <= fc.conv_rn
        |), steps AS (
        |  SELECT user_id, state AS f,
        |    COALESCE(lead(state) OVER (PARTITION BY user_id
        |      ORDER BY rn), 'null') AS t
        |  FROM journey
        |), trans AS MATERIALIZED (
        |  SELECT f, t, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
        |    SELECT f, t, count(*) AS cnt FROM steps
        |    WHERE f <> 'conv' GROUP BY 1, 2
        |    UNION ALL
        |    SELECT 'start' AS f, state AS t, count(*) AS cnt
        |    FROM journey WHERE rn = 1 GROUP BY 1, 2) u
        |  GROUP BY 1, 2
        |), scenarios AS (
        |  SELECT * FROM (VALUES ('full'), ('click'), ('error'),
        |    ('signup'), ('view')) sc(sc)
        |), strans AS MATERIALIZED (
        |  SELECT s.sc, tr.f,
        |    CASE WHEN tr.t = s.sc THEN 'null' ELSE tr.t END AS t,
        |    CAST(sum(tr.cnt) AS BIGINT) AS cnt
        |  FROM scenarios s, trans tr GROUP BY 1, 2, 3
        |), outs AS MATERIALIZED (
        |  SELECT sc, f, CAST(sum(cnt) AS BIGINT) AS outc
        |  FROM strans GROUP BY 1, 2
        |), states AS MATERIALIZED (
        |  SELECT DISTINCT sc, f AS s FROM strans
        |  UNION
        |  SELECT DISTINCT sc, t AS s FROM strans
        |), v0 AS MATERIALIZED (
        |  SELECT sc, s, CASE WHEN s = 'conv' THEN CAST(1000000 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS v
        |  FROM states
        |)""".stripMargin
    val rounds = (1 to 12).map { k =>
      s"""v$k AS MATERIALIZED (
         |  SELECT s.sc, s.s,
         |    CASE WHEN s.s = 'conv' THEN CAST(1000000 AS BIGINT)
         |         WHEN s.s = 'null' THEN CAST(0 AS BIGINT)
         |         ELSE CAST(COALESCE(a.num // a.outc, 0) AS BIGINT) END AS v
         |  FROM states s
         |  LEFT JOIN (
         |    SELECT tr.sc, tr.f, CAST(sum(tr.cnt * pv.v) AS BIGINT) AS num,
         |      max(o.outc) AS outc
         |    FROM strans tr
         |    JOIN v${k - 1} pv ON pv.sc = tr.sc AND pv.s = tr.t
         |    JOIN outs o ON o.sc = tr.sc AND o.f = tr.f
         |    GROUP BY 1, 2
         |  ) a ON a.sc = s.sc AND a.f = s.s
         |)""".stripMargin
    }.mkString(", ")
    val tail =
      """SELECT c.sc AS channel, f.v AS v_full_ppm, c.v AS v_removed_ppm,
        |  CAST(greatest(1000000 * (f.v - c.v), 0)
        |    // greatest(f.v, 1) AS BIGINT) AS removal_ppm
        |FROM v12 c, v12 f
        |WHERE f.sc = 'full' AND f.s = 'start'
        |  AND c.s = 'start' AND c.sc <> 'full'
        |ORDER BY channel""".stripMargin
    s"$head, $rounds\n$tail"
  }

  /** Generated DuckDB twin of [[graft.ops.TextAnalysis.ndcgCard]] over
    * the eval_retrieval staging: the SAME Scala-computed integer
    * discount table (`floor(10⁶/log2(i+1))`) is embedded as literals
    * on both sides, so DCG/IDCG are order-free BIGINT sums — the
    * runtime log never executes in either engine.
    */
  private def ndcgOracleSql(k: Int): String = {
    val wPpm: Seq[Long] = (1 to k).map(i =>
      math.floor(1e6 / (math.log(i + 1) / math.log(2))).toLong)
    val cumW: Seq[Long] = wPpm.scanLeft(0L)(_ + _).tail
    val wCase = wPpm.zipWithIndex.map { case (w, i) =>
      s"WHEN p.r = ${i + 1} THEN $w" }.mkString(" ")
    val cCase = cumW.zipWithIndex.map { case (c, i) =>
      s"WHEN least(ng.n_gold, $k) = ${i + 1} THEN $c" }.mkString(" ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |  FROM documents
       |), lens AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
       |), tot AS (
       |  SELECT CAST(sum(dl) AS BIGINT) AS corpus_len, count(*) AS n_docs
       |  FROM lens
       |), q AS (
       |  SELECT DISTINCT query_id, token FROM (
       |    SELECT doc_id AS query_id, unnest(t[1:$k]) AS token
       |    FROM toks WHERE doc_id < 5)
       |), nq AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_q_terms
       |  FROM q GROUP BY 1
       |), tfa AS (
       |  SELECT doc_id, token, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(t) AS token FROM toks)
       |  GROUP BY 1, 2
       |), d AS (
       |  SELECT *, count(*) OVER (PARTITION BY token) AS df FROM tfa
       |), sc AS (
       |  SELECT q.query_id, d.doc_id,
       |    CAST(sum(((1000000 // df) * 2200 * corpus_len * tf)
       |      // (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))
       |      AS BIGINT) AS score
       |  FROM d JOIN q ON d.token = q.token
       |  JOIN lens ON d.doc_id = lens.doc_id
       |  CROSS JOIN tot
       |  GROUP BY 1, 2
       |), pred AS (
       |  SELECT query_id, doc_id, CAST(r AS BIGINT) AS r FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS r
       |    FROM sc) WHERE r <= $k
       |), post AS (
       |  SELECT DISTINCT doc_id, token FROM (
       |    SELECT doc_id, unnest(t) AS token FROM toks)
       |), gold AS (
       |  SELECT q.query_id, p.doc_id
       |  FROM post p
       |  JOIN q ON q.token = p.token
       |  JOIN nq ON nq.query_id = q.query_id
       |  GROUP BY 1, 2
       |  HAVING CAST(count(*) AS BIGINT) = min(nq.n_q_terms)
       |), ng AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_gold
       |  FROM gold GROUP BY 1
       |), dcg AS (
       |  SELECT p.query_id,
       |    CAST(sum(CASE $wCase END) AS BIGINT) AS dcg_ppm
       |  FROM pred p JOIN gold g
       |    ON g.query_id = p.query_id AND g.doc_id = p.doc_id
       |  GROUP BY 1
       |)
       |SELECT ng.query_id, ng.n_gold,
       |  CAST(COALESCE(dcg.dcg_ppm, 0) AS BIGINT) AS dcg_ppm,
       |  CAST(CASE $cCase END AS BIGINT) AS idcg_ppm,
       |  CAST(1000000 * COALESCE(dcg.dcg_ppm, 0)
       |    // (CASE $cCase END) AS BIGINT) AS ndcg_ppm
       |FROM ng LEFT JOIN dcg ON dcg.query_id = ng.query_id
       |ORDER BY ng.query_id""".stripMargin
  }
}
