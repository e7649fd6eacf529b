package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.applyops.{ApplyPlanner, TableSpec}
import graft.dedup.LastWriterWins
import graft.functions.GraftFunctions
import graft.ops.{DedupOps, IncrementalDedup, JoinOps, MultiModalOps, SampleOps, SimilarityOps, TextOps}

/** Driver contract — one query per implemented operator family (SURVEY.md
  * §2), each SQL-expressible one paired with equivalent DuckDB oracle SQL
  * over the same parquet tables.
  *
  * Oracle-parity rules used throughout: outputs carry only strings and
  * bigints (money as exact cents via ROUND(x*100)::BIGINT, timestamps as
  * epoch microseconds) so cross-engine hashing can't diverge on float
  * formatting; every aggregate/computed column is aliased identically on
  * both sides.
  */
object SparkEntry {

  private def pq(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** Total order for an ORACLE-SIZED output without a global range sort:
    * `orderBy` range-partitions, and its boundary sampling re-executes the
    * entire upstream pipeline a second time — measured ~1.4x on the LSH
    * queries. A single-partition sort gives the same order for outputs
    * this small while the upstream keeps its full parallelism.
    */
  private implicit class SmallSort(df: DataFrame) {
    def sortSmall(c1: String, cs: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(c1, cs: _*)
  }

  /** DuckDB list literal of words (for stopword sets in oracle SQL). */
  private def lstSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ",", "]")

  /** The quality-feature + score CTEs shared by every oracle that gates on
    * [[graft.ops.TextOps.qualityScoreMicros]] — ONE copy of the formula so
    * the standalone and composed queries cannot drift. Emits CTEs
    * `qf`/`qg`; `qg` has (doc_id[, carryCols], quality_micro).
    */
  private def qualitySqlCtes(fromSrc: String, carryCols: String): String =
    s"""qf AS (
       |  SELECT doc_id$carryCols,
       |         CAST(length(text) AS DOUBLE) AS n_chars,
       |         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0)) AS DOUBLE) AS n_toks,
       |         CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) AS punct,
       |         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS digits,
       |         CAST(len(list_intersect(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> len(t) > 0), ${lstSql(
        graft.ops.TextOps.enStop
      )})) AS DOUBLE) AS stop
       |  FROM $fromSrc
       |), qg AS (
       |  SELECT doc_id$carryCols,
       |         CAST(FLOOR((least(n_toks / 20.0, 1.0) * 0.3
       |                   + (1.0 - least((punct / greatest(n_chars, 1.0)) * 3.0, 1.0)) * 0.3
       |                   + (1.0 - least((digits / greatest(n_chars, 1.0)) * 3.0, 1.0)) * 0.2
       |                   + least((stop / greatest(n_toks, 1.0)) * 4.0, 1.0) * 0.2) * 1000000.0 + 0.5) AS BIGINT) AS quality_micro
       |  FROM qf
       |)""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_cdc_apply")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- CDC kernels (SURVEY §2.3 W1, §2.1 S9/S11, §2.2 K4) -------------
    "q_lww_dedup" -> ((s, dir) => {
      // W1: last-writer-wins dedup per key as the canonical Catalyst window
      val e = pq(s, dir, "events")
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          unix_micros(col("ts").cast(TimestampType)).as("last_ts_us")
        )
        .sortSmall("user_id")
    }),
    "q_lww_salted" -> ((s, dir) => {
      // W1 scale path: salted two-phase reduce, same result as the window
      val e = pq(s, dir, "events").select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts").cast(TimestampType)).as("ts_us")
      )
      LastWriterWins
        .dedupSalted(e, Seq("user_id"), Seq("ts_us", "event_id"), 16)
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          col("ts_us").as("last_ts_us")
        )
        .sortSmall("user_id")
    }),
    "q_cdc_apply" -> ((s, dir) => {
      // K2/K3: apply a keyed changefeed — final visible state after LWW,
      // with 'error' events acting as deletes (tombstoned keys vanish)
      val e = pq(s, dir, "events")
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          unix_micros(col("ts").cast(TimestampType)).as("last_ts_us")
        )
        .sortSmall("user_id")
    }),
    "q_txn_times" -> ((s, dir) => {
      // S11: distinct commit timestamps in staging
      pq(s, dir, "events")
        .select(unix_micros(col("ts").cast(TimestampType)).as("ts_us"))
        .distinct()
        .sortSmall("ts_us")
    }),
    "q_fence_window" -> ((s, dir) => {
      // S9: staged-mutation window scan (fence bounds pushed to the scan)
      pq(s, dir, "events")
        .filter(
          col("ts").cast(TimestampType) > to_timestamp(lit("2024-01-10 00:00:00")) &&
            col("ts").cast(TimestampType) <= to_timestamp(lit("2024-01-20 00:00:00"))
        )
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id")
        )
        .sortSmall("event_type")
    }),
    "q_cas_gate" -> ((s, dir) => {
      // K4: conditional (CAS) upsert gate — proposed tuple must beat current
      val e = pq(s, dir, "events").select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts").cast(TimestampType)).as("ts_us")
      )
      val current = LastWriterWins.dedupSalted(
        e.filter(col("event_id") % 2 === 0),
        Seq("user_id"),
        Seq("ts_us", "event_id"),
        8
      )
      val proposed = e
        .filter(col("event_id") % 2 === 1)
        .withColumn("__deleted", lit(false))
      // single-pass audit over the SAME gate predicate as casFilter
      // (ApplyPlanner.casJoined/casCond are shared by both): the former
      // count-accepted-then-join-back shape scanned `proposed` twice and
      // paid an extra aggregate + join for the per-key accounting
      ApplyPlanner
        .casAudit(proposed, current, Seq("user_id"), Seq("ts_us", "event_id"))
        .select(col("user_id"), col("n_proposed"), col("n_accepted"))
        .sortSmall("user_id")
    }),
    // --- relational breadth: agg / join / top-k / window ----------------
    "q_agg_lineitem" -> ((s, dir) => {
      // floor(x*100 + 0.5) instead of round(x*100): Spark's Round on
      // DoubleType goes through BigDecimal.valueOf (a Double.toString
      // parse) PER ROW, while floor is one fused double op; for positive
      // values below 2^52 the two are provably equal (shortest-decimal
      // HALF_UP == +0.5-then-floor), and ProbeRound verified 0 mismatches
      // over every money column at every SF
      pq(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(floor(col("l_quantity") * 100 + 0.5).cast(LongType))
            .as("qty_cents"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast(LongType))
            .as("price_cents")
        )
        .sortSmall("l_returnflag", "l_linestatus")
    }),
    "q_join_mktsegment" -> ((s, dir) => {
      val o = pq(s, dir, "orders")
      val c = pq(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          // floor(+0.5) == round for these positive values (see
          // q_agg_lineitem) without the per-row BigDecimal round path
          sum(floor(col("o_totalprice") * 100 + 0.5).cast(LongType))
            .as("total_cents")
        )
        .sortSmall("c_mktsegment")
    }),
    "q_topk_orders" -> ((s, dir) => {
      pq(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(
          col("o_orderkey"),
          // floor(+0.5) == round here (see q_agg_lineitem); only 10 rows,
          // changed for form-consistency with the money queries
          floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents")
        )
    }),
    "q_window_rank" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      pq(s, dir, "orders")
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          row_number().over(w).cast(LongType).as("rn")
        )
        .sortSmall("o_custkey", "rn")
    }),
    "q_semi_join" -> ((s, dir) => {
      // EXISTS: customers that have at least one high-value order
      val c = pq(s, dir, "customer")
      val o = pq(s, dir, "orders").filter(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .sortSmall("c_custkey")
    }),
    "q_anti_join" -> ((s, dir) => {
      // NOT EXISTS: customers with no high-value order
      val c = pq(s, dir, "customer")
      val o = pq(s, dir, "orders").filter(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .sortSmall("c_custkey")
    }),
    "q_distinct_count" -> ((s, dir) => {
      pq(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts")
        )
        .sortSmall("l_returnflag")
    }),
    // --- training-data ops over documents/embeddings --------------------
    "q_dedup_exact" -> ((s, dir) => {
      pq(s, dir, "documents")
        .groupBy(md5(col("text")).as("content_md5"))
        .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keep_id"))
        .sortSmall("content_md5")
    }),
    "q_split" -> ((s, dir) => {
      // deterministic rebalance-stable train/val/test split — a pure
      // projection on the md5 unit hash, re-derivable by any engine;
      // binary-representable fractions keep the cutoffs IEEE-identical
      // on both sides
      SampleOps
        .assignSplit(
          pq(s, dir, "documents").select("doc_id"),
          "doc_id",
          Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
        )
        .sortSmall("doc_id")
    }),
    "q_incremental_dedup" -> ((s, dir) => {
      // incremental near-dup ADMISSION: docs < 250 are the accepted
      // corpus (band index built once), docs >= 250 arrive as a batch;
      // each is accepted, rejected as a corpus duplicate, or rejected as
      // a within-batch duplicate of a smaller-id survivor. Run in
      // verify-against-lake mode (index prunes, exact n-gram Jaccard
      // decides), so the oracle re-derives every verdict from the texts
      // alone — no hash family in the semantics.
      val d = pq(s, dir, "documents")
      val corpus = d.filter(col("doc_id") < 250)
      val batch = d.filter(col("doc_id") >= 250)
      val idx = IncrementalDedup.bandIndexRows(corpus, "text", "doc_id")
      val adm = IncrementalDedup.admitBatch(
        batch, idx, "text", "doc_id",
        threshold = 0.7, corpusTexts = Some(corpus))
      val verdicts = adm.rejected.select(
        col("id").as("doc_id"),
        when(col("reason") === "corpus", "corpus_dup")
          .otherwise("batch_dup")
          .as("verdict")
      )
      batch
        .select("doc_id")
        .join(verdicts, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("verdict"), lit("accepted")).as("verdict")
        )
        .sortSmall("doc_id")
    }),
    "q_token_bpe" -> ((s, dir) => {
      // REAL subword tokenizer: BPE merges learned from this corpus itself
      // (Sennrich algorithm, deterministic tie-breaks — no external vocab
      // ships in this sandbox), then the greedy lowest-rank encoder as a
      // native expression. Oracle: pinned output (PinnedOracles.token_bpe —
      // DuckDB cannot run an iterative tokenizer); algorithm semantics are
      // golden-tested corpus-independently in BpeSpec (round-trip,
      // monotonicity, the published 'newest/widest' merge order).
      GraftFunctions.register(s)
      val docs = pq(s, dir, "documents")
      val merges = TextOps.learnBpe(docs, "text", numMerges = 200)
      docs
        .select(
          col("doc_id"),
          TextOps
            .bpeTokenCount(col("text"), merges)
            .cast(LongType)
            .as("n_bpe_tokens")
        )
        .sortSmall("doc_id")
    }),
    "q_token_count" -> ((s, dir) => {
      pq(s, dir, "documents")
        .select(
          col("doc_id"),
          size(filter(split(col("text"), " "), t => length(t) > 0))
            .cast(LongType)
            .as("n_tokens")
        )
        .sortSmall("doc_id")
    }),
    "q_text_stats" -> ((s, dir) => {
      // count the class matches instead of materializing the rewritten
      // string: size(regexp_extract_all(text, '[0-9]')) equals
      // length(regexp_replace(text, '[^0-9]', '')) but skips building a
      // near-full copy of every row (ProbeExpr A/B: 0.140s vs 0.207s)
      pq(s, dir, "documents")
        .select(
          col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars"),
          size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
            .cast(LongType)
            .as("n_digits"),
          size(regexp_extract_all(col("text"), lit("[A-Z]"), lit(0)))
            .cast(LongType)
            .as("n_upper")
        )
        .sortSmall("doc_id")
    }),
    "q_lang_agg" -> ((s, dir) => {
      pq(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .sortSmall("lang")
    }),
    // --- CDC-query envelope end-to-end (S3/S4), DuckDB-oracled ----------
    "q_query_apply" -> ((s, dir) => {
      // events re-encoded as CDC-query ndjson with ALTERNATING envelope key
      // order (__event__ first on even ids, last on odd ids — the case the
      // old regex parser corrupted), then parsed, planned, and LWW-applied;
      // 'error' events ride the wire as deletes
      import graft.applyops.{ApplyPlanner, TableSpec}
      import graft.feed.Envelopes
      val e = pq(s, dir, "events")
      val op = when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("insert"))
      val stamp = concat(col("event_id").cast(StringType), lit(".0000000000"))
      val fields = concat(
        lit("\"user_id\":"), col("user_id").cast(StringType),
        lit(",\"event_id\":"), col("event_id").cast(StringType),
        lit(",\"event_type\":\""), col("event_type"),
        lit("\",\"val_cents\":"),
        floor(col("value") * 100 + 0.5).cast(LongType).cast(StringType)
      )
      val lineA = concat(
        lit("{\"__event__\":\""), op, lit("\","), fields,
        lit(",\"__crdb__\":{\"updated\":\""), stamp, lit("\"}}")
      )
      val lineB = concat(
        lit("{\"__crdb__\":{\"updated\":\""), stamp, lit("\"},"), fields,
        lit(",\"__event__\":\""), op, lit("\"}")
      )
      val lines = e.select(
        when(pmod(col("event_id"), lit(2)) === 0, lineA).otherwise(lineB).as("value")
      )
      val parsed = Envelopes.parseQueryLines(lines, Seq("user_id"), withFile = false)
      val payload = StructType(
        Seq(
          StructField("user_id", LongType),
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("val_cents", LongType)
        )
      )
      val planned = ApplyPlanner.plan(
        s,
        TableSpec(payload, Seq("user_id")),
        parsed.select("key", "data", "nanos", "logical", "src_file"),
        saltBuckets = 16
      )
      planned.batch
        .filter(!col("__deleted"))
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          col("val_cents")
        )
        .sortSmall("user_id")
    }),
    // --- LSH candidates + EXACT verify (DuckDB-oracled vs all-pairs) ------
    "q_minhash_pairs" -> ((s, dir) => {
      val d = pq(s, dir, "documents")
      DedupOps
        .minhashNearDupPairs(d, "text", "doc_id", k = 5, numHashes = 32, bands = 8, threshold = 0.5)
        .select(
          col("id_a"),
          col("id_b"),
          floor(col("jaccard") * 1000 + 0.5).cast(LongType).as("jacc_milli")
        )
        .sortSmall("id_a", "id_b")
    }),
    "q_pii_redact" -> ((s, dir) => {
      // PII scrub proven end-to-end: plant deterministic contact details
      // on a slice of real docs, then verify every span is redacted and
      // counted (md5 of the redacted text pins the exact output)
      val d = pq(s, dir, "documents")
      val t2 = when(
        col("doc_id") % 3 === 0,
        concat(
          col("text"),
          lit(" contact user"),
          col("doc_id").cast(StringType),
          lit("@example.com or +1-555-"),
          (col("doc_id") + 1000000).cast(StringType)
        )
      ).otherwise(col("text"))
      d.select(
        col("doc_id"),
        TextOps.piiCount(t2).as("n_pii"),
        md5(TextOps.redactPii(t2)).as("redacted_md5"),
        length(TextOps.redactPii(t2)).cast(LongType).as("redacted_len")
      ).sortSmall("doc_id")
    }),
    "q_decontaminate" -> ((s, dir) => {
      // train/eval contamination check: training docs sharing any 13-gram
      // with the (stand-in) eval slice. Eval shingles broadcast; the train
      // side is a map-side semi-probe — no shuffle of the big table.
      val d = pq(s, dir, "documents")
      DedupOps
        .contaminatedIds(
          train = d.filter(col("doc_id") % 97 =!= 0),
          eval_ = d.filter(col("doc_id") % 97 === 0),
          textCol = "text",
          idCol = "doc_id",
          k = 13
        )
        .sortSmall("doc_id")
    }),
    "q_stratified_sample" -> ((s, dir) => {
      // reproducible corpus mixing: per-language Bernoulli-by-md5-hash
      // sampling — a pure filter (no shuffle, no RNG state), bit-identical
      // across re-runs, cluster sizes, and engines (DuckDB recomputes the
      // exact member set from the same md5 arithmetic)
      SampleOps
        .stratifiedHashSample(
          pq(s, dir, "documents"),
          idCol = "doc_id",
          strataCol = "lang",
          fractions = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.1)
        )
        .select(col("doc_id"), col("lang"))
        .sortSmall("doc_id")
    }),
    "q_dup_spans" -> ((s, dir) => {
      // exact-substring overlap (Lee et al. 2021 at doc granularity): the
      // fraction of 50-char-gram positions shared with another document.
      // Spark hashes grams to longs for the shuffle; the fraction is
      // hash-invariant, so DuckDB re-derives it from the raw substrings.
      DedupOps
        .dupSpanFracMicro(pq(s, dir, "documents"), "text", "doc_id", k = 50)
        .select(col("id").as("doc_id"), col("dup_span_micro"))
        .sortSmall("doc_id")
    }),
    "q_mixture_plan" -> ((s, dir) => {
      // token-budgeted corpus mixing end-to-end: exact per-language token
      // totals -> expectation-hitting Bernoulli fractions -> reproducible
      // hash sample -> achieved per-language doc/token counts. The oracle
      // re-derives the totals, the fractions (IEEE double arithmetic
      // matches bit-exactly), the md5 membership, and the final counts.
      val d = pq(s, dir, "documents")
        .withColumn("toks", TextOps.tokenCount(col("text")))
      val budgets = Map("en" -> 20000L, "de" -> 5000L, "zh" -> 1000L)
      val fractions = SampleOps.mixtureFractions(d, "lang", "toks", budgets)
      SampleOps
        .stratifiedHashSample(d, "doc_id", "lang", fractions)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("toks")).cast(LongType).as("n_tokens")
        )
        .sortSmall("lang")
    }),
    "q_corpus_curate" -> ((s, dir) => {
      // the full corpus-curation pipeline COMPOSED end-to-end, one oracled
      // answer: exact dedup -> near-dup clustering -> canonical selection
      // -> quality gate -> per-language doc/token accounting. Each stage is
      // individually oracled elsewhere; this row proves they compose.
      GraftFunctions.register(s) // quality rides the fused native kernel
      val d = pq(s, dir, "documents")
      val exact = DedupOps.exactDedup(d, "text", "doc_id")
      val pairs = DedupOps.minhashNearDupPairs(
        exact, "text", "doc_id", k = 5, numHashes = 32, bands = 8, threshold = 0.5)
      val canonical =
        DedupOps.dedupByComponents(exact, DedupOps.connectedComponents(pairs), "doc_id")
      canonical
        .filter(TextOps.qualityScoreMicros(col("text")) >= 820000)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text"))).cast(LongType).as("n_tokens")
        )
        .sortSmall("lang")
    }),
    "q_dup_clusters" -> ((s, dir) => {
      // pairs -> duplicate CLUSTERS: near-dup similarity is not transitive,
      // so canonical-doc selection needs connected components over the
      // pair graph (large-star/small-star; O(log n) rounds). Edge source is
      // the LSH+exact-verify pipeline at threshold 0.5 — the regime where
      // its output is oracle-proven equal to all-pairs Jaccard — so the
      // DuckDB recursive-CTE components oracle the whole clustering path.
      val d = pq(s, dir, "documents")
      val pairs = DedupOps.minhashNearDupPairs(
        d, "text", "doc_id", k = 5, numHashes = 32, bands = 8, threshold = 0.5)
      DedupOps
        .connectedComponents(pairs)
        .sortSmall("id")
    }),
    "q_ngram_jaccard" -> ((s, dir) => {
      // the exact n-gram-Jaccard operator standalone (no LSH in front):
      // all-pairs within a bounded id block, hashed-long shingle sets.
      // This is the verify stage every near-dup pipeline shares, oracled
      // directly against DuckDB's string-set Jaccard.
      val d = pq(s, dir, "documents").filter(col("doc_id") < 200)
      val pairs = d
        .select(col("doc_id").as("id_a"))
        .crossJoin(d.select(col("doc_id").as("id_b")))
        .filter(col("id_a") < col("id_b"))
      DedupOps
        .jaccardVerify(pairs, d, "text", "doc_id", k = 5, threshold = 0.3)
        .select(
          col("id_a"),
          col("id_b"),
          floor(col("jaccard") * 1000 + 0.5).cast(LongType).as("jacc_milli")
        )
        .sortSmall("id_a", "id_b")
    }),
    "q_simhash_pairs" -> ((s, dir) => {
      GraftFunctions.register(s)
      val d = pq(s, dir, "documents")
      // radius 3 is the published 64-bit simhash near-dup operating point
      // (Manku et al. WWW'07); the banded join guarantees recall 1 there
      DedupOps
        .simhashPairs(d, "text", "doc_id", maxHamming = 3)
        .sortSmall("id_a", "id_b")
    }),
    "q_winnow_pairs" -> ((s, dir) => {
      // the fingerprint FAMILY as a detector: doc pairs sharing >= 20
      // winnow prints — on this corpus template boilerplate tops out near
      // 20 shared prints while true near-dups sit at 40+, so the threshold
      // separates signal from noise (oracle: pinned output, PinnedOracles;
      // guarantee + pair semantics golden-tested)
      DedupOps
        .winnowPairs(pq(s, dir, "documents"), "text", "doc_id", minShared = 20)
        .sortSmall("id_a", "id_b")
    }),
    "q_winnow_fp" -> ((s, dir) => {
      GraftFunctions.register(s)
      pq(s, dir, "documents")
        .select(
          col("doc_id"),
          size(GraftFunctions.winnow(col("text"), 7, 8)).cast(LongType)
            .as("n_fingerprints"),
          array_min(GraftFunctions.winnow(col("text"), 7, 8)).as("min_fp")
        )
        .sortSmall("doc_id")
    }),
    "q_langid_pred" -> ((s, dir) => {
      pq(s, dir, "documents")
        .select(
          col("doc_id"),
          TextOps.langId(col("text")).as("pred_lang"),
          col("lang").as("stored_lang")
        )
        .sortSmall("doc_id")
    }),
    "q_quality_score" -> ((s, dir) => {
      GraftFunctions.register(s) // quality/bpeish ride the fused native kernel
      pq(s, dir, "documents")
        .select(
          col("doc_id"),
          TextOps.qualityScoreMicros(col("text")).as("quality_micro"),
          TextOps.bpeishTokenCount(col("text")).cast(LongType).as("n_bpeish")
        )
        .sortSmall("doc_id")
    }),
    "q_knn_cosine" -> ((s, dir) => {
      val emb = pq(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb
        .filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      SimilarityOps
        .knnBruteForce(queries, emb, k = 5)
        .select(col("qid"), col("id"), col("rank"))
        .sortSmall("qid", "rank")
    }),
    "q_knn_lsh" -> ((s, dir) => {
      val emb = pq(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb
        .filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      SimilarityOps
        .lshBucketKnn(queries, emb, k = 5, bits = 8)
        .select(col("qid"), col("id"), col("rank"))
        .sortSmall("qid", "rank")
    }),
    "q_knn_ivf" -> ((s, dir) => {
      // IVF-Flat through the full plumbing (sample-trained coarse
      // quantizer -> inverted-list assignment -> probe join -> exact
      // re-rank) in FULL-PROBE mode (nprobe == nlist), which is exactly
      // brute force — so the DuckDB brute-force top-k oracles the entire
      // IVF path; partial-probe recall is golden-tested in
      // TrainingOpsSpec
      val emb = pq(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb
        .filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val cents =
        SimilarityOps.ivfTrainCentroids(emb, nlist = 16, iters = 4, sampleSize = 1024)
      SimilarityOps
        .ivfSearch(queries, emb, cents, k = 5, nprobe = 16)
        .select(col("qid"), col("id"), col("rank"))
        .sortSmall("qid", "rank")
    }),
    "q_knn_ivf_indexed" -> ((s, dir) => {
      // the PERSISTED IVF index path: base written once partitioned by
      // list_id, probes prune partitions statically (PartitionFilters).
      // Full-probe mode is exactly brute force, so the same oracle covers
      // the whole build→probe→re-rank pipeline.
      val emb = pq(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb
        .filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val cents =
        SimilarityOps.ivfTrainCentroids(emb, nlist = 16, iters = 4, sampleSize = 1024)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-ivf-index")
        .toString
      SimilarityOps.ivfBuildIndex(emb, cents, idx)
      // materialize the (tiny) result eagerly, then reclaim the index —
      // it holds a full partitioned copy of the embeddings table, and a
      // lazily-returned plan would keep the temp dir pinned (and leaked)
      // per invocation
      val out = SimilarityOps
        .ivfSearchIndexed(queries, idx, cents, k = 5, nprobe = 16)
        .select(col("qid"), col("id"), col("rank"))
        .sortSmall("qid", "rank")
        .localCheckpoint(true)
      graft.util.Dirs.deleteRecursively(java.nio.file.Paths.get(idx))
      out
    }),
    "q_repetition" -> ((s, dir) => {
      // intra-document repetition (C4 line-dedup / Gopher n-gram signal):
      // duplicate-line and duplicate-3-gram fractions. Repetition is
      // PLANTED on a deterministic slice (doc_id % 5 == 0) so the operator
      // has real signal; the oracle re-derives both ratios from the same
      // planted text.
      val d = pq(s, dir, "documents")
      val t = when(
        col("doc_id") % 5 === 0,
        concat_ws(
          "\n",
          col("text"),
          col("text"),
          lit("repeated line"),
          lit("repeated line")
        )
      ).otherwise(col("text"))
      d.select(
        col("doc_id"),
        TextOps.dupLineFracMicro(t).as("dup_line_micro"),
        TextOps.dupGram3FracMicro(t).as("dup_gram3_micro")
      ).sortSmall("doc_id")
    }),
    "q_gopher_rules" -> ((s, dir) => {
      // Gopher-style document quality gates (Rae et al. 2021 §A1.1): each
      // micro-scaled signal plus the combined pass/fail bit
      val d = pq(s, dir, "documents")
      d.select(
        col("doc_id"),
        TextOps.meanWordLenMicro(col("text")).as("mean_wlen_micro"),
        TextOps.symbolRatioMicro(col("text")).as("symbol_micro"),
        TextOps.bulletFracMicro(col("text")).as("bullet_micro"),
        TextOps.gopherPass(col("text")).cast(LongType).as("gopher_pass")
      ).sortSmall("doc_id")
    }),
    "q_embed_near_dup" -> ((s, dir) => {
      // the raw embeddings table has no pairs above ~0.51 cosine, so the
      // near-dup operator is exercised on base ∪ planted perturbations:
      // v' = v + deterministic per-index deltas (pure double arithmetic —
      // bit-identical in the DuckDB oracle), giving cos(v, v') ≈ 0.99987
      // against a ≤0.52 background. LSH banding recall at that gap is 1.
      val emb = pq(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val base = emb.select(
        col("id"),
        transform(col("vec"), x => x.cast("double")).as("vec")
      )
      val planted = emb.select(
        (col("id") + 100000L).as("id"),
        transform(
          col("vec"),
          (x, i) => x.cast("double") + ((col("id") + i) % 7 - 3) * lit(0.001)
        ).as("vec")
      )
      SimilarityOps
        .cosineNearDupPairs(base.unionByName(planted), threshold = 0.99, bits = 6, bands = 12)
        .select("id_a", "id_b")
        .sortSmall("id_a", "id_b")
    }),
    "q_media_features" -> ((s, dir) => {
      // the full decode pipeline runs (batched mapPartitions through the
      // codec boundary); the DuckDB oracle checks the SQL-expressible slice
      // (id/mime routing, byte accounting) — width/height/luma stay under
      // the golden sbt test because the stub codec's FNV fold is not SQL
      val ids = pq(s, dir, "documents").select(col("doc_id").as("media_id"))
      val blobs = MultiModalOps.syntheticBlobs(ids, "media_id", 128)
      MultiModalOps
        .extractFeatures(s, blobs)
        .toDF()
        .select(
          col("media_id"),
          col("mime"),
          col("byte_len").cast(LongType).as("byte_len")
        )
        .sortSmall("media_id")
    }),
    "q_source_report" -> ((s, dir) => {
      // per-source curation report — the dashboard cut a corpus owner
      // reads per ingestion source: doc count, token total, EXACT integer
      // mean quality (sum DIV count — no float mean drift), and the
      // Gopher-gate pass count. One map-side-combining aggregation.
      GraftFunctions.register(s) // quality rides the fused native kernel
      val d = pq(s, dir, "documents")
      d.select(
          col("source"),
          TextOps.tokenCount(col("text")).cast(LongType).as("toks"),
          TextOps.qualityScoreMicros(col("text")).cast(LongType).as("q"),
          TextOps.gopherPass(col("text")).cast(LongType).as("gp")
        )
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("toks").as("total_toks"),
          expr("sum(q) DIV count(1)").as("mean_quality_micro"),
          sum("gp").as("gopher_pass")
        )
        .sortSmall("source")
    }),
    "q_chunk_docs" -> ((s, dir) => {
      // context-window chunk plan: 120-token windows with stride 90 (25%
      // overlap), offsets only — the text slice happens downstream so the
      // huge text column is never duplicated per chunk. Pure map-side
      // fan-out; the oracle re-derives every chunk from token counts.
      val d = pq(s, dir, "documents")
      TextOps
        .chunkPlan(d, "text", "doc_id", chunkTokens = 120, stride = 90)
        .select(
          col("doc_id"),
          col("chunk_id").cast(LongType).as("chunk_id"),
          col("tok_begin").cast(LongType).as("tok_begin"),
          col("tok_end").cast(LongType).as("tok_end"),
          col("n_chunks").cast(LongType).as("n_chunks")
        )
        .sortSmall("doc_id", "chunk_id")
    }),
    "q_chunk_text" -> ((s, dir) => {
      // end-to-end chunking: the plan's fan-out plus the actual text
      // slice, one map-side pass (tokenize once, explode, slice) — the
      // oracle re-derives every chunk text with list_slice
      val d = pq(s, dir, "documents")
      TextOps
        .sliceChunks(d, "text", "doc_id", chunkTokens = 120, stride = 90)
        .select(
          col("doc_id"),
          col("chunk_id").cast(LongType).as("chunk_id"),
          col("tok_begin").cast(LongType).as("tok_begin"),
          col("tok_end").cast(LongType).as("tok_end"),
          col("chunk_text")
        )
        .sortSmall("doc_id", "chunk_id")
    }),
    "q_sessionize" -> ((s, dir) => {
      // gap-based sessionization (session_window — Spark's native
      // merging-session operator, state-store-backed when streaming):
      // per-user sessions split at >30-minute gaps. The oracle re-derives
      // sessions the classic SQL way (LAG gap flags -> running sum ->
      // group), so the native operator's merge semantics are pinned to
      // first principles.
      val ev = pq(s, dir, "events")
      ev.groupBy(
          session_window(col("ts"), "30 minutes").as("w"),
          col("user_id")
        )
        .agg(
          count(lit(1)).as("n_events"),
          // per-EVENT cents conversion before the sum: long addition is
          // associative, so the total is order-independent across engines
          // (a double sum would be at the mercy of accumulation order)
          sum(floor(col("value") * 100 + 0.5).cast(LongType)).as("value_cents")
        )
        .select(
          col("user_id"),
          col("w.start").as("sess_start"),
          col("n_events"),
          col("value_cents")
        )
        .sortSmall("user_id", "sess_start")
    }),
    "q_asof_join" -> ((s, dir) => {
      // AS-OF join (union + keyed-window composition — no custom plan
      // needed): each click picks up the latest prior-or-equal view by
      // the same user; DuckDB's native ASOF LEFT JOIN is the oracle
      val ev = pq(s, dir, "events")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev
        .filter(col("event_type") === "view")
        .select(
          col("user_id"),
          col("ts"),
          col("event_id").as("view_id"),
          col("value")
        )
      JoinOps
        .asofJoin(clicks, views, Seq("user_id"), "ts", Seq("view_id", "value"))
        .select(
          col("event_id"),
          col("user_id"),
          col("asof_view_id"),
          col("asof_value")
        )
        .sortSmall("event_id")
    }),
    "q_asof_salted" -> ((s, dir) => {
      // skew valve: same as-of semantics, window keyed by (user, 6h time
      // bucket) with carried boundary rows — a hot user fans out instead
      // of serializing one sorted task. Same oracle as q_asof_join: the
      // valve must be result-invariant (also golden-tested on a hot-key
      // corpus in JoinOpsSpec).
      val ev = pq(s, dir, "events")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev
        .filter(col("event_type") === "view")
        .select(
          col("user_id"),
          col("ts"),
          col("event_id").as("view_id"),
          col("value")
        )
      JoinOps
        .asofJoinSalted(
          clicks, views, Seq("user_id"), "ts",
          Seq("view_id", "value"), bucketSecs = 21600L)
        .select(
          col("event_id"),
          col("user_id"),
          col("asof_view_id"),
          col("asof_value")
        )
        .sortSmall("event_id")
    }),
    "q_range_agg" -> ((s, dir) => {
      // RANGE-join aggregate via a keyed RANGE window over the unioned
      // timeline (one shuffle, no per-pair explosion): views by the same
      // user in the hour before each click, counted and summed in cents
      // (FLOOR(x*100+0.5) on both engines — IEEE-exact)
      val ev = pq(s, dir, "events")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = ev
        .filter(col("event_type") === "view")
        .select(
          col("user_id"),
          col("ts"),
          floor(col("value") * 100 + 0.5).cast(LongType).as("cents")
        )
      JoinOps
        .rangeJoinAgg(clicks, views, Seq("user_id"), "ts", "cents", lookbackSecs = 3600L)
        .select(col("event_id"), col("user_id"), col("range_count"), col("range_sum"))
        .sortSmall("event_id")
    }),
    "q_vocab" -> ((s, dir) => {
      // vocabulary construction: corpus token frequencies with a
      // min-count floor — one explode + one map-side-combining groupBy
      // (the canonical wordcount shape; partial aggregation bounds the
      // shuffle by the VOCABULARY size, not the corpus size)
      val d = pq(s, dir, "documents")
      d.select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 10)
        .sortSmall("tok")
    }),
    "q_pack_sequences" -> ((s, dir) => {
      // contiguous sequence packing over the documents corpus: 512-token
      // windows in doc_id order. The two-pass parallel prefix sum is
      // FORCED through 8 range partitions so the test proves the
      // distributed cumsum (per-partition windows + broadcast prefix
      // offsets), not a single-partition global window; the oracle
      // re-derives the same assignment with one global window cumsum.
      val d = pq(s, dir, "documents")
        .select(
          col("doc_id"),
          TextOps.tokenCount(col("text")).cast(LongType).as("toks")
        )
      SampleOps
        .packSequences(d, "doc_id", "toks", seqLen = 512L, numPartitions = 8)
        .select(
          col("id").as("doc_id"),
          col("toks"),
          col("seq_id"),
          col("tok_offset")
        )
        .sortSmall("doc_id")
    }),
    "q_version_diff" -> ((s, dir) => {
      // CDC back OUT of the lake table: build a 2-version snapshot table
      // from deterministic orders slices (v1 = keys with pk%3!=0; v2 adds
      // upserts pk%5==0 at a newer HLC and deletes pk%7==0 at the newest),
      // then read changesBetween(v1, v2). The oracle re-derives every
      // insert/update/delete row straight from the same slices — the
      // engine's manifest-diff + HLC classification must agree exactly.
      import graft.table.SnapshotTable
      val base = java.nio.file.Files.createTempDirectory("graft-vdiff").toString
      val t = new SnapshotTable(s, s"$base/table", numBuckets = 8)
      val orders = pq(s, dir, "orders")
        .select(
          col("o_orderkey").cast(LongType).as("pk"),
          col("o_totalprice").cast("double").as("price")
        )
      def stamp(df: DataFrame, nanos: Long, deleted: Boolean): DataFrame = df
        .withColumn(SnapshotTable.NANOS, lit(nanos))
        .withColumn(SnapshotTable.LOGICAL, lit(0))
        .withColumn(SnapshotTable.DELETED, lit(deleted))
      t.merge(
        stamp(orders.filter(col("pk") % 3 =!= 0), 1L, deleted = false),
        Seq("pk"), idempotenceKey = "v1", resolved = graft.model.Hlc(1, 0))
      val ups = stamp(
        orders.filter(col("pk") % 5 === 0).withColumn("price", col("price") + 1000),
        2L, deleted = false)
      val dels = stamp(
        orders
          .filter(col("pk") % 7 === 0)
          .withColumn("price", lit(null).cast("double")),
        3L, deleted = true)
      t.merge(
        ups.unionByName(dels),
        Seq("pk"), idempotenceKey = "v2", resolved = graft.model.Hlc(3, 0))
      val out = t
        .changesBetween(1L, 2L)
        .select(col("pk"), col("price"), col("change_type"))
        .sortSmall("pk")
        .localCheckpoint(true)
      graft.util.Dirs.deleteRecursively(java.nio.file.Paths.get(base))
      out
    }),
    "q_media_decode" -> ((s, dir) => {
      // REAL decode end-to-end, oracled: realMediaBlobs encodes actual
      // PNG/WAV bytes executor-side whose decoded features are pure id
      // arithmetic — DuckDB re-derives width/height/channels/mean level
      // from id math without decoding anything, so a hash match proves the
      // pure-JDK codec path genuinely decodes (it cannot echo the
      // formulas: they never reach the executor, only the encoded bytes do)
      val ids = pq(s, dir, "documents")
        .select(col("doc_id"))
        .filter(col("doc_id") < 200)
      val blobs = MultiModalOps.realMediaBlobs(s, ids, "doc_id")
      MultiModalOps
        .extractFeatures(s, blobs, MultiModalOps.JdkCodec)
        .toDF()
        .select(
          col("media_id"),
          col("mime"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("channels").cast(LongType).as("channels"),
          col("mean_luma")
        )
        .sortSmall("media_id")
    }),
    "q_replay_e2e" -> ((s, dir) => {
      // whole-engine smoke inside the harness: generate a small changefeed,
      // run the staged replay loop, return the final per-repo state
      import graft.feed.Generator
      import graft.loop.ReplayLoop
      import graft.stage.StagedStore
      import graft.table.SnapshotTable
      val base = java.nio.file.Files
        .createTempDirectory("graft-entry-replay")
        .toString
      val fs = Generator.FeedSpec(
        seed = 42L,
        numEvents = 2000L,
        numKeys = 400L,
        numRepos = 7,
        resolvedWindows = 2,
        eventsPerFile = 500L,
        disorderBlock = 100L
      )
      Generator.writeFeed(s, fs, s"$base/feed", parallelism = 4)
      val table = new SnapshotTable(s, s"$base/table", numBuckets = 8, compactEvery = 3)
      val stage = new StagedStore(s, s"$base/stage", bucketNanos = fs.nanosStep * 500)
      val payload = StructType(
        Seq(
          StructField("repo", StringType),
          StructField("path", StringType),
          StructField("commit", StringType),
          StructField("lang", StringType),
          StructField("content", StringType)
        )
      )
      val loop = new ReplayLoop(
        s,
        s"$base/feed",
        table,
        stage,
        s"$base/checkpoint",
        TableSpec(payload, Seq("repo", "path")),
        saltBuckets = 8,
        maxFilesPerTrigger = 2
      )
      loop.runAvailableNow()
      // materialize the (7-row) result eagerly, then reclaim the whole
      // work tree — a lazily-returned plan would pin (and leak) the temp
      // feed/table/stage per invocation
      val out = table
        .read()
        .groupBy(col("repo"))
        .agg(
          count(lit(1)).as("n_paths"),
          expr("bit_xor(xxhash64(repo, path, sha2(content, 256)))").as("state_fp")
        )
        .sortSmall("repo")
        .localCheckpoint(true)
      graft.util.Dirs.deleteRecursively(java.nio.file.Paths.get(base))
      out
    }),
    "q_multitable_e2e" -> ((s, dir) => {
      // whole multi-table engine smoke: a deterministic webhook feed with
      // FK-ordered tables, LWW updates, a delete, and two resolved fences,
      // routed by topic and applied level-by-level; output = per-table
      // final counts + content fingerprints (constant => oracled golden)
      import graft.loop.{MultiTableLoop, TableTarget}
      import graft.stage.StagedStore
      import graft.table.SnapshotTable
      val base = java.nio.file.Files
        .createTempDirectory("graft-entry-mtl")
        .toString
      val feedDir = s"$base/feed"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(feedDir))
      def mut(topic: String, pk: Int, v: String, ts: Long): String =
        s"""{"after":{"pk":$pk,"v":"$v"},"key":[$pk],"topic":"$topic","updated":"$ts.0000000000"}"""
      def del(topic: String, pk: Int, ts: Long): String =
        s"""{"after":null,"key":[$pk],"topic":"$topic","updated":"$ts.0000000000"}"""
      val f1 = Seq(
        s"""{"payload":[${(1 to 8).map(i => mut("parent", i, s"p$i", 10 + i)).mkString(",")}],"length":8}""",
        s"""{"payload":[${(1 to 12).map(i => mut("child", i, s"c$i", 20 + i)).mkString(",")}],"length":12}""",
        s"""{"resolved":"40.0000000000"}"""
      )
      val f2 = Seq(
        // second fence: LWW updates, one parent delete, one late child
        s"""{"payload":[${mut("parent", 3, "p3b", 45)},${del("parent", 7, 46)},${mut("child", 5, "c5b", 47)},${mut("child", 2, "c2-late", 15)}],"length":4}""",
        s"""{"resolved":"60.0000000000"}"""
      )
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(feedDir, "0001.json"), f1.mkString("\n"))
      val p2 = java.nio.file.Paths.get(feedDir, "0002.json")
      java.nio.file.Files.writeString(p2, f2.mkString("\n"))
      // the file source orders by mtime: make delivery order deterministic
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(feedDir, "0001.json"),
        java.nio.file.attribute.FileTime.fromMillis(1000000L))
      java.nio.file.Files.setLastModifiedTime(
        p2, java.nio.file.attribute.FileTime.fromMillis(2000000L))

      val schema = StructType(
        Seq(StructField("pk", IntegerType), StructField("v", StringType))
      )
      def target(name: String) = TableTarget(
        TableSpec(schema, Seq("pk")),
        new SnapshotTable(s, s"$base/$name/table", numBuckets = 4, compactEvery = 2),
        new StagedStore(s, s"$base/$name/stage", bucketNanos = 100L)
      )
      val targets = Map("parent" -> target("parent"), "child" -> target("child"))
      val loop = new MultiTableLoop(
        s, feedDir, targets,
        dependsOn = Map("child" -> Set("parent")),
        checkpointDir = s"$base/checkpoint",
        saltBuckets = 4,
        maxFilesPerTrigger = 1
      )
      loop.runAvailableNow()
      // materialize the (2-row) result eagerly, then reclaim the work
      // tree (same leak pattern as q_replay_e2e / q_knn_ivf_indexed)
      val out = targets.toSeq
        .map { case (name, t) =>
          t.table
            .read()
            .agg(
              count(lit(1)).as("n_rows"),
              expr("bit_xor(xxhash64(pk, v))").as("state_fp")
            )
            .select(lit(name).as("tbl"), col("n_rows"), col("state_fp"))
        }
        .reduce(_.unionByName(_))
        .sortSmall("tbl")
        .localCheckpoint(true)
      graft.util.Dirs.deleteRecursively(java.nio.file.Paths.get(base))
      out
    })
  )

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(
    "q_lww_dedup" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type, epoch_us(ts) AS last_ts_us
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q_lww_salted" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type, epoch_us(ts) AS last_ts_us
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q_cdc_apply" ->
      """SELECT user_id, last_event_id, last_type, last_ts_us FROM (
        |  SELECT user_id, event_id AS last_event_id, event_type AS last_type, epoch_us(ts) AS last_ts_us
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |) WHERE last_type <> 'error' ORDER BY user_id""".stripMargin,
    "q_txn_times" ->
      "SELECT DISTINCT epoch_us(ts) AS ts_us FROM events ORDER BY ts_us",
    "q_fence_window" ->
      """SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events
        |WHERE ts > TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_cas_gate" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |cur AS (
        |  SELECT user_id, ts_us AS c_ts, event_id AS c_id FROM e WHERE event_id % 2 = 0
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) = 1
        |),
        |prop AS (SELECT user_id, ts_us AS p_ts, event_id AS p_id FROM e WHERE event_id % 2 = 1)
        |SELECT p.user_id AS user_id, COUNT(*) AS n_proposed,
        |       CAST(SUM(CASE WHEN c.user_id IS NULL OR (p.p_ts, p.p_id) > (c.c_ts, c.c_id) THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted
        |FROM prop p LEFT JOIN cur c ON p.user_id = c.user_id
        |GROUP BY p.user_id ORDER BY user_id""".stripMargin,
    "q_agg_lineitem" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_mktsegment" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q_distinct_count" ->
      """SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_md5, COUNT(*) AS copies, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text) ORDER BY content_md5""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |       CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_agg" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_query_apply" ->
      """SELECT user_id, last_event_id, last_type, val_cents FROM (
        |  SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS val_cents
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |) WHERE last_type <> 'error' ORDER BY user_id""".stripMargin,
    "q_minhash_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(text) < 5 THEN [text]
        |              ELSE list_distinct(list_transform(range(1, len(text)-5+2), i -> text[i:i+4]))
        |         END AS s
        |  FROM documents
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(FLOOR(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) * 1000 + 0.5) AS BIGINT) AS jacc_milli
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    // mirrors TextOps.redactPii/piiCount exactly: email first, then the
    // phone patterns IN ORDER, each replace/count running on the output of
    // the previous (every pattern is alternation-free, the class on which
    // Java's leftmost-first and RE2's leftmost-longest provably agree)
    "q_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0
        |           THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' || CAST(doc_id + 1000000 AS VARCHAR)
        |           ELSE text END AS t
        |  FROM documents
        |), r0 AS (
        |  SELECT doc_id, t,
        |         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c0,
        |         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s0
        |  FROM p
        |), r1 AS (
        |  SELECT doc_id, c0, len(regexp_extract_all(s0, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}')) AS c1,
        |         regexp_replace(s0, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}', '<PHONE>', 'g') AS s1
        |  FROM r0
        |), r2 AS (
        |  SELECT doc_id, c0, c1, len(regexp_extract_all(s1, '\+[0-9][0-9 ().-]{5,16}[0-9]')) AS c2,
        |         regexp_replace(s1, '\+[0-9][0-9 ().-]{5,16}[0-9]', '<PHONE>', 'g') AS s2
        |  FROM r1
        |), r3 AS (
        |  SELECT doc_id, c0, c1, c2, len(regexp_extract_all(s2, '\([0-9]{3}\) ?[0-9]{3}[-. ][0-9]{4}')) AS c3,
        |         regexp_replace(s2, '\([0-9]{3}\) ?[0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS s3
        |  FROM r2
        |), r4 AS (
        |  SELECT doc_id, c0, c1, c2, c3, len(regexp_extract_all(s3, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS c4,
        |         regexp_replace(s3, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g') AS s4
        |  FROM r3
        |)
        |SELECT doc_id,
        |       CAST(c0 + c1 + c2 + c3 + c4 AS BIGINT) AS n_pii,
        |       md5(s4) AS redacted_md5,
        |       CAST(length(s4) AS BIGINT) AS redacted_len
        |FROM r4 ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(text) < 13 THEN [text]
        |              ELSE list_distinct(list_transform(range(1, len(text)-13+2), i -> text[i:i+12]))
        |         END AS s
        |  FROM documents
        |),
        |ev AS (SELECT DISTINCT g FROM (SELECT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0)),
        |tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
        |SELECT DISTINCT doc_id FROM tr JOIN ev USING (g) ORDER BY doc_id""".stripMargin,
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::BIGINT) / 4294967296.0 <
        |      CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 WHEN 'zh' THEN 0.1 ELSE 0.0 END
        |ORDER BY doc_id""".stripMargin,
    "q_corpus_curate" ->
      s"""WITH RECURSIVE exactk AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
         |),
         |docs AS (SELECT d.* FROM documents d JOIN exactk e USING (doc_id)),
         |sh AS (
         |  SELECT doc_id,
         |         CASE WHEN len(text) < 5 THEN [text]
         |              ELSE list_distinct(list_transform(range(1, len(text)-5+2), i -> text[i:i+4]))
         |         END AS s
         |  FROM docs
         |),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) >= 0.5
         |),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT u AS id, u AS r FROM edges
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
         |),
         |dropids AS (
         |  SELECT id FROM (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
         |  WHERE id <> component
         |),
         |canon AS (SELECT * FROM docs WHERE doc_id NOT IN (SELECT id FROM dropids)),
         |${qualitySqlCtes("canon", ", lang, text")}
         |SELECT lang, COUNT(*) AS n_docs,
         |       CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0))) AS BIGINT) AS n_tokens
         |FROM qg
         |WHERE quality_micro >= 820000
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(text) < 5 THEN [text]
        |              ELSE list_distinct(list_transform(range(1, len(text)-5+2), i -> text[i:i+4]))
        |         END AS s
        |  FROM documents
        |),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) >= 0.5
        |),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT u AS id, u AS r FROM edges
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
        |)
        |SELECT id, MIN(r) AS component FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "q_split" ->
      """SELECT doc_id,
        |  CASE WHEN u < 0.75 THEN 'train' WHEN u < 0.875 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::BIGINT / 4294967296.0 AS u
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // verify-against-lake admission is a pure function of the texts:
    // corpus_dup = exact 5-gram Jaccard >= 0.7 vs any corpus doc;
    // batch_dup = >= 0.7 vs a smaller-id batch doc that itself survived
    // the corpus check (the operator's check order)
    "q_incremental_dedup" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(text) < 5 THEN [text]
        |              ELSE list_distinct(list_transform(range(1, len(text)-5+2), i -> text[i:i+4]))
        |         END AS s
        |  FROM documents
        |), j AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE b.doc_id >= 250
        |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) >= 0.7
        |), corpus_rej AS (
        |  SELECT DISTINCT id_b AS doc_id FROM j WHERE id_a < 250
        |), batch_rej AS (
        |  SELECT DISTINCT id_b AS doc_id FROM j
        |  WHERE id_a >= 250
        |    AND id_a NOT IN (SELECT doc_id FROM corpus_rej)
        |    AND id_b NOT IN (SELECT doc_id FROM corpus_rej)
        |)
        |SELECT d.doc_id,
        |       CASE WHEN d.doc_id IN (SELECT doc_id FROM corpus_rej) THEN 'corpus_dup'
        |            WHEN d.doc_id IN (SELECT doc_id FROM batch_rej) THEN 'batch_dup'
        |            ELSE 'accepted' END AS verdict
        |FROM documents d WHERE d.doc_id >= 250 ORDER BY d.doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(text) < 5 THEN [text]
        |              ELSE list_distinct(list_transform(range(1, len(text)-5+2), i -> text[i:i+4]))
        |         END AS s
        |  FROM documents WHERE doc_id < 200
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(FLOOR(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) * 1000 + 0.5) AS BIGINT) AS jacc_milli
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_langid_pred" -> {
      def lst(words: Seq[String]): String = lstSql(words)
      s"""WITH sc AS (
         |  SELECT doc_id, lang,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> len(t) > 0) AS toks,
         |         len(regexp_extract_all(text, '[{}();=<>\\[\\]]')) AS sym
         |  FROM documents
         |)
         |SELECT doc_id,
         |       CASE WHEN best.s > 0 THEN best.l ELSE 'unknown' END AS pred_lang,
         |       lang AS stored_lang
         |FROM (
         |  SELECT doc_id, lang, list_sort([
         |    {'s': CAST(len(list_intersect(toks, ${lst(TextOps.enStop)})) AS DOUBLE), 'l': 'en'},
         |    {'s': CAST(len(list_intersect(toks, ${lst(TextOps.deStop)})) AS DOUBLE), 'l': 'de'},
         |    {'s': CAST(len(list_intersect(toks, ${lst(TextOps.frStop)})) AS DOUBLE), 'l': 'fr'},
         |    {'s': CAST(len(list_intersect(toks, ${lst(TextOps.esStop)})) AS DOUBLE), 'l': 'es'},
         |    {'s': sym / 2, 'l': 'code'}
         |  ])[-1] AS best
         |  FROM sc
         |) ORDER BY doc_id""".stripMargin
    },
    "q_quality_score" ->
      s"""WITH ${qualitySqlCtes("documents", ", text")}
         |SELECT doc_id, quality_micro,
         |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish
         |FROM qg ORDER BY doc_id""".stripMargin,
    "q_knn_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5)
        |SELECT qid, id, rank FROM (
        |  SELECT q.qid, e.vec_id AS id,
        |         CAST(row_number() OVER (PARTITION BY q.qid ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id) AS BIGINT) AS rank
        |  FROM q CROSS JOIN e
        |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // full-probe IVF is exactly brute force: same oracle as q_knn_cosine
    "q_knn_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5)
        |SELECT qid, id, rank FROM (
        |  SELECT q.qid, e.vec_id AS id,
        |         CAST(row_number() OVER (PARTITION BY q.qid ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id) AS BIGINT) AS rank
        |  FROM q CROSS JOIN e
        |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // full-probe through the PERSISTED index is exactly brute force too
    "q_knn_ivf_indexed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5)
        |SELECT qid, id, rank FROM (
        |  SELECT q.qid, e.vec_id AS id,
        |         CAST(row_number() OVER (PARTITION BY q.qid ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id) AS BIGINT) AS rank
        |  FROM q CROSS JOIN e
        |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // repetition ratios re-derived on the same planted text: lines = trimmed
    // non-empty chr(10) splits; grams = space-joined word triples (1-based
    // list comprehension; range() is end-exclusive so short docs give [])
    "q_repetition" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0
        |           THEN text || chr(10) || text || chr(10) || 'repeated line' || chr(10) || 'repeated line'
        |           ELSE text END AS t
        |  FROM documents
        |), l AS (
        |  SELECT doc_id,
        |         list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)), x -> len(x) > 0) AS ls,
        |         list_filter(regexp_split_to_array(t, '\s+'), x -> len(x) > 0) AS ws
        |  FROM p
        |), g AS (
        |  SELECT doc_id, ls,
        |         [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)] AS gs
        |  FROM l
        |)
        |SELECT doc_id,
        |       CASE WHEN len(ls) < 2 THEN 0 ELSE CAST(FLOOR((1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)) * 1000000 + 0.5) AS BIGINT) END AS dup_line_micro,
        |       CASE WHEN len(gs) < 1 THEN 0 ELSE CAST(FLOOR((1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs)) * 1000000 + 0.5) AS BIGINT) END AS dup_gram3_micro
        |FROM g ORDER BY doc_id""".stripMargin,
    // raw-substring re-derivation of the hashed-gram pipeline: the shared
    // fraction is hash-invariant (64-bit collisions aside, the q_ngram
    // precedent); range() is end-exclusive so docs shorter than k give []
    "q_dup_spans" ->
      """WITH g AS (
        |  SELECT doc_id, unnest([substr(text, i, 50) for i in range(1, len(text) - 50 + 2)]) AS gr
        |  FROM documents WHERE len(text) >= 50
        |), st AS (
        |  SELECT gr, count(DISTINCT doc_id) AS nd FROM g GROUP BY gr
        |), p AS (
        |  SELECT g.doc_id,
        |         CAST(FLOOR(CAST(SUM(CASE WHEN st.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) AS BIGINT) AS m
        |  FROM g JOIN st USING (gr) GROUP BY g.doc_id
        |)
        |SELECT d.doc_id, COALESCE(p.m, 0) AS dup_span_micro
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // totals -> least(1, budget/total) fractions -> md5 membership -> counts;
    // every step is integer or IEEE-double arithmetic both engines share
    "q_mixture_plan" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS toks
        |  FROM documents
        |), tot AS (
        |  SELECT lang, SUM(toks) AS t FROM d GROUP BY lang
        |), fr AS (
        |  SELECT lang,
        |         CASE lang
        |           WHEN 'en' THEN least(1.0, 20000.0 / t)
        |           WHEN 'de' THEN least(1.0, 5000.0 / t)
        |           WHEN 'zh' THEN least(1.0, 1000.0 / t)
        |           ELSE NULL END AS f
        |  FROM tot
        |), s AS (
        |  SELECT d.lang, d.toks
        |  FROM d JOIN fr ON d.lang = fr.lang
        |  WHERE fr.f IS NOT NULL
        |    AND CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'graft'), 1, 8)) AS BIGINT) / 4294967296.0 < fr.f
        |)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "q_gopher_rules" ->
      """WITH w AS (
        |  SELECT doc_id, text AS t,
        |         list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS ws,
        |         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> len(x) > 0) AS ls
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, ws,
        |         CASE WHEN len(ws) < 1 THEN 0 ELSE CAST(FLOOR(CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / len(ws) * 1000000 + 0.5) AS BIGINT) END AS mean_wlen_micro,
        |         CAST(FLOOR(CAST((len(t) - len(replace(t, '#', ''))) + (len(t) - len(replace(t, '...', ''))) / 3 AS DOUBLE) / greatest(len(ws), 1) * 1000000 + 0.5) AS BIGINT) AS symbol_micro,
        |         CASE WHEN len(ls) < 1 THEN 0 ELSE CAST(FLOOR(CAST(len(list_filter(ls, x -> x LIKE '-%' OR x LIKE '*%' OR x LIKE '•%')) AS DOUBLE) / len(ls) * 1000000 + 0.5) AS BIGINT) END AS bullet_micro,
        |         CASE WHEN len(ls) < 2 THEN 0 ELSE CAST(FLOOR((1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)) * 1000000 + 0.5) AS BIGINT) END AS dup_line_micro
        |  FROM w
        |)
        |SELECT doc_id, mean_wlen_micro, symbol_micro, bullet_micro,
        |       CAST(CASE WHEN len(ws) BETWEEN 50 AND 100000
        |                  AND mean_wlen_micro BETWEEN 3000000 AND 10000000
        |                  AND symbol_micro <= 100000
        |                  AND bullet_micro <= 900000
        |                  AND dup_line_micro <= 300000
        |             THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_embed_near_dup" ->
      """WITH base AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), planted AS (
        |  SELECT vec_id + 100000 AS id,
        |         list_transform(CAST(embedding AS DOUBLE[]), (x, i) -> x + ((vec_id + (i - 1)) % 7 - 3) * 0.001) AS v
        |  FROM embeddings
        |), e AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.id AS id_a, b.id AS id_b
        |FROM e a JOIN e b ON a.id < b.id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin,
    // q_replay_e2e runs the WHOLE staged replay engine on a self-generated
    // deterministic feed (seed 42, fixed spec — sfDir-independent), so its
    // final state is a constant: the oracle pins the exact expected rows,
    // including the per-repo xxhash64 content fingerprints. Any drift in
    // parsing, staging, fencing, LWW, or merge semantics breaks the hash.
    "q_replay_e2e" ->
      """SELECT * FROM (VALUES
        |  ('repo-0', CAST(54 AS BIGINT), CAST(-6531421433498501817 AS BIGINT)),
        |  ('repo-1', CAST(52 AS BIGINT), CAST(-3716472392772398316 AS BIGINT)),
        |  ('repo-2', CAST(52 AS BIGINT), CAST(-7530155950403201470 AS BIGINT)),
        |  ('repo-3', CAST(49 AS BIGINT), CAST(2117660097189448270 AS BIGINT)),
        |  ('repo-4', CAST(54 AS BIGINT), CAST(7871592093500255080 AS BIGINT)),
        |  ('repo-5', CAST(47 AS BIGINT), CAST(8815659288587902798 AS BIGINT)),
        |  ('repo-6', CAST(49 AS BIGINT), CAST(-88058474467934700 AS BIGINT))
        |) AS t(repo, n_paths, state_fp) ORDER BY repo""".stripMargin,
    // q_multitable_e2e: deterministic multi-table webhook feed (inline,
    // sfDir-independent) => the per-table final state is a constant
    "q_multitable_e2e" ->
      """SELECT * FROM (VALUES
        |  ('child', CAST(12 AS BIGINT), CAST(-3758549560234503733 AS BIGINT)),
        |  ('parent', CAST(7 AS BIGINT), CAST(3852797442261014710 AS BIGINT))
        |) AS t(tbl, n_rows, state_fp) ORDER BY tbl""".stripMargin,
    "q_media_features" ->
      """SELECT doc_id AS media_id,
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |       CAST(128 AS BIGINT) AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_source_report" ->
      s"""WITH ${qualitySqlCtes("documents", ", source")},
        |w AS (
        |  SELECT doc_id, text AS t,
        |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws,
        |         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> len(x) > 0) AS ls
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, ws,
        |         CASE WHEN len(ws) < 1 THEN 0 ELSE CAST(FLOOR(CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / len(ws) * 1000000 + 0.5) AS BIGINT) END AS mean_wlen_micro,
        |         CAST(FLOOR(CAST((len(t) - len(replace(t, '#', ''))) + (len(t) - len(replace(t, '...', ''))) / 3 AS DOUBLE) / greatest(len(ws), 1) * 1000000 + 0.5) AS BIGINT) AS symbol_micro,
        |         CASE WHEN len(ls) < 1 THEN 0 ELSE CAST(FLOOR(CAST(len(list_filter(ls, x -> x LIKE '-%' OR x LIKE '*%' OR x LIKE '•%')) AS DOUBLE) / len(ls) * 1000000 + 0.5) AS BIGINT) END AS bullet_micro,
        |         CASE WHEN len(ls) < 2 THEN 0 ELSE CAST(FLOOR((1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)) * 1000000 + 0.5) AS BIGINT) END AS dup_line_micro
        |  FROM w
        |), gp AS (
        |  SELECT doc_id, len(ws) AS ntoks,
        |         CASE WHEN len(ws) BETWEEN 50 AND 100000
        |               AND mean_wlen_micro BETWEEN 3000000 AND 10000000
        |               AND symbol_micro <= 100000
        |               AND bullet_micro <= 900000
        |               AND dup_line_micro <= 300000 THEN 1 ELSE 0 END AS pass
        |  FROM m
        |)
        |SELECT qg.source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(gp.ntoks) AS BIGINT) AS total_toks,
        |       CAST(SUM(qg.quality_micro) AS BIGINT) // COUNT(*) AS mean_quality_micro,
        |       CAST(SUM(gp.pass) AS BIGINT) AS gopher_pass
        |FROM qg JOIN gp USING (doc_id)
        |GROUP BY qg.source ORDER BY qg.source""".stripMargin,
    "q_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id, len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n FROM documents
        |), c AS (
        |  SELECT doc_id, n,
        |         CASE WHEN n <= 0 THEN 0 WHEN n <= 120 THEN 1
        |              ELSE CAST(ceil((n - 120) / 90.0) AS INT) + 1 END AS n_chunks
        |  FROM t
        |), x AS (
        |  SELECT doc_id, n, n_chunks, unnest(range(0, n_chunks)) AS chunk_id
        |  FROM c WHERE n_chunks > 0
        |)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |       CAST(chunk_id * 90 AS BIGINT) AS tok_begin,
        |       CAST(LEAST(chunk_id * 90 + 120, n) AS BIGINT) AS tok_end,
        |       CAST(n_chunks AS BIGINT) AS n_chunks
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin,
    "q_chunk_text" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks FROM documents
        |), c AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |         CASE WHEN len(toks) <= 0 THEN 0 WHEN len(toks) <= 120 THEN 1
        |              ELSE CAST(ceil((len(toks) - 120) / 90.0) AS INT) + 1 END AS n_chunks
        |  FROM t
        |), x AS (
        |  SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id
        |  FROM c WHERE n_chunks > 0
        |)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |       CAST(chunk_id * 90 AS BIGINT) AS tok_begin,
        |       CAST(LEAST(chunk_id * 90 + 120, n) AS BIGINT) AS tok_end,
        |       array_to_string(list_slice(toks, chunk_id * 90 + 1, LEAST(chunk_id * 90 + 120, n)), ' ') AS chunk_text
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin,
    "q_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts, value,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM m
        |)
        |SELECT user_id, MIN(ts) AS sess_start,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM s GROUP BY user_id, sess ORDER BY user_id, sess_start""".stripMargin,
    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, r.event_id AS asof_view_id, r.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    // the salted valve is result-invariant, so it shares the unsalted
    // query's native-ASOF oracle verbatim
    "q_asof_salted" ->
      """SELECT l.event_id, l.user_id, r.event_id AS asof_view_id, r.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "q_range_agg" ->
      """SELECT l.event_id, l.user_id,
        |  CAST((SELECT COUNT(*) FROM events r
        |        WHERE r.event_type = 'view' AND r.user_id = l.user_id
        |          AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts) AS BIGINT) AS range_count,
        |  CAST((SELECT COALESCE(SUM(CAST(FLOOR(r.value * 100 + 0.5) AS BIGINT)), 0) FROM events r
        |        WHERE r.event_type = 'view' AND r.user_id = l.user_id
        |          AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts) AS BIGINT) AS range_sum
        |FROM events l WHERE l.event_type = 'click' ORDER BY l.event_id""".stripMargin,
    "q_vocab" ->
      """SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
        |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok FROM documents)
        |GROUP BY tok HAVING COUNT(*) >= 10 ORDER BY tok""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks,
        |         CAST(COALESCE(SUM(toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |  FROM t
        |)
        |SELECT doc_id, toks, cb // 512 AS seq_id, cb % 512 AS tok_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_version_diff" ->
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS pk, CAST(o_totalprice AS DOUBLE) AS price FROM orders
        |), v1 AS (
        |  SELECT pk, price FROM base WHERE pk % 3 <> 0
        |), up AS (
        |  SELECT pk, price + 1000 AS price FROM base WHERE pk % 5 = 0
        |), del AS (
        |  SELECT pk FROM base WHERE pk % 7 = 0
        |)
        |SELECT pk, price, change_type FROM (
        |  SELECT v1.pk AS pk, v1.price AS price, 'delete' AS change_type
        |  FROM v1 JOIN del ON v1.pk = del.pk
        |  UNION ALL
        |  SELECT u.pk AS pk, u.price AS price,
        |         CASE WHEN v1.pk IS NULL THEN 'insert' ELSE 'update' END AS change_type
        |  FROM up u LEFT JOIN v1 ON v1.pk = u.pk
        |  WHERE u.pk NOT IN (SELECT pk FROM del)
        |) ORDER BY pk""".stripMargin,
    "q_media_decode" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
        |       CASE WHEN doc_id % 2 = 0 THEN 8 + doc_id % 16 ELSE 800 + (doc_id % 5) * 160 END AS width,
        |       CASE WHEN doc_id % 2 = 0 THEN 8 + (doc_id // 16) % 16 ELSE 8000 END AS height,
        |       CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 + (doc_id // 2) % 2 END AS channels,
        |       CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS DOUBLE) ELSE CAST(doc_id % 16384 AS DOUBLE) / 32768 END AS mean_luma
        |FROM documents WHERE doc_id < 200 ORDER BY media_id""".stripMargin,
    // custom-hash-family queries (simhash / winnowing / hyperplane LSH):
    // DuckDB cannot recompute the hashes, but the corpus is deterministic at
    // the verification scale, so the outputs are constants — pinned exactly
    // (see PinnedOracles). Semantic goldens for the same operators live in
    // TrainingOpsSpec (recall/pigeonhole/brute-force-equivalence).
    "q_knn_lsh" -> PinnedOracles.knn_lsh,
    "q_token_bpe" -> PinnedOracles.token_bpe,
    "q_simhash_pairs" -> PinnedOracles.simhash_pairs,
    "q_winnow_pairs" -> PinnedOracles.winnow_pairs,
    "q_winnow_fp" -> PinnedOracles.winnow_fp
  )
}
