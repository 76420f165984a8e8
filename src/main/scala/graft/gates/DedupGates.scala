package graft.gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.model._
import graft.functions.{DomainFunctions, TypedAttrs, TextFunctions, VectorFunctions}
import graft.operators._
import graft.GateTables
import graft.SparkEntry._

/** Dedup gate registry — mechanically extracted from
  * SparkEntry (round-16 registry split, verdict Next #7); every entry
  * and oracle is verbatim. SparkEntry remains the single driver
  * contract: it concatenates the family maps. */
// scalastyle:off
private[graft] object DedupGates {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- duplicate-check routing (PutMongoWithDuplicateCheck.java:117-167)
    "duplicate_check" -> ((s, dir) => {
      val incoming = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"))
      val existing = t(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("l_orderkey"))
      DuplicateCheck.route(incoming, existing, Seq("l_orderkey"), "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // ---- dedup: exact (hash-groupBy on normalized text)
    "dedup_exact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.exact(d, "text", "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source")
    }),
    // ---- prefix-containment dedup: planted 12-token truncations
    //      (doc_id ≡5 mod 37, id+3e6) must pair with their originals;
    //      NATURAL first-8-token collisions are in-scope too — the
    //      oracle replays the full contract (strict prefix, dup ≥ 8
    //      tokens) via a hash join on the same prefix key
    "prefix_dedup_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 2000)
        .select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") % 37 === 5)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          array_join(slice(TextFunctions.tokens(col("text")), 1, 12), " ")
            .as("text"))
      Dedup.prefixDupPairs(d.unionByName(planted), "text", "doc_id", k = 8)
        .orderBy("dup_id", "of_id")
    }),
    // ---- the suffix mirror: planted 12-token TAIL truncations
    //      (doc_id ≡11 mod 37, id+4e6) pair with their originals on the
    //      last-8-token key
    "suffix_dedup_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 2000)
        .select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") % 37 === 11)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          array_join(slice(TextFunctions.tokens(col("text")), -12, 12), " ")
            .as("text"))
      Dedup.suffixDupPairs(d.unionByName(planted), "text", "doc_id", k = 8)
        .orderBy("dup_id", "of_id")
    }),
    // ---- duplicated-substring mass: 40-char windows at stride 20
    //      over normalized text; a window counts when its content
    //      occurs in ≥2 distinct docs. Windows travel as xxhash64
    //      fingerprints Spark-side; the oracle compares the exact
    //      substr windows — equal modulo 64-bit collisions (~2⁻⁶⁵)
    "dup_window_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.duplicatedWindowStats(d, "doc_id", "text",
          window = 40, stride = 20)
        .orderBy("doc_id")
    }),
    // ---- URL-level exact dedup (the C4 dedup key): three raw
    //      spellings per canonical URL collapse to the min doc_id;
    //      canonicalization is pure string work the oracle replays with
    //      two regexes
    "url_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("url", expr(urlDedupUrlSql))
        .select(col("doc_id"), col("url"))
      DomainFunctions.dedupByUrl(d, "url", "doc_id")
        .select(col("doc_id"), col("canonical_url"))
        .orderBy("doc_id")
    }),
    // ---- EXACT set-similarity join (AllPairs/PPJoin prefix filter):
    //      every pair with distinct-3-gram Jaccard ≥ 0.5, guaranteed
    //      recall — candidates from the rarest-first prefix inverted
    //      index + length filter, exact intersection verify; planted
    //      exact clones (J = 1) and 4/5-truncated copies (J ≈ 0.8)
    "setsim_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val clones = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val trunc = d.filter(col("doc_id") < 20)
        .withColumn("_ts", TextFunctions.tokens(col("text")))
        .select((col("doc_id") + 2000000L).as("doc_id"),
          array_join(slice(col("_ts"), lit(1),
            greatest(expr("(size(_ts) * 4) div 5"), lit(1)).cast("int")), " ")
            .as("text"))
      Dedup.setSimilarityJoinPairs(d.union(clones).union(trunc),
          "doc_id", "text", shingleSize = 3, thresholdPpm = 500000L)
        .orderBy("id_a", "id_b")
    }),
    // ---- homoglyph-evasion dedup: planted clones swap Latin for
    //      Cyrillic lookalikes and sprinkle zero-width spaces (byte
    //      fingerprints all miss them); the confusable skeleton maps
    //      them back, so exact-dedup pairing works unchanged —
    //      bytes_differ pins that each pair really crossed a byte
    //      difference. Pairs join on 8-byte skeleton fingerprints (the
    //      dedup_exact shuffle discipline), never on text
    "homoglyph_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val spoofed = d.filter(col("doc_id") < 30).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(translate(col("text"), "aeopcxy",
            "\u0430\u0435\u043E\u0440\u0441\u0445\u0443"),
          " ", " \u200B").as("text"))
      val all = d.union(spoofed)
      val sk = all.select(col("doc_id"),
        xxhash64(TextFunctions.confusableSkeleton(col("text"))).as("_fp"))
      val pairs = sk.select(col("_fp"), col("doc_id").as("id_a"))
        .join(sk.select(col("_fp"), col("doc_id").as("id_b")), Seq("_fp"))
        .filter(col("id_a") < col("id_b"))
      pairs
        .join(all.select(col("doc_id").as("id_a"), col("text").as("_ta")), Seq("id_a"))
        .join(all.select(col("doc_id").as("id_b"), col("text").as("_tb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (col("_ta") =!= col("_tb")).as("bytes_differ"))
        .orderBy("id_a", "id_b")
    }),
    // ---- fuzzy cross-corpus decontamination: MinHash near-dup flags
    //      against a probe corpus (docs ≡0 mod 41 donate themselves as
    //      probes — exact copies, threshold 1.0), fingerprint-verified
    //      so signature collisions stay out of the compared surface
    //      (the dedup_minhash_pairs convention)
    "neardup_decontam" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val probes = d.filter(col("doc_id") % 41 === 0).select(col("text"))
      val flags = Decontamination.nearDupFlags(d, "text", "doc_id",
        probes, "text", numHashes = 16, bands = 8, threshold = 1.0)
      val probeFp = d.filter(col("doc_id") % 41 === 0)
        .select(TextFunctions.fingerprintXx(col("text")).as("_fp")).distinct()
      val fps = d.select(col("doc_id"),
        TextFunctions.fingerprintXx(col("text")).as("_fp"))
      flags.join(fps, Seq("doc_id"))
        .join(probeFp, Seq("_fp"), "left_semi")
        .select(col("doc_id"), col("max_overlap"))
        .orderBy("doc_id")
    }),
    // ---- exact-substring removal (the Lee et al. windowed
    //      approximation): duplicated 10-token windows cut from all
    //      but the first (id, start) occurrence, overlaps merged by
    //      position coverage; the shared fragment plants cross-doc and
    //      within-doc duplicated phrases
    "dup_window_removal" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), expr(dupRemovalTextSql).as("_t"))
      Dedup.removeDuplicatedWindows(d, "doc_id", "_t", window = 10)
        .orderBy("doc_id")
    }),
    // ---- span-level decontamination: probe docs (≡0 mod 37) donate
    //      their lowercased 8-token windows; matching spans cut from
    //      every doc (the probes themselves empty out), punctuation
    //      kept so match positions align with the original tokens
    "probe_overlap_removal" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val probes = t(s, dir, "documents")
        .filter(col("doc_id") % 37 === 0).select(col("text"))
      Decontamination.removeProbeOverlaps(
          d, "doc_id", "text", probes, "text", window = 8)
        .orderBy("doc_id")
    }),
    // ---- within-doc duplicate-line removal: the gate doubles every
    //      doc (text\ntext — the corpus has no natural intra-doc dup
    //      lines) so the first-occurrence fold does real work; the
    //      oracle keeps lines whose first list_position equals their
    //      index — the same first-occurrence rule
    "dedup_lines_in_doc" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val doubled = concat(col("text"), lit("\n"), col("text"))
      d.select(
        col("doc_id"),
        TextFunctions.dedupLinesInDoc(doubled).as("clean")
      ).orderBy("doc_id")
    }),
    // ---- content-defined chunking: gear-rule boundaries from the FNV
    //      of each local token bigram (mod 16) — insertion-resilient
    //      chunks for chunk-level dedup, vs doc_chunks' fixed windows
    "cdc_chunks" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"))
      Packing.cdcChunks(d, "doc_id", "text", divisor = 16)
        .orderBy("doc_id", "chunk_idx")
    }),
    // ---- CDC's payoff in the compared surface: docs ≡9 mod 31 gain a
    //      3-token-prefixed VARIANT (id+5e6); chunk-level exact dedup
    //      over the gear chunks still finds most of each variant's
    //      token mass duplicated (fixed windows would find ~none after
    //      the shift). Per-doc duplicated-chunk accounting
    "pipeline_cdc_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"))
      val variants = d.filter(col("doc_id") % 31 === 9)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(lit("zz yy xx "), col("text")).as("text"))
      val chunks = Packing.cdcChunks(d.unionByName(variants), "doc_id", "text",
        divisor = 16)
      val shared = chunks
        .groupBy(col("chunk_text"))
        .agg(countDistinct(col("doc_id")).as("_nd"))
        .filter(col("_nd") > 1)
        .select(col("chunk_text"))
      chunks.join(shared, Seq("chunk_text"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dup_chunks"),
          sum(col("n_tokens")).as("dup_tokens"))
        .orderBy("doc_id")
    }),
    // ---- dedup: edit-distance verification of candidate pairs (the
    //      exact post-LSH arbiter). Planted tail-modified copies score
    //      high, cross pairs low; the oracle recomputes the identical
    //      levenshtein ratio, so the threshold cut agrees exactly
    "edit_sim_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val modified = d.filter(col("doc_id") < 15)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" some extra tail words")).as("text"))
      val all = d.union(modified)
      val cands = d.filter(col("doc_id") < 15)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000L).as("id_b"))
        .union(d.filter(col("doc_id") < 15)
          .select(col("doc_id").as("id_a"),
            ((col("doc_id") + 1L) % 15 + 1000000L).as("id_b")))
      Dedup.editSimilarityPairs(cands, all, "text", "doc_id", threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),
    // ---- multimodal exact dedup: planted byte-identical copies
    //      (media_id ≡4 mod 17, id+1e6) collapse to their originals;
    //      the synthetic byte generator admits NO natural dups below
    //      id stride 64·251 = 16064, so group structure is closed-form
    //      and the oracle is analytic (the media_features convention)
    "media_dedup" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, 500)
      val copies = media.filter(col("media_id") % 17 === 4)
        .withColumn("media_id", col("media_id") + 1000000L)
      Multimodal.dedupExactBinary(media.unionByName(copies),
          "media_id", "content")
        .orderBy("media_id")
    }),
    // ---- dedup: MinHash+LSH candidate-recall gate. Exact duplicates are
    //      planted under shifted ids: identical normalized text ⇒ identical
    //      token stream ⇒ identical 16-hash signature ⇒ every LSH band
    //      collides, so the planted pairs are GUARANTEED candidates with
    //      est_jaccard = 1.0. The fingerprint-equality verify join filters
    //      any hash-dependent borderline pair, making the result exactly
    //      the exact-dup pair set — deterministic and oracle-able as a
    //      DuckDB self-join on normalized text. Near-dup (J<1) recall is
    //      covered by DedupSpec invariants.
    "dedup_minhash_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val all = d.union(planted)
      val pairs = Dedup.minHashDupPairs(all, "text", "doc_id",
        numHashes = 16, bands = 8, threshold = 1.0)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      pairs
        .join(fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
        .join(fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
        .filter(col("fp_a") === col("fp_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),
    // ---- dedup: SimHash candidate-recall gate (same planted-dup scheme:
    //      identical text ⇒ identical 64-bit signature ⇒ Hamming 0 and all
    //      four pigeonhole blocks collide; fp-verify keeps signature
    //      collisions between distinct texts out)
    "dedup_simhash_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val all = d.union(planted)
      val pairs = Dedup.simHashDupPairs(all, "text", "doc_id", maxHamming = 0)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      pairs
        .join(fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
        .join(fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
        .filter(col("fp_a") === col("fp_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),
    // ---- dedup: paragraph/span-level intra-corpus dedup (the C4/
    //      RefinedWeb step document-level dedup can't see). A planted
    //      boilerplate sentence heads every doc; only its global first
    //      occurrence survives, and whatever sentences the corpus
    //      naturally repeats dedup identically in both engines
    "paragraph_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("shared boilerplate notice. "), col("text")).as("text"))
      Dedup.paragraphDedup(d, "text", "doc_id", sep = ". ")
        .orderBy("doc_id")
    }),
    // ---- dedup: winnowing partial-overlap pairs. Planted exact dups ⇒
    //      identical normalized text ⇒ identical fingerprint sets ⇒
    //      guaranteed ≥1 shared fingerprint for docs with ≥ k normalized
    //      chars; fp-verify keeps chance 8-gram overlaps between distinct
    //      texts out, so the result is the exact-dup pair set over docs
    //      long enough to fingerprint
    "winnow_overlap" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val all = d.union(planted)
      // k=12: chance 12-char normalized overlaps between unrelated docs
      // are rare, keeping the (output-bound) pair space small; planted
      // identical docs still share their whole fingerprint set
      val pairs = Dedup.winnowOverlapPairs(all, "text", "doc_id",
        k = 12, w = 8, minShared = 1)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      pairs
        .join(fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
        .join(fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
        .filter(col("fp_a") === col("fp_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),
    // ---- winnowing containment fraction: identical normalized docs have
    //      identical fingerprint SETS, so shared = |fps_a| = |fps_b| and
    //      containment = shared / min(...) is exactly 1.0 — the oracle
    //      pins the fraction plumbing on the deterministic planted pairs
    "winnow_containment" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val all = d.union(planted)
      val pairs = Dedup.winnowOverlapPairs(all, "text", "doc_id",
        k = 12, w = 8, minShared = 1)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      pairs
        .join(fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
        .join(fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
        .filter(col("fp_a") === col("fp_b"))
        .select(col("id_a"), col("id_b"), col("containment"))
        .orderBy("id_a", "id_b")
    }),
    // ---- dedup: connected components over exact-dup pairs — transitive
    //      cluster labels (comp = min reachable id); planted dups give the
    //      deterministic pair set, the oracle is the per-group min id
    "dedup_components" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val all = d.union(planted)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      val pairs = fps.select(col("fp"), col("doc_id").as("id_a"))
        .join(fps.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(pairs)
        .orderBy("id")
    }),
    // ---- capacity planning on the same planted-clone graph: docs and
    //      chars that disappear if clusters collapse to their keeper
    "dedup_savings" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val all = d.union(planted)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      val pairs = fps.select(col("fp"), col("doc_id").as("id_a"))
        .join(fps.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      Dedup.savingsReport(Dedup.connectedComponents(pairs),
        all, "doc_id", length(col("text")).cast(LongType))
    }),
    // ---- soft dedup: near-dup clusters DOWN-WEIGHTED, not dropped —
    //      weight_e6 = 10⁶ div cluster_size, so every cluster totals
    //      ≈10⁶ gradient mass; same planted-copy input as
    //      dedup_components, singletons keep weight 10⁶
    "soft_dedup_weights" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val all = d.union(planted)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      val pairs = fps.select(col("fp"), col("doc_id").as("id_a"))
        .join(fps.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      Dedup.softDedupWeights(all, pairs, "doc_id")
        .orderBy("doc_id")
    }),
    // ---- dedup health report: cluster-size histogram of the planted
    //      dup graph (docs <5 appear in triplicate, 5..19 in duplicate)
    "dup_cluster_sizes" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val c1 = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val c2 = d.filter(col("doc_id") < 5)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val all = d.union(c1).union(c2)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      val pairs = fps.select(col("fp"), col("doc_id").as("id_a"))
        .join(fps.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      Dedup.clusterSizeHistogram(pairs).orderBy("cluster_size")
    }),
    // ---- per-probe leakage report: probes are half-a-document plus a
    //      novel tail, so each probe's 3-gram leak fraction sits
    //      strictly between 0 and 1 — the graded "which eval items are
    //      compromised" surface
    "probe_leak_report" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 2000)
        .select(col("doc_id"), col("text"))
      val toks = TextFunctions.tokens(col("text"))
      val half = slice(toks, lit(1),
        greatest((size(toks) / 2).cast("int"), lit(1)))
      val probes = d.filter(col("doc_id") % 23 === 0)
        .select(col("doc_id").as("probe_id"),
          concat(array_join(half, " "), lit(" zzzq1 zzzq2 zzzq3")).as("ptext"))
      Decontamination.probeLeakReport(d, "text", probes,
          "probe_id", "ptext", n = 3)
        .orderBy("probe_id")
    }),
    // ---- dedup APPLY with a quality policy: planted copies carry two
    //      extra punctuation chars (same fingerprint after
    //      normalization, LONGER raw text), so the quality argmax keeps
    //      the planted copy over the original — min-id would not
    "dedup_keep_best" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit("!!")).as("text"))
      val all = d.union(planted)
      val fps = all.select(col("doc_id"),
        xxhash64(TextFunctions.normalizeForFingerprint(col("text"))).as("fp"))
      val pairs = fps.select(col("fp"), col("doc_id").as("id_a"))
        .join(fps.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      val comps = Dedup.connectedComponents(pairs)
      Dedup.keepClusterRepresentatives(
          all.withColumn("q", length(col("text"))), "doc_id", comps, "q")
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),
    // ---- composed batch-prep pipeline: outlier-length band filter →
    //      length-bucketed batching — the unpacked-loader prep chain,
    //      two round-8 operators composed as a user would compose them;
    //      the oracle concatenates their two proven chains
    // ---- composed C4-curation pipeline: line-level clean → page
    //      gate → exact-substring removal → token accounting. After
    //      the C4 pass, every ≡1 (mod 5) doc's clean text is the SAME
    //      appended line, so the removal stage does real cross-doc
    //      work on the pipeline's own output — the operators compose,
    //      not just coexist
    "pipeline_c4_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .withColumn("_t", expr(c4GateTextSql))
      val kept = TextFunctions.c4KeptLines(col("_t"), minWordsPerLine = 3)
      val cleaned = d
        .select(col("doc_id"), array_join(kept, "\n").as("_c"),
          TextFunctions.c4DocPass(col("_t"), kept, minKeptLines = 1).as("_p"))
        .filter(col("_p"))
        .select(col("doc_id"), col("_c"))
      Dedup.removeDuplicatedWindows(cleaned, "doc_id", "_c", window = 10)
        .select(col("doc_id"), col("clean"), col("n_removed"),
          TextFunctions.tokenCount(col("clean")).as("n_tokens"))
        .orderBy("doc_id")
    }),
    // ---- decontamination: flag docs sharing any word n-gram with a
    //      probe (benchmark) corpus — broadcast semi-join on shingle
    //      hashes; probes = the first 10 docs, so overlap is deterministic
    "decontamination" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val probes = d.filter(col("doc_id") < 10).select(col("text"))
      Decontamination.contaminationFlags(d, "text", "doc_id", probes, "text", n = 3)
        .select(col("doc_id"), col("contaminated"))
        .orderBy("doc_id")
    }),
    // ---- dedup: exact n-gram Jaccard pairs (inverted-index join)
    "ngram_jaccard_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
  )

  def oracles: Map[String, String] = Map(
    "duplicate_check" ->
      """SELECT l.l_orderkey, l.l_linenumber,
        | CASE WHEN e.ok IS NOT NULL OR l.rn > 1 THEN 'already-exists'
        |      ELSE 'success' END AS _route
        |FROM (
        | SELECT l_orderkey, l_linenumber,
        |        ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        | FROM lineitem
        |) l
        |LEFT JOIN (SELECT DISTINCT o_orderkey AS ok FROM orders WHERE o_orderkey % 3 = 0) e
        |  ON l.l_orderkey = e.ok
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "dedup_exact" ->
      """WITH norm AS (
        | SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), kept AS (
        | SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY nt ORDER BY doc_id) AS rn FROM norm
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM kept WHERE rn = 1 GROUP BY source ORDER BY source""".stripMargin,
    // the full prefix contract replayed: same planted truncations, a
    // hash join on the first-8-token key (the operator's bucket), the
    // same exact slice verify and strict length inequality
    "prefix_dedup_pairs" ->
      """WITH d AS (
        | SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |), pt AS (
        | SELECT doc_id + 3000000 AS doc_id,
        |  array_to_string(list_slice(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''), 1, 12), ' ') AS text
        | FROM d WHERE doc_id % 37 = 5
        |), al AS (
        | SELECT * FROM d UNION ALL SELECT * FROM pt
        |), tk AS (
        | SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        | FROM al
        |), keyed AS (
        | SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |  array_to_string(list_slice(toks, 1, 8), ' ') AS pfx
        | FROM tk WHERE len(toks) >= 8
        |)
        |SELECT a.doc_id AS dup_id, b.doc_id AS of_id,
        | a.n AS dup_tokens, b.n AS of_tokens
        |FROM keyed a JOIN keyed b
        |  ON a.pfx = b.pfx AND a.n < b.n
        | AND array_to_string(a.toks, ' ') = array_to_string(list_slice(b.toks, 1, CAST(a.n AS INT)), ' ')
        |ORDER BY dup_id, of_id""".stripMargin,
    // the suffix mirror: anchor and verify slices taken from the END
    "suffix_dedup_pairs" ->
      """WITH d AS (
        | SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |), pt AS (
        | SELECT doc_id + 4000000 AS doc_id,
        |  array_to_string(list_slice(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''),
        |    greatest(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) - 11, 1),
        |    len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))), ' ') AS text
        | FROM d WHERE doc_id % 37 = 11
        |), al AS (
        | SELECT * FROM d UNION ALL SELECT * FROM pt
        |), tk AS (
        | SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        | FROM al
        |), keyed AS (
        | SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |  array_to_string(list_slice(toks, len(toks) - 7, len(toks)), ' ') AS sfx
        | FROM tk WHERE len(toks) >= 8
        |)
        |SELECT a.doc_id AS dup_id, b.doc_id AS of_id,
        | a.n AS dup_tokens, b.n AS of_tokens
        |FROM keyed a JOIN keyed b
        |  ON a.sfx = b.sfx AND a.n < b.n
        | AND array_to_string(a.toks, ' ')
        |     = array_to_string(list_slice(b.toks, CAST(b.n - a.n + 1 AS INT), CAST(b.n AS INT)), ' ')
        |ORDER BY dup_id, of_id""".stripMargin,
    // exact substr windows over the shared dedup normalization; 1-based
    // positions 1, 21, 41… mirror the 0-based stride-20 filter; text at
    // or under 40 chars is one whole-text window (range over
    // greatest(len-38, 2) yields exactly [1] there, and the CASE keeps
    // the window the full text)
    "dup_window_stats" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), w AS (
        | SELECT doc_id,
        |  CASE WHEN length(nt) <= 40 THEN nt ELSE substr(nt, CAST(p AS INTEGER), 40) END AS win
        | FROM norm, UNNEST(range(1, greatest(length(nt) - 38, 2), 20)) AS t(p)
        |), pd AS (
        | SELECT doc_id, win, count(*) AS c FROM w GROUP BY 1, 2
        |), dup AS (
        | SELECT win FROM pd GROUP BY win HAVING count(*) > 1
        |), st AS (
        | SELECT pd.doc_id, sum(pd.c) AS nw,
        |  sum(CASE WHEN dup.win IS NOT NULL THEN pd.c ELSE 0 END) AS nd
        | FROM pd LEFT JOIN dup ON pd.win = dup.win GROUP BY 1
        |)
        |SELECT d.doc_id,
        | CAST(COALESCE(st.nw, 0) AS BIGINT) AS n_windows,
        | CAST(COALESCE(st.nd, 0) AS BIGINT) AS n_dup_windows,
        | CASE WHEN st.nw > 0 THEN CAST(st.nd AS DOUBLE) / CAST(st.nw AS DOUBLE) END AS dup_ratio
        |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // canonical = lowercased host (regex parse, trailing-dot strip) ||
    // path (scheme/userinfo/port/query/fragment dropped, trailing
    // slashes stripped); keeper = min doc_id per canonical
    "url_dedup" ->
      s"""WITH d AS (
         | SELECT doc_id, $urlDedupUrlSql AS url FROM documents
         |), c AS (
         | SELECT doc_id,
         |  regexp_replace(lower(regexp_extract(url,
         |    '^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/?#]*@)?([^/?#:]+)', 1)), '\\.$$', '')
         |  || regexp_replace(COALESCE(regexp_extract(url,
         |    '^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*(/[^?#]*)?', 1), ''), '/+$$', '')
         |  AS canonical_url
         | FROM d
         |)
         |SELECT min(doc_id) AS doc_id, canonical_url
         |FROM c GROUP BY canonical_url
         |ORDER BY doc_id""".stripMargin,
    // the prefix filter is recall-lossless, so the oracle IS the
    // quadratic join: distinct 3-gram sets (the shared shingle rule over
    // normalized text), pairwise intersections, cross-multiplied
    // threshold, floor-div ppm
    "setsim_pairs" ->
      s"""WITH $setsimChainSql
         |SELECT ida AS id_a, idb AS id_b,
         | CAST(pr.i * 1000000 // (pr.na + pr.nb - pr.i) AS BIGINT) AS jaccard_ppm
         |FROM pr
         |ORDER BY 1, 2""".stripMargin,
    // the skeleton maps every planted spoof BACK to its source text, so
    // the oracle needs no confusable table: pairs are exact-text matches
    // over originals ∪ clones, and bytes really differ exactly when the
    // pair mixes a spoofed and an unspoofed doc
    // the spoofed texts are CONSTRUCTED in SQL (same translate + the
    // zero-width-space insertion) and bytes_differ compares the ACTUAL
    // texts; skeleton equivalence is replayed as equality of the
    // un-spoofed normalization (strip U+200B, map the seven planted
    // confusables back) — faithful even when the corpus itself carries
    // natural exact-duplicate texts (the sf1 sweep's key-shifted copies
    // broke the old boundary-crossing bytes_differ model)
    "homoglyph_dedup" ->
      """WITH base AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
        |), all_docs AS (
        | SELECT doc_id, text FROM base
        | UNION ALL
        | SELECT doc_id + 1000000,
        |  replace(translate(text, 'aeopcxy', 'аеорсху'), ' ', ' ' || chr(8203))
        | FROM base WHERE doc_id < 30
        |), norm AS (
        | SELECT doc_id, text,
        |  translate(replace(text, chr(8203), ''), 'аеорсху', 'aeopcxy') AS sk
        | FROM all_docs
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | (a.text <> b.text) AS bytes_differ
        |FROM norm a JOIN norm b
        |  ON a.sk = b.sk AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    // planted exact-copy probes at threshold 1.0 + fp verification ⇒
    // flagged docs = docs whose normalized text equals a probe's, each
    // at full signature agreement (identical raw text ⇒ identical
    // shingle set ⇒ identical signature)
    "neardup_decontam" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), p AS (
        | SELECT DISTINCT nt FROM norm WHERE doc_id % 41 = 0
        |)
        |SELECT n.doc_id, CAST(16 AS BIGINT) AS max_overlap
        |FROM norm n JOIN p ON n.nt = p.nt
        |ORDER BY doc_id""".stripMargin,
    // the removal replayed on window STRINGS (the operator's xxhash64
    // is equality-of-content modulo 64-bit collisions): keeper = rn 1
    // under (doc_id, start) per window, later occurrences become
    // [s, min(s+10, n)) cuts, coverage positions anti-join the token
    // positions, and the survivors re-join with single spaces
    "dup_window_removal" ->
      s"""WITH d AS (
         | SELECT doc_id, $dupRemovalTextSql AS t
         | FROM documents WHERE doc_id < 1000
         |), tk AS (
         | SELECT doc_id, list_filter(string_split_regex(trim(t), '\\s+'), x -> x <> '') AS toks
         | FROM d
         |), w AS (
         | SELECT doc_id, len(toks) AS n, CAST(p AS BIGINT) AS s,
         |  array_to_string(list_slice(toks, CAST(p + 1 AS BIGINT), CAST(p + 10 AS BIGINT)), ' ') AS win
         | FROM tk, UNNEST(range(0, greatest(len(toks) - 10, 0) + 1)) AS u(p)
         | WHERE len(toks) > 0
         |), r AS (
         | SELECT doc_id, n, s,
         |  row_number() OVER (PARTITION BY win ORDER BY doc_id, s) AS rn,
         |  count(*) OVER (PARTITION BY win) AS c
         | FROM w
         |), cuts AS (
         | SELECT doc_id, s, least(s + 10, n) AS e FROM r WHERE c > 1 AND rn > 1
         |), cov AS (
         | SELECT DISTINCT doc_id, CAST(q AS BIGINT) AS pos
         | FROM cuts, UNNEST(range(s, e)) AS v(q)
         |), tokpos AS (
         | SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
         |  unnest(toks) AS tok
         | FROM tk
         |), keptt AS (
         | SELECT tp.doc_id, tp.pos, tp.tok
         | FROM tokpos tp LEFT JOIN cov
         |   ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
         | WHERE cov.pos IS NULL
         |), agg AS (
         | SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean,
         |  count(*) AS kept
         | FROM keptt GROUP BY doc_id
         |)
         |SELECT tk.doc_id,
         | COALESCE(agg.clean, '') AS clean,
         | CAST(len(tk.toks) - COALESCE(agg.kept, 0) AS BIGINT) AS n_removed
         |FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id
         |ORDER BY tk.doc_id""".stripMargin,
    // probe windows on LOWERCASED tokens (punctuation kept — position
    // alignment), matches become cut spans, same coverage rebuild
    "probe_overlap_removal" ->
      """WITH d AS (
        | SELECT doc_id, text FROM documents WHERE doc_id < 1000
        |), tk AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks,
        |  list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS ltoks
        | FROM d
        |), pr AS (
        | SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS lt
        | FROM documents WHERE doc_id % 37 = 0
        |), pw AS (
        | SELECT DISTINCT
        |  array_to_string(list_slice(lt, CAST(p + 1 AS BIGINT), CAST(p + 8 AS BIGINT)), ' ') AS win
        | FROM pr, UNNEST(range(0, greatest(len(lt) - 8, 0) + 1)) AS u(p)
        | WHERE len(lt) > 0
        |), w AS (
        | SELECT doc_id, len(ltoks) AS n, CAST(p AS BIGINT) AS s,
        |  array_to_string(list_slice(ltoks, CAST(p + 1 AS BIGINT), CAST(p + 8 AS BIGINT)), ' ') AS win
        | FROM tk, UNNEST(range(0, greatest(len(ltoks) - 8, 0) + 1)) AS u(p)
        | WHERE len(ltoks) > 0
        |), cuts AS (
        | SELECT doc_id, s, least(s + 8, n) AS e FROM w JOIN pw USING (win)
        |), cov AS (
        | SELECT DISTINCT doc_id, CAST(q AS BIGINT) AS pos
        | FROM cuts, UNNEST(range(s, e)) AS v(q)
        |), tokpos AS (
        | SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
        |  unnest(toks) AS tok
        | FROM tk
        |), keptt AS (
        | SELECT tp.doc_id, tp.pos, tp.tok
        | FROM tokpos tp LEFT JOIN cov
        |   ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
        | WHERE cov.pos IS NULL
        |), agg AS (
        | SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean,
        |  count(*) AS kept
        | FROM keptt GROUP BY doc_id
        |)
        |SELECT tk.doc_id,
        | COALESCE(agg.clean, '') AS clean,
        | CAST(len(tk.toks) - COALESCE(agg.kept, 0) AS BIGINT) AS n_removed
        |FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id
        |ORDER BY tk.doc_id""".stripMargin,
    // keep lines whose FIRST occurrence index equals their own index
    // (list_position returns the first 1-based match; the lambda index
    // is 1-based) — the same first-occurrence-in-order rule as the
    // operator's fold
    "dedup_lines_in_doc" ->
      """WITH d AS (
        | SELECT doc_id, string_split(text || chr(10) || text, chr(10)) AS l
        | FROM documents
        |)
        |SELECT doc_id,
        | array_to_string(list_filter(l, (x, i) -> list_position(l, x) = i), chr(10)) AS clean
        |FROM d ORDER BY doc_id""".stripMargin,
    // the two proven CTE chains concatenated: c4 line/page rules into
    // the window-removal replay (window STRINGS, hash-family-agnostic);
    // n_tokens of the rebuilt clean text = surviving token count by
    // construction (single-space re-join of nonempty tokens)
    "pipeline_c4_dedup" ->
      s"""WITH d AS (
         | SELECT doc_id, $c4GateTextSql AS t
         | FROM documents WHERE doc_id < 1000
         |), k AS (
         | SELECT doc_id, t,
         |  list_filter(string_split(t, chr(10)), x ->
         |    len(list_filter(string_split_regex(trim(x), '\\s+'), w -> w <> '')) >= 3
         |    AND regexp_matches(rtrim(x), '[.!?"]$$')) AS kept
         | FROM d
         |), c AS (
         | SELECT doc_id, COALESCE(array_to_string(kept, chr(10)), '') AS ct
         | FROM k
         | WHERE (NOT contains(lower(t), 'lorem ipsum'))
         |   AND (NOT contains(t, '{')) AND len(kept) >= 1
         |), tk AS (
         | SELECT doc_id, list_filter(string_split_regex(trim(ct), '\\s+'), x -> x <> '') AS toks
         | FROM c
         |), w AS (
         | SELECT doc_id, len(toks) AS n, CAST(p AS BIGINT) AS s,
         |  array_to_string(list_slice(toks, CAST(p + 1 AS BIGINT), CAST(p + 10 AS BIGINT)), ' ') AS win
         | FROM tk, UNNEST(range(0, greatest(len(toks) - 10, 0) + 1)) AS u(p)
         | WHERE len(toks) > 0
         |), r AS (
         | SELECT doc_id, n, s,
         |  row_number() OVER (PARTITION BY win ORDER BY doc_id, s) AS rn,
         |  count(*) OVER (PARTITION BY win) AS c
         | FROM w
         |), cuts AS (
         | SELECT doc_id, s, least(s + 10, n) AS e FROM r WHERE c > 1 AND rn > 1
         |), cov AS (
         | SELECT DISTINCT doc_id, CAST(q AS BIGINT) AS pos
         | FROM cuts, UNNEST(range(s, e)) AS v(q)
         |), tokpos AS (
         | SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
         |  unnest(toks) AS tok
         | FROM tk
         |), keptt AS (
         | SELECT tp.doc_id, tp.pos, tp.tok
         | FROM tokpos tp LEFT JOIN cov
         |   ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
         | WHERE cov.pos IS NULL
         |), agg AS (
         | SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean,
         |  count(*) AS kept
         | FROM keptt GROUP BY doc_id
         |)
         |SELECT tk.doc_id,
         | COALESCE(agg.clean, '') AS clean,
         | CAST(len(tk.toks) - COALESCE(agg.kept, 0) AS BIGINT) AS n_removed,
         | CAST(COALESCE(agg.kept, 0) AS BIGINT) AS n_tokens
         |FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id
         |ORDER BY tk.doc_id""".stripMargin,
    // planted exact duplicates: identical normalized text ⇒ guaranteed
    // LSH candidates + fp-verified ⇒ result = self-join on normalized text
    "dedup_minhash_pairs" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), all_docs AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, nt FROM norm
        | UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), nt FROM norm WHERE doc_id < 20
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM all_docs a JOIN all_docs b ON a.nt = b.nt AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash_pairs" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), all_docs AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, nt FROM norm
        | UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), nt FROM norm WHERE doc_id < 20
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM all_docs a JOIN all_docs b ON a.nt = b.nt AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    // first-occurrence-wins over normalized sentences; blank (normalize
    // to '') spans are structural and always kept
    "paragraph_dedup" ->
      """WITH d AS (
        | SELECT doc_id, 'shared boilerplate notice. ' || text AS text FROM documents
        |), p AS (
        | SELECT doc_id, generate_subscripts(string_split(text, '. '), 1) AS pos,
        |        unnest(string_split(text, '. ')) AS para
        | FROM d
        |), n AS (
        | SELECT doc_id, pos, para,
        |  trim(regexp_replace(regexp_replace(lower(para), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM p
        |), k AS (
        | SELECT doc_id, pos, para, nt,
        |  ROW_NUMBER() OVER (PARTITION BY nt ORDER BY doc_id, pos) AS rn
        | FROM n
        |)
        |SELECT d.doc_id AS doc_id, COALESCE(g.cleaned, '') AS cleaned
        |FROM d LEFT JOIN (
        | SELECT doc_id, string_agg(para, '. ' ORDER BY pos) AS cleaned
        | FROM k WHERE nt = '' OR rn = 1 GROUP BY doc_id
        |) g ON d.doc_id = g.doc_id
        |ORDER BY 1""".stripMargin,
    // same exact-dup self-join as the minhash gate, restricted to docs
    // with at least k=12 normalized chars (shorter docs have no k-grams,
    // hence no fingerprints to share)
    "winnow_overlap" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), all_docs AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, nt FROM norm
        | UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), nt FROM norm WHERE doc_id < 20
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM all_docs a JOIN all_docs b
        |  ON a.nt = b.nt AND a.doc_id < b.doc_id AND length(a.nt) >= 12
        |ORDER BY id_a, id_b""".stripMargin,
    // identical normalized text ⇒ identical winnow fingerprint sets ⇒
    // containment exactly 1.0 (shared = |fps| on both sides)
    "winnow_containment" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), all_docs AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, nt FROM norm
        | UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), nt FROM norm WHERE doc_id < 20
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(1.0 AS DOUBLE) AS containment
        |FROM all_docs a JOIN all_docs b
        |  ON a.nt = b.nt AND a.doc_id < b.doc_id AND length(a.nt) >= 12
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_components" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), all_docs AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, nt FROM norm
        | UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), nt FROM norm WHERE doc_id < 20
        |), g AS (
        | SELECT doc_id, min(doc_id) OVER (PARTITION BY nt) AS comp,
        |        count(*) OVER (PARTITION BY nt) AS n
        | FROM all_docs
        |)
        |SELECT doc_id AS id, comp FROM g WHERE n > 1 ORDER BY id""".stripMargin,
    // keeper = min id per normalized-content partition; non-keepers of
    // multi-doc partitions are the savings
    "dedup_savings" ->
      """WITH norm AS (
        | SELECT doc_id, length(text) AS b,
        |  trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), all_docs AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, b, nt FROM norm
        | UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), b, nt FROM norm WHERE doc_id < 20
        |), g AS (
        | SELECT doc_id, b, min(doc_id) OVER (PARTITION BY nt) AS comp,
        |        count(*) OVER (PARTITION BY nt) AS n
        | FROM all_docs
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(b) AS BIGINT) AS chars_total,
        | CAST(sum(CASE WHEN n > 1 AND doc_id <> comp THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        | CAST(sum(CASE WHEN n > 1 AND doc_id <> comp THEN b ELSE 0 END) AS BIGINT) AS chars_saved
        |FROM g""".stripMargin,
    // cluster sizes straight off the normalized-content partition
    // (count includes singletons); 10⁶ // n is the exact weight
    "soft_dedup_weights" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), all_docs AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, nt FROM norm
        | UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), nt FROM norm WHERE doc_id < 20
        |), g AS (
        | SELECT doc_id, count(*) OVER (PARTITION BY nt) AS n FROM all_docs
        |)
        |SELECT doc_id,
        | CAST(n AS BIGINT) AS cluster_size,
        | CAST(1000000 // n AS BIGINT) AS weight_e6
        |FROM g ORDER BY doc_id""".stripMargin,
    // planted multiplicities by normalized text: c>=2 groups are the
    // clusters; histogram of their sizes
    "dup_cluster_sizes" ->
      """WITH norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        | FROM documents
        |), all_docs AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id, nt FROM norm
        | UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), nt FROM norm WHERE doc_id < 20
        | UNION ALL SELECT CAST(doc_id + 2000000 AS BIGINT), nt FROM norm WHERE doc_id < 5
        |), g AS (
        | SELECT nt, count(*) AS c FROM all_docs GROUP BY nt HAVING count(*) >= 2
        |)
        |SELECT CAST(c AS BIGINT) AS cluster_size,
        | CAST(count(*) AS BIGINT) AS n_clusters,
        | CAST(c * count(*) AS BIGINT) AS n_docs
        |FROM g GROUP BY c ORDER BY cluster_size""".stripMargin,
    // probes replayed as half-doc + novel tail; 3-gram leak counts on
    // the window strings (whole-text shingle for <3-token inputs —
    // the shingles() short contract)
    "probe_leak_report" ->
      """WITH tk AS (
        | SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS ts
        | FROM documents WHERE doc_id < 2000
        |), p AS (
        | SELECT doc_id AS probe_id,
        |  list_filter(string_split_regex(
        |    trim(array_to_string(ts[1:greatest(len(ts) // 2, 1)], ' ') || ' zzzq1 zzzq2 zzzq3'),
        |    '\s+'), x -> x <> '') AS pts
        | FROM tk WHERE doc_id % 23 = 0
        |), pg AS (
        | SELECT probe_id, unnest(list_distinct(
        |   CASE WHEN len(pts) < 3 THEN [array_to_string(pts, ' ')]
        |        ELSE list_transform(range(1, len(pts) - 1), i -> array_to_string(pts[i:i+2], ' '))
        |   END)) AS g
        | FROM p
        |), cg AS (
        | SELECT DISTINCT unnest(
        |   CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
        |        ELSE list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' '))
        |   END) AS g
        | FROM tk
        |), j AS (
        | SELECT pg.probe_id, CASE WHEN cg.g IS NOT NULL THEN 1 ELSE 0 END AS hit
        | FROM pg LEFT JOIN cg ON pg.g = cg.g
        |)
        |SELECT probe_id, CAST(count(*) AS BIGINT) AS n_ngrams,
        | CAST(sum(hit) AS BIGINT) AS n_leaked,
        | CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS leak_ppm
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact-dup clusters = equal normalized text; the representative is
    // the (length DESC, id ASC) argmax, singletons pass through
    "dedup_keep_best" ->
      """WITH norm AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT CAST(doc_id + 1000000 AS BIGINT), text || '!!' FROM documents WHERE doc_id < 20
        |), g AS (
        | SELECT doc_id,
        |  count(*) OVER (PARTITION BY nt) AS n,
        |  ROW_NUMBER() OVER (PARTITION BY nt ORDER BY length(text) DESC, doc_id) AS rn
        | FROM (
        |  SELECT doc_id, text,
        |   trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS nt
        |  FROM norm
        | )
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM g WHERE n = 1 OR rn = 1
        |ORDER BY doc_id""".stripMargin,
    // the gear rule replayed per DISTINCT bigram (cdcChainSql), then
    // the per-chunk reassembly in token order
    "cdc_chunks" ->
      s"""WITH src AS (
         | SELECT doc_id, text FROM documents WHERE doc_id < 500
         |), ${cdcChainSql(16L)}
         |SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_idx,
         | string_agg(t, ' ' ORDER BY p) AS chunk_text,
         | CAST(count(*) AS BIGINT) AS n_tokens
         |FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk_idx""".stripMargin,
    // the same chain over corpus + shifted variants; chunk strings
    // shared by >1 doc mark their member tokens as duplicated mass
    "pipeline_cdc_dedup" ->
      s"""WITH src AS (
         | SELECT doc_id, text FROM documents WHERE doc_id < 500
         | UNION ALL
         | SELECT doc_id + 5000000, 'zz yy xx ' || text
         | FROM documents WHERE doc_id < 500 AND doc_id % 31 = 9
         |), ${cdcChainSql(16L)}, ch AS (
         | SELECT doc_id, chunk, string_agg(t, ' ' ORDER BY p) AS chunk_text,
         |  CAST(count(*) AS BIGINT) AS n_tokens
         | FROM c GROUP BY 1, 2
         |), shared AS (
         | SELECT chunk_text FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
         |)
         |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS dup_chunks,
         | CAST(sum(ch.n_tokens) AS BIGINT) AS dup_tokens
         |FROM ch JOIN shared s ON ch.chunk_text = s.chunk_text
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical levenshtein + length arithmetic in the written order;
    // the >= cut compares the same doubles on both engines
    "edit_sim_pairs" ->
      """WITH d AS (
        | SELECT doc_id, text FROM documents
        |), m AS (
        | SELECT doc_id + 1000000 AS doc_id, text || ' some extra tail words' AS text
        | FROM d WHERE doc_id < 15
        |), a AS (
        | SELECT * FROM d UNION ALL SELECT * FROM m
        |), c AS (
        | SELECT doc_id AS id_a, doc_id + 1000000 AS id_b FROM d WHERE doc_id < 15
        | UNION ALL
        | SELECT doc_id AS id_a, (doc_id + 1) % 15 + 1000000 AS id_b FROM d WHERE doc_id < 15
        |), s AS (
        | SELECT c.id_a, c.id_b,
        |  CASE WHEN GREATEST(length(ta.text), length(tb.text)) = 0 THEN 1.0
        |       ELSE 1.0 - CAST(levenshtein(ta.text, tb.text) AS DOUBLE)
        |            / CAST(GREATEST(length(ta.text), length(tb.text)) AS DOUBLE) END AS edit_sim
        | FROM c JOIN a ta ON c.id_a = ta.doc_id JOIN a tb ON c.id_b = tb.doc_id
        |)
        |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, edit_sim
        |FROM s WHERE edit_sim >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // closed-form group structure: originals ≡4 mod 17 pair with their
    // planted +1e6 copies (keeper = the original); everything else is
    // a singleton — the generator admits no natural dups under id 16064
    "media_dedup" ->
      """WITH ids AS (
        | SELECT CAST(range AS BIGINT) AS media_id, CAST(range AS BIGINT) AS orig
        | FROM range(500)
        | UNION ALL
        | SELECT CAST(range + 1000000 AS BIGINT), CAST(range AS BIGINT)
        | FROM range(500) WHERE range % 17 = 4
        |)
        |SELECT media_id,
        | CASE WHEN orig % 17 = 4 THEN orig ELSE media_id END AS keeper_id,
        | CAST(CASE WHEN orig % 17 = 4 THEN 2 ELSE 1 END AS BIGINT) AS group_size
        |FROM ids ORDER BY media_id""".stripMargin,
    "decontamination" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '') AS ts
        | FROM documents
        |), sh AS (
        | SELECT doc_id,
        |  CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' ')))
        |  END AS grams
        | FROM toks
        |), probe AS (
        | SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id < 10
        |), docg AS (
        | SELECT doc_id, unnest(grams) AS g FROM sh
        |), hits AS (
        | SELECT DISTINCT docg.doc_id FROM docg JOIN probe USING (g)
        |)
        |SELECT s.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        |FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "ngram_jaccard_pairs" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '') AS ts
        | FROM documents
        |), sh AS (
        | SELECT doc_id,
        |  CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' ')))
        |  END AS grams
        | FROM toks
        |), inv AS (
        | SELECT doc_id, grams, unnest(grams) AS g FROM sh
        |), pairs AS (
        | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.grams AS ga, b.grams AS gb
        | FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |)
        |SELECT id_a, id_b,
        | round(CAST(len(list_intersect(ga, gb)) AS DOUBLE) / CAST(len(list_distinct(list_concat(ga, gb))) AS DOUBLE), 4) AS jaccard
        |FROM pairs
        |WHERE CAST(len(list_intersect(ga, gb)) AS DOUBLE) / CAST(len(list_distinct(list_concat(ga, gb))) AS DOUBLE) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
