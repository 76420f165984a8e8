package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.model._
import graft.functions.{DomainFunctions, TypedAttrs, TextFunctions, VectorFunctions}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2 (or one
  * of the training-pipeline extensions) against the driver parquet tables;
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash compare.
  * Column names/types are aligned on both sides; doubles are only emitted
  * when both engines compute them with identical elementwise arithmetic;
  * order-sensitive aggregates go through DECIMAL (exact, order-independent).
  */
object SparkEntry {

  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive events reader. The driver has regenerated
    * events.parquet across rounds with different `ts` physical types:
    *   - TIMESTAMP(NANOS): Spark has no native type (SPARK-40819) — with
    *     `nanosAsLong` the column arrives as LongType; truncate to micros
    *     exactly (integer division — the ns epoch ~1.7e18 overflows double
    *     precision).
    *   - timestamp[us] (current): arrives as TimestampType or
    *     TimestampNTZType depending on isAdjustedToUTC / inferTimestampNTZ;
    *     use as-is, normalized to the session-UTC TimestampType.
    * DuckDB oracles read the same column as TIMESTAMP / TIMESTAMP_NS; both
    * engines agree at micro/milli granularity either way.
    */
  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unexpected parquet-read dtype $other (expected LongType/Timestamp/TimestampNTZ)")
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core analytics loop: multi-dimensional binning of the
    * events stream + the deferred count aggregation
    * (DataBinningProcessor.java:251-266 + implied sum).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = withGeo(events(spark, dir))
    Binning.binAndCount(
      ev,
      Seq(
        DateBinner("time", "ts", DateGranularity.DAY),
        LiteralBinner("type", "event_type"),
        NumericBinner("val", "value", 2),
        GeoTileBinner("geo", "lat", "lon", 3),
        MergedBinner("daytype", Seq("time", "type"))
      )
    )
  }

  /** Deterministic synthetic lat/lon for the geo binner (events has no geo
    * columns) — integer-derived doubles, reproducible bit-for-bit in SQL.
    */
  private[graft] def withGeo(ev: DataFrame): DataFrame =
    ev.withColumn("lat", (col("user_id") * 7 % 160).cast(DoubleType) - 80.0 + 0.5)
      .withColumn("lon", (col("event_id") * 13 % 360).cast(DoubleType) - 180.0 + 0.5)

  private[graft] val geoSqlLat = "(CAST((user_id * 7) % 160 AS DOUBLE) - 80.0 + 0.5)"
  private[graft] val geoSqlLon = "(CAST((event_id * 13) % 360 AS DOUBLE) - 180.0 + 0.5)"

  /** Slippy-tile SQL for one zoom level, mirroring Binning.geoTileId. */
  private[graft] def tileSql(z: Int): String = {
    val n = s"power(2.0, $z)"
    val latRad = s"($geoSqlLat * pi() / 180.0)"
    val x0 = s"floor(($geoSqlLon + 180.0) / 360.0 * $n)"
    val y0 = s"floor((1.0 - ln(tan($latRad) + 1.0 / cos($latRad)) / pi()) / 2.0 * $n)"
    val x = s"CAST(least(greatest($x0, 0.0), $n - 1) AS BIGINT)"
    val y = s"CAST(least(greatest($y0, 0.0), $n - 1) AS BIGINT)"
    s"'$z/' || CAST($x AS VARCHAR) || '/' || CAST($y AS VARCHAR)"
  }

  private[graft] val securityCfg = SecurityConfig(
    levelsToConvertTo = Seq("ALPHA", "BRAVO", "CHARLIE"),
    levelsCanReceive = Seq("ALPHA", "BRAVO", "CHARLIE"),
    abbreviatedLevelsCanReceive = Seq("A", "B", "C"),
    compartments = Seq("CMPA", "CMPB"),
    disseminationControls = Seq("DCA", "DCB"),
    releasabilities = Seq("XX", "YY"),
    delim = "_"
  )

  // ---- shared fixtures + literal-table formatters for the retrieval /
  //      scoring gates: the gate query computes the idf/weight table
  //      ONCE on the driver (exact integer counts, one JVM ln, 6dp
  //      quantize), registers the VALUES rows in GateTables, and the
  //      oracle builders below interpolate the identical rows — no
  //      engine-evaluated transcendental ever enters the hash compare.

  private[graft] def bm25GateQueries3(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (0L, "spark window merge"),
      (1L, "customer order batch stream"),
      (2L, "hash join table scan")).toDF("query_id", "qtext")
  }

  private[graft] def bm25GateQueries5(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (0L, "spark window merge"),
      (1L, "customer order batch stream"),
      (2L, "hash join table scan"),
      (3L, "stream state checkpoint"),
      (4L, "partition shuffle sort")).toDF("query_id", "qtext")
  }

  /** idf literal VALUES rows as scaled integers (idf × 10⁶, BIGINT) —
    * the exact-integer bm25 oracle arithmetic consumes these; no double
    * ever enters the compared surface.
    */
  private[graft] def idfValuesRows(idf: Seq[(String, java.math.BigDecimal)]): String =
    idf.map { case (t, v) =>
      s"(${GateTables.sqlStr(t)}, ${Retrieval.idfScaled6(v)})"
    }.mkString(",\n   ")

  /** A 6dp BigDecimal as its exact ×10⁶ scaled BIGINT literal — the
    * only form weights take in compared surfaces (no DECIMAL output
    * columns: the round-8 verdict isolated the driver's hash
    * divergence to DECIMAL-typed outputs alone).
    */
  private[graft] def e6(w: java.math.BigDecimal): Long =
    w.setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  private[graft] def dsirWeightRows(lits: IndexedSeq[java.math.BigDecimal]): String =
    lits.zipWithIndex.map { case (w, b) => s"($b, ${e6(w)})" }
      .mkString(",\n   ")

  private[graft] def lmWeightRows(wt: Seq[(Long, Long, java.math.BigDecimal)]): String =
    wt.map { case (a, b, w) => s"($a, $b, ${e6(w)})" }
      .mkString(",\n   ")

  /** Deterministic pseudo weight table for the quality_margin gate —
    * a Weyl sequence over the bucket index mapped into [−1, 1] at 3dp,
    * carried at the serving table's 6dp scale. Exercises the full
    * serving path with a weight per bucket (trained weights would be
    * mostly-zero under L2 on the tiny gate slice, leaving the join
    * surface untested); train→serve parity is spec-pinned instead.
    */
  private[graft] lazy val qmGateWeights: IndexedSeq[java.math.BigDecimal] =
    (0 until QualityModel.DefaultBuckets).map { b =>
      java.math.BigDecimal.valueOf(b * 2654435761L % 2001L - 1000L, 3)
        .setScale(6)
    }

  private[graft] val qmGateBias = new java.math.BigDecimal("0.250000")

  /** WordPiece-style gate vocabulary over the synthetic corpus's
    * lexicon: multi-char start pieces, `##`-marked multi-char
    * continuations, and all single letters in both positions (so every
    * ASCII word segments without UNK — the UNK codepoint fallback is
    * spec-pinned instead, since the gate corpus is pure lowercase
    * ASCII). Greedy longest-match makes e.g. "window" → wind + ##ow =
    * 2, "column" → co + ##l + ##umn = 3.
    */
  private[graft] val subwordGateVocab: Seq[String] = Seq(
    "scan", "wind", "sort", "str", "sp", "qu", "ba", "me", "fi", "gr",
    "ta", "co", "va", "key", "jo", "ha", "the", "ag", "or", "pa", "sl",
    "fa", "ve", "du", "ro", "da", "bi", "sm", "li", "wi",
    "##an", "##ow", "##der", "##ble", "##ery", "##oup", "##eam", "##ge",
    "##in", "##sh", "##ne", "##rt", "##ark", "##tch", "##ctor", "##umn",
    "##lue", "##lter", "##ter", "##all", "##ig", "##ata", "##ue",
    "##ine", "##dow", "##up") ++
    ('a' to 'z').map(_.toString) ++ ('a' to 'z').map("##" + _)

  /** The gate vocabulary as `(piece, cont)` VALUES rows — continuation
    * marker stripped into a boolean, the form the recursive oracle CTE
    * consumes.
    */
  private[graft] def subwordVocabRows: String = subwordGateVocab.map { p =>
    if (p.startsWith("##")) s"('${p.substring(2)}', true)"
    else s"('$p', false)"
  }.mkString(",\n   ")

  /** Deterministic synthetic URLs for the domain gates — the testdata
    * carries no URL column, so BOTH engines construct the identical
    * string from (doc_id, source) with this shared SQL fragment
    * (portable: CASE + `||` + CAST AS STRING). The six shapes exercise
    * scheme/schemeless, userinfo, port, query/fragment cut, deep
    * subdomains, a trailing-dot host, a multi-label public suffix
    * (co.uk, github.io), and a suffix-less single-label host.
    */
  private[graft] val domainGateUrlSql =
    """CASE CAST(doc_id % 6 AS INT)
      | WHEN 0 THEN 'https://www.' || source || '.com/page/' || CAST(doc_id AS STRING)
      | WHEN 1 THEN 'http://blog.' || source || '.co.uk/' || CAST(doc_id AS STRING) || '?q=1'
      | WHEN 2 THEN 'https://user:pw@' || source || '.org:8443/x#frag'
      | WHEN 3 THEN source || '.github.io/repo'
      | WHEN 4 THEN 'https://a.b.' || source || '.com.'
      | ELSE 'http://localhost:8080/health'
      |END""".stripMargin

  /** Plain public-suffix rules for the domain gates (most-labels rule
    * wins: `co.uk` beats `uk`, `github.io` beats `io`).
    */
  private[graft] val domainGateRules =
    Seq("com", "org", "co.uk", "uk", "io", "github.io")

  private[graft] val domainGateBlocklist =
    Seq("src3.com", "src7.co.uk", "src11.org")

  /** URL variants for the url_dedup gate: three raw spellings — scheme
    * + bare path, uppercase host + trailing slash, schemeless + port +
    * query + fragment — that all canonicalize to
    * `ex<id%5>.com/p/<id%50>`, so every group of ids sharing id%50
    * collapses to its minimum regardless of spelling.
    */
  private[graft] val urlDedupUrlSql =
    """CASE CAST(doc_id % 3 AS INT)
      | WHEN 0 THEN 'https://ex' || CAST(doc_id % 5 AS STRING) || '.com/p/' || CAST(doc_id % 50 AS STRING)
      | WHEN 1 THEN 'http://EX' || CAST(doc_id % 5 AS STRING) || '.COM/p/' || CAST(doc_id % 50 AS STRING) || '/'
      | ELSE 'ex' || CAST(doc_id % 5 AS STRING) || '.com:8080/p/' || CAST(doc_id % 50 AS STRING) || '?utm=x#f'
      |END""".stripMargin

  /** Synthetic multi-line doc for the c4_line_clean gate — the corpus
    * text is single-line, so BOTH engines append the same extra lines /
    * doc-level poison from (doc_id, text) with this shared fragment.
    * The five shapes exercise: a too-short line (< 3 words), a kept
    * terminal-punctuation line, the case-insensitive "lorem ipsum" doc
    * drop, a no-terminal-punctuation line, and the curly-brace doc
    * drop.
    */
  private[graft] val c4GateTextSql =
    """CASE CAST(doc_id % 5 AS INT)
      | WHEN 0 THEN text || chr(10) || 'Tiny.'
      | WHEN 1 THEN text || chr(10) || 'This appended line ends well.'
      | WHEN 2 THEN text || ' LoReM ipsum dolor'
      | WHEN 3 THEN text || chr(10) || 'no terminal punctuation here'
      | ELSE text || chr(10) || '{ "json": 1 }'
      |END""".stripMargin

  /** Synthetic duplicated substrings for the dup_window_removal gate:
    * docs ≡1 (mod 4) append one copy of a shared 12-token phrase, docs
    * ≡2 append it twice back-to-back — so the gate exercises cross-doc
    * cuts, WITHIN-doc cuts (the second copy), junction windows
    * (phrase-suffix + phrase-prefix strings shared by every ≡2 doc),
    * and coverage merging of overlapping duplicated windows.
    */
  private[graft] val dupRemovalTextSql = {
    val p = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    s"""CASE CAST(doc_id % 4 AS INT)
       | WHEN 1 THEN text || ' $p'
       | WHEN 2 THEN text || ' $p $p'
       | ELSE text
       |END""".stripMargin
  }

  /** The frozen BPE merge list for the encode gate — the corpus's own
    * top character pairs (bpe_pair_stats order) plus two second-round
    * merges built on them ("er"+... style), in rank order. Literal on
    * BOTH sides (the qm_diag_weights discipline), so the oracle folds
    * the identical replace chain.
    */
  private[graft] val bpeGateMerges: Seq[(String, String)] = Seq(
    "e" -> "r",   // er: the corpus's top pair
    "o" -> "r",   // or
    "i" -> "n",   // in
    "o" -> "w",   // ow
    "s" -> "t",   // st
    "er" -> "g",  // rank-4 merge consuming a rank-0 product ("merge")
    "st" -> "r",  // "stream"
    "a" -> "t")   // at

  /** The DuckDB replay of [[graft.functions.TextFunctions.bpeTokenCount]]'s
    * per-word merge chain: spell the word as space-joined characters,
    * fold the same ranked replaces. `w` is the surrounding lambda's
    * variable.
    */
  private[graft] val bpeEncodeChainSql: String =
    bpeGateMerges.foldLeft(
      "list_aggregate(string_split(w, ''), 'string_agg', ' ')") {
      case (s, (a, b)) => s"replace($s, '$a $b', '$a$b')"
    }

  /** The UniMax waterfill CTE chain shared by the unimax_budget /
    * unimax_mix oracles: per-doc weighted token counts (`nt`), group
    * totals (`g`), the half-corpus budget (`tot`), the (n asc, source
    * asc) visit order (`ordered`), and the sequential allocation as a
    * recursive CTE (`alloc`) — min(n·2, remaining // groups_left) in
    * BIGINT floor division, the operator's exact rule.
    */
  /** The DuckDB replay of the PQ chain shared by the `pq_encode` /
    * `ann_topk_pq` oracles: e6-floored embeddings (`e`), 4 subspaces of
    * 16 dims (`sub`), seed slices from vec_id < 4 (`sd`), one exact
    * k-means step per subspace (`pd`→`pw`→`pasg`→`pex`→`ps`), integer
    * codebooks by trunc-div means (`pcb`), and the encode argmin
    * against the trained codebooks (`ed`→`ew`→`pcodes`) — every value
    * exact BIGINT, (dist, cid) tie-breaks matching the Spark kernel.
    */
  private[graft] def pqChainSqlTrainWhere(trainWhere: String): String =
    s"""e AS (
      | SELECT vec_id,
      |  list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS a
      | FROM embeddings
      |), js AS (
      | SELECT unnest(generate_series(0, 3)) AS j
      |), sub AS (
      | SELECT e.vec_id, js.j, list_slice(e.a, js.j*16 + 1, js.j*16 + 16) AS sv
      | FROM e, js
      |), sd AS (
      | SELECT j, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < 4
      |), pd AS (
      | SELECT s.vec_id, s.j, sd.cid,
      |  list_sum(list_transform(range(1, 17),
      |    i -> (s.sv[i] - sd.cv[i]) * (s.sv[i] - sd.cv[i]))) AS dist
      | FROM sub s JOIN sd ON sd.j = s.j
      | WHERE $trainWhere
      |), pw AS (
      | SELECT vec_id, j, cid,
      |  row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
      | FROM pd
      |), pasg AS (
      | SELECT s.vec_id, s.j, pw.cid, s.sv
      | FROM pw JOIN sub s ON s.vec_id = pw.vec_id AND s.j = pw.j
      | WHERE pw.rn = 1
      |), pex AS (
      | SELECT j, cid, CAST(generate_subscripts(sv, 1) - 1 AS INT) AS pos,
      |  unnest(sv) AS x
      | FROM pasg
      |), ps AS (
      | SELECT j, cid, pos, CAST(sum(x) AS BIGINT) AS se,
      |  CAST(count(*) AS BIGINT) AS n
      | FROM pex GROUP BY 1, 2, 3
      |), pcb AS (
      | SELECT j, cid, list(CAST(se // n AS BIGINT) ORDER BY pos) AS cv
      | FROM ps GROUP BY 1, 2
      |), ed AS (
      | SELECT s.vec_id, s.j, pcb.cid,
      |  list_sum(list_transform(range(1, 17),
      |    i -> (s.sv[i] - pcb.cv[i]) * (s.sv[i] - pcb.cv[i]))) AS dist
      | FROM sub s JOIN pcb ON pcb.j = s.j
      |), ew AS (
      | SELECT vec_id, j, cid,
      |  row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
      | FROM ed
      |), pcodes AS (
      | SELECT vec_id, j, cid FROM ew WHERE rn = 1
      |)""".stripMargin

  private[graft] val pqChainSql: String = pqChainSqlTrainWhere("TRUE")

  /** IVF-PQ extension of [[pqChainSql]]: coarse cells = the raw e6
    * seeds (`cc`), full-dim coarse distances (`cd`), corpus cell
    * assignment (`casg`), per-query probe set of depth `nprobe`
    * (`qp`), per-query subspace LUT distances (`lut2`), and the
    * probed-cells-only ADC score (`sc`) — the SQL replay of
    * [[graft.operators.Similarity.buildIvfPqIndex]] +
    * [[graft.operators.Similarity.ivfPqTopKE6]], every value BIGINT
    * with (dist, id) ties.
    */
  private[graft] def ivfPqChainSql(nprobe: Int, trainWhere: String = "TRUE"): String =
    pqChainSqlTrainWhere(trainWhere) + "," + s"""
      | cc AS (
      | SELECT vec_id AS ccid, a AS ccv FROM e WHERE vec_id < 4
      |), cd AS (
      | SELECT e.vec_id, cc.ccid,
      |  list_sum(list_transform(range(1, 65),
      |    i -> (e.a[i] - cc.ccv[i]) * (e.a[i] - cc.ccv[i]))) AS dist
      | FROM e, cc
      |), casg AS (
      | SELECT vec_id, ccid FROM (
      |  SELECT vec_id, ccid,
      |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, ccid) AS rn
      |  FROM cd) WHERE rn = 1
      |), qp AS (
      | SELECT vec_id AS qid, ccid FROM (
      |  SELECT vec_id, ccid,
      |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, ccid) AS rn
      |  FROM cd WHERE vec_id < 3) WHERE rn <= $nprobe
      |), qs2 AS (
      | SELECT vec_id AS qid, j, sv FROM sub WHERE vec_id < 3
      |), lut2 AS (
      | SELECT qs2.qid, qs2.j, pcb.cid,
      |  list_sum(list_transform(range(1, 17),
      |    i -> (qs2.sv[i] - pcb.cv[i]) * (qs2.sv[i] - pcb.cv[i]))) AS dd
      | FROM qs2 JOIN pcb ON pcb.j = qs2.j
      |), sc AS (
      | SELECT l.qid, c.vec_id AS nid, CAST(sum(l.dd) AS BIGINT) AS adist
      | FROM pcodes c
      | JOIN casg ON casg.vec_id = c.vec_id
      | JOIN lut2 l ON l.j = c.j AND l.cid = c.cid
      | JOIN qp ON qp.qid = l.qid AND qp.ccid = casg.ccid
      | WHERE c.vec_id <> l.qid
      | GROUP BY 1, 2
      |)""".stripMargin

  /** Residual (IVFADC) IVF-PQ chain appended to [[ivfPqChainSql]]'s
    * CTEs (reuses e/js/cc/cd/casg/qp): residuals against the assigned
    * cell, residual-seed codebook training (seeds = residuals of
    * vec_ids 4..7), residual codes, and per-(query, probed-cell) LUT
    * scoring — `rsc` is the residual analogue of `sc`. `trainWhere`
    * restricts the rows the residual CODEBOOK SUMS see (the streaming
    * gate's frozen batch-0 artifacts); encode and probe still cover
    * everything.
    */
  private[graft] def ivfPqResidualChainSql(trainWhere: String = "TRUE"): String =
    s"""rres AS (
      | SELECT e.vec_id, casg.ccid,
      |  list_transform(range(1, 65), i -> e.a[i] - cc2.ccv[i]) AS ra
      | FROM e JOIN casg ON casg.vec_id = e.vec_id
      | JOIN cc cc2 ON cc2.ccid = casg.ccid
      |), rsub AS (
      | SELECT r.vec_id, r.ccid, js.j,
      |  list_slice(r.ra, js.j*16 + 1, js.j*16 + 16) AS sv
      | FROM rres r, js
      |), rsd AS (
      | SELECT j, vec_id AS cid, sv AS cv FROM rsub WHERE vec_id IN (4, 5, 6, 7)
      |), rpd AS (
      | SELECT s.vec_id, s.j, rsd.cid,
      |  list_sum(list_transform(range(1, 17),
      |    i -> (s.sv[i] - rsd.cv[i]) * (s.sv[i] - rsd.cv[i]))) AS dist
      | FROM rsub s JOIN rsd ON rsd.j = s.j
      |), rpw AS (
      | SELECT vec_id, j, cid,
      |  row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
      | FROM rpd
      |), rpasg AS (
      | SELECT s.vec_id, s.j, rpw.cid, s.sv
      | FROM rpw JOIN rsub s ON s.vec_id = rpw.vec_id AND s.j = rpw.j
      | WHERE rpw.rn = 1
      |), rpex AS (
      | SELECT j, cid, CAST(generate_subscripts(sv, 1) - 1 AS INT) AS pos,
      |  unnest(sv) AS x
      | FROM rpasg WHERE $trainWhere
      |), rps AS (
      | SELECT j, cid, pos, CAST(sum(x) AS BIGINT) AS se,
      |  CAST(count(*) AS BIGINT) AS n
      | FROM rpex GROUP BY 1, 2, 3
      |), rpcb AS (
      | SELECT j, cid, list(CAST(se // n AS BIGINT) ORDER BY pos) AS cv
      | FROM rps GROUP BY 1, 2
      |), red AS (
      | SELECT s.vec_id, s.j, rpcb.cid,
      |  list_sum(list_transform(range(1, 17),
      |    i -> (s.sv[i] - rpcb.cv[i]) * (s.sv[i] - rpcb.cv[i]))) AS dist
      | FROM rsub s JOIN rpcb ON rpcb.j = s.j
      |), rew AS (
      | SELECT vec_id, j, cid,
      |  row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
      | FROM red
      |), rpcodes AS (
      | SELECT vec_id, j, cid FROM rew WHERE rn = 1
      |), rqres AS (
      | SELECT q.vec_id AS qid, qp.ccid,
      |  list_transform(range(1, 65), i -> q.a[i] - cc3.ccv[i]) AS qa
      | FROM e q JOIN qp ON qp.qid = q.vec_id
      | JOIN cc cc3 ON cc3.ccid = qp.ccid
      |), rqsub AS (
      | SELECT r.qid, r.ccid, js.j,
      |  list_slice(r.qa, js.j*16 + 1, js.j*16 + 16) AS sv
      | FROM rqres r, js
      |), rlut AS (
      | SELECT s.qid, s.ccid, s.j, rpcb.cid,
      |  list_sum(list_transform(range(1, 17),
      |    i -> (s.sv[i] - rpcb.cv[i]) * (s.sv[i] - rpcb.cv[i]))) AS dd
      | FROM rqsub s JOIN rpcb ON rpcb.j = s.j
      |), rsc AS (
      | SELECT l.qid, c.vec_id AS nid, CAST(sum(l.dd) AS BIGINT) AS adist
      | FROM rpcodes c
      | JOIN casg ON casg.vec_id = c.vec_id
      | JOIN rlut l ON l.j = c.j AND l.cid = c.cid AND l.ccid = casg.ccid
      | WHERE c.vec_id <> l.qid
      | GROUP BY 1, 2
      |)""".stripMargin

  /** [[pqChainSqlTrainWhere]] generalized for the retrain-epoch oracle:
    * the full PQ chain (subspace slices, seed rows, one exact k-means
    * step, trunc-div codebooks, encode argmin) over an ARBITRARY
    * e6-corpus CTE `(vec_id, a)`, with prefixed CTE names so the frozen
    * and retrained chains coexist in one query. `seedWhere` picks the
    * codebook seed rows, `trainWhere` (alias `s`) restricts the rows the
    * k-means assignment sees (the frozen stream trains on batch 0 only);
    * encoding always covers the whole corpus CTE. Requires the shared
    * `js` subspace CTE (m = 4 × 16 dims).
    */
  private[graft] def pqChainSqlOver(px: String, corpus: String, seedWhere: String,
      trainWhere: String): String =
    s"""${px}sub AS (
      | SELECT c.vec_id, js.j, list_slice(c.a, js.j*16 + 1, js.j*16 + 16) AS sv
      | FROM $corpus c, js
      |), ${px}sd AS (
      | SELECT j, vec_id AS cid, sv AS cv FROM ${px}sub WHERE $seedWhere
      |), ${px}pd AS (
      | SELECT s.vec_id, s.j, sd.cid,
      |  list_sum(list_transform(range(1, 17),
      |    i -> (s.sv[i] - sd.cv[i]) * (s.sv[i] - sd.cv[i]))) AS dist
      | FROM ${px}sub s JOIN ${px}sd sd ON sd.j = s.j
      | WHERE $trainWhere
      |), ${px}pw AS (
      | SELECT vec_id, j, cid,
      |  row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
      | FROM ${px}pd
      |), ${px}pasg AS (
      | SELECT s.vec_id, s.j, w.cid, s.sv
      | FROM ${px}pw w JOIN ${px}sub s ON s.vec_id = w.vec_id AND s.j = w.j
      | WHERE w.rn = 1
      |), ${px}pex AS (
      | SELECT j, cid, CAST(generate_subscripts(sv, 1) - 1 AS INT) AS pos,
      |  unnest(sv) AS x
      | FROM ${px}pasg
      |), ${px}ps AS (
      | SELECT j, cid, pos, CAST(sum(x) AS BIGINT) AS se,
      |  CAST(count(*) AS BIGINT) AS n
      | FROM ${px}pex GROUP BY 1, 2, 3
      |), ${px}pcb AS (
      | SELECT j, cid, list(CAST(se // n AS BIGINT) ORDER BY pos) AS cv
      | FROM ${px}ps GROUP BY 1, 2
      |), ${px}ed AS (
      | SELECT s.vec_id, s.j, b.cid,
      |  list_sum(list_transform(range(1, 17),
      |    i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i]))) AS dist
      | FROM ${px}sub s JOIN ${px}pcb b ON b.j = s.j
      |), ${px}ew AS (
      | SELECT vec_id, j, cid,
      |  row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
      | FROM ${px}ed
      |), ${px}codes AS (
      | SELECT vec_id, j, cid FROM ${px}ew WHERE rn = 1
      |)""".stripMargin

  /** The quadratic Kendall/Spearman definition in SQL — shared by the
    * `rank_correlation` and `rank_correlation_blocks` oracles (the
    * operator's seed-block size is invisible to the statistic).
    */
  private[graft] val rankCorrelationOracle: String =
    """WITH b AS (
      | SELECT source AS g, doc_id AS id, CAST(n_chars AS BIGINT) AS x,
      |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS BIGINT) AS y
      | FROM documents
      | WHERE doc_id < 2000 AND source IS NOT NULL
      |  AND n_chars IS NOT NULL AND text IS NOT NULL
      |), r AS (
      | SELECT g, id,
      |  CAST(row_number() OVER (PARTITION BY g ORDER BY x, id) AS BIGINT) AS rx,
      |  CAST(row_number() OVER (PARTITION BY g ORDER BY y, id) AS BIGINT) AS ry
      | FROM b
      |), st AS (
      | SELECT g, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
      | FROM r GROUP BY 1
      |), di AS (
      | SELECT a.g, CAST(count(*) AS BIGINT) AS nd
      | FROM r a JOIN r b2 ON a.g = b2.g AND a.rx < b2.rx AND a.ry > b2.ry
      | GROUP BY 1
      |)
      |SELECT st.g AS source, st.n, st.sum_d2,
      | CAST(coalesce(di.nd, 0) AS BIGINT) AS n_discordant,
      | CAST(((CAST(st.n AS HUGEINT) * (st.n * st.n - 1)
      |   - 6 * CAST(st.sum_d2 AS HUGEINT)) * 1000000)
      |   // (CAST(st.n AS HUGEINT) * (st.n * st.n - 1)) AS BIGINT) AS spearman_e6,
      | CAST(((CAST(st.n AS HUGEINT) * (st.n - 1)
      |   - 4 * CAST(coalesce(di.nd, 0) AS HUGEINT)) * 1000000)
      |   // (CAST(st.n AS HUGEINT) * (st.n - 1)) AS BIGINT) AS kendall_e6
      |FROM st LEFT JOIN di ON st.g = di.g
      |WHERE st.n >= 2 ORDER BY 1""".stripMargin

  private[graft] val unimaxAllocSql: String =
    """WITH RECURSIVE nt AS (
      | SELECT doc_id, source,
      |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))
      |    * (CAST(1 AS BIGINT) << (CAST(substr(source, 4) AS INT) % 5)) AS BIGINT) AS w
      | FROM documents
      |), g AS (
      | SELECT source, CAST(sum(w) AS BIGINT) AS n FROM nt GROUP BY 1
      |), tot AS (
      | SELECT greatest(CAST(sum(n) AS BIGINT) // 2, 1) AS B FROM g
      |), ordered AS (
      | SELECT source, n, row_number() OVER (ORDER BY n, source) AS i,
      |  count(*) OVER () AS L
      | FROM g
      |), alloc AS (
      | SELECT o.i, o.source, o.n, o.L,
      |  least(o.n * 2, t.B // o.L) AS b,
      |  t.B - least(o.n * 2, t.B // o.L) AS rem
      | FROM ordered o, tot t WHERE o.i = 1
      | UNION ALL
      | SELECT o.i, o.source, o.n, o.L,
      |  least(o.n * 2, a.rem // (o.L - a.i)),
      |  a.rem - least(o.n * 2, a.rem // (o.L - a.i))
      | FROM ordered o JOIN alloc a ON o.i = a.i + 1
      |)""".stripMargin

  /** The PageRank oracle with the iterations UNROLLED as CTE pairs
    * (c_i, r_i) — the MMR greedy-unroll precedent; every step is the
    * operator's exact integer arithmetic (floor division throughout).
    */
  /** The quadratic set-similarity pair chain (the recall-lossless
    * replay of [[graft.operators.Dedup.setSimilarityJoinPairs]] over
    * the planted setsim universe): CTEs through `pr(ida, idb, i, na,
    * nb)`, threshold-filtered at 0.5 — shared by the pair gate and the
    * entity-resolution pipeline gate.
    */
  private[graft] val setsimChainSql: String =
    """d0 AS (
      | SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents WHERE doc_id < 1000
      |), rawtk AS (
      | SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS rts
      | FROM d0
      |), uni AS (
      | SELECT doc_id, text FROM d0
      | UNION ALL SELECT doc_id + 1000000, text FROM d0 WHERE doc_id < 20
      | UNION ALL
      |  SELECT doc_id + 2000000,
      |   array_to_string(rts[1:greatest((len(rts) * 4) // 5, 1)], ' ')
      |  FROM rawtk WHERE doc_id < 20
      |), toks AS (
      | SELECT doc_id,
      |  list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS ts
      | FROM uni
      |), sh AS (
      | SELECT doc_id, unnest(
      |  CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
      |       ELSE list_distinct(list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' ')))
      |  END) AS g
      | FROM toks
      |), ds AS (
      | SELECT DISTINCT doc_id, g FROM sh
      |), sz AS (
      | SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY 1
      |), ix AS (
      | SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(count(*) AS BIGINT) AS i
      | FROM ds a JOIN ds b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2
      |), pr AS (
      | SELECT ix.ida, ix.idb, ix.i, sa.n AS na, sb.n AS nb
      | FROM ix JOIN sz sa ON sa.doc_id = ix.ida JOIN sz sb ON sb.doc_id = ix.idb
      | WHERE ix.i * 1000000 >= 500000 * (sa.n + sb.n - ix.i)
      |)""".stripMargin

  /** The unigram gate's piece-cost table — shared verbatim with the
    * oracle. Pieces overlap deliberately (cust/omer vs custom+er, the
    * tab/le split, win/dow) so the Viterbi minimum differs from a
    * greedy longest match on real corpus words.
    */
  private[graft] val unigramGatePieces: Seq[(String, Long)] = Seq(
    "cust" -> 900L, "omer" -> 900L, "custom" -> 1500L, "er" -> 400L,
    "tab" -> 500L, "le" -> 300L, "the" -> 350L, "a" -> 700L,
    "win" -> 520L, "dow" -> 600L, "val" -> 550L, "ue" -> 380L,
    "s" -> 650L, "in" -> 450L, "row" -> 480L, "que" -> 560L, "ry" -> 420L)

  /** The DuckDB replay of the unigram_segment gate: Viterbi positions
    * unrolled as CTE steps over distinct words (the kCore accumulator
    * discipline), with the SAME packed objective cost·16 + n_tokens the
    * expression minimizes — lexicographic (cost, count) via plain
    * integer min.
    */
  private[graft] def unigramOracleSql(
      pieces: Seq[(String, Long)], unkCost: Long, maxLen: Int): String = {
    val pieceRows = pieces
      .map { case (p, c) => s"(${GateTables.sqlStr(p)}, ${p.length}, $c)" }
      .mkString(",\n   ")
    val steps = (1 to maxLen).map { p =>
      val prev = if (p == 1) "a0" else s"a${p - 1}"
      s"""s$p AS MATERIALIZED (
         | SELECT word, len, min(cand) AS best FROM (
         |  SELECT a.word, a.len,
         |   a.best + $unkCost * 16 + 1 AS cand
         |  FROM $prev a WHERE a.pos = ${p - 1} AND a.len >= $p
         |  UNION ALL
         |  SELECT a.word, a.len,
         |   a.best + pc.cost * 16 + 1 AS cand
         |  FROM $prev a JOIN pieces pc
         |    ON a.pos = $p - pc.plen AND pc.plen <= $p
         |   AND substr(a.word, $p - pc.plen + 1, pc.plen) = pc.piece
         |  WHERE a.len >= $p
         | ) GROUP BY 1, 2
         |), a$p AS MATERIALIZED (
         | SELECT * FROM $prev
         | UNION ALL SELECT word, len, $p AS pos, best FROM s$p
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH dw AS MATERIALIZED (
       | SELECT doc_id,
       |  unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS word
       | FROM documents
       |), dwf AS (
       | SELECT doc_id, word FROM dw WHERE length(word) <= $maxLen
       |), pieces AS (
       | SELECT * FROM (VALUES
       |   $pieceRows) AS v(piece, plen, cost)
       |), words AS MATERIALIZED (
       | SELECT DISTINCT word, CAST(length(word) AS BIGINT) AS len FROM dwf
       |), a0 AS MATERIALIZED (
       | SELECT word, len, 0 AS pos, CAST(0 AS BIGINT) AS best FROM words
       |), $steps, wstats AS (
       | SELECT word, best // 16 AS cost, best % 16 AS nt
       | FROM a$maxLen WHERE pos = len
       |)
       |SELECT d.doc_id, CAST(sum(w.cost) AS BIGINT) AS total_cost,
       | CAST(sum(w.nt) AS BIGINT) AS total_tokens
       |FROM dwf d JOIN wstats w ON w.word = d.word
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The unrolled Hilbert xy2d bit-steps as a CTE chain over a
    * caller-supplied `h0(carry…, hx, hy, hd)` — the DuckDB replay of
    * [[graft.plans.HilbertKey]]: per step s = 2^(order−1−i), the rx/ry
    * bit tests, d += s²·((3rx) XOR ry) spelled as a portable CASE, and
    * the s-local rotate/reflect.
    */
  private[graft] def hilbertStepsSql(order: Int, carry: Seq[String]): String = {
    val ccPrefix = if (carry.nonEmpty) carry.mkString(", ") + "," else ""
    (0 until order).map { i =>
      val s = 1L << (order - 1 - i)
      s"""h${i + 1} AS (
         | SELECT $ccPrefix
         |  CAST(CASE WHEN ry = 1 THEN hx WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END AS BIGINT) AS hx,
         |  CAST(CASE WHEN ry = 1 THEN hy WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END AS BIGINT) AS hy,
         |  CAST(hd + CAST(${s * s} AS BIGINT)
         |            * (CASE WHEN rx = 0 AND ry = 0 THEN 0 WHEN rx = 0 THEN 1
         |                    WHEN ry = 0 THEN 3 ELSE 2 END) AS BIGINT) AS hd
         | FROM (SELECT $ccPrefix hx, hy, hd,
         |        CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |        CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |       FROM h$i)
         |)""".stripMargin
    }.mkString(", ")
  }

  /** The DuckDB replay of [[graft.operators.Graph.kCoreBounded]] over
    * the source-chain graph: peel rounds unrolled as (keep-set, edge
    * filter) CTE pairs over the symmetric simple adjacency.
    */
  private[graft] def kcoreOracleSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""k$i AS (
         | SELECT _s FROM (SELECT _s, count(*) AS dg FROM $prev GROUP BY 1)
         | WHERE dg >= $k
         |), e$i AS (
         | SELECT p._s, p._d FROM $prev p
         | JOIN k$i a ON a._s = p._s JOIN k$i b ON b._s = p._d
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH d AS (
       | SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
       |), raw AS (
       | SELECT 'n' || CAST(doc_id % 41 AS VARCHAR) AS s1,
       |        'n' || CAST((doc_id * doc_id + 1) % 41 AS VARCHAR) AS s2
       | FROM d
       |), rawf AS (
       | SELECT s1, s2 FROM raw WHERE s1 <> s2
       |), ce AS (
       | SELECT DISTINCT least(s1, s2) AS u, greatest(s1, s2) AS v FROM rawf
       |), e0 AS (
       | SELECT u AS _s, v AS _d FROM ce UNION ALL SELECT v, u FROM ce
       |), $steps
       |SELECT _s AS node, CAST(count(*) AS BIGINT) AS deg
       |FROM e$rounds GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** [[pagerankOracleSql]] with the restart mass on one seed node — the
    * DuckDB replay of [[graft.operators.Graph.personalizedPageRankScaled]].
    */
  private[graft] def pprOracleSql(iterations: Int, dampingPpm: Long, seed: String): String = {
    val base = 1000000000L * (1000000L - dampingPpm) / 1000000L
    val steps = (1 to iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
         | SELECT e.dst AS v, sum((r.r * $dampingPpm // 1000000) // od.od) AS cin
         | FROM e JOIN $prev r ON r.v = e.src JOIN od ON od.s = e.src GROUP BY 1
         |), r$i AS (
         | SELECT nodes.v,
         |  CAST(CASE WHEN nodes.v = '$seed' THEN $base ELSE 0 END
         |       + coalesce(c$i.cin, 0) AS BIGINT) AS r
         | FROM nodes LEFT JOIN c$i ON c$i.v = nodes.v
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH d AS (
       | SELECT doc_id, source FROM documents
       |), e AS (
       | SELECT a.source AS src, b.source AS dst
       | FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |), nodes AS (
       | SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
       |), od AS (
       | SELECT src AS s, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1
       |), r0 AS (
       | SELECT v, CAST(CASE WHEN v = '$seed' THEN 1000000000 ELSE 0 END AS BIGINT) AS r
       | FROM nodes
       |), $steps
       |SELECT v AS node, r AS rank_ppb FROM r$iterations ORDER BY node""".stripMargin
  }

  private[graft] def pagerankOracleSql(iterations: Int, dampingPpm: Long): String = {
    val steps = (1 to iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
         | SELECT e.dst AS v, sum((r.r * $dampingPpm // 1000000) // od.od) AS cin
         | FROM e JOIN $prev r ON r.v = e.src JOIN od ON od.s = e.src GROUP BY 1
         |), r$i AS (
         | SELECT nodes.v,
         |  CAST((CAST(1000000000 AS BIGINT) * ${1000000L - dampingPpm}) // (nn.n * 1000000) + coalesce(c$i.cin, 0) AS BIGINT) AS r
         | FROM nodes CROSS JOIN nn LEFT JOIN c$i ON c$i.v = nodes.v
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH d AS (
       | SELECT doc_id, source FROM documents
       |), e AS (
       | SELECT a.source AS src, b.source AS dst
       | FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |), nodes AS (
       | SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
       |), nn AS (
       | SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
       |), od AS (
       | SELECT src AS s, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1
       |), r0 AS (
       | SELECT v, CAST(1000000000 // nn.n AS BIGINT) AS r FROM nodes CROSS JOIN nn
       |), $steps
       |SELECT v AS node, r AS rank_ppb FROM r$iterations ORDER BY node""".stripMargin
  }

  /** The ANF gates' doc-id lattice: directed edges +1 and +3 over
    * doc_id < 3000, both endpoints in-slice — enough structure that
    * depth-3 balls overlap and differ near the boundary, and a fixed
    * node count at every driver scale (the sweep-stability rule).
    */
  private[graft] def anfLatticeEdges(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") < 3000)
    val ids = d.select(col("doc_id").as("b"))
    d.select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
      .unionByName(d.select(col("doc_id").as("a"), (col("doc_id") + 3).as("b")))
      .join(ids, Seq("b"), "left_semi")
      .select(col("a").cast("string").as("src"), col("b").cast("string").as("dst"))
  }

  /** The DuckDB replay of [[graft.operators.Graph.anfHyperBall]] over
    * [[anfLatticeEdges]]: register state at round t is a pure function
    * of the EXACT ball B_t(u) (max-merge ≡ set-union), so the oracle
    * unrolls exact reachability (b1..bD, cumulative — no anti-joins
    * needed, balls are unions), rebuilds every node's FNV register
    * (bucket = hh mod m, ρ over the remaining 64−log₂m bits via the
    * shared CASE ladder), folds the per-(u, bucket) maxima through the
    * same α_m·m²·2⁶² // (S·10⁶) integer estimate in HUGEINT, and ends
    * with per-node est tables `est1..estD(u, e)`. Composed with a
    * gate-specific final SELECT.
    */
  /** The [[anfLatticeEdges]] graph as a shared oracle CTE prefix
    * (`d`, `e0`, `e`, `nodes`) — used by the ANF and random-walk
    * replays.
    */
  private[graft] val anfLatticeCteSql: String =
    """d AS (
      | SELECT doc_id FROM documents WHERE doc_id < 3000
      |), e0 AS (
      | SELECT CAST(a.doc_id AS VARCHAR) AS src, CAST(a.doc_id + 1 AS VARCHAR) AS dst
      | FROM d a WHERE a.doc_id + 1 IN (SELECT doc_id FROM d)
      | UNION ALL
      | SELECT CAST(a.doc_id AS VARCHAR), CAST(a.doc_id + 3 AS VARCHAR)
      | FROM d a WHERE a.doc_id + 3 IN (SELECT doc_id FROM d)
      |), e AS (
      | SELECT DISTINCT src, dst FROM e0 WHERE src <> dst
      |), nodes AS (
      | SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
      |)""".stripMargin

  /** FNV-1a of an arbitrary string SQL expression as a full unsigned
    * HUGEINT — the modulus-free sibling of [[fnvModSql]]. `input` is
    * inlined twice, so keep it a cheap expression.
    */
  /** The labeled graph-embedding pair table as a reusable CTE chain
    * ending in `lp(center, other, label, weight)` — the
    * `pipeline_graph_embedding` construction (node2vec walk replay →
    * window pair counts → FNV negative samples), shared verbatim by the
    * pipeline gate's oracle and the trainer oracle so the two can never
    * drift apart.
    */
  private[graft] def graphEmbeddingPairsCteSql: String =
    s"""wk AS (${node2vecOracleSql(steps = 4, walksPerNode = 1,
           pPpm = 4000000L, qPpm = 250000L, seed = "")}
       |), pos AS (
       | SELECT a.node AS center, b.node AS other, 1 AS label,
       |  CAST(count(*) AS BIGINT) AS weight
       | FROM wk a JOIN wk b ON b.start = a.start AND b.walk = a.walk
       |  AND b.step <> a.step AND abs(a.step - b.step) <= 2
       | GROUP BY 1, 2
       |), $anfLatticeCteSql, anch AS (
       | SELECT v AS anchor FROM nodes WHERE CAST(v AS BIGINT) % 7 = 0
       |), hx AS (
       | SELECT anchor, cand, ${fnvHugeSql("s")} AS hh
       | FROM (SELECT anch.anchor, nodes.v AS cand,
       |        anch.anchor || ':' || nodes.v || ':gemb' AS s
       |       FROM anch CROSS JOIN nodes WHERE anch.anchor <> nodes.v)
       |), sgn AS (
       | SELECT anchor, cand,
       |  CAST(hh - CASE WHEN hh >= CAST('9223372036854775808' AS HUGEINT)
       |            THEN CAST('18446744073709551616' AS HUGEINT)
       |            ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS hs
       | FROM hx
       |), neg AS (
       | SELECT anchor AS center, cand AS other, 0 AS label,
       |  CAST(1 AS BIGINT) AS weight,
       |  row_number() OVER (PARTITION BY anchor ORDER BY hs DESC, cand DESC) AS rnk
       | FROM sgn QUALIFY rnk <= 3
       |), lp AS (
       | SELECT center, other, CAST(label AS BIGINT) AS label, weight FROM (
       |  SELECT center, other, label, weight FROM pos
       |  UNION ALL
       |  SELECT center, other, label, weight FROM neg)
       |)""".stripMargin

  /** The DuckDB replay of [[graft.operators.Graph.sgnsEpochs]] over the
    * shared labeled-pair chain: FNV init per (node, dim), the literal
    * [[graft.operators.Graph.sigmoidTablePpm]] as a VALUES table (the
    * GateTables no-engine-transcendental discipline), each full-batch
    * GD epoch unrolled (dot → slot → g → per-dim deltas → grouped sums
    * → clamped update), and the final anchor-pair dot scores off the
    * trained table. Every operation is exact integer arithmetic on
    * identical operands — DuckDB's `//` and `%` truncate toward zero
    * exactly like Spark's `div`/`%`.
    */
  /** The SGNS training CTE chain (walks → labeled pairs → init →
    * `epochs` GD rounds), ending at `em$epochs(node, emb)` — shared by
    * the trainer gate's scoring tail and the train→serve pipeline's
    * retrieval tail.
    */
  private[graft] def sgnsTrainCteSql(dims: Int, epochs: Int, lrPpm: Long,
      seed: String): String = {
    val tbl = graft.operators.Graph.sigmoidTablePpm()
    val stVals = tbl.zipWithIndex
      .map { case (v, i) => s"($i, $v)" }.mkString(", ")
    val hi = 6000000000000L
    val epochCtes = (1 to epochs).map { k =>
      s"""s$k AS MATERIALIZED (
         | SELECT p.center, p.other, p.label, p.weight, u.emb AS ue, v.emb AS ve,
         |  list_sum(list_transform(range(1, ${dims + 1}),
         |    i -> u.emb[i] * v.emb[i])) AS dot
         | FROM lpw p JOIN em${k - 1} u ON u.node = p.center
         | JOIN em${k - 1} v ON v.node = p.other
         |), g$k AS (
         | SELECT s$k.*, ($lrPpm * weight * (label * 1000000 - st.sppm)) AS sc
         | FROM s$k JOIN st ON st.idx =
         |  CASE WHEN dot <= ${-hi} THEN 0 WHEN dot >= $hi THEN ${tbl.length - 1}
         |       ELSE (dot + $hi) * ${tbl.length} // ${2 * hi} END
         |), gd$k AS (
         | SELECT center AS node, dimi.i,
         |  (sc * (ve[dimi.i + 1] // 1000)) // 1000000000 AS d
         | FROM g$k, dimi
         | UNION ALL
         | SELECT other, dimi.i, (sc * (ue[dimi.i + 1] // 1000)) // 1000000000
         | FROM g$k, dimi
         |), ds$k AS MATERIALIZED (
         | SELECT node, i, CAST(sum(d) AS BIGINT) AS dd FROM gd$k GROUP BY 1, 2
         |), em$k AS MATERIALIZED (
         | SELECT e.node,
         |  list(CAST(greatest(-10000000, least(10000000,
         |    e.emb[dimi.i + 1] + coalesce(ds.dd, 0))) AS BIGINT)
         |    ORDER BY dimi.i) AS emb
         | FROM em${k - 1} e CROSS JOIN dimi
         | LEFT JOIN ds$k ds ON ds.node = e.node AND ds.i = dimi.i
         | GROUP BY e.node
         |)""".stripMargin
    }.mkString(", ")
    s"""$graphEmbeddingPairsCteSql, lpw AS MATERIALIZED (
       | SELECT center, other, label, least(weight, 1000) AS weight FROM lp
       |), pn AS (
       | SELECT DISTINCT center AS v FROM lpw
       | UNION SELECT DISTINCT other FROM lpw
       |), dimi AS (
       | SELECT unnest(range(0, $dims)) AS i
       |), em0 AS MATERIALIZED (
       | SELECT v AS node,
       |  list(CAST((hh // 2) % 125001 - 62500 AS BIGINT) ORDER BY i) AS emb
       | FROM (SELECT pn.v, dimi.i, ${fnvHugeSql(
             "pn.v || '#' || CAST(dimi.i AS VARCHAR) || '#' || '" + seed + "'")} AS hh
       |       FROM pn, dimi)
       | GROUP BY v
       |), st AS (
       | SELECT * FROM (VALUES $stVals) AS t(idx, sppm)
       |), $epochCtes""".stripMargin
  }

  private[graft] def sgnsOracleSql(dims: Int, epochs: Int, lrPpm: Long,
      seed: String): String =
    s"""WITH ${sgnsTrainCteSql(dims, epochs, lrPpm, seed)}, f AS (
       | SELECT p.center, p.label,
       |  list_sum(list_transform(range(1, ${dims + 1}),
       |    i -> u.emb[i] * v.emb[i])) AS dot
       | FROM lpw p JOIN em$epochs u ON u.node = p.center
       | JOIN em$epochs v ON v.node = p.other
       | WHERE CAST(p.center AS BIGINT) % 7 = 0
       |)
       |SELECT center, label, CAST(count(*) AS BIGINT) AS n_pairs,
       | CAST(sum(dot) AS BIGINT) AS sum_dot_e12
       |FROM f GROUP BY 1, 2 ORDER BY center, label""".stripMargin

  /** The train→serve pipeline oracle: the trained `em$epochs` table
    * indexed and queried in the same exact e6 integer space —
    * cells = the 4 smallest node ids' trained embeddings, every vector
    * home-assigned by (dist, cell-id) argmin, queries (node % 7 = 0)
    * probe their 2 nearest cells, exact squared-L2 top-5 with ties to
    * the smaller neighbor id (the topKPerQuery heap rule).
    */
  private[graft] def sgnsServeOracleSql(dims: Int, epochs: Int, lrPpm: Long,
      seed: String, k: Int, nprobe: Int): String =
    s"""WITH ${sgnsTrainCteSql(dims, epochs, lrPpm, seed)}, cellt AS (
       | SELECT CAST(node AS BIGINT) AS ccid, emb AS ccv
       | FROM em$epochs ORDER BY CAST(node AS BIGINT) LIMIT 4
       |), cd AS MATERIALIZED (
       | SELECT CAST(e.node AS BIGINT) AS id, e.emb AS v, c.ccid,
       |  list_sum(list_transform(range(1, ${dims + 1}),
       |    i -> (e.emb[i] - c.ccv[i]) * (e.emb[i] - c.ccv[i]))) AS dist
       | FROM em$epochs e, cellt c
       |), homed AS (
       | SELECT id, ccid, v FROM (
       |  SELECT id, ccid, v,
       |   row_number() OVER (PARTITION BY id ORDER BY dist, ccid) AS rn
       |  FROM cd) WHERE rn = 1
       |), qprobe AS (
       | SELECT id, ccid, v FROM (
       |  SELECT id, ccid, v,
       |   row_number() OVER (PARTITION BY id ORDER BY dist, ccid) AS rn
       |  FROM cd WHERE id % 7 = 0) WHERE rn <= $nprobe
       |), pd AS (
       | SELECT q.id AS query_id, h.id AS neighbor_id,
       |  CAST(list_sum(list_transform(range(1, ${dims + 1}),
       |    i -> (q.v[i] - h.v[i]) * (q.v[i] - h.v[i]))) AS BIGINT) AS dist_e12
       | FROM qprobe q JOIN homed h ON h.ccid = q.ccid
       | WHERE q.id <> h.id
       |)
       |SELECT query_id, neighbor_id, dist_e12, rank FROM (
       | SELECT query_id, neighbor_id, dist_e12,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY dist_e12, neighbor_id) AS INTEGER) AS rank
       | FROM pd) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Mutual 3-NN edge CTE chain ending in `me(id_a, id_b)` — exact e6
    * squared-L2 lists (ties to the smaller id, the topKPerQuery
    * contract), reciprocity via the reversed self-join, canonical
    * `id_a < id_b`. Shared by the edge gate and the cluster pipeline.
    */
  /** Multi-probe mutual 3-NN edge CTE chain ending in `me(id_a, id_b)`
    * — home assignment rn = 1, probe set rn ≤ 2, same top-3 +
    * reciprocity as [[mutualKnnCteSql]]. Shared by the probed edge
    * gate and the probed cluster pipeline. MATERIALIZED at the fan-out
    * points (cd feeds two ladders; kn self-joins).
    */
  private[graft] val mutualKnnProbedCteSql: String =
    """e AS (
      | SELECT CAST(vec_id AS BIGINT) AS id,
      |  list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      | FROM embeddings WHERE vec_id < 200
      |), cc AS (
      | SELECT id AS ccid, v AS ccv FROM e WHERE id < 4
      |), cd AS MATERIALIZED (
      | SELECT e.id, cc.ccid,
      |  list_sum(list_transform(range(1, 65),
      |    i -> (e.v[i] - cc.ccv[i]) * (e.v[i] - cc.ccv[i]))) AS dist
      | FROM e, cc
      |), casg AS (
      | SELECT id, ccid FROM (
      |  SELECT id, ccid, row_number() OVER (PARTITION BY id ORDER BY dist, ccid) AS rn
      |  FROM cd) WHERE rn = 1
      |), cprobe AS (
      | SELECT id, ccid FROM (
      |  SELECT id, ccid, row_number() OVER (PARTITION BY id ORDER BY dist, ccid) AS rn
      |  FROM cd) WHERE rn <= 2
      |), pd AS (
      | SELECT q.id AS qid, p.id AS nid,
      |  CAST(list_sum(list_transform(list_zip(q.v, p.v), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist
      | FROM e q JOIN cprobe cq ON cq.id = q.id
      | JOIN casg cp ON cp.ccid = cq.ccid
      | JOIN e p ON p.id = cp.id
      | WHERE q.id <> p.id
      |), kn AS MATERIALIZED (
      | SELECT qid, nid FROM (
      |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
      |  FROM pd) WHERE rn <= 3
      |), me AS (
      | SELECT a.qid AS id_a, a.nid AS id_b
      | FROM kn a JOIN kn b ON b.qid = a.nid AND b.nid = a.qid
      | WHERE a.qid < a.nid
      |)""".stripMargin

  private[graft] val mutualKnnCteSql: String =
    """e AS (
      | SELECT CAST(vec_id AS BIGINT) AS id,
      |  list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      | FROM embeddings WHERE vec_id < 200
      |), pd AS (
      | SELECT q.id AS qid, p.id AS nid,
      |  CAST(list_sum(list_transform(list_zip(q.v, p.v), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist
      | FROM e q, e p WHERE q.id <> p.id
      |), kn AS (
      | SELECT qid, nid FROM (
      |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
      |  FROM pd) WHERE rn <= 3
      |), me AS (
      | SELECT a.qid AS id_a, a.nid AS id_b
      | FROM kn a JOIN kn b ON b.qid = a.nid AND b.nid = a.qid
      | WHERE a.qid < a.nid
      |)""".stripMargin

  /** Shared by the one-shot and streaming calibration gates — the
    * stream state is additive sufficient stats, so the accumulated
    * result IS the batch result on the concatenated examples.
    */
  private[graft] def qualityCalibrationOracleSql: String = {
    val st = graft.operators.Graph.sigmoidTablePpm()
      .zipWithIndex.map { case (v, i) => s"($i, $v)" }.mkString(", ")
    s"""WITH ${qualityMarginCteSql(
           "doc_id < 1000 AND n_chars IS NOT NULL")}, st AS (
       | SELECT * FROM (VALUES $st) AS t(idx, sppm)
       |), lab AS (
       | SELECT doc_id, CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS y
       | FROM documents WHERE doc_id < 1000 AND n_chars IS NOT NULL
       |), pr AS (
       | SELECT st.sppm AS p, lab.y
       | FROM marg m JOIN lab ON lab.doc_id = m.doc_id
       | JOIN st ON st.idx =
       |  CASE WHEN m.margin_e6 <= -6000000 THEN 0
       |       WHEN m.margin_e6 >= 6000000 THEN 63
       |       ELSE (m.margin_e6 + 6000000) * 64 // 12000000 END
       |), bk AS (
       | SELECT least(9, (p * 10) // 1000000) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(y) AS BIGINT) AS n_pos,
       |  CAST(sum(CAST(p AS HUGEINT)) // count(*) AS BIGINT) AS mean_prob_ppm,
       |  CAST((CAST(sum(y) AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS pos_rate_ppm
       | FROM pr GROUP BY 1
       |), bk2 AS (
       | SELECT *, abs(mean_prob_ppm - pos_rate_ppm) AS gap_ppm FROM bk
       |), ec AS (
       | SELECT CAST(sum(CAST(n AS HUGEINT) * gap_ppm) // sum(n) AS BIGINT) AS ece_ppm
       | FROM bk2
       |)
       |SELECT CAST(bucket AS BIGINT) AS bucket, n, n_pos, mean_prob_ppm,
       | pos_rate_ppm, gap_ppm, ec.ece_ppm
       |FROM bk2, ec ORDER BY bucket""".stripMargin
  }

  /** The EQUAL-MASS variant: same margin → sigmoid-table prob → label
    * prelude, bucket edges = exact interpolated quantiles of the prob
    * distribution (`quantile_cont` ≡ the exactPercentiles arithmetic,
    * the quantile_buckets oracle convention), membership = the same
    * Σ(p ≥ edge) fold as `Profile.quantileBuckets`.
    */
  private[graft] def qualityCalibrationQuantileOracleSql(buckets: Int): String = {
    val st = graft.operators.Graph.sigmoidTablePpm()
      .zipWithIndex.map { case (v, i) => s"($i, $v)" }.mkString(", ")
    val bcols = (1 until buckets)
      .map(i => s"quantile_cont(p, ${i / buckets.toDouble}) AS b$i")
      .mkString(", ")
    val bexpr = (1 until buckets)
      .map(i => s"(CASE WHEN p >= qb.b$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${qualityMarginCteSql(
           "doc_id < 1000 AND n_chars IS NOT NULL")}, st AS (
       | SELECT * FROM (VALUES $st) AS t(idx, sppm)
       |), lab AS (
       | SELECT doc_id, CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS y
       | FROM documents WHERE doc_id < 1000 AND n_chars IS NOT NULL
       |), pr AS MATERIALIZED (
       | SELECT st.sppm AS p, lab.y
       | FROM marg m JOIN lab ON lab.doc_id = m.doc_id
       | JOIN st ON st.idx =
       |  CASE WHEN m.margin_e6 <= -6000000 THEN 0
       |       WHEN m.margin_e6 >= 6000000 THEN 63
       |       ELSE (m.margin_e6 + 6000000) * 64 // 12000000 END
       |), qb AS (
       | SELECT $bcols FROM pr
       |), bk AS (
       | SELECT CAST($bexpr AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(y) AS BIGINT) AS n_pos,
       |  CAST(sum(CAST(p AS HUGEINT)) // count(*) AS BIGINT) AS mean_prob_ppm,
       |  CAST((CAST(sum(y) AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS pos_rate_ppm
       | FROM pr, qb GROUP BY 1
       |), bk2 AS (
       | SELECT *, abs(mean_prob_ppm - pos_rate_ppm) AS gap_ppm FROM bk
       |), ec AS (
       | SELECT CAST(sum(CAST(n AS HUGEINT) * gap_ppm) // sum(n) AS BIGINT) AS ece_ppm
       | FROM bk2
       |)
       |SELECT bucket, n, n_pos, mean_prob_ppm,
       | pos_rate_ppm, gap_ppm, ec.ece_ppm
       |FROM bk2, ec ORDER BY bucket""".stripMargin
  }

  /** The DuckDB replay of [[graft.operators.Preference.bradleyTerryScaled]]
    * over the consecutive-doc comparison log: oriented win counts →
    * symmetric pair stats via the zero-filled reversed union + self-join,
    * then each MM round unrolled — d = (n_ij·10¹²) // (γ_i+γ_j), D
    * floored at 1, γ' = (W·10¹²) // D clamped to [1, 10¹²], normalize in
    * HUGEINT with the post-normalize 1-floor. All positive integers, so
    * `//` ≡ Spark's `div` exactly.
    */
  /** The Bradley–Terry MM machinery as a CTE chain — prelude must end
    * defining `w0(i, j, wn)` (oriented win counts; half-units for the
    * ties variant). Ends at `g$rounds(i, g)`; compose with
    * [[btMmFinalSelect]] or a custom tail.
    */
  private[graft] def btMmCtes(rounds: Int, preludeCtes: String): String = {
    val roundCtes = (1 to rounds).map { k =>
      s"""dk$k AS (
         | SELECT p.i, greatest(1, CAST(sum((p.nij * 1000000000000) // (gi.g + gj.g)) AS BIGINT)) AS D
         | FROM ps p JOIN g${k - 1} gi ON gi.i = p.i
         | JOIN g${k - 1} gj ON gj.i = p.j
         | GROUP BY 1
         |), rk$k AS (
         | SELECT it.i,
         |  least(1000000000000, greatest(1,
         |    (it.wi * 1000000000000) // coalesce(d.D, 1))) AS g
         | FROM items it LEFT JOIN dk$k d ON d.i = it.i
         |), tk$k AS (
         | SELECT CAST(sum(CAST(g AS HUGEINT)) AS HUGEINT) AS tot FROM rk$k
         |), g$k AS (
         | SELECT i, greatest(1, CAST((CAST(g AS HUGEINT) * nn.scale) // tot AS BIGINT)) AS g
         | FROM rk$k, tk$k, nn
         |)""".stripMargin
    }.mkString(", ")
    s"""$preludeCtes, wb AS MATERIALIZED (
       | SELECT i, j, CAST(sum(wn) AS BIGINT) AS wij FROM (
       |  SELECT i, j, wn FROM w0 UNION ALL SELECT j, i, 0 FROM w0)
       | GROUP BY 1, 2
       |), ps AS MATERIALIZED (
       | SELECT a.i, a.j, a.wij + b.wij AS nij
       | FROM wb a JOIN wb b ON b.i = a.j AND b.j = a.i
       |), winz AS (
       | SELECT i, CAST(sum(wn) AS BIGINT) AS wi FROM w0 GROUP BY 1
       |), items AS MATERIALIZED (
       | SELECT u.i, coalesce(winz.wi, 0) AS wi
       | FROM (SELECT DISTINCT i FROM
       |        (SELECT i FROM w0 UNION ALL SELECT j FROM w0)) u
       | LEFT JOIN winz ON winz.i = u.i
       |), nn AS (
       | SELECT CAST(count(*) AS BIGINT) * 1000000 AS scale FROM items
       |), g0 AS (
       | SELECT i, CAST(1000000 AS BIGINT) AS g FROM items
       |), $roundCtes""".stripMargin
  }

  private[graft] def btMmFinalSelect(rounds: Int): String =
    s"""SELECT it.i AS item, g.g AS rating_e6, it.wi AS wins,
       | coalesce(cmps.c, 0) AS comparisons
       |FROM items it JOIN g$rounds g ON g.i = it.i
       |LEFT JOIN (SELECT i, CAST(sum(nij) AS BIGINT) AS c FROM ps GROUP BY 1) cmps
       | ON cmps.i = it.i
       |ORDER BY item""".stripMargin

  private[graft] val btPlainPreludeSql: String =
    """dd AS (
      | SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
      | FROM documents
      | WHERE doc_id < 2000 AND source IS NOT NULL AND n_chars IS NOT NULL
      |), cmp AS (
      | SELECT CASE WHEN a.n_chars >= b.n_chars THEN a.source ELSE b.source END AS w,
      |        CASE WHEN a.n_chars >= b.n_chars THEN b.source ELSE a.source END AS l
      | FROM dd a JOIN dd b ON b.doc_id = a.doc_id + 1
      | WHERE a.source <> b.source
      |), w0 AS (
      | SELECT w AS i, l AS j, CAST(count(*) AS BIGINT) AS wn FROM cmp GROUP BY 1, 2
      |)""".stripMargin

  private[graft] def bradleyTerryOracleSql(rounds: Int): String =
    s"""WITH ${btMmCtes(rounds, btPlainPreludeSql)}
       |${btMmFinalSelect(rounds)}""".stripMargin

  /** The ties-gate prelude: length buckets (n_chars // 100) decide the
    * outcome — equal buckets are DRAWS. Half-unit counts: decisive row
    * = 2 to its oriented pair, tie = 1 in each orientation.
    */
  private[graft] val btTiesPreludeSql: String =
    """dd AS (
      | SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
      | FROM documents
      | WHERE doc_id < 2000 AND source IS NOT NULL AND n_chars IS NOT NULL
      |), cmpt AS (
      | SELECT a.source AS sa, b.source AS sb,
      |  a.n_chars // 100 AS ta, b.n_chars // 100 AS tb
      | FROM dd a JOIN dd b ON b.doc_id = a.doc_id + 1
      | WHERE a.source <> b.source
      |), w0 AS (
      | SELECT i, j, CAST(sum(wn) AS BIGINT) AS wn FROM (
      |  SELECT CASE WHEN ta >= tb THEN sa ELSE sb END AS i,
      |         CASE WHEN ta >= tb THEN sb ELSE sa END AS j,
      |         CASE WHEN ta = tb THEN 1 ELSE 2 END AS wn
      |  FROM cmpt
      |  UNION ALL
      |  SELECT CASE WHEN ta >= tb THEN sb ELSE sa END,
      |         CASE WHEN ta >= tb THEN sa ELSE sb END, 1
      |  FROM cmpt WHERE ta = tb)
      | GROUP BY 1, 2
      |)""".stripMargin

  /** The islands-gate prelude: items = source + doc parity, comparisons
    * only between same-parity docs (d vs d+2) — the comparison graph
    * splits into two planted islands by construction.
    */
  private[graft] val btIslandPreludeSql: String =
    """dd AS (
      | SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
      | FROM documents
      | WHERE doc_id < 2000 AND source IS NOT NULL AND n_chars IS NOT NULL
      |), cmp AS (
      | SELECT CASE WHEN a.n_chars >= b.n_chars
      |          THEN a.source || '#' || CAST(a.doc_id % 2 AS VARCHAR)
      |          ELSE b.source || '#' || CAST(b.doc_id % 2 AS VARCHAR) END AS w,
      |        CASE WHEN a.n_chars >= b.n_chars
      |          THEN b.source || '#' || CAST(b.doc_id % 2 AS VARCHAR)
      |          ELSE a.source || '#' || CAST(a.doc_id % 2 AS VARCHAR) END AS l
      | FROM dd a JOIN dd b ON b.doc_id = a.doc_id + 2
      | WHERE a.source <> b.source
      |), w0 AS (
      | SELECT w AS i, l AS j, CAST(count(*) AS BIGINT) AS wn FROM cmp GROUP BY 1, 2
      |)""".stripMargin

  /** [[btIslandPreludeSql]] + MM rounds + min-label propagation over
    * the compared-pair edges (the pipeline_embedding_clusters unroll —
    * `ccRounds` ≥ the island diameter, converged well before that on
    * this dense fixture) + component sizes and the spans-all flag.
    */
  private[graft] def btConnectivityOracleSql(rounds: Int, ccRounds: Int): String = {
    val ccCtes = (1 to ccRounds).map { k =>
      s"""c$k AS (
         | SELECT e._d AS v, min(p.l) AS ml
         | FROM bsym e JOIN l${k - 1} p ON p.v = e._s GROUP BY 1
         |), l$k AS MATERIALIZED (
         | SELECT p.v, least(p.l, coalesce(c$k.ml, p.l)) AS l
         | FROM l${k - 1} p LEFT JOIN c$k ON c$k.v = p.v
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${btMmCtes(rounds, btIslandPreludeSql)}, bsym AS MATERIALIZED (
       | SELECT i AS _s, j AS _d FROM ps
       |), l0 AS MATERIALIZED (
       | SELECT i AS v, i AS l FROM items
       |), $ccCtes, comp AS MATERIALIZED (
       | SELECT v, l FROM l$ccRounds
       |), csz AS (
       | SELECT l, CAST(count(*) AS BIGINT) AS n FROM comp GROUP BY 1
       |), ctot AS (
       | SELECT CAST(count(*) AS BIGINT) AS n FROM comp
       |)
       |SELECT it.i AS item, g.g AS rating_e6, it.wi AS wins,
       | coalesce(cmps.c, 0) AS comparisons,
       | comp.l AS component, csz.n AS component_items,
       | csz.n = ctot.n AS spans_all
       |FROM items it JOIN g$rounds g ON g.i = it.i
       |LEFT JOIN (SELECT i, CAST(sum(nij) AS BIGINT) AS c FROM ps GROUP BY 1) cmps
       | ON cmps.i = it.i
       |JOIN comp ON comp.v = it.i
       |JOIN csz ON csz.l = comp.l
       |CROSS JOIN ctot
       |ORDER BY item""".stripMargin
  }

  private[graft] def fnvHugeSql(input: String): String =
    s"""list_reduce(
       |    list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |      list_transform(range(1, length($input) + 1), i -> CAST(ascii(($input)[i]) AS HUGEINT))),
       |    (acc, b) -> ((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
       |                * 1099511628211 % CAST('18446744073709551616' AS HUGEINT)
       |  )""".stripMargin

  /** The DuckDB replay of [[graft.operators.Graph.randomWalks]] over
    * [[anfLatticeEdges]]: the per-source destination-ordered neighbor
    * index and out-degrees as CTEs, then each step unrolled — the
    * walk's step-t entropy FNV recomputed from (start, k, seed, t),
    * canonicalized by `// 2` (the unsigned-shift agreement), reduced
    * mod the CURRENT node's out-degree, and matched against the
    * neighbor rank. Dead ends terminate via the inner joins, exactly
    * like the operator.
    */
  private[graft] def randomWalksOracleSql(steps: Int, walksPerNode: Int, seed: String): String = {
    val stepCtes = (1 to steps).map { tt =>
      val inp = s"w${tt - 1}.start || '#' || CAST(w${tt - 1}.k AS VARCHAR) || " +
        s"'#' || '$seed' || '#' || '$tt'"
      s"""w$tt AS (
         | SELECT w${tt - 1}.start, w${tt - 1}.k, idx.dd AS cur
         | FROM w${tt - 1} JOIN od ON od.s = w${tt - 1}.cur
         | JOIN idx ON idx.s = w${tt - 1}.cur
         |  AND idx.rnk = CAST((${fnvHugeSql(inp)} // 2) % od.od AS BIGINT)
         |)""".stripMargin
    }
    val unions = (0 to steps)
      .map(tt => s"SELECT start, k, $tt AS t, cur FROM w$tt")
      .mkString(" UNION ALL ")
    s"""WITH $anfLatticeCteSql, idx AS (
       | SELECT src AS s, dst AS dd,
       |  CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS rnk
       | FROM e
       |), od AS (
       | SELECT s, CAST(count(*) AS BIGINT) AS od FROM idx GROUP BY 1
       |), ks AS (
       | SELECT unnest(range(0, $walksPerNode)) AS k
       |), w0 AS (
       | SELECT v AS start, CAST(k AS BIGINT) AS k, v AS cur FROM nodes, ks
       |), ${stepCtes.mkString(", ")}
       |SELECT start, k AS walk, CAST(t AS BIGINT) AS step, cur AS node
       |FROM ($unions) ORDER BY start, walk, step""".stripMargin
  }

  /** The DuckDB replay of [[graft.operators.Graph.node2vecWalks]] over
    * [[anfLatticeEdges]]: per step, the deg(cur) candidate set joins in
    * with its p/q weight (return / distance-1 via a left join on the
    * edge set / outward), two window sums build the cumulative ladder,
    * and the row whose [cum, cum+wt) range contains
    * (FNV(start#k#seed#t) // 2) mod Σwt advances the walk — the
    * operator's exact integer arithmetic, step-unrolled.
    */
  private[graft] def node2vecOracleSql(
      steps: Int, walksPerNode: Int, pPpm: Long, qPpm: Long, seed: String): String = {
    val wRet = 1000000000000L / pPpm
    val wIn = 1000000L
    val wOut = 1000000000000L / qPpm
    val stepCtes = (1 to steps).map { tt =>
      val inp = s"start || '#' || CAST(k AS VARCHAR) || '#' || '$seed' || '#' || '$tt'"
      s"""c$tt AS (
         | SELECT v${tt - 1}.start, v${tt - 1}.k, v${tt - 1}.prev, v${tt - 1}.cur,
         |  idx.dd AS cand, idx.rnk,
         |  CASE WHEN idx.dd = v${tt - 1}.prev THEN $wRet
         |       WHEN d1.src IS NOT NULL THEN $wIn ELSE $wOut END AS wt
         | FROM v${tt - 1} JOIN idx ON idx.s = v${tt - 1}.cur
         | LEFT JOIN e d1 ON d1.src = v${tt - 1}.prev AND d1.dst = idx.dd
         |), p$tt AS (
         | SELECT start, k, cur, cand, wt,
         |  coalesce(SUM(wt) OVER (PARTITION BY start, k ORDER BY rnk
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         |  SUM(wt) OVER (PARTITION BY start, k) AS tot
         | FROM c$tt
         |), r$tt AS (
         | SELECT *, CAST((${fnvHugeSql(inp)} // 2) % tot AS BIGINT) AS r FROM p$tt
         |), v$tt AS (
         | SELECT start, k, cur AS prev, cand AS cur
         | FROM r$tt WHERE r >= cum AND r < cum + wt
         |)""".stripMargin
    }
    val unions = (0 to steps)
      .map(tt => s"SELECT start, k, $tt AS t, cur FROM v$tt")
      .mkString(" UNION ALL ")
    s"""WITH $anfLatticeCteSql, idx AS (
       | SELECT src AS s, dst AS dd,
       |  CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS rnk
       | FROM e
       |), ks AS (
       | SELECT unnest(range(0, $walksPerNode)) AS k
       |), v0 AS (
       | SELECT v AS start, CAST(k AS BIGINT) AS k, v AS prev, v AS cur FROM nodes, ks
       |), ${stepCtes.mkString(", ")}
       |SELECT start, k AS walk, CAST(t AS BIGINT) AS step, cur AS node
       |FROM ($unions) ORDER BY start, walk, step""".stripMargin
  }

  /** Shared batch/stream structural-summary replay (see the
    * graph_profile map comment).
    */
  private[graft] val graphProfileOracleSql: String =
    """WITH d AS (
        | SELECT doc_id FROM documents WHERE doc_id < 3000
        |), e0 AS (
        | SELECT CAST(a.doc_id AS VARCHAR) AS src, CAST(a.doc_id + 1 AS VARCHAR) AS dst
        | FROM d a WHERE a.doc_id + 1 IN (SELECT doc_id FROM d)
        | UNION ALL
        | SELECT CAST(a.doc_id AS VARCHAR), CAST(a.doc_id + 3 AS VARCHAR)
        | FROM d a WHERE a.doc_id + 3 IN (SELECT doc_id FROM d)
        | UNION ALL
        | SELECT CAST(a.doc_id AS VARCHAR), CAST(a.doc_id - 1 AS VARCHAR)
        | FROM d a WHERE a.doc_id % 5 = 0 AND a.doc_id - 1 IN (SELECT doc_id FROM d)
        |), e AS (
        | SELECT DISTINCT src, dst FROM e0 WHERE src <> dst
        |), nodes AS (
        | SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
        |), od AS (
        | SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1
        |), idg AS (
        | SELECT dst, CAST(count(*) AS BIGINT) AS ind FROM e GROUP BY 1
        |), rec AS (
        | SELECT CAST(count(*) AS BIGINT) AS re
        | FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
        |), base AS (
        | SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT re FROM rec) AS reciprocal_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM od) AS nsrc,
        |  (SELECT CAST(max(od) AS BIGINT) FROM od) AS max_outdeg,
        |  (SELECT CAST(max(ind) AS BIGINT) FROM idg) AS max_indeg
        |), pe AS (
        | SELECT e.src || '#' || e.dst AS eid, od.od AS x, idg.ind AS y
        | FROM e JOIN od ON od.src = e.src JOIN idg ON idg.dst = e.dst
        |), rk AS (
        | SELECT eid, CAST(row_number() OVER (ORDER BY x, eid) AS BIGINT) AS rx,
        |  CAST(row_number() OVER (ORDER BY y, eid) AS BIGINT) AS ry
        | FROM pe
        |), st AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS d2
        | FROM rk
        |), dc AS (
        | SELECT CAST(count(*) AS BIGINT) AS nd
        | FROM rk a JOIN rk b ON a.rx < b.rx AND a.ry > b.ry
        |)
        |SELECT b.n_nodes, b.n_edges, b.reciprocal_edges,
        | CAST(b.reciprocal_edges * 1000000 // b.n_edges AS BIGINT) AS reciprocity_ppm,
        | CAST(b.n_nodes - b.nsrc AS BIGINT) AS dangling_nodes,
        | b.max_outdeg, b.max_indeg,
        | CAST((CAST(st.n AS HUGEINT) * (st.n*st.n - 1) - 6 * CAST(st.d2 AS HUGEINT))
        |  * 1000000 // (CAST(st.n AS HUGEINT) * (st.n*st.n - 1)) AS BIGINT)
        |  AS assort_spearman_e6,
        | CAST((CAST(st.n AS HUGEINT) * (st.n - 1) - 4 * CAST(dc.nd AS HUGEINT))
        |  * 1000000 // (CAST(st.n AS HUGEINT) * (st.n - 1)) AS BIGINT)
        |  AS assort_kendall_e6
        |FROM base b, st, dc""".stripMargin

  /** The `graph_profile` gates' lattice WITH backward edges
    * (doc % 5 == 0 → doc−1, nonzero reciprocity), numeric `(a, b)` so
    * the streaming gate can slice batches by source id.
    */
  private[graft] def profileLatticeEdges(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") < 3000)
    val ids = d.select(col("doc_id").as("b"))
    d.select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
      .unionByName(d.select(col("doc_id").as("a"), (col("doc_id") + 3).as("b")))
      .unionByName(d.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") - 1).as("b")))
      .join(ids, Seq("b"), "left_semi")
      .select(col("a"), col("b"))
  }

  /** The DuckDB replay of [[graft.operators.Graph.kTrussBounded]] over
    * the +1/+2/+3 lattice: canonical string-ordered undirected edges,
    * each peeling round's per-edge triangle support from the
    * node-ordered triple join (the `triangle_counts` oracle shape —
    * x < y < z means all three edges are already canonical), the
    * `< k−2` filter, and one final support pass over the survivors.
    */
  private[graft] def ktrussOracleSql(k: Int, rounds: Int): String = {
    def supCte(r: Int, src: String): String =
      s"""tri$r AS (
         | SELECT a._u AS x, a._v AS y, b._v AS z
         | FROM $src a JOIN $src b ON b._u = a._v
         | JOIN $src c ON c._u = a._u AND c._v = b._v
         |), s$r AS (
         | SELECT _u, _v, CAST(count(*) AS BIGINT) AS sup FROM (
         |  SELECT x AS _u, y AS _v FROM tri$r
         |  UNION ALL SELECT x, z FROM tri$r
         |  UNION ALL SELECT y, z FROM tri$r)
         | GROUP BY 1, 2
         |)""".stripMargin
    // MATERIALIZED per-round edge sets: the unrolled rounds reference
    // t{r-1} four times each, and DuckDB's default CTE inlining would
    // re-expand the whole chain exponentially (observed: "Too many
    // open files" — hundreds of re-opened parquet scans)
    val roundCtes = (1 to rounds).map { r =>
      s"""${supCte(r, s"t${r - 1}")}, t$r AS MATERIALIZED (
         | SELECT e._u, e._v FROM t${r - 1} e
         | LEFT JOIN s$r s ON s._u = e._u AND s._v = e._v
         | WHERE coalesce(s.sup, 0) >= ${k - 2}
         |)""".stripMargin
    }
    s"""WITH d AS (
       | SELECT doc_id FROM documents WHERE doc_id < 3000
       |), e0 AS (
       | SELECT CAST(a.doc_id AS VARCHAR) AS src, CAST(a.doc_id + 1 AS VARCHAR) AS dst
       | FROM d a WHERE a.doc_id + 1 IN (SELECT doc_id FROM d)
       | UNION ALL
       | SELECT CAST(a.doc_id AS VARCHAR), CAST(a.doc_id + 2 AS VARCHAR)
       | FROM d a WHERE a.doc_id + 2 IN (SELECT doc_id FROM d)
       | UNION ALL
       | SELECT CAST(a.doc_id AS VARCHAR), CAST(a.doc_id + 3 AS VARCHAR)
       | FROM d a WHERE a.doc_id + 3 IN (SELECT doc_id FROM d)
       |), t0 AS MATERIALIZED (
       | SELECT DISTINCT least(src, dst) AS _u, greatest(src, dst) AS _v
       | FROM e0 WHERE src <> dst
       |), ${roundCtes.mkString(", ")}, ${supCte(rounds + 1, s"t$rounds")}
       |SELECT e._u AS u, e._v AS v,
       | CAST(coalesce(s.sup, 0) AS BIGINT) AS support
       |FROM t$rounds e LEFT JOIN s${rounds + 1} s ON s._u = e._u AND s._v = e._v
       |ORDER BY u, v""".stripMargin
  }

  private[graft] def anfOracleChainSql(maxDepth: Int, m: Int): String = {
    val log2m = java.lang.Integer.numberOfTrailingZeros(m)
    val rhoCase = graft.operators.Profile.hllRhoCaseSql("rem", 64 - log2m)
    val num = graft.operators.Graph.anfNumLiteral(m)
    val two62 = (BigInt(1) << 62).toString
    val balls = (1 to maxDepth).map { tt =>
      s"""b$tt AS (
         | SELECT DISTINCT u, v FROM (
         |  SELECT u, v FROM b${tt - 1}
         |  UNION ALL
         |  SELECT b${tt - 1}.u AS u, e.dst AS v FROM b${tt - 1} JOIN e ON e.src = b${tt - 1}.v)
         |)""".stripMargin
    }
    val ests = (1 to maxDepth).map { tt =>
      s"""r$tt AS (
         | SELECT b$tt.u, h.bucket, max(h.rho) AS mr
         | FROM b$tt JOIN hr h ON h.v = b$tt.v GROUP BY 1, 2
         |), s$tt AS (
         | SELECT u, CAST(sum(CAST((CAST(1 AS BIGINT) << (62 - mr)) AS HUGEINT)) AS HUGEINT)
         |  + ($m - count(*)) * CAST('$two62' AS HUGEINT) AS s,
         |  CAST($m - count(*) AS BIGINT) AS vz
         | FROM r$tt GROUP BY 1
         |), est$tt AS (
         | SELECT u, CAST(CAST('$num' AS HUGEINT) // (s * 1000000) AS BIGINT) AS e, vz
         | FROM s$tt
         |)""".stripMargin
    }
    s"""$anfLatticeCteSql, b0 AS (
       | SELECT v AS u, v FROM nodes
       |), ${balls.mkString(", ")}, hv AS (
       | SELECT v, list_reduce(
       |   list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |     list_transform(range(1, length(s) + 1), i -> CAST(ascii(s[i]) AS HUGEINT))),
       |   (acc, b) -> ((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
       |               * 1099511628211 % CAST('18446744073709551616' AS HUGEINT)
       | ) AS hh
       | FROM (SELECT v, v || ':anf' AS s FROM nodes)
       |), hr AS (
       | SELECT v, CAST(hh % $m AS BIGINT) AS bucket,
       |  $rhoCase AS rho
       | FROM (SELECT v, hh, CAST(hh // $m AS BIGINT) AS rem FROM hv)
       |), ${ests.mkString(", ")}""".stripMargin
  }

  /** Per-node final SELECT over [[anfOracleChainSql]] — ball estimates
    * per level plus the clamped harmonic fold, the operator's exact
    * arithmetic in HUGEINT-safe BIGINT.
    */
  private[graft] def anfHyperBallOracleSql(maxDepth: Int, m: Int): String = {
    val joins = (1 to maxDepth)
      .map(tt => s"JOIN est$tt e$tt ON e$tt.u = n.v").mkString(" ")
    val ballCols = (1 to maxDepth)
      .map(tt => s"e$tt.e AS ball${tt}_est").mkString(",\n ")
    // the operator's linear-counting correction off the SAME JVM-
    // computed literal table (lc CTE below) — raw ≤ 2.5m with empty
    // registers reads the table at V, everything else keeps raw
    val lcCols = (1 to maxDepth).map { tt =>
      s"CASE WHEN e$tt.e * 10 <= ${25L * m} AND e$tt.vz > 0" +
        s" THEN (SELECT lcv FROM lc WHERE lc.vz = e$tt.vz)" +
        s" ELSE e$tt.e END AS ball${tt}_lc_est"
    }.mkString(",\n ")
    val lcVals = graft.operators.Graph.anfLinearCountTable(m)
      .zipWithIndex.map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
    val harmonic = (1 to maxDepth).map { tt =>
      val prev = if (tt == 1) "1" else s"e${tt - 1}.e"
      s"(greatest(0, e$tt.e - $prev) * 1000000) // $tt"
    }.mkString(" + ")
    s"""WITH ${anfOracleChainSql(maxDepth, m)}, lc AS (
       | SELECT * FROM (VALUES $lcVals) AS t(vz, lcv)
       |)
       |SELECT n.v AS node, $ballCols,
       | $lcCols,
       | CAST($harmonic AS BIGINT) AS harmonic_est_ppm
       |FROM nodes n $joins
       |ORDER BY node""".stripMargin
  }

  /** Effective-diameter final SELECT over [[anfOracleChainSql]]:
    * HUGEINT level sums N(t), ppm shares of N(maxDepth), min-t at the
    * 90% threshold.
    */
  private[graft] def anfEffDiameterOracleSql(maxDepth: Int, m: Int): String = {
    val lv = (1 to maxDepth).map(tt =>
      s"SELECT $tt AS t, (SELECT CAST(sum(CAST(e AS HUGEINT)) AS HUGEINT) FROM est$tt) AS np")
      .mkString(" UNION ALL ")
    s"""WITH ${anfOracleChainSql(maxDepth, m)}, lv AS (
       | $lv
       |), tot AS (
       | SELECT np AS tt FROM lv WHERE t = $maxDepth
       |), sh AS (
       | SELECT t, np, CAST(np * 1000000 // tot.tt AS BIGINT) AS share_ppm FROM lv, tot
       |), ed AS (
       | SELECT min(t) AS eff FROM sh WHERE share_ppm >= 900000
       |)
       |SELECT CAST(sh.t AS BIGINT) AS t, CAST(sh.np AS BIGINT) AS npairs_est,
       | sh.share_ppm, CAST(ed.eff AS BIGINT) AS eff_diameter
       |FROM sh, ed ORDER BY t""".stripMargin
  }

  /** The DuckDB replay of [[graft.operators.Graph.harmonicCentralityScaled]]
    * over the pagerank gate's source-chain graph: BFS levels unrolled as
    * CTEs (p1..pD, each level anti-joined against every earlier level),
    * per-level counts × `10⁶ div d`, sums cast to BIGINT (the HUGEINT
    * lesson).
    */
  private[graft] def harmonicOracleSql(maxDepth: Int): String = {
    val levels = (2 to maxDepth).map { dd =>
      val anti = (1 until dd)
        .map(j => s"NOT EXISTS (SELECT 1 FROM p$j WHERE p$j.u = p.u AND p$j.v = e.dst)")
        .mkString(" AND ")
      s"""p$dd AS (
         | SELECT DISTINCT p.u, e.dst AS v FROM p${dd - 1} p JOIN e ON e.src = p.v
         | WHERE p.u <> e.dst AND $anti
         |)""".stripMargin
    }
    val contribs = (1 to maxDepth)
      .map(dd => s"SELECT v, CAST(count(*) AS BIGINT) * ${1000000L / dd} AS c FROM p$dd GROUP BY 1")
      .mkString(" UNION ALL ")
    s"""WITH d AS (
       | SELECT doc_id, source FROM documents
       |), e0 AS (
       | SELECT a.source AS src, b.source AS dst
       | FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |), e AS (
       | SELECT DISTINCT src, dst FROM e0
       |), nodes AS (
       | SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
       |), p1 AS (
       | SELECT DISTINCT src AS u, dst AS v FROM e WHERE src <> dst
       |), ${levels.mkString(", ")}, contrib AS (
       | $contribs
       |)
       |SELECT nodes.v AS node,
       | CAST(coalesce((SELECT sum(c) FROM contrib WHERE contrib.v = nodes.v), 0) AS BIGINT) AS harmonic_ppm
       |FROM nodes ORDER BY node""".stripMargin
  }

  /** The CUSUM changepoint replay over the daily event-count series —
    * shared by the batch gate and the streaming gate (whose final
    * accumulated state is the same full series).
    */
  private[graft] val changepointDayOracleSql: String =
    """WITH c AS (
      | SELECT epoch_us(ts) // 86400000000 AS p, CAST(count(*) AS BIGINT) AS c
      | FROM events WHERE ts IS NOT NULL GROUP BY 1
      |), r AS (
      | SELECT p, c, row_number() OVER (ORDER BY p) AS i,
      |  sum(c) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      | FROM c
      |), t AS (
      | SELECT CAST(count(*) AS BIGINT) AS tt, CAST(sum(c) AS BIGINT) AS s FROM c
      |), d AS (
      | SELECT r.p, abs(CAST(t.tt AS HUGEINT) * r.cum - CAST(r.i AS HUGEINT) * t.s) AS dd,
      |  t.tt, t.s
      | FROM r, t
      |)
      |SELECT CAST(p AS BIGINT) AS period, CAST(dd AS BIGINT) AS d_stat,
      | tt AS n_periods, s AS total
      |FROM d ORDER BY dd DESC, p ASC LIMIT 1""".stripMargin

  /** The DuckDB replay of [[graft.operators.Graph.katzCentralityScaled]]
    * over the pagerank gate's source-chain graph: walk-count rounds
    * unrolled as CTEs, the same driver-side attenuation ladder folded in
    * as literals, sums through HUGEINT then cast BIGINT.
    */
  private[graft] def katzOracleSql(rounds: Int, alphaPpm: Long): String = {
    val atten = Iterator.iterate(alphaPpm)(a => a * alphaPpm / 1000000L)
      .take(rounds).toSeq
    val walks = (2 to rounds).map { k =>
      s"""w$k AS (
         | SELECT e.dst AS v, CAST(sum(w${k - 1}.w) AS BIGINT) AS w
         | FROM e JOIN w${k - 1} ON w${k - 1}.v = e.src GROUP BY 1
         |)""".stripMargin
    }
    val contribs = (1 to rounds)
      .map(k => s"SELECT v, CAST(w AS HUGEINT) * ${atten(k - 1)} AS c FROM w$k")
      .mkString(" UNION ALL ")
    s"""WITH d AS (
       | SELECT doc_id, source FROM documents
       |), e AS (
       | SELECT a.source AS src, b.source AS dst
       | FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |), nodes AS (
       | SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
       |), w1 AS (
       | SELECT dst AS v, CAST(count(*) AS BIGINT) AS w FROM e GROUP BY 1
       |), ${walks.mkString(", ")}, contrib AS (
       | $contribs
       |)
       |SELECT nodes.v AS node,
       | CAST(coalesce((SELECT sum(c) FROM contrib WHERE contrib.v = nodes.v), 0) AS BIGINT) AS katz_e6
       |FROM nodes ORDER BY node""".stripMargin
  }

  /** The DuckDB replay of [[graft.operators.Similarity.kCenterGreedyE6]]
    * over the embeddings table: rounds unrolled as CTE pairs (dR =
    * running min-distance after folding in round R's winner, sR+1 =
    * next winner by max distance / min id), distances as exact BIGINT
    * squared-L2 over the shared floor-e6 quantization, every list_sum
    * cast to BIGINT (the HUGEINT lesson).
    */
  private[graft] def kcenterOracleSql(k: Int): String = {
    require(k >= 2, s"kcenterOracleSql: k must be >= 2, got $k")
    def dist(a: String, b: String): String =
      s"CAST(list_sum(list_transform(list_zip($a, $b), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT)"
    val rounds = (2 to k).map { r =>
      val prev = if (r == 2) "base" else s"d${r - 1}"
      val dExpr =
        if (r == 2) dist("b.v", s"s1.v")
        else s"least(b.md, ${dist("b.v", s"s${r - 1}.v")})"
      s"""d$r AS (
         | SELECT b.id, b.v, $dExpr AS md
         | FROM $prev b, s${r - 1} WHERE b.id <> s${r - 1}.id
         |), s$r AS (
         | SELECT id, v, md FROM d$r ORDER BY md DESC, id ASC LIMIT 1
         |)""".stripMargin
    }.mkString(", ")
    val out = (2 to k)
      .map(r => s"SELECT CAST($r AS BIGINT) AS rank, id AS center_id, md AS dist_sq_e12 FROM s$r")
      .mkString(" UNION ALL ")
    s"""WITH base AS (
       | SELECT CAST(vec_id AS BIGINT) AS id,
       |  list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
       | FROM embeddings
       |), s1 AS (
       | SELECT id, v FROM base ORDER BY id LIMIT 1
       |), $rounds
       |SELECT rank, center_id, dist_sq_e12 FROM (
       | SELECT CAST(1 AS BIGINT) AS rank, id AS center_id,
       |  CAST(0 AS BIGINT) AS dist_sq_e12 FROM s1
       | UNION ALL $out
       |) ORDER BY rank""".stripMargin
  }

  /** Shared WITH-chain of the ann_recall gates: e6 embeddings, 1-step
    * trained centroids c2, corpus assignment `asg`, query sample `q` +
    * assignment `qasg`, exact and 1-probe top-10 sets, and per-query
    * hit counts `h(qid, n_hits)`.
    */
  private[graft] val annRecallChainSql: String =
    """WITH e AS (
        | SELECT vec_id,
        |  list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS a
        | FROM embeddings
        |), c1 AS (
        | SELECT vec_id AS cid, a AS cv FROM e WHERE vec_id < 4
        |), d1 AS (
        | SELECT e.vec_id, c1.cid,
        |  list_sum(list_transform(range(1, len(e.a) + 1),
        |    i -> (e.a[i] - c1.cv[i]) * (e.a[i] - c1.cv[i]))) AS dist
        | FROM e, c1
        |), w1 AS (
        | SELECT vec_id, cid,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        | FROM d1
        |), a1 AS (
        | SELECT e.vec_id, w1.cid, e.a FROM w1 JOIN e USING (vec_id) WHERE rn = 1
        |), ex1 AS (
        | SELECT cid, CAST(generate_subscripts(a, 1) - 1 AS INT) AS pos,
        |  unnest(a) AS x
        | FROM a1
        |), s1 AS (
        | SELECT cid, pos, CAST(sum(x) AS BIGINT) AS sum_e6,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM ex1 GROUP BY cid, pos
        |), c2 AS (
        | SELECT cid, list(CAST(sum_e6 // n AS BIGINT) ORDER BY pos) AS cv
        | FROM s1 GROUP BY cid
        |), d2 AS (
        | SELECT e.vec_id, c2.cid,
        |  list_sum(list_transform(range(1, len(e.a) + 1),
        |    i -> (e.a[i] - c2.cv[i]) * (e.a[i] - c2.cv[i]))) AS dist
        | FROM e, c2
        |), asg AS (
        | SELECT vec_id, cid FROM (
        |  SELECT vec_id, cid,
        |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d2) WHERE rn = 1
        |), q AS (
        | SELECT vec_id AS qid, a AS qa FROM e WHERE vec_id < 8
        |), qd AS (
        | SELECT q.qid, c2.cid,
        |  list_sum(list_transform(range(1, len(q.qa) + 1),
        |    i -> (q.qa[i] - c2.cv[i]) * (q.qa[i] - c2.cv[i]))) AS dist
        | FROM q, c2
        |), qasg AS (
        | SELECT qid, cid AS qcid FROM (
        |  SELECT qid, cid,
        |   row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn
        |  FROM qd) WHERE rn = 1
        |), pd AS (
        | SELECT q.qid, e.vec_id AS nid, asg.cid AS ncid,
        |  list_sum(list_transform(range(1, len(q.qa) + 1),
        |    i -> (q.qa[i] - e.a[i]) * (q.qa[i] - e.a[i]))) AS dist
        | FROM q CROSS JOIN e JOIN asg ON e.vec_id = asg.vec_id
        | WHERE e.vec_id <> q.qid
        |), exk AS (
        | SELECT qid, nid FROM (
        |  SELECT qid, nid,
        |   row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
        |  FROM pd) WHERE rn <= 10
        |), apd AS (
        | SELECT pd.qid, pd.nid, pd.dist
        | FROM pd JOIN qasg ON pd.qid = qasg.qid AND pd.ncid = qasg.qcid
        |), ap AS (
        | SELECT qid, nid FROM (
        |  SELECT qid, nid,
        |   row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
        |  FROM apd) WHERE rn <= 10
        |), h AS (
        | SELECT ap.qid, count(*) AS n_hits
        | FROM ap JOIN exk ON ap.qid = exk.qid AND ap.nid = exk.nid
        | GROUP BY 1
        |)""".stripMargin

  /** The DuckDB replay of [[graft.functions.LayoutFunctions.zorderKey]]:
    * the same flat sum of shift/mask terms, generated from the same
    * (bits) parameter.
    */
  private[graft] def zorderSqlExpr(x: String, y: String, bits: Int): String =
    ((0 until bits).map(i => s"((($x >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" + ")

  /** The 3-D sibling of [[zorderSqlExpr]] (stride-3 interleave). */
  private[graft] def zorder3SqlExpr(x: String, y: String, z: String, bits: Int): String =
    ((0 until bits).map(i => s"((($x >> $i) & 1) << ${3 * i})") ++
      (0 until bits).map(i => s"((($y >> $i) & 1) << ${3 * i + 1})") ++
      (0 until bits).map(i => s"((($z >> $i) & 1) << ${3 * i + 2})"))
      .mkString(" + ")

  /** The oracle's replay of UrlParse.host + RegisteredDomain over the
    * shared synthetic URLs: one regex for the host (scheme optional,
    * greedy userinfo, port/path cut), trailing-dot strip, then
    * suffix-rule resolution by list slicing — most-labels matching rule
    * via max(k), last-label default, suffix-only → NULL. Yields
    * `dom(doc_id, url, host, domain)`.
    */
  private[graft] def domainChainSql(where: String): String =
    s"""d AS (
       | SELECT doc_id, source, $domainGateUrlSql AS url
       | FROM documents$where
       |), h AS (
       | SELECT doc_id, url,
       |  NULLIF(regexp_replace(lower(regexp_extract(url,
       |    '^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/?#]*@)?([^/?#:]+)', 1)),
       |    '\\.$$', ''), '') AS host
       | FROM d
       |), labels AS (
       | SELECT doc_id, url, host, string_split(host, '.') AS ls FROM h
       |), rules(s, k) AS (
       | SELECT * FROM (VALUES ${domainGateRules.map(r =>
            s"('$r', ${r.count(_ == '.') + 1})").mkString(", ")}) v
       |), m AS (
       | SELECT l.doc_id, max(r.k) AS bestk
       | FROM labels l JOIN rules r
       |   ON len(l.ls) >= r.k
       |  AND array_to_string(list_slice(l.ls, len(l.ls) - r.k + 1, len(l.ls)), '.') = r.s
       | GROUP BY 1
       |), dom AS (
       | SELECT l.doc_id, l.url, l.host,
       |  CASE
       |   WHEN l.host IS NULL THEN NULL
       |   WHEN m.bestk IS NOT NULL THEN
       |     CASE WHEN len(l.ls) > m.bestk
       |       THEN array_to_string(list_slice(l.ls, len(l.ls) - m.bestk, len(l.ls)), '.')
       |       ELSE NULL END
       |   ELSE CASE WHEN len(l.ls) >= 2
       |     THEN array_to_string(list_slice(l.ls, len(l.ls) - 1, len(l.ls)), '.')
       |     ELSE NULL END
       |  END AS domain
       | FROM labels l LEFT JOIN m ON l.doc_id = m.doc_id
       |)""".stripMargin

  /** The recursive greedy-longest-match subword chain (DuckDB `WITH
    * RECURSIVE` — compose as `WITH RECURSIVE $chain …`): per-position,
    * advance by the LONGEST vocab piece matching at `pos` with the
    * right continuation class (`cont = (pos > 1)`), else by one
    * character counting one UNK — exactly graft.plans.SubwordCount's
    * loop. Runs over DISTINCT words (`dw`), ≤ word-length steps each;
    * `ns` re-joins per-occurrence: `(doc_id, source, subword_tokens,
    * ws_tokens)`.
    */
  private[graft] def subwordChainSql(where: String): String =
    s"""v AS (
       | SELECT * FROM (VALUES
       |   $subwordVocabRows) AS t(piece, cont)
       |), d AS (
       | SELECT doc_id, source,
       |  list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
       | FROM documents$where
       |), w AS (
       | SELECT doc_id, unnest(toks) AS wd FROM d
       |), dw AS (
       | SELECT DISTINCT wd FROM w
       |), seg AS (
       | SELECT wd, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS cnt FROM dw
       | UNION ALL
       | SELECT wd, pos + adv, cnt + 1 FROM (
       |  SELECT wd, pos, cnt,
       |   COALESCE((SELECT max(length(v.piece)) FROM v
       |     WHERE v.cont = (pos > 1)
       |      AND substr(wd, pos, length(v.piece)) = v.piece), 1) AS adv
       |  FROM seg WHERE pos <= length(wd))
       |), wc AS (
       | SELECT wd, max(cnt) AS n_sub FROM seg WHERE pos > length(wd) GROUP BY 1
       |), ns AS (
       | SELECT d.doc_id, any_value(d.source) AS source,
       |  CAST(COALESCE(sum(wc.n_sub), 0) AS BIGINT) AS subword_tokens,
       |  CAST(count(w.wd) AS BIGINT) AS ws_tokens
       | FROM d
       | LEFT JOIN w ON d.doc_id = w.doc_id
       | LEFT JOIN wc ON w.wd = wc.wd
       | GROUP BY 1
       |)""".stripMargin

  /** Decomposed-combining-char suffix for the nfc_normalize gate: the
    * driver corpus is ASCII, so the gate plants e+ACUTE, a+RING,
    * o+DIAERESIS — NFC composes all three (" café ångström", 3 chars
    * shorter). Shared verbatim by the Spark query and the oracle SQL.
    */
  private[graft] val nfcGateSuffix = " café ångström"

  /** The former expected-red hash-divergence tripwires (round-8
    * DECIMAL class, round-10 HUGEINT class), CANONICALIZED in round 17
    * per the round-16 verdict's adjudication: both divergences are
    * permanent driver-hasher behavior (raw DECIMAL columns and DuckDB
    * HUGEINT sums serialize differently from Spark's parquet output),
    * so carrying two red gates per round was pure noise. The probes
    * now compare a canonical surface — `decimal_probe_dec` emits the
    * pinned scale-6 STRING rendering of the identical DECIMAL(38,6)
    * literals on both engines; `hugeint_probe`'s oracle CASTs its
    * sum() to BIGINT like every production oracle. EVERY query is now
    * expected GREEN. [[Verify]] asserts the canonical forms each run
    * (a probe that silently drifted back to a raw DECIMAL / uncast
    * HUGEINT surface fails the run, not the driver), and prints the
    * contract so any future red in CORRECTNESS_r*.json is read as a
    * driver behavior change, never as noise.
    */
  val canonicalizedProbes: Map[String, String] = Map(
    "decimal_probe_dec" -> "dec_val", // scale-6 STRING rendering, both engines
    "hugeint_probe" -> "sum_v"        // BIGINT sum on both engines
  )

  // ------------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.gates.CoreGates.queries ++
      graft.gates.DedupGates.queries ++
      graft.gates.GraphGates.queries ++
      graft.gates.MixLayoutGates.queries ++
      graft.gates.PreferenceAnnotationGates.queries ++
      graft.gates.RefSurfaceGates.queries ++
      graft.gates.SimilarityGates.queries ++
      graft.gates.StatsGates.queries ++
      graft.gates.StreamGates.queries ++
      graft.gates.TextGates.queries

  // ------------------------------------------------------------------ oracles

  // ---- retrieval/scoring oracle builders. Portable form: the idf /
  //      weight table is the driver-computed literal VALUES the gate
  //      query registered in GateTables (Verify dumps oracleSql AFTER
  //      running every query, so the rows are always present in the
  //      driver flow). Fallback (oracleSql inspected standalone): the
  //      engine-ln formula — locally correct, but a last-ulp libm
  //      difference can flip the 6dp-rounded digit across DuckDB
  //      builds, so the hardened path is the literal table.

  private[graft] val bm25Q3Values =
    """(0, 'spark window merge'),
      |   (1, 'customer order batch stream'),
      |   (2, 'hash join table scan')""".stripMargin

  private[graft] val bm25Q5Values =
    """(0, 'spark window merge'),
      |   (1, 'customer order batch stream'),
      |   (2, 'hash join table scan'),
      |   (3, 'stream state checkpoint'),
      |   (4, 'partition shuffle sort')""".stripMargin

  /** The BM25 lexical-chain CTE definitions (`d` … `sc`, plus `qn` when
    * `requireAll`), composable into a larger WITH list. `idfRows` is
    * the literal `(term, idf_s BIGINT ×10⁶)` table the gate query
    * registered — REQUIRED: there is deliberately no engine-side `ln`
    * fallback (round-7 verdict #4); [[gateTableOrError]] turns an
    * unregistered table into a loud oracle-side failure instead of a
    * silent value divergence.
    *
    * The per-term contribution mirrors Retrieval.rankPostings'
    * integer kernel operand for operand: numerator a =
    * idf_s·tf·(10⁶+K1)·10⁶·sum_dl·10³, denominator d = tf·10¹²·sum_dl
    * + K1·(10⁶−B)·sum_dl + K1·B·dl·n_docs (K1 = 1200000, B =
    * 750000), contribution = ⌊(2a+d)/(2d)⌋ — HALF_UP 9dp rounding in
    * pure HUGEINT arithmetic, value-identical in any engine. The
    * per-doc score is the exact integer sum emitted as `score_e9`
    * BIGINT. No double, no `round()`, and no DECIMAL anywhere in the
    * compared surface.
    */
  private[graft] def bm25ChainSql(
      queryValues: String, idfRows: String, requireAll: Boolean): String = {
    val idfCte =
      s"""idft AS (
         | SELECT * FROM (VALUES
         |   $idfRows) AS v(term, idf_s)
         |)""".stripMargin
    val qnCte = if (requireAll)
      """, qn AS (
        | SELECT query_id, count(*) AS nq FROM qt GROUP BY 1
        |)""".stripMargin
    else ""
    val matched = if (requireAll) ",\n  count(*) AS nmatched" else ""
    s"""d AS (
       | SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       | FROM documents
       |), dl AS (
       | SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d
       |), tok AS (
       | SELECT doc_id, unnest(toks) AS term FROM d
       |), tf AS (
       | SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
       |), df AS (
       | SELECT term, count(*) AS df FROM tf GROUP BY 1
       |), st AS (
       | SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
       |), q AS (
       | SELECT * FROM (VALUES
       |   $queryValues) AS v(query_id, qtext)
       |), qt AS (
       | SELECT query_id,
       |  unnest(list_distinct(list_filter(string_split_regex(trim(lower(qtext)), '\\s+'), x -> x <> ''))) AS term
       | FROM q
       |)$qnCte, $idfCte, scx AS (
       | SELECT qt.query_id, tf.doc_id,
       |  CAST(idft.idf_s AS HUGEINT) * tf.tf * 2200000 * 1000000
       |    * st.sum_dl * 1000 AS a,
       |  CAST(tf.tf AS HUGEINT) * 1000000000000 * st.sum_dl
       |    + CAST(300000000000 AS HUGEINT) * st.sum_dl
       |    + CAST(900000000000 AS HUGEINT) * dl.dl * st.n_docs AS d
       | FROM qt
       | JOIN tf ON qt.term = tf.term
       | JOIN idft ON qt.term = idft.term
       | JOIN dl ON tf.doc_id = dl.doc_id, st
       |), sc AS (
       | SELECT query_id, doc_id AS neighbor_id,
       |  CAST(sum((2 * a + d) // (2 * d)) AS BIGINT) AS score_e9$matched
       | FROM scx
       | GROUP BY 1, 2
       |)""".stripMargin
  }

  /** The DuckDB replay of the HLL sketch chain (registers through the
    * raw estimate) over per-source distinct 3-gram shingles — shared by
    * the batch gate (`withExact = true` adds the exact distinct count
    * alongside) and the streaming gate (whose max-merged final state is
    * the whole-corpus sketch).
    */
  /** The shared register chain (toks … reg) of the HLL oracles. */
  private[graft] def hllRegChainSql: String = {
    val rhoCase = Profile.hllRhoCaseSql("rem", 54)
    s"""toks AS (
       | SELECT source,
       |  list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS ts
       | FROM documents WHERE source IS NOT NULL
       |), sh AS (
       | SELECT source, unnest(
       |  CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
       |       ELSE list_distinct(list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' ')))
       |  END) AS g
       | FROM toks
       |), ds AS (
       | SELECT DISTINCT source, g FROM sh
       |), h AS (
       | SELECT source,
       |  list_reduce(
       |    list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |      list_transform(range(1, length(s) + 1), i -> CAST(ascii(s[i]) AS HUGEINT))),
       |    (acc, b) -> ((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
       |                * 1099511628211 % CAST('18446744073709551616' AS HUGEINT)
       |  ) AS hh
       | FROM (SELECT source, g, g || ':hll' AS s FROM ds)
       |), reg0 AS (
       | SELECT source, CAST(hh % 1024 AS BIGINT) AS bucket,
       |  CAST(hh // 1024 AS BIGINT) AS rem
       | FROM h
       |), reg AS (
       | SELECT source, bucket, max($rhoCase) AS m
       | FROM reg0 GROUP BY 1, 2
       |)""".stripMargin
  }

  private[graft] val hllNumLiteral: String =
    (BigInt(Profile.hllAlphaPpm1024) * BigInt(1024L * 1024L) *
      (BigInt(1) << 63)).toString

  /** Per-pair sketch-algebra oracle: single-source estimates, max-merged
    * union estimates, and inclusion–exclusion intersections — the same
    * BigInt folds the operator runs driver-side, in HUGEINT.
    */
  private[graft] def hllOverlapOracleSql: String =
    s"""WITH $hllRegChainSql, sv AS (
       | SELECT source,
       |  CAST(sum(CAST((CAST(1 AS BIGINT) << (63 - m)) AS HUGEINT)) AS HUGEINT)
       |   + (1024 - count(*)) * CAST('9223372036854775808' AS HUGEINT) AS s
       | FROM reg GROUP BY 1
       |), est AS (
       | SELECT source,
       |  CAST(CAST('$hllNumLiteral' AS HUGEINT) // (s * 1000000) AS BIGINT) AS e
       | FROM sv
       |), prs AS (
       | SELECT a.source AS sa, b.source AS sb
       | FROM est a JOIN est b ON a.source < b.source
       |), ureg AS (
       | SELECT p.sa, p.sb, r.bucket, max(r.m) AS m
       | FROM prs p JOIN reg r ON r.source = p.sa OR r.source = p.sb
       | GROUP BY 1, 2, 3
       |), usv AS (
       | SELECT sa, sb,
       |  CAST(sum(CAST((CAST(1 AS BIGINT) << (63 - m)) AS HUGEINT)) AS HUGEINT)
       |   + (1024 - count(*)) * CAST('9223372036854775808' AS HUGEINT) AS s
       | FROM ureg GROUP BY 1, 2
       |), uest AS (
       | SELECT sa, sb,
       |  CAST(CAST('$hllNumLiteral' AS HUGEINT) // (s * 1000000) AS BIGINT) AS eu
       | FROM usv
       |)
       |SELECT u.sa AS src_a, u.sb AS src_b, ea.e AS est_a, eb.e AS est_b,
       | u.eu AS est_union, CAST(ea.e + eb.e - u.eu AS BIGINT) AS est_inter
       |FROM uest u JOIN est ea ON ea.source = u.sa JOIN est eb ON eb.source = u.sb
       |ORDER BY 1, 2""".stripMargin

  private[graft] def hllOracleSql(withExact: Boolean): String = {
    val num = hllNumLiteral
    val exCte = if (withExact)
      """, ex AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct FROM ds GROUP BY 1
        |)""".stripMargin
    else ""
    val exCol = if (withExact) ",\n ex.exact_distinct" else ""
    val exJoin = if (withExact) " JOIN ex ON ex.source = sv.source" else ""
    s"""WITH $hllRegChainSql, sv AS (
       | SELECT source,
       |  CAST(sum(CAST((CAST(1 AS BIGINT) << (63 - m)) AS HUGEINT)) AS HUGEINT)
       |   + (1024 - count(*)) * CAST('9223372036854775808' AS HUGEINT) AS s
       | FROM reg GROUP BY 1
       |)$exCte
       |SELECT sv.source,
       | CAST(CAST('$num' AS HUGEINT) // (sv.s * 1000000) AS BIGINT) AS est_distinct$exCol
       |FROM sv$exJoin
       |ORDER BY 1""".stripMargin
  }

  /** The registered gate-table rows for `key`, or a loud single-row
    * oracle failure. There is deliberately NO value fallback: an
    * oracle_sql.json produced without running the gate queries must
    * fail by NAME in the driver's correctness report, never silently
    * diverge on a re-derived (ln-based) surface — that exact silent
    * path is round 6/7's standing hash-red hypothesis (ii).
    */
  private[graft] def gateTableOrError(key: String): Either[String, String] =
    GateTables.get(key).toRight(
      s"SELECT error('gate table $key not registered: oracle_sql.json was " +
        "generated without running the gate queries first (Verify runs " +
        "queries, then dumps oracles)')")

  private[graft] def bm25TopKOracle(
      queryValues: String, idfKey: String, requireAll: Boolean): String = {
    val rows = gateTableOrError(idfKey) match {
      case Left(err) => return err
      case Right(r) => r
    }
    val chain = bm25ChainSql(queryValues, rows, requireAll)
    if (requireAll)
      s"""WITH $chain
         |SELECT CAST(sc.query_id AS BIGINT) AS query_id, sc.neighbor_id,
         | CAST(sc.score_e9 AS BIGINT) AS score_e9,
         | CAST(ROW_NUMBER() OVER (PARTITION BY sc.query_id ORDER BY sc.score_e9 DESC, sc.neighbor_id) AS INTEGER) AS rank
         |FROM sc JOIN qn ON sc.query_id = qn.query_id
         |WHERE sc.nmatched = qn.nq
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    else
      s"""WITH $chain
         |SELECT CAST(query_id AS BIGINT) AS query_id, neighbor_id,
         | CAST(score_e9 AS BIGINT) AS score_e9,
         | CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_e9 DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin
  }

  /** The ranking_metrics oracle: the bm25 chain's top-10 as `ranked`,
    * conjunctive term containment as `rel`, then the exact rank
    * arithmetic (mrr_e6 = 10⁶ // first-relevant-rank, precision ppm).
    */
  private[graft] def rankingMetricsOracle(): String = {
    val rows = gateTableOrError("bm25_idf_rm") match {
      case Left(err) => return err
      case Right(r) => r
    }
    val chain = bm25ChainSql(bm25Q3Values, rows, requireAll = false)
    s"""WITH $chain, ranked AS (
       | SELECT CAST(query_id AS BIGINT) AS query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_e9 DESC, neighbor_id) AS INTEGER) AS rank
       | FROM sc QUALIFY rank <= 10
       |), rmqt AS (
       | SELECT * FROM (VALUES $bm25Q3Values) v(query_id, qtext)
       |), rmqterm AS (
       | SELECT CAST(query_id AS BIGINT) AS query_id,
       |  unnest(list_distinct(string_split(qtext, ' '))) AS term
       | FROM rmqt
       |), rmnq AS (
       | SELECT query_id, count(*) AS nqt FROM rmqterm GROUP BY 1
       |), rmdterm AS (
       | SELECT doc_id,
       |  unnest(list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))) AS term
       | FROM documents
       |), rmm AS (
       | SELECT q.query_id, d.doc_id, count(*) AS mm
       | FROM rmqterm q JOIN rmdterm d USING (term) GROUP BY 1, 2
       |), rmrel AS (
       | SELECT rmm.query_id, rmm.doc_id FROM rmm JOIN rmnq ON rmnq.query_id = rmm.query_id
       | WHERE rmm.mm = rmnq.nqt
       |), rmhits AS (
       | SELECT r.query_id, CAST(count(*) AS BIGINT) AS h, min(r.rank) AS fr
       | FROM ranked r JOIN rmrel ON rmrel.query_id = r.query_id AND rmrel.doc_id = r.neighbor_id
       | GROUP BY 1
       |), rmnrel AS (
       | SELECT query_id, CAST(count(*) AS BIGINT) AS nr FROM rmrel GROUP BY 1
       |), rmqs AS (
       | SELECT DISTINCT query_id FROM ranked
       |)
       |SELECT rmqs.query_id,
       | CAST(coalesce(rmnrel.nr, 0) AS BIGINT) AS n_relevant,
       | CAST(coalesce(rmhits.h, 0) AS BIGINT) AS hits_at_k,
       | CAST(coalesce(1000000 // rmhits.fr, 0) AS BIGINT) AS mrr_e6,
       | CAST(coalesce(rmhits.h, 0) * 1000000 // 10 AS BIGINT) AS prec_at_k_ppm
       |FROM rmqs
       |LEFT JOIN rmnrel ON rmnrel.query_id = rmqs.query_id
       |LEFT JOIN rmhits ON rmhits.query_id = rmqs.query_id
       |ORDER BY 1""".stripMargin
  }

  /** The ndcg_metrics oracle: the ranking_metrics relevance scaffold
    * plus the driver-computed scaled DCG weight literals (both engines
    * fold the identical table — Retrieval.dcgWeightLiteralsE9).
    */
  private[graft] def ndcgOracle(): String = {
    val rows = gateTableOrError("bm25_idf_ndcg") match {
      case Left(err) => return err
      case Right(r) => r
    }
    val chain = bm25ChainSql(bm25Q3Values, rows, requireAll = false)
    val w = graft.operators.Retrieval.dcgWeightLiteralsE9(10)
    val wVals = w.map { case (r, v) => s"($r, ${v})" }.mkString(", ")
    val prefix = w.scanLeft(0L) { case (acc, (_, v)) => acc + v }.tail
    val preVals = (1 to 10).map(n => s"($n, ${prefix(n - 1)})").mkString(", ")
    s"""WITH $chain, ranked AS (
       | SELECT CAST(query_id AS BIGINT) AS query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_e9 DESC, neighbor_id) AS INTEGER) AS rank
       | FROM sc QUALIFY rank <= 10
       |), rmqt AS (
       | SELECT * FROM (VALUES $bm25Q3Values) v(query_id, qtext)
       |), rmqterm AS (
       | SELECT CAST(query_id AS BIGINT) AS query_id,
       |  unnest(list_distinct(string_split(qtext, ' '))) AS term
       | FROM rmqt
       |), rmnq AS (
       | SELECT query_id, count(*) AS nqt FROM rmqterm GROUP BY 1
       |), rmdterm AS (
       | SELECT doc_id,
       |  unnest(list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))) AS term
       | FROM documents
       |), rmm AS (
       | SELECT q.query_id, d.doc_id, count(*) AS mm
       | FROM rmqterm q JOIN rmdterm d USING (term) GROUP BY 1, 2
       |), rmrel AS (
       | SELECT rmm.query_id, rmm.doc_id FROM rmm JOIN rmnq ON rmnq.query_id = rmm.query_id
       | WHERE rmm.mm = rmnq.nqt
       |), dw(rnk, w) AS (
       | SELECT * FROM (VALUES $wVals) x
       |), pre(n, v) AS (
       | SELECT * FROM (VALUES $preVals) x
       |), dcg AS (
       | SELECT r.query_id, CAST(sum(dw.w) AS BIGINT) AS dcg
       | FROM ranked r
       | JOIN rmrel ON rmrel.query_id = r.query_id AND rmrel.doc_id = r.neighbor_id
       | JOIN dw ON dw.rnk = r.rank
       | GROUP BY 1
       |), rmnrel AS (
       | SELECT query_id, CAST(count(*) AS BIGINT) AS nr FROM rmrel GROUP BY 1
       |), rmqs AS (
       | SELECT DISTINCT query_id FROM ranked
       |), base AS (
       | SELECT rmqs.query_id,
       |  CAST(coalesce(rmnrel.nr, 0) AS BIGINT) AS n_relevant,
       |  CAST(coalesce(dcg.dcg, 0) AS BIGINT) AS dcg_e9
       | FROM rmqs
       | LEFT JOIN rmnrel ON rmnrel.query_id = rmqs.query_id
       | LEFT JOIN dcg ON dcg.query_id = rmqs.query_id
       |), withi AS (
       | SELECT base.*,
       |  CASE WHEN base.n_relevant = 0 THEN 0
       |       WHEN base.n_relevant >= 10 THEN ${prefix.last}
       |       ELSE (SELECT v FROM pre WHERE pre.n = base.n_relevant)
       |  END AS idcg_e9
       | FROM base
       |)
       |SELECT query_id, n_relevant, dcg_e9, CAST(idcg_e9 AS BIGINT) AS idcg_e9,
       | CAST(CASE WHEN idcg_e9 = 0 THEN 0 ELSE dcg_e9 * 1000000 // idcg_e9 END AS BIGINT) AS ndcg_e6
       |FROM withi ORDER BY query_id""".stripMargin
  }

  private[graft] def hybridRrfOracle(): String = {
    val rows = gateTableOrError("bm25_idf_q5") match {
      case Left(err) => return err
      case Right(r) => r
    }
    val chain = bm25ChainSql(bm25Q5Values, rows, requireAll = false)
    s"""WITH qv AS (
       | SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
       |), ds AS (
       | SELECT qv.query_id, e.vec_id AS neighbor_id,
       |  list_sum(list_transform(list_zip(qv.qvec, e.embedding),
       |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot
       | FROM embeddings e, qv WHERE e.vec_id <> qv.query_id
       |), dense AS (
       | SELECT query_id, neighbor_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
       | FROM ds QUALIFY rank <= 10
       |), $chain, lexical AS (
       | SELECT CAST(query_id AS BIGINT) AS query_id, neighbor_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_e9 DESC, neighbor_id) AS rank
       | FROM sc QUALIFY rank <= 10
       |), contribs AS (
       | SELECT query_id, neighbor_id,
       |  CAST((2000000000000 + (60 + rank)) // (2 * (60 + rank)) AS BIGINT) AS c
       | FROM dense
       | UNION ALL
       | SELECT query_id, neighbor_id,
       |  CAST((2000000000000 + (60 + rank)) // (2 * (60 + rank)) AS BIGINT) AS c
       | FROM lexical
       |), fused AS (
       | SELECT query_id, neighbor_id, CAST(sum(c) AS BIGINT) AS score_e12
       | FROM contribs GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, score_e12,
       | CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_e12 DESC, neighbor_id) AS INTEGER) AS rank
       |FROM fused
       |QUALIFY rank <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  /** The CDC gear-rule CTE chain over a caller-supplied `(doc_id,
    * text)` CTE named `src`: tokens, positions, per-DISTINCT-bigram FNV
    * (the fold is the expensive bit — dedup it), boundary flags, and
    * the running chunk index as `c(doc_id, p, t, chunk)` — composed
    * with a gate-specific final SELECT.
    */
  private[graft] def cdcChainSql(divisor: Long): String =
    s"""d AS (
       | SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
       | FROM src
       |), e AS (
       | SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS p FROM d WHERE len(toks) > 0
       |), f AS (
       | SELECT doc_id, p, toks[p] AS t,
       |  CASE WHEN p = 1 THEN NULL ELSE toks[p - 1] || ' ' || toks[p] || ':cdc' END AS bg
       | FROM e
       |), bgs AS (
       | SELECT bg, ${fnvModSql("bg", divisor)} AS hm
       | FROM (SELECT DISTINCT bg FROM f WHERE bg IS NOT NULL)
       |), fl AS (
       | SELECT f.doc_id, f.p, f.t,
       |  CASE WHEN f.bg IS NULL THEN 0 WHEN b.hm = 0 THEN 1 ELSE 0 END AS flag
       | FROM f LEFT JOIN bgs b ON f.bg = b.bg
       |), c AS (
       | SELECT doc_id, p, t,
       |  sum(flag) OVER (PARTITION BY doc_id ORDER BY p
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk
       | FROM fl
       |)""".stripMargin

  private[graft] val oracleSqlCmsCounts: String = {
      val hm = fnvModSql("x.g || ':cms' || CAST(x.i AS VARCHAR)", 1024L)
      s"""WITH toks AS (
         | SELECT list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS ts
         | FROM documents
         |), sh AS (
         | SELECT unnest(
         |  CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
         |       ELSE list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' '))
         |  END) AS g
         | FROM toks
         |), cnt AS (
         | SELECT g, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY 1
         |), u AS (
         | SELECT unnest([0, 1, 2, 3]) AS i
         |), cells AS (
         | SELECT x.i, $hm AS colv, CAST(sum(x.c) AS BIGINT) AS cellcnt
         | FROM (SELECT cnt.g, cnt.c, u.i FROM cnt CROSS JOIN u) x
         | GROUP BY 1, 2
         |), top AS (
         | SELECT g, c FROM cnt ORDER BY c DESC, g LIMIT 10
         |), qaddr AS (
         | SELECT x.g, x.c, x.i, $hm AS colv
         | FROM (SELECT top.g, top.c, u.i FROM top CROSS JOIN u) x
         |)
         |SELECT q.g AS item, q.c AS exact_cnt,
         | CAST(min(coalesce(cells.cellcnt, 0)) AS BIGINT) AS cms_est
         |FROM qaddr q LEFT JOIN cells ON cells.i = q.i AND cells.colv = q.colv
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    }

  /** FNV-1a of an arbitrary string SQL expression, reduced mod `m` —
    * the parameterized sibling of [[fnvBucketExpr]] (same byte fold,
    * caller-chosen input and modulus). `input` is inlined twice
    * (length + indexing), so keep it a cheap expression.
    */
  private[graft] def fnvModSql(input: String, m: Long): String =
    s"""(list_reduce(
       |    list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |      list_transform(range(1, length($input) + 1), i -> CAST(ascii(($input)[i]) AS HUGEINT))),
       |    (acc, b) -> ((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
       |                * 1099511628211 % CAST('18446744073709551616' AS HUGEINT)
       |  ) % $m)""".stripMargin

  /** Shared FNV-1a bucket CTE fragment (per DISTINCT token). */
  private[graft] val fnvBucketExpr =
    """CAST(list_reduce(
      |    list_prepend(CAST('14695981039346656037' AS HUGEINT),
      |      list_transform(range(1, length(s) + 1), i -> CAST(ascii(s[i]) AS HUGEINT))),
      |    (acc, b) -> ((acc // 256) * 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
      |                * 1099511628211 % CAST('18446744073709551616' AS HUGEINT)
      |  ) % 1024 AS BIGINT) AS bucket""".stripMargin

  /** Shared corpus-drift CTE chain (A = the src0 slice, B = the rest of
    * doc_id < 2000): per-side FNV bucket histograms, full join, totals
    * `t(na, nb)`, and per-bucket cross-normalized gap |a·N_b − c·N_a|
    * in HUGEINT as `g(bucket, cnt_a, cnt_b, gap)` — composed with a
    * gate-specific final SELECT (exact integers end to end).
    */
  private[graft] def corpusDriftSql(finalSelect: String): String =
    s"""WITH da AS (
       | SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       | FROM documents WHERE doc_id < 2000 AND source = 'src0'
       |), db AS (
       | SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       | FROM documents WHERE doc_id < 2000 AND source <> 'src0'
       |), toka AS (
       | SELECT unnest(toks) AS token FROM da
       |), tokb AS (
       | SELECT unnest(toks) AS token FROM db
       |), vba AS (
       | SELECT token,
       |  $fnvBucketExpr
       | FROM (SELECT DISTINCT token, token || ':drift' AS s FROM toka)
       |), vbb AS (
       | SELECT token,
       |  $fnvBucketExpr
       | FROM (SELECT DISTINCT token, token || ':drift' AS s FROM tokb)
       |), ca AS (
       | SELECT v.bucket, count(*) AS cnt
       | FROM toka tk JOIN vba v ON tk.token = v.token GROUP BY 1
       |), cb AS (
       | SELECT v.bucket, count(*) AS cnt
       | FROM tokb tk JOIN vbb v ON tk.token = v.token GROUP BY 1
       |), j AS (
       | SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
       |  COALESCE(ca.cnt, 0) AS cnt_a, COALESCE(cb.cnt, 0) AS cnt_b
       | FROM ca FULL JOIN cb ON ca.bucket = cb.bucket
       |), t AS (
       | SELECT sum(cnt_a) AS na, sum(cnt_b) AS nb FROM j
       |), g AS (
       | SELECT bucket, cnt_a, cnt_b,
       |  abs(CAST(cnt_a AS HUGEINT) * t.nb - CAST(cnt_b AS HUGEINT) * t.na) AS gap
       | FROM j, t
       |)
       |$finalSelect""".stripMargin

  private[graft] def dsirOracle(): String = {
    // no ln-based fallback (round-7 verdict #4): an unregistered weight
    // table fails by name, never silently re-derives the weights
    val wCte = gateTableOrError("dsir_w") match {
      case Left(err) => return err
      case Right(rows) =>
        s"""w AS (
           | SELECT * FROM (VALUES
           |   $rows) AS v(bucket, weight_e6)
           |)""".stripMargin
    }
    s"""WITH base AS (
       | SELECT doc_id, source,
       |  list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       | FROM documents WHERE doc_id < 2000
       |), tok AS (
       | SELECT doc_id, source, unnest(toks) AS token FROM base
       |), vb AS (
       | SELECT token,
       |  $fnvBucketExpr
       | FROM (SELECT DISTINCT token, token || ':dsir' AS s FROM tok)
       |), tk AS (
       | SELECT t.doc_id, t.source, v.bucket FROM tok t JOIN vb v ON t.token = v.token
       |), tc AS (
       | SELECT bucket, count(*) AS tcnt FROM tk WHERE source = 'src0' GROUP BY 1
       |), rc AS (
       | SELECT bucket, count(*) AS rcnt FROM tk GROUP BY 1
       |), $wCte
       |SELECT k.doc_id, CAST(sum(w.weight_e6) AS BIGINT) AS dsir_score_e6
       |FROM tk k JOIN w ON k.bucket = w.bucket
       |WHERE k.doc_id < 500
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The quality-margin chain as a CTE fragment ending in
    * `marg(doc_id, margin_e6)` — shared by the serving gate's oracle
    * and the calibration oracle. `docWhere` narrows the scored doc set
    * (both sides must filter identically or margins diverge).
    */
  private[graft] def qualityMarginCteSql(docWhere: String = "doc_id < 1000"): String = {
    // qmGateWeights is deterministic and data-independent, so the
    // literal table is computed EAGERLY here — no run-time registration,
    // no fallback branch (round-7 verdict #4)
    val wCte =
      s"""w AS (
         | SELECT * FROM (VALUES
         |   ${dsirWeightRows(qmGateWeights)}) AS v(bucket, weight_e6)
         |)""".stripMargin
    // per-OCCURRENCE weight sums — the value is identical to Spark's
    // Σ cnt·w_e6, purely BIGINT adds here (250000 = bias 0.25 ×10⁶)
    s"""base AS (
       | SELECT doc_id,
       |  list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       | FROM documents WHERE $docWhere
       |), tok AS (
       | SELECT doc_id, unnest(toks) AS token FROM base
       |), vb AS (
       | SELECT token,
       |  $fnvBucketExpr
       | FROM (SELECT DISTINCT token, token || ':qm' AS s FROM tok)
       |), tk AS (
       | SELECT t.doc_id, v.bucket FROM tok t JOIN vb v ON t.token = v.token
       |), $wCte, dot AS (
       | SELECT k.doc_id, sum(w.weight_e6) AS d
       | FROM tk k JOIN w ON k.bucket = w.bucket
       | GROUP BY 1
       |), marg AS (
       | SELECT b.doc_id,
       |  CAST(COALESCE(dot.d, 0) + 250000 AS BIGINT) AS margin_e6
       | FROM (SELECT DISTINCT doc_id FROM documents WHERE $docWhere) b
       | LEFT JOIN dot ON b.doc_id = dot.doc_id
       |)""".stripMargin
  }

  private[graft] def qualityMarginOracle(): String =
    s"""WITH ${qualityMarginCteSql()}
       |SELECT doc_id, margin_e6 FROM marg ORDER BY 1""".stripMargin

  /** Temperature-scaling grid search unrolled
    * ([[graft.operators.QualityModel.temperatureScaleE6]]): the
    * qm-gate margin chain, each grid temperature's rescaled margins
    * through the literal sigmoid table, the equal-width reliability
    * fold, argmin ECE with ties to the smallest temperature.
    */
  private[graft] def qualityTemperatureOracleSql(grid: Seq[Long]): String = {
    val tbl = graft.operators.Graph.sigmoidTablePpm()
    val stVals = tbl.zipWithIndex
      .map { case (v, i) => s"($i, $v)" }.mkString(", ")
    val gVals = grid.map(t => s"($t)").mkString(", ")
    s"""WITH ${qualityMarginCteSql("doc_id < 1000 AND n_chars IS NOT NULL")},
       |st AS (SELECT * FROM (VALUES $stVals) AS t(idx, sppm)),
       |tg AS (SELECT CAST(t_e6 AS BIGINT) AS t_e6
       |  FROM (VALUES $gVals) AS g(t_e6)),
       |lb AS (SELECT doc_id, CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS y
       |  FROM documents WHERE doc_id < 1000 AND n_chars IS NOT NULL),
       |sc AS (SELECT m.margin_e6, lb.y
       |  FROM marg m JOIN lb ON lb.doc_id = m.doc_id),
       |mt AS (SELECT tg.t_e6, sc.y,
       |  (sc.margin_e6 * 1000000) // tg.t_e6 AS mtv FROM sc CROSS JOIN tg),
       |pp AS (SELECT mt.t_e6, mt.y, st.sppm AS p FROM mt JOIN st ON st.idx =
       |  CASE WHEN mt.mtv <= -6000000 THEN 0
       |       WHEN mt.mtv >= 6000000 THEN ${tbl.length - 1}
       |       ELSE (mt.mtv + 6000000) * ${tbl.length} // 12000000 END),
       |bk AS (SELECT t_e6, least(9, (p * 10) // 1000000) AS b,
       |  CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np,
       |  CAST(sum(CAST(p AS HUGEINT)) AS HUGEINT) AS sp
       |  FROM pp GROUP BY 1, 2),
       |gp AS (SELECT t_e6, n,
       |  abs(CAST(sp // n AS BIGINT) -
       |      CAST((CAST(np AS HUGEINT) * 1000000) // n AS BIGINT)) AS gap
       |  FROM bk),
       |ec AS MATERIALIZED (SELECT t_e6,
       |  CAST(sum(CAST(n AS HUGEINT) * gap) // sum(n) AS BIGINT) AS ece_ppm
       |  FROM gp GROUP BY 1),
       |bst AS (SELECT ece_ppm, t_e6 FROM ec ORDER BY ece_ppm, t_e6 LIMIT 1)
       |SELECT ec.t_e6, ec.ece_ppm,
       | (ec.ece_ppm = bst.ece_ppm AND ec.t_e6 = bst.t_e6) AS chosen
       |FROM ec CROSS JOIN bst ORDER BY 1""".stripMargin
  }

  /** The quality-model TRAIN→SERVE closure unrolled
    * ([[graft.operators.QualityModel.trainLogisticEpochsE6]]): labels
    * from the length rule on doc_id < 1000, hashed-count features with
    * the bias as pseudo-bucket −1 (count 1 per labeled doc), `epochs`
    * full-batch fixed-point updates through the literal sigmoid table,
    * then the final weight table serves margins over the whole
    * doc_id < 2000 corpus — the sgnsTrainCteSql discipline applied to
    * the logistic family. HUGEINT for every gradient product; `//`
    * matches the trainer's BigInt truncation.
    */
  private[graft] def qualityTrainServeOracleSql(epochs: Int,
      lrPpm: Long): String = {
    val tbl = graft.operators.Graph.sigmoidTablePpm()
    val stVals = tbl.zipWithIndex
      .map { case (v, i) => s"($i, $v)" }.mkString(", ")
    val epochCtes = (1 to epochs).map { k =>
      s"""mg$k AS (
         | SELECT f.doc_id, CAST(sum(f.cnt * w.w) AS BIGINT) AS m
         | FROM fplus f JOIN w${k - 1} w ON w.bucket = f.bucket GROUP BY 1
         |), rr$k AS MATERIALIZED (
         | SELECT mg.doc_id, (lab.y * 1000000 - st.sppm) AS r
         | FROM mg$k mg JOIN lab ON lab.doc_id = mg.doc_id
         | JOIN st ON st.idx =
         |  CASE WHEN mg.m <= -6000000 THEN 0 WHEN mg.m >= 6000000 THEN ${tbl.length - 1}
         |       ELSE (mg.m + 6000000) * ${tbl.length} // 12000000 END
         |), gr$k AS (
         | SELECT f.bucket, CAST(sum(CAST(r.r AS HUGEINT) * f.cnt) AS HUGEINT) AS g
         | FROM fplus f JOIN rr$k r ON r.doc_id = f.doc_id GROUP BY 1
         |), w$k AS MATERIALIZED (
         | SELECT w.bucket,
         |  CAST(greatest(-10000000, least(10000000, w.w +
         |    CAST(($lrPpm * COALESCE(g.g, 0)) //
         |      (CAST(nn.n AS HUGEINT) * 1000000) AS BIGINT))) AS BIGINT) AS w
         | FROM w${k - 1} w LEFT JOIN gr$k g ON g.bucket = w.bucket CROSS JOIN nn
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH base AS (
       | SELECT doc_id,
       |  list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       | FROM documents
       | WHERE doc_id < 2000 AND text IS NOT NULL AND n_chars IS NOT NULL
       |), lab AS MATERIALIZED (
       | SELECT doc_id, CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS y
       | FROM documents
       | WHERE doc_id < 1000 AND text IS NOT NULL AND n_chars IS NOT NULL
       |), tokall AS MATERIALIZED (
       | SELECT doc_id, unnest(toks) AS token FROM base
       |), vb AS MATERIALIZED (
       | SELECT token,
       |  $fnvBucketExpr
       | FROM (SELECT DISTINCT token, token || ':qm' AS s FROM tokall)
       |), fplus AS MATERIALIZED (
       | SELECT t.doc_id, v.bucket, CAST(count(*) AS BIGINT) AS cnt
       | FROM tokall t JOIN vb v ON v.token = t.token
       | WHERE t.doc_id < 1000 GROUP BY 1, 2
       | UNION ALL
       | SELECT doc_id, -1, 1 FROM lab
       |), nn AS (
       | SELECT CAST(count(*) AS BIGINT) AS n FROM lab
       |), st AS (
       | SELECT * FROM (VALUES $stVals) AS t(idx, sppm)
       |), w0 AS MATERIALIZED (
       | SELECT CAST(unnest(range(-1, ${graft.operators.QualityModel.DefaultBuckets})) AS BIGINT) AS bucket,
       |  CAST(0 AS BIGINT) AS w
       |), $epochCtes, dotq AS (
       | SELECT k.doc_id, sum(w.w) AS d
       | FROM (SELECT t.doc_id, v.bucket FROM tokall t
       |       JOIN vb v ON v.token = t.token) k
       | JOIN w$epochs w ON w.bucket = k.bucket GROUP BY 1
       |), bs AS (
       | SELECT w FROM w$epochs WHERE bucket = -1
       |)
       |SELECT b.doc_id,
       | CAST(COALESCE(dotq.d, 0) + bs.w AS BIGINT) AS margin_e6
       |FROM (SELECT DISTINCT doc_id FROM base) b
       |LEFT JOIN dotq ON dotq.doc_id = b.doc_id CROSS JOIN bs
       |ORDER BY 1""".stripMargin
  }

  private[graft] def lmOracle(): String = {
    // no ln-based fallback (round-7 verdict #4): an unregistered weight
    // table fails by name, never silently re-derives the weights
    val rows = gateTableOrError("lm_wt") match {
      case Left(err) => return err
      case Right(r) => r
    }
    val wtCte =
      s""", wt AS (
         | SELECT * FROM (VALUES
         |   $rows) AS v(a, b, w)
         |)""".stripMargin
    val scCte =
      """sc AS (
        | SELECT g.doc_id, wt.w AS w
        | FROM bg g
        | LEFT JOIN c2 ON g.bp = c2.bp AND g.bc = c2.bc
        | LEFT JOIN c1 ON g.bp = c1.bp
        | JOIN wt ON wt.a = COALESCE(c2.c2, 0) + 1 AND wt.b = COALESCE(c1.c1, 0) + 1024
        | WHERE g.doc_id < 500
        |)""".stripMargin
    s"""WITH base AS (
       | SELECT doc_id, source,
       |  list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       | FROM documents WHERE doc_id < 2000
       |), tok AS (
       | SELECT doc_id, source, generate_subscripts(toks, 1) AS pos, unnest(toks) AS token
       | FROM base
       |), vb AS (
       | SELECT token,
       |  $fnvBucketExpr
       | FROM (SELECT DISTINCT token, token || ':dsir' AS s FROM tok)
       |), tb AS (
       | SELECT t.doc_id, t.source, t.pos, v.bucket FROM tok t JOIN vb v ON t.token = v.token
       |), bg AS (
       | SELECT a.doc_id, a.source, a.bucket AS bp, b.bucket AS bc
       | FROM tb a JOIN tb b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |), c2 AS (
       | SELECT bp, bc, count(*) AS c2 FROM bg WHERE source = 'src0' GROUP BY 1, 2
       |), c1 AS (
       | SELECT bp, sum(c2) AS c1 FROM c2 GROUP BY 1
       |)$wtCte, $scCte
       |SELECT doc_id, CAST(sum(w) AS BIGINT) AS lm_sum_e6,
       | CAST(count(*) AS BIGINT) AS n_bigrams,
       | (CAST(sum(w) AS DOUBLE) / 1000000.0) / count(*) AS mean_logp
       |FROM sc GROUP BY 1
       |ORDER BY 1""".stripMargin
  }

  def oracleSql: Map[String, String] =
    graft.gates.CoreGates.oracles ++
      graft.gates.DedupGates.oracles ++
      graft.gates.GraphGates.oracles ++
      graft.gates.MixLayoutGates.oracles ++
      graft.gates.PreferenceAnnotationGates.oracles ++
      graft.gates.RefSurfaceGates.oracles ++
      graft.gates.SimilarityGates.oracles ++
      graft.gates.StatsGates.oracles ++
      graft.gates.StreamGates.oracles ++
      graft.gates.TextGates.oracles
}

