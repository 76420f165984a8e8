package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Corpus snapshot bookkeeping — the incremental-pipeline step between
 * two crawls/exports of the same corpus: which documents appeared,
 * disappeared, or changed content. Downstream curation re-runs only on
 * `added`/`changed` ids, so the diff is the work-list builder for every
 * incremental pass (dedup against the standing index, re-scoring,
 * re-embedding).
 */
object Snapshot {

  /** Classify every id across two snapshots as `added` (new side
    * only), `removed` (old side only), `changed` (both sides, content
    * fingerprints differ), or `unchanged`. Content identity is the
    * library's exact-dedup normalization
    * ([[TextFunctions.normalizeForFingerprint]]: lowercase, strip
    * punctuation, collapse whitespace) — cosmetic edits don't count as
    * changes, matching [[Dedup.exact]]'s notion of "same document".
    *
    * Scale shape: each side reduces to (id, 8-byte fingerprint) before
    * the one full-outer shuffle on id — document text never crosses an
    * exchange. A 64-bit collision reports one genuinely-changed doc as
    * `unchanged` (~n/2⁶⁴ per doc); the same documented trade as the
    * exact-dedup family.
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val fp = (c: Column) => xxhash64(TextFunctions.normalizeForFingerprint(c))
    val o = oldDf.select(col(idCol).as("_id"), fp(col(textCol)).as("_ofp"))
    val n = newDf.select(col(idCol).as("_id"), fp(col(textCol)).as("_nfp"))
    o.join(n, Seq("_id"), "full_outer")
      .select(
        col("_id").as(idCol),
        when(col("_nfp").isNull, "removed")
          .when(col("_ofp").isNull, "added")
          .when(col("_ofp") === col("_nfp"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
