package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-keyed corpus curation: host extraction and per-domain frequency
  * caps — the crawl-side defense against a handful of giant hosts
  * dominating the training mix.
  */
object Urls {

  /** Lowercased host of a URL — split algebra (everything between the
    * FIRST "//" and the next "/"; a later "//" in a path or redirect
    * param must not win), deliberately NOT `parse_url`: the same
    * operations exist in every SQL dialect, so host assignment replays
    * exactly in the oracle (`split_part(split_part(url,'//',2),'/',1)`),
    * and all of instr/substr/substring_index are codegen'd builtins (no
    * UDF, no regex engine in the hot path). No "//" ⇒ empty host, like
    * split_part's missing-field ''. Port/userinfo, if present, are kept
    * as part of the host key — for a frequency cap the key only has to
    * be stable, not RFC-parsed. */
  def hostOf(url: Column): Column = {
    val p = instr(url, "//")
    lower(when(p > 0,
      substring_index(url.substr(p + 2, length(url)), "/", 1))
      .otherwise(lit("")))
  }

  /** Keep at most `cap` rows per key, chosen in deterministic md5-hash
    * order of `idCol` (= a reproducible uniform shuffle within the key,
    * same trick as [[Sampling.stratifiedExact]]). ONE shuffle on the key;
    * the per-key sort is window-local. Heavy hosts are exactly what this
    * operator exists for — at 100 TB, a single pathological domain is
    * still bounded by its own partition's sort, and AQE's skew handling
    * splits the physical work; the output is capped regardless. */
  def capPerKey(
      df: DataFrame, keyCol: Column, idCol: Column, cap: Int): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(Sampling.md5Hash60(idCol), idCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** [[capPerKey]] keyed by the URL's host: at most `cap` documents per
    * domain, deterministically chosen. */
  def domainCap(
      df: DataFrame, urlCol: Column, idCol: Column, cap: Int): DataFrame =
    capPerKey(df.withColumn("host", hostOf(urlCol)), col("host"), idCol, cap)

  /** Canonical URL form for crawl dedup: strip the fragment, drop
    * tracking query parameters (utm_*, fbclid, gclid), lowercase the
    * scheme+host prefix (paths stay case-sensitive), and drop a now-empty
    * `?`. Two URLs differing only in those never count as distinct pages,
    * so normalization BEFORE url-keyed dedup/caps collapses the
    * re-crawl noise a tracking-param explosion creates.
    *
    * Entirely codegen'd string builtins plus two regexp_replace in the
    * Java∩RE2 pattern subset (the redactPii precedent), so the
    * normalization replays byte-exactly in the oracle — and it is a pure
    * per-row projection: zero shuffles, runs inside the scan at 100 TB.
    * No "//" ⇒ returned unchanged apart from fragment/query handling
    * (same degenerate-input stance as [[hostOf]]). */
  def normalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    // query: everything AFTER the first '?' (empty when none); substr by
    // computed offset, not split_part — the query may itself contain '?'
    val q = when(instr(noFrag, "?") > 0,
      noFrag.substr(instr(noFrag, "?") + 1, length(noFrag))).otherwise(lit(""))
    val cleaned = regexp_replace(
      regexp_replace(q, "(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*", ""),
      "^&", "")
    val p = instr(base, "//")
    val after = base.substr(p + 2, length(base))
    val host = substring_index(after, "/", 1)
    val path = after.substr(length(host) + 1, length(after))
    val normBase = when(p > 0,
      concat(lower(concat(base.substr(lit(1), p + 1), host)), path))
      .otherwise(base)
    when(cleaned === "", normBase)
      .otherwise(concat(normBase, lit("?"), cleaned))
  }
}
