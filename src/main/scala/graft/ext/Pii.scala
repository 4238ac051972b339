package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection/redaction and URL/domain analytics over a text column —
  * the compliance pass every web-scale training corpus runs before any
  * other processing.
  *
  * All of it is narrow per-row regex work inside whole-stage codegen (no
  * UDFs, no shuffles except the final domain groupBy), so throughput
  * scales linearly with input splits: at 100 TB the scan cost IS the
  * job cost. The patterns deliberately use the portable regex subset
  * (no backreferences, no lookaround) so the identical pattern text runs
  * under Java regex (Spark) and RE2 (DuckDB oracle replay, and most
  * other engines a redaction audit would be replayed on).
  */
object Pii {

  /** Conservative RFC-5322-ish email shape: local@domain.tld. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone: 3-3-4 digit groups. */
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** Dotted-quad IPv4 (over-matches >255 octets on purpose — redaction
    * policy prefers false positives over leaks). */
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** Scheme + host of an http(s) URL; the path is left in place. */
  val UrlRe = "https?://[A-Za-z0-9.-]+"

  /** Per-document PII census + redacted text in ONE projection (one scan,
    * zero shuffles). Counts are taken on the raw text; redaction applies
    * email → IPv4 → phone in that fixed order so overlapping matches
    * resolve identically on every engine. */
  def scanRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nEmails = regexp_count(t, lit(EmailRe)).cast("long")
    val nIps    = regexp_count(t, lit(Ipv4Re)).cast("long")
    val nPhones = regexp_count(t, lit(PhoneRe)).cast("long")
    df.select(col(idCol),
      nEmails.as("n_emails"),
      nPhones.as("n_phones"),
      nIps.as("n_ips"),
      (nEmails + nPhones + nIps > 0).as("has_pii"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("redacted"))
  }

  /** Host-level URL stats: every http(s) host mentioned anywhere in the
    * corpus, with mention and distinct-document counts. The explode
    * multiplies rows only by URLs-per-doc (small); the single shuffle is
    * the groupBy on host — exactly the aggregation key, so map-side
    * partial aggregation collapses the hot hosts before the exchange. */
  def domainStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(expr(s"regexp_extract_all($textCol, '$UrlRe', 0)")).as("url"))
      .select(col(idCol), regexp_replace(col("url"), "https?://", "").as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_mentions"),
        count_distinct(col(idCol)).as("n_docs"))
}
