package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition + normalization — the corpus-assembly primitives
  * behind domain-level mixing ([[Mixing]] keyed on host), blocklist
  * filtering, and URL-keyed dedup (crawls revisit the same page under
  * `http/https × fragment × tracking-param` variants; un-normalized,
  * every variant survives exact dedup).
  *
  * All regexp_extract/regexp_replace over an RE2-safe pattern subset —
  * map-only, codegen'd, and byte-identically replayable in the DuckDB
  * oracle (the spec additionally pins host extraction to Spark's own
  * `parse_url(..., 'HOST')` on well-formed URLs).
  *
  * Normalization: lowercase scheme+host, drop userinfo, drop default
  * ports (:80 http, :443 https), drop fragments, drop `utm_*` tracking
  * params, collapse a bare "?" — deliberately NOT touching path case or
  * percent-encoding (both are significant server-side).
  */
object Urls {

  def scheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** hostname: authority minus userinfo and port, lowercased. */
  def host(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** port as a string ("" when absent). */
  def port(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)", 1)

  def path(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  def query(u: Column): Column =
    regexp_extract(u, "\\?([^#]*)", 1)

  /** Last two host labels — the blocking/mixing key. A public-suffix
    * list would refine co.uk-style suffixes; two labels is the
    * deterministic, dependency-free approximation. */
  def registeredDomain(u: Column): Column =
    regexp_extract(host(u), "([^.]+\\.[^.]+)$", 1)

  /** Canonical form for URL-keyed dedup (see object doc for the exact
    * rule set). */
  def normalize(u: Column): Column = {
    // lowercase scheme+host (incl. port) only — path/query untouched;
    // scheme-less input skips the authority split but still gets the
    // fragment/tracking cleanup below
    val lowered = when(scheme(u) === "", u).otherwise(concat(
      lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)))
    val noUser = regexp_replace(lowered,
      "^([a-z][a-z0-9+.-]*://)[^/?#@]*@", "$1")
    val noFrag = regexp_replace(noUser, "#.*$", "")
    // no lookaheads (RE2): capture the terminator and re-emit it
    val noDefPort = regexp_replace(
      regexp_replace(noFrag, "^(https://[^/?#:]*):443($|[/?#].*)", "$1$2"),
      "^(http://[^/?#:]*):80($|[/?#].*)", "$1$2")
    // drop utm_* params wherever they sit, then tidy separators
    val noUtm = regexp_replace(noDefPort, "([?&])utm_[^&#]*", "$1")
    val tidy = regexp_replace(
      regexp_replace(noUtm, "\\?&+", "?"), "&&+", "&")
    regexp_replace(regexp_replace(tidy, "[?&]$", ""), "\\?$", "")
  }
}
