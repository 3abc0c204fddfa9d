package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction — the first stage of every web-crawl
  * training pipeline: drop script/style/comment blocks WITH their
  * content, strip remaining tags, decode the common named entities,
  * squeeze whitespace.
  *
  * Built entirely from codegen'd builtins (`regexp_replace`/`replace`) —
  * map-only, no shuffle, no UDF. The regex subset is deliberately
  * RE2-compatible (inline `(?is)` flags, non-greedy, NO backreferences —
  * script and style get separate patterns), so a DuckDB oracle runs the
  * byte-identical chain and the driver gate hash-matches cleaned digests.
  *
  * Scope: tag/entity stripping, not a full HTML5 parser — CDATA,
  * numeric entities beyond `&#39;`, and malformed nesting pass through
  * conservatively (tags stripped, content kept). That is the standard
  * corpus-extraction trade: never silently drop body text.
  */
object Markup {

  /** Entity decode order matters: named entities first, `&amp;` LAST, so
    * the literal text "&amp;lt;" decodes to "&lt;" (one pass, never
    * double-decoded). */
  private val entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Cleaned-text column: blocks → tags → entities → whitespace. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = entities.foldLeft(noTags) { case (acc, (e, ch)) =>
      replace(acc, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Fenced code-block extraction — the code-corpus prep step markdown
    * sources need BEFORE text quality scoring (a doc that is 90 % code
    * fails every prose heuristic yet may be exactly what a code mix
    * wants): per document the fence count, total fenced characters,
    * and the comma-joined language tags (empty tag for plain fences).
    *
    * Map-only; the (?s) non-greedy pattern is RE2-compatible (no
    * backreferences), so a DuckDB oracle replays it byte-identically.
    * An unterminated trailing fence is NOT a match (conservative —
    * its content stays prose).
    *
    * @return (idCol, n_fences, n_fence_chars, langs) */
  def codeFences(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val pat = "(?s)```([a-z0-9_+]*)\\n(.*?)```"
    val langs = regexp_extract_all(col(textCol), lit(pat), lit(1))
    val bodies = regexp_extract_all(col(textCol), lit(pat), lit(2))
    df.select(col(idCol),
      size(bodies).cast("long").as("n_fences"),
      coalesce(aggregate(bodies, lit(0L), (a, b) => a + length(b)),
        lit(0L)).as("n_fence_chars"),
      array_join(langs, ",").as("langs"))
  }
}
