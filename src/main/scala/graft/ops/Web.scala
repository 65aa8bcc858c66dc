package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain canonicalization — the key feeder for the per-domain
  * operators a web corpus needs: capPerKey (q126) caps documents per
  * registered domain, splitByGroup (q127) keeps a domain's pages on one
  * side of a train/eval split, and the contamination matrix (q65) keys
  * on it. Raw crawl URLs disagree on scheme/host case, default ports,
  * userinfo, query strings and fragments for the SAME page, so keying
  * on the raw string under- or over-counts every one of those operators.
  *
  * Everything here is a PURE codegen'd Column projection (regexp_extract
  * + chained when()s — no UDF, no shuffle): at 100 TB this runs map-side
  * inside the scan's WholeStageCodegen span, exactly like the quality
  * signals. Parse rules (the subset of RFC 3986 the keys need):
  *
  *   - scheme  = leading `name://`, lowercased;
  *   - host    = authority minus userinfo (`…@`) and port (`:n`),
  *     lowercased;
  *   - path    = from the authority to the first `?` or `#`, case
  *     KEPT (paths are case-sensitive), empty path reads `/`;
  *   - canonical URL = `scheme://host path-or-/` — query, fragment,
  *     userinfo and port stripped; a string with no `scheme://` or an
  *     empty host canonicalizes to NULL (not a guess);
  *   - registered domain = longest matching bundled public suffix plus
  *     one label ([[publicSuffixes]]); hosts matching no suffix fall
  *     back to their last two labels (single-label hosts pass through).
  */
/** A parsed public-suffix rule set — the data behind the
  * registered-domain cut. Carries the three PSL rule classes (public
  * spec, publicsuffix.org/list format): exact suffixes, wildcard rules
  * (`*.ck`, stored as their parent: any ONE label under it is a public
  * suffix) and exception rules (`!www.ck`: NOT a public suffix despite
  * a matching wildcard). The bundled literal Seq stays the default
  * ([[PublicSuffixRules.bundled]], exact-only); a deployment loads the
  * full published list at runtime with [[Web.loadPublicSuffixes]] and
  * threads it through the `rules` parameters.
  *
  * Serializable and reference-carried into generated code
  * (`ctx.addReferenceObj`), so the hash-set walk stays one static-shape
  * call per row regardless of list size — never a generated
  * 9000-branch CASE.
  */
final class PublicSuffixRules private (
    private val exact: java.util.HashSet[String],
    private val wildcard: java.util.HashSet[String],
    private val exception: java.util.HashSet[String]) extends Serializable {

  /** True when `s` is a public suffix under the rules: exception beats
    * wildcard/exact; a wildcard `*.p` matches exactly one label over
    * `p`.
    */
  def isPublicSuffix(s: String): Boolean = {
    if (exception.contains(s)) return false
    if (exact.contains(s)) return true
    val i = s.indexOf('.')
    i > 0 && i < s.length - 1 && wildcard.contains(s.substring(i + 1))
  }

  /** The registered-domain cut (semantics of the bundled fold,
    * generalized to the three rule classes): a host that IS a bare
    * public suffix passes through; else the longest matching suffix —
    * the dot walk is left-to-right, so the FIRST hit is the longest
    * candidate — cuts to `label.suffix` (empty label → ""); no match
    * falls back to the last two labels (both non-empty, else "");
    * dotless hosts pass through. Shared by the interpreted and codegen
    * paths of the `RegisteredDomain` expression.
    */
  def registeredDomain(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    import org.apache.spark.unsafe.types.UTF8String
    val host = input.toString
    if (isPublicSuffix(host)) return input
    var dot = host.indexOf('.')
    while (dot >= 0) {
      val cand = host.substring(dot + 1)
      if (isPublicSuffix(cand)) {
        val labelEnd = dot
        val labelStart = host.lastIndexOf('.', labelEnd - 1) + 1
        return UTF8String.fromString(
          if (labelStart >= labelEnd) "" else host.substring(labelStart))
      }
      dot = host.indexOf('.', dot + 1)
    }
    val last = host.lastIndexOf('.')
    if (last < 0) return input
    val prev = host.lastIndexOf('.', last - 1)
    val ok = last + 1 < host.length && prev + 1 < last
    UTF8String.fromString(if (ok) host.substring(prev + 1) else "")
  }

  override def equals(o: Any): Boolean = o match {
    case r: PublicSuffixRules =>
      exact == r.exact && wildcard == r.wildcard && exception == r.exception
    case _ => false
  }

  override def hashCode: Int =
    31 * (31 * exact.hashCode + wildcard.hashCode) + exception.hashCode

  override def toString: String =
    s"PublicSuffixRules(${exact.size} exact, ${wildcard.size} wildcard, " +
      s"${exception.size} exception)"
}

object PublicSuffixRules {

  /** Exact-only rules from a plain suffix list. */
  def fromSuffixes(suffixes: Seq[String]): PublicSuffixRules = {
    val e = new java.util.HashSet[String]()
    suffixes.foreach(s => e.add(s.toLowerCase))
    new PublicSuffixRules(e, new java.util.HashSet[String](),
      new java.util.HashSet[String]())
  }

  /** Parse the standard PSL file format: `//` comment lines (including
    * the ICANN/PRIVATE section markers) and blanks skipped, each rule
    * is the text up to the first whitespace, lowercased; `!` marks an
    * exception, `*.` a wildcard.
    */
  def parse(lines: Iterator[String], source: String): PublicSuffixRules = {
    val exact = new java.util.HashSet[String]()
    val wild = new java.util.HashSet[String]()
    val exc = new java.util.HashSet[String]()
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.split("\\s+")(0).toLowerCase
        if (rule.startsWith("!")) exc.add(rule.substring(1))
        else if (rule.startsWith("*.")) wild.add(rule.substring(2))
        else exact.add(rule)
      }
    }
    if (exact.isEmpty && wild.isEmpty)
      throw new IllegalArgumentException(s"no public-suffix rules in $source")
    new PublicSuffixRules(exact, wild, exc)
  }

  /** The bundled default — [[Web.publicSuffixes]], exact-only, the rule
    * set every oracle-checked query runs under.
    */
  lazy val bundled: PublicSuffixRules = fromSuffixes(Web.publicSuffixes)
}

object Web {

  /** Bundled public-suffix-style literal list — a bounded, public-
    * knowledge subset of the community public-suffix idea: the big
    * shared-hosting suffixes, common multi-label ccTLD registrations,
    * then generic TLDs and ccTLDs. ORDER IS PRECEDENCE: multi-label
    * suffixes precede their parent TLD so the longest suffix wins
    * (`a.github.io` cuts to `a.github.io`'s label under `github.io`,
    * never to `github.io` under `io`). A deployment with the full
    * published list swaps this Seq — every operator and the oracle SQL
    * generator read only it.
    */
  val publicSuffixes: Seq[String] = Seq(
    // shared-hosting / platform suffixes (every user site is its own
    // registrable domain — folding them into one key would cap/split
    // millions of unrelated sites together)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "netlify.app", "pages.dev", "web.app",
    // multi-label ccTLD registrations
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "co.kr", "co.nz", "co.za",
    "com.mx", "com.ar", "com.tr", "com.sg",
    // generic TLDs and common ccTLDs
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "ai", "co", "dev", "app", "info", "biz", "xyz", "me",
    "uk", "de", "fr", "jp", "cn", "ru", "br", "in", "au", "ca",
    "nl", "it", "es", "se", "ch", "pl", "kr", "nz", "za", "mx",
    "ar", "tr", "sg", "us", "eu")

  /** Everything after `scheme://` (empty when the string has none). */
  private def urlRest(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)

  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host: authority (up to `/?#`) minus userinfo (up to the
    * last `@`) minus the port (after the first `:`).
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(regexp_extract(regexp_extract(urlRest(url),
      "^([^/?#]*)", 1), "([^@]*)$", 1), "^([^:]*)", 1))

  /** Path as written (case kept), up to the first `?` or `#`. */
  def urlPath(url: Column): Column =
    regexp_extract(urlRest(url), "^[^/?#]*([^?#]*)", 1)

  /** `scheme://host path` with case/port/userinfo/query/fragment
    * normalized away; NULL for a string with no scheme or host.
    */
  def canonicalizeUrl(url: Column): Column = {
    val s = urlScheme(url)
    val h = urlHost(url)
    val p = urlPath(url)
    when(s === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(s, lit("://"), h,
        when(p === "", lit("/")).otherwise(p)))
  }

  /** Longest-suffix registered-domain cut over [[publicSuffixes]]:
    * one label + the matched suffix; a host that IS a bare suffix
    * passes through; no match falls back to the last two labels.
    * ONE codegen'd expression (hash-set suffix walk) — the
    * [[registeredDomainComposed]] chained-when fold is branch-for-branch
    * equivalent (spec-pinned) but two folds in one stage blow janino's
    * 64 KB method limit (the q150 anti-join shape).
    */
  def registeredDomain(host: Column): Column =
    graft.functions.VectorFunctions.registeredDomain(host)

  /** The cut under a caller-supplied rule set (the full published PSL
    * via [[loadPublicSuffixes]]); same expression, rules ride as a
    * plan reference object.
    */
  def registeredDomain(host: Column, rules: PublicSuffixRules): Column =
    graft.functions.VectorFunctions.registeredDomain(host, rules)

  /** Read a standard-format public-suffix list (the publicsuffix.org
    * file format: `//` comments, `*.` wildcards, `!` exceptions)
    * through the Hadoop FS API — the
    * [[graft.functions.TokenCounters.loadMerges]] pattern: driver-read
    * once, rides the serialized expression to executors (~250 KB for
    * the full published list — plan payload, not a per-row cost).
    */
  def loadPublicSuffixes(path: String): PublicSuffixRules = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val in = p.getFileSystem(conf).open(p)
    try PublicSuffixRules.parse(
      scala.io.Source.fromInputStream(in, "UTF-8").getLines(), path)
    finally in.close()
  }

  /** The built-in-operator spelling of [[registeredDomain]] — the
    * equivalence oracle for the fused expression, and the exact shape
    * the DuckDB twin's generated CASE runs.
    */
  def registeredDomainComposed(host: Column): Column = {
    val fallback = when(host.contains("."),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)
    publicSuffixes.foldRight(fallback) { case (s, tail) =>
      val esc = s.replace(".", "\\.")
      when(host === s, host)
        .when(host.endsWith("." + s),
          regexp_extract(host, "([^.]+\\." + esc + ")$", 1))
        .otherwise(tail)
    }
  }

  /** Registered domain straight from a URL column. */
  def urlDomain(url: Column): Column = registeredDomain(urlHost(url))

  def urlDomain(url: Column, rules: PublicSuffixRules): Column =
    registeredDomain(urlHost(url), rules)

  /** The operator form: the input plus the three canonical key columns
    * (`canon_url`, `host`, `domain`) every downstream per-domain
    * operator keys on. Pure projection — no shuffle.
    */
  def withUrlKeys(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("domain", urlDomain(col(urlCol)))

  def withUrlKeys(df: DataFrame, urlCol: String,
                  rules: PublicSuffixRules): DataFrame =
    df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("domain", urlDomain(col(urlCol), rules))

  /** Domain-blocklist exclusion — the crawl-policy filter every web
    * corpus runs before anything else looks at the text: rows whose
    * REGISTERED domain (the [[registeredDomain]] cut, so `a.evil.com`
    * and `b.evil.com` both match a blocklisted `evil.com`) appears in
    * `blocked` are dropped. The blocklist is policy-bounded (site
    * lists run to ~10⁵ rows, never corpus-scale), so the anti-join
    * pins it as the BROADCAST side — the corpus never shuffles.
    * Blocklist entries are matched as written (callers hold registered
    * domains, the list's natural currency).
    */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocked: DataFrame,
                           blockedCol: String = "domain"): DataFrame =
    filterBlockedDomains(df, urlCol, blocked, blockedCol,
      PublicSuffixRules.bundled)

  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocked: DataFrame, blockedCol: String,
                           rules: PublicSuffixRules): DataFrame =
    df.join(
      broadcast(blocked.select(col(blockedCol).as("_blocked_domain"))),
      urlDomain(col(urlCol), rules) === col("_blocked_domain"),
      "left_anti")

  // ------------------------------------------------------------------
  // Robots/noindex compliance gate
  // ------------------------------------------------------------------
  //
  // The OTHER crawl-policy filter beside the domain blocklist: a page
  // that asks not to be indexed (`X-Robots-Tag: noindex` response
  // header, or `<meta name="robots" content="… noindex …">` in the
  // head) is asking not to be kept — standard crawl-pipeline practice
  // honors it at intake, before any text leaves the reader. Both
  // checks are pure map-side predicates (one rlike each, inside the
  // scan's codegen span): the header check needs no decode at all; the
  // meta check runs on the decoded html the intake already paid for.

  /** `noindex` as a directive token in an `X-Robots-Tag` value —
    * matched case-insensitively at token boundaries so `noindex`,
    * `NOINDEX, nofollow` and the agent-scoped `googlebot: noindex`
    * all hit, while a hypothetical `nonoindex` token does not. Null
    * (header absent) is NOT noindex.
    */
  def robotsHeaderNoindex(header: Column): Column =
    coalesce(header.rlike("(?i)(^|[\\s,:;])noindex([\\s,;]|$)"), lit(false))

  /** `<meta name="robots" …>` whose content carries a `noindex`
    * directive — both attribute orders, quoted or bare values,
    * case-insensitive across tag/attribute/directive. Null html is
    * NOT noindex (nothing asked for anything).
    */
  def metaRobotsNoindex(html: Column): Column = {
    val nameFirst = "(?is)<meta\\b[^>]*\\bname\\s*=\\s*[\"']?robots\\b" +
      "[^>]*\\bcontent\\s*=\\s*[\"']?[^\"'>]*\\bnoindex\\b"
    val contentFirst = "(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*[\"']?" +
      "[^\"'>]*\\bnoindex\\b[^>]*\\bname\\s*=\\s*[\"']?robots\\b"
    coalesce(html.rlike(nameFirst) || html.rlike(contentFirst), lit(false))
  }

  /** The compliance drop-gate over a decoded responses frame: keep rows
    * that neither header- nor meta-opt out. `robotsCol` may be absent
    * (frames that predate the reader's header surface) — then only the
    * meta check applies.
    */
  def robotsGate(df: DataFrame, htmlCol: String,
                 robotsCol: String = "http_robots"): DataFrame = {
    val headerHit =
      if (df.columns.contains(robotsCol)) robotsHeaderNoindex(col(robotsCol))
      else lit(false)
    df.where(!headerHit && !metaRobotsNoindex(col(htmlCol)))
  }

  // ------------------------------------------------------------------
  // HTML → text extraction
  // ------------------------------------------------------------------
  //
  // The other half of the web-corpus intake problem: the crawl hands
  // you markup, every downstream text operator (dedup shingles, quality
  // signals, tokenizers, LM scores) wants the rendered text. The
  // extraction is a fixed, ORDERED rule chain — each rule one
  // regexp_replace — so the whole thing compiles to a pure map-side
  // projection inside the scan's WholeStageCodegen span (same scale
  // shape as canonicalizeUrl: no UDF, no shuffle, no Exchange at any
  // corpus size). The rules live here as DATA so the DuckDB oracle SQL
  // is GENERATED from the same constants (SparkEntry.htmlToTextSql) —
  // the pattern text is chosen to mean the same thing to Java regex and
  // RE2: inline (?is) flags, non-greedy spans, `\b`, char classes —
  // no lookaround, no backreferences.
  //
  // Rule order is load-bearing and mirrors how browsers produce text:
  //   1. non-rendered subtrees go first (comments, <script>, <style>) —
  //      their CONTENT must vanish, and it may contain bare `<`/`>`
  //      that would derail the generic tag stripper;
  //   2. block-level boundaries become line breaks, table cells become
  //      spaces (word-separating, not line-breaking);
  //   3. every remaining tag renders as nothing (inline markup joins
  //      its surroundings: `a<b>b</b>` renders "ab");
  //   4. entities decode AFTER tag stripping (decoding first would
  //      fabricate tags: `&lt;b&gt;` must survive as literal "<b>"),
  //      in ONE non-rescanning pass so `&amp;lt;` yields "&lt;", not
  //      "<" (general decode: numeric, hex, named — see stage 2 below);
  //   5. whitespace canonicalization: horizontal runs to one space,
  //      trimmed line edges, newline runs to one newline.

  /** Stage-1 structural rules (applied first, in order). */
  val htmlStripRules: Seq[(String, String)] = Seq(
    ("(?s)<!--.*?-->", " "),
    ("(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
    ("(?is)<style\\b[^>]*>.*?</style\\s*>", " "),
    ("(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|thead|tbody|blockquote|pre|section|article|header|footer|form|hr|dt|dd|dl)\\b[^>]*>", "\n"),
    ("(?i)</?(?:td|th)\\b[^>]*>", " "),
    ("<[^>]*>", ""))

  /** Stage-2: general HTML entity decoding — a SINGLE left-to-right
    * pass that replaces each entity token exactly once and never
    * rescans its own output (the HTML5 non-recursive semantics). That
    * single-pass shape is what the old amp-last rule ordering encoded:
    * `&amp;lt;` yields "&lt;", never "<", because the `lt;` after the
    * decoded `&` is plain output text, not a new token. Three token
    * forms: decimal `&#NNN;` (1–7 digits), hex `&#xHH;` (1–6 digits,
    * either `x` case), and the named set below. Anything else — unknown
    * names, out-of-range or surrogate codepoints, unterminated
    * entities, a bare `&` — survives literally. Codepoint 160
    * (`&nbsp;`/`&#160;`/`&#xa0;`) renders as a PLAIN space, the
    * rendered-text convention stage 3 expects (a real U+00A0 would
    * dodge the whitespace collapse and poison shingles/tokenizers with
    * an invisible distinct character).
    */

  /** The named entities stage 2 decodes (name → Unicode codepoint):
    * the XML five + the HTML4 Latin-1 accents + the common punctuation
    * names dense in real crawl text. Case-sensitive, as written in the
    * standard list. Single source for the scanner, the composed Column
    * spelling, and the generated DuckDB oracle CASE.
    */
  val htmlNamedEntities: Seq[(String, Int)] = Seq(
    "amp" -> 38, "lt" -> 60, "gt" -> 62, "quot" -> 34, "apos" -> 39,
    "nbsp" -> 160, "shy" -> 173,
    "mdash" -> 8212, "ndash" -> 8211,
    "lsquo" -> 8216, "rsquo" -> 8217, "sbquo" -> 8218,
    "ldquo" -> 8220, "rdquo" -> 8221, "bdquo" -> 8222,
    "hellip" -> 8230, "bull" -> 8226, "middot" -> 183,
    "prime" -> 8242, "Prime" -> 8243,
    "dagger" -> 8224, "Dagger" -> 8225, "permil" -> 8240,
    "laquo" -> 171, "raquo" -> 187,
    "copy" -> 169, "reg" -> 174, "trade" -> 8482,
    "deg" -> 176, "plusmn" -> 177, "times" -> 215, "divide" -> 247,
    "frac14" -> 188, "frac12" -> 189, "frac34" -> 190,
    "sup1" -> 185, "sup2" -> 178, "sup3" -> 179,
    "micro" -> 181, "para" -> 182, "sect" -> 167,
    "cent" -> 162, "pound" -> 163, "curren" -> 164, "yen" -> 165,
    "euro" -> 8364, "iexcl" -> 161, "iquest" -> 191,
    "ensp" -> 8194, "emsp" -> 8195, "thinsp" -> 8201,
    "zwnj" -> 8204, "zwj" -> 8205, "lrm" -> 8206, "rlm" -> 8207,
    "agrave" -> 224, "aacute" -> 225, "acirc" -> 226, "atilde" -> 227,
    "auml" -> 228, "aring" -> 229, "aelig" -> 230, "ccedil" -> 231,
    "egrave" -> 232, "eacute" -> 233, "ecirc" -> 234, "euml" -> 235,
    "igrave" -> 236, "iacute" -> 237, "icirc" -> 238, "iuml" -> 239,
    "ntilde" -> 241, "ograve" -> 242, "oacute" -> 243, "ocirc" -> 244,
    "otilde" -> 245, "ouml" -> 246, "oslash" -> 248,
    "ugrave" -> 249, "uacute" -> 250, "ucirc" -> 251, "uuml" -> 252,
    "yacute" -> 253, "szlig" -> 223)

  /** The stage-2 tokenizer — the same language in java.util.regex
    * (Spark composed spelling) and RE2 (DuckDB oracle): alternation is
    * leftmost-first in both, no lookaround, no backreferences.
    * Concatenating the matches reconstructs the input exactly: every
    * position is covered by an entity form, a run of non-`&` text, or
    * a bare `&`. The bounded repeats ({1,7} decimal / {1,6} hex /
    * {1,31} name tail) keep decode inputs in integer range; a longer
    * run simply fails the `;` and survives literally.
    */
  val htmlEntityTokenPattern: String =
    "&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};|&[a-zA-Z][a-zA-Z0-9]{1,31};|[^&]+|&"

  /** The HTML5 numeric-entity overrides for 0x80–0x9F (public spec,
    * "character reference code" table): legacy pages write `&#151;`
    * MEANING the windows-1252 em-dash, and every browser renders it
    * that way — a straight C1-control decode would put invisible
    * control bytes in training text. Codes absent here (0x81, 0x8D,
    * 0x8F, 0x90, 0x9D) decode to themselves per the spec.
    */
  val htmlNumericOverrides: Seq[(Int, Int)] = Seq(
    0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
    0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
    0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
    0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
    0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)

  private val numericOverrideMap: Map[Int, Int] = htmlNumericOverrides.toMap

  /** Rendered form of a decoded codepoint; null = not decodable (zero,
    * beyond U+10FFFF, or a surrogate), keep the token literal. 160
    * renders as a plain space; 0x80–0x9F go through the HTML5
    * windows-1252 override table above.
    */
  def decodedCodepoint(cp0: Int): String = {
    val cp = numericOverrideMap.getOrElse(cp0, cp0)
    if (cp == 160) " "
    else if (cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
      new String(Character.toChars(cp))
    else null
  }

  private val namedEntityMap: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    htmlNamedEntities.foreach { case (nm, cp) => m.put(nm, decodedCodepoint(cp)) }
    m
  }

  /** The single-pass scanner — the hot path shared by the fused
    * [[graft.functions.VectorFunctions.htmlToText]] expression's
    * interpreted and codegen modes. Hand-rolled (no regex) but
    * token-for-token equivalent to tokenizing with
    * [[htmlEntityTokenPattern]] and mapping each token (the composed
    * spelling below; equivalence spec-pinned): the greedy digit/name
    * scan plus an immediate `;` check accepts exactly the regex's
    * matches, because a shorter repeat can never end at `;`.
    */
  def decodeHtmlEntities(s: String): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (amp >= 0) {
      sb.append(s, i, amp)
      i = amp
      var consumed = 1      // bare '&' unless a full token parses
      var decoded: String = null
      val j = i + 1
      if (j < n && s.charAt(j) == '#') {
        var k = j + 1
        var hex = false
        if (k < n && (s.charAt(k) == 'x' || s.charAt(k) == 'X')) {
          hex = true; k += 1
        }
        val d0 = k
        val maxD = if (hex) 6 else 7
        while (k < n && k - d0 < maxD &&
            (if (hex) isHexDigit(s.charAt(k)) else isDecDigit(s.charAt(k))))
          k += 1
        if (k > d0 && k < n && s.charAt(k) == ';') {
          consumed = k + 1 - i
          decoded = decodedCodepoint(
            java.lang.Integer.parseInt(s.substring(d0, k), if (hex) 16 else 10))
        }
      } else if (j < n && isAsciiAlpha(s.charAt(j))) {
        var k = j + 1
        while (k < n && k - (j + 1) < 31 && isAsciiAlnum(s.charAt(k))) k += 1
        if (k > j + 1 && k < n && s.charAt(k) == ';') {
          consumed = k + 1 - i
          decoded = namedEntityMap.get(s.substring(j, k))
        }
      }
      if (decoded != null) sb.append(decoded)
      else sb.append(s, i, i + consumed)
      i += consumed
      amp = s.indexOf('&', i)
    }
    sb.append(s, i, n)
    sb.toString
  }

  private def isDecDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def isAsciiAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isAsciiAlnum(c: Char): Boolean =
    isAsciiAlpha(c) || isDecDigit(c)

  /** Stage 2 in built-in operators — tokenize with the shared pattern,
    * decode each token with a generated CASE, rejoin. format_string
    * rides java.util.Formatter's `%c`, which renders an int CODEPOINT
    * (surrogate pairs included); the when-guards keep it off invalid
    * values. The in-engine equivalence oracle for the scanner (and the
    * exact shape the DuckDB twin runs, via list_transform/chr).
    */
  def decodeHtmlEntitiesComposed(c: Column): Column = {
    def render(tok: Column, cp: Column): Column =
      htmlNumericOverrides.foldLeft(when(cp === 160, lit(" "))) {
        case (acc, (code, mapped)) =>
          acc.when(cp === code, lit(new String(Character.toChars(mapped))))
      }
        .when(cp.between(1, 0x10FFFF) && !cp.between(0xD800, 0xDFFF),
          format_string("%c", cp))
        .otherwise(tok)
    val decodedTok = (x: Column) => {
      val dec = x.substr(lit(3), length(x) - 3).cast("int")
      val hexv = conv(x.substr(lit(4), length(x) - 4), 16, 10).cast("int")
      val numeric = when(x.rlike("^&#[0-9]{1,7};$"), render(x, dec))
        .when(x.rlike("^&#[xX][0-9a-fA-F]{1,6};$"), render(x, hexv))
      htmlNamedEntities.foldLeft(numeric) { case (acc, (nm, cp)) =>
        acc.when(x === s"&$nm;", lit(decodedCodepoint(cp)))
      }.otherwise(x)
    }
    array_join(
      transform(regexp_extract_all(c, lit(htmlEntityTokenPattern), lit(0)),
        decodedTok),
      "")
  }

  /** Stage-3 whitespace canonicalization (applied last, in order). */
  val htmlWhitespaceRules: Seq[(String, String)] = Seq(
    ("[ \\t\\r]+", " "),
    (" ?\\n ?", "\n"),
    ("\\n+", "\n"),
    // ^/$ anchor the WHOLE string in both engines (no multiline flag)
    ("^\\n|\\n$", ""))

  /** Rendered text of an HTML column: strip rules → entity decode →
    * whitespace rules + a final (space-only) trim, as ONE codegen'd
    * expression — the [[htmlToTextComposed]] spelling is byte-identical
    * (spec-pinned) but inlines every rule into the enclosing stage's
    * generated method; composed into a real intake projection that
    * crosses janino's 64 KB limit and drops the whole stage out of
    * codegen.
    */
  def htmlToText(html: Column): Column =
    graft.functions.VectorFunctions.htmlToText(html)

  /** The built-in-operator spelling of [[htmlToText]] — the equivalence
    * oracle for the fused expression (and the exact shape the DuckDB
    * twin runs).
    */
  def htmlToTextComposed(html: Column): Column = {
    def fold(rules: Seq[(String, String)], in: Column): Column =
      rules.foldLeft(in) { case (c, (p, r)) => regexp_replace(c, p, r) }
    trim(fold(htmlWhitespaceRules,
      decodeHtmlEntitiesComposed(fold(htmlStripRules, html))))
  }

  /** The operator form: id + extracted text. */
  def extractHtml(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol), htmlToText(col(htmlCol)).as("plain_text"))

  /** The WEB-CORPUS INTAKE pipeline — what runs between "crawl dump" and
    * the curation chain ([[Curation.curate]] assumes clean text; this
    * produces it): markup → [[htmlToText]] rendered text → Gopher-rule
    * keep gate ([[TextAnalysis.gopherKeep]], evaluated on the EXTRACTED
    * text while it still has line structure — normalization below
    * collapses the newlines the bullet/ellipsis rules read) →
    * [[TextAnalysis.normalizeText]] canonical form → exact dedup on the
    * normalized text (min-id representative, multiplicity kept — crawls
    * re-fetch the same page endlessly; this is where that mass dies).
    *
    * One row per surviving representative: (doc_id, norm_text, n_dupes).
    *
    * `redactPii` threads the q45 scrub ([[TextAnalysis.redactPiiCol]])
    * between normalization and the dedup — pages differing only in
    * embedded PII (session-stamped emails, per-visitor IPs in chrome)
    * then collapse as the duplicates they are, and nothing downstream
    * ever sees the raw identifiers.
    *
    * Scale shape: extract + gate + normalize (+ redact) are ONE
    * map-side codegen'd projection over the scan (no UDF, no exchange);
    * the dedup is a single shuffle whose key is the fixed-width md5 of
    * the normalized text — the document rides as the min-struct
    * payload, never as the shuffle KEY (the [[Dedup.exact]] scaladoc's
    * 100-TB rule), with map-side combine collapsing each partition's
    * duplicates before the wire.
    */
  def intake(df: DataFrame, idCol: String, htmlCol: String,
             th: TextAnalysis.GopherThresholds =
               TextAnalysis.GopherThresholds(),
             lowercase: Boolean = false,
             redactPii: Boolean = false): DataFrame = {
    val plain = htmlToText(col(htmlCol))
    val norm = TextAnalysis.normalizeText(col("plain_text"), lowercase)
    df.where(col(htmlCol).isNotNull)
      .select(col(idCol).as("doc_id"), plain.as("plain_text"))
      .where(TextAnalysis.gopherKeep(col("plain_text"), th))
      .select(col("doc_id"),
        (if (redactPii) TextAnalysis.redactPiiCol(norm) else norm)
          .as("norm_text"))
      .select(md5(col("norm_text")).as("_k"),
        struct(col("doc_id"), col("norm_text")).as("_r"))
      .groupBy(col("_k"))
      .agg(min(col("_r")).as("_r"), count(lit(1)).as("n_dupes"))
      .select(col("_r.doc_id").as("doc_id"),
        col("_r.norm_text").as("norm_text"), col("n_dupes"))
  }
}
