package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language ID, quality
  * scoring, token counting, fingerprinting. All pure `functions._`
  * expressions (codegen'd, shuffle-free per-row transforms) so each is
  * reproducible as plain SQL — the DuckDB oracle runs the same formulas.
  */
object TextAnalysis {

  /** Whitespace token count (0 for empty/blank). */
  def tokenCount(text: Column): Column =
    size(filter(split(trim(text), "\\s+"), t => t =!= ""))

  /** Context-window chunking — the training-window prep step: split each
    * document's whitespace tokens into `window`-token chunks starting
    * every `stride` tokens (stride < window ⇒ overlapping windows, the
    * standard LM pretraining shape). Documents at or under `window`
    * yield exactly one chunk; otherwise ceil((n−window)/stride)+1, so
    * the last chunk always reaches the document's end. Emits one row per
    * (doc, chunk): (idCol, chunk_idx, n_tokens, chunk_fp) — the md5
    * fingerprint pins the exact chunk CONTENT cross-engine without
    * shipping window-sized strings through the compare.
    *
    * Scale shape: one narrow projection + a posexplode — per-doc work is
    * linear in tokens, no shuffle at all (chunk rows inherit the scan's
    * partitioning; a downstream pack/shuffle is the caller's choice). */
  def chunkWindows(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, window: Int = 64, stride: Int = 48)
      : org.apache.spark.sql.DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    // integer-exact chunk count (no float ceil): (n−W + S−1) div S + 1
    val n = size(col("_t"))
    val nc = when(n <= window, lit(1))
      .otherwise(((n - lit(window) + lit(stride - 1)) / lit(stride))
        .cast("int") + 1)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("_t"))
      .select(col(idCol), col("_t"),
        explode(sequence(lit(0), nc - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        size(slice(col("_t"), col("chunk_idx") * stride + 1, lit(window)))
          .as("n_tokens"),
        md5(array_join(slice(col("_t"), col("chunk_idx") * stride + 1,
          lit(window)), " ")).as("chunk_fp"))
  }

  /** BPE-ish subword-unit estimate: words + extra units for long words
    * (a word of length L costs ceil(L/4) units) + digit/punct runs. */
  def subwordCount(text: Column): Column =
    aggregate(
      filter(split(trim(lower(text)), "\\s+"), t => t =!= ""),
      lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  /** Marker-word occurrence count: occurrences of ` w ` in the padded
    * lowercased text (match-count formula reproducible in any SQL engine:
    * (len(x) - len(replace(x, w))) / len(w); literal replace on both
    * sides so non-overlap semantics agree). */
  private def occurrences(padded: Column, w: String): Column =
    ((length(padded) - length(replace(padded, lit(" " + w + " "), lit(""))))
      .cast("long") / lit((w.length + 2).toLong)).cast("long")

  /** Language markers: tiny per-language stopword lists (n-gram heuristic).
    * Deterministic argmax with fixed tie order (en,de,fr,es,zh). Single
    * source of truth lives next to the one-pass kernel. */
  val langMarkers: Seq[(String, Seq[String])] =
    graft.functions.TextScore.langMarkers

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers.map { case (lang, ws) =>
      lang -> ws.map(w => occurrences(padded, w)).reduce(_ + _)
    }
  }

  /** Best-scoring language, 'und' when no marker hits.
    *
    * r18: delegated to the one-pass codegen kernel
    * [[graft.functions.TextScore.langId]] — bit-identical values
    * (locked by `TextScoreSpec` against [[legacyLangId]], the original
    * `functions._` tree, which `langIdSql` still replays for the
    * oracle), ~an order of magnitude less per-row string work, and a
    * tiny expression tree where the old one re-inlined 25 marker
    * subtrees at every optimizer duplication site. */
  def langId(text: Column): Column =
    graft.functions.TextScore.langIdCol(text)

  /** The pre-r18 pure-`functions._` langId tree — kept as the
    * equivalence reference for `TextScoreSpec` (it IS the formula the
    * DuckDB oracle replays via [[langIdSql]]). */
  private[graft] def legacyLangId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** SQL text of the same langId formula for the DuckDB oracle. */
  def langIdSql(textExpr: String): String = {
    def occ(w: String) =
      s"CAST((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
    val scoreDefs = langMarkers.map { case (lang, ws) =>
      s"${ws.map(occ).mkString(" + ")} AS s_$lang"
    }.mkString(", ")
    val best = "greatest(" + langMarkers.map("s_" + _._1).mkString(", ") + ")"
    val caseExpr = langMarkers.reverse.foldLeft("'und'") { case (acc, (lang, _)) =>
      s"CASE WHEN s_$lang = best AND best > 0 THEN '$lang' ELSE $acc END"
    }
    s"""(SELECT $caseExpr FROM (SELECT $scoreDefs, $best AS best
       |  FROM (SELECT ' ' || lower($textExpr) || ' ' AS p)))""".stripMargin
  }

  /** Quality score in [0,100]: length band + alpha ratio + stopword
    * presence + token-length band − punctuation excess. Pure integer
    * comparisons (no division) so any engine reproduces it bit-exactly.
    *
    * r18: delegated to the one-pass codegen kernel
    * [[graft.functions.TextScore.qualityScore]] — bit-identical values
    * (locked by `TextScoreSpec` against [[legacyQualityScore]], which
    * [[qualityScoreSql]] still replays for the oracle). */
  def qualityScore(text: Column): Column =
    graft.functions.TextScore.qualityScoreCol(text)

  /** The pre-r18 pure-`functions._` qualityScore tree — the
    * equivalence reference for `TextScoreSpec`. */
  private[graft] def legacyQualityScore(text: Column): Column = {
    val len = length(text).cast("long")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("long")
    val punct = length(regexp_replace(text, "[^!?.,;:]", "")).cast("long")
    val toks = tokenCount(text).cast("long")
    val lenScore = when(len.between(100, 2000), lit(40L))
      .when(len.between(20, 99), lit(20L)).otherwise(lit(0L))
    val alphaScore = when(alpha * 10 >= len * 7, lit(20L))
      .when(alpha * 10 >= len * 5, lit(10L)).otherwise(lit(0L))
    val stopScore = when(legacyLangId(text) =!= "und", lit(20L))
      .otherwise(lit(0L))
    val punctPenalty = when(punct * 10 > len, lit(20L)).otherwise(lit(0L))
    val tokScore = when(toks > 0 && len >= toks * 4 && len <= toks * 10, lit(10L))
      .otherwise(lit(0L))
    greatest(least(lenScore + alphaScore + stopScore + tokScore - punctPenalty,
      lit(100L)), lit(0L))
  }

  /** SQL text of the same qualityScore formula (DuckDB oracle). */
  def qualityScoreSql(t: String): String =
    s"""greatest(least(
       |  (CASE WHEN length($t) BETWEEN 100 AND 2000 THEN 40
       |        WHEN length($t) BETWEEN 20 AND 99 THEN 20 ELSE 0 END)
       |  + (CASE WHEN length(regexp_replace($t, '[^a-zA-Z]', '', 'g')) * 10
       |            >= length($t) * 7 THEN 20
       |          WHEN length(regexp_replace($t, '[^a-zA-Z]', '', 'g')) * 10
       |            >= length($t) * 5 THEN 10 ELSE 0 END)
       |  + (CASE WHEN ${langIdSql(t)} != 'und' THEN 20 ELSE 0 END)
       |  + (CASE WHEN len(regexp_split_to_array(trim($t), '\\s+')) > 0
       |           AND length($t) >= len(regexp_split_to_array(trim($t), '\\s+')) * 4
       |           AND length($t) <= len(regexp_split_to_array(trim($t), '\\s+')) * 10
       |          THEN 10 ELSE 0 END)
       |  - (CASE WHEN length(regexp_replace($t, '[^!?.,;:]', '', 'g')) * 10
       |            > length($t) THEN 20 ELSE 0 END),
       | 100), 0)""".stripMargin

  /** Intra-document repetition removal, kernel 1: collapse immediate
    * token repetitions — token i is dropped when it equals token i-1
    * ("the the", stuttered boilerplate), keeping the first of each run.
    * A per-row narrow transform: no shuffle, applies to 100 TB as a plain
    * projection. The paired unit count lets callers filter on the removal
    * rate (heavy stutter correlates with extraction junk). */
  def collapseRepeatTokens(text: Column): Column = {
    // PERF INVARIANT (see Dedup.scala): no lambda may re-reference the
    // token-array expression — Catalyst inlines it per element, turning
    // the pass quadratic. zip_with against a null-prefixed shift of the
    // SAME array evaluates each tree once per row: position i pairs
    // (token_i, token_{i-1}); an immediate repeat maps to null, and
    // array_join drops nulls.
    val toks = filter(split(trim(text), "\\s+"), t => t =!= "")
    val shifted = concat(array(lit(null).cast("string")),
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))))
    array_join(
      zip_with(toks, shifted, (cur, prev) =>
        when(cur.isNotNull && (prev.isNull || cur =!= prev), cur)),
      " ")
  }

  /** Intra-document repetition removal, kernel 2: first-occurrence unit
    * dedup — split on a unit separator (default: blank-line paragraphs),
    * drop any unit that already occurred earlier in the SAME document
    * (navigation chrome, repeated footers, duplicated paragraphs), keep
    * original order, re-join. Exact-match at unit granularity; near-dup
    * paragraph removal is the MinHash family's job at corpus scale.
    * Per-row O(units²) string compares — units per doc is tens, not
    * thousands, so the transform stays narrow and codegen-friendly. */
  def dedupeUnits(text: Column, sepRegex: String = "\\n{2,}",
      joiner: String = "\n\n"): Column = {
    val units = filter(split(text, sepRegex), u => trim(u) =!= "")
    // first-occurrence keep via an aggregate fold: the accumulator (the
    // kept-units array) grows inside the lambda, so no lambda ever
    // re-references the `units` tree (the quadratic-inlining trap) —
    // compares run against the small accumulated array instead
    array_join(
      aggregate(units, array().cast("array<string>"),
        (acc, u) => when(array_contains(acc, u), acc)
          .otherwise(concat(acc, array(u)))),
      joiner)
  }

  /** Rolling-hash document fingerprint: polynomial base-31 over the chars
    * of the normalized text, mod the largest prime < 2^57 (so `acc*31 + c`
    * never exceeds a signed long under ANSI overflow checking) —
    * content-defined, stable, cheap to recompute anywhere. `norm` must be
    * a pre-materialized attribute column (see Dedup's PERF INVARIANT). */
  def rollingFingerprintOf(norm: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(norm)), i => ascii(norm.substr(i, lit(1)))),
      lit(0L),
      (acc, c) => pmod(acc * 31 + c.cast("long"), lit(144115188075855859L)))

  /** Quantile-band filter over a numeric score column: keep rows between
    * the corpus' `lo` and `hi` quantiles — the trim-both-tails curation
    * step (drop garbage AND boilerplate-perfect outliers). The bounds ride
    * one broadcast single-row aggregate onto the filter scan.
    *
    * `exact = false` (default) uses `approx_percentile` — the 100 TB path
    * (t-digest-style mergeable sketch, bounded state); `exact = true`
    * buffers every value in the aggregate and is for bounded corpora and
    * cross-engine gates (linear interpolation matches SQL
    * `quantile_cont`). */
  def quantileBandFilter(df: org.apache.spark.sql.DataFrame, scoreCol: String,
      lo: Double, hi: Double, exact: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val fn = if (exact) "percentile" else "approx_percentile"
    val bounds = df.agg(
      expr(s"$fn($scoreCol, array($lo, $hi))").as("_qb"))
    df.crossJoin(broadcast(bounds))
      .filter(col(scoreCol) >= element_at(col("_qb"), 1) &&
        col(scoreCol) <= element_at(col("_qb"), 2))
      .drop("_qb")
  }

  // ---- PII redaction -------------------------------------------------
  //
  // Patterns are deliberately restricted to the regex subset Java's
  // Pattern and RE2 (DuckDB) interpret IDENTICALLY: explicit ASCII
  // classes (no \d — Java's is ASCII by default but explicit [0-9] leaves
  // nothing to trust), no lookaround, no backreferences, greedy
  // leftmost-first quantifiers (both engines' default). That restriction
  // is what makes the redactor oracle-checkable — and incidentally keeps
  // it linear-time-safe under RE2's automaton.

  /** (name, pattern, replacement) in APPLICATION ORDER: emails first
    * (they contain digits but nothing IP/phone-shaped), then IPv4 (dots
    * exclude them from phone matches), then phones. Each replacement
    * token contains no digits, so later patterns can't re-match inside
    * an earlier redaction. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "(\\+[0-9][0-9 -]{6,13}[0-9]|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b)",
      "<PHONE>"))

  /** Replace every email / IPv4 / phone match with a typed token. Pure
    * codegen'd per-row transform: at 100 TB this is a narrow map with no
    * shuffle, and the regexes are RE2-linear. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok)
    }

  /** Per-pattern match counts, PROGRESSIVE: pattern i is counted on the
    * text with patterns 0..i-1 already redacted — exactly what
    * [[redactPii]] removes. Counting every pattern on the raw text would
    * double-count nested matches (an email like `123-456-7890@x.com`
    * contains a phone-shaped substring the redactor never touches,
    * because the email replacement runs first). */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val afterPrior = piiPatterns.scanLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok)
    }
    piiPatterns.zip(afterPrior).map { case ((name, re, _), base) =>
      name -> regexp_count(base, lit(re)).cast("long")
    }
  }

  /** DuckDB text of the same redaction chain ('g' = replace-all, Spark's
    * default). */
  def redactPiiSql(t: String): String =
    piiPatterns.foldLeft(t) { case (e, (_, re, tok)) =>
      s"regexp_replace($e, '$re', '$tok', 'g')"
    }

  /** DuckDB twins of [[piiCounts]] — same progressive base texts. */
  def piiCountsSql(t: String): Seq[(String, String)] = {
    val afterPrior = piiPatterns.scanLeft(t) { case (e, (_, re, tok)) =>
      s"regexp_replace($e, '$re', '$tok', 'g')"
    }
    piiPatterns.zip(afterPrior).map { case ((name, re, _), base) =>
      name -> s"CAST(len(regexp_extract_all($base, '$re')) AS BIGINT)"
    }
  }

  // ---- C4-style heuristic filters -------------------------------------
  //
  // Raffel et al. 2020 (T5 / C4, arXiv:1910.10683 §2.2) clean Common
  // Crawl with sentence-level heuristics. The per-doc signals below are
  // the engine-portable core of that recipe: terminal-punctuation line
  // ratio, code/boilerplate markers (curly braces, "lorem ipsum",
  // "javascript"), and word-count / mean-word-length bounds. All narrow
  // codegen projections — one scan, no shuffle, and every signal is
  // integer/rational so the gate hash-matches.

  /** Per-document C4 signals: (n_lines, n_terminal_lines, has_brace,
    * has_lorem, has_js, n_words, mean_word_len_x100). `lowerText` is the
    * pre-lowered text ATTRIBUTE (withColumn it first — the PERF INVARIANT
    * above: three substring probes must not each re-lower the doc). */
  def c4Signals(text: Column, lowerText: Column): Seq[(String, Column)] = {
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    val term = filter(lines, l =>
      trim(l).rlike("[.!?\"']$"))
    val words = tokensOfText(text)
    val wordLenSum = aggregate(words, lit(0L),
      (acc, w) => acc + length(w))
    Seq(
      ("n_lines", size(lines).cast("long")),
      ("n_terminal_lines", size(term).cast("long")),
      ("has_brace", lowerText.contains("{").cast("int")),
      ("has_lorem", lowerText.contains("lorem ipsum").cast("int")),
      ("has_js", lowerText.contains("javascript").cast("int")),
      ("n_words", size(words).cast("long")),
      ("mean_word_len_x100",
        // floor, not cast: Spark's cast-to-long truncates but DuckDB's
        // ROUNDS — floor() agrees everywhere for these positive ratios
        when(size(words) > 0, floor(wordLenSum * 100 / size(words)))
          .otherwise(0L).cast("long")))
  }

  /** Whitespace words of RAW text (C4 filters run pre-normalization). */
  private def tokensOfText(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** The C4 keep decision from the signals (the paper's bounds: 3+
    * sentences ≈ 3+ terminal lines here, 5..?? words relaxed to the
    * corpus shape, no code markers, mean word length in [3, 10]). */
  def c4Keep(): Column =
    col("n_terminal_lines") >= 1 && col("has_brace") === 0 &&
      col("has_lorem") === 0 && col("has_js") === 0 &&
      col("n_words").between(5, 100000) &&
      col("mean_word_len_x100").between(300, 1000)

  // ---- HTML stripping ------------------------------------------------
  //
  // The crawl-cleanup step upstream of every text signal: drop script/
  // style blocks (DOTALL via inline (?s) — identical in Java and RE2),
  // drop tags, decode the five common entities, collapse whitespace.
  // Entity ORDER is load-bearing: `&amp;` decodes LAST, so the literal
  // text `&amp;lt;` becomes `&lt;` (one decode) and never a strippable
  // `<` — the classic double-decode bug, pinned by the spec. Same
  // Java/RE2-common regex subset discipline as the PII chain.

  /** (pattern, replacement) in application order. */
  val htmlPatterns: Seq[(String, String)] = Seq(
    ("(?s)<script[^>]*>.*?</script>", " "),
    ("(?s)<style[^>]*>.*?</style>", " "),
    ("<[^>]+>", " "),
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("&amp;", "&"))

  /** Strip HTML to text: pure codegen'd per-row transform, no shuffle,
    * RE2-linear patterns. */
  def stripHtml(text: Column): Column = {
    val replaced = htmlPatterns.foldLeft(text) { case (c, (re, r)) =>
      regexp_replace(c, re, r)
    }
    trim(regexp_replace(replaced, "\\s+", " "))
  }

  /** DuckDB twin of [[stripHtml]] (SQL single quotes doubled — the `'`
    * entity's replacement is itself a quote). */
  def stripHtmlSql(t: String): String = {
    val replaced = htmlPatterns.foldLeft(t) { case (e, (re, r)) =>
      s"regexp_replace($e, '$re', '${r.replace("'", "''")}', 'g')"
    }
    s"trim(regexp_replace($replaced, '\\s+', ' ', 'g'))"
  }

  // ---- Repetition quality signals (Gopher-style) ---------------------
  //
  // Rae et al. 2021 ("Scaling Language Models: ... Gopher", arXiv:
  // 2112.11446, table A1) filter web documents on intra-document
  // repetition fractions rather than removing the repeats: the fraction
  // of duplicate LINES, the fraction of CHARACTERS sitting in duplicated
  // lines, and the fraction of characters covered by the single most
  // frequent word bigram. All three are per-row narrow projections here
  // (no shuffle, no explode): at 100 TB these are free signals computed
  // in the same codegen stage as the scan.

  /** Non-empty trimmed lines of a document. */
  def lineArray(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** (frac_dup_lines, frac_dup_line_chars): fraction of lines that are
    * repeats of an earlier identical line, and fraction of line-chars in
    * lines whose content occurs more than once. Duplicate-group flags
    * come from equal-adjacent probes on the SORTED line array — O(n log n)
    * per document instead of the O(n²) membership scan, which matters for
    * the thousand-line documents a web crawl actually contains. */
  def lineRepetitionStats(text: Column): Seq[(String, Column)] = {
    val lines = lineArray(text)
    val sorted = array_sort(lines)
    val n = size(sorted)
    val m1 = greatest(n - 1, lit(0))
    // neighbors in sort order: a line is part of a duplicate group iff it
    // equals its predecessor or successor (any total order clusters equal
    // values, so engine-specific sort-order differences cannot change the
    // flags)
    val prevArr = concat(array(lit(null).cast("string")),
      slice(sorted, lit(1), m1))
    val nextArr = concat(slice(sorted, lit(2), m1),
      array(lit(null).cast("string")))
    val eqPrev = zip_with(sorted, prevArr,
      (c, p) => coalesce(c === p, lit(false)))
    val eqNext = zip_with(sorted, nextArr,
      (c, nx) => coalesce(c === nx, lit(false)))
    val dupFlag = zip_with(eqPrev, eqNext, (a, b) => a || b)
    val dupChars = aggregate(
      zip_with(sorted, dupFlag,
        (l, d) => when(d, length(l).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val totChars = aggregate(sorted, lit(0L),
      (acc, l) => acc + length(l).cast("long"))
    val nDup = n - size(array_distinct(sorted))
    Seq(
      "frac_dup_lines" -> round(
        when(n > 0, nDup.cast("double") / n).otherwise(lit(0.0)), 6),
      "frac_dup_line_chars" -> round(
        when(totChars > 0, dupChars.cast("double") / totChars)
          .otherwise(lit(0.0)), 6))
  }

  /** Fraction of normalized-text characters covered by the most frequent
    * word bigram: count(top bigram) * len(top bigram) / len(norm).
    * Computed as a single fold over the SORTED bigram array — the running
    * run-length × gram-length maximum peaks exactly at each run's end, so
    * no per-gram counting pass is needed. `norm` must be a normalized
    * (single-spaced) text column. */
  def topBigramCharFrac(norm: Column): Column = {
    val words = filter(split(norm, " "), t => t =!= "")
    val m1 = greatest(size(words) - 1, lit(0))
    val grams = array_sort(zip_with(
      slice(words, lit(1), m1), slice(words, lit(2), m1),
      (a, b) => concat(a, lit(" "), b)))
    val best = aggregate(grams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run2 = when(g === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(g.as("prev"), run2.as("run"),
          greatest(acc.getField("best"),
            run2 * length(g).cast("long")).as("best"))
      },
      acc => acc.getField("best"))
    round(when(length(norm) > 0, best.cast("double") / length(norm))
      .otherwise(lit(0.0)), 6)
  }

  /** DuckDB twins of [[lineRepetitionStats]]: same flags via the O(n²)
    * membership form (oracle-side cost only). `t` = raw text expr. */
  def lineRepetitionStatsSql(t: String): Seq[(String, String)] = {
    val lines = s"list_filter(list_transform(string_split($t, chr(10)), " +
      "l -> trim(l)), l -> l != '')"
    val dup = s"list_filter($lines, l -> len(list_filter($lines, " +
      "x -> x = l)) > 1)"
    val dupChars = s"coalesce(list_sum(list_transform($dup, l -> length(l))), 0)"
    val totChars =
      s"coalesce(list_sum(list_transform($lines, l -> length(l))), 0)"
    Seq(
      "frac_dup_lines" -> (s"round(CASE WHEN len($lines) > 0 THEN " +
        s"CAST(len($lines) - len(list_distinct($lines)) AS DOUBLE) / " +
        s"len($lines) ELSE 0.0 END, 6)"),
      "frac_dup_line_chars" -> (s"round(CASE WHEN $totChars > 0 THEN " +
        s"CAST($dupChars AS DOUBLE) / $totChars ELSE 0.0 END, 6)"))
  }

  /** DuckDB twin of [[topBigramCharFrac]] (`norm` = normalized text expr,
    * single-spaced). */
  def topBigramCharFracSql(norm: String): String = {
    val words = s"list_filter(string_split($norm, ' '), x -> x != '')"
    val grams = s"list_transform(range(1, greatest(len($words) - 1, 0) + 1), " +
      s"i -> ($words)[i] || ' ' || ($words)[i + 1])"
    val best = s"coalesce(list_max(list_transform(list_distinct($grams), " +
      s"g -> len(list_filter($grams, x -> x = g)) * length(g))), 0)"
    s"round(CASE WHEN length($norm) > 0 THEN CAST($best AS DOUBLE) / " +
      s"length($norm) ELSE 0.0 END, 6)"
  }
}
