package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives re-expressing the reference's tokenizer semantics
  * (`/root/reference/src/mapper.c:14-42`: maximal `iswalnum` runs,
  * `towlower`-lowercased) as codegen'd Catalyst built-ins — no UDFs in
  * the hot path, so whole-stage codegen stays intact and the same
  * column expressions run unchanged on a 1000-executor cluster.
  */
object TextFunctions {

  /** Token delimiter: any run of non-letter/non-digit chars. Java regex
    * `\p{L}`/`\p{N}` matches the reference's locale-aware `iswalnum`
    * (`mapper.c:23,28,120`) for Unicode input.
    */
  val TokenDelim = "[^\\p{L}\\p{N}]+"

  /** Lowercased token array of a text column (reference `map()`,
    * `mapper.c:14-42`). Empty tokens from leading delimiters are kept
    * here; callers filter (`mapper.c:32` drops them).
    */
  def tokens(text: Column): Column = split(lower(text), TokenDelim)

  /** One row per non-empty token — the reference's flatMap contract. */
  def explodeTokens(text: Column): Column = explode(tokens(text))

  /** Case-fold mode conf: `simple` (default since round 17 — the 1:1
    * UnicodeData.txt mapping: what C `towlower` (the reference,
    * mapper.c:28), utf8proc, and therefore DuckDB's `lower()` apply)
    * or `full` (the JVM's full Unicode lowercase, SpecialCasing.txt
    * included). The two differ on exactly one non-locale lowercase
    * mapping: U+0130 İ, which full-cases to "i"+U+0307 (two
    * codepoints) but simple-folds to "i". Defaulting to the
    * locale-independent simple fold makes the engine match BOTH the
    * reference and the oracle on every input — it closed the last
    * red fuzz-matrix cell (the wordcount İ cell, documented r14–r16);
    * `full` remains the opt-in for JVM-ecosystem-identical folding.
    */
  val FoldConf = "spark.graft.fold"

  /** [[tokens]] under SIMPLE case folding: İ→i pre-substituted (the
    * sole toLowerCase special mapping), then the JVM lower — equal to
    * utf8proc's simple fold on all inputs the full/simple modes
    * disagree on.
    */
  def tokensSimple(text: Column): Column =
    split(lower(translate(text, "İ", "i")), TokenDelim)

  /** [[explodeTokens]] under simple folding (see [[FoldConf]]). */
  def explodeTokensSimple(text: Column): Column = explode(tokensSimple(text))

  /** Whitespace token count without exploding (cheap path for quality
    * scoring): number of non-empty whitespace-separated tokens.
    */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > lit(0)))

  /** Character n-grams of a string as an array column (for shingling /
    * near-dup detection). Pure higher-order-function implementation —
    * `sequence` + `transform` + `substring` — fully codegen-friendly.
    */
  def charNgrams(text: Column, n: Int): Column = {
    val len = length(text)
    when(len < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), len - n + 1), i => text.substr(i, lit(n))))
  }

  /** Word n-grams from a token-array column: join each sliding window
    * of `n` tokens with a single space.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
}
