package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * Everything here is a pure per-row projection built from codegen'd
  * built-ins (no UDFs): at 100 TB these run inside whole-stage codegen on
  * the scan, shuffle nothing, and read only the `text` column.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count via length arithmetic (identical semantics on any SQL
    * engine, robust to split-function edge cases).
    */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + lit(1)).as("n_tokens")

  /** Count of purely alphabetic tokens (a BPE-ish "word token" proxy). */
  def alphaTokenCount(text: Column): Column =
    size(filter(tokens(text), t => t.rlike("^[a-z]+$")))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") / length(text)

  /** Stopword-list hit count over whitespace tokens. */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*)))

  /** Tiny language-ID profiles (public stopword lists). The heuristic is
    * argmax of profile-hit counts with deterministic alphabetical-priority
    * tiebreak; 'und' when nothing matches.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "les"))

  /** Heuristic language-ID: argmax profile-hit count, ties broken by
    * alphabetical order of the language code, 'und' if no profile hits.
    */
  def langId(text: Column): Column = {
    val counts = langProfiles.map { case (l, ws) => l -> stopwordCount(text, ws) }
    val scored = counts.foldRight(lit("und")) { case ((l, c), els) =>
      val beatsRest = counts.filter(_._1 > l).map(_._2)
        .foldLeft(c > 0)((acc, o) => acc && c >= o)
      when(beatsRest, lit(l)).otherwise(els)
    }
    scored
  }

  /** Content fingerprints: full-text digests for exact dedup / integrity
    * (the reference's Publishv2 computes sha256/sha512 per file — SURVEY
    * §2 A10).
    */
  def fingerprintMd5(text: Column): Column = md5(text)
  def fingerprintSha256(text: Column): Column = sha2(text, 256)

  /** Karp–Rabin-style rolling hash over tokens (order-sensitive document
    * fingerprint; two docs with the same token sequence collide). Runs as a
    * native codegen expression: JVM long arithmetic wraps identically
    * everywhere regardless of the session's ANSI mode, and the sequential
    * per-row fold is deterministic on any partitioning.
    */
  def rollingHash(text: Column): Column =
    graft.expressions.GraftExpressions.rollingHash(text)

  /** SymSpell deletion neighborhood: every string reachable from `w` by
    * deleting at most 2 characters (including `w` itself), distinct.
    *
    * The symmetric-delete principle: if levenshtein(a, b) ≤ 2 then some
    * common string lies in BOTH 2-delete neighborhoods (walk an optimal
    * edit script — a substitution deletes the aligned char on each side,
    * an insertion deletes from b, a deletion deletes from a; each side
    * loses at most `dist` chars). So an equi-join on these keys is a
    * COMPLETE candidate generator for edit distance ≤ 2 — the blocking
    * that replaces a corpus × vocabulary brute scan with
    * |word|²-bounded key fan-out (~1 + L + L(L−1)/2 keys per word).
    *
    * Pure built-in higher-order functions (transform/flatten over
    * sequence), so the generator stays inside whole-stage codegen; the
    * `length ≥ 2` guard avoids sequence(1, 0), which Spark evaluates as
    * the DESCENDING sequence [1, 0].
    */
  def deleteNeighborhood2(w: Column): Column = {
    // both layers guard length explicitly: an empty input would otherwise
    // hit sequence(1, 0) in the ONE-delete layer too
    val one = when(length(w) >= 1,
      transform(sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - 1), substring_index_from(w, i + 1))))
      .otherwise(typedLit(Seq.empty[String]))
    val two = flatten(transform(one,
      s => transform(sequence(lit(1), length(s)),
        j => concat(s.substr(lit(1), j - 1), substring_index_from(s, j + 1)))))
    array_distinct(concat(
      array(w), one,
      when(length(w) >= 2, two).otherwise(typedLit(Seq.empty[String]))))
  }

  // substring(str, pos) suffix form as a Column helper
  private def substring_index_from(s: Column, pos: Column): Column =
    s.substr(pos, length(s))
}
