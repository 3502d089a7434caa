package graft.text

/** Pinned text-model constants shared by the fixture generator, the pipeline,
  * and the tests (SURVEY.md §7.2). These strings are part of the byte-identical
  * contract — changing any of them invalidates every fixture oracle.
  *
  * Reference behavior note: the reference snapshot at /root/reference is empty
  * (SURVEY.md §0), so these constants ARE the normative spec for this build.
  */
object TextModel {
  /** Sentence boundary: split after ., ! or ? followed by whitespace. */
  final val SentenceSplitRegex = "(?<=[.!?])\\s+"

  /** Token boundary: any run of non-letter, non-digit chars (Java/Unicode
    * classes), applied AFTER lowercasing with Locale.ROOT semantics. */
  final val TokenSplitRegex = "[^\\p{L}\\p{Nd}]+"

  /** Feature-hash space: 2^18 buckets (SURVEY.md §2 A8). */
  final val FeatureBuckets: Int = 1 << 18

  /** Murmur3 seed for feature hashing (fixed; part of the contract). */
  final val FeatureSeed: Int = 42
}
