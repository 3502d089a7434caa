package graft.fixtures

import graft.kg.{DictEntry, Predicate}
import scala.collection.mutable

/** Deterministic global vocabulary for the webtext fixture (FIXTURES.md §2).
  * Everything here is computed once from fixed seeds at class-load — no
  * wall-clock, no platform dependence. Invariants (checked by FixtureSpec):
  *  - entity names carry a digit suffix, so they are disjoint from filler and
  *    template words (pure-alpha);
  *  - filler/distractor words are >=6 letters and disjoint from template
  *    unigrams, so a distractor candidate shares no weighted feature string
  *    with any template (designed P/R margin, SURVEY.md §7.4.1);
  *  - dictionary surfaces are unique (injective linking).
  */
object Vocab {
  private val Cons = "bcdfglmnprstvz"
  private val Vows = "aeiou"

  private def syllable(rng: SplitMix64): String =
    s"${Cons(rng.nextInt(Cons.length))}${Vows(rng.nextInt(Vows.length))}"

  private def word(rng: SplitMix64, syllables: Int): String =
    (1 to syllables).map(_ => syllable(rng)).mkString

  /** The 8 relation predicates with pinned templates (FIXTURES.md 2.3).
    * Every template has >=5 between-tokens so a planted instance carries >=10
    * weighted features (5 uni + 4 bi + dep chain) => score >= 50 at W=5,
    * far above Tau=15, while cross-template overlap is <=2 unigrams (<=10). */
  val predicates: IndexedSeq[Predicate] = IndexedSeq(
    Predicate("inhibits", "is known to strongly inhibit", "CHEM", "GENE"),
    Predicate("activates", "activates the downstream expression of", "CHEM", "GENE"),
    Predicate("treats", "is widely used to treat", "CHEM", "DISEASE"),
    Predicate("causes", "has been shown to cause", "GENE", "DISEASE"),
    Predicate("binds", "binds directly to the receptor", "GENE", "GENE"),
    Predicate("suppresses", "suppresses the catalytic activity of", "GENE", "GENE"),
    Predicate("upregulates", "markedly upregulates cellular levels of", "CHEM", "GENE"),
    Predicate("alleviates", "substantially alleviates chronic symptoms of", "CHEM", "DISEASE"))

  val templateUnigrams: Set[String] =
    predicates.flatMap(_.template.split(' ')).toSet

  private val aliasSuffix = Map("GENE" -> "gene", "CHEM" -> "compound", "DISEASE" -> "syndrome")

  /** One entity: id, canonical name (e.g. "velatin3"), type, optional alias. */
  final case class Entity(entityId: Long, canonical: String, entType: String, alias: Option[String])

  private def mkEntities(rng: SplitMix64, entType: String, n: Int, idBase: Long,
                         seen: mutable.Set[String]): IndexedSeq[Entity] = {
    (0 until n).map { i =>
      var name = ""
      do { name = word(rng, 2 + rng.nextInt(2)) + rng.nextInt(10) }
      while (seen.contains(name))
      seen += name
      val alias = if (rng.nextDouble() < 0.4) Some(s"$name ${aliasSuffix(entType)}") else None
      Entity(idBase + i, name, entType, alias)
    }
  }

  // Main entity pools (planted in en pages; gold derives from these).
  val (genes, chems, diseases, reservedGenes, reservedChems, reservedDiseases) = {
    val rng = SplitMix64.forKey(7L, 1L)
    val seen = mutable.Set.empty[String]
    val g = mkEntities(rng, "GENE", 120, 1000L, seen)
    val c = mkEntities(rng, "CHEM", 100, 2000L, seen)
    val d = mkEntities(rng, "DISEASE", 80, 3000L, seen)
    // Reserved pool: planted ONLY in non-en pages. If the language filter is
    // broken, their triples leak into the output and precision drops (§5.2).
    val rg = mkEntities(rng, "GENE", 20, 4000L, seen)
    val rc = mkEntities(rng, "CHEM", 20, 5000L, seen)
    val rd = mkEntities(rng, "DISEASE", 20, 6000L, seen)
    (g, c, d, rg, rc, rd)
  }

  val mainEntities: IndexedSeq[Entity] = genes ++ chems ++ diseases
  val reservedEntities: IndexedSeq[Entity] = reservedGenes ++ reservedChems ++ reservedDiseases
  val allEntities: IndexedSeq[Entity] = mainEntities ++ reservedEntities

  def poolFor(entType: String, reserved: Boolean): IndexedSeq[Entity] =
    (entType, reserved) match {
      case ("GENE", false)    => genes
      case ("CHEM", false)    => chems
      case ("DISEASE", false) => diseases
      case ("GENE", true)     => reservedGenes
      case ("CHEM", true)     => reservedChems
      case ("DISEASE", true)  => reservedDiseases
      case _                  => throw new IllegalArgumentException(entType)
    }

  /** Filler vocabulary: 400 invented words, >=3 syllables, disjoint from
    * template unigrams and alias suffixes (asserted). */
  val fillerWords: IndexedSeq[String] = {
    val rng = SplitMix64.forKey(7L, 2L)
    val banned = templateUnigrams ++ aliasSuffix.values
    val out = mutable.LinkedHashSet.empty[String]
    while (out.size < 400) {
      val w = word(rng, 3 + rng.nextInt(2))
      if (!banned.contains(w)) out += w
    }
    out.toIndexedSeq
  }

  /** Distractor connector phrases: planted between two entities in distractor
    * sentences; candidates are generated for them but must score below Tau.
    * Built from filler words only => zero weighted-feature overlap. */
  val distractorPhrases: IndexedSeq[String] = {
    val rng = SplitMix64.forKey(7L, 3L)
    (0 until 16).map { _ =>
      val n = 3 + rng.nextInt(3)
      (0 until n).map(_ => fillerWords(rng.nextInt(fillerWords.length))).mkString(" ")
    }
  }

  /** The broadcast entity dictionary (FIXTURES.md 2.2): canonical surface plus
    * optional 2-gram alias; surfaces unique by construction. */
  val dictEntries: IndexedSeq[DictEntry] = allEntities.flatMap { e =>
    val base = DictEntry(e.canonical, e.entityId, e.entType, e.canonical, 1.0)
    e.alias match {
      case Some(a) => IndexedSeq(base, DictEntry(a, e.entityId, e.entType, e.canonical, 0.5))
      case None    => IndexedSeq(base)
    }
  }

  val languages: IndexedSeq[String] = IndexedSeq("en", "de", "es", "fr", "zh")

  /** Zipf-ish language draw weighted toward en (FIXTURES.md 2.1). */
  def drawLang(rng: SplitMix64): String = {
    val u = rng.nextDouble()
    if (u < 0.60) "en" else if (u < 0.75) "de" else if (u < 0.85) "es"
    else if (u < 0.95) "fr" else "zh"
  }
}
