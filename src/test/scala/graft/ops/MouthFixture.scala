package graft.ops

/** Shared crafted fixture for the admission-mouth specs (in-memory,
  * file-source, and wire-driven): 21-word templates each carrying the
  * 'the' marker (quality- and language-passing) with DISJOINT shingle
  * spaces — only identical copies are near-dups — plus the 64-dim
  * basis/±1/8-pattern vectors (orthogonal families far below the 0.3
  * near-dup threshold; copies hit cos 1). */
object MouthFixture {
  val Dim = 64
  def basis(i: Int): Seq[Float] =
    Seq.tabulate(Dim)(j => if (j == i) 1.0f else 0.0f)
  def pattern(signs: Int => Boolean): Seq[Float] =
    Seq.tabulate(Dim)(j => if (signs(j)) 0.125f else -0.125f)
  val pC: Seq[Float] = pattern(j => j % 2 == 0)
  val pD: Seq[Float] = pattern(j => j % 4 < 2)

  val tA = "the alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau phi"
  val tB = "the zero one two three four five six seven eight " +
    "nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen " +
    "eighteen nineteen"
  val tC = "the red orange yellow green blue indigo violet " +
    "crimson teal amber coral jade ivory onyx pearl ruby topaz garnet " +
    "opal quartz"
  val tD = "the north south east west summit valley river basin " +
    "canyon mesa tundra prairie fjord atoll lagoon reef dune crag moor " +
    "heath"
  val tE = "the oak elm ash birch cedar maple willow poplar " +
    "spruce fir pine yew hazel alder rowan beech hornbeam larch juniper " +
    "cypress"
  val tF = "the lion tiger bear wolf fox otter lynx seal hawk " +
    "crow owl deer moose bison hare mole bat toad newt crab"
  val tG = "the iron copper zinc tin gold silver nickel cobalt " +
    "chrome brass bronze steel pewter mercury platinum titanium sodium " +
    "lithium neon argon"
  val tNoLang = "zero uno dos tres quattro cinque sechs sieben " +
    "acht neuf dix once doce trece bir iki uc dort bes alti yedi"

  /** One crawl-document user-record payload: the JSON
    * [[graft.streaming.CrawlIngest.DocPayloadSchema]] decodes. */
  def docJson(id: Long, text: String, vec: Option[Seq[Float]]): Array[Byte] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.createObjectNode()
    n.put("doc_id", id)
    n.put("text", text)
    vec.foreach { v => val a = n.putArray("embedding"); v.foreach(a.add) }
    m.writeValueAsBytes(n)
  }
}
