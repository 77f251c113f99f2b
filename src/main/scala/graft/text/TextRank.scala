package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
  * the corpus word co-occurrence graph — the unsupervised salience
  * signal that, unlike `CorpusOps.termSalience`'s tf/df ratio, scores
  * a word by the importance of the words it keeps company with.
  *
  * Graph: nodes are corpus words, undirected edges connect words
  * adjacent in any document (window=2, the paper's default), made
  * symmetric and distinct. Ranking reuses the integer-exact power
  * iteration of graft.ops.PageRank (10^12 total mass, 85/100 damping,
  * integral-division edge contributions), so a recursive-CTE oracle
  * reproduces every round bit-for-bit — same determinism argument,
  * different graph.
  *
  * Scale shape: the bigram explode is linear in corpus tokens and
  * feeds one vocabulary-bounded distinct; from there everything is
  * sized by the word graph (vocab nodes, distinct-bigram edges),
  * which grows sublinearly with the corpus (Heaps' law) — the
  * iteration never touches document text again. */
object TextRank {

  /** Top-`top` corpus keywords by TextRank score. */
  def keywords(spark: SparkSession, dir: String, top: Int = 30): DataFrame = {
    val ws = TextOps.docsRepartitioned(spark, dir)
      .select(TextOps.wordsCol.as("ws"))
      .filter(size(col("ws")) > 1)
    // adjacent-word pairs via one codegen'd zip (no posexplode
    // self-join: that would shuffle every token twice)
    val e0 = ws.select(explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
          | (x, y) -> struct(x AS a, y AS b))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    // dedup BEFORE doubling: normalize to unordered pairs so the one
    // distinct runs over bigram occurrences (with map-side partials),
    // not twice that; both directions then append shuffle-free —
    // disjoint by construction since a ≠ b
    val und = e0.select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct()
    val edges = und.select(col("lo").as("src"), col("hi").as("dst"))
      .unionByName(und.select(col("hi").as("src"), col("lo").as("dst")))
    // guarded: the word graph is vocabulary-bounded (Heaps' law), so
    // under the edge budget the 10 rounds run on the driver with
    // identical integer arithmetic; past it, the distributed loop
    graft.ops.PageRank.guardedPowerIterate(edges)
      .select(col("node").as("word"), col("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(top)
  }
}
