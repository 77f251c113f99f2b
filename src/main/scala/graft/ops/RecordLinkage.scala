package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Character-level near-duplicate record linkage: all name pairs within
  * a small Levenshtein distance, found WITHOUT an all-pairs comparison.
  *
  * The reference project links records on exact keys only (trip/stop
  * ids); this adds the fuzzy-key path a real ingest needs for
  * human-entered identifiers (names, addresses, SKUs). Complements the
  * token-level MinHash/SimHash family: those detect near-dup *content*,
  * this detects near-dup *keys* where a single typo breaks exact joins.
  *
  * Blocking scheme — symmetric delete (the SymSpell dictionary trick,
  * re-expressed as a distributed self-join): every string emits its
  * deletion neighborhood D≤2(s) = all strings obtainable by deleting at
  * most 2 characters. If lev(a,b) ≤ 2, an optimal edit script has ≤ 2
  * operations, and each operation consumes at most one deletion on each
  * side (substitution: drop the mismatched char from both; insertion:
  * drop it from the longer side; deletion: from the other) — so a and b
  * share a common member of their neighborhoods, and the variant
  * self-join surfaces the pair. Recall is therefore EXACT by
  * construction; the final codegen'd `levenshtein` filter restores
  * exact precision.
  *
  * Scale shape: |D≤2(s)| = 1 + L + L(L-1)/2 (≈ 170 for L = 18), so the
  * exploded index is O(corpus × L²) small keys — a linear-with-corpus
  * shuffle, never the O(n²) cross join of the naive plan. Per-variant
  * bucket fan-out is bounded by how many records can share a deletion
  * variant (alphabet-dependent, small for id-like strings); a df-cap
  * twin mirroring `jaccardPairsCapped` applies if a degenerate corpus
  * (all-identical padding) saturates a bucket. This design fits SHORT
  * key strings (L ≲ 64: names, codes, titles); for long free text the
  * shingle/MinHash family is the right tool.
  */
object RecordLinkage {

  /** Deletion neighborhood D≤`depth`(s) for depth ∈ {1,2}, as a distinct
    * string array — pure builtin expressions (sequence/transform/substr),
    * fully codegen, no UDF. Guards keep `sequence` ascending on short
    * and empty strings. */
  private[graft] def deletionNeighborhood(s: Column, depth: Int): Column = {
    require(depth == 1 || depth == 2, s"unsupported depth $depth")
    val n = length(s)
    // delete position i (1-based)
    def del1(i: Column): Column =
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, n - i))
    // delete positions i < j
    def del2(i: Column, j: Column): Column =
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, j - i - 1),
        s.substr(j + 1, n - j))
    val d0 = array(s)
    val d1 = when(n >= 1, transform(sequence(lit(1), n), del1 _))
      .otherwise(array().cast("array<string>"))
    val d2 = when(n >= 2, flatten(transform(sequence(lit(1), n - 1), i =>
        transform(sequence(i + 1, n), j => del2(i, j)))))
      .otherwise(array().cast("array<string>"))
    array_distinct(if (depth == 1) concat(d0, d1) else concat(d0, d1, d2))
  }

  /** All unordered supplier pairs with levenshtein(s_name) ≤ 2 and the
    * exact distance — recall guaranteed by the deletion-neighborhood
    * blocking, precision by the final levenshtein filter. */
  def editDistancePairs(spark: SparkSession, dir: String): DataFrame =
    editDistancePairsFromNames(Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("key"), col("s_name").as("name")))

  /** The blocking join over any (key, name) frame — factored out so
    * specs can pin the recall contract on adversarial constructed
    * names (shifted inserts, paired deletes, mixed scripts).
    *
    * Runs on DISTINCT names: real key corpora carry heavy duplicate
    * multiplicity (N records of one canonical name), and blocking on
    * records would put every replica of a name in every one of its
    * variant buckets — candidate work ×multiplicity² (measured: 80 s
    * vs 3 s at a 10× replicated supplier table). Collapsing first
    * makes the expensive join scale with UNIQUE names; duplicate
    * multiplicity is paid only in the final expansion joins, which are
    * output-bound (a pair per emitted row — irreducible). */
  private[graft] def editDistancePairsFromNames(sup: DataFrame): DataFrame = {
    val names = sup.select("name").distinct()
    // UNPINNED self-join (r12 — reverts the r11 lazy-localCheckpoint
    // pin): the pin shared one D≤2 neighborhood expansion across the
    // join's two sides, but the driver measured it SLOWER on two
    // independent runs (3.28 → 4.48 s at sf0.1) — the materialize/read
    // round-trip costs more than re-running the substring concats,
    // which are codegen'd and stream straight into each side's shuffle
    // write. A groupBy(v)+collect_list in-bucket expansion was also
    // tried this round and measured slower still (5.35 s solo vs 4.0 —
    // the interpreted HOF pair fold loses to the codegen'd hash join).
    // Both sides expanding independently is the measured winner; the
    // expansion is CPU over a tiny supplier scan, not a table pass, so
    // there is no at-scale double-read to gate on.
    val ex = names
      .select(col("name"), explode(deletionNeighborhood(col("name"), 2)).as("v"))
      // hash the variant: the self-join shuffles 8-byte longs instead of
      // ~17-char strings (same trick as the shingle index); collisions
      // only ADD candidates, which the exact verify then rejects
      .select(col("name"), xxhash64(col("v")).as("v"))
    val a = ex.toDF("a_name", "v")
    val b = ex.toDF("b_name", "v")
    // shuffled-hash: the variant index is large and uniformly keyed —
    // hashing one side per partition beats sorting both
    val namePairs = a.join(b.hint("shuffle_hash"), Seq("v"))
      .filter(col("a_name") < col("b_name"))
      .select("a_name", "b_name").distinct()
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
      .filter(col("dist") <= 2)
    // expansion: distinct-name pairs × their key lists, plus the
    // distance-0 pairs WITHIN each duplicate-name group
    val cross = namePairs
      .join(sup.toDF("a_key", "a_name"), Seq("a_name"))
      .join(sup.toDF("b_key", "b_name"), Seq("b_name"))
      .select(least(col("a_key"), col("b_key")).as("a_key"),
        greatest(col("a_key"), col("b_key")).as("b_key"), col("dist"))
    val same = sup.toDF("a_key", "name")
      .join(sup.toDF("b_key", "name").hint("shuffle_hash"), Seq("name"))
      .filter(col("a_key") < col("b_key"))
      .select(col("a_key"), col("b_key"), lit(0L).as("dist"))
    cross.unionByName(same)
      .orderBy("a_key", "b_key")
  }

  /** Brute-force twin (cross join + levenshtein) for spec-level recall
    * verification on bounded inputs — never the production path. */
  private[graft] def editDistancePairsBrute(names: DataFrame, maxDist: Int): DataFrame = {
    val a = names.toDF("a_key", "a_name")
    val b = names.toDF("b_key", "b_name")
    a.crossJoin(b).filter(col("a_key") < col("b_key"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("a_key", "b_key", "dist")
  }

  /** Entity RESOLUTION on top of the linkage pairs: every supplier
    * labeled with its entity cluster (min member key = the canonical
    * record), cluster size, and canonical flag — the merge-decision
    * step after pair detection, the record-linkage twin of
    * `mm_dedup_cluster`.
    *
    * r9: the engine plan now runs the PART-LEVEL CLIQUE COLLAPSE the
    * r8 oracle introduced (the construction that made the sf1 oracle
    * feasible), instead of blocking at name level. The part key is the
    * name MINUS ITS LAST CHARACTER: two distinct names sharing a part
    * have equal length and differ only in the final char — pairwise
    * levenshtein 1, a PROVABLE clique — so merging part-mates merges
    * only true edges, and on a dense tail-digit namespace
    * (Supplier#%09d) parts contract ~10:1. Candidate generation,
    * the levenshtein verify (an EXISTS across the two parts' name
    * products), and the component loop all run on the part graph:
    * the blocking join's Σbucket² falls ~100× (the r8 sf10 smoke's
    * 6.7×-at-3.33×-rows term), and cluster labels are IDENTICAL
    * because part connectivity equals name connectivity — a true
    * cross-part pair shares a D≤2 variant both parts inherit, and the
    * part node id is its min supplier key (injective: every key has
    * one name, every name one part), so the component min IS the
    * min member key. The name-level pair list survives unchanged as
    * `dedup_editdist` (answer-bound by contract). */
  def linkageCluster(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("key"), col("s_name").as("name"))
    val parts = sup.select("name").distinct()
      .withColumn("part",
        expr("substr(name, 1, greatest(length(name) - 1, 0))"))
    // variant index PROJECTED to parts: the deletion neighborhoods of
    // a part's member names, deduplicated per part (hashed variants —
    // the join ships longs; collisions only add candidates, which the
    // levenshtein verify rejects)
    // UNPINNED self-join, same r12 revert as editDistancePairsFromNames:
    // the codegen'd expansion re-running per side beats both the pin's
    // materialize/read round-trip and the interpreted in-bucket fold
    val px = parts
      .select(col("part"), explode(deletionNeighborhood(col("name"), 2)).as("v"))
      .select(col("part"), xxhash64(col("v")).as("v")).distinct()
    val candPP = px.toDF("pa", "v")
      .join(px.toDF("pb", "v").hint("shuffle_hash"), Seq("v"))
      .filter(col("pa") < col("pb"))
      .select("pa", "pb").distinct()
    val pn = parts.select("part", "name")
    // exists-a-true-name-pair verify between candidate parts
    val sed = candPP
      .join(pn.toDF("pa", "a_name"), Seq("pa"))
      .join(pn.toDF("pb", "b_name"), Seq("pb"))
      .filter(levenshtein(col("a_name"), col("b_name")) <= 2)
      .select("pa", "pb").distinct()
    // part node id = min supplier key in the part (injective across
    // parts), so component mins ARE cluster canonical keys
    val pmin = sup.join(parts.select("name", "part"), Seq("name"))
      .groupBy("part").agg(min("key").as("mk"))
    val edges = sed
      .join(pmin.toDF("pa", "a_id"), Seq("pa"))
      .join(pmin.toDF("pb", "b_id"), Seq("pb"))
      .select("a_id", "b_id")
    val plbl = pmin.join(
        graft.text.TextOps.guardedComponents(edges).toDF("mk", "label"),
        Seq("mk"), "left")
      .select(col("part"), coalesce(col("label"), col("mk")).as("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    sup
      .join(parts.select("name", "part"), Seq("name"))
      .join(plbl, Seq("part"))
      .select(col("key").as("s_suppkey"), col("name").as("s_name"),
        col("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col("s_suppkey") === col("cluster_id"))
      .orderBy("s_suppkey")
  }
}
