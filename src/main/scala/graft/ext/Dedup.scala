package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs._

/** Deduplication operator family for training-data pipelines:
  * exact, MinHash+LSH, SimHash — each returning a full cluster assignment
  * `(id, cluster_id, is_canonical)` so the caller can either drop dups
  * (`is_canonical`) or audit clusters.
  *
  * Scale shape (100 TB): signatures are computed map-only (one pass, custom
  * codegen expressions); the only wide exchanges are (a) the LSH bucket
  * groupBy, whose payload is (band_hash, id) — bytes per doc, not the text —
  * and (b) the candidate-pair verify join, which touches only candidate ids.
  * Connected components run on the (tiny) verified-edge set.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: canonical = min(id) per group.
    * One hash-aggregate shuffle; for very wide keys, dedup on xxhash64(key)
    * first to halve shuffle bytes. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val canon = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("cluster_id"))
    df.join(canon, keyCols)
      .select(col(idCol), col("cluster_id"),
        (col(idCol) === col("cluster_id")).as("is_canonical"))
  }

  /** MinHash + LSH near-dup clustering:
    * sig (map-only) → band explode → bucket groupBy → candidate pairs →
    * exact n-gram-Jaccard verify → connected components → clusters.
    *
    * With k=128, bands=32 (r=4): P(candidate) = 1-(1-j⁴)³², ~0.5 crossing
    * near j≈0.35 — recall-biased; the Jaccard verify enforces `threshold`
    * precisely, so false bucket positives cost only the verify join.
    *
    * `maxBucket` caps pathological buckets (boilerplate collisions — at
    * web scale some bucket always explodes; dropping it loses recall on
    * exact-boilerplate only, which exact dedup already catches).
    */
  def minhash(df: DataFrame, idCol: String, textCol: String,
              numHashes: Int = 128, bands: Int = 32, shingleN: Int = 3,
              threshold: Double = 0.7, maxBucket: Int = 64): DataFrame = {
    val ids = df.select(col(idCol).as("id"), col(textCol).as("text"))

    val sigs = ids.select(col("id"),
      band_hashes(minhash_sig(col("text"), numHashes, shingleN), bands).as("bh"))

    val buckets = sigs
      .select(col("id"), posexplode(col("bh")).as(Seq("band", "bh")))
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))

    // all-pairs within bucket, deduped across bands
    val pairs = buckets
      .select(explode(pairCombinations(col("ids"))).as("p"))
      .select(col("p").getField("a").as("a"), col("p").getField("b").as("b"))
      .distinct()

    // verify candidates with exact n-gram Jaccard on the raw text
    val ta = ids.select(col("id").as("a"), col("text").as("text_a"))
    val tb = ids.select(col("id").as("b"), col("text").as("text_b"))
    val edges = pairs.join(ta, "a").join(tb, "b")
      .filter(ngram_jaccard(col("text_a"), col("text_b"), shingleN) >= threshold)
      .select(col("a"), col("b"))

    connectedComponents(ids.select(col("id")), edges)
      .withColumnRenamed("id", idCol)
  }

  /** SimHash near-dup clustering: 64-bit sketch (map-only), candidates =
    * pairs sharing any of 4 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ at
    * least one chunk equal), verified by exact hamming distance. */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 64): DataFrame = {
    val ids = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))

    // chunk c key = (sh >>> 16c) & 0xffff
    val buckets = ids
      .select(col("id"), col("sh"), posexplode(
        array((0 until 4).map(c =>
          shiftrightunsigned(col("sh"), 16 * c).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "key")))
      .groupBy(col("chunk"), col("key"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))

    val pairs = buckets
      .select(explode(pairCombinationsStruct(col("members"))).as("p"))
      .select(col("p.a").as("a"), col("p.sha").as("sha"),
              col("p.b").as("b"), col("p.shb").as("shb"))
      .distinct()

    val edges = pairs
      .filter(bit_count(col("sha").bitwiseXOR(col("shb"))) <= maxHamming)
      .select(col("a"), col("b"))

    connectedComponents(ids.select(col("id")), edges)
      .withColumnRenamed("id", idCol)
  }

  /** Embedding-cosine near-dup report via hyperplane LSH: vectors sharing a
    * bucket are candidates; near-dup = cosine ≥ threshold. Per-vector
    * report keeps output size = |input| regardless of dup structure. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double = 0.9, nPlanes: Int = 12,
                       maxBucket: Int = 256): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplane_bucket(col(vecCol), nPlanes).as("bucket"))
    val a = v.select(col("bucket"), col("id").as("a"), col("vec").as("va"))
    val b = v.select(col("bucket"), col("id").as("b"), col("vec").as("vb"))
    val cand = a.join(b, "bucket").filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        cosine_sim(col("va"), col("vb")).as("cos"))
    val perVec = cand
      .select(explode(array(
        struct(col("a").as("id"), col("cos")),
        struct(col("b").as("id"), col("cos")))).as("s"))
      .select(col("s.id").as("id"), col("s.cos").as("cos"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_candidates"),
           sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_near_dups"))
    df.select(col(idCol).as("id"))
      .join(perVec, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"))
  }

  // ---------------------------------------------------------- internals --

  /** ids array → array of distinct unordered pairs (a<b). Declarative
    * (flatten/transform) so it stays in codegen; caller caps array size. */
  private def pairCombinations(ids: Column): Column = {
    val sorted = array_sort(ids)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), y =>
        struct(x.as("a"), y.as("b")))))
  }

  private def pairCombinationsStruct(members: Column): Column = {
    val sorted = array_sort(members) // struct sort: by id then sh
    flatten(transform(sorted, (m, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), m2 =>
        struct(m.getField("id").as("a"), m.getField("sh").as("sha"),
               m2.getField("id").as("b"), m2.getField("sh").as("shb")))))
  }

  /** Distributed connected components by iterative min-label propagation
    * over the verified edge set. Near-dup clusters have tiny diameter, so
    * convergence is a handful of rounds; `maxIter` bounds the worst case.
    * Nodes absent from `edges` keep their own id as cluster. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 15): DataFrame = {
    // symmetric adjacency
    val adj = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .cache()

    // localCheckpoint per round truncates the growing lineage (iterative
    // plans otherwise re-plan the whole chain every iteration); the changed
    // flag rides in the same frame, so convergence costs no extra join.
    var labels = nodes.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node adopts min(own label, neighbors' labels)
      val neighborMin = adj
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nmin"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = stepped.filter(col("label") =!= col("old")).limit(1).count() == 0
      labels = stepped.select(col("id"), col("label"))
      iter += 1
    }
    adj.unpersist()
    labels.select(col("id"), col("label").as("cluster_id"),
      (col("id") === col("label")).as("is_canonical"))
  }
}
