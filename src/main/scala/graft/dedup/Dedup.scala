package graft.dedup

import graft.functions.PortableHash
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * similarity-based, each expressed as a shuffle-conscious Spark plan:
  *
  *  - exact: one hash-aggregate on the content fingerprint (single
  *    shuffle on the fingerprint — at 100 TB this is the map-side-combine
  *    friendly formulation; never `dropDuplicates` on the raw text, the
  *    16-byte md5 shuffles instead of the document body).
  *  - n-gram Jaccard: the exact set-similarity join (inverted-index
  *    shingle join). Correct but O(pairs-sharing-a-shingle); at scale use
  *    it only to VERIFY candidates produced by MinHash-LSH.
  *  - MinHash-LSH: signatures via k independent portable hashes, banded
  *    into buckets; only same-bucket pairs are candidates. This is the
  *    100 TB path: cost is linear in corpus + candidate pairs, and every
  *    stage is a plain groupBy/join that AQE can skew-split.
  *  - SimHash: 16-bit fingerprints from token-hash bit votes; hamming
  *    buckets give near-dup candidates for short text.
  */
object Dedup {

  /** One row per distinct normalized text: surviving (minimum) id and the
    * number of copies folded into it.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles, one output row per distinct (id, shingle).
    * Built with posexplode + lead windows (portable to the SQL oracle);
    * the window partitions by document so it parallelizes per-doc.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 2 && n <= 5, "shingle width 2..5")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = (0 until n).map {
      case 0 => col("tok")
      case i => lead(col("tok"), i).over(w)
    }
    docs
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
      .select(col(idCol), concat_ws(" ", parts: _*).as("shingle"),
        parts.last.isNotNull.as("full"))
      .filter(col("full"))
      .select(col(idCol), col("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs at or above `threshold`.
    * Inverted-index join: pairs materialize only for docs sharing a
    * shingle. Join keys are 60-bit shingle hashes, not shingle strings —
    * smaller shuffle.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
      .select(col(idCol).as("doc"), PortableHash.hash60(col("shingle"), 0).as("sh"))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc").as("a"), col("sh"))
    val b = sh.select(col("doc").as("b"), col("sh"))
    val common = a.join(b, Seq("sh")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("n_sh", "nb"), "b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** MinHash signature rows: (id, seed, minhash of shingle set). */
  def minhashes(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, n: Int = 3): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val seeds = explode(sequence(lit(0), lit(numHashes - 1))).as("seed")
    sh.select(col(idCol).as("doc"), col("shingle"), seeds)
      .groupBy(col("doc"), col("seed"))
      .agg(min(PortableHash.hash60Dyn(col("shingle"), col("seed"))).as("mh"))
  }

  /** Candidate near-dup pairs via LSH banding of MinHash signatures:
    * docs agreeing on ALL rows of any band land in one bucket. Returns
    * distinct candidate pairs (a < b) — verify them with [[jaccardPairs]]
    * semantics on the candidate subset.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 6, rowsPerBand: Int = 2, n: Int = 3): DataFrame = {
    val mh = minhashes(docs, idCol, textCol, bands * rowsPerBand, n)
    val buckets = mh
      .withColumn("band", floor(col("seed") / rowsPerBand))
      .groupBy(col("doc"), col("band"))
      // deterministic order inside the bucket key: sort by seed
      .agg(md5(concat_ws(",", array_sort(collect_list(
        concat_ws(":", col("seed"), col("mh")))))).as("bucket"))
    val l = buckets.select(col("doc").as("a"), col("band"), col("bucket"))
    val r = buckets.select(col("doc").as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** MinHash-LSH near-duplicate detection: LSH candidates, then exact
    * Jaccard verification on the candidate pairs only. The end-to-end
    * scale path: no all-pairs stage anywhere.
    */
  def minhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, bands: Int = 6, rowsPerBand: Int = 2,
      n: Int = 3): DataFrame = {
    val cand = minhashCandidates(docs, idCol, textCol, bands, rowsPerBand, n)
    val sh = shingles(docs, idCol, textCol, n)
      .select(col(idCol).as("doc"), PortableHash.hash60(col("shingle"), 1).as("sh"))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val withA = cand.join(sh.withColumnRenamed("doc", "a"), Seq("a"))
    val common = withA
      .join(sh.select(col("doc").as("b"), col("sh")), Seq("b", "sh"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("n_sh", "nb"), "b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 16-bit SimHash per document: every token votes +1/-1 on each bit of
    * its 60-bit portable hash (folded to 16 bits); fingerprint bit j is
    * the vote sign. All integer arithmetic — exact in any engine.
    */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h16", PortableHash.hash60(col("tok"), 2) % 65536)
    val bits = toks
      .select(col(idCol), col("h16"),
        explode(sequence(lit(0), lit(15))).as("j"))
      .withColumn("bit",
        (floor(col("h16") / pow(lit(2), col("j"))).cast("long") % 2))
      .withColumn("vote", col("bit") * 2 - 1)
    bits
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("vote")).as("v"))
      .withColumn("bitval",
        when(col("v") > 0, pow(lit(2), col("j")).cast("long")).otherwise(lit(0L)))
      .groupBy(col(idCol))
      .agg(sum(col("bitval")).as("simhash"))
  }
}
