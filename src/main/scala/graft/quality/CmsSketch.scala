package graft.quality

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over a string item stream — the heavy-hitter
  * sibling of [[HistSketch]] (quantiles) and
  * [[graft.functions.KmvSketch]] (distinct counts): a `depth × width`
  * grid of exact BIGINT counters whose partials ADD, so per-shard
  * sketches persist once and merge to the corpus sketch without
  * re-scanning raw data. `estimate(x) = min over rows of
  * cell[r][h_r(x)]` is never below the true count (collisions only
  * inflate) — the bound a dedup pipeline needs to find hot n-grams
  * (maxDf candidates) without an exact corpus-wide groupBy.
  *
  * Portability: row hashes are seeded [[PortableHash.hash60]] reduced
  * mod `width` (nonnegative → truncating == floor in both engines);
  * counters are exact sums — the whole sketch replays bit-identically
  * in the oracle.
  *
  * Scale shape: building is ONE map-side-combinable groupBy over
  * `depth` rows per item; the sketch is `depth·width` cells regardless
  * of corpus size, so estimation joins broadcast the sketch, never
  * shuffle the probes.
  */
object CmsSketch {

  /** Seed base for the row hash family (distinct from every other
    * seeded family in the repo).
    */
  val SeedBase = 900

  /** Occupied cells `(r, c, cnt)` of the sketch over `itemCol`
    * occurrences (absent cells are zero).
    */
  def partials(items: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape $depth x $width")
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        (PortableHash.hash60(col(itemCol), SeedBase + r) % width)
          .as("c"))
    }
    items
      .select(explode(array(cells: _*)).as("__cell"))
      .groupBy(col("__cell.r").as("r"), col("__cell.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge partial sketches (pure addition — merged shards == a
    * direct build, the sketch-merge contract).
    */
  def merge(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Point estimates for `probes(itemCol)`: `(itemCol, est)` with
    * `est = min_r cell[r][h_r(item)]` (0 when every row cell is
    * empty). The sketch side is broadcast — cells are model-sized.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        (PortableHash.hash60(col(itemCol), SeedBase + r) % width)
          .as("c"))
    }
    probes
      .select(col(itemCol), explode(array(cells: _*)).as("__cell"))
      .join(broadcast(sketch),
        col("__cell.r") === col("r") && col("__cell.c") === col("c"),
        "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Oracle CTEs over `itemsRel(item)` and `probesRel(item)`:
    * `cms<sfx>(r, c, cnt)` and `cmsest<sfx>(item, est)`.
    */
  def ctes(itemsRel: String, probesRel: String, depth: Int, width: Int,
      sfx: String = ""): String = {
    def hashed(rel: String, out: String) = (0 until depth).map { r =>
      s"SELECT item, $r AS r, (${PortableHash.hash60Sql("item", SeedBase + r)}) % $width AS c FROM $rel"
    }.mkString(s"$out AS (", " UNION ALL ", ")")
    s"""${hashed(itemsRel, s"cmsh$sfx")},
       |cms$sfx AS (SELECT r, c, CAST(count(*) AS BIGINT) AS cnt FROM cmsh$sfx GROUP BY r, c),
       |${hashed(probesRel, s"cmsph$sfx")},
       |cmsest$sfx AS (SELECT p.item, CAST(MIN(coalesce(s.cnt, 0)) AS BIGINT) AS est
       |  FROM cmsph$sfx p LEFT JOIN cms$sfx s ON s.r = p.r AND s.c = p.c
       |  GROUP BY p.item)""".stripMargin
  }
}
