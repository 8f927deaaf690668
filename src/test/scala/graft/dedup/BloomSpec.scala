package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PortableHash

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4096
  private val K = 4

  private def fpOf(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("no false negatives: every inserted fingerprint probes positive") {
    val values = (0 until 500).map(i => s"doc body number $i with words")
    val df = values.toDF("text")
      .select(PortableHash.hash60Base(col("text")).as("fp"))
    val f = Bloom.build(df, col("fp"), M, K)
    values.foreach { v => assert(f.contains(fpOf(v)), v) }
  }

  test("definitely-absent probes report < k hits through the Column path") {
    val train = (0 until 50).map(i => s"train-$i").toDF("text")
      .select(PortableHash.hash60Base(col("text")).as("fp"))
    val f = Bloom.build(train, col("fp"), M, K)
    val probe = ((0 until 50).map(i => s"train-$i") ++
      (0 until 200).map(i => s"fresh-$i")).toDF("text")
      .select(col("text"),
        Bloom.probeHits(PortableHash.hash60Base(col("text")), f).as("hits"),
        Bloom.mightContain(PortableHash.hash60Base(col("text")), f)
          .as("hit"))
      .collect()
    val (trainRows, freshRows) =
      probe.partition(_.getString(0).startsWith("train-"))
    assert(trainRows.forall(r => r.getInt(1) == K && r.getBoolean(2)))
    // At 50 inserts into 4096 bits the per-probe set fraction is ~5%,
    // so all 200 fresh strings clearing all 4 probes would be a bug,
    // and the Column path must agree with the JVM probe on every row.
    assert(freshRows.count(_.getBoolean(2)) < 20)
    probe.foreach { r =>
      assert(r.getBoolean(2) == f.contains(fpOf(r.getString(0))))
    }
  }

  test("partial filters OR up to the whole-corpus filter (mergeable)") {
    val texts = (0 until 300).map(i => s"merge case $i").toDF("text")
      .select((col("text")).as("text"),
        PortableHash.hash60Base(col("text")).as("fp"),
        (crc32(col("text")) % 3).as("part"))
    val whole = Bloom.build(texts, col("fp"), M, K)
    val parts = texts.groupBy(col("part"))
      .agg(Bloom.bitsetAgg(col("fp"), M, K).as("bits"))
      .collect()
      .map(r => Bloom.Filter(r.getSeq[Long](1).toArray, M, K))
    val merged = parts.reduce(_ union _)
    assert(merged.bits.sameElements(whole.bits))
    assert(merged.setBits == whole.setBits && whole.setBits > 0)
  }

  test("build is layout-independent and ignores NULL fingerprints") {
    val base = (0 until 200).map(i => s"layout $i").toDF("text")
      .select(PortableHash.hash60Base(col("text")).as("fp"))
    val withNulls = base.unionByName(
      Seq.fill(5)(null.asInstanceOf[java.lang.Long]).toDF("fp"))
    val a = Bloom.build(base, col("fp"), M, K)
    val b = Bloom.build(withNulls.repartition(7), col("fp"), M, K)
    assert(a.bits.sameElements(b.bits))
  }

  test("empty input yields the empty filter (contains nothing)") {
    val empty = Seq.empty[java.lang.Long].toDF("fp")
    val f = Bloom.build(empty, col("fp"), M, K)
    assert(f.setBits == 0 && !f.contains(fpOf("anything")))
  }

  test("JVM, Column, and SQL position formulas agree") {
    val fps = Seq(0L, 1L, 123456789L, (1L << 60) - 1, fpOf("xyz"))
    fps.foreach { fp =>
      (0 until K).foreach { i =>
        val jvm = Bloom.position(fp, i, M)
        val colv = spark.range(1)
          .select(Bloom.positionCol(lit(fp), i, M)).head().getInt(0)
        // production oracle SQL always feeds a BIGINT fp
        // (hash60BaseSql); a bare int literal would overflow
        val sql = spark.sql(
          s"SELECT ${Bloom.positionSql(s"CAST($fp AS BIGINT)", i, M)}")
          .head()
        assert(jvm == colv, s"fp=$fp i=$i")
        assert(jvm >= 0 && jvm < M)
        val sqlv = sql.get(0) match {
          case l: Long => l
          case d: java.math.BigDecimal => d.longValueExact()
          case x: Any => x.toString.toLong
        }
        assert(sqlv == jvm, s"sql fp=$fp i=$i")
      }
    }
  }
}
