package graft.scd

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants of the SCD merge (SURVEY.md §5.2.3):
  * random member histories + random staging snapshots, checked against
  * the Kimball Type-2 contract.
  */
class ScdPropertiesSpec extends SparkSpec {
  import ScdMergeSpec._

  private val logins = (1 to 8).map(i => s"u$i")
  private val baseDay = 18000L // days since epoch, arbitrary fixed origin

  private def dayTs(d: Long): Timestamp = new Timestamp(d * 86400000L)

  case class Hist(login: String, nVersions: Int, premium: Boolean,
      address: String, phone: Option[String], name: String, year: Int)
  case class Stage(login: String, premium: Boolean, address: String,
      phone: Option[String], name: String, year: Int)

  val genHist: Gen[Hist] = for {
    login <- Gen.oneOf(logins)
    n <- Gen.choose(1, 3)
    prem <- Gen.oneOf(true, false)
    addr <- Gen.oneOf("a1", "a2", "a3")
    phone <- Gen.option(Gen.oneOf("p1", "p2"))
    name <- Gen.oneOf("n1", "n2")
    year <- Gen.choose(1960, 2000)
  } yield Hist(login, n, prem, addr, phone, name, year)

  val genStage: Gen[Stage] = for {
    login <- Gen.oneOf(logins ++ Seq("new1", "new2"))
    prem <- Gen.oneOf(true, false)
    addr <- Gen.oneOf("a1", "a2", "a4")
    phone <- Gen.option(Gen.oneOf("p1", "p3"))
    name <- Gen.oneOf("n1", "n3")
    year <- Gen.choose(1960, 2000)
  } yield Stage(login, prem, addr, phone, name, year)

  val genCase: Gen[(List[Hist], List[Stage])] = for {
    hs <- Gen.listOfN(6, genHist)
    ss <- Gen.listOfN(6, genStage)
  } yield (hs.distinctBy(_.login), ss.distinctBy(_.login))

  private def prodRows(hs: List[Hist]): java.util.List[Row] = {
    var id = 0
    val rows = hs.flatMap { h =>
      (1 to h.nVersions).map { v =>
        id += 1
        val start = dayTs(baseDay + v * 10)
        val end = if (v == h.nVersions) high else dayTs(baseDay + (v + 1) * 10)
        val active = v == h.nVersions
        // historical versions get perturbed type-2 values
        val addr = if (active) h.address else s"${h.address}-old$v"
        Row(id, h.login, h.premium, addr, h.phone.orNull, h.name, "sur",
          h.year, v, start, end, active)
      }
    }
    java.util.Arrays.asList(rows: _*)
  }

  private def stagRows(ss: List[Stage]): java.util.List[Row] =
    java.util.Arrays.asList(ss.map(s =>
      Row(s.login, s.name, "sur", s.year, s.premium, s.address,
        s.phone.orNull)): _*)

  test("merge invariants hold for random histories and snapshots") {
    val asOf1 = dayTs(baseDay + 100)
    val asOf2 = dayTs(baseDay + 200)
    val prop = Prop.forAll(genCase) { case (hs, ss) =>
      val prod = spark.createDataFrame(prodRows(hs), prodSchema)
      val stag = spark.createDataFrame(stagRows(ss), stagSchema)
      val out = ScdMerge.merge(prod, stag, dimUser, MergeOptions(asOf1))
        .collect()

      val byLogin = out.groupBy(_.getString(1))
      val stagedByLogin = ss.map(s => s.login -> s).toMap

      // (i) exactly one active row per surviving login
      val oneActive = byLogin.values.forall(_.count(_.getBoolean(11)) == 1)
      // (ii) versions dense and increasing from 1
      val dense = byLogin.values.forall { rs =>
        rs.map(_.getInt(8)).sorted.sameElements(1 to rs.length)
      }
      // (iii) intervals: non-overlapping, gapless, active row ends at high
      val contiguous = byLogin.values.forall { rs =>
        val sorted = rs.sortBy(_.getInt(8))
        sorted.last.getTimestamp(10) == high &&
          sorted.sliding(2).forall {
            case Array(a, b) => a.getTimestamp(10) == b.getTimestamp(9)
            case _ => true
          }
      }
      // (iv) row count: carried + fanned-out closes + new members
      val activeProd = hs.map(h => h.login -> h).toMap
      def t2Changed(h: Hist, s: Stage): Boolean =
        h.premium != s.premium || h.address != s.address || h.phone != s.phone
      val nChanged = ss.count(s =>
        activeProd.get(s.login).exists(h => t2Changed(h, s)))
      val nNew = ss.count(s => !activeProd.contains(s.login))
      val expected = hs.map(_.nVersions).sum + nChanged + nNew
      val countOk = out.length == expected
      // (vi) Type-1 columns rewritten into ALL versions of staged members
      val t1Uniform = byLogin.forall { case (login, rs) =>
        stagedByLogin.get(login).forall(s =>
          rs.forall(r => r.getString(5) == s.name && r.getInt(7) == s.year))
      }
      // (vii) surrogate keys unique
      val uniqueIds = out.map(_.getInt(0)).distinct.length == out.length
      // (v) idempotence
      val outDf = spark.createDataFrame(
        java.util.Arrays.asList(out: _*), prodSchema)
      val again = ScdMerge.merge(outDf, stag, dimUser, MergeOptions(asOf2))
        .collect()
      val idempotent = again.map(_.toSeq).toSet == out.map(_.toSeq).toSet

      val all = oneActive && dense && contiguous && countOk && t1Uniform &&
        uniqueIds && idempotent
      if (!all) println(s"FALSIFIED: oneActive=$oneActive dense=$dense " +
        s"contiguous=$contiguous countOk=$countOk(exp=$expected got=${out.length}) " +
        s"t1Uniform=$t1Uniform uniqueIds=$uniqueIds idempotent=$idempotent " +
        s"hs=$hs ss=$ss")
      all
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("sequential snapshots: invariants and latest-wins hold across a 3-merge chain") {
    val genSeq = for {
      hs <- Gen.listOfN(5, genHist)
      s1 <- Gen.listOfN(5, genStage)
      s2 <- Gen.listOfN(5, genStage)
      s3 <- Gen.listOfN(5, genStage)
    } yield (hs.distinctBy(_.login), List(s1, s2, s3).map(_.distinctBy(
      (s: Stage) => s.login)))
    val prop = Prop.forAll(genSeq) { case (hs, snaps) =>
      var dim = spark.createDataFrame(prodRows(hs), prodSchema)
      snaps.zipWithIndex.foreach { case (ss, i) =>
        val stag = spark.createDataFrame(stagRows(ss), stagSchema)
        dim = spark.createDataFrame(java.util.Arrays.asList(
          ScdMerge.merge(dim, stag, dimUser,
            MergeOptions(dayTs(baseDay + 100 + i * 50))).collect(): _*),
          prodSchema)
      }
      val out = dim.collect()
      val byLogin = out.groupBy(_.getString(1))
      // per-key invariants survive the whole chain
      val oneActive = byLogin.values.forall(_.count(_.getBoolean(11)) == 1)
      val dense = byLogin.values.forall { rs =>
        rs.map(_.getInt(8)).sorted.sameElements(1 to rs.length)
      }
      val contiguous = byLogin.values.forall { rs =>
        val sorted = rs.sortBy(_.getInt(8))
        sorted.last.getTimestamp(10) == high &&
          sorted.sliding(2).forall {
            case Array(x, y) => x.getTimestamp(10) == y.getTimestamp(9)
            case _ => true
          }
      }
      val uniqueIds = out.map(_.getInt(0)).distinct.length == out.length
      // latest-wins: every key staged in the LAST snapshot has its
      // active Type-2 values equal to that snapshot
      val last = snaps.last.map(s => s.login -> s).toMap
      val latestWins = byLogin.forall { case (login, rs) =>
        last.get(login).forall { s =>
          val act = rs.find(_.getBoolean(11)).get
          act.getBoolean(2) == s.premium && act.getString(3) == s.address &&
            Option(act.getString(4)) == s.phone
        }
      }
      val all = oneActive && dense && contiguous && uniqueIds && latestWins
      if (!all) println(s"FALSIFIED-SEQ: oneActive=$oneActive dense=$dense " +
        s"contiguous=$contiguous uniqueIds=$uniqueIds latestWins=$latestWins " +
        s"hs=$hs snaps=$snaps")
      all
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
