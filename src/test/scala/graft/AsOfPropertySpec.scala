package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.plans.AsOfJoin

/** Randomized differential testing of the native as-of operator —
  * [[AsOfJoinSpec]] pins hand-picked edges; this spec generates
  * arbitrary (events, states) inputs with null keys, null times,
  * duplicate times and key runs, and checks EVERY (direction × outer ×
  * tolerance) combination against an O(n·m) driver-side reference
  * implementing the documented contract verbatim. The custom
  * `AsOfJoinExec` is the one hand-written physical operator in the
  * engine — the single merge pass with a buffered right row is exactly
  * the kind of code where an off-by-one at a key-run boundary survives
  * curated examples. */
class AsOfPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  private def check(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private case class L(id: Long, key: Option[Long], t: Option[Long])
  private case class R(tie: Long, key: Option[Long], t: Option[Long], v: Long)

  /** The documented semantics, spelled naively: per left row, among
    * equal-key right rows with non-null time (within tolerance), pick
    * backward = greatest (t, tie) <= leftTime, forward = least
    * (t, tie) >= leftTime, nearest = closer of the two (ties prefer
    * backward). Null left key/time never match. */
  private def reference(ls: Seq[L], rs: Seq[R], direction: String,
                        tol: Option[Long]): Map[Long, Option[Long]] =
    ls.map { l =>
      val m = (l.key, l.t) match {
        case (Some(k), Some(lt)) =>
          val cands = rs.filter(r => r.key.contains(k) && r.t.isDefined)
            .filter(r => tol.forall(b => math.abs(r.t.get - lt) <= b))
          val back = cands.filter(_.t.get <= lt)
            .sortBy(r => (r.t.get, r.tie)).lastOption
          val fwd = cands.filter(_.t.get >= lt)
            .sortBy(r => (r.t.get, r.tie)).headOption
          direction match {
            case "backward" => back
            case "forward" => fwd
            case "nearest" => (back, fwd) match {
              case (Some(b), Some(f)) =>
                if (lt - b.t.get <= f.t.get - lt) Some(b) else Some(f)
              case (b, f) => b.orElse(f)
            }
          }
        case _ => None
      }
      l.id -> m.map(_.tie)
    }.toMap

  test("native as-of equals the naive reference for arbitrary inputs, " +
    "all directions x outer x tolerance") {
    import spark.implicits._
    val keyGen = Gen.option(Gen.chooseNum(0L, 2L))
    val timeGen = Gen.option(Gen.chooseNum(-5L, 12L))
    val inputGen = for {
      nl <- Gen.chooseNum(0, 18)
      nr <- Gen.chooseNum(0, 18)
      lks <- Gen.listOfN(nl, keyGen)
      lts <- Gen.listOfN(nl, timeGen)
      rks <- Gen.listOfN(nr, keyGen)
      rts <- Gen.listOfN(nr, timeGen)
    } yield (
      lks.zip(lts).zipWithIndex.map { case ((k, t), i) => L(i.toLong, k, t) },
      rks.zip(rts).zipWithIndex.map { case ((k, t), i) =>
        R(i.toLong, k, t, i.toLong * 10) })
    check(12)(Prop.forAll(inputGen) { case (ls, rs) =>
      val lf = ls.map(l => (l.id, l.key, l.t)).toDF("id", "k", "t")
      val rf = rs.map(r => (r.tie, r.key, r.t, r.v)).toDF("tie", "rk", "rt", "v")
      (for {
        direction <- Seq("backward", "forward", "nearest")
        outer <- Seq(false, true)
        tol <- Seq(None, Some(3L))
      } yield {
        val got = AsOfJoin.frames(lf, rf, "k", "rk", "t", "rt", "tie",
            outer = outer, direction = direction, tolerance = tol)
          .select($"id", $"tie").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        val want = reference(ls, rs, direction, tol)
        val wantRows =
          if (outer) want.toSeq
          else want.toSeq.filter(_._2.isDefined)
        val ok = got.sortBy(_._1).toSeq == wantRows.sortBy(_._1)
        if (!ok) println(
          s"MISMATCH dir=$direction outer=$outer tol=$tol\n left=$ls\n " +
            s"right=$rs\n got=${got.sortBy(_._1).toSeq}\n want=${wantRows.sortBy(_._1)}")
        ok
      }).forall(identity)
    })
  }
}
