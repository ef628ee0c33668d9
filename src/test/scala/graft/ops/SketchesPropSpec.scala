package graft.ops

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSpec

/** Property-based guarantees for the sketch family: the claims the
  * operators stake their correctness on (no undercount, lossless merge,
  * no false negatives) checked over randomized inputs, not just the
  * hand-picked cases in SketchesSpec. Each property runs a modest number
  * of Spark jobs, so sizes and trial counts stay small.
  */
class SketchesPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, trials: Int = 8): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("CMS estimates never undercount any item's true frequency") {
    val gen = Gen.listOfN(60, Gen.chooseNum(0, 15).map(i => s"item$i"))
    check("cms-no-undercount", Prop.forAll(gen) { items =>
      items.nonEmpty ==> {
        val df = items.toDF("tok")
        val truth = items.groupBy(identity).map { case (k, v) =>
          k -> v.size.toLong }
        val sk = Sketches.cmsSketch(df, "tok", depth = 3, width = 32)
        val est = Sketches.cmsEstimate(sk, df, "tok", depth = 3, width = 32)
          .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("est"))
          .toMap
        truth.forall { case (k, n) => est(k) >= n }
      }
    })
  }

  test("HLL register merge of any split equals the whole-input sketch") {
    val gen = for {
      vals <- Gen.listOfN(80, Gen.chooseNum(1L, 400L))
      cut <- Gen.chooseNum(0, 80)
    } yield (vals, cut)
    check("hll-merge-lossless", Prop.forAll(gen) { case (vals, cut) =>
      vals.nonEmpty ==> {
        val (l, r) = vals.splitAt(cut)
        def regs(xs: List[Long]) =
          if (xs.isEmpty) Map.empty[Long, Long]
          else Sketches.hllRegisters(
            xs.map(("g", _)).toDF("grp", "v"), "v", Seq("grp"))
            .collect().map(x => x.getAs[Long]("bucket") ->
              x.getAs[Long]("rho_max")).toMap
        val merged = (regs(l).toSeq ++ regs(r).toSeq)
          .groupBy(_._1).map { case (b, vs) => b -> vs.map(_._2).max }
        merged == regs(vals)
      }
    }, trials = 6)
  }

  test("Bloom filter admits every member for any key set (no false negatives)") {
    val gen = Gen.listOfN(40, Gen.chooseNum(-500L, 500L))
    check("bloom-no-false-negative", Prop.forAll(gen) { keys =>
      keys.nonEmpty ==> {
        val members = keys.distinct.toDF("k")
        val bits = Sketches.bloomBits(members, "k", k = 3, m = 4096)
        val kept = Sketches.bloomFilter(members, "k", bits, k = 3, m = 4096)
          .as[Long].collect().toSet
        keys.distinct.forall(kept.contains)
      }
    }, trials = 6)
  }

  test("KMV minima of a union are the k smallest of both sketches' union") {
    val gen = for {
      a <- Gen.listOfN(50, Gen.chooseNum(1L, 300L))
      b <- Gen.listOfN(50, Gen.chooseNum(200L, 500L))
    } yield (a, b)
    check("kmv-union-minima", Prop.forAll(gen) { case (a, b) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val k = 16
        def minima(xs: List[Long], set: String) = Sketches.kmvSketch(
          xs.map((set, _)).toDF("grp", "v"), "grp", "v", k)
          .select("h").as[Long].collect().toSet
        // sketch of the union == k smallest of (sketch(a) ∪ sketch(b)):
        // the subset-minima property the pairwise estimator relies on
        val uni = Sketches.kmvSketch(
          (a ++ b).map(("u", _)).toDF("grp", "v"), "grp", "v", k)
          .select("h").as[Long].collect().toSet
        val mergedMinima = (minima(a, "a") ++ minima(b, "b")).toSeq
          .sorted.take(k).toSet
        uni == mergedMinima
      }
    }, trials = 6)
  }
}
