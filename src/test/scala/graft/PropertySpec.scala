package graft

import graft.functions.{HashExpr, ShingleExpr, SimHash64Impl, Text}
import graft.functions.KmvSketch
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks over the native expressions: the codegen'd
  * implementations must agree with straightforward Scala references on
  * arbitrary inputs, not just the fixtures. (No scalatest-scalacheck
  * bridge in the offline cache — generators are sampled with
  * deterministic seeds.)
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], rounds: Int = 20)(check: A => Unit): Unit =
    (0 until rounds).foreach { i =>
      check(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("PolyHash64 == code-point fold reference for arbitrary strings") {
    forAll(Gen.listOfN(20, text), rounds = 10) { texts =>
      val got = texts.toDF("s").select(HashExpr.polyHash(col("s")))
        .collect().map(_.getLong(0)).toSeq
      val want = texts.map { s =>
        var acc = 0L
        s.codePoints().forEach(cp => acc = (acc * 31 + cp) % 1000000007L)
        acc
      }
      assert(got == want)
    }
  }

  test("Shingles3 expression == HOF formulation for arbitrary word lists") {
    forAll(Gen.listOfN(10, Gen.listOf(word)), rounds = 10) { wordLists =>
      val df = wordLists.map(ws => Tuple1(ws)).toDF("w")
      val native = df.select(ShingleExpr.shingles3(col("w")))
        .collect().map(_.getSeq[String](0).toSet).toSeq
      val hof = df.select(Text.shingles3FromWords(col("w")))
        .collect().map(_.getSeq[String](0).toSet).toSeq
      assert(native == hof)
    }
  }

  test("SimHash hamming distance is a pseudo-metric: symmetric, zero on self, triangle") {
    forAll(Gen.listOfN(3, Gen.choose(Long.MinValue, Long.MaxValue)), rounds = 100) {
      case List(a, b, c) =>
        assert(SimHash64Impl.hamming(a, a) == 0)
        assert(SimHash64Impl.hamming(a, b) == SimHash64Impl.hamming(b, a))
        assert(SimHash64Impl.hamming(a, c) <=
          SimHash64Impl.hamming(a, b) + SimHash64Impl.hamming(b, c))
      case _ => ()
    }
  }

  test("KMV sketch is exact below k and invariant to partitioning") {
    forAll(Gen.zip(Gen.chooseNum(1, 200), Gen.chooseNum(1, 8)), rounds = 8) {
      case (n, parts) =>
        val df = spark.range(n.toLong).repartition(parts)
          .select(xxhash64(col("id")).as("h"))
        val est = df.agg(KmvSketch.kmvDistinct(col("h"), 256)).first().getLong(0)
        assert(est == n.toLong) // below k the k-min set holds every hash
    }
  }
}
