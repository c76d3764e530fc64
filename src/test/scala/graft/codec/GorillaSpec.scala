package graft.codec

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Codec round-trip: decode ∘ encode = id, bit-for-bit, for arbitrary
  * monotone timestamp sequences and arbitrary doubles (incl. NaN/±0.0/
  * infinities). Plus compression sanity on a regular-cadence series.
  */
class GorillaSpec extends AnyFunSuite {

  private val seriesGen: Gen[(Array[Long], Array[Double])] = for {
    n <- Gen.chooseNum(0, 300)
    t0 <- Gen.chooseNum(0L, 4102444800L)
    deltas <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(0L, 10L), Gen.chooseNum(0L, 100000L),
      Gen.const(300L), Gen.const(300L))) // mostly regular cadence
    vs <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9),
      Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
                Double.NegativeInfinity, Double.MinPositiveValue),
      Gen.const(42.5)))
  } yield {
    val ts = deltas.scanLeft(t0)(_ + _).tail.toArray
    (ts, vs.toArray)
  }

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("round-trip is the identity (property, 200 cases)") {
    val prop = Prop.forAllNoShrink(seriesGen) { case (ts, vs) =>
      val (dts, dvs) = Gorilla.decode(Gorilla.encode(ts, vs))
      dts.toSeq == ts.toSeq && dvs.map(bits).toSeq == vs.map(bits).toSeq
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200)
        .withInitialSeed(Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("empty and singleton blocks") {
    assert(Gorilla.decode(Gorilla.encode(Array.empty, Array.empty))
      ._1.isEmpty)
    val (t, v) = Gorilla.decode(
      Gorilla.encode(Array(1700000000L), Array(3.14)))
    assert(t.toSeq == Seq(1700000000L) && v.toSeq == Seq(3.14))
  }

  test("large delta-of-delta falls back to 64-bit bucket") {
    val ts = Array(0L, 1L, 10000000000L, 10000000300L)
    val vs = Array(1.0, 1.0, 2.0, 2.0)
    val (dts, dvs) = Gorilla.decode(Gorilla.encode(ts, vs))
    assert(dts.toSeq == ts.toSeq && dvs.toSeq == vs.toSeq)
  }

  test("regular cadence + slowly-varying values compress well") {
    val n = 1000
    val ts = Array.tabulate(n)(i => 1700000000L + 300L * i)
    val vs = Array.tabulate(n)(i => 20.0 + (i % 7))
    val block = Gorilla.encode(ts, vs)
    val rawBytes = n * 16
    assert(block.length < rawBytes / 4,
      s"expected >4x compression, got ${block.length} vs $rawBytes")
    val (dts, dvs) = Gorilla.decode(block)
    assert(dts.toSeq == ts.toSeq && dvs.toSeq == vs.toSeq)
  }

  test("constant series compresses to ~2 bits/point") {
    val n = 1000
    val ts = Array.tabulate(n)(i => 1700000000L + 300L * i)
    val vs = Array.fill(n)(7.25)
    val block = Gorilla.encode(ts, vs)
    // header 20 bytes + ~2 bits per remaining point
    assert(block.length < 20 + (2 * n) / 8 + 8)
  }
}
