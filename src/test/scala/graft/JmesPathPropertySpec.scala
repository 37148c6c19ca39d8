package graft

import graft.jmespath.JmesPath
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the original JMESPath engine: total behavior on
  * arbitrary input (the rule DSL is user-supplied config — a crafted
  * expression must never take down the pipeline with anything but the
  * typed parse/runtime exceptions), plus algebraic identities the grammar
  * guarantees for well-formed expressions.
  */
class JmesPathPropertySpec extends AnyFunSuite {

  private def forAllSampled[A](g: Gen[A], n: Int = 300)(p: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(0xC0FFEE + i.toLong)
      p(g.pureApply(Gen.Parameters.default, seed))
    }

  private val jsonGen: Gen[String] = {
    val scalar = Gen.oneOf(
      Gen.choose(-999, 999).map(_.toString),
      Gen.alphaNumStr.map(s => "\"" + s.take(6) + "\""),
      Gen.oneOf("true", "false", "null"))
    def obj(depth: Int): Gen[String] =
      for {
        n <- Gen.choose(0, 3)
        ks <- Gen.listOfN(n, Gen.oneOf("a", "b", "meta", "x1", "lvl"))
        vs <- Gen.listOfN(n, if (depth <= 0) scalar
          else Gen.frequency(3 -> scalar, 1 -> Gen.lzy(obj(depth - 1)),
            1 -> Gen.lzy(arr(depth - 1))))
      } yield ks.distinct.zip(vs)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def arr(depth: Int): Gen[String] =
      Gen.choose(0, 3).flatMap(n => Gen.listOfN(n,
        if (depth <= 0) scalar else Gen.frequency(3 -> scalar,
          1 -> Gen.lzy(obj(depth - 1))))).map(_.mkString("[", ",", "]"))
    obj(2)
  }

  test("arbitrary byte soup only ever raises the TYPED parse exception") {
    val soup = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', '[', ']', '*', '?',
        '@', '&', '|', '!', '=', '<', '>', '"', '\'', '`', '(', ')', ',',
        ':', '-', '_', ' ')),
      1 -> Gen.choose(0.toChar, 255.toChar))).map(_.mkString)
    forAllSampled(soup) { expr =>
      try { JmesPath.compile(expr); () }
      catch {
        case _: JmesPath.JmesPathParseException => ()
        // any other throwable fails the test
      }
    }
  }

  test("well-formed field paths evaluate totally on arbitrary documents") {
    val pathGen = for {
      n <- Gen.choose(1, 4)
      segs <- Gen.listOfN(n, Gen.oneOf("a", "b", "meta", "x1", "lvl", "zz"))
    } yield segs.mkString(".")
    forAllSampled(Gen.zip(pathGen, jsonGen)) { case (expr, json) =>
      try { JmesPath.search(expr, json); () }
      catch { case _: JmesPath.JmesPathRuntimeException => () }
    }
  }

  test("identity and associativity of sub-expression chaining") {
    forAllSampled(jsonGen) { json =>
      // `@` is identity under pipe (the grammar disallows it after '.'):
      // a | @  ≡  a ; dotted chains associate with pipe re-rooting
      val viaAt = JmesPath.search("a | @", json).map(JmesPath.serialize)
      val direct = JmesPath.search("a", json).map(JmesPath.serialize)
      assert(viaAt == direct, s"a | @ vs a diverged on $json")
      val flat = JmesPath.search("a.b.meta", json).map(JmesPath.serialize)
      val nested = JmesPath.search("a.b | meta", json).map(JmesPath.serialize)
      assert(flat == nested, s"chaining vs pipe diverged on $json")
    }
  }

  test("projections distribute over list construction") {
    forAllSampled(jsonGen) { json =>
      // [a, b] builds a 2-list whenever the document is an object
      val built = JmesPath.search("[a, b]", json).map(JmesPath.serialize)
      val a = JmesPath.search("a", json).map(JmesPath.serialize).getOrElse("null")
      val b = JmesPath.search("b", json).map(JmesPath.serialize).getOrElse("null")
      assert(built.contains(s"[$a,$b]") || built.contains(s"[$a, $b]"),
        s"multi-select list mismatch: $built vs [$a,$b] on $json")
    }
  }
}
