package graft

import graft.functions.PolyHashExpr
import graft.ml.IsolationForest
import graft.multimodal.Media
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Prop, Properties}

/** ScalaCheck properties for the pure (non-Spark) kernels. */
object PureProps extends Properties("graft.pure") {

  property("polyHash matches the definitional code-point fold") =
    Prop.forAll { (s: String) =>
      val expected = s.codePoints().toArray
        .foldLeft(0L)((h, cp) => (h * 31 + cp) % PolyHashExpr.P)
      PolyHashExpr.hash(UTF8String.fromString(s)) == expected
    }

  property("polyHash stays in [0, P)") = Prop.forAll { (s: String) =>
    val h = PolyHashExpr.hash(UTF8String.fromString(s))
    h >= 0L && h < PolyHashExpr.P
  }

  property("isolation c(n) is nonnegative and monotone in n") =
    Prop.forAll(org.scalacheck.Gen.choose(2, 100000)) { n =>
      IsolationForest.c(n) >= 0.0 && IsolationForest.c(n + 1) >= IsolationForest.c(n)
    }

  property("sampleFrames yields 16-byte frames within bounds") =
    Prop.forAll(org.scalacheck.Gen.choose(0, 500),
      org.scalacheck.Gen.choose(0, 8)) { (len, n) =>
      val frames = Media.sampleFrames(Array.fill[Byte](len)(1), n)
      frames.forall(_.length == 16) &&
        (len >= 16 || frames.isEmpty) &&
        frames.size <= math.max(n, 0)
    }
}
