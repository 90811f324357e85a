package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.plans.{PRange, ProductIndexMath}

/** ScalaCheck upgrade of the bounded sweeps (SURVEY §5): the partition
  * laws as properties over arbitrary iterator shapes and (np, p). */
object ProductIndexMathProps extends Properties("ProductIndexMath") {

  private val genRange: Gen[PRange] = for {
    lo <- Gen.chooseNum(-50L, 50L)
    n <- Gen.chooseNum(1L, 12L)
    step <- Gen.oneOf(1L, 2L, 3L)
  } yield PRange(lo.toDouble, step.toDouble, n, integral = true)

  private val genIters: Gen[IndexedSeq[PRange]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genRange).map(_.toIndexedSeq))

  property("dropTake partitions exactly: sizes sum to L, contiguous, first r ranks get +1") =
    forAll(genIters, Gen.chooseNum(1, 15)) { (iters, np) =>
      val L = ProductIndexMath.totalLength(iters)
      val dts = (1 to np).map(p => ProductIndexMath.dropTake(L, np, p))
      val sizes = dts.map(_._2)
      val d = L / np
      val r = L % np
      Prop(sizes.sum == L) &&
        Prop(dts.head._1 == 0) &&
        Prop(dts.sliding(2).forall {
          case Seq((d1, t1), (d2, _)) => d2 == d1 + t1
          case _ => true
        }) &&
        Prop(sizes.zipWithIndex.forall { case (sz, i) =>
          sz == d + (if (i < r) 1L else 0L)
        })
    }

  property("rankOfIndex is the exact inverse of dropTake") =
    forAll(genIters, Gen.chooseNum(1, 15)) { (iters, np) =>
      val L = ProductIndexMath.totalLength(iters)
      Prop((0L until L).forall { id =>
        val rk = ProductIndexMath.rankOfIndex(L, np, id)
        val (drop, take) = ProductIndexMath.dropTake(L, np, rk)
        drop <= id && id < drop + take
      })
    }

  property("decode/encode roundtrip: flatIndexOf(elementAt(i)) == i") =
    forAll(genIters) { iters =>
      val L = ProductIndexMath.totalLength(iters)
      Prop((0L until L).forall { i =>
        ProductIndexMath.flatIndexOf(iters, ProductIndexMath.elementAt(iters, i)) == i
      })
    }

  property("flat order IS reverse-lex order") =
    forAll(genIters) { iters =>
      val L = ProductIndexMath.totalLength(iters)
      Prop((1L until L).forall { i =>
        ProductIndexMath.revLexCompare(
          ProductIndexMath.elementAt(iters, i - 1),
          ProductIndexMath.elementAt(iters, i)) < 0
      })
    }

  property("whichProc agrees with direct rank computation for every element") =
    forAll(genIters, Gen.chooseNum(1, 12)) { (iters, np) =>
      val L = ProductIndexMath.totalLength(iters)
      Prop((0L until L).forall { i =>
        val v = ProductIndexMath.elementAt(iters, i)
        ProductIndexMath.whichProc(iters, v, np)
          .contains(ProductIndexMath.rankOfIndex(L, np, i))
      })
    }

  property("nElements O(1) law equals brute-force distinct count") =
    forAll(genIters, Gen.chooseNum(1, 10), Gen.chooseNum(1, 10)) { (iters, np0, p0) =>
      val np = np0
      val p = math.min(p0, np)
      val sl = ProductIndexMath.productSplit(iters, np, p)
      Prop(sl.isEmpty || (1 to iters.length).forall { dim =>
        sl.nElements(dim) == sl.toVector.map(_(dim - 1)).distinct.size
      })
    }
}
