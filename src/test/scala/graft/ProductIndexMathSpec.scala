package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans._
import graft.plans.ProductIndexMath._

/** Exhaustive sweeps of the partition math against an independent
  * brute-force oracle, mirroring the reference's test strategy
  * (/root/reference/test/productsplit.jl): fixtures I1–I9 from
  * FIXTURES.md §1, all (np, p), plus golden doctest rows. */
class ProductIndexMathSpec extends AnyFunSuite {

  // FIXTURES.md §1: the canonical iterator-shape fixtures.
  val fixtures: Seq[IndexedSeq[PRange]] = Seq(
    IndexedSeq(PRange(1, 10)),                                        // I1
    IndexedSeq(PRange.stepped(1, 1, 10)),                             // I2
    IndexedSeq(PRange(1, 10), PRange(4, 6)),                          // I3
    IndexedSeq(PRange.stepped(1, 1, 10), PRange(4, 6)),               // I4
    IndexedSeq(PRange(1, 10), PRange(4, 6), PRange(1, 4)),            // I5
    IndexedSeq(PRange.stepped(1, 2, 9)),                              // I6
    IndexedSeq(PRange.stepped(1, 2, 9), PRange.stepped(4, 1, 6)),     // I7
    IndexedSeq(PRange(1, 2), PRange.oneTo(4), PRange.stepped(1, 3, 10)), // I8
    IndexedSeq(PRange.steppedD(1, 0.5, 3), PRange(2, 4)),             // I9 float
  )

  /** Brute-force oracle: full product in reverse-lex order (dim 1
    * varies fastest), independent of the O(1) decode under test. */
  def oracleProduct(iters: IndexedSeq[PRange]): Vector[IndexedSeq[Double]] = {
    val L = totalLength(iters)
    (0L until L).toVector.map { flat =>
      var rem = flat
      iters.map { r =>
        val i = rem % r.numElems
        rem /= r.numElems
        r(i)
      }
    }
  }

  def oracleSlice(iters: IndexedSeq[PRange], np: Int, p: Int): Vector[IndexedSeq[Double]] = {
    val all = oracleProduct(iters)
    val (drop, take) = dropTake(all.length.toLong, np, p)
    all.slice(drop.toInt, (drop + take).toInt)
  }

  test("PRange basics") {
    val r = PRange.stepped(1, 2, 9)
    assert(r.numElems == 5 && r(0) == 1.0 && r.last == 9.0)
    assert(r.indexOf(7.0) == 3 && r.indexOf(8.0) == -1 && r.indexOf(11.0) == -1)
    val f = PRange.steppedD(1, 0.5, 3)
    assert(f.numElems == 5 && f(1) == 1.5 && f.last == 3.0 && f.contains(2.5) && !f.contains(2.25))
  }

  test("slice contents match take-drop oracle for all fixtures, np in 1..10") {
    for (iters <- fixtures; np <- 1 to 10; p <- 1 to np) {
      val got = productSplit(iters, np, p).toVector
      assert(got == oracleSlice(iters, np, p), s"iters=$iters np=$np p=$p")
    }
  }

  test("empty slices allowed when np > L (reference test/productsplit.jl:92-97)") {
    val iters = IndexedSeq(PRange(1, 2))
    val ps = productSplit(iters, 3, 3)
    assert(ps.isEmpty && ps.length == 0)
    assertThrows[IllegalArgumentException](ps.firstElement)
    assertThrows[IllegalArgumentException](ps.maximumElement(1))
    assert(ps.extremaCommonLastDim.isEmpty)
  }

  test("golden: ProductSplit((1:2,4:5),2,p) doctest rows") {
    val iters = IndexedSeq(PRange(1, 2), PRange(4, 5))
    assert(productSplit(iters, 2, 1).toVector == Vector(IndexedSeq(1.0, 4.0), IndexedSeq(2.0, 4.0)))
    assert(productSplit(iters, 2, 2).toVector == Vector(IndexedSeq(1.0, 5.0), IndexedSeq(2.0, 5.0)))
  }

  test("golden: ProductSection((1:3,4:6),5:8) doctest rows") {
    val s = productSection(IndexedSeq(PRange(1, 3), PRange(4, 6)), 5, 8)
    assert(s.toVector == Vector(IndexedSeq(2.0, 5.0), IndexedSeq(3.0, 5.0), IndexedSeq(1.0, 6.0), IndexedSeq(2.0, 6.0)))
    assertThrows[IllegalArgumentException](productSection(IndexedSeq(PRange(1, 3)), 0, 2))
    assertThrows[IllegalArgumentException](productSection(IndexedSeq(PRange(1, 3)), 1, 4))
  }

  test("golden: ProductSplit((1:5,2:4,1:3),7,3) + nelements + dropleading") {
    val iters = IndexedSeq(PRange(1, 5), PRange(2, 4), PRange(1, 3))
    val ps = productSplit(iters, 7, 3)
    assert(ps.toVector.map(_.map(_.toLong)) == Vector(
      IndexedSeq(5L, 4L, 1L), IndexedSeq(1L, 2L, 2L), IndexedSeq(2L, 2L, 2L), IndexedSeq(3L, 2L, 2L),
      IndexedSeq(4L, 2L, 2L), IndexedSeq(5L, 2L, 2L), IndexedSeq(1L, 3L, 2L)))
    assert(ps.nElements(1) == 5 && ps.nElements(2) == 3 && ps.nElements(3) == 2)
    val dl = ps.dropLeading
    assert(dl.toVector.map(_.map(_.toLong)) == Vector(IndexedSeq(4L, 1L), IndexedSeq(2L, 2L), IndexedSeq(3L, 2L)))
    val dl2 = dl.dropLeading
    assert(dl2.toVector.map(_.map(_.toLong)) == Vector(IndexedSeq(1L), IndexedSeq(2L)))
  }

  test("nelements matches brute-force distinct count everywhere") {
    for (iters <- fixtures; np <- 1 to (totalLength(iters) + 1).toInt.min(12); p <- 1 to np) {
      val ps = productSplit(iters, np, p)
      val rows = oracleSlice(iters, np, p)
      if (rows.nonEmpty) {
        for (d <- 1 to iters.length) {
          assert(ps.nElements(d) == rows.map(_(d - 1)).distinct.size.toLong,
            s"nelements iters=$iters np=$np p=$p dim=$d")
        }
      }
    }
  }

  test("extrema match brute force everywhere") {
    for (iters <- fixtures; np <- 1 to (totalLength(iters) + 1).toInt.min(12); p <- 1 to np) {
      val ps = productSplit(iters, np, p)
      val rows = oracleSlice(iters, np, p)
      if (rows.nonEmpty) {
        for (d <- 1 to iters.length) {
          val col = rows.map(_(d - 1))
          assert(ps.minimumElement(d) == col.min, s"min iters=$iters np=$np p=$p d=$d")
          assert(ps.maximumElement(d) == col.max, s"max iters=$iters np=$np p=$p d=$d")
        }
        assert(ps.extremaDims == (1 to iters.length).map(d => (rows.map(_(d - 1)).min, rows.map(_(d - 1)).max)))
      }
    }
  }

  test("in / localindex / whichproc agree with brute force for every element") {
    for (iters <- fixtures.take(7); np <- Seq(1, 2, 3, 5, 7, 11)) {
      val all = oracleProduct(iters)
      val slices = (1 to np).map(p => productSplit(iters, np, p))
      for ((v, flat) <- all.zipWithIndex) {
        val owner = slices.indexWhere(s => !s.isEmpty && s.firstFlat <= flat && flat <= s.lastFlat) + 1
        assert(whichProc(iters, v, np).contains(owner), s"whichproc $v np=$np")
        for (p <- 1 to np) {
          val s = slices(p - 1)
          val expectIn = p == owner
          assert(s.contains(v) == expectIn)
          if (expectIn) assert(s.localIndex(v).contains(flat - s.firstFlat + 1))
          else assert(s.localIndex(v).isEmpty)
        }
      }
      // absent values
      assert(whichProc(iters, iters.map(_ => 1e9), np).isEmpty)
    }
  }

  test("golden: whichproc / localindex / indexinproduct doctests") {
    assert(whichProc(IndexedSeq(PRange(1, 4), PRange(2, 3)), IndexedSeq(2.0, 3.0), 2).contains(2))
    assert(whichProc(IndexedSeq(PRange(1, 10), PRange(4, 6), PRange(1, 4)), IndexedSeq(100.0, 100.0, 100.0), 1).isEmpty)
    assert(indexInProduct(IndexedSeq(PRange(1, 4), PRange(1, 3), PRange(3, 5)), IndexedSeq(2.0, 2.0, 4.0)).contains(18L))
    val ps = productSplit(IndexedSeq(PRange(1, 3), PRange.stepped(4, 5, 20)), 3, 2)
    assert(ps.localIndex(IndexedSeq(3.0, 9.0)).contains(2L))
    // whichproc_localindex((1:4,2:8),(2,4),10) == (4,1)
    val iters = IndexedSeq(PRange(1, 4), PRange(2, 8))
    val proc = whichProc(iters, IndexedSeq(2.0, 4.0), 10).get
    assert(proc == 4)
    assert(productSplit(iters, 10, proc).localIndex(IndexedSeq(2.0, 4.0)).contains(1L))
  }

  test("golden: procrange_recast (1:10,4:6,1:4) split 5 rank 2 -> np=10 == 3:4") {
    val iters = IndexedSeq(PRange(1, 10), PRange(4, 6), PRange(1, 4))
    val ps = productSplit(iters, 5, 2)
    assert(procRangeRecast(iters, ps, 10).contains((3, 4)))
    assert(procRangeRecast(iters, ProductSlice(iters, 5, 4), 10).isEmpty) // empty slice
    val other = IndexedSeq(PRange(1, 2), PRange(4, 6), PRange(1, 4))
    assertThrows[TaskNotPresentException](procRangeRecast(other, productSplit(iters, 5, 3), 4))
  }

  test("procrange_recast covers exactly the owning ranks in sweeps") {
    val iters = IndexedSeq(PRange(1, 5), PRange(2, 4), PRange(1, 3))
    for (np <- 1 to 8; p <- 1 to np; npNew <- 1 to 8) {
      val ps = productSplit(iters, np, p)
      if (!ps.isEmpty) {
        val Some((lo, hi)) = procRangeRecast(iters, ps, npNew)
        val owners = ps.toVector.map(v => whichProc(iters, v, npNew).get)
        assert(lo == owners.min && hi == owners.max, s"np=$np p=$p npNew=$npNew")
      }
    }
  }

  test("golden: extrema_commonlastdim ProductSplit((1:10,4:6,1:4),37,8)") {
    val ps = productSplit(IndexedSeq(PRange(1, 10), PRange(4, 6), PRange(1, 4)), 37, 8)
    val Some((mins, maxs)) = ps.extremaCommonLastDim
    assert(mins.map { case (a, b) => (a.toLong, b.toLong) } == IndexedSeq((9L, 1L), (6L, 1L)))
    assert(maxs.map { case (a, b) => (a.toLong, b.toLong) } == IndexedSeq((2L, 2L), (4L, 2L)))
  }

  test("extrema_commonlastdim doctest (1:3,4:7,2:7) split 10 rank 2") {
    val ps = productSplit(IndexedSeq(PRange(1, 3), PRange(4, 7), PRange(2, 7)), 10, 2)
    val Some((mins, maxs)) = ps.extremaCommonLastDim
    assert(mins.map { case (a, b) => (a.toLong, b.toLong) } == IndexedSeq((1L, 2L), (6L, 2L)))
    assert(maxs.map { case (a, b) => (a.toLong, b.toLong) } == IndexedSeq((3L, 3L), (5L, 3L)))
  }

  test("rankOfIndex closed form matches dropTake law") {
    for (len <- Seq(0L, 1L, 5L, 17L, 100L, 101L); np <- 1 to 12) {
      val bounds = (1 to np).map(p => dropTake(len, np, p))
      for (id <- 0L until len) {
        val expect = bounds.indexWhere { case (drop, take) => id >= drop && id < drop + take } + 1
        assert(rankOfIndex(len, np, id) == expect, s"len=$len np=$np id=$id")
      }
    }
  }

  test("halve splits contiguously with floor-half left (productsplit.jl:221-233)") {
    val iters = IndexedSeq(PRange(1L, 5L), PRange(2L, 4L))
    for (np <- 1 to 6; p <- 1 to np) {
      val sl = ProductIndexMath.productSplit(iters, np, p)
      val (a, b) = sl.halve
      assert(a.length == sl.length / 2)
      assert(a.length + b.length == sl.length)
      assert((a.toVector ++ b.toVector) == sl.toVector, s"np=$np p=$p")
      assert(sl.firstIndexGlobal == sl.firstFlat + 1)
    }
  }

  test("point ops are O(1): huge-product queries stay under 1 us/op") {
    // The reference benchmarks these at ~100 ns on a 4x10^10-element
    // split (docs/src/pmapreduce.md:133-158). The hot path is
    // allocation-free (cached primitive radix arrays, flat-bound
    // whichProc probes), so even on a loaded shared box the median
    // per-op cost must stay in the sub-microsecond class — no O(n)
    // scan of the 10^15-element product, no per-call allocation storm.
    val iters = IndexedSeq(PRange(1L, 100000L), PRange(1L, 100000L), PRange(1L, 100000L))
    val sl = ProductIndexMath.productSplit(iters, 25000, 1500) // 4x10^10 elems per rank
    val value = sl(sl.length / 2)
    var acc = 0L
    def run(reps: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) {
        if (sl.contains(value)) acc += 1
        acc += sl.nElements(3)
        acc += sl.maximumElement(1).toLong
        acc ^= ProductIndexMath.whichProc(iters, value, 25000).getOrElse(0)
        i += 1
      }
      (System.nanoTime() - t0).toDouble / (reps * 4)
    }
    run(50000) // JIT warm-up — unmeasured
    val median = Array.fill(5)(run(100000)).sorted.apply(2)
    assert(acc != 0)
    assert(median < 1000, s"point ops took ${median}ns each (median of 5) — not O(1)?")
  }

  test("zip-mode halve splits contiguously with floor-half left (mapreduce.jl:64-67)") {
    for (len <- Seq(0L, 1L, 2L, 7L, 10L, 101L); np <- 1 to 6; p <- 1 to np) {
      val (drop, take) = dropTake(len, np, p)
      val ((dl, tl), (dr, tr)) = ProductIndexMath.halveZip(drop, take)
      assert(tl == take / 2)
      assert(tl + tr == take)
      assert(dl == drop && dr == drop + tl)
      // concatenation law: left ++ right covers exactly the window
      assert((dl until dl + tl) ++ (dr until dr + tr) == (drop until drop + take))
    }
  }

  test("getindex random access matches iteration") {
    val ps = productSplit(IndexedSeq(PRange(1, 5), PRange(2, 4), PRange(1, 3)), 7, 3)
    val rows = ps.toVector
    for (i <- 1L to ps.length) assert(ps(i) == rows((i - 1).toInt))
    assertThrows[IllegalArgumentException](ps(0))
    assertThrows[IllegalArgumentException](ps(ps.length + 1))
  }
}
