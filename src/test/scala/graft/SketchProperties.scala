package graft

import java.io.ByteArrayOutputStream

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

import graft.functions.{CmsEstimate, ZOrder64}

/** Property pins for the sketch primitives, independent of Spark plans:
  * the structural guarantees the catalog's certification queries (sk03,
  * sk04, ev10) sample at two scale factors, here exercised over arbitrary
  * generated inputs.
  */
object SketchProperties extends Properties("Sketches") {

  // ---- ZOrder64: the Morton interleave is a bijection on 32-bit pairs ----

  private val gen32 = Gen.choose(0L, 0xffffffffL)

  /** Test-local inverse (compact of even bits) — no shared code with the
    * bit-spread under test. */
  private def compactEven(z0: Long): Long = {
    var v = z0 & 0x5555555555555555L
    v = (v | (v >>> 1)) & 0x3333333333333333L
    v = (v | (v >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >>> 4)) & 0x00ff00ff00ff00ffL
    v = (v | (v >>> 8)) & 0x0000ffff0000ffffL
    (v | (v >>> 16)) & 0x00000000ffffffffL
  }

  property("interleave inverts exactly: both dimensions recover from z") =
    forAll(gen32, gen32) { (x, y) =>
      val z = ZOrder64.interleave(x, y)
      compactEven(z) == x && compactEven(z >>> 1) == y
    }

  property("interleave is injective on distinct pairs") =
    forAll(gen32, gen32, gen32, gen32) { (x1, y1, x2, y2) =>
      (x1 == x2 && y1 == y2) ||
        ZOrder64.interleave(x1, y1) != ZOrder64.interleave(x2, y2)
    }

  property("bits above 31 never influence the key") =
    forAll(gen32, gen32, Gen.choose(1L, 0x7fffffffL)) { (x, y, hi) =>
      ZOrder64.interleave(x | (hi << 32), y) == ZOrder64.interleave(x, y) &&
        ZOrder64.interleave(x, y | (hi << 32)) == ZOrder64.interleave(x, y)
    }

  // ---- CmsEstimate: probe agrees with the sketch's own guarantees ----

  private val genKeys: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 200L))

  private def serialize(cms: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  property("CMS probe never undercounts any inserted key") =
    forAll(genKeys, Gen.choose(1, Int.MaxValue)) { (keys, seed) =>
      val cms = CountMinSketch.create(0.01, 0.99, seed)
      keys.foreach(k => cms.addLong(k))
      val bytes = serialize(cms)
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (k, n) => CmsEstimate.estimate(bytes, k) >= n }
    }

  property("CMS probe equals the live sketch's estimate after serialization") =
    forAll(genKeys, Gen.choose(1, Int.MaxValue)) { (keys, seed) =>
      val cms = CountMinSketch.create(0.001, 0.999, seed)
      keys.foreach(k => cms.addLong(k))
      val bytes = serialize(cms)
      keys.distinct.forall(k =>
        CmsEstimate.estimate(bytes, k) == cms.estimateCount(java.lang.Long.valueOf(k)))
    }

  // ---- Bloom: the no-false-negative contract sk04's pruning rests on ----

  property("bloom filters never report false negatives") =
    forAll(genKeys) { keys =>
      val bf = BloomFilter.create(math.max(keys.size.toLong, 1L), 0.01)
      keys.foreach(k => bf.putLong(k))
      keys.forall(bf.mightContainLong)
    }
}
