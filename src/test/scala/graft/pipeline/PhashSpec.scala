package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DCT perceptual hash over the stub codec: re-encodes (small byte
  * perturbations) stay within the Hamming budget and are caught by the
  * banded pair join; unrelated payloads are far; the band join equals a
  * brute-force Hamming scan at the same cutoff.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def bytesOf(s: String) = s.getBytes("UTF-8")

  test("re-encodes land near, unrelated media far; pigeonhole band join " +
    "== brute-force Hamming pairs") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 12).map { d =>
      s"doc$d " + (0 until 400).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString
    }
    // "re-encode": perturb ~2% of the bytes by ±1 — the stub analog of
    // lossy re-compression noise (cell sums move slightly; only
    // median-adjacent DCT bits may flip)
    def reencode(s: String, seed: Int): String = {
      val r = new scala.util.Random(seed)
      s.map(c => if (r.nextInt(50) == 0) (c + (if (r.nextBoolean()) 1 else -1)).toChar
                 else c)
    }
    val media = base.zipWithIndex.flatMap { case (s, i) =>
      Seq((i * 10L, s), (i * 10L + 1, reencode(s, i)))
    }.toDF("doc_id", "text")
    val wrapped = Multimodal.fromDocuments(
      media.withColumn("source", lit("t")), "doc_id", "text", "source")

    // each re-encode is within the Hamming budget of its parent
    for ((s, i) <- base.zipWithIndex) {
      val d = java.lang.Long.bitCount(
        Multimodal.phashOf(bytesOf(s)) ^
          Multimodal.phashOf(bytesOf(reencode(s, i))))
      assert(d <= 8, s"re-encode of doc $i drifted to distance $d")
    }
    // unrelated payloads are far apart (random 63-bit hashes expect ~31)
    val far = for (i <- base.indices; j <- base.indices if i < j) yield
      java.lang.Long.bitCount(
        Multimodal.phashOf(bytesOf(base(i))) ^
          Multimodal.phashOf(bytesOf(base(j))))
    assert(far.forall(_ > 8), s"unrelated pair too close: ${far.min}")

    // the banded join finds exactly the brute-force pairs at the cutoff
    val viaBands = Multimodal.phashPairs(wrapped, maxDist = 8)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ph = Multimodal.phashes(wrapped).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- ph; (ib, hb) <- ph if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 8
    } yield (ia, ib, d)).sortBy(p => (p._1, p._2))
    assert(viaBands.toSeq == brute.toSeq,
      s"band join diverged from brute force:\n${viaBands.toSeq}\nvs\n${brute.toSeq}")
    assert(viaBands.map(p => (p._1, p._2)).toSeq ==
      base.indices.map(i => (i * 10L, i * 10L + 1)),
      s"expected exactly the 12 re-encode pairs: ${viaBands.toSeq}")
  }

  test("hash is a pure function of the bytes; empty and short payloads " +
    "are defined") {
    val h1 = Multimodal.phashOf(bytesOf("same content"))
    val h2 = Multimodal.phashOf(bytesOf("same content"))
    assert(h1 == h2)
    assert(h1 >= 0L, "top bit must stay clear (63-bit Hamming space)")
    Multimodal.phashOf(Array.emptyByteArray) // must not throw
    Multimodal.phashOf(bytesOf("ab")) // shorter than 64 chunks
  }
}
