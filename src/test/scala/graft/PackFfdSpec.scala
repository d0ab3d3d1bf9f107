package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** No-split next-fit packing semantics ([[TextOps.packFfd]]): exact
  * greedy placement in both orders, the strict NFD-beats-id-order
  * case, the no-split invariant, the jumbo lane, and partitioning
  * independence of the pointer-doubled derivation. */
class PackFfdSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(sizes: Seq[Int]) =
    sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")

  test("size-decreasing next-fit strictly beats id-order on interleaved sizes") {
    // id-order next-fit on 9,2,9,2,9,2 at C=10 closes a bin per doc
    // (6 bins, padding 27/60); size-decreasing packs the three 2s
    // together (4 bins, padding 7/40)
    val out = TextOps.packFfd(docsOf(Seq(9, 2, 9, 2, 9, 2)), 10)
      .select($"doc_id", $"n_tokens", $"example_id", $"slot_start",
        $"pad_ratio_ffd", $"pad_ratio_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    val ffd = out.head._5
    val ido = out.head._6
    assert(ffd < ido, s"expected ffd $ffd < id-order $ido")
    assert(math.abs(ffd - 7.0 / 40) < 1e-6 && math.abs(ido - 27.0 / 60) < 1e-6,
      s"ffd=$ffd ido=$ido")
    // exact placement: 9s (ids 0,2,4) own bins 0,1,2; 2s share bin 3
    val byId = out.map(r => r._1 -> (r._3, r._4)).toMap
    assert(byId(0L) == (0L, 0L) && byId(2L) == (1L, 0L) && byId(4L) == (2L, 0L))
    assert(byId(1L) == (3L, 0L) && byId(3L) == (3L, 2L) && byId(5L) == (3L, 4L))
  }

  test("no doc crosses an example boundary; slots tile within bins") {
    val sizes = Seq(7, 3, 3, 7, 1, 9, 5, 5, 2, 8, 4, 6)
    val rows = TextOps.packFfd(docsOf(sizes), 10)
      .select($"n_tokens", $"example_id", $"slot_start")
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (n, _, slot) =>
      assert(slot + n <= 10, s"doc of $n at slot $slot crosses the boundary")
    }
    // within a bin, doc intervals are disjoint and start at 0
    rows.groupBy(_._2).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._1, s"gap/overlap: $a $b")
        case _ => ()
      }
    }
    // every token is placed exactly once
    assert(rows.map(_._1).sum == sizes.sum)
  }

  test("jumbo docs get dedicated examples after the packed ones") {
    val out = TextOps.packFfd(docsOf(Seq(4, 25, 4)), 10)
      .select($"doc_id", $"example_id", $"slot_start", $"pad_ratio_ffd")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> (r._2, r._3)).toMap
    // the two 4s pack into bin 0; the jumbo starts at bin 1, slot 0
    assert(byId(0L)._1 == 0L && byId(2L)._1 == 0L)
    assert(byId(1L) == (1L, 0L))
    // slots: 1 packed bin + 3 jumbo bins = 40; padding 2 + 5 = 7
    assert(math.abs(out.head._4 - 7.0 / 40) < 1e-6, out.head._4.toString)
  }

  test("placement is independent of the input partitioning") {
    val sizes = Seq(9, 2, 9, 2, 9, 2, 7, 3, 5, 5, 1, 8)
    def run(parts: Int) =
      TextOps.packFfd(docsOf(sizes).repartition(parts), 10)
        .select($"doc_id", $"example_id", $"slot_start")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }
}
