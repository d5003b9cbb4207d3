package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.functions._

import graft.expressions.ZOrder
import graft.sinks.CuratedCorpus

/** Morton interleave correctness + the layout property it buys: files
  * cut along the z curve have compact bounding boxes in BOTH
  * dimensions, so single-dimension predicates prune files regardless of
  * which dimension they constrain (a single-column sort only prunes its
  * own column).
  */
class ZOrderSpec extends SparkSpec {

  test("interleave spreads bits and preserves locality order") {
    // Reference definition: bit 2i of z = bit i of x, bit 2i+1 = bit i of y.
    def slow(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 32) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val cases = for (x <- Seq(0L, 1L, 2L, 3L, 63L, 255L, 12345L, 0x7FFFFFFFL);
                     y <- Seq(0L, 1L, 7L, 64L, 99999L, 0x7FFFFFFFL)) yield (x, y)
    cases.foreach { case (x, y) =>
      assert(ZOrder.interleave(x, y) == slow(x, y), s"($x, $y)")
    }
    // Quadrant structure: the z code of the 2x2 unit block is 0..3.
    assert(Seq(ZOrder.interleave(0, 0), ZOrder.interleave(1, 0),
      ZOrder.interleave(0, 1), ZOrder.interleave(1, 1)) == Seq(0L, 1L, 2L, 3L))
  }

  test("codegen and interpreted eval agree") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
      .select(col("id"),
        ZOrder.zorder2(col("id") % 64, floor(col("id") / 64).cast("long")).as("z"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 1000L).foreach { id =>
      assert(got(id) == ZOrder.interleave(id % 64, id / 64))
    }
  }

  test("z-clustered files prune halfspace queries on BOTH dimensions") {
    import spark.implicits._
    withTempDir { root =>
      val out = root.resolve("zgrid").toString
      // Uniform 64x64 grid; 16 files of 256 aligned consecutive z codes
      // each: the curve cuts into exact 16x16 quadrant squares.
      val grid = (0L until 4096L).toDF("id")
        .select(col("id"), (col("id") % 64).as("x"),
          floor(col("id") / 64).cast("long").as("y"))
      CuratedCorpus.writeZClustered(grid, out, col("x"), col("y"), numFiles = 16)

      import scala.jdk.CollectionConverters._
      val files = Files.list(root.resolve("zgrid")).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(files.size == 16, s"expected 16 files, got ${files.size}")

      val boxes = files.map { f =>
        val rows = spark.read.parquet(f.toString)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (rows.getLong(0), rows.getLong(1), rows.getLong(2), rows.getLong(3))
      }
      // Every file is a 16x16 box — compact in BOTH dims.
      boxes.foreach { case (x0, x1, y0, y1) =>
        assert(x1 - x0 == 15 && y1 - y0 == 15, s"non-square box ($x0-$x1, $y0-$y1)")
      }
      // File-level min/max pruning for a halfspace on either dimension
      // touches exactly half the files (a y-sorted layout would touch
      // ALL files for the x query, and vice versa).
      assert(boxes.count { case (x0, _, _, _) => x0 < 32 } == 8)
      assert(boxes.count { case (_, _, y0, _) => y0 < 32 } == 8)
    }
  }
}
