package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Connected-components scale probe — the SCALING.md evidence for the
  * cluster-formation stage: rounds and wall for min-label propagation
  * vs alternating large-star/small-star on the two graph shapes that
  * matter.
  *
  * - `clique`: 200k disjoint K5 near-cliques (1M nodes, 2M edges) —
  *   the shape LSH dup groups actually produce (diameter 1). Both
  *   algorithms should converge in a handful of rounds; what the probe
  *   shows is the per-round cost at million-node scale.
  * - `path`: one 200k-node chain — the adversarial shape. Min-label
  *   needs diameter rounds (hopeless; probed only at 2k to show the
  *   cliff), alternating stays logarithmic.
  */
object CcScaleProbe {

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("cc-scale", 32)
    spark.range(1).count()

    // 200k disjoint 5-cliques: nodes 5g..5g+4, all 10 in-group pairs
    val cliques = spark.range(200000L)
      .select((col("id") * 5).as("base"))
      .select(col("base"), explode(array(
        (for (i <- 0 until 5; j <- (i + 1) until 5)
          yield struct(lit(i).as("i"), lit(j).as("j"))): _*)).as("p"))
      .select((col("base") + col("p.i")).as("a"), (col("base") + col("p.j")).as("b"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    {
      val (labels, w) = time(ConnectedComponents.run(cliques, "a", "b"))
      val n = labels.count()
      println(f"SCALE-CC shape=clique5x200k algo=minlabel nodes=$n wall=$w%.1f")
    }
    {
      val ((labels, rounds), w) =
        time(ConnectedComponents.runAlternating(cliques, "a", "b"))
      val n = labels.count()
      println(f"SCALE-CC shape=clique5x200k algo=altstar nodes=$n rounds=$rounds wall=$w%.1f")
    }

    def path(n: Long) = spark.range(1L, n)
      .select(col("id").as("a"), (col("id") + 1).as("b"))

    {
      val ((labels, rounds), w) =
        time(ConnectedComponents.runAlternating(path(200000L), "a", "b"))
      val n = labels.count()
      println(f"SCALE-CC shape=path200k algo=altstar nodes=$n rounds=$rounds wall=$w%.1f")
    }
    {
      // the production entry point: min-label budget, then contract +
      // alternating — must track minlabel on cliques and altstar on the
      // chain without anyone choosing an algorithm
      val ((labels, rounds), w) =
        time(ConnectedComponents.runAdaptive(cliques, "a", "b"))
      val n = labels.count()
      println(f"SCALE-CC shape=clique5x200k algo=adaptive nodes=$n rounds=$rounds wall=$w%.1f")
    }
    {
      val ((labels, rounds), w) =
        time(ConnectedComponents.runAdaptive(path(200000L), "a", "b"))
      val n = labels.count()
      println(f"SCALE-CC shape=path200k algo=adaptive nodes=$n rounds=$rounds wall=$w%.1f")
    }
    {
      // min-label on a chain needs diameter+1 while-loop iterations
      // (511 improving rounds + 1 convergence-detect round at 512
      // nodes) — the per-round driver/scheduler cost alone dwarfs
      // altstar on a graph 400x bigger
      val (labels, w) = time(ConnectedComponents.run(path(512L), "a", "b", maxIter = 600))
      val n = labels.count()
      println(f"SCALE-CC shape=path512 algo=minlabel nodes=$n wall=$w%.1f (diameter rounds)")
    }
    {
      // cluster MAINTENANCE: fold a 20k-edge batch into the 1M-node
      // labeling vs recomputing the closure over the union from
      // scratch. The batch is adversarial-ish: 10k bridges each
      // merging two neighboring cliques (so the contracted graph has
      // real work) plus 10k edges among 20k brand-new nodes.
      val base = ConnectedComponents.runAdaptive(cliques, "a", "b")._1
        .localCheckpoint()
      val bridges = spark.range(10000L)
        .select((col("id") * 10).as("g"))
        .select((col("g") * 5).as("a"), ((col("g") + 1) * 5).as("b"))
      val fresh = spark.range(10000L)
        .select((col("id") + 2000000L).as("a"), (col("id") + 2020000L).as("b"))
      val batch = bridges.unionByName(fresh).localCheckpoint()
      val (nInc, wInc) = time {
        ConnectedComponents.incremental(base, batch, "a", "b").count()
      }
      val (nFull, wFull) = time {
        ConnectedComponents.runAdaptive(
          cliques.unionByName(batch), "a", "b")._1.count()
      }
      println(f"SCALE-CC shape=clique5x200k+20kbatch algo=incremental " +
        f"nodes=$nInc wall=$wInc%.1f (full-recompute nodes=$nFull wall=$wFull%.1f)")
    }
    spark.stop()
  }
}
