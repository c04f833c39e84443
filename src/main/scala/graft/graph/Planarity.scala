package graft.graph

import org.apache.spark.sql.functions._

/** Left-right planarity test (reference
  * `planarity/LeftRightPlanarityCheck.hpp:16`; algorithm from Brandes,
  * "The Left-Right Planarity Test" — the published pseudocode, re-derived
  * here, not a transcription of the reference's C++).
  *
  * Driver-bounded like [[Biconnected]]: the distinct simple edge set is
  * collected once (self-loops and parallel edges dropped — neither
  * affects planarity) and the two DFS phases run sequentially on the
  * driver inside a large-stack thread. The m > 3n − 6 Euler bound runs
  * first as a distributed short-circuit, so dense graphs never collect.
  */
object Planarity {

  def isPlanar(g: PropertyGraph): Boolean = {
    val edges = g.edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val n = g.vertices.count()
    val m = edges.count()
    if (n >= 3 && m > 3 * n - 6) return false // Euler bound — no collect
    if (n <= 4 || m < 9) return true // K5/K3,3 need ≥ 5 nodes and ≥ 9 edges
    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = new Array[Boolean](1)
    // deep DFS recursion → dedicated 512 MiB-stack thread
    val t = new Thread(null, () => out(0) = leftRight(pairs), "lr-planarity", 1L << 29)
    t.start(); t.join()
    out(0)
  }

  /** The left-right test proper, on a simple undirected edge list. */
  private def leftRight(pairs: Array[(Long, Long)]): Boolean = {
    val ids = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val m = pairs.length

    // undirected edge store; orientation fixed during DFS1
    val eu = new Array[Int](m)
    val ev = new Array[Int](m)
    var k = 0
    while (k < m) { eu(k) = idx(pairs(k)._1); ev(k) = idx(pairs(k)._2); k += 1 }
    val adjHead = Array.fill(n)(List.empty[Int]) // node -> incident edge ids
    k = 0
    while (k < m) { adjHead(eu(k)) ::= k; adjHead(ev(k)) ::= k; k += 1 }

    val NONE = -1
    val oriented = new Array[Boolean](m)
    val eSrc = new Array[Int](m); val eDst = new Array[Int](m)
    val height = Array.fill(n)(NONE)
    val parentEdge = Array.fill(n)(NONE)
    val lowpt = new Array[Int](m)
    val lowpt2 = new Array[Int](m)
    val nesting = new Array[Int](m)
    val ref = Array.fill(m)(NONE)
    val lowptEdge = Array.fill(m)(NONE)
    val stackBottom = Array.fill(m)(NONE) // index into S at edge's start

    // ---- DFS1: orientation, lowpoints, nesting depth ----
    def dfs1(root: Int): Unit = {
      height(root) = 0
      def go(v: Int): Unit = {
        val pe = parentEdge(v)
        for (e <- adjHead(v) if !oriented(e)) {
          oriented(e) = true
          val w = if (eu(e) == v) ev(e) else eu(e)
          eSrc(e) = v; eDst(e) = w
          lowpt(e) = height(v); lowpt2(e) = height(v)
          if (height(w) == NONE) { // tree edge
            parentEdge(w) = e; height(w) = height(v) + 1
            go(w)
          } else { // back edge
            lowpt(e) = height(w)
          }
          nesting(e) = 2 * lowpt(e)
          if (lowpt2(e) < height(v)) nesting(e) += 1 // chordal
          if (pe != NONE) {
            if (lowpt(e) < lowpt(pe)) {
              lowpt2(pe) = math.min(lowpt(pe), lowpt2(e)); lowpt(pe) = lowpt(e)
            } else if (lowpt(e) > lowpt(pe)) {
              lowpt2(pe) = math.min(lowpt2(pe), lowpt(e))
            } else {
              lowpt2(pe) = math.min(lowpt2(pe), lowpt2(e))
            }
          }
        }
      }
      go(root)
    }

    // ---- DFS2: conflict-pair testing ----
    // interval of back edges = (low, high) edge ids; conflict pair (L, R)
    final class Pair(var lLow: Int, var lHigh: Int, var rLow: Int, var rHigh: Int) {
      def lEmpty: Boolean = lLow == NONE && lHigh == NONE
      def rEmpty: Boolean = rLow == NONE && rHigh == NONE
      def swap(): Unit = {
        val a = lLow; val b = lHigh
        lLow = rLow; lHigh = rHigh; rLow = a; rHigh = b
      }
      def lowest: Int = {
        val l = if (lEmpty) Int.MaxValue else lowpt(lLow)
        val r = if (rEmpty) Int.MaxValue else lowpt(rLow)
        math.min(l, r)
      }
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pair]
    def stackSize = stack.length
    def push(p: Pair): Unit = stack += p
    def pop(): Pair = stack.remove(stack.length - 1)
    def top: Pair = stack.last

    def conflicting(low: Int, high: Int, b: Int): Boolean =
      high != NONE && lowpt(high) > lowpt(b)

    // sorted outgoing adjacency by nesting depth
    val ordered = Array.fill(n)(Array.empty[Int])
    def buildOrdered(): Unit = {
      val buf = Array.fill(n)(List.empty[Int])
      var e = 0
      while (e < m) { if (oriented(e)) buf(eSrc(e)) ::= e; e += 1 }
      var v = 0
      while (v < n) { ordered(v) = buf(v).toArray.sortBy(e0 => (nesting(e0), e0)); v += 1 }
    }

    def addConstraints(ei: Int, e: Int): Boolean = {
      val p = new Pair(NONE, NONE, NONE, NONE)
      // merge return edges of ei into p.R
      var ok = true
      var continue = stackSize > stackBottom(ei)
      while (continue) {
        val q = pop()
        if (!q.lEmpty) q.swap()
        if (!q.lEmpty) { ok = false; continue = false }
        else {
          if (lowpt(q.rLow) > lowpt(e)) { // merge intervals
            if (p.rEmpty) p.rHigh = q.rHigh
            else ref(p.rLow) = q.rHigh
            p.rLow = q.rLow
          } else { // align
            ref(q.rLow) = lowptEdge(e)
          }
          if (stackSize == stackBottom(ei)) continue = false
        }
      }
      if (!ok) return false
      // merge conflicting return edges of e1,...,e(i-1) into p.L
      while (stack.nonEmpty && (conflicting(top.lLow, top.lHigh, ei) ||
          conflicting(top.rLow, top.rHigh, ei))) {
        val q = pop()
        if (conflicting(q.rLow, q.rHigh, ei)) q.swap()
        if (conflicting(q.rLow, q.rHigh, ei)) return false
        // merge interval below lowpt(ei) into p.R
        if (p.rLow != NONE) ref(p.rLow) = q.rHigh
        if (q.rLow != NONE) p.rLow = q.rLow
        if (p.lEmpty) p.lHigh = q.lHigh
        else ref(p.lLow) = q.lHigh
        p.lLow = q.lLow
      }
      if (!(p.lEmpty && p.rEmpty)) push(p)
      true
    }

    def trimBackEdges(u: Int): Unit = {
      // drop entire conflict pairs
      while (stack.nonEmpty && top.lowest == height(u)) {
        pop() // (side bookkeeping skipped — embedding not needed)
      }
      if (stack.nonEmpty) {
        val p = pop()
        // trim left interval
        while (p.lHigh != NONE && eDst(p.lHigh) == u) p.lHigh = ref(p.lHigh)
        if (p.lHigh == NONE && p.lLow != NONE) {
          ref(p.lLow) = p.rLow; p.lLow = NONE
        }
        // trim right interval
        while (p.rHigh != NONE && eDst(p.rHigh) == u) p.rHigh = ref(p.rHigh)
        if (p.rHigh == NONE && p.rLow != NONE) {
          ref(p.rLow) = p.lLow; p.rLow = NONE
        }
        push(p)
      }
    }

    var planar = true
    def dfs2(v: Int): Boolean = {
      val e = parentEdge(v)
      val edgesV = ordered(v)
      var i = 0
      while (i < edgesV.length) {
        val ei = edgesV(i)
        stackBottom(ei) = stackSize
        val w = eDst(ei)
        if (ei == parentEdge(w)) { // tree edge
          if (!dfs2(w)) return false
        } else { // back edge
          lowptEdge(ei) = ei
          push(new Pair(NONE, NONE, ei, ei))
        }
        if (lowpt(ei) < height(v)) { // ei has a return edge
          if (i == 0) {
            if (e != NONE) lowptEdge(e) = lowptEdge(ei)
          } else {
            if (!addConstraints(ei, e)) return false
          }
        }
        i += 1
      }
      if (e != NONE) {
        val u = eSrc(e)
        trimBackEdges(u)
        if (lowpt(e) < height(u) && stack.nonEmpty) { // side of e (ref only)
          val hl = top.lHigh; val hr = top.rHigh
          if (hl != NONE && (hr == NONE || lowpt(hl) > lowpt(hr))) ref(e) = hl
          else ref(e) = hr
        }
      }
      true
    }

    var r = 0
    while (r < n && planar) {
      if (height(r) == NONE) dfs1(r)
      r += 1
    }
    buildOrdered()
    r = 0
    while (r < n && planar) {
      if (parentEdge(r) == NONE && height(r) == 0) {
        stack.clear()
        planar = dfs2(r)
      }
      r += 1
    }
    planar
  }
}
