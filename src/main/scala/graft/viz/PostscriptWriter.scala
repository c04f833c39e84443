package graft.viz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** EPS drawing of a laid-out graph (reference
  * `viz/PostscriptWriter.cpp:36-168`): 1020×1020 canvas, coordinates
  * affinely mapped from their bounding box, one `p x y m x y l s` line
  * per edge and one `p x y r 0.00 360.00 a s` dot per node, colored by
  * an optional clustering through the reference's 24-color cyclic
  * palette (`PostscriptWriter.cpp:20-33`; inter-cluster edges grey).
  * With no clustering every element lands in cluster 0 — the
  * reference's `makeOneClustering` default. Torus mode wraps edge
  * vectors at ±500 exactly like the reference.
  *
  * Scale shape: every drawing line is a DataFrame row built by
  * `format_string` inside codegen (edges: one coords join per endpoint;
  * nodes: one optional clustering join); only the final ordered
  * single-file text sink is serial, which PostScript itself dictates —
  * the same discipline as the METIS/DGS writers. */
object PostscriptWriter {

  private val palette: Seq[String] = Seq(
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0),
    (0.5, 1.0, 0.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.5),
    (0.0, 1.0, 1.0), (0.0, 0.5, 1.0), (0.0, 0.0, 1.0),
    (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0),
    (0.3, 0.6, 0.0), (0.0, 0.6, 0.0), (0.0, 0.6, 0.3),
    (0.0, 0.6, 0.6), (0.0, 0.3, 0.6), (0.0, 0.0, 0.6),
    (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3)
  ).map { case (r, g, b) => f"$r%.3f $g%.3f $b%.3f" }

  private val headerLines: Seq[String] = Seq(
    "%!PS-Adobe-1.0",
    "%%Title: graft visualization",
    "%%BoundingBox: 0.000 0.000 1020.000 1020.000",
    "%%EndComments", "%%EndProlog", "gsave",
    "/p {newpath} bind def", "/m {moveto} bind def",
    "/r {rmoveto} bind def", "/k {rlineto} bind def",
    "/l {lineto} bind def", "/n {rlineto} bind def",
    "/c {setrgbcolor} bind def", "/s {stroke} bind def",
    "/w {setlinewidth} bind def", "/h {show} bind def",
    "/a {arc closepath fill} bind def", "/b {closepath eofill} bind def",
    "0.000 0.000 0.000 c")

  /** Write `path` (a Spark text sink directory holding one part file)
    * from `coords` `(id, c0, c1)` and an optional `(id, cluster)`
    * table. */
  def write(g: PropertyGraph, coords: DataFrame, path: String,
      clustering: Option[DataFrame] = None, torus: Boolean = false): Unit = {
    val spark = coords.sparkSession
    import spark.implicits._
    val box = coords.agg(min("c0"), max("c0"), min("c1"), max("c1")).first()
    val (x0, x1, y0, y1) = (box.getDouble(0), box.getDouble(1),
      box.getDouble(2), box.getDouble(3))
    val sx = 1020.0 / math.max(x1 - x0, 1e-12)
    val sy = 1020.0 / math.max(y1 - y0, 1e-12)
    val cl = clustering.getOrElse(g.vertices.select(col("id"), lit(0L).as("cluster")))
      .select(col("id"), col("cluster"))
    val pal = array(palette.map(lit): _*)
    val pos = coords.join(cl, Seq("id"), "left").select(col("id"),
      ((col("c0") - x0) * sx).as("x"), ((col("c1") - y0) * sy).as("y"),
      coalesce(col("cluster"), lit(0L)).as("cluster"))
      .localCheckpoint(true)
    val e = PropertyGraph.canonicalizeUndirected(
      g.adjacency.filter(col("src") =!= col("dst"))).select("src", "dst")
      .join(pos.select(col("id").as("src"), col("x").as("ux"),
        col("y").as("uy"), col("cluster").as("cu")), "src")
      .join(pos.select(col("id").as("dst"), col("x").as("vx"),
        col("y").as("vy"), col("cluster").as("cv")), "dst")
    val dxRaw = col("vx") - col("ux")
    val dyRaw = col("vy") - col("uy")
    def wrap(d: org.apache.spark.sql.Column) =
      if (!torus) d
      else when(d > 500.0, d - 1000.0).when(d < -500.0, d + 1000.0).otherwise(d)
    val edgeLines = e.select(
      concat(
        when(col("cu") === col("cv"),
          concat(element_at(pal, (pmod(col("cu"), lit(palette.size.toLong))
            + 1).cast("int")), lit(" c ")))
          .otherwise(lit("0.80 0.80 0.80 c 1.0 w ")),
        format_string("p %.3f %.3f m %.3f %.3f l s",
          col("ux"), col("uy"),
          col("ux") + wrap(dxRaw), col("uy") + wrap(dyRaw))).as("line"),
      lit(1L).as("grp"), col("src").as("o1"), col("dst").as("o2"))
    val nodeLines = pos.select(
      concat(
        element_at(pal, (pmod(col("cluster"), lit(palette.size.toLong))
          + 1).cast("int")), lit(" c "),
        format_string("p %.3f %.3f 2.0 0.00 360.00 a s",
          col("x"), col("y"))).as("line"),
      lit(2L).as("grp"), col("id").as("o1"), lit(0L).as("o2"))
    val header = headerLines.zipWithIndex
      .map { case (l, i) => (l, 0L, i.toLong, 0L) }
      .toDF("line", "grp", "o1", "o2")
    val footer = Seq(("grestore", 3L, 0L, 0L)).toDF("line", "grp", "o1", "o2")
    header.unionAll(edgeLines).unionAll(nodeLines).unionAll(footer)
      .repartition(1).sortWithinPartitions("grp", "o1", "o2")
      .select("line")
      .write.mode("overwrite").text(path)
  }
}
