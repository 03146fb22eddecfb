package graft.tools

import java.nio.file.{Files, Paths}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Results publishing — the analog of the reference's template-filling
  * report generator (reference scripts/fill_template.py:12-97, which
  * renders benchmark JSON into the mkdocs results page): reads one or
  * more `BENCH_*.json` / `bench_out.json` artifacts and renders a
  * markdown table per artifact plus a cross-artifact per-query matrix.
  *
  * {{{
  * sbt "runMain graft.tools.Report BENCH_r02.json BENCH_medium.json"
  * sbt "runMain graft.tools.Report --out docs/RESULTS.md BENCH_*.json"
  * }}}
  *
  * Pure JVM + json4s (already on Spark's classpath): no Spark session,
  * no new dependencies.
  */
object Report {

  private case class Artifact(name: String, sf: String, total: Double,
      queries: Seq[(String, Double)])

  private def load(path: String): Artifact = {
    implicit val fmts: Formats = DefaultFormats
    val raw = JsonMethods.parse(Files.readString(Paths.get(path)))
    // two artifact shapes: graft's own bench_out.json (bare), and the
    // round driver's BENCH_r*.json which wraps it under "parsed"
    val j = raw \ "parsed" match {
      case o: JObject => o
      case _ => raw
    }
    Artifact(
      Paths.get(path).getFileName.toString,
      (j \ "sf") match {
        case JString(s) => s
        case JDouble(d) => d.toString
        case JInt(i) => i.toString
        case _ => "?"
      },
      (j \ "value").extractOrElse[Double](-1),
      (j \ "queries") match {
        case JObject(fields) => fields.collect { case (k, JDouble(v)) => k -> v
                                                 case (k, JInt(v)) => k -> v.toDouble }
        case _ => Nil
      })
  }

  private def fmt(v: Double): String =
    if (v < 0) "—" else f"$v%.2f"

  def main(args: Array[String]): Unit = {
    val (outFile, files) = args.toSeq match {
      case "--out" +: out +: rest => (Some(out), rest)
      case rest => (None, rest)
    }
    val arts = (if (files.nonEmpty) files
                else Seq("/root/repo/bench_out.json")).map(load)

    val sb = new StringBuilder
    sb ++= "# graft benchmark results\n"
    sb ++= "\nAll timings are full read -> compute -> write-parquet actions in\n"
    sb ++= "seconds (negative/missing = run failed or skipped).\n"
    for (a <- arts) {
      sb ++= s"\n## ${a.name} (sf=${a.sf}, total ${fmt(a.total)} s)\n\n"
      sb ++= "| query | seconds |\n|---|---|\n"
      for ((q, v) <- a.queries) sb ++= s"| $q | ${fmt(v)} |\n"
    }
    if (arts.length > 1) {
      val names = arts.flatMap(_.queries.map(_._1)).distinct
      sb ++= "\n## per-query matrix\n\n"
      sb ++= "| query |" + arts.map(a => s" ${a.name} |").mkString + "\n"
      sb ++= "|---|" + arts.map(_ => "---|").mkString + "\n"
      for (q <- names) {
        val cells = arts.map(a =>
          a.queries.collectFirst { case (`q`, v) => fmt(v) }.getOrElse(""))
        sb ++= s"| $q |" + cells.map(c => s" $c |").mkString + "\n"
      }
    }
    outFile match {
      case Some(p) => Files.writeString(Paths.get(p), sb.toString); println(s"wrote $p")
      case None => print(sb.toString)
    }
  }
}
