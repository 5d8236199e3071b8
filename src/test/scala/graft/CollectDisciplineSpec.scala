package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-materialization discipline, ENFORCED against the source
  * tree (the VERDICT round-8 item: a bound argued per-site in prose
  * is a comment, not a contract): every `.collect()` in main sources
  * must either
  *  - be the one inside [[graft.operators.ModelCollect]] itself,
  *  - be routed through `ModelCollect.bounded` (the call expression
  *    contains it), or
  *  - carry a greppable `collect-bound:` annotation within the four
  *    preceding lines stating the STRUCTURAL bound (a `limit(n)`
  *    immediately upstream, a global agg's single row, …).
  *
  * A new bare collect fails this suite, naming its file:line.
  */
class CollectDisciplineSpec extends AnyFunSuite {

  test("every driver-side collect is bounded or collect-bound-annotated") {
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"run from the repo root: $root missing")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val offenders = walk(root)
      .filterNot(_.getName == "ModelCollect.scala")
      .flatMap { f =>
        val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
        lines.zipWithIndex.collect {
          case (line, i)
              if line.contains(".collect()") &&
                !line.contains("ModelCollect.bounded") &&
                !lines.slice(math.max(0, i - 4), i + 1).exists(l =>
                  l.contains("collect-bound:") ||
                    l.contains("ModelCollect.bounded")) =>
            s"${f.getPath}:${i + 1}"
        }
      }
    assert(offenders.isEmpty,
      "bare driver-side collect(s) — route through ModelCollect.bounded " +
        "or annotate the structural bound with a `collect-bound:` " +
        s"comment:\n  ${offenders.mkString("\n  ")}")
  }
}
