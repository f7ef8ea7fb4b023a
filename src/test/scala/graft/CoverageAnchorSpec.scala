package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md anchor drift gate.
  *
  * Anchor drift recurred three rounds running after insertions into the
  * operator files. This spec re-implements `tools/check_anchors.py` inside
  * the suite so stale anchors turn `sbt test` red instead of waiting for a
  * judge pass: every `File.scala:N` anchor in a COVERAGE.md row that also
  * names a `"query" -> ((` declaration living in that file must point at
  * one of those declaration lines; any other anchor must at least be
  * inside the file.
  */
class CoverageAnchorSpec extends AnyFunSuite {

  private val root: Path = {
    // sbt runs tests with cwd = project root; fall back to walking up.
    val cwd = Paths.get(".").toAbsolutePath.normalize
    Iterator.iterate(cwd)(_.getParent).takeWhile(_ != null)
      .find(p => Files.exists(p.resolve("COVERAGE.md")))
      .getOrElse(fail("COVERAGE.md not found above cwd"))
  }

  private val anchorRe = """`?([A-Za-z][\w/]*\.scala):(\d+(?:,\d+)*)`?""".r
  private val nameRe = """`([a-z][a-z0-9_]+)`""".r
  private val declRe = """"([a-z][a-z0-9_]+)"\s*->\s*\(\(""".r

  test("every COVERAGE.md anchor lands on its declaration") {
    val src = root.resolve("src/main/scala/graft")
    // basename -> (line count, query name -> first declaration line)
    val index: Map[String, (Int, Map[String, Int])] =
      Files.walk(src).iterator.asScala
        .filter(_.toString.endsWith(".scala")).map { p =>
          val lines = Files.readAllLines(p).asScala
          val decls = lines.iterator.zipWithIndex.flatMap { case (l, i) =>
            declRe.findFirstMatchIn(l).map(m => m.group(1) -> (i + 1))
          }.toSeq.groupBy(_._1).map { case (n, hits) => n -> hits.map(_._2).min }
          p.getFileName.toString -> (lines.size, decls)
        }.toMap

    val failures = Files.readAllLines(root.resolve("COVERAGE.md")).asScala
      .zipWithIndex.filter(_._1.startsWith("|")).flatMap { case (row, i) =>
        val names = nameRe.findAllMatchIn(row).map(_.group(1)).toSet
        anchorRe.findAllMatchIn(row).flatMap { m =>
          val fname = m.group(1).split('/').last
          index.get(fname) match {
            case None =>
              Seq(s"COVERAGE.md:${i + 1} — unknown file ${m.group(1)}")
            case Some((nLines, decls)) =>
              val expected = decls.view.filterKeys(names).toMap
              m.group(2).split(',').map(_.toInt).collect {
                case n if n > nLines =>
                  s"COVERAGE.md:${i + 1} — $fname:$n past EOF ($nLines lines)"
                case n if expected.nonEmpty && !expected.values.exists(_ == n) =>
                  val exp = expected.toSeq.sorted.map { case (q, l) => s"$q@$l" }
                  s"COVERAGE.md:${i + 1} — $fname:$n stale; declarations: ${exp.mkString(", ")}"
              }
          }
        }
      }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
