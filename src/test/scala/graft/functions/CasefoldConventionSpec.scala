package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Source-level guard for the round-11 casefold convention: no
  * cross-engine text law may use `lower()` (Java full/contextual
  * casing vs DuckDB's utf8proc simple casing — the dimension-5
  * divergence), and every inlined SQL `translate` casefold must spell
  * the exact 26+26 alphabet (a one-character typo in one oracle
  * literal would change that single law silently until the next full
  * verify). The Spark side has one definition ([[TextAnalysis
  * .asciiLower]]); the oracle side is ~28 string literals — this spec
  * is the single point that keeps them honest.
  */
class CasefoldConventionSpec extends AnyFunSuite {
  // anchor on the source tree wherever the forked test JVM's working
  // directory lands (ADVICE r11): walk up from user.dir to the first
  // ancestor holding src/main/scala/graft, and fail LOUDLY when none
  // does — a silent empty scan would pass while guarding nothing
  private val root: java.nio.file.Path = {
    val rel = java.nio.file.Paths.get("src", "main", "scala", "graft")
    Iterator.iterate(java.nio.file.Paths.get(
        sys.props("user.dir")).toAbsolutePath)(_.getParent)
      .takeWhile(_ != null)
      .map(_.resolve(rel))
      .find(java.nio.file.Files.isDirectory(_))
      .getOrElse(throw new IllegalStateException(
        s"src/main/scala/graft not found above ${sys.props("user.dir")} — " +
          "the casefold convention guard cannot run"))
  }

  private def sources: Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala"))
        out += ((p.toString, new String(
          java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)))
    }
    out.toSeq
  }

  test("no text law uses lower(): every casefold goes through " +
    "asciiLower / the translate literal") {
    val offenders = sources.flatMap { case (path, text) =>
      // TextAnalysis defines the device (its scaladoc NAMES lower());
      // strip line comments and scaladoc so prose mentions don't trip
      if (path.endsWith("functions/TextAnalysis.scala")) None
      else {
        val code = text.linesIterator.zipWithIndex
          .filterNot { case (l, _) =>
            val t = l.trim
            t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
          }
          .filter { case (l, _) =>
            // exclude identifiers that merely end in "lower" and the
            // asciiLower device itself
            "(?<![a-zA-Z])lower\\(".r.findFirstIn(
              l.replace("asciiLower(", "")).isDefined
          }
          .map { case (l, i) => s"$path:${i + 1}: ${l.trim}" }
        code.toSeq
      }
    }
    assert(offenders.isEmpty,
      "lower() is not cross-engine stable; use TextAnalysis.asciiLower " +
        "/ asciiLowerSql:\n" + offenders.mkString("\n"))
  }

  test("every inlined SQL translate casefold spells the exact alphabet") {
    val lit = ("translate\\(([^,]*), '([A-Za-z]*)', '([A-Za-z]*)'\\)").r
    val bad = sources.flatMap { case (path, text) =>
      lit.findAllMatchIn(text).collect {
        case m if m.group(2) != TextAnalysis.UpperAscii ||
          m.group(3) != TextAnalysis.LowerAsciiChars =>
          s"$path: translate(${m.group(1)}, '${m.group(2)}', '${m.group(3)}')"
      }
    }
    assert(bad.isEmpty,
      "translate casefold literal drifted from the canonical alphabet:\n" +
        bad.mkString("\n"))
  }
}
