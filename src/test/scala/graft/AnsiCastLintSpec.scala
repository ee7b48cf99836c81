package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Build-time lint for ANSI cast edges on the user-data boundary.
  *
  * Four of the five round-10 ADVICE bugs were ANSI-mode cast/coercion
  * edge cases (`cast` vs `try_cast` on payload ids, `'' ===` coercion
  * on non-string partition columns, error-class params) — all in the
  * files that parse EXTERNAL input, where a string column's content is
  * whatever the outside world sent and a bare `.cast` to a non-string
  * type is a runtime raise waiting for the first malformed row.
  *
  * Rule: in the boundary files below, every `.cast` to a non-string
  * type must be ADJUDICATED — either rewritten as `try_cast` (malformed
  * input degrades to NULL and flows to the quarantine path) or marked
  * with an `ansi-ok:` comment on the line or just above it stating why
  * the input domain cannot raise (e.g. the source expression is already
  * numeric-typed, or a raise IS the wanted behavior). A new cast
  * without either fails this spec at build time instead of surfacing in
  * review — or production.
  */
class AnsiCastLintSpec extends AnyFunSuite {

  /** Files on the external-input boundary: HTTP payload JSON, CSV /
    * config / text-log input, binary media, and the partitioned-sink
    * sentinel logic that round 10's coercion bug lived in.
    */
  private val boundaryFiles = Seq(
    "src/main/scala/graft/operators/SpotifyFlatten.scala",
    "src/main/scala/graft/operators/SpotifySearch.scala",
    "src/main/scala/graft/operators/Multimodal.scala",
    "src/main/scala/graft/operators/Validation.scala",
    "src/main/scala/graft/sources/SpotifySchemas.scala",
    "src/main/scala/graft/sources/TextLog.scala",
    "src/main/scala/graft/sources/Config.scala",
    "src/main/scala/graft/sources/Sinks.scala",
    "src/main/scala/graft/sources/spotify/SpotifyApiSource.scala")

  // .cast("long"), .cast(LongType), ... — every non-string target;
  // casting TO string never raises and is exempt
  private val riskyCast = (
    """\.cast\("(?!string)[^"]+"\)|""" +
      """\.cast\((Byte|Short|Integer|Long|Float|Double|Decimal|Date|Timestamp|Boolean|Binary)Type""").r

  // SQL-string casts inside expr(...): CAST( raises under ANSI exactly
  // like the Column form; TRY_CAST is the adjudicated spelling
  private val riskySqlCast = """(?i)(?<![_A-Z])CAST\s*\(""".r

  private def violations(path: String): Seq[(Int, String)] = {
    val lines = Files.readAllLines(Paths.get(path)).asScala.toVector
    // the marker may sit on the line itself or up to two lines above
    // (multi-line expressions put the comment above the statement)
    def adjudicated(i: Int): Boolean =
      ((i - 2).max(0) to i).exists(j =>
        lines(j).contains("ansi-ok") || lines(j).toLowerCase.contains("try_cast"))
    lines.zipWithIndex.collect {
      case (l, i)
        if (riskyCast.findFirstIn(l).isDefined ||
          (riskySqlCast.findFirstIn(l).isDefined && !l.toLowerCase.contains("try_cast")))
          && !adjudicated(i) =>
        (i + 1, l.trim)
    }
  }

  test("every non-string cast on the user-data boundary is try_cast or ansi-ok-adjudicated") {
    val bad = boundaryFiles.flatMap { f =>
      assert(Files.exists(Paths.get(f)), s"boundary file moved: $f — update the lint's list")
      violations(f).map { case (ln, l) => s"$f:$ln  $l" }
    }
    assert(bad.isEmpty,
      "Unadjudicated ANSI cast(s) on the user-data boundary — use try_cast " +
        "(malformed input -> NULL -> quarantine) or add an `// ansi-ok: <reason>` " +
        "comment on or just above the line:\n" + bad.mkString("\n"))
  }

  test("the lint actually detects an unadjudicated cast") {
    val tmp = Files.createTempFile("graft_lint", ".scala")
    Files.write(tmp, java.util.Arrays.asList(
      """val x = col("payload_id").cast("long")""",
      """val pad1 = lit(1)""",
      """val pad2 = lit(2)""",
      """// ansi-ok: widening from int""",
      """val y = size(col("a")).cast("long")""",
      """val s = col("n").cast("string")""", // to-string: never flagged
      """val pad3 = lit(3)""",
      """val z = expr("CAST(b AS INT)")""",
      """val w = expr("try_cast(b AS INT)")"""))
    val got = violations(tmp.toString).map(_._1)
    assert(got === Seq(1, 8), s"expected lines 1 and 8 flagged, got $got")
  }
}
