package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.JdbcSink

/** Property-based roundtrips (the SURVEY §5 upgrade over the reference's
  * example-based parser tests): the P6 literal encoder and the S5 dump
  * parser must be inverses for ARBITRARY content, not just fixtures —
  * quotes, backslashes, control characters, unicode, separators and
  * parser-meaningful tokens all mixed freely. Pure driver-side (no Spark
  * session): `SqlDumpSource.parseString` scans statements exactly like the
  * file path does.
  */
class RoundtripPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // adversarial-but-valid text: BMP letters, CJK, quotes, backslashes,
  // newlines, NUL/SUB (the escaped control chars), SQL tokens, separators
  private val nastyChar: Gen[Char] = Gen.frequency(
    (6, Gen.alphaNumChar),
    (2, Gen.oneOf('\'', '\\', '"', '`', ',', '(', ')', ';', ' ', '\t')),
    (1, Gen.oneOf('\n', '\r', 0.toChar, 26.toChar)),
    (1, Gen.oneOf('中', '文', 'é', 'ß', '€', '∑')),
    (1, Gen.choose(' ', '߿')))
  private val nastyString: Gen[String] =
    Gen.listOf(nastyChar).map(_.mkString)

  test("P6 -> S5: quoteString parses back to the original for any string") {
    check("string roundtrip", Prop.forAll(nastyString) { s =>
      val stmt = s"INSERT INTO `t` VALUES (${JdbcSink.quoteString(s)});\n"
      val rows = SqlDumpSource.parseString(stmt).toList
      rows.length == 1 && {
        val vals = rows.head.getSeq[String](3)
        vals.length == 1 && vals.head == s
      }
    })
  }

  test("P6 -> S5: multi-column tuples with mixed nasty strings and numbers") {
    val row: Gen[(String, Long, String, Double)] = for {
      a <- nastyString; b <- Gen.choose(Long.MinValue, Long.MaxValue)
      c <- nastyString; d <- Gen.choose(-1e9, 1e9)
    } yield (a, b, c, d)
    check("tuple roundtrip", Prop.forAll(Gen.nonEmptyListOf(row)) { rows =>
      val stmt = "INSERT INTO `t` VALUES " + rows.map { case (a, b, c, d) =>
        s"(${JdbcSink.quoteString(a)},$b,${JdbcSink.quoteString(c)},$d)"
      }.mkString(",") + ";\n"
      val parsed = SqlDumpSource.parseString(stmt).toList
      parsed.length == rows.length && parsed.zip(rows).forall {
        case (r, (a, b, c, d)) =>
          val v = r.getSeq[String](3)
          v(0) == a && v(1) == b.toString && v(2) == c &&
            v(3).toDouble == d // numeric text comparison is format-free
      }
    })
  }

  test("S5 row indexing: row_idx is dense and per-statement order is kept") {
    check("row_idx dense", Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 5)) {
      (rowsPerStmt, nStmts) =>
        val stmt = (0 until nStmts).map { s =>
          "INSERT INTO `t` VALUES " +
            (0 until rowsPerStmt).map(i => s"(${s * rowsPerStmt + i})")
              .mkString(",") + ";"
        }.mkString("\n") + "\n"
        val parsed = SqlDumpSource.parseString(stmt).toList
        parsed.length == rowsPerStmt * nStmts &&
          parsed.zipWithIndex.forall { case (r, i) =>
            r.getLong(1) == i.toLong &&
              r.getSeq[String](3).head.toInt == i
          }
    })
  }

  test("crc64: XOR fold is order- and split-invariant (A1 distributivity)") {
    import graft.functions.Crc64
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    check("crc64 xor fold", Prop.forAll(Gen.nonEmptyListOf(bytesGen)) { chunks =>
      val crcs = chunks.map(Crc64.checksum)
      val forward = crcs.foldLeft(0L)(_ ^ _)
      val reversed = crcs.reverse.foldLeft(0L)(_ ^ _)
      val (l, r) = crcs.splitAt(crcs.length / 2)
      forward == reversed &&
        forward == (l.foldLeft(0L)(_ ^ _) ^ r.foldLeft(0L)(_ ^ _))
    })
  }
}
