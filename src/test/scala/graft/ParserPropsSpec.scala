package graft

import graft.operators.{Chunkers, ChunkerOptions}
import graft.sources.MarkdownElementReader
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Robustness fuzzing for the per-row parse/pack path: at 100 TB the
  * parser sees every malformed document on the web, and ONE uncaught
  * exception in a narrow stage kills the task, the stage, and the job.
  * These properties drive randomly-composed markdown-ish documents
  * (headers, fences, tables, quotes, lists, breaks, setext underlines,
  * images, blanks — including unterminated and interleaved forms)
  * through parseBlocks and the element packer and assert the structural
  * contract instead of exact output.
  */
object ParserPropsSpec extends Properties("parser-robustness") {

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
  private val plainLine: Gen[String] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val line: Gen[String] = Gen.frequency(
    6 -> plainLine,
    1 -> plainLine.map("# " + _),
    1 -> plainLine.map("### " + _),
    1 -> Gen.const("---"),
    1 -> Gen.const("```"), // fences pair up arbitrarily → unterminated blocks
    1 -> plainLine.map("> " + _),
    1 -> plainLine.map("- " + _),
    1 -> plainLine.map("1. " + _),
    1 -> plainLine.map(w => s"| $w | x |"),
    1 -> Gen.const("| --- | --- |"),
    1 -> Gen.const("==="),
    1 -> plainLine.map(w => s"![$w]($w.png)"),
    1 -> Gen.const("   "),
    1 -> Gen.const("")
  )
  private val doc: Gen[String] = Gen.listOf(line).map(_.mkString("\n"))

  private val kinds =
    Set("header", "paragraph", "table", "image", "footer", "code", "quote", "list")

  property("parseBlocks never throws; every block is well-formed") = forAll(doc) { md =>
    val blocks = MarkdownElementReader.parseBlocks(md)
    blocks.forall { case (kind, level, m, t) =>
      kinds.contains(kind) && level >= 0 && level <= 10 && m != null && t != null
    }
  }

  property("parseBlocks: headers carry their level, non-headers level 0") = forAll(doc) { md =>
    MarkdownElementReader.parseBlocks(md).forall { case (kind, level, _, _) =>
      if (kind == "header") level >= 1 else level == 0
    }
  }

  property("packElements: budget respected on word text; ids contiguous; content non-empty") =
    forAll(Gen.listOf(plainLine), Gen.choose(1, 40)) { (paras, budget) =>
      val elems = paras.filter(_.trim.nonEmpty).map(p => ("paragraph", p))
      val chunks = Chunkers.packElements(1L, "", elems,
        ChunkerOptions(maxTokens = budget, overlap = 0), startId = 0)
      chunks.zipWithIndex.forall { case (c, i) =>
        c.chunk_id == i && c.content.nonEmpty && c.token_count <= budget
      }
    }

  property("packElements: token conservation — chunk token counts sum to the input's") =
    forAll(Gen.listOf(plainLine), Gen.choose(1, 40)) { (paras, budget) =>
      val elems = paras.filter(_.trim.nonEmpty).map(p => ("paragraph", p))
      val inputTokens = elems.map(e => graft.functions.native.tokenOffsets(e._2).length / 2).sum
      val chunks = Chunkers.packElements(1L, "", elems,
        ChunkerOptions(maxTokens = budget, overlap = 0), startId = 0)
      chunks.map(_.token_count).sum == inputTokens
    }
}
