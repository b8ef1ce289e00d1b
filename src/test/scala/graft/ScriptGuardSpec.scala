package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{ContainsWsFreeScript, ScriptGuard}
import graft.operators.TokenOps

/** The regex-free tokenizer gate must be EXACTLY rlike(WsFreeScriptClass):
  * sweep every range boundary (in/out on both edges), two/four-byte
  * neighbors, and random mixed strings against java.util.regex; prove
  * interpreted == codegen; and pin that tokenize still routes CJK rows
  * to bigrams and ASCII rows to the plain split through the new gate. */
class ScriptGuardSpec extends SparkSpec {

  import spark.implicits._

  private def regexContains(s: String): Boolean = {
    val p = java.util.regex.Pattern.compile(TokenOps.WsFreeScriptClass)
    p.matcher(s).find()
  }

  private val boundaries = Seq(
    0x0E00, 0x0EFF, 0x1000, 0x109F, 0x1780, 0x17FF, 0x3040, 0x30FF,
    0x31F0, 0x31FF, 0x3400, 0x4DBF, 0x4E00, 0x9FFF, 0xAC00, 0xD7AF,
    0xF900, 0xFAFF)

  test("kernel agrees with the regex on every boundary code point ±1") {
    val probes = boundaries.flatMap(c => Seq(c - 1, c, c + 1))
      .filter(c => c >= 0x20 && !(c >= 0xD800 && c <= 0xDFFF)) ++
      Seq(0x41, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFD, 0x10000, 0x2A700)
    probes.foreach { cp =>
      val s = "ab " + new String(Character.toChars(cp)) + " yz"
      assert(ScriptGuard.containsWsFree(UTF8String.fromString(s)) ==
        regexContains(s), f"U+$cp%04X")
    }
  }

  test("kernel agrees with the regex on random mixed strings") {
    val rnd = new scala.util.Random(7)
    val pool = boundaries ++ Seq(0x61, 0x7A, 0xE9, 0x4F60, 0x3042,
      0x1F600, 0x0416, 0x05D0)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(12)).map { _ =>
        val cp = pool(rnd.nextInt(pool.size)) + rnd.nextInt(3) - 1
        if (cp >= 0xD800 && cp <= 0xDFFF) "x"
        else new String(Character.toChars(math.max(0x20, cp)))
      }.mkString
      assert(ScriptGuard.containsWsFree(UTF8String.fromString(s)) ==
        regexContains(s), s.map(c => f"U+${c.toInt}%04X").mkString(","))
    }
  }

  test("malformed UTF-8 never desyncs the scan past a CJK character") {
    // what rlike sees: the bytes decoded with the replacement policy
    def viaDecode(bytes: Array[Byte]): Boolean =
      regexContains(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    val ni = Array(0xE4, 0xBD, 0xA0).map(_.toByte) // 你
    val cases = Seq(
      Array(0x85.toByte) ++ ni, // stray continuation before the CJK char
      Array(0xC3.toByte) ++ ni, // truncated 2-byte lead swallowing nothing
      Array(0xE4.toByte, 0x20.toByte) ++ ni, // truncated 3-byte lead
      Array(0xF0.toByte) ++ ni, // truncated 4-byte lead
      ni ++ Array(0x85.toByte), // trailing garbage
      Array(0xE0.toByte, 0x80.toByte, 0x80.toByte), // overlong: cp 0, no hit
      Array(0xED.toByte, 0xA0.toByte, 0x80.toByte), // CESU surrogate: no hit
      Array(0x85.toByte, 0x41.toByte)) // garbage + ascii only
    cases.foreach { bytes =>
      assert(ScriptGuard.containsWsFree(UTF8String.fromBytes(bytes)) ==
        viaDecode(bytes),
        bytes.map(b => f"${b & 0xFF}%02X").mkString(" "))
    }
  }

  test("codegen path (df.select) agrees with interpreted eval and rlike") {
    val vals = Seq("plain ascii", "", "café crème",
      "你好 world", "あ", "mixed 😀 emoji",
      "สวัสดี", "가나")
    val df = vals.toDF("s")
    val got = df.select(
        graft.functions.ScriptGuard.containsWsFreeScript(col("s")).as("g"),
        col("s").rlike(TokenOps.WsFreeScriptClass).as("r"))
      .collect()
    got.zip(vals).foreach { case (r, v) =>
      assert(r.getBoolean(0) == r.getBoolean(1), v)
      val e = ContainsWsFreeScript(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(v), org.apache.spark.sql.types.StringType))
      assert(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) ==
        r.getBoolean(1), s"interpreted: $v")
    }
    // null stays null
    val n = Seq[String](null).toDF("s")
      .select(graft.functions.ScriptGuard.containsWsFreeScript(col("s")))
      .head()
    assert(n.isNullAt(0))
  }

  test("tokenize still routes through the gate: CJK bigrams, ASCII split") {
    val got = Seq("hello big world", "你好世界 ok")
      .toDF("t")
      .select(TokenOps.tokenize(col("t")).as("toks"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("hello", "big", "world"))
    assert(got(1) == Seq("你好", "好世", "世界",
      "ok"))
  }
}
