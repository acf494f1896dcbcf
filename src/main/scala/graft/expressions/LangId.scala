package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Heuristic language identification for pipeline text analysis: CJK
 * code-point ratio decides `zh`; otherwise the highest stopword-profile hit
 * count among {en, es, de, fr} wins; `und` (undetermined) when nothing
 * matches. Profiles are the classic top function words per language —
 * a standard n-gram/stopword LID heuristic, deliberately dependency-free.
 */
object LangIdKernel {

  private val profiles: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
      "was", "on", "are", "with", "as", "this", "have", "be", "not", "you"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
      "es", "por", "con", "no", "para", "se", "del", "al", "como", "su"),
    "de" -> Set("der", "die", "und", "das", "ist", "von", "mit", "den", "im",
      "ein", "eine", "nicht", "auf", "sich", "es", "dem", "zu", "auch", "als", "wird"),
    "fr" -> Set("le", "la", "et", "les", "des", "de", "un", "une", "est", "que",
      "dans", "pour", "qui", "sur", "pas", "au", "plus", "par", "avec", "ce"))

  def detect(s: UTF8String): UTF8String = {
    val str = s.toString
    var cjk = 0
    var total = 0
    var i = 0
    while (i < str.length) {
      val c = str.codePointAt(i)
      if (!Character.isWhitespace(c)) {
        total += 1
        if ((c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3400 && c <= 0x4dbf) ||
          (c >= 0x3040 && c <= 0x30ff)) cjk += 1
      }
      i += Character.charCount(c)
    }
    if (total > 0 && cjk.toDouble / total > 0.2) return UTF8String.fromString("zh")
    val tokens = str.toLowerCase.split("[^\\p{L}]+")
    var best = "und"
    var bestScore = 0
    var p = 0
    while (p < profiles.length) {
      val (lang, words) = profiles(p)
      var score = 0
      var t = 0
      while (t < tokens.length) {
        if (words.contains(tokens(t))) score += 1
        t += 1
      }
      if (score > bestScore) { bestScore = score; best = lang }
      p += 1
    }
    UTF8String.fromString(best)
  }
}

/** lang_id(text STRING) -> STRING ('en'|'es'|'de'|'fr'|'zh'|'und'). */
case class LangId(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    LangIdKernel.detect(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.LangIdKernel.detect($c)")
  override def prettyName: String = "lang_id"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
