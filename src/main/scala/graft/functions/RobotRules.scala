package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Robots-rule URL decisions as ONE referenced-object codegen
  * expression — the scale path of
  * [[graft.graph.WebGraph.urlDecisions]].
  *
  * The relational formulation (broadcast nested-loop join of URLs ×
  * rules on a per-row `regexp_like(url, ruleRegexCol)`, then a window
  * for most-specific-wins) recompiles every wildcard rule's regex for
  * every (URL, rule) pair — Spark cannot cache-compile a non-literal
  * pattern column. Rule sets are MODEL-SIZED (one robots.txt worth of
  * lines per host), so they ride along as a referenced object (the
  * [[CentroidOps]] mechanism): patterns compile ONCE per executor
  * (`@transient lazy`), the precedence order is baked by pre-sorting,
  * and the per-row work is a first-match scan in whole-stage codegen —
  * no join, no window, no shuffle beyond the caller's `distinct`.
  *
  * Determinism contract (so the swap is invisible to the
  * `urlDecisionsCtes` oracle): rules sort by (scheme-stripped length
  * DESC, pattern, action) with strings compared as UTF-8 BYTES —
  * exactly the window's `ORDER BY length(__s) DESC, pattern, action`
  * under Spark's binary string ordering; the first matching rule in
  * that order wins; no match → 'allow'. Matching is scheme-agnostic
  * (both sides drop a leading `http(s)://`), wildcard-free rules use
  * the cheap prefix test, wildcard/anchored rules their translated
  * regex (same escape chain, `java.util.regex` on both paths — Spark's
  * own `rlike` engine).
  */
object RobotRules {

  /** One translated rule: `body` is the scheme-stripped pattern minus
    * any trailing `$`; `regex` is the anchored translation for
    * wildcard/anchored rules ('' for plain prefixes).
    */
  final case class Rule(body: String, regex: String, action: String)

  /** Rules pre-sorted by precedence, with per-executor lazy pattern
    * compilation.
    */
  final class Compiled(val rules: Array[Rule]) extends Serializable {
    @transient lazy val patterns: Array[java.util.regex.Pattern] =
      rules.map(r =>
        if (r.regex.nonEmpty) java.util.regex.Pattern.compile(r.regex)
        else null)
    @transient lazy val actions: Array[UTF8String] =
      rules.map(r => UTF8String.fromString(r.action))
  }

  private val Allow = UTF8String.fromString("allow")

  private def stripScheme(u: String): String =
    if (u.startsWith("http://")) u.substring(7)
    else if (u.startsWith("https://")) u.substring(8)
    else u

  /** First matching rule's action in precedence order, 'allow' when
    * nothing matches.
    */
  def decide(url: UTF8String, c: Compiled): UTF8String = {
    val u = stripScheme(url.toString)
    val n = c.rules.length
    var i = 0
    while (i < n) {
      val r = c.rules(i)
      val hit =
        if (r.regex.isEmpty) u.startsWith(r.body)
        else c.patterns(i).matcher(u).find()
      if (hit) return c.actions(i)
      i += 1
    }
    Allow
  }

  /** UTF-8 byte ordering — Spark's binary StringType ordering, so the
    * tie-breaks match the relational window exactly.
    */
  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(a.getBytes(UTF_8),
      b.getBytes(UTF_8)) < 0

  /** Build the compiled rule set from raw `(pattern, action)` pairs:
    * scheme-strip, `$`-anchor split, wildcard detection, the SHARED
    * metachar-escape chain (`escape`), precedence sort.
    */
  def compile(raw: Seq[(String, String)],
      escape: String => String): Compiled = {
    val translated = raw.map { case (pattern, action) =>
      val s = stripScheme(pattern)
      val anch = s.endsWith("$")
      val b = if (anch) s.substring(0, s.length - 1) else s
      val wild = b.contains("*") || anch
      val regex =
        if (wild) "^" + escape(b) + (if (anch) "$" else "") else ""
      (s.length, pattern, action, Rule(b, regex, action))
    }
    val sorted = translated.sortWith { case ((l1, p1, a1, _), (l2, p2, a2, _)) =>
      if (l1 != l2) l1 > l2
      else if (p1 != p2) utf8Lt(p1, p2)
      else utf8Lt(a1, a2)
    }
    new Compiled(sorted.map(_._4).toArray)
  }

  def decideCol(url: Column, c: Compiled): Column =
    ColumnBridge.column(UrlDecide(ColumnBridge.expression(url), c))
}

case class UrlDecide(child: Expression, compiled: RobotRules.Compiled)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "url_decide"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    RobotRules.decide(a.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotRules", compiled,
      classOf[RobotRules.Compiled].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.RobotRules.decide($c, $ref);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UrlDecide = copy(child = newChild)
}
