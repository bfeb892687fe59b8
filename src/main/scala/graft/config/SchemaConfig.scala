package graft.config

import java.nio.file.{Files, Path}
import java.util.regex.{Matcher, Pattern, PatternSyntaxException}
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.types.AType

/** A parsed schema-rewrite rule (reference: mongo2pq/config.py:85-198). */
sealed trait SchemaRule extends Serializable
/** Change a field's type where the name matches (retype_regex /
  * retype_contains / retype_equals, config.py:85-125). */
final case class RetypeRule(fieldTest: String => Boolean, fieldType: AType) extends SchemaRule
/** Regex rename with group references, optionally uppercasing chosen
  * groups (rename_regex / rename_regex_upper, config.py:128-198). */
final case class RenameRule(rename: String => String) extends SchemaRule

/** YAML config DSL parser, reproducing mongo2pq/config.py semantics:
  * a malformed node is warned about and skipped — parsing never aborts
  * the run (config.py:201-211); an entirely malformed config yields an
  * empty rule set (config.py:17-22). Warnings are collected rather than
  * printed so tests can assert on them.
  */
object SchemaConfig {

  final case class Parsed(
      rules: Map[String, Vector[SchemaRule]],
      warnings: Vector[String]) {
    def forCollection(name: String): Vector[SchemaRule] = rules.getOrElse(name, Vector.empty)
  }

  def parseFile(path: Path): Parsed = parse(Files.readString(path))

  def parse(text: String): Parsed = {
    val warnings = Vector.newBuilder[String]
    val raw =
      try new Yaml().load[Any](text)
      catch { case e: Exception =>
        warnings += s"the config couldn't be parsed because: $e"
        null
      }
    raw match {
      case m: java.util.Map[_, _] =>
        val top = m.asInstanceOf[java.util.Map[String, Any]].asScala
        val schemaNode = top.get("schema")
        val unknown = top.keySet.filterNot(_ == "schema")
        if (unknown.nonEmpty)
          warnings += s"config keys '${unknown.mkString(", ")}' unknown"
        val rules = schemaNode match {
          case Some(sm: java.util.Map[_, _]) =>
            parseSchemaNode(sm.asInstanceOf[java.util.Map[String, Any]], warnings)
          case Some(other) =>
            warnings += s"the config field schema parsing failed: must be a mapping, not ${other.getClass.getSimpleName}"
            Map.empty[String, Vector[SchemaRule]]
          case None => Map.empty[String, Vector[SchemaRule]]
        }
        Parsed(rules, warnings.result())
      case _ =>
        if (raw != null)
          warnings += s"Outermost node of config must be parsable to dict, not ${raw.getClass.getSimpleName}"
        Parsed(Map.empty, warnings.result())
    }
  }

  private def parseSchemaNode(
      node: java.util.Map[String, Any],
      warnings: scala.collection.mutable.Builder[String, Vector[String]]): Map[String, Vector[SchemaRule]] = {
    node.asScala.toSeq.map { case (collection, fieldlistRaw) =>
      val rules = fieldlistRaw match {
        case l: java.util.List[_] =>
          l.asScala.toVector.zipWithIndex.flatMap {
            case (item: java.util.Map[_, _], i) =>
              parseNode(collection, i, item.asInstanceOf[java.util.Map[String, Any]].asScala.toMap, warnings)
            case (other, i) =>
              warnings += warn(collection, i, "", s"must be parsable to dict, not ${String.valueOf(other)}")
              None
          }
        case other =>
          warnings += s"The collection node in schema config must be parsable to list, not ${String.valueOf(other)}"
          Vector.empty
      }
      collection -> rules
    }.toMap
  }

  private def parseNode(
      collection: String, index: Int, item: Map[String, Any],
      warnings: scala.collection.mutable.Builder[String, Vector[String]]): Option[SchemaRule] = {
    item.get("type").map(String.valueOf(_)) match {
      case None =>
        warnings += warn(collection, index, "", "is missing the required key 'type'")
        None
      case Some(t) if t.startsWith("retype_") => parseRetype(collection, index, t, item, warnings)
      case Some(t) if t.startsWith("rename_") => parseRename(collection, index, t, item, warnings)
      case Some(t) =>
        warnings += warn(collection, index, "", s"has unknown type $t")
        None
    }
  }

  /** config.py:85-125 */
  private def parseRetype(
      collection: String, index: Int, tpe: String, item: Map[String, Any],
      warnings: scala.collection.mutable.Builder[String, Vector[String]]): Option[SchemaRule] = {
    (item.get("fieldtype").map(String.valueOf(_)), item.get("fieldname").map(String.valueOf(_))) match {
      case (Some(ftRaw), Some(fieldName)) =>
        AType.forAlias(ftRaw) match {
          case None =>
            warnings += warn(collection, index, "retype", s"has fieldtype $ftRaw which doesn't exist")
            None
          case Some(ft) =>
            tpe.stripPrefix("retype_") match {
              case "contains" => Some(RetypeRule(x => x.contains(fieldName), ft))
              case "regex" =>
                try {
                  val p = compilePython(fieldName).pattern
                  Some(RetypeRule(x => p.matcher(x).find(), ft))
                } catch { case _: PatternSyntaxException =>
                  warnings += warn(collection, index, "retype", s"has invalid regex '$fieldName'")
                  None
                }
              case "equals" => Some(RetypeRule(x => x == fieldName, ft))
              case _ =>
                warnings += warn(collection, index, "retype", s"has unknown type $tpe")
                None
            }
        }
      case _ =>
        warnings += warn(collection, index, "retype",
          "does not contain all required keys (type, fieldname, fieldtype)")
        None
    }
  }

  /** config.py:128-198. Python `re.sub` replacement strings use
    * backslash group references (`\1`); the equivalent Java replacement
    * is built with explicit group substitution so the on-disk DSL stays
    * byte-compatible with the reference's documented format
    * (reference: sample_config.yaml:33-51). */
  private def parseRename(
      collection: String, index: Int, tpe: String, item: Map[String, Any],
      warnings: scala.collection.mutable.Builder[String, Vector[String]]): Option[SchemaRule] = {
    (item.get("oldname").map(String.valueOf(_)), item.get("newname").map(String.valueOf(_))) match {
      case (Some(oldName), Some(newName)) =>
        val pattern =
          try compilePython(oldName)
          catch { case _: PatternSyntaxException =>
            warnings += warn(collection, index, "rename", s"has invalid oldname regex '$oldName'")
            return None
          }
        tpe.stripPrefix("rename_") match {
          case "regex" =>
            Some(RenameRule(reSubAll(pattern, newName)))
          case "regex_upper" =>
            item.get("upper") match {
              case Some(l: java.util.List[_]) =>
                val upper = l.asScala.collect { case n: Number => n.intValue }.toSet
                Some(RenameRule(subAll(pattern.pattern, newName, upper)))
              case Some(other) =>
                warnings += warn(collection, index, "rename_regex_upper",
                  s"has field upper of type ${other.getClass.getSimpleName}, not list")
                None
              case None =>
                warnings += warn(collection, index, "rename_regex_upper",
                  "does not contain the required field upper")
                None
            }
          case _ =>
            warnings += warn(collection, index, "rename", s"has unknown type $tpe")
            None
        }
      case _ =>
        warnings += warn(collection, index, "rename",
          "does not contain all required keys (type, oldname, newname)")
        None
    }
  }

  /** A compiled Python pattern: Java `Pattern` plus the map from the
    * original Python group names to the Java-safe aliases they were
    * compiled under (Java group names are `[A-Za-z][A-Za-z0-9]*`, so
    * Python's snake_case names must be renamed, not just re-bracketed). */
  private[config] final case class PyPattern(pattern: Pattern, groupAlias: Map[String, String])

  private val namedGroupDef = """\(\?P<([^>]+)>""".r

  /** Python `re` patterns use `(?P<name>...)` groups and `(?P=name)`
    * backrefs where Java uses `(?<name>...)` / `\k<name>` — translate,
    * aliasing each Python group name to a Java-safe `pgN`, so configs
    * written against the reference compile here instead of being
    * warn-skipped. (Other syntax — inline flags, lookarounds,
    * classes — is already shared.) */
  private[config] def compilePython(regex: String): PyPattern = {
    val names = namedGroupDef.findAllMatchIn(regex).map(_.group(1)).toVector.distinct
    val alias = names.zipWithIndex.map { case (n, i) => n -> s"pg${i + 1}" }.toMap
    var s = regex
    alias.foreach { case (n, a) =>
      s = s.replace(s"(?P<$n>", s"(?<$a>")
      s = s.replace(s"(?P=$n)", s"\\k<$a>")
    }
    PyPattern(Pattern.compile(s), alias)
  }

  // -- re.sub replacement templates (rename_regex) --------------------
  // The reference's rename_regex calls re.sub(pattern, new_name, x)
  // directly (config.py:154), so the template follows CPython's
  // sre_parse.parse_template rules: \N (up to two digits, \g<0> =
  // whole match), \g<N>, \g<name>, the character escapes \a \b \f \n
  // \r \t \v \\, octal char escapes (\0[oo] and \ooo), and unknown
  // NON-letter escapes pass through with their backslash (re.sub('a',
  // r'\$', 'a') == '\\$'). A backslash before any other ASCII letter
  // is 'bad escape' and an out-of-range group is 'invalid group
  // reference' — both raised at SUB time (parse_config succeeds, the
  // apply crashes), which the lazy template parse below reproduces.
  // Unmatched optional groups substitute '' (re.sub semantics since 3.5).
  private sealed trait Tok
  private final case class Lit(s: String) extends Tok
  private final case class NumRef(n: Int) extends Tok
  private final case class NameRef(name: String) extends Tok

  // sre_parse.ESCAPES, template side
  private val charEscapes = Map(
    'a' -> "\u0007", 'b' -> "\b", 'f' -> "\f", 'n' -> "\n",
    'r' -> "\r", 't' -> "\t", 'v' -> "\u000B")

  private def parseTemplate(t: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    def isOct(c: Char) = c >= '0' && c <= '7'
    def isAsciiLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c != '\\') { toks += Lit(c.toString); i += 1 }
      else if (i + 1 >= t.length)
        throw new IllegalArgumentException("bad escape (end of pattern)")
      else {
        val n = t.charAt(i + 1)
        if (n == '\\') { toks += Lit("\\"); i += 2 }
        else if (n == '0') {
          // \0 plus up to two more octal digits is an octal char escape
          val end = math.min(i + 4, t.length)
          val digits = t.substring(i + 1, end).takeWhile(isOct)
          toks += Lit(Integer.parseInt(digits, 8).toChar.toString)
          i += 1 + digits.length
        } else if (n.isDigit) {
          // three octal digits form an octal char escape; otherwise up
          // to two digits form a group reference, like sre_parse
          val d2 = if (i + 2 < t.length && t.charAt(i + 2).isDigit) Some(t.charAt(i + 2)) else None
          val d3OctAt = i + 3 < t.length && isOct(t.charAt(i + 3))
          d2 match {
            case Some(b) if isOct(n) && isOct(b) && d3OctAt =>
              val v = Integer.parseInt(s"$n$b${t.charAt(i + 3)}", 8)
              if (v > 0xFF) throw new IllegalArgumentException(
                s"octal escape value \\$n$b${t.charAt(i + 3)} outside of range 0-0o377")
              toks += Lit(v.toChar.toString)
              i += 4
            case Some(b) => toks += NumRef(s"$n$b".toInt); i += 3
            case None    => toks += NumRef(n.asDigit); i += 2
          }
        } else if (n == 'g') {
          if (i + 2 >= t.length || t.charAt(i + 2) != '<')
            throw new IllegalArgumentException("missing < after \\g")
          val close = t.indexOf('>', i + 3)
          if (close < 0) throw new IllegalArgumentException("missing >, unterminated name")
          val name = t.substring(i + 3, close)
          if (name.nonEmpty && name.forall(_.isDigit)) toks += NumRef(name.toInt)
          else toks += NameRef(name)
          i = close + 1
        } else charEscapes.get(n) match {
          case Some(ch) => toks += Lit(ch); i += 2
          case None if isAsciiLetter(n) =>
            throw new IllegalArgumentException(s"bad escape \\$n")
          case None =>
            // unknown non-letter escape: CPython appends the raw
            // two-char sequence, backslash included
            toks += Lit("\\" + n); i += 2
        }
      }
    }
    toks.result()
  }

  /** Faithful `re.sub(pattern, template, x)` (the rename_regex path). */
  private def reSubAll(pp: PyPattern, template: String)(input: String): String = {
    // lazily parsed: template errors surface on first APPLY, like re.sub
    val toks = parseTemplate(template)
    val m = pp.pattern.matcher(input)
    val sb = new StringBuffer
    while (m.find()) {
      val out = new StringBuilder
      toks.foreach {
        case Lit(s) => out ++= s
        case NumRef(n) =>
          if (n > m.groupCount())
            throw new IllegalArgumentException(s"invalid group reference $n")
          out ++= Option(m.group(n)).getOrElse("")
        case NameRef(name) =>
          val javaName = pp.groupAlias.getOrElse(name,
            throw new IllegalArgumentException(s"unknown group name '$name'"))
          out ++= Option(m.group(javaName)).getOrElse("")
      }
      m.appendReplacement(sb, Matcher.quoteReplacement(out.toString))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** The rename_regex_upper path is NOT re.sub: the reference builds
    * the replacement with its own ascending `\N`-substitution loop
    * (config.py:174-186) — `\2` without `\1` stays literal, `\g<...>`
    * is not recognized, a reference past the group count raises
    * (`matchobj.group` IndexError) and an unmatched optional group
    * crashes (`str.replace(..., None)` TypeError). Reproduced
    * quirk-for-quirk, crashes included. */
  private def subAll(pattern: Pattern, template: String, upperGroups: Set[Int])(input: String): String = {
    val m = pattern.matcher(input)
    val sb = new StringBuffer
    while (m.find()) {
      var replaced = template
      var gi = 1
      while (replaced.contains("\\" + gi)) {
        if (gi > m.groupCount())
          throw new IndexOutOfBoundsException(s"no such group: $gi")
        val g = m.group(gi)
        if (g == null)
          throw new IllegalStateException(
            s"group $gi did not participate in the match (the reference raises TypeError here)")
        val rep = if (upperGroups(gi)) g.toUpperCase(java.util.Locale.ROOT) else g
        replaced = replaced.replace("\\" + gi, rep)
        gi += 1
      }
      m.appendReplacement(sb, Matcher.quoteReplacement(replaced))
    }
    m.appendTail(sb)
    sb.toString
  }

  private def warn(collection: String, index: Int, nodeType: String, desc: String): String = {
    val nt = if (nodeType.nonEmpty) nodeType + " " else ""
    s"${nt}node $index in schema config for $collection $desc"
  }
}
