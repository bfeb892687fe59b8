package graft.schema

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.types.AType

/** YAML persistence of inferred schemas, round-trip compatible with the
  * reference's `!schema` documents:
  * dump shape mongo2pq/schema.py:87-108 (`name:` + `fields: {col: alias}`),
  * load path mongo2pq/schema.py:173-202 (`pa.type_for_alias`, failures ->
  * SchemaParseError so callers can fall back to inference,
  * mongo2pq/main.py:59-70).
  */
object SchemaYaml {

  final class SchemaParseError(msg: String) extends RuntimeException(msg)

  /** Serialize in the reference's exact on-disk shape. Field order is
    * preserved (the reference dumps with sort_keys=False,
    * schema.py:108). */
  def dump(schema: InferredSchema): String = {
    val sb = new StringBuilder
    sb.append("!schema\n")
    sb.append(s"name: ${quote(schema.name)}\n")
    sb.append("fields:\n")
    schema.fields.foreach { case (n, t) =>
      sb.append(s"  ${quote(n)}: ${quote(t.alias)}\n")
    }
    sb.toString
  }

  /** A plain (unquoted) scalar must re-parse as the SAME string: YAML 1.1
    * resolves bare `yes`/`true`/`null`/`on`/`123`/`1.5` to bool/null/
    * number, which would corrupt a field actually named that on reload
    * (PyYAML quotes these when dumping, so the reference round-trips).
    * SnakeYAML's own Resolver is the authority on what it would re-tag. */
  private val resolver = new org.yaml.snakeyaml.resolver.Resolver()

  private def quote(s: String): String = {
    val plainSafe =
      s.matches("[A-Za-z0-9_][A-Za-z0-9_\\-. \\[\\]<>,:]*") &&
        !s.contains(": ") && !s.endsWith(":") &&
        (resolver.resolve(org.yaml.snakeyaml.nodes.NodeId.scalar, s, true)
          == org.yaml.snakeyaml.nodes.Tag.STR)
    if (plainSafe) s else "'" + s.replace("'", "''") + "'"
  }

  def dumpToFile(schema: InferredSchema, destination: Path, filename: Option[String] = None): Path = {
    if (!Files.isDirectory(destination)) Files.createDirectories(destination)
    val out = destination.resolve(filename.getOrElse(schema.name + ".yaml"))
    Files.writeString(out, dump(schema))
    out
  }

  /** Parse a `!schema` YAML document. Throws [[SchemaParseError]] on any
    * shape/alias problem — the caller decides whether to fall back to
    * inference (reference: main.py:64-70). */
  def load(text: String): InferredSchema = {
    // The custom `!schema` tag carries no structure beyond "this mapping
    // is a schema"; strip it and parse the plain mapping.
    val stripped = text.replaceFirst("""(?m)^!schema\s*""", "")
    val raw =
      try new Yaml().load[Any](stripped)
      catch { case e: Exception => throw new SchemaParseError(s"Schema file couldn't be parsed: $e") }
    raw match {
      case m: java.util.Map[_, _] =>
        val map = m.asInstanceOf[java.util.Map[String, Any]].asScala
        val name = map.get("name") match {
          case Some(s: String) => s
          case _ => throw new SchemaParseError("Schema file doesn't contain Schema definition (missing name)")
        }
        val fieldsRaw = map.get("fields") match {
          case Some(fm: java.util.Map[_, _]) => fm.asInstanceOf[java.util.Map[String, Any]]
          case _ => throw new SchemaParseError("Schema file doesn't contain Schema definition (missing fields)")
        }
        val fields = fieldsRaw.asScala.toVector.map { case (fname, alias) =>
          val a = String.valueOf(alias)
          val t = AType.forAlias(a).getOrElse(
            throw new SchemaParseError(s"PyArrow fields couldn't be constructed: no type for alias '$a'"))
          fname -> t
        }
        InferredSchema(name, fields)
      case other =>
        throw new SchemaParseError(s"Schema file doesn't contain Schema definition, got ${other}")
    }
  }

  def loadFile(path: Path): InferredSchema = {
    val text =
      try Files.readString(path)
      catch { case e: Exception => throw new SchemaParseError(s"Schema file $path couldn't be opened: $e") }
    load(text)
  }

  def loadFile(path: String): InferredSchema = loadFile(Paths.get(path))
}
